"""Symbolic anchoring for conceptual queries (CatRAG;
retrieval/symbolic_anchoring.rs).

Grounds abstract query concepts ("what is the nature of love?") to the
concrete entities that embody or discuss them, then boosts retrieval
scores for anchor-matched results. Pure functions over collected entity /
relationship rows — the canonical entity table is the documented small
side (broadcast-sized), exactly like the alias map.
"""

from __future__ import annotations

CONCEPTUAL_PATTERNS = (
    "what is", "nature of", "meaning of", "definition of", "concept of",
    "idea of", "philosophy of", "theory of",
)

CONCEPT_WORDS = frozenset((
    "love", "virtue", "justice", "truth", "beauty", "good", "evil",
    "knowledge", "wisdom", "courage", "philosophy", "ethics", "morality",
    "freedom", "happiness", "meaning", "purpose", "existence", "reality",
    "consciousness", "mind", "soul", "spirit", "nature", "essence",
))


def _clean(word: str) -> str:
    """trim_matches(!is_alphanumeric) — strip non-alnum from both ends."""
    start, end = 0, len(word)
    while start < end and not word[start].isalnum():
        start += 1
    while end > start and not word[end - 1].isalnum():
        end -= 1
    return word[start:end]


def extract_concepts(query: str) -> list[str]:
    """rs:187-256: on conceptual queries, nouns following is/of/about plus
    known abstract-concept words (deduped); fallback to capitalized
    >4-char words."""
    concepts: list[str] = []
    words = query.split()
    query_lower = query.lower()
    if any(p in query_lower for p in CONCEPTUAL_PATTERNS):
        for i, word in enumerate(words):
            if i > 0 and words[i - 1].lower() in ("is", "of", "about"):
                clean = _clean(word)
                if clean and len(clean) > 2:
                    concepts.append(clean)
            if word.lower() in CONCEPT_WORDS:
                clean = _clean(word)
                if clean and clean not in concepts:
                    concepts.append(clean)
    if not concepts:
        for word in words:
            if len(word) > 4 and word[0].isupper():
                clean = _clean(word)
                if clean:
                    concepts.append(clean)
    return concepts


def ground_concept(concept: str, entities, rels_by_entity=None
                   ) -> list[str]:
    """rs:301-335: entity-name containment, CONCEPT-type containment, or
    a relationship type mentioning the concept. ``entities`` iterates
    (entity_id, name, entity_type) rows in a caller-pinned order."""
    grounded: list[str] = []
    low = concept.lower()
    for ent_id, name, etype in entities:
        name_low = name.lower()
        if low in name_low:
            grounded.append(ent_id)
            continue
        if etype.lower() == "concept" and low in name_low:
            grounded.append(ent_id)
            continue
        for rel_type in (rels_by_entity or {}).get(ent_id, ()):
            if low in rel_type.lower():
                grounded.append(ent_id)
                break
    return grounded


def calculate_relevance(grounded_entities, pagerank_scores=None) -> float:
    """rs:337-368: count score min(n/10, 1); with PageRank available,
    0.4·count + 0.6·avg-PR over the entities that have scores."""
    if not grounded_entities:
        return 0.0
    count_score = min(len(grounded_entities) / 10.0, 1.0)
    if pagerank_scores is not None:
        found = [pagerank_scores[e] for e in grounded_entities
                 if e in pagerank_scores]
        if found:
            return count_score * 0.4 + (sum(found) / len(found)) * 0.6
    return count_score


def extract_anchors(query: str, entities, rels_by_entity=None,
                    pagerank_scores=None, *, min_relevance: float = 0.3,
                    max_anchors: int = 5,
                    max_entities_per_anchor: int = 10) -> list[dict]:
    """rs:144-182: per-concept grounding (capped, order-preserving dedup),
    relevance filter, stable sort by relevance desc, top-K anchors."""
    anchors: list[dict] = []
    for concept in extract_concepts(query):
        grounded_all = ground_concept(concept, entities, rels_by_entity)
        grounded: list[str] = []
        for e in grounded_all[:max_entities_per_anchor]:
            if e not in grounded:
                grounded.append(e)
        if not grounded:
            continue
        relevance = calculate_relevance(grounded, pagerank_scores)
        if relevance >= min_relevance:
            anchors.append({
                "concept": concept,
                "grounded_entities": grounded,
                "relevance_score": relevance,
            })
    anchors.sort(key=lambda a: -a["relevance_score"])
    return anchors[:max_anchors]


def boost_with_anchors(results: list[dict], anchors: list[dict]
                       ) -> list[dict]:
    """rs:381-445: a result's score is multiplied by (1 + mean over its
    anchor-matched entities of the mean anchor relevance), then re-sorted
    by score descending (stable)."""
    if not anchors:
        return results
    entity_anchors: dict[str, list[dict]] = {}
    for anchor in anchors:
        for ent_id in anchor["grounded_entities"]:
            entity_anchors.setdefault(ent_id, []).append(anchor)
    for result in results:
        total_boost = 0.0
        match_count = 0
        for entity_name in result.get("entities", ()):
            matching = entity_anchors.get(entity_name)
            if matching:
                total_boost += (sum(a["relevance_score"] for a in matching)
                                / len(matching))
                match_count += 1
        if match_count:
            result["score"] = result["score"] * (1.0
                                                 + total_boost / match_count)
    results.sort(key=lambda r: -r["score"])
    return results


# fixed query set for the driver-oracled syn_anchors surface; the SQL twin
# (syn_oracle_kg.syn_anchors_sql) carries each query's HAND-DERIVED concept
# list — tests/test_operators_extra.py asserts those constants equal
# extract_concepts(query)
ANCHOR_QUERIES = (
    "what is the nature of Morrison",
    "the meaning of truth and justice",
    "Compare Harmon against Globex holdings",
    "nothing abstract here at all",
)

# hand-derived per the rs:187-256 rules (marker-following words incl. the
# 'the'-after-'is' quirk, then unseen abstract-concept words; fallback =
# capitalized >4-char words; the last query yields no concepts)
ANCHOR_QUERY_CONCEPTS = {
    "what is the nature of Morrison": ("the", "nature", "Morrison"),
    "the meaning of truth and justice": ("meaning", "truth", "justice"),
    "Compare Harmon against Globex holdings": ("Compare", "Harmon",
                                               "Globex"),
    "nothing abstract here at all": (),
}
