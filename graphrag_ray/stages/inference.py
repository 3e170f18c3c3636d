"""Implicit relationship inference (reference
graphrag-core/src/inference.rs).

Co-occurrence-based relation inference: for a target entity, score every
co-occurring entity per chunk (0.2 base + word-proximity buckets +
weighted friendship/negative pattern bonuses with ±100-char context
checks + the family damping), normalize by the target's chunk count,
threshold at 0.3 and return the top-10 by confidence.

Faithful quirk: entity names are recovered from the id after the first
underscore with underscores→spaces — canonical ids concatenate words
("PERSON_aliceharmon" → "aliceharmon"), so multi-word names never match
a single text word and their proximity term is 0; single-word names
("corp", "tokyo") do match.  Ties in the confidence sort are pinned to
entity-id ASC (the reference iterates a HashMap).
"""

from __future__ import annotations

MIN_CONFIDENCE = 0.3   # InferenceConfig::default
MAX_CANDIDATES = 10

FRIENDSHIP_PATTERNS: tuple[tuple[str, float], ...] = (
    ("best friend", 0.8), ("close friend", 0.7), ("good friend", 0.6),
    ("friend", 0.4), ("friends", 0.4), ("friendship", 0.5),
    ("played together", 0.6), ("went together", 0.5), ("talked with", 0.4),
    ("helped each other", 0.7), ("shared", 0.3), ("together", 0.3),
    ("trusted", 0.6), ("loyal", 0.5), ("bond", 0.5), ("close", 0.4),
    ("cared for", 0.6), ("looked after", 0.5), ("protected", 0.6),
    ("adventure", 0.4), ("explore", 0.3), ("journey", 0.3),
    ("companion", 0.6), ("partner", 0.5), ("ally", 0.5),
)

NEGATIVE_PATTERNS: tuple[tuple[str, float], ...] = (
    ("enemy", -0.8), ("enemies", -0.8), ("rival", -0.6), ("rivals", -0.6),
    ("fought", -0.5), ("fight", -0.4), ("battle", -0.4),
    ("conflict", -0.5), ("angry at", -0.6), ("hate", -0.7),
    ("hated", -0.7), ("despise", -0.6), ("betrayed", -0.8),
    ("betrayal", -0.7), ("argued", -0.3), ("quarrel", -0.4),
    ("against", -0.2), ("opposed", -0.4), ("disagree", -0.2),
)

FAMILY_PATTERNS = ("brother", "sister", "cousin", "aunt", "uncle",
                   "family")


def extract_entity_name(entity_id: str) -> str:
    """inference.rs:291-302 — text after the first underscore,
    underscores to spaces, lowercased."""
    pos = entity_id.find("_")
    if pos != -1:
        return entity_id[pos + 1:].replace("_", " ").lower()
    return entity_id.lower()


def proximity_score(content: str, name_a: str, name_b: str) -> float:
    """inference.rs:322-358 — min word distance between word-contains
    mentions, bucketed."""
    words = content.split()
    pos_a = [i for i, w in enumerate(words) if name_a in w.lower()]
    pos_b = [i for i, w in enumerate(words) if name_b in w.lower()]
    if not pos_a or not pos_b:
        return 0.0
    dist = min(abs(a - b) for a in pos_a for b in pos_b)
    if dist <= 2:
        return 0.4
    if dist <= 5:
        return 0.3
    if dist <= 10:
        return 0.2
    if dist <= 20:
        return 0.1
    return 0.05


def entities_near_pattern(content: str, name_a: str, name_b: str,
                          pattern: str) -> bool:
    """inference.rs:377-394 — ±100-char window around the FIRST pattern
    occurrence contains both names."""
    pos = content.find(pattern)
    if pos == -1:
        return False
    start = max(pos - 100, 0)
    end = min(pos + len(pattern) + 100, len(content))
    ctx = content[start:end]
    return name_a in ctx and name_b in ctx


def evidence_score(content_lower: str, entity_a_id: str,
                   entity_b_id: str) -> float:
    """inference.rs:159-289."""
    score = 0.2
    na = extract_entity_name(entity_a_id)
    nb = extract_entity_name(entity_b_id)
    score += proximity_score(content_lower, na, nb)
    for pattern, weight in FRIENDSHIP_PATTERNS:
        if pattern in content_lower:
            if entities_near_pattern(content_lower, na, nb, pattern):
                score += weight * 0.5
            else:
                score += weight * 0.3
    for pattern, weight in NEGATIVE_PATTERNS:
        if pattern in content_lower:
            if entities_near_pattern(content_lower, na, nb, pattern):
                score += weight * 1.2
            else:
                score += weight * 0.8
    if any(p in content_lower for p in FAMILY_PATTERNS):
        score *= 0.8
    return min(max(score, 0.0), 1.0)


def infer_relationships(target_id: str, relation_type: str,
                        chunk_entities: list[tuple[str, list[str]]],
                        chunk_contents: dict[str, str],
                        min_confidence: float = MIN_CONFIDENCE
                        ) -> list[dict]:
    """inference.rs:83-156.  ``chunk_entities``: [(chunk_id,
    [entity_ids])]; ``chunk_contents``: chunk_id → content."""
    target_chunks = [(cid, ents) for cid, ents in chunk_entities
                     if target_id in ents]
    scores: dict[str, float] = {}
    for cid, ents in target_chunks:
        content = chunk_contents[cid].lower()
        for eid in ents:
            if eid != target_id:
                scores[eid] = scores.get(eid, 0.0) + evidence_score(
                    content, target_id, eid)
    out = []
    n = len(target_chunks)
    for eid, s in scores.items():
        norm = min(s / n, 1.0)
        if norm >= min_confidence:
            out.append({"source": target_id, "target": eid,
                        "relation_type": relation_type,
                        "confidence": norm, "evidence_count": n})
    out.sort(key=lambda r: (-r["confidence"], r["target"]))
    return out[:MAX_CANDIDATES]


# fixed targets for the driver-oracled surface; the surface runs at
# min_confidence 0.05 (an InferenceConfig knob) — at the default 0.3 the
# sparse kgx co-occurrence normalizes every candidate away, which the
# hand-fixture tests cover instead
INFER_TARGETS: tuple[tuple[str, str], ...] = (
    ("PERSON_aliceharmon", "ASSOCIATED"),
    ("LOCATION_tokyo", "NEAR"),
    ("ORGANIZATION_corp", "AFFILIATED"),
)
