"""LazyGraphRAG-style concept graph (reference
graphrag-core/src/lightrag/concept_graph.rs).

Concept extraction (capitalized noun-phrase regex + general noun-phrase
regex + per-document frequency keywords, stopword-density validity,
sorted dedup) and the co-occurrence concept graph (node frequencies,
pairwise shared-chunk relations with a Jaccard confidence).

Distribution shape: extraction is a per-document `map_batches` pass
emitting (concept, doc_id/chunk_id) rows; node and edge tables fall out
of groupby aggregations — no driver-side state.  The reference's keyword
tie order is HashMap-dependent; here it is pinned to
(frequency DESC, word ASC) before the top-20 / freq≥2 cut.
"""

from __future__ import annotations

import re

_CAP_RE = re.compile(r"\b[A-Z][a-z]+(?:\s+[A-Z][a-z]+)+\b")
_NOUN_RE = re.compile(r"\b[A-Z][a-z]+(?:\s+[A-Z]?[a-z]+){1,4}\b")

STOPWORDS = frozenset(
    "the a an and or but in on at to for of with by from as is was are "
    "were be been being have has had do does did will would should could "
    "may might must can this that these those it its i you he she we they "
    "them their what which who when where why how all each every both few "
    "more most other some such no nor not only own same so than too very "
    "just now".split())

MIN_LENGTH = 3   # ConceptExtractorConfig::default
MAX_WORDS = 5


def is_valid_concept(phrase: str) -> bool:
    """concept_graph.rs:197-222 — length, word count, stopword density
    (integer-division majority)."""
    if len(phrase) < MIN_LENGTH:
        return False
    words = phrase.split()
    if len(words) > MAX_WORDS:
        return False
    stops = sum(1 for w in words if w.lower() in STOPWORDS)
    return stops <= len(words) // 2


def extract_keywords(text: str) -> list[str]:
    """concept_graph.rs:224-249 — per-text term frequency, normalized by
    lowercasing and trimming non-alphanumerics, top-20 with freq ≥ 2
    (tie order pinned to word ASC)."""
    freq: dict[str, int] = {}
    for word in text.split():
        # trim_matches(|c| !c.is_alphanumeric()) — strip from both ends
        normalized = word.lower()
        s, e = 0, len(normalized)
        while s < e and not normalized[s].isalnum():
            s += 1
        while e > s and not normalized[e - 1].isalnum():
            e -= 1
        normalized = normalized[s:e]
        if len(normalized) >= MIN_LENGTH and normalized not in STOPWORDS:
            freq[normalized] = freq.get(normalized, 0) + 1
    ranked = sorted(freq.items(), key=lambda t: (-t[1], t[0]))
    return [w for w, f in ranked[:20] if f >= 2]


def extract_concepts(text: str) -> list[str]:
    """concept_graph.rs:162-195 — capitalized phrases, noun phrases,
    keywords; sorted dedup."""
    concepts = [m.group(0) for m in _CAP_RE.finditer(text)
                if is_valid_concept(m.group(0))]
    concepts += [m.group(0) for m in _NOUN_RE.finditer(text)
                 if is_valid_concept(m.group(0))]
    concepts += extract_keywords(text)
    return sorted(set(concepts))


def make_concept_batch_fn():
    """map_batches fn over (doc_id, content) emitting one row per
    (doc, concept) — the distributed half of ConceptGraphBuilder."""
    import pyarrow as pa

    def fn(batch: pa.Table) -> pa.Table:
        out_doc, out_concept = [], []
        for doc_id, content in zip(batch.column("doc_id").to_pylist(),
                                   batch.column("content").to_pylist()):
            for c in extract_concepts(content):
                out_doc.append(str(doc_id))
                out_concept.append(c)
        return pa.Table.from_pydict({
            "doc_id": pa.array(out_doc, pa.string()),
            "concept": pa.array(out_concept, pa.string()),
        })

    return fn


def jaccard_confidence(n_a: int, n_b: int, shared: int) -> float:
    """concept_graph.rs:430-447."""
    union = n_a + n_b - shared
    return shared / union if union else 0.0
