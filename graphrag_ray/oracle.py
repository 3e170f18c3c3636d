"""Single-process reference oracle for parity testing.

Runs the same semantic path as the distributed pipeline — M1 chunking →
M5/M6 pattern extraction → exact+fuzzy canonicalization → edge rewrite +
dedup — sequentially, driving the *same pure functions* the Ray stages use
(functions/chunking.py, functions/extraction.py, functions/linking.py) the
way the reference's single-process build loop does
(graphrag/build.rs:516-625, corpus/entity_linker.rs:379-429).

The parity claim (SURVEY.md §5): the Ray pipeline's distinct
(subj, pred, obj) set matches this oracle at P/R ≥ 0.95 (expected: 1.0,
both paths being deterministic).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .config import DEFAULT_CONFIG, PipelineConfig
from .functions.chunking import chunk_doc
from .functions.extraction import extract_entities, extract_relationships
from .functions.linking import canonicalize, exact_clusters_from_rows


@dataclass
class OracleResult:
    chunks: list[dict] = field(default_factory=list)
    entity_rows: list[dict] = field(default_factory=list)
    canonical: list = field(default_factory=list)
    edges: dict = field(default_factory=dict)       # (src,dst,rel) -> [conf, n]
    triples: set = field(default_factory=set)        # {(subj, pred, obj)}


def run_oracle(documents: list[tuple[str, str]], cfg: PipelineConfig = DEFAULT_CONFIG
               ) -> OracleResult:
    """documents: list of (doc_id, full_text)."""
    res = OracleResult()
    raw_edges: list[tuple[str, str, str, str]] = []  # (src_id, dst_id, rel, chunk_id)

    for doc_id, text in documents:
        for idx, start, end, content in chunk_doc(
                text, cfg.chunking_strategy, cfg.chunk_size,
                cfg.chunk_overlap, cfg.min_chunk_size):
            chunk_id = f"{doc_id}_{idx}"
            res.chunks.append(
                {"chunk_id": chunk_id, "doc_id": doc_id, "chunk_idx": idx,
                 "content": content, "start_offset": start, "end_offset": end}
            )
            ents = extract_entities(content, cfg.min_confidence, cfg.entity_types)
            for e in ents:
                res.entity_rows.append(
                    {"doc_id": doc_id, "chunk_id": chunk_id, "entity_id": e.entity_id,
                     "name": e.name, "entity_type": e.entity_type,
                     "confidence": e.confidence, "n_mentions": e.n_mentions}
                )
            if cfg.extract_relationships and len(ents) >= 2:
                for src, dst, rel in extract_relationships(ents, content):
                    raw_edges.append((src, dst, rel, chunk_id))

    exact = exact_clusters_from_rows(
        [(r["doc_id"], r["name"], r["entity_type"], r["confidence"], r["n_mentions"])
         for r in res.entity_rows]
    )
    res.canonical = canonicalize(
        exact, threshold=cfg.fuzzy_threshold,
        max_edit_distance=cfg.max_edit_distance, use_phonetic=cfg.use_phonetic,
    )
    alias = {}
    for c in res.canonical:
        for mid in c.member_entity_ids:
            alias[mid] = (c.canonical_id, c.canonical_name)

    for src, dst, rel, _chunk in raw_edges:
        s, d = alias.get(src), alias.get(dst)
        if s is None or d is None:
            continue
        if s[0] == d[0]:
            continue
        key = (s[0], d[0], rel)
        slot = res.edges.get(key)
        if slot is None:
            res.edges[key] = [cfg.relationship_confidence, 1, s[1], d[1]]
        else:
            slot[1] += 1
        res.triples.add((s[1], rel, d[1]))
    return res


def triple_precision_recall(predicted: set, expected: set) -> tuple[float, float]:
    if not predicted and not expected:
        return 1.0, 1.0
    tp = len(predicted & expected)
    precision = tp / len(predicted) if predicted else 0.0
    recall = tp / len(expected) if expected else 0.0
    return precision, recall
