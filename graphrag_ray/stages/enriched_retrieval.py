"""Enriched metadata-aware retrieval (retrieval/enriched.rs).

Boosts chunks whose enrichment metadata (keywords, chapter/section
structure, summaries) matches the query. Per-chunk scoring is pure —
the Ray shape is a single ``map_batches`` over the enriched-chunk table
(no shuffle; base scores arrive as a broadcast dict when present).
"""

from __future__ import annotations

import re

import pyarrow as pa

STRUCTURE_PATTERNS = (
    re.compile(r"chapter\s+(\d+|[ivxlcdm]+|\w+)"),
    re.compile(r"section\s+(\d+\.?\d*)"),
    re.compile(r"part\s+(\d+|[ivxlcdm]+)"),
)

KEYWORD_MATCH_WEIGHT = 0.3
STRUCTURE_MATCH_WEIGHT = 0.2
SUMMARY_WEIGHT = 0.15
MIN_KEYWORD_MATCHES = 1


def extract_structure_references(query_lower: str) -> list[str]:
    """rs:341-365: the first 'chapter X' / 'section N' / 'part N' match
    per pattern (full matched span)."""
    refs = []
    for pattern in STRUCTURE_PATTERNS:
        m = pattern.search(query_lower)
        if m:
            refs.append(m.group(0))
    return refs


def completeness_score(meta: dict) -> float:
    """core/metadata.rs:166-199 — nine equally weighted fields."""
    score = 0.0
    for field in ("chapter", "section", "subsection", "topic", "summary",
                  "structural_level", "position_in_document"):
        if meta.get(field) is not None:
            score += 1.0
    if meta.get("keywords"):
        score += 1.0
    if meta.get("heading_path"):
        score += 1.0
    return score / 9.0


def matches_query(text: str, query_words: set[str]) -> bool:
    """rs:306-313: at least half (>=1) of the query words occur."""
    low = text.lower()
    hits = sum(1 for w in query_words if w in low)
    return hits >= max(len(query_words) // 2, 1)


def structure_boost(meta: dict, structure_refs: list[str]):
    """rs:calculate_structure_boost: 0.5/0.3/0.2 per matching
    chapter/section/subsection containment; None without any match."""
    if not structure_refs:
        return None
    boost = 0.0
    for reference in structure_refs:
        ref = reference.lower()
        for field, w in (("chapter", 0.5), ("section", 0.3),
                         ("subsection", 0.2)):
            val = meta.get(field)
            if val is not None and ref in val.lower():
                boost += w
    return boost if boost > 0.0 else None


def score_chunk(query_words: set[str], structure_refs: list[str],
                meta: dict, base_score: float = 0.5):
    """rs:64-143 metadata_search scoring for one chunk: keyword-fraction
    boost, structure boost, summary relevance, completeness bonus; emits
    min(base + boost, 1.0) only when the boost exceeds 0.05."""
    keywords = meta.get("keywords") or []
    entities = meta.get("entities") or []
    if not entities and not keywords:
        return None
    boost = 0.0
    matches = sum(1 for k in keywords if k.lower() in query_words)
    if matches >= MIN_KEYWORD_MATCHES:
        boost += (matches / max(len(query_words), 1)) * KEYWORD_MATCH_WEIGHT
    sb = structure_boost(meta, structure_refs)
    if sb is not None:
        boost += sb * STRUCTURE_MATCH_WEIGHT
    summary = meta.get("summary")
    if summary is not None and matches_query(summary, query_words):
        boost += SUMMARY_WEIGHT
    if completeness_score(meta) > 0.7:
        boost += 0.05
    if boost <= 0.05:
        return None
    return min(base_score + boost, 1.0)


def make_metadata_search_fn(query: str, base_scores: dict | None = None):
    """map_batches UDF over enriched chunks (chunk_id, keywords list,
    summary, chapter, entities list, ...) → (chunk_id, score) rows for
    chunks whose metadata boost is significant."""
    query_lower = query.lower()
    query_words = {w for w in query_lower.split() if len(w) > 3}
    structure_refs = extract_structure_references(query_lower)
    base = base_scores or {}

    def fn(batch: pa.Table) -> pa.Table:
        cols = batch.column_names
        rows = batch.to_pylist()
        out_id, out_score = [], []
        for row in rows:
            meta = {k: row.get(k) for k in
                    ("keywords", "summary", "chapter", "section",
                     "subsection", "topic", "entities", "heading_path",
                     "structural_level", "position_in_document")
                    if k in cols}
            score = score_chunk(query_words, structure_refs, meta,
                                base.get(row["chunk_id"], 0.5))
            if score is not None:
                out_id.append(row["chunk_id"])
                out_score.append(score)
        return pa.Table.from_pydict(
            {"chunk_id": pa.array(out_id, pa.string()),
             "score": pa.array(out_score, pa.float64())}
        )

    return fn


def search_by_keywords(chunks_ds, keywords, top_k: int = 10):
    """rs:265-303: per chunk, score += 1/len(keywords) per case-insensitive
    keyword-list hit; top-k by (score DESC, chunk_id) — distributed as a
    per-batch partial top-k + tiny driver merge."""
    kws = [k.lower() for k in keywords]

    def fn(batch: pa.Table) -> pa.Table:
        out_id, out_score = [], []
        for row in batch.to_pylist():
            have = {k.lower() for k in (row.get("keywords") or [])}
            score = sum(1.0 / len(kws) for k in kws if k in have)
            if score > 0.0:
                out_id.append(row["chunk_id"])
                out_score.append(score)
        tbl = pa.Table.from_pydict(
            {"chunk_id": pa.array(out_id, pa.string()),
             "score": pa.array(out_score, pa.float64())}
        )
        return tbl

    import pandas as pd

    parts = chunks_ds.map_batches(fn, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pd.DataFrame({"chunk_id": [], "score": []})
    return (parts.sort_values(["score", "chunk_id"],
                              ascending=[False, True])
            .head(top_k).reset_index(drop=True))
