"""Cross-encoder reranking (reference
graphrag-core/src/reranking/cross_encoder.rs).

The reference's real path loads a HuggingFace BERT cross-encoder
(CandleCrossEncoder, cross_encoder.rs:94-263) — no model weights exist in
this sandbox, so the scorer is a SEAM with three implementations:

- ``lexical_score`` — a deterministic Dice-overlap scorer (the
  exercisable fake; optionally sigmoid-normalized like the reference's
  ``normalize_scores`` logit path), used by the SQL-oracled surface;
- ``passthrough`` — the reference's ConfidenceCrossEncoder fallback
  (cross_encoder.rs:316-354): keeps candidate order, delta 0;
- a real model scorer plugs in as any callable (query, doc) -> float.

The rerank ORCHESTRATION (min-confidence filter, stable sort by reranked
score, top-k truncation, RerankingStats) is the reference semantics and
is what the oracle verifies.  Distribution shape: candidates arrive as a
Dataset batch stream; the scorer is a per-actor state (model load in
``__init__`` when real), so `map_batches(RerankStage, concurrency=N)` is
the scale path; the surface's per-query candidate lists are tiny.
"""

from __future__ import annotations

import math


def lexical_score(query: str, document: str, *,
                  normalize: bool = True) -> float:
    """Deterministic stand-in for the BERT pair logit: Dice coefficient
    of lowercased word sets, mapped through the same sigmoid the
    reference applies when ``normalize_scores`` (cross_encoder.rs:247-252)
    — centered so dice=0 → 0.269, dice=1 → 0.731, preserving order."""
    qw = set(query.lower().split())
    dw = set(document.lower().split())
    if not qw and not dw:
        dice = 0.0
    else:
        dice = 2.0 * len(qw & dw) / (len(qw) + len(dw))
    raw = 2.0 * dice - 1.0
    if normalize:
        return 1.0 / (1.0 + math.exp(-raw))
    return raw


def passthrough_score(query: str, document: str) -> float:
    """ConfidenceCrossEncoder::score_pair (cross_encoder.rs:347-349)."""
    return 0.0


def rerank(query: str, candidates: list[dict], *, scorer=lexical_score,
           top_k: int = 10, min_confidence: float = 0.0) -> list[dict]:
    """CrossEncoder::rerank (cross_encoder.rs:168-198): score every
    (query, content) pair, drop below min_confidence, stable sort by
    reranked score DESC, truncate top_k.  Candidates: {id, content,
    score}."""
    ranked = []
    for c in candidates:
        score = scorer(query, c["content"])
        if score >= min_confidence:
            ranked.append({
                "id": c["id"], "content": c["content"],
                "relevance_score": score, "original_score": c["score"],
                "score_delta": score - c["score"],
            })
    ranked.sort(key=lambda r: -r["relevance_score"])  # stable
    return ranked[:top_k]


def reranking_stats(original_count: int, ranked: list[dict]) -> dict:
    """RerankingStats::from_results (cross_encoder.rs:284-314)."""
    n = len(ranked)
    avg = sum(r["score_delta"] for r in ranked) / n if n else 0.0
    mx = max((r["score_delta"] for r in ranked), default=0.0)
    rate = ((original_count - n) / original_count * 100.0
            if original_count else 0.0)
    return {"candidates_count": original_count, "results_count": n,
            "avg_score_improvement": avg, "max_score_improvement": mx,
            "filter_rate": rate}


class RerankStage:
    """Actor-pool stage shape for batched reranking: scorer state built
    once per actor (a real cross-encoder would load its weights here),
    batches of (query, id, content, score) rows scored in __call__."""

    def __init__(self, scorer=None, top_k: int = 10,
                 min_confidence: float = 0.0):
        self.scorer = scorer or lexical_score
        self.top_k = top_k
        self.min_confidence = min_confidence

    def __call__(self, batch):
        import pyarrow as pa

        queries = batch.column("query").to_pylist()
        ids = batch.column("id").to_pylist()
        contents = batch.column("content").to_pylist()
        scores = batch.column("score").to_pylist()
        out = {"query": [], "id": [], "relevance_score": [],
               "original_score": [], "score_delta": []}
        for q, i, c, s in zip(queries, ids, contents, scores):
            sc = self.scorer(q, c)
            if sc >= self.min_confidence:
                out["query"].append(q)
                out["id"].append(i)
                out["relevance_score"].append(sc)
                out["original_score"].append(float(s))
                out["score_delta"].append(sc - float(s))
        return pa.Table.from_pydict({
            "query": pa.array(out["query"], pa.string()),
            "id": pa.array(out["id"], pa.string()),
            "relevance_score": pa.array(out["relevance_score"],
                                        pa.float64()),
            "original_score": pa.array(out["original_score"], pa.float64()),
            "score_delta": pa.array(out["score_delta"], pa.float64()),
        })
