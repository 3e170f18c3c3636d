"""Cross-encoder reranking tests (reranking/cross_encoder.rs)."""

import math

import pytest

from graphrag_ray.stages.rerank import (lexical_score, passthrough_score,
                                        rerank, reranking_stats)


def test_lexical_score_range_and_order():
    hi = lexical_score("alpha beta", "alpha beta")
    mid = lexical_score("alpha beta", "alpha gamma")
    lo = lexical_score("alpha beta", "delta gamma")
    assert hi > mid > lo
    assert hi == pytest.approx(1.0 / (1.0 + math.exp(-1.0)))
    assert lo == pytest.approx(1.0 / (1.0 + math.exp(1.0)))
    assert lexical_score("a", "a", normalize=False) == pytest.approx(1.0)


def test_rerank_filters_sorts_truncates():
    cands = [{"id": f"c{i}", "content": c, "score": 0.5}
             for i, c in enumerate(
                 ["alpha beta", "unrelated words", "alpha gamma"])]
    ranked = rerank("alpha beta", cands, min_confidence=0.45, top_k=2)
    assert [r["id"] for r in ranked] == ["c0", "c2"]
    assert ranked[0]["score_delta"] == \
        pytest.approx(ranked[0]["relevance_score"] - 0.5)


def test_rerank_stable_on_ties():
    cands = [{"id": "a", "content": "x y", "score": 0.1},
             {"id": "b", "content": "x y", "score": 0.9}]
    ranked = rerank("x y", cands)
    assert [r["id"] for r in ranked] == ["a", "b"]  # insertion order kept


def test_passthrough_scorer():
    cands = [{"id": "a", "content": "anything", "score": 0.4}]
    ranked = rerank("q", cands, scorer=passthrough_score)
    assert ranked[0]["relevance_score"] == 0.0
    assert ranked[0]["score_delta"] == pytest.approx(-0.4)


def test_stats():
    ranked = [{"score_delta": 0.2}, {"score_delta": -0.1}]
    st = reranking_stats(4, ranked)
    assert st["results_count"] == 2
    assert st["avg_score_improvement"] == pytest.approx(0.05)
    assert st["max_score_improvement"] == pytest.approx(0.2)
    assert st["filter_rate"] == pytest.approx(50.0)
    empty = reranking_stats(0, [])
    assert empty["filter_rate"] == 0.0
