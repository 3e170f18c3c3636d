"""Concept selection / query matching tests
(lightrag/{concept_selection,query_concepts}.rs)."""

import math

import pytest

from graphrag_ray.stages.concept_select import (match_query_to_concepts,
                                                pagerank_scores,
                                                rank_concepts, _tokenize)


def _nodes(*specs):
    return [{"concept": c, "frequency": f, "n_docs": d}
            for c, f, d in specs]


def test_rank_concepts_weights_and_floor():
    nodes = _nodes(("Alpha Beta", 5, 5), ("Gamma", 2, 2), ("Common", 9, 10))
    edges = [("Alpha Beta", "Gamma"), ("Alpha Beta", "Common")]
    ranked = rank_concepts(nodes, edges, total_documents=10)
    by = {r["concept"]: r for r in ranked}
    # degree: Alpha Beta touches both edges → 2/(3-1) = 1.0
    assert by["Alpha Beta"]["degree_score"] == pytest.approx(1.0)
    assert by["Gamma"]["degree_score"] == pytest.approx(0.5)
    # idf: tanh(ln(10/2)/5)
    assert by["Gamma"]["idf_score"] == \
        pytest.approx(math.tanh(math.log(5) / 5))
    # max-normalized pagerank gives the hub 1.0
    assert by["Alpha Beta"]["pagerank_score"] == pytest.approx(1.0)
    # ordering: score desc
    assert ranked[0]["concept"] == "Alpha Beta"
    for r in ranked:
        assert r["score"] >= 0.1


def test_rank_min_score_filter():
    # isolated common concept: degree 0, pr uniform → normalized 1.0?
    # single node: pr max-normalizes to 1 → 0.4 ≥ 0.1 stays
    ranked = rank_concepts(_nodes(("Only", 1, 10)), [], 10)
    assert len(ranked) == 1


def test_pagerank_dangling_and_convergence():
    pr = pagerank_scores(["a", "b", "c"], [("a", "b")])
    # c is dangling; mass redistributes — scores sum to ~1
    assert sum(pr.values()) == pytest.approx(1.0, abs=1e-6)
    assert pr["a"] == pytest.approx(pr["b"])


def test_tokenize_rules():
    # ≥2 chars BEFORE trim, edges trimmed, empties dropped
    assert _tokenize("A big, (test) x!!") == ["big", "test", "x!!".strip("!") or "x"] \
        or _tokenize("A big, (test) x!!") == ["big", "test", "x"]


def test_match_exact_fuzzy_and_boost():
    ranked = [{"concept": "Alice Harmon", "score": 0.5},
              {"concept": "Tokyo", "score": 0.4}]
    out = match_query_to_concepts("alice harmmon", ranked)
    m = out[0]
    assert m["concept"] == "Alice Harmon"
    # exact: "alice" ⊂ concept → 1/2; fuzzy: harmmon→harmon dist 1
    assert m["exact_score"] == pytest.approx(0.5)
    assert m["fuzzy_score"] > 0.9  # (1.0 + (1 - 1/7)) / 2
    assert m["match_score"] == pytest.approx(
        0.5 * 0.5 + 0.3 * m["fuzzy_score"] + 0.2 * 0.5)
    # Tokyo: no exact token, no fuzzy within distance 2 → dropped
    assert all(r["concept"] != "Tokyo" for r in out)


def test_match_empty_query_tokens():
    assert match_query_to_concepts("!", [{"concept": "X", "score": 1.0}]) \
        == []
