"""Graph weight optimizer tests
(optimization/graph_weight_optimizer.rs)."""

import pytest

from graphrag_ray.stages.weight_optimizer import (boost_objective,
                                                  calculate_slope,
                                                  evaluate_heuristics,
                                                  normalize_weights,
                                                  optimize_weights,
                                                  total_improvement)

ENTS = [{"name": "Alice Harmon", "entity_type": "PERSON"},
        {"name": "Tokyo", "entity_type": "LOCATION"},
        {"name": "Corp", "entity_type": "ORGANIZATION"}]
RELS = [{"rel_type": "WORKS_FOR", "confidence": 0.5},
        {"rel_type": "LOCATED_IN", "confidence": 0.7}]


def test_normalize_and_boost():
    w = normalize_weights({"relevance": 2.0, "faithfulness": 1.0,
                           "conciseness": 1.0})
    assert w["relevance"] == pytest.approx(0.5)
    b = boost_objective({"relevance": 0.4, "faithfulness": 0.4,
                         "conciseness": 0.2}, "conciseness", 0.05)
    assert sum(b.values()) == pytest.approx(1.0)
    assert b["conciseness"] > 0.2 / 1.0


def test_evaluate_heuristics():
    r, f, c = evaluate_heuristics(ENTS, RELS, "alice harmon news",
                                  "alice works_for tokyo")
    # relevance: 1 matching entity / min(3,10)
    assert r == pytest.approx(1 / 3)
    # faithfulness: 'alice' in entity, 'works_for' in rel, 'tokyo' in
    # entity → 3/3
    assert f == pytest.approx(1.0)
    # conciseness: avg conf 0.6 * 0.7 + (1 - 2/100)*0.3
    assert c == pytest.approx(0.6 * 0.7 + 0.98 * 0.3)
    # empty expected answer → neutral faithfulness 0.5
    _, f2, _ = evaluate_heuristics(ENTS, RELS, "q", "")
    assert f2 == 0.5


def test_slope_and_improvement():
    hist = [{"combined_score": v, "relevance_score": v}
            for v in (0.1, 0.2, 0.3, 0.4)]
    assert calculate_slope(hist, 3, "relevance_score") == \
        pytest.approx(0.1)
    assert calculate_slope(hist[:2], 3, "relevance_score") == 0.0
    assert total_improvement(hist) == pytest.approx(0.3)


def test_optimize_loop_flat_metrics_boost_weights():
    tq = [{"query": "alice", "expected_answer": "alice", "weight": 1.0}]
    hist = optimize_weights(ENTS, RELS, tq, max_iterations=6)
    assert len(hist) == 6
    # metrics flat (placeholder adjust step)
    assert hist[0]["relevance_score"] == hist[5]["relevance_score"]
    # weights unchanged through iteration 3's RECORD, then drift
    assert hist[3]["weights"] == hist[0]["weights"]
    assert hist[4]["weights"] != hist[3]["weights"]
    assert sum(hist[5]["weights"].values()) == pytest.approx(1.0)
    with pytest.raises(ValueError):
        optimize_weights(ENTS, RELS, [])
