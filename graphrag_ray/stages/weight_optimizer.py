"""Graph weight optimizer — simplified DW-GRPO (reference
graphrag-core/src/optimization/graph_weight_optimizer.rs).

Heuristic graph-quality evaluation (query-token entity relevance,
answer-token faithfulness, confidence/complexity conciseness), the
objective-weight normalize/boost machinery, slope-based stagnation
detection and the iteration loop.

Two faithful reference quirks are preserved: the weight-adjustment step
is a placeholder (the graph never actually changes, so every iteration
re-measures the same metrics), and with flat metrics all three slopes
are zero, so each post-window iteration boosts and renormalizes all
three objective weights.
"""

from __future__ import annotations

LEARNING_RATE = 0.1      # OptimizerConfig::default
MAX_ITERATIONS = 20
SLOPE_WINDOW = 3
STAGNATION_THRESHOLD = 0.01

DEFAULT_WEIGHTS = {"relevance": 0.4, "faithfulness": 0.4,
                   "conciseness": 0.2}


def normalize_weights(w: dict[str, float]) -> dict[str, float]:
    s = w["relevance"] + w["faithfulness"] + w["conciseness"]
    if s > 0.0:
        return {k: v / s for k, v in w.items()}
    return dict(w)


def boost_objective(w: dict[str, float], objective: str,
                    boost: float) -> dict[str, float]:
    w = dict(w)
    if objective in w:
        w[objective] += boost
    return normalize_weights(w)


def evaluate_heuristics(entities: list[dict], relationships: list[dict],
                        query: str, expected_answer: str
                        ) -> tuple[float, float, float]:
    """graph_weight_optimizer.rs:357-442 — (relevance, faithfulness,
    conciseness).  ``entities``: [{name, entity_type}]; ``relationships``:
    [{rel_type, confidence}]."""
    qtoks = [t for t in query.lower().split() if len(t) > 2]
    atoks = expected_answer.lower().split()
    matching = 0
    for e in entities:
        el = e["name"].lower()
        if any(t in el for t in qtoks):
            matching += 1
    total = len(entities)
    relevance = min(matching / min(total, 10), 1.0) if total else 0.0
    if atoks:
        found = 0
        for t in atoks:
            hit = any(t in e["name"].lower()
                      or t in e["entity_type"].lower()
                      for e in entities) \
                or any(t in r["rel_type"].lower() for r in relationships)
            if hit:
                found += 1
        faithfulness = found / len(atoks)
    else:
        faithfulness = 0.5
    n_rels = len(relationships)
    avg_conf = (sum(r["confidence"] for r in relationships)
                / max(n_rels, 1))
    complexity_penalty = min(n_rels / 100.0, 1.0)
    conciseness = avg_conf * 0.7 + (1.0 - complexity_penalty) * 0.3
    return relevance, faithfulness, conciseness


def evaluate_queries(entities: list[dict], relationships: list[dict],
                     test_queries: list[dict]
                     ) -> tuple[float, float, float]:
    """Weighted mean over test queries (rs:311-355).  Test query:
    {query, expected_answer, weight}."""
    tr = tf = tc = tw = 0.0
    for tq in test_queries:
        w = tq.get("weight", 1.0)
        r, f, c = evaluate_heuristics(entities, relationships,
                                      tq["query"], tq["expected_answer"])
        tr += r * w
        tf += f * w
        tc += c * w
        tw += w
    if tw > 0.0:
        return tr / tw, tf / tw, tc / tw
    return 0.0, 0.0, 0.0


def calculate_slope(history: list[dict], window: int, key: str) -> float:
    """rs:611-627."""
    if len(history) < window + 1:
        return 0.0
    recent = history[len(history) - window - 1:]
    return (recent[window][key] - recent[0][key]) / window


def optimize_weights(entities: list[dict], relationships: list[dict],
                     test_queries: list[dict],
                     max_iterations: int = MAX_ITERATIONS) -> list[dict]:
    """rs:228-305 — the iteration loop with stagnation boosting and the
    >0.95 early stop; returns the step history with the per-iteration
    objective-weight snapshots."""
    if not test_queries:
        raise ValueError("No test queries provided for optimization")
    weights = dict(DEFAULT_WEIGHTS)
    history: list[dict] = []
    for iteration in range(max_iterations):
        r, f, c = evaluate_queries(entities, relationships, test_queries)
        step = {"iteration": iteration, "relevance_score": r,
                "faithfulness_score": f, "conciseness_score": c,
                "combined_score": (r * weights["relevance"]
                                   + f * weights["faithfulness"]
                                   + c * weights["conciseness"]),
                "weights": dict(weights)}
        history.append(step)
        if iteration >= SLOPE_WINDOW:
            for key, name in (("relevance_score", "relevance"),
                              ("faithfulness_score", "faithfulness"),
                              ("conciseness_score", "conciseness")):
                if abs(calculate_slope(history, SLOPE_WINDOW, key)) \
                        < STAGNATION_THRESHOLD:
                    weights = boost_objective(weights, name, 0.05)
        if r > 0.95 and f > 0.95 and c > 0.95:
            break
        # adjust_graph_weights is a reference placeholder: the graph is
        # never mutated, so the next iteration re-measures identically
    return history


def total_improvement(history: list[dict]) -> float:
    if len(history) < 2:
        return 0.0
    return history[-1]["combined_score"] - history[0]["combined_score"]


# fixed evaluation workload for the driver-oracled surface
WEIGHT_TEST_QUERIES: tuple[dict, ...] = (
    {"query": "alice harmon location", "expected_answer":
     "Alice Harmon lives in Berlin", "weight": 1.0},
    {"query": "corp offices tokyo", "expected_answer":
     "Corp is located in Tokyo", "weight": 2.0},
)
