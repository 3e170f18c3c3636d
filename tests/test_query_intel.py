"""Query intelligence / adaptive routing / plan optimizer tests
(reference graphrag-core/src/query/*; mirrors the reference's own unit
tests plus hand-derived cost fixtures)."""

import pytest

from graphrag_ray.stages.query_intel import (GraphStats, QueryOptimizer,
                                             analyze_complexity,
                                             detect_query_type,
                                             rewrite_query, serialize_plan)


# ----------------------------------------------------------- intelligence

def test_query_type_detection_cascade():
    # intelligence.rs test_query_type_detection + cascade precedence
    assert detect_query_type("who is albert einstein") == "entity_lookup"
    assert detect_query_type("what is the relationship between x and y") \
        == "relationship"
    assert detect_query_type("how many planets are there") == "aggregation"
    assert detect_query_type("compare apples and oranges") == "comparison"
    assert detect_query_type("when did it happen") == "temporal"
    assert detect_query_type("why did it fail") == "causal"
    assert detect_query_type("random text") == "general"
    # "vs" substring quirk: "versus" also matched by "vs"
    assert detect_query_type("a vs b") == "comparison"


def test_synonym_expansion_order_and_dedup():
    r = rewrite_query("find the person")
    # originals in place, synonyms appended after their word in vec order
    assert r["rewritten"] == \
        "find search locate the person individual people"
    # an original word duplicating an earlier synonym IS appended
    r2 = rewrite_query("find search")
    assert r2["rewritten"] == "find search locate search"


def test_template_rewrite_first_match():
    r = rewrite_query("who is marie curie")
    assert r["rewritten"].startswith("entity: marie curie")
    r2 = rewrite_query("how many moons does jupiter have")
    assert r2["rewritten"].startswith("count: moons")


def test_stop_words_and_confidence():
    r = rewrite_query("the a an of")
    assert r["expanded_terms"] == []
    assert r["confidence"] == 0.5
    r2 = rewrite_query("einstein relativity")
    # 2 terms / (2 words + 1) = 2/3 specificity, 0.5 relevance
    assert r2["confidence"] == pytest.approx((2 / 3) * 0.6 + 0.5 * 0.4)


# ---------------------------------------------------------------- routing

def test_routing_bands():
    assert analyze_complexity("summarize")["complexity"] == "very_broad"
    assert analyze_complexity(
        "show me all the general themes overview")["complexity"] == "broad"
    assert analyze_complexity(
        "what is the relationship between alice and bob")["complexity"] \
        == "very_specific"
    a = analyze_complexity("plain words here")
    assert a["complexity"] == "medium" and a["suggested_level"] == 1


def test_routing_entity_indicators():
    # two indicators (" and " + "between") → -0.4
    a = analyze_complexity("links between alice and bob")
    assert a["entity_score"] == -0.4


# -------------------------------------------------------------- optimizer

@pytest.fixture
def stats():
    return GraphStats(
        total_entities=100,
        entities_by_type={"PERSON": 50, "ORGANIZATION": 10, "LOCATION": 20},
        total_relationships=200,
        average_degree=4.0,
    )


def test_scan_and_filter_costs(stats):
    opt = QueryOptimizer(stats)
    c = opt.estimate_cost(("scan", "PERSON"))
    assert c == {"cardinality": 50, "cost": 50.0, "selectivity": 0.5}
    f = opt.estimate_cost(("filter", "name", "x"))
    assert f["cardinality"] == 10 and f["cost"] == 100.0


def test_join_swap_puts_smaller_left(stats):
    opt = QueryOptimizer(stats)
    plan = ("join", "inner", ("scan", "PERSON"), ("scan", "ORGANIZATION"))
    best = opt.optimize(plan)
    assert serialize_plan(best) == \
        "Join(inner,Scan(ORGANIZATION),Scan(PERSON))"
    c = opt.estimate_cost(best)
    assert c["cardinality"] == int((50 * 10) ** 0.5)  # 22
    assert c["cost"] == 10 + 50 + 10 * 50.0


def test_greedy_threeway_join(stats):
    opt = QueryOptimizer(stats)
    plan = ("join", "inner",
            ("join", "inner", ("scan", "PERSON"), ("scan", "LOCATION")),
            ("scan", "ORGANIZATION"))
    best = opt.optimize(plan)
    # inner rewrite: P(50)>L(20) → (L,P); sub card √1000=31 > O(10) →
    # top swap → operands [O, L, P]; pair products: O·L=200 < O·P=500 <
    # L·P=1000 → join(O,L) first, then Join(P, Join(O,L))
    assert serialize_plan(best) == \
        "Join(inner,Scan(PERSON),Join(inner,Scan(ORGANIZATION)," \
        "Scan(LOCATION)))"


def test_neighbors_expansion_capped(stats):
    opt = QueryOptimizer(stats)
    c = opt.estimate_cost(("neighbors", ("scan", "PERSON"), "KNOWS", 2))
    # 50 * 4² = 800 capped at 100 total entities
    assert c["cardinality"] == 100
    assert c["cost"] == 50 + 100


def test_union_and_limit_arithmetic(stats):
    opt = QueryOptimizer(stats)
    u = opt.estimate_cost(
        ("union", ("scan", "LOCATION"), ("limit", ("scan", "PERSON"), 5)))
    assert u["cardinality"] == (20 + 5) * 9 // 10  # 22
    assert u["cost"] == 20.0 + 50.0
