"""Quality-metrics tracker tests (rograg/quality_metrics.rs)."""

import pytest

from graphrag_ray.state.quality_metrics import (QualityTracker,
                                                response_quality)


def test_response_quality_weights():
    q = response_quality("what is alpha", "alpha is here. thus beta.",
                         0.8, ["s1", "s2"], 2)
    # credibility: count 2/5 + diversity 2/2 → 0.7
    assert q["credibility"] == pytest.approx((2 / 5 + 1.0) / 2)
    acc = (0.8 + q["credibility"]) / 2
    assert q["accuracy"] == pytest.approx(acc)
    expected = min(acc * 0.3 + q["completeness"] * 0.25
                   + q["coherence"] * 0.2 + q["relevance"] * 0.15
                   + q["credibility"] * 0.1, 1.0)
    assert q["overall"] == pytest.approx(expected)


def test_relevance_filters_short_words():
    # all query words ≤3 chars → trivially relevant
    assert response_quality("a is it", "text", 0.5, [], 1)["relevance"] \
        == 1.0
    q = response_quality("quantum flux", "the quantum thing", 0.5, [], 1)
    assert q["relevance"] == 0.5


def test_coherence_repetition_penalty():
    rep = response_quality("q", "word word word word. thus end.",
                           0.5, [], 1)["coherence"]
    uniq = response_quality("q", "alpha beta gamma delta. thus end.",
                            0.5, [], 1)["coherence"]
    assert uniq > rep


def test_tracker_history_window_and_alerts():
    clock = [1000]
    t = QualityTracker(max_history=3, window_size=2, min_quality=0.9,
                       max_time_ms=100, now_fn=lambda: clock[0])
    for i in range(5):
        clock[0] += 1
        t.record_query(f"q{i}", content="short", confidence=0.1,
                       sources=[], subquery_types=["fallback"],
                       processing_time_ms=200, fallback_used=True)
    assert len(t.history) == 3          # bounded history
    assert len(t.window) == 2           # rolling window
    assert t.total_queries == 5
    # every record fires both alerts (low quality + slow); retention 1h
    kinds = {a.alert_type for a in t.alerts}
    assert kinds == {"quality_degradation", "performance_degradation"}


def test_tracker_alert_retention_one_hour():
    clock = [0]
    t = QualityTracker(min_quality=0.9, now_fn=lambda: clock[0])
    clock[0] = 10
    t.record_query("old", content="x", confidence=0.0, sources=[],
                   subquery_types=["fallback"], processing_time_ms=1,
                   fallback_used=True)
    n0 = len(t.alerts)
    clock[0] = 4000  # > old + 3600
    t.record_query("new", content="x", confidence=0.0, sources=[],
                   subquery_types=["fallback"], processing_time_ms=1,
                   fallback_used=True)
    assert n0 >= 1
    assert all(a.timestamp > 400 for a in t.alerts)


def test_throughput_last_ten_window():
    clock = [0]
    t = QualityTracker(now_fn=lambda: clock[0])
    for i in range(12):
        clock[0] = i * 2  # one query every 2s
        t.record_query(f"q{i}", content="x", confidence=0.5, sources=[],
                       subquery_types=["logic_form"], processing_time_ms=1,
                       fallback_used=False)
    # last 10 span 18s → 10/18 qps
    assert t.throughput_qps == pytest.approx(10 / 18)


def test_strategy_majority():
    assert QualityTracker._strategy(["logic_form", "fuzzy_match",
                                     "logic_form"]) == "logic_form"
    assert QualityTracker._strategy(["fuzzy_match", "fallback"]) \
        == "fuzzy_match"
    assert QualityTracker._strategy(["fallback", "fallback",
                                     "fuzzy_match"]) == "fallback"


def test_comparative_analysis():
    t = QualityTracker(now_fn=lambda: 1)
    for conf in (0.9, 0.8):
        t.record_query("q", content="alpha beta gamma delta epsilon zeta",
                       confidence=conf, sources=["s1", "t2"],
                       subquery_types=["logic_form", "logic_form"],
                       processing_time_ms=10, fallback_used=False)
    base_t = QualityTracker(now_fn=lambda: 1)
    for conf in (0.2, 0.3):
        base_t.record_query("q", content="x", confidence=conf, sources=[],
                            subquery_types=["fallback"],
                            processing_time_ms=50, fallback_used=True)
    cmp_res = t.compare(list(base_t.history))
    assert cmp_res["improvements"]["accuracy_improvement"] > 0
    assert cmp_res["sample_size"] == 2
    assert 0 < cmp_res["significance"]["p_value_overall"] <= 0.1
    # improvement vs zero baseline → 100%
    assert QualityTracker.improvement(0.5, 0.0) == 100.0
    assert QualityTracker.improvement(0.0, 0.0) == 0.0
