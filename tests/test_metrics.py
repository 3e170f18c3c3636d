"""Metrics collector + batched mock LLM tests
(monitoring/metrics_collector.rs, generation/async_mock_llm.rs)."""

import pytest

from graphrag_ray.state.metrics import (BatchedMockLLM, LLMAnswerStage,
                                        MetricsCollector)


def test_metric_key_tag_flattening():
    assert MetricsCollector.metric_key("a") == "a"
    assert MetricsCollector.metric_key("a", [("x", "1"), ("y", "2")]) \
        == "a:x=1,y=2"


def test_counters_gauges_and_disable():
    m = MetricsCollector()
    m.counter("hits")
    m.counter("hits", 4)
    m.gauge("temp", 1.5)
    m.gauge("temp", 2.5)
    assert m.counters["hits"] == 5
    assert m.gauges["temp"] == 2.5
    assert m.metric_count() == 2
    off = MetricsCollector(enabled=False)
    off.counter("x")
    assert off.metric_count() == 0
    m.reset()
    assert m.metric_count() == 0


def test_histogram_nearest_rank():
    m = MetricsCollector()
    for v in [5.0, 1.0, 3.0, 2.0, 4.0]:
        m.histogram("lat", v)
    st = m.histogram_stats("lat")
    assert st["count"] == 5 and st["min"] == 1.0 and st["max"] == 5.0
    assert st["mean"] == pytest.approx(3.0)
    # reference integer indices: p50 = sorted[5//2] = 3.0,
    # p95 = sorted[min(4,4)] = 5.0
    assert st["p50"] == 3.0 and st["p95"] == 5.0
    assert m.histogram_stats("missing") is None


def test_batched_mock_llm_stats():
    clock = [0.0]

    def now():
        clock[0] += 0.5
        return clock[0]

    llm = BatchedMockLLM(generate=lambda p: p.upper(), now_fn=now)
    out = llm.complete_batch(["abcd" * 2, "efgh" * 3])
    assert out == ["ABCD" * 2, "EFGH" * 3]
    st = llm.usage_stats()
    assert st["total_requests"] == 2
    assert st["total_tokens_processed"] == 2 + 3  # len//4 per prompt
    assert st["average_response_time"] == pytest.approx(0.5)

    def boom(p):
        raise ValueError("nope")

    bad = BatchedMockLLM(generate=boom)
    with pytest.raises(RuntimeError):
        bad.complete("x")
    assert bad.usage_stats()["error_count"] == 1


def test_llm_answer_stage_batch():
    import pyarrow as pa

    stage = LLMAnswerStage()
    out = stage(pa.table({"prompt": [
        "Context:\nAlice runs fast.\n\nQuestion: alice\n\nBased on the "
        "provided context, please answer the question. If the context "
        "doesn't contain enough information, please say so."]}))
    assert "Alice runs fast" in out.column("answer").to_pylist()[0]
