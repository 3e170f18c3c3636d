"""Benchmark harness + processing metrics (stages/monitoring.py vs
reference monitoring/benchmark.rs + async_processing/monitoring.rs)."""

import math

import pyarrow as pa
import pytest

import ray

from graphrag_ray.stages import monitoring as m


# --- quality metric known values (benchmark.rs:843-861 test parity + hand
# computations)


def test_f1_reference_cases():
    assert m.f1_token_overlap("hello world", "hello world") == pytest.approx(1.0)
    partial = m.f1_token_overlap("hello world", "hello there")
    assert 0.0 < partial < 1.0
    assert m.f1_token_overlap("foo bar", "baz qux") == 0.0
    assert m.f1_token_overlap("", "x") == 0.0


def test_f1_duplicates_count_unclipped():
    # reference counts EVERY candidate token contained in the truth list
    # (benchmark.rs:460-466): "a a a" vs "a b" -> common=3, p=1, r=3/2
    got = m.f1_token_overlap("a a a", "a b")
    p, r = 3 / 3, 3 / 2
    assert got == pytest.approx(2 * p * r / (p + r))


def test_exact_match_trim_case():
    assert m.exact_match("  Foo Bar ", "foo bar") == 1.0
    assert m.exact_match("foo", "bar") == 0.0


def test_bleu_perfect_and_zero():
    assert m.bleu("a b c d e", "a b c d e") == pytest.approx(1.0)
    # any zero n-gram precision -> 0 (here: no common 4-gram)
    assert m.bleu("a b c d", "a b c e") == 0.0
    assert m.bleu("", "a") == 0.0


def test_bleu_hand_computed():
    # cand = "a b c d d", ref = "a b c d" (hand-derived, clipped counts)
    cand, ref = "a b c d d", "a b c d"
    p1 = 4 / 5          # a,b,c,d match; second d clipped
    p2 = 3 / 4          # ab,bc,cd; "d d" not in ref
    p3 = 2 / 3          # abc,bcd
    p4 = 1 / 2          # abcd
    expect = math.exp((math.log(p1) + math.log(p2) + math.log(p3)
                       + math.log(p4)) / 4)  # BP=1 (cand longer)
    assert m.bleu(cand, ref) == pytest.approx(expect)


def test_bleu_brevity_penalty():
    # cand shorter than ref and all precisions 1 -> BLEU = BP < 1
    cand, ref = "a b c d", "a b c d e"
    bp = math.exp(1 - 5 / 4)
    assert m.bleu(cand, ref) == pytest.approx(bp)


def test_rouge_l_hand_computed():
    # LCS("a b c d", "a c b d") = 3 ("a b d" or "a c d")
    cand, ref = "a b c d", "a c b d"
    p = r = 3 / 4
    b2 = 1.2 * 1.2
    expect = (1 + b2) * p * r / (b2 * p + r)
    assert m.rouge_l(cand, ref) == pytest.approx(expect)
    assert m.rouge_l("x", "y") == 0.0
    assert m.rouge_l("a b", "a b") == pytest.approx(1.0)


def test_lcs_length():
    assert m._lcs_length(list("abcbdab"), list("bdcaba")) == 4
    assert m._lcs_length([], ["a"]) == 0


def test_quality_batch_columns():
    t = pa.table({"generated": ["a b", "x"], "ground_truth": ["a b", "y"]})
    out = m.quality_batch(t)
    assert out.column("exact_match").to_pylist() == [1.0, 0.0]
    assert out.column("f1_score").to_pylist()[0] == pytest.approx(1.0)
    assert out.column("rouge_l").to_pylist()[1] == 0.0


# --- runner (simulation + injected callables)


def test_runner_simulation_mode(ray_session):
    qs = ray.data.from_items([
        {"question": "What is 2+2?", "answer": "4"},
        {"question": "q2", "answer": "Generated answer for: q2"},
    ])
    runner = m.BenchmarkRunner(m.BenchmarkConfig(enable_lightrag=True))
    s = runner.run_dataset("Test", qs)
    assert s["total_queries"] == 2
    assert s["total_input_tokens"] == 400      # LightRAG: 200/query
    assert s["total_output_tokens"] == 200
    assert s["avg_exact_match"] == pytest.approx(0.5)  # q2 matches
    assert s["avg_latency_ms"] >= 0.0
    assert s["features"] == ["LightRAG"]
    # cost: 200/1000*0.0001 + 100/1000*0.0003 per query
    assert s["total_cost_usd"] == pytest.approx(2 * (0.00002 + 0.00003))


def test_runner_with_callables(ray_session):
    qs = ray.data.from_items([{"question": "q", "answer": "doc1 doc2"}])
    runner = (m.BenchmarkRunner(m.BenchmarkConfig(enable_cross_encoder=True))
              .with_retrieval(lambda q: ["doc2", "doc1"])
              .with_reranker(lambda docs: sorted(docs))
              .with_llm(lambda q, docs: " ".join(docs)))
    s = runner.run_dataset("rag", qs)
    assert s["avg_exact_match"] == 1.0         # rerank sorts -> "doc1 doc2"
    assert s["features"] == ["Cross-Encoder"]


def test_runner_empty_dataset(ray_session):
    qs = ray.data.from_items([{"question": "x", "answer": "y"}]).filter(
        lambda r: False)
    s = m.BenchmarkRunner().run_dataset("empty", qs)
    assert s["total_queries"] == 0
    assert s["avg_f1_score"] == 0.0


def test_compare_summaries():
    base = {"avg_exact_match": 0.5, "avg_f1_score": 0.4,
            "total_input_tokens": 2000, "total_cost_usd": 0.2,
            "avg_latency_ms": 100.0}
    imp = {"avg_exact_match": 0.75, "avg_f1_score": 0.5,
           "total_input_tokens": 200, "total_cost_usd": 0.02,
           "avg_latency_ms": 80.0}
    d = m.compare_summaries(base, imp)
    assert d["exact_match_improvement_pct"] == pytest.approx(50.0)
    assert d["f1_improvement_pct"] == pytest.approx(25.0)
    assert d["token_reduction_pct"] == pytest.approx(900.0)
    assert d["latency_change_pct"] == pytest.approx(-20.0)


# --- ProcessingMetrics (async_processing/monitoring.rs semantics)


def test_processing_metrics_success_rates():
    pm = m.ProcessingMetrics()
    assert pm.get_query_success_rate() == 1.0   # no queries -> 1.0
    pm.increment_query_started()
    pm.increment_query_started()
    pm.increment_query_success()
    pm.increment_query_error()
    assert pm.get_query_success_rate() == 0.5
    assert pm.get_average_query_duration() is None
    pm.record_query_duration(0.2)
    pm.record_query_duration(0.4)
    assert pm.get_average_query_duration() == pytest.approx(0.3)


def test_processing_metrics_summary_shape():
    t = [0.0]
    pm = m.ProcessingMetrics(now_fn=lambda: t[0])
    pm.increment_document_processing_started()
    pm.increment_document_processing_success()
    pm.increment_batch_processing_started()
    pm.update_peak_memory_usage(100)
    pm.update_peak_memory_usage(50)     # no decrease
    t[0] = 2.5
    s = pm.get_summary()
    assert s["documents"]["success_rate"] == 1.0
    assert s["system"]["peak_memory_usage"] == 100
    assert s["system"]["uptime"] == pytest.approx(2.5)
    assert s["system"]["batches_processed"] == 1
