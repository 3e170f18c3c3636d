"""Metrics collector + batched mock-LLM backend (reference
graphrag-core/src/monitoring/metrics_collector.rs and
generation/async_mock_llm.rs).

Counters / gauges / histograms with the reference's ``name:k=v,...``
tag-key flattening and nearest-rank percentile indices, plus the
batched LLM seam: a usage-stats-tracking wrapper around any
``generate(prompt) -> str`` callable with ``complete_batch``, and the
actor-pool `map_batches` stage shape for batched inference (model /
client state built once per actor in ``__init__``).
"""

from __future__ import annotations


class MetricsCollector:
    """metrics_collector.rs:14-200."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.counters: dict[str, int] = {}
        self.gauges: dict[str, float] = {}
        self.histograms: dict[str, list[float]] = {}

    @staticmethod
    def metric_key(name: str, tags=None) -> str:
        if tags:
            return name + ":" + ",".join(f"{k}={v}" for k, v in tags)
        return name

    def counter(self, name: str, value: int = 1, tags=None) -> None:
        if not self.enabled:
            return
        key = self.metric_key(name, tags)
        self.counters[key] = self.counters.get(key, 0) + value

    def gauge(self, name: str, value: float, tags=None) -> None:
        if not self.enabled:
            return
        self.gauges[self.metric_key(name, tags)] = value

    def histogram(self, name: str, value: float, tags=None) -> None:
        if not self.enabled:
            return
        self.histograms.setdefault(self.metric_key(name, tags),
                                   []).append(value)

    def histogram_stats(self, name: str) -> dict | None:
        """metrics_collector.rs:61-90 — nearest-rank indices count/2,
        95%/100%, 99%/100% (the reference's integer arithmetic)."""
        values = self.histograms.get(name)
        if values is None:
            return None
        if not values:
            return {"count": 0, "sum": 0.0, "mean": 0.0, "min": 0.0,
                    "max": 0.0, "p50": 0.0, "p95": 0.0, "p99": 0.0}
        s = sorted(values)
        n = len(s)
        return {"count": n, "sum": sum(s), "mean": sum(s) / n,
                "min": s[0], "max": s[-1],
                "p50": s[n // 2],
                "p95": s[min(n * 95 // 100, n - 1)],
                "p99": s[min(n * 99 // 100, n - 1)]}

    def reset(self) -> None:
        self.counters.clear()
        self.gauges.clear()
        self.histograms.clear()

    def metric_count(self) -> int:
        return (len(self.counters) + len(self.gauges)
                + len(self.histograms))


class BatchedMockLLM:
    """async_mock_llm.rs:19-437 — usage-stats-tracking batched wrapper
    around a generate callable (defaults to the rule-based MockLLM).
    The reference estimates tokens as len(prompt)/4 and fans
    complete_batch out concurrently; here the batch path is the
    actor-pool stage below."""

    def __init__(self, generate=None, now_fn=None):
        if generate is None:
            from ..stages.generation import mock_generate_response
            generate = mock_generate_response
        self.generate = generate
        self._now = now_fn or (lambda: 0.0)
        self.total_requests = 0
        self.total_tokens = 0
        self.error_count = 0
        self.total_response_time = 0.0

    def complete(self, prompt: str) -> str:
        start = self._now()
        try:
            out = self.generate(prompt)
            err = False
        except Exception:
            err = True
            out = None
        self.total_requests += 1
        if err:
            self.error_count += 1
        else:
            self.total_tokens += len(prompt) // 4
        self.total_response_time += self._now() - start
        if err:
            raise RuntimeError("generation failed")
        return out

    def complete_batch(self, prompts: list[str]) -> list[str]:
        return [self.complete(p) for p in prompts]

    def usage_stats(self) -> dict:
        n = self.total_requests
        return {
            "total_requests": n,
            "total_tokens_processed": self.total_tokens,
            "error_count": self.error_count,
            "average_response_time":
                self.total_response_time / n if n else 0.0,
        }


class LLMAnswerStage:
    """Actor-pool batched-inference shape: the LLM client is per-actor
    state (built once in __init__ — a real backend would open its HTTP
    session or load weights here); each __call__ answers a batch of
    prompts.  Use with map_batches(LLMAnswerStage, concurrency=N,
    batch_size=B)."""

    def __init__(self, generate=None):
        self.llm = BatchedMockLLM(generate)

    def __call__(self, batch):
        import pyarrow as pa

        prompts = batch.column("prompt").to_pylist()
        answers = self.llm.complete_batch(prompts)
        return pa.Table.from_pydict({
            "prompt": pa.array(prompts, pa.string()),
            "answer": pa.array(answers, pa.string()),
        })
