"""ROGRAG quality-metrics tracking (reference
graphrag-core/src/rograg/quality_metrics.rs).

Per-response quality scoring with quality_metrics.rs's OWN weights (they
differ from validator.rs's six-way mean), a bounded query history with
rolling performance statistics and throughput, a real-time monitoring
window with threshold alerts, and the comparative-analysis machinery
(aggregates, improvement percentages, the reference's heuristic
significance test).

The clock is injected (``now_fn``) so every path is deterministic under
test; nothing here depends on wall time.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

_TRANSITIONS = ("however", "therefore", "furthermore", "additionally",
                "meanwhile", "consequently", "moreover", "nevertheless",
                "thus", "hence")


def response_quality_metrics(query: str, content: str,
                             sources: list[str],
                             n_subqueries: int) -> dict:
    """quality_metrics.rs:986-1122 — the five scores and their weighted
    overall (0.3 accuracy + 0.25 completeness + 0.2 coherence +
    0.15 relevance + 0.1 credibility), given the response confidence is
    folded in by the caller via ``accuracy``."""
    # source credibility (rs:1104-1122) — 5-char prefixes here (the
    # validator uses 10)
    if not sources:
        credibility = 0.0
    else:
        count_score = min(len(sources) / 5.0, 1.0)
        prefixes = {s[:5] for s in sources}
        credibility = (count_score + len(prefixes) / len(sources)) / 2.0
    # completeness (rs:1022-1034) — 500-char / 3-source / 5-subquery norm
    completeness = (min(len(content) / 500.0, 1.0)
                    + min(len(sources) / 3.0, 1.0)
                    + min(n_subqueries / 5.0, 1.0)) / 3.0
    # coherence (rs:1036-1081) — transition density + repetition ratio
    sentences = _split_sentences(content)
    if len(sentences) <= 1:
        coherence = 1.0
    else:
        hits = sum(1 for s in sentences
                   if any(t in s.lower() for t in _TRANSITIONS))
        transition = min(hits / len(sentences), 1.0)
        words = content.split()
        repetition = len(set(words)) / len(words) if words else 1.0
        coherence = (transition + repetition) / 2.0
    # relevance (rs:1083-1102) — query words len>3 covered by the answer
    qwords = {w for w in query.lower().split() if len(w) > 3}
    if not qwords:
        relevance = 1.0
    else:
        awords = set(content.lower().split())
        relevance = len(qwords & awords) / len(qwords)
    return {"completeness": completeness, "coherence": coherence,
            "relevance": relevance, "credibility": credibility}


def _split_sentences(text: str) -> list[str]:
    out = []
    cur = []
    for ch in text:
        if ch in ".!?":
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return out


def response_quality(query: str, content: str, confidence: float,
                     sources: list[str], n_subqueries: int) -> dict:
    m = response_quality_metrics(query, content, sources, n_subqueries)
    accuracy = (confidence + m["credibility"]) / 2.0
    overall = min(accuracy * 0.3 + m["completeness"] * 0.25
                  + m["coherence"] * 0.2 + m["relevance"] * 0.15
                  + m["credibility"] * 0.1, 1.0)
    return {"accuracy": accuracy, **m, "overall": overall}


@dataclass
class QualityAlert:
    alert_type: str
    severity: str
    message: str
    timestamp: int
    metric_value: float
    threshold: float


@dataclass
class QueryRecord:
    timestamp: int
    query: str
    decomposition_success: bool
    subquery_count: int
    strategy: str
    quality: dict
    processing_time_ms: int
    fallback_used: bool
    confidence: float


class QualityTracker:
    """quality_metrics.rs:885-1505 — bounded history, rolling stats,
    alert window, comparative analysis."""

    def __init__(self, *, max_history: int = 1000, window_size: int = 20,
                 min_quality: float = 0.4, max_time_ms: int = 5000,
                 now_fn=None):
        self.history: deque[QueryRecord] = deque()
        self.max_history = max_history
        self.window: deque[QueryRecord] = deque()
        self.window_size = window_size
        self.min_quality = min_quality
        self.max_time_ms = max_time_ms
        self.alerts: list[QualityAlert] = []
        self.total_queries = 0
        self.throughput_qps = 0.0
        self._now = now_fn or (lambda: 0)

    def record_query(self, query: str, *, content: str, confidence: float,
                     sources: list[str], subquery_types: list[str],
                     processing_time_ms: int,
                     fallback_used: bool) -> QueryRecord:
        """quality_metrics.rs:931-975."""
        quality = response_quality(query, content, confidence, sources,
                                   len(subquery_types))
        rec = QueryRecord(
            timestamp=int(self._now()), query=query,
            decomposition_success=len(subquery_types) > 1,
            subquery_count=len(subquery_types),
            strategy=self._strategy(subquery_types),
            quality=quality, processing_time_ms=processing_time_ms,
            fallback_used=fallback_used, confidence=confidence)
        if len(self.history) >= self.max_history:
            self.history.popleft()
        self.history.append(rec)
        self.total_queries += 1
        self._update_throughput()
        if len(self.window) >= self.window_size:
            self.window.popleft()
        self.window.append(rec)
        self._check_alerts(rec)
        return rec

    @staticmethod
    def _strategy(subquery_types: list[str]) -> str:
        """quality_metrics.rs:1124-1160 — majority result type."""
        lf = subquery_types.count("logic_form")
        fz = subquery_types.count("fuzzy_match")
        fb = subquery_types.count("fallback")
        if lf >= fz and lf >= fb:
            return "logic_form"
        if fz >= fb:
            return "fuzzy_match"
        return "fallback"

    def _update_throughput(self) -> None:
        """quality_metrics.rs:1190-1206 — last-10 window qps."""
        if len(self.history) < 2:
            self.throughput_qps = 0.0
            return
        recent = list(self.history)[-10:][::-1]
        span = recent[0].timestamp - recent[-1].timestamp
        if span > 0:
            self.throughput_qps = len(recent) / span

    def _check_alerts(self, rec: QueryRecord) -> None:
        """quality_metrics.rs:1223-1272 with the one-hour retention."""
        ts = int(self._now())
        if rec.quality["overall"] < self.min_quality:
            self.alerts.append(QualityAlert(
                "quality_degradation", "high",
                f"Low quality response: {rec.quality['overall']:.2f}",
                ts, rec.quality["overall"], self.min_quality))
        if rec.processing_time_ms > self.max_time_ms:
            self.alerts.append(QualityAlert(
                "performance_degradation", "medium",
                f"Slow processing: {rec.processing_time_ms}ms",
                ts, float(rec.processing_time_ms), float(self.max_time_ms)))
        cutoff = max(ts - 3600, 0)
        self.alerts = [a for a in self.alerts if a.timestamp > cutoff]

    # -- comparative analysis (quality_metrics.rs:1274-1452)

    @staticmethod
    def aggregate(records: list[QueryRecord]) -> dict:
        if not records:
            raise ValueError("No metrics provided")
        n = len(records)
        mean = lambda k: sum(r.quality[k] for r in records) / n
        qs = [r.quality["overall"] for r in records]
        mq = sum(qs) / n
        var = sum((q - mq) ** 2 for q in qs) / n
        return {
            "mean_accuracy": mean("accuracy"),
            "mean_completeness": mean("completeness"),
            "mean_coherence": mean("coherence"),
            "mean_relevance": mean("relevance"),
            "mean_processing_time_ms":
                sum(r.processing_time_ms for r in records) / n,
            "success_rate":
                sum(1 for r in records if r.decomposition_success) / n,
            "std_dev_quality": var ** 0.5,
        }

    @staticmethod
    def improvement(new: float, base: float) -> float:
        if base == 0.0:
            return 100.0 if new > 0.0 else 0.0
        return (new - base) / base * 100.0

    def compare(self, baseline: list[QueryRecord]) -> dict:
        if not self.history or not baseline:
            raise ValueError("Insufficient data for comparison")
        ours = self.aggregate(list(self.history))
        base = self.aggregate(baseline)
        imp = {
            f"{k}_improvement": self.improvement(
                ours[f"mean_{k}"], base[f"mean_{k}"])
            for k in ("accuracy", "completeness", "coherence", "relevance")
        }
        imp["overall_improvement"] = self.improvement(
            sum(ours[f"mean_{k}"] for k in
                ("accuracy", "completeness", "coherence", "relevance")) / 4,
            sum(base[f"mean_{k}"] for k in
                ("accuracy", "completeness", "coherence", "relevance")) / 4)
        denom = (ours["std_dev_quality"] + base["std_dev_quality"]) / 2.0
        effect = ((ours["mean_accuracy"] - base["mean_accuracy"]) / denom
                  if denom else float("inf"))
        p_acc = 0.01 if abs(effect) > 0.5 else 0.1
        p_com = 0.05 if ours["mean_completeness"] > base["mean_completeness"] \
            else 0.1
        p_coh = 0.05 if ours["mean_coherence"] > base["mean_coherence"] \
            else 0.1
        p_all = (p_acc + p_com + p_coh) / 3.0
        return {"rograg": ours, "baseline": base, "improvements": imp,
                "significance": {
                    "p_value_accuracy": p_acc,
                    "p_value_completeness": p_com,
                    "p_value_coherence": p_coh,
                    "p_value_overall": p_all,
                    "is_significant_95": p_all < 0.05,
                    "effect_size": effect,
                },
                "sample_size": min(len(self.history), len(baseline))}
