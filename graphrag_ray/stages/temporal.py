"""L6: temporal graph analytics (graph/temporal.rs transcription).

The reference keeps a mutable TemporalGraph with per-timestamp edge
indexes; here the temporal edge set IS a Dataset with columns
(src, dst, edge_type, timestamp, weight, start_time, end_time) and every
operation is a vectorized filter/aggregate:

- ``snapshot_at`` / ``snapshot_range``: active-edge filters
  (temporal.rs:125-145 activity semantics: interval edges use [start,end]
  containment/overlap, point edges exact/in-range timestamp);
- ``snapshot_stats``: node degree + density of a snapshot
  (temporal.rs:184-200);
- ``classify_temporal_relation``: Allen-style Before/During/After/
  SimultaneousWith between two validity ranges (temporal.rs:28-104) with
  the reference's causal-type strength table.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

TEMPORAL_STRENGTH = {
    "Caused": 0.9,
    "Enabled": 0.6,
    "Prevented": 0.7,
    "Correlated": 0.5,
    "Before": 0.3,
    "During": 0.3,
    "After": 0.3,
    "SimultaneousWith": 0.3,
}

CAUSAL_TYPES = frozenset({"Caused", "Enabled", "Prevented"})


def is_causal(rel_type: str) -> bool:
    """temporal.rs:83-91."""
    return rel_type in CAUSAL_TYPES


def default_strength(rel_type: str) -> float:
    """temporal.rs:93-104."""
    return TEMPORAL_STRENGTH.get(rel_type, 0.3)


def classify_temporal_relation(a_start: int, a_end: int,
                               b_start: int, b_end: int) -> str:
    """Allen-style classification of range A vs range B
    (TemporalRelationType, temporal.rs:60-80)."""
    if a_end < b_start:
        return "Before"
    if a_start > b_end:
        return "After"
    if a_start == b_start and a_end == b_end:
        return "SimultaneousWith"
    if a_start >= b_start and a_end <= b_end:
        return "During"
    return "Correlated"  # partial overlap


def _active_at_mask(batch: pa.Table, timestamp: int):
    interval = pc.and_(pc.is_valid(batch.column("start_time")),
                       pc.is_valid(batch.column("end_time")))
    in_interval = pc.and_(
        pc.less_equal(pc.fill_null(batch.column("start_time"), timestamp + 1),
                      timestamp),
        pc.greater_equal(pc.fill_null(batch.column("end_time"), timestamp - 1),
                         timestamp),
    )
    point = pc.equal(batch.column("timestamp"), timestamp)
    return pc.if_else(interval, in_interval, point)


def _active_in_range_mask(batch: pa.Table, start: int, end: int):
    interval = pc.and_(pc.is_valid(batch.column("start_time")),
                       pc.is_valid(batch.column("end_time")))
    overlap = pc.and_(
        pc.less_equal(pc.fill_null(batch.column("start_time"), end + 1), end),
        pc.greater_equal(pc.fill_null(batch.column("end_time"), start - 1),
                         start),
    )
    point = pc.and_(pc.greater_equal(batch.column("timestamp"), start),
                    pc.less_equal(batch.column("timestamp"), end))
    return pc.if_else(interval, overlap, point)


def snapshot_at(edges_ds, timestamp: int):
    """Edges active at one instant (temporal.rs:254-263)."""
    return edges_ds.map_batches(
        lambda b: b.filter(_active_at_mask(b, timestamp)),
        batch_format="pyarrow",
    )


def snapshot_range(edges_ds, start: int, end: int):
    """Edges active anywhere in [start, end] (temporal.rs:266-276)."""
    return edges_ds.map_batches(
        lambda b: b.filter(_active_in_range_mask(b, start, end)),
        batch_format="pyarrow",
    )


def snapshot_stats(snapshot_ds):
    """Node degrees + density of a snapshot (temporal.rs:184-200):
    per-batch degree combiner → keyed sum; density = edges / (n*(n-1))."""
    from ray.data.aggregate import Sum

    def degree_partial(batch: pa.Table) -> pa.Table:
        acc: dict[str, int] = {}
        for s, d in zip(batch.column("src").to_pylist(),
                        batch.column("dst").to_pylist()):
            acc[s] = acc.get(s, 0) + 1
            acc[d] = acc.get(d, 0) + 1
        return pa.Table.from_pydict(
            {"node_id": pa.array(list(acc.keys()), pa.string()),
             "degree": pa.array(list(acc.values()), pa.int64())}
        )

    return (snapshot_ds.map_batches(degree_partial, batch_format="pyarrow")
            .groupby("node_id")
            .aggregate(Sum("degree", alias_name="degree")))


# ---------------------------------------------------------------------------
# Causal chain analysis (retrieval/causal_analysis.rs)

CAUSAL_KEYWORDS = ("caused", "led_to", "resulted_in", "enabled", "triggered")


def _is_causal_relationship(rel: dict, min_causal_strength: float) -> bool:
    """causal_analysis.rs:356-373: a causal temporal type gated by
    causal_strength (absent strength passes), else causal keywords in the
    relation type."""
    ttype = rel.get("temporal_type")
    if ttype is not None and is_causal(ttype):
        strength = rel.get("causal_strength")
        if strength is not None:
            return strength >= min_causal_strength
        return True
    low = (rel.get("rel_type") or "").lower()
    return any(kw in low for kw in CAUSAL_KEYWORDS)


def _step_timestamp(rel: dict):
    """Midpoint of the temporal range (causal_analysis.rs:90-92)."""
    s, e = rel.get("t_start"), rel.get("t_end")
    if s is None or e is None:
        return None
    return (int(s) + int(e)) // 2


def find_causal_chains(edges, cause: str, effect: str, *,
                       max_depth: int = 5, min_confidence: float = 0.5,
                       min_causal_strength: float = 0.3,
                       require_temporal_consistency: bool = False
                       ) -> list[dict]:
    """Causal chain discovery (causal_analysis.rs:247-321): BFS all simple
    paths cause→effect (depth- and confidence-gated), keep each path's
    CAUSAL steps only, score chains by the product of weighted step
    confidences (conf · (0.5 + 0.5·strength), 0.7 weight without a
    strength), validate temporal monotonicity over step midpoints, sort by
    confidence descending (stable — BFS discovery order breaks ties).

    ``edges`` is an iterable of dicts (src, dst, rel_type, confidence,
    optional t_start/t_end/temporal_type/causal_strength); like the
    reference's find_relationship, the FIRST edge listed for a (src, dst)
    pair is the one a path step uses."""
    from collections import deque

    adj: dict[str, list[dict]] = {}
    first_rel: dict[tuple[str, str], dict] = {}
    for e in edges:
        adj.setdefault(e["src"], []).append(e)
        first_rel.setdefault((e["src"], e["dst"]), e)

    paths: list[list[str]] = []
    queue: deque = deque([(cause, [cause])])
    while queue:
        current, path = queue.popleft()
        if len(path) > max_depth:
            continue
        if current == effect:
            paths.append(path)
            continue
        for rel in adj.get(current, ()):  # insertion order == input order
            nxt = rel["dst"]
            if nxt in path:
                continue
            if rel["confidence"] < min_confidence:
                continue
            queue.append((nxt, path + [nxt]))

    chains: list[dict] = []
    for path in paths:
        steps = []
        for i in range(len(path) - 1):
            rel = first_rel.get((path[i], path[i + 1]))
            if rel is not None and _is_causal_relationship(
                    rel, min_causal_strength):
                steps.append(rel)
        if not steps:
            continue
        product = 1.0
        for s in steps:
            strength = s.get("causal_strength")
            if strength is not None:
                product *= s["confidence"] * (0.5 + 0.5 * strength)
            else:
                product *= s["confidence"] * 0.7
        consistent = True
        prev_ts = None
        for s in steps:
            ts = _step_timestamp(s)
            if ts is not None:
                if prev_ts is not None and ts < prev_ts:
                    consistent = False
                    break
                prev_ts = ts
        first_ts = _step_timestamp(steps[0])
        last_ts = _step_timestamp(steps[-1])
        span = (last_ts - first_ts
                if first_ts is not None and last_ts is not None else None)
        if require_temporal_consistency and not consistent:
            continue
        chains.append({
            "cause": cause,
            "effect": effect,
            "path": " -> ".join(path),
            "n_steps": len(steps),
            "total_confidence": product,
            "temporal_consistency": consistent,
            "time_span": span,
        })
    chains.sort(key=lambda c: -c["total_confidence"])
    return chains
