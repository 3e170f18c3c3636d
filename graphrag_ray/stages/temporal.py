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
