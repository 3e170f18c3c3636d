"""L6 temporal graph analytics (graph/temporal.rs semantics)."""

import pyarrow as pa
import pytest

import ray

from graphrag_ray.stages.temporal import (
    classify_temporal_relation,
    default_strength,
    is_causal,
    snapshot_at,
    snapshot_range,
    snapshot_stats,
)


def _edges_table():
    # two point edges + one interval edge (temporal.rs:106-145)
    return pa.table({
        "src": ["A", "B", "C"],
        "dst": ["B", "C", "D"],
        "edge_type": ["FOUNDED", "FOUNDED", "EMPLOYS"],
        "timestamp": pa.array([100, 200, 150], pa.int64()),
        "weight": pa.array([1.0, 1.0, 1.0], pa.float32()),
        "start_time": pa.array([None, None, 120], pa.int64()),
        "end_time": pa.array([None, None, 300], pa.int64()),
    })


def test_snapshot_at_point_and_interval(ray_session):
    ds = ray.data.from_arrow(_edges_table())
    # at t=100: point edge A-B active; interval C-D not yet (120..300)
    rows = snapshot_at(ds, 100).take_all()
    assert [(r["src"], r["dst"]) for r in rows] == [("A", "B")]
    # at t=150: interval edge active, point edges only at exact ts
    rows = snapshot_at(ds, 150).take_all()
    assert [(r["src"], r["dst"]) for r in rows] == [("C", "D")]


def test_snapshot_range_overlap(ray_session):
    ds = ray.data.from_arrow(_edges_table())
    rows = snapshot_range(ds, 90, 130).take_all()
    got = sorted((r["src"], r["dst"]) for r in rows)
    # A-B (ts 100 in range) + C-D (interval 120..300 overlaps)
    assert got == [("A", "B"), ("C", "D")]
    rows = snapshot_range(ds, 400, 500).take_all()
    assert rows == []


def test_snapshot_stats_degrees(ray_session):
    ds = ray.data.from_arrow(_edges_table())
    deg = {r["node_id"]: r["degree"]
           for r in snapshot_stats(snapshot_range(ds, 0, 1000)).take_all()}
    assert deg == {"A": 1, "B": 2, "C": 2, "D": 1}


def test_classify_temporal_relation():
    # temporal.rs:60-80 relation types
    assert classify_temporal_relation(0, 10, 20, 30) == "Before"
    assert classify_temporal_relation(20, 30, 0, 10) == "After"
    assert classify_temporal_relation(5, 8, 0, 10) == "During"
    assert classify_temporal_relation(0, 10, 0, 10) == "SimultaneousWith"
    assert classify_temporal_relation(0, 10, 5, 20) == "Correlated"


def test_causal_strengths():
    # temporal.rs:83-104
    assert is_causal("Caused") and is_causal("Enabled") and is_causal("Prevented")
    assert not is_causal("Before")
    assert default_strength("Caused") == 0.9
    assert default_strength("Enabled") == 0.6
    assert default_strength("Prevented") == 0.7
    assert default_strength("Correlated") == 0.5
    assert default_strength("During") == 0.3
