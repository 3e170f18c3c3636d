"""HyperLogLog doc-frequency sketch (functions/sketch.py) — error bounds,
merge laws, and the config-gated pipeline path (VERDICT r01 item 7)."""

import numpy as np
import pytest

import ray

from graphrag_ray.config import PipelineConfig
from graphrag_ray.functions.sketch import (
    hll_add,
    hll_create,
    hll_estimate,
    hll_merge,
)
from graphrag_ray.pipelines.kg import build_kg
from graphrag_ray.synth import synth_documents_table


@pytest.mark.parametrize("n", [0, 1, 10, 100, 1000, 20000])
def test_estimate_error_bound(n):
    reg = hll_create()
    for i in range(n):
        hll_add(reg, f"doc_{i:08d}")
    est = hll_estimate(bytes(reg))
    if n == 0:
        assert est == 0
    else:
        # 1.04/sqrt(1024) ≈ 3.25% std error; allow 4 sigma
        assert abs(est - n) <= max(2, 0.13 * n), (n, est)


def test_merge_is_union():
    a, b = hll_create(), hll_create()
    for i in range(500):
        hll_add(a, f"a_{i}")
        hll_add(b, f"b_{i}")
    for i in range(250):  # overlap
        hll_add(b, f"a_{i}")
    merged = hll_merge(bytes(a), bytes(b))
    est = hll_estimate(merged)
    assert abs(est - 1000) <= 130
    # commutative + idempotent
    assert hll_merge(bytes(b), bytes(a)) == merged
    assert hll_merge(merged, merged) == merged
    # identity on empty
    assert hll_merge(b"", bytes(a)) == bytes(a)


def test_deterministic_across_processes():
    """md5-derived hashes: same items → same registers, any insert order."""
    import random

    items = [f"doc_{i}" for i in range(300)]
    a, b = hll_create(), hll_create()
    for it in items:
        hll_add(a, it)
    random.Random(7).shuffle(items)
    for it in items:
        hll_add(b, it)
    assert bytes(a) == bytes(b)


def test_pipeline_hll_mode_matches_exact_within_error(ray_session):
    """doc_frequency_mode='hll' runs the same keyed dataflow and lands
    within the sketch error of the exact doc frequencies; all other columns
    are identical."""
    tbl = synth_documents_table(60)
    docs = ray.data.from_arrow(tbl)
    exact = build_kg(docs, PipelineConfig(chunk_size=256, chunk_overlap=50))
    approx = build_kg(docs, PipelineConfig(chunk_size=256, chunk_overlap=50,
                                           doc_frequency_mode="hll"))
    e = {r["canonical_id"]: r for r in exact.entities.take_all()}
    a = {r["canonical_id"]: r for r in approx.entities.take_all()}
    assert set(e) == set(a)
    for cid, er in e.items():
        ar = a[cid]
        assert ar["mention_count"] == er["mention_count"]
        assert ar["confidence"] == er["confidence"]
        df_e, df_a = er["doc_frequency"], ar["doc_frequency"]
        assert abs(df_a - df_e) <= max(2, 0.13 * df_e), (cid, df_e, df_a)
    # triples unaffected by the doc-frequency representation
    te = {(r["subj"], r["pred"], r["obj"]) for r in exact.triples.take_all()}
    ta = {(r["subj"], r["pred"], r["obj"]) for r in approx.triples.take_all()}
    assert te == ta
