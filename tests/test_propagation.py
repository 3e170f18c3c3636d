"""Lazy propagation engine + async batch updater (§2.10 depth —
incremental/lazy_propagation.rs and incremental/async_batch.rs parity)."""

import time
import zlib

import pytest

import ray

from graphrag_ray.functions.linking import block_key
from graphrag_ray.functions.textfns import normalize_string
from graphrag_ray.state.propagation import (
    AsyncBatchConfig,
    AsyncBatchUpdater,
    LazyPropagationEngine,
    PropagationConfig,
    bucket_of,
)


def test_threshold_triggers_auto_propagation():
    eng = LazyPropagationEngine(PropagationConfig(propagation_threshold=3,
                                                  max_delay_seconds=1e9))
    eng.queue_node_update("PERSON_alice harmon", "PERSON")
    eng.queue_node_update("PERSON_bob tanner", "PERSON")
    assert eng.pending_count() == 2
    assert eng.propagation_stats()["propagations"] == 0
    eng.queue_node_update("PERSON_carol mendez", "PERSON")
    # third update crossed the threshold → auto-propagated
    assert eng.pending_count() == 0
    assert eng.propagation_stats() == {
        "propagations": 1, "updates_applied": 3, "cascaded": 0}
    assert eng.dirty_stats()["dirty_nodes"] == 3


def test_query_propagation_and_lazy_default():
    eng = LazyPropagationEngine(PropagationConfig(propagation_threshold=100,
                                                  max_delay_seconds=1e9))
    eng.queue_edge_update("PERSON_alice harmon", "ORGANIZATION_acme corp",
                          rel_type="WORKS_FOR")
    assert eng.pending_count() == 1  # lazily deferred
    res = eng.maybe_propagate_for_query()
    assert res is not None and res.applied == 1
    # edge update dirties both endpoints and the edge
    assert res.dirty_edges == [("PERSON_alice harmon",
                                "ORGANIZATION_acme corp")]
    assert len(res.dirty_nodes) == 2
    # nothing pending → a second query does not re-propagate
    assert eng.maybe_propagate_for_query() is None

    off = LazyPropagationEngine(PropagationConfig(propagate_on_query=False))
    off.queue_node_update("PERSON_x y")
    assert off.maybe_propagate_for_query() is None
    assert off.pending_count() == 1
    assert off.force_propagate().applied == 1


def test_dependency_cascade_bounded_depth():
    cfg = PropagationConfig(propagation_threshold=100,
                            max_propagation_depth=2)
    eng = LazyPropagationEngine(cfg)
    # chain a→b→c→d: depth 2 reaches b and c, NOT d
    eng.add_dependency("PERSON_b b", depends_on="PERSON_a a")
    eng.add_dependency("PERSON_c c", depends_on="PERSON_b b")
    eng.add_dependency("PERSON_d d", depends_on="PERSON_c c")
    eng.queue_node_update("PERSON_a a")
    res = eng.force_propagate()
    assert res.cascaded == 2
    assert res.dirty_nodes == ["PERSON_a a", "PERSON_b b", "PERSON_c c"]

    no_deps = LazyPropagationEngine(
        PropagationConfig(track_dependencies=False))
    no_deps.add_dependency("PERSON_b b", depends_on="PERSON_a a")
    no_deps.queue_node_update("PERSON_a a")
    assert no_deps.force_propagate().cascaded == 0


def test_invalidated_buckets_match_canonicalize_derivation():
    eng = LazyPropagationEngine(PropagationConfig(num_buckets=64))
    eng.queue_node_update("PERSON_alice harmon", "PERSON")
    res = eng.force_propagate()
    blk = block_key("PERSON", normalize_string("alice harmon"))
    assert res.invalidated_buckets == [zlib.crc32(blk.encode()) % 64]
    assert bucket_of("PERSON", "alice harmon") == res.invalidated_buckets[0]


def test_engine_as_ray_actor(ray_session):
    """The shared-mutable-state disposition: same engine behind an actor
    handle, updates queued from concurrent tasks."""
    Engine = ray.remote(LazyPropagationEngine)
    h = Engine.remote(PropagationConfig(propagation_threshold=10_000))

    @ray.remote
    def feed(i):
        ray.get(h.queue_node_update.remote(f"PERSON_p{i} q{i}", "PERSON"))
        return i

    ray.get([feed.remote(i) for i in range(20)])
    res = ray.get(h.force_propagate.remote())
    assert res.applied == 20
    assert len(res.dirty_nodes) == 20


def test_async_batch_updater_flush_and_stats(ray_session):
    seen = []

    def process(ops):
        # ops land on a Ray worker; side effects must flow through the
        # return value — this fn just burns a little CPU like a real apply
        assert all("op" in o for o in ops)
        seen.append(len(ops))  # worker-local, intentionally unused

    upd = AsyncBatchUpdater(process, AsyncBatchConfig(
        max_batch_size=10, max_batch_delay_sec=1e9, num_workers=3))
    for i in range(34):
        upd.submit({"op": "add_doc", "i": i})
    results = upd.shutdown()
    assert [b.n_operations for b in results] == [10, 10, 10, 4]
    assert [b.batch_id for b in results] == [1, 2, 3, 4]
    stats = upd.statistics()
    assert stats["submitted"] == 34
    assert stats["operations_completed"] == 34
    assert stats["batches_completed"] == 4
    assert stats["in_flight"] == 0


def test_async_batch_updater_age_flush(ray_session):
    upd = AsyncBatchUpdater(lambda ops: None, AsyncBatchConfig(
        max_batch_size=1000, max_batch_delay_sec=0.05, num_workers=2))
    upd.submit({"op": "a"})
    time.sleep(0.08)
    upd.submit({"op": "b"})   # age flush fires on this submit
    assert upd.statistics()["open_batch"] <= 1
    results = upd.shutdown()
    assert sum(b.n_operations for b in results) == 2


def test_async_batch_updater_backpressure_bounds_queue(ray_session):
    def slow(ops):
        time.sleep(0.05)

    cfg = AsyncBatchConfig(max_batch_size=5, max_batch_delay_sec=1e9,
                           num_workers=2, max_queue_size=15)
    upd = AsyncBatchUpdater(slow, cfg)
    for i in range(60):
        upd.submit({"op": i})
        # queue (open + in-flight estimate) never exceeds the bound
        st = upd.statistics()
        assert st["open_batch"] + st["in_flight"] * cfg.max_batch_size \
            <= cfg.max_queue_size
    results = upd.shutdown()
    assert sum(b.n_operations for b in results) == 60


def test_refresh_dirty_buckets_equals_full_rebuild(ray_session):
    """End-to-end lazy propagation: new docs' entities queue into the
    engine; the engine's invalidated buckets drive a bucket-selective
    canonicalization refresh that must equal the full rebuild EXACTLY —
    while actually recomputing only a fraction of the buckets."""
    import ray.data as rd

    from graphrag_ray.config import PipelineConfig
    from graphrag_ray.pipelines.incremental import (extraction_for_docs,
                                                    refresh_dirty_buckets)
    from graphrag_ray.pipelines.kg import build_kg
    from graphrag_ray.state.propagation import PropagationConfig
    from graphrag_ray.synth import synth_documents_table

    cfg = PipelineConfig(chunk_size=512, chunk_overlap=100)
    all_docs = synth_documents_table(40)
    docs_a = rd.from_arrow(all_docs.slice(0, 30))
    docs_b = rd.from_arrow(all_docs.slice(30, 10))
    docs_ab = rd.from_arrow(all_docs)

    # previous state: full build on A
    res_a = build_kg(docs_a, cfg)

    # ground truth: full rebuild on A+B
    want = build_kg(docs_ab, cfg).entities.to_pandas() \
        .sort_values("canonical_id").reset_index(drop=True)

    # incremental: queue every entity B's extraction emits
    ext_b = extraction_for_docs(docs_b, cfg).materialize()
    eng = LazyPropagationEngine(PropagationConfig(propagation_threshold=10**9))
    ent_rows = ext_b.to_pandas()
    ent_rows = ent_rows[ent_rows["row_kind"] == "entity"]
    for _, r in ent_rows.iterrows():
        eng.queue_node_update(r["entity_id"], r["entity_type"],
                              name=r["name"])
    res = eng.force_propagate()
    assert 0 < len(res.invalidated_buckets) < 64  # genuinely selective

    combined = res_a.extraction.union(ext_b)
    # the canonical-full view (with member ids) is what refresh operates on
    prev_canonical_full = _canonical_full_of(res_a.extraction, cfg)
    got_ds = refresh_dirty_buckets(prev_canonical_full, combined,
                                   res.invalidated_buckets, cfg)
    got = got_ds.to_pandas().drop(columns=["member_entity_ids"]) \
        .sort_values("canonical_id").reset_index(drop=True)
    want = want.sort_index(axis=1)
    got = got.sort_index(axis=1)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for col in want.columns:
        assert (got[col].astype(str).to_numpy()
                == want[col].astype(str).to_numpy()).all(), col


def _canonical_full_of(extraction, cfg):
    """Full canonicalization (with member_entity_ids) from an extraction
    Dataset — the 'previous state' a real deployment persists."""
    from graphrag_ray.stages.canonicalize import (make_finalize_bucket_fn,
                                                  make_partial_aggregate_fn)

    partials = extraction.map_batches(
        make_partial_aggregate_fn(cfg.salt_partitions,
                                  doc_frequency_mode=cfg.doc_frequency_mode,
                                  hll_p=cfg.hll_precision),
        batch_format="pyarrow", batch_size=None)
    return partials.groupby("bucket").map_groups(
        make_finalize_bucket_fn(cfg.fuzzy_threshold, cfg.max_edit_distance,
                                cfg.use_phonetic,
                                linking_strategy=cfg.linking_strategy),
        batch_format="pyarrow").materialize()
