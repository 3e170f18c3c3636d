"""Incremental build: add documents without a full rebuild (SURVEY.md §2.10).

The reference's incremental module (incremental/mod.rs:40-100) batches new
documents, detects changes and lazily propagates updates into the existing
graph. The Ray-Data equivalent is structural: run chunk+extract on the NEW
docs only, union the (cheap, already-combined) extraction partials with the
previous run's persisted extraction table, and re-run only the
canonicalization → edges tail — exactly the stages whose results depend on
the whole corpus. The checkpoint layout (state/checkpoint.py) makes the old
extraction table addressable without recompute.

Conflict resolution = HighestConfidence (incremental/mod.rs): the
canonicalization merge already keeps max confidence per key, so the default
merge IS the reference's resolution strategy.
"""

from __future__ import annotations

import ray.data

from ..config import PipelineConfig
from ..stages.extract import ChunkExtract
from .kg import KGResult, build_kg


def extraction_for_docs(docs: "ray.data.Dataset", cfg: PipelineConfig):
    stage = ChunkExtract(
        chunk_size=cfg.chunk_size,
        chunk_overlap=cfg.chunk_overlap,
        min_confidence=cfg.min_confidence,
        entity_types=cfg.entity_types,
        extract_rels=cfg.extract_relationships,
        relationship_confidence=cfg.relationship_confidence,
        max_contexts=cfg.max_contexts_per_edge,
        chunking_strategy=cfg.chunking_strategy,
        min_chunk_size=cfg.min_chunk_size,
    )
    return docs.map_batches(stage, batch_format="pyarrow",
                            batch_size=cfg.extract_batch_size)


def dirty_buckets_for(new_extraction: "ray.data.Dataset",
                      num_buckets: int = 64,
                      previous_bloom=None) -> tuple[list[int], dict]:
    """Canonicalization buckets invalidated by the new docs' entity keys —
    the distributed twin of LazyPropagationEngine.queue_node_update:
    every (entity_type, name) key the new extraction emits dirties
    bucket_of(key) (a new mention changes at least mention_count, so
    membership alone dirties). Distinct buckets reduce per batch, so only
    ≤ num_buckets ints ever reach the driver.

    ``previous_bloom`` (state/delta.BloomFilter over the previous run's
    entity keys, persisted with the snapshot per delta_computation.rs's
    fast path) classifies keys as definitely-added vs possibly-modified
    for the delta report — stats only; both classes dirty their bucket."""
    import pyarrow.compute as pc

    from ..state.propagation import bucket_of

    def to_buckets(batch):
        import pyarrow as _pa
        ent = batch.filter(pc.equal(batch.column("row_kind"), "entity"))
        keys = {(t, n) for t, n in zip(ent.column("entity_type").to_pylist(),
                                       ent.column("name").to_pylist())}
        bs = sorted({bucket_of(t, n, num_buckets) for t, n in keys})
        added = modified = 0
        if previous_bloom is not None:
            for t, n in keys:
                if f"{t}\x00{n}" in previous_bloom:
                    modified += 1
                else:
                    added += 1
        # counts ride on the batch's FIRST bucket row only, so a plain sum
        # over all rows is exact (per-batch keys, so cross-batch repeats of
        # one key may count twice — a report, not a correctness surface)
        return _pa.table({
            "bucket": _pa.array(bs, _pa.int32()),
            "n_added": _pa.array([added] + [0] * (len(bs) - 1), _pa.int64()),
            "n_modified": _pa.array([modified] + [0] * (len(bs) - 1),
                                    _pa.int64()),
        })

    rows = (new_extraction.map_batches(to_buckets, batch_format="pyarrow")
            .to_pandas())
    dirty = sorted(rows["bucket"].unique().tolist())
    stats = {"dirty_buckets": len(dirty), "total_buckets": num_buckets}
    if previous_bloom is not None and len(rows):
        stats["added_keys"] = int(rows["n_added"].sum())
        stats["modified_keys"] = int(rows["n_modified"].sum())
    return dirty, stats


def entity_key_bloom(extraction: "ray.data.Dataset"):
    """Bloom filter over an extraction's (entity_type, name) keys — the
    persistable membership fast path of delta_computation.rs:22-45. Built
    once per snapshot; ships with the checkpoint so the next incremental
    run never rescans the old corpus."""
    import pyarrow.compute as pc

    from ..state.delta import BloomFilter

    bloom = BloomFilter()
    for batch in extraction.select_columns(
            ["row_kind", "entity_type", "name"]).iter_batches(
            batch_format="pyarrow"):
        ent = batch.filter(pc.equal(batch.column("row_kind"), "entity"))
        for t, n in zip(ent.column("entity_type").to_pylist(),
                        ent.column("name").to_pylist()):
            bloom.add(f"{t}\x00{n}")
    return bloom


def incremental_update(
    previous_extraction: "ray.data.Dataset",
    new_docs: "ray.data.Dataset",
    cfg: PipelineConfig,
    previous_canonical_full: "ray.data.Dataset | None" = None,
    previous_bloom=None,
    num_buckets: int = 64,
) -> KGResult:
    """Delta-bounded incremental build: only canonicalization buckets
    touched by the NEW docs' entity keys re-finalize
    (refresh_dirty_buckets); every untouched bucket's canonical rows pass
    through from the previous run unrecomputed (pytest-asserted via a
    poison-row probe). The edge tail reruns over the combined extraction —
    edges are alias-rewritten against the refreshed canonical map, and a
    new doc can add occurrences to any existing edge, so edge merging is
    inherently corpus-wide (it is a streaming combine, not a per-bucket
    finalize, so there is nothing to bound).

    ``previous_canonical_full`` is the persisted canonical table (with
    member_entity_ids) from the previous run; when absent it is rebuilt
    from ``previous_extraction`` (the cold-start path a fresh caller
    hits). ``previous_bloom`` is the optional persisted key bloom
    (entity_key_bloom) powering the added/modified delta report."""
    new_extraction = extraction_for_docs(new_docs, cfg).materialize()
    combined = previous_extraction.union(new_extraction).materialize()
    if previous_canonical_full is None:
        previous_canonical_full = canonical_full_for(previous_extraction, cfg)
    dirty, delta_stats = dirty_buckets_for(new_extraction, num_buckets,
                                           previous_bloom)
    if not dirty:  # GraphDelta.is_empty fast path: nothing to refresh
        canonical_full = previous_canonical_full
    else:
        canonical_full = refresh_dirty_buckets(
            previous_canonical_full, combined, dirty, cfg, num_buckets)
    return _finish_from_canonical(combined, canonical_full.materialize(),
                                  cfg, approach="ray-data-incremental-delta",
                                  extra_report=delta_stats)


def canonical_full_for(extraction: "ray.data.Dataset", cfg: PipelineConfig
                       ) -> "ray.data.Dataset":
    """Full canonicalization (with member_entity_ids) from an extraction
    Dataset — the 'previous state' a real deployment persists."""
    from ..stages.canonicalize import (make_finalize_bucket_fn,
                                       make_partial_aggregate_fn,
                                       make_salted_merge_fn)

    partials = extraction.map_batches(
        make_partial_aggregate_fn(cfg.salt_partitions,
                                  doc_frequency_mode=cfg.doc_frequency_mode,
                                  hll_p=cfg.hll_precision),
        batch_format="pyarrow", batch_size=None,
    ).repartition(32).map_batches(
        make_salted_merge_fn(), batch_format="pyarrow", batch_size=None
    )
    if cfg.salt_partitions > 1:
        partials = partials.groupby(["bucket", "salt"]).map_groups(
            make_salted_merge_fn(), batch_format="pyarrow"
        )
    return partials.repartition(8).groupby("bucket").map_groups(
        make_finalize_bucket_fn(cfg.fuzzy_threshold, cfg.max_edit_distance,
                                cfg.use_phonetic,
                                linking_strategy=cfg.linking_strategy),
        batch_format="pyarrow",
    ).materialize()


def build_kg_from_extraction(extraction: "ray.data.Dataset", cfg: PipelineConfig
                             ) -> KGResult:
    """Run the post-extraction tail of build_kg on a prepared extraction
    Dataset (used by resume paths and the cold-start incremental)."""
    extraction = extraction.materialize()
    canonical_full = canonical_full_for(extraction, cfg)
    return _finish_from_canonical(extraction, canonical_full, cfg,
                                  approach="ray-data-incremental")


def _finish_from_canonical(extraction: "ray.data.Dataset",
                           canonical_full: "ray.data.Dataset",
                           cfg: PipelineConfig, approach: str,
                           extra_report: dict | None = None) -> KGResult:
    """Alias broadcast + edge tail from a prepared canonical table."""
    import time

    import ray

    from ..stages.canonicalize import explode_alias_map
    from ..stages.edges import (finalize_edges, make_alias_broadcast,
                                make_edge_rewrite_fn, merge_edges,
                                tree_merge_edges, triples_projection)

    t0 = time.perf_counter()
    alias_rows = canonical_full.map_batches(explode_alias_map, batch_format="pyarrow")
    alias_tbl = alias_rows.to_pandas()
    alias_dict = {
        eid: (cid, cname)
        for eid, cid, cname in zip(alias_tbl["entity_id"], alias_tbl["canonical_id"],
                                   alias_tbl["canonical_name"])
    }
    alias_ref = ray.put(make_alias_broadcast(alias_dict))
    rewritten = extraction.map_batches(
        make_edge_rewrite_fn(alias_ref, max_contexts=cfg.max_contexts_per_edge),
        batch_format="pyarrow", batch_size=None,
    )
    edges_full = (rewritten.groupby("bucket").map_groups(merge_edges, batch_format="pyarrow")
                  if cfg.edge_merge == "groupby" else
                  tree_merge_edges(rewritten)).materialize()

    entities = canonical_full.drop_columns(["member_entity_ids"])
    report = {
        "entity_count": entities.count(),
        "relationship_count": edges_full.count(),
        "approach": approach,
        "elapsed_ms": int((time.perf_counter() - t0) * 1000),
        **(extra_report or {}),
    }
    return KGResult(
        chunks=None,
        extraction=extraction,
        entities=entities,
        alias_map=alias_rows,
        edges=edges_full.map_batches(finalize_edges, batch_format="pyarrow"),
        triples=edges_full.map_batches(triples_projection, batch_format="pyarrow"),
        report=report,
    )


def refresh_dirty_buckets(
    previous_canonical: "ray.data.Dataset",
    combined_extraction: "ray.data.Dataset",
    dirty_buckets,
    cfg: PipelineConfig,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Selective canonicalization refresh driven by the lazy-propagation
    engine (state/propagation.py): recompute ONLY the invalidated
    canonicalization buckets from the combined extraction stream; every
    other bucket's canonical rows pass through untouched.

    This is the Ray-Data form of lazy_propagation.rs's deferred recompute:
    the engine's PropagationResult.invalidated_buckets are the exact
    shuffle keys of the canonicalize groupby, and a fuzzy cluster never
    spans buckets (blocks are bucket-local), so bucket-wise refresh +
    pass-through equals a full rebuild EXACTLY whenever the dirty set
    covers every entity that changed (which queueing each new/changed
    entity guarantees). With U dirty buckets of B total, the exchange and
    the O(block²) fuzzy work shrink by ~U/B; the pass-through side is a
    filter over the (tiny) canonical table, no shuffle."""
    import pyarrow as _pa
    import pyarrow.compute as _pc

    from ..stages.canonicalize import (CANONICAL_FULL_SCHEMA,
                                       make_finalize_bucket_fn,
                                       make_partial_aggregate_fn)
    from ..state.propagation import bucket_of

    dirty = sorted({int(b) for b in dirty_buckets})
    dirty_arr = _pa.array(dirty, _pa.int32())

    partials = combined_extraction.map_batches(
        make_partial_aggregate_fn(cfg.salt_partitions, num_buckets,
                                  doc_frequency_mode=cfg.doc_frequency_mode,
                                  hll_p=cfg.hll_precision),
        batch_format="pyarrow", batch_size=None,
    ).map_batches(
        lambda t: t.filter(_pc.is_in(t.column("bucket"),
                                     value_set=dirty_arr)),
        batch_format="pyarrow",
    )
    refreshed = partials.groupby("bucket").map_groups(
        make_finalize_bucket_fn(cfg.fuzzy_threshold, cfg.max_edit_distance,
                                cfg.use_phonetic,
                                linking_strategy=cfg.linking_strategy),
        batch_format="pyarrow",
    )

    dirty_set = set(dirty)

    def keep_clean(batch: _pa.Table) -> _pa.Table:
        if batch.num_rows == 0:
            return CANONICAL_FULL_SCHEMA.empty_table()
        keep = [
            bucket_of(etype, name, num_buckets) not in dirty_set
            for etype, name in zip(batch.column("entity_type").to_pylist(),
                                   batch.column("canonical_name").to_pylist())
        ]
        return batch.filter(_pa.array(keep))

    kept = previous_canonical.map_batches(keep_clean, batch_format="pyarrow")
    return kept.union(refreshed)
