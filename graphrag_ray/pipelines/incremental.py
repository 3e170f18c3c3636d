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


def incremental_update(
    previous_extraction: "ray.data.Dataset",
    new_docs: "ray.data.Dataset",
    cfg: PipelineConfig,
) -> KGResult:
    """Union previous extraction partials with the new docs' extraction and
    re-run only the canonicalization/edge tail."""
    new_extraction = extraction_for_docs(new_docs, cfg)
    combined = previous_extraction.union(new_extraction)
    return build_kg_from_extraction(combined, cfg)


def build_kg_from_extraction(extraction: "ray.data.Dataset", cfg: PipelineConfig
                             ) -> KGResult:
    """Run the post-extraction tail of build_kg on a prepared extraction
    Dataset (used by incremental updates and by resume paths)."""
    import time

    import ray

    from ..stages.canonicalize import (explode_alias_map,
                                       make_finalize_bucket_fn,
                                       make_partial_aggregate_fn,
                                       make_salted_merge_fn)
    from ..stages.edges import (finalize_edges, make_alias_broadcast,
                                make_edge_rewrite_fn, merge_edges,
                                tree_merge_edges, triples_projection)

    t0 = time.perf_counter()
    extraction = extraction.materialize()
    partials = extraction.map_batches(
        make_partial_aggregate_fn(cfg.salt_partitions),
        batch_format="pyarrow", batch_size=None,
    ).repartition(32).map_batches(
        make_salted_merge_fn(), batch_format="pyarrow", batch_size=None
    )
    if cfg.salt_partitions > 1:
        partials = partials.groupby(["bucket", "salt"]).map_groups(
            make_salted_merge_fn(), batch_format="pyarrow"
        )
    canonical_full = partials.repartition(8).groupby("bucket").map_groups(
        make_finalize_bucket_fn(cfg.fuzzy_threshold, cfg.max_edit_distance,
                                cfg.use_phonetic),
        batch_format="pyarrow",
    ).materialize()

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
        "approach": "ray-data-incremental",
        "elapsed_ms": int((time.perf_counter() - t0) * 1000),
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
