"""End-to-end KG construction pipeline (the flagship flow).

Replicates the reference's ``graphrag index`` lifecycle
(graphrag/build.rs:28-631, corpus flow corpus/collection_processor.rs →
entity_linker → knowledge_graph) as a streaming Ray Data pipeline:

    read (spans docs) → map_batches(chunk) → map_batches(extract: tagged
    entity+edge rows) → [canonicalization: combiner → salted groupby →
    per-block fuzzy map_groups] → broadcast alias map → map_batches(edge
    rewrite + combine) → groupby dedup → edges + triples (+ communities,
    stages/community.py)

No mutable accumulator graph: the knowledge graph IS the pair of Datasets
(entities, edges). Intermediates that feed two branches (extraction feeds
both the canonicalization and the edge branch) are either checkpointed to
Parquet (resume path) or materialized in the object store (bench path) —
both are far smaller than the input corpus.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import ray
import ray.data

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..state.checkpoint import CheckpointManager
from ..stages.canonicalize import (
    explode_alias_map,
    make_finalize_bucket_fn,
    make_partial_aggregate_fn,
    make_salted_merge_fn,
)
from ..stages.chunk import make_chunk_batch_fn
from ..stages.edges import (finalize_edges, make_alias_broadcast_from_table,
                            make_edge_rewrite_fn, merge_edges, tree_merge_edges,
                            triples_projection)
from ..stages.extract import ChunkExtract
from ..synth import spans_batch_from_flat


def read_spans_documents(path: str) -> "ray.data.Dataset":
    """Read the interleaved spans documents table.

    Prefers Lance (the north-rule storage format) when the reader is
    available in this environment, else Parquet with the same schema.
    """
    try:  # pragma: no cover - lance not installed in this sandbox
        if path.endswith(".lance"):
            return ray.data.read_lance(path)
    except AttributeError:
        pass
    return ray.data.read_parquet(path)


def spans_dataset_from_flat_parquet(parquet_path: str, include_base_text: bool = True,
                                    factor: int = 1) -> "ray.data.Dataset":
    """Driver testdata adapter: flat documents.parquet → deterministic spans
    corpus, generated distributedly inside map_batches (synth.py)."""
    flat = ray.data.read_parquet(parquet_path, columns=["doc_id", "text"])
    return flat.map_batches(
        lambda b: spans_batch_from_flat(b, include_base_text, factor),
        batch_format="pyarrow",
    )


@dataclass
class KGResult:
    chunks: "ray.data.Dataset"
    extraction: "ray.data.Dataset"      # tagged entity/edge partial rows
    entities: "ray.data.Dataset"        # canonical entity table
    alias_map: "ray.data.Dataset"       # entity_id → canonical rows
    edges: "ray.data.Dataset"
    triples: "ray.data.Dataset"
    report: dict


def build_kg(
    docs: "ray.data.Dataset",
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> KGResult:
    """Run the KG-construction pipeline over a spans documents Dataset."""
    t0 = time.perf_counter()
    stage_sec: dict[str, float] = {}
    _last = [t0]

    def mark(stage: str) -> None:
        now = time.perf_counter()
        stage_sec[stage] = round(now - _last[0], 3)
        _last[0] = now

    from ..state.checkpoint import dataset_fingerprint

    ckpt = CheckpointManager(
        cfg.out_dir, cfg.run_id, cfg.config_hash(),
        enabled=cfg.checkpoint,
        input_fingerprint=dataset_fingerprint(docs) if cfg.checkpoint else None,
    )

    # --- chunk + extract (ONE fused streaming stage, no shuffle)
    def compute_extraction():
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
        return docs.map_batches(
            stage,
            batch_format="pyarrow",
            batch_size=cfg.extract_batch_size,
        )

    if cfg.checkpoint:
        extraction = ckpt.load_or_compute("extraction", compute_extraction,
                                          key_column="doc_id")
    else:
        # feeds two branches (canonicalization + edges): pin the (small)
        # extraction output in the object store rather than recomputing the
        # text scan per branch.
        extraction = compute_extraction().materialize()
    mark("extract")

    # --- canonicalization: combiner → (salted merge) → per-block fuzzy
    def compute_canonical():
        partials = extraction.map_batches(
            make_partial_aggregate_fn(
                cfg.salt_partitions,
                doc_frequency_mode=cfg.doc_frequency_mode,
                hll_p=cfg.hll_precision,
            ),
            batch_format="pyarrow",
            batch_size=None,  # full-block batches: per-batch combiner
        )
        finalize = make_finalize_bucket_fn(cfg.fuzzy_threshold,
                                           cfg.max_edit_distance,
                                           cfg.use_phonetic,
                                           linking_strategy=cfg.linking_strategy)
        if cfg.canonical_merge == "salted_groupby":
            # keyed exchange with fan-in per hot key bounded by the salt
            # (explicit skew handling); the path for key spaces beyond
            # single-task scale. The (bucket, salt) pre-merge exchange only
            # pays for itself when the partial stream is large (hot keys
            # fanning into the final exchange) — below the threshold the
            # finalize's in-group merge handles salt collapse itself, and
            # skipping the extra AllToAll removes its serial tail.
            partials = partials.materialize()
            if (cfg.salt_partitions > 1
                    and partials.count() >= cfg.salted_premerge_min_rows):
                partials = partials.groupby(["bucket", "salt"]).map_groups(
                    make_salted_merge_fn(), batch_format="pyarrow"
                )
            return partials.groupby("bucket").map_groups(
                finalize, batch_format="pyarrow"
            )
        # driver-side finalize: the per-batch combiner already shrank the
        # stream to one row per (entity key, batch) — a few hundred KB.
        # Collect those partial blocks and run the exact-merge + fuzzy
        # clustering once on the driver (pure Python, sub-second), skipping
        # several Dataset executions whose fixed overhead dominated at this
        # size. Ray-Data operators stay the path for the salted_groupby
        # config when the key space outgrows one process.
        import pyarrow as _pa

        blocks = [b for b in ray.get(partials.to_arrow_refs()) if b.num_rows]
        full = _pa.concat_tables(blocks, promote_options="default") if blocks else None
        if full is None or full.num_rows == 0:
            from ..stages.canonicalize import CANONICAL_FULL_SCHEMA

            return ray.data.from_arrow(CANONICAL_FULL_SCHEMA.empty_table())
        return ray.data.from_arrow(finalize(full))

    if cfg.checkpoint:
        canonical_full = ckpt.load_or_compute("canonical", compute_canonical,
                                              key_column="canonical_id")
    else:
        canonical_full = compute_canonical().materialize()
    mark("canonical")

    # --- broadcast alias→canonical map (J2) — Arrow-native build (no
    # pandas conversion / Python dict loop on the driver)
    import pyarrow as _pa2

    alias_rows = canonical_full.map_batches(explode_alias_map, batch_format="pyarrow")
    alias_blocks = [b for b in ray.get(alias_rows.to_arrow_refs()) if b.num_rows]
    alias_arrow = (_pa2.concat_tables(alias_blocks) if alias_blocks
                   else _pa2.table({"entity_id": _pa2.array([], _pa2.string()),
                                    "canonical_id": _pa2.array([], _pa2.string()),
                                    "canonical_name": _pa2.array([], _pa2.string())}))
    alias_ref = ray.put(make_alias_broadcast_from_table(alias_arrow))
    mark("alias_broadcast")

    # --- edges: vectorized rewrite (plain tasks; broadcast re-resolved
    # near-zero-copy per task) → sort-free dedup tree

    def compute_edges():
        rewritten = extraction.map_batches(
            make_edge_rewrite_fn(alias_ref, max_contexts=cfg.max_contexts_per_edge),
            batch_format="pyarrow",
            batch_size=None,  # full-block batches: the rewrite is vectorized
        )
        if cfg.edge_merge == "groupby":
            # keyed exchange with a LOCAL combine level first (no shuffle):
            # cross-block batch coalescing collapses the partial stream to
            # ~distinct-edges-per-bundle before the AllToAll, so the
            # groupby moves 100-1000× fewer rows. Same merge UDF both
            # levels (associative). The whole chain STREAMS into the
            # AllToAll — a same-session A/B on the bench corpus measured
            # the round-2 materialize barriers at 6-8 s vs 2.1-2.5 s
            # streaming (the rewrite partials never round-trip the object
            # store as a separate checkpoint).
            combined = rewritten.map_batches(
                merge_edges, batch_format="pyarrow",
                batch_size=cfg.edge_combine_batch_size,
            )
            return combined.groupby("bucket").map_groups(
                merge_edges, batch_format="pyarrow"
            )
        return tree_merge_edges(rewritten.materialize())

    if cfg.checkpoint:
        edges_full = ckpt.load_or_compute("edges", compute_edges, key_column="src")
    else:
        edges_full = compute_edges().materialize()
    mark("edges")

    entities = canonical_full.drop_columns(["member_entity_ids"])
    edges = edges_full.map_batches(finalize_edges, batch_format="pyarrow")
    triples = edges_full.map_batches(triples_projection, batch_format="pyarrow")

    n_entities = entities.count()
    n_edges = edges_full.count()
    mark("counts")
    elapsed = time.perf_counter() - t0
    # PipelineReport parity (pipeline_executor.rs:32-45)
    report = {
        "entity_count": n_entities,
        "relationship_count": n_edges,
        "approach": "ray-data-pattern",
        "elapsed_ms": int(elapsed * 1000),
        "stage_sec": stage_sec,
        "checkpoint_stages_skipped": ckpt.skipped,
        "checkpoint_stages_written": ckpt.written,
    }

    # chunks dataset re-derived lazily for callers that want it (cheap scan)
    chunks_ds = docs.map_batches(
        make_chunk_batch_fn(cfg.chunk_size, cfg.chunk_overlap,
                            cfg.chunking_strategy, cfg.min_chunk_size),
        batch_format="pyarrow",
        batch_size=cfg.chunk_batch_size,
    )
    return KGResult(
        chunks=chunks_ds,
        extraction=extraction,
        entities=entities,
        alias_map=alias_rows,
        edges=edges,
        triples=triples,
        report=report,
    )
