"""KG-construction job entrypoint — the ``ray job submit`` surface.

    ray job submit --working-dir . -- \
        python -m graphrag_ray.job --input /data/docs_spans.parquet \
            --output /data/kg_out --run-id run42 --resume

Reads the interleaved spans documents table (Lance when available, else
Parquet), runs the full pipeline with stage checkpointing (resume skips
stages with valid manifests), writes the workspace tables (entities, edges,
triples, communities) as partitioned Parquet, and prints one
PipelineReport JSON line (pipeline_executor.rs:32-45 parity) with
per-stage seconds and rows/s.

Inside a Ray job the cluster is already initialised; standalone runs
auto-init local (guarded — the driver contract forbids init in library
code, which this entrypoint is not).
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main(argv: list[str] | None = None) -> dict:
    parser = argparse.ArgumentParser(description="graphrag_ray KG build job")
    parser.add_argument("--input", required=True,
                        help="spans documents table (parquet dir/file or .lance)")
    parser.add_argument("--output", required=True, help="workspace output dir")
    parser.add_argument("--run-id", default="run0")
    parser.add_argument("--resume", action="store_true",
                        help="reuse valid stage checkpoints under --output")
    parser.add_argument("--config", default=None,
                        help="pipeline config file (.toml/.json/.json5, "
                             "config/loader.rs parity); CLI flags win")
    parser.add_argument("--chunk-size", type=int, default=None)
    parser.add_argument("--chunk-overlap", type=int, default=None)
    parser.add_argument("--chunking-strategy", default=None,
                        choices=["legacy", "hierarchical"])
    parser.add_argument("--min-confidence", type=float, default=None)
    parser.add_argument("--no-communities", action="store_true")
    args = parser.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from .config import PipelineConfig, load_config
    from .pipelines.kg import build_kg, read_spans_documents
    from .sources.workspace import save_workspace
    from .stages.community import detect_communities

    # file config (if any) < explicit CLI flags < job-owned fields
    overrides = {
        k: v for k, v in (
            ("chunk_size", args.chunk_size),
            ("chunk_overlap", args.chunk_overlap),
            ("chunking_strategy", args.chunking_strategy),
            ("min_confidence", args.min_confidence),
        ) if v is not None
    }
    overrides.update(
        out_dir=os.path.join(args.output, "_checkpoints"),
        run_id=args.run_id,
        checkpoint=args.resume,
    )
    if args.config:
        cfg = load_config(args.config, **overrides)
    else:
        cfg = PipelineConfig(**overrides)

    t0 = time.perf_counter()
    docs = read_spans_documents(args.input)
    if "spans" not in docs.schema().names:
        if "text" in docs.schema().names:
            # flat (doc_id, text, ...) table: adapt through the same
            # deterministic spans synthesizer the tests/bench use
            from .pipelines.kg import spans_dataset_from_flat_parquet

            docs = spans_dataset_from_flat_parquet(args.input)
        else:
            raise SystemExit(
                "input must be a spans table (doc_id, spans) or a flat "
                f"(doc_id, text) table; got columns {docs.schema().names}")
    res = build_kg(docs, cfg)
    tables = {"entities": res.entities, "edges": res.edges, "triples": res.triples}
    communities = summaries = None
    if not args.no_communities:
        communities, summaries = detect_communities(res.entities, res.edges)
    ws_dir = os.path.join(args.output, args.run_id)
    save_workspace(ws_dir, entities=res.entities, edges=res.edges,
                   triples=res.triples,
                   extra_meta={"run_id": args.run_id,
                               "config_hash": cfg.config_hash()})
    if communities is not None:
        communities.write_parquet(os.path.join(ws_dir, "communities"))
        summaries.write_parquet(os.path.join(ws_dir, "community_summaries"))
    elapsed = time.perf_counter() - t0

    from .stages.monitoring import host_probe

    n_triples = res.triples.count()
    # per-stage rows/s where a row count is natural (benchmark.rs
    # PipelineReport parity: every operation reports duration + rate)
    stage_sec = res.report.get("stage_sec", {})
    stage_rows_per_sec = {}
    for stage, n in (("edges", res.edges.count()),
                     ("counts", res.entities.count())):
        sec = stage_sec.get(stage)
        if sec:
            stage_rows_per_sec[stage] = round(n / sec, 1)
    report = {
        **res.report,
        "run_id": args.run_id,
        "output": ws_dir,
        "total_elapsed_sec": round(elapsed, 3),
        "triple_count": n_triples,
        "triples_per_sec": round(n_triples / elapsed, 1) if elapsed > 0 else None,
        "stage_rows_per_sec": stage_rows_per_sec,
        # host weather: a wall-clock number is only interpretable next to
        # the DRAM probe on this shared box (see BASELINE.md)
        "host_probe": host_probe(),
        "tables_written": sorted(tables) + (
            ["communities", "community_summaries"] if communities is not None else []
        ),
    }
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
