#!/usr/bin/env python
"""Benchmark harness.

Headline: end-to-end KG construction — read a materialized interleaved
spans corpus (the north-rule input shape) → chunk → extract → canonicalize
→ edges → triples → communities. Input corpus is synthesized
deterministically ONCE (untimed prep, cached under /tmp keyed by sf+factor)
from $GRAFT_SF_DIR's documents table with GRAFT_SYNTH_FACTOR× sentences per
doc (default 256 → ~50 KB text/doc, realistic document sizes), then the
timed pipeline reads it like any production spans table.

Prints ONE JSON line:
  {"metric": ..., "value": sec, "unit": "sec", "queries": {...},
   "sf": ..., "num_cpus": N, "triples_per_sec": ..., ...}

--scaling: runs the plain bench twice in fresh processes at num_cpus=N and
4N (default 2 and 8 — see SCALE_LO comment) on the same input and reports
both throughputs plus scaling efficiency (sandbox proxy for N→4N nodes,
per BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# Honest CPU accounting for the scaling measurement: without this, pyarrow
# compute/IO pools and OMP threads use ALL machine cores regardless of
# ray.init(num_cpus=N), silently inflating the low-N baseline. Must be set
# before ray.init so worker processes inherit it.
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("ARROW_IO_THREADS", "2")
# At ≥1.9M chunks the default object store (≈43% of RAM) spills mid-pipeline
# and the extract/edges stages go superlinear (116 s vs a linear 70 s at
# synth_factor=512); 55% keeps the working set resident — measured in
# BASELINE.md's data-scale table. On a multi-node cluster this maps to the
# per-node object_store_memory setting.
os.environ.setdefault("RAY_DEFAULT_OBJECT_STORE_MEMORY_PROPORTION", "0.55")

FACTOR = int(os.environ.get("GRAFT_SYNTH_FACTOR", "256"))


def _pin_driver_threads() -> None:
    import pyarrow as pa

    pa.set_cpu_count(1)
    pa.set_io_thread_count(2)


def host_probe() -> dict:
    """Host-weather snapshot (shared implementation:
    graphrag_ray.stages.monitoring.host_probe — also embedded in the
    job.py PipelineReport)."""
    from graphrag_ray.stages.monitoring import host_probe as _hp

    return _hp()


def ensure_corpus(sf_dir: str) -> str:
    """Synthesize the spans corpus once (deterministic, cached)."""
    import ray

    tag = os.path.basename(os.path.normpath(sf_dir))
    # v2: named-md5-draw synth respec (synth_oracle.py) changed the corpus
    out = f"/tmp/graft_bench_corpus/{tag}_f{FACTOR}_v2"
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    from graphrag_ray.pipelines.kg import spans_dataset_from_flat_parquet

    os.makedirs(out, exist_ok=True)
    ds = spans_dataset_from_flat_parquet(f"{sf_dir}/documents.parquet", factor=FACTOR)
    ds.write_parquet(out)
    with open(os.path.join(out, "_DONE"), "w") as f:
        f.write("")
    return out


def run_bench() -> dict:
    import ray

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    _pin_driver_threads()
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from graphrag_ray import queries as q
    from graphrag_ray.config import PipelineConfig
    from graphrag_ray.pipelines.kg import build_kg, read_spans_documents
    from graphrag_ray.stages.community import detect_communities

    corpus = ensure_corpus(sf_dir)
    cfg = PipelineConfig(
        chunk_size=512,
        chunk_overlap=100,
        canonical_merge=os.environ.get("GRAFT_CANON_MERGE",
                                       PipelineConfig.canonical_merge),
        edge_merge=os.environ.get("GRAFT_EDGE_MERGE", PipelineConfig.edge_merge),
    )

    # warm-up (untimed): spawn workers, import the library in them, warm the
    # page cache — a small slice through the REAL pipeline stages. The
    # extract UDF has a ~1.7 s one-time per-process cost (first-call regex
    # and allocator warmup, measured via cProfile cold-vs-steady), so the
    # warmup fans out one small batch per CPU to touch EVERY worker
    # process, not just the two a single 64-doc slice reaches.
    from dataclasses import replace

    warm_cfg = replace(cfg, extract_batch_size=8)
    warm_docs = read_spans_documents(corpus).limit(8 * num_cpus)
    build_kg(warm_docs.materialize().repartition(num_cpus), warm_cfg)

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return out

    # --- headline: KG construction end-to-end over the spans corpus
    t0 = time.perf_counter()
    docs = read_spans_documents(corpus)
    res = build_kg(docs, cfg)
    n_triples = res.triples.count()
    communities, _summaries = detect_communities(res.entities, res.edges)
    n_community_rows = communities.count()
    headline = time.perf_counter() - t0
    timings["kg_full"] = round(headline, 3)

    n_docs = docs.count()
    n_chunks = res.chunks.count()

    # --- secondary operator pipelines (over the raw driver tables)
    def consume(ds):
        if hasattr(ds, "count"):
            return ds.count()
        return len(ds)

    timed("doc_token_stats", lambda: consume(q.doc_token_stats(sf_dir)))
    timed("dedup_exact", lambda: consume(q.dedup_exact(sf_dir)))
    timed("dedup_minhash_pairs", lambda: consume(q.dedup_minhash_pairs(sf_dir)))
    timed("ann_topk", lambda: consume(q.ann_topk(sf_dir)))
    timed("embedding_near_dup", lambda: consume(q.embedding_near_dup(sf_dir)))
    timed("media_features", lambda: consume(q.media_features(sf_dir)))
    timed("top_terms", lambda: consume(q.top_terms(sf_dir)))
    timed("doc_lm_score", lambda: consume(q.doc_lm_score(sf_dir)))
    timed("dup_passages", lambda: consume(q.dup_passages(sf_dir)))
    timed("events_asof", lambda: consume(q.events_asof(sf_dir)))

    result = {
        "metric": "kg_construction_end_to_end",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "synth_factor": FACTOR,
        "n_docs": n_docs,
        "n_chunks": n_chunks,
        "n_triples": n_triples,
        "n_entities": res.report["entity_count"],
        "n_community_rows": n_community_rows,
        "triples_per_sec": round(n_triples / headline, 1),
        "chunks_per_sec": round(n_chunks / headline, 1),
        "docs_per_sec": round(n_docs / headline, 1),
        "host_probe": host_probe(),
    }
    ray.shutdown()
    return result


# Median-of-N fresh-process runs (default 3): the VM's run-to-run spread is
# large (BENCH_r02 regressed 1.5x on unrelated stateless queries — host
# contention, not code), so a single-shot reading is noise, not signal.
# Each run is a fresh process (cold Ray session, cold imports) exactly as
# the driver invokes it; the reported numbers are element-wise medians.
BENCH_RUNS = int(os.environ.get("GRAFT_BENCH_RUNS", "3"))


def _median(xs: list[float]) -> float:
    ys = sorted(xs)
    n = len(ys)
    return ys[n // 2] if n % 2 else (ys[n // 2 - 1] + ys[n // 2]) / 2.0


def run_bench_median() -> dict:
    """Spawn BENCH_RUNS fresh-process single runs; report per-metric
    medians (plus the raw per-run walls for variance transparency)."""
    runs: list[dict] = []
    env = dict(os.environ, GRAFT_BENCH_CHILD="1")
    for _ in range(BENCH_RUNS):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        runs.append(json.loads(out.strip().splitlines()[-1]))
    result = dict(runs[len(runs) // 2])  # counts/config from any run
    result["queries"] = {
        k: round(_median([r["queries"][k] for r in runs]), 3)
        for k in runs[0]["queries"]
    }
    headline = result["queries"]["kg_full"]
    result["value"] = headline
    result["n_runs"] = len(runs)
    result["run_walls"] = [r["value"] for r in runs]
    result["run_probes"] = [r.get("host_probe") for r in runs]
    for key, count in (("triples_per_sec", result["n_triples"]),
                       ("chunks_per_sec", result["n_chunks"]),
                       ("docs_per_sec", result["n_docs"])):
        result[key] = round(count / headline, 1)
    return result


# Default N→4N pair: 2→8. A pure-CPU control (multiprocessing busy-loop)
# shows this VM saturates beyond ~12 concurrent CPUs (efficiency ceiling
# 0.76 at 16, 0.66 at 32 even for embarrassingly parallel work), so 2→8 is
# the regime where num_cpus=N honestly models N nodes; the 8→32 pair is
# reported alongside the measured hardware ceiling in BASELINE.md.
SCALE_LO = int(os.environ.get("GRAFT_SCALE_LO", "2"))
SCALE_HI = int(os.environ.get("GRAFT_SCALE_HI", "8"))


def run_scaling() -> dict:
    """Same job, fresh processes, num_cpus=N then 4N (cluster-size proxy)."""

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_BENCH_CHILD="1")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = run(SCALE_LO), run(SCALE_HI)
    tput_lo = lo["triples_per_sec"]
    tput_hi = hi["triples_per_sec"]
    eff = (tput_hi / tput_lo) / (SCALE_HI / SCALE_LO)
    return {
        "metric": f"scaling_efficiency_{SCALE_LO}_to_{SCALE_HI}_cpus",
        f"sec_{SCALE_LO}": lo["value"],
        f"sec_{SCALE_HI}": hi["value"],
        f"triples_per_sec_{SCALE_LO}": tput_lo,
        f"triples_per_sec_{SCALE_HI}": tput_hi,
        "speedup": round(tput_hi / tput_lo, 3),
        "scaling_efficiency": round(eff, 3),
        "sf": lo["sf"],
        "synth_factor": FACTOR,
        "run_probes": [lo.get("host_probe"), hi.get("host_probe")],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif BENCH_RUNS > 1 and not os.environ.get("GRAFT_BENCH_CHILD"):
        print(json.dumps(run_bench_median()))
    else:
        print(json.dumps(run_bench()))
