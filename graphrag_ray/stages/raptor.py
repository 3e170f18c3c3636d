"""Hierarchical document summary tree (A10, RAPTOR-ish).

Reference: summarization/mod.rs:79-220 — bottom-up tree over chunk
summaries with merge_size=5 per node, each level summarizing groups of the
previous level until one root remains. The summarizer here is the
deterministic extractive variant (stages/enrich.py); an LLM summarizer
plugs in via the same callable.

Ray-Data shape: the driver owns the (log-depth) level iteration; each level
is ONE map_batches over grouped rows — groups are formed by integer
division of the node index, so no shuffle is needed when the level table is
small (it shrinks 5× per level). At extreme scale the first level can run
as groupby(node_idx // 5).map_groups instead; same UDF.
"""

from __future__ import annotations

import pandas as pd

import ray

from .enrich import extractive_summary

SUMMARY_TREE_COLUMNS = ["level", "node_idx", "summary", "n_children"]


def build_summary_tree(
    chunks_ds: "ray.data.Dataset",
    merge_size: int = 5,
    max_sentences: int = 2,
    summarizer=None,
) -> pd.DataFrame:
    """chunks → DataFrame of tree nodes (level 0 = per-chunk summaries)."""
    summarize = summarizer or (lambda text: extractive_summary(text, max_sentences))

    # level 0: per-chunk extractive summaries, ordered by (doc_id, chunk_idx)
    import pyarrow as pa

    def level0(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "chunk_idx": batch.column("chunk_idx"),
                "summary": pa.array(
                    [summarize(t or "") for t in batch.column("content").to_pylist()],
                    pa.string(),
                ),
            }
        )

    lvl0 = (
        chunks_ds.map_batches(level0, batch_format="pyarrow")
        .sort(["doc_id", "chunk_idx"])
        .to_pandas()
    )
    rows = []
    current = list(lvl0["summary"])
    for i, s in enumerate(current):
        rows.append({"level": 0, "node_idx": i, "summary": s, "n_children": 0})

    level = 0
    while len(current) > 1:
        level += 1
        nxt = []
        for i in range(0, len(current), merge_size):
            group = current[i:i + merge_size]
            merged = summarize(" ".join(group))
            nxt.append(merged)
            rows.append({"level": level, "node_idx": i // merge_size,
                         "summary": merged, "n_children": len(group)})
        current = nxt
    return pd.DataFrame(rows, columns=SUMMARY_TREE_COLUMNS)
