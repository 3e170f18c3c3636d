"""Hierarchical document summary tree (A10, RAPTOR-ish).

Reference: summarization/mod.rs:79-220 — bottom-up tree over chunk
summaries with merge_size=5 per node, each level summarizing groups of the
previous level until one root remains. The summarizer here is the
deterministic extractive variant (stages/enrich.py); an LLM summarizer
plugs in via the same callable.

Ray-Data shape (VERDICT r03 #5 — no driver-side corpus materialization):
level 0 is a map_batches summary pass over sorted chunks; the global node
ordinal is assigned per block from the (tiny) per-block row counts, so the
driver only ever holds O(num_blocks) integers. Each merge level is ONE
``groupby(parent_idx).map_groups`` — a keyed exchange whose data volume
shrinks ``merge_size``× per level — and the driver's loop state is a
single per-level count. The full tree is returned as a Dataset (level-0
rows are corpus-proportional); ``build_summary_tree`` is the small-scale
pandas convenience wrapper.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray

from .enrich import extractive_summary

SUMMARY_TREE_COLUMNS = ["level", "node_idx", "summary", "n_children"]

_TREE_SCHEMA = pa.schema(
    [
        ("level", pa.int32()),
        ("node_idx", pa.int64()),
        ("summary", pa.string()),
        ("n_children", pa.int64()),
    ]
)


@ray.remote
def _index_block(block: pa.Table, offset: int) -> pa.Table:
    """Assign global node ordinals to one sorted level-0 block."""
    n = block.num_rows
    return pa.Table.from_pydict(
        {
            "level": pa.array([0] * n, pa.int32()),
            "node_idx": pa.array(range(offset, offset + n), pa.int64()),
            "summary": block.column("summary"),
            "n_children": pa.array([0] * n, pa.int64()),
        },
        schema=_TREE_SCHEMA,
    )


def build_summary_tree_ds(
    chunks_ds: "ray.data.Dataset",
    merge_size: int = 5,
    max_sentences: int = 2,
    summarizer=None,
) -> "ray.data.Dataset":
    """chunks → Dataset of tree rows (level, node_idx, summary, n_children);
    level 0 = per-chunk summaries in (doc_id, chunk_idx) order."""
    summarize = summarizer or (lambda text: extractive_summary(text, max_sentences))

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

    sorted_lvl0 = (
        chunks_ds.map_batches(level0, batch_format="pyarrow")
        .sort(["doc_id", "chunk_idx"])
        .materialize()
    )
    # global ordinal from per-block counts (driver holds O(num_blocks) ints)
    refs = sorted_lvl0.to_arrow_refs()

    @ray.remote
    def _count(block: pa.Table) -> int:
        return block.num_rows

    counts = ray.get([_count.remote(r) for r in refs])
    offsets, acc = [], 0
    for c in counts:
        offsets.append(acc)
        acc += c
    total = acc
    current = ray.data.from_arrow_refs(
        [_index_block.remote(r, off) for r, off in zip(refs, offsets)]
    )
    level_datasets = [current]

    def merge_groups(batch: pa.Table) -> pa.Table:
        """One parent group (≤ merge_size children) → one parent row."""
        df = batch.to_pandas().sort_values("node_idx")
        child_level = int(df["level"].iloc[0])
        parent_idx = int(df["node_idx"].iloc[0]) // merge_size
        merged = summarize(" ".join(df["summary"].tolist()))
        return pa.Table.from_pydict(
            {
                "level": pa.array([child_level + 1], pa.int32()),
                "node_idx": pa.array([parent_idx], pa.int64()),
                "summary": pa.array([merged], pa.string()),
                "n_children": pa.array([len(df)], pa.int64()),
            },
            schema=_TREE_SCHEMA,
        )

    while total > 1:

        def tag_parent(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            parent = pc.divide(batch.column("node_idx"), merge_size)
            return batch.append_column("parent_idx", parent.cast(pa.int64()))

        merged = (
            current.map_batches(tag_parent, batch_format="pyarrow")
            .groupby("parent_idx")
            .map_groups(merge_groups, batch_format="pyarrow")
            .materialize()
        )
        total = merged.count()
        level_datasets.append(merged)
        current = merged

    out = level_datasets[0]
    for ds in level_datasets[1:]:
        out = out.union(ds)
    return out


def build_summary_tree(
    chunks_ds: "ray.data.Dataset",
    merge_size: int = 5,
    max_sentences: int = 2,
    summarizer=None,
) -> pd.DataFrame:
    """Small-scale/debug wrapper: full tree as a pandas DataFrame. The tree
    build itself is distributed (build_summary_tree_ds); only this final
    collect materializes — use the Dataset variant when level 0 is large."""
    ds = build_summary_tree_ds(chunks_ds, merge_size, max_sentences, summarizer)
    df = ds.to_pandas()
    return (
        df.sort_values(["level", "node_idx"])
        .reset_index(drop=True)[SUMMARY_TREE_COLUMNS]
    )
