"""Exact duplicated-passage detection (substring-level dedup).

Lee et al., "Deduplicating Training Data Makes Language Models Better"
(arXiv:2107.06499) dedupe at the SUBSTRING level with a suffix array —
whole-doc hashes miss boilerplate paragraphs pasted into otherwise-unique
pages. The Ray-Data-native equivalent is rolling-window fingerprints:

  map_batches(passage_rows)      every W-token window of every doc emits
                                 (bucket, phash, doc_id, pos) — streaming,
                                 no per-doc state
  groupby(bucket).map_groups     windows co-locate by fingerprint-prefix
                                 bucket (ONE exchange; a phash's rows all
                                 share a bucket) and each bucket reduces
                                 with vectorized pandas
  → passages seen in >=2 distinct docs, or per-doc duplicated-window
    counts (the substring-level dedup signal a filter stage consumes)

Scale notes: rows out = tokens in (× ~1), so the exchange is corpus-sized
— exactly the suffix-array build cost, but it shards freely by bucket.
Per-bucket memory is corpus_windows/B; B scales with the corpus. The md5
window fingerprint makes collisions negligible and gives the DuckDB twin
(windowed string_agg → md5) bit-exact parity.

No reference counterpart (graphrag-rs dedupes whole chunks only —
`chunking/mod.rs` hash dedup); this is a driver-brief training-data op.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

WIDTH = 8
NUM_BUCKETS = 64


def passage_rows(batch: pa.Table, width: int = WIDTH,
                 num_buckets: int = NUM_BUCKETS) -> pa.Table:
    """Explode docs into W-token rolling-window fingerprint rows:
    (bucket, phash, doc_id, pos). pos is the 0-based token offset of the
    window start; docs shorter than W tokens emit nothing."""
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    out_b, out_h, out_doc, out_pos = [], [], [], []
    for doc_id, text in zip(ids, texts):
        toks = (text or "").split()
        for i in range(len(toks) - width + 1):
            h = hashlib.md5(" ".join(toks[i:i + width]).encode()).hexdigest()
            out_b.append(int(h[:8], 16) % num_buckets)
            out_h.append(h)
            out_doc.append(doc_id)
            out_pos.append(i)
    return pa.Table.from_pydict({
        "bucket": pa.array(out_b, pa.int32()),
        "phash": pa.array(out_h, pa.string()),
        "doc_id": pa.array(out_doc, pa.int64()),
        "pos": pa.array(out_pos, pa.int64()),
    })


_GROUP_COLS = {"phash": "object", "n_docs": "int64", "n_occ": "int64",
               "first_doc_id": "int64", "first_pos": "int64"}


def dup_passages_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """Per bucket: fingerprints occurring in >=2 distinct docs, with
    occurrence stats and the earliest (doc_id, pos) attribution."""
    if df.empty:
        return pd.DataFrame({c: pd.Series(dtype=t)
                             for c, t in _GROUP_COLS.items()})
    g = df.groupby("phash", sort=False)
    stats = g.agg(n_docs=("doc_id", "nunique"), n_occ=("doc_id", "size"))
    dup = stats[stats["n_docs"] >= 2]
    if dup.empty:
        return pd.DataFrame({c: pd.Series(dtype=t)
                             for c, t in _GROUP_COLS.items()})
    first = (df[df["phash"].isin(dup.index)]
             .sort_values(["phash", "doc_id", "pos"], kind="mergesort")
             .drop_duplicates("phash", keep="first")
             .set_index("phash"))
    out = dup.join(first[["doc_id", "pos"]]).reset_index()
    out = out.rename(columns={"doc_id": "first_doc_id", "pos": "first_pos"})
    return out[list(_GROUP_COLS)]


_DOC_COLS = {"doc_id": "int64", "n_dup_windows": "int64"}


def doc_dup_counts_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """Per bucket: PARTIAL per-doc counts of windows whose fingerprint is
    shared with at least one other doc (inner semantics — docs with zero
    duplicated windows don't emit). Final rollup is a tiny
    groupby(doc_id).sum over these partials."""
    if df.empty:
        return pd.DataFrame({c: pd.Series(dtype=t)
                             for c, t in _DOC_COLS.items()})
    nd = df.groupby("phash")["doc_id"].nunique()
    dup_rows = df[df["phash"].map(nd).ge(2)]
    if dup_rows.empty:
        return pd.DataFrame({c: pd.Series(dtype=t)
                             for c, t in _DOC_COLS.items()})
    out = (dup_rows.groupby("doc_id", sort=False).size()
           .rename("n_dup_windows").reset_index())
    return out[list(_DOC_COLS)]


def dup_passages(docs_ds, width: int = WIDTH,
                 num_buckets: int = NUM_BUCKETS):
    """Corpus-wide duplicated-passage table:
    (phash, n_docs, n_occ, first_doc_id, first_pos)."""
    rows = docs_ds.map_batches(
        lambda b: passage_rows(b, width, num_buckets),
        batch_format="pyarrow")
    return rows.groupby("bucket").map_groups(
        dup_passages_in_bucket, batch_format="pandas")


def doc_dup_passage_counts(docs_ds, width: int = WIDTH,
                           num_buckets: int = NUM_BUCKETS):
    """Per-doc duplicated-window counts (the filterable signal):
    (doc_id, n_dup_windows), docs with >=1 duplicated window only."""
    from ray.data.aggregate import Sum

    rows = docs_ds.map_batches(
        lambda b: passage_rows(b, width, num_buckets),
        batch_format="pyarrow")
    partial = rows.groupby("bucket").map_groups(
        doc_dup_counts_in_bucket, batch_format="pandas")
    return partial.groupby("doc_id").aggregate(
        Sum("n_dup_windows", alias_name="n_dup_windows"))
