"""Exact duplicated-passage detection (substring-level dedup).

Lee et al., "Deduplicating Training Data Makes Language Models Better"
(arXiv:2107.06499) dedupe at the SUBSTRING level with a suffix array —
whole-doc hashes miss boilerplate paragraphs pasted into otherwise-unique
pages. The Ray-Data-native equivalent is rolling-window fingerprints:

  map_batches(passage_rows)      every W-token window of every doc emits
                                 (bucket, phash, doc_id, pos) — streaming,
                                 no per-doc state. Vectorized: the doc is
                                 normalized ONCE (" ".join + encode) and
                                 each window's md5 reads a byte-offset
                                 slice of that buffer — no per-window
                                 join/encode.
  groupby(bucket).map_groups     windows co-locate by fingerprint-prefix
                                 bucket (ONE exchange; a phash's rows all
                                 share a bucket) and each bucket reduces
                                 with vectorized pandas, emitting Arrow
                                 (pandas-format blocks feed Ray's sort
                                 shuffle ~8x slower).
  → passages seen in >=2 distinct docs, or per-doc duplicated-window
    counts (the substring-level dedup signal a filter stage consumes)

Scale notes: rows out = tokens in (× ~1), so the exchange is corpus-sized
— exactly the suffix-array build cost, but it shards freely by bucket.
The bucket count is DERIVED FROM INPUT SIZE (``derived_buckets``: one
bucket per ~64 docs, floor 64) so per-bucket memory stays constant as the
corpus grows — no fixed B anywhere on the path. The md5 window
fingerprint makes collisions negligible and gives the DuckDB twin
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
NUM_BUCKETS = 64  # floor; real runs derive B from the input size
DOCS_PER_BUCKET = 64


def derived_buckets(docs_ds, floor: int = NUM_BUCKETS,
                    docs_per_bucket: int = DOCS_PER_BUCKET) -> int:
    """Bucket count proportional to the corpus (cheap metadata count for
    parquet inputs): per-bucket window volume ≈ tokens of
    ``docs_per_bucket`` docs, constant as the corpus grows."""
    return max(floor, int(docs_ds.count()) // docs_per_bucket + 1)


def passage_rows(batch: pa.Table, width: int = WIDTH,
                 num_buckets: int = NUM_BUCKETS) -> pa.Table:
    """Explode docs into W-token rolling-window fingerprint rows:
    (bucket, phash, doc_id, pos). pos is the 0-based token offset of the
    window start; docs shorter than W tokens emit nothing.

    Per-window work is one byte-slice + md5: token byte offsets into the
    space-normalized buffer are computed as numpy cumsums, so the old
    per-window ``" ".join(toks[i:i+W]).encode()`` disappears."""
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    out_b, out_h, out_doc, out_pos = [], [], [], []
    md5 = hashlib.md5
    for doc_id, text in zip(ids, texts):
        toks = (text or "").split()
        n = len(toks) - width + 1
        if n <= 0:
            continue
        norm = " ".join(toks)
        buf = norm.encode()
        if len(buf) == len(norm):  # pure-ASCII: char offsets == byte offsets
            lens = np.fromiter(map(len, toks), dtype=np.int64,
                               count=len(toks))
        else:
            lens = np.fromiter((len(t.encode()) for t in toks),
                               dtype=np.int64, count=len(toks))
        starts = np.empty(len(toks), dtype=np.int64)
        starts[0] = 0
        np.cumsum(lens[:-1] + 1, out=starts[1:])
        ends = starts[width - 1:width - 1 + n] + lens[width - 1:width - 1 + n]
        mv = memoryview(buf)
        hashes = [md5(mv[s:e]).hexdigest()
                  for s, e in zip(starts[:n].tolist(), ends.tolist())]
        out_h.extend(hashes)
        out_b.extend(int(h[:8], 16) % num_buckets for h in hashes)
        out_doc.extend([doc_id] * n)
        out_pos.extend(range(n))
    return pa.Table.from_pydict({
        "bucket": pa.array(out_b, pa.int32()),
        "phash": pa.array(out_h, pa.string()),
        "doc_id": pa.array(out_doc, pa.int64()),
        "pos": pa.array(out_pos, pa.int64()),
    })


_GROUP_SCHEMA = pa.schema([
    ("phash", pa.string()), ("n_docs", pa.int64()), ("n_occ", pa.int64()),
    ("first_doc_id", pa.int64()), ("first_pos", pa.int64())])


def dup_passages_in_bucket(df: pd.DataFrame) -> pa.Table:
    """Per bucket: fingerprints occurring in >=2 distinct docs, with
    occurrence stats and the earliest (doc_id, pos) attribution."""
    if df.empty:
        return _GROUP_SCHEMA.empty_table()
    g = df.groupby("phash", sort=False)
    stats = g.agg(n_docs=("doc_id", "nunique"), n_occ=("doc_id", "size"))
    dup = stats[stats["n_docs"] >= 2]
    if dup.empty:
        return _GROUP_SCHEMA.empty_table()
    first = (df[df["phash"].isin(dup.index)]
             .sort_values(["phash", "doc_id", "pos"], kind="mergesort")
             .drop_duplicates("phash", keep="first")
             .set_index("phash"))
    out = dup.join(first[["doc_id", "pos"]]).reset_index()
    out = out.rename(columns={"doc_id": "first_doc_id", "pos": "first_pos"})
    return pa.Table.from_pandas(out[[f.name for f in _GROUP_SCHEMA]],
                                schema=_GROUP_SCHEMA, preserve_index=False)


_DOC_SCHEMA = pa.schema([("doc_id", pa.int64()),
                         ("n_dup_windows", pa.int64())])


def doc_dup_counts_in_bucket(df: pd.DataFrame) -> pa.Table:
    """Per bucket: PARTIAL per-doc counts of windows whose fingerprint is
    shared with at least one other doc (inner semantics — docs with zero
    duplicated windows don't emit). Final rollup is a tiny
    groupby(doc_id).sum over these partials."""
    if df.empty:
        return _DOC_SCHEMA.empty_table()
    nd = df.groupby("phash")["doc_id"].nunique()
    dup_rows = df[df["phash"].map(nd).ge(2)]
    if dup_rows.empty:
        return _DOC_SCHEMA.empty_table()
    out = (dup_rows.groupby("doc_id", sort=False).size()
           .rename("n_dup_windows").reset_index())
    return pa.Table.from_pandas(out[[f.name for f in _DOC_SCHEMA]],
                                schema=_DOC_SCHEMA, preserve_index=False)


def dup_passages(docs_ds, width: int = WIDTH,
                 num_buckets: int | None = None):
    """Corpus-wide duplicated-passage table:
    (phash, n_docs, n_occ, first_doc_id, first_pos)."""
    b = num_buckets or derived_buckets(docs_ds)
    rows = docs_ds.map_batches(
        lambda t: passage_rows(t, width, b), batch_format="pyarrow")
    return rows.groupby("bucket").map_groups(
        dup_passages_in_bucket, batch_format="pandas")


def doc_dup_passage_counts(docs_ds, width: int = WIDTH,
                           num_buckets: int | None = None):
    """Per-doc duplicated-window counts (the filterable signal):
    (doc_id, n_dup_windows), docs with >=1 duplicated window only."""
    from ray.data.aggregate import Sum

    b = num_buckets or derived_buckets(docs_ds)
    rows = docs_ds.map_batches(
        lambda t: passage_rows(t, width, b), batch_format="pyarrow")
    partial = rows.groupby("bucket").map_groups(
        doc_dup_counts_in_bucket, batch_format="pandas")
    return partial.groupby("doc_id").aggregate(
        Sum("n_dup_windows", alias_name="n_dup_windows"))


def novel_counts_in_bucket(df: pd.DataFrame) -> pa.Table:
    """Per bucket: PARTIAL per-doc counts of windows that are the GLOBAL
    first occurrence of their fingerprint (novelty — the dual of
    doc_dup_counts_in_bucket; a phash's rows all share a bucket, so the
    within-bucket first is the global first). First = min (doc_id, pos).
    Docs whose every window first appeared elsewhere emit nothing."""
    if df.empty:
        return _DOC_SCHEMA_NOVEL.empty_table()
    first = (df.sort_values(["phash", "doc_id", "pos"], kind="mergesort")
             .drop_duplicates("phash", keep="first"))
    out = (first.groupby("doc_id", sort=False).size()
           .rename("n_novel_windows").reset_index())
    return pa.Table.from_pandas(out[[f.name for f in _DOC_SCHEMA_NOVEL]],
                                schema=_DOC_SCHEMA_NOVEL,
                                preserve_index=False)


_DOC_SCHEMA_NOVEL = pa.schema([("doc_id", pa.int64()),
                               ("n_novel_windows", pa.int64())])


def doc_novel_window_counts(docs_ds, width: int = WIDTH,
                            num_buckets: int | None = None):
    """Per-doc novel-window counts (the corpus-novelty curve input):
    (doc_id, n_novel_windows) for docs contributing >= 1 first-seen
    window. Same single bucket exchange as dup_passages."""
    from ray.data.aggregate import Sum

    b = num_buckets or derived_buckets(docs_ds)
    rows = docs_ds.map_batches(
        lambda t: passage_rows(t, width, b), batch_format="pyarrow")
    partial = rows.groupby("bucket").map_groups(
        novel_counts_in_bucket, batch_format="pandas")
    return partial.groupby("doc_id").aggregate(
        Sum("n_novel_windows", alias_name="n_novel_windows"))


_OCC_SCHEMA = pa.schema([("doc_id", pa.int64()), ("pos", pa.int64())])


def dup_occurrence_rows(df: pd.DataFrame) -> pa.Table:
    """Per bucket: every (doc_id, pos) occurrence of a fingerprint seen
    in >= 2 distinct docs — the coverage set substring scrubbing blanks
    out. A phash's rows all share a bucket, so the within-bucket
    distinct-doc count is the global one."""
    if df.empty:
        return _OCC_SCHEMA.empty_table()
    nd = df.groupby("phash")["doc_id"].nunique()
    occ = df[df["phash"].map(nd).ge(2)]
    if occ.empty:
        return _OCC_SCHEMA.empty_table()
    return pa.Table.from_pandas(occ[["doc_id", "pos"]].reset_index(drop=True),
                                schema=_OCC_SCHEMA, preserve_index=False)


_SCRUB_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("clean_text", pa.string()),
    ("n_tokens_kept", pa.int64()), ("n_tokens_removed", pa.int64())])


def make_scrub_fn(width: int = WIDTH):
    """Per-batch scrubber over docs ALREADY joined with their dup-window
    start positions (``pos`` column, null for clean docs): drop every
    token covered by any duplicated window occurrence in this doc and
    re-join the remainder with single spaces (the SQL twin's
    string_agg ORDER BY token position). Docs with zero tokens emit
    nothing (inner-over-tokens semantics, matching the twin)."""

    def scrub(df: pd.DataFrame) -> pa.Table:
        ids, cleans, kept_n, rem_n = [], [], [], []
        for doc_id, g in df.groupby("doc_id", sort=False):
            toks = (g["text"].iloc[0] or "").split()
            n = len(toks)
            if n == 0:
                continue
            mask = np.zeros(n, dtype=bool)
            for p in g["pos"].dropna().astype(np.int64).to_numpy():
                mask[p:p + width] = True
            kept = [t for t, m in zip(toks, mask) if not m]
            ids.append(int(doc_id))
            cleans.append(" ".join(kept))
            kept_n.append(len(kept))
            rem_n.append(n - len(kept))
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids, pa.int64()),
            "clean_text": pa.array(cleans, pa.string()),
            "n_tokens_kept": pa.array(kept_n, pa.int64()),
            "n_tokens_removed": pa.array(rem_n, pa.int64()),
        }).cast(_SCRUB_SCHEMA)

    return scrub


def doc_passage_scrub(docs_ds, width: int = WIDTH,
                      num_buckets: int | None = None,
                      join_partitions: int | None = None):
    """Substring-level dedup REMOVAL (the Lee et al. 2107.06499 action,
    not just the signal): every token covered by a cross-doc duplicated
    window is excised and the doc re-joined. Pipeline: window rows →
    bucket exchange (dup occurrences only come back out) → hash-shuffle
    join with the docs on doc_id → per-doc vectorized scrub. The join is
    keyed by doc_id with a partition count derived from the corpus, so
    per-partition memory is constant at scale; the dup-occurrence side
    is a small fraction of the window volume by construction."""
    b = num_buckets or derived_buckets(docs_ds)
    rows = docs_ds.map_batches(
        lambda t: passage_rows(t, width, b), batch_format="pyarrow")
    # materialized: consumed by count() AND the join (object-store
    # resident, spillable — the minhash `tagged` pattern)
    occ = rows.groupby("bucket").map_groups(
        dup_occurrence_rows, batch_format="pandas").materialize()
    if occ.count() == 0:
        # nothing duplicated anywhere: an empty map_groups output has no
        # schema for the join to key on — pass every doc through
        def passthrough(batch: pa.Table) -> pa.Table:
            import pandas as pd

            df = batch.to_pandas()
            df["pos"] = pd.NA
            return make_scrub_fn(width)(df)

        return docs_ds.map_batches(passthrough, batch_format="pyarrow")
    p = join_partitions or max(8, b // 8)
    joined = docs_ds.join(occ, "left_outer", int(p), on=("doc_id",))
    return joined.groupby("doc_id").map_groups(
        make_scrub_fn(width), batch_format="pandas")


# ---------------------------------------------------------------------------
# robust winnowing fingerprint selection (Schleimer et al., SIGMOD 2003 —
# the MOSS local fingerprinting algorithm) over the same W-token window
# hashes passage_rows emits

WINNOW = 4

_WINNOW_SCHEMA = pa.schema([("doc_id", pa.int64()), ("pos", pa.int64()),
                            ("phash", pa.string())])


def winnow_rows(batch: pa.Table, width: int = WIDTH,
                w: int = WINNOW) -> pa.Table:
    """Per-doc winnowing selection: in every window of ``w`` consecutive
    W-token k-gram hashes pick the MINIMUM hash, rightmost occurrence on
    ties (the robust-winnowing rule, which guarantees at most one new
    selection per window step). Emits the distinct selected
    (doc_id, pos, phash) rows — a doc's fingerprint sketch, ~1/w the
    k-gram volume with a match-coverage guarantee for matches of length
    >= W + w - 1 tokens. Docs with fewer than ``w`` k-grams emit
    nothing (no full winnow window), matching the SQL twin.

    Vectorized: the hex hashes compare lexicographically (= numerically
    for fixed-width hex), the rolling min is a log2(w) minimum-ladder
    over shifted slices, and the rightmost-tie argmin is a reverse
    np.where ladder — no Python loop over windows."""
    rows = passage_rows(batch, width, 1)
    if rows.num_rows == 0:
        return _WINNOW_SCHEMA.empty_table()
    doc = rows.column("doc_id").to_numpy()
    pos = rows.column("pos").to_numpy()
    h = np.asarray(rows.column("phash").to_pylist(), dtype=object)
    out_d, out_p, out_h = [], [], []
    # per-doc segments are contiguous (passage_rows emits docs in order)
    starts = np.flatnonzero(np.r_[True, doc[1:] != doc[:-1]])
    ends = np.r_[starts[1:], len(doc)]
    for s, e in zip(starts, ends):
        hs = h[s:e]
        n = len(hs) - w + 1
        if n <= 0:
            continue
        m = hs[:n].copy()
        for off in range(1, w):        # w-1 elementwise mins, not n*w
            np.minimum(m, hs[off:off + n], out=m)
        sel = np.full(n, -1, dtype=np.int64)
        for off in range(w - 1, -1, -1):   # rightmost tie wins
            cand = hs[off:off + n] == m
            sel = np.where((sel < 0) & cand, np.arange(n) + off, sel)
        uniq = np.unique(sel)
        out_d.extend([int(doc[s])] * len(uniq))
        out_p.extend((pos[s:e][uniq]).tolist())
        out_h.extend(hs[uniq].tolist())
    return pa.Table.from_pydict({
        "doc_id": pa.array(out_d, pa.int64()),
        "pos": pa.array(out_p, pa.int64()),
        "phash": pa.array(out_h, pa.string()),
    })
