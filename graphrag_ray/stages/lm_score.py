"""Bigram language-model document scoring (CCNet-style quality signal).

CCNet (Wenzek et al., arXiv:1911.00359) buckets web documents by LM
perplexity; the distributed analogue here trains an add-one-smoothed
bigram model ON the corpus itself and scores every document with its
average per-token log-probability — one corpus-sized exchange, no
broadcast of the (unbounded at 100 TB) bigram table:

  map_batches(bigram_occ_rows)    per-doc bigram counts
                                  (bucket=hash(w1), doc_id, w1, w2, n_occ)
  groupby(bucket).map_groups      ALL occurrences of a context word w1
                                  share a bucket, so corpus counts
                                  c(w1,w2) and c(w1·) are both complete
                                  inside the group — model training and
                                  scoring fuse into one vectorized pass
                                  emitting per-(bucket, doc) partials
  groupby(doc_id) final           tiny: sums partials, rounds the average

Model: p(w2|w1) = (c(w1,w2) + 1) / (c(w1·) + V), where c(w1·) counts w1
as a bigram context and V is the corpus-wide distinct-token count (a
scalar — the only driver-side value). score = sum(ln p)/n_bigrams,
rounded to 4 (the repo's float-oracle convention). Docs with < 2 tokens
emit no bigrams and are absent (inner semantics), matching the SQL twin.

No reference counterpart (graphrag-rs has no corpus LM); driver-brief
training-data op alongside the quality/langid family.
"""

from __future__ import annotations

import zlib
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

NUM_BUCKETS = 64


def bigram_occ_rows(batch: pa.Table,
                    num_buckets: int = NUM_BUCKETS) -> pa.Table:
    """Per-doc bigram occurrence counts, bucketed by hash of the context
    word (crc32 — deterministic across workers, unlike builtin hash)."""
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    out_b, out_doc, out_w1, out_w2, out_n = [], [], [], [], []
    for doc_id, text in zip(ids, texts):
        toks = (text or "").split()
        for (w1, w2), n in Counter(zip(toks, toks[1:])).items():
            out_b.append(zlib.crc32(w1.encode()) % num_buckets)
            out_doc.append(doc_id)
            out_w1.append(w1)
            out_w2.append(w2)
            out_n.append(n)
    return pa.Table.from_pydict({
        "bucket": pa.array(out_b, pa.int32()),
        "doc_id": pa.array(out_doc, pa.int64()),
        "w1": pa.array(out_w1, pa.string()),
        "w2": pa.array(out_w2, pa.string()),
        "n_occ": pa.array(out_n, pa.int64()),
    })


def distinct_word_rows(batch: pa.Table) -> pa.Table:
    """Per-batch distinct tokens (combiner for the vocab-size scalar)."""
    words = set()
    for text in batch.column("text").to_pylist():
        words.update((text or "").split())
    return pa.Table.from_pydict({"w": pa.array(sorted(words), pa.string())})


def vocab_size(docs_ds) -> int:
    """Corpus-wide distinct-token count V (small aggregate)."""
    return (docs_ds.map_batches(distinct_word_rows, batch_format="pyarrow")
            .groupby("w").count().count())


_PARTIAL_COLS = {"doc_id": "int64", "sum_logprob": "float64",
                 "n_bigrams": "int64"}


def make_score_bucket_fn(v: int):
    """Fused train+score inside a context-word bucket: corpus counts
    c(w1,w2)/c(w1·) are complete here by the bucketing invariant."""

    def score_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({c: pd.Series(dtype=t)
                                 for c, t in _PARTIAL_COLS.items()})
        cb = df.groupby(["w1", "w2"])["n_occ"].transform("sum")
        cu = df.groupby("w1")["n_occ"].transform("sum")
        contrib = df["n_occ"] * (np.log(cb.to_numpy() + 1.0)
                                 - np.log(cu.to_numpy() + float(v)))
        out = (pd.DataFrame({"doc_id": df["doc_id"],
                             "sum_logprob": contrib,
                             "n_bigrams": df["n_occ"]})
               .groupby("doc_id", sort=False)
               .agg(sum_logprob=("sum_logprob", "sum"),
                    n_bigrams=("n_bigrams", "sum"))
               .reset_index())
        return out[list(_PARTIAL_COLS)]

    return score_bucket


def lm_bigram_doc_scores(docs_ds):
    """(doc_id, n_bigrams, avg_logprob) for every doc with >= 2 tokens."""
    from ray.data.aggregate import Sum

    v = vocab_size(docs_ds)
    occ = docs_ds.map_batches(bigram_occ_rows, batch_format="pyarrow")
    partial = occ.groupby("bucket").map_groups(
        make_score_bucket_fn(v), batch_format="pandas")
    final = partial.groupby("doc_id").aggregate(
        Sum("sum_logprob", alias_name="sum_logprob"),
        Sum("n_bigrams", alias_name="n_bigrams"))

    def finalize(batch: pa.Table) -> pa.Table:
        s = batch.column("sum_logprob").to_numpy(zero_copy_only=False)
        n = batch.column("n_bigrams").to_numpy(zero_copy_only=False)
        scale = 10_000.0
        x = s / n
        # DuckDB round(): half away from zero — x here is negative
        avg = np.sign(x) * (np.floor(np.abs(x) * scale + 0.5) / scale)
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "n_bigrams": pa.array(n.astype(np.int64)),
            "avg_logprob": pa.array(avg, pa.float64()),
        })

    return final.map_batches(finalize, batch_format="pyarrow")


def top_bigrams(docs_ds, k: int = 20):
    """Corpus top-k bigrams by occurrence count (the LM model's head):
    per-batch bigram-count combiner → groupby sum → per-block partial
    top-k → tiny driver merge. Ties break on (w1, w2) ascending."""
    from ray.data.aggregate import Sum

    occ = docs_ds.map_batches(bigram_occ_rows, batch_format="pyarrow")
    agg = occ.groupby(["w1", "w2"]).aggregate(Sum("n_occ", alias_name="n"))

    def partial_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(["n", "w1", "w2"],
                            ascending=[False, True, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = agg.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    out = (parts.sort_values(["n", "w1", "w2"],
                             ascending=[False, True, True])
           .head(k).reset_index(drop=True))
    out["n"] = out["n"].astype("int64")
    return out[["w1", "w2", "n"]]
