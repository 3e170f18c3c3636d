"""Bigram language-model document scoring (CCNet-style quality signal).

CCNet (Wenzek et al., arXiv:1911.00359) buckets web documents by LM
perplexity; the distributed analogue here trains an add-one-smoothed
bigram model ON the corpus itself and scores every document with its
average per-token log-probability.

Round-5 shape (replaces the fixed-64-bucket fused train+score exchange,
whose per-group size was corpus-proportional — one group held 1/64 of
ALL corpus bigram occurrences in a single pandas task):

  map_batches(bigram_occ_rows)   vectorized per-doc bigram counts
                                 (doc_id, w1, w2, n_occ) — tokens are
                                 factorized once per batch, bigrams
                                 counted by integer-code groupby (no
                                 Python loop over bigrams)
  groupby(w1, w2).sum            corpus counts c(w1,w2) — per-KEY groups,
                                 unbounded parallelism
  groupby(w1).sum                context totals c(w1·) from the cb table
  occurrences × model            ADAPTIVE: the (w1, w2, cb, cu) model is
                                 broadcast via ray.put when it fits
                                 (map-side merge, zero extra exchange);
                                 above the threshold it flows through
                                 Dataset.join (hash-shuffle join keyed by
                                 the natural key — no fixed bucket count,
                                 per-partition memory set by
                                 num_partitions, which scales with input)
  groupby(doc_id) final          tiny: sums partials, rounds the average

Model: p(w2|w1) = (c(w1,w2) + 1) / (c(w1·) + V), where c(w1·) counts w1
as a bigram context and V is the corpus-wide distinct-token count (a
scalar — the only driver-side value). score = sum(ln p)/n_bigrams,
rounded to 4 (the repo's float-oracle convention). Docs with < 2 tokens
emit no bigrams and are absent (inner semantics), matching the SQL twin.

No reference counterpart (graphrag-rs has no corpus LM); driver-brief
training-data op alongside the quality/langid family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

# Above this many distinct bigrams the (w1, w2, cb, cu) model stops being
# a broadcastable small side and the score flows through Dataset.join.
BROADCAST_MODEL_LIMIT = 2_000_000

_OCC_SCHEMA = pa.schema([("doc_id", pa.int64()), ("w1", pa.string()),
                         ("w2", pa.string()), ("n_occ", pa.int64())])


def _flat_tokens(batch: pa.Table):
    """Tokenize a batch once: (flat object array of tokens, per-doc
    lengths, doc_id per token). One .split() per doc; everything after
    is numpy."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    texts = batch.column("text").to_pylist()
    toks_per_doc = [(t or "").split() for t in texts]
    lens = np.fromiter((len(t) for t in toks_per_doc), dtype=np.int64,
                       count=len(toks_per_doc))
    total = int(lens.sum())
    flat = np.empty(total, dtype=object)
    pos = 0
    for t in toks_per_doc:
        flat[pos:pos + len(t)] = t
        pos += len(t)
    return flat, lens, np.repeat(ids, lens)


def bigram_occ_rows(batch: pa.Table) -> pa.Table:
    """Per-doc bigram occurrence counts (doc_id, w1, w2, n_occ).

    Vectorized: tokens factorize to int codes once per batch, bigram
    starts are a boolean mask (every token except each doc's last), and
    the per-(doc, w1, w2) count is one integer groupby — the
    extraction_vec.py playbook applied to the old per-doc Counter loop."""
    flat, lens, doc_rep = _flat_tokens(batch)
    if len(flat) == 0:
        return _OCC_SCHEMA.empty_table()
    codes, uniques = pd.factorize(flat)
    starts = np.ones(len(flat), dtype=bool)
    ends = np.cumsum(lens) - 1          # last-token index per doc
    starts[ends[lens > 0]] = False      # a doc's last token starts nothing
    starts = np.flatnonzero(starts)
    if len(starts) == 0:
        return _OCC_SCHEMA.empty_table()
    g = (pd.DataFrame({"doc_id": doc_rep[starts],
                       "w1": codes[starts],
                       "w2": codes[starts + 1]})
         .groupby(["doc_id", "w1", "w2"], sort=False).size())
    gi = g.index.to_frame(index=False)
    uniq = np.asarray(uniques, dtype=object)
    return pa.Table.from_pydict({
        "doc_id": pa.array(gi["doc_id"].to_numpy(), pa.int64()),
        "w1": pa.array(uniq[gi["w1"].to_numpy()], pa.string()),
        "w2": pa.array(uniq[gi["w2"].to_numpy()], pa.string()),
        "n_occ": pa.array(g.to_numpy().astype(np.int64)),
    })


def distinct_word_rows(batch: pa.Table) -> pa.Table:
    """Per-batch distinct tokens (combiner for the vocab-size scalar)."""
    flat, _, _ = _flat_tokens(batch)
    return pa.Table.from_pydict(
        {"w": pa.array(pd.unique(flat), pa.string())})


def vocab_size(docs_ds) -> int:
    """Corpus-wide distinct-token count V (small aggregate)."""
    return (docs_ds.map_batches(distinct_word_rows, batch_format="pyarrow")
            .groupby("w").count().count())


def _partial_per_doc(doc_id: np.ndarray, x: np.ndarray,
                     n_occ: np.ndarray) -> pa.Table:
    """Per-batch combiner: sum contributions per doc before the final
    (tiny) groupby(doc_id) exchange. Arrow out — pandas-format blocks
    feed Ray's sort-based aggregate ~8x slower than Arrow blocks."""
    g = (pd.DataFrame({"doc_id": doc_id, "sum_logprob": x, "n_bigrams": n_occ})
         .groupby("doc_id", sort=False)
         .agg(sum_logprob=("sum_logprob", "sum"),
              n_bigrams=("n_bigrams", "sum")).reset_index())
    return pa.Table.from_pydict({
        "doc_id": pa.array(g["doc_id"].to_numpy(), pa.int64()),
        "sum_logprob": pa.array(g["sum_logprob"].to_numpy(), pa.float64()),
        "n_bigrams": pa.array(g["n_bigrams"].to_numpy(), pa.int64()),
    })


def make_broadcast_score_fn(model_ref, v: int):
    """Map-side model merge: the (w1, w2, cb, cu) table ships once via
    the object store; each batch scores with one vectorized merge."""

    def score(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "sum_logprob": pa.array([], pa.float64()),
                             "n_bigrams": pa.array([], pa.int64())})
        model = ray.get(model_ref)
        df = batch.to_pandas()
        m = df.merge(model, on=["w1", "w2"], how="left")
        n = m["n_occ"].to_numpy(dtype=np.float64)
        x = n * (np.log(m["cb"].to_numpy(dtype=np.float64) + 1.0)
                 - np.log(m["cu"].to_numpy(dtype=np.float64) + float(v)))
        return _partial_per_doc(m["doc_id"].to_numpy(), x,
                                m["n_occ"].to_numpy(dtype=np.int64))

    return score


def _joined_score(batch: pa.Table, v: int) -> pa.Table:
    """Contribution partials over occurrence rows already carrying cb/cu
    (the Dataset.join path)."""
    if len(batch) == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "sum_logprob": pa.array([], pa.float64()),
                         "n_bigrams": pa.array([], pa.int64())})
    n = batch.column("n_occ").to_numpy(zero_copy_only=False)
    cb = batch.column("cb").to_numpy(zero_copy_only=False).astype(np.float64)
    cu = batch.column("cu").to_numpy(zero_copy_only=False).astype(np.float64)
    x = n.astype(np.float64) * (np.log(cb + 1.0) - np.log(cu + float(v)))
    return _partial_per_doc(
        batch.column("doc_id").to_numpy(zero_copy_only=False), x, n)


def lm_bigram_doc_scores(docs_ds, num_partitions: int | None = None,
                         broadcast_limit: int = BROADCAST_MODEL_LIMIT):
    """(doc_id, n_bigrams, avg_logprob) for every doc with >= 2 tokens.

    Exchanges are all keyed by natural keys — (w1, w2), w1, doc_id — so
    per-partition memory never grows with the corpus; there is no fixed
    bucket count anywhere on the path."""
    from ray.data.aggregate import Sum

    v = vocab_size(docs_ds)
    # occ feeds both the model aggregation and the scoring pass; pin it
    # once so the tokenize+count emitter runs a single time (spillable —
    # the object store, not the driver, holds it).
    occ = docs_ds.map_batches(bigram_occ_rows,
                              batch_format="pyarrow").materialize()
    cb = (occ.groupby(["w1", "w2"])
          .aggregate(Sum("n_occ", alias_name="cb")).materialize())
    n_model = cb.count()

    if n_model <= broadcast_limit:
        model = cb.to_pandas()
        model["cu"] = model.groupby("w1")["cb"].transform("sum")
        scored = occ.map_batches(
            make_broadcast_score_fn(ray.put(model), v),
            batch_format="pyarrow")
    else:
        # model too large to broadcast: per-key aggregates + shuffle joins
        # (the oracle's own cb/cu shape). Partition count scales with the
        # model / occurrence sizes instead of a fixed B.
        cu = cb.groupby("w1").aggregate(Sum("cb", alias_name="cu"))
        p_model = max(8, n_model // 2_000_000 + 1)
        cbu = cb.join(cu, "inner", int(p_model), on=("w1",))
        p_occ = (num_partitions
                 or max(16, occ.count() // 2_000_000 + 1))
        joined = occ.join(cbu, "inner", int(p_occ), on=("w1", "w2"))
        scored = joined.map_batches(lambda b: _joined_score(b, v),
                                    batch_format="pyarrow")

    final = scored.groupby("doc_id").aggregate(
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
