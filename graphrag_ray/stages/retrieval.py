"""Query-side retrieval operators (reference retrieval/*), Ray-Data-first.

BM25 (retrieval/bm25.rs:56-213): Lucene-style idf = ln(N/df) + 1, the
reference's NORMALIZED tf (freq / doc_length) in the saturation term,
k1 = 1.2, b = 0.75, tokenizer = lowercase → strip non-alphanumerics →
len > 2 → stop-word filter (:202-229).

Distributed shape: one map_batches pass reduces each document to a tiny
stats row (doc length + per-query-term counts), Dataset aggregates produce
the global N / avgdl / df scalars, and a second pass over the small stats
table scores + keeps per-batch top-k partials — the corpus text is read
exactly once and nothing document-sized reaches the driver.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

# retrieval/bm25.rs:217-229
BM25_STOPWORDS = frozenset(
    """the be to of and a in that have i it for not on with he as you do at
    this but his by from they we say her she or an will my one all would
    there their what so up out if about who get which go me when make can
    like time no just him know take people into year your good some could
    them see other than then now look only come its over think also back
    after use two how our work first well way even new want because any
    these give day most us""".split()
)


def bm25_tokenize(text: str) -> list[str]:
    """retrieval/bm25.rs:202-213."""
    out = []
    for w in (text or "").lower().split():
        t = "".join(c for c in w if c.isalnum())
        if t and len(t) > 2 and t not in BM25_STOPWORDS:
            out.append(t)
    return out


def bm25_topk(docs_ds, query: str, k: int = 10, k1: float = 1.2,
              b: float = 0.75, text_column: str = "text",
              id_column: str = "doc_id"):
    """Distributed BM25 ranking; returns a pandas DataFrame
    (doc_id, score) of the top-k by (round4 score DESC, doc_id ASC)."""
    from ray.data.aggregate import Count, Sum

    q_tokens = bm25_tokenize(query)
    terms = sorted(set(q_tokens))
    weights = {t: q_tokens.count(t) for t in terms}
    m = len(terms)

    def stats(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_pylist()
        texts = batch.column(text_column).to_pylist()
        doclen = np.zeros(len(ids), dtype=np.int64)
        tf = np.zeros((len(ids), m), dtype=np.int64)
        tindex = {t: j for j, t in enumerate(terms)}
        for i, text in enumerate(texts):
            toks = bm25_tokenize(text)
            doclen[i] = len(toks)
            for tok in toks:
                j = tindex.get(tok)
                if j is not None:
                    tf[i, j] += 1
        cols = {
            "doc_id": pa.array(ids),
            "doclen": pa.array(doclen),
        }
        for j, t in enumerate(terms):
            cols[f"tf_{j}"] = pa.array(tf[:, j])
            cols[f"hit_{j}"] = pa.array((tf[:, j] > 0).astype(np.int64))
        return pa.Table.from_pydict(cols)

    stats_ds = docs_ds.map_batches(stats, batch_format="pyarrow",
                                   batch_size=None).materialize()
    aggs = [Count(), Sum("doclen")]
    aggs += [Sum(f"hit_{j}") for j in range(m)]
    g = stats_ds.aggregate(*aggs)
    n_docs = float(g["count()"])
    avgdl = float(g["sum(doclen)"]) / n_docs if n_docs else 0.0
    df = {j: float(g[f"sum(hit_{j})"]) for j in range(m)}
    idf = {j: (math.log(n_docs / df[j]) + 1.0) if df[j] > 0 else 0.0
           for j in range(m)}

    def score(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id").to_pylist())
        doclen = batch.column("doclen").to_numpy(
            zero_copy_only=False).astype(np.float64)
        s = np.zeros(len(ids), dtype=np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            denom_base = k1 * (1.0 - b + b * doclen / avgdl)
            any_hit = np.zeros(len(ids), dtype=bool)
            for j, t in enumerate(terms):
                f = batch.column(f"tf_{j}").to_numpy(
                    zero_copy_only=False).astype(np.float64)
                tfn = np.where(doclen > 0, f / doclen, 0.0)
                contrib = idf[j] * (tfn * (k1 + 1.0)) / (tfn + denom_base)
                s += weights[t] * np.where(f > 0, contrib, 0.0)
                any_hit |= f > 0
        keep = any_hit
        ids, s = ids[keep], s[keep]
        s = np.floor(np.abs(s) * 1e4 + 0.5) / 1e4 * np.sign(s)
        order = np.lexsort((ids, -s))[:k]
        return pa.Table.from_pydict(
            {"doc_id": pa.array(ids[order]),
             "score": pa.array(s[order], pa.float64())}
        )

    parts = stats_ds.map_batches(score, batch_format="pyarrow",
                                 batch_size=None)
    import pandas as pd

    allp = parts.to_pandas()
    if allp.empty:
        return pd.DataFrame({"doc_id": [], "score": []})
    return (allp.sort_values(["score", "doc_id"], ascending=[False, True])
            .head(k).reset_index(drop=True))
