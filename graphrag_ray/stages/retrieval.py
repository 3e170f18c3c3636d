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


# ---------------------------------------------------------------------------
# LightRAG dual-level retrieval (lightrag/dual_retrieval.rs:20-323)


def _r4(x: float) -> float:
    """Half-away-from-zero 4dp round (matches SQL round())."""
    import math as _m

    return _m.floor(abs(x) * 1e4 + 0.5) / 1e4 * (1.0 if x >= 0 else -1.0)


def extract_dual_keywords(query: str, llm=None,
                          max_fallback_words: int = 10) -> dict:
    """Dual-level keyword extraction
    (lightrag/keyword_extraction.rs:174-197): the LLM returns a JSON
    {"high_level": [themes], "low_level": [entities]} split; on any
    failure fall back to the heuristic — query words longer than 3 chars,
    first 10, lowercased, all low-level."""
    if llm is not None:
        try:
            import json

            resp = llm.complete(
                "Extract dual-level retrieval keywords from the query as "
                'JSON {"high_level": [...], "low_level": [...]}. '
                f"Query: {query}")
            start, end = resp.find("{"), resp.rfind("}")
            if start != -1 and end > start:
                d = json.loads(resp[start:end + 1])
                return {
                    "high_level": [str(w) for w in d.get("high_level", [])],
                    "low_level": [str(w) for w in d.get("low_level", [])],
                }
        except Exception:
            pass
    words = [w.lower() for w in query.split() if len(w) > 3]
    return {"high_level": [], "low_level": words[:max_fallback_words]}


def _merge_dual(high, low, top_k: int, strategy: str,
                high_weight: float, low_weight: float):
    """Merge-strategy replay (dual_retrieval.rs:189-323). Dedup always
    keeps a doc's EARLIEST slot in the strategy's visit order; 'weighted'
    sorts by (round4 weighted score DESC) with the reference's stable
    tie-break (high entries before low, then source rank)."""
    import pandas as pd

    rows: list = []
    if strategy == "interleave":
        # high[i] at slot 2i, low[i] at 2i+1 == the alternating iterator
        for i, r in enumerate(high.itertuples(index=False)):
            rows.append((2 * i, r.doc_id, "high", r.score))
        for i, r in enumerate(low.itertuples(index=False)):
            rows.append((2 * i + 1, r.doc_id, "low", r.score))
        rows.sort(key=lambda t: t[0])
    elif strategy in ("high_first", "low_first"):
        first, fname, second, sname = (
            (high, "high", low, "low") if strategy == "high_first"
            else (low, "low", high, "high"))
        for r in first.itertuples(index=False):
            rows.append((len(rows), r.doc_id, fname, r.score))
        for r in second.itertuples(index=False):
            rows.append((len(rows), r.doc_id, sname, r.score))
    elif strategy == "weighted":
        tmp = []
        for i, r in enumerate(high.itertuples(index=False)):
            tmp.append((-_r4(r.score * high_weight), 0, i, r.doc_id,
                        "high", r.score))
        for i, r in enumerate(low.itertuples(index=False)):
            tmp.append((-_r4(r.score * low_weight), 1, i, r.doc_id,
                        "low", r.score))
        tmp.sort()
        rows = [(j, d, lv, s)
                for j, (_w, _p, _i, d, lv, s) in enumerate(tmp)]
    else:
        raise ValueError(f"unknown merge strategy: {strategy}")
    seen: set = set()
    out: list = []
    for _pos, doc_id, level, score in rows:
        if doc_id in seen:
            continue
        seen.add(doc_id)
        out.append((len(out) + 1, doc_id, level, score))
        if len(out) >= top_k:
            break
    return pd.DataFrame(out, columns=["merged_rank", "doc_id", "level",
                                      "score"])


def dual_level_retrieve(high_store_ds, low_store_ds,
                        high_keywords=(), low_keywords=(),
                        top_k: int = 10, strategy: str = "interleave",
                        high_weight: float = 0.6, low_weight: float = 0.4,
                        text_column: str = "text",
                        id_column: str = "doc_id"):
    """T2/LightRAG dual-level retrieval: each level is a DISTRIBUTED BM25
    search over its own store Dataset (high = topic index: community
    summaries / abstracts; low = entity/chunk index), merged by the
    configured strategy. Config defaults mirror DualRetrievalConfig
    (dual_retrieval.rs:45-53: weights 0.6/0.4, Interleave). An empty
    keyword list skips that level (rs:148-151,169-172)."""
    import pandas as pd

    empty = pd.DataFrame({"doc_id": pd.Series([], dtype=object),
                          "score": pd.Series([], dtype=float)})
    high = (bm25_topk(high_store_ds, " ".join(high_keywords), top_k,
                      text_column=text_column, id_column=id_column)
            if high_keywords else empty)
    low = (bm25_topk(low_store_ds, " ".join(low_keywords), top_k,
                     text_column=text_column, id_column=id_column)
           if low_keywords else empty)
    return _merge_dual(high, low, top_k, strategy, high_weight, low_weight)
