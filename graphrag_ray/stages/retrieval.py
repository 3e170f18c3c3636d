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


# ---------------------------------------------------------------------------
# Query analysis + adaptive strategy selection
# (retrieval/mod.rs:497-581,807-819; retrieval/adaptive.rs:36-86)

QUERY_STOPWORDS = frozenset(
    "the be to of and a in that have i it for not on with he as you do at "
    "this but his by from they we say her she or an will my one all would "
    "there their what so up out if about who get which go me".split())

ABSTRACT_INDICATORS = frozenset(
    ("concept", "idea", "theory", "principle", "philosophy", "meaning",
     "understanding", "knowledge", "wisdom", "truth", "beauty", "justice"))

QUESTION_WORDS = frozenset(
    ("what", "how", "why", "when", "where", "who", "which", "explain",
     "describe"))

_INTENT_RULES = (
    ("overview", ("overview", "summary", "general", "about")),
    ("detailed", ("detailed", "specific", "exactly", "precise")),
    ("comparative", ("compare", "vs", "versus", "between", "difference")),
    ("causal", ("cause", "why", "because", "lead", "result")),
    ("temporal", ("when", "time", "before", "after", "during")),
)

# AdaptiveConfig per-query-type 4-strategy weights (adaptive.rs:56-86)
ADAPTIVE_WEIGHTS = {
    "entity_focused": (0.2, 0.5, 0.2, 0.1),   # vector, graph, hier, bm25
    "conceptual": (0.6, 0.1, 0.3, 0.0),
    "factual": (0.2, 0.1, 0.1, 0.6),
    "relationship": (0.2, 0.6, 0.1, 0.1),
    "complex": (0.25, 0.25, 0.25, 0.25),
}


def analyze_query(query: str, entity_names) -> dict:
    """Rule-based query analysis (retrieval/mod.rs:497-581): key entities
    by two-way word/name containment, concepts = >3-char non-stop words
    not overlapping a matched entity, type by entity-count → abstract →
    question-word cascade, intent by the five keyword lists (first match,
    default 'detailed'), complexity = min(0.1·words + 0.3·entities +
    0.2·concepts, 1.0). ``entity_names`` order is preserved in
    ``key_entities`` (pass a sorted list for determinism)."""
    words = query.lower().split()
    key_entities = []
    for name in entity_names:
        low = name.lower()
        if any(w in low or low in w for w in words):
            key_entities.append(name)
    lows = [n.lower() for n in key_entities]
    concepts = [w for w in words
                if len(w) > 3 and w not in QUERY_STOPWORDS
                and not any(w in e or e in w for e in lows)]
    if len(key_entities) > 1:
        qtype = "relationship"
    elif key_entities:
        qtype = "entity_focused"
    elif any(w in ABSTRACT_INDICATORS for w in words):
        qtype = "conceptual"
    elif any(w in QUESTION_WORDS for w in words):
        qtype = "exploratory"
    else:
        qtype = "factual"
    intent = "detailed"
    for name, kws in _INTENT_RULES:
        if any(w in kws for w in words):
            intent = name
            break
    complexity = min(0.1 * len(words) + 0.3 * len(key_entities)
                     + 0.2 * len(concepts), 1.0)
    return {
        "query_type": qtype,
        "key_entities": key_entities,
        "concepts": concepts,
        "intent": intent,
        "complexity_score": complexity,
    }


def calculate_strategy_weights(query_type: str, intent: str
                               ) -> tuple[float, float, float]:
    """(vector, graph, hierarchical) triple per retrieval/mod.rs:807-819."""
    if query_type == "entity_focused":
        return (0.5, 0.4, 0.1)
    if query_type == "relationship":
        return (0.3, 0.6, 0.1)
    if query_type == "conceptual":
        return (0.2, 0.2, 0.6) if intent == "overview" else (0.4, 0.3, 0.3)
    if query_type == "exploratory":
        return (0.3, 0.2, 0.5) if intent == "overview" else (0.4, 0.4, 0.2)
    return (0.6, 0.3, 0.1)  # factual


# fixed query set for the driver-oracled query_analysis surface; chosen to
# exercise every type/intent branch incl. the intent-rule precedence
ANALYSIS_QUERIES = (
    "overview about Morrison holdings",
    "compare Globex versus Initech operations",
    "the meaning of truth and justice",
    "explain how things happen",
    "plain data numbers",
    "when did results change",
    "precise cause of failure",
)


def adaptive_retrieve(docs_ds, query: str, entity_names, *,
                      entities_ds=None, edges_ds=None, top_k: int = 10,
                      embed_fn=None, text_column: str = "text",
                      id_column: str = "doc_id"):
    """Adaptive retrieval (retrieval/mod.rs:583-660 execute_adaptive_
    retrieval): analyze the query, pick (vector, graph, hierarchical)
    weights, run each strategy distributed, scale scores by weight, then
    rank + dedup. Strategy mapping in this engine: vector = BM25 over the
    chunk/doc store when no embed_fn is given (exact cosine ANN when one
    is), graph = personalized PageRank from the matched key entities over
    (entities_ds, edges_ds), hierarchical = BM25 over the 12-word abstract
    index (the topic store, as in dual-level retrieval). Returns
    (analysis, DataFrame[doc_or_entity, source, score] top-k by
    (round4 weighted score DESC, id))."""
    import pandas as pd
    import pyarrow as _pa

    analysis = analyze_query(query, entity_names)
    vw, gw, hw = calculate_strategy_weights(
        analysis["query_type"], analysis["intent"])
    parts = []
    if vw > 0.0:
        v = bm25_topk(docs_ds, query, top_k,
                      text_column=text_column, id_column=id_column)
        for r in v.itertuples(index=False):
            parts.append((str(r.doc_id), "vector", _r4(r.score * vw)))
    if gw > 0.0 and entities_ds is not None and edges_ds is not None \
            and analysis["key_entities"]:
        from .graph_analytics import pagerank

        seeds = set(analysis["key_entities"])

        def seed_vec(batch: _pa.Table) -> _pa.Table:
            names = batch.column("canonical_name").to_pylist()
            keep = [n in seeds for n in names]
            return batch.filter(_pa.array(keep))

        seed_ids = [r["canonical_id"] for r in
                    entities_ds.map_batches(seed_vec, batch_format="pyarrow")
                    .select_columns(["canonical_id"]).take_all()]
        if seed_ids:
            w = 1.0 / len(seed_ids)
            pr = pagerank(entities_ds, edges_ds,
                          personalization={s: w for s in sorted(seed_ids)}
                          ).to_pandas()
            pr = pr.sort_values(["score", "entity_id"],
                                ascending=[False, True]).head(top_k)
            for r in pr.itertuples(index=False):
                parts.append((str(r.entity_id), "graph",
                              _r4(float(r.score) * gw)))
    if hw > 0.0:
        def abstract(batch: _pa.Table) -> _pa.Table:
            texts = batch.column(text_column).to_pylist()
            return _pa.Table.from_pydict({
                id_column: batch.column(id_column),
                text_column: _pa.array(
                    [" ".join((t or "").split(" ")[:12]) for t in texts],
                    _pa.string()),
            })

        h = bm25_topk(docs_ds.map_batches(abstract, batch_format="pyarrow"),
                      query, top_k,
                      text_column=text_column, id_column=id_column)
        for r in h.itertuples(index=False):
            parts.append((str(r.doc_id), "hierarchical", _r4(r.score * hw)))
    # rank + dedup (mod.rs:1334-1360): score desc, first occurrence per id
    parts.sort(key=lambda t: (-t[2], t[0], t[1]))
    seen: set = set()
    rows = []
    for rid, source, score in parts:
        if rid in seen:
            continue
        seen.add(rid)
        rows.append((rid, source, score))
        if len(rows) >= top_k:
            break
    return analysis, pd.DataFrame(rows, columns=["id", "source", "score"])
