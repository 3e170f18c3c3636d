"""Concept selection and query→concept matching (reference
graphrag-core/src/lightrag/{concept_selection,query_concepts}.rs).

Ranks concept-graph nodes by weighted degree centrality + PageRank + IDF
(0.4/0.4/0.2, min-score 0.1) and matches query tokens against ranked
concepts with exact-containment and edit-distance-bounded fuzzy scores
plus the ranking boost.

PageRank substitution note: the reference calls petgraph's page_rank on
the DIRECTED relation graph (edge direction is an IndexMap-insertion
artifact of symmetric co-occurrence pairs); here the co-occurrence
edges are treated as undirected and ranked with the repo's standard
power iteration (damping 0.85, uniform reset, dangling redistribution,
L1 tol 1e-6, ≤100 iterations — stages/graph_analytics.py semantics),
then max-normalized exactly as the reference does.  Ties in both sorts
are pinned to concept-text ASC.
"""

from __future__ import annotations

import math

TOP_K = 20            # ConceptSelectionConfig::default
MIN_SCORE = 0.1
DEGREE_WEIGHT = 0.4
PAGERANK_WEIGHT = 0.4
IDF_WEIGHT = 0.2

EXACT_WEIGHT = 0.5    # QueryMatchConfig::default
FUZZY_WEIGHT = 0.3
FUZZY_THRESHOLD = 2
RANKING_BOOST = 0.2
MAX_RESULTS = 20


def pagerank_scores(nodes: list[str],
                    edges: list[tuple[str, str]]) -> dict[str, float]:
    """Undirected damped power iteration (graph_analytics semantics)."""
    n = len(nodes)
    if n == 0:
        return {}
    idx = {c: i for i, c in enumerate(nodes)}
    out: list[list[int]] = [[] for _ in range(n)]
    for a, b in edges:
        out[idx[a]].append(idx[b])
        out[idx[b]].append(idx[a])
    reset = 1.0 / n
    score = [reset] * n
    for _ in range(100):
        nxt = [0.0] * n
        dangling = 0.0
        for i in range(n):
            if out[i]:
                share = score[i] / len(out[i])
                for j in out[i]:
                    nxt[j] += share
            else:
                dangling += score[i]
        new = [(1.0 - 0.85) * reset + 0.85 * (v + dangling * reset)
               for v in nxt]
        delta = sum(abs(a - b) for a, b in zip(new, score))
        score = new
        if delta < 1e-6:
            break
    return {c: score[idx[c]] for c in nodes}


def rank_concepts(nodes: list[dict], edges: list[tuple[str, str]],
                  total_documents: int) -> list[dict]:
    """concept_selection.rs:134-303.  ``nodes``: [{concept, frequency,
    n_docs}]."""
    names = [nd["concept"] for nd in nodes]
    n = len(names)
    degree: dict[str, int] = {c: 0 for c in names}
    for a, b in edges:
        degree[a] += 1
        degree[b] += 1
    deg_scores = ({c: degree[c] / (n - 1) for c in names} if n > 1
                  else {c: 0.0 for c in names})
    pr = pagerank_scores(names, edges)
    max_pr = max(pr.values(), default=1.0) or 1.0
    out = []
    for nd in nodes:
        c = nd["concept"]
        deg = deg_scores.get(c, 0.0)
        prs = pr.get(c, 0.0) / max_pr
        df = nd["n_docs"]
        idf = math.tanh(math.log(total_documents / df) / 5.0) \
            if df and total_documents else 0.0
        combined = (DEGREE_WEIGHT * deg + PAGERANK_WEIGHT * prs
                    + IDF_WEIGHT * idf)
        if combined < MIN_SCORE:
            continue
        out.append({"concept": c, "score": combined, "degree_score": deg,
                    "pagerank_score": prs, "idf_score": idf,
                    "document_frequency": df,
                    "total_frequency": nd["frequency"]})
    out.sort(key=lambda r: (-r["score"], r["concept"]))
    return out


def _tokenize(text: str) -> list[str]:
    """query_concepts.rs:211-222 — lowercase, ≥2 chars pre-trim,
    non-alnum edges trimmed, non-empty."""
    out = []
    for t in text.lower().split():
        if len(t) < 2:
            continue
        s, e = 0, len(t)
        while s < e and not t[s].isalnum():
            s += 1
        while e > s and not t[e - 1].isalnum():
            e -= 1
        if e > s:
            out.append(t[s:e])
    return out


def _lev(s1: str, s2: str) -> int:
    if not s1:
        return len(s2)
    if not s2:
        return len(s1)
    prev = list(range(len(s2) + 1))
    for i, c1 in enumerate(s1, 1):
        cur = [i]
        for j, c2 in enumerate(s2, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (c1 != c2)))
        prev = cur
    return prev[-1]


def match_query_to_concepts(query: str, ranked: list[dict]) -> list[dict]:
    """query_concepts.rs:135-258 (exact + fuzzy, semantic disabled by
    default)."""
    qtoks = _tokenize(query)
    out = []
    for rc in ranked:
        concept = rc["concept"]
        cl = concept.lower()
        if qtoks:
            exact = sum(1 for t in qtoks if t in cl) / len(qtoks)
        else:
            exact = 0.0
        ctoks = _tokenize(concept)
        fuzzy = 0.0
        if qtoks:
            total = 0.0
            for qt in qtoks:
                best = 0.0
                for ct in ctoks:
                    dist = _lev(qt, ct)
                    mx = max(len(qt), len(ct))
                    if mx == 0:
                        continue
                    sim = 1.0 - dist / mx
                    if dist <= FUZZY_THRESHOLD:
                        best = max(best, sim)
                total += best
            fuzzy = total / len(qtoks)
        match = EXACT_WEIGHT * exact + FUZZY_WEIGHT * fuzzy
        final = match + RANKING_BOOST * rc["score"]
        if match == 0.0 and exact == 0.0:
            continue
        matched = [t for t in qtoks if t in cl]
        out.append({"concept": concept, "match_score": final,
                    "ranking_score": rc["score"], "exact_score": exact,
                    "fuzzy_score": fuzzy,
                    "matched_tokens": matched})
    out.sort(key=lambda r: (-r["match_score"], r["concept"]))
    return out[:MAX_RESULTS]


# fixed query workload for the driver-oracled matching surface
# capitalized so the concept extractor's phrase regexes fire on the
# refinement surfaces; matching lowercases internally either way
CONCEPT_QUERIES: tuple[str, ...] = (
    "Alice Harmon research",
    "Acme Corp office plans",
    "Tokyo visits",
    "Pemberton typo harmmon",
    "nothing relevant here",
)
