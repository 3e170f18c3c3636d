"""DuckDB oracle twins for the query-intelligence surfaces
(qi_rewrite, qi_routing, qopt_plans).

Replays intelligence.rs's rewrite pipeline (type cascade, template
replace, the stateful synonym-dedup fold as a recursive CTE),
adaptive_routing.rs's weighted complexity bands, and optimizer.rs's
rewrite-swap + greedy join order + cost model symbolically over the kgx
statistics.  Shares only the keyword/synonym CONSTANTS with the engine.
"""

from __future__ import annotations

from .kgx import _corpus_cte
from .stages.query_intel import (BROAD_KEYWORDS, OPTIMIZER_PLANS,
                                 QI_QUERIES, QI_STOP_WORDS, QI_TEMPLATES,
                                 SPECIFIC_KEYWORDS, SYNONYMS)


def _esc(s: str) -> str:
    return s.replace("'", "''")


def _qi_queries_cte() -> str:
    vals = ", ".join(f"({i}, '{_esc(q)}')" for i, q in enumerate(QI_QUERIES))
    return f"q(qid, query) AS (VALUES {vals})"


_TYPE_CASE = """
  CASE WHEN strpos(lq, 'relationship between') > 0
         OR strpos(lq, 'how does') > 0 OR strpos(lq, 'related to') > 0
         OR strpos(lq, 'connection between') > 0 THEN 'relationship'
       WHEN starts_with(lq, 'who is') OR starts_with(lq, 'what is')
         OR starts_with(lq, 'define') THEN 'entity_lookup'
       WHEN starts_with(lq, 'how many') OR starts_with(lq, 'count')
         OR strpos(lq, 'total') > 0 OR strpos(lq, 'sum') > 0
         OR strpos(lq, 'average') > 0 THEN 'aggregation'
       WHEN strpos(lq, 'compare') > 0 OR strpos(lq, 'difference between') > 0
         OR strpos(lq, 'versus') > 0 OR strpos(lq, 'vs') > 0
         THEN 'comparison'
       WHEN strpos(lq, 'when') > 0 OR strpos(lq, 'before') > 0
         OR strpos(lq, 'after') > 0 OR strpos(lq, 'during') > 0
         OR strpos(lq, 'timeline') > 0 THEN 'temporal'
       WHEN strpos(lq, 'why') > 0 OR strpos(lq, 'because') > 0
         OR strpos(lq, 'cause') > 0 OR strpos(lq, 'reason') > 0
         OR strpos(lq, 'led to') > 0 THEN 'causal'
       ELSE 'general' END
"""


def qi_rewrite_sql() -> str:
    syn_vals = ", ".join(
        f"('{_esc(t)}', {i}, '{_esc(s)}')"
        for t, syns in SYNONYMS.items() for i, s in enumerate(syns))
    stop_in = ", ".join(f"'{w}'" for w in sorted(QI_STOP_WORDS))
    # template precedence: explicit ordered CASE — first matching
    # (type, contains) pair wins (entity_lookup has two patterns and
    # 'who is' precedes 'what is')
    ordered = []
    for pattern, ttype, repl in QI_TEMPLATES:
        ordered.append(
            f"WHEN qtype = '{ttype}' AND strpos(lq, '{pattern}') > 0 "
            f"THEN replace(lq, '{pattern}', '{repl}')")
    tmpl_case = "CASE " + " ".join(ordered) + " ELSE lq END"
    return f"""
        WITH RECURSIVE {_qi_queries_cte()},
        syns(term, idx, syn) AS (VALUES {syn_vals}),
        base AS (
          SELECT qid, query, trim(lower(query)) AS lq FROM q),
        typed AS (
          SELECT qid, query, lq, {_TYPE_CASE} AS qtype FROM base),
        templ AS (
          SELECT qid, query, lq, qtype, {tmpl_case} AS rewritten0
          FROM typed),
        words AS (
          SELECT qid, list_filter(string_split_regex(rewritten0, '\\s+'),
                                  x -> x <> '') AS ws
          FROM templ),
        -- stateful synonym-expansion fold (intelligence.rs:243-262):
        -- originals always appended, a synonym only when absent from the
        -- accumulated list
        rec AS (
          SELECT qid, 0 AS i, []::VARCHAR[] AS acc FROM words
          UNION ALL
          SELECT r.qid, r.i + 1,
                 r.acc || [w.ws[r.i + 1]]
                 || list_filter(
                      coalesce((SELECT list(s.syn ORDER BY s.idx)
                                FROM syns s WHERE s.term = w.ws[r.i + 1]),
                               []),
                      x -> NOT list_contains(r.acc || [w.ws[r.i + 1]], x))
          FROM rec r JOIN words w USING (qid)
          WHERE r.i < len(w.ws)),
        expanded AS (
          SELECT r.qid, r.acc
          FROM rec r JOIN words w USING (qid)
          WHERE r.i = len(w.ws)),
        final AS (
          SELECT t.qid, t.query, t.qtype,
                 array_to_string(e.acc, ' ') AS rewritten,
                 list_filter(e.acc, x -> x NOT IN ({stop_in})) AS key_terms,
                 len(list_filter(string_split_regex(t.lq, '\\s+'),
                                 x -> x <> '')) AS wc
          FROM templ t JOIN expanded e USING (qid))
        SELECT query, rewritten, qtype AS query_type,
               array_to_string(key_terms, '|') AS expanded_terms,
               round(CASE WHEN len(key_terms) = 0 THEN 0.5
                     ELSE LEAST(len(key_terms) / (wc + 1.0), 1.0) * 0.6
                          + 0.5 * 0.4 END, 4) AS confidence
        FROM final
    """


def qi_routing_sql() -> str:
    broad = " + ".join(
        f"(CASE WHEN strpos(lq, '{_esc(k)}') > 0 THEN 1 ELSE 0 END)"
        for k in BROAD_KEYWORDS)
    spec = " + ".join(
        f"(CASE WHEN strpos(lq, '{_esc(k)}') > 0 THEN 1 ELSE 0 END)"
        for k in SPECIFIC_KEYWORDS)
    return f"""
        WITH {_qi_queries_cte()},
        base AS (SELECT qid, query, lower(query) AS lq FROM q),
        ks AS (
          SELECT qid, query, lq, ({broad}) AS nb, ({spec}) AS ns
          FROM base),
        scores AS (
          SELECT qid, query,
                 CASE WHEN nb + ns > 0
                      THEN (nb - ns)::DOUBLE / (nb + ns) ELSE 0.0 END
                     AS keyword_score,
                 CASE WHEN len(list_filter(string_split_regex(query,
                          '\\s+'), x -> x <> '')) BETWEEN 1 AND 3 THEN 0.5
                      WHEN len(list_filter(string_split_regex(query,
                          '\\s+'), x -> x <> '')) BETWEEN 4 AND 5 THEN 0.2
                      WHEN len(list_filter(string_split_regex(query,
                          '\\s+'), x -> x <> '')) BETWEEN 6 AND 7 THEN 0.0
                      WHEN len(list_filter(string_split_regex(query,
                          '\\s+'), x -> x <> '')) BETWEEN 8 AND 10
                          THEN -0.3
                      ELSE -0.5 END AS length_score,
                 (CASE ((length(lq) - length(replace(lq, '"', ''))) // 2
                        + (length(lq) - length(replace(lq, ' and ', '')))
                          // 5
                        + (length(lq) - length(replace(lq, 'between', '')))
                          // 7)
                    WHEN 0 THEN 0.3 WHEN 1 THEN 0.0 WHEN 2 THEN -0.4
                    ELSE -0.7 END) AS entity_score
          FROM ks),
        graded AS (
          SELECT *,
                 keyword_score * 0.5 + length_score * 0.3
                 + entity_score * 0.2 AS total
          FROM scores),
        bands AS (
          SELECT *,
                 CASE WHEN total >= 0.7 THEN 'very_broad'
                      WHEN total >= 0.4 THEN 'broad'
                      WHEN total >= -0.2 THEN 'medium'
                      WHEN total >= -0.5 THEN 'specific'
                      ELSE 'very_specific' END AS complexity
          FROM graded)
        SELECT query, complexity,
               CASE complexity WHEN 'very_broad' THEN 3
                    WHEN 'broad' THEN 2 WHEN 'medium' THEN 1
                    ELSE 0 END AS suggested_level,
               round(keyword_score, 4) AS keyword_score,
               round(length_score, 4) AS length_score,
               round(entity_score, 4) AS entity_score
        FROM bands
    """


def qopt_plans_sql() -> str:
    """Symbolic replay of optimizer.rs over the kgx statistics: per fixed
    plan, the rewrite swap and greedy pair choice become CASE trees over
    the entity-type counts; cardinality/cost/selectivity follow the exact
    integer/float arithmetic of estimate_cost."""
    return f"""
        WITH {_corpus_cte()},
        st AS (
          SELECT
            (SELECT count(*) FROM canon
             WHERE entity_type = 'PERSON')::BIGINT AS p,
            (SELECT count(*) FROM canon
             WHERE entity_type = 'ORGANIZATION')::BIGINT AS o,
            (SELECT count(*) FROM canon
             WHERE entity_type = 'LOCATION')::BIGINT AS l,
            (SELECT count(*) FROM canon)::BIGINT AS t,
            (SELECT count(*) FROM kgx_edge_agg)::BIGINT AS r),
        stx AS (
          SELECT *, (r * 2.0) / t AS d FROM st),
        -- greedy_threeway intermediates: rewrite swap inside (P⋈L), then
        -- top-level swap vs O, flatten in-order, min-product pair first
        g3 AS (
          SELECT *,
            CASE WHEN p > l THEN 'Scan(LOCATION)' ELSE 'Scan(PERSON)' END
                AS s1n,
            CASE WHEN p > l THEN 'Scan(PERSON)' ELSE 'Scan(LOCATION)' END
                AS s2n,
            CASE WHEN p > l THEN l ELSE p END AS s1c,
            CASE WHEN p > l THEN p ELSE l END AS s2c,
            trunc(sqrt((p * l)::DOUBLE))::BIGINT AS subc
          FROM stx),
        g3b AS (
          -- operand order after top-level rewrite swap
          SELECT *,
            CASE WHEN subc > o
                 THEN ['Scan(ORGANIZATION)', s1n, s2n]
                 ELSE [s1n, s2n, 'Scan(ORGANIZATION)'] END AS names,
            CASE WHEN subc > o THEN [o, s1c, s2c]
                 ELSE [s1c, s2c, o] END AS cards
          FROM g3),
        g3c AS (
          SELECT *,
            (cards[1] * cards[2])::DOUBLE AS p01,
            (cards[1] * cards[3])::DOUBLE AS p02,
            (cards[2] * cards[3])::DOUBLE AS p12
          FROM g3b),
        g3d AS (
          SELECT *,
            CASE WHEN p02 < p01 THEN
                   CASE WHEN p12 < p02 THEN 23 ELSE 13 END
                 ELSE CASE WHEN p12 < p01 THEN 23 ELSE 12 END
            END AS pair
          FROM g3c),
        g3e AS (
          SELECT *,
            CASE pair WHEN 12 THEN names[3] WHEN 13 THEN names[2]
                 ELSE names[1] END AS remn,
            CASE pair WHEN 12 THEN cards[3] WHEN 13 THEN cards[2]
                 ELSE cards[1] END AS remc,
            CASE pair WHEN 12 THEN names[1] WHEN 13 THEN names[1]
                 ELSE names[2] END AS xn,
            CASE pair WHEN 12 THEN cards[1] WHEN 13 THEN cards[1]
                 ELSE cards[2] END AS xc,
            CASE pair WHEN 12 THEN names[2] WHEN 13 THEN names[3]
                 ELSE names[3] END AS yn,
            CASE pair WHEN 12 THEN cards[2] WHEN 13 THEN cards[3]
                 ELSE cards[3] END AS yc
          FROM g3d),
        plans AS (
          -- swap_binary
          SELECT 'swap_binary' AS plan,
                 CASE WHEN p > o
                      THEN 'Join(inner,Scan(ORGANIZATION),Scan(PERSON))'
                      ELSE 'Join(inner,Scan(PERSON),Scan(ORGANIZATION))'
                 END AS optimized,
                 trunc(sqrt((p * o)::DOUBLE))::BIGINT AS cardinality,
                 (p + o + p::DOUBLE * o) AS cost,
                 (p::DOUBLE / t) * (o::DOUBLE / t) AS selectivity
          FROM stx
          UNION ALL
          SELECT 'greedy_threeway',
                 'Join(inner,' || remn || ',Join(inner,' || xn || ','
                     || yn || '))',
                 trunc(sqrt(remc * trunc(sqrt((xc * yc)::DOUBLE))))::BIGINT,
                 remc + (xc + yc + xc::DOUBLE * yc)
                     + remc::DOUBLE * trunc(sqrt((xc * yc)::DOUBLE)),
                 (p::DOUBLE / t) * (l::DOUBLE / t) * (o::DOUBLE / t)
          FROM g3e
          UNION ALL
          SELECT 'neighbors_twohop',
                 'Neighbors(Scan(PERSON),KNOWS,2)',
                 trunc(LEAST(p * power(d, 2), t::DOUBLE))::BIGINT,
                 p + trunc(LEAST(p * power(d, 2), t::DOUBLE)),
                 trunc(LEAST(p * power(d, 2), t::DOUBLE)) / t
          FROM stx
          UNION ALL
          SELECT 'union_limit',
                 'Union(Scan(LOCATION),Limit(Scan(PERSON),5))',
                 ((l + LEAST(5, p)) * 9) // 10,
                 (l + p)::DOUBLE,
                 LEAST(l::DOUBLE / t + LEAST(5.0 / t, 1.0), 1.0)
          FROM stx
          UNION ALL
          SELECT 'cross_filter',
                 CASE WHEN trunc(t * 0.1)::BIGINT > l
                      THEN 'Join(cross,Scan(LOCATION),Filter(name=x))'
                      ELSE 'Join(cross,Filter(name=x),Scan(LOCATION))'
                 END,
                 trunc(t * 0.1)::BIGINT * l,
                 t + l + trunc(t * 0.1) * l::DOUBLE,
                 0.1 * (l::DOUBLE / t)
          FROM stx
          UNION ALL
          SELECT 'limit_neighbors_join',
                 'Limit(Neighbors(' ||
                 CASE WHEN o > l
                      THEN 'Join(inner,Scan(LOCATION),Scan(ORGANIZATION))'
                      ELSE 'Join(inner,Scan(ORGANIZATION),Scan(LOCATION))'
                 END || ',*,1),10)',
                 LEAST(10, trunc(LEAST(
                     trunc(sqrt((o * l)::DOUBLE)) * power(d, 1),
                     t::DOUBLE))::BIGINT),
                 (o + l + o::DOUBLE * l)
                   + trunc(LEAST(trunc(sqrt((o * l)::DOUBLE)) * power(d, 1),
                                 t::DOUBLE)),
                 LEAST(10.0 / t, 1.0)
          FROM stx)
        SELECT plan, optimized, cardinality, round(cost, 4) AS cost,
               round(selectivity, 4) AS selectivity
        FROM plans
    """
