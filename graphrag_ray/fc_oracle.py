"""DuckDB oracle twins for the function-calling surfaces
(fc_graph_search, fc_entity_expand).

Replays function_calling/functions.rs over the kgx canon/edge
expectations: the three-phase search with limit gating and cross-phase
dedup, the single-word-prefix / last-name / edit-distance fuzzy matcher,
and the incident-relationship expansion in pinned edge order.
"""

from __future__ import annotations

from .kgx import _corpus_cte
from .stages.function_calling import FC_EXPAND_ARGS, FC_SEARCH_ARGS


def _esc(s: str) -> str:
    return s.replace("'", "''")


def fc_graph_search_sql() -> str:
    args = ", ".join(f"('{_esc(q)}', {l})" for q, l in FC_SEARCH_ARGS)
    return f"""
        WITH {_corpus_cte()},
        args(qname, lim) AS (VALUES {args}),
        base AS (
          SELECT a.qname, a.lim, c.canonical_id, c.canonical_name,
                 c.entity_type, c.confidence, c.mention_count,
                 lower(trim(a.qname)) AS qn,
                 lower(c.canonical_name) AS en
          FROM args a CROSS JOIN canon c),
        p1 AS (
          SELECT *, 1.0 AS relevance, 0 AS phase FROM base
          WHERE trim(en) = qn),
        n1 AS (SELECT a.qname, count(p.qname) AS n
               FROM args a LEFT JOIN p1 p USING (qname) GROUP BY a.qname),
        p2 AS (
          SELECT b.*, 0.8 AS relevance, 1 AS phase
          FROM base b JOIN n1 ON n1.qname = b.qname
          WHERE n1.n < b.lim
            AND (strpos(b.en, lower(b.qname)) > 0
                 OR strpos(lower(b.qname), b.en) > 0)
            AND NOT EXISTS (SELECT 1 FROM p1
                            WHERE p1.qname = b.qname
                              AND p1.canonical_id = b.canonical_id)),
        n12 AS (SELECT a.qname, n1.n + count(p.qname) AS n
                FROM args a JOIN n1 USING (qname)
                LEFT JOIN p2 p USING (qname) GROUP BY a.qname, n1.n),
        p3 AS (
          -- fuzzy (functions.rs:44-70): single-word queries use ONLY the
          -- first-word prefix test; multi-word use last-name equality or
          -- the quarter-length edit distance
          SELECT b.*, 0.6 AS relevance, 2 AS phase
          FROM base b JOIN n12 ON n12.qname = b.qname
          WHERE n12.n < b.lim
            AND (CASE WHEN len(string_split(lower(b.qname), ' ')) = 1
                 THEN starts_with(string_split(b.en, ' ')[1],
                                  lower(b.qname))
                   OR starts_with(lower(b.qname),
                                  string_split(b.en, ' ')[1])
                 ELSE string_split(b.en, ' ')[-1]
                        = string_split(lower(b.qname), ' ')[-1]
                   OR levenshtein(b.en, lower(b.qname))
                        <= GREATEST(LEAST(length(b.qname),
                                          length(b.en)) // 4, 1)
                 END)
            AND NOT EXISTS (SELECT 1 FROM p1
                            WHERE p1.qname = b.qname
                              AND p1.canonical_id = b.canonical_id)
            AND NOT EXISTS (SELECT 1 FROM p2
                            WHERE p2.qname = b.qname
                              AND p2.canonical_id = b.canonical_id)),
        allm AS (
          SELECT * FROM p1 UNION ALL SELECT * FROM p2
          UNION ALL SELECT * FROM p3),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY qname
                        ORDER BY relevance DESC, phase, canonical_id) - 1
                 AS rank
          FROM allm)
        SELECT qname, rank, canonical_id AS entity_id,
               canonical_name AS name, entity_type,
               round(confidence, 4) AS confidence,
               round(relevance, 4) AS relevance,
               mention_count::BIGINT AS mention_count
        FROM ranked WHERE rank < lim
    """


def fc_entity_expand_sql() -> str:
    args = ", ".join(f"('{_esc(e)}', {l})" for e, l in FC_EXPAND_ARGS)
    return f"""
        WITH {_corpus_cte()},
        eargs(eid, lim) AS (VALUES {args}),
        valid AS (
          SELECT a.eid, a.lim FROM eargs a
          JOIN canon c ON c.canonical_id = a.eid),
        incident AS (
          SELECT v.eid, v.lim, e.src, e.dst, e.rel_type, e.n_occurrences,
                 e.src = v.eid AS is_src,
                 row_number() OVER (PARTITION BY v.eid
                        ORDER BY e.src, e.dst, e.rel_type) - 1 AS rel_idx
          FROM valid v JOIN kgx_edge_agg e
            ON e.src = v.eid OR e.dst = v.eid)
        SELECT i.eid AS entity_id, i.rel_idx,
               i.rel_type AS relationship_type,
               CASE WHEN i.is_src THEN 'outgoing' ELSE 'incoming' END
                   AS direction,
               CASE WHEN i.is_src THEN i.dst ELSE i.src END AS related_id,
               coalesce(c.canonical_name, '') AS related_name,
               coalesce(c.entity_type, '') AS related_type,
               0.5 AS confidence,
               i.n_occurrences::BIGINT AS context_count
        FROM incident i
        LEFT JOIN canon c ON c.canonical_id
            = CASE WHEN i.is_src THEN i.dst ELSE i.src END
        WHERE i.rel_idx < i.lim
    """
