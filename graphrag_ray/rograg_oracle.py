"""DuckDB oracle twins for the rograg_* surfaces.

Replays every ROGRAG rule — intent scoring, hybrid decomposition, logic
form parse/execute, fuzzy similarity, synthesis, templates, validation —
in pure SQL over the md5-derived kgx corpus expectations (kgx._corpus_cte)
and the fixed ROGRAG_QUERIES workload.  Shares only the pattern CONSTANTS
with the engine (keyword lists, regexes, template strings); all control
flow is re-derived in SQL, so a transcription bug in the pipeline cannot
silently pass.

Reference semantics: graphrag-core/src/rograg/*.rs (file:line cites in
stages/rograg.py).
"""

from __future__ import annotations

from .kgx import _corpus_cte
from .stages.rograg import (INTENT_PATTERNS, ROGRAG_QUERIES, SEPARATORS,
                            TEMPLATES)


def _esc(s: str) -> str:
    return s.replace("'", "''")


def _queries_cte() -> str:
    vals = ", ".join(f"({i}, '{_esc(q)}')"
                     for i, q in enumerate(ROGRAG_QUERIES))
    return f"q(qid, query) AS (VALUES {vals})"


_INAPPROPRIATE_SQL = r"\b(?:hate|violence|harm|illegal|inappropriate)\b"


def _intent_cte() -> str:
    """CTEs: base(qid, query, lq) → isc(qid, name, score) → irank →
    intent(qid, primary_intent, confidence, should_refuse, refusal_reason,
    reformulation, complexity) — intent_classifier.rs:classify replay."""
    score_cols = []
    unpivot = []
    for name, (kws, res) in INTENT_PATTERNS.items():
        kw_terms = " + ".join(
            f"(CASE WHEN strpos(lq, '{_esc(k)}') > 0 THEN 1 ELSE 0 END)"
            for k in kws)
        re_terms = " + ".join(
            f"(CASE WHEN regexp_matches(lq, '{_esc(p)}') THEN 1 ELSE 0 END)"
            for p in res)
        score_cols.append(
            f"LEAST((CASE WHEN ({kw_terms}) > 0 THEN ({kw_terms}) / "
            f"{len(kws)}.0 * 0.5 ELSE 0.0 END) + "
            f"(CASE WHEN ({re_terms}) > 0 THEN ({re_terms}) / "
            f"{len(res)}.0 * 0.5 ELSE 0.0 END), 1.0) AS s_{name}")
        unpivot.append(f"('{name}', s_{name})")
    score_sql = ",\n             ".join(score_cols)
    unpivot_sql = ", ".join(unpivot)
    return f"""
    base AS (SELECT qid, query, lower(query) AS lq FROM q),
    cx AS (
      SELECT qid,
             len(list_filter(string_split_regex(lq, '\\s+'),
                             x -> x <> '')) AS wc,
             GREATEST((length(lq) - length(replace(lq, '.', '')))
                    + (length(lq) - length(replace(lq, '?', '')))
                    + (length(lq) - length(replace(lq, '!', ''))), 1)
                 AS sent,
             length(regexp_replace(lq, '[^a-z]', '', 'g')) AS alpha,
             (CASE WHEN strpos(lq, ' and ') > 0 OR strpos(lq, ' or ') > 0
                     OR strpos(lq, ' but ') > 0
                     OR strpos(lq, ' because ') > 0
                     OR strpos(lq, ' since ') > 0
                     OR strpos(lq, ' although ') > 0
                   THEN 0.3 ELSE 0.0 END) AS construct
      FROM base),
    cxs AS (
      SELECT qid,
             LEAST(LEAST(wc / 20.0, 1.0) * 0.3
                   + LEAST(sent / 3.0, 1.0) * 0.2
                   + LEAST(alpha / GREATEST(wc, 1) / 8.0, 1.0) * 0.2
                   + construct, 1.0) AS complexity
      FROM cx),
    reform AS (
      SELECT b.qid,
             CASE WHEN starts_with(b.lq, 'tell me about')
                  THEN 'Try asking a more specific question like ''What is...?'' or ''How does...?'''
                  WHEN strpos(b.lq, ' and ') > 0
                  THEN 'Try breaking your question into separate parts or focus on one aspect'
                  WHEN c.wc > 20
                  THEN 'Try using a shorter, more focused question'
                  WHEN NOT (b.query LIKE '%?' OR b.query LIKE '%.'
                            OR b.query LIKE '%!')
                  THEN 'Try phrasing your request as a clear question'
                  ELSE NULL END AS reformulation
      FROM base b JOIN cx c USING (qid)),
    iscfull AS (
      SELECT qid,
             regexp_matches(lq, '{_INAPPROPRIATE_SQL}') AS inappropriate,
             {score_sql}
      FROM base),
    isc AS (
      SELECT qid, u.name, u.score
      FROM iscfull, LATERAL (VALUES {unpivot_sql}) u(name, score)
      WHERE u.score > 0),
    irank AS (
      SELECT qid, name, score,
             row_number() OVER (PARTITION BY qid
                                ORDER BY score DESC, name) AS rn
      FROM isc),
    iamb AS (
      SELECT p.qid, p.name AS primary_name, p.score AS p_score,
             EXISTS (SELECT 1 FROM irank s
                     WHERE s.qid = p.qid AND s.rn IN (2, 3)
                       AND s.score > p.score * 0.8) AS is_amb
      FROM irank p WHERE p.rn = 1),
    intent AS (
      SELECT b.qid, b.query,
             CASE WHEN f.inappropriate THEN 'inappropriate'
                  WHEN a.qid IS NULL THEN 'ambiguous'
                  WHEN a.is_amb THEN 'ambiguous'
                  ELSE a.primary_name END AS primary_intent,
             CASE WHEN f.inappropriate THEN 1.0
                  WHEN a.qid IS NULL THEN 0.0
                  ELSE a.p_score END AS confidence,
             CASE WHEN f.inappropriate THEN TRUE
                  WHEN a.qid IS NULL THEN TRUE
                  ELSE (a.p_score < 0.8 OR a.is_amb) END AS should_refuse,
             CASE WHEN f.inappropriate
                    THEN 'Query contains inappropriate content'
                  WHEN a.qid IS NULL
                    THEN 'Unable to understand the query intent'
                  WHEN a.is_amb
                    THEN 'Query intent is ambiguous - please be more specific'
                  WHEN a.p_score < 0.8
                    THEN 'Insufficient confidence in understanding the query'
                  ELSE '' END AS refusal_reason,
             CASE WHEN f.inappropriate THEN ''
                  WHEN a.qid IS NULL THEN coalesce(r.reformulation, '')
                  WHEN (a.p_score < 0.8 OR a.is_amb)
                    THEN coalesce(r.reformulation, '')
                  ELSE '' END AS reformulation,
             CASE WHEN f.inappropriate THEN 0.0
                  ELSE x.complexity END AS complexity
      FROM base b
      JOIN iscfull f USING (qid)
      JOIN cxs x USING (qid)
      JOIN reform r USING (qid)
      LEFT JOIN iamb a USING (qid))
    """


def rograg_intent_sql() -> str:
    return f"""
        WITH {_queries_cte()},
        {_intent_cte()}
        SELECT query, primary_intent, round(confidence, 4) AS confidence,
               should_refuse, refusal_reason, reformulation,
               round(complexity, 4) AS complexity
        FROM intent
    """


def _strip_fold_ctes() -> tuple[str, str]:
    """One MATERIALIZED CTE per separator replaying decomposer.rs:660-672's
    in-order leading-separator strip fold (each CASE references the prior
    column 3×, so inlined chaining would blow up 3^10 — materialization
    keeps it linear); returns (cte fragment, final cte name)."""
    ctes = []
    prev = "cl0"
    for i, sep in enumerate(SEPARATORS):
        cur = f"cls{i + 1}"
        ctes.append(
            f"{cur} AS MATERIALIZED (\n"
            f"      SELECT qid, a,\n"
            f"             CASE WHEN starts_with(lower(c), '{_esc(sep)}')\n"
            f"                  THEN trim(substr(c, {len(sep) + 1}))\n"
            f"                  ELSE c END AS c\n"
            f"      FROM {prev})")
        prev = cur
    return ",\n    ".join(ctes), prev


def _decompose_cte() -> str:
    """CTE `subq(qid, query, subquery_id, text, query_type, priority,
    strategy, confidence, ord)` — HybridQueryDecomposer replay."""
    seps_vals = ", ".join(f"('{_esc(s)}')" for s in SEPARATORS)
    strip_ctes, strip_final = _strip_fold_ctes()
    sem1 = r"\b(who|what) is (.+?) and (.+)"
    sem2 = r"\bhow (?:is|are) (.+?) (?:related to|connected to) (.+)"
    return f"""
    seps(sep) AS (VALUES {seps_vals}),
    sem AS (
      SELECT qid, query,
             regexp_extract(query, '{sem1}', ['w', 'x', 'y']) AS m1,
             regexp_extract(query, '{sem2}', ['x', 'y']) AS m2,
             regexp_matches(query, '{sem1}') AS has1,
             regexp_matches(query, '{sem2}') AS has2,
             EXISTS (SELECT 1 FROM seps s
                     WHERE strpos(lower(query), s.sep) > 0) AS has_sep
      FROM q),
    pos AS (
      SELECT b.qid, t.i
      FROM base b
      CROSS JOIN seps s
      CROSS JOIN LATERAL unnest(range(0, length(b.lq))) t(i)
      WHERE substr(b.lq, t.i + 1, length(s.sep)) = s.sep),
    bnd AS (
      SELECT qid, i FROM pos
      UNION SELECT qid, 0 FROM base
      UNION SELECT qid, length(query) FROM q),
    bw AS (
      SELECT qid, i AS a,
             lead(i) OVER (PARTITION BY qid ORDER BY i) AS b
      FROM bnd),
    cl0 AS (
      SELECT bw.qid, bw.a,
             trim(substr(q.query, bw.a + 1, bw.b - bw.a)) AS c
      FROM bw JOIN q USING (qid) WHERE bw.b IS NOT NULL),
    {strip_ctes},
    clf AS (
      SELECT qid, a, c AS clause,
             row_number() OVER (PARTITION BY qid ORDER BY a) - 1 AS idx,
             count(*) OVER (PARTITION BY qid) AS n
      FROM {strip_final} WHERE length(c) > 3),
    subq AS (
      -- semantic pattern 1: "{{w}} is {{x}}" + "{{y}}"  (decomposer.rs:317-337)
      SELECT s.qid, s.query, 'sem_' || u.i AS subquery_id, u.t AS text,
             'entity' AS query_type, 1.0 - u.i * 0.1 AS priority,
             'hybrid' AS strategy, 0.8 AS confidence, u.i AS ord
      FROM sem s, LATERAL (VALUES
          (0, trim(s.m1.w || ' is ' || s.m1.x)),
          (1, trim(s.m1.y))) u(i, t)
      WHERE s.has1 AND u.t <> ''
      UNION ALL
      -- semantic pattern 2 (decomposer.rs:339-363)
      SELECT s.qid, s.query, 'sem_' || u.i, u.t,
             'relationship', 1.0 - u.i * 0.1, 'hybrid', 0.8, u.i
      FROM sem s, LATERAL (VALUES
          (0, trim('What is ' || s.m2.x)),
          (1, trim('What is ' || s.m2.y)),
          (2, trim('How are ' || s.m2.x || ' and ' || s.m2.y || ' related')))
          u(i, t)
      WHERE NOT s.has1 AND s.has2 AND u.t <> ''
      UNION ALL
      -- syntactic clauses (decomposer.rs:703-739)
      SELECT s.qid, s.query, 'syn_' || c.idx, c.clause,
             CASE WHEN starts_with(lower(c.clause), 'who')
                    OR starts_with(lower(c.clause), 'what person')
                  THEN 'entity'
                  WHEN starts_with(lower(c.clause), 'what')
                  THEN 'definitional'
                  WHEN starts_with(lower(c.clause), 'when')
                  THEN 'temporal'
                  WHEN starts_with(lower(c.clause), 'why')
                    OR strpos(lower(c.clause), 'because') > 0
                  THEN 'causal'
                  WHEN strpos(lower(c.clause), 'relation') > 0
                    OR strpos(lower(c.clause), 'connect') > 0
                  THEN 'relationship'
                  WHEN strpos(lower(c.clause), 'compare') > 0
                    OR strpos(lower(c.clause), 'versus') > 0
                  THEN 'comparative'
                  ELSE 'attribute' END,
             1.0 - c.idx * 0.1, 'hybrid', 0.7, c.idx
      FROM sem s JOIN clf c USING (qid)
      WHERE NOT s.has1 AND NOT s.has2 AND s.has_sep AND c.n > 1
      UNION ALL
      -- single-query fallbacks (decomposer.rs:840-855)
      SELECT s.qid, s.query, 'single', s.query, 'entity', 1.0,
             CASE WHEN s.has_sep THEN 'hybrid' ELSE 'semantic' END, 1.0, 0
      FROM sem s
      LEFT JOIN (SELECT DISTINCT qid FROM clf WHERE n > 1) m USING (qid)
      WHERE NOT s.has1 AND NOT s.has2
        AND (NOT s.has_sep OR m.qid IS NULL))
    """


def rograg_decompose_sql() -> str:
    return f"""
        WITH {_queries_cte()},
        base AS (SELECT qid, query, lower(query) AS lq FROM q),
        {_decompose_cte()}
        SELECT query, subquery_id, text, query_type,
               round(priority, 4) AS priority, strategy,
               round(confidence, 4) AS confidence
        FROM subq
    """
