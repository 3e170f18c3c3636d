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


_LF_PATTERNS = (
    # (flag, struct col, pattern, groups) in parser precedence order
    ("h1", "m1", r"(?i)what (?:is|are) (?:the )?(.+)\??", ["a"]),
    ("h2", "m2", r"(?i)who (?:is|are) (?:the )?(.+)\??", ["a"]),
    ("h3", "m3",
     r"(?i)how (?:is|are) (.+?) (?:related to|connected to) (.+)\??",
     ["a", "b"]),
    ("h4", "m4", r"(?i)when (?:did|does|will) (.+?) (?:happen|occur)\??",
     ["a"]),
    ("h5", "m5", r"(?i)why (?:did|does) (.+?) (?:cause|lead to) (.+)\??",
     ["a", "b"]),
    ("h6", "m6",
     r"(?i)compare (.+?) (?:and|with|to) (.+)"
     r"(?:\s+(?:on|in terms of) (.+))?\??",
     ["a", "b"]),
)

_HAPPENED_KWS = ("happened", "occurred", "during", "before", "after", "when")
_CAUSED_KWS = ("caused", "causes", "led to", "resulted")


def _logic_cte(src: str = "q", p: str = "") -> str:
    """CTEs: {p}lf(qid, pred, a1, a2) — logic_form/parser.rs first-match
    parse replay; {p}resv — executor.rs:634-649 find_entity_by_name pinned to
    (exact-first, canonical_id ASC); {p}lfbind — is/related/compare/
    happened/caused execution over canon + kgx_edge_agg."""
    cols, h_order = [], []
    for h, m, pat, groups in _LF_PATTERNS:
        gl = ", ".join(f"'{g}'" for g in groups)
        cols.append(f"regexp_matches(query, '{_esc(pat)}') AS {h}")
        cols.append(f"regexp_extract(query, '{_esc(pat)}', [{gl}]) AS {m}")
        h_order.append((h, m, len(groups)))
    col_sql = ",\n             ".join(cols)
    pred_case = ("CASE WHEN h1 OR h2 THEN 'is' WHEN h3 THEN 'related' "
                 "WHEN h4 THEN 'happened' WHEN h5 THEN 'caused' "
                 "WHEN h6 THEN 'compare' END")
    a1_case = ("CASE WHEN h1 THEN m1.a WHEN h2 THEN m2.a WHEN h3 THEN m3.a "
               "WHEN h4 THEN m4.a WHEN h5 THEN m5.a WHEN h6 THEN m6.a END")
    a2_case = ("CASE WHEN h1 OR h2 OR h4 THEN NULL WHEN h3 THEN m3.b "
               "WHEN h5 THEN m5.b WHEN h6 THEN m6.b END")
    hap_kw = " OR ".join(f"strpos(lower(e.rel_type), '{k}') > 0"
                         for k in _HAPPENED_KWS)
    cau_kw = " OR ".join(f"strpos(lower(e.rel_type), '{k}') > 0"
                         for k in _CAUSED_KWS)
    return f"""
    {p}lfp AS (
      SELECT qid, query,
             {col_sql}
      FROM {src}),
    {p}lf AS (
      SELECT qid, query, {pred_case} AS pred,
             trim({a1_case}) AS a1, trim({a2_case}) AS a2
      FROM {p}lfp WHERE h1 OR h2 OR h3 OR h4 OR h5 OR h6),
    {p}isb AS (
      SELECT l.qid, 'is' AS predicate, 'X' AS variable,
             c.canonical_name || ' (' || c.entity_type || ')' AS value,
             c.canonical_id AS entity_id,
             CASE WHEN lower(c.canonical_name) = lower(l.a1) THEN 1.0
                  ELSE 0.8 END AS confidence,
             c.canonical_id AS bkey
      FROM {p}lf l JOIN canon c
        ON strpos(lower(c.canonical_name), lower(l.a1)) > 0
      WHERE l.pred = 'is'),
    {p}resv AS (
      SELECT qid, ai, canonical_id, canonical_name, entity_type FROM (
        SELECT l.qid, u.ai, c.canonical_id, c.canonical_name, c.entity_type,
               row_number() OVER (
                 PARTITION BY l.qid, u.ai
                 ORDER BY CASE WHEN lower(c.canonical_name) = lower(u.arg)
                               THEN 0 ELSE 1 END, c.canonical_id) AS rn
        FROM {p}lf l, LATERAL (VALUES (0, l.a1), (1, l.a2)) u(ai, arg)
        JOIN canon c
          ON (lower(c.canonical_name) = lower(u.arg)
              OR strpos(lower(c.canonical_name), lower(u.arg)) > 0
              OR strpos(lower(u.arg), lower(c.canonical_name)) > 0)
        WHERE l.pred <> 'is' AND u.arg IS NOT NULL)
      WHERE rn = 1),
    {p}relpair AS (
      SELECT l.qid, a.canonical_id AS aid, a.canonical_name AS aname,
             b.canonical_id AS bid, b.canonical_name AS bname
      FROM {p}lf l
      JOIN {p}resv a ON a.qid = l.qid AND a.ai = 0
      JOIN {p}resv b ON b.qid = l.qid AND b.ai = 1
      WHERE l.pred = 'related'),
    {p}reledges AS (
      SELECT p.qid,
             p.aname || ' ' || e.rel_type || ' ' || p.bname AS value,
             e.src || '|' || e.dst || '|' || e.rel_type AS bkey
      FROM {p}relpair p JOIN kgx_edge_agg e
        ON (e.src = p.aid AND e.dst = p.bid)
        OR (e.src = p.bid AND e.dst = p.aid)),
    {p}lfbind AS (
      SELECT * FROM {p}isb
      UNION ALL
      SELECT qid, 'related', 'R', value, '', 0.5, bkey FROM {p}reledges
      UNION ALL
      SELECT p.qid, 'related', 'R',
             'No direct relationship found between ' || p.aname || ' and '
               || p.bname, '', 0.3, '0'
      FROM {p}relpair p
      WHERE NOT EXISTS (SELECT 1 FROM {p}reledges r WHERE r.qid = p.qid)
      UNION ALL
      SELECT l.qid, 'compare', 'comparison',
             a.canonical_name || ' is a ' || a.entity_type || ' while '
               || b.canonical_name || ' is a ' || b.entity_type, '', 0.7,
             '0'
      FROM {p}lf l
      JOIN {p}resv a ON a.qid = l.qid AND a.ai = 0
      JOIN {p}resv b ON b.qid = l.qid AND b.ai = 1
      WHERE l.pred = 'compare'
      UNION ALL
      -- happened/caused strategy 1 (executor.rs:263-530): incident edges
      -- whose relation type carries a temporal/causal keyword; the kgx
      -- relation vocabulary has none, so these legs yield zero rows
      SELECT l.qid, l.pred, 'T',
             l.a1 || ' ' || e.rel_type || ' ' || o.canonical_name,
             o.canonical_id, 0.5,
             e.src || '|' || e.dst || '|' || e.rel_type AS bkey
      FROM {p}lf l
      JOIN {p}resv a ON a.qid = l.qid AND a.ai = 0
      JOIN kgx_edge_agg e
        ON e.src = a.canonical_id OR e.dst = a.canonical_id
      JOIN canon o ON o.canonical_id
        = CASE WHEN e.src = a.canonical_id THEN e.dst ELSE e.src END
      WHERE (l.pred = 'happened' AND ({hap_kw}))
         OR (l.pred = 'caused' AND ({cau_kw})))
    """


def rograg_logic_form_sql() -> str:
    return f"""
        WITH {_corpus_cte()},
        {_queries_cte()},
        {_logic_cte()}
        SELECT q.query, b.predicate, b.variable, b.value, b.entity_id,
               round(b.confidence, 4) AS confidence
        FROM lfbind b JOIN q USING (qid)
    """


def _fuzzy_cte(src: str = "q", p: str = "") -> str:
    """CTEs replaying fuzzy_matcher.rs over canon + the kgx sentences:
    {p}qtok (query word lists), {p}fent (entity exact/partial/type matches),
    fchunk (content/keyword matches), {p}frank (stable similarity ranking
    pinned to the engine's emission order, top-10).  Semantic expansion
    (rs:476-536) is provably empty here: every kgx edge confidence is the
    0.5 pattern constant and 0.5*0.6 < 0.6*0.7."""
    return f"""
    {p}qtok AS MATERIALIZED (
      SELECT qid, query, lower(query) AS lq,
             list_filter(string_split_regex(lower(query), '\\s+'),
                         x -> x <> '') AS qw_raw,
             list_distinct(list_filter(
                 string_split_regex(lower(query), '\\s+'),
                 x -> x <> '')) AS qw
      FROM {src}),
    {p}fent AS (
      SELECT t.qid, c.canonical_id, c.canonical_name, c.entity_type,
             lower(c.canonical_name) AS ln,
             len(list_intersect(t.qw, list_distinct(
                 string_split(lower(c.canonical_name), ' ')))) AS inter,
             len(t.qw) AS nq,
             len(list_distinct(string_split(lower(c.canonical_name), ' ')))
                 AS ne,
             levenshtein(t.lq, lower(c.canonical_name)) AS lev,
             GREATEST(length(t.lq), length(c.canonical_name)) AS mxl,
             list_contains(t.qw_raw, lower(c.entity_type)) AS type_hit,
             len(t.qw_raw) AS nq_raw
      FROM {p}qtok t CROSS JOIN canon c),
    {p}fentm AS (
      SELECT qid, canonical_id, canonical_name, entity_type, ln,
             CASE WHEN nq + ne - inter > 0
                  THEN inter::DOUBLE / (nq + ne - inter) ELSE 0.0 END * 0.4
             + CASE WHEN nq = 0 AND ne = 0 THEN 1.0
                    WHEN LEAST(nq, ne) = 0 THEN 0.0
                    ELSE inter::DOUBLE / LEAST(nq, ne) END * 0.4
             + CASE WHEN mxl = 0 THEN 1.0
                    ELSE 1.0 - lev::DOUBLE / mxl END * 0.2 AS combined,
             type_hit, nq_raw
      FROM {p}fent),
    {p}fe AS (
      -- exact (rs:381-395) else partial (rs:397-408); plus type matches
      SELECT t.qid, 0 AS phase, m.canonical_id AS sid, 0 AS subrole,
             m.canonical_id AS match_id,
             CASE WHEN m.ln = t.lq THEN 'exact_entity'
                  ELSE 'partial_entity' END AS match_type,
             CASE WHEN m.ln = t.lq THEN 1.0 ELSE m.combined * 0.9 END AS sim,
             m.canonical_name || ' (' || m.entity_type || ')' AS content
      FROM {p}fentm m JOIN {p}qtok t USING (qid)
      WHERE m.ln = t.lq OR m.combined >= 0.6
      UNION ALL
      SELECT m.qid, 0, m.canonical_id, 1, 'type_' || m.canonical_id,
             'semantic_entity', 0.7,
             m.canonical_name || ' (' || m.entity_type || ')'
      FROM {p}fentm m
      WHERE m.qid IN (SELECT qid FROM {p}qtok WHERE lq <> lower(
            (SELECT canonical_name FROM canon c2
             WHERE c2.canonical_id = m.canonical_id)))
        AND m.type_hit AND m.nq_raw > 0),
    {p}ftok AS MATERIALIZED (
      SELECT doc_id || '_0' AS chunk_id, s,
             lower(s) AS ls,
             list_filter(string_split_regex(lower(s), '\\s+'),
                         x -> x <> '') AS cw_raw,
             list_distinct(list_filter(
                 string_split_regex(lower(s), '\\s+'),
                 x -> x <> '')) AS cw
      FROM kgx_docs),
    {p}fchunkx AS (
      SELECT t.qid, k.chunk_id, k.s,
             len(list_intersect(t.qw, k.cw)) AS inter,
             len(t.qw) AS nq, len(k.cw) AS nc,
             levenshtein(t.lq, k.ls) AS lev,
             GREATEST(length(t.lq), length(k.s)) AS mxl,
             len(list_intersect(t.qw, k.cw))::DOUBLE
               / NULLIF(LEAST(len(t.qw_raw), len(k.cw_raw)), 0) AS overlap
      FROM {p}qtok t CROSS JOIN {p}ftok k),
    {p}fc AS (
      SELECT qid, 1 AS phase, chunk_id AS sid, u.subrole,
             u.match_id, 'chunk_content' AS match_type, u.sim,
             trim(s) AS content
      FROM (
        SELECT *,
               CASE WHEN nq + nc - inter > 0
                    THEN inter::DOUBLE / (nq + nc - inter)
                    ELSE 0.0 END * 0.4
               + CASE WHEN nq = 0 AND nc = 0 THEN 1.0
                      WHEN LEAST(nq, nc) = 0 THEN 0.0
                      ELSE inter::DOUBLE / LEAST(nq, nc) END * 0.4
               + CASE WHEN mxl = 0 THEN 1.0
                      ELSE 1.0 - lev::DOUBLE / mxl END * 0.2 AS combined
        FROM {p}fchunkx) x,
      LATERAL (VALUES
          (0, x.chunk_id, x.combined, x.combined >= 0.6),
          (1, 'keywords_' || x.chunk_id, coalesce(x.overlap, 0.0),
           coalesce(x.overlap, 0.0) >= 0.48)) u(subrole, match_id, sim, keep)
      WHERE u.keep),
    {p}fall AS (SELECT * FROM {p}fe UNION ALL SELECT * FROM {p}fc),
    {p}frank AS (
      SELECT qid, sid, match_id, match_type, sim, content,
             row_number() OVER (PARTITION BY qid
                                ORDER BY sim DESC, phase, sid, subrole) - 1
                 AS rank
      FROM {p}fall)
    """


def rograg_fuzzy_sql() -> str:
    return f"""
        WITH {_corpus_cte()},
        {_queries_cte()},
        {_fuzzy_cte()}
        SELECT q.query, f.rank, f.match_id, f.match_type,
               round(f.sim, 4) AS similarity, f.content
        FROM frank f JOIN q USING (qid)
        WHERE f.rank < 10
    """


_CONNECTOR_TEST = " OR ".join(
    f"strpos(lower(s), '{c}') > 0"
    for c in ("however", "therefore", "furthermore", "additionally",
              "meanwhile", "consequently"))
_CONTRA_TERMS = " + ".join(
    f"(CASE WHEN strpos(lower(s), '{n}') > 0 AND strpos(lower(s), '{p}') > 0 "
    f"THEN 1 ELSE 0 END)"
    for n, p in (("not", "is"), ("never", "always"), ("none", "all"),
                 ("impossible", "possible")))


def _responses_cte() -> str:
    """Processor replay (processor.rs:356-536): answered queries get one
    retrieval pass per SUBQUERY (logic form → fuzzy → fallback), weighted
    synthesis (streaming.rs:857-897), the intent-selected template with
    full placeholder substitution, clean_content + citations, and the
    validator's quality-folded confidence.  Requires intent + subq +
    canon/kgx_docs/kgx_edge_agg CTEs in scope."""
    logic = _logic_cte("q2", "s_")
    fuzzy = _fuzzy_cte("q2", "s_")
    return f"""
    ans AS (SELECT qid, confidence AS iconf, primary_intent
            FROM intent WHERE NOT should_refuse AND trim(query) <> ''),
    q2 AS (SELECT s.qid * 100 + s.ord AS qid, s.text AS query
           FROM subq s JOIN ans USING (qid)),
    {logic},
    {fuzzy},
    lfr AS (
      SELECT qid, any_value(pred) AS pred,
             first(value ORDER BY bkey) AS answer_first,
             string_agg(value, '; ' ORDER BY bkey) AS answer_all,
             avg(confidence) AS conf
      FROM (SELECT qid, predicate AS pred, value, confidence, bkey
            FROM s_lfbind) GROUP BY qid),
    fzr AS (
      SELECT qid,
             sum(sim * (1.0 / (rank + 1)) * tw)
               / sum((1.0 / (rank + 1)) * tw) AS conf,
             count(*) AS n
      FROM (SELECT qid, sim, rank,
                   CASE match_type
                     WHEN 'exact_entity' THEN 1.0
                     WHEN 'partial_entity' THEN 0.8
                     WHEN 'semantic_entity' THEN 0.7
                     WHEN 'chunk_content' THEN 0.6
                     ELSE 0.5 END AS tw
            FROM s_frank WHERE rank < 10) GROUP BY qid),
    fzc AS (
      SELECT qid,
             string_agg('• ' || content || ' (similarity: '
                        || printf('%.2f', sim) || ')', chr(10)
                        ORDER BY rank) AS top3
      FROM s_frank WHERE rank < 3 GROUP BY qid),
    fzcontent AS (
      SELECT f.qid,
             CASE WHEN r.n > 3
                  THEN f.top3 || chr(10) || '... and ' || (r.n - 3)
                       || ' more results'
                  ELSE f.top3 END AS content
      FROM fzc f JOIN fzr r USING (qid)),
    subres AS (
      SELECT q2.qid AS k, q2.qid // 100 AS oq, q2.qid % 100 AS ord,
             CASE WHEN l.qid IS NOT NULL THEN 'logic_form'
                  WHEN f.qid IS NOT NULL THEN 'fuzzy_match'
                  ELSE 'fallback' END AS rtype,
             CASE WHEN l.qid IS NOT NULL THEN
                    CASE WHEN l.pred IN ('is', 'related', 'compare')
                         THEN l.answer_first ELSE l.answer_all END
                  WHEN f.qid IS NOT NULL THEN fc2.content
                  ELSE 'Unable to process this part of the query'
             END AS content,
             CASE WHEN l.qid IS NOT NULL THEN l.conf
                  WHEN f.qid IS NOT NULL THEN f.conf
                  ELSE 0.1 END AS conf
      FROM q2
      LEFT JOIN lfr l USING (qid)
      LEFT JOIN fzr f USING (qid)
      LEFT JOIN fzcontent fc2 USING (qid)),
    subsrc AS (
      -- per-subquery source ids in emission order (logic bindings by
      -- bkey; fuzzy matches by first-occurrence rank)
      SELECT qid AS k, bkey AS pos, entity_id AS src
      FROM s_lfbind WHERE entity_id <> ''
      UNION ALL
      SELECT f.qid, printf('%04d', f.r0), f.sid
      FROM (SELECT qid, sid, min(rank) AS r0 FROM s_frank
            WHERE rank < 10 GROUP BY qid, sid) f
      WHERE f.qid NOT IN (SELECT qid FROM lfr)),
    allsrc AS (
      SELECT oq, src, min((k % 100, pos)) AS fk
      FROM subsrc JOIN (SELECT k, oq FROM subres) USING (k)
      GROUP BY oq, src),
    srcagg AS (
      SELECT oq, list(src ORDER BY fk) AS srcs FROM allsrc GROUP BY oq),
    syn0 AS (
      SELECT oq, count(*) AS n, sum(conf) AS total,
             sum(conf * conf) AS ss, avg(conf) AS mean,
             bool_or(rtype <> 'logic_form') AS fallback_used
      FROM subres GROUP BY oq),
    synrank AS (
      SELECT *, row_number() OVER (PARTITION BY oq
                                   ORDER BY conf DESC, ord) AS crn
      FROM subres),
    syncontent AS (
      SELECT oq,
             string_agg(content, '. ' ORDER BY crn)
                 FILTER (crn <= 3) AS top3,
             string_agg(content, '. ' ORDER BY ord) AS seq
      FROM synrank GROUP BY oq),
    synth AS (
      SELECT s0.oq,
             CASE WHEN s0.total = 0.0 THEN sc.seq ELSE sc.top3 END AS content,
             CASE WHEN s0.total = 0.0 THEN s0.mean
                  ELSE sqrt(s0.ss / s0.n) END AS conf,
             s0.n, s0.fallback_used
      FROM syn0 s0 JOIN syncontent sc USING (oq)),
    firstwords AS (
      SELECT oq,
             max(CASE WHEN ord = 0 THEN content END) AS c0,
             max(CASE WHEN ord = 1 THEN content END) AS c1,
             count(*) AS n
      FROM subres GROUP BY oq),
    placeholders AS (
      SELECT f.oq,
             coalesce(nullif(list_filter(string_split_regex(
                 coalesce(f.c0, ''), '\\s+'), x -> x <> '')[1], ''),
                 'the subject') AS ent0,
             CASE WHEN f.c0 IS NULL THEN 'entity1'
                  ELSE coalesce(nullif(list_filter(string_split_regex(
                      f.c0, '\\s+'), x -> x <> '')[1], ''), 'the subject')
             END AS ent1,
             CASE WHEN f.c1 IS NULL THEN 'entity2'
                  ELSE coalesce(nullif(list_filter(string_split_regex(
                      f.c1, '\\s+'), x -> x <> '')[1], ''), 'entity')
             END AS ent2
      FROM firstwords f),
    relsh AS (
      SELECT oq, coalesce(first(content ORDER BY ord) FILTER (
                 strpos(content, 'related') > 0
                 OR strpos(content, 'relationship') > 0), 'a connection')
                 AS relationship
      FROM subres GROUP BY oq),
    addctx AS (
      SELECT oq,
             CASE WHEN count(*) FILTER (ord >= 1) > 0
                  THEN 'Additionally, ' || string_agg(content, '. '
                       ORDER BY ord) FILTER (ord >= 1)
                  ELSE '' END AS additional_context,
             CASE WHEN count(*) FILTER (conf > 0.6) > 1
                  THEN string_agg(content, '. ' ORDER BY ord)
                       FILTER (conf > 0.6)
                  ELSE '' END AS details,
             'Key points: ' || string_agg((ord + 1) || '. ' || content,
                 '; ' ORDER BY ord) FILTER (ord < 3) AS key_points
      FROM subres GROUP BY oq),
    assembled AS (
      SELECT a.qid, sy.conf AS synconf, sy.n, sy.fallback_used,
             a.iconf, sr.srcs,
             CASE
               WHEN a.primary_intent = 'factual' THEN
                 'Based on the available information, ' || sy.content
                 || '. ' ||
                 CASE WHEN sy.conf >= 0.9
                      THEN 'I''m very confident in this information.'
                      WHEN sy.conf >= 0.7
                      THEN 'This information appears to be reliable.'
                      WHEN sy.conf >= 0.5
                      THEN 'This information has moderate confidence.'
                      ELSE 'Please note that this information has limited confidence.'
                 END
               WHEN a.primary_intent = 'definitional' THEN
                 p.ent0 || ' is ' || sy.content || '. '
                 || x.additional_context
               WHEN a.primary_intent = 'relational' THEN
                 p.ent1 || ' and ' || p.ent2 || ' are related through '
                 || r.relationship || '. ' || x.details
               WHEN a.primary_intent = 'comparative' THEN
                 'Comparing ' || p.ent1 || ' and ' || p.ent2 || ': '
                 || sy.content || '. ' ||
                 CASE WHEN sy.conf > 0.8
                      THEN 'This appears to be well-supported by the available information.'
                      WHEN sy.conf > 0.6
                      THEN 'This conclusion is supported by the available evidence.'
                      ELSE 'This is based on limited information.' END
               WHEN a.primary_intent IN ('summary', 'exploratory') THEN
                 'Here''s what I found about ' || p.ent0 || ': '
                 || sy.content || '. ' || coalesce(x.key_points, '')
               ELSE 'Based on the available information: ' || sy.content
             END AS raw
      FROM ans a
      JOIN synth sy ON sy.oq = a.qid
      JOIN placeholders p ON p.oq = a.qid
      JOIN relsh r ON r.oq = a.qid
      JOIN addctx x ON x.oq = a.qid
      LEFT JOIN srcagg sr ON sr.oq = a.qid),
    cleaned AS (
      SELECT qid, synconf, n, fallback_used, iconf, srcs,
             trim(regexp_replace(regexp_replace(raw, '\\{{\\w+\\}}', '', 'g'),
                                 '\\s+', ' ', 'g')) AS c1
      FROM assembled),
    respbody AS (
      SELECT qid, synconf, n, fallback_used, iconf, srcs,
             CASE WHEN c1 = '' THEN c1
                  WHEN c1 LIKE '%.' OR c1 LIKE '%!' OR c1 LIKE '%?' THEN c1
                  ELSE c1 || '.' END AS body
      FROM cleaned),
    withcites AS (
      SELECT r.qid, r.synconf, r.n, r.fallback_used, r.iconf, r.srcs,
             CASE WHEN r.srcs IS NOT NULL AND len(r.srcs) > 0
                  THEN r.body || chr(10) || chr(10) || 'Sources: ' ||
                       array_to_string(list_transform(
                           r.srcs[1:3],
                           x -> '[' || list_position(r.srcs[1:3], x)
                                || '] ' || x), ', ')
                  ELSE r.body END AS content,
             LEAST(r.synconf * 0.7 + r.iconf * 0.3, 1.0) AS pre_conf
      FROM respbody r),
    quality AS (
      SELECT w.qid, w.content, w.pre_conf, w.n, w.fallback_used, w.srcs,
             -- coherence (validator.rs:886-926)
             CASE WHEN len(sents) > 1
                  THEN LEAST(len(list_filter(sents,
                       s -> {_CONNECTOR_TEST}))::DOUBLE / len(sents), 1.0)
                  ELSE 1.0 END AS coherence,
             -- relevance (validator.rs:962-984)
             CASE WHEN len(list_distinct(qws)) + len(list_distinct(cws))
                       - len(list_intersect(list_distinct(qws),
                                            list_distinct(cws))) > 0
                  THEN len(list_intersect(list_distinct(qws),
                                          list_distinct(cws)))::DOUBLE
                       / (len(list_distinct(qws)) + len(list_distinct(cws))
                          - len(list_intersect(list_distinct(qws),
                                               list_distinct(cws))))
                  ELSE 0.0 END AS relevance,
             -- factual consistency (validator.rs:523-550)
             1.0 - LEAST(list_sum(list_transform(sents,
                     s -> {_CONTRA_TERMS}))::DOUBLE
                   / GREATEST(len(sents), 1), 1.0) AS consistency,
             -- completeness (validator.rs:554-574)
             ((CASE WHEN length(w.content) > 100 THEN 1.0
                    ELSE length(w.content) / 100.0 END)
              + (CASE WHEN coalesce(len(w.srcs), 0) > 2 THEN 1.0
                      ELSE coalesce(len(w.srcs), 0) / 2.0 END)
              + (CASE WHEN w.n > 1 THEN 1.0 ELSE w.n::DOUBLE END)) / 3.0
                 AS completeness,
             -- readability (validator.rs:576-600)
             ((CASE WHEN len(cws)::DOUBLE / GREATEST(
                      (length(w.content)
                       - length(replace(w.content, '.', '')))
                    + (length(w.content)
                       - length(replace(w.content, '!', '')))
                    + (length(w.content)
                       - length(replace(w.content, '?', ''))), 1) > 30.0
                    THEN 0.5 ELSE 1.0 END)
              + (CASE WHEN length(regexp_replace(w.content, '[^a-zA-Z]',
                          '', 'g'))::DOUBLE / GREATEST(len(cws), 1) > 8.0
                      THEN 0.7 ELSE 1.0 END)) / 2.0 AS readability,
             -- source credibility (validator.rs:602-620)
             CASE WHEN coalesce(len(w.srcs), 0) = 0 THEN 0.0
                  ELSE (LEAST(len(w.srcs) / 5.0, 1.0)
                        + len(list_distinct(list_transform(w.srcs,
                              s -> substr(s, 1, 10))))::DOUBLE
                          / len(w.srcs)) / 2.0 END AS credibility
      FROM (
        SELECT w.*,
               string_split_regex(w.content, '[.!?]') AS sents,
               list_filter(string_split_regex(lower(i.query), '\\s+'),
                           x -> x <> '') AS qws,
               list_filter(string_split_regex(lower(w.content), '\\s+'),
                           x -> x <> '') AS cws
        FROM withcites w JOIN intent i USING (qid)) w),
    qfinal AS (
      SELECT qid, content, n, fallback_used, srcs,
             coherence, relevance, consistency, completeness, readability,
             credibility,
             LEAST(GREATEST((coherence + relevance + consistency
                             + completeness + readability + credibility)
                            / 6.0, 0.0), 1.0) AS overall,
             pre_conf
      FROM quality),
    responses AS (
      -- refusal rows (validation empty-query first, then intent refusal)
      SELECT i.qid, i.query,
             CASE WHEN trim(i.query) = ''
                  THEN 'Unable to provide an answer: Query is empty'
                  ELSE 'Unable to provide an answer: ' || i.refusal_reason
             END AS content,
             0.0 AS confidence, TRUE AS is_refusal,
             0::BIGINT AS n_subqueries, FALSE AS fallback_used,
             '' AS sources
      FROM intent i WHERE i.should_refuse OR trim(i.query) = ''
      UNION ALL
      SELECT f.qid, i.query, f.content,
             LEAST(GREATEST(f.pre_conf * f.overall, 0.0), 1.0),
             FALSE, f.n, f.fallback_used,
             coalesce(array_to_string(f.srcs, '|'), '')
      FROM qfinal f JOIN intent i USING (qid))
    """


def rograg_responses_sql() -> str:
    return f"""
        WITH {_corpus_cte()},
        {_queries_cte()},
        {_intent_cte()},
        {_decompose_cte()},
        {_responses_cte()}
        SELECT query, content, round(confidence, 4) AS confidence,
               is_refusal, n_subqueries, fallback_used, sources
        FROM responses
    """


def rograg_quality_sql() -> str:
    return f"""
        WITH {_corpus_cte()},
        {_queries_cte()},
        {_intent_cte()},
        {_decompose_cte()},
        {_responses_cte()}
        SELECT i.query, round(f.coherence, 4) AS coherence,
               round(f.relevance, 4) AS relevance,
               round(f.consistency, 4) AS consistency,
               round(f.completeness, 4) AS completeness,
               round(f.readability, 4) AS readability,
               round(f.credibility, 4) AS credibility,
               round(f.overall, 4) AS overall
        FROM qfinal f JOIN intent i USING (qid)
    """


def rograg_stream_sql(chunk_size: int = 8) -> str:
    return f"""
        WITH {_corpus_cte()},
        {_queries_cte()},
        {_intent_cte()},
        {_decompose_cte()},
        {_responses_cte()},
        words AS (
          SELECT f.qid, i.query,
                 list_filter(string_split_regex(f.content, '\\s+'),
                             x -> x <> '') AS ws
          FROM qfinal f JOIN intent i USING (qid))
        SELECT w.query, t.i AS chunk_id,
               array_to_string(w.ws[t.i * {chunk_size} + 1
                                    : (t.i + 1) * {chunk_size}], ' ')
                   AS content,
               (t.i + 1) * {chunk_size} >= len(w.ws) AS is_final
        FROM words w,
        LATERAL unnest(range(0, (len(w.ws) + {chunk_size} - 1)
                                // {chunk_size})) t(i)
    """


_TRANSITION_TEST = " OR ".join(
    f"strpos(lower(s), '{t}') > 0"
    for t in ("however", "therefore", "furthermore", "additionally",
              "meanwhile", "consequently", "moreover", "nevertheless",
              "thus", "hence"))


def rograg_metrics_sql() -> str:
    """quality_metrics.rs scoring replay over the composed responses:
    accuracy folds the published (4-decimal) response confidence with the
    5-char-prefix source credibility; completeness/coherence/relevance
    use the 500-char / transition-density+repetition / len>3-word-overlap
    formulas."""
    return f"""
        WITH {_corpus_cte()},
        {_queries_cte()},
        {_intent_cte()},
        {_decompose_cte()},
        {_responses_cte()},
        rq AS (
          SELECT r.qid, r.query, r.content,
                 round(r.confidence, 4) AS conf,
                 r.n_subqueries,
                 list_filter(string_split(r.sources, '|'), x -> x <> '')
                     AS srcs,
                 string_split_regex(r.content, '[.!?]') AS sents,
                 list_filter(string_split_regex(r.content, '\\s+'),
                             x -> x <> '') AS words,
                 list_filter(string_split_regex(lower(r.query), '\\s+'),
                             x -> x <> '' AND length(x) > 3) AS qw,
                 list_distinct(list_filter(string_split_regex(
                     lower(r.content), '\\s+'), x -> x <> '')) AS aw
          FROM responses r),
        rm AS (
          SELECT qid, query,
                 CASE WHEN len(srcs) = 0 THEN 0.0
                      ELSE (LEAST(len(srcs) / 5.0, 1.0)
                            + len(list_distinct(list_transform(srcs,
                                  s -> substr(s, 1, 5))))::DOUBLE
                              / len(srcs)) / 2.0 END AS credibility,
                 (LEAST(length(content) / 500.0, 1.0)
                  + LEAST(len(srcs) / 3.0, 1.0)
                  + LEAST(n_subqueries / 5.0, 1.0)) / 3.0 AS completeness,
                 CASE WHEN len(sents) <= 1 THEN 1.0
                      ELSE (LEAST(len(list_filter(sents,
                              s -> {_TRANSITION_TEST}))::DOUBLE
                            / len(sents), 1.0)
                            + CASE WHEN len(words) = 0 THEN 1.0
                                   ELSE len(list_distinct(words))::DOUBLE
                                        / len(words) END) / 2.0
                 END AS coherence,
                 CASE WHEN len(list_distinct(qw)) = 0 THEN 1.0
                      ELSE len(list_intersect(list_distinct(qw), aw))
                           ::DOUBLE / len(list_distinct(qw)) END
                     AS relevance,
                 conf
          FROM rq)
        SELECT query,
               round((conf + credibility) / 2.0, 4) AS accuracy,
               round(completeness, 4) AS completeness,
               round(coherence, 4) AS coherence,
               round(relevance, 4) AS relevance,
               round(credibility, 4) AS credibility,
               round(LEAST((conf + credibility) / 2.0 * 0.3
                           + completeness * 0.25 + coherence * 0.2
                           + relevance * 0.15 + credibility * 0.1, 1.0), 4)
                   AS overall
        FROM rm
    """
