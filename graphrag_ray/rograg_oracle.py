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


def _logic_cte() -> str:
    """CTEs: lf(qid, pred, a1, a2) — logic_form/parser.rs first-match
    parse replay; resv — executor.rs:634-649 find_entity_by_name pinned to
    (exact-first, canonical_id ASC); lfbind — is/related/compare/
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
    lfp AS (
      SELECT qid, query,
             {col_sql}
      FROM q),
    lf AS (
      SELECT qid, query, {pred_case} AS pred,
             trim({a1_case}) AS a1, trim({a2_case}) AS a2
      FROM lfp WHERE h1 OR h2 OR h3 OR h4 OR h5 OR h6),
    isb AS (
      SELECT l.qid, 'is' AS predicate, 'X' AS variable,
             c.canonical_name || ' (' || c.entity_type || ')' AS value,
             c.canonical_id AS entity_id,
             CASE WHEN lower(c.canonical_name) = lower(l.a1) THEN 1.0
                  ELSE 0.8 END AS confidence
      FROM lf l JOIN canon c
        ON strpos(lower(c.canonical_name), lower(l.a1)) > 0
      WHERE l.pred = 'is'),
    resv AS (
      SELECT qid, ai, canonical_id, canonical_name, entity_type FROM (
        SELECT l.qid, u.ai, c.canonical_id, c.canonical_name, c.entity_type,
               row_number() OVER (
                 PARTITION BY l.qid, u.ai
                 ORDER BY CASE WHEN lower(c.canonical_name) = lower(u.arg)
                               THEN 0 ELSE 1 END, c.canonical_id) AS rn
        FROM lf l, LATERAL (VALUES (0, l.a1), (1, l.a2)) u(ai, arg)
        JOIN canon c
          ON (lower(c.canonical_name) = lower(u.arg)
              OR strpos(lower(c.canonical_name), lower(u.arg)) > 0
              OR strpos(lower(u.arg), lower(c.canonical_name)) > 0)
        WHERE l.pred <> 'is' AND u.arg IS NOT NULL)
      WHERE rn = 1),
    relpair AS (
      SELECT l.qid, a.canonical_id AS aid, a.canonical_name AS aname,
             b.canonical_id AS bid, b.canonical_name AS bname
      FROM lf l
      JOIN resv a ON a.qid = l.qid AND a.ai = 0
      JOIN resv b ON b.qid = l.qid AND b.ai = 1
      WHERE l.pred = 'related'),
    reledges AS (
      SELECT p.qid,
             p.aname || ' ' || e.rel_type || ' ' || p.bname AS value
      FROM relpair p JOIN kgx_edge_agg e
        ON (e.src = p.aid AND e.dst = p.bid)
        OR (e.src = p.bid AND e.dst = p.aid)),
    lfbind AS (
      SELECT * FROM isb
      UNION ALL
      SELECT qid, 'related', 'R', value, '', 0.5 FROM reledges
      UNION ALL
      SELECT p.qid, 'related', 'R',
             'No direct relationship found between ' || p.aname || ' and '
               || p.bname, '', 0.3
      FROM relpair p
      WHERE NOT EXISTS (SELECT 1 FROM reledges r WHERE r.qid = p.qid)
      UNION ALL
      SELECT l.qid, 'compare', 'comparison',
             a.canonical_name || ' is a ' || a.entity_type || ' while '
               || b.canonical_name || ' is a ' || b.entity_type, '', 0.7
      FROM lf l
      JOIN resv a ON a.qid = l.qid AND a.ai = 0
      JOIN resv b ON b.qid = l.qid AND b.ai = 1
      WHERE l.pred = 'compare'
      UNION ALL
      -- happened/caused strategy 1 (executor.rs:263-530): incident edges
      -- whose relation type carries a temporal/causal keyword; the kgx
      -- relation vocabulary has none, so these legs yield zero rows
      SELECT l.qid, l.pred, 'T',
             l.a1 || ' ' || e.rel_type || ' ' || o.canonical_name,
             o.canonical_id, 0.5
      FROM lf l
      JOIN resv a ON a.qid = l.qid AND a.ai = 0
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


def _fuzzy_cte() -> str:
    """CTEs replaying fuzzy_matcher.rs over canon + the kgx sentences:
    qtok (query word lists), fent (entity exact/partial/type matches),
    fchunk (content/keyword matches), frank (stable similarity ranking
    pinned to the engine's emission order, top-10).  Semantic expansion
    (rs:476-536) is provably empty here: every kgx edge confidence is the
    0.5 pattern constant and 0.5*0.6 < 0.6*0.7."""
    return """
    qtok AS MATERIALIZED (
      SELECT qid, query, lower(query) AS lq,
             list_filter(string_split_regex(lower(query), '\\s+'),
                         x -> x <> '') AS qw_raw,
             list_distinct(list_filter(
                 string_split_regex(lower(query), '\\s+'),
                 x -> x <> '')) AS qw
      FROM q),
    fent AS (
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
      FROM qtok t CROSS JOIN canon c),
    fentm AS (
      SELECT qid, canonical_id, canonical_name, entity_type, ln,
             CASE WHEN nq + ne - inter > 0
                  THEN inter::DOUBLE / (nq + ne - inter) ELSE 0.0 END * 0.4
             + CASE WHEN nq = 0 AND ne = 0 THEN 1.0
                    WHEN LEAST(nq, ne) = 0 THEN 0.0
                    ELSE inter::DOUBLE / LEAST(nq, ne) END * 0.4
             + CASE WHEN mxl = 0 THEN 1.0
                    ELSE 1.0 - lev::DOUBLE / mxl END * 0.2 AS combined,
             type_hit, nq_raw
      FROM fent),
    fe AS (
      -- exact (rs:381-395) else partial (rs:397-408); plus type matches
      SELECT t.qid, 0 AS phase, m.canonical_id AS sid, 0 AS subrole,
             m.canonical_id AS match_id,
             CASE WHEN m.ln = t.lq THEN 'exact_entity'
                  ELSE 'partial_entity' END AS match_type,
             CASE WHEN m.ln = t.lq THEN 1.0 ELSE m.combined * 0.9 END AS sim,
             m.canonical_name || ' (' || m.entity_type || ')' AS content
      FROM fentm m JOIN qtok t USING (qid)
      WHERE m.ln = t.lq OR m.combined >= 0.6
      UNION ALL
      SELECT m.qid, 0, m.canonical_id, 1, 'type_' || m.canonical_id,
             'semantic_entity', 0.7,
             m.canonical_name || ' (' || m.entity_type || ')'
      FROM fentm m
      WHERE m.qid IN (SELECT qid FROM qtok WHERE lq <> lower(
            (SELECT canonical_name FROM canon c2
             WHERE c2.canonical_id = m.canonical_id)))
        AND m.type_hit AND m.nq_raw > 0),
    ftok AS MATERIALIZED (
      SELECT doc_id || '_0' AS chunk_id, s,
             lower(s) AS ls,
             list_filter(string_split_regex(lower(s), '\\s+'),
                         x -> x <> '') AS cw_raw,
             list_distinct(list_filter(
                 string_split_regex(lower(s), '\\s+'),
                 x -> x <> '')) AS cw
      FROM kgx_docs),
    fchunkx AS (
      SELECT t.qid, k.chunk_id, k.s,
             len(list_intersect(t.qw, k.cw)) AS inter,
             len(t.qw) AS nq, len(k.cw) AS nc,
             levenshtein(t.lq, k.ls) AS lev,
             GREATEST(length(t.lq), length(k.s)) AS mxl,
             len(list_intersect(t.qw, k.cw))::DOUBLE
               / NULLIF(LEAST(len(t.qw_raw), len(k.cw_raw)), 0) AS overlap
      FROM qtok t CROSS JOIN ftok k),
    fc AS (
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
        FROM fchunkx) x,
      LATERAL (VALUES
          (0, x.chunk_id, x.combined, x.combined >= 0.6),
          (1, 'keywords_' || x.chunk_id, coalesce(x.overlap, 0.0),
           coalesce(x.overlap, 0.0) >= 0.48)) u(subrole, match_id, sim, keep)
      WHERE u.keep),
    fall AS (SELECT * FROM fe UNION ALL SELECT * FROM fc),
    frank AS (
      SELECT qid, match_id, match_type, sim, content,
             row_number() OVER (PARTITION BY qid
                                ORDER BY sim DESC, phase, sid, subrole) - 1
                 AS rank
      FROM fall)
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
