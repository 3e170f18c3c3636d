"""DuckDB oracle twin for gen_answers (generation/mod.rs replay).

Builds on the fuzzy-match CTE machinery (rograg_oracle._fuzzy_cte) over
the GEN_QUERIES workload, then replays: context assembly with the
0.7/0.3 score bands and max-source truncation, MockLLM's extractive
sentence scoring for BOTH prompt templates (the extractive and QA
question suffixes leak the template instruction words into the keyword
set — a faithful quirk), hybrid fallback, the contextual-summary
fallback, answer-confidence adjustments, citation formatting and the
quality-assessment string.

The themed contextual branches (who+friend / what+adventure / where,
generation/mod.rs:180-208) are provably unreachable for GEN_QUERIES —
none of the trigger words occur in any query or template suffix — so the
replay encodes only the summary fallback.
"""

from __future__ import annotations

from .kgx import _corpus_cte
from .rograg_oracle import _esc, _fuzzy_cte
from .stages.generation import GEN_QUERIES

# whitespace-normalized template suffixes appended to the question section
# the MockLLM actually sees (generation/mod.rs:744-762 templates + the
# Q&A prompt parse at 318-340)
_EXT_SUFFIX = " Relevant information:"
_ABS_SUFFIX = (" Based on the provided context, please answer the "
               "question. If the context doesn't contain enough "
               "information, please say so.")


def _gen_queries_cte() -> str:
    vals = ", ".join(f"({i}, '{_esc(q)}')"
                     for i, q in enumerate(GEN_QUERIES))
    return f"qg(qid, query) AS (VALUES {vals})"


def _scoring_cte(p: str, suffix: str) -> str:
    """Sentence-scoring CTEs for one prompt flavor: {p}ans(qid, answer)
    (MockLLM::generate_extractive_answer replay, mod.rs:72-160)."""
    return f"""
    {p}qw AS (
      SELECT qid,
             list_filter(string_split_regex(
                 lower(query || '{_esc(suffix)}'), '\\s+'),
                 x -> x <> '' AND length(x) > 2) AS ws
      FROM qg),
    {p}pair AS (
      SELECT s.qid, s.sidx, s.sent, w.w,
             CASE WHEN strpos(s.lsent, w.w) > 0 THEN 2.0
                  WHEN length(w.w) > 4 AND len(list_filter(s.swords,
                       sw -> strpos(sw, w.w) > 0 OR strpos(w.w, sw) > 0))
                       > 0 THEN 1.0
                  ELSE 0.0 END AS contrib
      FROM sents s
      JOIN {p}qw q2 ON q2.qid = s.qid
      CROSS JOIN LATERAL unnest(q2.ws) w(w)),
    {p}ssc AS (
      SELECT p.qid, p.sidx, any_value(p.sent) AS sent,
             sum(p.contrib)
               + sum(CASE WHEN p.contrib > 0 THEN 1 ELSE 0 END)::DOUBLE
                 / any_value(len(q2.ws)) * 0.5 AS score
      FROM {p}pair p JOIN {p}qw q2 ON q2.qid = p.qid
      GROUP BY p.qid, p.sidx),
    {p}srk AS (
      SELECT *, row_number() OVER (PARTITION BY qid
                                   ORDER BY score DESC, sidx) AS rn
      FROM {p}ssc),
    {p}ans0 AS (
      SELECT qid,
             string_agg(sent || ' (relevance: ' || printf('%.1f', score)
                        || ')', chr(10) || chr(10) ORDER BY rn)
                 FILTER (rn <= 5 AND score > 0.5) AS high,
             string_agg(sent || ' (low confidence: '
                        || printf('%.1f', score) || ')',
                        chr(10) || chr(10) ORDER BY rn)
                 FILTER (rn <= 2 AND score > 0.0) AS low
      FROM {p}srk GROUP BY qid),
    {p}ans AS (
      SELECT qid,
             CASE WHEN a0.answer_raw IS NULL THEN a0.answer_raw
                  WHEN length(a0.answer_raw) > 500
                  THEN substr(a0.answer_raw, 1, 497) || '...'
                  ELSE a0.answer_raw END AS answer
      FROM (SELECT qid, coalesce(high, low,
                'No directly relevant information found in the context.')
                AS answer_raw
            FROM {p}ans0) a0)
    """


def gen_answers_sql() -> str:
    fuzzy = _fuzzy_cte("qg", "g_")
    nl2 = "chr(10) || chr(10)"
    return f"""
        WITH {_corpus_cte()},
        {_gen_queries_cte()},
        {fuzzy},
        srch AS (
          SELECT qid, rank, match_id, content,
                 round(sim, 4) AS score,
                 match_type LIKE '%_entity' AS is_ent,
                 CASE WHEN match_type LIKE '%_entity'
                      THEN split_part(content, ' (', 1) END AS ent_name
          FROM g_frank WHERE rank < 10),
        cat AS (
          SELECT *,
                 CASE WHEN score >= 0.7 THEN 0
                      WHEN score >= 0.3 THEN 1 END AS cato,
                 row_number() OVER (
                   PARTITION BY qid,
                     CASE WHEN score >= 0.7 THEN 0
                          WHEN score >= 0.3 THEN 1 END
                   ORDER BY score DESC, rank) AS crn
          FROM srch WHERE score >= 0.3),
        kept AS (SELECT * FROM cat WHERE crn <= 5),
        ctxq AS (
          SELECT g.qid,
                 coalesce(avg(k.score) FILTER (k.cato = 0), 0.0) AS avg_p,
                 coalesce(avg(k.score) FILTER (k.cato = 1), 0.0) AS avg_s,
                 count(*) FILTER (k.cato = 0) AS np,
                 count(*) FILTER (k.cato = 1) AS ns
          FROM qg g LEFT JOIN kept k USING (qid) GROUP BY g.qid),
        ctx AS (
          SELECT qid, np + ns AS n_sources,
                 LEAST(avg_p * 0.5 + avg_s * 0.3, 1.0) AS conf
          FROM ctxq),
        combined AS (
          SELECT qid, string_agg(content, {nl2} ORDER BY cato, crn)
                     AS content
          FROM kept GROUP BY qid),
        ents AS (
          SELECT qid, list(DISTINCT lower(ent_name)) AS enames
          FROM srch WHERE is_ent GROUP BY qid),
        rawsent AS (
          SELECT c.qid, t.i AS rawidx,
                 -- Rust .trim() strips ALL whitespace; DuckDB trim()
                 -- defaults to spaces only
                 trim(string_split_regex(c.content, '[.!?]')[t.i],
                      ' ' || chr(9) || chr(10) || chr(13)) AS sent
          FROM combined c,
          LATERAL unnest(range(1,
              len(string_split_regex(c.content, '[.!?]')) + 1)) t(i)),
        sents AS (
          SELECT qid, sent, lower(sent) AS lsent,
                 list_filter(string_split_regex(lower(sent), '\\s+'),
                             x -> x <> '') AS swords,
                 row_number() OVER (PARTITION BY qid ORDER BY rawidx) - 1
                     AS sidx
          FROM rawsent WHERE sent <> ''),
        {_scoring_cte('e_', _EXT_SUFFIX)},
        {_scoring_cte('a_', _ABS_SUFFIX)},
        summ AS (
          -- MockLLM::generate_summary(combined, 150) via first-3-sentence
          -- accumulation (mod.rs:357-375)
          SELECT qid,
                 CASE WHEN length(coalesce(s1, '')) > 150 THEN ''
                      WHEN s2 IS NULL
                        OR length(s1) + length(s2) > 150 THEN s1
                      WHEN s3 IS NULL
                        OR length(s1) + 1 + length(s2) + length(s3) > 150
                        THEN s1 || ' ' || s2
                      ELSE s1 || ' ' || s2 || ' ' || s3 END AS summary
          FROM (SELECT qid,
                       max(CASE WHEN sidx = 0 THEN sent END) AS s1,
                       max(CASE WHEN sidx = 1 THEN sent END) AS s2,
                       max(CASE WHEN sidx = 2 THEN sent END) AS s3
                FROM sents GROUP BY qid)),
        hybrid AS (
          SELECT g.qid,
                 CASE
                   WHEN length(e.answer) < 50
                     OR strpos(e.answer, 'No relevant') > 0
                   THEN
                     CASE WHEN strpos(a.answer, 'No relevant') > 0
                            OR strpos(a.answer, 'No directly') > 0
                          THEN CASE WHEN length(
                                 'Based on the available context: '
                                 || s.summary) > 500
                               THEN substr('Based on the available '
                                    || 'context: ' || s.summary, 1, 497)
                                    || '...'
                               ELSE 'Based on the available context: '
                                    || s.summary END
                          ELSE a.answer END
                   ELSE e.answer END AS answer
          FROM qg g
          JOIN e_ans e USING (qid)
          JOIN a_ans a USING (qid)
          JOIN summ s USING (qid)),
        answered AS (
          SELECT c.qid,
                 CASE WHEN c.conf < 0.3
                      THEN 'Insufficient information available to answer '
                           || 'this question.'
                      ELSE h.answer END AS answer,
                 c.conf, c.n_sources
          FROM ctx c LEFT JOIN hybrid h USING (qid)),
        scored AS (
          SELECT a.qid, a.answer, a.n_sources, a.conf AS context_quality,
                 CASE WHEN a.conf < 0.3 THEN a.conf
                 ELSE LEAST(
                   (a.conf
                    * (CASE WHEN length(a.answer) < 20 THEN 0.7
                            ELSE 1.0 END)
                    * (CASE WHEN strpos(a.answer, 'No relevant') > 0
                            OR strpos(a.answer, 'insufficient') > 0
                            THEN 0.5 ELSE 1.0 END))
                   + (CASE WHEN coalesce(len(list_filter(e.enames,
                           x -> strpos(lower(a.answer), x) > 0)), 0) > 0
                      THEN LEAST(len(list_filter(e.enames,
                           x -> strpos(lower(a.answer), x) > 0)) * 0.1,
                           0.2)
                      ELSE 0.0 END), 1.0) END AS confidence
          FROM answered a LEFT JOIN ents e USING (qid)),
        cites AS (
          SELECT qid,
                 string_agg(chr(10) || '[' || gid || '] '
                     || CASE cato WHEN 0 THEN 'chunk'
                            ELSE 'supporting_chunk' END
                     || ' (confidence: ' || printf('%.2f', score) || ') - '
                     || CASE WHEN length(content) > 100
                             THEN substr(content, 1, 100) || '...'
                             ELSE content END,
                     '' ORDER BY gid) AS block
          FROM (SELECT *, row_number() OVER (PARTITION BY qid
                        ORDER BY cato, crn) AS gid
                FROM kept)
          GROUP BY qid)
        SELECT g.query,
               s.answer
               || coalesce({nl2} || 'Sources:' || c.block, '')
               || CASE WHEN s.confidence > 0.0
                       THEN {nl2} || 'Overall confidence: '
                            || printf('%.2f', s.confidence)
                       ELSE '' END AS answer,
               round(s.confidence, 4) AS confidence,
               round(s.context_quality, 4) AS context_quality,
               s.n_sources::BIGINT AS n_sources,
               'Confidence: '
               || CASE WHEN s.confidence >= 0.8 THEN 'High'
                       WHEN s.confidence >= 0.5 THEN 'Medium'
                       ELSE 'Low' END
               || ' | Sources: '
               || CASE WHEN s.n_sources >= 3 THEN 'Well-sourced'
                       WHEN s.n_sources >= 1 THEN 'Moderately sourced'
                       ELSE 'Poorly sourced' END
               || ' | Context Quality: '
               || printf('%.2f', s.context_quality) AS quality
        FROM scored s
        JOIN qg g USING (qid)
        LEFT JOIN cites c USING (qid)
    """


def _explained_base() -> str:
    """Shared CTEs: srch (typed fuzzy results), exconf (avg*0.7+0.3
    clamp), exents (pinned-order unique entity names) —
    retrieval/explained.rs:93-180."""
    return f"""
        WITH {_corpus_cte()},
        {_gen_queries_cte()},
        {_fuzzy_cte("qg", "g_")},
        srch AS (
          SELECT qid, rank, match_id, content,
                 round(sim, 4) AS score,
                 match_type LIKE '%_entity' AS is_ent,
                 CASE WHEN match_type LIKE '%_entity'
                      THEN split_part(content, ' (', 1) END AS ent_name
          FROM g_frank WHERE rank < 10),
        exconf AS (
          SELECT g.qid,
                 CASE WHEN count(s.qid) = 0 THEN 0.0
                      ELSE LEAST(GREATEST(avg(s.score) * 0.7 + 0.3, 0.0),
                                 1.0) END AS conf,
                 count(*) FILTER (NOT s.is_ent) AS chunk_count
          FROM qg g LEFT JOIN srch s USING (qid) GROUP BY g.qid),
        exents AS (
          SELECT qid, list(DISTINCT ent_name ORDER BY ent_name) AS ents
          FROM srch WHERE is_ent GROUP BY qid),
        first_snip AS (
          SELECT qid,
                 CASE WHEN length(content) > 100
                      THEN substr(content, 1, 100) || '...'
                      ELSE content END AS snippet
          FROM srch WHERE rank = 0)
    """


def explained_steps_sql() -> str:
    return f"""
        {_explained_base()},
        s1 AS (
          SELECT qid, 1 AS ord, 'Analyzed query: "' || query || '"'
                     AS description,
                 '' AS entities_used, '' AS evidence, 0.95 AS confidence
          FROM qg),
        s2 AS (
          SELECT e.qid, 2 AS ord,
                 'Found ' || len(e.ents) || ' relevant entities',
                 array_to_string(e.ents[1:5], '|'), '', 0.85
          FROM exents e),
        s3 AS (
          SELECT c.qid, 3 AS ord,
                 'Retrieved ' || c.chunk_count || ' relevant text chunks',
                 '', coalesce(f.snippet, ''), c.conf
          FROM exconf c LEFT JOIN first_snip f USING (qid)
          WHERE c.chunk_count > 0),
        s4 AS (
          SELECT c.qid, 4 AS ord,
                 'Synthesized answer from retrieved information',
                 coalesce(array_to_string(e.ents[1:3], '|'), ''), '',
                 c.conf
          FROM exconf c LEFT JOIN exents e USING (qid)),
        allsteps AS (
          SELECT * FROM s1 UNION ALL SELECT * FROM s2
          UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4)
        SELECT g.query,
               row_number() OVER (PARTITION BY a.qid ORDER BY a.ord)
                   AS step_number,
               a.description, a.entities_used, a.evidence,
               round(a.confidence, 4) AS confidence
        FROM allsteps a JOIN qg g USING (qid)
    """


def explained_sources_sql() -> str:
    return f"""
        {_explained_base()}
        SELECT g.query, s.rank, s.match_id AS source_id,
               CASE WHEN s.is_ent THEN 'entity' ELSE 'text_chunk' END
                   AS source_type,
               CASE WHEN length(s.content) > 200
                    THEN substr(s.content, 1, 200) || '...'
                    ELSE s.content END AS excerpt,
               s.score AS relevance
        FROM srch s JOIN qg g USING (qid)
        WHERE s.rank < 5
    """


def _rerank_cte(min_confidence: float = 0.45) -> str:
    """Dice-sigmoid rerank replay over the fuzzy candidates
    (cross_encoder.rs:168-198 orchestration; scorer = the declared
    deterministic seam, stages/rerank.py lexical_score)."""
    return f"""
        srch AS (
          SELECT qid, rank, match_id, content, round(sim, 4) AS score
          FROM g_frank WHERE rank < 10),
        scored AS (
          SELECT s.qid, s.rank, s.match_id, s.score,
                 1.0 / (1.0 + exp(-(2.0 * (
                     CASE WHEN len(qw) + len(dw) = 0 THEN 0.0
                          ELSE 2.0 * len(list_intersect(qw, dw))::DOUBLE
                               / (len(qw) + len(dw)) END) - 1.0)))
                     AS relevance
          FROM (
            SELECT s.*,
                   list_distinct(list_filter(string_split_regex(
                       lower(g.query), '\\s+'), x -> x <> '')) AS qw,
                   list_distinct(list_filter(string_split_regex(
                       lower(s.content), '\\s+'), x -> x <> '')) AS dw
            FROM srch s JOIN qg g USING (qid)) s),
        kept2 AS (
          SELECT *, row_number() OVER (PARTITION BY qid
                        ORDER BY relevance DESC, rank) - 1 AS rrank
          FROM scored WHERE relevance >= {min_confidence}),
        reranked AS (SELECT * FROM kept2 WHERE rrank < 10)
    """


def rerank_fuzzy_sql() -> str:
    return f"""
        WITH {_corpus_cte()},
        {_gen_queries_cte()},
        {_fuzzy_cte("qg", "g_")},
        {_rerank_cte()}
        SELECT g.query, r.rrank AS rank, r.match_id AS id,
               round(r.relevance, 4) AS relevance,
               round(r.score, 4) AS original,
               round(r.relevance - r.score, 4) AS delta
        FROM reranked r JOIN qg g USING (qid)
    """


def rerank_stats_sql() -> str:
    return f"""
        WITH {_corpus_cte()},
        {_gen_queries_cte()},
        {_fuzzy_cte("qg", "g_")},
        {_rerank_cte()}
        SELECT g.query,
               coalesce(c.n, 0) AS candidates_count,
               coalesce(k.n, 0) AS results_count,
               round(coalesce(k.avg_delta, 0.0), 4) AS avg_improvement,
               round(coalesce(k.max_delta, 0.0), 4) AS max_improvement,
               round(CASE WHEN coalesce(c.n, 0) = 0 THEN 0.0
                     ELSE (c.n - coalesce(k.n, 0))::DOUBLE / c.n * 100.0
                     END, 4) AS filter_rate
        FROM qg g
        LEFT JOIN (SELECT qid, count(*) AS n FROM srch GROUP BY qid) c
            USING (qid)
        LEFT JOIN (SELECT qid, count(*) AS n,
                          avg(relevance - score) AS avg_delta,
                          max(relevance - score) AS max_delta
                   FROM reranked GROUP BY qid) k USING (qid)
    """
