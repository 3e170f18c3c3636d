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


def pipeline_validation_sql() -> str:
    """evaluation/pipeline_validation.rs replay over the kgx corpus
    expectations — every count re-derived in SQL, all check/message
    strings reproduced."""
    return f"""
        WITH {_corpus_cte()},
        st AS (
          SELECT
            (SELECT count(*) FROM documents) AS n_docs,
            (SELECT count(*) FROM kgx_docs) AS n_chunks,
            (SELECT sum(length(s)) FROM kgx_docs) AS chars,
            (SELECT count(*) FROM kgx_docs WHERE trim(s) = '') AS n_empty,
            (SELECT count(*) FROM canon) AS n_ents,
            (SELECT count(*) FROM canon
             WHERE confidence <= 0.0 OR confidence > 1.0) AS e_bad,
            (SELECT count(*) FROM canon
             WHERE entity_type IS NULL OR entity_type = '') AS e_notype,
            (SELECT count(*) FROM canon
             WHERE trim(canonical_name) = '') AS e_noname,
            (SELECT count(*) FROM kgx_edge_agg) AS n_rels,
            0::BIGINT AS r_bad,
            (SELECT count(*) FROM kgx_edge_agg
             WHERE rel_type IS NULL OR rel_type = '') AS r_notype,
            (SELECT count(*) FROM kgx_edge_agg e
             WHERE NOT EXISTS (SELECT 1 FROM canon c
                               WHERE c.canonical_id = e.src)
                OR NOT EXISTS (SELECT 1 FROM canon c
                               WHERE c.canonical_id = e.dst)) AS r_orphans),
        rows AS (
          SELECT 0 AS ord, 'Document Processing' AS phase,
                 'document_not_empty' AS "check", chars > 0 AS passed,
                 'Non-empty content' AS expected,
                 chars || ' characters' AS actual,
                 CASE WHEN chars = 0 THEN 'Document content is empty'
                      ELSE 'Document contains content' END AS message
          FROM st
          UNION ALL
          SELECT 1, 'Document Processing', 'chunks_created', n_chunks > 0,
                 'At least 1 chunk', n_chunks || ' chunks',
                 CASE WHEN n_chunks = 0
                      THEN 'No chunks were created from document'
                      ELSE 'Successfully created ' || n_chunks
                           || ' chunks' END
          FROM st
          UNION ALL
          SELECT 2, 'Document Processing', 'content_coverage',
                 chars::DOUBLE / chars >= 0.9, 'Coverage ratio >= 0.9',
                 printf('%.2f', chars::DOUBLE / chars),
                 'Chunks cover '
                   || printf('%.1f', chars::DOUBLE / chars * 100.0)
                   || '% of original content'
          FROM st WHERE n_chunks > 0
          UNION ALL
          SELECT 3, 'Document Processing', 'no_empty_chunks',
                 n_empty = 0, '0 empty chunks',
                 n_empty || ' empty chunks',
                 CASE WHEN n_empty > 0
                      THEN 'Found ' || n_empty || ' empty chunks'
                      ELSE 'All chunks have content' END
          FROM st
          UNION ALL
          SELECT 4, 'Document Processing', 'metadata_enrichment', TRUE,
                 'Metadata enrichment (optional)',
                 '0/' || n_chunks || ' chunks',
                 printf('%.1f', 0.0) || '% of chunks have metadata'
          FROM st
          UNION ALL
          SELECT 5, 'Entity Extraction', 'entities_extracted', n_ents > 0,
                 'At least 1 entity', n_ents || ' entities',
                 CASE WHEN n_ents = 0 THEN 'No entities extracted'
                      ELSE 'Extracted ' || n_ents || ' entities' END
          FROM st
          UNION ALL
          SELECT 6, 'Entity Extraction', 'entity_confidence_valid',
                 e_bad = 0, 'All confidence in (0, 1]',
                 e_bad || ' invalid',
                 CASE WHEN e_bad > 0
                      THEN e_bad || ' entities have invalid confidence'
                      ELSE 'All confidence scores valid' END
          FROM st
          UNION ALL
          SELECT 7, 'Entity Extraction', 'entity_types_populated',
                 e_notype = 0, 'All entities typed',
                 e_notype || ' missing',
                 CASE WHEN e_notype > 0
                      THEN e_notype || ' entities missing types'
                      ELSE 'All entities typed' END
          FROM st
          UNION ALL
          SELECT 8, 'Entity Extraction', 'entity_names_not_empty',
                 e_noname = 0, 'All names non-empty',
                 e_noname || ' empty',
                 CASE WHEN e_noname > 0
                      THEN e_noname || ' entities have empty names'
                      ELSE 'All entity names populated' END
          FROM st
          UNION ALL
          SELECT 9, 'Relationship Extraction', 'relationships_extracted',
                 n_rels > 0, 'At least 1 relationship',
                 n_rels || ' relationships',
                 CASE WHEN n_rels = 0
                      THEN 'No relationships found between entities'
                      ELSE 'Extracted ' || n_rels || ' relationships' END
          FROM st WHERE n_ents > 1
          UNION ALL
          SELECT 10, 'Relationship Extraction',
                 'relationship_confidence_valid', r_bad = 0,
                 'All confidence in (0, 1]', r_bad || ' invalid',
                 CASE WHEN r_bad > 0
                      THEN r_bad
                           || ' relationships have invalid confidence'
                      ELSE 'All confidence scores valid' END
          FROM st
          UNION ALL
          SELECT 11, 'Relationship Extraction',
                 'relationship_types_populated', r_notype = 0,
                 'All relationships typed', r_notype || ' missing',
                 CASE WHEN r_notype > 0
                      THEN r_notype || ' relationships missing types'
                      ELSE 'All relationships typed' END
          FROM st
          UNION ALL
          SELECT 12, 'Relationship Extraction',
                 'relationship_entities_exist', r_orphans = 0,
                 '0 orphan relationships', r_orphans || ' orphans',
                 CASE WHEN r_orphans > 0
                      THEN r_orphans
                           || ' relationships reference missing entities'
                      ELSE 'All relationship endpoints exist' END
          FROM st
          UNION ALL
          SELECT 13, 'Graph Construction', 'graph_not_empty',
                 n_ents > 0 OR n_docs > 0, 'At least some nodes',
                 n_ents || ' entities, ' || n_docs || ' docs',
                 CASE WHEN n_ents = 0 AND n_docs = 0
                      THEN 'Graph is completely empty'
                      ELSE 'Graph contains content' END
          FROM st
          UNION ALL
          SELECT 14, 'Graph Construction', 'entity_chunk_ratio_reasonable',
                 n_ents::DOUBLE / n_chunks BETWEEN 0.1 AND 10.0,
                 '0.1 to 10 entities per chunk',
                 printf('%.2f', n_ents::DOUBLE / n_chunks)
                   || ' entities/chunk',
                 CASE WHEN n_ents::DOUBLE / n_chunks BETWEEN 0.1 AND 10.0
                      THEN 'Entity density looks reasonable'
                      ELSE 'Unusual entity-to-chunk ratio: '
                           || printf('%.2f', n_ents::DOUBLE / n_chunks)
                 END
          FROM st WHERE n_chunks > 0
          UNION ALL
          SELECT 15, 'Graph Construction', 'graph_connectivity',
                 n_rels::DOUBLE / n_ents > 0.1,
                 '>0.1 relationships per entity',
                 printf('%.2f', n_rels::DOUBLE / n_ents)
                   || ' rels/entity',
                 CASE WHEN n_rels::DOUBLE / n_ents > 0.1
                      THEN 'Graph has reasonable connectivity'
                      ELSE 'Graph is sparsely connected' END
          FROM st WHERE n_ents > 1),
        phs AS (
          SELECT phase, min(ord) AS ord0, bool_and(passed) AS ppass
          FROM rows GROUP BY phase),
        agg AS (
          SELECT (SELECT count(*) FROM rows) AS total,
                 (SELECT count(*) FILTER (passed) FROM rows) AS ok,
                 (SELECT bool_and(ppass) FROM phs) AS overall,
                 (SELECT string_agg(phase, ', ' ORDER BY ord0)
                  FROM phs WHERE NOT ppass) AS failed)
        SELECT phase, "check", passed, expected, actual, message FROM rows
        UNION ALL
        SELECT 'Report', 'summary', overall,
               total || ' checks', ok || ' passed',
               CASE WHEN overall
                    THEN '✅ All pipeline phases validated successfully ('
                         || ok || '/' || total || ' checks passed)'
                    ELSE '❌ Pipeline validation failed in: ' || failed
                         || ' (' || ok || '/' || total
                         || ' checks passed)'
               END
        FROM agg
    """


def _concept_cte() -> str:
    """Concept-extraction replay (lightrag/concept_graph.rs:162-249):
    capitalized + noun-phrase regexes with the stopword-density validity
    filter, per-document frequency keywords (ties pinned word ASC),
    distinct per document."""
    from .stages.concept_graph import STOPWORDS
    stops = ", ".join(f"'{w}'" for w in sorted(STOPWORDS))
    cap = r"[A-Z][a-z]+(?:\s+[A-Z][a-z]+)+"
    noun = r"[A-Z][a-z]+(?:\s+[A-Z]?[a-z]+){1,4}"
    return f"""
    phr AS (
      SELECT doc_id, unnest(regexp_extract_all(s, '\\b{cap}\\b')) AS c
      FROM kgx_docs
      UNION ALL
      SELECT doc_id, unnest(regexp_extract_all(s, '\\b{noun}\\b')) AS c
      FROM kgx_docs),
    phrv AS (
      SELECT doc_id, c FROM phr
      WHERE length(c) >= 3
        AND len(string_split(c, ' ')) <= 5
        AND len(list_filter(string_split(c, ' '),
                w -> list_contains([{stops}], lower(w))))
            <= len(string_split(c, ' ')) // 2),
    kwraw AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(lower(w.w),
                 '^[^a-z0-9]+', ''), '[^a-z0-9]+$', '') AS nw
      FROM kgx_docs,
      LATERAL unnest(list_filter(string_split_regex(s, '\\s+'),
                                 x -> x <> '')) w(w)),
    kwfreq AS (
      SELECT doc_id, nw, count(*) AS f
      FROM kwraw
      WHERE length(nw) >= 3 AND nw NOT IN ({stops})
      GROUP BY doc_id, nw),
    kwtop AS (
      SELECT doc_id, nw AS c
      FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                        ORDER BY f DESC, nw) AS rn
            FROM kwfreq)
      WHERE rn <= 20 AND f >= 2),
    con AS (
      SELECT DISTINCT doc_id, c FROM (
        SELECT doc_id, c FROM phrv
        UNION ALL SELECT doc_id, c FROM kwtop))
    """


def concept_nodes_sql() -> str:
    return f"""
        WITH {_corpus_cte()},
        {_concept_cte()}
        SELECT c AS concept, count(*)::BIGINT AS frequency,
               count(*)::BIGINT AS n_docs, count(*)::BIGINT AS n_chunks
        FROM con GROUP BY c
    """


def concept_edges_sql() -> str:
    return f"""
        WITH {_corpus_cte()},
        {_concept_cte()},
        tot AS (SELECT c, count(*) AS n FROM con GROUP BY c),
        pr AS (
          SELECT a.c AS source, b.c AS target, count(*) AS cnt
          FROM con a JOIN con b
            ON a.doc_id = b.doc_id AND a.c < b.c
          GROUP BY a.c, b.c)
        SELECT p.source, p.target, p.cnt::BIGINT AS count,
               round(p.cnt::DOUBLE
                     / (ta.n + tb.n - p.cnt), 4) AS confidence
        FROM pr p
        JOIN tot ta ON ta.c = p.source
        JOIN tot tb ON tb.c = p.target
    """


def _concept_rank_cte() -> str:
    """Concept ranking replay (concept_selection.rs:134-303): degree /
    (n-1), the undirected power-iteration PageRank (kgx_pagerank_sql's
    op-for-op pattern over the concept pair graph) max-normalized,
    tanh-IDF, weighted combine with the 0.1 floor."""
    return f"""
    {_concept_cte()},
    cn AS (SELECT c, count(*) AS n_docs FROM con GROUP BY c),
    cpr AS (
      SELECT a.c AS source, b.c AS target
      FROM con a JOIN con b ON a.doc_id = b.doc_id AND a.c < b.c
      GROUP BY a.c, b.c),
    cdirs AS (SELECT source AS a, target AS b FROM cpr
              UNION ALL SELECT target, source FROM cpr),
    cdeg AS (
      SELECT cn.c, coalesce(d.n, 0) AS deg
      FROM cn LEFT JOIN (SELECT a, count(*) AS n FROM cdirs GROUP BY a) d
        ON d.a = cn.c),
    coinv AS (SELECT a, 1.0::DOUBLE / count(*) AS inv
              FROM cdirs GROUP BY a),
    ccst AS (SELECT 1.0::DOUBLE / count(*) AS reset,
                    count(*)::BIGINT AS n FROM cn),
    cpr2(iter, node, score, prev) AS (
      SELECT 0, c, (SELECT reset FROM ccst), 0.0::DOUBLE FROM cn
      UNION ALL
      SELECT p.iter + 1, p.node,
             (1.0::DOUBLE - 0.85::DOUBLE) * c.reset
             + 0.85::DOUBLE * (
                 coalesce((SELECT sum(q.score * oi.inv)
                           FROM cpr2 q
                           JOIN cdirs d ON d.a = q.node AND d.b = p.node
                           JOIN coinv oi ON oi.a = q.node), 0.0)
                 + coalesce((SELECT sum(q2.score) FROM cpr2 q2
                             LEFT JOIN coinv o2 ON o2.a = q2.node
                             WHERE o2.a IS NULL), 0.0) * c.reset),
             p.score
      FROM cpr2 p CROSS JOIN ccst c
      WHERE p.iter < 100
        AND (SELECT sum(abs(q3.score - q3.prev)) FROM cpr2 q3) >= 1e-6),
    cprf AS (
      SELECT node, score FROM cpr2
      WHERE iter = (SELECT max(iter) FROM cpr2)),
    cprn AS (
      SELECT node, score / (SELECT max(score) FROM cprf) AS pr
      FROM cprf),
    crank AS (
      SELECT cn.c AS concept,
             CASE WHEN st2.n > 1
                  THEN cdeg.deg::DOUBLE / (st2.n - 1) ELSE 0.0 END AS deg,
             cprn.pr,
             -- tanh(x) = (exp(2x)-1)/(exp(2x)+1); DuckDB lacks tanh
             CASE WHEN cn.n_docs > 0
                  THEN (exp(2.0 * (ln((SELECT count(*) FROM documents)
                           ::DOUBLE / cn.n_docs) / 5.0)) - 1.0)
                       / (exp(2.0 * (ln((SELECT count(*) FROM documents)
                           ::DOUBLE / cn.n_docs) / 5.0)) + 1.0)
                  ELSE 0.0 END AS idf,
             cn.n_docs,
             cn.n_docs AS frequency
      FROM cn
      JOIN cdeg ON cdeg.c = cn.c
      JOIN cprn ON cprn.node = cn.c
      CROSS JOIN ccst st2),
    cranked AS (
      SELECT concept,
             0.4 * deg + 0.4 * pr + 0.2 * idf AS score,
             deg, pr, idf, n_docs, frequency
      FROM crank
      WHERE 0.4 * deg + 0.4 * pr + 0.2 * idf >= 0.1)
    """


def concept_rank_sql() -> str:
    return f"""
        WITH RECURSIVE {_corpus_cte()},
        {_concept_rank_cte()}
        SELECT concept, round(score, 4) AS score,
               round(deg, 4) AS degree_score,
               round(pr, 4) AS pagerank_score,
               round(idf, 4) AS idf_score,
               n_docs::BIGINT AS document_frequency,
               frequency::BIGINT AS total_frequency
        FROM cranked
    """


def concept_match_sql() -> str:
    from .stages.concept_select import CONCEPT_QUERIES
    qvals = ", ".join(f"({i}, '{_esc(q)}')"
                      for i, q in enumerate(CONCEPT_QUERIES))
    return f"""
        WITH RECURSIVE {_corpus_cte()},
        {_concept_rank_cte()},
        cq(qid, query) AS (VALUES {qvals}),
        qtok AS (
          -- query_concepts.rs:211-222: ≥2 chars pre-trim, edges trimmed
          SELECT qid, regexp_replace(regexp_replace(t.t, '^[^a-z0-9]+',
                     ''), '[^a-z0-9]+$', '') AS tok
          FROM cq,
          LATERAL unnest(list_filter(string_split_regex(lower(query),
              '\\s+'), x -> length(x) >= 2)) t(t)),
        qtok2 AS (SELECT qid, tok FROM qtok WHERE tok <> ''),
        qn AS (SELECT qid, count(*) AS nt FROM qtok2 GROUP BY qid),
        ctok AS (
          SELECT r.concept,
                 regexp_replace(regexp_replace(t.t, '^[^a-z0-9]+', ''),
                     '[^a-z0-9]+$', '') AS tok
          FROM cranked r,
          LATERAL unnest(list_filter(string_split_regex(lower(r.concept),
              '\\s+'), x -> length(x) >= 2)) t(t)),
        ctok2 AS (SELECT concept, tok FROM ctok WHERE tok <> ''),
        exactm AS (
          SELECT q.qid, r.concept,
                 count(*) FILTER (strpos(lower(r.concept), t.tok) > 0)
                     ::DOUBLE / any_value(qn.nt) AS exact,
                 string_agg(t.tok, '|' ORDER BY t.rowid)
                     FILTER (strpos(lower(r.concept), t.tok) > 0)
                     AS matched
          FROM cq q
          JOIN (SELECT qid, tok,
                       row_number() OVER (PARTITION BY qid) AS rowid
                FROM qtok2) t USING (qid)
          JOIN qn USING (qid)
          CROSS JOIN cranked r
          GROUP BY q.qid, r.concept),
        fuzzy0 AS (
          SELECT t.qid, c.concept, t.tok,
                 max(CASE WHEN levenshtein(t.tok, c.tok)
                            <= 2
                          THEN 1.0 - levenshtein(t.tok, c.tok)::DOUBLE
                               / GREATEST(length(t.tok), length(c.tok))
                          ELSE 0.0 END) AS best
          FROM qtok2 t
          CROSS JOIN ctok2 c
          GROUP BY t.qid, c.concept, t.tok),
        fuzzym AS (
          SELECT f.qid, f.concept,
                 sum(f.best) / any_value(qn.nt) AS fuzzy
          FROM fuzzy0 f JOIN qn ON qn.qid = f.qid
          GROUP BY f.qid, f.concept),
        scored AS (
          SELECT e.qid, e.concept, e.exact,
                 coalesce(f.fuzzy, 0.0) AS fuzzy,
                 0.5 * e.exact + 0.3 * coalesce(f.fuzzy, 0.0) AS match0,
                 r.score AS rscore,
                 coalesce(e.matched, '') AS matched
          FROM exactm e
          LEFT JOIN fuzzym f ON f.qid = e.qid AND f.concept = e.concept
          JOIN cranked r ON r.concept = e.concept),
        kept3 AS (
          SELECT *, match0 + 0.2 * rscore AS final,
                 row_number() OVER (PARTITION BY qid
                     ORDER BY match0 + 0.2 * rscore DESC, concept) - 1
                     AS rank
          FROM scored WHERE match0 > 0.0 OR exact > 0.0)
        SELECT c.query, k.rank, k.concept,
               round(k.final, 4) AS match_score,
               round(k.exact, 4) AS exact_score,
               round(k.fuzzy, 4) AS fuzzy_score,
               k.matched AS matched_tokens
        FROM kept3 k JOIN cq c USING (qid)
        WHERE k.rank < 20
    """
def _weight_fold_exprs() -> tuple[str, str, str]:
    """Symbolic expansion of the three sequential boost+normalize steps
    (relevance, faithfulness, conciseness — each +0.05 then /sum), with
    the same left-associative addition order as the engine."""
    wr, wf, wc = "wr", "wf", "wc"
    for name in ("r", "f", "c"):
        if name == "r":
            br, bf, bc = f"(({wr}) + 0.05)", f"({wf})", f"({wc})"
        elif name == "f":
            br, bf, bc = f"({wr})", f"(({wf}) + 0.05)", f"({wc})"
        else:
            br, bf, bc = f"({wr})", f"({wf})", f"(({wc}) + 0.05)"
        s = f"(({br}) + ({bf}) + ({bc}))"
        wr, wf, wc = (f"(({br}) / {s})", f"(({bf}) / {s})",
                      f"(({bc}) / {s})")
    return wr, wf, wc


def weight_opt_history_sql() -> str:
    """graph_weight_optimizer.rs replay: heuristic metrics from the kgx
    canon/edge expectations (flat across iterations — the reference's
    adjust step is a placeholder, so the zero slopes trigger all three
    stagnation boosts every post-window iteration), the sequential
    boost+renormalize weight recursion, and the pre-boost combined score
    per step."""
    from .stages.weight_optimizer import WEIGHT_TEST_QUERIES
    vals = ", ".join(
        f"({i}, '{_esc(t['query'])}', '{_esc(t['expected_answer'])}', "
        f"{t['weight']})"
        for i, t in enumerate(WEIGHT_TEST_QUERIES))
    er, ef, ec = _weight_fold_exprs()
    return f"""
        WITH RECURSIVE {_corpus_cte()},
        wq(qid, query, answer, w) AS (VALUES {vals}),
        qt AS (
          SELECT qid, unnest(list_filter(string_split_regex(lower(query),
                     '\\s+'), x -> length(x) > 2)) AS tok
          FROM wq),
        at2 AS (
          SELECT qid, unnest(list_filter(string_split_regex(lower(answer),
                     '\\s+'), x -> x <> '')) AS tok
          FROM wq),
        gsz AS (
          SELECT (SELECT count(*) FROM canon) AS n_ents,
                 (SELECT count(*) FROM kgx_edge_agg) AS n_rels),
        rel1 AS (
          SELECT q.qid,
                 count(*) FILTER (EXISTS (
                     SELECT 1 FROM qt
                     WHERE qt.qid = q.qid
                       AND strpos(lower(c.canonical_name), qt.tok) > 0))
                     AS matching
          FROM wq q CROSS JOIN canon c GROUP BY q.qid),
        metr AS (
          SELECT q.qid, q.w,
                 LEAST(r.matching::DOUBLE
                       / LEAST(g.n_ents, 10), 1.0) AS relevance,
                 (SELECT count(*) FILTER (
                      EXISTS (SELECT 1 FROM canon c
                              WHERE strpos(lower(c.canonical_name),
                                           a.tok) > 0
                                 OR strpos(lower(c.entity_type),
                                           a.tok) > 0)
                      OR EXISTS (SELECT 1 FROM kgx_edge_agg e
                                 WHERE strpos(lower(e.rel_type),
                                              a.tok) > 0))::DOUBLE
                      / count(*)
                  FROM at2 a WHERE a.qid = q.qid) AS faithfulness,
                 0.5 * 0.7
                 + (1.0 - LEAST(g.n_rels / 100.0, 1.0)) * 0.3
                     AS conciseness
          FROM wq q JOIN rel1 r USING (qid) CROSS JOIN gsz g),
        flat AS (
          SELECT sum(relevance * w) / sum(w) AS r,
                 sum(faithfulness * w) / sum(w) AS f,
                 sum(conciseness * w) / sum(w) AS c
          FROM metr),
        wrec(it, wr, wf, wc) AS (
          SELECT 0, 0.4::DOUBLE, 0.4::DOUBLE, 0.2::DOUBLE
          UNION ALL
          SELECT it + 1,
                 CASE WHEN it >= 3 THEN {er} ELSE wr END,
                 CASE WHEN it >= 3 THEN {ef} ELSE wf END,
                 CASE WHEN it >= 3 THEN {ec} ELSE wc END
          FROM wrec WHERE it < 19)
        SELECT w.it AS iteration,
               round(f2.r, 4) AS relevance,
               round(f2.f, 4) AS faithfulness,
               round(f2.c, 4) AS conciseness,
               round(f2.r * w.wr + f2.f * w.wf + f2.c * w.wc, 4)
                   AS combined,
               round(w.wr, 4) AS w_relevance,
               round(w.wf, 4) AS w_faithfulness,
               round(w.wc, 4) AS w_conciseness
        FROM wrec w CROSS JOIN flat f2
    """


def inferred_relations_sql() -> str:
    """inference.rs replay over the kgx expectations: per-chunk evidence
    (0.2 base + word-proximity buckets + the full friendship/negative
    pattern sweep with ±100-char context windows + family damping,
    clamped), chunk-normalized, 0.3 floor, top-10 per target (ties
    pinned target-id ASC)."""
    from .stages.inference import (FAMILY_PATTERNS, FRIENDSHIP_PATTERNS,
                                   INFER_TARGETS, NEGATIVE_PATTERNS)
    targets = ", ".join(f"('{_esc(t)}', '{_esc(r)}')"
                        for t, r in INFER_TARGETS)

    def near(p):
        pe = _esc(p)
        return (f"(strpos(dc.na, '') >= 0 AND "
                f"strpos(substr(dc.tl, GREATEST(strpos(dc.tl, '{pe}') "
                f"- 100, 1), LEAST(strpos(dc.tl, '{pe}') - 1 "
                f"+ {len(p)} + 100, length(dc.tl)) "
                f"- GREATEST(strpos(dc.tl, '{pe}') - 100, 1) + 1), dc.na)"
                f" > 0 AND "
                f"strpos(substr(dc.tl, GREATEST(strpos(dc.tl, '{pe}') "
                f"- 100, 1), LEAST(strpos(dc.tl, '{pe}') - 1 "
                f"+ {len(p)} + 100, length(dc.tl)) "
                f"- GREATEST(strpos(dc.tl, '{pe}') - 100, 1) + 1), dc.nb)"
                f" > 0)")

    fterms = " + ".join(
        f"(CASE WHEN strpos(dc.tl, '{_esc(p)}') > 0 THEN "
        f"CASE WHEN {near(p)} THEN {w} * 0.5 ELSE {w} * 0.3 END "
        f"ELSE 0.0 END)"
        for p, w in FRIENDSHIP_PATTERNS)
    nterms = " + ".join(
        f"(CASE WHEN strpos(dc.tl, '{_esc(p)}') > 0 THEN "
        f"CASE WHEN {near(p)} THEN ({w}) * 1.2 ELSE ({w}) * 0.8 END "
        f"ELSE 0.0 END)"
        for p, w in NEGATIVE_PATTERNS)
    fam = " OR ".join(f"strpos(dc.tl, '{p}') > 0"
                      for p in FAMILY_PATTERNS)
    return f"""
        WITH {_corpus_cte()},
        tgt(target_id, rel) AS (VALUES {targets}),
        docent AS (
          SELECT DISTINCT doc_id,
                 entity_type || '_' || lower(replace(name, ' ', ''))
                     AS cid
          FROM ents_raw),
        dtext AS (SELECT doc_id, lower(s) AS tl FROM kgx_docs),
        tchunks AS (
          SELECT t.target_id, t.rel, d.doc_id
          FROM tgt t JOIN docent d ON d.cid = t.target_id),
        tcount AS (
          SELECT target_id, count(*) AS n FROM tchunks
          GROUP BY target_id),
        pairs4 AS (
          SELECT tc.target_id, tc.rel, tc.doc_id, o.cid AS other,
                 x.tl,
                 lower(replace(split_part(tc.target_id, '_', 2), '_', ' '))
                     AS na,
                 lower(replace(split_part(o.cid, '_', 2), '_', ' '))
                     AS nb
          FROM tchunks tc
          JOIN docent o ON o.doc_id = tc.doc_id
            AND o.cid <> tc.target_id
          JOIN dtext x ON x.doc_id = tc.doc_id),
        wordsp AS (
          SELECT p.target_id, p.doc_id, p.other,
                 min(abs(ia.i - ib.i)) AS dist
          FROM pairs4 p
          JOIN LATERAL (
            SELECT t.i FROM unnest(range(1,
                len(string_split(p.tl, ' ')) + 1)) t(i)
            WHERE strpos(lower(string_split(p.tl, ' ')[t.i]), p.na) > 0
          ) ia ON TRUE
          JOIN LATERAL (
            SELECT t.i FROM unnest(range(1,
                len(string_split(p.tl, ' ')) + 1)) t(i)
            WHERE strpos(lower(string_split(p.tl, ' ')[t.i]), p.nb) > 0
          ) ib ON TRUE
          GROUP BY p.target_id, p.doc_id, p.other),
        evid AS (
          SELECT dc.target_id, dc.rel, dc.doc_id, dc.other,
                 LEAST(GREATEST(
                   (0.2
                    + CASE WHEN w.dist IS NULL THEN 0.0
                           WHEN w.dist <= 2 THEN 0.4
                           WHEN w.dist <= 5 THEN 0.3
                           WHEN w.dist <= 10 THEN 0.2
                           WHEN w.dist <= 20 THEN 0.1
                           ELSE 0.05 END
                    + {fterms}
                    + {nterms})
                   * CASE WHEN {fam} THEN 0.8 ELSE 1.0 END,
                   0.0), 1.0) AS score
          FROM pairs4 dc
          LEFT JOIN wordsp w ON w.target_id = dc.target_id
            AND w.doc_id = dc.doc_id AND w.other = dc.other),
        agg2 AS (
          SELECT e.target_id, e.rel, e.other,
                 LEAST(sum(e.score) / any_value(tc.n), 1.0) AS conf,
                 any_value(tc.n) AS n
          FROM evid e JOIN tcount tc USING (target_id)
          GROUP BY e.target_id, e.rel, e.other),
        ranked4 AS (
          SELECT *, row_number() OVER (PARTITION BY target_id
                        ORDER BY conf DESC, other) AS rn
          FROM agg2 WHERE conf >= 0.05)
        SELECT target_id AS source, other AS target,
               rel AS relation_type, round(conf, 4) AS confidence,
               n::BIGINT AS evidence_count
        FROM ranked4 WHERE rn <= 10
    """


def _lazy_base_ctes() -> str:
    """Shared lazy-search base CTEs (appended after _concept_cte): the 5
    fixture queries, query-side concept extraction with the SAME rules as
    the corpus extraction replay, concept frequencies, co-occurrence
    pairs, round-4-Jaccard-ranked outgoing relations, and the normalized
    concept->chunk index. Used by ids_search_depths_sql and
    query_refine_sql."""
    from .stages.concept_graph import STOPWORDS
    from .stages.concept_select import CONCEPT_QUERIES

    stops = ", ".join(f"'{w}'" for w in sorted(STOPWORDS))
    cap = r"[A-Z][a-z]+(?:\s+[A-Z][a-z]+)+"
    noun = r"[A-Z][a-z]+(?:\s+[A-Z]?[a-z]+){1,4}"
    qvals = ", ".join(f"('{_esc(q)}')" for q in CONCEPT_QUERIES)
    return f"""iq(q) AS (VALUES {qvals}),
        qphr AS (
          SELECT q, unnest(regexp_extract_all(q, '\\b{cap}\\b')) AS c
          FROM iq
          UNION ALL
          SELECT q, unnest(regexp_extract_all(q, '\\b{noun}\\b')) AS c
          FROM iq),
        qphrv AS (
          SELECT q, c FROM qphr
          WHERE length(c) >= 3
            AND len(string_split(c, ' ')) <= 5
            AND len(list_filter(string_split(c, ' '),
                    w -> list_contains([{stops}], lower(w))))
                <= len(string_split(c, ' ')) // 2),
        qkwraw AS (
          SELECT q,
                 regexp_replace(regexp_replace(lower(w.w),
                     '^[^a-z0-9]+', ''), '[^a-z0-9]+$', '') AS nw
          FROM iq,
          LATERAL unnest(list_filter(string_split_regex(q, '\\s+'),
                                     x -> x <> '')) w(w)),
        qkwtop AS (
          SELECT q, nw AS c
          FROM (SELECT *, row_number() OVER (PARTITION BY q
                            ORDER BY f DESC, nw) AS rn
                FROM (SELECT q, nw, count(*) AS f FROM qkwraw
                      WHERE length(nw) >= 3 AND nw NOT IN ({stops})
                      GROUP BY q, nw))
          WHERE rn <= 20 AND f >= 2),
        qcon AS (
          SELECT DISTINCT q, c FROM (
            SELECT q, c FROM qphrv UNION ALL SELECT q, c FROM qkwtop)),
        conm AS MATERIALIZED (SELECT doc_id, c FROM con),
        cfreq AS MATERIALIZED (
          SELECT c, count(*)::BIGINT AS f FROM conm GROUP BY c),
        cpr AS MATERIALIZED (
          SELECT a.c AS source, b.c AS target, count(*) AS cnt
          FROM conm a JOIN conm b ON a.doc_id = b.doc_id AND a.c < b.c
          GROUP BY a.c, b.c),
        cpairs AS MATERIALIZED (SELECT source AS a, target AS b FROM cpr),
        erank AS MATERIALIZED (
          SELECT p.source, p.target,
                 row_number() OVER (
                     PARTITION BY p.source
                     ORDER BY round(p.cnt::DOUBLE
                                    / (ta.f + tb.f - p.cnt), 4) DESC,
                              p.target) AS rn
          FROM cpr p
          JOIN cfreq ta ON ta.c = p.source
          JOIN cfreq tb ON tb.c = p.target),
        cchunks AS MATERIALIZED (
          SELECT DISTINCT
                 regexp_replace(lower(c), '[^a-z0-9_]', '', 'g') AS cn,
                 doc_id AS chunk
          FROM conm),"""


def ids_search_depths_sql() -> str:
    """Iterative-deepening search replay (iterative_deepening.rs:112-215
    as transcribed by stages/lazy_search.ids_search): per query, initial
    concepts = the SAME extraction rules as _concept_cte applied to the
    query string; then ≤3 unrolled depth blocks. Within a depth the
    current set is STABLE (expansion admits after scoring), so each depth
    is pure set algebra: visited-after-depth-d equals the chunk set of
    cur_d (current only grows), new_chunks_d = |chunks(cur_d)| -
    |chunks(cur_{d-1})|; expansion candidates are each current concept's
    top-5 outgoing relations by (round-4 Jaccard DESC, target ASC) —
    the exact confidences the ConceptGraphView is fed by concept_edges —
    scored sum-per-occurrence of (ln(freq)+1)*(1+0.5*connections), top-5
    by (score DESC, name ASC). Stop logic (checked after the depth row,
    including at the last depth): >=50 chunks -> max_chunks_reached;
    empty expansion -> no_more_concepts; else max_depth_reached, with
    total_concepts counting the depth-2 admissions. Floats only steer the
    top-5 selection; the surfaced columns are integers and strings."""
    from .stages.concept_graph import STOPWORDS
    from .stages.concept_select import CONCEPT_QUERIES

    stops = ", ".join(f"'{w}'" for w in sorted(STOPWORDS))
    cap = r"[A-Z][a-z]+(?:\s+[A-Z][a-z]+)+"
    noun = r"[A-Z][a-z]+(?:\s+[A-Z]?[a-z]+){1,4}"
    qvals = ", ".join(f"('{_esc(q)}')" for q in CONCEPT_QUERIES)

    blocks = []
    for d in range(3):
        prev_fnd = (f"coalesce((SELECT count(*) FROM fnd{d - 1} f2 "
                    f"WHERE f2.q = a.q), 0)" if d else "0")
        blocks.append(f"""
    fnd{d} AS MATERIALIZED (
      SELECT DISTINCT k.q, ch.chunk
      FROM cur{d} k JOIN cchunks ch
        ON ch.cn = regexp_replace(lower(k.c), '[^a-z0-9_]', '', 'g')
    ),
    dep{d} AS (
      SELECT a.q, {d} AS depth,
             (SELECT count(*) FROM cur{d} k WHERE k.q = a.q)
                 AS concepts_explored,
             coalesce((SELECT count(*) FROM fnd{d} f WHERE f.q = a.q), 0)
                 - {prev_fnd} AS new_chunks_found
      FROM alive{d} a
    ),
    stopc{d} AS MATERIALIZED (
      SELECT a.q FROM alive{d} a
      WHERE (SELECT count(*) FROM fnd{d} f WHERE f.q = a.q) >= 50
    ),
    go{d} AS MATERIALIZED (SELECT q FROM alive{d} EXCEPT SELECT q FROM stopc{d}),
    cand{d} AS (
      -- one row PER (current concept -> related) occurrence: score sums
      -- the relevance once per suggesting concept (ids_search's +=)
      SELECT k.q, e.target AS rel
      FROM cur{d} k
      JOIN go{d} g ON g.q = k.q
      JOIN erank e ON e.source = k.c AND e.rn <= 5
      WHERE NOT EXISTS (SELECT 1 FROM cur{d} k2
                        WHERE k2.q = k.q AND k2.c = e.target)
    ),
    conn{d} AS (
      SELECT c.q, c.rel, count(*) AS nconn
      FROM (SELECT DISTINCT q, rel FROM cand{d}) c
      JOIN cur{d} k ON k.q = c.q
      JOIN cpairs p ON (p.a = c.rel AND p.b = k.c)
                    OR (p.a = k.c AND p.b = c.rel)
      GROUP BY c.q, c.rel
    ),
    sc{d} AS (
      SELECT c.q, c.rel,
             sum(CASE WHEN f.f IS NULL THEN 0.0
                 ELSE (ln(f.f) + 1.0)
                      * (1.0 + coalesce(n.nconn, 0) * 0.5) END) AS score
      FROM cand{d} c
      LEFT JOIN cfreq f ON f.c = c.rel
      LEFT JOIN conn{d} n ON n.q = c.q AND n.rel = c.rel
      GROUP BY c.q, c.rel
    ),
    exp{d} AS MATERIALIZED (
      SELECT q, rel FROM (
        SELECT s.q, s.rel,
               row_number() OVER (PARTITION BY s.q
                                  ORDER BY s.score DESC, s.rel) AS rn
        FROM sc{d} s) WHERE rn <= 5
    ),
    stopn{d} AS MATERIALIZED (
      SELECT g.q FROM go{d} g
      WHERE NOT EXISTS (SELECT 1 FROM exp{d} e WHERE e.q = g.q)
    ),
    alive{d + 1} AS MATERIALIZED (SELECT q FROM go{d} EXCEPT SELECT q FROM stopn{d}),
    cur{d + 1} AS MATERIALIZED (
      SELECT k.q, k.c FROM cur{d} k JOIN alive{d + 1} a ON a.q = k.q
      UNION
      SELECT e.q, e.rel FROM exp{d} e JOIN alive{d + 1} a ON a.q = e.q
    )""")

    depth_blocks = ",".join(blocks)
    return f"""
        WITH {_corpus_cte()},
        {_concept_cte()},
        {_lazy_base_ctes()}
        alive0 AS MATERIALIZED (SELECT DISTINCT q FROM qcon),
        cur0 AS MATERIALIZED (SELECT q, c FROM qcon),
        {depth_blocks},
        fin AS (
          -- summary row per query (depth -1): stop reason + end totals
          SELECT i.q,
                 CASE WHEN a0.q IS NULL THEN 'max_depth_reached'
                      WHEN EXISTS (SELECT 1 FROM stopc0 WHERE q = i.q)
                        OR EXISTS (SELECT 1 FROM stopc1 WHERE q = i.q)
                        OR EXISTS (SELECT 1 FROM stopc2 WHERE q = i.q)
                      THEN 'max_chunks_reached'
                      WHEN EXISTS (SELECT 1 FROM stopn0 WHERE q = i.q)
                        OR EXISTS (SELECT 1 FROM stopn1 WHERE q = i.q)
                        OR EXISTS (SELECT 1 FROM stopn2 WHERE q = i.q)
                      THEN 'no_more_concepts'
                      ELSE 'max_depth_reached' END AS stop_reason,
                 CASE WHEN a0.q IS NULL THEN 0
                      WHEN EXISTS (SELECT 1 FROM alive3 WHERE q = i.q)
                      THEN (SELECT count(*) FROM cur3 k WHERE k.q = i.q)
                      WHEN EXISTS (SELECT 1 FROM alive2 WHERE q = i.q)
                      THEN (SELECT count(*) FROM cur2 k WHERE k.q = i.q)
                      WHEN EXISTS (SELECT 1 FROM alive1 WHERE q = i.q)
                      THEN (SELECT count(*) FROM cur1 k WHERE k.q = i.q)
                      ELSE (SELECT count(*) FROM cur0 k WHERE k.q = i.q)
                      END AS total_concepts,
                 CASE WHEN a0.q IS NULL THEN 0
                      WHEN EXISTS (SELECT 1 FROM alive2 WHERE q = i.q)
                      THEN (SELECT count(*) FROM fnd2 f WHERE f.q = i.q)
                      WHEN EXISTS (SELECT 1 FROM alive1 WHERE q = i.q)
                      THEN (SELECT count(*) FROM fnd1 f WHERE f.q = i.q)
                      ELSE coalesce((SELECT count(*) FROM fnd0 f
                                     WHERE f.q = i.q), 0)
                      END AS total_chunks
          FROM iq i LEFT JOIN alive0 a0 ON a0.q = i.q
        )
        SELECT q AS query, depth::INT AS depth,
               concepts_explored::BIGINT AS concepts_explored,
               new_chunks_found::BIGINT AS new_chunks_found,
               '' AS stop_reason
        FROM (SELECT * FROM dep0 UNION ALL SELECT * FROM dep1
              UNION ALL SELECT * FROM dep2)
        UNION ALL
        SELECT q, -1::INT, total_concepts::BIGINT, total_chunks::BIGINT,
               stop_reason
        FROM fin
    """


def query_refine_sql() -> str:
    """Query-refinement replay (query_refinement.rs:104-301 as transcribed
    by stages/lazy_search.refine_query): the expansion loop admits
    concepts INTO the live set mid-iteration (the size cap and the
    connection counts both see earlier admissions), so the replay is a
    recursive CTE advancing ONE candidate event per step — event (iter,
    ci, ri) evaluates snapshot concept ci's ri-th strongest outgoing
    relation against the LIVE current list carried in the state. At each
    iteration boundary: break when the iteration admitted nothing; else
    (iterations 0,1) apply relevance feedback — every score multiplied by
    1+ln(#relevant chunks containing the concept), relevant = chunks of
    all expanded concepts so far — then re-snapshot sorted(current).
    Terminal state per query = arg_max(step); initial rows print score
    1.0, expanded rows the final fed-back relevance, both with
    n_chunks = |chunks(expanded)|. Scores are float64 with the same
    operation order as the Python (sum-free: products and ln only), so
    round-4 comparison is exact."""
    norm = "regexp_replace(lower({x}), '[^a-z0-9_]', '', 'g')"
    cmap_lookup = ("coalesce(list_filter(gq.cmap, e -> e.k = "
                   + norm.format(x="{c}") + ")[1].v, [])")
    freq_of = ("list_sum(list_transform(s2.relevant, ch -> CASE WHEN "
               "list_contains(coalesce(list_filter(gq.ccmap, "
               "e2 -> e2.k = ch)[1].v, []), sc.c) THEN 1 ELSE 0 END))")
    return f"""
        WITH RECURSIVE {_corpus_cte()},
        {_concept_cte()},
        {_lazy_base_ctes()}
        top5 AS MATERIALIZED (
          SELECT source, list(target ORDER BY rn) AS ts
          FROM erank WHERE rn <= 5 GROUP BY source),
        prt AS MATERIALIZED (
          SELECT c, list(p) AS ps FROM (
            SELECT source AS c, target AS p FROM cpr
            UNION ALL SELECT target, source FROM cpr)
          GROUP BY c),
        gq AS MATERIALIZED (
          SELECT
            (SELECT list({{'k': cn, 'v': chs}}) FROM (
                SELECT cn, list(chunk ORDER BY chunk) AS chs
                FROM cchunks GROUP BY cn)) AS cmap,
            (SELECT list({{'k': chunk, 'v': cons}}) FROM (
                SELECT doc_id AS chunk, list(DISTINCT c) AS cons
                FROM conm GROUP BY doc_id)) AS ccmap),
        qinit AS (SELECT q, list(c ORDER BY c) AS init
                  FROM qcon GROUP BY q),
        rwalk(q, step, iter, ci, ri, fin, cur, snap, scores, expanded,
              nexp0) AS (
            SELECT q, 0::BIGINT, 0::BIGINT, 1::BIGINT, 1::BIGINT, FALSE,
                   init, init,
                   list_transform(init, c -> {{'c': c, 'v': 1.0::DOUBLE}}),
                   CAST([] AS VARCHAR[]), 0::BIGINT
            FROM qinit
            UNION ALL
            SELECT s3.q, s3.step + 1,
                   CASE WHEN s3.advance_iter THEN s3.iter + 1
                        ELSE s3.iter END,
                   CASE WHEN s3.advance_iter THEN 1
                        WHEN s3.last_event THEN s3.ci
                        WHEN s3.ri < 5 THEN s3.ci ELSE s3.ci + 1 END,
                   CASE WHEN s3.advance_iter THEN 1
                        WHEN s3.last_event THEN s3.ri
                        WHEN s3.ri < 5 THEN s3.ri + 1 ELSE 1 END,
                   s3.new_fin,
                   s3.new_cur,
                   CASE WHEN s3.advance_iter THEN list_sort(s3.new_cur)
                        ELSE s3.snap END,
                   CASE WHEN s3.do_feedback THEN s3.fb_scores
                        ELSE s3.new_scores END,
                   s3.new_exp,
                   CASE WHEN s3.advance_iter THEN length(s3.new_exp)
                        ELSE s3.nexp0 END
            FROM (
              SELECT s2.*,
                     -- iteration boundary bookkeeping
                     (s2.last_event AND s2.any_new AND s2.iter < 2)
                         AS advance_iter,
                     (s2.last_event AND (NOT s2.any_new OR s2.iter = 2))
                         AS new_fin,
                     (s2.last_event AND s2.any_new AND s2.iter < 2)
                         AS do_feedback,
                     list_transform(s2.new_scores, sc -> {{'c': sc.c,
                         'v': sc.v * (CASE WHEN {freq_of} > 0
                                      THEN 1.0 + ln(({freq_of})::DOUBLE)
                                      ELSE 1.0 END)}}) AS fb_scores
              FROM (
                SELECT s1.*,
                       CASE WHEN s1.admit THEN s1.cur || [s1.related]
                            ELSE s1.cur END AS new_cur,
                       CASE WHEN s1.admit THEN s1.scores
                                || [{{'c': s1.related, 'v': s1.relevance}}]
                            ELSE s1.scores END AS new_scores,
                       CASE WHEN s1.admit
                            THEN s1.expanded || [s1.related]
                            ELSE s1.expanded END AS new_exp,
                       (s1.ci = length(s1.snap) AND s1.ri = 5)
                           AS last_event,
                       length(CASE WHEN s1.admit
                                   THEN s1.expanded || [s1.related]
                                   ELSE s1.expanded END) > s1.nexp0
                           AS any_new,
                       list_distinct(flatten(list_transform(
                           CASE WHEN s1.admit
                                THEN s1.expanded || [s1.related]
                                ELSE s1.expanded END,
                           c -> {cmap_lookup.format(c='c')}))) AS relevant
                FROM (
                  SELECT w.q, w.step, w.iter, w.ci, w.ri, w.cur, w.snap,
                         w.scores, w.expanded, w.nexp0,
                         t.ts[w.ri] AS related,
                         CASE WHEN f.f IS NULL THEN 0.0
                              ELSE (ln(f.f) + 1.0) * (1.0
                                   + length(list_filter(w.cur, x ->
                                       list_contains(pt.ps, x))) * 0.5)
                         END AS relevance,
                         (t.ts[w.ri] IS NOT NULL
                          AND NOT list_contains(w.cur, t.ts[w.ri])
                          AND length(w.cur) < 20
                          AND f.f IS NOT NULL
                          AND CASE WHEN f.f IS NULL THEN 0.0
                              ELSE (ln(f.f) + 1.0) * (1.0
                                   + length(list_filter(w.cur, x ->
                                       list_contains(pt.ps, x))) * 0.5)
                              END > 0.0) AS admit
                  FROM rwalk w
                  LEFT JOIN top5 t ON t.source = w.snap[w.ci]
                  LEFT JOIN cfreq f ON f.c = t.ts[w.ri]
                  LEFT JOIN prt pt ON pt.c = t.ts[w.ri]
                  WHERE NOT w.fin
                ) s1
                CROSS JOIN gq
              ) s2
              CROSS JOIN gq
            ) s3
        ),
        rfin AS (
          SELECT q, arg_max({{'scores': scores, 'expanded': expanded}},
                            step) AS st
          FROM rwalk GROUP BY q),
        rcalc AS (
          SELECT r.q, r.st.expanded AS expanded, r.st.scores AS scores,
                 length(list_distinct(flatten(list_transform(
                     r.st.expanded,
                     c -> {cmap_lookup.format(c='c')}))))::BIGINT
                     AS n_chunks
          FROM rfin r CROSS JOIN gq)
        SELECT qc.q AS query, 'initial' AS kind, qc.c AS concept,
               1.0::DOUBLE AS score, rc.n_chunks
        FROM qcon qc JOIN rcalc rc ON rc.q = qc.q
        UNION ALL
        SELECT rc.q, 'expanded', e.c,
               round(list_filter(rc.scores, sc -> sc.c = e.c)[1].v, 4),
               rc.n_chunks
        FROM rcalc rc, LATERAL unnest(rc.expanded) e(c)
    """
