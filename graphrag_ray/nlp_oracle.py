"""DuckDB oracle twins for the NLP surfaces (nlp_pos,
nlp_noun_phrases, nlp_dependencies, ner_custom).

Replays nlp/syntax_analyzer.rs's tokenizer (char-class runs + single-char
punctuation, positions recovered by an in-order scan), the dictionary
POS cascade with its precedence quirks, lemmatization, the first-match
dependency heuristic, DET/ADJ/NOUN-run noun-phrase islands, and
custom_ner.rs's seven rule kinds with the greedy overlap resolution
(a per-document recursive scan, as the kept-set is order-dependent).

Char-level NER rules (exact / regex / dictionary) are replayed at
occurrence 1 only — the kgx templates place each matched string at most
once per sentence (tests/test_nlp.py asserts this stays true).
"""

from __future__ import annotations

from .kgx import _corpus_cte
from .stages.nlp import NER_DICTIONARIES, NER_RULES, POS_DICTS

# NB: apostrophes doubled for embedding in a SQL string literal
_TOKEN_RE = r"[A-Za-z0-9''\-]+|[^\sA-Za-z0-9''\-]"


def _lit(words) -> str:
    return ", ".join("'" + w.replace("'", "''") + "'" for w in sorted(words))


def _pos_case() -> str:
    """tag_word cascade (syntax_analyzer.rs:245-321)."""
    dict_branches = "\n".join(
        f"       WHEN lower(tok) IN ({_lit(words)}) THEN '{tag}'"
        for tag, words in POS_DICTS)
    return f"""
  CASE WHEN regexp_matches(tok, '^[!-/:-@\\[-`{{-~]+$') THEN 'punctuation'
       WHEN regexp_matches(tok, '^[0-9]+$') THEN 'number'
{dict_branches}
       WHEN substr(tok, 1, 1) BETWEEN 'A' AND 'Z' THEN 'proper_noun'
       WHEN lower(tok) LIKE '%ing' THEN 'verb_gerund'
       WHEN lower(tok) LIKE '%ed' THEN 'verb_past'
       WHEN lower(tok) LIKE '%s' AND lower(tok) NOT LIKE '%ss'
           THEN 'noun_plural'
       WHEN lower(tok) LIKE '%ive' OR lower(tok) LIKE '%ous'
           OR lower(tok) LIKE '%ful' THEN 'adjective'
       WHEN lower(tok) LIKE '%ly' THEN 'adverb'
       ELSE 'noun' END
"""


_LEMMA_CASE = """
  CASE WHEN pos = 'noun_plural' THEN
         CASE WHEN lower(tok) LIKE '%ies'
                THEN substr(lower(tok), 1, length(tok) - 3) || 'y'
              WHEN lower(tok) LIKE '%s' AND lower(tok) NOT LIKE '%ss'
                THEN substr(lower(tok), 1, length(tok) - 1)
              ELSE lower(tok) END
       WHEN pos IN ('verb_past', 'verb_3rd_sing') THEN
         CASE WHEN lower(tok) LIKE '%ed'
                THEN substr(lower(tok), 1, length(tok) - 2)
              WHEN lower(tok) LIKE '%s'
                THEN substr(lower(tok), 1, length(tok) - 1)
              ELSE lower(tok) END
       WHEN pos = 'verb_gerund' THEN
         CASE WHEN lower(tok) LIKE '%ing'
                THEN substr(lower(tok), 1, length(tok) - 3)
              ELSE lower(tok) END
       ELSE lower(tok) END
"""


def _token_cte() -> str:
    """toks(doc_id, idx, tok, position, pos, lemma) with positions from a
    per-doc recursive in-order scan (between-token chars are whitespace
    only, so the next occurrence from the previous end IS the token)."""
    return f"""
    tlist AS (
      SELECT doc_id, s,
             regexp_extract_all(s, '{_TOKEN_RE}') AS ts
      FROM kgx_docs),
    tpos AS (
      SELECT doc_id, 0 AS k, 0 AS nxt, '' AS tok, 0 AS position
      FROM tlist
      UNION ALL
      SELECT p.doc_id, p.k + 1,
             p.nxt + strpos(substr(t.s, p.nxt + 1), t.ts[p.k + 1]) - 1
               + length(t.ts[p.k + 1]),
             t.ts[p.k + 1],
             p.nxt + strpos(substr(t.s, p.nxt + 1), t.ts[p.k + 1]) - 1
      FROM tpos p JOIN tlist t USING (doc_id)
      WHERE p.k < len(t.ts)),
    toks0 AS (
      SELECT doc_id, k - 1 AS idx, tok, position FROM tpos WHERE k > 0),
    toks AS (
      SELECT doc_id, idx, tok, position, pos, {_LEMMA_CASE} AS lemma
      FROM (SELECT *, {_pos_case()} AS pos FROM toks0))
    """


def nlp_pos_sql() -> str:
    return f"""
        WITH RECURSIVE {_corpus_cte()},
        {_token_cte()}
        SELECT doc_id, idx, tok AS token, position::BIGINT AS position,
               pos, lemma
        FROM toks
    """


def nlp_noun_phrases_sql() -> str:
    return f"""
        WITH RECURSIVE {_corpus_cte()},
        {_token_cte()},
        np AS (
          SELECT doc_id, idx, tok, pos,
                 pos IN ('determiner', 'adjective', 'noun', 'proper_noun',
                         'noun_plural', 'proper_noun_plural') AS in_np,
                 pos IN ('noun', 'proper_noun', 'noun_plural',
                         'proper_noun_plural') AS nounish
          FROM toks),
        isl AS (
          SELECT *, idx - row_number() OVER (PARTITION BY doc_id
                        ORDER BY idx) AS grp
          FROM np WHERE in_np),
        withrn AS (
          SELECT *, row_number() OVER (PARTITION BY doc_id, grp
                        ORDER BY idx) - 1 AS rn
          FROM isl),
        agg AS (
          SELECT doc_id, grp, min(idx) AS start_idx,
                 string_agg(tok, ' ' ORDER BY idx) AS text,
                 coalesce(max(rn) FILTER (nounish), 0) AS head_idx
          FROM withrn GROUP BY doc_id, grp)
        SELECT doc_id,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY start_idx) - 1 AS phrase_idx,
               text, head_idx
        FROM agg
    """


def nlp_dependencies_sql() -> str:
    return f"""
        WITH RECURSIVE {_corpus_cte()},
        {_token_cte()},
        roots AS (
          SELECT t.doc_id,
                 coalesce(min(idx) FILTER (pos IN ('verb', 'verb_past',
                     'verb_3rd_sing')), 0) AS root,
                 min(idx) FILTER (pos IN ('verb', 'verb_past',
                     'verb_3rd_sing')) AS first_verb
          FROM toks t GROUP BY t.doc_id),
        deps AS (
          -- subject: first noun/proper/pronoun before the root
          SELECT r.doc_id, r.root AS head,
                 min(t.idx) AS dependent, 'subject' AS relation
          FROM roots r JOIN toks t USING (doc_id)
          WHERE t.idx < r.root
            AND t.pos IN ('noun', 'proper_noun', 'pronoun')
          GROUP BY r.doc_id, r.root
          UNION ALL
          -- direct object: first noun/proper after the root
          SELECT r.doc_id, r.root, min(t.idx), 'direct_object'
          FROM roots r JOIN toks t USING (doc_id)
          WHERE t.idx > r.root AND t.pos IN ('noun', 'proper_noun')
          GROUP BY r.doc_id, r.root
          UNION ALL
          -- adjective/determiner → next noun/proper
          SELECT a.doc_id,
                 (SELECT min(n.idx) FROM toks n
                  WHERE n.doc_id = a.doc_id AND n.idx > a.idx
                    AND n.pos IN ('noun', 'proper_noun')),
                 a.idx,
                 CASE a.pos WHEN 'adjective' THEN 'modifier'
                      ELSE 'determiner' END
          FROM toks a
          WHERE a.pos IN ('adjective', 'determiner')
            AND EXISTS (SELECT 1 FROM toks n
                        WHERE n.doc_id = a.doc_id AND n.idx > a.idx
                          AND n.pos IN ('noun', 'proper_noun'))
          UNION ALL
          -- adverb → first verb (only when one exists)
          SELECT a.doc_id, r.first_verb, a.idx, 'modifier'
          FROM toks a JOIN roots r USING (doc_id)
          WHERE a.pos = 'adverb' AND r.first_verb IS NOT NULL)
        SELECT doc_id, head::BIGINT AS head, dependent::BIGINT AS dependent,
               relation
        FROM deps
    """


def ner_custom_sql() -> str:
    """custom_ner.rs replay for the fixed NER_RULES workload."""
    title_entries = ", ".join(
        f"({i}, '{e}')" for i, e in enumerate(NER_DICTIONARIES["TITLE"]))
    # rule indexes for the stable tiebreak
    ridx = {r["name"]: i for i, r in enumerate(NER_RULES)}
    return f"""
        WITH RECURSIVE {_corpus_cte()},
        titles2(ord, entry) AS (VALUES {title_entries}),
        wordsx AS (
          SELECT doc_id, s, u.i AS wi,
                 string_split(s, ' ')[u.i] AS w
          FROM kgx_docs,
          LATERAL unnest(range(1, len(string_split(s, ' ')) + 1)) u(i)),
        wpos AS (
          SELECT doc_id, s, wi, w,
                 coalesce(sum(length(w) + 1) OVER (
                     PARTITION BY doc_id ORDER BY wi
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0)::BIGINT AS pos
          FROM wordsx),
        cand AS (
          -- exact 'tokyo' (occurrence 1; unique per sentence by corpus
          -- construction)
          SELECT doc_id, strpos(lower(s), 'tokyo') - 1 AS start,
                 strpos(lower(s), 'tokyo') + 4 AS fin,
                 substr(s, strpos(lower(s), 'tokyo'), 5) AS text,
                 'LOCATION' AS entity_type, 1.0 AS confidence,
                 'loc_exact' AS rule_name, {ridx['loc_exact']} AS ridx
          FROM kgx_docs WHERE strpos(lower(s), 'tokyo') > 0
          UNION ALL
          -- regex org name
          SELECT doc_id,
                 strpos(s, m) - 1, strpos(s, m) - 1 + length(m), m,
                 'ORGANIZATION', 0.9, 'org_regex', {ridx['org_regex']}
          FROM (SELECT doc_id, s,
                       regexp_extract(s, '[A-Z][a-z]+ (?:Corp|Inc|LLC)')
                           AS m
                FROM kgx_docs)
          WHERE m <> ''
          UNION ALL
          -- prefix 'har'
          SELECT doc_id, pos, pos + length(w), w, 'PERSON', 0.7,
                 'har_prefix', {ridx['har_prefix']}
          FROM wpos WHERE starts_with(lower(w), 'har')
          UNION ALL
          -- suffix 'son'
          SELECT doc_id, pos, pos + length(w), w, 'PERSON', 0.7,
                 'son_suffix', {ridx['son_suffix']}
          FROM wpos WHERE ends_with(lower(w), 'son')
          UNION ALL
          -- contains 'corp'
          SELECT doc_id, pos, pos + length(w), w, 'ORGANIZATION', 0.6,
                 'corp_contains', {ridx['corp_contains']}
          FROM wpos WHERE strpos(lower(w), 'corp') > 0
          UNION ALL
          -- dictionary titles
          SELECT d.doc_id, strpos(lower(d.s), t.entry) - 1,
                 strpos(lower(d.s), t.entry) - 1 + length(t.entry),
                 substr(d.s, strpos(lower(d.s), t.entry),
                        length(t.entry)),
                 'TITLE', 0.95, 'title_dict', {ridx['title_dict']}
          FROM kgx_docs d JOIN titles2 t
            ON strpos(lower(d.s), t.entry) > 0
          UNION ALL
          -- contextual works|for|acme over word triples; position is the
          -- FIRST occurrence of the middle word (reference quirk)
          SELECT w1.doc_id, strpos(w1.s, w1.w) - 1,
                 strpos(w1.s, w1.w) - 1 + length(w1.w), w1.w,
                 'RELATION', 0.85, 'works_ctx', {ridx['works_ctx']}
          FROM wpos w0
          JOIN wpos w1 ON w1.doc_id = w0.doc_id AND w1.wi = w0.wi + 1
          JOIN wpos w2 ON w2.doc_id = w0.doc_id AND w2.wi = w0.wi + 2
          WHERE strpos(lower(w0.w), 'works') > 0
            AND strpos(lower(w1.w), 'for') > 0
            AND strpos(lower(w2.w), 'acme') > 0
            AND strpos(w1.s, w1.w) > 0),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY doc_id
                        ORDER BY start, confidence DESC, ridx) AS rn,
                 count(*) OVER (PARTITION BY doc_id) AS n
          FROM cand),
        -- greedy overlap resolution (custom_ner.rs:356-385): sequential,
        -- so a per-doc recursive scan carrying last_end
        keepr AS (
          SELECT doc_id, 0 AS i, 0::BIGINT AS last_end, FALSE AS kept
          FROM (SELECT DISTINCT doc_id FROM ranked)
          UNION ALL
          SELECT k.doc_id, k.i + 1,
                 CASE WHEN r.start >= k.last_end THEN r.fin
                      ELSE k.last_end END,
                 r.start >= k.last_end
          FROM keepr k JOIN ranked r
            ON r.doc_id = k.doc_id AND r.rn = k.i + 1)
        SELECT r.doc_id, r.start::BIGINT AS start, r.fin::BIGINT AS "end",
               r.text, r.entity_type,
               round(r.confidence, 4) AS confidence, r.rule_name
        FROM ranked r JOIN keepr k
          ON k.doc_id = r.doc_id AND k.i = r.rn AND k.kept
    """


def _lightrag_ent_cte() -> str:
    """graph_indexer.rs entity replay: window-3 capitalized phrases
    (0.6) + single capitalized words >2 chars (0.5), emission-order
    stable dedup per name; the type-guess cascade."""
    type_case = """
      CASE WHEN strpos(lower(name), 'person') > 0 THEN 'person'
           WHEN strpos(lower(name), 'organization') > 0
               THEN 'organization'
           WHEN strpos(lower(name), 'location') > 0 THEN 'location'
           WHEN lower(name) LIKE '%company' OR lower(name) LIKE '%corp'
             OR lower(name) LIKE '%inc' THEN 'organization'
           WHEN strpos(lower(name), 'city') > 0
             OR strpos(lower(name), 'country') > 0
             OR strpos(lower(name), 'state') > 0 THEN 'location'
           WHEN len(string_split(name, ' ')) = 1 AND length(name) < 20
               THEN 'person'
           ELSE 'other' END
"""
    return f"""
    lrw AS (SELECT doc_id, s, lower(s) AS tl,
                   string_split(s, ' ') AS ws
            FROM kgx_docs),
    went AS (
      SELECT doc_id, ws[t.i] || ' ' || ws[t.i + 1] || ' ' || ws[t.i + 2]
                 AS name,
             0.6 AS confidence, 0 AS kind, t.i AS ord
      FROM lrw, LATERAL unnest(range(1, len(ws) - 1)) t(i)
      WHERE substr(ws[t.i], 1, 1) BETWEEN 'A' AND 'Z'
        AND substr(ws[t.i + 1], 1, 1) BETWEEN 'A' AND 'Z'
        AND substr(ws[t.i + 2], 1, 1) BETWEEN 'A' AND 'Z'),
    sent2 AS (
      SELECT doc_id, ws[t.i] AS name, 0.5, 1, t.i
      FROM lrw, LATERAL unnest(range(1, len(ws) + 1)) t(i)
      WHERE length(ws[t.i]) > 2
        AND substr(ws[t.i], 1, 1) BETWEEN 'A' AND 'Z'),
    lrent0 AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id, name
                    ORDER BY kind, ord) AS rn
      FROM (SELECT * FROM went UNION ALL SELECT * FROM sent2)),
    lrent AS (
      SELECT doc_id, name, {type_case} AS entity_type, confidence
      FROM lrent0 WHERE rn = 1)
    """


def lightrag_entities_sql() -> str:
    return f"""
        WITH {_corpus_cte()},
        {_lightrag_ent_cte()}
        SELECT doc_id, name, entity_type, confidence FROM lrent
    """


def lightrag_relationships_sql() -> str:
    from .stages.lightrag_extract import REL_PATTERNS
    pats = ", ".join(
        f"({i}, '{p.replace(chr(39), chr(39) * 2)}', '{t}', {c})"
        for i, (p, t, c) in enumerate(REL_PATTERNS))
    return f"""
        WITH {_corpus_cte()},
        {_lightrag_ent_cte()},
        pat(ord, pattern, rel_type, base) AS (VALUES {pats}),
        pairs2 AS (
          SELECT a.doc_id, w.tl,
                 a.name AS n1, a.entity_type AS t1,
                 b.name AS n2, b.entity_type AS t2,
                 strpos(w.tl, lower(a.name)) - 1 AS p1,
                 strpos(w.tl, lower(b.name)) - 1 AS p2
          FROM lrent a
          JOIN lrent b ON a.doc_id = b.doc_id AND a.name < b.name
          JOIN lrw w ON w.doc_id = a.doc_id
          WHERE strpos(w.tl, lower(a.name)) > 0
            AND strpos(w.tl, lower(b.name)) > 0),
        pm AS (
          SELECT p.*, t.rel_type, t.base,
                 row_number() OVER (PARTITION BY p.doc_id, p.n1, p.n2
                                    ORDER BY t.ord) AS rn
          FROM pairs2 p JOIN pat t
            ON strpos(substr(p.tl, LEAST(p.p1, p.p2) + 1,
                             GREATEST(p.p1, p.p2) - LEAST(p.p1, p.p2)),
                      t.pattern) > 0),
        scored2 AS (
          SELECT doc_id,
                 -- first/second by position; ties (equal pos) are
                 -- "not forward", matching the reference's p1 < p2 test
                 CASE WHEN p1 < p2 THEN n1 ELSE n2 END AS fname,
                 CASE WHEN p1 < p2 THEN n2 ELSE n1 END AS sname,
                 CASE WHEN p1 < p2 THEN t1 ELSE t2 END AS ftype,
                 CASE WHEN p1 < p2 THEN t2 ELSE t1 END AS stype,
                 p1 < p2 AS forward, rel_type, base
          FROM pm WHERE rn = 1),
        rel3 AS (
          SELECT DISTINCT doc_id,
                 CASE WHEN NOT forward
                       AND rel_type IN ('works_at', 'located_in', 'from')
                      THEN sname ELSE fname END AS source,
                 CASE WHEN NOT forward
                       AND rel_type IN ('works_at', 'located_in', 'from')
                      THEN fname ELSE sname END AS target,
                 rel_type,
                 LEAST(base
                   + CASE WHEN rel_type = 'works_at' AND ftype = 'person'
                            AND stype = 'organization' THEN 0.2
                          WHEN rel_type = 'located_in'
                            AND stype = 'location' THEN 0.2
                          WHEN rel_type = 'founded' AND ftype = 'person'
                            AND stype = 'organization' THEN 0.2
                          WHEN rel_type = 'manages' AND ftype = 'person'
                            THEN 0.1
                          ELSE 0.0 END, 1.0) AS confidence
          FROM scored2)
        SELECT doc_id, source, target, rel_type,
               round(confidence, 4) AS confidence
        FROM rel3
    """
