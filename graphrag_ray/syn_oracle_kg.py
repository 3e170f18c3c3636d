"""DuckDB replay of the FULL KG build over the synth spans corpus — the
syn_* hard-oracle family (entities / alias map / edges / triples over the
north-rule corpus shape itself).

The kgx oracles (kgx.py / kgx_fuzzy.py) verify the KG pipeline over
engineered single-sentence corpora with hand-derivable extraction
constants. This module closes the remaining evidence gap: the REAL synth
corpus (synth.py — multi-sentence docs, Zipf-hot entity keys, md5-derived
fuzzy name variants, cross-sentence extraction interactions) replayed in
SQL end to end:

1.  ``texts``: per-doc text re-derived by md5 arithmetic only
    (synth_oracle._sentence_cte — shared with the kg_chunks oracle).
2.  word-stream extraction replay (reference entity/mod.rs:114-1108):
    - phase-2 title names and phase-3 two-word names over the whitespace
      token stream, with the greedy left-to-right pair marking replayed as
      run-parity (a candidate pair is selected iff its position has even
      offset inside a maximal run of consecutive candidate positions —
      provably identical to the sequential mark loop, asserted corpus-wide
      by tests/test_syn_oracle_kg.py);
    - ORG suffix/prefix scans with the reference's FIRST-occurrence
      semantics (text.find) and last-space/next-dot name windows;
    - known-LOCATION containment scan;
    - per-(name,type) event dedup with max-confidence and
      ``n_mentions = n_events * count(text, name)`` (each extraction event
      re-counts all occurrences, entity/mod.rs:602-631).
3.  canonicalization replay (corpus/entity_linker.rs:213-273, 379-429):
    exact clusters on (type, normalize_string) → Soundex blocking (first
    token, recursive-CTE soundex) → similarity = max(gated Levenshtein,
    Jaro-Winkler, token Jaccard) with JARO MATCHING REPLAYED AS A
    RECURSIVE CTE (DuckDB's builtin jaro_winkler_similarity applies the
    0.7 boost-threshold variant and disagrees with the reference
    transcription on ~0.5% of in-block pairs — 12 merge decisions at
    sf0.01 — so the oracle implements the reference algorithm itself:
    greedy earliest-in-window char matching carried as a 0/1 mask string,
    transpositions from the matched substreams, unconditional Winkler
    prefix bonus capped at 4) → greedy seed-absorb clustering replayed as
    a per-block recursive CTE over (-total_count, norm) ranks.
4.  edge replay: per-chunk extraction-ordered entity pairs (i<j), typed by
    the chunk-level context-keyword table (entity/mod.rs:812-879),
    rewritten through the alias map with self-loop drop and directed
    (src, dst, rel) aggregation (stages/edges.py semantics).

The corpus at the driver's sf (500 docs, factor=1, no base text) is
single-chunk-per-doc at chunk_size=2048 (asserted in tests), so the chunk
replay reduces to whole-doc text; chunking itself is oracled separately
(synth_oracle.kg_chunks_sql).

The SQL never calls one line of pipeline code — it shares only the pool
constants and the md5-arithmetic corpus definition, the same
circularity-breaking contract as kgx.py.
"""

from __future__ import annotations

from .functions.extraction import (
    KNOWN_LOCATIONS,
    NAME_ENDINGS,
    NAME_PREFIXES,
    NON_PERSON_WORDS,
    ORG_INDICATORS,
    ORG_PREFIXES,
    ORG_SUFFIXES,
    PERSON_TITLES,
    SHORT_NON_NAMES,
)
from .synth_oracle import _sentence_cte


def _lit(vals) -> str:
    return ", ".join("'" + v.replace("'", "''") + "'" for v in vals)


def _in(col: str, vals) -> str:
    return f"{col} IN ({_lit(vals)})"


def _texts_cte() -> str:
    """Per-doc text with include_base_text=False (sentences only)."""
    return f"""
    {_sentence_cte()},
    texts AS MATERIALIZED (
        SELECT 'doc_'||lpad(d.doc_id::VARCHAR, 8, '0') AS doc_id,
               string_agg(sent.sentence, '' ORDER BY sent.s) AS text
        FROM documents d JOIN sent ON sent.did = d.doc_id
        GROUP BY d.doc_id
    )
    """


def _person_word(c: str) -> str:
    """SQL twin of extraction._is_likely_person_word over a cleaned word."""
    ends = " OR ".join(f"lower({c}) LIKE '%{e}'" for e in NAME_ENDINGS)
    starts = " OR ".join(
        "lower({c}) LIKE '{p}%'".format(c=c, p=p.replace("'", "''"))
        for p in NAME_PREFIXES)
    return f"""(
      length({c}) >= 2
      AND NOT (length({c}) <= 2 AND {_in(f'lower({c})', sorted(SHORT_NON_NAMES))})
      AND substr({c},1,1) BETWEEN 'A' AND 'Z'
      AND (length({c}) >= 3 OR {ends} OR {starts})
    )"""


def _words_cte() -> str:
    """Token stream + phase-2 titles + phase-3 run-parity pair selection."""
    return f"""
    words AS (
        SELECT doc_id,
               row_number() OVER (PARTITION BY doc_id ORDER BY pos0) - 1 AS i,
               raw,
               rtrim(regexp_replace(raw, '[^A-Za-z'']+', '', 'g'), '''') AS c,
               substr(raw,1,1) BETWEEN 'A' AND 'Z' AS cap
        FROM (
            SELECT doc_id, unnest(ws) AS raw,
                   unnest(range(1, len(ws) + 1)) AS pos0
            FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM texts)
        )
        WHERE raw <> ''
    ),
    wattr AS MATERIALIZED (
        SELECT doc_id, i, raw, c, cap, lower(c) AS lc,
               {_person_word('c')} AS pw
        FROM words
    ),
    p2 AS MATERIALIZED (
        SELECT w1.doc_id, w1.i AS ti,
               w2.c || CASE WHEN w3.i IS NOT NULL THEN ' ' || w3.c
                            ELSE '' END AS name,
               (w3.i IS NOT NULL) AS has_third
        FROM wattr w1
        JOIN wattr w2 ON w2.doc_id = w1.doc_id AND w2.i = w1.i + 1
        LEFT JOIN wattr w3 ON w3.doc_id = w1.doc_id AND w3.i = w1.i + 2
                           AND w3.cap AND w3.pw
        WHERE {_in('w1.lc', sorted(PERSON_TITLES))} AND w2.cap AND w2.pw
    ),
    p2marks AS MATERIALIZED (
        SELECT doc_id, ti AS m FROM p2
        UNION ALL SELECT doc_id, ti + 1 FROM p2
        UNION ALL SELECT doc_id, ti + 2 FROM p2 WHERE has_third
    ),
    cand AS (
        SELECT w1.doc_id, w1.i, w1.c AS c1, w2.c AS c2
        FROM wattr w1
        JOIN wattr w2 ON w2.doc_id = w1.doc_id AND w2.i = w1.i + 1
        WHERE w1.cap AND w2.cap AND w1.pw AND w2.pw
          AND NOT {_in('w1.lc', sorted(NON_PERSON_WORDS))}
          AND NOT {_in('w2.lc', sorted(NON_PERSON_WORDS))}
          AND NOT EXISTS (SELECT 1 FROM p2marks m
                          WHERE m.doc_id = w1.doc_id
                            AND m.m IN (w1.i, w1.i + 1))
    ),
    p3 AS MATERIALIZED (
        SELECT doc_id, i, c1 || ' ' || c2 AS name
        FROM (
            SELECT doc_id, i, c1, c2,
                   i - min(i) OVER (PARTITION BY doc_id, grp) AS off
            FROM (
                SELECT doc_id, i, c1, c2,
                       i - row_number() OVER (PARTITION BY doc_id
                                              ORDER BY i) AS grp
                FROM cand
            )
        )
        WHERE off % 2 = 0
    )
    """


_ORG_CONF = """least(1.0, 0.5
    + CASE WHEN nm LIKE '%Inc%' OR nm LIKE '%Corp%' OR nm LIKE '%LLC%'
           THEN 0.3 ELSE 0 END
    + CASE WHEN nm LIKE '%University%' OR nm LIKE '%Institute%'
           THEN 0.2 ELSE 0 END
    + CASE WHEN substr(nm,1,1) BETWEEN 'A' AND 'Z' THEN 0.1 ELSE 0 END)"""


def _org_events() -> str:
    parts = []
    inds = " OR ".join(f"nm LIKE '%{i}%'" for i in ORG_INDICATORS)
    for k, suf in enumerate(ORG_SUFFIXES):
        s = suf.replace("'", "''")
        parts.append(f"""
        SELECT doc_id, nm AS name, 'ORGANIZATION' AS etype,
               {_ORG_CONF} AS conf, {2_000_000 + k} AS ord
        FROM (
            SELECT doc_id, trim(substr(text, st, pos + {len(suf)} - st)) AS nm
            FROM (
                SELECT doc_id, text, pos,
                       CASE WHEN rs = 0 THEN 1 ELSE pos - rs + 1 END AS st
                FROM (
                    SELECT doc_id, text, pos,
                           strpos(reverse(substr(text, 1, pos - 1)), ' ') AS rs
                    FROM (SELECT doc_id, text, strpos(text, '{s}') AS pos
                          FROM texts)
                    WHERE pos > 0
                )
            )
        )
        WHERE nm <> '' AND ({inds})
        """)
    for k, pre in enumerate(ORG_PREFIXES):
        p = pre.replace("'", "''")
        parts.append(f"""
        SELECT doc_id, nm AS name, 'ORGANIZATION' AS etype,
               {_ORG_CONF} AS conf, {2_000_100 + k} AS ord
        FROM (
            SELECT doc_id,
                   trim(CASE WHEN rel > 0 THEN substr(text, pos, rel - 1)
                             ELSE substr(text, pos, 50) END) AS nm
            FROM (
                SELECT doc_id, text, pos, strpos(substr(text, pos), '.') AS rel
                FROM (SELECT doc_id, text, strpos(text, '{p}') AS pos
                      FROM texts)
                WHERE pos > 0
            )
        )
        WHERE nm <> '' AND length(nm) > {len(pre)}
        """)
    return " UNION ALL ".join(parts)


def _loc_events() -> str:
    parts = []
    for k, loc in enumerate(KNOWN_LOCATIONS):
        l_ = loc.replace("'", "''")
        parts.append(f"""
        SELECT doc_id, '{l_}' AS name, 'LOCATION' AS etype, 0.9 AS conf,
               {3_000_000 + k} AS ord
        FROM texts WHERE strpos(text, '{l_}') > 0
        """)
    return " UNION ALL ".join(parts)


def _events_cte() -> str:
    return f"""
    events AS MATERIALIZED (
        SELECT doc_id, name, 'PERSON' AS etype, 0.9 AS conf, ti AS ord FROM p2
        UNION ALL
        SELECT doc_id, name, 'PERSON', 0.8, 1000000 + i FROM p3
        UNION ALL
        {_org_events()}
        UNION ALL
        {_loc_events()}
    ),
    ents AS MATERIALIZED (
        SELECT doc_id, name, etype,
               max(conf) AS conf, count(*) AS n_events, min(ord) AS ord
        FROM events WHERE conf >= 0.7
        GROUP BY 1, 2, 3
    ),
    ents_m AS MATERIALIZED (
        SELECT e.doc_id, e.name, e.etype, e.conf, e.ord, 1 AS n_rows,
               e.n_events * ((length(t.text)
                              - length(replace(t.text, e.name, '')))
                             // length(e.name)) AS n_mentions
        FROM ents e JOIN texts t USING (doc_id)
    )
    """


def _docents_cte() -> str:
    """Chunk→doc rollup for the chunked (flagship) corpus: the pipeline's
    in-batch per-doc entity combine (stages/extract.py ent_acc /
    extraction_vec doc-level aggregation) keyed by (real doc, raw name,
    type): conf = max over chunk events, n_mentions = sum of per-chunk
    n_events x in-chunk occurrence counts, n_rows = #chunk-level rows (the
    unit ExactCluster.name_counts accumulates, canonicalize.py:134)."""
    return """
    docents AS MATERIALIZED (
        SELECT t.parent AS doc_id, em.name, em.etype,
               max(em.conf) AS conf, sum(em.n_mentions) AS n_mentions,
               count(*) AS n_rows
        FROM ents_m em JOIN texts t USING (doc_id)
        GROUP BY 1, 2, 3
    )
    """


_SX_CODE = """CASE WHEN {c} IN ('B','F','P','V') THEN '1'
     WHEN {c} IN ('C','G','J','K','Q','S','X','Z') THEN '2'
     WHEN {c} IN ('D','T') THEN '3'
     WHEN {c} = 'L' THEN '4'
     WHEN {c} IN ('M','N') THEN '5'
     WHEN {c} = 'R' THEN '6'
     ELSE '0' END"""


def _canon_cte(src: str = "ents_m") -> str:
    """Exact clusters → soundex blocks → sims (recursive jaro) → greedy.

    ``src`` is the per-doc entity-row relation feeding canonicalization:
    ``ents_m`` for the single-chunk syn corpus, ``docents`` (the chunk→doc
    rollup) for the chunked flagship corpus. raw_cnt sums ``n_rows``
    because ExactCluster.name_counts accumulates CHUNK-level row counts
    (canonicalize.py:134), which drives both the greedy seed order
    (-total_count) and canonical-name pick."""
    sxc1 = _SX_CODE.format(c="substr(tok,1,1)")
    sxcn = _SX_CODE.format(c="substr(tok, pos+1, 1)")
    return f"""
    exact AS MATERIALIZED (
        SELECT etype,
               trim(regexp_replace(regexp_replace(lower(name),
                    '[^a-z0-9 ]+', '', 'g'), ' +', ' ', 'g')) AS norm,
               name,
               sum(n_rows) AS raw_cnt,
               sum(n_mentions) AS mention_sum,
               max(conf) AS conf_max,
               list(DISTINCT doc_id) AS docs
        FROM {src}
        GROUP BY 1, 2, 3
    ),
    ekeys AS MATERIALIZED (
        SELECT etype, norm,
               sum(raw_cnt) AS total_cnt,
               sum(mention_sum) AS mention_sum,
               max(conf_max) AS conf_max
        FROM exact GROUP BY 1, 2
    ),
    sx_base AS (SELECT DISTINCT upper(split_part(norm, ' ', 1)) AS tok
                FROM ekeys),
    sx_step AS (
        SELECT tok, 1 AS pos,
               CASE WHEN substr(tok,1,1) BETWEEN 'A' AND 'Z'
                    THEN substr(tok,1,1) ELSE '' END AS res,
               {sxc1} AS prev
        FROM sx_base
        UNION ALL
        SELECT tok, pos + 1,
               CASE WHEN cc <> '0' AND cc <> prev THEN res || cc
                    ELSE res END,
               cc
        FROM (SELECT tok, pos, res, prev, {sxcn} AS cc
              FROM sx_step
              WHERE pos < length(tok) AND length(res) < 4)
    ),
    sx AS MATERIALIZED (
        SELECT tok, substr(res || '0000', 1, 4) AS sxc
        FROM (SELECT tok, res,
                     row_number() OVER (PARTITION BY tok
                                        ORDER BY pos DESC) AS rn
              FROM sx_step)
        WHERE rn = 1
    ),
    members AS MATERIALIZED (
        SELECT e.etype || '|' || s.sxc AS bkey, e.etype, e.norm,
               e.total_cnt, e.mention_sum, e.conf_max,
               row_number() OVER (PARTITION BY e.etype, s.sxc
                                  ORDER BY e.total_cnt DESC, e.norm) AS rank
        FROM ekeys e JOIN sx s ON s.tok = upper(split_part(e.norm, ' ', 1))
    ),
    mpairs AS MATERIALIZED (
        SELECT a.bkey, a.rank AS lo, b.rank AS hi, a.norm AS na, b.norm AS nb,
               length(a.norm) AS la, length(b.norm) AS lb
        FROM members a JOIN members b
          ON b.bkey = a.bkey AND b.rank > a.rank
    ),
    jstate AS (
        SELECT bkey, lo, hi, na, nb, la, lb,
               greatest(greatest(la, lb) // 2 - 1, 0) AS md,
               0 AS i, repeat('0', lb) AS mask2, '' AS m1, 0 AS matches
        FROM mpairs
        UNION ALL
        SELECT bkey, lo, hi, na, nb, la, lb, md,
               i + 1,
               CASE WHEN j IS NOT NULL
                    THEN substr(mask2, 1, j) || '1' || substr(mask2, j + 2)
                    ELSE mask2 END,
               CASE WHEN j IS NOT NULL THEN m1 || substr(na, i + 1, 1)
                    ELSE m1 END,
               matches + CASE WHEN j IS NOT NULL THEN 1 ELSE 0 END
        FROM (
            SELECT *,
                   list_min(list_filter(range(greatest(0, i - md),
                                              least(i + md + 1, lb)),
                            j -> substr(mask2, j + 1, 1) = '0'
                                 AND substr(nb, j + 1, 1)
                                     = substr(na, i + 1, 1))) AS j
            FROM jstate
            WHERE i < la
        )
    ),
    jdone AS (
        SELECT bkey, lo, hi, na, nb, la, lb, mask2, m1, matches
        FROM (SELECT *, row_number() OVER (PARTITION BY bkey, lo, hi
                                           ORDER BY i DESC) AS rn
              FROM jstate)
        WHERE rn = 1
    ),
    jw AS (
        SELECT bkey, lo, hi,
               CASE WHEN matches = 0 THEN 0.0
                    ELSE (jaro + pfx * 0.1 * (1.0 - jaro)) END AS jw_sim
        FROM (
            SELECT bkey, lo, hi, matches,
                   CASE WHEN matches = 0 THEN 0.0 ELSE
                     (matches::DOUBLE / la + matches::DOUBLE / lb
                      + (matches - trans / 2.0) / matches) / 3.0 END AS jaro,
                   CASE WHEN substr(na,1,1) <> substr(nb,1,1) THEN 0
                        WHEN substr(na,2,1) <> substr(nb,2,1)
                             OR substr(na,2,1) = '' OR substr(nb,2,1) = ''
                          THEN 1
                        WHEN substr(na,3,1) <> substr(nb,3,1)
                             OR substr(na,3,1) = '' OR substr(nb,3,1) = ''
                          THEN 2
                        WHEN substr(na,4,1) <> substr(nb,4,1)
                             OR substr(na,4,1) = '' OR substr(nb,4,1) = ''
                          THEN 3
                        ELSE 4 END AS pfx
            FROM (
                SELECT bkey, lo, hi, na, nb, la, lb, matches,
                       coalesce(list_sum(list_transform(range(0, matches),
                           k -> CASE WHEN substr(m1, k + 1, 1)
                                          <> substr(m2, k + 1, 1)
                                THEN 1 ELSE 0 END)), 0) AS trans
                FROM (
                    SELECT bkey, lo, hi, na, nb, la, lb, matches, m1,
                           array_to_string(
                             list_transform(
                               list_filter(range(0, lb),
                                   k -> substr(mask2, k + 1, 1) = '1'),
                               k -> substr(nb, k + 1, 1)), '') AS m2
                    FROM jdone
                )
            )
        )
    ),
    simsge AS MATERIALIZED (
        SELECT p.bkey, p.lo, p.hi
        FROM mpairs p
        JOIN jw ON jw.bkey = p.bkey AND jw.lo = p.lo AND jw.hi = p.hi
        WHERE greatest(
            CASE WHEN levenshtein(p.na, p.nb) <= 2
                 THEN 1.0 - levenshtein(p.na, p.nb)::DOUBLE
                            / greatest(p.la, p.lb)
                 ELSE 0.0 END,
            jw.jw_sim,
            len(list_filter(list_distinct(string_split(p.na, ' ')),
                t -> list_contains(list_distinct(string_split(p.nb, ' ')),
                                   t)))::DOUBLE
              / nullif(len(list_distinct(string_split(p.na, ' ')))
                       + len(list_distinct(string_split(p.nb, ' ')))
                       - len(list_filter(list_distinct(string_split(p.na, ' ')),
                             t -> list_contains(
                                 list_distinct(string_split(p.nb, ' ')), t))),
                       0)
        ) >= 0.85
    ),
    blockstate AS MATERIALIZED (
        SELECT m.bkey,
               list(m.rank ORDER BY m.rank) AS ranks,
               coalesce(any_value(sl.simlist), []) AS simlist
        FROM members m
        LEFT JOIN (SELECT bkey, list({{'lo': lo, 'hi': hi}}) AS simlist
                   FROM simsge GROUP BY bkey) sl ON sl.bkey = m.bkey
        GROUP BY m.bkey
    ),
    greedy AS (
        SELECT bkey, ranks, simlist, 0 AS step,
               []::BIGINT[] AS assigned,
               []::STRUCT(r BIGINT, s BIGINT)[] AS pairs
        FROM blockstate
        UNION ALL
        SELECT bkey, ranks, simlist, step + 1,
               assigned || [seed] || absorbed,
               pairs || [{{'r': seed, 's': seed}}]
                     || list_transform(absorbed, x -> {{'r': x, 's': seed}})
        FROM (
            SELECT *,
                   list_sort(list_transform(
                       list_filter(simlist,
                                   p -> p.lo = seed
                                        AND NOT list_contains(assigned,
                                                              p.hi)),
                       p -> p.hi)) AS absorbed
            FROM (
                SELECT *,
                       list_min(list_filter(ranks,
                                r -> NOT list_contains(assigned, r))) AS seed
                FROM greedy
            )
            WHERE seed IS NOT NULL
        )
    ),
    assign AS MATERIALIZED (
        SELECT g.bkey, u.p.r AS rank, u.p.s AS seed_rank
        FROM (SELECT bkey, pairs,
                     row_number() OVER (PARTITION BY bkey
                                        ORDER BY step DESC) AS rn
              FROM greedy) g,
             unnest(g.pairs) u(p)
        WHERE g.rn = 1
    ),
    norm_assign AS MATERIALIZED (
        SELECT m.etype, m.norm, ms.norm AS seed_norm
        FROM assign a
        JOIN members m ON m.bkey = a.bkey AND m.rank = a.rank
        JOIN members ms ON ms.bkey = a.bkey AND ms.rank = a.seed_rank
    ),
    name_cnt AS (
        SELECT na.etype, na.seed_norm, e.name, sum(e.raw_cnt) AS cnt
        FROM exact e
        JOIN norm_assign na ON na.etype = e.etype AND na.norm = e.norm
        GROUP BY 1, 2, 3
    ),
    canon_pick AS (
        SELECT etype, seed_norm, name AS canonical_name
        FROM (SELECT etype, seed_norm, name,
                     row_number() OVER (PARTITION BY etype, seed_norm
                         ORDER BY cnt DESC, length(name) DESC, name DESC) AS rn
              FROM name_cnt) z
        WHERE rn = 1
    ),
    canonf AS MATERIALIZED (
        SELECT g.etype AS entity_type,
               cp.canonical_name,
               g.etype || '_' || regexp_replace(lower(cp.canonical_name),
                                                '[^a-z0-9_]+', '', 'g')
                   AS canonical_id,
               g.seed_norm,
               count(DISTINCT g.doc_id)::BIGINT AS doc_frequency,
               sum(g.n_mentions)::BIGINT AS mention_count,
               round(max(g.conf), 4) AS confidence
        FROM (
            SELECT em.doc_id, em.n_mentions, em.conf, em.etype, na.seed_norm
            FROM {src} em
            JOIN norm_assign na
              ON na.etype = em.etype
             AND na.norm = trim(regexp_replace(regexp_replace(lower(em.name),
                     '[^a-z0-9 ]+', '', 'g'), ' +', ' ', 'g'))
        ) g
        JOIN canon_pick cp
          ON cp.etype = g.etype AND cp.seed_norm = g.seed_norm
        GROUP BY 1, 2, 3, 4
    ),
    aliasf AS MATERIALIZED (
        SELECT DISTINCT
               e.etype || '_' || regexp_replace(lower(e.name),
                                                '[^a-z0-9_]+', '', 'g')
                   AS entity_id,
               c.canonical_id, c.canonical_name,
               e.etype AS entity_type
        FROM exact e
        JOIN norm_assign na ON na.etype = e.etype AND na.norm = e.norm
        JOIN canonf c ON c.entity_type = e.etype
                     AND c.seed_norm = na.seed_norm
    )
    """


def _kwflags_cte() -> str:
    """Per-unit relation-type table (entity/mod.rs:812-879: the keyword
    hits depend only on the chunk text, scanned once)."""
    return """
    kwflags AS MATERIALIZED (
        SELECT doc_id,
               CASE WHEN strpos(text, 'works for') > 0
                         OR strpos(text, 'employed by') > 0 THEN 'WORKS_FOR'
                    WHEN strpos(text, 'founded') > 0
                         OR strpos(text, 'CEO') > 0 THEN 'LEADS'
                    ELSE 'ASSOCIATED_WITH' END AS po,
               CASE WHEN strpos(text, 'born in') > 0
                         OR strpos(text, 'from') > 0 THEN 'BORN_IN'
                    WHEN strpos(text, 'lives in') > 0
                         OR strpos(text, 'based in') > 0 THEN 'LOCATED_IN'
                    ELSE 'ASSOCIATED_WITH' END AS pl,
               CASE WHEN strpos(text, 'headquartered') > 0
                         OR strpos(text, 'based in') > 0
                      THEN 'HEADQUARTERED_IN'
                    ELSE 'LOCATED_IN' END AS ol,
               CASE WHEN strpos(text, 'married') > 0
                         OR strpos(text, 'spouse') > 0 THEN 'MARRIED_TO'
                    WHEN strpos(text, 'colleague') > 0
                         OR strpos(text, 'partner') > 0 THEN 'COLLEAGUE_OF'
                    ELSE 'KNOWS' END AS pp
        FROM texts
    )
    """


def _pair_type_case(a: str, b: str) -> str:
    """Relation-type CASE for an entity-type pair, reading kwflags ``k``."""
    return f"""CASE
         WHEN ({a}, {b}) IN (('PERSON', 'ORGANIZATION'),
                             ('ORGANIZATION', 'PERSON'))
           THEN k.po
         WHEN ({a}, {b}) IN (('PERSON', 'LOCATION'),
                             ('LOCATION', 'PERSON'))
           THEN k.pl
         WHEN ({a}, {b}) IN (('ORGANIZATION', 'LOCATION'),
                             ('LOCATION', 'ORGANIZATION'))
           THEN k.ol
         WHEN {a} = 'PERSON' AND {b} = 'PERSON' THEN k.pp
         ELSE 'RELATED_TO' END"""


def _edges_cte() -> str:
    """Per-chunk ordered pair stream → canonical rewrite → directed agg."""
    return f"""
    {_kwflags_cte().strip().strip(',')},
    eids AS MATERIALIZED (
        SELECT doc_id, etype,
               etype || '_' || regexp_replace(lower(name),
                                              '[^a-z0-9_]+', '', 'g') AS eid,
               ord
        FROM ents_m
    ),
    pairs_raw AS (
        SELECT e1.doc_id, e1.eid AS src_e, e2.eid AS dst_e,
               {_pair_type_case('e1.etype', 'e2.etype')} AS rel_type
        FROM eids e1
        JOIN eids e2 ON e2.doc_id = e1.doc_id AND e2.ord > e1.ord
        JOIN kwflags k ON k.doc_id = e1.doc_id
    ),
    edge_agg AS MATERIALIZED (
        SELECT ca.canonical_id AS src, cb.canonical_id AS dst,
               p.rel_type,
               ca.canonical_name AS src_name, cb.canonical_name AS dst_name,
               count(*)::BIGINT AS n_occurrences
        FROM pairs_raw p
        JOIN aliasf ca ON ca.entity_id = p.src_e
        JOIN aliasf cb ON cb.entity_id = p.dst_e
        WHERE ca.canonical_id <> cb.canonical_id
        GROUP BY 1, 2, 3, 4, 5
    )
    """


def _full_cte() -> str:
    return (
        "WITH RECURSIVE "
        + _texts_cte().strip().rstrip(",") + ",\n"
        + _words_cte().strip() + ",\n"
        + _events_cte().strip() + ",\n"
        + _canon_cte().strip() + ",\n"
        + _edges_cte().strip()
    )


def _kg_full_cte(chunk_size: int = 512, overlap: int = 100) -> str:
    """Full replay of the FLAGSHIP build (queries._kg: include_base_text,
    chunk 512/100): the same word-stream extraction / canonicalization /
    edge CTEs as the syn replay, but with ``texts`` bound to the CHUNK
    units from the recursive chunker replay (synth_oracle.chunk_units_cte)
    and the chunk→doc rollup (``docents``) feeding canonicalization — the
    exact dataflow of the fused ChunkExtract stage (per-chunk extraction,
    in-batch per-doc combine) followed by the salted canonicalization
    groupby. Base text is all-lowercase in the driver corpus (asserted in
    tests), so capitalization-gated extraction events arise only inside
    pool sentences — which the md5 replay re-derives exactly; chunk
    boundaries may still split names mid-token, and both sides see the
    identical substring."""
    from .synth_oracle import chunk_units_cte

    return (
        "WITH RECURSIVE "
        + chunk_units_cte(chunk_size, overlap).strip() + ",\n"
        + _words_cte().strip() + ",\n"
        + _events_cte().strip() + ",\n"
        + _docents_cte().strip() + ",\n"
        + _canon_cte(src="docents").strip() + ",\n"
        + _edges_cte().strip()
    )


def syn_doc_entities_sql() -> str:
    """Per-doc extraction stream (doc_id, name, type, conf, n_mentions)."""
    return f"""
        {_full_cte()}
        SELECT doc_id, name, etype AS entity_type,
               round(conf, 4) AS confidence, n_mentions
        FROM ents_m
    """


def syn_entities_sql() -> str:
    return f"""
        {_full_cte()}
        SELECT canonical_id, canonical_name, entity_type, doc_frequency,
               mention_count, confidence
        FROM canonf
    """


def syn_alias_map_sql() -> str:
    return f"""
        {_full_cte()}
        SELECT entity_id, canonical_id, canonical_name, entity_type
        FROM aliasf
    """


def syn_edges_sql() -> str:
    return f"""
        {_full_cte()}
        SELECT src, dst, rel_type, n_occurrences
        FROM edge_agg
    """


def syn_triples_sql() -> str:
    return f"""
        {_full_cte()}
        SELECT src_name AS subj, rel_type AS pred, dst_name AS obj,
               n_occurrences
        FROM edge_agg
    """


# --- flagship (kg_*) twins: the same builds over the CHUNKED corpus with
# base text included (queries._kg / KG_CFG chunk 512/100) — see
# _kg_full_cte. These close the rows-only gap on the flagship surfaces
# themselves, not just their syn/kgx stand-ins.


def kg_entities_sql() -> str:
    return f"""
        {_kg_full_cte()}
        SELECT canonical_id, canonical_name, entity_type, doc_frequency,
               mention_count
        FROM canonf
    """


def kg_alias_map_sql() -> str:
    return f"""
        {_kg_full_cte()}
        SELECT entity_id, canonical_id, canonical_name, entity_type
        FROM aliasf
    """


def kg_triples_sql() -> str:
    """Flagship triples: confidence is the constant pattern-path
    relationship confidence (stages/extract.py:52, MAX-merged over
    occurrences — constant in, constant out)."""
    return f"""
        {_kg_full_cte()}
        SELECT src_name AS subj, rel_type AS pred, dst_name AS obj,
               0.5 AS confidence, n_occurrences
        FROM edge_agg
    """


def kg_gleaning_sql() -> str:
    """A1/A2 gleaning (MockLLM at its DEFAULT min_confidence 0.5) over the
    flagship chunk stream — the only oracle exercising extraction's
    PHASE 4 (leftover single capitalized person words, conf 0.6) and the
    sub-0.7 ORG tail, both filtered out of the 0.7 chains everywhere else.

    Replay: the threshold-independent event CTEs gain `p4` (unconsumed
    cap∧person-word∧len≥2∧non-NPW tokens; consumed = phase-2 marks ∪
    phase-3 taken pairs; ord slots between phase 3 and the ORG range so
    first-seen entity order is preserved), re-filtered at 0.5. The mock's
    name-keyed JSON round trip makes GleaningExtractor re-key edge
    endpoints by NAME — the LAST entity (max ord) with that name wins,
    silently retyping cross-type collisions (n2i). Output is the
    batch-invariant aggregation the query surface emits: one entity row
    per (doc, name, type), globally distinct edge triples."""
    from .functions.extraction import NON_PERSON_WORDS

    npw = _in('w.lc', sorted(NON_PERSON_WORDS))
    return f"""
        {_kg_full_cte()},
        consumed AS (
            SELECT doc_id, m FROM p2marks
            UNION SELECT doc_id, i FROM p3
            UNION SELECT doc_id, i + 1 FROM p3
        ),
        p4 AS (
            SELECT w.doc_id, w.i, w.c AS name
            FROM wattr w
            WHERE w.cap AND w.pw AND length(w.c) >= 2
              AND NOT {npw}
              AND NOT EXISTS (SELECT 1 FROM consumed cn
                              WHERE cn.doc_id = w.doc_id AND cn.m = w.i)
        ),
        events05 AS (
            SELECT doc_id, name, etype, conf, ord FROM events
            UNION ALL
            SELECT doc_id, name, 'PERSON', 0.6, 1500000 + i FROM p4
        ),
        ents05 AS (
            SELECT doc_id, name, etype, max(conf) AS conf, min(ord) AS ord
            FROM events05 WHERE conf >= 0.5
            GROUP BY 1, 2, 3
        ),
        gl_ents AS (
            SELECT DISTINCT t.parent AS doc_id, e.name, e.etype,
                   e.etype || '_' || regexp_replace(lower(e.name),
                                                    '[^a-z0-9_]+', '', 'g')
                       AS eid
            FROM ents05 e JOIN texts t USING (doc_id)
        ),
        n2i AS (
            SELECT doc_id, name,
                   etype || '_' || regexp_replace(lower(name),
                                                  '[^a-z0-9_]+', '', 'g')
                       AS nid
            FROM (SELECT doc_id, name, etype,
                         row_number() OVER (PARTITION BY doc_id, name
                                            ORDER BY ord DESC) AS rn
                  FROM ents05) z WHERE rn = 1
        ),
        gl_pairs AS (
            SELECT e1.doc_id, e1.name AS name1, e2.name AS name2,
                   {_pair_type_case('e1.etype', 'e2.etype')} AS rel_type
            FROM ents05 e1
            JOIN ents05 e2 ON e2.doc_id = e1.doc_id AND e2.ord > e1.ord
            JOIN kwflags k ON k.doc_id = e1.doc_id
        ),
        gl_edges AS (
            SELECT DISTINCT n1.nid AS src_id, n2.nid AS dst_id, p.rel_type
            FROM gl_pairs p
            JOIN n2i n1 ON n1.doc_id = p.doc_id AND n1.name = p.name1
            JOIN n2i n2 ON n2.doc_id = p.doc_id AND n2.name = p.name2
        )
        SELECT 'entity' AS row_kind, doc_id, eid AS entity_id, name,
               etype AS entity_type,
               NULL::VARCHAR AS src_id, NULL::VARCHAR AS dst_id,
               NULL::VARCHAR AS rel_type
        FROM gl_ents
        UNION ALL
        SELECT 'edge', NULL, NULL, NULL, NULL, src_id, dst_id, rel_type
        FROM gl_edges
    """


# ---------------------------------------------------------------------------
# downstream graph-analytics twins over the replayed syn graph
#
# Each of these composes the full corpus replay (_full_cte) with the same
# recursive-CTE analytics the kgx oracles use (kgx.py:526-1090) — only the
# source CTE names change (kgx_edge_agg -> edge_agg, canon -> canonf), so a
# green row verifies the REAL pipeline analytics stage over the synth
# corpus' Zipf-skewed fuzzy-merged graph, not just the kgx toy pools.


def _stats_tail(chunk_count_expr: str) -> str:
    return f""",
        base AS (
          SELECT (SELECT count(*) FROM canonf)::DOUBLE AS n_ent,
                 (SELECT count(*) FROM edge_agg)::DOUBLE AS n_edge,
                 (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
                 ({chunk_count_expr})::DOUBLE AS n_chunks)
        SELECT 'entity_count' AS stat, n_ent AS value FROM base
        UNION ALL SELECT 'relationship_count', n_edge FROM base
        UNION ALL SELECT 'document_count', n_docs FROM base
        UNION ALL SELECT 'chunk_count', n_chunks FROM base
        UNION ALL SELECT 'average_entities_per_chunk',
                  round(n_ent / n_chunks, 4) FROM base
        UNION ALL SELECT 'density',
                  round(n_edge / (n_ent * (n_ent - 1)), 4) FROM base
        UNION ALL
        SELECT 'entity_type:' || entity_type, count(*)::DOUBLE
        FROM canonf GROUP BY entity_type
    """


def syn_stats_sql() -> str:
    """G9 graph statistics (graph/mod.rs:330-352) over the syn graph.

    chunk_count == document_count because the factor=1 corpus is
    single-chunk-per-doc at chunk_size=2048 (asserted corpus-wide by
    tests/test_syn_oracle_kg.py)."""
    return _full_cte() + _stats_tail("SELECT count(*) FROM documents")


def kg_stats_sql() -> str:
    """G9 graph statistics over the chunked flagship graph — chunk_count
    comes from the recursive chunker replay itself."""
    return _kg_full_cte() + _stats_tail("SELECT count(*) FROM texts")


def _cooccur_tail(src: str) -> str:
    return f""",
        co_eids AS (
          SELECT DISTINCT doc_id,
                 etype || '_' || regexp_replace(lower(name),
                                                '[^a-z0-9_]+', '', 'g') AS eid
          FROM {src}),
        co_pairs AS (
          SELECT a.doc_id, a.eid AS src, b.eid AS dst,
                 row_number() OVER (PARTITION BY a.doc_id
                                    ORDER BY a.eid, b.eid) AS rn
          FROM co_eids a
          JOIN co_eids b ON b.doc_id = a.doc_id AND a.eid < b.eid)
        SELECT src, dst, count(*)::BIGINT AS n_docs,
               'co_occurs' AS rel_type, 0.7 AS confidence
        FROM co_pairs WHERE rn <= 2000
        GROUP BY 1, 2
    """


def syn_cooccur_sql() -> str:
    """G8 doc co-occurrence edges over the syn extraction stream
    (corpus/knowledge_graph.rs:192-240): sorted distinct entity-id pairs
    per doc, first-2000-per-doc cap replayed as row_number over the same
    row-major (src, dst) order the sequential loop visits."""
    return _full_cte() + _cooccur_tail("ents_m")


def kg_cooccur_sql() -> str:
    """Same co-occurrence replay over the flagship extraction stream —
    entity rows are the chunk→doc rollup (docents), matching the per-doc
    combine the real extraction emits."""
    return _kg_full_cte() + _cooccur_tail("docents")


_COMMON_ENTITIES_TAIL = """
        SELECT canonical_id, canonical_name, entity_type, mention_count
        FROM canonf
        ORDER BY mention_count DESC, canonical_id ASC LIMIT 20
    """


def syn_common_entities_sql() -> str:
    """T4 top-k by mention count (entity/bidirectional_index.rs:315-335),
    ties broken by canonical_id ascending."""
    return _full_cte() + _COMMON_ENTITIES_TAIL


def kg_common_entities_sql() -> str:
    """Same top-k replay over the chunked flagship graph."""
    return _kg_full_cte() + _COMMON_ENTITIES_TAIL


# --- shared analytics tails: each composes with EITHER corpus replay
# (_full_cte for the single-chunk syn corpus, _kg_full_cte for the chunked
# flagship corpus) — the analytics SQL reads only canonf/edge_agg, so one
# tail oracles the same stage code over both graphs.


def _components_tail() -> str:
    return """,
        nodes AS (SELECT canonical_id AS node FROM canonf),
        und AS (SELECT src AS a, dst AS b FROM edge_agg
                UNION SELECT dst, src FROM edge_agg),
        reach(a, b) AS (
          SELECT node, node FROM nodes
          UNION
          SELECT r.a, u.b FROM reach r JOIN und u ON u.a = r.b),
        comp AS (SELECT a AS entity_id, min(b) AS component
                 FROM reach GROUP BY a),
        incid AS (SELECT src AS node FROM edge_agg
                  UNION ALL SELECT dst FROM edge_agg),
        deg AS (SELECT node, count(*)::BIGINT AS degree FROM incid
                GROUP BY node)
        SELECT c.entity_id, c.component,
               coalesce(d.degree, 0)::BIGINT AS degree
        FROM comp c LEFT JOIN deg d ON d.node = c.entity_id
    """


def syn_components_sql() -> str:
    """L3 connected components + degree (graph/analytics.rs): component
    label = min reachable entity id (the pipeline's deterministic
    union-find root), degree = incident edge rows."""
    return _full_cte() + _components_tail()


def kg_components_sql() -> str:
    """Same components replay over the chunked flagship graph."""
    return _kg_full_cte() + _components_tail()


def _leiden_replay(nodes_rel: str, edges_rel: str,
                   resolution: float = 1.0,
                   sfx: str = '', as_cte: str = '') -> str:
    """L1 Leiden partition-equality replay (graph/leiden.rs:429-783 as
    transcribed by stages/community._leiden_partition): the greedy
    local-move loop EXACTLY — singleton init in sorted-node order, per node
    the sorted distinct neighbor communities as candidates, Newman delta
    (k_in_to - k_in_from)/2m - d*((sigma_to - sigma_from + d)/(2m)^2) with
    strict improvement (first maximum in candidate order wins), sweeps
    until an unchanged sweep or 100 sweeps — then the refinement that
    splits non-connected communities into connected components. All delta
    inputs are whole-number doubles, so the SQL recomputation is
    bit-identical to the Python's incremental sigma bookkeeping. Labels are
    canonicalized to the min member entity_id (partition equality per
    SURVEY §7.5). State is one recursive CTE carrying the community list;
    one recursion step = one node visit. ``nodes_rel`` must expose
    canonical_id; ``edges_rel`` src/dst. ``resolution`` scales the
    penalty term exactly as _leiden_partition's parameter; ``sfx``
    suffixes every internal CTE name so multiple replays (resolution
    sweeps) compose in one statement; ``as_cte`` wraps the final
    (entity_id, community_rep) SELECT as a named CTE so callers can
    post-process the partition."""
    # index shorthands for the node being processed at step k
    i = f"((w.k % lg{sfx}.n) + 1)"
    cur = f"w.comms[{i}]"
    nbrs = f"lg{sfx}.adjs[{i}]"
    d = f"lg{sfx}.degs[{i}]"
    sigma = (f"list_sum(list_transform(w.comms, (cm{{t}}, j{{t}}) -> "
             f"CASE WHEN cm{{t}} = {{c}} THEN lg{sfx}.degs[j{{t}}] "
             f"ELSE 0e0 END))")
    delta = (
        f"((length(list_filter({nbrs}, nb2 -> w.comms[nb2] = c))"
        f"  - length(list_filter({nbrs}, nb3 -> w.comms[nb3] = {cur})))"
        f" / lg{sfx}.m2"
        f" - {resolution!r} * {d} * (({sigma.format(t='a', c='c')}"
        f" - {sigma.format(t='b', c=cur)} + {d}) / (lg{sfx}.m2 * lg{sfx}.m2)))"
    )
    best = (
        "coalesce((list_sort(list_filter(list_transform("
        f" list_filter(list_sort(list_distinct("
        f"   list_transform({nbrs}, nb -> w.comms[nb]))), cc -> cc <> {cur}),"
        f" (c, ci) -> {{'md': -({delta}), 'ord': ci, 'comm': c}}),"
        f" x -> x.md < 0)))[1].comm, {cur})"
    )
    sql = f"""
        lnodes{sfx} AS MATERIALIZED (
            SELECT canonical_id,
                   row_number() OVER (ORDER BY canonical_id)::BIGINT AS idx
            FROM {nodes_rel}
        ),
        ledges{sfx} AS MATERIALIZED (
            SELECT a.idx AS ai, b.idx AS bi
            FROM {edges_rel} e
            JOIN lnodes{sfx} a ON a.canonical_id = e.src
            JOIN lnodes{sfx} b ON b.canonical_id = e.dst
            WHERE a.idx <> b.idx
        ),
        lincid{sfx} AS (SELECT ai AS i, bi AS j FROM ledges{sfx}
                   UNION ALL SELECT bi, ai FROM ledges{sfx}),
        ladj{sfx} AS (SELECT i, list(j) AS nbrs FROM lincid{sfx} GROUP BY i),
        lg{sfx} AS MATERIALIZED (
            SELECT (SELECT count(*) FROM lnodes{sfx})::BIGINT AS n,
                   (SELECT 2.0 * count(*) FROM ledges{sfx})::DOUBLE AS m2,
                   (SELECT list(coalesce(a.nbrs, []) ORDER BY ln.idx)
                    FROM lnodes{sfx} ln LEFT JOIN ladj{sfx} a ON a.i = ln.idx) AS adjs,
                   (SELECT list(coalesce(length(a.nbrs), 0)::DOUBLE
                                ORDER BY ln.idx)
                    FROM lnodes{sfx} ln LEFT JOIN ladj{sfx} a ON a.i = ln.idx) AS degs,
                   (SELECT list(ln.idx ORDER BY ln.idx) FROM lnodes{sfx} ln)
                       AS init
        ),
        lwalk{sfx}(k, comms, changed) AS (
            SELECT 0::BIGINT, lg{sfx}.init, FALSE FROM lg{sfx}
            UNION ALL
            SELECT s.k + 1,
                   CASE WHEN s.best_c <> s.cur_c
                        THEN s.comms[1:s.ii - 1] || [s.best_c]
                             || s.comms[s.ii + 1:s.nn]
                        ELSE s.comms END,
                   CASE WHEN (s.k % s.nn) = 0 THEN s.best_c <> s.cur_c
                        ELSE s.changed OR (s.best_c <> s.cur_c) END
            FROM (
                SELECT w.k, w.comms, w.changed, lg{sfx}.n AS nn,
                       {i}::BIGINT AS ii, {cur} AS cur_c, {best} AS best_c
                FROM lwalk{sfx} w, lg{sfx}
                WHERE w.k < 100 * lg{sfx}.n
                  AND NOT (w.k > 0 AND (w.k % lg{sfx}.n) = 0 AND NOT w.changed)
            ) s
        ),
        lfin{sfx} AS MATERIALIZED (SELECT comms FROM lwalk{sfx} ORDER BY k DESC LIMIT 1),
        lasg{sfx} AS MATERIALIZED (SELECT ln.idx, ln.canonical_id, f.comms[ln.idx] AS comm
                 FROM lnodes{sfx} ln CROSS JOIN lfin{sfx} f),
        lsame{sfx} AS (SELECT e.ai, e.bi FROM ledges{sfx} e
                  JOIN lasg{sfx} x ON x.idx = e.ai
                  JOIN lasg{sfx} y ON y.idx = e.bi AND y.comm = x.comm),
        lund{sfx} AS (SELECT ai AS a, bi AS b FROM lsame{sfx}
                 UNION SELECT bi, ai FROM lsame{sfx}),
        lreach{sfx}(a, b) AS (
            SELECT idx, idx FROM lasg{sfx}
            UNION
            SELECT r.a, u.b FROM lreach{sfx} r JOIN lund{sfx} u ON u.a = r.b),
        lcomp{sfx} AS MATERIALIZED (SELECT a AS idx, min(b) AS rootidx FROM lreach{sfx} GROUP BY a)
        SELECT n.canonical_id AS entity_id, r.canonical_id AS community_rep
        FROM lcomp{sfx} c
        JOIN lnodes{sfx} n ON n.idx = c.idx
        JOIN lnodes{sfx} r ON r.idx = c.rootidx
    """
    if as_cte:
        head, tail = sql.rsplit("SELECT n.canonical_id", 1)
        sql = (head.rstrip().rstrip(",") + ",\n        " + as_cte
               + " AS MATERIALIZED (\n        SELECT n.canonical_id" + tail
               + "\n        )")
    return sql


def syn_leiden_sql() -> str:
    """Leiden partition equality over the replayed syn graph (see
    _leiden_replay)."""
    return f"""
        {_full_cte()},
        {_leiden_replay('canonf', 'edge_agg')}
    """


def kgx_leiden_sql() -> str:
    """Leiden partition equality over the kgx oracle corpus graph — the
    same local-move + refinement replay (_leiden_replay) composed with
    kgx's corpus CTE (canon / kgx_edge_agg)."""
    from .kgx import _corpus_cte

    return f"""
        WITH RECURSIVE {_corpus_cte()},
        {_leiden_replay('canon', 'kgx_edge_agg')}
    """


def kg_leiden_sql() -> str:
    """Leiden partition equality over the chunked flagship graph."""
    return f"""
        {_kg_full_cte()},
        {_leiden_replay('canonf', 'edge_agg')}
    """


def _louvain_tail() -> str:
    return """,
        enodes AS (SELECT DISTINCT node FROM (
            SELECT src AS node FROM edge_agg
            UNION ALL SELECT dst FROM edge_agg)),
        und AS (SELECT src AS a, dst AS b FROM edge_agg
                UNION SELECT dst, src FROM edge_agg),
        reach(a, b) AS (
          SELECT node, node FROM enodes
          UNION
          SELECT r.a, u.b FROM reach r JOIN und u ON u.a = r.b),
        comp AS (SELECT a AS node_id, min(b) AS root FROM reach GROUP BY a),
        cid AS (SELECT root,
                       (dense_rank() OVER (ORDER BY root) - 1)::BIGINT
                           AS community_id
                FROM (SELECT DISTINCT root FROM comp)),
        w AS (SELECT c1.root, count(*)::BIGINT AS nrows
              FROM edge_agg e
              JOIN comp c1 ON c1.node_id = e.src
              JOIN comp c2 ON c2.node_id = e.dst AND c2.root = c1.root
              GROUP BY c1.root),
        tot AS (SELECT count(*)::DOUBLE AS n FROM enodes)
        SELECT cid.community_id, comp.node_id,
               round((2.0 * coalesce(w.nrows, 0)) / (2.0 * tot.n), 4)
                   AS modularity
        FROM comp
        JOIN cid ON cid.root = comp.root
        LEFT JOIN w ON w.root = comp.root
        CROSS JOIN tot
    """


def syn_louvain_sql() -> str:
    """L3 'Louvain' as the reference ships it (analytics.rs:97-180):
    components over edge-connected nodes, community ids in sorted-node
    discovery order, simplified modularity = internal edge ends / 2n."""
    return _full_cte() + _louvain_tail()


def kg_louvain_sql() -> str:
    """Same Louvain replay over the chunked flagship graph."""
    return _kg_full_cte() + _louvain_tail()


def _graph_metrics_tail() -> str:
    return """,
        dirs AS (SELECT src AS a, dst AS b FROM edge_agg
                 UNION ALL SELECT dst, src FROM edge_agg),
        adj AS (SELECT a, b, count(*)::BIGINT AS mult FROM dirs GROUP BY a, b),
        nbr AS (SELECT DISTINCT a, b FROM dirs),
        kdeg AS (SELECT a, sum(mult)::DOUBLE AS k FROM adj GROUP BY a),
        tri AS (SELECT x.a AS v, sum(x.mult * y.mult)::DOUBLE AS t
                FROM adj x
                JOIN adj y ON y.a = x.b
                JOIN nbr s ON s.a = x.a AND s.b = y.b
                GROUP BY x.a),
        pern AS (SELECT kd.a, coalesce(t.t, 0.0) / (kd.k * (kd.k - 1)) AS c
                 FROM kdeg kd LEFT JOIN tri t ON t.v = kd.a
                 WHERE kd.k >= 2),
        nn AS (SELECT count(*)::DOUBLE AS n FROM kdeg),
        ee AS (SELECT count(*)::DOUBLE AS m FROM edge_agg)
        SELECT 'density' AS stat,
               round(2.0 * ee.m / (nn.n * (nn.n - 1)), 4) AS value
        FROM nn, ee
        UNION ALL
        SELECT 'avg_clustering_coefficient',
               round(coalesce(avg(c), 0.0), 4) FROM pern
    """


def syn_graph_metrics_sql() -> str:
    """L3 density + avg clustering coefficient (analytics.rs:432-487);
    multi-edge multiplicity in neighbor lists, distinct-set triangle
    membership (the (mult, distinct) split, same as kgx_graph_metrics)."""
    return _full_cte() + _graph_metrics_tail()


def kg_graph_metrics_sql() -> str:
    """Same density/clustering replay over the chunked flagship graph."""
    return _kg_full_cte() + _graph_metrics_tail()


def _pagerank_tail() -> str:
    return """,
        nodes AS (SELECT canonical_id AS node FROM canonf),
        dirs AS (SELECT src AS a, dst AS b FROM edge_agg
                 UNION ALL SELECT dst, src FROM edge_agg),
        oinv AS (SELECT a, 1.0::DOUBLE / count(*) AS inv FROM dirs GROUP BY a),
        cst AS (SELECT 1.0::DOUBLE / count(*) AS reset FROM nodes),
        pr(iter, node, score, prev) AS (
          SELECT 0, node, (SELECT reset FROM cst), 0.0::DOUBLE FROM nodes
          UNION ALL
          SELECT p.iter + 1, p.node,
                 (1.0::DOUBLE - 0.85::DOUBLE) * c.reset
                 + 0.85::DOUBLE * (
                     coalesce((SELECT sum(q.score * oi.inv)
                               FROM pr q
                               JOIN dirs d ON d.a = q.node AND d.b = p.node
                               JOIN oinv oi ON oi.a = q.node), 0.0)
                     + coalesce((SELECT sum(q2.score) FROM pr q2
                                 LEFT JOIN oinv o2 ON o2.a = q2.node
                                 WHERE o2.a IS NULL), 0.0) * c.reset),
                 p.score
          FROM pr p CROSS JOIN cst c
          WHERE p.iter < 100
            AND (SELECT sum(abs(q3.score - q3.prev)) FROM pr q3) >= 1e-6)
        SELECT node AS entity_id, round(score, 4) AS score
        FROM pr WHERE iter = (SELECT max(iter) FROM pr)
    """


def syn_pagerank_sql() -> str:
    """L2 PageRank power iteration as a recursive CTE (same arithmetic as
    stages/graph_analytics._pagerank_task / graph/pagerank.rs: damping
    0.85, uniform reset, dangling redistribution, L1 stop 1e-6, <=100
    iterations) over the syn graph."""
    return _full_cte() + _pagerank_tail()


def kg_pagerank_sql() -> str:
    """Same PageRank replay over the chunked flagship graph."""
    return _kg_full_cte() + _pagerank_tail()


# safe BFS depth bound for syn/kg centrality_sql; eccentricities are
# asserted < this corpus-wide by tests/test_syn_oracle_kg.py (observed
# diameter: 2 at sf0.01, both graphs)
_WALK_CAP = 6


def syn_centrality_sql() -> str:
    """L3 degree/betweenness/closeness (analytics.rs:182-279) over the syn
    graph: unit-weight deterministic Dijkstra makes parent(v) the
    minimum-id neighbor one BFS level closer, so subtree-ancestor counting
    reproduces the pipeline's betweenness exactly (same derivation as
    kgx_centrality, here exercised on the 100+-node fuzzy-merged graph).

    The BFS walk is depth-capped at {_WALK_CAP} instead of n-1: on the
    fuzzy-merged syn graph (dense, diameter 2 at every tested sf) the
    uncapped closure is O(n^3) rows and minutes of DuckDB time for zero
    extra information. tests/test_syn_oracle_kg.py asserts corpus-wide
    (independent Python BFS) that every eccentricity is < the cap, so the
    capped distances equal true distances."""
    return _full_cte() + _centrality_tail()


def kg_centrality_sql() -> str:
    """Same centrality replay over the chunked flagship graph (walk cap
    asserted for this graph too in tests/test_syn_oracle_kg.py)."""
    return _kg_full_cte() + _centrality_tail()


def _centrality_tail() -> str:
    return f""",
        dirs AS (SELECT src AS a, dst AS b FROM edge_agg
                 UNION ALL SELECT dst, src FROM edge_agg),
        nbrd AS (SELECT DISTINCT a, b FROM dirs),
        cnodes AS (SELECT DISTINCT a AS v FROM dirs),
        walk(s, v, d) AS (
          SELECT v, v, 0 FROM cnodes
          UNION
          SELECT w.s, di.b, w.d + 1
          FROM walk w JOIN nbrd di ON di.a = w.v
          WHERE w.d + 1 <= {_WALK_CAP}),
        dist AS (SELECT s, v, min(d)::BIGINT AS d FROM walk GROUP BY s, v),
        nn AS (SELECT count(*)::BIGINT AS n FROM cnodes),
        par AS (
          SELECT dv.s, dv.v, min(du.v) AS p
          FROM dist dv
          JOIN nbrd di ON di.b = dv.v
          JOIN dist du ON du.s = dv.s AND du.v = di.a AND du.d = dv.d - 1
          WHERE dv.d > 0
          GROUP BY dv.s, dv.v),
        anc(s, a, t) AS (
          SELECT s, p, v FROM par
          UNION
          SELECT an.s, p.p, an.t
          FROM anc an JOIN par p ON p.s = an.s AND p.v = an.a),
        bc AS (SELECT a AS v, count(*)::DOUBLE AS btw FROM anc
               WHERE a <> s GROUP BY a),
        clo AS (
          SELECT s AS v,
                 CASE WHEN count(*) > 1 AND sum(d) > 0
                      THEN (count(*) - 1)::DOUBLE / sum(d)::DOUBLE
                      ELSE 0.0 END AS c
          FROM dist GROUP BY s),
        degr AS (SELECT a AS v, count(*)::DOUBLE AS dg FROM dirs GROUP BY a)
        SELECT n.v AS node_id,
               round(CASE WHEN nn.n > 1 THEN degr.dg / (nn.n - 1)
                          ELSE 0.0 END, 4) AS degree,
               round(CASE WHEN nn.n > 2
                          THEN coalesce(bc.btw, 0.0)
                               / ((nn.n - 1) * (nn.n - 2) / 2.0)
                          ELSE 0.0 END, 4) AS betweenness,
               round(clo.c, 4) AS closeness
        FROM cnodes n
        CROSS JOIN nn
        JOIN degr ON degr.v = n.v
        JOIN clo ON clo.v = n.v
        LEFT JOIN bc ON bc.v = n.v
    """


def _mentions_tail(chunk_id_expr: str) -> str:
    return f""",
        m_base AS MATERIALIZED (
          SELECT e.doc_id, e.name, e.etype, e.conf, e.n_events,
                 length(e.name) AS ln, t.text
          FROM ents e JOIN texts t USING (doc_id)),
        occ(doc_id, name, etype, conf, n_events, ln, pos) AS (
          SELECT doc_id, name, etype, conf, n_events, ln,
                 strpos(text, name) - 1
          FROM m_base WHERE strpos(text, name) > 0
          UNION ALL
          SELECT o.doc_id, o.name, o.etype, o.conf, o.n_events, o.ln,
                 o.pos + o.ln
                 + strpos(substr(b.text, o.pos + o.ln + 1), o.name) - 1
          FROM occ o
          JOIN m_base b ON b.doc_id = o.doc_id AND b.name = o.name
                        AND b.etype = o.etype
          WHERE strpos(substr(b.text, o.pos + o.ln + 1), o.name) > 0)
        SELECT etype || '_' || regexp_replace(lower(name),
                   '[^a-z0-9_]+', '', 'g') AS entity_id,
               {chunk_id_expr} AS chunk_id,
               pos::BIGINT AS start_offset,
               (pos + ln)::BIGINT AS end_offset,
               round(conf, 4) AS confidence
        FROM occ, unnest(range(n_events)) AS _r
    """


def syn_mentions_sql() -> str:
    """M12 mention offsets over the syn corpus: per merged (doc, name,
    type) entity, the successive NON-OVERLAPPING occurrence scan
    (entity/mod.rs:613-625 — find, then resume at pos + len) replayed as a
    recursive CTE, each occurrence repeated n_events times because the
    per-event mention lists concatenate on dedup (entity/mod.rs:788-809;
    extract_entities merge). chunk_id = doc_id || '_0' (single chunk per
    doc at chunk_size=2048)."""
    return _full_cte() + _mentions_tail("doc_id || '_0'")


def kg_mentions_sql() -> str:
    """M12 mention offsets over the flagship corpus: the same occurrence
    scan, but per CHUNK — `texts.doc_id` already IS the chunk id in the
    chunked replay, and offsets are chunk-local (the mentions stage rescans
    chunk content)."""
    return _kg_full_cte() + _mentions_tail("doc_id")


def syn_query_analysis_sql() -> str:
    """Oracle for the rule-based query analyzer (retrieval/mod.rs:497-581)
    over the syn canonical-entity pool: two-way containment entity match,
    concept filtering, the type cascade, first-match intent rules and the
    complexity formula all replayed in SQL over the same fixed queries."""
    from .stages.retrieval import (ABSTRACT_INDICATORS, ANALYSIS_QUERIES,
                                   QUERY_STOPWORDS, QUESTION_WORDS,
                                   _INTENT_RULES)

    qvals = ", ".join(f"({i}, '{q}')" for i, q in enumerate(ANALYSIS_QUERIES))
    stop_in = _lit(sorted(QUERY_STOPWORDS))
    abs_in = _lit(sorted(ABSTRACT_INDICATORS))
    qw_in = _lit(sorted(QUESTION_WORDS))
    intents = {name: _lit(sorted(kws)) for name, kws in _INTENT_RULES}
    return f"""
        {_full_cte()},
        q(qid, query) AS (VALUES {qvals}),
        qw AS (SELECT qid, query, string_split(lower(query), ' ') AS ws
               FROM q),
        wx AS (SELECT qid, unnest(ws) AS w,
                      unnest(range(1, len(ws) + 1)) AS i
               FROM qw),
        ent AS (SELECT canonical_name AS name,
                       lower(canonical_name) AS low
                FROM canonf),
        ke AS (
          SELECT DISTINCT q.qid, e.name, e.low
          FROM q JOIN ent e ON EXISTS (
            SELECT 1 FROM wx
            WHERE wx.qid = q.qid
              AND (strpos(e.low, wx.w) > 0 OR strpos(wx.w, e.low) > 0))),
        kec AS (SELECT qid, count(*)::BIGINT AS n_ents,
                       string_agg(name, '|' ORDER BY name) AS key_entities
                FROM ke GROUP BY qid),
        con AS (
          SELECT wx.qid, wx.w, wx.i FROM wx
          WHERE length(wx.w) > 3 AND wx.w NOT IN ({stop_in})
            AND NOT EXISTS (
              SELECT 1 FROM ke
              WHERE ke.qid = wx.qid
                AND (strpos(ke.low, wx.w) > 0 OR strpos(wx.w, ke.low) > 0))),
        conc AS (SELECT qid, count(*)::BIGINT AS n_con,
                        string_agg(w, '|' ORDER BY i) AS concepts
                 FROM con GROUP BY qid),
        fl AS (
          SELECT qw.qid,
                 len(qw.ws)::BIGINT AS n_words,
                 EXISTS (SELECT 1 FROM wx WHERE wx.qid = qw.qid
                         AND wx.w IN ({abs_in})) AS has_abs,
                 EXISTS (SELECT 1 FROM wx WHERE wx.qid = qw.qid
                         AND wx.w IN ({qw_in})) AS has_q,
                 EXISTS (SELECT 1 FROM wx WHERE wx.qid = qw.qid
                         AND wx.w IN ({intents['overview']})) AS i_ov,
                 EXISTS (SELECT 1 FROM wx WHERE wx.qid = qw.qid
                         AND wx.w IN ({intents['detailed']})) AS i_de,
                 EXISTS (SELECT 1 FROM wx WHERE wx.qid = qw.qid
                         AND wx.w IN ({intents['comparative']})) AS i_cm,
                 EXISTS (SELECT 1 FROM wx WHERE wx.qid = qw.qid
                         AND wx.w IN ({intents['causal']})) AS i_ca,
                 EXISTS (SELECT 1 FROM wx WHERE wx.qid = qw.qid
                         AND wx.w IN ({intents['temporal']})) AS i_te
          FROM qw)
        SELECT q.query,
               CASE WHEN coalesce(kec.n_ents, 0) > 1 THEN 'relationship'
                    WHEN coalesce(kec.n_ents, 0) >= 1 THEN 'entity_focused'
                    WHEN fl.has_abs THEN 'conceptual'
                    WHEN fl.has_q THEN 'exploratory'
                    ELSE 'factual' END AS query_type,
               CASE WHEN fl.i_ov THEN 'overview'
                    WHEN fl.i_de THEN 'detailed'
                    WHEN fl.i_cm THEN 'comparative'
                    WHEN fl.i_ca THEN 'causal'
                    WHEN fl.i_te THEN 'temporal'
                    ELSE 'detailed' END AS intent,
               coalesce(kec.key_entities, '') AS key_entities,
               coalesce(conc.concepts, '') AS concepts,
               round(least(0.1 * fl.n_words + 0.3 * coalesce(kec.n_ents, 0)
                           + 0.2 * coalesce(conc.n_con, 0), 1.0), 4)
                   AS complexity
        FROM q
        JOIN fl ON fl.qid = q.qid
        LEFT JOIN kec ON kec.qid = q.qid
        LEFT JOIN conc ON conc.qid = q.qid
    """


def syn_anchors_sql() -> str:
    """Oracle for symbolic anchoring (retrieval/symbolic_anchoring.rs)
    over the syn graph: per hand-derived query concept, grounded entities
    are canonical names containing the concept (or an outgoing relation
    type mentioning it), first 10 in canonical_id order; relevance =
    min(n/10, 1) (count path — no PageRank injected), anchors with
    relevance >= 0.3 ranked (relevance DESC, concept order) top-5."""
    from .functions.anchoring import ANCHOR_QUERY_CONCEPTS

    vals = []
    for q, concepts in ANCHOR_QUERY_CONCEPTS.items():
        for i, c in enumerate(concepts):
            vals.append(f"('{q}', {i}, '{c}')")
    qc = ", ".join(vals)
    return f"""
        {_full_cte()},
        qc(query, ord, concept) AS (VALUES {qc}),
        g AS (
          SELECT qc.query, qc.ord, qc.concept, c.canonical_id,
                 row_number() OVER (PARTITION BY qc.query, qc.ord
                                    ORDER BY c.canonical_id) AS rn
          FROM qc JOIN canonf c
            ON strpos(lower(c.canonical_name), lower(qc.concept)) > 0
            OR EXISTS (SELECT 1 FROM edge_agg e
                       WHERE e.src = c.canonical_id
                         AND strpos(lower(e.rel_type),
                                    lower(qc.concept)) > 0)),
        agg AS (
          SELECT query, ord, concept,
                 least(count(*), 10)::BIGINT AS n_entities,
                 string_agg(canonical_id, '|' ORDER BY canonical_id)
                     FILTER (WHERE rn <= 10) AS entities
          FROM g GROUP BY query, ord, concept),
        ranked AS (
          SELECT *, round(least(n_entities / 10.0, 1.0), 4) AS relevance,
                 row_number() OVER (
                     PARTITION BY query
                     ORDER BY least(n_entities / 10.0, 1.0) DESC, ord)
                     AS arank
          FROM agg WHERE n_entities >= 1)   -- with_min_relevance(0.1)
        SELECT query, concept, n_entities, entities, relevance
        FROM ranked WHERE arank <= 5
    """


def kgx_rel_hierarchy_sql(resolutions=(1.0, 0.5), min_cluster_size=2,
                          limit=64) -> str:
    """L4 hierarchical relationship clustering replay
    (hierarchical_relationships.rs:183-340 as transcribed by
    stages/community._relationship_hierarchy_task) over a pinned
    64-relationship kgx fixture (sorted (src,dst,rel_type)). The
    similarity graph is the union of per-type cliques on relationship
    indices; node ids 'r{i}' reproduce the task's lexicographic node
    ordering. One recursive-CTE Leiden replay per resolution level, then
    per level: communities ordered by min member INDEX (cluster numbers
    advance over dropped singletons), size >= min_cluster_size kept,
    fallback summary text, cohesion = 0.2 + internal-density * 0.6
    (round 6 then the surface's round 4)."""
    from .kgx import _corpus_cte

    blocks = []
    outs = []
    for lvl, r in enumerate(resolutions):
        sfx = f"_h{lvl}"
        blocks.append(_leiden_replay("simnodes", "simedges", r, sfx,
                                     as_cte=f"part{lvl}"))
        outs.append(f"""
        grp{lvl} AS (
            SELECT community_rep AS rep, entity_id,
                   CAST(substr(entity_id, 2) AS BIGINT) AS midx
            FROM part{lvl}),
        agg{lvl} AS (SELECT rep, count(*)::BIGINT AS size,
                            min(midx) AS minidx
                     FROM grp{lvl} GROUP BY rep),
        rnk{lvl} AS (SELECT rep, size,
                            (row_number() OVER (ORDER BY minidx) - 1)
                                AS cnum
                     FROM agg{lvl}),
        itn{lvl} AS (SELECT g1.rep, count(*)::BIGINT AS internal
                     FROM simedges e
                     JOIN grp{lvl} g1 ON g1.entity_id = e.src
                     JOIN grp{lvl} g2 ON g2.entity_id = e.dst
                                     AND g2.rep = g1.rep
                     GROUP BY g1.rep),
        out{lvl} AS (
            SELECT {lvl}::BIGINT AS level,
                   'L{lvl}C' || r.cnum AS cluster_id,
                   r.size,
                   'Cluster L{lvl}C' || r.cnum || ' with ' || r.size
                       || ' relationships' AS summary,
                   round(round(CASE WHEN r.size = 1 THEN 1.0
                         ELSE 0.2 + (coalesce(it.internal, 0)::DOUBLE
                                     / (r.size * (r.size - 1) / 2.0)) * 0.6
                         END, 6), 4) AS cohesion
            FROM rnk{lvl} r LEFT JOIN itn{lvl} it ON it.rep = r.rep
            WHERE r.size >= {min_cluster_size})""")

    union = " UNION ALL ".join(f"SELECT * FROM out{lvl}"
                               for lvl in range(len(resolutions)))
    return f"""
        WITH RECURSIVE {_corpus_cte()},
        eord AS MATERIALIZED (
            SELECT src, dst, rel_type,
                   row_number() OVER (ORDER BY src, dst, rel_type) - 1 AS i
            FROM (SELECT src, dst, rel_type FROM kgx_edge_agg
                  ORDER BY src, dst, rel_type LIMIT {limit})
        ),
        simnodes AS MATERIALIZED (SELECT 'r' || i AS canonical_id
                                  FROM eord),
        simedges AS MATERIALIZED (
            SELECT 'r' || a.i AS src, 'r' || b.i AS dst
            FROM eord a JOIN eord b ON a.rel_type = b.rel_type
                                   AND a.i < b.i
        ),
        {",".join(blocks)},
        {",".join(outs)}
        {union}
    """


def _leiden_label_cte(sfx: str, out_name: str) -> str:
    """Python-exact LABEL replay appended after _leiden_replay's CTEs
    (graph/leiden.rs refinement as transcribed by _leiden_partition):
    local-move labels are the 1-based idx labels minus 1 (the dynamics
    are label-shift invariant: comparisons and sorted candidate order
    survive the +1, asserted by the partition-equality oracles); the
    refinement then walks communities in sorted-label order and gives the
    components of each SPLIT community (ordered by min member) ids
    max_so_far + j + 1 — a running max that equals
    max0 + (cumulative component count of earlier splits), replayed with
    window functions. Emits ``{out_name}(canonical_id, label)``."""
    return f"""
        comp0{sfx} AS MATERIALIZED (
            SELECT a.idx, a.canonical_id, a.comm - 1 AS pylabel, c.rootidx
            FROM lasg{sfx} a JOIN lcomp{sfx} c ON c.idx = a.idx),
        ncomp{sfx} AS MATERIALIZED (
            SELECT pylabel, count(DISTINCT rootidx) AS k
            FROM comp0{sfx} GROUP BY pylabel),
        maxl{sfx} AS (SELECT max(pylabel) AS m0 FROM comp0{sfx}),
        splits{sfx} AS MATERIALIZED (
            SELECT pylabel, k,
                   coalesce(sum(k) OVER (ORDER BY pylabel
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS prior
            FROM ncomp{sfx} WHERE k > 1),
        compidx{sfx} AS MATERIALIZED (
            SELECT d.pylabel, d.rootidx,
                   row_number() OVER (PARTITION BY d.pylabel
                                      ORDER BY d.rootidx) - 1 AS j
            FROM (SELECT DISTINCT pylabel, rootidx FROM comp0{sfx}) d
            JOIN splits{sfx} s ON s.pylabel = d.pylabel),
        {out_name} AS MATERIALIZED (
            SELECT c0.canonical_id,
                   CASE WHEN s.pylabel IS NULL THEN c0.pylabel
                        ELSE m.m0 + s.prior + ci.j + 1 END AS label
            FROM comp0{sfx} c0
            LEFT JOIN splits{sfx} s ON s.pylabel = c0.pylabel
            LEFT JOIN compidx{sfx} ci ON ci.pylabel = c0.pylabel
                                     AND ci.rootidx = c0.rootidx
            CROSS JOIN maxl{sfx} m)
    """


def syn_leiden_l1_sql() -> str:
    """Hierarchical Leiden LEVEL 1 over the syn graph: level-0 labels
    replayed exactly (_leiden_label_cte), communities contracted into
    'c{label}' supernodes with inter-community edge multiplicity
    (stages/community._contract), a second recursive-CTE local-move +
    refinement over the contracted graph (its lexicographic 'c{n}' node
    ordering matches the task's sorted() over those names), and the
    resulting per-entity level-1 partition canonicalized to min member
    entity_id. Emits rows only when the level-0 partition strictly
    coarsens (1 < n_comms < n_nodes) — the same gate detect_communities
    applies before running a next level."""
    return f"""
        {_full_cte()},
        {_leiden_l1_tail('canonf', 'edge_agg')}
    """


def _leiden_l1_tail(nodes_rel: str, edges_rel: str) -> str:
    """Level-1 replay tail shared by the syn / kgx / kg corpora: exact
    level-0 label replay, contraction into 'c{label}' supernodes, second
    local-move replay, min-member canonicalization, coarsening gate."""
    return f"""
        {_leiden_replay(nodes_rel, edges_rel, sfx='_l0', as_cte='lp0')},
        {_leiden_label_cte('_l0', 'lab0')},
        l1gate AS (
            SELECT count(DISTINCT label) AS nc, count(*) AS nn FROM lab0),
        l1nodes AS MATERIALIZED (
            SELECT DISTINCT 'c' || label AS canonical_id FROM lab0),
        l1edges AS MATERIALIZED (
            SELECT 'c' || la.label AS src, 'c' || lb.label AS dst
            FROM {edges_rel} e
            JOIN lab0 la ON la.canonical_id = e.src
            JOIN lab0 lb ON lb.canonical_id = e.dst
            WHERE la.label <> lb.label),
        {_leiden_replay('l1nodes', 'l1edges', sfx='_l1', as_cte='lp1')},
        ent1 AS (
            SELECT l.canonical_id AS entity_id, lp1.community_rep AS srep
            FROM lab0 l JOIN lp1 ON lp1.entity_id = 'c' || l.label)
        SELECT entity_id,
               min(entity_id) OVER (PARTITION BY srep) AS community_rep
        FROM ent1
        WHERE (SELECT nc FROM l1gate) > 1
          AND (SELECT nc FROM l1gate) < (SELECT nn FROM l1gate)
    """


def kg_leiden_l1_sql() -> str:
    """Hierarchical Leiden LEVEL 1 over the chunked flagship graph."""
    return f"""
        {_kg_full_cte()},
        {_leiden_l1_tail('canonf', 'edge_agg')}
    """


def kgx_leiden_l1_sql() -> str:
    """Hierarchical Leiden LEVEL 1 over the kgx corpus graph — same
    replay as syn_leiden_l1_sql composed with kgx's canon/kgx_edge_agg."""
    from .kgx import _corpus_cte

    return f"""
        WITH RECURSIVE {_corpus_cte()},
        {_leiden_l1_tail('canon', 'kgx_edge_agg')}
    """


def syn_leiden_l2_sql() -> str:
    """Hierarchical Leiden LEVEL 2 over the syn graph — the last rung of
    detect_communities' max_levels=3: exact level-0 and level-1 label
    replays, two contractions, three suffixed recursive-CTE local-move
    replays. Emits rows only when BOTH the level-0 and level-1 partitions
    strictly coarsen (the stage's continuation gate, applied per level).
    On the fixture corpora level 1 collapses to a single community, so
    both sides must agree on an EMPTY result — the oracle pins the
    hierarchy's termination: a stage bug that produced a third level (or
    an oracle bug that faked one) fails the row-count compare."""
    return f"""
        {_full_cte()},
        {_leiden_replay('canonf', 'edge_agg', sfx='_l0', as_cte='lp0')},
        {_leiden_label_cte('_l0', 'lab0')},
        l1gate AS (
            SELECT count(DISTINCT label) AS nc, count(*) AS nn FROM lab0),
        l1nodes AS MATERIALIZED (
            SELECT DISTINCT 'c' || label AS canonical_id FROM lab0),
        l1edges AS MATERIALIZED (
            SELECT 'c' || la.label AS src, 'c' || lb.label AS dst
            FROM edge_agg e
            JOIN lab0 la ON la.canonical_id = e.src
            JOIN lab0 lb ON lb.canonical_id = e.dst
            WHERE la.label <> lb.label),
        {_leiden_replay('l1nodes', 'l1edges', sfx='_l1', as_cte='lp1')},
        {_leiden_label_cte('_l1', 'lab1')},
        l2gate AS (
            SELECT count(DISTINCT label) AS nc, count(*) AS nn FROM lab1),
        l2nodes AS MATERIALIZED (
            SELECT DISTINCT 'c' || label AS canonical_id FROM lab1),
        l2edges AS MATERIALIZED (
            SELECT 'c' || la.label AS src, 'c' || lb.label AS dst
            FROM l1edges e
            JOIN lab1 la ON la.canonical_id = e.src
            JOIN lab1 lb ON lb.canonical_id = e.dst
            WHERE la.label <> lb.label),
        {_leiden_replay('l2nodes', 'l2edges', sfx='_l2', as_cte='lp2')},
        ent2 AS (
            SELECT l0.canonical_id AS entity_id, lp2.community_rep AS srep
            FROM lab0 l0
            JOIN lab1 l1 ON l1.canonical_id = 'c' || l0.label
            JOIN lp2 ON lp2.entity_id = 'c' || l1.label)
        SELECT entity_id,
               min(entity_id) OVER (PARTITION BY srep) AS community_rep
        FROM ent2
        WHERE (SELECT nc FROM l1gate) > 1
          AND (SELECT nc FROM l1gate) < (SELECT nn FROM l1gate)
          AND (SELECT nc FROM l2gate) > 1
          AND (SELECT nc FROM l2gate) < (SELECT nn FROM l2gate)
    """

def _hier_leiden_ctes(nodes_rel: str, edges_rel: str) -> str:
    """The full hierarchical-Leiden label chain (levels 0..2 with the
    detect_communities coarsening gates) as shared CTEs: lab0/lab1/lab2
    carry the RAW integer community labels the Python stage assigns
    (label replay, not just partition equality), l1gate/l2gate the
    strict-coarsening conditions."""
    return f"""
        {_leiden_replay(nodes_rel, edges_rel, sfx='_l0', as_cte='lp0')},
        {_leiden_label_cte('_l0', 'lab0')},
        l1gate AS (
            SELECT count(DISTINCT label) AS nc, count(*) AS nn FROM lab0),
        l1nodes AS MATERIALIZED (
            SELECT DISTINCT 'c' || label AS canonical_id FROM lab0),
        l1edges AS MATERIALIZED (
            SELECT 'c' || la.label AS src, 'c' || lb.label AS dst
            FROM {edges_rel} e
            JOIN lab0 la ON la.canonical_id = e.src
            JOIN lab0 lb ON lb.canonical_id = e.dst
            WHERE la.label <> lb.label),
        {_leiden_replay('l1nodes', 'l1edges', sfx='_l1', as_cte='lp1')},
        {_leiden_label_cte('_l1', 'lab1')},
        l2gate AS (
            SELECT count(DISTINCT label) AS nc, count(*) AS nn FROM lab1),
        l2nodes AS MATERIALIZED (
            SELECT DISTINCT 'c' || label AS canonical_id FROM lab1),
        l2edges AS MATERIALIZED (
            SELECT 'c' || la.label AS src, 'c' || lb.label AS dst
            FROM l1edges e
            JOIN lab1 la ON la.canonical_id = e.src
            JOIN lab1 lb ON lb.canonical_id = e.dst
            WHERE la.label <> lb.label),
        {_leiden_replay('l2nodes', 'l2edges', sfx='_l2', as_cte='lp2')},
        {_leiden_label_cte('_l2', 'lab2')},
        memb AS (
            SELECT 0 AS level, l0.label::BIGINT AS community_id,
                   l0.canonical_id AS entity_id
            FROM lab0 l0
            UNION ALL
            SELECT 1, l1.label::BIGINT, l0.canonical_id
            FROM lab0 l0
            JOIN lab1 l1 ON l1.canonical_id = 'c' || l0.label
            WHERE (SELECT nc FROM l1gate) > 1
              AND (SELECT nc FROM l1gate) < (SELECT nn FROM l1gate)
            UNION ALL
            SELECT 2, l2.label::BIGINT, l0.canonical_id
            FROM lab0 l0
            JOIN lab1 l1 ON l1.canonical_id = 'c' || l0.label
            JOIN lab2 l2 ON l2.canonical_id = 'c' || l1.label
            WHERE (SELECT nc FROM l1gate) > 1
              AND (SELECT nc FROM l1gate) < (SELECT nn FROM l1gate)
              AND (SELECT nc FROM l2gate) > 1
              AND (SELECT nc FROM l2gate) < (SELECT nn FROM l2gate))
    """


_COMMUNITIES_FINAL = """
        SELECT level, community_id, entity_id FROM memb
    """


def _community_summaries_final(nodes_rel: str, max_length: int = 2000
                               ) -> str:
    """The A9 summarizer's exact string format over every level's RAW
    label partition (stages/community._summaries): header lines, per-type
    '- TYPE: first5-in-member-order[ and N more]' sorted by type, members
    sorted by entity id, >max_length truncated to max_length-3 + '...'."""
    return f""",
        membm AS (
            SELECT m.level, m.community_id, m.entity_id,
                   c.canonical_name AS name, c.entity_type
            FROM memb m JOIN {nodes_rel} c
              ON c.canonical_id = m.entity_id),
        tline AS (
            SELECT level, community_id, entity_type,
                   '- ' || entity_type || ': '
                   || array_to_string(
                          (list(name ORDER BY entity_id))[1:5], ', ')
                   || CASE WHEN count(*) > 5
                           THEN ' and ' || (count(*) - 5) || ' more'
                           ELSE '' END AS line
            FROM membm GROUP BY 1, 2, 3),
        body AS (
            SELECT level, community_id,
                   array_to_string(list(line ORDER BY entity_type), chr(10))
                       AS tlines
            FROM tline GROUP BY 1, 2),
        head AS (
            SELECT level, community_id, count(*)::BIGINT AS entity_count
            FROM membm GROUP BY 1, 2),
        fullsum AS (
            SELECT h.level, h.community_id, h.entity_count,
                   'Community ' || h.community_id || ' (Level ' || h.level
                   || ')' || chr(10) || 'Contains ' || h.entity_count
                   || ' entities:' || chr(10) || b.tlines AS summary
            FROM head h JOIN body b USING (level, community_id))
        SELECT level, community_id,
               CASE WHEN length(summary) > {max_length}
                    THEN substr(summary, 1, {max_length - 3}) || '...'
                    ELSE summary END AS summary,
               entity_count
        FROM fullsum
    """


def kg_communities_sql() -> str:
    """detect_communities VERBATIM over the chunked flagship graph: every
    hierarchical level's (level, community_id, entity_id) rows with the
    stage's RAW integer labels (label replay, coarsening gates included)."""
    return f"""
        {_kg_full_cte()},
        {_hier_leiden_ctes('canonf', 'edge_agg')}
        {_COMMUNITIES_FINAL}
    """


def kg_community_summaries_sql() -> str:
    """A9 extractive community summaries over the chunked flagship graph —
    format-exact at every hierarchical level."""
    return f"""
        {_kg_full_cte()},
        {_hier_leiden_ctes('canonf', 'edge_agg')}
        {_community_summaries_final('canonf')}
    """


# ---------------------------------------------------------------------------
# triangle / k-core twins (round-4 additions, shared across both corpora)


def _triangles_replay(nodes_rel: str, edges_rel: str) -> str:
    """Per-node triangle participation replay: the simple undirected graph
    (distinct least/greatest endpoint pairs, self-loops dropped), each
    triangle x<y<z enumerated once via edges (x,y),(y,z),(x,z)."""
    return f"""
        simple AS MATERIALIZED (
          SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          FROM {edges_rel} WHERE src <> dst),
        tri AS (
          SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM simple e1
          JOIN simple e2 ON e2.a = e1.b
          JOIN simple e3 ON e3.a = e1.a AND e3.b = e2.b),
        member AS (
          SELECT x AS node FROM tri
          UNION ALL SELECT y AS node FROM tri
          UNION ALL SELECT z AS node FROM tri),
        tcnt AS (SELECT node, count(*) AS n FROM member GROUP BY node)
        SELECT nn.canonical_id AS entity_id,
               coalesce(tcnt.n, 0)::BIGINT AS n_triangles
        FROM {nodes_rel} nn LEFT JOIN tcnt ON tcnt.node = nn.canonical_id
    """


def _kcore_replay(nodes_rel: str, edges_rel: str, k: int = 2,
                  rounds: int | None = None) -> str:
    """k-core peel unrolled to ``rounds`` — defaults to the SAME constant
    the Python stage peels under (graph_analytics.KCORE_MAX_ROUNDS), so
    the two sides cannot silently drift apart; the stage raises if a graph
    needs more rounds than the shared bound.
    Every round's survivor set is MATERIALIZED — each is referenced twice
    by the next round's degree count, and inlining would double the plan
    per round."""
    if rounds is None:
        from .stages.graph_analytics import KCORE_MAX_ROUNDS
        rounds = KCORE_MAX_ROUNDS
    parts = [f"""
        kund AS MATERIALIZED (
          SELECT least(src, dst) AS a, greatest(src, dst) AS b
          FROM {edges_rel} WHERE src <> dst GROUP BY 1, 2),
        r0 AS MATERIALIZED (SELECT canonical_id AS node FROM {nodes_rel})"""]
    prev = "r0"
    for i in range(1, rounds + 1):
        parts.append(f""",
        d{i} AS MATERIALIZED (
          SELECT node, count(*) AS c FROM (
            SELECT u.a AS node FROM kund u
            JOIN {prev} x ON u.a = x.node JOIN {prev} y ON u.b = y.node
            UNION ALL
            SELECT u.b AS node FROM kund u
            JOIN {prev} x ON u.a = x.node JOIN {prev} y ON u.b = y.node
          ) AS m GROUP BY node),
        r{i} AS MATERIALIZED (SELECT node FROM d{i} WHERE c >= {k})""")
        prev = f"r{i}"
    parts.append(f"""
        SELECT node AS entity_id, c::BIGINT AS core_degree
        FROM d{rounds} WHERE node IN (SELECT node FROM r{rounds})""")
    return "".join(parts)


def syn_triangles_sql() -> str:
    """Per-node triangle counts over the replayed syn graph."""
    return f"""
        {_full_cte()},
        {_triangles_replay('canonf', 'edge_agg')}
    """


def kgx_triangles_sql() -> str:
    """Per-node triangle counts over the kgx oracle corpus graph."""
    from .kgx import _corpus_cte

    return f"""
        WITH RECURSIVE {_corpus_cte()},
        {_triangles_replay('canon', 'kgx_edge_agg')}
    """


def syn_kcore_sql(k: int = 2) -> str:
    """k-core membership + within-core degree over the syn graph."""
    return f"""
        {_full_cte()},
        {_kcore_replay('canonf', 'edge_agg', k=k)}
    """


def kgx_kcore_sql(k: int = 2) -> str:
    """k-core membership + within-core degree over the kgx graph."""
    from .kgx import _corpus_cte

    return f"""
        WITH RECURSIVE {_corpus_cte()},
        {_kcore_replay('canon', 'kgx_edge_agg', k=k)}
    """


def _link_pred_replay(nodes_rel: str, edges_rel: str) -> str:
    """Common-neighbor / Adamic-Adar replay: non-adjacent ordered pairs
    scored over the simple undirected graph. A common neighbor always has
    degree >= 2, so 1/ln(deg) is well-defined."""
    return f"""
        simple AS MATERIALIZED (
          SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          FROM {edges_rel} WHERE src <> dst),
        lp_deg AS (SELECT node, count(*) AS d FROM (
            SELECT a AS node FROM simple
            UNION ALL SELECT b AS node FROM simple) AS m GROUP BY 1),
        lp_nbr AS (SELECT a AS x, b AS y FROM simple
                   UNION ALL SELECT b AS x, a AS y FROM simple),
        lp_cand AS (
          SELECT n1.x AS a, n2.x AS b, n1.y AS c
          FROM lp_nbr n1 JOIN lp_nbr n2
            ON n1.y = n2.y AND n1.x < n2.x),
        lp_nonadj AS (
          SELECT lp_cand.a, lp_cand.b, lp_cand.c FROM lp_cand
          LEFT JOIN simple s ON s.a = lp_cand.a AND s.b = lp_cand.b
          WHERE s.a IS NULL)
        SELECT na.a AS src, na.b AS dst, count(*)::BIGINT AS n_common,
               round(sum(1.0 / ln(d.d)), 4) AS adamic_adar
        FROM lp_nonadj na JOIN lp_deg d ON d.node = na.c
        GROUP BY 1, 2
    """


def _lpa_replay(nodes_rel: str, edges_rel: str, rounds: int = 8) -> str:
    """Synchronous label-propagation replay, exactly ``rounds`` rounds
    (stages/graph_analytics._lpa_task runs the same fixed count): per
    round every node takes the most frequent previous-round neighbor
    label, ties to the minimum; isolated nodes keep their own."""
    parts = [f"""
        lsimple AS MATERIALIZED (
          SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          FROM {edges_rel} WHERE src <> dst),
        lund AS MATERIALIZED (
          SELECT a AS x, b AS y FROM lsimple
          UNION ALL SELECT b AS x, a AS y FROM lsimple),
        l0 AS MATERIALIZED (
          SELECT canonical_id AS node, canonical_id AS label
          FROM {nodes_rel})"""]
    prev = "l0"
    for i in range(1, rounds + 1):
        parts.append(f""",
        cand{i} AS (
          SELECT u.x AS node, l.label, count(*) AS c
          FROM lund u JOIN {prev} l ON l.node = u.y GROUP BY 1, 2),
        best{i} AS (
          SELECT node, label FROM (
            SELECT node, label, row_number() OVER (
                PARTITION BY node ORDER BY c DESC, label ASC) AS rn
            FROM cand{i}) AS r WHERE rn = 1),
        l{i} AS MATERIALIZED (
          SELECT p.node, coalesce(b.label, p.label) AS label
          FROM {prev} p LEFT JOIN best{i} b ON b.node = p.node)""")
        prev = f"l{i}"
    parts.append(f"""
        SELECT node AS entity_id, label FROM {prev}""")
    return "".join(parts)


def syn_link_pred_sql() -> str:
    """Adamic-Adar link prediction over the replayed syn graph."""
    return f"""
        {_full_cte()},
        {_link_pred_replay('canonf', 'edge_agg')}
    """


def kgx_link_pred_sql() -> str:
    """Adamic-Adar link prediction over the kgx graph."""
    from .kgx import _corpus_cte

    return f"""
        WITH RECURSIVE {_corpus_cte()},
        {_link_pred_replay('canon', 'kgx_edge_agg')}
    """


def syn_lpa_sql() -> str:
    """Synchronous LPA communities over the replayed syn graph."""
    return f"""
        {_full_cte()},
        {_lpa_replay('canonf', 'edge_agg')}
    """


def kgx_lpa_sql() -> str:
    """Synchronous LPA communities over the kgx graph."""
    from .kgx import _corpus_cte

    return f"""
        WITH RECURSIVE {_corpus_cte()},
        {_lpa_replay('canon', 'kgx_edge_agg')}
    """


def _ecc_replay(nodes_rel: str, edges_rel: str, max_depth: int = 16) -> str:
    """Eccentricity replay: bounded BFS as a recursive CTE over (src,
    dst, depth) triples — min depth per pair, max per source. The depth
    bound makes the cyclic recursion terminate; the Python stage shares
    it (stages/graph_analytics._ecc_task)."""
    return f"""
        esimple AS MATERIALIZED (
          SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          FROM {edges_rel} WHERE src <> dst),
        eund AS MATERIALIZED (
          SELECT a AS x, b AS y FROM esimple
          UNION ALL SELECT b AS x, a AS y FROM esimple),
        walk(a, b, d) AS (
          SELECT canonical_id, canonical_id, 0 FROM {nodes_rel}
          UNION
          SELECT w.a, u.y, w.d + 1
          FROM walk w JOIN eund u ON u.x = w.b
          WHERE w.d < {max_depth}),
        edist AS (SELECT a, b, min(d) AS dmin FROM walk GROUP BY 1, 2)
        SELECT a AS entity_id, max(dmin)::BIGINT AS eccentricity
        FROM edist GROUP BY a
    """


def syn_eccentricity_sql() -> str:
    """Per-node eccentricity over the replayed syn graph."""
    return f"""
        {_full_cte()},
        {_ecc_replay('canonf', 'edge_agg')}
    """


def kgx_eccentricity_sql() -> str:
    """Per-node eccentricity over the kgx graph."""
    from .kgx import _corpus_cte

    return f"""
        WITH RECURSIVE {_corpus_cte()},
        {_ecc_replay('canon', 'kgx_edge_agg')}
    """


def _assortativity_replay(nodes_rel: str, edges_rel: str) -> str:
    """Degree-assortativity replay: integer sums over the simple graph,
    one float expression at the end written operation-for-operation as the
    Python stage computes it (x/m2 divisions then products)."""
    return f"""
        asimple AS MATERIALIZED (
          SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
          FROM {edges_rel} WHERE src <> dst),
        adeg AS (SELECT node, count(*) AS d FROM (
            SELECT a AS node FROM asimple
            UNION ALL SELECT b AS node FROM asimple) AS m GROUP BY 1),
        asums AS (
          SELECT 2 * count(*) AS m2,
                 coalesce(2 * sum(da.d * db.d), 0) AS s_jk,
                 coalesce(sum(da.d + db.d), 0) AS s_sum,
                 coalesce(sum(da.d * da.d + db.d * db.d), 0) AS s_sq
          FROM asimple e
          JOIN adeg da ON da.node = e.a
          JOIN adeg db ON db.node = e.b)
        SELECT (m2 / 2)::BIGINT AS n_edges,
               CASE WHEN m2 = 0 OR
                         (s_sq::DOUBLE / m2
                          - (s_sum::DOUBLE / m2) * (s_sum::DOUBLE / m2)) = 0
                    THEN 0.0
                    ELSE round(
                      (s_jk::DOUBLE / m2
                       - (s_sum::DOUBLE / m2) * (s_sum::DOUBLE / m2))
                      / (s_sq::DOUBLE / m2
                         - (s_sum::DOUBLE / m2) * (s_sum::DOUBLE / m2)), 4)
               END AS assortativity
        FROM asums
    """


def syn_assortativity_sql() -> str:
    """Degree assortativity over the replayed syn graph."""
    return f"""
        {_full_cte()},
        {_assortativity_replay('canonf', 'edge_agg')}
    """


def kgx_assortativity_sql() -> str:
    """Degree assortativity over the kgx graph."""
    from .kgx import _corpus_cte

    return f"""
        WITH RECURSIVE {_corpus_cte()},
        {_assortativity_replay('canon', 'kgx_edge_agg')}
    """


def syn_component_sizes_sql() -> str:
    """Component-size histogram over the replayed syn graph (composed
    from the oracled components replay)."""
    return f"""
        WITH comp AS ({syn_components_sql()}),
        s AS (SELECT component, count(*) AS sz FROM comp GROUP BY 1)
        SELECT sz::BIGINT AS size, count(*)::BIGINT AS n_components
        FROM s GROUP BY 1
    """


def kgx_component_sizes_sql() -> str:
    """Component-size histogram over the kgx graph."""
    from .kgx import kgx_components_sql

    return f"""
        WITH comp AS ({kgx_components_sql()}),
        s AS (SELECT component, count(*) AS sz FROM comp GROUP BY 1)
        SELECT sz::BIGINT AS size, count(*)::BIGINT AS n_components
        FROM s GROUP BY 1
    """


def _hits_replay(nodes_rel: str, edges_rel: str, iters: int = 8) -> str:
    """HITS replay mirroring stages/graph_analytics._hits_task: directed
    edges (multiplicity kept, self-loops and FK-dangling endpoints
    dropped), unnormalized power iteration — auth ← Σ_in hub_old,
    hub ← Σ_out auth_new (a two-hop sum over hub_old) — with one L1
    normalization at the very end. Every intermediate is an exact sum of
    products, so the only divergence from the numpy task is float
    summation order (absorbed by round4).

    DuckDB 1.0 quirk (measured): a CTE referenced ONLY from inside a
    recursive part scans empty when the defining chain is deep; the seed
    therefore consumes ``hedges`` through a no-op scalar term
    (+ 0.0 * count) to force its materialization before recursion — the
    same reason syn_pagerank_sql's working ``dirs`` is consumed by its
    ``oinv`` sibling."""
    return f"""
        hedges AS MATERIALIZED (
          SELECT e.src AS a, e.dst AS b
          FROM {edges_rel} e
          JOIN {nodes_rel} na ON na.canonical_id = e.src
          JOIN {nodes_rel} nb ON nb.canonical_id = e.dst
          WHERE e.src <> e.dst),
        hits(iter, node, auth, hub) AS (
          SELECT 0, canonical_id,
                 1.0::DOUBLE + 0.0 * (SELECT count(*) FROM hedges),
                 1.0::DOUBLE
          FROM {nodes_rel}
          UNION ALL
          SELECT h.iter + 1, h.node,
                 coalesce((SELECT sum(q.hub) FROM hits q
                           JOIN hedges e ON e.a = q.node
                           WHERE e.b = h.node), 0.0),
                 coalesce((SELECT sum(q2.hub) FROM hedges e1
                           JOIN hedges e2 ON e2.b = e1.b
                           JOIN hits q2 ON q2.node = e2.a
                           WHERE e1.a = h.node), 0.0)
          FROM hits h WHERE h.iter < {iters}),
        hlast AS (SELECT node, auth, hub FROM hits
                  WHERE iter = (SELECT max(iter) FROM hits)),
        hnorm AS (SELECT sum(auth) AS sa, sum(hub) AS sh FROM hlast)
        SELECT node AS entity_id,
               round(CASE WHEN sa > 0 THEN auth / sa ELSE auth END,
                     4) AS authority,
               round(CASE WHEN sh > 0 THEN hub / sh ELSE hub END,
                     4) AS hub
        FROM hlast CROSS JOIN hnorm
    """


def syn_hits_sql() -> str:
    """HITS hubs/authorities over the replayed syn graph."""
    return f"""
        {_full_cte()},
        {_hits_replay('canonf', 'edge_agg')}
    """


def kgx_hits_sql() -> str:
    """HITS hubs/authorities over the kgx graph."""
    from .kgx import _corpus_cte

    return f"""
        WITH RECURSIVE {_corpus_cte()},
        {_hits_replay('canon', 'kgx_edge_agg')}
    """
