"""DuckDB oracle SQL for the training-data curation surfaces.

Each function returns ANSI-ish DuckDB SQL replaying the corresponding
``stages/curation.py`` operator exactly — same md5-derived PII injection
spec, same RE2 regexes (DuckDB and pyarrow both use RE2), same split /
shingle / sampling arithmetic. Integer and string output columns only,
so the driver's sorted value-hash compare is exact.
"""

from __future__ import annotations

from .stages.curation import (
    BENCH_MOD,
    DECONTAM_NGRAM,
    EMAIL_RE,
    IPV4_RE,
    PHONE_RE,
    SAMPLE_PER_LANG,
    SPLIT_TRAIN_PCT,
    SPLIT_VALID_PCT,
)

_TOKS = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"

# the PII-injected twin of each document (mirror of curation._pii_parts +
# curation.inject_pii — ' '.join of the present parts)
_PII_CTE = """
    hx AS (SELECT doc_id, text, md5(doc_id::VARCHAR) AS h FROM documents),
    px AS (SELECT doc_id, text,
                  ('0x' || substr(h, 1, 2))::INT AS a,
                  ('0x' || substr(h, 3, 2))::INT AS b,
                  ('0x' || substr(h, 5, 2))::INT AS c,
                  ('0x' || substr(h, 7, 2))::INT AS d
           FROM hx),
    pii AS (SELECT doc_id,
                   text
                   || CASE WHEN a % 3 <> 0
                           THEN ' contact user' || a || '@mail' || (b % 10)
                                || '.example.com'
                           ELSE '' END
                   || CASE WHEN b % 3 <> 0
                           THEN ' tel 555-' || lpad((a % 1000)::VARCHAR, 3, '0')
                                || '-' || lpad(((b * 256 + c) % 10000)::VARCHAR, 4, '0')
                           ELSE '' END
                   || CASE WHEN c % 3 <> 0
                           THEN ' host ' || a || '.' || b || '.' || c || '.' || d
                           ELSE '' END
                   AS pii_text
            FROM px)
"""


def pii_detect_sql() -> str:
    return f"""
        WITH {_PII_CTE},
        cnt AS (
          SELECT doc_id,
                 length(regexp_extract_all(pii_text, '{EMAIL_RE}'))::BIGINT AS n_emails,
                 length(regexp_extract_all(pii_text, '{PHONE_RE}'))::BIGINT AS n_phones,
                 length(regexp_extract_all(pii_text, '{IPV4_RE}'))::BIGINT AS n_ipv4
          FROM pii)
        SELECT doc_id, n_emails, n_phones, n_ipv4,
               (n_emails + n_phones + n_ipv4) > 0 AS has_pii
        FROM cnt
    """


def pii_redacted_sql() -> str:
    return f"""
        WITH {_PII_CTE}
        SELECT doc_id,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(pii_text, '{EMAIL_RE}', '[EMAIL]', 'g'),
                   '{PHONE_RE}', '[PHONE]', 'g'),
                 '{IPV4_RE}', '[IP]', 'g') AS redacted
        FROM pii
    """


def doc_split_sql() -> str:
    return f"""
        WITH b AS (
          SELECT doc_id,
                 ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS bucket
          FROM documents)
        SELECT doc_id, bucket,
               CASE WHEN bucket < {SPLIT_TRAIN_PCT} THEN 'train'
                    WHEN bucket < {SPLIT_VALID_PCT} THEN 'valid'
                    ELSE 'test' END AS split
        FROM b
    """


def doc_repetition_sql() -> str:
    return f"""
        WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        base AS (SELECT doc_id, t, array_length(t) AS n FROM toks),
        tok_counts AS (
          SELECT doc_id, tok, count(*) AS c
          FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
          GROUP BY doc_id, tok),
        top_tok AS (SELECT doc_id, max(c) AS top_token_count
                    FROM tok_counts GROUP BY doc_id),
        grams AS (
          SELECT doc_id, t[i] || ' ' || t[i + 1] AS g
          FROM base, unnest(generate_series(1, n - 1)) AS s(i)),
        gram_counts AS (SELECT doc_id, g, count(*) AS c
                        FROM grams GROUP BY doc_id, g),
        gstats AS (SELECT doc_id, count(*) AS n_uniq_2grams,
                          max(c) AS top_2gram_count
                   FROM gram_counts GROUP BY doc_id)
        SELECT b.doc_id,
               b.n::BIGINT AS n_tokens,
               coalesce(tt.top_token_count, 0)::BIGINT AS top_token_count,
               greatest(b.n - 1, 0)::BIGINT AS n_2grams,
               coalesce(g.n_uniq_2grams, 0)::BIGINT AS n_uniq_2grams,
               coalesce(g.top_2gram_count, 0)::BIGINT AS top_2gram_count
        FROM base b
        LEFT JOIN top_tok tt USING (doc_id)
        LEFT JOIN gstats g USING (doc_id)
    """


def _shingle_expr() -> str:
    parts = " || ' ' || ".join(f"t[i + {k}]" for k in range(DECONTAM_NGRAM))
    return parts.replace("t[i + 0]", "t[i]")


def doc_decontam_sql() -> str:
    return f"""
        WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        base AS (SELECT doc_id, t, array_length(t) AS n FROM toks),
        sh AS (
          SELECT DISTINCT doc_id, {_shingle_expr()} AS s
          FROM base, unnest(generate_series(1, n - {DECONTAM_NGRAM - 1})) AS q(i)),
        bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % {BENCH_MOD} = 0),
        train AS (SELECT doc_id, s FROM sh WHERE doc_id % {BENCH_MOD} <> 0),
        cnt AS (
          SELECT doc_id, count(*) AS n_shingles,
                 sum(CASE WHEN s IN (SELECT s FROM bench) THEN 1 ELSE 0 END)
                     AS n_contaminated
          FROM train GROUP BY doc_id)
        SELECT d.doc_id,
               coalesce(c.n_shingles, 0)::BIGINT AS n_shingles,
               coalesce(c.n_contaminated, 0)::BIGINT AS n_contaminated,
               coalesce(c.n_contaminated, 0) > 0 AS is_contaminated
        FROM documents d LEFT JOIN cnt c USING (doc_id)
        WHERE d.doc_id % {BENCH_MOD} <> 0
    """


def source_stats_sql() -> str:
    return f"""
        SELECT source,
               count(*)::BIGINT AS n_docs,
               sum(length(text))::BIGINT AS n_chars,
               sum(array_length({_TOKS}))::BIGINT AS n_tokens,
               count(DISTINCT lang)::BIGINT AS n_langs
        FROM documents GROUP BY source
    """


def lang_sample_sql() -> str:
    return f"""
        SELECT lang, doc_id,
               row_number() OVER (
                 PARTITION BY lang
                 ORDER BY md5(doc_id::VARCHAR), doc_id)::BIGINT AS sample_rank
        FROM documents
        QUALIFY sample_rank <= {SAMPLE_PER_LANG}
    """


def doc_filter_verdict_sql() -> str:
    from .stages.curation import (
        FILTER_MAX_MEAN_LEN,
        FILTER_MAX_TOKENS,
        FILTER_MIN_MEAN_LEN,
        FILTER_MIN_TOKENS,
        FILTER_STOPWORDS,
        FILTER_TOP_TOKEN_PCT,
    )

    stop_in = "(" + ",".join(f"'{w}'" for w in FILTER_STOPWORDS) + ")"
    return f"""
        WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        base AS (
          SELECT doc_id, t, array_length(t) AS n,
                 coalesce(list_sum(list_transform(t, x -> length(x))), 0) AS sum_len,
                 array_length(list_filter(t, x -> x IN {stop_in})) AS n_stop
          FROM toks),
        top AS (
          SELECT doc_id, max(c) AS top_count
          FROM (SELECT doc_id, tok, count(*) AS c
                FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
                GROUP BY doc_id, tok)
          GROUP BY doc_id),
        v AS (
          SELECT b.doc_id, b.n,
                 CASE WHEN b.n < {FILTER_MIN_TOKENS} THEN 'too_short'
                      WHEN b.n > {FILTER_MAX_TOKENS} THEN 'too_long'
                      WHEN coalesce(tp.top_count, 0) * {FILTER_TOP_TOKEN_PCT} > b.n
                           THEN 'repetitive'
                      WHEN b.sum_len < {FILTER_MIN_MEAN_LEN} * b.n
                           OR b.sum_len > {FILTER_MAX_MEAN_LEN} * b.n
                           THEN 'word_length'
                      WHEN b.n_stop = 0 THEN 'no_stopword'
                      ELSE 'ok' END AS reason
          FROM base b LEFT JOIN top tp USING (doc_id))
        SELECT doc_id, n::BIGINT AS n_tokens, reason = 'ok' AS keep, reason
        FROM v
    """


def split_leakage_sql(simhash_pairs_sql: str) -> str:
    """Cross-split near-dup pairs: the SimHash pair oracle joined with
    the md5 hash-split expression on both endpoints."""
    return f"""
        WITH pairs AS ({simhash_pairs_sql}),
        sp AS (
          SELECT doc_id,
                 CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100
                           < {SPLIT_TRAIN_PCT} THEN 'train'
                      WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100
                           < {SPLIT_VALID_PCT} THEN 'valid'
                      ELSE 'test' END AS split
          FROM documents)
        SELECT p.doc_a, p.doc_b, p.hamming, sa.split AS split_a, sb.split AS split_b
        FROM pairs p
        JOIN sp sa ON sa.doc_id = p.doc_a
        JOIN sp sb ON sb.doc_id = p.doc_b
        WHERE sa.split <> sb.split
    """


def source_cap_sql(cap: int = 10) -> str:
    """Per-source cap twin: row_number over the same md5 draw."""
    return f"""
        WITH ranked AS (
          SELECT doc_id, source,
                 row_number() OVER (PARTITION BY source
                     ORDER BY md5('cap:' || doc_id), doc_id) AS rn
          FROM documents)
        SELECT doc_id, source FROM ranked WHERE rn <= {cap}
    """


def shard_assignment_sql() -> str:
    """Training-shard twin: same derived shard count (count(*) based),
    same salted md5 shard draw and within-shard order, row_number pos."""
    return """
        WITH n AS (
          SELECT greatest(4, count(*) // 1024 + 1) AS ns FROM documents),
        r AS (
          SELECT doc_id,
                 (('0x' || substr(md5('shard:v1:' || doc_id), 1, 8))::BIGINT
                  % (SELECT ns FROM n)) AS shard,
                 md5('order:v1:' || doc_id) AS oh
          FROM documents)
        SELECT doc_id, shard,
               row_number() OVER (PARTITION BY shard
                                  ORDER BY oh, doc_id)::BIGINT AS pos
        FROM r
    """


def shard_packing_sql(seqlen: int = 4096) -> str:
    """Packing twin: the shard-assignment CTE plus a windowed running
    token sum; seq_idx = tokens-before // seqlen (integer division on
    BIGINTs on both sides)."""
    toks = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"
    return f"""
        WITH ns AS (
          SELECT greatest(4, count(*) // 1024 + 1) AS n FROM documents),
        r AS (
          SELECT doc_id,
                 (('0x' || substr(md5('shard:v1:' || doc_id), 1, 8))::BIGINT
                  % (SELECT n FROM ns)) AS shard,
                 md5('order:v1:' || doc_id) AS oh,
                 coalesce(array_length({toks}), 0)::BIGINT AS n_tokens
          FROM documents),
        p AS (
          SELECT doc_id, shard, oh, n_tokens,
                 row_number() OVER (PARTITION BY shard
                                    ORDER BY oh, doc_id)::BIGINT AS pos
          FROM r),
        c AS (
          SELECT doc_id, shard, pos, n_tokens,
                 coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0)::BIGINT AS cum_before
          FROM p)
        SELECT doc_id, shard, pos, n_tokens, cum_before,
               (cum_before // {seqlen})::BIGINT AS seq_idx
        FROM c
    """


def doc_length_quantiles_sql() -> str:
    """Discrete length-quantile twin: integer nearest-rank
    (k = (n*qpct + 99) // 100 — same contract as the Ray side; avoids
    quantile_disc's implementation-defined float ties)."""
    return """
        WITH r AS (
          SELECT length(text) AS v,
                 row_number() OVER (ORDER BY length(text)) AS rn,
                 count(*) OVER () AS n
          FROM documents),
        qs AS (SELECT unnest([25, 50, 75, 90, 99]) AS qpct)
        SELECT qs.qpct / 100.0 AS q, r.v::BIGINT AS value
        FROM r JOIN qs ON r.rn = (r.n * qs.qpct + 99) // 100
    """


def gopher_quality_sql() -> str:
    """Gopher line-structure quality twin (stages/text_analysis.gopher_stats):
    every signal is an integer count and every threshold is integer
    cross-multiplied, so this replay is bit-exact."""
    from .stages.text_analysis import GOPHER_STOPWORDS

    stop_in = "(" + ",".join(f"'{w}'" for w in sorted(GOPHER_STOPWORDS)) + ")"
    return f"""
        WITH base AS (
          SELECT doc_id, text, {_TOKS} AS t,
                 string_split(text, chr(10)) AS lines
          FROM documents),
        c AS (
          SELECT doc_id,
                 coalesce(array_length(t), 0) AS n_words,
                 coalesce(list_sum(list_transform(t, x -> length(x))), 0)
                     AS sum_word_len,
                 coalesce(array_length(list_filter(t,
                     x -> regexp_matches(x, '[A-Za-z]'))), 0) AS n_alpha_words,
                 coalesce(array_length(list_filter(t,
                     x -> lower(x) IN {stop_in})), 0) AS n_stop_words,
                 coalesce(array_length(regexp_extract_all(text, '#')), 0)
                   + coalesce(array_length(regexp_extract_all(text, '\\.\\.\\.')), 0)
                     AS n_symbols,
                 array_length(lines) AS n_lines,
                 coalesce(array_length(list_filter(lines,
                     l -> regexp_matches(l, '^[ \t]*[-*•]'))), 0)
                     AS n_bullet_lines,
                 coalesce(array_length(list_filter(lines,
                     l -> regexp_matches(l, '\\.\\.\\.[ \t]*$'))), 0)
                     AS n_ellipsis_lines
          FROM base)
        SELECT doc_id,
               n_words::BIGINT AS n_words,
               sum_word_len::BIGINT AS sum_word_len,
               n_alpha_words::BIGINT AS n_alpha_words,
               n_stop_words::BIGINT AS n_stop_words,
               n_symbols::BIGINT AS n_symbols,
               n_lines::BIGINT AS n_lines,
               n_bullet_lines::BIGINT AS n_bullet_lines,
               n_ellipsis_lines::BIGINT AS n_ellipsis_lines,
               (n_words BETWEEN 50 AND 100000
                AND 3 * n_words <= sum_word_len
                AND sum_word_len <= 10 * n_words
                AND 10 * n_symbols < n_words
                AND 10 * n_bullet_lines < 9 * n_lines
                AND 10 * n_ellipsis_lines < 3 * n_lines
                AND 5 * n_alpha_words > 4 * n_words
                AND n_stop_words >= 2) AS keep
        FROM c
    """


def source_mix_weights_sql(alpha: float = 0.3) -> str:
    """Temperature-mixing twin (queries.source_mix_weights). The pow/sum
    arithmetic is float, but both sides round the final weight to 6
    digits and the denominator is a sum over a handful of sources, so
    order-of-summation noise (~1 ulp) cannot reach the 6th decimal."""
    return f"""
        WITH c AS (SELECT source, count(*)::BIGINT AS n_docs
                   FROM documents GROUP BY source),
        t AS (SELECT sum(n_docs)::DOUBLE AS total FROM c),
        s AS (SELECT source, n_docs, pow(n_docs / total, {alpha}) AS sc
              FROM c, t),
        z AS (SELECT sum(sc) AS den FROM s)
        SELECT source, n_docs, round(sc / den, 6) AS weight FROM s, z
    """
