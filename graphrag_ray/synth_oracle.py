"""DuckDB replay of the synth spans corpus — hard oracles for kg_* surfaces.

The synth corpus (synth.py) draws every random decision from a NAMED md5
key (`_u("syn:{doc}:{s}:{field}")`), so DuckDB can re-derive the full doc
text — base text + templated sentences with zipf-picked entities, fuzzy
variants and titles — by pure md5 arithmetic, never touching the Python
generator. On top of that text the chunker (functions/chunking.py
chunk_text — itself a transcription of the reference's text/mod.rs:141-187)
is replayed as a recursive CTE: window → last-sentence-boundary snap
('.' followed by space, final 200 chars) → word-boundary fallback (last
space, final 50 chars) → hard cut; next start = max(start+1, cut-overlap).
This is the same circularity-breaking move as the kgx oracle corpus
(kgx.py): the SQL side shares only the hand-inlined pool constants with
the pipeline, not one line of chunking or synthesis code.

Scope: docs from ``documents.parquet`` with include_base_text=True and
factor=1 — exactly what ``spans_dataset_from_flat_parquet`` feeds
``build_kg`` in queries.kg_chunks / queries.media_features.
"""

from __future__ import annotations

from .synth import LOCATIONS, ORGS, PERSONS, TEMPLATES, TITLES

# uniform [0,1) from a named md5 key — the SQL twin of synth._u
def _u(key_expr: str) -> str:
    return f"(('0x'||substr(md5({key_expr}),1,8))::BIGINT / 4294967296.0)"


def _zipf(key_expr: str, n: int) -> str:
    """SQL twin of synth._zipf_idx: min(n-1, int(n * u*u*u))."""
    u = _u(key_expr)
    return f"least({n - 1}, CAST(trunc({n} * (({u})*({u})*({u}))) AS BIGINT))"


def _lit_list(values) -> str:
    inner = ", ".join("'" + v.replace("'", "''") + "'" for v in values)
    return f"[{inner}]"


def _doc_key(field: str) -> str:
    return f"'syn:'||did||':{field}'"


def _sent_key(field: str) -> str:
    return f"'syn:'||did||':'||s||':{field}'"


# per-doc sentence count: (3 + int(u*6)) * factor, factor=1
_NS = f"(3 + CAST(trunc({_u(_doc_key('ns'))} * 6) AS BIGINT))"


def _sentence_cte() -> str:
    """CTE `sent`: one row per (doc, sentence) with the assembled sentence
    text (trailing space included, as add_text appends it)."""
    persons = _lit_list(PERSONS)
    orgs = _lit_list(ORGS)
    locs = _lit_list(LOCATIONS)
    titles = _lit_list(TITLES)
    templates = _lit_list(TEMPLATES)
    p0 = f"list_extract({persons}, {_zipf(_sent_key('p'), len(PERSONS))} + 1)"
    p2 = f"list_extract({persons}, {_zipf(_sent_key('p2'), len(PERSONS))} + 1)"
    o = f"list_extract({orgs}, {_zipf(_sent_key('o'), len(ORGS))} + 1)"
    loc = f"list_extract({locs}, {_zipf(_sent_key('l'), len(LOCATIONS))} + 1)"
    t = (f"list_extract({titles}, CAST(trunc({_u(_sent_key('t'))} * "
         f"{len(TITLES)}) AS BIGINT) + 1)")
    tmpl = (f"list_extract({templates}, CAST(trunc({_u(_sent_key('tmpl'))} * "
            f"{len(TEMPLATES)}) AS BIGINT) + 1)")
    # fuzzy variant of p0 (synth._variant): typo in last token / doubled
    # space / ALL CAPS. last = split_part(p0,' ',2) (pool names are two
    # tokens); typo drop index k = 2 + int(u_vk * (len(last)-3)).
    vk = (f"(2 + CAST(trunc({_u(_sent_key('vk'))} * (length(split_part(p0v,"
          f"' ', 2)) - 3)) AS BIGINT))")
    variant = f"""
        CASE
          WHEN {_u(_sent_key('vkind'))} < 0.4 THEN
            CASE WHEN length(split_part(p0v, ' ', 2)) > 4
                 THEN split_part(p0v, ' ', 1) || ' ' ||
                      substr(split_part(p0v, ' ', 2), 1, {vk}) ||
                      substr(split_part(p0v, ' ', 2), {vk} + 2)
                 ELSE p0v END
          WHEN {_u(_sent_key('vkind'))} < 0.7 THEN replace(p0v, ' ', '  ')
          ELSE upper(p0v)
        END
    """
    # replace {p2} BEFORE {p} ('{p}' is a prefix of '{p2}')
    return f"""
    draws AS (
        SELECT did, g.s AS s, {tmpl} AS tmpl, {p0} AS p0v,
               {p2} AS p2v, {o} AS ov, {loc} AS lv, {t} AS tv
        FROM (SELECT doc_id AS did FROM documents) d,
             generate_series(0, 7) AS g(s)   -- ns = 3 + int(u*6) <= 8
        WHERE g.s < {_NS}
    ),
    sent AS (
        SELECT did, s,
               replace(replace(replace(replace(replace(tmpl,
                   '{{p2}}', p2v),
                   '{{p}}', CASE WHEN {_u(_sent_key('var'))} < 0.12
                                 THEN ({variant}) ELSE p0v END),
                   '{{o}}', ov),
                   '{{l}}', lv),
                   '{{t}}', tv) || ' ' AS sentence
        FROM draws
    )
    """


def _text_cte() -> str:
    """CTE `texts`: the per-doc concatenated text-span view
    (base_text.strip()+' ' then each sentence+' ') and the string doc id."""
    return f"""
    WITH RECURSIVE {_sentence_cte()},
    texts AS (
        SELECT 'doc_'||lpad(d.doc_id::VARCHAR, 8, '0') AS doc_id,
               (CASE WHEN d.text IS NOT NULL AND d.text <> ''
                     THEN trim(d.text) || ' ' ELSE '' END)
               || string_agg(sent.sentence, '' ORDER BY sent.s) AS text
        FROM documents d JOIN sent ON sent.did = d.doc_id
        GROUP BY d.doc_id, d.text
    )
    """


def _chunk_cut_case(alias: str, w: int) -> str:
    """Cut-position CASE for the window starting at ``{alias}.s`` (the
    chunker replay's single shared expression — see kg_chunks_sql for the
    semantics)."""
    sent_region = w - 200   # sentence-boundary search start (0-based)
    word_region_start = w - 50 + 1  # 1-based substr start of the 50-char tail
    rev_win = f"reverse(substr({alias}.text, {alias}.s + 1, {w}))"
    rev_tail = f"reverse(substr({alias}.text, {alias}.s + {word_region_start}, 50))"
    return f"""
    CASE WHEN {alias}.s + {w} >= {alias}.n THEN {alias}.n
    ELSE CASE
      WHEN substr({alias}.text, {alias}.s + {w}, 1) = '.'
        THEN {alias}.s + {w}
      WHEN strpos({rev_win}, ' .') > 0
           AND ({w} - strpos({rev_win}, ' .') - 1) >= {sent_region}
        THEN {alias}.s + {w} - strpos({rev_win}, ' .')
      WHEN strpos({rev_tail}, ' ') > 0
        THEN {alias}.s + {w} - strpos({rev_tail}, ' ')
      ELSE {alias}.s + {w}
    END END
    """


def kg_chunks_sql(chunk_size: int = 512, overlap: int = 100) -> str:
    """Recursive-CTE replay of chunk_text (legacy sliding window + sentence
    snap) over the replayed doc text. 0-based char offsets; cut semantics:
      - window end at text end → cut = n (final chunk)
      - '.' as the window's last char → boundary at window end
      - else last '. ' with the '.' inside the window's final 200 chars
        → cut just after the '.'
      - else last ' ' in the window's final 50 chars → cut ON the space
      - else hard cut at window end
    Blank chunks (whitespace-only) are skipped without consuming an index;
    next start = max(start+1, cut-overlap)."""
    w = chunk_size

    def cut(alias: str) -> str:
        return _chunk_cut_case(alias, w)

    return f"""
    {_text_cte()},
    state AS (
        SELECT doc_id, text, length(text)::BIGINT AS n,
               0::BIGINT AS s, 0::BIGINT AS idx
        FROM texts
        UNION ALL
        SELECT doc_id, text, n,
               greatest(s + 1, cut - {overlap}),
               idx + CASE WHEN length(trim(substr(text, s + 1, cut - s))) > 0
                          THEN 1 ELSE 0 END
        FROM (SELECT st.*, ({cut('st')}) AS cut FROM state st) x
        WHERE cut < n
    )
    SELECT doc_id || '_' || idx AS chunk_id,
           doc_id,
           idx::INT AS chunk_idx,
           s AS start_offset,
           cut AS end_offset
    FROM (SELECT st.*, ({cut('st')}) AS cut FROM state st) x
    WHERE length(trim(substr(text, s + 1, cut - s))) > 0
    """


def chunk_units_cte(chunk_size: int = 512, overlap: int = 100) -> str:
    """CTE chain (caller supplies the ``WITH RECURSIVE`` prefix) exposing
    the flagship corpus's CHUNKS as extraction units: ``texts`` has one row
    per chunk with ``doc_id`` = '<doc>_<idx>' chunk id, ``parent`` = real
    doc id, ``text`` = the chunk's raw content slice (chunk_doc emits
    content = text[start:end] verbatim). The same recursive chunker replay
    kg_chunks_sql verifies, re-used so the word-stream extraction replay
    (syn_oracle_kg) can run per chunk — the unit the real pipeline's fused
    ChunkExtract stage extracts over."""
    w = chunk_size

    def cut(alias: str) -> str:
        return _chunk_cut_case(alias, w)

    return f"""
    {_sentence_cte()},
    dtexts AS MATERIALIZED (
        SELECT 'doc_'||lpad(d.doc_id::VARCHAR, 8, '0') AS doc_id,
               (CASE WHEN d.text IS NOT NULL AND d.text <> ''
                     THEN trim(d.text) || ' ' ELSE '' END)
               || string_agg(sent.sentence, '' ORDER BY sent.s) AS text
        FROM documents d JOIN sent ON sent.did = d.doc_id
        GROUP BY d.doc_id, d.text
    ),
    cstate AS (
        SELECT doc_id, text, length(text)::BIGINT AS n,
               0::BIGINT AS s, 0::BIGINT AS idx
        FROM dtexts
        UNION ALL
        SELECT doc_id, text, n,
               greatest(s + 1, cut - {overlap}),
               idx + CASE WHEN length(trim(substr(text, s + 1, cut - s))) > 0
                          THEN 1 ELSE 0 END
        FROM (SELECT st.*, ({cut('st')}) AS cut FROM cstate st) x
        WHERE cut < n
    ),
    texts AS MATERIALIZED (
        SELECT doc_id || '_' || idx AS doc_id,
               doc_id AS parent,
               substr(text, s + 1, cut - s) AS text
        FROM (SELECT st.*, ({cut('st')}) AS cut FROM cstate st) x
        WHERE length(trim(substr(text, s + 1, cut - s))) > 0
    )
    """


# atomic-fact regex (stages/atomic_facts._FACT_RE) in RE2 form: the
# Python lookahead `(?=[\s.,;]|$)` becomes a CONSUMED `(?:[\s.,;]|$)` —
# equivalent here because the delimiter class can never start the next
# match's subject ([A-Z]), so non-overlapping scan order is unchanged;
# tests/test_kg_oracle.py asserts corpus-wide fact-set equality with
# extract_facts. Temporal markers never occur (no digits / 'during' in
# pool sentences or lowercase base text — also asserted).
_FACT_PAT_RE2 = (
    r"([A-Z][\w'']+(?: [A-Z][\w'']+)?)\s+"
    r"(works for|founded|is employed by|was born in|lives in|married|"
    r"visited|met|partnered with|joined|traveled to|opened)\s+"
    r"(?:a |the )?([A-Z][\w'']+(?: [A-Z][\w'']+){0,3})(?:[\s.,;]|$)"
)


def _kg_facts_cte(chunk_size: int = 512, overlap: int = 100) -> str:
    return f"""WITH RECURSIVE {chunk_units_cte(chunk_size, overlap)},
    fm AS (
      SELECT doc_id AS chunk_id,
             regexp_extract_all(text, '{_FACT_PAT_RE2}', 1) AS subjs,
             regexp_extract_all(text, '{_FACT_PAT_RE2}', 2) AS preds,
             regexp_extract_all(text, '{_FACT_PAT_RE2}', 3) AS objs
      FROM texts),
    facts AS (
      SELECT chunk_id,
             unnest(subjs) AS subj,
             upper(replace(unnest(preds), ' ', '_')) AS pred,
             unnest(objs) AS obj
      FROM fm)
    """


def kg_atomic_facts_sql() -> str:
    """M10/A5 atomic facts over the flagship chunk stream: the mock ATOM
    decomposer's fact regex replayed per chunk (RE2 delimiter-consuming
    form, see _FACT_PAT_RE2); constant confidence, no temporal markers in
    this corpus."""
    return f"""
        {_kg_facts_cte()}
        SELECT chunk_id, subj, pred, obj,
               NULL::VARCHAR AS temporal_marker,
               NULL::BIGINT AS timestamp,
               0.8::DOUBLE AS confidence
        FROM facts
    """


def kg_validated_facts_sql() -> str:
    """A4 triple reflection over the flagship facts: subj/obj are regex
    captures of the chunk text itself, so the mock validator (verbatim
    containment) accepts every fact at confidence 0.9."""
    return f"""
        {_kg_facts_cte()}
        SELECT chunk_id, subj, pred, obj,
               true AS is_valid,
               0.9::DOUBLE AS validation_confidence
        FROM facts
    """


def kg_enriched_sql() -> str:
    """M4 enrichment over the flagship chunk stream, fully replayed:

    - TF-IDF keywords (keyword_extraction.rs:37-116): tokenize keeping
      [alnum-_], len>2, non-stopword, non-digit; DF counted per CHUNK with
      the broadcast's lossless df>=2 hapax drop (enrich.py:
      min_broadcast_df — a missing term resolves to df=1, identical);
      idf = max(0, ln(n_docs/df)); top-5 by (score DESC, term).
    - Extractive summary (extractive_summarizer.rs:100-160): sentence
      split on the lookbehind regex via marker replace, per-sentence
      position/length/word-freq/proper/numeric weights mirrored
      op-for-op, top-2 by (score DESC, index) re-ordered by index.
    - Chapter: NULL — no heading/'Chapter N' line exists in this corpus
      (asserted corpus-wide in tests/test_kg_oracle.py)."""
    from .stages.enrich import STOPWORDS

    stop_in = ",".join(f"'{w}'" for w in sorted(STOPWORDS))
    return f"""
    WITH RECURSIVE {chunk_units_cte()},
    toks AS (
      SELECT chunk_id, t AS term FROM (
        SELECT doc_id AS chunk_id,
               unnest(list_transform(regexp_split_to_array(text, '\\s+'),
                   w -> lower(regexp_replace(w, '[^0-9A-Za-z_-]', '',
                                             'g')))) AS t
        FROM texts) z
      WHERE t <> '' AND length(t) > 2 AND t NOT IN ({stop_in})
        AND NOT regexp_matches(t, '^[0-9]+$')),
    dfreq AS (SELECT term, count(DISTINCT chunk_id)::BIGINT AS df
              FROM toks GROUP BY term HAVING count(DISTINCT chunk_id) >= 2),
    cnts AS (SELECT chunk_id, term, count(*)::BIGINT AS cnt
             FROM toks GROUP BY 1, 2),
    tots AS (SELECT chunk_id, count(*)::BIGINT AS total
             FROM toks GROUP BY 1),
    ndocs AS (SELECT count(*)::BIGINT AS n FROM documents),
    sc AS (
      SELECT c.chunk_id, c.term,
             (c.cnt::DOUBLE / t.total)
             * greatest(0.0, ln(nd.n::DOUBLE / coalesce(d.df, 1))) AS score
      FROM cnts c
      JOIN tots t USING (chunk_id)
      LEFT JOIN dfreq d USING (term)
      CROSS JOIN ndocs nd),
    kw AS (
      SELECT chunk_id,
             array_to_string(list(term ORDER BY score DESC, term), '|')
                 AS kws
      FROM (SELECT chunk_id, term, score,
                   row_number() OVER (PARTITION BY chunk_id
                                      ORDER BY score DESC, term) AS rn
            FROM sc) z
      WHERE rn <= 5 GROUP BY chunk_id),
    sraw AS (
      SELECT doc_id AS chunk_id,
             string_split(regexp_replace(trim(text), '([.!?])\\s+',
                                         '\\1@@SPLIT@@', 'g'),
                          '@@SPLIT@@') AS parts
      FROM texts),
    sents AS (
      SELECT chunk_id,
             row_number() OVER (PARTITION BY chunk_id ORDER BY g) - 1 AS si,
             parts[g] AS s
      FROM sraw, unnest(generate_series(1, array_length(parts))) t(g)
      WHERE trim(parts[g]) <> ''),
    nsent AS (SELECT chunk_id, count(*)::BIGINT AS n FROM sents GROUP BY 1),
    sw AS (
      SELECT chunk_id, si, w,
             lower(regexp_replace(w, '^[.,!?;:]+|[.,!?;:]+$', '', 'g'))
                 AS lw,
             substr(w, 1, 1) BETWEEN 'A' AND 'Z' AS proper,
             regexp_matches(w, '[0-9]') AS hasdig
      FROM (SELECT chunk_id, si,
                   unnest(list_filter(regexp_split_to_array(s, '\\s+'),
                                      x -> x <> '')) AS w
            FROM sents) z),
    freq AS (
      SELECT chunk_id, lw, count(*)::BIGINT AS f
      FROM sw WHERE lw <> '' AND lw NOT IN ({stop_in})
      GROUP BY 1, 2),
    sstat AS (
      SELECT w.chunk_id, w.si,
             count(*)::BIGINT AS wc,
             sum(CASE WHEN w.lw NOT IN ({stop_in})
                      THEN coalesce(fr.f, 0) ELSE 0 END)::DOUBLE AS wf,
             sum(CASE WHEN w.proper THEN 1 ELSE 0 END)::DOUBLE AS nproper,
             max(CASE WHEN w.hasdig THEN 1 ELSE 0 END) AS hasdig
      FROM sw w LEFT JOIN freq fr ON fr.chunk_id = w.chunk_id
                                 AND fr.lw = w.lw
      GROUP BY 1, 2),
    scored AS (
      SELECT st.chunk_id, st.si, se.s,
             (CASE WHEN st.si = 0 THEN 2.0
                   WHEN st.si = ns.n - 1 THEN 1.5
                   ELSE 1.0 - (st.si::DOUBLE / ns.n) * 0.5 END) * 0.3
             + (CASE WHEN st.wc < 5 THEN 0.3
                     WHEN st.wc > 40 THEN 0.5
                     WHEN st.wc BETWEEN 10 AND 25 THEN 1.0
                     ELSE 0.7 END) * 0.2
             + least(1.0, st.wf / greatest(1, st.wc) / 3.0) * 0.3
             + (st.nproper / greatest(1, st.wc)) * 0.1
             + (CASE WHEN st.hasdig = 1 THEN 1.0 ELSE 0.0 END) * 0.1
                 AS score,
             ns.n
      FROM sstat st
      JOIN sents se ON se.chunk_id = st.chunk_id AND se.si = st.si
      JOIN nsent ns ON ns.chunk_id = st.chunk_id),
    summ AS (
      SELECT chunk_id,
             CASE WHEN any_value(n) <= 2
                  THEN string_agg(s, ' ' ORDER BY si)
                  ELSE (SELECT string_agg(z.s, ' ' ORDER BY z.si)
                        FROM (SELECT s2.s, s2.si,
                                     row_number() OVER (
                                         ORDER BY s2.score DESC, s2.si)
                                         AS rn
                              FROM scored s2
                              WHERE s2.chunk_id = scored.chunk_id) z
                        WHERE z.rn <= 2) END AS summary
      FROM scored GROUP BY chunk_id)
    SELECT t.doc_id AS chunk_id,
           coalesce(k.kws, '') AS keywords,
           coalesce(sm.summary, '') AS summary,
           NULL::VARCHAR AS chapter
    FROM texts t
    LEFT JOIN kw k ON k.chunk_id = t.doc_id
    LEFT JOIN summ sm ON sm.chunk_id = t.doc_id
    """


def kg_yake_sql() -> str:
    """YAKE keywords over the flagship chunk stream: the shared replay
    tail (kgx.yake_tail) over the replayed chunk text — multi-sentence
    chunks exercise the dispersion / cross-sentence-window features the
    single-sentence kgx corpus cannot."""
    from .kgx import yake_tail

    return f"""
        WITH RECURSIVE {chunk_units_cte()},
        ydocs AS (SELECT doc_id, text AS s FROM texts),
        {yake_tail('ydocs', 'd.doc_id')}
    """


def media_features_sql() -> str:
    """Replay of the media span structure: docs with doc_id%10==0 emit one
    image span after sentence s for s%3==1; span_index = has_base + (s+1)
    text spans + k prior media spans, k = (s-1)/3; media_ref =
    'lance://media/img_{doc}_{k}'."""
    return f"""
    SELECT 'doc_'||lpad(did::VARCHAR, 8, '0') AS doc_id,
           'lance://media/img_'||did||'_'||((g.s - 1) // 3) AS media_ref,
           'image' AS kind,
           (CASE WHEN base_text IS NOT NULL AND base_text <> ''
                 THEN 1 ELSE 0 END
            + g.s + 1 + (g.s - 1) // 3)::INT AS span_index
    FROM (SELECT doc_id AS did, text AS base_text FROM documents
          WHERE doc_id % 10 = 0) d,
         generate_series(1, 7, 3) AS g(s)   -- s%3==1, ns <= 8
    WHERE g.s < {_NS}
    """


def kg_chunk_embeddings_sql(dim: int = 64) -> str:
    """Oracle for the hash-embedding stage OVER the replayed chunk table:
    the word vectors are Mersenne-Twister draws (not SQL-replayable), but
    the chunk-id set is exact from the chunker replay and the stage's two
    verifiable invariants — output dim and unit L2 norm (or zero for
    empty text) — are constants the Ray side must reproduce per chunk."""
    return (f"SELECT chunk_id AS id, {dim}::INT AS dim, true AS norm_ok "
            f"FROM ({kg_chunks_sql()})")


def kg_late_chunk_embeddings_sql() -> str:
    """Same id-set + unit-norm oracle for the late-chunking embedder
    (document-context pooling preserves unit normalization)."""
    return (f"SELECT chunk_id AS id, true AS norm_ok "
            f"FROM ({kg_chunks_sql()})")


def media_resized_sql(target: int = 16) -> str:
    """Replay of explode_media_spans → MediaBytesLoader(fake) →
    ImageResizeStage(target=16): width/height from md5 bytes [0]/[1]
    (stages/media.py:141-142), crop = top-left (h//t·t)×(w//t·t) region of
    the 16-periodic md5-digest byte stream (decode repeats the 256-byte
    payload = digest×16, so byte at linear index i is digest[i%16]).
    crop_byte_sum = Σ_m digest[m]·N_m where N_m counts linear indices
    r·w+p ≡ m (mod 16) with r<ch, p<cw — per image row the residues hit
    ((cw-1-ofs)//16)+1 times at offset ofs=(m-r·w) mod 16. Exact integer
    identity, no float replay needed. Upsampling never triggers (fake
    loader guarantees w,h ≥ 64 ≥ target)."""
    t = target
    ref = "'lance://media/img_'||did||'_'||((g.s - 1) // 3)"
    return f"""
    WITH spans AS (
      SELECT d.did, {ref} AS media_ref
      FROM (SELECT doc_id AS did FROM documents WHERE doc_id % 10 = 0) d,
           generate_series(1, 7, 3) AS g(s)
      WHERE g.s < {_NS}
    ), dims AS (
      SELECT did, media_ref,
             64 + ('0x'||substr(md5(media_ref),1,2))::BIGINT % 192 AS w,
             64 + ('0x'||substr(md5(media_ref),3,2))::BIGINT % 192 AS h
      FROM spans
    ), d2 AS (
      SELECT *, (h//{t})*{t} AS ch, (w//{t})*{t} AS cw FROM dims
    )
    SELECT 'doc_'||lpad(d.did::VARCHAR, 8, '0') AS doc_id,
           d.media_ref,
           d.w::INT AS width,
           d.h::INT AS height,
           SUM( ('0x'||substr(md5(d.media_ref), 2*m.m+1, 2))::BIGINT
                * ( (d.cw - 1 - ((m.m - r.r*d.w) % 16 + 16) % 16) // 16
                    + 1 ) )::BIGINT AS crop_byte_sum
    FROM d2 d, generate_series(0,15) m(m), generate_series(0, 254) r(r)
    WHERE r.r < d.ch
    GROUP BY d.did, d.media_ref, d.w, d.h
    """


def media_frames_sql(fps_sample: float = 1.0) -> str:
    """Replay of explode_media_spans → MediaBytesLoader(fake) →
    make_frame_sampler(fps=1): duration_ms = 1000 + (md5 bytes [2:4] as a
    big-endian u16) % 29000 (stages/media.py:143), frames at
    ts = round(i·1000/fps) while ts < duration. At fps=1 the per-index
    timestamps are i·1000 exactly (no rounding collisions), so
    frame_idx = i and n_frames = ceil(duration/1000) ∈ [1, 30]."""
    assert fps_sample == 1.0, "oracle derived for the fps=1 query default"
    dur = ("(1000 + ('0x'||substr(md5('lance://media/img_'||did||'_'||"
           "((g.s - 1) // 3)),5,4))::BIGINT % 29000)")
    return f"""
    SELECT 'doc_'||lpad(did::VARCHAR, 8, '0') AS doc_id,
           'lance://media/img_'||did||'_'||((g.s - 1) // 3) AS media_ref,
           f.i::INT AS frame_idx,
           (f.i * 1000)::BIGINT AS ts_ms
    FROM (SELECT doc_id AS did FROM documents WHERE doc_id % 10 = 0) d,
         generate_series(1, 7, 3) AS g(s),
         generate_series(0, 29) AS f(i)
    WHERE g.s < {_NS} AND f.i * 1000 < {dur}
    """


def kg_boundary_chunks_sql(max_chunk_chars: int = 2000) -> str:
    """Replay of the BAR-RAG sync boundary-aware chunker
    (functions/boundaries.py chunk_text_boundary_aware — transcription of
    chunking_strategies.rs:540-588) over the replayed doc text: split on
    every [.!?], strip, drop empties, then greedily pack sentences into
    chunks joined by ' ' — flush when len(current)+len(next) exceeds the
    cap (the joining space is NOT counted in the flush test, but IS part
    of the packed length). Offsets are the reference's synthetic
    cumulative lengths. Replayed as a per-sentence recursive CTE carrying
    (current_len, chunk_idx, chunk_start) per doc."""
    m = max_chunk_chars
    ws = "' '||chr(9)||chr(10)||chr(13)||chr(11)||chr(12)"
    return f"""
    {_text_cte()},
    pieces AS (
        SELECT doc_id, trim(unnest(arr), {ws}) AS sent,
               unnest(range(1, array_length(arr) + 1)) AS ord
        FROM (SELECT doc_id, regexp_split_to_array(text, '[.!?]') AS arr
              FROM texts) t
    ),
    sents AS (
        SELECT doc_id, sent,
               row_number() OVER (PARTITION BY doc_id ORDER BY ord) AS sidx
        FROM pieces WHERE length(sent) > 0
    ),
    pack AS (
        SELECT doc_id, 1::BIGINT AS i, length(sent)::BIGINT AS cur_len,
               0::BIGINT AS idx, 0::BIGINT AS st,
               NULL::BIGINT AS em_idx, NULL::BIGINT AS em_st,
               NULL::BIGINT AS em_en
        FROM sents WHERE sidx = 1
        UNION ALL
        SELECT p.doc_id, p.i + 1,
               CASE WHEN p.cur_len + length(s.sent) > {m}
                    THEN length(s.sent)
                    ELSE p.cur_len + 1 + length(s.sent) END,
               CASE WHEN p.cur_len + length(s.sent) > {m}
                    THEN p.idx + 1 ELSE p.idx END,
               CASE WHEN p.cur_len + length(s.sent) > {m}
                    THEN p.st + p.cur_len ELSE p.st END,
               CASE WHEN p.cur_len + length(s.sent) > {m}
                    THEN p.idx ELSE NULL END,
               CASE WHEN p.cur_len + length(s.sent) > {m}
                    THEN p.st ELSE NULL END,
               CASE WHEN p.cur_len + length(s.sent) > {m}
                    THEN p.st + p.cur_len ELSE NULL END
        FROM pack p JOIN sents s ON s.doc_id = p.doc_id AND s.sidx = p.i + 1
    ),
    finals AS (SELECT doc_id, max(i) AS n FROM pack GROUP BY doc_id)
    SELECT doc_id || '_' || em_idx AS chunk_id, doc_id,
           em_idx::INT AS chunk_idx, em_st AS start_offset,
           em_en AS end_offset
    FROM pack WHERE em_idx IS NOT NULL
    UNION ALL
    SELECT p.doc_id || '_' || p.idx, p.doc_id, p.idx::INT, p.st,
           p.st + p.cur_len
    FROM pack p JOIN finals f ON f.doc_id = p.doc_id AND p.i = f.n
    WHERE p.cur_len > 0
    """


def kg_semantic_chunk_coverage_sql() -> str:
    """Invariant oracle for M3 semantic chunking: the breakpoints depend on
    MT-seeded hash-embedding draws (not SQL-replayable — see
    kg_chunk_embeddings_sql), but the chunker MUST tile the sentence
    sequence exactly: per doc, spans are consecutive, non-overlapping, and
    cover [0, n_sentences). SQL independently re-derives n_sentences by
    replaying split_sentences_semantic (line-wise [.!?]-split with
    non-empty strip), so (doc_id, n_sentences, covered, max_end,
    min_start) is a hard check on the Ray side's actual span arithmetic.
    On the synth corpus the text is one newline-free line (asserted by
    tests), so the splitter's inclusive [.!?]-split yields exactly one
    sentence per punctuation char (each piece keeps its terminal mark, so
    it never strips empty) plus one trailing sentence when non-blank text
    follows the last mark — computable without RE2 lookbehind."""
    return f"""
    {_text_cte()},
    counts AS (
        SELECT doc_id,
               (length(text)
                - length(regexp_replace(text, '[.!?]', '', 'g')))::BIGINT
               + CASE WHEN trim(regexp_extract(text, '[^.!?]*$')) <> ''
                      THEN 1 ELSE 0 END AS n
        FROM texts
    )
    SELECT doc_id, n AS n_sentences, n AS covered, n AS max_end,
           0::BIGINT AS min_start
    FROM counts WHERE n > 0
    """


def syn_boundaries_sql() -> str:
    """Oracle for BAR-RAG boundary detection over the synth corpus
    (text/boundary_detection.rs): every synth sentence carries its own
    '. ' terminal, mid-sentence 'Dr. '/'Prof. ' title matches are
    abbreviation-suppressed, no paragraph/heading/list/code pattern occurs
    and the min-sentence-length gate never trips (all four asserted
    corpus-wide by tests/test_boundaries.py) — so the expected boundary
    set is exactly the cumulative sentence-length positions."""
    return f"""
        WITH {_sentence_cte()}
        SELECT 'doc_' || lpad(did::VARCHAR, 8, '0') AS doc_id,
               (sum(length(sentence)) OVER (
                    PARTITION BY did ORDER BY s
                    ROWS UNBOUNDED PRECEDING))::BIGINT AS position,
               'sentence' AS boundary_type,
               0.9 AS confidence
        FROM sent
    """


def syn_contextual_sql(chunk_size: int = 256, overlap: int = 50) -> str:
    """Oracle for the contextual chunk enricher
    (text/contextual_enricher.rs): chunk contents come from the chunker
    replay, the mock LLM's situating context is the document prefix up to
    the first '. ' (trimmed), enriched = context + '\\n\\n' + chunk, and
    num_ctx replays rs:141-160 exactly (100 + doc/4 + max-chunk/4 + 150,
    +5%, round-up-1024, clamp [4096, 131072])."""
    return f"""
        {_text_cte()},
        ch AS (SELECT * FROM ({kg_chunks_sql(chunk_size, overlap)})),
        ctx AS (
          SELECT doc_id, text,
                 CASE WHEN strpos(text, '. ') = 0 THEN trim(text)
                      ELSE trim(substr(text, 1, strpos(text, '. ') + 1))
                 END AS context,
                 length(text)::BIGINT AS tlen
          FROM texts),
        mx AS (SELECT doc_id,
                      max(end_offset - start_offset)::BIGINT AS maxlen
               FROM ch GROUP BY doc_id),
        nc AS (
          SELECT ctx.doc_id,
                 least(131072, greatest(4096,
                   ((CAST(trunc((100 + ctx.tlen // 4 + mx.maxlen // 4
                                 + 150) * 1.05) AS BIGINT)
                     + 1023) // 1024) * 1024))::BIGINT AS num_ctx
          FROM ctx JOIN mx USING (doc_id))
        SELECT ch.chunk_id, ch.doc_id, nc.num_ctx,
               ctx.context || chr(10) || chr(10)
                 || substr(ctx.text, ch.start_offset + 1,
                           ch.end_offset - ch.start_offset)
                   AS enriched_content
        FROM ch
        JOIN ctx ON ctx.doc_id = ch.doc_id
        JOIN nc ON nc.doc_id = ch.doc_id
    """


# ---------------------------------------------------------------------------
# benchmark-harness quality metrics (stages/monitoring.py twins)

_BENCH_PAIRS = """
    btoks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(text, '\\s+'),
                           x -> x <> '') AS tk
        FROM documents
    ),
    bpairs AS (
        SELECT doc_id, tk[1:10] AS cand,
               CASE WHEN doc_id % 10 = 0 THEN tk[1:10]
                    ELSE tk[3:14] END AS ref
        FROM btoks
    )"""


def _bleu_precision(n: int) -> str:
    """Clipped n-gram precision p_n for candidate vs reference token
    lists (benchmark.rs:525-561): Σ_g min(count_cand(g), count_ref(g)) /
    |cand n-grams|, zero when either side is shorter than n."""
    cng = (f"list_transform(range(1, length(cand) - {n} + 2), "
           f"i -> array_to_string(cand[i:i + {n - 1}], ' '))")
    rng = (f"list_transform(range(1, length(ref) - {n} + 2), "
           f"i -> array_to_string(ref[i:i + {n - 1}], ' '))")
    return f"""
        CASE WHEN length(cand) < {n} OR length(ref) < {n} THEN 0.0
        ELSE (
            SELECT coalesce(list_sum(list_transform(list_distinct(c.cg),
                g -> least(length(list_filter(c.cg, x -> x = g)),
                           length(list_filter(c.rg, y -> y = g)))))::DOUBLE,
                0.0) / length(c.cg)
            FROM (SELECT {cng} AS cg, {rng} AS rg) c
        ) END"""


def bench_quality_sql() -> str:
    """DuckDB twin of queries.bench_quality: exact match (lower-trim
    equality), token-overlap F1 (containment count, no clipping), BLEU-4
    (clipped n-gram precision, brevity penalty, zero-if-any-zero) and
    ROUGE-L (LCS via a recursive-CTE DP — one step per candidate token,
    the row update expressed as raw[j] = max(prev[j], prev[j-1]+match)
    followed by a prefix-max, which equals the classic three-way DP) —
    all in float64 with the same operation order as
    stages/monitoring.py, so round-4 comparison is exact."""
    p = {n: _bleu_precision(n) for n in (1, 2, 3, 4)}
    return f"""
    WITH RECURSIVE
    {_BENCH_PAIRS},
    bf1 AS (
        SELECT doc_id, cand, ref,
               CASE WHEN lower(trim(array_to_string(cand, ' '))) =
                         lower(trim(array_to_string(ref, ' ')))
                    THEN 1.0 ELSE 0.0 END AS exact_match,
               CASE WHEN length(cand) = 0 OR length(ref) = 0 THEN 0
                    ELSE length(list_filter(
                        list_transform(cand, x -> lower(x)),
                        x -> list_contains(
                            list_transform(ref, y -> lower(y)), x)))
               END AS common
        FROM bpairs
    ),
    bscore AS (
        SELECT doc_id, cand, ref, exact_match,
               CASE WHEN common = 0 THEN 0.0
                    ELSE 2.0 * ((common::DOUBLE / length(cand))
                                * (common::DOUBLE / length(ref)))
                         / ((common::DOUBLE / length(cand))
                            + (common::DOUBLE / length(ref)))
               END AS f1_score,
               {p[1]} AS p1, {p[2]} AS p2, {p[3]} AS p3, {p[4]} AS p4
        FROM bf1
    ),
    bbleu AS (
        SELECT doc_id, cand, ref, exact_match, f1_score,
               CASE WHEN p1 <= 0 OR p2 <= 0 OR p3 <= 0 OR p4 <= 0 THEN 0.0
               ELSE least(1.0, greatest(0.0,
                   (CASE WHEN length(cand) >= length(ref) THEN 1.0
                         ELSE exp(1.0 - length(ref)::DOUBLE
                                      / length(cand)::DOUBLE) END)
                   * exp((ln(p1) + ln(p2) + ln(p3) + ln(p4)) / 4.0)))
               END AS bleu_score
        FROM bscore
    ),
    rwalk(doc_id, i, dp) AS (
        SELECT doc_id, 0::BIGINT, list_transform(ref, x -> 0::BIGINT)
        FROM bpairs
        UNION ALL
        SELECT s.doc_id, s.i + 1,
               list_transform(s.raw, (x, j) -> list_max(s.raw[1:j]))
        FROM (
            SELECT q.doc_id, q.i,
                   list_transform(q.ref, (y, j) ->
                       greatest(q.pp[j + 1],
                                q.pp[j] + CASE WHEN y = q.ci
                                               THEN 1 ELSE 0 END)) AS raw
            FROM (
                SELECT w.doc_id, w.i, p.ref,
                       [0::BIGINT] || w.dp AS pp,
                       p.cand[w.i + 1] AS ci
                FROM rwalk w JOIN bpairs p ON p.doc_id = w.doc_id
                WHERE w.i < length(p.cand)
            ) q
        ) s
    ),
    rfin AS (SELECT doc_id, arg_max(dp, i) AS dp FROM rwalk GROUP BY doc_id)
    SELECT b.doc_id,
           round(b.exact_match, 4) AS exact_match,
           round(b.f1_score, 4) AS f1_score,
           round(b.bleu_score, 4) AS bleu_score,
           round(CASE WHEN length(b.cand) = 0 OR length(b.ref) = 0
                           OR coalesce(f.dp[length(b.ref)], 0) = 0 THEN 0.0
                 ELSE least(1.0, greatest(0.0,
                     ((1.0 + 1.2 * 1.2)
                      * (f.dp[length(b.ref)]::DOUBLE / length(b.cand)))
                     * (f.dp[length(b.ref)]::DOUBLE / length(b.ref))
                     / ((1.2 * 1.2)
                        * (f.dp[length(b.ref)]::DOUBLE / length(b.cand))
                        + (f.dp[length(b.ref)]::DOUBLE / length(b.ref)))))
                 END, 4) AS rouge_l
    FROM bbleu b JOIN rfin f USING (doc_id)
    """


def bench_rag_summary_sql() -> str:
    """DuckDB twin of queries.bench_rag_summary: the simulation-mode
    BenchmarkSummary (LightRAG token estimates 200/100, default pricing
    0.0001/0.0003 per 1K) over one question per doc; generated answer is
    the deterministic placeholder, truth alternates exact-match rows
    (doc_id % 10 = 0) with the doc's leading 10 tokens."""
    return f"""
    WITH RECURSIVE
    btoks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(text, '\\s+'),
                           x -> x <> '') AS tk
        FROM documents
    ),
    bpairs AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(
                   'Generated answer for: What is in document '
                       || doc_id || '?', '\\s+'), x -> x <> '') AS cand,
               CASE WHEN doc_id % 10 = 0
                    THEN list_filter(regexp_split_to_array(
                        'Generated answer for: What is in document '
                            || doc_id || '?', '\\s+'), x -> x <> '')
                    ELSE tk[1:10] END AS ref
        FROM btoks
    ),
    bf1 AS (
        SELECT doc_id, cand, ref,
               CASE WHEN lower(trim(array_to_string(cand, ' '))) =
                         lower(trim(array_to_string(ref, ' ')))
                    THEN 1.0 ELSE 0.0 END AS exact_match,
               CASE WHEN length(cand) = 0 OR length(ref) = 0 THEN 0
                    ELSE length(list_filter(
                        list_transform(cand, x -> lower(x)),
                        x -> list_contains(
                            list_transform(ref, y -> lower(y)), x)))
               END AS common
        FROM bpairs
    ),
    bscore AS (
        SELECT doc_id, cand, ref, exact_match,
               CASE WHEN common = 0 THEN 0.0
                    ELSE 2.0 * ((common::DOUBLE / length(cand))
                                * (common::DOUBLE / length(ref)))
                         / ((common::DOUBLE / length(cand))
                            + (common::DOUBLE / length(ref)))
               END AS f1_score,
               {_bleu_precision(1)} AS p1, {_bleu_precision(2)} AS p2,
               {_bleu_precision(3)} AS p3, {_bleu_precision(4)} AS p4
        FROM bf1
    ),
    bbleu AS (
        SELECT doc_id, cand, ref, exact_match, f1_score,
               CASE WHEN p1 <= 0 OR p2 <= 0 OR p3 <= 0 OR p4 <= 0 THEN 0.0
               ELSE least(1.0, greatest(0.0,
                   (CASE WHEN length(cand) >= length(ref) THEN 1.0
                         ELSE exp(1.0 - length(ref)::DOUBLE
                                      / length(cand)::DOUBLE) END)
                   * exp((ln(p1) + ln(p2) + ln(p3) + ln(p4)) / 4.0)))
               END AS bleu_score
        FROM bscore
    ),
    rwalk(doc_id, i, dp) AS (
        SELECT doc_id, 0::BIGINT, list_transform(ref, x -> 0::BIGINT)
        FROM bpairs
        UNION ALL
        SELECT s.doc_id, s.i + 1,
               list_transform(s.raw, (x, j) -> list_max(s.raw[1:j]))
        FROM (
            SELECT q.doc_id, q.i,
                   list_transform(q.ref, (y, j) ->
                       greatest(q.pp[j + 1],
                                q.pp[j] + CASE WHEN y = q.ci
                                               THEN 1 ELSE 0 END)) AS raw
            FROM (
                SELECT w.doc_id, w.i, p.ref,
                       [0::BIGINT] || w.dp AS pp,
                       p.cand[w.i + 1] AS ci
                FROM rwalk w JOIN bpairs p ON p.doc_id = w.doc_id
                WHERE w.i < length(p.cand)
            ) q
        ) s
    ),
    rfin AS (SELECT doc_id, arg_max(dp, i) AS dp FROM rwalk GROUP BY doc_id),
    brows AS (
        SELECT b.doc_id, b.exact_match, b.f1_score, b.bleu_score,
               CASE WHEN length(b.cand) = 0 OR length(b.ref) = 0
                         OR coalesce(f.dp[length(b.ref)], 0) = 0 THEN 0.0
               ELSE least(1.0, greatest(0.0,
                   ((1.0 + 1.2 * 1.2)
                    * (f.dp[length(b.ref)]::DOUBLE / length(b.cand)))
                   * (f.dp[length(b.ref)]::DOUBLE / length(b.ref))
                   / ((1.2 * 1.2)
                      * (f.dp[length(b.ref)]::DOUBLE / length(b.cand))
                      + (f.dp[length(b.ref)]::DOUBLE / length(b.ref)))))
               END AS rouge_l
        FROM bbleu b JOIN rfin f USING (doc_id)
    )
    SELECT 'sim' AS config_name,
           count(*)::BIGINT AS total_queries,
           (count(*) * 200)::BIGINT AS total_input_tokens,
           (count(*) * 100)::BIGINT AS total_output_tokens,
           round(sum(200 / 1000.0 * 0.0001 + 100 / 1000.0 * 0.0003), 4)
               AS total_cost_usd,
           round((count(*) * 200 + count(*) * 100)
                     / count(*)::DOUBLE, 4) AS avg_tokens_per_query,
           round(sum(exact_match) / count(*), 4) AS avg_exact_match,
           round(sum(f1_score) / count(*), 4) AS avg_f1_score,
           round(sum(bleu_score) / count(*), 4) AS avg_bleu_score,
           round(sum(rouge_l) / count(*), 4) AS avg_rouge_l,
           'LightRAG,Leiden' AS features
    FROM brows
    """
