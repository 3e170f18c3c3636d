"""kgx: a SQL-reproducible KG-extraction oracle corpus.

Round-1 verdict: the KG surfaces had no independent driver-checkable oracle
(the pytest parity oracle shares ``functions/extraction.py`` with the
pipeline). This module breaks that circularity:

1. A deterministic entity-bearing corpus is derived from ``documents.doc_id``
   via **md5 arithmetic only** (``int(md5(f"kgx:{doc}:{i}")[:8], 16)``), which
   DuckDB reproduces bit-exactly (``('0x'||substr(md5(s),1,8))::BIGINT``).
   Sentence templates + name pools are chosen so extraction semantics are
   fully hand-derivable (one sentence per doc, one chunk per doc).
2. The Ray side runs the REAL distributed pipeline (chunk → extract →
   salted-groupby canonicalization → edge groupby dedup) over that corpus.
3. The DuckDB oracle derives the EXPECTED entities/canonicals/edges/triples
   from hand-written per-template expectation constants (`KGX_TEMPLATES`)
   — it never calls the extraction code, so a transcription bug in the
   pipeline cannot silently pass.

Hand-derivation notes (validated by tests/test_kgx.py against the pure
extractor, reference semantics entity/mod.rs:114-1108):

- two-word slot values ("Alice Harmon", "Acme Corp", "New York") are
  extracted as PERSON by phase 3 with confidence 0.8 (0.5 + 0.2 two-word
  + 0.1 capitalized);
- title templates extract the person via phase 2 at confidence 0.9;
- the ORG suffix scan emits only the bare suffix word ("Corp"/"Inc"/"LLC";
  reference entity/mod.rs:521-524 takes text[rfind(' ')+1 .. suffix_end]),
  confidence 0.9; orgs whose suffix is not an ORG_INDICATOR (e.g. "Stark
  Solutions") produce NO ORGANIZATION entity;
- known locations are extracted as LOCATION with confidence 0.9; two-word
  locations additionally as PERSON (phase 3);
- relationships: all co-occurring entity pairs ordered by extraction order
  (persons by sentence position, then ORG-suffix, then LOCATION), typed by
  the per-template context keywords (entity/mod.rs:841-879) — the ``po``
  ``pl`` ``ol`` ``pp`` fields below are the hand-derived types;
- the pools are chosen collision-free: no two entity names in the same
  fuzzy block (type, soundex(first token)) reach similarity 0.85, so
  canonicalization reduces to exact (type, name) grouping with
  doc_frequency = distinct docs, mention_count = appearances,
  confidence = max (0.9 iff the entity ever appeared in a title template).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from .schemas import DOCUMENTS

# ---------------------------------------------------------------------------
# pools (soundex-block-collision-free; see tests/test_kgx.py)

KGX_PERSONS = (
    "Alice Harmon", "Bob Tanner", "Carol Mendez", "David Okafor",
    "Elena Vasquez", "Frank Larson", "Grace Whitfield", "Henry Donovan",
    "Irene Ferguson", "James Galloway", "Karen Hampton", "Louis Ingram",
    "Maria Jamison", "Nathan Kessler", "Olivia Lockhart", "Peter Morrison",
    "Quinn Norwood", "Robert Oakley", "Sarah Pemberton", "Thomas Quimby",
)

# (name, extracted ORGANIZATION entity name or None)
KGX_ORGS = (
    ("Acme Corp", "Corp"),
    ("Hooli Inc", "Inc"),
    ("Initech LLC", "LLC"),
    ("Stark Solutions", None),  # "Solutions" is no ORG_INDICATOR → dropped
)

# (name, is_two_word → also extracted as PERSON via phase 3)
KGX_LOCS = (
    ("Tokyo", False), ("London", False), ("Berlin", False),
    ("Boston", False), ("Chicago", False), ("New York", True),
)

KGX_TITLES = ("Dr.", "Prof.")

# Hand-written expectations per template: sentence slot positions
# (pos_* = 1-based sentence order, None = absent), the four context
# relation types (entity/mod.rs:841-879) derived from the template words,
# and the atomic fact the mock ATOM decomposer's sentence regex yields
# (stages/atomic_facts.py _FACT_RE): (subj_slot, predicate, obj_slot) or
# None when no "<Subject> <verb phrase> <Object>" shape matches.
KGX_TEMPLATES = (
    dict(text="{p} works for {o} in {l}.", pos_p=1, pos_p2=None, pos_o=2,
         pos_l=3, titled=False, po="WORKS_FOR", pl="ASSOCIATED_WITH",
         ol="LOCATED_IN", pp="KNOWS", fact=("p", "works for", "o")),
    dict(text="{p} founded {o} two years ago.", pos_p=1, pos_p2=None,
         pos_o=2, pos_l=None, titled=False, po="LEADS",
         pl="ASSOCIATED_WITH", ol="LOCATED_IN", pp="KNOWS",
         fact=("p", "founded", "o")),
    dict(text="{p} is employed by {o}.", pos_p=1, pos_p2=None, pos_o=2,
         pos_l=None, titled=False, po="WORKS_FOR", pl="ASSOCIATED_WITH",
         ol="LOCATED_IN", pp="KNOWS", fact=("p", "is employed by", "o")),
    dict(text="{p} was born in {l} long ago.", pos_p=1, pos_p2=None,
         pos_o=None, pos_l=2, titled=False, po="ASSOCIATED_WITH",
         pl="BORN_IN", ol="LOCATED_IN", pp="KNOWS",
         fact=("p", "was born in", "l")),
    dict(text="{p} lives in {l} with family.", pos_p=1, pos_p2=None,
         pos_o=None, pos_l=2, titled=False, po="ASSOCIATED_WITH",
         pl="LOCATED_IN", ol="LOCATED_IN", pp="KNOWS",
         fact=("p", "lives in", "l")),
    dict(text="{p} married {p2} last spring.", pos_p=1, pos_p2=2,
         pos_o=None, pos_l=None, titled=False, po="ASSOCIATED_WITH",
         pl="ASSOCIATED_WITH", ol="LOCATED_IN", pp="MARRIED_TO",
         fact=("p", "married", "p2")),
    dict(text="{p} and {p2} are colleague researchers.", pos_p=1, pos_p2=2,
         pos_o=None, pos_l=None, titled=False, po="ASSOCIATED_WITH",
         pl="ASSOCIATED_WITH", ol="LOCATED_IN", pp="COLLEAGUE_OF",
         fact=None),  # "are" is not a fact verb
    dict(text="{o} is headquartered in {l}.", pos_p=None, pos_p2=None,
         pos_o=1, pos_l=2, titled=False, po="ASSOCIATED_WITH",
         pl="ASSOCIATED_WITH", ol="HEADQUARTERED_IN", pp="KNOWS",
         fact=None),  # "is headquartered in" is not a fact verb
    dict(text="{t} {p} joined {o} recently.", pos_p=1, pos_p2=None,
         pos_o=2, pos_l=None, titled=True, po="ASSOCIATED_WITH",
         pl="ASSOCIATED_WITH", ol="LOCATED_IN", pp="KNOWS",
         fact=("p", "joined", "o")),  # "Dr." fails the subj regex; p wins
    dict(text="{p} visited {l} and then met {p2}.", pos_p=1, pos_p2=3,
         pos_o=None, pos_l=2, titled=False, po="ASSOCIATED_WITH",
         pl="ASSOCIATED_WITH", ol="LOCATED_IN", pp="KNOWS",
         fact=("p", "visited", "l")),  # "met" has no capitalized subject
    # repeated-person template: phase 3 fires on BOTH occurrences, each
    # emission counts text.count(name)=2 mentions, the per-chunk dedup
    # merge sums them → n_mentions = 4 (entity/mod.rs:788-809 semantics);
    # breaks the mention_count == doc_frequency degeneracy of the
    # single-mention templates
    dict(text="{p} visited {l} and later {p} returned.", pos_p=1, pos_p2=None,
         pos_o=None, pos_l=2, titled=False, po="ASSOCIATED_WITH",
         pl="ASSOCIATED_WITH", ol="LOCATED_IN", pp="KNOWS", p_mentions=4,
         fact=("p", "visited", "l")),  # "returned" is not a fact verb
)


def _h(doc_id: int, i: int) -> int:
    """First 8 hex chars of md5 as an int — DuckDB-reproducible."""
    return int(hashlib.md5(f"kgx:{doc_id}:{i}".encode()).hexdigest()[:8], 16)


def kgx_choices(doc_id: int) -> dict:
    tid = _h(doc_id, 0) % len(KGX_TEMPLATES)
    p = _h(doc_id, 1) % len(KGX_PERSONS)
    p2 = _h(doc_id, 2) % len(KGX_PERSONS)
    if p2 == p:
        p2 = (p2 + 1) % len(KGX_PERSONS)
    return dict(
        tid=tid,
        p=p,
        p2=p2,
        o=_h(doc_id, 3) % len(KGX_ORGS),
        l=_h(doc_id, 4) % len(KGX_LOCS),
        t=_h(doc_id, 5) % len(KGX_TITLES),
    )


def kgx_sentence(doc_id: int) -> str:
    c = kgx_choices(doc_id)
    tpl = KGX_TEMPLATES[c["tid"]]
    return tpl["text"].format(
        p=KGX_PERSONS[c["p"]],
        p2=KGX_PERSONS[c["p2"]],
        o=KGX_ORGS[c["o"]][0],
        l=KGX_LOCS[c["l"]][0],
        t=KGX_TITLES[c["t"]],
    )


def kgx_spans_batch(batch: pa.Table) -> pa.Table:
    """doc_id column → single-text-span documents (runs inside map_batches)."""
    doc_ids = batch.column("doc_id").to_pylist()
    out_ids, out_spans = [], []
    for doc_id in doc_ids:
        text = kgx_sentence(int(doc_id))
        out_ids.append(str(int(doc_id)))
        out_spans.append(
            [{"kind": "text", "text": text, "media_ref": "", "offset": 0}]
        )
    return pa.Table.from_arrays(
        [pa.array(out_ids, pa.string()),
         pa.array(out_spans, type=DOCUMENTS.field("spans").type)],
        schema=DOCUMENTS,
    )


# ---------------------------------------------------------------------------
# DuckDB oracle SQL (expectation constants rendered as VALUES tables)


def _hx(i: int, prefix: str = "kgx") -> str:
    return f"('0x'||substr(md5('{prefix}:'||doc_id||':{i}'),1,8))::BIGINT"


def _sql_str(s: str | None) -> str:
    return "NULL" if s is None else "'" + s.replace("'", "''") + "'"


def _corpus_cte(person_pool: tuple[str, ...] = KGX_PERSONS,
                prefix: str = "kgx") -> str:
    """Corpus-expectation CTE scaffold; ``person_pool``/``prefix`` let the
    kgx_fuzzy twin reuse the whole template machinery over its own
    variant-bearing pool and hash salt (kgx_fuzzy.py)."""
    np_, no, nl, nt = (len(person_pool), len(KGX_ORGS), len(KGX_LOCS),
                       len(KGX_TITLES))
    persons = ",".join(f"({i},{_sql_str(n)})" for i, n in enumerate(person_pool))
    orgs = ",".join(f"({i},{_sql_str(n)},{_sql_str(s)})"
                    for i, (n, s) in enumerate(KGX_ORGS))
    locs = ",".join(f"({i},{_sql_str(n)},{str(tw).lower()})"
                    for i, (n, tw) in enumerate(KGX_LOCS))
    titles = ",".join(f"({i},{_sql_str(n)})" for i, n in enumerate(KGX_TITLES))
    tmpl = ",".join(
        "({tid},{pp_},{p2},{po_},{pl_},{ti},{po},{pl},{ol},{pq},{pm},{txt},"
        "{fs},{fp},{fo})".format(
            tid=i,
            pp_=t["pos_p"] if t["pos_p"] is not None else "NULL",
            p2=t["pos_p2"] if t["pos_p2"] is not None else "NULL",
            po_=t["pos_o"] if t["pos_o"] is not None else "NULL",
            pl_=t["pos_l"] if t["pos_l"] is not None else "NULL",
            ti=str(t["titled"]).lower(),
            po=_sql_str(t["po"]), pl=_sql_str(t["pl"]),
            ol=_sql_str(t["ol"]), pq=_sql_str(t["pp"]),
            pm=t.get("p_mentions", 1),
            txt=_sql_str(t["text"]),
            fs=_sql_str(t["fact"][0] if t["fact"] else None),
            fp=_sql_str(t["fact"][1] if t["fact"] else None),
            fo=_sql_str(t["fact"][2] if t["fact"] else None),
        )
        for i, t in enumerate(KGX_TEMPLATES)
    )
    return f"""
    choice AS (
      SELECT doc_id,
             {_hx(0, prefix)} % {len(KGX_TEMPLATES)} AS tid,
             {_hx(1, prefix)} % {np_} AS p_idx,
             {_hx(2, prefix)} % {np_} AS p2_raw,
             {_hx(3, prefix)} % {no} AS o_idx,
             {_hx(4, prefix)} % {nl} AS l_idx,
             {_hx(5, prefix)} % {nt} AS t_idx
      FROM documents),
    choice2 AS (
      SELECT *, CASE WHEN p2_raw = p_idx THEN (p2_raw + 1) % {np_}
                     ELSE p2_raw END AS p2_idx
      FROM choice),
    persons(idx, pname) AS (VALUES {persons}),
    orgs(idx, oname, osfx) AS (VALUES {orgs}),
    locs(idx, lname, ltwo) AS (VALUES {locs}),
    titles(idx, tname) AS (VALUES {titles}),
    tmpl(tid, pos_p, pos_p2, pos_o, pos_l, titled, po, pl, ol, pp, p_m, txt,
         f_subj, f_pred, f_obj)
        AS (VALUES {tmpl}),
    kgx_docs AS (
      SELECT c.doc_id, t.pos_p, t.pos_p2, t.pos_o, t.pos_l, t.titled,
             t.po, t.pl, t.ol, t.pp, t.p_m, t.f_subj, t.f_pred, t.f_obj,
             pa.pname AS p, pb.pname AS p2, o.oname AS o, o.osfx,
             l.lname AS l, l.ltwo,
             replace(replace(replace(replace(replace(t.txt,
                 '{{t}}', ti.tname), '{{p2}}', pb.pname), '{{p}}', pa.pname),
                 '{{o}}', o.oname), '{{l}}', l.lname) AS s
      FROM choice2 c
      JOIN tmpl t USING (tid)
      JOIN persons pa ON pa.idx = c.p_idx
      JOIN persons pb ON pb.idx = c.p2_idx
      JOIN orgs o ON o.idx = c.o_idx
      JOIN locs l ON l.idx = c.l_idx
      JOIN titles ti ON ti.idx = c.t_idx),
    ents_raw AS (
      SELECT doc_id, p AS name, 'PERSON' AS entity_type,
             CASE WHEN titled THEN 0.9 ELSE 0.8 END AS confidence,
             pos_p AS ord, p_m AS n_mentions, po, pl, ol, pp
        FROM kgx_docs WHERE pos_p IS NOT NULL
      UNION ALL
      SELECT doc_id, p2, 'PERSON', 0.8, pos_p2, 1, po, pl, ol, pp
        FROM kgx_docs WHERE pos_p2 IS NOT NULL
      UNION ALL
      SELECT doc_id, o, 'PERSON', 0.8, pos_o, 1, po, pl, ol, pp
        FROM kgx_docs WHERE pos_o IS NOT NULL
      UNION ALL
      SELECT doc_id, l, 'PERSON', 0.8, pos_l, 1, po, pl, ol, pp
        FROM kgx_docs WHERE pos_l IS NOT NULL AND ltwo
      UNION ALL
      SELECT doc_id, osfx, 'ORGANIZATION', 0.9, 10, 1, po, pl, ol, pp
        FROM kgx_docs WHERE pos_o IS NOT NULL AND osfx IS NOT NULL
      UNION ALL
      SELECT doc_id, l, 'LOCATION', 0.9, 20, 1, po, pl, ol, pp
        FROM kgx_docs WHERE pos_l IS NOT NULL),
    canon AS (
      SELECT entity_type || '_' || lower(replace(name, ' ', '')) AS canonical_id,
             name AS canonical_name, entity_type,
             count(DISTINCT doc_id)::BIGINT AS doc_frequency,
             sum(n_mentions)::BIGINT AS mention_count,
             round(max(confidence), 4) AS confidence
      FROM ents_raw GROUP BY 1, 2, 3),
    typed_pairs AS (
      SELECT a.doc_id,
             a.entity_type || '_' || lower(replace(a.name, ' ', '')) AS src,
             b.entity_type || '_' || lower(replace(b.name, ' ', '')) AS dst,
             a.name AS src_name, b.name AS dst_name,
             CASE
               WHEN a.entity_type = 'PERSON' AND b.entity_type = 'PERSON'
                 THEN a.pp
               WHEN (a.entity_type = 'PERSON' AND b.entity_type = 'ORGANIZATION')
                 OR (a.entity_type = 'ORGANIZATION' AND b.entity_type = 'PERSON')
                 THEN a.po
               WHEN (a.entity_type = 'PERSON' AND b.entity_type = 'LOCATION')
                 OR (a.entity_type = 'LOCATION' AND b.entity_type = 'PERSON')
                 THEN a.pl
               WHEN (a.entity_type = 'ORGANIZATION' AND b.entity_type = 'LOCATION')
                 OR (a.entity_type = 'LOCATION' AND b.entity_type = 'ORGANIZATION')
                 THEN a.ol
               ELSE 'RELATED_TO'
             END AS rel_type
      FROM ents_raw a JOIN ents_raw b
        ON a.doc_id = b.doc_id AND a.ord < b.ord),
    kgx_edge_agg AS (
      SELECT src, dst, rel_type, src_name, dst_name,
             count(*)::BIGINT AS n_occurrences
      FROM typed_pairs GROUP BY 1, 2, 3, 4, 5)
    """


def kgx_doc_entities_sql() -> str:
    return f"""
        WITH {_corpus_cte()}
        SELECT doc_id, name, entity_type, round(confidence, 4) AS confidence,
               n_mentions::BIGINT AS n_mentions
        FROM ents_raw
    """


def kgx_entities_sql() -> str:
    return f"""
        WITH {_corpus_cte()}
        SELECT canonical_id, canonical_name, entity_type, doc_frequency,
               mention_count, confidence
        FROM canon
    """


def kgx_alias_map_sql() -> str:
    return f"""
        WITH {_corpus_cte()}
        SELECT canonical_id AS entity_id, canonical_id, canonical_name,
               entity_type
        FROM canon
    """


def kgx_edges_sql() -> str:
    return f"""
        WITH {_corpus_cte()}
        SELECT src, dst, rel_type, n_occurrences
        FROM kgx_edge_agg
    """


def kgx_triples_sql() -> str:
    return f"""
        WITH {_corpus_cte()}
        SELECT src_name AS subj, rel_type AS pred, dst_name AS obj,
               n_occurrences
        FROM kgx_edge_agg
    """


def kgx_chunks_sql() -> str:
    """S1/M1 chunk fidelity: one chunk per kgx doc whose content is the
    fully rendered sentence — the oracle re-renders it with SQL replace()."""
    return f"""
        WITH {_corpus_cte()}
        SELECT doc_id || '_0' AS chunk_id, doc_id, s AS content
        FROM kgx_docs
    """


def kgx_mentions_sql() -> str:
    """M12 mention offsets: every extracted entity's non-overlapping
    occurrence offsets in the rendered sentence (entity/mod.rs:613-625).

    All slot values occur exactly once except the repeated-person template
    (p_m=4): phase 3 fires on BOTH occurrences and each firing records both
    offsets, so the merged entity carries [o1, o2, o1, o2]."""
    return f"""
        WITH {_corpus_cte()},
        p_base AS (
          SELECT doc_id, s, p AS name,
                 CASE WHEN titled THEN 0.9 ELSE 0.8 END AS confidence,
                 p_m, strpos(s, p) - 1 AS o1, length(p) AS ln
          FROM kgx_docs WHERE pos_p IS NOT NULL),
        p_occ AS (
          SELECT doc_id, s, name, confidence, ln,
                 unnest(CASE WHEN p_m = 4
                        THEN [o1, o2, o1, o2] ELSE [o1] END) AS o
          FROM (SELECT *, o1 + ln + strpos(substr(s, o1 + ln + 1), name) - 1
                          AS o2
                FROM p_base)),
        ments AS (
          SELECT doc_id, 'PERSON_' || lower(replace(name, ' ', '')) AS eid,
                 o AS start_offset, o + ln AS end_offset, confidence
          FROM p_occ
          UNION ALL
          SELECT doc_id, 'PERSON_' || lower(replace(p2, ' ', '')),
                 strpos(s, p2) - 1, strpos(s, p2) - 1 + length(p2), 0.8
          FROM kgx_docs WHERE pos_p2 IS NOT NULL
          UNION ALL
          SELECT doc_id, 'PERSON_' || lower(replace(o, ' ', '')),
                 strpos(s, o) - 1, strpos(s, o) - 1 + length(o), 0.8
          FROM kgx_docs WHERE pos_o IS NOT NULL
          UNION ALL
          SELECT doc_id, 'PERSON_' || lower(replace(l, ' ', '')),
                 strpos(s, l) - 1, strpos(s, l) - 1 + length(l), 0.8
          FROM kgx_docs WHERE pos_l IS NOT NULL AND ltwo
          UNION ALL
          SELECT doc_id, 'ORGANIZATION_' || lower(osfx),
                 strpos(s, osfx) - 1, strpos(s, osfx) - 1 + length(osfx), 0.9
          FROM kgx_docs WHERE pos_o IS NOT NULL AND osfx IS NOT NULL
          UNION ALL
          SELECT doc_id, 'LOCATION_' || lower(replace(l, ' ', '')),
                 strpos(s, l) - 1, strpos(s, l) - 1 + length(l), 0.9
          FROM kgx_docs WHERE pos_l IS NOT NULL)
        SELECT eid AS entity_id, doc_id || '_0' AS chunk_id,
               start_offset::BIGINT AS start_offset,
               end_offset::BIGINT AS end_offset,
               round(confidence, 4) AS confidence
        FROM ments
    """


def kgx_atomic_facts_sql() -> str:
    """M10/A5 atomic facts: the mock ATOM decomposer's sentence regex
    (stages/atomic_facts.py _FACT_RE) yields exactly one hand-derived
    (subj, verb-phrase, obj) fact for 9 of 11 templates and none for the
    other two; no kgx tail carries a temporal marker."""
    return f"""
        WITH {_corpus_cte()}
        SELECT doc_id || '_0' AS chunk_id,
               CASE f_subj WHEN 'p' THEN p WHEN 'p2' THEN p2
                           WHEN 'o' THEN o WHEN 'l' THEN l END AS subj,
               upper(replace(f_pred, ' ', '_')) AS pred,
               CASE f_obj WHEN 'p' THEN p WHEN 'p2' THEN p2
                          WHEN 'o' THEN o WHEN 'l' THEN l END AS obj,
               NULL::VARCHAR AS temporal_marker,
               NULL::BIGINT AS timestamp,
               0.8::DOUBLE AS confidence
        FROM kgx_docs WHERE f_pred IS NOT NULL
    """


def kgx_validated_facts_sql() -> str:
    """A4 triple reflection over the kgx facts: every fact's subj and obj
    are verbatim slot values of the same sentence, so the mock validator
    accepts all of them at confidence 0.9."""
    return f"""
        WITH {_corpus_cte()}
        SELECT doc_id || '_0' AS chunk_id,
               CASE f_subj WHEN 'p' THEN p WHEN 'p2' THEN p2
                           WHEN 'o' THEN o WHEN 'l' THEN l END AS subj,
               upper(replace(f_pred, ' ', '_')) AS pred,
               CASE f_obj WHEN 'p' THEN p WHEN 'p2' THEN p2
                          WHEN 'o' THEN o WHEN 'l' THEN l END AS obj,
               true AS is_valid,
               0.9::DOUBLE AS validation_confidence
        FROM kgx_docs WHERE f_pred IS NOT NULL
    """


def kgx_gleaning_sql() -> str:
    """A1/A2 gleaning (MockLLM at min_confidence 0.7) over the kgx corpus.

    The mock answers with pattern-extractor results serialized through a
    name-keyed JSON round trip, so the one name shared by two entities —
    a two-word location extracted as both PERSON and LOCATION — resolves
    to the LAST entity with that name (the LOCATION): the expected edge
    set is typed_pairs with such PERSON endpoints rewritten to the
    LOCATION id, then de-duplicated. The per-name first-wins relationship
    dedup never drops a pair because no template assigns the same relation
    type to the (P,P)/(P,L) or (O,P)/(O,L) pair kinds when a two-word
    location is present (pp != pl and po != ol hold template-wide)."""
    return f"""
        WITH {_corpus_cte()},
        two_word_locs AS (SELECT lname FROM locs WHERE ltwo),
        gl_edges AS (
          SELECT DISTINCT
            CASE WHEN src_name IN (SELECT lname FROM two_word_locs)
                      AND src = 'PERSON_' || lower(replace(src_name, ' ', ''))
                 THEN 'LOCATION_' || lower(replace(src_name, ' ', ''))
                 ELSE src END AS src_id,
            CASE WHEN dst_name IN (SELECT lname FROM two_word_locs)
                      AND dst = 'PERSON_' || lower(replace(dst_name, ' ', ''))
                 THEN 'LOCATION_' || lower(replace(dst_name, ' ', ''))
                 ELSE dst END AS dst_id,
            rel_type
          FROM typed_pairs)
        SELECT 'entity' AS row_kind, doc_id::VARCHAR AS doc_id,
               entity_type || '_' || lower(replace(name, ' ', '')) AS entity_id,
               name, entity_type,
               NULL::VARCHAR AS src_id, NULL::VARCHAR AS dst_id,
               NULL::VARCHAR AS rel_type
        FROM ents_raw
        UNION ALL
        SELECT 'edge', NULL, NULL, NULL, NULL, src_id, dst_id, rel_type
        FROM gl_edges
    """


def kgx_stats_sql() -> str:
    """G9 graph statistics (graph/mod.rs:330-352) over the kgx graph."""
    return f"""
        WITH {_corpus_cte()},
        base AS (
          SELECT (SELECT count(*) FROM canon)::DOUBLE AS n_ent,
                 (SELECT count(*) FROM kgx_edge_agg)::DOUBLE AS n_edge,
                 (SELECT count(*) FROM documents)::DOUBLE AS n_docs)
        SELECT 'entity_count' AS stat, n_ent AS value FROM base
        UNION ALL SELECT 'relationship_count', n_edge FROM base
        UNION ALL SELECT 'document_count', n_docs FROM base
        UNION ALL SELECT 'chunk_count', n_docs FROM base
        UNION ALL SELECT 'average_entities_per_chunk',
                  round(n_ent / n_docs, 4) FROM base
        UNION ALL SELECT 'density',
                  round(n_edge / (n_ent * (n_ent - 1)), 4) FROM base
        UNION ALL
        SELECT 'entity_type:' || entity_type, count(*)::DOUBLE
        FROM canon GROUP BY entity_type
    """


def kgx_cooccur_sql() -> str:
    """G8 doc co-occurrence edges: sorted distinct entity-id pairs per doc,
    summed across docs (corpus/knowledge_graph.rs:192-240; the 2000-pair
    cap is never reached at ≤4 entities per kgx doc)."""
    return f"""
        WITH {_corpus_cte()},
        eids AS (
          SELECT DISTINCT doc_id,
                 entity_type || '_' || lower(replace(name, ' ', '')) AS eid
          FROM ents_raw)
        SELECT a.eid AS src, b.eid AS dst, count(*)::BIGINT AS n_docs,
               'co_occurs' AS rel_type, 0.7 AS confidence
        FROM eids a JOIN eids b ON a.doc_id = b.doc_id AND a.eid < b.eid
        GROUP BY 1, 2
    """


def kgx_common_entities_sql() -> str:
    """T4 top-k by mention count (entity/bidirectional_index.rs:315-335),
    ties broken by canonical_id ascending."""
    return f"""
        WITH {_corpus_cte()}
        SELECT canonical_id, canonical_name, entity_type, mention_count
        FROM canon
        ORDER BY mention_count DESC, canonical_id ASC LIMIT 20
    """


def kgx_components_sql() -> str:
    """L3 connected components + degree: the pipeline's deterministic
    union-find (smaller id becomes root) labels every component by its
    minimum entity id, which SQL reproduces as min reachable id; degree
    counts incident edge rows (graph/analytics.rs)."""
    return f"""
        WITH RECURSIVE {_corpus_cte()},
        nodes AS (SELECT canonical_id AS node FROM canon),
        und AS (SELECT src AS a, dst AS b FROM kgx_edge_agg
                UNION SELECT dst, src FROM kgx_edge_agg),
        reach(a, b) AS (
          SELECT node, node FROM nodes
          UNION
          SELECT r.a, u.b FROM reach r JOIN und u ON u.a = r.b),
        comp AS (SELECT a AS entity_id, min(b) AS component
                 FROM reach GROUP BY a),
        incid AS (SELECT src AS node FROM kgx_edge_agg
                  UNION ALL SELECT dst FROM kgx_edge_agg),
        deg AS (SELECT node, count(*)::BIGINT AS degree FROM incid
                GROUP BY node)
        SELECT c.entity_id, c.component,
               coalesce(d.degree, 0)::BIGINT AS degree
        FROM comp c LEFT JOIN deg d ON d.node = c.entity_id
    """


def kgx_louvain_sql() -> str:
    """L3 'Louvain' as the reference ships it (analytics.rs:97-180):
    components over edge-connected nodes, community ids in sorted-node
    discovery order (= dense rank of the component's min node), simplified
    modularity = internal edge ends / (2 * node count)."""
    return f"""
        WITH RECURSIVE {_corpus_cte()},
        enodes AS (SELECT DISTINCT node FROM (
            SELECT src AS node FROM kgx_edge_agg
            UNION ALL SELECT dst FROM kgx_edge_agg)),
        und AS (SELECT src AS a, dst AS b FROM kgx_edge_agg
                UNION SELECT dst, src FROM kgx_edge_agg),
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
              FROM kgx_edge_agg e
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


def kgx_graph_metrics_sql() -> str:
    """L3 graph metrics (analytics.rs:432-487): density over edge-connected
    nodes, and average clustering coefficient where neighbor lists keep
    multi-edge multiplicity but triangle membership tests the distinct
    neighbor set — mirrored via the (mult, distinct) split below."""
    return f"""
        WITH {_corpus_cte()},
        dirs AS (SELECT src AS a, dst AS b FROM kgx_edge_agg
                 UNION ALL SELECT dst, src FROM kgx_edge_agg),
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
        ee AS (SELECT count(*)::DOUBLE AS m FROM kgx_edge_agg)
        SELECT 'density' AS stat,
               round(2.0 * ee.m / (nn.n * (nn.n - 1)), 4) AS value
        FROM nn, ee
        UNION ALL
        SELECT 'avg_clustering_coefficient',
               round(coalesce(avg(c), 0.0), 4) FROM pern
    """


def kgx_enriched_sql() -> str:
    """M4 enrichment oracle: TF-IDF keywords re-derived in SQL
    (keyword_extraction.rs:37-116 — tokenize keeping [alnum-_], len>2,
    non-stopword, non-digit; tf = cnt/total, idf = max(0, ln(N/df)),
    top-5 by (score DESC, term)); single-sentence chunks make the
    extractive summary the sentence itself and chapter NULL."""
    from .stages.enrich import STOPWORDS

    stop_in = ",".join(f"'{w}'" for w in sorted(STOPWORDS))
    return f"""
        WITH {_corpus_cte()},
        toks AS (
          SELECT doc_id, t AS term FROM (
            SELECT doc_id,
                   unnest(list_transform(regexp_split_to_array(s, '\\s+'),
                       w -> lower(regexp_replace(w, '[^0-9A-Za-z_-]', '',
                                                 'g')))) AS t
            FROM kgx_docs) z
          WHERE t <> '' AND length(t) > 2 AND t NOT IN ({stop_in})
            AND NOT regexp_matches(t, '^[0-9]+$')),
        dfreq AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df
                  FROM toks GROUP BY term),
        cnts AS (SELECT doc_id, term, count(*)::BIGINT AS cnt
                 FROM toks GROUP BY 1, 2),
        tots AS (SELECT doc_id, count(*)::BIGINT AS total
                 FROM toks GROUP BY 1),
        ndocs AS (SELECT count(*)::BIGINT AS n FROM documents),
        sc AS (
          SELECT c.doc_id, c.term,
                 (c.cnt::DOUBLE / t.total)
                 * greatest(0.0, ln(nd.n::DOUBLE / d.df)) AS score
          FROM cnts c
          JOIN tots t USING (doc_id)
          JOIN dfreq d USING (term)
          CROSS JOIN ndocs nd),
        topk AS (
          SELECT doc_id, term, score FROM (
            SELECT doc_id, term, score,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY score DESC, term) AS rn
            FROM sc) z WHERE rn <= 5),
        kw AS (SELECT doc_id,
                      array_to_string(
                          list(term ORDER BY score DESC, term), '|') AS kws
               FROM topk GROUP BY doc_id)
        SELECT d.doc_id || '_0' AS chunk_id,
               coalesce(k.kws, '') AS keywords,
               d.s AS summary,
               NULL::VARCHAR AS chapter
        FROM kgx_docs d LEFT JOIN kw k USING (doc_id)
    """


def kgx_yake_sql() -> str:
    """YAKE keyword oracle (stages/enrich.py yake_keywords, Campos et al.
    2020) over the kgx corpus — see yake_tail."""
    return f"""
        WITH {_corpus_cte()},
        {yake_tail('kgx_docs', "d.doc_id || '_0'")}
    """


def yake_tail(docs_rel: str, chunk_id_expr: str) -> str:
    """YAKE replay tail over any (doc_id, s) text relation: every per-term
    feature — casing, median global position, frequency vs mean+std,
    distinct window-2 neighbors, sentence dispersion — is recomputed in
    SQL over the text (sentence split mirrors the lookbehind regex via a
    marker replace, RE2 having no lookbehind), with the score formula
    mirrored op-for-op; ordering is (score ASC, term ASC), lower =
    better. Shared by the kgx corpus (single-sentence docs) and the
    flagship chunk stream (multi-sentence chunks exercise the dispersion
    and cross-sentence-window features the kgx corpus cannot)."""
    from .stages.enrich import STOPWORDS

    stop_in = ",".join(f"'{w}'" for w in sorted(STOPWORDS))
    return f"""
        sraw AS (
          SELECT doc_id,
                 string_split(regexp_replace(s, '([.!?])\\s+',
                                             '\\1@@SPLIT@@', 'g'),
                              '@@SPLIT@@') AS parts
          FROM {docs_rel}),
        sents AS (
          SELECT doc_id,
                 row_number() OVER (PARTITION BY doc_id ORDER BY g) - 1 AS si,
                 parts[g] AS stext
          FROM sraw, unnest(generate_series(1, array_length(parts))) t(g)
          WHERE trim(parts[g]) <> ''),
        stoks AS (
          SELECT doc_id, si,
                 regexp_extract_all(stext,
                     '[A-Za-z][A-Za-z0-9_'']*') AS tok
          FROM sents),
        occ AS (
          SELECT doc_id, si, g - 1 AS ti, tok[g] AS w, lower(tok[g]) AS lw,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY si, g) - 1 AS gpos
          FROM stoks, unnest(generate_series(1, array_length(tok))) t(g)),
        tfs AS (
          SELECT doc_id, lw, count(*)::BIGINT AS f,
                 count(*) FILTER (WHERE w = upper(w) AND length(w) > 1)
                     ::BIGINT AS fu,
                 count(*) FILTER (WHERE NOT (w = upper(w) AND length(w) > 1)
                     AND substr(w, 1, 1) = upper(substr(w, 1, 1))
                     AND ti <> 0)::BIGINT AS fp,
                 count(DISTINCT si)::BIGINT AS nsent
          FROM occ GROUP BY 1, 2),
        medp AS (
          SELECT doc_id, lw, gpos AS med_pos FROM (
            SELECT doc_id, lw, gpos,
                   row_number() OVER (PARTITION BY doc_id, lw
                                      ORDER BY gpos) AS rn,
                   count(*) OVER (PARTITION BY doc_id, lw) AS cnt
            FROM occ) z WHERE rn = cnt // 2 + 1),
        neigh AS (
          SELECT o.doc_id, o.lw,
                 count(DISTINCT n.lw) FILTER (
                     WHERE n.ti BETWEEN o.ti - 2 AND o.ti - 1) AS nleft,
                 count(DISTINCT n.lw) FILTER (
                     WHERE n.ti BETWEEN o.ti + 1 AND o.ti + 2) AS nright
          FROM occ o LEFT JOIN occ n
            ON n.doc_id = o.doc_id AND n.si = o.si
           AND n.ti BETWEEN o.ti - 2 AND o.ti + 2 AND n.ti <> o.ti
          GROUP BY 1, 2),
        dmean AS (
          SELECT doc_id,
                 sum(f) FILTER (WHERE keep)::DOUBLE
                     / count(*) FILTER (WHERE keep) AS mean_tf,
                 max(f) AS max_tf
          FROM (SELECT doc_id, f,
                       lw NOT IN ({stop_in}) AND length(lw) > 2 AS keep
                FROM tfs) z GROUP BY doc_id),
        dstat AS (
          -- std replayed as Python's literal two-pass formula, terms
          -- accumulated in FIRST-OCCURRENCE order (dict order of the
          -- Python tf map): var_pop's different accumulation diverges in
          -- the last ulp, which can flip near-tie keyword rankings
          SELECT t.doc_id, any_value(m.mean_tf) AS mean_tf,
                 sqrt(coalesce(list_sum(
                     list((t.f::DOUBLE - m.mean_tf)
                          * (t.f::DOUBLE - m.mean_tf)
                          ORDER BY t.firstpos)), 0.0)
                      / count(*)) AS std_tf,
                 any_value(m.max_tf) AS max_tf
          FROM (SELECT doc_id, lw, f, min(gpos) AS firstpos
                FROM tfs JOIN occ USING (doc_id, lw)
                WHERE lw NOT IN ({stop_in}) AND length(lw) > 2
                GROUP BY doc_id, lw, f) t
          JOIN dmean m USING (doc_id)
          GROUP BY t.doc_id),
        nsents AS (SELECT doc_id, count(*)::BIGINT AS n_sent
                   FROM sents GROUP BY doc_id),
        sc AS (
          SELECT t.doc_id, t.lw AS term,
                 ((1.0 + (nb.nleft::DOUBLE / t.f + nb.nright::DOUBLE / t.f)
                       * t.f / d.max_tf)
                  * ln(ln(3.0 + m.med_pos)))
                 / (greatest(t.fu, t.fp)::DOUBLE / (1.0 + ln(t.f::DOUBLE))
                    + (t.f / (d.mean_tf + d.std_tf + 1e-9))
                      / (1.0 + (nb.nleft::DOUBLE / t.f
                                + nb.nright::DOUBLE / t.f)
                             * t.f / d.max_tf)
                    + (t.nsent::DOUBLE / ns.n_sent)
                      / (1.0 + (nb.nleft::DOUBLE / t.f
                                + nb.nright::DOUBLE / t.f)
                             * t.f / d.max_tf)
                    + 1e-9) AS score
          FROM tfs t
          JOIN medp m USING (doc_id, lw)
          JOIN neigh nb USING (doc_id, lw)
          JOIN dstat d USING (doc_id)
          JOIN nsents ns USING (doc_id)
          WHERE t.lw NOT IN ({stop_in}) AND length(t.lw) > 2),
        topk AS (
          SELECT doc_id, term, score FROM (
            SELECT doc_id, term, score,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY score ASC, term ASC) AS rn
            FROM sc) z WHERE rn <= 5),
        kw AS (SELECT doc_id,
                      array_to_string(list(term ORDER BY score ASC, term ASC),
                                      '|') AS kws
               FROM topk GROUP BY doc_id)
        SELECT {chunk_id_expr} AS chunk_id,
               coalesce(k.kws, '') AS keywords
        FROM {docs_rel} d LEFT JOIN kw k USING (doc_id)
    """


def kgx_community_summaries_sql() -> str:
    """A9 oracle: rebuild the component partition (min-reachable root →
    dense id in root order) and the summarizer's exact string format —
    header lines, per-type '- TYPE: first5[, and N more]' lines sorted by
    type, members sorted by entity id."""
    return f"""
        WITH RECURSIVE {_corpus_cte()},
        nodes AS (SELECT canonical_id AS node FROM canon),
        und AS (SELECT src AS a, dst AS b FROM kgx_edge_agg
                UNION SELECT dst, src FROM kgx_edge_agg),
        reach(a, b) AS (
          SELECT node, node FROM nodes
          UNION
          SELECT r.a, u.b FROM reach r JOIN und u ON u.a = r.b),
        comp AS (SELECT a AS entity_id, min(b) AS root FROM reach GROUP BY a),
        cid AS (SELECT root,
                       (dense_rank() OVER (ORDER BY root) - 1)::BIGINT
                           AS community_id
                FROM (SELECT DISTINCT root FROM comp)),
        memb AS (
          SELECT cid.community_id, comp.entity_id, c.canonical_name AS name,
                 c.entity_type
          FROM comp JOIN cid USING (root)
          JOIN canon c ON c.canonical_id = comp.entity_id),
        tline AS (
          SELECT community_id, entity_type,
                 '- ' || entity_type || ': '
                 || array_to_string(
                        (list(name ORDER BY entity_id))[1:5], ', ')
                 || CASE WHEN count(*) > 5
                         THEN ' and ' || (count(*) - 5) || ' more'
                         ELSE '' END AS line
          FROM memb GROUP BY community_id, entity_type),
        body AS (
          SELECT community_id,
                 array_to_string(list(line ORDER BY entity_type), chr(10))
                     AS tlines
          FROM tline GROUP BY community_id),
        head AS (
          SELECT community_id, count(*)::BIGINT AS entity_count
          FROM memb GROUP BY community_id)
        SELECT 0::BIGINT AS level, h.community_id,
               'Community ' || h.community_id || ' (Level 0)' || chr(10)
               || 'Contains ' || h.entity_count || ' entities:' || chr(10)
               || b.tlines AS summary,
               h.entity_count
        FROM head h JOIN body b USING (community_id)
    """


def kgx_layout_sql() -> str:
    """S8 oracle: the two heading rows per doc (markdown for even doc_ids,
    HTML for odd), with start offsets derived from component lengths."""
    return f"""
        WITH {_corpus_cte()},
        lay AS (
          SELECT doc_id, p, l, s, doc_id % 2 = 0 AS is_md FROM kgx_docs)
        SELECT doc_id::VARCHAR AS doc_id, 0 AS section_idx, 1 AS level,
               CASE WHEN is_md THEN 'Intro ' || p
                    ELSE 'Main ' || p END AS title,
               0::BIGINT AS start_offset
        FROM lay
        UNION ALL
        SELECT doc_id::VARCHAR, 1, 2,
               CASE WHEN is_md THEN 'More ' || l ELSE 'Sub ' || l END,
               CASE WHEN is_md
                    THEN length('# Intro ' || p) + 1 + length(s) + 1
                    ELSE length('<h1>Main ' || p || '</h1><p>' || s
                                || '</p>') END::BIGINT
        FROM lay
    """


def kgx_graphml_import_sql() -> str:
    """S2 GraphML oracle: node rows from the declared pools, edge counts
    from the same md5 choice arithmetic the file was generated with."""
    persons = ",".join(f"({i},{_sql_str(n)})"
                       for i, n in enumerate(KGX_PERSONS))
    orgs = ",".join(f"({i},{_sql_str(n)})"
                    for i, (n, _s) in enumerate(KGX_ORGS))
    return f"""
        WITH persons(idx, pname) AS (VALUES {persons}),
        orgs(idx, oname) AS (VALUES {orgs}),
        choice AS (
          SELECT doc_id,
                 {_hx(0)} % {len(KGX_TEMPLATES)} AS tid,
                 {_hx(1)} % {len(KGX_PERSONS)} AS p_idx,
                 {_hx(3)} % {len(KGX_ORGS)} AS o_idx
          FROM documents)
        SELECT 'entity' AS row_kind, 'p' || idx AS entity_id, pname AS name,
               'person' AS entity_type, NULL::VARCHAR AS src,
               NULL::VARCHAR AS dst, NULL::VARCHAR AS rel_type,
               NULL::BIGINT AS n
        FROM persons
        UNION ALL
        SELECT 'entity', 'o' || idx, oname, 'org', NULL, NULL, NULL, NULL
        FROM orgs
        UNION ALL
        SELECT 'relationship', NULL, NULL, NULL,
               'p' || p_idx, 'o' || o_idx, 'r' || tid, count(*)::BIGINT
        FROM choice GROUP BY 5, 6, 7
    """


def kgx_media_meta_sql() -> str:
    """Media loader metadata (stages/media.py MediaBytesLoader._fetch):
    width = 64 + h[0] % 192, height = 64 + h[1] % 192,
    duration = 1000 + int(h[2:4]) % 29000 over md5(media_ref) bytes —
    re-derived here from the same md5 hex."""
    return """
        SELECT doc_id::VARCHAR AS doc_id,
               'media://' || doc_id AS media_ref,
               (64 + ('0x' || substr(md5('media://' || doc_id), 1, 2))::BIGINT
                     % 192)::INT AS width,
               (64 + ('0x' || substr(md5('media://' || doc_id), 3, 2))::BIGINT
                     % 192)::INT AS height,
               (1000 + ('0x' || substr(md5('media://' || doc_id), 5, 4))::BIGINT
                       % 29000)::BIGINT AS duration_ms
        FROM documents
    """


def kgx_media_frames_sql() -> str:
    """1-fps frame-sampling explode: timestamps 0, 1000, ... < duration."""
    return """
        WITH meta AS (
          SELECT doc_id::VARCHAR AS doc_id,
                 'media://' || doc_id AS media_ref,
                 1000 + ('0x' || substr(md5('media://' || doc_id), 5, 4))::BIGINT
                        % 29000 AS duration_ms
          FROM documents)
        SELECT doc_id, media_ref,
               (ts // 1000)::INT AS frame_idx,
               ts::BIGINT AS ts_ms
        FROM meta, unnest(generate_series(0, duration_ms - 1, 1000)) AS g(ts)
    """


def kgx_centrality_sql() -> str:
    """L3 degree/betweenness/closeness (analytics.rs:182-279) over the kgx
    graph. On the unit-weight graph the pipeline's deterministic Dijkstra
    ((dist, id) heap order, strict relaxation) yields parent(v) = the
    minimum-id neighbor one BFS level closer to the source, so each
    source's shortest-path tree — and hence the subtree-size betweenness
    accumulation — is reproducible in SQL: betweenness(v) = #{(s, t) :
    v is a proper ancestor of t in s's tree, v != s} / ((n-1)(n-2)/2)."""
    return f"""
        WITH RECURSIVE {_corpus_cte()},
        dirs AS (SELECT src AS a, dst AS b FROM kgx_edge_agg
                 UNION ALL SELECT dst, src FROM kgx_edge_agg),
        cnodes AS (SELECT DISTINCT a AS v FROM dirs),
        nn AS (SELECT count(*)::BIGINT AS n FROM cnodes),
        walk(s, v, d) AS (
          SELECT v, v, 0 FROM cnodes
          UNION
          SELECT w.s, di.b, w.d + 1
          FROM walk w JOIN dirs di ON di.a = w.v CROSS JOIN nn
          WHERE w.d + 1 < nn.n),
        dist AS (SELECT s, v, min(d)::BIGINT AS d FROM walk GROUP BY s, v),
        par AS (
          SELECT dv.s, dv.v, min(du.v) AS p
          FROM dist dv
          JOIN dirs di ON di.b = dv.v
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


def kgx_pagerank_sql() -> str:
    """L2 PageRank as a recursive-CTE power iteration mirroring the
    pipeline's vectorized task (stages/graph_analytics.py:_pagerank_task /
    graph/pagerank.rs): undirected edges contribute both directions with
    multi-edge weight, damping 0.85, uniform reset, dangling mass
    redistributed, L1 early-stop at 1e-6, ≤100 iterations. Arithmetic is
    mirrored op-for-op (score * (1/deg), (1.0-0.85) * reset) so the only
    divergence is float summation order — orders of magnitude below the
    round-4 comparison grid."""
    return f"""
        WITH RECURSIVE {_corpus_cte()},
        nodes AS (SELECT canonical_id AS node FROM canon),
        dirs AS (SELECT src AS a, dst AS b FROM kgx_edge_agg
                 UNION ALL SELECT dst, src FROM kgx_edge_agg),
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


def bm25_topk_sql(query_terms=("spark", "table", "join", "vector"),
                  k: int = 10) -> str:
    """BM25 oracle (retrieval/bm25.rs semantics re-derived in SQL): the
    same tokenizer, Lucene idf = ln(N/df)+1, normalized tf in the
    saturation term, k1=1.2 b=0.75; ordering by (round4 score DESC,
    doc_id) matches the engine's pinned tie-break."""
    from .stages.retrieval import BM25_STOPWORDS

    stop_in = ",".join(f"'{w}'" for w in sorted(BM25_STOPWORDS))
    qvals = ",".join(f"('{t}')" for t in query_terms)
    return f"""
        WITH toks AS (
          SELECT doc_id, t AS term FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       regexp_split_to_array(lower(text), '\\s+'),
                       w -> regexp_replace(w, '[^a-z0-9]', '', 'g'))) AS t
            FROM documents) z
          WHERE t <> '' AND length(t) > 2 AND t NOT IN ({stop_in})),
        dl AS (SELECT d.doc_id, coalesce(x.c, 0)::DOUBLE AS doclen
               FROM documents d LEFT JOIN
                 (SELECT doc_id, count(*) AS c FROM toks GROUP BY 1) x
                 USING (doc_id)),
        g AS (SELECT count(*)::DOUBLE AS n,
                     sum(doclen) / count(*) AS avgdl FROM dl),
        q(term) AS (VALUES {qvals}),
        tf AS (SELECT t.doc_id, t.term, count(*)::DOUBLE AS f
               FROM toks t JOIN q USING (term) GROUP BY 1, 2),
        dfq AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
        sc AS (
          SELECT tf.doc_id,
                 sum((ln(g.n / dfq.df) + 1.0)
                     * ((tf.f / dl.doclen) * (1.2::DOUBLE + 1.0))
                     / ((tf.f / dl.doclen)
                        + 1.2::DOUBLE * (1.0 - 0.75::DOUBLE
                            + 0.75::DOUBLE * dl.doclen / g.avgdl)))
                     AS score
          FROM tf JOIN dl USING (doc_id) CROSS JOIN g JOIN dfq USING (term)
          GROUP BY tf.doc_id)
        SELECT doc_id, round(score, 4) AS score
        FROM sc ORDER BY round(score, 4) DESC, doc_id LIMIT {k}
    """


def kgx_ppr_sql(k: int = 10) -> str:
    """Personalized-PageRank retrieval oracle: the kgx_pagerank recursive
    power iteration with the reset vector concentrated on the
    lexicographically first canonical entity, top-k by (round4 score DESC,
    entity id)."""
    return f"""
        WITH RECURSIVE {_corpus_cte()},
        nodes AS (SELECT canonical_id AS node FROM canon),
        dirs AS (SELECT src AS a, dst AS b FROM kgx_edge_agg
                 UNION ALL SELECT dst, src FROM kgx_edge_agg),
        oinv AS (SELECT a, 1.0::DOUBLE / count(*) AS inv FROM dirs GROUP BY a),
        cst AS (SELECT 1.0::DOUBLE / count(*) AS invn FROM nodes),
        rv AS (SELECT node,
                      CASE WHEN node = (SELECT min(node) FROM nodes)
                           THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END AS r
               FROM nodes),
        pr(iter, node, score, prev) AS (
          SELECT 0, node, (SELECT invn FROM cst), 0.0::DOUBLE FROM nodes
          UNION ALL
          SELECT p.iter + 1, p.node,
                 (1.0::DOUBLE - 0.85::DOUBLE) * rv.r
                 + 0.85::DOUBLE * (
                     coalesce((SELECT sum(q.score * oi.inv)
                               FROM pr q
                               JOIN dirs d ON d.a = q.node AND d.b = p.node
                               JOIN oinv oi ON oi.a = q.node), 0.0)
                     + coalesce((SELECT sum(q2.score) FROM pr q2
                                 LEFT JOIN oinv o2 ON o2.a = q2.node
                                 WHERE o2.a IS NULL), 0.0) * rv.r),
                 p.score
          FROM pr p JOIN rv ON rv.node = p.node
          WHERE p.iter < 100
            AND (SELECT sum(abs(q3.score - q3.prev)) FROM pr q3) >= 1e-6)
        SELECT node AS entity_id, round(score, 4) AS score
        FROM pr WHERE iter = (SELECT max(iter) FROM pr)
        ORDER BY round(score, 4) DESC, node LIMIT {k}
    """


def dedup_semantic_keep_sql(threshold: float = 0.45) -> str:
    """Semantic-dedup oracle: the near-dup pair predicate (round4 cosine
    >= threshold) plus a recursive min-label closure — keep_id = minimum
    vec_id reachable through the near-dup graph (singletons keep
    themselves), matching the union-find's smaller-id-roots invariant."""
    return f"""
        WITH RECURSIVE pairs AS (
          SELECT a.vec_id AS va, b.vec_id AS vb
          FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
          WHERE round(list_cosine_similarity(a.embedding,
                    b.embedding)::DOUBLE, 4) >= {threshold}),
        und AS (SELECT va AS a, vb AS b FROM pairs
                UNION SELECT vb, va FROM pairs),
        reach(a, b) AS (
          SELECT vec_id, vec_id FROM embeddings
          UNION
          SELECT r.a, u.b FROM reach r JOIN und u ON u.a = r.b)
        SELECT a::BIGINT AS vec_id, min(b)::BIGINT AS keep_id
        FROM reach GROUP BY a
    """


def hybrid_topk_sql(k: int = 60, top_n: int = 10) -> str:
    """Hybrid retrieval oracle: RRF over the BM25 ranking (bm25_topk_sql
    at k=100) and the cosine ranking, both re-ranked deterministically by
    (score DESC, id)."""
    return f"""
        WITH kw AS (
          SELECT doc_id,
                 row_number() OVER (ORDER BY score DESC, doc_id) AS r
          FROM ({bm25_topk_sql(k=100)})),
        cos AS (
          SELECT vec_id,
                 round(list_cosine_similarity(embedding,
                     (SELECT embedding FROM embeddings WHERE vec_id = 0)
                 )::DOUBLE, 4) AS sim
          FROM embeddings ORDER BY sim DESC, vec_id LIMIT 100),
        cr AS (SELECT vec_id,
                      row_number() OVER (ORDER BY sim DESC, vec_id) AS r
               FROM cos),
        u AS (SELECT doc_id AS id, r FROM kw
              UNION ALL SELECT vec_id, r FROM cr),
        s AS (SELECT id, sum(1.0 / ({k} + r)) AS score FROM u GROUP BY id)
        SELECT id::BIGINT AS doc_id, round(score, 6) AS rrf
        FROM s ORDER BY rrf DESC, doc_id LIMIT {top_n}
    """


def kgx_csv_import_sql() -> str:
    """S2 CSV-import oracle: expected grouped entity rows from the same
    md5 choice arithmetic the CSV was generated with."""
    persons = ",".join(f"({i},{_sql_str(n)})"
                       for i, n in enumerate(KGX_PERSONS))
    return f"""
        WITH persons(idx, pname) AS (VALUES {persons}),
        choice AS (
          SELECT doc_id,
                 {_hx(1)} % {len(KGX_PERSONS)} AS p_idx,
                 round(({_hx(6)} % 100) / 100.0, 2) AS conf
          FROM documents)
        SELECT 'PERSON_' || lower(replace(p.pname, ' ', '')) AS entity_id,
               p.pname AS name, 'PERSON' AS entity_type,
               count(*)::BIGINT AS n,
               round(max(c.conf)::DOUBLE, 4) AS max_conf
        FROM choice c JOIN persons p ON p.idx = c.p_idx
        GROUP BY 1, 2, 3
    """


def _bm25_block(src: str, terms, k: int, tag: str) -> str:
    """Parameterized BM25 CTE block over source CTE ``src(doc_id, text)``:
    emits ``{tag}rank(doc_id, score, r)`` = the store's top-k by
    (round4 score DESC, doc_id), same arithmetic as bm25_topk_sql."""
    from .stages.retrieval import BM25_STOPWORDS

    stop_in = ",".join(f"'{w}'" for w in sorted(BM25_STOPWORDS))
    qvals = ",".join(f"('{t}')" for t in terms)
    return f"""
        {tag}toks AS (
          SELECT doc_id, t AS term FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       regexp_split_to_array(lower(text), '\\s+'),
                       w -> regexp_replace(w, '[^a-z0-9]', '', 'g'))) AS t
            FROM {src}) z
          WHERE t <> '' AND length(t) > 2 AND t NOT IN ({stop_in})),
        {tag}dl AS (SELECT d.doc_id, coalesce(x.c, 0)::DOUBLE AS doclen
               FROM {src} d LEFT JOIN
                 (SELECT doc_id, count(*) AS c FROM {tag}toks GROUP BY 1) x
                 USING (doc_id)),
        {tag}g AS (SELECT count(*)::DOUBLE AS n,
                     sum(doclen) / count(*) AS avgdl FROM {tag}dl),
        {tag}q(term) AS (VALUES {qvals}),
        {tag}tf AS (SELECT t.doc_id, t.term, count(*)::DOUBLE AS f
               FROM {tag}toks t JOIN {tag}q USING (term) GROUP BY 1, 2),
        {tag}dfq AS (SELECT term, count(*)::DOUBLE AS df
                     FROM {tag}tf GROUP BY term),
        {tag}sc AS (
          SELECT tf.doc_id,
                 sum((ln(g.n / dfq.df) + 1.0)
                     * ((tf.f / dl.doclen) * (1.2::DOUBLE + 1.0))
                     / ((tf.f / dl.doclen)
                        + 1.2::DOUBLE * (1.0 - 0.75::DOUBLE
                            + 0.75::DOUBLE * dl.doclen / g.avgdl)))
                     AS score
          FROM {tag}tf tf JOIN {tag}dl dl USING (doc_id)
          CROSS JOIN {tag}g g JOIN {tag}dfq dfq USING (term)
          GROUP BY tf.doc_id),
        {tag}rank AS (
          SELECT doc_id, round(score, 4) AS score,
                 row_number() OVER (ORDER BY round(score, 4) DESC, doc_id)
                     AS r
          FROM {tag}sc
          ORDER BY round(score, 4) DESC, doc_id LIMIT {k})
    """


def dual_retrieval_sql(high_terms=("data", "window"),
                       low_terms=("spark", "table", "join", "vector"),
                       k: int = 10, strategy: str = "interleave",
                       high_weight: float = 0.6,
                       low_weight: float = 0.4) -> str:
    """Oracle for the LightRAG dual-level retriever
    (lightrag/dual_retrieval.rs): high store = the 12-word abstract index,
    low store = full documents; both stores' BM25 top-k replayed, then the
    merge strategy. Interleave = slot order (2r, 2r+1) with dedup keeping
    a doc's earliest slot — provably identical to the alternating-iterator
    loop (rs:204-243). Weighted = (round4 weighted score DESC, high
    before low, source rank) — the reference's stable sort (rs:278-323)."""
    if strategy == "interleave":
        pos_cte = """
        pos AS (
          SELECT doc_id, score, 'high' AS level, 2 * (r - 1) AS pos
          FROM hirank
          UNION ALL
          SELECT doc_id, score, 'low', 2 * (r - 1) + 1 FROM lorank)"""
    elif strategy == "weighted":
        pos_cte = f"""
        pos AS (
          SELECT doc_id, score, level,
                 row_number() OVER (ORDER BY w DESC, pri, r) AS pos
          FROM (
            SELECT doc_id, score, 'high' AS level,
                   round(score * {high_weight}, 4) AS w, 0 AS pri, r
            FROM hirank
            UNION ALL
            SELECT doc_id, score, 'low',
                   round(score * {low_weight}, 4), 1, r
            FROM lorank))"""
    else:
        raise ValueError(strategy)
    return f"""
        WITH abst AS (
          SELECT doc_id,
                 array_to_string(list_slice(string_split(text, ' '), 1, 12),
                                 ' ') AS text
          FROM documents),
        {_bm25_block("abst", high_terms, k, "hi")},
        {_bm25_block("documents", low_terms, k, "lo")},
        {pos_cte},
        ded AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                             ORDER BY pos) AS dn
                FROM pos),
        seq AS (SELECT doc_id, level, score,
                       row_number() OVER (ORDER BY pos) AS merged_rank
                FROM ded WHERE dn = 1)
        SELECT merged_rank, doc_id, level, score
        FROM seq WHERE merged_rank <= {k}
    """


# ---------------------------------------------------------------------------
# kgxs: hierarchical-structure corpus (document_structure.rs twin)

_KGXS_N = 6


def kgxs_text(doc_id: int) -> str:
    """Deterministic markdown doc with 6 headings at md5-driven levels
    1-3 ('S{i} L{level}' titles, fixed 14-char body lines) — every length
    is arithmetic over the level sequence, so the SQL twin re-derives the
    parser's offsets, the stack-rule parents, depths and heading paths."""
    lines = []
    for i in range(_KGXS_N):
        lvl = 1 + int(hashlib.md5(f"kgxs:{doc_id}:{i}".encode())
                      .hexdigest()[:8], 16) % 3
        lines.append("#" * lvl + f" S{i} L{lvl}")
        lines.append("body text line")
    return "".join(line + "\n" for line in lines)


def kgx_structure_sql() -> str:
    """Oracle for build_structure over the kgxs corpus: heading offsets
    are cumulative (level_j + 22) sums, parent = max earlier index with a
    strictly smaller level (== the markdown.rs:35-58 stack rule), depth +
    root→leaf path via a recursive parent-chain walk, content spans run
    heading-end → next heading start (or document length)."""
    hx = ("1 + ('0x'||substr(md5('kgxs:'||doc_id||':'||i),1,8))::BIGINT % 3")
    return f"""
        WITH RECURSIVE hs AS (
          SELECT doc_id, i, ({hx})::INT AS level
          FROM documents, generate_series(0, {_KGXS_N - 1}) AS g(i)),
        agg AS (
          SELECT doc_id, i, level,
                 'S' || i || ' L' || level AS title,
                 coalesce(sum(level + 22) OVER (
                     PARTITION BY doc_id ORDER BY i
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0)::BIGINT AS start_off
          FROM hs),
        doclen AS (
          SELECT doc_id, (sum(level) + {_KGXS_N * 22})::BIGINT AS tlen
          FROM hs GROUP BY doc_id),
        par AS (
          SELECT a.doc_id, a.i, a.level, a.title, a.start_off,
                 (a.start_off + a.level + 6)::BIGINT AS end_off,
                 coalesce((SELECT max(b.i) FROM agg b
                           WHERE b.doc_id = a.doc_id AND b.i < a.i
                             AND b.level < a.level), -1)::INT AS parent
          FROM agg a),
        chain(doc_id, i, anc, depth, path) AS (
          SELECT doc_id, i, parent, 0, title FROM par
          UNION ALL
          SELECT c.doc_id, c.i, p.parent, c.depth + 1,
                 p.title || ' > ' || c.path
          FROM chain c JOIN par p ON p.doc_id = c.doc_id AND p.i = c.anc
          WHERE c.anc >= 0),
        fin AS (SELECT doc_id, i, depth, path FROM chain WHERE anc = -1)
        SELECT p.doc_id::VARCHAR AS doc_id, p.i AS section_idx, p.level,
               p.title, p.parent AS parent_idx, f.depth::INT AS depth,
               f.path,
               p.end_off AS content_start,
               coalesce(lead(p.start_off) OVER (
                   PARTITION BY p.doc_id ORDER BY p.i), d.tlen)
                   AS content_end
        FROM par p
        JOIN fin f ON f.doc_id = p.doc_id AND f.i = p.i
        JOIN doclen d ON d.doc_id = p.doc_id
    """


# ---------------------------------------------------------------------------
# kgxc: causal-chain corpus (retrieval/causal_analysis.rs twin)

_KGXC_NODES = tuple(f"EV{i}" for i in range(8))
_KGXC_RELS = ("caused", "led_to", "enabled", "related_to")
# temporal-typed rels carry the reference strength table values
# (stages/temporal.TEMPORAL_STRENGTH); led_to is keyword-causal with no
# strength (exercising the 0.7 default weight), related_to is non-causal
_KGXC_TYPED = {"caused": ("Caused", 0.9), "enabled": ("Enabled", 0.6)}


def _hc(doc_id: int, i: int) -> int:
    return int(hashlib.md5(f"kgxc:{doc_id}:{i}".encode()).hexdigest()[:8], 16)


def kgxc_edge_for_doc(doc_id: int) -> dict:
    """One md5-derived DAG edge per doc: src index < dst index (acyclic by
    construction), relation/confidence-grid/year all md5 draws."""
    p = _hc(doc_id, 0) % 56
    a = p % 8
    off = 1 + (p // 8) % 7
    b = (a + off) % 8
    lo, hi = (a, b) if a < b else (b, a)
    rel = _KGXC_RELS[_hc(doc_id, 1) % 4]
    c50 = _hc(doc_id, 2) % 50
    year = 1900 + _hc(doc_id, 3) % 100
    typed = _KGXC_TYPED.get(rel)
    return {
        "src": _KGXC_NODES[lo], "dst": _KGXC_NODES[hi],
        "rel_type": rel, "c50": c50, "confidence": 0.5 + c50 / 100.0,
        "t_start": year, "t_end": year,
        "temporal_type": typed[0] if typed else None,
        "causal_strength": typed[1] if typed else None,
    }


def kgx_causal_sql(cause: str = "EV0", effect: str = "EV7",
                   max_depth: int = 5) -> str:
    """Oracle for find_causal_chains over the kgxc corpus: per-(src,dst)
    dedup by (confidence-grid DESC, rel, year), then every <=max_depth-node
    DAG path cause→effect folded in a recursive CTE — causal-step count,
    weighted confidence product (conf·(0.5+0.5·strength) for typed rels,
    conf·0.7 for keyword-causal), latched temporal monotonicity over
    causal-step years, and first→last causal time span."""
    weight = """CASE e.rel
        WHEN 'caused' THEN 0.95 WHEN 'enabled' THEN 0.8
        WHEN 'led_to' THEN 0.7 END"""
    causal = "e.rel IN ('caused', 'led_to', 'enabled')"
    return f"""
        WITH RECURSIVE raw AS (
          SELECT
            ('0x'||substr(md5('kgxc:'||doc_id||':0'),1,8))::BIGINT % 56 AS p,
            ('0x'||substr(md5('kgxc:'||doc_id||':1'),1,8))::BIGINT % 4 AS r,
            ('0x'||substr(md5('kgxc:'||doc_id||':2'),1,8))::BIGINT % 50
                AS c50,
            1900 + ('0x'||substr(md5('kgxc:'||doc_id||':3'),1,8))::BIGINT
                % 100 AS year
          FROM documents),
        raw2 AS (
          SELECT least(p % 8, (p % 8 + 1 + (p // 8) % 7) % 8) AS lo,
                 greatest(p % 8, (p % 8 + 1 + (p // 8) % 7) % 8) AS hi,
                 list_extract(['caused','led_to','enabled','related_to'],
                              r + 1) AS rel,
                 c50, year
          FROM raw),
        dedup AS (
          SELECT 'EV' || lo AS src, 'EV' || hi AS dst, rel,
                 0.5 + c50 / 100.0 AS conf, year
          FROM (SELECT *, row_number() OVER (
                    PARTITION BY lo, hi
                    ORDER BY c50 DESC, rel, year) AS rn
                FROM raw2)
          WHERE rn = 1),
        walk(node, path, nnodes, nsteps, prod, prev_ts, ok, t0, t1) AS (
          SELECT '{cause}', '{cause}', 1, 0, 1.0::DOUBLE,
                 NULL::BIGINT, true, NULL::BIGINT, NULL::BIGINT
          UNION ALL
          SELECT e.dst, w.path || ' -> ' || e.dst, w.nnodes + 1,
                 w.nsteps + CASE WHEN {causal} THEN 1 ELSE 0 END,
                 w.prod * CASE WHEN {causal} THEN e.conf * ({weight})
                               ELSE 1.0 END,
                 CASE WHEN {causal} THEN e.year ELSE w.prev_ts END,
                 w.ok AND (NOT ({causal}) OR w.prev_ts IS NULL
                           OR e.year >= w.prev_ts),
                 coalesce(w.t0, CASE WHEN {causal} THEN e.year END),
                 CASE WHEN {causal} THEN e.year ELSE w.t1 END
          FROM walk w
          JOIN dedup e ON e.src = w.node
          WHERE w.node <> '{effect}' AND w.nnodes < {max_depth}
            AND e.conf >= 0.5)
        SELECT path, nsteps::BIGINT AS n_steps,
               round(prod, 4) AS total_confidence,
               ok AS temporal_consistency,
               (t1 - t0)::BIGINT AS time_span
        FROM walk
        WHERE node = '{effect}' AND nsteps >= 1
    """


METADATA_SEARCH_QUERY = "what did louis ingram say about london chapter 2"


def kgx_metadata_search_sql(query: str = METADATA_SEARCH_QUERY) -> str:
    """Oracle for enriched metadata-aware retrieval
    (retrieval/enriched.rs:64-143) over the kgx enriched chunks: keyword-
    fraction boost (0.3), summary half-match boost (0.15), the >0.05
    significance gate and the min(base 0.5 + boost, 1) cap replayed in
    SQL over the kgx_enriched replay. Structure refs parse from the query
    but kgx chapters are NULL, and completeness is 2/9 < 0.7 — both
    no-ops on BOTH sides by construction."""
    qwords = sorted({w for w in query.lower().split() if len(w) > 3})
    qvals = ", ".join(f"('{w}')" for w in qwords)
    return f"""
        WITH enr AS (SELECT * FROM ({kgx_enriched_sql()})),
        qw(w) AS (VALUES {qvals}),
        nqw AS (SELECT count(*)::BIGINT AS n FROM qw),
        km AS (
          SELECT chunk_id, count(*)::BIGINT AS m
          FROM (SELECT chunk_id,
                       unnest(string_split(keywords, '|')) AS kw
                FROM enr) z
          JOIN qw ON lower(z.kw) = qw.w
          GROUP BY chunk_id),
        sm AS (
          SELECT e.chunk_id,
                 (SELECT count(*) FROM qw
                  WHERE strpos(lower(e.summary), qw.w) > 0) AS hits
          FROM enr e),
        sc AS (
          SELECT e.chunk_id,
                 coalesce(CASE WHEN km.m >= 1
                          THEN (km.m::DOUBLE / greatest(nqw.n, 1)) * 0.3
                          END, 0.0)
                 + CASE WHEN sm.hits >= greatest(nqw.n // 2, 1)
                        THEN 0.15 ELSE 0.0 END AS boost
          FROM enr e
          LEFT JOIN km ON km.chunk_id = e.chunk_id
          JOIN sm ON sm.chunk_id = e.chunk_id
          CROSS JOIN nqw)
        SELECT chunk_id, round(least(0.5 + boost, 1.0), 4) AS score
        FROM sc WHERE boost > 0.05
    """
