"""kgxf: the FUZZY-canonicalization oracle corpus (round-3 evidence hole).

The kgx pools are deliberately collision-free, so every kgx oracle reduces
canonicalization to exact (type, name) grouping — the greedy fuzzy
clustering (reference corpus/entity_linker.rs:213-273, similarity family
entity/string_similarity_linker.rs:126-165) that defines the north rule's
"fuzzy entity disambiguation" was only pytest-covered. This module closes
that: the person pool carries engineered NEAR-MISS VARIANT GROUPS
("Alice Harmon"/"Alice Harman"/"Alice Harmen") chosen so the fuzzy merge
outcome is hand-derivable and therefore SQL-expressible:

1. every variant group is a CLIQUE under ``name_similarity`` at the 0.85
   threshold (each pair >= 0.85), so the greedy seed-absorb clustering
   merges the whole group into ONE cluster regardless of seed order;
2. each group's first token has a distinct Soundex class, so each group is
   ALONE in its fuzzy block (type, soundex(first token)) — no cross-group
   comparison ever happens, and the cluster partition is exactly the
   hand-written variants table below;
3. within-cluster aggregates then follow the reference rules the SQL can
   replay: canonical name = most-frequent raw name (ties → longest →
   lexicographically largest, entity_linker.rs:524-536), doc_frequency =
   distinct docs over the group, mention_count = sum, confidence = max,
   alias map = every appeared variant id → canonical; edges are rewritten
   through the variant→canonical map, DROPPING pairs that collapse to
   self-loops (two variants of one person co-occurring, core/mod.rs
   self-loop rule) and merging n_occurrences across variant spellings.

Properties 1-2 are asserted against the real similarity/blocking functions
in tests/test_kgx_fuzzy.py, so pool edits cannot silently break the
hand-derivation. The Ray side runs the REAL distributed pipeline (salted
groupby canonicalization with the fuzzy linking strategy engaged — the
default config); the DuckDB side never calls any pipeline code.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from .kgx import (
    KGX_LOCS,
    KGX_ORGS,
    KGX_TEMPLATES,
    KGX_TITLES,
    _corpus_cte,
    _sql_str,
)
from .schemas import DOCUMENTS

# (raw name, variant-group id). Groups are cliques at sim >= 0.85 with
# pairwise-distinct first-token Soundex classes across groups (verified by
# tests/test_kgx_fuzzy.py against functions/textfns.py + linking.block_key).
# Additional constraint: no pool name is a substring of another — mention
# counting is text.count(name), so a superstring variant co-occurring with
# its substring variant would inflate n_mentions in a way the per-slot SQL
# constants can't see (the substring check is also pytest-asserted).
KGXF_PERSON_GROUPS: tuple[tuple[str, str], ...] = (
    ("Alice Harmon", "g_alice"),
    ("Alice Harman", "g_alice"),
    ("Alice Harmen", "g_alice"),
    ("Bob Tanner", "g_bob"),
    ("Bob Tannur", "g_bob"),
    ("Carol Mendez", "g_carol"),
    ("Carol Mendes", "g_carol"),
    ("David Okafor", "g_david"),
    ("David Okafur", "g_david"),
    ("Elena Vasquez", "g_elena"),
    ("Elena Vazquez", "g_elena"),
    ("Grace Whitfield", "g_grace"),
    ("Grace Whitfeld", "g_grace"),
    ("Henry Donovan", "g_henry"),
    ("Henry Donavan", "g_henry"),
    ("Peter Morrison", "g_peter"),
    ("Peter Morrisson", "g_peter"),
    ("Peter Morison", "g_peter"),
    ("Quinn Norwood", "g_quinn"),      # singleton: no variants
    ("Sarah Pemberton", "g_sarah"),    # singleton: no variants
)

KGXF_PERSONS: tuple[str, ...] = tuple(n for n, _g in KGXF_PERSON_GROUPS)


def _h(doc_id: int, i: int) -> int:
    """kgxf-salted md5 arithmetic (decorrelated from the kgx corpus)."""
    return int(hashlib.md5(f"kgxf:{doc_id}:{i}".encode()).hexdigest()[:8], 16)


def kgxf_choices(doc_id: int) -> dict:
    tid = _h(doc_id, 0) % len(KGX_TEMPLATES)
    p = _h(doc_id, 1) % len(KGXF_PERSONS)
    p2 = _h(doc_id, 2) % len(KGXF_PERSONS)
    if p2 == p:
        p2 = (p2 + 1) % len(KGXF_PERSONS)
    return dict(
        tid=tid,
        p=p,
        p2=p2,
        o=_h(doc_id, 3) % len(KGX_ORGS),
        l=_h(doc_id, 4) % len(KGX_LOCS),
        t=_h(doc_id, 5) % len(KGX_TITLES),
    )


def kgxf_sentence(doc_id: int) -> str:
    c = kgxf_choices(doc_id)
    tpl = KGX_TEMPLATES[c["tid"]]
    return tpl["text"].format(
        p=KGXF_PERSONS[c["p"]],
        p2=KGXF_PERSONS[c["p2"]],
        o=KGX_ORGS[c["o"]][0],
        l=KGX_LOCS[c["l"]][0],
        t=KGX_TITLES[c["t"]],
    )


def kgxf_spans_batch(batch: pa.Table) -> pa.Table:
    """doc_id column → single-text-span documents (inside map_batches)."""
    doc_ids = batch.column("doc_id").to_pylist()
    out_ids, out_spans = [], []
    for doc_id in doc_ids:
        text = kgxf_sentence(int(doc_id))
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
# DuckDB oracle SQL


def _fuzzy_cte() -> str:
    """kgx template scaffold over the kgxf pool + the fuzzy-merge layer.

    Defines (beyond the base CTEs): ``gm`` (exact entity id → variant
    group), ``canonf`` (per-group canonical cluster), ``aliasf`` (appeared
    variant → canonical), ``edge_agg_f`` (edges after the variant→canonical
    rewrite with self-loop drop)."""
    varmap = ",".join(f"({_sql_str(n)},{_sql_str(g)})"
                      for n, g in KGXF_PERSON_GROUPS)
    return f"""
    {_corpus_cte(person_pool=KGXF_PERSONS, prefix="kgxf")},
    varmap(vname, grp) AS (VALUES {varmap}),
    grp_rows AS (
      SELECT e.*,
             e.entity_type || '_' || lower(replace(e.name, ' ', '')) AS eid,
             coalesce(v.grp,
                      e.entity_type || '~' || e.name) AS grp
      FROM ents_raw e
      LEFT JOIN varmap v
        ON v.vname = e.name AND e.entity_type = 'PERSON'),
    gm AS (SELECT DISTINCT eid, entity_type, grp FROM grp_rows),
    name_cnt AS (
      SELECT grp, entity_type, name, count(*)::BIGINT AS cnt
      FROM grp_rows GROUP BY 1, 2, 3),
    canon_pick AS (
      SELECT grp, entity_type, name AS canonical_name FROM (
        SELECT grp, entity_type, name,
               row_number() OVER (
                   PARTITION BY grp, entity_type
                   ORDER BY cnt DESC, length(name) DESC, name DESC) AS rn
        FROM name_cnt) z WHERE rn = 1),
    canonf AS (
      SELECT g.grp, g.entity_type, cp.canonical_name,
             g.entity_type || '_'
                 || lower(replace(cp.canonical_name, ' ', '')) AS canonical_id,
             count(DISTINCT g.doc_id)::BIGINT AS doc_frequency,
             sum(g.n_mentions)::BIGINT AS mention_count,
             round(max(g.confidence), 4) AS confidence
      FROM grp_rows g JOIN canon_pick cp USING (grp, entity_type)
      GROUP BY 1, 2, 3, 4),
    aliasf AS (
      SELECT DISTINCT g.eid AS entity_id, c.canonical_id, c.canonical_name,
             g.entity_type
      FROM gm g JOIN canonf c USING (grp, entity_type)),
    pairs_c AS (
      SELECT ca.canonical_id AS src, cb.canonical_id AS dst,
             ca.canonical_name AS src_name, cb.canonical_name AS dst_name,
             t.rel_type
      FROM typed_pairs t
      JOIN gm ga ON ga.eid = t.src
      JOIN canonf ca ON ca.grp = ga.grp AND ca.entity_type = ga.entity_type
      JOIN gm gb ON gb.eid = t.dst
      JOIN canonf cb ON cb.grp = gb.grp AND cb.entity_type = gb.entity_type
      WHERE ca.canonical_id <> cb.canonical_id),
    edge_agg_f AS (
      SELECT src, dst, rel_type, src_name, dst_name,
             count(*)::BIGINT AS n_occurrences
      FROM pairs_c GROUP BY 1, 2, 3, 4, 5)
    """


def kgx_fuzzy_entities_sql() -> str:
    return f"""
        WITH {_fuzzy_cte()}
        SELECT canonical_id, canonical_name, entity_type, doc_frequency,
               mention_count, confidence
        FROM canonf
    """


def kgx_fuzzy_alias_map_sql() -> str:
    return f"""
        WITH {_fuzzy_cte()}
        SELECT entity_id, canonical_id, canonical_name, entity_type
        FROM aliasf
    """


def kgx_fuzzy_edges_sql() -> str:
    return f"""
        WITH {_fuzzy_cte()}
        SELECT src, dst, rel_type, n_occurrences
        FROM edge_agg_f
    """


def kgx_fuzzy_triples_sql() -> str:
    return f"""
        WITH {_fuzzy_cte()}
        SELECT src_name AS subj, rel_type AS pred, dst_name AS obj,
               n_occurrences
        FROM edge_agg_f
    """
