"""kgx oracle-corpus validity: pool safety + hand-written expectations.

The kgx corpus (graphrag_ray/kgx.py) exists to give the KG pipeline an
independent DuckDB oracle. Its validity rests on two claims, tested here:

1. POOL SAFETY — the name pools can never trigger extraction/linking
   behavior outside the hand-derived expectation table (no fuzzy-block
   collisions, no keyword/suffix/location substrings hiding in names).
2. EXPECTATIONS — the hand-written per-template expectations
   (KGX_TEMPLATES) match what the real extractor produces on every
   generated sentence. This direction is legitimate: the expectations were
   derived by hand from the reference semantics (entity/mod.rs), and the
   DuckDB oracle is generated from the same constants — so the driver's
   SQL-vs-pipeline comparison is NOT circular with extraction code.
"""

from __future__ import annotations

import itertools

from graphrag_ray import kgx
from graphrag_ray.functions.extraction import (
    _CONTEXT_KEYWORDS,
    EVENT_WORDS,
    KNOWN_LOCATIONS,
    NON_PERSON_WORDS,
    OBJECT_WORDS,
    ORG_PREFIXES,
    ORG_SUFFIXES,
    PERSON_TITLES,
    _is_likely_person_word,
    extract_entities,
    extract_relationships,
)
from graphrag_ray.functions.textfns import (
    name_similarity,
    normalize_string,
    soundex,
)


def _all_entity_names():
    names = {("PERSON", p) for p in kgx.KGX_PERSONS}
    for name, sfx in kgx.KGX_ORGS:
        names.add(("PERSON", name))
        if sfx:
            names.add(("ORGANIZATION", sfx))
    for name, two in kgx.KGX_LOCS:
        names.add(("LOCATION", name))
        if two:
            names.add(("PERSON", name))
    return sorted(names)


def test_pool_no_fuzzy_collisions():
    """No same-block pair reaches the 0.85 fuzzy threshold → canonical
    clusters are exactly the (type, name) groups the SQL oracle assumes."""
    ents = _all_entity_names()
    for (ta, na), (tb, nb) in itertools.combinations(ents, 2):
        if ta != tb:
            continue
        norm_a, norm_b = normalize_string(na), normalize_string(nb)
        if soundex(norm_a.split()[0]) != soundex(norm_b.split()[0]):
            continue
        sim = name_similarity(norm_a, norm_b, max_edit_distance=2)
        assert sim < 0.85, (na, nb, sim)


def test_pool_no_hidden_substrings():
    """Names must not contain context keywords, org suffixes/prefixes,
    known locations, event/object words, or titles — otherwise a slot value
    could add entities/relations outside the expectation table."""
    all_strings = (
        list(kgx.KGX_PERSONS)
        + [n for n, _ in kgx.KGX_ORGS]
        + [n for n, _ in kgx.KGX_LOCS]
    )
    org_names = {n for n, _ in kgx.KGX_ORGS}
    loc_names = {n for n, _ in kgx.KGX_LOCS}
    for s in all_strings:
        for kw in _CONTEXT_KEYWORDS:
            assert kw not in s and kw not in s.lower(), (s, kw)
        for w in list(EVENT_WORDS) + list(OBJECT_WORDS):
            assert w not in s.lower(), (s, w)
        for p in ORG_PREFIXES:
            assert p not in s, (s, p)
        for suffix in ORG_SUFFIXES:
            if s in org_names:
                continue  # orgs intentionally carry exactly one suffix
            assert suffix not in s, (s, suffix)
        for loc in KNOWN_LOCATIONS:
            if s in loc_names:
                continue
            assert loc not in s, (s, loc)
        for part in s.split():
            assert part.lower() not in PERSON_TITLES, (s, part)
    # person parts must pass the person-word gates (else phase 3 would skip)
    for p in kgx.KGX_PERSONS:
        parts = p.split()
        assert len(parts) == 2, p
        for part in parts:
            assert _is_likely_person_word(part), (p, part)
            assert part.lower() not in NON_PERSON_WORDS, (p, part)


def _expected_for_doc(doc_id: int):
    """Pure-Python rendering of the hand-written expectation table (the
    same constants the SQL oracle embeds)."""
    c = kgx.kgx_choices(doc_id)
    t = kgx.KGX_TEMPLATES[c["tid"]]
    p, p2 = kgx.KGX_PERSONS[c["p"]], kgx.KGX_PERSONS[c["p2"]]
    o, osfx = kgx.KGX_ORGS[c["o"]]
    loc, ltwo = kgx.KGX_LOCS[c["l"]]
    p_m = t.get("p_mentions", 1)
    ents = []  # (name, type, confidence, ord, n_mentions)
    if t["pos_p"] is not None:
        ents.append((p, "PERSON", 0.9 if t["titled"] else 0.8,
                     t["pos_p"], p_m))
    if t["pos_p2"] is not None:
        ents.append((p2, "PERSON", 0.8, t["pos_p2"], 1))
    if t["pos_o"] is not None:
        ents.append((o, "PERSON", 0.8, t["pos_o"], 1))
    if t["pos_l"] is not None and ltwo:
        ents.append((loc, "PERSON", 0.8, t["pos_l"], 1))
    if t["pos_o"] is not None and osfx:
        ents.append((osfx, "ORGANIZATION", 0.9, 10, 1))
    if t["pos_l"] is not None:
        ents.append((loc, "LOCATION", 0.9, 20, 1))
    ents.sort(key=lambda e: e[3])
    rels = []
    for i in range(len(ents)):
        for j in range(i + 1, len(ents)):
            a, b = ents[i], ents[j]
            ta, tb = a[1], b[1]
            if ta == tb == "PERSON":
                r = t["pp"]
            elif {ta, tb} == {"PERSON", "ORGANIZATION"}:
                r = t["po"]
            elif {ta, tb} == {"PERSON", "LOCATION"}:
                r = t["pl"]
            elif {ta, tb} == {"ORGANIZATION", "LOCATION"}:
                r = t["ol"]
            else:  # pragma: no cover
                r = "RELATED_TO"
            ida = f"{ta}_" + a[0].lower().replace(" ", "")
            idb = f"{tb}_" + b[0].lower().replace(" ", "")
            rels.append((ida, idb, r))
    return ents, rels


def test_expectations_match_extractor_exhaustively():
    """Every generated sentence for doc_ids 0..4999 extracts EXACTLY the
    hand-derived entity set (name, type, confidence, 1 mention) and ordered
    relationship set."""
    for doc_id in range(5000):
        text = kgx.kgx_sentence(doc_id)
        got = extract_entities(
            text, 0.7, ("PERSON", "ORGANIZATION", "LOCATION"),
            with_offsets=False,
        )
        got_ents = [(e.name, e.entity_type, round(e.confidence, 4),
                     e.n_mentions) for e in got]
        exp_ents, exp_rels = _expected_for_doc(doc_id)
        assert got_ents == [(n, t, round(cf, 4), nm)
                            for (n, t, cf, _o, nm) in exp_ents], (doc_id, text)
        assert extract_relationships(got, text) == exp_rels, (doc_id, text)


def test_md5_choice_derivation_is_duckdb_compatible():
    """The Python choice hash equals DuckDB's hex-cast of the same md5."""
    import duckdb

    con = duckdb.connect()
    for doc_id in (0, 1, 7, 12345):
        for i in range(6):
            sql_val = con.execute(
                f"select ('0x'||substr(md5('kgx:{doc_id}:{i}'),1,8))::BIGINT"
            ).fetchone()[0]
            assert sql_val == kgx._h(doc_id, i)


def test_kgx_surface_matches_oracle_sql(ray_session):
    """End-to-end mini-driver: the distributed kgx surfaces equal the DuckDB
    oracle at sf0.001 (value-level, sorted)."""
    import duckdb
    import pandas as pd

    from graphrag_ray import queries as q

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    pairs = [
        (q.kgx_doc_entities, kgx.kgx_doc_entities_sql()),
        (q.kgx_entities, kgx.kgx_entities_sql()),
        (q.kgx_edges, kgx.kgx_edges_sql()),
        (q.kgx_triples, kgx.kgx_triples_sql()),
        (q.kgx_chunks, kgx.kgx_chunks_sql()),
        (q.kgx_mentions, kgx.kgx_mentions_sql()),
        (q.kgx_stats, kgx.kgx_stats_sql()),
        (q.kgx_cooccur, kgx.kgx_cooccur_sql()),
        (q.kgx_common_entities, kgx.kgx_common_entities_sql()),
        (q.kgx_components, kgx.kgx_components_sql()),
        (q.kgx_louvain, kgx.kgx_louvain_sql()),
        (q.kgx_graph_metrics, kgx.kgx_graph_metrics_sql()),
        (q.kgx_pagerank, kgx.kgx_pagerank_sql()),
        (q.kgx_atomic_facts, kgx.kgx_atomic_facts_sql()),
        (q.kgx_validated_facts, kgx.kgx_validated_facts_sql()),
        (q.kgx_gleaning, kgx.kgx_gleaning_sql()),
        (q.kgx_centrality, kgx.kgx_centrality_sql()),
        (q.kgx_enriched, kgx.kgx_enriched_sql()),
        (q.kgx_yake, kgx.kgx_yake_sql()),
        (q.kgx_incremental, kgx.kgx_triples_sql()),
        (q.kgx_graphml_import, kgx.kgx_graphml_import_sql()),
        (q.kgx_layout, kgx.kgx_layout_sql()),
        (q.kgx_community_summaries, kgx.kgx_community_summaries_sql()),
        (q.kgx_ppr, kgx.kgx_ppr_sql()),
        (q.bm25_topk, kgx.bm25_topk_sql()),
        (q.kgx_media_meta, kgx.kgx_media_meta_sql()),
        (q.kgx_media_frames, kgx.kgx_media_frames_sql()),
    ]
    for fn, sql in pairs:
        res = fn(sf)
        got = canon(res if isinstance(res, pd.DataFrame) else res.to_pandas())
        exp = canon(con.execute(sql).fetchdf())
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_repeated_person_mention_offsets():
    """The repeated-person template fires phase 3 on BOTH occurrences and
    each firing records both offsets → the merged mention list is
    [o1, o2, o1, o2] (entity/mod.rs:613-625 + :788-809 merge)."""
    reps = [d for d in range(200) if kgx.kgx_choices(d)["tid"] == 10]
    assert reps, "no repeated-person docs in range"
    for d in reps[:3]:
        text = kgx.kgx_sentence(d)
        name = kgx.KGX_PERSONS[kgx.kgx_choices(d)["p"]]
        ents = {e.name: e for e in extract_entities(text, 0.7)}
        o1 = text.find(name)
        o2 = text.find(name, o1 + len(name))
        assert ents[name].mentions == [
            (o1, o1 + len(name)), (o2, o2 + len(name)),
            (o1, o1 + len(name)), (o2, o2 + len(name)),
        ]


def test_template_rel_types_distinct_for_twoword_locs():
    """The kgx_gleaning oracle relies on the name-keyed relationship dedup
    never collapsing two pairs: when a two-word location is extracted as
    both PERSON and LOCATION, the (x, loc) pair exists once per instance
    with types (pp vs pl) for person x and (po vs ol) for the org — these
    must DIFFER template-wide or the first-wins dedup would silently drop
    a row. Guards future template edits."""
    for t in kgx.KGX_TEMPLATES:
        if t["pos_l"] is not None:
            if t["pos_p"] is not None or t["pos_p2"] is not None:
                assert t["pp"] != t["pl"], t["text"]
            if t["pos_o"] is not None:
                assert t["po"] != t["ol"], t["text"]
