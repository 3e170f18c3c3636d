"""Pins for the syn_* KG oracle family (graphrag_ray/syn_oracle_kg.py).

The DuckDB oracle hand-replays extraction + fuzzy canonicalization over
the synth corpus. These tests assert the structural assumptions the SQL
derivation relies on, and the end-to-end equality SQL == pipeline pure
functions on a corpus prefix (the driver gate re-checks at full sf0.01).
"""

from __future__ import annotations

from collections import defaultdict

import duckdb
import pytest

from graphrag_ray import syn_oracle_kg as so
from graphrag_ray.functions.chunking import chunk_text
from graphrag_ray.functions.extraction import (
    PERSON_TITLES,
    extract_entities,
    extract_relationships,
)
from graphrag_ray.functions.linking import canonicalize, exact_clusters_from_rows
from graphrag_ray.functions.textfns import clean_word
from graphrag_ray.synth import doc_text_from_spans, synth_spans_for_doc

N_FULL = 500     # driver sf0.01 / sf0.001 corpus size
N_SQL = 120      # SQL equality subset (runtime-bounded; driver gate = full)


def _doc_text(d: int) -> str:
    return doc_text_from_spans(synth_spans_for_doc(d, "", 1))


def test_single_chunk_per_doc_at_2048():
    """SYN_CFG (chunk_size=2048, overlap=0) must yield one chunk per doc —
    the oracle replays whole-doc text, not the chunker."""
    for d in range(N_FULL):
        assert len(chunk_text(_doc_text(d), 2048, 0)) == 1


def test_title_positions_never_overlap():
    """Phase-2 marks are derived non-recursively in SQL; valid only when no
    two title tokens sit within 3 positions of each other (the real loop
    would otherwise skip the later title via its `processed` set)."""
    for d in range(N_FULL):
        words = _doc_text(d).split()
        t_pos = [i for i, w in enumerate(words)
                 if clean_word(w).lower() in PERSON_TITLES]
        assert all(b - a > 3 for a, b in zip(t_pos, t_pos[1:]))


def _expected_tables(n_docs: int) -> dict:
    """Expected syn_* outputs from the pipeline's pure functions."""
    rows, doc_entities = [], []
    raw_edges: dict = defaultdict(int)
    for d in range(n_docs):
        doc = f"doc_{d:08d}"
        text = _doc_text(d)
        ents = extract_entities(text, 0.7,
                                ("PERSON", "ORGANIZATION", "LOCATION"),
                                with_offsets=False)
        for e in ents:
            rows.append((doc, e.name, e.entity_type, e.confidence,
                         e.n_mentions))
            doc_entities.append((doc, e.name, e.entity_type,
                                 round(e.confidence, 4), e.n_mentions))
        for s, t, r in extract_relationships(ents, text):
            raw_edges[(s, t, r)] += 1
    canon = canonicalize(exact_clusters_from_rows(rows))
    entities = [(c.canonical_id, c.canonical_name, c.entity_type,
                 c.doc_frequency, c.mention_count, round(c.confidence, 4))
                for c in canon]
    alias, amap = [], {}
    for c in canon:
        for mid in c.member_entity_ids:
            alias.append((mid, c.canonical_id, c.canonical_name,
                          c.entity_type))
            amap[mid] = (c.canonical_id, c.canonical_name)
    final: dict = defaultdict(int)
    for (s, t, r), n in raw_edges.items():
        cs, ct = amap.get(s), amap.get(t)
        if cs is None or ct is None or cs[0] == ct[0]:
            continue
        final[(cs[0], ct[0], r, cs[1], ct[1])] += n
    return dict(
        doc_entities=doc_entities,
        entities=entities,
        alias_map=alias,
        edges=[(s, t, r, n) for (s, t, r, _sn, _tn), n in final.items()],
        triples=[(sn, r, tn, n) for (_s, _t, r, sn, tn), n in final.items()],
    )


@pytest.fixture(scope="module")
def syn_con():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT unnest(range(0, {N_SQL})) AS doc_id"
    )
    return con


@pytest.fixture(scope="module")
def expected():
    return _expected_tables(N_SQL)


@pytest.mark.parametrize("surface,sqlfn", [
    ("doc_entities", so.syn_doc_entities_sql),
    ("entities", so.syn_entities_sql),
    ("alias_map", so.syn_alias_map_sql),
    ("edges", so.syn_edges_sql),
    ("triples", so.syn_triples_sql),
])
def test_sql_equals_pipeline(syn_con, expected, surface, sqlfn):
    """The DuckDB replay (word-stream extraction, recursive-CTE Jaro,
    greedy-cluster recursion) reproduces the pipeline's pure functions
    exactly — including fuzzy merges of md5-derived typo variants and
    the cross-sentence junk-pair interactions."""
    got = sorted(map(tuple, syn_con.execute(sqlfn()).fetchall()))
    want = sorted(map(tuple, expected[surface]))
    assert got == want


def test_fuzzy_path_actually_exercised(expected):
    """The corpus must contain multi-member fuzzy merges (Zipf variants) —
    otherwise the oracle degenerates to exact grouping and proves nothing
    about the greedy clustering."""
    ids = [a[1] for a in expected["alias_map"]]
    sizes = defaultdict(int)
    for cid in ids:
        sizes[cid] += 1
    multi = [cid for cid, n in sizes.items() if n > 1]
    assert len(multi) >= 10  # 64 multi-member clusters at sf0.01


def test_mentions_sql_equals_pipeline(syn_con, expected):
    """syn_mentions_sql: the recursive non-overlapping occurrence scan ×
    per-event repetition equals extract_entities' merged mention lists."""
    want = []
    for d in range(N_SQL):
        doc = f"doc_{d:08d}"
        text = _doc_text(d)
        for e in extract_entities(text, 0.7,
                                  ("PERSON", "ORGANIZATION", "LOCATION"),
                                  with_offsets=True):
            for s, t in e.mentions:
                want.append((e.entity_id, f"{doc}_0", s, t,
                             round(e.confidence, 4)))
    got = sorted(map(tuple, syn_con.execute(so.syn_mentions_sql()).fetchall()))
    assert got == sorted(want)


def test_walk_cap_exceeds_diameter(expected):
    """syn_centrality_sql caps its BFS closure at _WALK_CAP levels; the cap
    is only sound if every eccentricity of the canonical graph is strictly
    below it. Asserted here with an independent Python BFS (full corpus
    edge set at the SQL subset size; the dense Zipf head keeps the diameter
    at 2 for every sf we ship)."""
    from collections import deque

    adj: dict[str, set[str]] = defaultdict(set)
    for s, t, _r, _n in expected["edges"]:
        adj[s].add(t)
        adj[t].add(s)
    for src in adj:
        dist = {src: 0}
        q = deque([src])
        while q:
            u = q.popleft()
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        assert max(dist.values()) < so._WALK_CAP
