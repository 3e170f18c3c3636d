"""Pins for the flagship (kg_*) oracle family — the CHUNKED corpus replay
(graphrag_ray/syn_oracle_kg._kg_full_cte over synth_oracle.chunk_units_cte).

The SQL derivation relies on three structural facts asserted here:
 1. driver base text is ALL-LOWERCASE (capitalization-gated extraction
    events arise only inside the md5-replayable pool sentences);
 2. the chunk units the recursive chunker replay emits are byte-identical
    to chunk_doc's (idx, content) stream over the same text;
 3. the kg graph's eccentricities stay strictly below the shared BFS walk
    cap used by kg_centrality_sql.
"""

from __future__ import annotations

import re
from collections import defaultdict, deque

import duckdb
import pytest

from graphrag_ray import syn_oracle_kg as so
from graphrag_ray.functions.chunking import chunk_doc
from graphrag_ray.synth import doc_text_from_spans, synth_spans_for_doc
from graphrag_ray.synth_oracle import chunk_units_cte

SF_DIR = "/root/testdata/sf0.001"
N_SQL = 120  # SQL subset (runtime-bounded; the driver gate runs full sf)


@pytest.fixture(scope="module")
def docs_con():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT doc_id, text FROM "
        f"read_parquet('{SF_DIR}/documents.parquet') WHERE doc_id < {N_SQL}"
    )
    return con


def test_base_text_is_lowercase():
    """No capitals/digits in the driver base text — the precondition for
    the extraction replay to be exact on the chunked corpus (every
    capitalization-gated event comes from a replayed pool sentence)."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"])
    for x in t.column("text").to_pylist():
        assert not (x and re.search(r"[A-Z0-9]", x))


def test_chunk_units_match_chunk_doc(docs_con):
    """chunk_units_cte's (chunk_id, parent, text) rows == the fused
    ChunkExtract stage's chunk stream (chunk_doc legacy 512/100 over
    base+sentence text) for a corpus prefix."""
    import pyarrow.parquet as pq

    base = {
        r["doc_id"]: r["text"]
        for r in pq.read_table(f"{SF_DIR}/documents.parquet")
        .to_pylist() if r["doc_id"] < N_SQL
    }
    want = []
    for d, btxt in base.items():
        doc = f"doc_{d:08d}"
        text = doc_text_from_spans(synth_spans_for_doc(d, btxt, 1))
        for idx, _s, _e, content in chunk_doc(text, "legacy", 512, 100, 50):
            want.append((f"{doc}_{idx}", doc, content))
    got = docs_con.execute(
        "WITH RECURSIVE " + chunk_units_cte()
        + " SELECT doc_id, parent, text FROM texts"
    ).fetchall()
    assert sorted(got) == sorted(want)


def test_fact_regex_re2_form_equals_python(docs_con):
    """kg_atomic_facts_sql's RE2 pattern (consumed delimiter instead of
    Python's lookahead) yields the exact per-chunk fact multiset of
    stages/atomic_facts.extract_facts, and the corpus carries no temporal
    markers (the replay emits NULLs)."""
    import pyarrow.parquet as pq

    from graphrag_ray.stages.atomic_facts import extract_facts
    from graphrag_ray.synth_oracle import kg_atomic_facts_sql

    got = sorted(map(tuple, docs_con.execute(
        kg_atomic_facts_sql()).fetchall()))
    base = {
        r["doc_id"]: r["text"]
        for r in pq.read_table(f"{SF_DIR}/documents.parquet").to_pylist()
        if r["doc_id"] < N_SQL
    }
    want = []
    for d, btxt in base.items():
        doc = f"doc_{d:08d}"
        text = doc_text_from_spans(synth_spans_for_doc(d, btxt, 1))
        for idx, _s, _e, content in chunk_doc(text, "legacy", 512, 100, 50):
            for f in extract_facts(content):
                assert f["temporal_marker"] is None
                want.append((f"{doc}_{idx}", f["subj"],
                             f["pred"].upper().replace(" ", "_"), f["obj"],
                             None, None, 0.8))
    assert got == sorted(want)


def test_no_chapter_headings_in_corpus():
    """kg_enriched_sql emits chapter = NULL; sound only if detect_chapter
    never fires on any chunk of the full corpus (no markdown heading or
    'Chapter N' line exists in base text or pool sentences)."""
    import pyarrow.parquet as pq

    from graphrag_ray.stages.enrich import detect_chapter

    base = pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text"]).to_pylist()
    for r in base:
        text = doc_text_from_spans(synth_spans_for_doc(r["doc_id"],
                                                       r["text"], 1))
        for _i, _s, _e, content in chunk_doc(text, "legacy", 512, 100, 50):
            assert detect_chapter(content) is None


def test_kg_walk_cap_exceeds_diameter(docs_con):
    """kg_centrality_sql shares syn's BFS cap; sound only if every
    eccentricity of the kg graph is strictly below it (independent Python
    BFS over the replayed edge set)."""
    edges = docs_con.execute(
        so._kg_full_cte() + " SELECT src, dst FROM edge_agg"
    ).fetchall()
    adj: dict[str, set[str]] = defaultdict(set)
    for s, t in edges:
        adj[s].add(t)
        adj[t].add(s)
    assert adj, "replayed kg graph unexpectedly empty"
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
