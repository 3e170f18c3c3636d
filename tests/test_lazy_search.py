"""LazyGraphRAG refinement / iterative-deepening tests
(lightrag/{query_refinement,iterative_deepening}.rs) on hand fixtures."""

import math

import pytest

from graphrag_ray.stages.lazy_search import (ConceptGraphView, ids_search,
                                             normalize_concept,
                                             refine_query)


def test_normalize_concept_space_quirk():
    # alnum filter removes spaces BEFORE the space→underscore replace
    assert normalize_concept("Alice Harmon") == "aliceharmon"
    assert normalize_concept("a_b c") == "a_bc"


@pytest.fixture
def view():
    freqs = {"Alice Harmon": 4, "Acme Corp": 3, "Tokyo Tower": 2,
             "Rare Thing": 1}
    rels = [("Acme Corp", "Alice Harmon", 0.5),
            ("Alice Harmon", "Tokyo Tower", 0.8),
            ("Rare Thing", "Tokyo Tower", 0.2)]
    chunks = {"Alice Harmon": ["c1", "c2"], "Acme Corp": ["c2", "c3"],
              "Tokyo Tower": ["c4"], "Rare Thing": ["c5"]}
    return ConceptGraphView(freqs, rels, chunks)


def test_related_concepts_outgoing_only(view):
    # only OUTGOING (lexicographically-later) partners, by confidence
    assert view.get_related_concepts("Alice Harmon", 5) == ["Tokyo Tower"]
    assert view.get_related_concepts("Acme Corp", 5) == ["Alice Harmon"]
    assert view.get_related_concepts("Tokyo Tower", 5) == []


def test_refine_query_expansion_and_scores(view):
    r = refine_query("Alice Harmon news", view)
    # the general noun-phrase regex also captures the longer span
    assert r["initial_concepts"] == ["Alice Harmon", "Alice Harmon news"]
    # expansion: Alice Harmon → Tokyo Tower (outgoing)
    assert "Tokyo Tower" in r["expanded_concepts"]
    # score: (ln 2 + 1) * 1.5 (one connection), then feedback boosts
    base = (math.log(2) + 1.0) * 1.5
    assert r["relevance_scores"]["Tokyo Tower"] >= base
    assert r["relevant_chunk_ids"] == ["c4"]


def test_refine_query_no_concepts(view):
    r = refine_query("xy", view)
    assert r["initial_concepts"] == [] and r["iterations"] == 0


def test_ids_search_depth_progression(view):
    r = ids_search("Alice Harmon report", view)
    # depth 0: chunks of Alice Harmon (c1, c2)
    assert r["depths"][0]["new_chunks_found"] == 2
    # expansion adds Tokyo Tower → c4 at depth 1
    assert r["depths"][1]["new_chunks_found"] >= 1
    assert r["total_chunks"] >= 3
    assert r["stop_reason"] in ("no_more_concepts", "max_depth_reached")


def test_ids_search_no_concepts(view):
    r = ids_search("zz", view)
    assert r["total_chunks"] == 0 and r["depths"] == []


def test_ids_search_max_chunks_stop():
    freqs = {"Hub One": 5}
    chunks = {"Hub One": [f"c{i}" for i in range(60)]}
    v = ConceptGraphView(freqs, [], chunks)
    r = ids_search("Hub One data", v)
    assert r["stop_reason"] == "max_chunks_reached"
    assert r["total_chunks"] == 60


# ------------------------------------------------------- lazy pipeline

def test_chunk_text_windows_and_overlap():
    from graphrag_ray.stages.lazy_search import chunk_text

    chunks = chunk_text("x" * 1000, "d", chunk_size=512, chunk_overlap=128)
    assert [c["start"] for c in chunks] == [0, 384, 768]
    assert chunks[0]["id"] == "d_0" and chunks[-1]["end"] == 1000
    assert chunk_text("", "d") == []
    one = chunk_text("short", "d")
    assert len(one) == 1 and one[0]["content"] == "short"


def test_lazy_pipeline_end_to_end():
    from graphrag_ray.stages.lazy_search import LazyPipeline

    p = LazyPipeline()
    p.index_document("d1", "Alice Harmon joined Acme Corp. "
                           "Acme Corp opened in Tokyo Tower.")
    p.index_document("d2", "Tokyo Tower hosted Alice Harmon.")
    p.build_graph()
    st = p.statistics()
    assert st["document_count"] == 2 and st["chunk_count"] == 2
    assert st["concept_count"] > 0 and st["relation_count"] > 0
    res = p.query("Alice Harmon visit")
    assert res["total_chunks"] == 2  # both chunks mention Alice Harmon
    assert res["depths"][0]["new_chunks_found"] >= 1
    # unbuilt pipeline returns empty results
    empty = LazyPipeline().query("x")
    assert empty["total_chunks"] == 0
