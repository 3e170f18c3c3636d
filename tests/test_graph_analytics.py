"""Graph analytics semantics tests (PageRank, components, stats, top-k)."""

import numpy as np
import pandas as pd
import pytest

import ray

from graphrag_ray.stages import graph_analytics as ga


@pytest.fixture(scope="module")
def small_graph(ray_session):
    ents = ray.data.from_pandas(pd.DataFrame({
        "canonical_id": ["A", "B", "C", "D", "E"],
        "canonical_name": ["Alice Harmon", "Bob Tanner", "Tokyo", "Acme", "Elena"],
        "entity_type": ["PERSON", "PERSON", "LOCATION", "ORGANIZATION", "PERSON"],
        "mention_count": [10, 5, 3, 2, 1],
    }))
    edges = ray.data.from_pandas(pd.DataFrame({
        "src": ["A", "A", "B", "D"],
        "dst": ["B", "C", "C", "E"],
        "rel_type": ["KNOWS", "LOCATED_IN", "LOCATED_IN", "WORKS_FOR"],
    }))
    return ents, edges


def test_pagerank_sums_to_one(small_graph, ray_session):
    ents, edges = small_graph
    df = ga.pagerank(ents, edges).to_pandas()
    assert abs(df["score"].sum() - 1.0) < 1e-6
    # star graph: hub accumulates score
    ents2 = ray.data.from_pandas(pd.DataFrame({
        "canonical_id": ["H", "X", "Y", "Z"],
        "canonical_name": ["h", "x", "y", "z"],
        "entity_type": ["PERSON"] * 4,
        "mention_count": [1] * 4,
    }))
    edges2 = ray.data.from_pandas(pd.DataFrame({
        "src": ["H", "H", "H"], "dst": ["X", "Y", "Z"], "rel_type": ["KNOWS"] * 3,
    }))
    df2 = ga.pagerank(ents2, edges2).to_pandas()
    scores = dict(zip(df2["entity_id"], df2["score"]))
    assert scores["H"] > scores["X"]
    assert abs(scores["X"] - scores["Y"]) < 1e-9


def test_pagerank_deterministic(small_graph):
    ents, edges = small_graph
    a = ga.pagerank(ents, edges).to_pandas()
    b = ga.pagerank(ents, edges).to_pandas()
    assert np.allclose(a["score"], b["score"])


def test_connected_components(small_graph):
    ents, edges = small_graph
    df = ga.connected_components(ents, edges).to_pandas()
    comp = dict(zip(df["entity_id"], df["component"]))
    assert comp["A"] == comp["B"] == comp["C"] == "A"  # min-id root
    assert comp["D"] == comp["E"] == "D"
    deg = dict(zip(df["entity_id"], df["degree"]))
    assert deg["A"] == 2 and deg["C"] == 2 and deg["E"] == 1


def test_graph_stats(small_graph):
    ents, edges = small_graph
    df = ga.graph_stats(ents, edges, n_docs=7, n_chunks=20)
    vals = dict(zip(df["stat"], df["value"]))
    assert vals["entity_count"] == 5
    assert vals["relationship_count"] == 4
    assert vals["entity_type:PERSON"] == 3
    assert abs(vals["average_entities_per_chunk"] - 0.25) < 1e-9
    assert vals["density"] == 4 / 20


def test_common_entities(small_graph):
    ents, _ = small_graph
    df = ga.common_entities(ents, k=3)
    assert df["canonical_id"].tolist() == ["A", "B", "C"]


def test_semantic_neighbors_threshold(small_graph):
    ents, _ = small_graph
    df = ga.semantic_neighbors(ents, max_connections=3, similarity_threshold=0.99)
    # random hash embeddings of distinct names are far below 0.99
    assert len(df) == 0


def test_doc_cooccurrence_edges(ray_session):
    import pyarrow as pa

    from graphrag_ray.schemas import EXTRACTION

    def entity_row(doc, eid):
        return {
            "row_kind": "entity", "doc_id": doc, "entity_id": eid,
            "name": eid, "entity_type": "PERSON", "confidence": 0.8,
            "n_rows": 1, "n_mentions": 1, "src_id": None, "dst_id": None,
            "rel_type": None, "n_occurrences": None, "contexts": None,
        }

    rows = [entity_row("d1", "A"), entity_row("d1", "B"), entity_row("d1", "C"),
            entity_row("d2", "A"), entity_row("d2", "B")]
    tbl = pa.Table.from_pylist(rows, schema=EXTRACTION)
    ds = ray.data.from_arrow(tbl)
    out = ga.doc_cooccurrence_edges(ds).to_pandas()
    got = {(r.src, r.dst): r.n_docs for r in out.itertuples()}
    assert got == {("A", "B"): 2, ("A", "C"): 1, ("B", "C"): 1}
    assert set(out["rel_type"]) == {"co_occurs"}
