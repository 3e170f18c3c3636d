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


# --- L3: centralities / Louvain / metrics on the reference test graph
# (analytics.rs:488-547 fixture: square A-B, A-C, B-C, B-D, C-D)


def _abcd_edges(ray_session):
    import pandas as pd

    return ray.data.from_pandas(pd.DataFrame({
        "src": ["A", "A", "B", "B", "C"],
        "dst": ["B", "C", "C", "D", "D"],
    }))


def test_centrality_reference_fixture(ray_session):
    df = ga.centrality_scores(_abcd_edges(ray_session)).to_pandas()
    s = df.set_index("node_id")
    # degree: A,D = 2/3; B,C = 1.0 (analytics.rs:209-217)
    assert abs(s.loc["A", "degree"] - 2 / 3) < 1e-6
    assert abs(s.loc["B", "degree"] - 1.0) < 1e-6
    # reference assertion (:509-524): central nodes >= peripheral
    assert s.loc["B", "betweenness"] >= s.loc["A", "betweenness"]
    # hand-computed under deterministic (dist, id) tie-break: the A<->D
    # shortest path routes via B both directions -> bc[B] = 2/3, bc[C]=0
    assert abs(s.loc["B", "betweenness"] - 2 / 3) < 1e-6
    assert s.loc["C", "betweenness"] == 0.0
    assert s.loc["A", "betweenness"] == 0.0
    # closeness: A -> dists (1,1,2) -> 3/4; B -> (1,1,1) -> 1.0 (:250-279)
    assert abs(s.loc["A", "closeness"] - 0.75) < 1e-6
    assert abs(s.loc["B", "closeness"] - 1.0) < 1e-6


def test_louvain_reference_fixture(ray_session):
    df = ga.louvain_communities(_abcd_edges(ray_session)).to_pandas()
    # one connected component of 4 nodes (analytics.rs:525-533)
    assert df["community_id"].nunique() == 1
    assert len(df) == 4
    # modularity quirk transcription: internal edge-ends / (2 * n_nodes)
    # = 10 / 8 = 1.25 (analytics.rs:158-180)
    assert abs(df["modularity"].iloc[0] - 1.25) < 1e-6


def test_graph_metrics_reference_fixture(ray_session):
    df = ga.graph_metrics(_abcd_edges(ray_session))
    vals = dict(zip(df["stat"], df["value"]))
    # density = 2*5/(4*3) = 5/6 (analytics.rs:432-443, test :534-541)
    assert abs(vals["density"] - 5 / 6) < 1e-6
    assert 0.0 <= vals["avg_clustering_coefficient"] <= 1.0
    # hand-computed: A: nbrs {B,C}, B-C edge -> triangles counted both
    # directions = 2, k=2 -> 1.0; same for D; B: nbrs {A,C,D}: pairs
    # (A,C),(C,A),(C,D),(D,C) -> 4/6; same C -> avg = (1+1+2/3+2/3)/4 = 5/6
    assert abs(vals["avg_clustering_coefficient"] - 5 / 6) < 1e-6


def test_centrality_disconnected(ray_session):
    import pandas as pd

    edges = ray.data.from_pandas(pd.DataFrame(
        {"src": ["A", "C"], "dst": ["B", "D"]}))
    df = ga.centrality_scores(edges).to_pandas().set_index("node_id")
    # closeness only over reachable nodes: each pair -> 1/1 = 1.0
    assert (df["closeness"] == 1.0).all()
    assert (df["betweenness"] == 0.0).all()
    louv = ga.louvain_communities(edges).to_pandas()
    assert louv["community_id"].nunique() == 2


def test_shortest_path_reference_fixture(ray_session):
    """analytics.rs:500-507: A→D over the square is 3 nodes, weight 2."""
    path, weight = ga.shortest_path(_abcd_edges(ray_session), "A", "D")
    assert len(path) == 3 and weight == 2.0
    assert path[0] == "A" and path[-1] == "D"
    assert path[1] in ("B", "C")
    assert ga.shortest_path(_abcd_edges(ray_session), "A", "ZZZ") is None


def test_all_paths_bounded_depth(ray_session):
    paths = ga.all_paths(_abcd_edges(ray_session), "A", "D", max_depth=3)
    got = sorted(p for p, _w in paths)
    assert got == [["A", "B", "D"], ["A", "C", "D"]]
    deeper = ga.all_paths(_abcd_edges(ray_session), "A", "D", max_depth=4)
    assert len(deeper) == 4  # + A-B-C-D and A-C-B-D


def test_centrality_distributed_matches_single_task(ray_session):
    """Fan-out per source batch (the round-3 distribution of the per-source
    Dijkstra loop) must equal the single-task reference form exactly on a
    1k-node random graph — multi-task execution, same tie-breaks."""
    import numpy as np
    import ray as _ray
    import ray.data as rd
    from graphrag_ray.stages.graph_analytics import (
        _centrality_task,
        centrality_scores,
    )

    rng = np.random.RandomState(7)
    n_nodes = 1000
    pairs = set()
    while len(pairs) < 2500:
        a, b = rng.randint(0, n_nodes, 2)
        if a != b:
            pairs.add((f"n{a:04d}", f"n{b:04d}"))
    edges = sorted(pairs)
    ds = rd.from_items([{"src": a, "dst": b} for a, b in edges])
    got = (
        centrality_scores(ds, source_batches=16)
        .to_pandas().set_index("node_id").sort_index()
    )
    want = (
        _ray.get(_centrality_task.remote([(a, b, 1.0) for a, b in edges]))
        .set_index("node_id").sort_index()
    )
    assert (got.index == want.index).all()
    for col in ("degree", "betweenness", "closeness"):
        assert np.allclose(got[col].to_numpy(), want[col].to_numpy(),
                           atol=1e-12), col


def test_centrality_source_sampling_deterministic(ray_session):
    """Sampled mode (n > max_exact_sources) runs multi-task and is
    deterministic under the pinned seed; the n/k-scaled estimator stays
    close to exact on a structured graph."""
    import numpy as np
    import ray.data as rd
    from graphrag_ray.stages.graph_analytics import centrality_scores

    # hub-and-spoke over 300 nodes: hub betweenness dominates
    edges = [{"src": "hub", "dst": f"s{i:03d}"} for i in range(299)]
    ds = rd.from_items(edges)
    a = centrality_scores(ds, max_exact_sources=60, seed=3).to_pandas()
    b = centrality_scores(ds, max_exact_sources=60, seed=3).to_pandas()
    assert a.equals(b)
    exact = centrality_scores(ds).to_pandas().set_index("node_id")
    est = a.set_index("node_id")
    # hub is the unique dominant betweenness node in both
    assert est["betweenness"].idxmax() == "hub"
    assert abs(est.loc["hub", "betweenness"]
               - exact.loc["hub", "betweenness"]) < 0.05


def test_find_causal_chains_reference_semantics():
    """causal_analysis.rs: BFS simple paths, causal-step filtering,
    weighted confidence product (typed strength vs 0.7 keyword default),
    temporal monotonicity over step midpoints, confidence-descending
    order, and the require_temporal_consistency filter."""
    from graphrag_ray.stages.temporal import find_causal_chains

    edges = [
        # A -> B typed Caused (strength 0.9): weight 0.95
        {"src": "A", "dst": "B", "rel_type": "CAUSED", "confidence": 0.8,
         "t_start": 1900, "t_end": 1900, "temporal_type": "Caused",
         "causal_strength": 0.9},
        # B -> D keyword-causal, no strength: weight 0.7, year AFTER
        {"src": "B", "dst": "D", "rel_type": "led_to", "confidence": 0.9,
         "t_start": 1950, "t_end": 1950},
        # A -> C -> D alternative: C->D is non-causal (skipped as a step)
        {"src": "A", "dst": "C", "rel_type": "triggered",
         "confidence": 0.6, "t_start": 1980, "t_end": 1980},
        {"src": "C", "dst": "D", "rel_type": "related_to",
         "confidence": 0.9, "t_start": 1800, "t_end": 1800},
    ]
    chains = find_causal_chains(edges, "A", "D")
    assert [c["path"] for c in chains] == ["A -> B -> D", "A -> C -> D"]
    # A->B->D: 0.8*0.95 * 0.9*0.7 = 0.4788 ; consistent (1900 <= 1950)
    assert chains[0]["total_confidence"] == pytest.approx(0.4788)
    assert chains[0]["temporal_consistency"] is True
    assert chains[0]["time_span"] == 50
    # A->C->D: only the causal A->C step remains: 0.6*0.7 = 0.42
    assert chains[1]["n_steps"] == 1
    assert chains[1]["total_confidence"] == pytest.approx(0.42)
    # temporal violation: flip B->D to an earlier year
    edges[1] = dict(edges[1], t_start=1850, t_end=1850)
    chains = find_causal_chains(edges, "A", "D")
    top = [c for c in chains if c["path"] == "A -> B -> D"][0]
    assert top["temporal_consistency"] is False
    assert not any(c["path"] == "A -> B -> D" for c in find_causal_chains(
        edges, "A", "D", require_temporal_consistency=True))
    # confidence gate prunes the whole path during BFS
    assert find_causal_chains(
        [dict(e, confidence=0.4) for e in edges], "A", "D") == []
    # min_causal_strength gates typed rels
    weak = [dict(edges[0], causal_strength=0.1),
            dict(edges[1])]
    only_keyword = find_causal_chains(weak, "A", "D",
                                      min_causal_strength=0.3)
    assert only_keyword[0]["n_steps"] == 1  # A->B step dropped
