"""L5: Node2Vec + GraphSAGE (graph/embeddings.rs) — determinism, shape,
and the structural property embeddings exist for: nodes in the same dense
cluster end up closer than nodes across clusters."""

import numpy as np
import pandas as pd
import pytest

import ray

from graphrag_ray.stages.graph_embeddings import (biased_walk,
                                                  build_adjacency,
                                                  graphsage, node2vec)


def _two_cluster_edges(ray_session):
    # two triangles bridged by one weak edge
    return ray.data.from_pandas(pd.DataFrame({
        "src": ["A", "A", "B", "X", "X", "Y", "B"],
        "dst": ["B", "C", "C", "Y", "Z", "Z", "X"],
    }))


def test_biased_walk_deterministic_and_valid():
    adj = build_adjacency([("A", "B", 1.0), ("B", "C", 1.0), ("C", "A", 1.0)])
    from graphrag_ray.stages.graph_embeddings import _seeded_rng

    w1 = biased_walk(adj, "A", 10, 1.0, 1.0, _seeded_rng("t:1"))
    w2 = biased_walk(adj, "A", 10, 1.0, 1.0, _seeded_rng("t:1"))
    assert w1 == w2 and len(w1) == 10
    # every step follows an edge
    for a, b in zip(w1, w1[1:]):
        assert (b, 1.0) in adj[a]


def test_biased_walk_return_param_controls_backtracking():
    adj = build_adjacency([("A", "B", 1.0), ("B", "C", 1.0)])
    from graphrag_ray.stages.graph_embeddings import _seeded_rng

    # p tiny → returning to the previous node dominates: walk oscillates
    w = biased_walk(adj, "A", 12, 1e-6, 1e6, _seeded_rng("t:2"))
    assert w[:4] == ["A", "B", "A", "B"]


def test_node2vec_shapes_and_determinism(ray_session):
    edges = _two_cluster_edges(ray_session)
    out1 = {r["node_id"]: r["embedding"] for r in node2vec(
        edges, dimension=16, walk_length=10, walks_per_node=2,
        epochs=2).take_all()}
    out2 = {r["node_id"]: r["embedding"] for r in node2vec(
        edges, dimension=16, walk_length=10, walks_per_node=2,
        epochs=2).take_all()}
    assert set(out1) == {"A", "B", "C", "X", "Y", "Z"}
    assert all(len(v) == 16 for v in out1.values())
    for k in out1:
        assert np.allclose(out1[k], out2[k])


def test_graphsage_cluster_structure(ray_session):
    edges = _two_cluster_edges(ray_session)
    emb = {r["node_id"]: np.array(r["embedding"])
           for r in graphsage(edges, dimension=32, num_layers=2).take_all()}

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    within = cos(emb["A"], emb["C"])     # same triangle, no bridge node
    across = cos(emb["A"], emb["Z"])     # different clusters
    assert within > across
    # unit-normalized output
    for v in emb.values():
        assert abs(np.linalg.norm(v) - 1.0) < 1e-3


def test_graphsage_deterministic(ray_session):
    edges = _two_cluster_edges(ray_session)
    a = {r["node_id"]: r["embedding"] for r in graphsage(edges).take_all()}
    b = {r["node_id"]: r["embedding"] for r in graphsage(edges).take_all()}
    assert a == b
