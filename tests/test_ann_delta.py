"""Tests for the approximate-search variants and delta computation."""

import numpy as np

from graphrag_ray.stages import ann
from graphrag_ray.state.delta import BloomFilter, GraphSnapshot, compute_delta


def test_ivf_centroids_deterministic():
    rng = np.random.RandomState(0)
    sample = rng.normal(size=(200, 16)).astype(np.float32)
    c1 = ann.train_ivf_centroids(sample, 8)
    c2 = ann.train_ivf_centroids(sample, 8)
    assert np.allclose(c1, c2)
    assert c1.shape == (8, 16)


def test_ivf_recall_vs_brute_force(ray_session):
    import ray

    from graphrag_ray import queries as q

    sf = "/root/testdata/sf0.001"
    exact = q.ann_topk(sf, k=10)
    approx = q.ann_ivf_topk(sf, k=10)
    overlap = len(set(exact["vec_id"]) & set(approx["vec_id"]))
    # the query vector itself must always be found; decent recall overall
    assert 0 in set(approx["vec_id"])
    assert overlap >= 3, f"IVF recall too low: {overlap}/10"


def test_lsh_recall(ray_session):
    from graphrag_ray import queries as q

    sf = "/root/testdata/sf0.001"
    approx = q.ann_lsh_topk(sf, k=10)
    assert 0 in set(approx["vec_id"])  # exact self-match survives bucketing


def test_bloom_filter():
    b = BloomFilter(1 << 12, 4)
    for x in ("a", "b", "c"):
        b.add(x)
    assert "a" in b and "b" in b and "c" in b
    missing = sum(1 for i in range(100) if f"zz{i}" in b)
    assert missing <= 2  # tiny false-positive rate at this load


def test_compute_delta():
    ents_v1 = [{"canonical_id": "A", "canonical_name": "Alice", "entity_type": "P",
                "mention_count": 3, "doc_frequency": 2}]
    edges_v1 = [{"src": "A", "dst": "B", "rel_type": "KNOWS",
                 "n_occurrences": 1, "confidence": 0.5}]
    snap1 = GraphSnapshot.from_tables(ents_v1, edges_v1)

    ents_v2 = [
        {"canonical_id": "A", "canonical_name": "Alice", "entity_type": "P",
         "mention_count": 5, "doc_frequency": 3},          # modified
        {"canonical_id": "C", "canonical_name": "Cara", "entity_type": "P",
         "mention_count": 1, "doc_frequency": 1},          # added
    ]
    snap2 = GraphSnapshot.from_tables(ents_v2, edges_v1)
    delta = compute_delta(snap1, snap2)
    assert delta.added_entities == ["C"]
    assert delta.modified_entities == ["A"]
    assert delta.removed_entities == []
    assert delta.added_edges == [] and delta.removed_edges == []
    assert not delta.is_empty

    assert compute_delta(snap2, snap2).is_empty


def test_bucketed_near_dup_equals_exact(ray_session):
    """VERDICT r02 #6: the LSH-banded candidate path (band groupby + exact
    within-bucket verify) must produce EXACTLY the all-pairs result at
    τ=0.45 on the testdata — full recall with the default geometry."""
    from graphrag_ray import queries as q

    sf = "/root/testdata/sf0.001"
    exact = q.embedding_near_dup(sf).to_pandas()
    bucketed = q.embedding_near_dup_bucketed(sf).to_pandas()
    key = ["vec_a", "vec_b"]
    exact = exact.sort_values(key).reset_index(drop=True)
    bucketed = bucketed.sort_values(key).reset_index(drop=True)
    assert exact[key].values.tolist() == bucketed[key].values.tolist()
    assert (exact["sim"].to_numpy() == bucketed["sim"].to_numpy()).all()
