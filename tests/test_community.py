"""Leiden semantics tests (reference toy graph: graph/leiden.rs:785-843 —
two dense cliques joined by one weak edge → two communities)."""

import ray

from graphrag_ray.stages.community import _leiden_partition, _summaries, detect_communities


def test_two_cliques_split():
    nodes = ["a1", "a2", "a3", "b1", "b2", "b3"]
    edges = [
        ("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
        ("b1", "b2"), ("b2", "b3"), ("b1", "b3"),
        ("a3", "b1"),  # weak bridge
    ]
    partition = _leiden_partition(nodes, edges)
    groups = {}
    for n, c in partition.items():
        groups.setdefault(c, set()).add(n)
    parts = sorted(groups.values(), key=lambda s: sorted(s))
    assert {frozenset(p) for p in parts} == {
        frozenset({"a1", "a2", "a3"}),
        frozenset({"b1", "b2", "b3"}),
    }


def test_refinement_splits_disconnected():
    # two components with no bridge: local moving keeps singletons separate,
    # but force the check — a community containing both components must split
    nodes = ["x1", "x2", "y1", "y2"]
    edges = [("x1", "x2"), ("y1", "y2")]
    partition = _leiden_partition(nodes, edges)
    comms = {}
    for n, c in partition.items():
        comms.setdefault(c, set()).add(n)
    for members in comms.values():
        # every community is a connected subgraph
        assert members in ({"x1", "x2"}, {"y1", "y2"}, {"x1"}, {"x2"}, {"y1"}, {"y2"})


def test_deterministic():
    nodes = [f"n{i}" for i in range(20)]
    edges = [(f"n{i}", f"n{(i + 1) % 20}") for i in range(20)]
    p1 = _leiden_partition(nodes, edges)
    p2 = _leiden_partition(nodes, edges)
    assert p1 == p2


def test_empty_graph():
    assert _leiden_partition([], []) == {}
    p = _leiden_partition(["solo"], [])
    assert p == {"solo": 0}


def test_summary_format():
    partition = {"PERSON_a": 0, "PERSON_b": 0, "LOCATION_x": 0}
    meta = {
        "PERSON_a": ("Alice", "PERSON"),
        "PERSON_b": ("Bob", "PERSON"),
        "LOCATION_x": ("Tokyo", "LOCATION"),
    }
    out = _summaries(partition, meta)
    assert len(out) == 1
    s = out[0]["summary"]
    assert s.startswith("Community 0 (Level 0)")
    assert "Contains 3 entities:" in s
    assert "- LOCATION: Tokyo" in s
    assert "- PERSON: Alice, Bob" in s
    assert out[0]["entity_count"] == 3


def test_detect_communities_datasets(ray_session):
    import pandas as pd

    ents = ray.data.from_pandas(pd.DataFrame({
        "canonical_id": ["A", "B", "C"],
        "canonical_name": ["Alice", "Bob", "Tokyo"],
        "entity_type": ["PERSON", "PERSON", "LOCATION"],
    }))
    edges = ray.data.from_pandas(pd.DataFrame({
        "src": ["A", "B"], "dst": ["B", "C"],
    }))
    comms, sums = detect_communities(ents, edges)
    cdf = comms.to_pandas()
    assert set(cdf["entity_id"]) == {"A", "B", "C"}
    assert sums.count() >= 1


def test_hierarchical_levels(ray_session):
    import pandas as pd

    # 4 triangles chained by single bridges: level 0 → 4 communities,
    # level 1 contracts them further
    nodes, edges = [], []
    for g in range(4):
        a, b, c = f"g{g}a", f"g{g}b", f"g{g}c"
        nodes += [a, b, c]
        edges += [(a, b), (b, c), (a, c)]
    for g in range(3):
        edges.append((f"g{g}c", f"g{g+1}a"))
    ents = ray.data.from_pandas(pd.DataFrame({
        "canonical_id": nodes,
        "canonical_name": nodes,
        "entity_type": ["PERSON"] * len(nodes),
    }))
    edf = ray.data.from_pandas(pd.DataFrame({
        "src": [e[0] for e in edges], "dst": [e[1] for e in edges],
    }))
    comms, sums = detect_communities(ents, edf, max_levels=3)
    cdf = comms.to_pandas()
    assert set(cdf["level"]) >= {0, 1}
    lvl0 = cdf[cdf["level"] == 0]
    # level 0 finds the 4 triangles
    assert lvl0.groupby("community_id")["entity_id"].count().tolist() == [3, 3, 3, 3]
    # every entity appears at every level present
    for lvl in set(cdf["level"]):
        assert set(cdf[cdf["level"] == lvl]["entity_id"]) == set(nodes)
    sdf = sums.to_pandas()
    assert set(sdf["level"]) == set(cdf["level"])


def test_relationship_hierarchy_two_level_fixture(ray_session):
    """L4 hand-derived fixture (hierarchical_relationships.rs semantics):
    without temporal data the similarity graph is per-type cliques
    (same type = 0.5 > 0.3; shared endpoint alone = 0.3, NOT > 0.3), so
    - r0=(A,B,WORKS_FOR), r1=(C,D,WORKS_FOR) form one 2-clique,
    - r2=(A,E,KNOWS) shares endpoint A with r0 but different type → isolated,
    - r3=(F,G,LOCATED_IN) isolated.
    min_cluster_size=2 keeps only the WORKS_FOR cluster at each level;
    its cohesion = 0.2 + 0.6·(1 internal edge / 1 possible) = 0.8; both
    resolution levels re-cluster the same graph → identical membership."""
    import ray.data as rd
    from graphrag_ray.stages.community import relationship_hierarchy

    edges = rd.from_items([
        {"src": "A", "dst": "B", "rel_type": "WORKS_FOR"},
        {"src": "C", "dst": "D", "rel_type": "WORKS_FOR"},
        {"src": "A", "dst": "E", "rel_type": "KNOWS"},
        {"src": "F", "dst": "G", "rel_type": "LOCATED_IN"},
    ])
    members, clusters = relationship_hierarchy(
        edges, resolutions=(1.0, 0.5), min_cluster_size=2)
    m = members.to_pandas()
    c = clusters.to_pandas()
    assert sorted(c["cluster_id"]) == ["L0C0", "L1C0"]
    for _, row in c.iterrows():
        assert row["size"] == 2
        assert row["summary"] == f"Cluster {row['cluster_id']} with 2 relationships"
        assert abs(row["cohesion"] - 0.8) < 1e-9
    for lvl in (0, 1):
        got = sorted(m[m["level"] == lvl]["rel_id"])
        assert got == ["A_B_WORKS_FOR", "C_D_WORKS_FOR"]


def test_relationship_hierarchy_min_cluster_one_keeps_singletons(ray_session):
    import ray.data as rd
    from graphrag_ray.stages.community import relationship_hierarchy

    edges = rd.from_items([
        {"src": "A", "dst": "B", "rel_type": "WORKS_FOR"},
        {"src": "C", "dst": "D", "rel_type": "WORKS_FOR"},
        {"src": "A", "dst": "E", "rel_type": "KNOWS"},
    ])
    members, clusters = relationship_hierarchy(
        edges, resolutions=(1.0,), min_cluster_size=1)
    c = clusters.to_pandas().set_index("cluster_id")
    # singleton cluster is perfectly cohesive (reference :605-607)
    singles = c[c["size"] == 1]
    assert len(singles) == 1 and (singles["cohesion"] == 1.0).all()
    assert len(c) == 2
