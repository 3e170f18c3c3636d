"""Property test: the recursive-CTE Leiden replay (_leiden_replay) equals
stages/community._leiden_partition — partition equality via min-member
canonicalization — on seeded random graphs across densities and
resolutions. This is the same SQL the syn_leiden / kgx_leiden /
kgx_rel_hierarchy oracles compose; here it runs against arbitrary graphs
DuckDB-side, so the equivalence claim isn't tied to the fixture corpora."""

import random

import duckdb
import pytest

from graphrag_ray.stages.community import _leiden_partition
from graphrag_ray.syn_oracle_kg import _leiden_replay


def _canon(partition: dict[str, int]) -> dict[str, str]:
    by_comm: dict[int, list[str]] = {}
    for n, c in partition.items():
        by_comm.setdefault(c, []).append(n)
    rep = {c: min(m) for c, m in by_comm.items()}
    return {n: rep[c] for n, c in partition.items()}


def _sql_partition(nodes: list[str], edges: list[tuple[str, str]],
                   resolution: float) -> dict[str, str]:
    con = duckdb.connect()
    con.execute("CREATE TABLE tn (canonical_id VARCHAR)")
    con.executemany("INSERT INTO tn VALUES (?)", [(n,) for n in nodes])
    con.execute("CREATE TABLE te (src VARCHAR, dst VARCHAR)")
    if edges:
        con.executemany("INSERT INTO te VALUES (?, ?)", edges)
    rows = con.execute(
        "WITH RECURSIVE " + _leiden_replay("tn", "te", resolution)
    ).fetchall()
    return dict(rows)


@pytest.mark.parametrize("seed,n,m,resolution", [
    (1, 12, 20, 1.0),
    (2, 20, 35, 1.0),
    (3, 16, 10, 1.0),     # sparse -> singleton-heavy + components
    (4, 18, 60, 1.0),     # dense
    (5, 20, 30, 0.5),
    (6, 20, 30, 2.0),
    (7, 25, 40, 1.0),
])
def test_replay_matches_python_random_graphs(seed, n, m, resolution):
    rng = random.Random(seed)
    nodes = [f"n{i:03d}" for i in range(n)]
    edges = []
    for _ in range(m):
        a, b = rng.sample(nodes, 2)
        edges.append((a, b))
    # include a duplicate edge and a self-loop (dropped by the algorithm)
    edges.append(edges[0])
    edges.append((nodes[0], nodes[0]))

    py = _canon(_leiden_partition(nodes, edges, resolution=resolution))
    sql = _sql_partition(nodes, edges, resolution)
    assert sql == py


def test_replay_two_cliques_with_bridge():
    # two 4-cliques joined by one bridge edge: local move groups each
    # clique; the replay must agree exactly
    nodes = [f"a{i}" for i in range(4)] + [f"b{i}" for i in range(4)]
    edges = []
    for grp in ("a", "b"):
        for i in range(4):
            for j in range(i + 1, 4):
                edges.append((f"{grp}{i}", f"{grp}{j}"))
    edges.append(("a0", "b0"))
    py = _canon(_leiden_partition(nodes, edges))
    sql = _sql_partition(nodes, edges, 1.0)
    assert sql == py
    assert len(set(py.values())) >= 2


def test_replay_isolated_nodes_are_singletons():
    nodes = ["x1", "x2", "x3"]
    py = _canon(_leiden_partition(nodes, []))
    sql = _sql_partition(nodes, [], 1.0)
    assert sql == py == {"x1": "x1", "x2": "x2", "x3": "x3"}
