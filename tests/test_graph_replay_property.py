"""Property tests: the round-4 graph-analytics SQL replays (triangles,
k-core, LPA, eccentricity, Adamic-Adar link prediction) equal their
Python stages on seeded random graphs — the same SQL the kgx_*/syn_*
oracles compose, decoupled from the fixture corpora."""

import random

import duckdb
import pytest

import ray

from graphrag_ray.stages import graph_analytics as ga
from graphrag_ray.syn_oracle_kg import (
    _assortativity_replay,
    _ecc_replay,
    _kcore_replay,
    _link_pred_replay,
    _lpa_replay,
    _triangles_replay,
)


def _rand_graph(seed: int, n: int, m: int):
    rng = random.Random(seed)
    nodes = [f"n{i:02d}" for i in range(n)]
    edges = []
    for _ in range(m):
        a, b = rng.sample(nodes, 2)
        edges.append((a, b))
    return nodes, edges


def _sql(nodes, edges, replay: str):
    con = duckdb.connect()
    con.execute("CREATE TABLE tn (canonical_id VARCHAR)")
    con.executemany("INSERT INTO tn VALUES (?)", [(x,) for x in nodes])
    con.execute("CREATE TABLE te (src VARCHAR, dst VARCHAR)")
    if edges:
        con.executemany("INSERT INTO te VALUES (?, ?)", edges)
    return con.execute("WITH RECURSIVE " + replay).fetchall()


CASES = [(1, 10, 14), (2, 14, 30), (3, 8, 6), (4, 16, 40), (5, 12, 0)]


@pytest.mark.parametrize("seed,n,m", CASES)
def test_triangles_replay_equivalence(ray_session, seed, n, m):
    nodes, edges = _rand_graph(seed, n, m)
    py = ray.get(ga._triangles_task.remote(nodes, edges))
    got = dict(_sql(nodes, edges, _triangles_replay("tn", "te")))
    want = dict(zip(py["entity_id"], py["n_triangles"]))
    assert got == want


@pytest.mark.parametrize("seed,n,m", CASES)
def test_kcore_replay_equivalence(ray_session, seed, n, m):
    nodes, edges = _rand_graph(seed, n, m)
    py = ray.get(ga._kcore_task.remote(nodes, edges, 2, 64))
    got = dict(_sql(nodes, edges, _kcore_replay("tn", "te", k=2, rounds=24)))
    want = dict(zip(py["entity_id"], py["core_degree"]))
    assert got == want


@pytest.mark.parametrize("seed,n,m", CASES)
def test_lpa_replay_equivalence(ray_session, seed, n, m):
    nodes, edges = _rand_graph(seed, n, m)
    py = ray.get(ga._lpa_task.remote(nodes, edges, 8))
    got = dict(_sql(nodes, edges, _lpa_replay("tn", "te", rounds=8)))
    want = dict(zip(py["entity_id"], py["label"]))
    assert got == want


@pytest.mark.parametrize("seed,n,m", CASES)
def test_eccentricity_replay_equivalence(ray_session, seed, n, m):
    nodes, edges = _rand_graph(seed, n, m)
    py = ray.get(ga._ecc_task.remote(nodes, edges, 16))
    got = dict(_sql(nodes, edges, _ecc_replay("tn", "te", max_depth=16)))
    want = dict(zip(py["entity_id"], py["eccentricity"]))
    assert got == want


@pytest.mark.parametrize("seed,n,m", CASES)
def test_link_pred_replay_equivalence(ray_session, seed, n, m):
    nodes, edges = _rand_graph(seed, n, m)
    py = ray.get(ga._link_pred_task.remote(nodes, edges))
    got = {(r[0], r[1]): (r[2], r[3])
           for r in _sql(nodes, edges, _link_pred_replay("tn", "te"))}
    want = {(a, b): (int(c), float(s))
            for a, b, c, s in py.itertuples(index=False, name=None)}
    assert got == want


@pytest.mark.parametrize("seed,n,m", CASES)
def test_assortativity_replay_equivalence(ray_session, seed, n, m):
    nodes, edges = _rand_graph(seed, n, m)
    py = ray.get(ga._assortativity_task.remote(nodes, edges))
    rows = _sql(nodes, edges, _assortativity_replay("tn", "te"))
    assert len(rows) == 1
    assert rows[0][0] == py["n_edges"].iloc[0]
    assert rows[0][1] == pytest.approx(py["assortativity"].iloc[0], abs=0)


@pytest.mark.parametrize("seed,n,m", CASES)
def test_hits_replay_equivalence(ray_session, seed, n, m):
    from graphrag_ray.syn_oracle_kg import _hits_replay

    nodes, edges = _rand_graph(seed, n, m)
    py = ray.get(ga._hits_task.remote(nodes, edges, 8))
    rows = _sql(nodes, edges, _hits_replay("tn", "te"))
    got = {r[0]: (r[1], r[2]) for r in rows}
    want = {
        e: (round4(a), round4(h))
        for e, a, h in zip(py["entity_id"], py["authority"], py["hub"])
    }
    assert got == want


def round4(x: float) -> float:
    import math

    return math.copysign(math.floor(abs(x) * 1e4 + 0.5) / 1e4, x)
