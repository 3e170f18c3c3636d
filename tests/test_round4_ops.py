"""Round-4 operator tests: as-of join, duplicated-passage detection,
bigram-LM scoring, triangle counts, k-core.

The hard correctness gate for each is its DuckDB oracle
(tools/check_correctness.py); these tests pin the operator-level
semantics on small hand-built inputs so failures localize."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- asof join

def _events_tbl(rows):
    return pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
    })


def test_asof_backward_inclusive(ray_session):
    from graphrag_ray.stages.events import asof_join

    left = ray.data.from_arrow(_events_tbl([
        (100, 1_000_000, 1),   # after right ts 900k -> match
        (101, 500_000, 1),     # before any right -> dropped
        (102, 900_000, 1),     # exact tie -> inclusive match
        (103, 5_000_000, 2),   # other user, no right rows -> dropped
    ]))
    right = ray.data.from_arrow(_events_tbl([
        (7, 900_000, 1),
        (8, 300_000, 9),
    ]))
    out = asof_join(left, right).to_pandas().sort_values("event_id")
    assert list(out["event_id"]) == [100, 102]
    assert list(out["r_event_id"]) == [7, 7]
    assert list(out["gap"]) == [100_000, 0]


def test_asof_duplicate_right_ts_tiebreak(ray_session):
    from graphrag_ray.stages.events import asof_join

    left = ray.data.from_arrow(_events_tbl([(1, 10_000_000, 4)]))
    right = ray.data.from_arrow(_events_tbl([
        (55, 9_000_000, 4), (44, 9_000_000, 4),  # same ts: min event_id wins
    ]))
    out = asof_join(left, right).to_pandas()
    assert list(out["r_event_id"]) == [44]


# ------------------------------------------------------------- dup passages

def _docs_ds(texts):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


def test_dup_passages_detects_shared_window(ray_session):
    from graphrag_ray.stages import passages

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    ds = _docs_ds([
        f"{shared} unique tail one",
        f"prefix words here {shared}",
        "entirely different text with no overlap at all whatsoever",
    ])
    out = passages.dup_passages(ds).to_pandas()
    h = hashlib.md5(shared.encode()).hexdigest()
    row = out[out["phash"] == h]
    assert len(row) == 1
    assert row.iloc[0]["n_docs"] == 2
    assert row.iloc[0]["n_occ"] == 2
    assert row.iloc[0]["first_doc_id"] == 0
    assert row.iloc[0]["first_pos"] == 0
    counts = passages.doc_dup_passage_counts(ds).to_pandas()
    assert set(counts["doc_id"]) == {0, 1}  # doc 2 emits nothing (inner)


def test_dup_passages_short_docs_emit_nothing(ray_session):
    from graphrag_ray.stages import passages

    out = passages.dup_passages(_docs_ds(["one two three", "one two three"]))
    assert out.count() == 0  # < 8 tokens -> no windows


# ------------------------------------------------------------ bigram LM

def test_lm_score_matches_direct_computation(ray_session):
    from graphrag_ray.stages import lm_score

    texts = ["a b a b c", "a b a b a b", "c c c"]
    ds = _docs_ds(texts)
    out = lm_score.lm_bigram_doc_scores(ds).to_pandas().set_index("doc_id")

    # direct reference computation
    from collections import Counter
    bg_all = Counter()
    cu_all = Counter()
    vocab = set()
    for t in texts:
        toks = t.split()
        vocab.update(toks)
        for w1, w2 in zip(toks, toks[1:]):
            bg_all[(w1, w2)] += 1
            cu_all[w1] += 1
    v = len(vocab)
    for doc_id, t in enumerate(texts):
        toks = t.split()
        lps = [np.log(bg_all[(w1, w2)] + 1) - np.log(cu_all[w1] + v)
               for w1, w2 in zip(toks, toks[1:])]
        want = np.floor(abs(np.mean(lps)) * 1e4 + 0.5) / 1e4 * np.sign(np.mean(lps))
        got = out.loc[doc_id]
        assert got["n_bigrams"] == len(lps)
        assert got["avg_logprob"] == pytest.approx(want, abs=1e-9)


# --------------------------------------------------------- triangles / core

def _graph(edges, nodes):
    ent = ray.data.from_arrow(pa.table({
        "canonical_id": pa.array(nodes, pa.string())}))
    edg = ray.data.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], pa.string()),
        "dst": pa.array([e[1] for e in edges], pa.string()),
    }))
    return ent, edg


def test_triangle_counts_known_graph(ray_session):
    from graphrag_ray.stages import graph_analytics as ga

    # K4 minus one edge: triangles abc, abd share edge ab; c-d missing
    ent, edg = _graph(
        [("a", "b"), ("b", "c"), ("a", "c"), ("a", "d"), ("b", "d"),
         ("b", "a"),  # duplicate reversed edge: must not double-count
         ("e", "e")],  # self loop ignored
        ["a", "b", "c", "d", "e"])
    out = ga.triangle_counts(ent, edg).to_pandas().set_index("entity_id")
    assert out.loc["a", "n_triangles"] == 2
    assert out.loc["b", "n_triangles"] == 2
    assert out.loc["c", "n_triangles"] == 1
    assert out.loc["d", "n_triangles"] == 1
    assert out.loc["e", "n_triangles"] == 0


def test_kcore_peels_tail(ray_session):
    from graphrag_ray.stages import graph_analytics as ga

    # triangle abc with a pendant path c-d-e: 2-core is exactly the triangle
    ent, edg = _graph(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")],
        ["a", "b", "c", "d", "e"])
    out = ga.kcore(ent, edg, k=2).to_pandas()
    assert list(out["entity_id"]) == ["a", "b", "c"]
    assert list(out["core_degree"]) == [2, 2, 2]


def test_kcore_converges_within_sql_unroll_bound(ray_session):
    """The SQL twin unrolls 24 peel rounds; the real corpora must converge
    well inside that (each non-final round removes >=1 node, and the
    replayed graphs are dense)."""
    from graphrag_ray.queries import _kgx

    res = _kgx(SF)
    nodes = [r["canonical_id"]
             for r in res.entities.select_columns(["canonical_id"]).take_all()]
    edges = [(r["src"], r["dst"])
             for r in res.edges.select_columns(["src", "dst"]).take_all()]
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    alive = set(nodes)
    rounds = 0
    while True:
        deg = {n: 0 for n in alive}
        for a, b in und:
            if a in alive and b in alive:
                deg[a] += 1
                deg[b] += 1
        drop = {n for n in alive if deg.get(n, 0) < 2}
        if not drop:
            break
        alive -= drop
        rounds += 1
    assert rounds < 24


# ------------------------------------------------------- cap / quantiles

def test_source_cap_keeps_k_per_source(ray_session):
    from graphrag_ray.queries import source_cap

    out = source_cap(SF, cap=3).to_pandas()
    sizes = out.groupby("source").size()
    assert (sizes == 3).all()          # every source has 25 docs at sf0.001
    assert out["doc_id"].is_unique


def test_doc_length_quantiles_monotone(ray_session):
    from graphrag_ray.queries import doc_length_quantiles

    out = doc_length_quantiles(SF).to_pandas().sort_values("q")
    assert list(out["q"]) == [0.25, 0.5, 0.75, 0.9, 0.99]
    assert out["value"].is_monotonic_increasing


# ----------------------------------------------- running / funnel / lpa

def test_user_running_totals_order(ray_session):
    from graphrag_ray.stages.events import user_running_totals

    ds = ray.data.from_arrow(pa.table({
        "event_id": pa.array([3, 1, 2], pa.int64()),
        "ts": pa.array([30, 10, 20], pa.timestamp("us")),
        "user_id": pa.array([5, 5, 5], pa.int64()),
        "value": pa.array([1.0, 2.0, 4.0], pa.float64()),
    }))
    out = (user_running_totals(ds).to_pandas()
           .sort_values("ts").reset_index(drop=True))
    assert list(out["running_n"]) == [1, 2, 3]
    assert list(out["running_value"]) == [2.0, 6.0, 7.0]


def test_funnel_requires_strict_order(ray_session):
    from graphrag_ray.stages.events import funnel_stages

    # user 1: full funnel; user 2: purchase BEFORE click -> stops at click
    rows = [
        (1, 10, "signup"), (1, 20, "click"), (1, 30, "purchase"),
        (2, 10, "signup"), (2, 15, "purchase"), (2, 20, "click"),
    ]
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    }))
    out = funnel_stages(ds).to_pandas()
    u1 = out[out["user_id"] == 1].sort_values("stage_idx")
    assert list(u1["stage"]) == ["signup", "click", "purchase"]
    u2 = out[out["user_id"] == 2].sort_values("stage_idx")
    assert list(u2["stage"]) == ["signup", "click"]  # no purchase after click


def test_lpa_two_cliques_converge_to_min_labels(ray_session):
    from graphrag_ray.stages import graph_analytics as ga

    # two triangles joined by nothing: labels collapse to each clique min
    ent, edg = _graph(
        [("a", "b"), ("b", "c"), ("a", "c"),
         ("x", "y"), ("y", "z"), ("x", "z")],
        ["a", "b", "c", "x", "y", "z"])
    out = ga.label_propagation(ent, edg, rounds=8).to_pandas()
    lbl = dict(zip(out["entity_id"], out["label"]))
    assert lbl["a"] == lbl["b"] == lbl["c"]
    assert lbl["x"] == lbl["y"] == lbl["z"]
    assert lbl["a"] != lbl["x"]


def test_link_prediction_non_adjacent_only(ray_session):
    from graphrag_ray.stages import graph_analytics as ga

    # path a-b-c: only candidate is (a,c) via common neighbor b (deg 2)
    ent, edg = _graph([("a", "b"), ("b", "c")], ["a", "b", "c"])
    out = ga.link_prediction(ent, edg).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert (row["src"], row["dst"], row["n_common"]) == ("a", "c", 1)
    import math
    assert row["adamic_adar"] == pytest.approx(
        round(1.0 / math.log(2), 4), abs=1e-9)


def test_top_bigrams_counts(ray_session):
    from graphrag_ray.stages.lm_score import top_bigrams

    out = top_bigrams(_docs_ds(["a b a b", "a b c"]), k=3)
    assert list(out.itertuples(index=False, name=None)) == [
        ("a", "b", 3), ("b", "a", 1), ("b", "c", 1)]


def test_events_value_quantiles_nearest_rank(ray_session):
    from graphrag_ray.stages.events import value_quantiles_by_type

    ds = ray.data.from_arrow(pa.table({
        "event_type": pa.array(["x"] * 4, pa.string()),
        "value": pa.array([4.0, 1.0, 3.0, 2.0], pa.float64()),
    }))
    out = (value_quantiles_by_type(ds).to_pandas()
           .sort_values("q").reset_index(drop=True))
    # n=4: k = ceil(4q) -> ranks 1, 2, 3, 4
    assert list(out["value"]) == [1.0, 2.0, 3.0, 4.0]


def test_ivf_cluster_sizes_total(ray_session):
    from graphrag_ray.queries import ivf_cluster_sizes

    out = ivf_cluster_sizes(SF).to_pandas()
    assert len(out) == 16
    assert out["n_vecs"].sum() == 500  # every embedding assigned once
    assert (out["n_vecs"] >= 0).all()


def test_eccentricity_path_graph(ray_session):
    from graphrag_ray.stages import graph_analytics as ga

    ent, edg = _graph([("a", "b"), ("b", "c"), ("c", "d")],
                      ["a", "b", "c", "d", "iso"])
    out = (ga.eccentricity(ent, edg).to_pandas()
           .set_index("entity_id")["eccentricity"])
    assert out["a"] == 3 and out["b"] == 2 and out["c"] == 2 and out["d"] == 3
    assert out["iso"] == 0  # isolated node


def test_bpe_token_counts_classes(ray_session):
    from graphrag_ray.stages.text_analysis import bpe_token_counts

    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array(["Hello world, 42 times!"], pa.string())})
    out = bpe_token_counts(t).to_pydict()
    # alpha: 'Hello',' world',' times'; num: ' 42'; other: ',','!'
    assert out["n_alpha_tokens"] == [3]
    assert out["n_num_tokens"] == [1]
    assert out["n_other_tokens"] == [2]
    assert out["n_bpe_tokens"] == [6]


def test_dedup_ngram_keep_covers_corpus(ray_session):
    from graphrag_ray.queries import dedup_ngram_keep, dedup_ngram_pairs

    keep = dedup_ngram_keep(SF).to_pandas()
    assert len(keep) == 500
    assert (keep["keep_id"] <= keep["doc_id"]).all()  # min-id representative
    pairs = dedup_ngram_pairs(SF).to_pandas()
    kmap = dict(zip(keep["doc_id"], keep["keep_id"]))
    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        assert kmap[a] == kmap[b]  # paired docs share a representative


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_asof_random_equivalence(ray_session, seed):
    """asof_join equals a per-row linear predecessor scan on random
    event sets (duplicate timestamps included)."""
    import random

    rng = random.Random(seed)
    def mk(n, id0):
        rows = [(id0 + i, rng.randrange(0, 50) * 1_000_000,
                 rng.randrange(0, 4)) for i in range(n)]
        return rows

    lrows, rrows = mk(40, 1000), mk(30, 2000)
    from graphrag_ray.stages.events import asof_join

    out = asof_join(ray.data.from_arrow(_events_tbl(lrows)),
                    ray.data.from_arrow(_events_tbl(rrows))).to_pandas()
    got = {r.event_id: (r.r_event_id, r.gap)
           for r in out.itertuples(index=False)}
    want = {}
    for eid, ts, uid in lrows:
        cands = [(rts, rid) for rid, rts, ruid in rrows
                 if ruid == uid and rts <= ts]
        if cands:
            best_ts = max(c[0] for c in cands)
            best_id = min(rid for rts, rid in cands if rts == best_ts)
            want[eid] = (best_id, ts - best_ts)
    assert got == want


# ------------------------------------------------- adversarial / hot keys

def test_dup_passages_universal_boilerplate(ray_session):
    """One 8-gram shared by EVERY doc (the web-boilerplate case): the
    bucket reduction stays vectorized-aggregate-shaped (no pairwise
    expansion anywhere in the passage pipeline), so output size is
    O(distinct windows), not O(docs^2)."""
    from graphrag_ray.stages import passages

    shared = "w1 w2 w3 w4 w5 w6 w7 w8"
    ds = _docs_ds([f"{shared} tail{i} x{i} y{i} z{i} q{i} r{i} s{i} t{i}"
                   for i in range(200)])
    out = passages.dup_passages(ds).to_pandas()
    row = out[out["n_docs"] == 200]
    assert len(row) == 1 and row.iloc[0]["n_occ"] == 200
    # windows containing per-doc unique tails must not appear
    assert (out["n_docs"] >= 2).all()
    counts = passages.doc_dup_passage_counts(ds).to_pandas()
    assert len(counts) == 200


def test_lm_score_hot_context_word(ray_session):
    """Every bigram shares one context word -> one bucket holds the whole
    stream; the fused train+score pass is a pandas transform (vectorized),
    and results stay exact."""
    from graphrag_ray.stages import lm_score

    import numpy as np
    texts = [f"the x{i} the y{i} the z{i}" for i in range(100)]
    # bigrams: (the, x_i), (x_i, the), ... context 'the' dominates
    out = lm_score.lm_bigram_doc_scores(_docs_ds(texts)).to_pandas()
    assert len(out) == 100
    assert (out["n_bigrams"] == 5).all()
    assert np.isfinite(out["avg_logprob"]).all()


def test_pca_top_component_recovers_dominant_axis(ray_session):
    from graphrag_ray.stages.ann import pca_top_component

    import numpy as np
    rng = np.random.RandomState(3)
    # variance overwhelmingly along axis 2
    base = rng.normal(0, 0.01, size=(200, 8)).astype(np.float32)
    base[:, 2] += rng.normal(0, 5.0, size=200).astype(np.float32)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(200), pa.int64()),
        "embedding": pa.array([r.tolist() for r in base],
                              pa.list_(pa.float32())),
    }))
    out = pca_top_component(ds).to_pandas()
    lead = out.loc[out["loading"].abs().idxmax()]
    assert lead["dim"] == 2
    assert abs(lead["loading"]) > 0.99
    assert abs((out["loading"] ** 2).sum() - 1.0) < 1e-3  # unit norm


def test_events_bursts_integer_rule(ray_session):
    from graphrag_ray.stages.events import burst_windows

    # type 'a': window 0 has 9 events, windows 1..3 have 1 each ->
    # total 12, nw 4; burst iff n*4 > 24 -> only window 0 (36 > 24)
    rows = []
    for i in range(9):
        rows.append((i, i * 60_000_000, 0, "a"))
    for w in (1, 2, 3):
        rows.append((100 + w, w * 21_600_000_000 + 5, 0, "a"))
    ds = ray.data.from_arrow(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
    }))
    out = burst_windows(ds).to_pandas().sort_values("window_id")
    assert list(out["is_burst"]) == [1, 0, 0, 0]


def test_curation_pipeline_composition(ray_session):
    from graphrag_ray.queries import (curation_pipeline, dedup_ngram_keep,
                                      doc_filter_verdict)

    out = curation_pipeline(SF).to_pandas()
    verdict = doc_filter_verdict(SF).to_pandas()
    keep = dedup_ngram_keep(SF).to_pandas()
    ok = set(verdict[verdict["keep"]]["doc_id"])
    reps = set(keep[keep["keep_id"] == keep["doc_id"]]["doc_id"])
    assert set(out["doc_id"]) == ok & reps
    assert set(out["split"]) <= {"train", "valid", "test"}


def test_retention_cohorts_semantics(ray_session):
    from graphrag_ray.stages.events import WEEK_US, retention_cohorts

    # user 1: weeks 0,1,3 ; user 2: weeks 1,1 (dup) -> cohort 1, offset 0
    rows = [(1, 0), (1, 1), (1, 3), (2, 1), (2, 1)]
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] * WEEK_US + 5 for r in rows],
                       pa.timestamp("us")),
    }))
    out = retention_cohorts(ds).to_pandas()
    got = {(r.cohort_week, r.week_offset): r.n_users
           for r in out.itertuples(index=False)}
    assert got == {(0, 0): 1, (0, 1): 1, (0, 3): 1, (1, 0): 1}
