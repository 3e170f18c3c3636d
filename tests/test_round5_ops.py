"""Round-5 operator tests: the re-keyed bigram-LM scorer (broadcast and
shuffle-join paths), vectorized emitters (bit-identity vs the scalar
reference), input-derived bucket counts, the staged-min funnel, and the
ADVICE-item guards (k-core shared bound, -inf NN rows, empty-corpus
quantiles).

The hard correctness gate for each surface is its DuckDB oracle
(tools/check_correctness.py); these tests pin operator-level semantics on
small hand-built inputs so failures localize."""

import hashlib
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray


def _docs_ds(texts):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
          "theta", "iota", "kappa", "naïve", "café"]


def _random_texts(n, seed=5, lo=0, hi=40):
    rng = np.random.default_rng(seed)
    return [" ".join(rng.choice(_WORDS, size=rng.integers(lo, hi)))
            for _ in range(n)]


# ------------------------------------------------------------ lm_score r5

def test_bigram_emitter_matches_counter_reference(ray_session):
    """The factorize+groupby emitter is bit-identical to the per-doc
    Counter loop it replaced."""
    from graphrag_ray.stages.lm_score import bigram_occ_rows

    texts = _random_texts(30) + ["", "solo", "a b"]
    batch = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())})
    got = (bigram_occ_rows(batch).to_pandas()
           .sort_values(["doc_id", "w1", "w2"]).reset_index(drop=True))
    rows = []
    for doc_id, text in enumerate(texts):
        toks = text.split()
        for (w1, w2), n in sorted(Counter(zip(toks, toks[1:])).items()):
            rows.append((doc_id, w1, w2, n))
    exp = pd.DataFrame(rows, columns=["doc_id", "w1", "w2", "n_occ"])
    exp = exp.sort_values(["doc_id", "w1", "w2"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_lm_score_join_path_equals_broadcast_path(ray_session):
    """Forcing broadcast_limit=0 exercises the Dataset.join scale path;
    both paths must agree to the last rounded digit."""
    from graphrag_ray.stages.lm_score import lm_bigram_doc_scores

    ds = _docs_ds(_random_texts(40, seed=9, lo=2, hi=25))
    a = (lm_bigram_doc_scores(ds).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (lm_bigram_doc_scores(ds, broadcast_limit=0, num_partitions=4)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 40


# ------------------------------------------------------------ passages r5

def test_passage_rows_bit_identical_to_join_reference(ray_session):
    """The byte-offset window fingerprint equals the per-window
    ' '.join(...).encode() md5 — including non-ASCII tokens and messy
    whitespace (which normalization must collapse)."""
    from graphrag_ray.stages.passages import passage_rows

    texts = _random_texts(20, seed=3, lo=0, hi=30)
    texts += ["  naïve   café  " + " ".join(_WORDS),  # non-ASCII + runs
              "\t".join(_WORDS[:9]), ""]
    batch = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())})
    width, nb = 8, 7
    got = (passage_rows(batch, width, nb).to_pandas()
           .sort_values(["doc_id", "pos"]).reset_index(drop=True))
    rows = []
    for doc_id, text in enumerate(texts):
        toks = text.split()
        for i in range(len(toks) - width + 1):
            h = hashlib.md5(" ".join(toks[i:i + width]).encode()).hexdigest()
            rows.append((int(h[:8], 16) % nb, h, doc_id, i))
    exp = pd.DataFrame(rows, columns=["bucket", "phash", "doc_id", "pos"])
    exp = exp.sort_values(["doc_id", "pos"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_dup_passages_invariant_to_bucket_count(ray_session):
    """The bucket count is a pure parallelism knob: results match across
    counts (and the derived default)."""
    from graphrag_ray.stages import passages

    base = " ".join(_WORDS[:10])
    ds = _docs_ds([base + " tail one", base + " tail two",
                   "unrelated " + " ".join(reversed(_WORDS))])
    outs = []
    for b in (1, 5, None):  # None -> derived_buckets
        outs.append(passages.dup_passages(ds, num_buckets=b).to_pandas()
                    .sort_values("phash").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])
    assert (outs[0]["n_docs"] >= 2).all()


def test_derived_buckets_scale_with_input(ray_session):
    from graphrag_ray.stages import passages, events

    small = _docs_ds(["x"] * 10)
    assert passages.derived_buckets(small) == passages.NUM_BUCKETS
    assert passages.derived_buckets(small, floor=1, docs_per_bucket=2) == 6
    ev = ray.data.range(1000)
    assert events.derived_buckets(ev) == events.NUM_BUCKETS
    assert events.derived_buckets(ev, floor=1, rows_per_bucket=100) == 11
    big = ray.data.range(10_000_000)
    assert events.derived_buckets(big) > events.NUM_BUCKETS


# -------------------------------------------------------------- funnel r5

def _funnel_events(rng, n_users=40, n_events=400):
    types = ["signup", "click", "purchase", "view"]
    return pa.table({
        "event_id": pa.array(range(n_events), pa.int64()),
        "ts": pa.array(rng.integers(0, 10_000, n_events),
                       pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n_events), pa.int64()),
        "event_type": pa.array(rng.choice(types, n_events), pa.string()),
    })


def test_funnel_staged_min_equals_bruteforce(ray_session):
    """The vectorized staged groupby-min funnel equals the per-user
    sequential scan on random event logs (hot user included)."""
    from graphrag_ray.stages.events import funnel_stages

    rng = np.random.default_rng(11)
    tbl = _funnel_events(rng)
    # make user 0 hot: 200 extra events
    hot = _funnel_events(rng, n_users=1, n_events=200)
    tbl = pa.concat_tables([tbl, hot])
    stages = ("signup", "click", "purchase")
    got = (funnel_stages(ray.data.from_arrow(tbl), stages).to_pandas()
           .sort_values(["user_id", "stage_idx"]).reset_index(drop=True))

    df = tbl.to_pandas()
    df["ts"] = df["ts"].astype("int64")
    rows = []
    for user, g in df.groupby("user_id"):
        prev = None
        for idx, st in enumerate(stages):
            sel = g[g["event_type"] == st]
            if prev is not None:
                sel = sel[sel["ts"] > prev]
            if sel.empty:
                break
            first = int(sel["ts"].min())
            rows.append((int(user), idx, st, first))
            prev = first
    exp = (pd.DataFrame(rows,
                        columns=["user_id", "stage_idx", "stage", "first_ts"])
           .sort_values(["user_id", "stage_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


# -------------------------------------------------------- ADVICE guards r5

def test_kcore_raises_past_shared_bound(ray_session):
    """A long path graph peels only two endpoints per round; needing more
    rounds than the shared Python/SQL bound must fail loudly, not
    silently diverge from the unrolled oracle."""
    from graphrag_ray.stages.graph_analytics import (
        KCORE_MAX_ROUNDS, kcore)

    n = 2 * KCORE_MAX_ROUNDS + 12
    ents = ray.data.from_arrow(pa.table(
        {"canonical_id": pa.array(range(n), pa.int64())}))
    edges = ray.data.from_arrow(pa.table({
        "src": pa.array(range(n - 1), pa.int64()),
        "dst": pa.array(range(1, n), pa.int64()),
    }))
    with pytest.raises((RuntimeError, ray.exceptions.RayTaskError)):
        kcore(ents, edges, k=2).to_pandas()
    # and a graph that converges inside the bound still works
    tri = ray.data.from_arrow(pa.table({
        "src": pa.array([0, 1, 2], pa.int64()),
        "dst": pa.array([1, 2, 0], pa.int64()),
    }))
    ents3 = ray.data.from_arrow(pa.table(
        {"canonical_id": pa.array([0, 1, 2], pa.int64())}))
    out = kcore(ents3, tri, k=2).to_pandas()
    assert len(out) == 3 and (out["core_degree"] == 2).all()


def test_single_vector_mutual_knn_emits_nothing(ray_session):
    """A single-row self block used to emit a (v, v, -inf) row; the -inf
    mask drops it at the source."""
    from graphrag_ray.stages import ann

    blk = pa.table({
        "vec_id": pa.array([7], pa.int64()),
        "embedding": pa.array([[1.0, 0.0, 0.0]], pa.list_(pa.float32())),
    })
    ref = ray.put(blk)
    fn = ann.make_block_pair_nn_fn([ref])
    out = fn(pa.table({"i": pa.array([0]), "j": pa.array([0])}))
    assert out.num_rows == 0


# ------------------------------------------- delta-bounded incremental r5

def test_incremental_skips_untouched_buckets(ray_session):
    """Poison-row proof that the delta-bounded incremental path does NOT
    recompute canonicalization buckets untouched by the new docs: a
    poisoned mention_count in a clean bucket must SURVIVE the update
    (pass-through), while a poisoned row in a dirty bucket must be
    REPLACED by the refresh."""
    import pyarrow.compute as pc
    import ray.data as rd

    from graphrag_ray.config import PipelineConfig
    from graphrag_ray.pipelines.incremental import (canonical_full_for,
                                                    dirty_buckets_for,
                                                    entity_key_bloom,
                                                    extraction_for_docs,
                                                    incremental_update)
    from graphrag_ray.state.propagation import bucket_of
    from graphrag_ray.synth import synth_documents_table

    cfg = PipelineConfig(chunk_size=512, chunk_overlap=100)
    all_docs = synth_documents_table(40)
    docs_a = rd.from_arrow(all_docs.slice(0, 30))
    docs_b = rd.from_arrow(all_docs.slice(30, 10))

    prev_ex = extraction_for_docs(docs_a, cfg).materialize()
    prev_canonical = canonical_full_for(prev_ex, cfg)
    new_ex = extraction_for_docs(docs_b, cfg).materialize()
    dirty, _ = dirty_buckets_for(new_ex)
    assert 0 < len(dirty) < 64  # genuinely selective on this corpus

    tbl = prev_canonical.to_arrow_refs()
    tbl = pa.concat_tables([t for t in ray.get(tbl)])
    buckets = np.array([bucket_of(t, n) for t, n in
                        zip(tbl.column("entity_type").to_pylist(),
                            tbl.column("canonical_name").to_pylist())])
    dirty_set = set(dirty)
    clean_mask = np.array([b not in dirty_set for b in buckets])
    assert clean_mask.any() and (~clean_mask).any()
    POISON = 987_654
    mc = tbl.column("mention_count").to_numpy(zero_copy_only=False).copy()
    clean_victim = tbl.column("canonical_id").to_pylist()[
        int(np.flatnonzero(clean_mask)[0])]
    dirty_victim = tbl.column("canonical_id").to_pylist()[
        int(np.flatnonzero(~clean_mask)[0])]
    mc[int(np.flatnonzero(clean_mask)[0])] = POISON
    mc[int(np.flatnonzero(~clean_mask)[0])] = POISON
    poisoned = tbl.set_column(
        tbl.schema.get_field_index("mention_count"), "mention_count",
        pa.array(mc, tbl.column("mention_count").type))

    bloom = entity_key_bloom(prev_ex)
    res = incremental_update(prev_ex, docs_b, cfg,
                             previous_canonical_full=rd.from_arrow(poisoned),
                             previous_bloom=bloom)
    ents = res.entities.to_pandas().set_index("canonical_id")
    # clean bucket: poison survives => that bucket was NOT recomputed
    assert ents.loc[clean_victim, "mention_count"] == POISON
    # dirty bucket: poison replaced => that bucket WAS recomputed
    assert ents.loc[dirty_victim, "mention_count"] != POISON
    # bloom-gated delta report is wired through
    assert res.report["dirty_buckets"] == len(dirty)
    assert res.report["approach"] == "ray-data-incremental-delta"
    assert res.report.get("modified_keys", 0) + \
        res.report.get("added_keys", 0) > 0


def test_lance_native_roundtrip(ray_session, tmp_path):
    """S5 native-format proof: skips where the lance package is absent
    (this sandbox), passes unchanged the day the environment provides it
    — write_vector_store must then pick the REAL lance branch and
    read_vector_store must come back through ray.data.read_lance."""
    pytest.importorskip("lance")
    from graphrag_ray.sources.lance_store import (read_vector_store,
                                                  store_meta,
                                                  write_vector_store)

    ds = ray.data.from_items(
        [{"id": i, "vector": [float(i), 1.0, 2.0]} for i in range(32)])
    path = str(tmp_path / "native_vs")
    fmt = write_vector_store(ds, path, meta={"dim": 3})
    assert fmt == "lance"
    assert store_meta(path)["format"] == "lance"
    back = read_vector_store(path)
    assert back.count() == 32
    assert sorted(r["id"] for r in back.take_all()) == list(range(32))


def test_doc_length_quantiles_empty_corpus(ray_session, tmp_path):
    from graphrag_ray import queries as q

    empty = pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
        "lang": pa.array([], pa.string()),
        "source": pa.array([], pa.string()),
        "n_chars": pa.array([], pa.int64()),
    })
    pq.write_table(empty, str(tmp_path / "documents.parquet"))
    out = q.doc_length_quantiles(str(tmp_path))
    assert out.num_rows == 0
    assert out.column_names == ["q", "value"]


# ------------------------------------------- no-fixed-B join/dedup (r5)


def test_derived_join_buckets_from_parquet_footers(tmp_path):
    """Bucket count reads parquet FOOTERS only and scales with row count."""
    from graphrag_ray.stages.joins import derived_join_buckets

    small = pa.table({"k": pa.array(range(100), pa.int64())})
    big = pa.table({"k": pa.array(range(5000), pa.int64())})
    pq.write_table(small, str(tmp_path / "a.parquet"))
    pq.write_table(big, str(tmp_path / "b.parquet"))
    d = str(tmp_path)
    assert derived_join_buckets(d, "a") == 32  # floor
    assert derived_join_buckets(d, "a", "b", rows_per_bucket=1000) == 32
    assert derived_join_buckets(d, "a", "b", floor=1,
                                rows_per_bucket=1000) == 6
    # monotone in the input: more tables -> never fewer buckets
    assert (derived_join_buckets(d, "a", "b", floor=1, rows_per_bucket=50)
            >= derived_join_buckets(d, "b", floor=1, rows_per_bucket=50))


def test_dedup_exact_native_aggregate(ray_session, tmp_path):
    """groupby(fp).Min/Sum finalize equals the brute-force expectation:
    keep = min doc_id per normalized text, n_docs = multiplicity."""
    from graphrag_ray import queries as q

    texts = ["Same Doc  body", "same doc body", "unique one",
             "same doc body", "Unique  TWO"]
    tbl = pa.table({
        "doc_id": pa.array([10, 3, 7, 5, 2], pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = q.dedup_exact(str(tmp_path)).to_pandas()
    assert out.columns.tolist() == ["fp", "keep_doc_id", "n_docs"]
    dup = out[out["n_docs"] == 3]
    assert len(dup) == 1 and dup["keep_doc_id"].iloc[0] == 3
    singles = out[out["n_docs"] == 1]
    assert sorted(singles["keep_doc_id"]) == [2, 7]


def test_minhash_pair_set_invariant_to_bucket_count():
    """The LSH bucket is a pure co-location knob: the candidate pair SET
    from per-bucket expansion is identical for any B (a band hash's rows
    always share a bucket)."""
    from functools import partial as _partial

    from graphrag_ray.stages import dedup

    base = " ".join(_WORDS * 3)
    docs = pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array([base, base + " x", base + " y",
                          "other words entirely here now",
                          "other words entirely here now",
                          " ".join(reversed(_WORDS))], pa.string()),
    })

    def pair_set(nb):
        rows = dedup.minhash_band_rows(docs, num_buckets=nb).to_pandas()
        pairs = set()
        for _, grp in rows.groupby("bucket"):
            out = dedup.candidate_pairs_from_bands(
                pa.Table.from_pandas(grp, preserve_index=False))
            for a, b, kind in zip(out.column("doc_a").to_pylist(),
                                  out.column("doc_b").to_pylist(),
                                  out.column("kind").to_pylist()):
                if kind == "pair":
                    pairs.add((a, b))
        return pairs

    sets = [pair_set(nb) for nb in (1, 7, 64, 997)]
    assert sets[0] and all(s == sets[0] for s in sets[1:])


def test_ngram_pair_partials_invariant_to_bucket_count():
    """Summed per-pair intersection partials are identical for any shingle
    bucket count (a shingle's postings always share a bucket)."""
    from collections import defaultdict

    from graphrag_ray.stages import dedup

    base = " ".join(_WORDS * 2)
    docs = pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array([base, base + " tail", "totally different words "
                          "with no overlap at all", base], pa.string()),
    })

    def summed(nb):
        rows = dedup.ngram_shingle_rows(docs, num_buckets=nb).to_pandas()
        acc = defaultdict(int)
        sizes = {}
        for _, grp in rows.groupby("bucket"):
            out = dedup.ngram_pairs_from_bucket(
                pa.Table.from_pandas(grp, preserve_index=False)).to_pandas()
            out = out[out["kind"] == "pair"]
            for r in out.itertuples():
                acc[(r.doc_a, r.doc_b)] += r.inter
                sizes[(r.doc_a, r.doc_b)] = (r.n_a, r.n_b)
        return dict(acc), sizes

    a1, s1 = summed(1)
    a2, s2 = summed(64)
    a3, s3 = summed(509)
    assert a1 and a1 == a2 == a3 and s1 == s2 == s3


def test_cooccur_edges_invariant_to_bucket_count(ray_session):
    """doc_cooccurrence_edges' bucket is a pure co-location knob: a doc's
    entity rows always land in one bucket, so the summed edge table is
    identical for any B (callers derive B from the doc footer count)."""
    from graphrag_ray.stages import graph_analytics as ga

    rows = []
    for d in range(9):
        for e in range(2 + d % 3):
            rows.append((f"doc{d}", f"ent{(d + e) % 5}"))
    ds = ray.data.from_arrow(pa.table({
        "row_kind": pa.array(["entity"] * len(rows), pa.string()),
        "doc_id": pa.array([r[0] for r in rows], pa.string()),
        "entity_id": pa.array([r[1] for r in rows], pa.string()),
    }))

    def edge_map(nb):
        out = ga.doc_cooccurrence_edges(ds, num_buckets=nb).to_pandas()
        return {(r.src, r.dst): r.n_docs for r in out.itertuples()}

    maps = [edge_map(nb) for nb in (1, 3, 64)]
    assert maps[0] and all(m == maps[0] for m in maps[1:])


def test_source_cap_local_thin_invariance():
    """The per-batch top-cap combiner never changes the final per-source
    kept set, including when a hot source's rows straddle many batches."""
    from graphrag_ray.stages import curation

    rows = [(d, "hot") for d in range(200)] + \
           [(1000 + d, f"s{d % 7}") for d in range(70)]
    df = pd.DataFrame({"doc_id": [r[0] for r in rows],
                       "source": [r[1] for r in rows]})
    cap = 5
    final = curation.make_source_cap_fn(cap)
    thin = curation.make_source_cap_thin_fn(cap)

    def kept(frames):
        parts = pd.concat(frames, ignore_index=True)
        out = pd.concat([final(g) for _, g in parts.groupby("source")],
                        ignore_index=True)
        return set(map(tuple, out[["doc_id", "source"]].itertuples(index=False)))

    direct = kept([df])
    # shatter into 13 batches, thin each, then finalize
    batches = [thin(df.iloc[i::13]) for i in range(13)]
    assert all(len(b[b["source"] == "hot"]) <= cap for b in batches)
    assert kept(batches) == direct


def test_shard_assignment_shape_and_determinism(ray_session, tmp_path):
    """Shard count derives from the corpus, positions are a 1..n_shard
    permutation, and the assignment is invariant to input partitioning."""
    from graphrag_ray import queries as q
    from graphrag_ray.stages.curation import derived_shard_count

    n = 300
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(["x"] * n, pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = q.doc_shard_assignment(str(tmp_path)).to_pandas()
    assert len(out) == n
    ns = derived_shard_count(n)
    assert ns == 4 and set(out["shard"]) <= set(range(ns))
    for _, grp in out.groupby("shard"):
        assert sorted(grp["pos"]) == list(range(1, len(grp) + 1))
    # scale the formula: 10x docs -> ~10x shards at the same shard size
    assert derived_shard_count(1_000_000) == 977
    # determinism: assignment is a pure function of doc_id
    out2 = q.doc_shard_assignment(str(tmp_path)).to_pandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_shard_packing_contract(ray_session, tmp_path):
    """cum_before is the running token sum in (shard, pos) order and
    seq_idx chops it every seqlen tokens; packing is consistent with
    doc_shard_assignment's order."""
    from graphrag_ray import queries as q

    n = 120
    texts = [" ".join(["w"] * (5 + (d * 7) % 23)) for d in range(n)]
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = (q.shard_packing(str(tmp_path), seqlen=64)
           .to_pandas().sort_values(["shard", "pos"]).reset_index(drop=True))
    assert len(out) == n
    for _, grp in out.groupby("shard"):
        cum = 0
        for r in grp.itertuples():
            assert r.cum_before == cum
            assert r.seq_idx == cum // 64
            cum += r.n_tokens
    # same shard/pos as the assignment surface
    asg = (q.doc_shard_assignment(str(tmp_path))
           .to_pandas().sort_values(["shard", "pos"]).reset_index(drop=True))
    assert (out[["doc_id", "shard", "pos"]].values ==
            asg[["doc_id", "shard", "pos"]].values).all()


def test_shard_pack_property_invariants():
    """Property test (no Ray): for arbitrary doc_id sets and token
    counts, the per-shard finalize emits a 1..k pos permutation, a
    consistent running sum, and is invariant to input row order and to
    batch shattering of the partial stage."""
    from hypothesis import given, settings, strategies as st

    from graphrag_ray.stages import curation

    @settings(max_examples=40, deadline=None)
    @given(st.sets(st.integers(min_value=0, max_value=2**40),
                   min_size=1, max_size=80).flatmap(
               lambda ids: st.tuples(
                   st.just(sorted(ids)),
                   st.lists(st.integers(min_value=0, max_value=50),
                            min_size=len(ids), max_size=len(ids)))))
    def check(case):
        ids, ntoks = case
        texts = [" ".join(["t"] * k) for k in ntoks]
        tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                        "text": pa.array(texts, pa.string())})
        ns = curation.derived_shard_count(len(ids))
        part = curation.make_shard_pack_partial_fn(ns)
        pack = curation.make_shard_pack_fn(16)

        def run(table, n_batches):
            import pandas as _pd
            rows = [part(table.slice(i, 1) if n_batches else table)
                    for i in (range(table.num_rows) if n_batches else [0])]
            allrows = pa.concat_tables(rows)
            df = allrows.to_pandas()
            outs = [pack(pa.Table.from_pandas(g, preserve_index=False))
                    for _, g in df.groupby("shard")]
            out = pa.concat_tables(outs).to_pandas()
            return out.sort_values("doc_id").reset_index(drop=True)

        whole = run(tbl, 0)
        shattered = run(tbl, 1)
        assert whole.equals(shattered)
        for _, grp in whole.groupby("shard"):
            g = grp.sort_values("pos")
            assert list(g["pos"]) == list(range(1, len(g) + 1))
            cum = 0
            for r in g.itertuples():
                assert r.cum_before == cum and r.seq_idx == cum // 16
                cum += r.n_tokens

    check()


def test_lm_quality_buckets_terciles(ray_session, tmp_path):
    """Bucket sizes follow the nearest-rank tercile contract and head
    holds the best-scored docs."""
    from graphrag_ray import queries as q

    # 9 docs with clearly separated LM quality: repeated common bigrams
    # score high, unique-word soup scores low
    texts = (["common phrase common phrase common phrase"] * 3
             + ["common phrase mixed words here common phrase"] * 3
             + [f"unique{i} soup{i} words{i} nothing{i} shared{i}"
                for i in range(3)])
    tbl = pa.table({
        "doc_id": pa.array(range(9), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = q.lm_quality_buckets(str(tmp_path)).to_pandas()
    assert len(out) == 9
    sizes = out["bucket"].value_counts()
    assert sizes.get("tail", 0) == 3
    # head scores strictly dominate tail scores
    assert (out.loc[out["bucket"] == "head", "score_e4"].min()
            > out.loc[out["bucket"] == "tail", "score_e4"].max())
    # the unique-soup docs are the tail
    assert set(out.loc[out["bucket"] == "tail", "doc_id"]) == {6, 7, 8}


# ------------------------------------------------------ gopher quality r5

def test_gopher_stats_matches_sql_twin_on_adversarial_corpus(ray_session):
    """Line-shape rules (bullets, ellipsis line-ends, '#'/'...' symbols,
    alpha-word fraction) never fire on the synthetic driver corpus, so the
    SQL-twin equivalence is pinned here on a corpus built to cross every
    threshold from both sides — including exact-boundary docs."""
    import duckdb

    from graphrag_ray.curation_oracle import gopher_quality_sql
    from graphrag_ray.stages.text_analysis import gopher_stats

    good = " ".join(["the have with that"] * 15)  # 60 words, stopword-rich
    texts = [
        good,                                     # passes every rule
        "short doc",                              # < 50 words
        " ".join(["the"] * 50),                   # boundary: exactly 50 words
        good + " ####### " + "#" * 20,            # symbol ratio >= 0.1
        "\n".join(["- bullet line"] * 9 + ["plain"]),   # 90% bullets
        "\n".join(["- b"] * 8 + ["x", "y"]),      # 80% bullets: line rule ok
        "\n".join([good, "trailing dots ...", "more ...\t", "end"]),
        " ".join(["12345"] * 60),                 # alpha fraction 0
        good + " " + " ".join(["9"] * 20),        # alpha fraction 0.75
        "• unicode bullet\n\t* tab-indented star\n ... leading ellipsis",
        "",                                       # empty doc
        "ab " * 60,                               # mean word len 2 (< 3)
        " ".join(["abcdefghijklmnop"] * 60),      # mean word len 16 (> 10)
        good.upper(),                             # stopwords match lowercased
    ]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    got = gopher_stats(tbl).to_pandas().sort_values("doc_id").reset_index(drop=True)

    con = duckdb.connect()
    con.register("documents", tbl)
    want = (con.execute(gopher_quality_sql()).df()
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want[got.columns.tolist()],
                                  check_dtype=False)

    keep = dict(zip(got["doc_id"], got["keep"]))
    assert keep[0] and keep[2] and keep[13]
    assert not any(keep[i] for i in (1, 3, 4, 5, 7, 8, 10, 11, 12))
    # doc 5 dies on word count, NOT on its 80%-bullet lines (rule passes)
    row5 = got[got["doc_id"] == 5].iloc[0]
    assert 10 * row5["n_bullet_lines"] < 9 * row5["n_lines"]
    # the ellipsis-line and bullet signals actually fired somewhere
    assert got["n_ellipsis_lines"].sum() >= 2
    assert got["n_bullet_lines"].sum() >= 18
    assert got["n_symbols"].max() >= 20


# ------------------------------------------------- source mixing r5

def test_source_mix_weights_flattens_skew(ray_session, tmp_path):
    """alpha=0.3 temperature mixing: uniform counts stay uniform; a
    skewed corpus is flattened (rare source's weight > its raw share,
    dominant source's weight < its raw share); weights sum to ~1."""
    from graphrag_ray.queries import source_mix_weights

    docs = pa.table({
        "doc_id": pa.array(range(110), pa.int64()),
        "text": pa.array(["x"] * 110, pa.string()),
        "lang": pa.array(["en"] * 110, pa.string()),
        "source": pa.array(["big"] * 100 + ["rare"] * 10, pa.string()),
    })
    pq.write_table(docs, tmp_path / "documents.parquet")
    out = source_mix_weights(str(tmp_path)).to_pandas().set_index("source")
    assert abs(out["weight"].sum() - 1.0) < 1e-5
    assert out.loc["rare", "weight"] > 10 / 110   # boosted above raw share
    assert out.loc["big", "weight"] < 100 / 110   # damped below raw share
    # alpha=1 degenerates to raw proportions
    raw = source_mix_weights(str(tmp_path), alpha=1.0).to_pandas()
    got = dict(zip(raw["source"], raw["weight"]))
    assert abs(got["big"] - round(100 / 110, 6)) < 1e-6
    assert abs(got["rare"] - round(10 / 110, 6)) < 1e-6


# ------------------------------------------- top-N-per-group window r5

def test_top_orders_partial_topk_is_batching_invariant(ray_session, tmp_path):
    """The per-batch top-k combiner is a min-k semilattice: the final
    result is identical whether the orders arrive as one block or many,
    and equals the brute-force window computed in pandas."""
    from graphrag_ray.queries import top_orders_per_customer

    rng = np.random.default_rng(7)
    n = 300
    tbl = pa.table({
        "o_custkey": pa.array(rng.integers(0, 25, n), pa.int64()),
        "o_orderkey": pa.array(rng.permutation(n), pa.int64()),
        "o_totalprice": pa.array(
            np.rint(rng.uniform(10, 1000, n) * 100) / 100, pa.float64()),
    })
    df = tbl.to_pandas()
    df["rnk"] = (df.sort_values(["o_totalprice", "o_orderkey"],
                                ascending=[False, True])
                 .groupby("o_custkey").cumcount() + 1)
    exp = (df[df["rnk"] <= 3]
           .assign(price_cents=lambda x:
                   np.rint(x["o_totalprice"] * 100).astype(np.int64))
           .rename(columns={"rnk": "rn"})
           [["o_custkey", "rn", "o_orderkey", "price_cents"]]
           .sort_values(["o_custkey", "rn"]).reset_index(drop=True))
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(tbl, sf / "orders.parquet")
    got = (top_orders_per_customer(str(sf)).to_pandas()
           .sort_values(["o_custkey", "rn"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    # batching invariance: many small input files force many small
    # batches through the combiner; result must not change
    whole = got
    sf2 = tmp_path / "sf2"
    sf2.mkdir()
    (sf2 / "orders.parquet").mkdir()
    for i in range(0, n, 20):
        pq.write_table(tbl.slice(i, 20),
                       sf2 / "orders.parquet" / f"part_{i:04d}.parquet")
    sliced = top_orders_per_customer(str(sf2)).to_pandas()
    key = ["o_custkey", "rn"]
    pd.testing.assert_frame_equal(
        whole.sort_values(key).reset_index(drop=True),
        sliced.sort_values(key).reset_index(drop=True))


# --------------------------------------------------- novelty counts r5

def test_novel_window_counts_invariants(ray_session):
    """Sum of per-doc novel windows == corpus distinct fingerprints, the
    result is bucket-count invariant, and a doc that is a pure copy of an
    earlier doc contributes zero novel windows."""
    from graphrag_ray.stages import passages

    base = " ".join(_WORDS[:10])          # 10 tokens -> 3 windows at W=8
    fresh = "one two three four five six seven eight nine ten eleven"
    ds = _docs_ds([base, base, fresh])    # doc 1 is a verbatim copy
    outs = []
    for b in (1, 5, None):
        out = (passages.doc_novel_window_counts(ds, num_buckets=b)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])
    got = dict(zip(outs[0]["doc_id"], outs[0]["n_novel_windows"]))
    assert 1 not in got                   # the copy: zero novel windows
    assert got[0] == 3 and got[2] == 4
    rows = passages.passage_rows(
        pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": pa.array([base, base, fresh], pa.string())}),
        passages.WIDTH, 1)
    n_distinct = len(set(rows.column("phash").to_pylist()))
    assert outs[0]["n_novel_windows"].sum() == n_distinct


def test_passage_scrub_removes_covered_tokens_only(ray_session):
    """Verbatim-copied docs scrub to empty; a doc sharing only its head
    8 tokens loses exactly those; short docs (< 8 tokens) and unique
    docs pass through untouched."""
    from graphrag_ray.stages import passages

    shared = " ".join(_WORDS[:8])          # exactly one window wide
    texts = [shared,                        # doc 0: fully covered
             shared,                        # doc 1: verbatim copy
             shared + " unique tail here",  # doc 2: head covered only
             "tiny doc",                    # doc 3: < 8 tokens, no windows
             "totally different words " + " ".join(reversed(_WORDS[:8]))]
    ds = _docs_ds(texts)
    out = (passages.doc_passage_scrub(ds).to_pandas()
           .set_index("doc_id").sort_index())
    assert out.loc[0, "clean_text"] == "" and out.loc[0, "n_tokens_removed"] == 8
    assert out.loc[1, "clean_text"] == ""
    # doc 2: windows start at 0..3, all containing the shared head plus
    # tail tokens — only windows present in ANOTHER doc count, i.e. the
    # pos-0 window alone, covering tokens 0..7
    assert out.loc[2, "clean_text"] == "unique tail here"
    assert out.loc[2, "n_tokens_kept"] == 3
    assert out.loc[3, "clean_text"] == "tiny doc"
    assert out.loc[3, "n_tokens_removed"] == 0
    assert out.loc[4, "n_tokens_removed"] == 0

    # all-unique corpus: the dup-occurrence side is EMPTY (no schema for
    # the join) — the passthrough path must keep every doc intact
    clean = (passages.doc_passage_scrub(
                 _docs_ds(["one two three four five six seven eight nine",
                           "a b"])).to_pandas().set_index("doc_id"))
    assert (clean["n_tokens_removed"] == 0).all() and len(clean) == 2
    assert clean.loc[0, "n_tokens_kept"] == 9


def test_part_type_counts_join_path_equals_broadcast(ray_session):
    """Forcing broadcast_limit=0 exercises the Dataset.join scale path
    for the dimension; both strategies must agree exactly."""
    from graphrag_ray.queries import part_type_supplier_counts

    sf = "/root/testdata/sf0.001"
    a = (part_type_supplier_counts(sf).to_pandas()
         .sort_values("p_type").reset_index(drop=True))
    b = (part_type_supplier_counts(sf, broadcast_limit=0).to_pandas()
         .sort_values("p_type").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert (a["n_suppliers"] > 0).all() and len(a) > 0


# ----------------------------------------------------- winnowing r5

def test_winnowing_coverage_guarantee_and_density(ray_session):
    """Schleimer's theorem: two docs sharing a run of >= W + w - 1
    tokens (= 11 here) share at least one selected fingerprint; docs
    with < w k-grams select nothing; selection density is well below 1
    on random text; a brute-force per-window argmin agrees exactly."""
    from graphrag_ray.stages.passages import winnow_rows, WIDTH, WINNOW

    rng = np.random.default_rng(21)
    shared = " ".join(rng.choice(_WORDS, 11))         # W + w - 1 tokens
    texts = [("head junk " * 3) + shared + " tail one two",
             shared + " totally different ending words",
             " ".join(_WORDS[:9]),                    # 2 k-grams < w: none
             " ".join(rng.choice(_WORDS, 120))]
    batch = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())})
    out = winnow_rows(batch).to_pandas()

    fp = {d: set(g["phash"]) for d, g in out.groupby("doc_id")}
    assert fp[0] & fp[1]                  # coverage guarantee
    assert 2 not in fp                    # too short: no full window
    n_kgrams = 120 - WIDTH + 1
    assert len(out[out["doc_id"] == 3]) < n_kgrams / 2  # sparse sketch

    # brute force replay on doc 3
    toks = texts[3].split()
    hs = [hashlib.md5(" ".join(toks[i:i + WIDTH]).encode()).hexdigest()
          for i in range(n_kgrams)]
    sel = set()
    for i in range(n_kgrams - WINNOW + 1):
        win = hs[i:i + WINNOW]
        m = min(win)
        sel.add(i + max(j for j, x in enumerate(win) if x == m))
    exp = {(p, hs[p]) for p in sel}
    got = {(r.pos, r.phash) for r in
           out[out["doc_id"] == 3].itertuples()}
    assert got == exp


def test_winnow_pairs_boilerplate_cut_bounds_hot_fingerprints(ray_session,
                                                              tmp_path):
    """A fingerprint present in > max_df docs (universal boilerplate) is
    excluded, so it creates NO pairs — the MOSS common-code-elimination
    step that also bounds every per-fingerprint fan-out; genuinely
    similar doc pairs below the cut still pair up."""
    from graphrag_ray.queries import winnow_dup_pairs

    rng = np.random.default_rng(33)
    boiler = " ".join(rng.choice(_WORDS, 15))     # hot: in all 30 docs
    pairtxt = " ".join(rng.choice(_WORDS, 40))
    texts = [boiler + " " + " ".join(rng.choice(_WORDS, 30))
             for _ in range(30)]
    texts += [pairtxt + " ending alpha", pairtxt + " ending beta"]
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts)), 
        "source": pa.array(["s"] * len(texts)),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")
    out = winnow_dup_pairs(str(tmp_path), max_df=10).to_pandas()
    # the 30 boilerplate docs share ONLY >max_df fingerprints: no pair
    # among them may survive; the engineered pair (30, 31) must
    assert ((out["doc_a"] == 30) & (out["doc_b"] == 31)).any()
    boiler_pairs = out[(out["doc_a"] < 30) & (out["doc_b"] < 30)]
    assert len(boiler_pairs) == 0
