"""Hot-group salt-and-requeue in the dedup pair generators (VERDICT r03 #4).

Adversarial corpus: one shingle shared by EVERY doc (a boilerplate footer).
With a small cap, no single task may expand the full O(m²) pair set; the
oversized band/posting group must split into bounded cell-pair groups, and
the FINAL pair/Jaccard output must equal the uncapped expansion exactly.
"""

from __future__ import annotations

from functools import partial

import pyarrow as pa
import pytest

from graphrag_ray.stages import dedup


def _band_batch(n_docs: int) -> pa.Table:
    """All docs share one (band, hash) cell — the degenerate LSH band."""
    return pa.Table.from_pydict(
        {
            "band_id": pa.array([0] * n_docs, pa.int32()),
            "band_hash": pa.array(["deadbeef"] * n_docs, pa.string()),
            "doc_id": pa.array(list(range(n_docs)), pa.int64()),
        }
    )


def _expand_requeue(tagged: pa.Table, group_keys, expander):
    """Drive the second-level groupby locally; assert per-group bounds."""
    import pandas as pd

    df = tagged.to_pandas()
    rq = df[df["kind"] == "rq"]
    outs = []
    max_group = 0
    for _, g in rq.groupby(group_keys):
        max_group = max(max_group, len(g))
        outs.append(expander(pa.Table.from_pandas(g, preserve_index=False)))
    return outs, max_group


def test_minhash_hot_band_bounded_and_exact():
    n, cap = 100, 8
    batch = _band_batch(n)
    # uncapped expansion = ground truth
    flat = dedup.candidate_pairs_from_bands(batch).to_pandas()
    truth = set(zip(flat[flat["kind"] == "pair"]["doc_a"].astype(int),
                    flat[flat["kind"] == "pair"]["doc_b"].astype(int)))
    assert len(truth) == n * (n - 1) // 2

    tagged = dedup.candidate_pairs_from_bands(batch, cap=cap)
    df = tagged.to_pandas()
    # the hot group emitted NO direct pairs — only requeue rows
    assert (df["kind"] == "rq").all()
    outs, max_group = _expand_requeue(
        tagged, ["rq_band", "rq_hash", "cell_lo", "cell_hi"],
        dedup.pairs_between_cells)
    assert max_group <= 2 * cap  # bounded task input
    got = set()
    for t in outs:
        assert t.num_rows <= cap * cap  # bounded task output
        got.update(zip(t.column("doc_a").to_pylist(),
                       t.column("doc_b").to_pylist()))
    assert got == truth  # each pair exactly once, none lost


def test_minhash_mixed_sizes_direct_and_requeued():
    """Small cells stay on the direct path; only the hot one requeues."""
    small = pa.Table.from_pydict(
        {
            "band_id": pa.array([1, 1, 1], pa.int32()),
            "band_hash": pa.array(["aa"] * 3, pa.string()),
            "doc_id": pa.array([1000, 1001, 1002], pa.int64()),
        }
    )
    batch = pa.concat_tables([_band_batch(40), small])
    tagged = dedup.candidate_pairs_from_bands(batch, cap=8)
    df = tagged.to_pandas()
    direct = df[df["kind"] == "pair"]
    assert set(zip(direct["doc_a"].astype(int), direct["doc_b"].astype(int))) \
        == {(1000, 1001), (1000, 1002), (1001, 1002)}
    assert (df["kind"] == "rq").sum() > 0


def _posting_batch(n_docs: int) -> pa.Table:
    """One boilerplate shingle in every doc + one private shingle each."""
    sh, doc, n_sh = [], [], []
    for d in range(n_docs):
        sh.append(7)        # the hot shingle
        doc.append(d)
        n_sh.append(2)
        sh.append(1000 + d)  # private shingle
        doc.append(d)
        n_sh.append(2)
    return pa.Table.from_pydict(
        {
            "shingle": pa.array(sh, pa.int64()),
            "doc_id": pa.array(doc, pa.int64()),
            "n_sh": pa.array(n_sh, pa.int64()),
        }
    )


def test_ngram_hot_posting_bounded_and_exact():
    n, cap = 60, 8
    batch = _posting_batch(n)
    flat = dedup.ngram_pairs_from_bucket(batch).to_pandas()
    flat = flat[flat["kind"] == "pair"]
    truth = {}
    for _, r in flat.iterrows():
        truth[(int(r["doc_a"]), int(r["doc_b"]))] = (
            int(r["n_a"]), int(r["n_b"]), int(r["inter"]))
    assert len(truth) == n * (n - 1) // 2

    tagged = dedup.ngram_pairs_from_bucket(batch, cap=cap)
    df = tagged.to_pandas()
    assert (df["kind"] == "rq").all()
    outs, max_group = _expand_requeue(
        tagged, ["rq_sh", "cell_lo", "cell_hi"], dedup.ngram_pairs_between_cells)
    assert max_group <= 2 * cap
    got: dict = {}
    for t in outs:
        for a, b, na, nb, inter in zip(
            t.column("doc_a").to_pylist(), t.column("doc_b").to_pylist(),
            t.column("n_a").to_pylist(), t.column("n_b").to_pylist(),
            t.column("inter").to_pylist(),
        ):
            key = (a, b)
            if key in got:
                prev = got[key]
                got[key] = (prev[0], prev[1], prev[2] + inter)
            else:
                got[key] = (na, nb, inter)
    assert got == truth


def test_minhash_pipeline_output_invariant_under_cap(ray_session, monkeypatch):
    """End-to-end: the queries-level pipeline with an adversarially tiny
    cap produces the same verified pair set as the default cap."""
    from graphrag_ray import queries as q

    sf = "/root/testdata/sf0.001"
    base = q.dedup_minhash_pairs(sf).to_pandas()
    monkeypatch.setattr(q, "DEDUP_GROUP_CAP", 2)
    capped = q.dedup_minhash_pairs(sf).to_pandas()
    key = ["doc_a", "doc_b"]
    base = base.sort_values(key).reset_index(drop=True)
    capped = capped.sort_values(key).reset_index(drop=True)
    assert base[key].values.tolist() == capped[key].values.tolist()
    assert (base["jaccard"].to_numpy() == capped["jaccard"].to_numpy()).all()
