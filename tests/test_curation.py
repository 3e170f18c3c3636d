"""Unit tests for the training-data curation stage (stages/curation.py).

The sf0.001 oracle parity run lives in test_queries_vs_duckdb.py (the
seven curation surfaces are auto-parametrized there); these tests pin
edge-case behavior: empty text, short docs, benchmark-member exclusion,
redaction ordering, split determinism, and partial/final sampling merge.
"""

import pyarrow as pa

from graphrag_ray.stages import curation


def _batch(rows):
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )


def test_pii_injection_deterministic():
    b = _batch([(1, "alpha"), (1, "alpha")])
    out = curation.inject_pii(b)
    t = out.column("pii_text").to_pylist()
    assert t[0] == t[1]
    # at least one of the three parts is injected for doc 1
    assert t[0] != "alpha"


def test_pii_detect_counts_match_injection():
    ids = list(range(50))
    b = _batch([(i, f"doc {i} text") for i in ids])
    out = curation.pii_detect(b)
    for i, ne, np_, ni in zip(
        ids,
        out.column("n_emails").to_pylist(),
        out.column("n_phones").to_pylist(),
        out.column("n_ipv4").to_pylist(),
    ):
        email, phone, ip = curation._pii_parts(i)
        assert ne == (1 if email else 0)
        assert np_ == (1 if phone else 0)
        assert ni == (1 if ip else 0)


def test_pii_redact_removes_all_pii():
    import re

    b = _batch([(i, "base text") for i in range(30)])
    red = curation.pii_redact(b).column("redacted").to_pylist()
    for pat in (curation.EMAIL_RE, curation.PHONE_RE, curation.IPV4_RE):
        assert not any(re.search(pat, t) for t in red)
    assert any("[EMAIL]" in t for t in red)
    assert any("[PHONE]" in t for t in red)
    assert any("[IP]" in t for t in red)


def test_hash_split_is_pure_function_of_doc_id():
    b = pa.Table.from_pydict({"doc_id": pa.array([7, 7, 8], pa.int64())})
    out = curation.hash_split(b)
    s = out.column("split").to_pylist()
    assert s[0] == s[1]
    assert set(s) <= {"train", "valid", "test"}


def test_repetition_stats_edge_cases():
    b = _batch([(1, ""), (2, "one"), (3, "a a a a")])
    out = curation.repetition_stats(b)
    rows = {d: (nt, tt, ng, nu, tg) for d, nt, tt, ng, nu, tg in zip(
        out.column("doc_id").to_pylist(),
        out.column("n_tokens").to_pylist(),
        out.column("top_token_count").to_pylist(),
        out.column("n_2grams").to_pylist(),
        out.column("n_uniq_2grams").to_pylist(),
        out.column("top_2gram_count").to_pylist(),
    )}
    assert rows[1] == (0, 0, 0, 0, 0)
    assert rows[2] == (1, 1, 0, 0, 0)
    assert rows[3] == (4, 4, 3, 1, 3)  # "a a" ×3


def test_decontam_excludes_benchmark_members_and_counts_overlap():
    text = "w1 w2 w3 w4 w5 w6"  # shingles: (w1..w5), (w2..w6)
    rows = [(0, text),                 # 0 % 97 == 0 → benchmark member
            (1, text),                 # fully contaminated
            (2, "x1 x2 x3 x4 x5"),     # clean
            (3, "short doc")]          # no shingles
    b = _batch(rows)
    bench = set()
    part = curation.bench_shingle_partial(b)
    bench |= set(part.column("shingle").to_pylist())
    out = curation.make_decontam_fn(frozenset(bench))(b)
    got = {d: (ns, nc, ic) for d, ns, nc, ic in zip(
        out.column("doc_id").to_pylist(),
        out.column("n_shingles").to_pylist(),
        out.column("n_contaminated").to_pylist(),
        out.column("is_contaminated").to_pylist(),
    )}
    assert 0 not in got
    assert got[1] == (2, 2, True)
    assert got[2] == (1, 0, False)
    assert got[3] == (0, 0, False)


def test_sample_partial_final_merge_matches_global_selection():
    import hashlib

    ids = list(range(40))
    langs = ["en" if i % 2 == 0 else "de" for i in ids]
    full = pa.Table.from_pydict(
        {"doc_id": pa.array(ids, pa.int64()),
         "lang": pa.array(langs, pa.string())}
    )
    # two partials over disjoint halves, merged per lang
    p1 = curation.sample_partial(full.slice(0, 20))
    p2 = curation.sample_partial(full.slice(20, 20))
    merged = pa.concat_tables([p1, p2])
    for lang in ("en", "de"):
        grp = merged.filter(pa.compute.equal(merged.column("lang"), lang))
        final = curation.sample_final(grp)
        got = final.column("doc_id").to_pylist()
        want = sorted(
            (i for i in ids if (langs[i] == lang)),
            key=lambda i: hashlib.md5(str(i).encode()).hexdigest(),
        )[:curation.SAMPLE_PER_LANG]
        assert got == want


def test_filter_verdict_rule_priority():
    rows = [
        (1, "a b"),                                   # too_short (n=2)
        (2, "x x x x x x"),                           # repetitive (top 6/6)
        (3, "aaaaaaaaaaaaaaaa bbbbbbbbbbbbbbbb cccccccccccccccc "
            "dddddddddddddddd eeeeeeeeeeeeeeee"),     # word_length (mean 16)
        (4, "alpha beta gamma delta epsilon"),        # no_stopword
        (5, "the quick brown fox jumps over lazy"),   # ok
    ]
    out = curation.filter_verdict(_batch(rows))
    got = dict(zip(out.column("doc_id").to_pylist(),
                   out.column("reason").to_pylist()))
    assert got == {1: "too_short", 2: "repetitive", 3: "word_length",
                   4: "no_stopword", 5: "ok"}
    keeps = dict(zip(out.column("doc_id").to_pylist(),
                     out.column("keep").to_pylist()))
    assert keeps[5] is True and sum(keeps.values()) == 1


def test_pair_split_leakage_filters_same_split_pairs():
    # find one doc per split, then build pairs crossing and not crossing
    by_split = {}
    for i in range(200):
        by_split.setdefault(curation._split_of(i), []).append(i)
        if all(len(v) >= 2 for v in by_split.values()) and len(by_split) == 3:
            break
    tr, va = by_split["train"], by_split["valid"]
    batch = pa.Table.from_pydict(
        {
            "doc_a": pa.array([tr[0], tr[0]], pa.int64()),
            "doc_b": pa.array([tr[1], va[0]], pa.int64()),
            "hamming": pa.array([1, 2], pa.int64()),
        }
    )
    out = curation.pair_split_leakage(batch)
    assert out.num_rows == 1
    assert out.column("split_a").to_pylist() == ["train"]
    assert out.column("split_b").to_pylist() == ["valid"]


def test_sample_filter_deterministic_and_uncorrelated_with_split():
    from graphrag_ray.stages import text_analysis

    ids = list(range(1000))
    batch = pa.Table.from_pydict({"doc_id": pa.array(ids, pa.int64())})
    out1 = text_analysis.sample_filter(batch)
    out2 = text_analysis.sample_filter(batch)
    kept = out1.column("doc_id").to_pylist()
    # determinism: same input → same sample, regardless of batching
    assert kept == out2.column("doc_id").to_pylist()
    half = text_analysis.sample_filter(batch.slice(0, 500))
    assert half.column("doc_id").to_pylist() == [d for d in kept if d < 500]
    # ~10% rate (hash-uniformity gives a loose band at n=1000)
    assert 60 <= len(kept) <= 140
    # distinct salt: the sample is not a subset of one split bucket —
    # all three split labels appear among sampled docs
    splits = {curation._split_of(d) for d in kept}
    assert splits == {"train", "valid", "test"}
