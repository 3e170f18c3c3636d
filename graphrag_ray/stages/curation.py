"""Training-data curation operators (corpus hygiene for LLM pipelines).

Large-scale training-data preparation needs more than dedup: PII
detection/redaction (C4/Dolma-style), deterministic train/valid/test
splitting, repetition-based quality signals (Gopher rules, Rae et al.
2021), benchmark decontamination (n-gram overlap against an eval set),
source-mixing statistics, and stratified deterministic sampling. Each
operator here is a stateless vectorized ``map_batches`` stage (or a
partial/combine pair for the rollups) with an exact DuckDB replay in
``__ray_entry__.oracle_sql`` — integer/string output columns only, so
the driver's value-hash compare is exact.

The synthetic driver corpus contains no real PII, so the PII operators
run over a deterministically PII-INJECTED twin of each document: both
the Ray stage and the SQL oracle derive the injected spans from
``md5(doc_id)`` (same trick as the kgx oracle corpus), which makes
detection and redaction genuinely non-trivial to replay while staying
fully self-contained. At production scale the injection step is simply
dropped and the regex stages run over the raw text column.

Scale notes: every per-doc operator is embarrassingly parallel.
The decontamination index (shingles of the benchmark set) is broadcast
via ``ray.put`` — benchmark eval sets are tiny (MMLU+friends < 100 MB)
by construction, so a broadcast semi-join is the correct shape at
100 TB of training text; the training side streams. The per-source and
per-lang rollups pre-aggregate inside batches before a small groupby.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

# RE2 patterns — identical semantics in pyarrow (RE2) and DuckDB (RE2).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"555-[0-9]{3}-[0-9]{4}"
IPV4_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"

SPLIT_TRAIN_PCT = 80  # bucket < 80  -> train
SPLIT_VALID_PCT = 90  # bucket < 90  -> valid, else test
DECONTAM_NGRAM = 5    # shingle width for benchmark-overlap checks
BENCH_MOD = 97        # doc_id % 97 == 0  ->  member of the "benchmark" set


# ---------------------------------------------------------------------------
# PII injection spec (shared with the SQL oracle)

def _pii_parts(doc_id: int) -> tuple[str, str, str]:
    """md5-derived (email, phone, ip) for a doc; empty string = not
    injected. Mirrors the DuckDB expression in pii_inject_sql()."""
    h = hashlib.md5(str(doc_id).encode()).hexdigest()
    a = int(h[0:2], 16)
    b = int(h[2:4], 16)
    c = int(h[4:6], 16)
    d = int(h[6:8], 16)
    email = f"user{a}@mail{b % 10}.example.com" if a % 3 != 0 else ""
    phone = f"555-{a % 1000:03d}-{(b * 256 + c) % 10000:04d}" if b % 3 != 0 else ""
    ip = f"{a}.{b}.{c}.{d}" if c % 3 != 0 else ""
    return email, phone, ip


def inject_pii(batch: pa.Table) -> pa.Table:
    """doc_id, pii_text — the deterministic PII-bearing twin of ``text``."""
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    out = []
    for doc_id, text in zip(ids, texts):
        email, phone, ip = _pii_parts(int(doc_id))
        parts = [text or ""]
        if email:
            parts.append(f"contact {email}")
        if phone:
            parts.append(f"tel {phone}")
        if ip:
            parts.append(f"host {ip}")
        out.append(" ".join(parts))
    return pa.Table.from_pydict(
        {"doc_id": batch.column("doc_id"), "pii_text": pa.array(out, pa.string())}
    )


def pii_detect(batch: pa.Table) -> pa.Table:
    """Vectorized PII counting over the injected twin: doc_id, n_emails,
    n_phones, n_ipv4, has_pii. pc.count_substring_regex is a zero-copy
    RE2 kernel — no Python row loop in the regex path."""
    injected = inject_pii(batch)
    txt = injected.column("pii_text")
    n_email = pc.cast(pc.count_substring_regex(txt, pattern=EMAIL_RE), pa.int64())
    n_phone = pc.cast(pc.count_substring_regex(txt, pattern=PHONE_RE), pa.int64())
    n_ip = pc.cast(pc.count_substring_regex(txt, pattern=IPV4_RE), pa.int64())
    total = pc.add(pc.add(n_email, n_phone), n_ip)
    return pa.Table.from_pydict(
        {
            "doc_id": batch.column("doc_id"),
            "n_emails": n_email,
            "n_phones": n_phone,
            "n_ipv4": n_ip,
            "has_pii": pc.cast(pc.greater(total, 0), pa.bool_()),
        }
    )


def pii_redact(batch: pa.Table) -> pa.Table:
    """Redacted text: emails → [EMAIL], then phones → [PHONE], then
    IPv4 → [IP] (order matters and is mirrored in the oracle). Exact
    string-equality oracle on the full redacted text."""
    injected = inject_pii(batch)
    txt = injected.column("pii_text")
    txt = pc.replace_substring_regex(txt, pattern=EMAIL_RE, replacement="[EMAIL]")
    txt = pc.replace_substring_regex(txt, pattern=PHONE_RE, replacement="[PHONE]")
    txt = pc.replace_substring_regex(txt, pattern=IPV4_RE, replacement="[IP]")
    return pa.Table.from_pydict(
        {"doc_id": batch.column("doc_id"), "redacted": txt}
    )


# ---------------------------------------------------------------------------
# deterministic train/valid/test split

def hash_split(batch: pa.Table) -> pa.Table:
    """doc_id, bucket, split — bucket = first-8-hex-digits of
    md5(doc_id) mod 100; 80/10/10 train/valid/test. Stable under
    re-partitioning and incremental ingest (pure function of doc_id)."""
    ids = batch.column("doc_id").to_pylist()
    buckets, splits = [], []
    for doc_id in ids:
        b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 100
        buckets.append(b)
        splits.append(
            "train" if b < SPLIT_TRAIN_PCT
            else ("valid" if b < SPLIT_VALID_PCT else "test")
        )
    return pa.Table.from_pydict(
        {
            "doc_id": batch.column("doc_id"),
            "bucket": pa.array(buckets, pa.int64()),
            "split": pa.array(splits, pa.string()),
        }
    )


# ---------------------------------------------------------------------------
# repetition signals (Gopher quality rules — Rae et al. 2021 §A1.1)

def repetition_stats(batch: pa.Table) -> pa.Table:
    """Integer repetition signals per doc: n_tokens, top_token_count,
    n_2grams, n_uniq_2grams, top_2gram_count. The downstream filter
    thresholds (e.g. drop if top 2-gram fraction > 0.2) are plain
    arithmetic over these counts."""
    texts = batch.column("text").to_pylist()
    cols = {k: [] for k in
            ("n_tokens", "top_token_count", "n_2grams", "n_uniq_2grams",
             "top_2gram_count")}
    for t in texts:
        toks = (t or "").split()
        n = len(toks)
        tok_counts: dict[str, int] = {}
        for w in toks:
            tok_counts[w] = tok_counts.get(w, 0) + 1
        gram_counts: dict[str, int] = {}
        for i in range(n - 1):
            g = toks[i] + " " + toks[i + 1]
            gram_counts[g] = gram_counts.get(g, 0) + 1
        cols["n_tokens"].append(n)
        cols["top_token_count"].append(max(tok_counts.values(), default=0))
        cols["n_2grams"].append(max(n - 1, 0))
        cols["n_uniq_2grams"].append(len(gram_counts))
        cols["top_2gram_count"].append(max(gram_counts.values(), default=0))
    out = {"doc_id": batch.column("doc_id")}
    for k, v in cols.items():
        out[k] = pa.array(v, pa.int64())
    return pa.Table.from_pydict(out)


# ---------------------------------------------------------------------------
# benchmark decontamination (n-gram overlap vs a held-out eval set)

def doc_shingles(text: str, width: int = DECONTAM_NGRAM) -> set:
    toks = (text or "").split()
    return {" ".join(toks[i:i + width]) for i in range(len(toks) - width + 1)}


def make_decontam_fn(bench_ref):
    """Per-batch contamination counter. ``bench_ref`` is a ray.ObjectRef
    to the frozenset of benchmark shingles — resolved once per task from
    the object store (plasma-shared per node), not re-shipped per batch."""
    import ray as _ray

    def decontam(batch: pa.Table) -> pa.Table:
        bench = _ray.get(bench_ref) if not isinstance(bench_ref, (set, frozenset)) \
            else bench_ref
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        keep_i, n_sh, n_ct = [], [], []
        for i, (doc_id, text) in enumerate(zip(ids, texts)):
            if int(doc_id) % BENCH_MOD == 0:
                continue  # benchmark members are not training candidates
            sh = doc_shingles(text)
            keep_i.append(i)
            n_sh.append(len(sh))
            n_ct.append(sum(1 for s in sh if s in bench))
        sub = batch.take(pa.array(keep_i, pa.int64()))
        return pa.Table.from_pydict(
            {
                "doc_id": sub.column("doc_id"),
                "n_shingles": pa.array(n_sh, pa.int64()),
                "n_contaminated": pa.array(n_ct, pa.int64()),
                "is_contaminated": pa.array([c > 0 for c in n_ct], pa.bool_()),
            }
        )

    return decontam


def bench_shingle_partial(batch: pa.Table) -> pa.Table:
    """Distinct shingles of the benchmark members within one batch
    (benchmark set = doc_id % BENCH_MOD == 0)."""
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    out: set = set()
    for doc_id, text in zip(ids, texts):
        if int(doc_id) % BENCH_MOD == 0:
            out |= doc_shingles(text)
    return pa.Table.from_pydict({"shingle": pa.array(sorted(out), pa.string())})


# ---------------------------------------------------------------------------
# source-mixing statistics (domain weighting input)

def source_lang_partial(batch: pa.Table) -> pa.Table:
    """Per-batch (source, lang) rollup: n_docs, n_chars, n_tokens."""
    sources = batch.column("source").to_pylist()
    langs = batch.column("lang").to_pylist()
    texts = batch.column("text").to_pylist()
    acc: dict[tuple, list] = {}
    for s, l, t in zip(sources, langs, texts):
        slot = acc.setdefault((s, l), [0, 0, 0])
        slot[0] += 1
        slot[1] += len(t or "")
        slot[2] += len((t or "").split())
    keys = sorted(acc)
    return pa.Table.from_pydict(
        {
            "source": pa.array([k[0] for k in keys], pa.string()),
            "lang": pa.array([k[1] for k in keys], pa.string()),
            "n_docs": pa.array([acc[k][0] for k in keys], pa.int64()),
            "n_chars": pa.array([acc[k][1] for k in keys], pa.int64()),
            "n_tokens": pa.array([acc[k][2] for k in keys], pa.int64()),
        }
    )


def source_rollup(group: pa.Table) -> pa.Table:
    """Final per-source rollup over the (source, lang) aggregates."""
    return pa.Table.from_pydict(
        {
            "source": [group.column("source")[0].as_py()],
            "n_docs": pa.array([pc.sum(group.column("n_docs")).as_py()], pa.int64()),
            "n_chars": pa.array([pc.sum(group.column("n_chars")).as_py()], pa.int64()),
            "n_tokens": pa.array([pc.sum(group.column("n_tokens")).as_py()], pa.int64()),
            "n_langs": pa.array(
                [len(set(group.column("lang").to_pylist()))], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# stratified deterministic sampling (per-lang top-k by hash order)

SAMPLE_PER_LANG = 5


def sample_partial(batch: pa.Table) -> pa.Table:
    """Per-batch partial: the SAMPLE_PER_LANG smallest (md5(doc_id),
    doc_id) per lang within the batch. Final merge re-applies the same
    selection over the concatenated partials — classic partial top-k."""
    ids = batch.column("doc_id").to_pylist()
    langs = batch.column("lang").to_pylist()
    best: dict[str, list] = {}
    for doc_id, lang in zip(ids, langs):
        h = hashlib.md5(str(doc_id).encode()).hexdigest()
        best.setdefault(lang, []).append((h, int(doc_id)))
    rows = []
    for lang in sorted(best):
        for h, doc_id in sorted(best[lang])[:SAMPLE_PER_LANG]:
            rows.append((lang, doc_id, h))
    return pa.Table.from_pydict(
        {
            "lang": pa.array([r[0] for r in rows], pa.string()),
            "doc_id": pa.array([r[1] for r in rows], pa.int64()),
            "h": pa.array([r[2] for r in rows], pa.string()),
        }
    )


def sample_final(group: pa.Table) -> pa.Table:
    lang = group.column("lang")[0].as_py()
    pairs = sorted(zip(group.column("h").to_pylist(),
                       group.column("doc_id").to_pylist()))[:SAMPLE_PER_LANG]
    return pa.Table.from_pydict(
        {
            "lang": pa.array([lang] * len(pairs), pa.string()),
            "doc_id": pa.array([p[1] for p in pairs], pa.int64()),
            "sample_rank": pa.array(range(1, len(pairs) + 1), pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# composite quality-filter verdict (C4/Gopher-style keep/drop rules)

FILTER_MIN_TOKENS = 5
FILTER_MAX_TOKENS = 10000
FILTER_TOP_TOKEN_PCT = 5    # drop if top_token_count * 5 > n  (> 20 %)
FILTER_MIN_MEAN_LEN = 3     # drop if sum_token_len < 3 * n
FILTER_MAX_MEAN_LEN = 10    # drop if sum_token_len > 10 * n

FILTER_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "on", "at")


def filter_verdict(batch: pa.Table) -> pa.Table:
    """doc_id, n_tokens, keep, reason — first-failing-rule semantics in a
    fixed priority order (too_short, too_long, repetitive, word_length,
    no_stopword, ok). Thresholds are integer arithmetic so the DuckDB
    replay is exact."""
    stop = set(FILTER_STOPWORDS)
    texts = batch.column("text").to_pylist()
    n_toks, keeps, reasons = [], [], []
    for t in texts:
        toks = (t or "").split()
        n = len(toks)
        counts: dict[str, int] = {}
        for w in toks:
            counts[w] = counts.get(w, 0) + 1
        top = max(counts.values(), default=0)
        sum_len = sum(len(w) for w in toks)
        n_stop = sum(1 for w in toks if w in stop)
        if n < FILTER_MIN_TOKENS:
            reason = "too_short"
        elif n > FILTER_MAX_TOKENS:
            reason = "too_long"
        elif top * FILTER_TOP_TOKEN_PCT > n:
            reason = "repetitive"
        elif sum_len < FILTER_MIN_MEAN_LEN * n or sum_len > FILTER_MAX_MEAN_LEN * n:
            reason = "word_length"
        elif n_stop == 0:
            reason = "no_stopword"
        else:
            reason = "ok"
        n_toks.append(n)
        keeps.append(reason == "ok")
        reasons.append(reason)
    return pa.Table.from_pydict(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n_toks, pa.int64()),
            "keep": pa.array(keeps, pa.bool_()),
            "reason": pa.array(reasons, pa.string()),
        }
    )


# ---------------------------------------------------------------------------
# cross-split near-dup leakage (train/valid/test contamination check)

def _split_of(doc_id: int) -> str:
    b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 100
    return ("train" if b < SPLIT_TRAIN_PCT
            else ("valid" if b < SPLIT_VALID_PCT else "test"))


def pair_split_leakage(batch: pa.Table) -> pa.Table:
    """Annotate near-dup pairs with their hash-split membership and keep
    only cross-split pairs (leakage). Split is a pure function of
    doc_id, so no join is needed — the pair stream stays distributed."""
    a_ids = batch.column("doc_a").to_pylist()
    b_ids = batch.column("doc_b").to_pylist()
    sa = [_split_of(int(d)) for d in a_ids]
    sb = [_split_of(int(d)) for d in b_ids]
    keep = pa.array([x != y for x, y in zip(sa, sb)], pa.bool_())
    out = pa.Table.from_pydict(
        {
            "doc_a": batch.column("doc_a"),
            "doc_b": batch.column("doc_b"),
            "hamming": batch.column("hamming"),
            "split_a": pa.array(sa, pa.string()),
            "split_b": pa.array(sb, pa.string()),
        }
    )
    return out.filter(keep)


def make_source_cap_fn(cap: int):
    """Per-source document cap (the web-pipeline per-domain cap): within
    each source keep the ``cap`` docs ranked by md5('cap:' || doc_id) —
    a deterministic uniform draw, so the kept subset is an unbiased
    per-source sample rather than an ingestion-order artifact. Runs as
    groupby(source).map_groups AFTER the per-batch
    ``source_cap_local_thin`` combiner, which bounds what a hot domain
    ships into the exchange (min-k by rank is a semilattice, so local
    top-cap per batch provably preserves the global top-cap set)."""
    import hashlib

    def source_cap(df: "pd.DataFrame") -> "pd.DataFrame":
        if df.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "source": pd.Series(dtype="object")})
        rk = df["doc_id"].map(
            lambda d: hashlib.md5(f"cap:{d}".encode()).hexdigest())
        out = (df.assign(_rk=rk)
               .sort_values(["_rk", "doc_id"], kind="mergesort")
               .head(cap))
        return out[["doc_id", "source"]]

    return source_cap


def make_source_cap_thin_fn(cap: int):
    """Per-batch combiner for the per-source cap: keep only each source's
    ``cap`` smallest-rank docs WITHIN the batch, so the groupby(source)
    exchange receives at most cap rows per (block, source) — a hot domain
    with millions of rows ships cap × n_blocks rows instead of all of
    them. Rank is the same md5('cap:' || doc_id) draw the finalizer uses;
    dropping any row outside a batch-local top-cap can never change the
    global top-cap (min-k is associative/commutative)."""
    import hashlib

    def thin(df: "pd.DataFrame") -> "pd.DataFrame":
        if df.empty:
            return df[["doc_id", "source"]]
        rk = df["doc_id"].map(
            lambda d: hashlib.md5(f"cap:{d}".encode()).hexdigest())
        out = (df.assign(_rk=rk)
               .sort_values(["_rk", "doc_id"], kind="mergesort")
               .groupby("source", sort=False)
               .head(cap))
        return out[["doc_id", "source"]]

    return thin


# ---------------------------------------------------------------------------
# deterministic training-shard assignment (global shuffle → fixed-size
# shards, the "shuffle the corpus for training" step)

SHARD_DOCS = 1024  # target docs per shard; shard COUNT grows with corpus


def derived_shard_count(n_docs: int, floor: int = 4,
                        shard_docs: int = SHARD_DOCS) -> int:
    """Shard count from the corpus size: shard count grows with the
    corpus while per-shard size stays ~``shard_docs`` — the exchange's
    per-group memory is constant at any scale (the SQL twin computes the
    same formula from count(*))."""
    return max(floor, int(n_docs) // shard_docs + 1)


def make_shard_partial_fn(n_shards: int):
    """Per-batch: (doc_id, shard, order hash). shard is a uniform md5
    draw; the order hash gives the within-shard shuffle order — both
    salted so they are independent of each other and of the train/valid
    split and sample draws."""

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        shards, ohs = [], []
        for d in ids:
            shards.append(
                int(hashlib.md5(f"shard:v1:{d}".encode()).hexdigest()[:8], 16)
                % n_shards)
            ohs.append(hashlib.md5(f"order:v1:{d}".encode()).hexdigest())
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array([int(d) for d in ids], pa.int64()),
                "shard": pa.array(shards, pa.int64()),
                "oh": pa.array(ohs, pa.string()),
            }
        )

    return partial


_SHARD_SCHEMA_COLS = ("doc_id", "shard", "pos")


def shard_positions(group: pa.Table) -> pa.Table:
    """Per-shard finalize: 1-based position in (order hash, doc_id) order
    — the within-shard training order. Group size ≈ SHARD_DOCS docs by
    construction, constant at any corpus size."""
    import numpy as np

    ids = np.asarray(group.column("doc_id").to_pylist(), dtype=np.int64)
    ohs = np.asarray(group.column("oh").to_pylist(), dtype=object)
    order = np.lexsort((ids, ohs))
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(ids[order], pa.int64()),
            "shard": group.column("shard").take(pa.array(order)),
            "pos": pa.array(np.arange(1, len(ids) + 1), pa.int64()),
        }
    )


def make_shard_pack_partial_fn(n_shards: int):
    """Per-batch partial for sequence packing: (doc_id, shard, oh,
    n_tokens) — the shard/order draws of ``make_shard_partial_fn`` plus
    the whitespace token count the packer accumulates."""

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        shards, ohs, ntok = [], [], []
        for d, t in zip(ids, texts):
            shards.append(
                int(hashlib.md5(f"shard:v1:{d}".encode()).hexdigest()[:8], 16)
                % n_shards)
            ohs.append(hashlib.md5(f"order:v1:{d}".encode()).hexdigest())
            ntok.append(len((t or "").split()))
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array([int(d) for d in ids], pa.int64()),
                "shard": pa.array(shards, pa.int64()),
                "oh": pa.array(ohs, pa.string()),
                "n_tokens": pa.array(ntok, pa.int64()),
            }
        )

    return partial


def make_shard_pack_fn(seqlen: int):
    """Per-shard finalize for concat-then-chop packing (the GPT-style
    'concatenate the shuffled corpus and cut every ``seqlen`` tokens'
    step): docs in within-shard shuffle order, cum_before = tokens
    before this doc in the shard stream, seq_idx = the training
    sequence the doc STARTS in (cum_before // seqlen). Group size is
    ~SHARD_DOCS docs by construction — constant at any corpus scale."""
    import numpy as np

    def pack(group: pa.Table) -> pa.Table:
        ids = np.asarray(group.column("doc_id").to_pylist(), dtype=np.int64)
        ohs = np.asarray(group.column("oh").to_pylist(), dtype=object)
        ntok = np.asarray(group.column("n_tokens").to_pylist(), dtype=np.int64)
        order = np.lexsort((ids, ohs))
        ntok = ntok[order]
        cum_before = np.concatenate(([0], np.cumsum(ntok)[:-1]))
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids[order], pa.int64()),
                "shard": group.column("shard").take(pa.array(order)),
                "pos": pa.array(np.arange(1, len(ids) + 1), pa.int64()),
                "n_tokens": pa.array(ntok, pa.int64()),
                "cum_before": pa.array(cum_before, pa.int64()),
                "seq_idx": pa.array(cum_before // seqlen, pa.int64()),
            }
        )

    return pack
