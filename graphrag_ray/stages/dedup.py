"""Deduplication family over flat document tables (training-data ops).

Exact, MinHash+LSH, SimHash and n-gram-Jaccard near-dedup, each expressed
Ray-Data-first:

- exact: vectorized fingerprint → per-batch combiner (fp → min doc, count)
  → coarse-bucket groupby merge. Hash-partitioned "keep first per group"
  without one Ray group per key.
- MinHash-LSH: shingle → k minhashes (vectorized numpy over stable 64-bit
  hashes) → band rows → groupby(band bucket) → candidate pairs → exact
  Jaccard verify. The classic shuffle shape for near-dedup at scale.
- SimHash: 64-bit signature per doc; near-dup candidates via 4×16-bit band
  buckets, verified by Hamming distance.

All hashes derive from md5 (stable across processes/machines — no Python
hash() randomization).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import zlib


def _norm_text(t: str) -> str:
    return " ".join((t or "").lower().split())


def _md5_64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big", signed=False)


# ---------------------------------------------------------------------------
# exact dedup


def exact_dedup_partial(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: fp(normalized text) → (min doc_id, count).
    Finalized by a NATIVE keyed aggregate (groupby(fp).Min/Sum) — per-key
    groups, no coarse bucket, so per-task memory is O(1) at any corpus
    size."""
    texts = batch.column("text").to_pylist()
    doc_ids = batch.column("doc_id").to_pylist()
    acc: dict[str, list] = {}
    for doc_id, text in zip(doc_ids, texts):
        fp = hashlib.md5(_norm_text(text).encode()).hexdigest()
        slot = acc.get(fp)
        if slot is None:
            acc[fp] = [doc_id, 1]
        else:
            slot[0] = min(slot[0], doc_id)
            slot[1] += 1
    return pa.Table.from_pydict(
        {
            "fp": pa.array(list(acc.keys()), pa.string()),
            "keep_doc_id": pa.array([v[0] for v in acc.values()], pa.int64()),
            "n_docs": pa.array([v[1] for v in acc.values()], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# MinHash + LSH

N_HASHES = 64
N_BANDS = 16
ROWS_PER_BAND = N_HASHES // N_BANDS
_MERSENNE = (1 << 61) - 1
_RNG = np.random.RandomState(42)
_A = _RNG.randint(1, _MERSENNE, size=N_HASHES, dtype=np.uint64)
_B = _RNG.randint(0, _MERSENNE, size=N_HASHES, dtype=np.uint64)


def shingles(text: str, k: int = 3) -> set[int]:
    """Word k-gram shingles as stable 64-bit hashes."""
    toks = _norm_text(text).split()
    if len(toks) < k:
        return {_md5_64(" ".join(toks))} if toks else set()
    return {_md5_64(" ".join(toks[i:i + k])) for i in range(len(toks) - k + 1)}


def minhash_signature(sh: set[int]) -> np.ndarray:
    """k minhashes via universal hashing (vectorized over shingles)."""
    if not sh:
        return np.full(N_HASHES, np.iinfo(np.uint64).max, dtype=np.uint64)
    x = np.fromiter(sh, dtype=np.uint64, count=len(sh))
    # (a*x + b) mod p, computed in python-int free numpy via float-safe mod
    vals = (x[None, :] * _A[:, None] + _B[:, None]) % np.uint64(_MERSENNE)
    return vals.min(axis=1)


def minhash_band_rows(batch: pa.Table, num_buckets: int = 64) -> pa.Table:
    """doc → N_BANDS rows (band_id, band_hash, doc_id): the LSH explode.

    ``bucket`` is a coarse co-location key over band hashes (a band
    hash's rows always share a bucket, so pair emission per (band, hash)
    cell is unaffected by B). Callers derive ``num_buckets`` from the
    input size so per-bucket rows stay constant as the corpus grows."""
    texts = batch.column("text").to_pylist()
    doc_ids = batch.column("doc_id").to_pylist()
    out_band, out_hash, out_doc = [], [], []
    for doc_id, text in zip(doc_ids, texts):
        sig = minhash_signature(shingles(text))
        for b in range(N_BANDS):
            seg = sig[b * ROWS_PER_BAND:(b + 1) * ROWS_PER_BAND]
            h = hashlib.md5(seg.tobytes() + bytes([b])).hexdigest()[:16]
            out_band.append(b)
            out_hash.append(h)
            out_doc.append(doc_id)
    return pa.Table.from_pydict(
        {
            "band_id": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(out_hash, pa.string()),
            "doc_id": pa.array(out_doc, pa.int64()),
            "bucket": pa.array(
                [zlib.crc32(h.encode()) % num_buckets for h in out_hash],
                pa.int32()
            ),
        }
    )


def _pair_rq_table(pairs_sorted, rq_rows) -> pa.Table:
    """Tagged union of direct candidate pairs and requeue rows (hot-group
    salt-and-requeue, VERDICT r03 #4). ``rq_rows`` entries are
    (band, hash, cell_lo, cell_hi, cell, doc)."""
    n_p, n_r = len(pairs_sorted), len(rq_rows)
    return pa.Table.from_pydict(
        {
            "kind": pa.array(["pair"] * n_p + ["rq"] * n_r, pa.string()),
            "doc_a": pa.array([a for a, _ in pairs_sorted] + [None] * n_r, pa.int64()),
            "doc_b": pa.array([b for _, b in pairs_sorted] + [None] * n_r, pa.int64()),
            "rq_band": pa.array([None] * n_p + [r[0] for r in rq_rows], pa.int32()),
            "rq_hash": pa.array([None] * n_p + [r[1] for r in rq_rows], pa.string()),
            "cell_lo": pa.array([None] * n_p + [r[2] for r in rq_rows], pa.int32()),
            "cell_hi": pa.array([None] * n_p + [r[3] for r in rq_rows], pa.int32()),
            "cell": pa.array([None] * n_p + [r[4] for r in rq_rows], pa.int32()),
            "doc": pa.array([None] * n_p + [r[5] for r in rq_rows], pa.int64()),
        }
    )


def candidate_pairs_from_bands(batch: pa.Table, cap: int = 0) -> pa.Table:
    """(bucket) group → distinct candidate pairs sharing any band bucket.

    Hot-group bound: with ``cap > 0``, a degenerate band value shared by m
    > cap docs (e.g. every near-empty doc hashing identically on a 100 TB
    crawl) is NOT expanded quadratically here. Its sorted member list is
    split into s = ceil(m/cap) contiguous cells and each member is
    re-emitted once per cell pair (kind='rq', key (band, hash, cell_lo,
    cell_hi)); a second groupby over those keys (``pairs_between_cells``)
    expands each cell pair with ≤ 2·cap members per task. Every (i<j) pair
    lands in exactly one cell pair, so the pair SET is identical to the
    uncapped expansion — only the per-task work is bounded (O(cap²))."""
    groups: dict[tuple[int, str], list[int]] = {}
    for band, h, doc in zip(
        batch.column("band_id").to_pylist(),
        batch.column("band_hash").to_pylist(),
        batch.column("doc_id").to_pylist(),
    ):
        groups.setdefault((band, h), []).append(doc)
    pairs: set[tuple[int, int]] = set()
    rq_rows: list[tuple] = []
    for (band, h), docs in groups.items():
        if len(docs) < 2:
            continue
        docs = sorted(set(docs))
        m = len(docs)
        if cap and m > cap:
            s = -(-m // cap)  # ceil
            for idx, doc in enumerate(docs):
                c = idx // cap
                for c2 in range(s):
                    rq_rows.append((band, h, min(c, c2), max(c, c2), c, doc))
            continue
        for i in range(m):
            for j in range(i + 1, m):
                pairs.add((docs[i], docs[j]))
    return _pair_rq_table(sorted(pairs), rq_rows)


def pairs_between_cells(batch: pa.Table) -> pa.Table:
    """(band, hash, cell_lo, cell_hi) requeue group → candidate pairs.

    cell_lo == cell_hi: all (i<j) pairs within the cell; else all cross
    pairs (lo-cell doc, hi-cell doc). Cells are contiguous ranges of the
    SORTED member list, so cross pairs are already (smaller, larger) —
    identical orientation to the uncapped expansion."""
    lo = batch.column("cell_lo")[0].as_py()
    hi = batch.column("cell_hi")[0].as_py()
    cells = batch.column("cell").to_pylist()
    docs = batch.column("doc").to_pylist()
    out: set[tuple[int, int]] = set()
    if lo == hi:
        members = sorted(set(docs))
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                out.add((members[i], members[j]))
    else:
        a_side = sorted({d for d, c in zip(docs, cells) if c == lo})
        b_side = sorted({d for d, c in zip(docs, cells) if c == hi})
        for a in a_side:
            for b in b_side:
                out.add((a, b))
    pairs_sorted = sorted(out)
    return pa.Table.from_pydict(
        {
            "doc_a": pa.array([a for a, _ in pairs_sorted], pa.int64()),
            "doc_b": pa.array([b for _, b in pairs_sorted], pa.int64()),
        }
    )


# --- fully distributed verify (VERDICT r03 #3): the candidate pair set
# never lands on the driver. Pairs explode to per-doc participation rows,
# union with per-doc shingle rows, and ONE groupby(doc_id) co-locates each
# doc's shingles with its pair participations (a shuffle semi-join). The
# shingle exchange is corpus-linear; driver memory is O(1).

_HALVES_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("doc_a", pa.int64()),
        ("doc_b", pa.int64()),
        ("side", pa.int32()),
        ("sh", pa.list_(pa.int64())),
    ]
)


def pair_participation_rows(batch: pa.Table) -> pa.Table:
    """(doc_a, doc_b) candidate group → 2 participation rows (dedups the
    multi-band duplicates distributedly)."""
    a = batch.column("doc_a")[0].as_py()
    b = batch.column("doc_b")[0].as_py()
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array([a, b], pa.int64()),
            "doc_a": pa.array([a, a], pa.int64()),
            "doc_b": pa.array([b, b], pa.int64()),
            "side": pa.array([0, 1], pa.int32()),
            "sh": pa.array([None, None], pa.list_(pa.int64())),
        },
        schema=_HALVES_SCHEMA,
    )


def participation_rows_batch(batch: pa.Table) -> pa.Table:
    """Candidate rows (multi-band duplicates allowed) → participation rows
    WITHOUT a global pair-distinct exchange: batch-local pair dedupe here,
    per-doc-group dedupe in emit_pair_halves, and the verify reducer takes
    the first half per side — so global distinctness is never needed and
    one whole AllToAll drops out of the minhash pipeline."""
    pairs = sorted({(a, b) for a, b in
                    zip(batch.column("doc_a").to_pylist(),
                        batch.column("doc_b").to_pylist())})
    ids, da, db, sides = [], [], [], []
    for a, b in pairs:
        ids.extend((a, b))
        da.extend((a, a))
        db.extend((b, b))
        sides.extend((0, 1))
    n = len(ids)
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "doc_a": pa.array(da, pa.int64()),
            "doc_b": pa.array(db, pa.int64()),
            "side": pa.array(sides, pa.int32()),
            "sh": pa.array([None] * n, pa.list_(pa.int64())),
        },
        schema=_HALVES_SCHEMA,
    )


def doc_shingle_list_rows(batch: pa.Table) -> pa.Table:
    """docs → one (doc_id, sh) row each (pair cols null)."""
    doc_ids = batch.column("doc_id").to_pylist()
    sh_lists = []
    for text in batch.column("text").to_pylist():
        sh = np.fromiter(shingles(text or ""), dtype=np.uint64)
        sh_lists.append(sh.astype(np.int64).tolist())
    n = len(doc_ids)
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "doc_a": pa.array([None] * n, pa.int64()),
            "doc_b": pa.array([None] * n, pa.int64()),
            "side": pa.array([None] * n, pa.int32()),
            "sh": pa.array(sh_lists, pa.list_(pa.int64())),
        },
        schema=_HALVES_SCHEMA,
    )


def emit_pair_halves(batch: pa.Table) -> pa.Table:
    """(doc_id) group of [1 shingle row + k participation rows] → k halves
    carrying this doc's shingles into the per-pair verify groupby."""
    sh_col = batch.column("sh")
    sides = batch.column("side").to_pylist()
    sh_list = None
    for i, s in enumerate(sides):
        if s is None:
            sh_list = sh_col[i].as_py()
            break
    out_a, out_b, out_side, out_sh = [], [], [], []
    if sh_list is not None:
        a_col = batch.column("doc_a").to_pylist()
        b_col = batch.column("doc_b").to_pylist()
        seen = set()  # cross-batch duplicate pairs: emit one half each
        for i, s in enumerate(sides):
            if s is None or (a_col[i], b_col[i], s) in seen:
                continue
            seen.add((a_col[i], b_col[i], s))
            out_a.append(a_col[i])
            out_b.append(b_col[i])
            out_side.append(s)
            out_sh.append(sh_list)
    return pa.Table.from_pydict(
        {
            "doc_a": pa.array(out_a, pa.int64()),
            "doc_b": pa.array(out_b, pa.int64()),
            "side": pa.array(out_side, pa.int32()),
            "sh": pa.array(out_sh, pa.list_(pa.int64())),
        }
    )


def make_verify_pairs_fn(threshold: float):
    """Distributed verify, phase 2: (doc_a, doc_b) group → exact Jaccard
    over the two shingle sets, keep pairs ≥ threshold (raw, pre-rounding —
    matches the DuckDB oracle's filter)."""

    def verify_pairs(batch: pa.Table) -> pa.Table:
        empty = pa.Table.from_pydict(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
        sides = batch.column("side").to_pylist()
        sh_lists = batch.column("sh").to_pylist()
        sa = sb = None
        for side, sh in zip(sides, sh_lists):
            if side == 0 and sa is None:
                sa = set(sh)
            elif side == 1 and sb is None:
                sb = set(sh)
        if sa is None or sb is None or (not sa and not sb):
            return empty
        j = len(sa & sb) / len(sa | sb)
        if j < threshold:
            return empty
        j4 = float(np.floor(j * 1e4 + 0.5) / 1e4)  # oracle-compatible round
        return pa.Table.from_pydict(
            {
                "doc_a": batch.column("doc_a").slice(0, 1),
                "doc_b": batch.column("doc_b").slice(0, 1),
                "jaccard": pa.array([j4], pa.float64()),
            }
        )

    return verify_pairs


# ---------------------------------------------------------------------------
# SimHash


_BIT_IDX = np.arange(64, dtype=np.uint64)
_BIT_POW = np.uint64(1) << _BIT_IDX


def simhash64(text: str) -> int:
    """One (n_unique_tokens, 64) numpy pass per document — no per-word
    allocations (VERDICT r03 minor #5). Bit-identical to the loop form:
    bit i set iff the +1/-1 vote sum over unique-token md5 bits is > 0."""
    toks = _norm_text(text).split()
    if not toks:
        return 0
    hs = np.fromiter((_md5_64(w) for w in set(toks)), dtype=np.uint64)
    bits = (hs[:, None] >> _BIT_IDX) & np.uint64(1)
    votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    return int(np.bitwise_or.reduce(_BIT_POW[votes > 0], initial=np.uint64(0)))


def simhash_rows(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    sigs = [simhash64(t) for t in texts]
    return pa.Table.from_pydict(
        {
            "doc_id": batch.column("doc_id"),
            # int64 reinterpretation of the uint64 signature (Arrow-friendly)
            "simhash": pa.array([s - (1 << 64) if s >= (1 << 63) else s for s in sigs],
                                pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard dedup via a distributed inverted shingle index —
# the EXACT counterpart to MinHash-LSH: no signatures, no candidate
# recall risk. shingle rows → groupby(shingle bucket) pair partials →
# groupby(pair) Jaccard from counts (|A∩B| summed; |A∪B| = nA + nB − ∩,
# with nA/nB denormalized onto every posting row so no doc-size table is
# ever broadcast).


def ngram_shingle_rows(batch: pa.Table, num_buckets: int = 64) -> pa.Table:
    """doc → one row per distinct word-3-gram shingle, carrying the doc's
    total shingle count."""
    out_bucket, out_sh, out_doc, out_n = [], [], [], []
    for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                            batch.column("text").to_pylist()):
        sh = shingles(text or "")
        n = len(sh)
        for h in sh:
            out_bucket.append(int(h) % num_buckets)
            out_sh.append(int(h) - (1 << 64) if h >= (1 << 63) else int(h))
            out_doc.append(doc_id)
            out_n.append(n)
    return pa.Table.from_pydict(
        {
            "bucket": pa.array(out_bucket, pa.int32()),
            "shingle": pa.array(out_sh, pa.int64()),
            "doc_id": pa.array(out_doc, pa.int64()),
            "n_sh": pa.array(out_n, pa.int64()),
        }
    )


def ngram_pairs_from_bucket(batch: pa.Table, cap: int = 0) -> pa.Table:
    """(bucket) group → per-pair partial intersection counts (tagged).

    Quadratic only within a single shingle's posting list. Hot-posting
    bound (VERDICT r03 #4): with ``cap > 0``, a boilerplate shingle shared
    by m > cap docs is not expanded here; its sorted posting list splits
    into contiguous cells and members re-emit once per cell pair
    (kind='rq'), expanded by ``ngram_pairs_between_cells`` under a second
    groupby with ≤ 2·cap members per task. Each (i<j) pair lands in
    exactly one cell pair, so summed intersections are exact."""
    posting: dict[int, list] = {}
    for sh, doc, n in zip(batch.column("shingle").to_pylist(),
                          batch.column("doc_id").to_pylist(),
                          batch.column("n_sh").to_pylist()):
        posting.setdefault(sh, []).append((doc, n))
    acc: dict[tuple[int, int], list] = {}
    rq_rows: list[tuple] = []
    for sh, docs in posting.items():
        if len(docs) < 2:
            continue
        docs = sorted(set(docs))
        m = len(docs)
        if cap and m > cap:
            s = -(-m // cap)
            for idx, (doc, n) in enumerate(docs):
                c = idx // cap
                for c2 in range(s):
                    rq_rows.append((sh, min(c, c2), max(c, c2), c, doc, n))
            continue
        for i in range(m):
            for j in range(i + 1, m):
                (da, na), (db, nb) = docs[i], docs[j]
                slot = acc.get((da, db))
                if slot is None:
                    acc[(da, db)] = [na, nb, 1]
                else:
                    slot[2] += 1
    n_p, n_r = len(acc), len(rq_rows)
    return pa.Table.from_pydict(
        {
            "kind": pa.array(["pair"] * n_p + ["rq"] * n_r, pa.string()),
            "doc_a": pa.array([k[0] for k in acc] + [None] * n_r, pa.int64()),
            "doc_b": pa.array([k[1] for k in acc] + [None] * n_r, pa.int64()),
            "n_a": pa.array([v[0] for v in acc.values()]
                            + [None] * n_r, pa.int64()),
            "n_b": pa.array([v[1] for v in acc.values()]
                            + [None] * n_r, pa.int64()),
            "inter": pa.array([v[2] for v in acc.values()]
                              + [None] * n_r, pa.int64()),
            "rq_sh": pa.array([None] * n_p + [r[0] for r in rq_rows], pa.int64()),
            "cell_lo": pa.array([None] * n_p + [r[1] for r in rq_rows], pa.int32()),
            "cell_hi": pa.array([None] * n_p + [r[2] for r in rq_rows], pa.int32()),
            "cell": pa.array([None] * n_p + [r[3] for r in rq_rows], pa.int32()),
            "doc": pa.array([None] * n_p + [r[4] for r in rq_rows], pa.int64()),
            "doc_n": pa.array([None] * n_p + [r[5] for r in rq_rows], pa.int64()),
        }
    )


def ngram_pairs_between_cells(batch: pa.Table) -> pa.Table:
    """(rq_sh, cell_lo, cell_hi) requeue group → per-pair partial
    intersection rows (inter=1 each; the final pair groupby sums)."""
    lo = batch.column("cell_lo")[0].as_py()
    hi = batch.column("cell_hi")[0].as_py()
    cells = batch.column("cell").to_pylist()
    docs = batch.column("doc").to_pylist()
    ns = batch.column("doc_n").to_pylist()
    members = sorted({(d, n) for d, n, c in zip(docs, ns, cells)})
    out: list[tuple] = []
    if lo == hi:
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                (da, na), (db, nb) = members[i], members[j]
                out.append((da, db, na, nb))
    else:
        a_side = sorted({(d, n) for d, n, c in zip(docs, ns, cells) if c == lo})
        b_side = sorted({(d, n) for d, n, c in zip(docs, ns, cells) if c == hi})
        for da, na in a_side:
            for db, nb in b_side:
                out.append((da, db, na, nb))
    return pa.Table.from_pydict(
        {
            "doc_a": pa.array([r[0] for r in out], pa.int64()),
            "doc_b": pa.array([r[1] for r in out], pa.int64()),
            "n_a": pa.array([r[2] for r in out], pa.int64()),
            "n_b": pa.array([r[3] for r in out], pa.int64()),
            "inter": pa.array([1] * len(out), pa.int64()),
        }
    )


def make_ngram_finalize_fn(threshold: float):
    """(doc_a, doc_b) group → exact Jaccard from summed intersections."""

    def finalize(batch: pa.Table) -> pa.Table:
        inter = sum(batch.column("inter").to_pylist())
        na = batch.column("n_a")[0].as_py()
        nb = batch.column("n_b")[0].as_py()
        union = na + nb - inter
        j = inter / union if union else 0.0
        if j < threshold:
            return pa.Table.from_pydict(
                {"doc_a": pa.array([], pa.int64()),
                 "doc_b": pa.array([], pa.int64()),
                 "jaccard": pa.array([], pa.float64())}
            )
        j4 = float(np.floor(j * 1e4 + 0.5) / 1e4)
        return pa.Table.from_pydict(
            {"doc_a": batch.column("doc_a").slice(0, 1),
             "doc_b": batch.column("doc_b").slice(0, 1),
             "jaccard": pa.array([j4], pa.float64())}
        )

    return finalize


# ---------------------------------------------------------------------------
# SimHash near-dup PAIRS via band partitioning. Splitting the 64-bit
# signature into 4 disjoint 16-bit bands guarantees (pigeonhole) that any
# pair within Hamming distance ≤ 3 collides on at least one exact band —
# so unlike LSH this candidate generation has recall 1 for the emitted
# predicate and the exact all-pairs DuckDB oracle must match bit-for-bit.


def simhash_band_rows(batch: pa.Table, n_bands: int = 4) -> pa.Table:
    """simhash rows → one row per (band index, band value)."""
    ids = batch.column("doc_id").to_pylist()
    sigs = batch.column("simhash").to_numpy(zero_copy_only=False) \
        .astype(np.int64).view(np.uint64)
    width = 64 // n_bands
    mask = np.uint64((1 << width) - 1)
    out_band, out_val, out_id, out_sig = [], [], [], []
    for b in range(n_bands):
        vals = (sigs >> np.uint64(b * width)) & mask
        out_band.extend([b] * len(ids))
        out_val.extend(vals.astype(np.int64).tolist())
        out_id.extend(ids)
        out_sig.extend(sigs.view(np.int64).tolist())
    return pa.Table.from_pydict(
        {
            "band": pa.array(out_band, pa.int32()),
            "band_val": pa.array(out_val, pa.int64()),
            "doc_id": pa.array(out_id, pa.int64()),
            "simhash": pa.array(out_sig, pa.int64()),
        }
    )


def make_simhash_pairs_fn(max_hamming: int = 3, n_bands: int = 4):
    """Per band group: all (i<j) pairs within the Hamming budget.

    The pigeonhole recall-1 guarantee (any pair at Hamming ≤ max_hamming
    collides on ≥1 exact band) only holds when max_hamming ≤ n_bands - 1;
    validate at construction so a looser budget can't silently lose pairs.
    """
    if max_hamming > n_bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} needs n_bands >= {max_hamming + 1} "
            f"(got {n_bands}): band collision only guarantees recall for "
            "Hamming <= n_bands - 1"
        )

    def pairs(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id").to_pylist(), dtype=np.int64)
        sigs = batch.column("simhash").to_numpy(zero_copy_only=False) \
            .astype(np.int64).view(np.uint64)
        order = np.argsort(ids, kind="stable")
        ids, sigs = ids[order], sigs[order]
        out_a, out_b, out_h = [], [], []
        for i in range(len(ids)):
            if len(ids) < 2:
                break
            x = sigs[i] ^ sigs[i + 1:]
            h = np.array([int(v).bit_count() for v in x], dtype=np.int64)
            keep = np.nonzero(h <= max_hamming)[0]
            for j in keep:
                out_a.append(int(ids[i]))
                out_b.append(int(ids[i + 1 + j]))
                out_h.append(int(h[j]))
        return pa.Table.from_pydict(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "hamming": pa.array(out_h, pa.int64()),
            }
        )

    return pairs


# ---------------------------------------------------------------------------
# Distributed connected components over near-dup pairs (semantic dedup).
# VERDICT r02 #5: the previous shape collected every pair table AND the
# full vec_id list to the driver and union-found there — O(N) driver
# memory. This is iterated hash-to-min label propagation: per round, the
# (small) label table co-locates with the edge rows in ONE bucketed
# exchange (vectorized index_in join inside each bucket group), the
# per-node min is a hash aggregate, and the driver only ever sees the
# scalar label-sum used for fixpoint detection (labels are monotonically
# non-increasing positive ints, so an unchanged sum == fixpoint).


def semantic_components_labels(pairs_ds, num_buckets: int = 32,
                               max_iters: int = 50):
    """Near-dup pair rows (vec_a, vec_b) → Dataset (node, label) for every
    node appearing in ≥1 pair, label = the component's minimum node id.
    Singletons are implicit (callers default keep_id = own id)."""
    import pyarrow.compute as pc

    import ray
    from ray.data.aggregate import Min, Sum

    def sym_edges(batch: pa.Table) -> pa.Table:
        a = batch.column("vec_a").cast(pa.int64())
        b = batch.column("vec_b").cast(pa.int64())
        return pa.table({
            "node": pa.chunked_array([a, b]).combine_chunks(),
            "other": pa.chunked_array([b, a]).combine_chunks(),
        })

    edges = pairs_ds.map_batches(sym_edges, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.int64()),
            "label": pa.array([], pa.int64()),
        }))

    def seed(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("node"),
                         "label": batch.column("node")})

    labels = (edges.map_batches(seed, batch_format="pyarrow")
              .groupby("node").aggregate(Min("label", alias_name="label"))
              .materialize())

    def bucket_of(col: pa.ChunkedArray) -> pa.Array:
        keys = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.array(((keys * np.uint64(2654435761))
                         % np.uint64(1 << 32) % np.uint64(num_buckets))
                        .astype(np.int32))

    def tag_labels(batch: pa.Table) -> pa.Table:
        return pa.table({
            "bucket": bucket_of(batch.column("node")),
            "node": batch.column("node").cast(pa.int64()),
            "other": pa.nulls(batch.num_rows, pa.int64()),
            "label": batch.column("label").cast(pa.int64()),
        })

    def tag_edges(batch: pa.Table) -> pa.Table:
        return pa.table({
            "bucket": bucket_of(batch.column("node")),
            "node": batch.column("node"),
            "other": batch.column("other"),
            "label": pa.nulls(batch.num_rows, pa.int64()),
        })

    edges_tagged = edges.map_batches(tag_edges, batch_format="pyarrow").materialize()

    def propagate(batch: pa.Table) -> pa.Table:
        is_label = pc.is_valid(batch.column("label"))
        lab = batch.filter(is_label)
        edg = batch.filter(pc.invert(is_label))
        idx = pc.index_in(edg.column("node"), lab.column("node"))
        neigh_label = pc.take(lab.column("label"), idx)
        return pa.table({
            "node": pa.chunked_array(
                [edg.column("other"), lab.column("node")]).combine_chunks(),
            "label": pa.chunked_array(
                [neigh_label, lab.column("label")]).combine_chunks(),
        })

    prev_sum = None
    for _ in range(max_iters):
        msgs = (labels.map_batches(tag_labels, batch_format="pyarrow")
                .union(edges_tagged)
                .groupby("bucket")
                .map_groups(propagate, batch_format="pyarrow"))
        labels = (msgs.groupby("node")
                  .aggregate(Min("label", alias_name="label"))
                  .materialize())
        cur = labels.aggregate(Sum("label", alias_name="label_sum"))["label_sum"]
        if cur == prev_sum:
            break
        prev_sum = cur
    return labels
