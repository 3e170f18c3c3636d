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
    """Per-batch combiner: fp(normalized text) → (min doc_id, count)."""
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
            "bucket": pa.array([zlib.crc32(fp.encode()) % 64 for fp in acc], pa.int32()),
            "fp": pa.array(list(acc.keys()), pa.string()),
            "keep_doc_id": pa.array([v[0] for v in acc.values()], pa.int64()),
            "n_docs": pa.array([v[1] for v in acc.values()], pa.int64()),
        }
    )


def exact_dedup_merge(batch: pa.Table) -> pa.Table:
    """(bucket) group → final row per fingerprint."""
    acc: dict[str, list] = {}
    for fp, keep, n in zip(
        batch.column("fp").to_pylist(),
        batch.column("keep_doc_id").to_pylist(),
        batch.column("n_docs").to_pylist(),
    ):
        slot = acc.get(fp)
        if slot is None:
            acc[fp] = [keep, n]
        else:
            slot[0] = min(slot[0], keep)
            slot[1] += n
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


def minhash_band_rows(batch: pa.Table) -> pa.Table:
    """doc → N_BANDS rows (band_id, band_hash, doc_id): the LSH explode."""
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
                [zlib.crc32(h.encode()) % 64 for h in out_hash], pa.int32()
            ),
        }
    )


def candidate_pairs_from_bands(batch: pa.Table) -> pa.Table:
    """(bucket) group → distinct candidate pairs sharing any band bucket."""
    groups: dict[tuple[int, str], list[int]] = {}
    for band, h, doc in zip(
        batch.column("band_id").to_pylist(),
        batch.column("band_hash").to_pylist(),
        batch.column("doc_id").to_pylist(),
    ):
        groups.setdefault((band, h), []).append(doc)
    pairs: set[tuple[int, int]] = set()
    for docs in groups.values():
        if len(docs) < 2:
            continue
        docs = sorted(set(docs))
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                pairs.add((docs[i], docs[j]))
    pairs_sorted = sorted(pairs)
    return pa.Table.from_pydict(
        {
            "doc_a": pa.array([a for a, _ in pairs_sorted], pa.int64()),
            "doc_b": pa.array([b for _, b in pairs_sorted], pa.int64()),
        }
    )


class JaccardVerifier:
    """Actor-pool stage verifying candidate pairs by exact shingle Jaccard.

    Holds the doc_id → shingle-set index built once per actor from a
    broadcast ref (small side: only docs appearing in candidate pairs at
    scale; here the corpus is small enough to broadcast whole)."""

    def __init__(self, shingle_index_ref, threshold: float = 0.7):
        import ray

        self.index: dict[int, set[int]] = ray.get(shingle_index_ref)
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_a, out_b, out_j = [], [], []
        for a, b in zip(batch.column("doc_a").to_pylist(), batch.column("doc_b").to_pylist()):
            sa, sb = self.index.get(a), self.index.get(b)
            if sa is None or sb is None or (not sa and not sb):
                continue
            j = len(sa & sb) / len(sa | sb)
            if j >= self.threshold:
                out_a.append(a)
                out_b.append(b)
                out_j.append(j)
        return pa.Table.from_pydict(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )


# ---------------------------------------------------------------------------
# SimHash


def simhash64(text: str) -> int:
    toks = _norm_text(text).split()
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for w in set(toks):
        h = _md5_64(w)
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


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
