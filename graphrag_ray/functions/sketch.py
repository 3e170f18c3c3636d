"""Mergeable HyperLogLog sketch for approximate doc-frequency.

Canonicalization's one unbounded per-key payload is the exact ``docs`` list
(a Zipf-hot entity at 10^12 docs would carry 10^12 doc ids through the
shuffle). The config-gated swap-in (``doc_frequency_mode='hll'``,
canonicalize.py) replaces it with a fixed 2^p-byte register array per key:
same associative/commutative merge dataflow (elementwise max), bounded
payload, ~1.04/sqrt(2^p) relative error (p=10 → ~3.2%).

Standard HLL (Flajolet et al. 2007) with the small-range linear-counting
correction; hashes are md5-derived 64-bit (stable across processes)."""

from __future__ import annotations

import hashlib

import numpy as np

DEFAULT_P = 10


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_create(p: int = DEFAULT_P) -> bytearray:
    return bytearray(1 << p)


def hll_add(reg: bytearray, item: str, p: int = DEFAULT_P) -> None:
    h = int.from_bytes(hashlib.md5(item.encode()).digest()[:8], "big")
    idx = h >> (64 - p)
    rest = h & ((1 << (64 - p)) - 1)
    # rank = leading zeros of the remaining (64-p)-bit word + 1
    rank = (64 - p) - rest.bit_length() + 1
    if rank > reg[idx]:
        reg[idx] = rank


def hll_merge(a: bytes, b: bytes) -> bytes:
    """Elementwise max — associative, commutative, idempotent."""
    if not a:
        return bytes(b)
    if not b:
        return bytes(a)
    return np.maximum(np.frombuffer(a, dtype=np.uint8),
                      np.frombuffer(b, dtype=np.uint8)).tobytes()


def hll_estimate(reg: bytes) -> int:
    m = len(reg)
    if m == 0:
        return 0
    r = np.frombuffer(reg, dtype=np.uint8).astype(np.float64)
    est = _alpha(m) * m * m / np.power(2.0, -r).sum()
    if est <= 2.5 * m:
        zeros = int((r == 0).sum())
        if zeros:
            est = m * np.log(m / zeros)  # linear counting
    return int(round(est))


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005) — mergeable by elementwise
# SUM, so the distributed dataflow is: per-batch partial counter tables →
# one tiny keyed groupby (DEPTH×WIDTH rows max) → point queries. Hashes are
# md5-derived 32-bit (the repo's stable cross-process convention), which
# makes every estimate SQL-replayable.

CMS_DEPTH = 4
CMS_WIDTH = 256


def cms_bucket(item: str, row: int, width: int = CMS_WIDTH) -> int:
    """Row-salted md5 bucket — SQL twin:
    ('0x'||substr(md5(row||':'||item),1,8))::BIGINT % width."""
    h = hashlib.md5(f"{row}:{item}".encode()).digest()
    return int.from_bytes(h[:4], "big") % width


def cms_partial_counts(items: np.ndarray, counts: np.ndarray,
                       depth: int = CMS_DEPTH, width: int = CMS_WIDTH):
    """Flattened (row, bucket, cnt) partial for one batch: hash each
    DISTINCT item once per row (callers pre-aggregate with np.unique, so
    the md5 work is per-unique-key, not per-event)."""
    rows_out, buckets_out, cnts_out = [], [], []
    for r in range(depth):
        acc: dict[int, int] = {}
        for item, c in zip(items, counts):
            b = cms_bucket(str(item), r, width)
            acc[b] = acc.get(b, 0) + int(c)
        rows_out.extend([r] * len(acc))
        buckets_out.extend(acc.keys())
        cnts_out.extend(acc.values())
    return (np.asarray(rows_out, dtype=np.int64),
            np.asarray(buckets_out, dtype=np.int64),
            np.asarray(cnts_out, dtype=np.int64))


def cms_estimate(merged: dict, item: str,
                 depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> int:
    """Point query over the merged sketch ({(row, bucket): cnt})."""
    return min(merged.get((r, cms_bucket(str(item), r, width)), 0)
               for r in range(depth))
