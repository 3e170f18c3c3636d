"""Similarity search over embedding columns (training-data ops).

- ``brute_force_topk``: exact cosine top-k — per-batch numpy matmul against
  a broadcast query matrix, per-batch top-k partials, tiny final sort.
  The baseline any ANN variant is judged against.
- ``lsh_topk``: random-hyperplane LSH bucketing — the scale path: only
  batches' rows whose signature matches the query's bucket (within a
  Hamming radius) are scored. Approximate; recall measured in tests.
- ``cosine_near_dup_pairs``: all pairs with cosine ≥ threshold (embedding
  near-dedup), batch rows × broadcast matrix.

DuckDB oracle compatibility: similarities are computed in float32 (matching
DuckDB's FLOAT[] ``list_cosine_similarity``) then rounded half-away-from-
zero to 4 digits; ordering uses (rounded sim DESC, vec_id ASC).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _to_matrix(col) -> np.ndarray:
    """Arrow list<float> column → (n, dim) float32 matrix without the
    to_pylist round-trip (VERDICT r03 minor #5): flatten the child values
    buffer (zero-copy for non-null uniform-width lists) and reshape."""
    arr = col.combine_chunks() if hasattr(col, "combine_chunks") else col
    if pa.types.is_fixed_size_list(arr.type):
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        return flat.reshape(len(arr), arr.type.list_size).astype(
            np.float32, copy=False)
    if (pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type)) \
            and arr.null_count == 0 and len(arr):
        widths = np.diff(arr.offsets.to_numpy())
        if (widths == widths[0]).all() and widths[0] > 0:
            flat = arr.flatten().to_numpy(zero_copy_only=False)
            return flat.reshape(len(arr), widths[0]).astype(
                np.float32, copy=False)
    return np.array(arr.to_pylist(), dtype=np.float32)


def _sql_round4(x: np.ndarray) -> np.ndarray:
    return np.floor(np.abs(x) * 1e4 + 0.5) / 1e4 * np.sign(x)


def cosine_sims(mat: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Cosine in float32 end-to-end (oracle-compatible)."""
    dots = mat @ q
    norms = np.sqrt((mat * mat).sum(axis=1)) * np.float32(np.sqrt((q * q).sum()))
    with np.errstate(divide="ignore", invalid="ignore"):
        sims = np.where(norms > 0, dots / norms, np.float32(0.0))
    return sims.astype(np.float32)


def make_topk_partial_fn(query: np.ndarray, k: int):
    """Per-batch exact scoring + local top-k (the combiner)."""
    q = query.astype(np.float32)

    def topk_partial(batch: pa.Table) -> pa.Table:
        mat = _to_matrix(batch.column("embedding"))
        vec_ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        if len(mat) == 0:
            return pa.Table.from_pydict(
                {"vec_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
            )
        sims = _sql_round4(cosine_sims(mat, q).astype(np.float64))
        order = np.lexsort((vec_ids, -sims))[:k]
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(vec_ids[order], pa.int64()),
                "sim": pa.array(sims[order], pa.float64()),
            }
        )

    return topk_partial


def finalize_topk(ds, k: int):
    """Merge the per-batch partials (tiny) into the global top-k."""
    import pandas as pd

    df = ds.to_pandas()
    df = df.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
    return pd.DataFrame(
        {"vec_id": df["vec_id"].to_numpy(), "sim": df["sim"].to_numpy()}
    ).reset_index(drop=True)


_NEAR_DUP_SCHEMA = pa.schema(
    [("vec_a", pa.int64()), ("vec_b", pa.int64()), ("sim", pa.float64())]
)


def _cross_sims(mat_a: np.ndarray, mat_b: np.ndarray) -> np.ndarray:
    """float32 cosine matrix (oracle-compatible), rounded to 4 digits."""
    na = np.sqrt((mat_a * mat_a).sum(axis=1))
    nb = np.sqrt((mat_b * mat_b).sum(axis=1))
    sims = mat_a @ mat_b.T
    denom = na[:, None] * nb[None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        sims = np.where(denom > 0, sims / denom, np.float32(0.0))
    return _sql_round4(sims.astype(np.float64))


def make_block_pair_near_dup_fn(block_refs: list, threshold: float):
    """Distributed blocked all-pairs near-dup: the input is a Dataset of
    (i, j) block-index pairs (i ≤ j); each task resolves exactly TWO Arrow
    blocks from the object store (near-zero-copy), computes the cross
    cosine matrix and emits qualifying pairs via ``np.nonzero`` — no
    Python row loops, no full-matrix broadcast, per-task memory bounded by
    two blocks. Exact all-pairs is inherently O(N²) compute; this is its
    memory-safe distributed shape (the approximate scale path is the LSH /
    IVF bucketing in this module)."""
    import ray

    def block_pair(batch: pa.Table) -> pa.Table:
        out = []
        for i, j in zip(batch.column("i").to_pylist(), batch.column("j").to_pylist()):
            tbl_i = ray.get(block_refs[i])
            tbl_j = tbl_i if j == i else ray.get(block_refs[j])
            mat_i = _to_matrix(tbl_i.column("embedding"))
            mat_j = mat_i if j == i else _to_matrix(tbl_j.column("embedding"))
            ids_i = np.asarray(tbl_i.column("vec_id").to_pylist(), dtype=np.int64)
            ids_j = ids_i if j == i else np.asarray(
                tbl_j.column("vec_id").to_pylist(), dtype=np.int64)
            if not len(mat_i) or not len(mat_j):
                continue
            sims = _cross_sims(mat_i, mat_j)
            mask = sims >= threshold
            # orient every pair (a < b); i == j keeps the strict upper set,
            # cross blocks emit each unordered pair once (blocks disjoint)
            mask &= ids_i[:, None] != ids_j[None, :]
            ii, jj = np.nonzero(mask)
            if not len(ii):
                continue
            a = ids_i[ii]
            b = ids_j[jj]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            keep = a < b if i == j else np.ones(len(a), dtype=bool)
            out.append(pa.Table.from_pydict(
                {"vec_a": pa.array(lo[keep]), "vec_b": pa.array(hi[keep]),
                 "sim": pa.array(sims[ii, jj][keep], pa.float64())},
                schema=_NEAR_DUP_SCHEMA))
        return (pa.concat_tables(out) if out
                else _NEAR_DUP_SCHEMA.empty_table())

    return block_pair


# ---------------------------------------------------------------------------
# LSH-banded near-dup (the scale-default candidate path for embedding dedup)

ND_PLANES_SEED = 11
ND_N_BANDS = 32
ND_BAND_BITS = 3


def _nd_planes(dim: int, n_planes: int) -> np.ndarray:
    rng = np.random.RandomState(ND_PLANES_SEED)
    return rng.normal(size=(n_planes, dim)).astype(np.float32)


_ND_BAND_SCHEMA_FIELDS = [
    ("bucket", pa.int64()),
    ("vec_id", pa.int64()),
    ("embedding", pa.list_(pa.float32())),
]


def make_near_dup_band_rows_fn(dim: int, n_bands: int = ND_N_BANDS,
                               band_bits: int = ND_BAND_BITS):
    """Hyperplane-LSH banding for near-dup candidates: each vector emits one
    row per band keyed by (band, band-signature) → a single int64 bucket.
    Two vectors become candidates iff they share ANY band bucket.

    Recall math (docstring = the contract): P(band match) = p^r where
    p = 1 - angle/pi and r = band_bits; P(candidate) = 1 - (1-p^r)^B. The
    default (B=32, r=3) was validated to miss ZERO qualifying pairs at
    cosine >= 0.45 on all three testdata scales (tests assert set equality
    vs the exact path); at weak thresholds the prune is weak (~4x exact
    compute on near-random vectors) but the *shape* is the scale one —
    band-bucket groupby instead of an O(N²/B²) block-pair fan-out — and at
    realistic dedup thresholds (0.7+) the same geometry prunes hard.
    Embeddings ride on the band rows (×B duplication); at extreme scale
    swap for candidate-id pairs + a bucketed fetch join."""
    planes = _nd_planes(dim, n_bands * band_bits)

    def band_rows(batch: pa.Table) -> pa.Table:
        mat = _to_matrix(batch.column("embedding"))
        schema = pa.schema(_ND_BAND_SCHEMA_FIELDS)
        if len(mat) == 0:
            return schema.empty_table()
        vec_ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        bits = (mat @ planes.T) > 0
        weights = (1 << np.arange(band_bits, dtype=np.int64))
        out_bucket = np.empty(len(mat) * n_bands, dtype=np.int64)
        out_ids = np.tile(vec_ids, n_bands)
        emb = batch.column("embedding").combine_chunks() \
            if hasattr(batch.column("embedding"), "combine_chunks") \
            else batch.column("embedding")
        for b in range(n_bands):
            sig = (bits[:, b * band_bits:(b + 1) * band_bits]
                   @ weights[:band_bits])
            out_bucket[b * len(mat):(b + 1) * len(mat)] = \
                (b << band_bits) | sig
        emb_rep = pa.concat_arrays(
            [emb.cast(pa.list_(pa.float32()))] * n_bands)
        return pa.Table.from_arrays(
            [pa.array(out_bucket), pa.array(out_ids), emb_rep], schema=schema)

    return band_rows


def make_bucket_verify_fn(threshold: float):
    """Within one band bucket: exact all-pairs cosine verify (float32,
    round4 — the oracle-identical predicate). Emits (vec_a < vec_b, sim)."""

    def bucket_verify(batch: pa.Table) -> pa.Table:
        mat = _to_matrix(batch.column("embedding"))
        if len(mat) < 2:
            return _NEAR_DUP_SCHEMA.empty_table()
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        sims = _cross_sims(mat, mat)
        mask = (sims >= threshold) & (ids[:, None] < ids[None, :])
        ii, jj = np.nonzero(mask)
        if not len(ii):
            return _NEAR_DUP_SCHEMA.empty_table()
        return pa.Table.from_pydict(
            {"vec_a": pa.array(ids[ii]), "vec_b": pa.array(ids[jj]),
             "sim": pa.array(sims[ii, jj], pa.float64())},
            schema=_NEAR_DUP_SCHEMA)

    return bucket_verify


def dedup_candidate_pairs(batch: pa.Table) -> pa.Table:
    """A pair matching in k bands appears k times — keep one row per
    (vec_a, vec_b) (sims are identical by construction)."""
    import pandas as pd

    df = batch.to_pandas()
    df = df.drop_duplicates(["vec_a", "vec_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False).cast(_NEAR_DUP_SCHEMA)


# ---------------------------------------------------------------------------
# LSH-bucketed approximate search (the scale path)

N_PLANES = 16
_PLANES_SEED = 7


def _planes(dim: int) -> np.ndarray:
    rng = np.random.RandomState(_PLANES_SEED)
    return rng.normal(size=(N_PLANES, dim)).astype(np.float32)


def signature_bits(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    return ((mat @ planes.T) > 0).astype(np.uint16)


def sig_to_int(bits: np.ndarray) -> np.ndarray:
    weights = (1 << np.arange(bits.shape[1], dtype=np.uint32)).astype(np.uint32)
    return (bits.astype(np.uint32) * weights[None, :]).sum(axis=1)


def make_lsh_topk_partial_fn(query: np.ndarray, k: int, dim: int, radius: int = 2):
    """Score only rows whose hyperplane signature is within ``radius``
    Hamming bits of the query's — candidate pruning per batch."""
    planes = _planes(dim)
    q = query.astype(np.float32)
    q_sig = int(sig_to_int(signature_bits(q[None, :], planes))[0])

    def lsh_partial(batch: pa.Table) -> pa.Table:
        mat = _to_matrix(batch.column("embedding"))
        vec_ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        empty = pa.Table.from_pydict(
            {"vec_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
        )
        if len(mat) == 0:
            return empty
        sigs = sig_to_int(signature_bits(mat, planes))
        xor = sigs ^ np.uint32(q_sig)
        hamming = np.array([bin(int(x)).count("1") for x in xor])
        mask = hamming <= radius
        if not mask.any():
            return empty
        sub, sub_ids = mat[mask], vec_ids[mask]
        sims = _sql_round4(cosine_sims(sub, q).astype(np.float64))
        order = np.lexsort((sub_ids, -sims))[:k]
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(sub_ids[order], pa.int64()),
                "sim": pa.array(sims[order], pa.float64()),
            }
        )

    return lsh_partial


# ---------------------------------------------------------------------------
# IVF (inverted-file) approximate search — the other scale path


def train_ivf_centroids(sample: np.ndarray, n_centroids: int = 16,
                        iterations: int = 10) -> np.ndarray:
    """Strided-init Lloyd k-means on a driver-side sample (the IVF coarse
    quantizer). Deterministic AND engine-reproducible: the init takes every
    ⌊n/k⌋-th sample row (a seeded RNG draw would be numpy-private
    Fisher-Yates, unreproducible in the DuckDB oracle) and all arithmetic
    is float64, so the driver's SQL twin re-derives the same centroids up
    to summation order."""
    s = np.asarray(sample, dtype=np.float64)
    n = len(s)
    if n == 0:
        return np.zeros((0, 0), dtype=np.float64)
    k = min(n_centroids, n)
    stride = max(1, n // k)
    centroids = s[[i * stride for i in range(k)]].copy()
    for _ in range(iterations):
        d2 = ((s[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(k):
            members = s[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def make_ivf_topk_partial_fn(query: np.ndarray, k: int,
                             centroids: np.ndarray, nprobe: int = 4):
    """Score only rows assigned to the query's ``nprobe`` nearest
    centroids — per-batch candidate pruning, exact cosine on survivors.
    Cell assignment runs in float64 (oracle-reproducible, matching the
    float64 quantizer); the survivor cosine stays on the float32 path."""
    q64 = query.astype(np.float64)
    q = query.astype(np.float32)
    c64 = np.asarray(centroids, dtype=np.float64)
    qd = ((c64 - q64[None, :]) ** 2).sum(axis=1)
    probe = set(np.argsort(qd, kind="stable")[:nprobe].tolist())

    def ivf_partial(batch: pa.Table) -> pa.Table:
        mat = _to_matrix(batch.column("embedding"))
        vec_ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        empty = pa.Table.from_pydict(
            {"vec_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
        )
        if len(mat) == 0 or len(c64) == 0:
            return empty
        d2 = ((mat.astype(np.float64)[:, None, :] - c64[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        mask = np.isin(assign, list(probe))
        if not mask.any():
            return empty
        sub, sub_ids = mat[mask], vec_ids[mask]
        sims = _sql_round4(cosine_sims(sub, q).astype(np.float64))
        order = np.lexsort((sub_ids, -sims))[:k]
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(sub_ids[order], pa.int64()),
                "sim": pa.array(sims[order], pa.float64()),
            }
        )

    return ivf_partial


def make_ivf_assign_counts_fn(centroids: np.ndarray):
    """Per-batch combiner for k-means cluster sizes: assign each embedding
    to its nearest centroid in float64 (ties → lowest index, matching
    np.argmin and the SQL trainer replay) and emit per-centroid partial
    counts."""
    c64 = np.asarray(centroids, dtype=np.float64)

    def assign_counts(batch: pa.Table) -> pa.Table:
        mat = _to_matrix(batch.column("embedding"))
        if len(mat) == 0 or len(c64) == 0:
            return pa.Table.from_pydict(
                {"centroid": pa.array([], pa.int64()),
                 "n_vecs": pa.array([], pa.int64())})
        d2 = ((mat.astype(np.float64)[:, None, :]
               - c64[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        cs, ns = np.unique(assign, return_counts=True)
        return pa.Table.from_pydict(
            {"centroid": pa.array(cs.astype(np.int64)),
             "n_vecs": pa.array(ns.astype(np.int64))})

    return assign_counts


def ivf_cluster_sizes(embeddings_ds, centroids: np.ndarray):
    """(centroid, n_vecs) for every trained centroid, empty cells 0 —
    combiner partials + tiny groupby, then a driver-side zero-fill over
    the (small) centroid list."""
    from ray.data.aggregate import Sum

    agg = (embeddings_ds.map_batches(make_ivf_assign_counts_fn(centroids),
                                     batch_format="pyarrow")
           .groupby("centroid")
           .aggregate(Sum("n_vecs", alias_name="n_vecs")))
    got = {r["centroid"]: r["n_vecs"] for r in agg.take_all()}
    k = len(centroids)
    return pa.table({
        "centroid": pa.array(range(k), pa.int64()),
        "n_vecs": pa.array([int(got.get(c, 0)) for c in range(k)],
                           pa.int64()),
    })


def pca_partial_rows(batch: pa.Table) -> pa.Table:
    """Per-batch moment partials for PCA: flattened X^T X entries
    (i, j, v), column sums (i, -1, v) and the row count (-1, -1, n) — the
    exchange carries O(d^2) rows per batch, never vectors."""
    mat = _to_matrix(batch.column("embedding")).astype(np.float64)
    n, d = mat.shape if mat.ndim == 2 else (0, 0)
    if n == 0:
        return pa.table({"i": pa.array([], pa.int32()),
                         "j": pa.array([], pa.int32()),
                         "v": pa.array([], pa.float64())})
    s2 = mat.T @ mat
    s1 = mat.sum(axis=0)
    ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
    i_col = np.concatenate([ii.ravel(), np.arange(d), [-1]]).astype(np.int32)
    j_col = np.concatenate([jj.ravel(), np.full(d, -1), [-1]]).astype(np.int32)
    v_col = np.concatenate([s2.ravel(), s1, [float(n)]])
    return pa.table({"i": pa.array(i_col), "j": pa.array(j_col),
                     "v": pa.array(v_col, pa.float64())})


def pca_top_component(embeddings_ds, iters: int = 20):
    """Top principal component of the (mean-centered) embedding cloud:
    distributed moment partials → tiny groupby → driver-side power
    iteration from the uniform init (d numbers on the driver, never a
    vector table). Output: (dim, loading) rounded to 4 — the SQL twin
    unrolls the same iteration over the same covariance."""
    from ray.data.aggregate import Sum

    agg = (embeddings_ds.map_batches(pca_partial_rows,
                                     batch_format="pyarrow")
           .groupby(["i", "j"]).aggregate(Sum("v", alias_name="v")))
    rows = agg.take_all()
    n = 0.0
    s1: dict[int, float] = {}
    s2: dict[tuple, float] = {}
    for r in rows:
        if r["i"] == -1:
            n = r["v"]
        elif r["j"] == -1:
            s1[r["i"]] = r["v"]
        else:
            s2[(r["i"], r["j"])] = r["v"]
    d = max(s1) + 1 if s1 else 0
    if d == 0 or n == 0:
        return pa.table({"dim": pa.array([], pa.int64()),
                         "loading": pa.array([], pa.float64())})
    mean = np.array([s1[i] / n for i in range(d)])
    cov = np.array([[s2[(i, j)] / n for j in range(d)] for i in range(d)])
    cov -= np.outer(mean, mean)
    v = np.full(d, 1.0 / np.sqrt(d))
    for _ in range(iters):
        w = cov @ v
        v = w / np.sqrt((w * w).sum())
    loading = np.sign(v) * np.floor(np.abs(v) * 1e4 + 0.5) / 1e4
    return pa.table({"dim": pa.array(range(d), pa.int64()),
                     "loading": pa.array(loading, pa.float64())})


def make_block_pair_nn_fn(block_refs: list):
    """Blocked all-pairs nearest-neighbor partials (mutual-kNN stage 1):
    each task resolves TWO Arrow blocks, computes the float32 cross-cosine
    matrix once and emits, for every row of BOTH blocks, its best
    neighbor within the pair — (vec_id, nbr_id, sim) with sims rounded to
    4 digits and ties broken to the smallest neighbor id, so the global
    argmax is a deterministic max-reduce over these partials. Same
    bounded-memory shape as make_block_pair_near_dup_fn."""
    import ray

    def _best(sims: np.ndarray, ids_rows: np.ndarray, ids_cols: np.ndarray):
        if sims.shape[1] == 0:
            return None
        maxv = sims.max(axis=1)
        # a single-row self block yields an all--inf row (the diagonal is
        # masked); emitting it would hand downstream a bogus self-neighbor
        finite = np.isfinite(maxv)
        if not finite.all():
            sims, ids_rows, maxv = sims[finite], ids_rows[finite], maxv[finite]
            if len(ids_rows) == 0:
                return None
        big = np.int64(np.iinfo(np.int64).max)
        cand = np.where(sims == maxv[:, None], ids_cols[None, :], big)
        nbr = cand.min(axis=1)
        return ids_rows, nbr, maxv

    def block_pair_nn(batch: pa.Table) -> pa.Table:
        out_id, out_nbr, out_sim = [], [], []
        for i, j in zip(batch.column("i").to_pylist(),
                        batch.column("j").to_pylist()):
            tbl_i = ray.get(block_refs[i])
            tbl_j = tbl_i if j == i else ray.get(block_refs[j])
            mat_i = _to_matrix(tbl_i.column("embedding"))
            mat_j = mat_i if j == i else _to_matrix(tbl_j.column("embedding"))
            ids_i = np.asarray(tbl_i.column("vec_id").to_pylist(),
                               dtype=np.int64)
            ids_j = ids_i if j == i else np.asarray(
                tbl_j.column("vec_id").to_pylist(), dtype=np.int64)
            sims = _cross_sims(mat_i, mat_j)
            if i == j:
                np.fill_diagonal(sims, -np.inf)
            got = _best(sims, ids_i, ids_j)
            if got is not None:
                out_id.append(got[0]); out_nbr.append(got[1]); out_sim.append(got[2])
            if j != i:
                got = _best(sims.T, ids_j, ids_i)
                if got is not None:
                    out_id.append(got[0]); out_nbr.append(got[1]); out_sim.append(got[2])
        if not out_id:
            return pa.Table.from_pydict(
                {"vec_id": pa.array([], pa.int64()),
                 "nbr_id": pa.array([], pa.int64()),
                 "sim": pa.array([], pa.float64())})
        return pa.Table.from_pydict(
            {"vec_id": pa.array(np.concatenate(out_id), pa.int64()),
             "nbr_id": pa.array(np.concatenate(out_nbr), pa.int64()),
             "sim": pa.array(np.concatenate(out_sim), pa.float64())})

    return block_pair_nn


def nn_reduce(group: pa.Table) -> pa.Table:
    """Mutual-kNN stage 2: per-vec_id max-reduce of the block-pair
    partials (max sim, ties to smallest neighbor id)."""
    sims = group.column("sim").to_numpy()
    nbrs = group.column("nbr_id").to_numpy()
    best = sims.max()
    mask = sims == best
    nbr = nbrs[mask].min()
    return pa.Table.from_pydict(
        {"vec_id": group.column("vec_id").slice(0, 1),
         "nbr_id": pa.array([nbr], pa.int64()),
         "sim": pa.array([float(best)], pa.float64())})


def mutual_pairs(group: pa.Table) -> pa.Table:
    """Mutual-kNN stage 3: groups keyed by the unordered pair (pmin,
    pmax); exactly two rows referencing each other = a mutual pair."""
    empty = pa.Table.from_pydict(
        {"vec_a": pa.array([], pa.int64()),
         "vec_b": pa.array([], pa.int64()),
         "sim": pa.array([], pa.float64())})
    if group.num_rows != 2:
        return empty
    ids = group.column("vec_id").to_pylist()
    nbrs = group.column("nbr_id").to_pylist()
    if ids[0] != nbrs[1] or ids[1] != nbrs[0]:
        return empty
    a, b = sorted(ids)
    return pa.Table.from_pydict(
        {"vec_a": pa.array([a], pa.int64()),
         "vec_b": pa.array([b], pa.int64()),
         "sim": group.column("sim").slice(0, 1)})
