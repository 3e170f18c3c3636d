"""Edge rewrite + dedup → edges table and (subj, pred, obj) triples.

Fully VECTORIZED dataflow (no Python row loops — this stage sees the
quadratic co-occurrence stream, by far the widest data in the pipeline):

1. the alias→canonical map is broadcast once as parallel arrays
   (``ray.put``); each rewrite actor materializes them in ``__init__``
   (J2, SURVEY.md §2.4). At a scale where the alias map outgrows worker
   memory the swap-in is a hash-partitioned join on src/dst; broadcast is
   correct while |entities| ≪ |corpus|.
2. rewrite = ``pc.index_in`` (C-level hash lookup) src/dst → canonical
   integer indices; drop missing endpoints (J1 drop-on-miss,
   core/mod.rs:395-410) and self-loops; encode each edge as ONE int64
   ``ekey = (src_idx * n_canon + dst_idx) * n_rels + rel_idx``.
3. per-batch combine = ``np.unique(ekey)`` + ``np.bincount`` weighted sums
   — the combiner that keeps the hot-edge shuffle bounded. The coarse
   shuffle ``bucket`` is ``ekey % num_buckets`` (deterministic across
   batches because canonical/rel vocabularies are fixed by the broadcast).
4. groupby(bucket) → same numpy merge per group (G7 semantics,
   gleaning_extractor.rs:450-467 generalized to a count/confidence merge).

Provenance: ``context`` carries a capped pipe-joined chunk-id SAMPLE taken
from the first contributing partial per edge (exact context *union* would
reintroduce per-row Python list handling; the cap already made it a
sample); the rewrite/merge path enforces ``max_contexts`` itself so the
config cap holds regardless of upstream. Confidence merges as a
vectorized ``np.maximum.at`` per ekey — order-independent and correct for
extractors with per-edge confidences, not only the constant
``relationship_confidence`` pattern path (graphrag/build.rs:594-605).

Triples are a projection of the deduped edges with canonical *names*
(parquet.rs:425-435 relationships + atomic_fact_extractor.rs:29-40 shape).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

# closed relation-type vocabulary of the pattern path (entity/mod.rs:841-879)
REL_TYPES = (
    "WORKS_FOR", "LEADS", "ASSOCIATED_WITH", "BORN_IN", "LOCATED_IN",
    "HEADQUARTERED_IN", "MARRIED_TO", "COLLEAGUE_OF", "KNOWS", "RELATED_TO",
)

EDGE_PARTIAL_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("ekey", pa.int64()),
        ("src", pa.string()),
        ("dst", pa.string()),
        ("rel_type", pa.string()),
        ("src_name", pa.string()),
        ("dst_name", pa.string()),
        ("confidence", pa.float32()),
        ("n_occurrences", pa.int64()),
        ("context", pa.string()),  # pipe-joined capped chunk-id sample
    ]
)


def make_alias_broadcast_from_table(tbl: pa.Table):
    """Arrow-native broadcast build: alias rows (entity_id, canonical_id,
    canonical_name) → parallel arrays via dictionary-encode — no pandas,
    no Python dict loop (the round-1 serial tail at high CPU counts)."""
    if tbl.num_rows == 0:
        return make_alias_broadcast({})
    keys = tbl.column("entity_id").combine_chunks()
    enc = pc.dictionary_encode(tbl.column("canonical_id").combine_chunks())
    enc = enc.combine_chunks() if isinstance(enc, pa.ChunkedArray) else enc
    indices = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    canon_ids = enc.dictionary
    # canonical_name at the first occurrence of each dictionary code
    # (codes are dense 0..k-1, so np.unique's sorted order == code order)
    _codes, first_occ = np.unique(indices, return_index=True)
    canon_names = pc.take(tbl.column("canonical_name").combine_chunks(),
                          pa.array(first_occ))
    return {
        "keys": keys,
        "key_to_canon": indices,
        "canon_ids": canon_ids,
        "canon_names": (canon_names.combine_chunks()
                        if isinstance(canon_names, pa.ChunkedArray)
                        else canon_names),
    }


def make_alias_broadcast(alias_dict: dict[str, tuple[str, str]]):
    """alias entity_id → (canonical_id, canonical_name) dict → parallel
    arrays suitable for vectorized ``index_in`` rewriting."""
    keys = list(alias_dict.keys())
    canon_ids: list[str] = []
    canon_names: list[str] = []
    canon_pos: dict[str, int] = {}
    key_to_canon = np.empty(len(keys), dtype=np.int64)
    for i, k in enumerate(keys):
        cid, cname = alias_dict[k]
        pos = canon_pos.get(cid)
        if pos is None:
            pos = canon_pos[cid] = len(canon_ids)
            canon_ids.append(cid)
            canon_names.append(cname)
        key_to_canon[i] = pos
    # Arrow/numpy-native payload: ray.get of these buffers is near-zero-
    # copy from the local object store, so plain TASKS can re-resolve the
    # broadcast per call without an actor pool's startup cost.
    return {
        "keys": pa.array(keys, pa.string()),
        "key_to_canon": key_to_canon,
        "canon_ids": pa.array(canon_ids, pa.string()),
        "canon_names": pa.array(canon_names, pa.string()),
    }


class EdgeRewriter:
    """Rewrite stage holding the broadcast alias arrays. Works as a plain
    map_batches function via ``make_edge_rewrite_fn`` (tasks re-resolve the
    arrow-native broadcast per call, near-zero-copy) or as an actor pool."""

    def __init__(self, alias_ref, num_buckets: int = 256, max_contexts: int = 8):
        b = ray.get(alias_ref) if not isinstance(alias_ref, dict) else alias_ref
        self.keys = b["keys"]
        self.key_to_canon = b["key_to_canon"]
        self.canon_ids = b["canon_ids"]
        self.canon_names = b["canon_names"]
        self.n_canon = max(1, len(b["canon_ids"]))
        self.rels = pa.array(REL_TYPES, pa.string())
        self.num_buckets = num_buckets
        self.max_contexts = max_contexts

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch.column("row_kind"), "edge"))
        if batch.num_rows == 0:
            return EDGE_PARTIAL_SCHEMA.empty_table()
        src_i = pc.index_in(batch.column("src_id"), self.keys)
        dst_i = pc.index_in(batch.column("dst_id"), self.keys)
        rel_i = pc.index_in(batch.column("rel_type"), self.rels)
        valid = pc.and_(pc.and_(pc.is_valid(src_i), pc.is_valid(dst_i)),
                        pc.is_valid(rel_i))
        batch = batch.filter(valid)
        if batch.num_rows == 0:
            return EDGE_PARTIAL_SCHEMA.empty_table()
        si = src_i.filter(valid).to_numpy(zero_copy_only=False).astype(np.int64)
        di = dst_i.filter(valid).to_numpy(zero_copy_only=False).astype(np.int64)
        ri = rel_i.filter(valid).to_numpy(zero_copy_only=False).astype(np.int64)
        sc = self.key_to_canon[si]
        dc = self.key_to_canon[di]
        keep = sc != dc  # self-loops after canonical merge
        if not keep.any():
            return EDGE_PARTIAL_SCHEMA.empty_table()
        batch = batch.filter(pa.array(keep))
        sc, dc, ri = sc[keep], dc[keep], ri[keep]
        n_occ = batch.column("n_occurrences").to_numpy(zero_copy_only=False)

        ekey = (sc * self.n_canon + dc) * len(REL_TYPES) + ri
        uniq, first_idx, inv = np.unique(ekey, return_index=True, return_inverse=True)
        n_sum = np.bincount(inv, weights=n_occ).astype(np.int64)
        order = pa.array(first_idx)
        usc = sc[first_idx]
        udc = dc[first_idx]
        # vectorized MAX over confidence (not first-seen): correct for any
        # upstream extractor with per-edge confidences, not only the
        # constant-confidence pattern path (ADVICE r01)
        conf = batch.column("confidence").to_numpy(zero_copy_only=False).astype(np.float32)
        conf_max = np.full(len(uniq), -np.inf, dtype=np.float32)
        np.maximum.at(conf_max, inv, conf)
        contexts = _cap_contexts(
            pc.take(batch.column("contexts"), order), self.max_contexts
        )

        return pa.Table.from_arrays(
            [
                pa.array((uniq % self.num_buckets).astype(np.int32)),
                pa.array(uniq),
                pc.take(self.canon_ids, pa.array(usc)),
                pc.take(self.canon_ids, pa.array(udc)),
                pc.take(self.rels, pa.array(ri[first_idx])),
                pc.take(self.canon_names, pa.array(usc)),
                pc.take(self.canon_names, pa.array(udc)),
                pa.array(conf_max),
                pa.array(n_sum),
                contexts,
            ],
            schema=EDGE_PARTIAL_SCHEMA,
        )


def make_edge_rewrite_fn(alias_ref, num_buckets: int = 256, max_contexts: int = 8):
    """Plain-task form of the rewrite stage (no actor pool startup)."""

    def rewrite(batch: pa.Table) -> pa.Table:
        return EdgeRewriter(alias_ref, num_buckets, max_contexts)(batch)

    return rewrite


def tree_merge_edges(ds, level_batch_sizes=(2_000_000, 2_000_000_000),
                     materialize_between=True):
    """Sort-free reduce tree via cross-block batch coalescing: each level is
    a plain map_batches whose large batch_size bundles many input blocks
    into one merge call — no AllToAll at all (Ray's repartition/sort reduce
    phases run a single-task serial tail). The last level's batch spans the
    whole (already ~99% reduced) stream. Levels materialize between steps:
    the intermediate is tiny and chained streaming plans pay a measured
    ~2s/operator scheduling penalty on this Ray version. For corpora where
    the *distinct*-edge set itself outgrows one task, swap the last level
    for the keyed groupby(bucket) exchange — the merge UDF is shared
    between both shapes."""
    for bs in level_batch_sizes:
        ds = ds.map_batches(merge_edges, batch_format="pyarrow", batch_size=bs)
        if materialize_between:
            ds = ds.materialize()
    return ds


def _cap_contexts(ctx_arr, max_contexts: int):
    """Enforce the per-edge context cap on pipe-joined samples: rows whose
    sample exceeds the cap are truncated (vectorized count; Python split
    only on violating rows, normally none because the extraction combiner
    already caps at source)."""
    ctx = ctx_arr.combine_chunks() if hasattr(ctx_arr, "combine_chunks") else ctx_arr
    counts = pc.count_substring(ctx, "|")
    over = pc.greater_equal(counts, max_contexts)
    if not pc.any(over).as_py():
        return ctx
    py = ctx.to_pylist()
    for i in np.nonzero(over.to_numpy(zero_copy_only=False))[0]:
        if py[i]:
            py[i] = "|".join(py[i].split("|")[:max_contexts])
    return pa.array(py, pa.string())


def merge_edges(batch: pa.Table) -> pa.Table:
    """Partition/group merge → one row per ekey, all numpy/Arrow kernels.
    Confidence merges as a vectorized MAX (order-independent); context
    keeps the first partial's capped sample (documented relaxation of the
    reference's context union)."""
    ekey = batch.column("ekey").to_numpy(zero_copy_only=False)
    n_occ = batch.column("n_occurrences").to_numpy(zero_copy_only=False)
    uniq, first_idx, inv = np.unique(ekey, return_index=True, return_inverse=True)
    n_sum = np.bincount(inv, weights=n_occ).astype(np.int64)
    conf = batch.column("confidence").to_numpy(zero_copy_only=False).astype(np.float32)
    conf_max = np.full(len(uniq), -np.inf, dtype=np.float32)
    np.maximum.at(conf_max, inv, conf)
    order = pa.array(first_idx)
    cols = {name: pc.take(batch.column(name), order)
            for name in ("bucket", "src", "dst", "rel_type", "src_name",
                         "dst_name", "context")}
    return pa.Table.from_arrays(
        [
            cols["bucket"], pa.array(uniq), cols["src"], cols["dst"],
            cols["rel_type"], cols["src_name"], cols["dst_name"],
            pa.array(conf_max), pa.array(n_sum), cols["context"],
        ],
        schema=EDGE_PARTIAL_SCHEMA,
    )


def finalize_edges(batch: pa.Table) -> pa.Table:
    """Edges table for consumers: context back to list<string> (tiny —
    one row per deduped edge)."""
    ctxs = [c.split("|") if c else [] for c in batch.column("context").to_pylist()]
    return pa.Table.from_pydict(
        {
            "src": batch.column("src"),
            "dst": batch.column("dst"),
            "rel_type": batch.column("rel_type"),
            "confidence": batch.column("confidence"),
            "n_occurrences": batch.column("n_occurrences"),
            "context": pa.array(ctxs, pa.list_(pa.string())),
        }
    )


def triples_projection(batch: pa.Table) -> pa.Table:
    """Deduped edges → (subj, pred, obj) triples."""
    return pa.Table.from_pydict(
        {
            "subj": batch.column("src_name"),
            "pred": batch.column("rel_type"),
            "obj": batch.column("dst_name"),
            "confidence": batch.column("confidence"),
            "n_occurrences": batch.column("n_occurrences"),
        }
    )
