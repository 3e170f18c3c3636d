"""Join patterns as first-class operators (SURVEY.md §2.4 J-family).

- broadcast join: `ray.put` the small side once, map-side lookup per batch
  (the J2 pattern generalized to any dimension table);
- bucketed hash join: both sides hashed into B buckets on the key, matched
  per bucket inside map_groups — the portable large×large join shape.
Both have exact DuckDB oracles in __ray_entry__.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def broadcast_join(large_ds, small_table: pa.Table, key: str,
                   small_key: str | None = None):
    """Map-side hash join: the small side ships once via the object store;
    each batch resolves keys with vectorized ``pc.index_in``."""
    import pyarrow.compute as pc

    small_key = small_key or key
    ref = ray.put(small_table)

    def join(batch: pa.Table) -> pa.Table:
        small = ray.get(ref)
        idx = pc.index_in(batch.column(key), small.column(small_key))
        valid = pc.is_valid(idx)
        batch = batch.filter(valid)
        idx = idx.filter(valid)
        out = batch
        for name in small.column_names:
            if name == small_key:
                continue
            out = out.append_column(name, pc.take(small.column(name), idx))
        return out

    return large_ds.map_batches(join, batch_format="pyarrow")


def bucketed_count_join(large_ds, key: str, small_table: pa.Table,
                        small_key: str, label_col: str):
    """Per-key counts on the large side joined with the small side's label:
    per-batch partial counts (combiner) → groupby-sum → BROADCAST join of
    the label (the aggregate output is small by construction). For a
    genuine large×large keyed join see ``bucketed_hash_join``."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(key).to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(keys, return_counts=True)
        return pa.Table.from_pydict(
            {key: pa.array(uniq), "n": pa.array(counts.astype(np.int64))}
        )

    agg = (large_ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
           .groupby(key).aggregate(Sum("n", alias_name="n")))
    return broadcast_join(agg, small_table, key, small_key)


ROWS_PER_JOIN_BUCKET = 262_144


def derived_join_buckets(sf_dir: str, *tables: str, floor: int = 32,
                         rows_per_bucket: int = ROWS_PER_JOIN_BUCKET) -> int:
    """Metadata-cheap bucket count for ``bucketed_hash_join``: sums the
    parquet FOOTER row counts of the join inputs (no scan, no pipeline
    execution) and allots one bucket per ~``rows_per_bucket`` combined
    rows, so per-bucket memory stays constant as the corpus grows — the
    same no-fixed-B rule the event/passage exchanges follow. Row counts
    are pre-filter upper bounds, which only ever over-provisions buckets."""
    import pyarrow.parquet as pq

    n = sum(pq.read_metadata(f"{sf_dir}/{t}.parquet").num_rows
            for t in tables)
    return max(floor, int(n) // rows_per_bucket + 1)


def bucketed_hash_join(left_ds, right_ds, left_key: str, right_key: str,
                       left_cols: list[str], right_cols: list[str],
                       num_buckets: int = 32):
    """Large×large inner hash join, no broadcast side: both sides are
    hashed into ``num_buckets`` on an int64 key (multiplicative hash, so
    clustered key ranges still spread), co-located by ONE groupby(bucket)
    exchange, and matched inside ``map_groups`` with vectorized
    ``pc.index_in``.

    Semantics: N:1 — each left row joins its first matching right row
    (dimension-table contract; duplicate right keys keep the first). At
    cluster scale this is the shape to reach for when neither side fits a
    broadcast; per-bucket memory = |left|/B + |right|/B, so callers with
    corpus-proportional inputs must pass ``num_buckets`` derived from the
    input size (``derived_join_buckets``) rather than the floor default."""
    import pyarrow.compute as pc

    all_cols = list(left_cols) + list(right_cols)

    def tag(side: int, key_col: str, cols: list[str]):
        def fn(batch: pa.Table) -> pa.Table:
            keys = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
            bucket = ((keys.astype(np.uint64) * np.uint64(2654435761))
                      % np.uint64(1 << 32)) % np.uint64(num_buckets)
            arrays = {
                "bucket": pa.array(bucket.astype(np.int32)),
                "jkey": pa.array(keys),
                "side": pa.array(np.full(len(keys), side, dtype=np.int8)),
            }
            for c in all_cols:
                arrays[c] = (batch.column(c) if c in cols
                             else pa.nulls(len(keys), pa.null()))
            return pa.Table.from_pydict(arrays)

        return fn

    left_tagged = left_ds.map_batches(tag(0, left_key, left_cols),
                                      batch_format="pyarrow")
    right_tagged = right_ds.map_batches(tag(1, right_key, right_cols),
                                        batch_format="pyarrow")

    def match(batch: pa.Table) -> pa.Table:
        side = batch.column("side")
        left = batch.filter(pc.equal(side, 0))
        right = batch.filter(pc.equal(side, 1))
        idx = pc.index_in(left.column("jkey"), right.column("jkey"))
        valid = pc.is_valid(idx)
        left = left.filter(valid)
        idx = idx.filter(valid)
        out = {left_key: left.column("jkey")}
        for c in left_cols:
            out[c] = left.column(c)
        for c in right_cols:
            out[c] = pc.take(right.column(c), idx)
        return pa.Table.from_pydict(out)

    return (left_tagged.union(right_tagged)
            .groupby("bucket")
            .map_groups(match, batch_format="pyarrow"))
