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
                        small_key: str, label_col: str, num_buckets: int = 16):
    """Per-key counts on the large side joined with the small side's label:
    per-batch partial counts (combiner) → groupby-sum → broadcast label."""
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
