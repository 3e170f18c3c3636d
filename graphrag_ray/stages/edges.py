"""Edge rewrite + dedup → edges table and (subj, pred, obj) triples.

Dataflow:
1. broadcast the alias→canonical map once (``ray.put``); each rewrite actor
   reads it in ``__init__`` — the small-side lookup is shipped once per
   actor, never per batch (J2, SURVEY.md §2.4). At a scale where the alias
   map itself outgrows worker memory the swap-in is a hash-partitioned join
   on src/dst; broadcast is correct while |entities| ≪ |corpus|.
2. rewrite src/dst to canonical ids inside map_batches, drop self-loops
   (variants of the same entity that merged), and per-batch pre-dedup on
   (src, dst, rel_type) — the combiner that keeps the hot-edge shuffle
   bounded. Each combined row carries a coarse ``bucket`` (hash of the
   edge key) for the final exchange.
3. groupby (bucket) → merge per (src, dst, rel_type) inside the group UDF:
   max confidence, occurrence count, union of context chunk ids capped at
   ``max_contexts`` (G7 semantics, gleaning_extractor.rs:450-467 first-wins
   generalized to a merge). Coarse buckets amortize per-group overhead; the
   per-key merge is a dict pass inside the UDF.

Triples are a projection of the deduped edges with canonical *names*
(parquet.rs:425-435 relationships + atomic_fact_extractor.rs:29-40 shape).
"""

from __future__ import annotations

import zlib

import pyarrow as pa
import pyarrow.compute as pc

import ray

EDGE_PARTIAL_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("src", pa.string()),
        ("dst", pa.string()),
        ("rel_type", pa.string()),
        ("src_name", pa.string()),
        ("dst_name", pa.string()),
        ("confidence", pa.float32()),
        ("n_occurrences", pa.int64()),
        ("context", pa.list_(pa.string())),
    ]
)

EDGE_FULL_SCHEMA = EDGE_PARTIAL_SCHEMA.remove(0)  # without bucket


class EdgeRewriter:
    """Actor-pool map_batches stage holding the broadcast alias map."""

    def __init__(self, alias_map_ref, max_contexts: int = 64, num_buckets: int = 64):
        # one ray.get per actor (zero-copy read from the local object store)
        self.alias_map: dict[str, tuple[str, str]] = ray.get(alias_map_ref)
        self.max_contexts = max_contexts
        self.num_buckets = num_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch.column("row_kind"), "edge"))
        srcs = batch.column("src_id").to_pylist()
        dsts = batch.column("dst_id").to_pylist()
        rels = batch.column("rel_type").to_pylist()
        confs = batch.column("confidence").to_pylist()
        chunks = batch.column("chunk_id").to_pylist()

        acc: dict[tuple[str, str, str], list] = {}
        for src, dst, rel, conf, chunk in zip(srcs, dsts, rels, confs, chunks):
            s = self.alias_map.get(src)
            d = self.alias_map.get(dst)
            if s is None or d is None:
                continue  # endpoint dropped (J1 drop-on-miss, core/mod.rs:395-410)
            if s[0] == d[0]:
                continue  # self-loop after canonical merge
            key = (s[0], d[0], rel)
            slot = acc.get(key)
            if slot is None:
                acc[key] = [s[1], d[1], float(conf), 1, [chunk]]
            else:
                slot[2] = max(slot[2], float(conf))
                slot[3] += 1
                if len(slot[4]) < self.max_contexts:
                    slot[4].append(chunk)

        out = {name: [] for name in EDGE_PARTIAL_SCHEMA.names}
        for (src, dst, rel), (sn, dn, conf, n, ctx) in acc.items():
            out["bucket"].append(zlib.crc32(f"{src}|{dst}|{rel}".encode()) % self.num_buckets)
            out["src"].append(src)
            out["dst"].append(dst)
            out["rel_type"].append(rel)
            out["src_name"].append(sn)
            out["dst_name"].append(dn)
            out["confidence"].append(conf)
            out["n_occurrences"].append(n)
            out["context"].append(ctx)
        return pa.Table.from_arrays(
            [pa.array(out[f.name], f.type) for f in EDGE_PARTIAL_SCHEMA],
            schema=EDGE_PARTIAL_SCHEMA,
        )


def make_merge_edges_fn(max_contexts: int = 64):
    """(bucket) group → one row per (src, dst, rel_type)."""

    def merge_edges(batch: pa.Table) -> pa.Table:
        acc: dict[tuple[str, str, str], list] = {}
        for src, dst, rel, sn, dn, conf, n, ctx in zip(
            batch.column("src").to_pylist(),
            batch.column("dst").to_pylist(),
            batch.column("rel_type").to_pylist(),
            batch.column("src_name").to_pylist(),
            batch.column("dst_name").to_pylist(),
            batch.column("confidence").to_pylist(),
            batch.column("n_occurrences").to_pylist(),
            batch.column("context").to_pylist(),
        ):
            key = (src, dst, rel)
            slot = acc.get(key)
            if slot is None:
                acc[key] = [sn, dn, float(conf), int(n), list(ctx)]
            else:
                slot[2] = max(slot[2], float(conf))
                slot[3] += int(n)
                room = max_contexts - len(slot[4])
                if room > 0:
                    slot[4].extend(ctx[:room])
        out = {name: [] for name in EDGE_FULL_SCHEMA.names}
        for (src, dst, rel), (sn, dn, conf, n, ctx) in acc.items():
            out["src"].append(src)
            out["dst"].append(dst)
            out["rel_type"].append(rel)
            out["src_name"].append(sn)
            out["dst_name"].append(dn)
            out["confidence"].append(conf)
            out["n_occurrences"].append(n)
            # dedup contexts preserving order, cap
            seen: set[str] = set()
            uniq = []
            for c in ctx:
                if c not in seen:
                    seen.add(c)
                    uniq.append(c)
                    if len(uniq) >= max_contexts:
                        break
            out["context"].append(uniq)
        return pa.Table.from_arrays(
            [pa.array(out[f.name], f.type) for f in EDGE_FULL_SCHEMA],
            schema=EDGE_FULL_SCHEMA,
        )

    return merge_edges


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
