"""Canonicalization — THE wide step (salted two-phase groupby-aggregate).

Dataflow (SURVEY.md §7.4, reference semantics corpus/entity_linker.rs:379-429
+ string_similarity_linker.rs:126-165):

1. ``partial_aggregate`` (inside map_batches, NO shuffle): per-batch combine
   of entity rows keyed by (entity_type, normalize_string(name)) — the
   classic combiner. Each output row also carries the fuzzy blocking key,
   a coarse shuffle ``bucket`` (hash of the blocking key), and a
   deterministic salt, so a Zipf-hot entity ("Alice Harmon" in 1e9 docs)
   leaves each batch as ONE row, not 1e9.
2. optional salted pre-merge: groupby (bucket, salt) — bounds per-key
   fan-in to ``salt_partitions`` rows before the final exchange (explicit
   hot-key skew handling per the north rule).
3. final: groupby (bucket) → map_groups: a blocking key always lands in
   exactly one bucket, so the group merges exact clusters per
   (type, norm_name) and then runs greedy fuzzy clustering per block
   (functions/linking.py). O(n²) only inside a block.

Coarse buckets (vs one Ray group per key) keep the per-group invocation
overhead off the hot path while the *logical* grouping stays per-key via
dict merges inside the UDF.

Output: canonical entity rows + per-member alias ids (exploded afterwards
into the broadcastable alias→canonical map).

Scale note: ``docs`` lists give *exact* doc_frequency; at 10^12-doc scale
the hot-key doc list is the one unbounded payload — set
``doc_frequency_mode='hll'`` to carry fixed-size mergeable HyperLogLog
registers instead (functions/sketch.py): same dataflow, bounded payload,
~3% count error at the default precision.
"""

from __future__ import annotations

import zlib

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.linking import (
    ExactCluster,
    block_key,
    fuzzy_cluster_block,
)
from ..functions.textfns import normalize_string

PARTIAL_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("salt", pa.int32()),
        ("block", pa.string()),
        ("entity_type", pa.string()),
        ("norm_name", pa.string()),
        ("alias_names", pa.list_(pa.string())),
        ("alias_counts", pa.list_(pa.int64())),
        ("mention_count", pa.int64()),
        ("max_confidence", pa.float32()),
        ("docs", pa.list_(pa.string())),
        # HyperLogLog registers when doc_frequency_mode='hll' (bounded
        # per-key payload; empty bytes in exact mode)
        ("docs_hll", pa.binary()),
    ]
)

CANONICAL_FULL_SCHEMA = pa.schema(
    [
        ("canonical_id", pa.string()),
        ("canonical_name", pa.string()),
        ("entity_type", pa.string()),
        ("aliases", pa.list_(pa.string())),
        ("doc_frequency", pa.int64()),
        ("mention_count", pa.int64()),
        ("confidence", pa.float32()),
        ("member_entity_ids", pa.list_(pa.string())),
    ]
)


def _partials_to_table(
    acc: dict[tuple[str, str], ExactCluster], salt_of, num_buckets: int
) -> pa.Table:
    rows = {name: [] for name in PARTIAL_SCHEMA.names}
    for (etype, norm), c in acc.items():
        blk = block_key(etype, norm)
        rows["bucket"].append(zlib.crc32(blk.encode()) % num_buckets)
        rows["salt"].append(salt_of(c))
        rows["block"].append(blk)
        rows["entity_type"].append(etype)
        rows["norm_name"].append(norm)
        rows["alias_names"].append(list(c.name_counts.keys()))
        rows["alias_counts"].append(list(c.name_counts.values()))
        rows["mention_count"].append(c.mention_count)
        rows["max_confidence"].append(c.max_confidence)
        rows["docs"].append(sorted(c.docs))
        rows["docs_hll"].append(bytes(c.hll))
    return pa.Table.from_arrays(
        [pa.array(rows[f.name], f.type) for f in PARTIAL_SCHEMA],
        schema=PARTIAL_SCHEMA,
    )


def make_partial_aggregate_fn(salt_partitions: int = 8, num_buckets: int = 64,
                              doc_frequency_mode: str = "exact",
                              hll_p: int = 10):
    """Per-batch combiner: tagged extraction rows → one partial row per
    (entity_type, normalized name). ``doc_frequency_mode='hll'`` swaps the
    exact per-key doc list for fixed-size HyperLogLog registers — the
    bounded-payload path for Zipf-hot keys at corpus scale."""
    from ..functions.sketch import hll_add, hll_create

    use_hll = doc_frequency_mode == "hll"

    def partial_aggregate(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch.column("row_kind"), "entity"))
        names = batch.column("name").to_pylist()
        etypes = batch.column("entity_type").to_pylist()
        confs = batch.column("confidence").to_pylist()
        n_rows = batch.column("n_rows").to_pylist()
        n_mentions = batch.column("n_mentions").to_pylist()
        doc_ids = batch.column("doc_id").to_pylist()

        acc: dict[tuple[str, str], ExactCluster] = {}
        min_doc: dict[tuple[str, str], str] = {}
        hlls: dict[tuple[str, str], bytearray] = {}
        for name, etype, conf, nr, nm, doc in zip(
            names, etypes, confs, n_rows, n_mentions, doc_ids
        ):
            norm = normalize_string(name)
            key = (etype, norm)
            c = acc.get(key)
            if c is None:
                c = acc[key] = ExactCluster(etype, norm, {})
            c.name_counts[name] = c.name_counts.get(name, 0) + nr
            c.mention_count += nm
            c.max_confidence = max(c.max_confidence, conf)
            if use_hll:
                reg = hlls.get(key)
                if reg is None:
                    reg = hlls[key] = hll_create(hll_p)
                hll_add(reg, doc, hll_p)
                if key not in min_doc or doc < min_doc[key]:
                    min_doc[key] = doc
            else:
                c.docs.add(doc)
        for key, reg in hlls.items():
            acc[key].hll = bytes(reg)

        def salt_of(c: ExactCluster) -> int:
            if salt_partitions <= 1:
                return 0
            if c.docs:
                first_doc = min(c.docs)
            else:
                first_doc = min_doc.get((c.entity_type, c.norm_name), "")
            return zlib.crc32(f"{c.norm_name}|{first_doc}".encode()) % salt_partitions

        return _partials_to_table(acc, salt_of, num_buckets)

    return partial_aggregate


def _merge_partial_rows(batch: pa.Table) -> dict[tuple[str, str], ExactCluster]:
    from ..functions.sketch import hll_merge

    acc: dict[tuple[str, str], ExactCluster] = {}
    for etype, norm, anames, acounts, mc, conf, docs, hll in zip(
        batch.column("entity_type").to_pylist(),
        batch.column("norm_name").to_pylist(),
        batch.column("alias_names").to_pylist(),
        batch.column("alias_counts").to_pylist(),
        batch.column("mention_count").to_pylist(),
        batch.column("max_confidence").to_pylist(),
        batch.column("docs").to_pylist(),
        batch.column("docs_hll").to_pylist(),
    ):
        key = (etype, norm)
        c = acc.get(key)
        if c is None:
            c = acc[key] = ExactCluster(etype, norm, {})
        for name, cnt in zip(anames, acounts):
            c.name_counts[name] = c.name_counts.get(name, 0) + int(cnt)
        c.mention_count += int(mc)
        c.max_confidence = max(c.max_confidence, float(conf))
        c.docs |= set(docs)
        if hll:
            c.hll = hll_merge(c.hll, hll)
    return acc


def make_salted_merge_fn(num_buckets: int = 64):
    """Combine partial rows per (type, norm, salt) — still PARTIAL-shaped,
    just with fan-in collapsed. Works both as a pre-shuffle map_batches
    combiner (mixed salts per batch) and as the (bucket, salt) group merge."""

    def merge_partials_group(batch: pa.Table) -> pa.Table:
        from ..functions.sketch import hll_merge

        acc: dict[tuple[str, str, int], ExactCluster] = {}
        for etype, norm, salt, anames, acounts, mc, conf, docs, hll in zip(
            batch.column("entity_type").to_pylist(),
            batch.column("norm_name").to_pylist(),
            batch.column("salt").to_pylist(),
            batch.column("alias_names").to_pylist(),
            batch.column("alias_counts").to_pylist(),
            batch.column("mention_count").to_pylist(),
            batch.column("max_confidence").to_pylist(),
            batch.column("docs").to_pylist(),
            batch.column("docs_hll").to_pylist(),
        ):
            key = (etype, norm, int(salt))
            c = acc.get(key)
            if c is None:
                c = acc[key] = ExactCluster(etype, norm, {})
            for name, cnt in zip(anames, acounts):
                c.name_counts[name] = c.name_counts.get(name, 0) + int(cnt)
            c.mention_count += int(mc)
            c.max_confidence = max(c.max_confidence, float(conf))
            c.docs |= set(docs)
            if hll:
                c.hll = hll_merge(c.hll, hll)
        rows = {name: [] for name in PARTIAL_SCHEMA.names}
        for (etype, norm, salt), c in acc.items():
            blk = block_key(etype, norm)
            rows["bucket"].append(zlib.crc32(blk.encode()) % num_buckets)
            rows["salt"].append(salt)
            rows["block"].append(blk)
            rows["entity_type"].append(etype)
            rows["norm_name"].append(norm)
            rows["alias_names"].append(list(c.name_counts.keys()))
            rows["alias_counts"].append(list(c.name_counts.values()))
            rows["mention_count"].append(c.mention_count)
            rows["max_confidence"].append(c.max_confidence)
            rows["docs"].append(sorted(c.docs))
            rows["docs_hll"].append(bytes(c.hll))
        return pa.Table.from_arrays(
            [pa.array(rows[f.name], f.type) for f in PARTIAL_SCHEMA],
            schema=PARTIAL_SCHEMA,
        )

    return merge_partials_group


def make_finalize_bucket_fn(threshold: float = 0.85, max_edit_distance: int = 2,
                            use_phonetic: bool = False,
                            linking_strategy: str = "fuzzy"):
    """(bucket) group → canonical clusters: exact merge per key, then the
    configured linking strategy per blocking key (a block never spans
    buckets). Strategies: 'fuzzy' (greedy seed-absorb,
    entity_linker.rs:379-429) or 'lmcd' (confident-dedup,
    entity_linker.rs:296-376)."""
    from ..functions.linking import lmcd_cluster_block

    def finalize_bucket(batch: pa.Table) -> pa.Table:
        acc = _merge_partial_rows(batch)
        blocks: dict[str, list[ExactCluster]] = {}
        for (etype, norm), c in acc.items():
            blocks.setdefault(block_key(etype, norm), []).append(c)
        out = {name: [] for name in CANONICAL_FULL_SCHEMA.names}
        for blk in sorted(blocks):
            if linking_strategy == "lmcd":
                blk_out = lmcd_cluster_block(blocks[blk])
            else:
                blk_out = fuzzy_cluster_block(
                    blocks[blk], threshold=threshold,
                    max_edit_distance=max_edit_distance,
                    use_phonetic=use_phonetic,
                )
            for c in blk_out:
                out["canonical_id"].append(c.canonical_id)
                out["canonical_name"].append(c.canonical_name)
                out["entity_type"].append(c.entity_type)
                out["aliases"].append(c.aliases)
                out["doc_frequency"].append(c.doc_frequency)
                out["mention_count"].append(c.mention_count)
                out["confidence"].append(c.confidence)
                out["member_entity_ids"].append(c.member_entity_ids)
        return pa.Table.from_arrays(
            [pa.array(out[f.name], f.type) for f in CANONICAL_FULL_SCHEMA],
            schema=CANONICAL_FULL_SCHEMA,
        )

    return finalize_bucket


def explode_alias_map(batch: pa.Table) -> pa.Table:
    """canonical-full rows → alias map rows (entity_id → canonical)."""
    out = {"entity_id": [], "canonical_id": [], "canonical_name": [], "entity_type": []}
    for cid, cname, etype, members in zip(
        batch.column("canonical_id").to_pylist(),
        batch.column("canonical_name").to_pylist(),
        batch.column("entity_type").to_pylist(),
        batch.column("member_entity_ids").to_pylist(),
    ):
        for mid in members:
            out["entity_id"].append(mid)
            out["canonical_id"].append(cid)
            out["canonical_name"].append(cname)
            out["entity_type"].append(etype)
    return pa.Table.from_pydict(out)
