"""Graph snapshot hashing + delta computation (incremental §2.10).

Reference: incremental/delta_computation.rs:65,222-240 — GraphSnapshot
content hashes + a Bloom filter fast-path for membership checks before the
exact comparison, producing a GraphDelta {added, removed, modified}.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field


class BloomFilter:
    """Minimal deterministic Bloom filter (delta_computation.rs:22-45):
    k hash functions derived from md5 with salt, bit array of m bits."""

    def __init__(self, m_bits: int = 1 << 16, k_hashes: int = 4):
        self.m = m_bits
        self.k = k_hashes
        self.bits = bytearray(m_bits // 8)

    def _positions(self, item: str):
        for i in range(self.k):
            h = hashlib.md5(f"{i}\x00{item}".encode()).digest()
            yield int.from_bytes(h[:8], "big") % self.m

    def add(self, item: str) -> None:
        for pos in self._positions(item):
            self.bits[pos // 8] |= 1 << (pos % 8)

    def __contains__(self, item: str) -> bool:
        return all(self.bits[p // 8] & (1 << (p % 8)) for p in self._positions(item))


def row_hash(row: dict, keys: tuple[str, ...]) -> str:
    payload = "\x1f".join(str(row.get(k)) for k in keys)
    return hashlib.md5(payload.encode()).hexdigest()


@dataclass
class GraphSnapshot:
    """Content hashes per entity/edge id (exact tier) + Bloom fast path."""

    entity_hashes: dict[str, str] = field(default_factory=dict)
    edge_hashes: dict[str, str] = field(default_factory=dict)
    bloom: BloomFilter = field(default_factory=BloomFilter)

    @classmethod
    def from_tables(cls, entities: list[dict], edges: list[dict]) -> "GraphSnapshot":
        snap = cls()
        for e in entities:
            h = row_hash(e, ("canonical_name", "entity_type", "mention_count",
                             "doc_frequency"))
            snap.entity_hashes[e["canonical_id"]] = h
            snap.bloom.add(e["canonical_id"])
        for r in edges:
            key = f"{r['src']}->{r['dst']}:{r['rel_type']}"
            snap.edge_hashes[key] = row_hash(r, ("n_occurrences", "confidence"))
            snap.bloom.add(key)
        return snap


@dataclass
class GraphDelta:
    added_entities: list[str]
    removed_entities: list[str]
    modified_entities: list[str]
    added_edges: list[str]
    removed_edges: list[str]
    modified_edges: list[str]

    @property
    def is_empty(self) -> bool:
        return not any([self.added_entities, self.removed_entities,
                        self.modified_entities, self.added_edges,
                        self.removed_edges, self.modified_edges])


def compute_delta(old: GraphSnapshot, new: GraphSnapshot) -> GraphDelta:
    """Bloom filter prunes definite-new ids cheaply; exact hashes decide
    modified vs unchanged (delta_computation.rs:222-240)."""
    added_e, modified_e = [], []
    for eid, h in new.entity_hashes.items():
        if eid not in old.bloom or eid not in old.entity_hashes:
            added_e.append(eid)
        elif old.entity_hashes[eid] != h:
            modified_e.append(eid)
    removed_e = [eid for eid in old.entity_hashes if eid not in new.entity_hashes]

    added_r, modified_r = [], []
    for key, h in new.edge_hashes.items():
        if key not in old.bloom or key not in old.edge_hashes:
            added_r.append(key)
        elif old.edge_hashes[key] != h:
            modified_r.append(key)
    removed_r = [key for key in old.edge_hashes if key not in new.edge_hashes]
    return GraphDelta(sorted(added_e), sorted(removed_e), sorted(modified_e),
                      sorted(added_r), sorted(removed_r), sorted(modified_r))
