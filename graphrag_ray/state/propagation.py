"""Lazy propagation + async batch updates for incremental graphs (§2.10).

Behavioral counterparts of the reference's incremental machinery:

- ``LazyPropagationEngine`` — incremental/lazy_propagation.rs:126-534:
  queued node/edge updates, dirty-state tracking, propagation at a pending
  threshold / max delay / on query / forced, dependency chains cascaded to
  a bounded depth, stats. The Ray-native twist: the propagation result
  names the INVALIDATED CANONICALIZATION BUCKETS — crc32(blocking key) %
  num_buckets, the exact keys the distributed canonicalize groupby
  shuffles on (stages/canonicalize.py:86) — so the incremental tail can
  re-run ONLY the affected bucket groups instead of the whole corpus tail.
  The reference defers recompute in a mutable in-process graph; a Ray
  pipeline defers recompute of keyed partitions.

- ``AsyncBatchUpdater`` — incremental/async_batch.rs:52-460: queued update
  operations with back-pressure, adaptive flush (size OR age), N
  concurrent batch processors (Ray tasks — the tokio-worker analogue),
  per-batch results + aggregate statistics, drain-on-shutdown.

Both are SHARED-MUTABLE-STATE components — the documented legitimate case
for raw actors: wrap with ``ray.remote(LazyPropagationEngine)`` to serve a
cluster, or use in-process on the driver (tests exercise both).
"""

from __future__ import annotations

import time
import zlib
from dataclasses import dataclass, field

from ..functions.linking import block_key
from ..functions.textfns import normalize_string


@dataclass
class PropagationConfig:
    """lazy_propagation.rs:28-56 defaults."""

    propagation_threshold: int = 100
    max_delay_seconds: float = 300.0
    propagate_on_query: bool = True
    track_dependencies: bool = True
    max_propagation_depth: int = 3
    num_buckets: int = 64  # must match canonicalize.make_partial_aggregate_fn


@dataclass
class PendingUpdate:
    """lazy_propagation.rs:70-100 (status lifecycle collapses to
    pending→applied here — failures raise instead of parking)."""

    update_id: str
    kind: str                   # 'node' | 'edge'
    payload: dict
    created_at: float = field(default_factory=time.monotonic)


@dataclass
class PropagationResult:
    applied: int
    cascaded: int
    dirty_nodes: list[str]
    dirty_edges: list[tuple[str, str]]
    invalidated_buckets: list[int]
    elapsed_sec: float


class DirtyTracker:
    """lazy_propagation.rs:126-207: what changed since the last propagate."""

    def __init__(self) -> None:
        self.nodes: set[str] = set()
        self.edges: set[tuple[str, str]] = set()
        self.caches: set[str] = set()

    def mark_node(self, node_id: str) -> None:
        self.nodes.add(node_id)

    def mark_edge(self, src: str, dst: str) -> None:
        self.edges.add((src, dst))

    def invalidate_cache(self, key: str) -> None:
        self.caches.add(key)

    def clear(self) -> None:
        self.nodes.clear()
        self.edges.clear()
        self.caches.clear()

    def stats(self) -> dict:
        return {"dirty_nodes": len(self.nodes),
                "dirty_edges": len(self.edges),
                "invalidated_caches": len(self.caches)}


def bucket_of(entity_type: str, name: str, num_buckets: int = 64) -> int:
    """The canonicalization shuffle key for an entity — identical
    derivation to stages/canonicalize.py:86 (crc32(block_key) % buckets)."""
    blk = block_key(entity_type, normalize_string(name))
    return zlib.crc32(blk.encode()) % num_buckets


class LazyPropagationEngine:
    """Queue → mark dirty → propagate (threshold / age / query / force)."""

    def __init__(self, config: PropagationConfig | None = None) -> None:
        self.config = config or PropagationConfig()
        self._pending: list[PendingUpdate] = []
        self._dirty = DirtyTracker()
        self._node_names: dict[str, tuple[str, str]] = {}  # id -> (type, raw name)
        self._deps: dict[str, set[str]] = {}    # node -> dependents
        self._seq = 0
        self._last_propagation = time.monotonic()
        self._totals = {"propagations": 0, "updates_applied": 0,
                        "cascaded": 0}

    # --- queueing (lazy_propagation.rs:285-380)

    def queue_node_update(self, node_id: str, entity_type: str = "",
                          name: str | None = None, **attrs) -> str:
        """``name`` (the RAW entity name) pins the exact canonicalization
        bucket — entity ids strip spaces (textfns.normalize_name), so the
        blocking key is NOT recoverable from the id alone; without a name
        the bucket falls back to a deterministic id-derived hash (still a
        consistent invalidation key, but not the canonicalize one)."""
        self._seq += 1
        uid = f"u{self._seq}"
        if name is not None:
            self._node_names[node_id] = (entity_type, name)
        self._pending.append(PendingUpdate(
            uid, "node", {"node_id": node_id, "entity_type": entity_type,
                          **attrs}))
        self._maybe_auto_propagate()
        return uid

    def queue_edge_update(self, src: str, dst: str, **attrs) -> str:
        self._seq += 1
        uid = f"u{self._seq}"
        self._pending.append(PendingUpdate(
            uid, "edge", {"src": src, "dst": dst, **attrs}))
        self._maybe_auto_propagate()
        return uid

    def add_dependency(self, node_id: str, depends_on: str) -> None:
        """lazy_propagation.rs:516-529: ``node_id`` must be revisited when
        ``depends_on`` changes."""
        self._deps.setdefault(depends_on, set()).add(node_id)

    # --- propagation triggers

    def pending_count(self) -> int:
        return len(self._pending)

    def _due(self) -> bool:
        if len(self._pending) >= self.config.propagation_threshold:
            return True
        return (bool(self._pending)
                and time.monotonic() - self._last_propagation
                >= self.config.max_delay_seconds)

    def _maybe_auto_propagate(self) -> None:
        if self._due():
            self.propagate_pending_updates()

    def maybe_propagate_for_query(self) -> PropagationResult | None:
        """lazy_propagation.rs:507-514: a read settles pending state first
        (when configured) so queries never observe stale derived data."""
        if self.config.propagate_on_query and self._pending:
            return self.propagate_pending_updates()
        return None

    def force_propagate(self) -> PropagationResult:
        return self.propagate_pending_updates()

    def propagate_pending_updates(self) -> PropagationResult:
        """Apply every pending update to the dirty state, cascade through
        the dependency graph to bounded depth, and emit the invalidated
        canonicalization buckets (lazy_propagation.rs:382-481)."""
        t0 = time.monotonic()
        updates, self._pending = self._pending, []
        cascaded = 0
        for u in updates:
            if u.kind == "node":
                self._dirty.mark_node(u.payload["node_id"])
            else:
                src, dst = u.payload["src"], u.payload["dst"]
                self._dirty.mark_edge(src, dst)
                self._dirty.mark_node(src)
                self._dirty.mark_node(dst)
        if self.config.track_dependencies:
            frontier = set(self._dirty.nodes)
            for _depth in range(self.config.max_propagation_depth):
                nxt: set[str] = set()
                for node in frontier:
                    for dep in self._deps.get(node, ()):
                        if dep not in self._dirty.nodes:
                            nxt.add(dep)
                if not nxt:
                    break
                for dep in nxt:
                    self._dirty.mark_node(dep)
                cascaded += len(nxt)
                frontier = nxt
        # bucket invalidation: use the queued (type, RAW name) when known
        # (the exact canonicalize blocking key); otherwise a deterministic
        # id-derived fallback (consistent, but callers wanting bucket-
        # selective refresh must queue names).
        buckets: set[int] = set()
        for node in self._dirty.nodes:
            known = self._node_names.get(node)
            if known is not None:
                etype, name = known
            else:
                etype, _, name = node.partition("_")
                name = name or node
            buckets.add(bucket_of(etype, name, self.config.num_buckets))
        self._last_propagation = time.monotonic()
        self._totals["propagations"] += 1
        self._totals["updates_applied"] += len(updates)
        self._totals["cascaded"] += cascaded
        return PropagationResult(
            applied=len(updates),
            cascaded=cascaded,
            dirty_nodes=sorted(self._dirty.nodes),
            dirty_edges=sorted(self._dirty.edges),
            invalidated_buckets=sorted(buckets),
            elapsed_sec=round(time.monotonic() - t0, 6),
        )

    def dirty_stats(self) -> dict:
        return self._dirty.stats()

    def propagation_stats(self) -> dict:
        return dict(self._totals)

    def clear(self) -> None:
        self._pending.clear()
        self._dirty.clear()
        self._deps.clear()


# ---------------------------------------------------------------------------
# Async batch updater (incremental/async_batch.rs)


@dataclass
class AsyncBatchConfig:
    """async_batch.rs:26-73 defaults (sandbox-scaled)."""

    max_batch_size: int = 100
    max_batch_delay_sec: float = 1.0
    num_workers: int = 4
    enable_backpressure: bool = True
    max_queue_size: int = 1000


@dataclass
class BatchResult:
    batch_id: int
    n_operations: int
    elapsed_sec: float
    worker: int


class AsyncBatchUpdater:
    """High-throughput queued ingestion: ops accumulate into batches that
    flush at ``max_batch_size`` or ``max_batch_delay_sec``, and batches fan
    out to ``num_workers`` concurrent Ray tasks applying ``process_fn``
    (the rayon/tokio worker analogue; Ray tasks give the same CPU-bound
    parallelism without a second scheduler). ``submit`` applies
    back-pressure by draining completed work when the queue is full —
    ingestion never grows memory unboundedly (async_batch.rs:268-292)."""

    def __init__(self, process_fn, config: AsyncBatchConfig | None = None):
        import ray

        self.config = config or AsyncBatchConfig()
        self._process = ray.remote(_run_batch)
        self._process_fn = process_fn
        self._fn_ref = ray.put(process_fn)
        self._open_batch: list[dict] = []
        self._open_since = time.monotonic()
        self._in_flight: dict = {}     # ObjectRef -> batch_id
        self._completed: list[BatchResult] = []
        self._batch_seq = 0
        self._n_submitted = 0

    # --- ingestion

    def submit(self, operation: dict) -> None:
        import ray

        if (self.config.enable_backpressure
                and len(self._open_batch) + len(self._in_flight) * self.config.max_batch_size
                >= self.config.max_queue_size):
            # back-pressure: block on the oldest in-flight batch
            if self._in_flight:
                done, _ = ray.wait(list(self._in_flight), num_returns=1)
                self._harvest(done)
        self._open_batch.append(operation)
        self._n_submitted += 1
        if (len(self._open_batch) >= self.config.max_batch_size
                or (self._open_batch
                    and time.monotonic() - self._open_since
                    >= self.config.max_batch_delay_sec)):
            self._flush()

    def _flush(self) -> None:
        import ray

        if not self._open_batch:
            return
        # cap concurrency at num_workers: wait for a slot
        while len(self._in_flight) >= self.config.num_workers:
            done, _ = ray.wait(list(self._in_flight), num_returns=1)
            self._harvest(done)
        batch, self._open_batch = self._open_batch, []
        self._open_since = time.monotonic()
        self._batch_seq += 1
        ref = self._process.remote(self._fn_ref, batch, self._batch_seq,
                                   self._batch_seq % self.config.num_workers)
        self._in_flight[ref] = self._batch_seq

    def _harvest(self, refs) -> None:
        import ray

        for ref in refs:
            self._completed.append(ray.get(ref))
            del self._in_flight[ref]

    # --- lifecycle

    def shutdown(self) -> list[BatchResult]:
        """Drain: flush the open batch, wait for every in-flight batch."""
        import ray

        self._flush()
        while self._in_flight:
            done, _ = ray.wait(list(self._in_flight), num_returns=1)
            self._harvest(done)
        return sorted(self._completed, key=lambda b: b.batch_id)

    def statistics(self) -> dict:
        done = self._completed
        return {
            "submitted": self._n_submitted,
            "batches_completed": len(done),
            "operations_completed": sum(b.n_operations for b in done),
            "in_flight": len(self._in_flight),
            "open_batch": len(self._open_batch),
            "mean_batch_sec": (sum(b.elapsed_sec for b in done) / len(done)
                               if done else 0.0),
        }


def _run_batch(process_fn, operations: list[dict], batch_id: int,
               worker: int) -> BatchResult:
    t0 = time.monotonic()
    process_fn(operations)
    return BatchResult(batch_id=batch_id, n_operations=len(operations),
                       elapsed_sec=round(time.monotonic() - t0, 6),
                       worker=worker)
