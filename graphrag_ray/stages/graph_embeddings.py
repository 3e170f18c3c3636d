"""L5: Node2Vec + GraphSAGE graph embeddings (graph/embeddings.rs).

Reference semantics transcribed where they are deterministic; the two
inherently sequential/thread-random parts are replaced by distributed,
deterministic equivalents (documented divergences):

- WALKS (embeddings.rs:160-248): the p/q-biased random walk is identical,
  but each (node, walk_idx) seeds its own md5-derived RNG instead of one
  shared thread_rng — walks become a pure function of the graph and seed,
  so generation is an embarrassingly parallel map over walk seeds with the
  adjacency broadcast once.
- SKIP-GRAM (embeddings.rs:263-305): the reference applies 'move-closer'
  updates sequentially per pair; here each epoch computes ALL pair deltas
  against the epoch-start embeddings and applies their sum once
  (batch-synchronous SGD — the standard distributed form). Same objective,
  different update order.
- GraphSAGE (embeddings.rs:355-590): mean-aggregator layers
  h_v = normalize(0.5·h_v + 0.5·mean(h_N(v))) over md5-initialized
  features — per-layer distributed map with the previous layer broadcast.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray


def _seeded_rng(tag: str) -> np.random.RandomState:
    seed = int.from_bytes(hashlib.md5(tag.encode()).digest()[:4], "big")
    return np.random.RandomState(seed)


def build_adjacency(edge_rows: list[tuple[str, str, float]]):
    adj: dict[str, list] = {}
    for a, b, w in edge_rows:
        adj.setdefault(a, []).append((b, w))
        adj.setdefault(b, []).append((a, w))
    return {k: sorted(v) for k, v in adj.items()}  # deterministic order


def biased_walk(adj: dict, start: str, walk_length: int, p: float, q: float,
                rng: np.random.RandomState) -> list[str]:
    """Node2Vec biased walk (embeddings.rs:175-248)."""
    walk = [start]
    for _ in range(1, walk_length):
        cur = walk[-1]
        neighbors = adj.get(cur)
        if not neighbors:
            break
        if len(walk) == 1:
            walk.append(neighbors[rng.randint(len(neighbors))][0])
            continue
        prev = walk[-2]
        probs = np.array(
            [w * (1.0 / p if nb == prev else 1.0 / q) for nb, w in neighbors],
            dtype=np.float64)
        s = probs.sum()
        if s > 0:
            probs /= s
        r = rng.rand()
        cum = np.cumsum(probs)
        idx = int(np.searchsorted(cum, r))
        walk.append(neighbors[min(idx, len(neighbors) - 1)][0])
    return walk


def node2vec(edges_ds, dimension: int = 32, walk_length: int = 20,
             walks_per_node: int = 4, context_size: int = 5,
             return_param: float = 1.0, inout_param: float = 1.0,
             learning_rate: float = 0.025, epochs: int = 3,
             weight_column: str | None = None):
    """Distributed Node2Vec: walk seeds fan out as a Dataset (adjacency
    broadcast once); each epoch aggregates pair deltas per node with a
    per-batch combiner and applies them synchronously."""
    cols = ["src", "dst"] + ([weight_column] if weight_column else [])
    rows = edges_ds.select_columns(cols).take_all()
    adj = build_adjacency(
        [(r["src"], r["dst"],
          float(r[weight_column]) if weight_column else 1.0) for r in rows])
    nodes = sorted(adj)
    n = len(nodes)
    if n == 0:
        return ray.data.from_items([])
    node_index = {v: i for i, v in enumerate(nodes)}
    adj_ref = ray.put(adj)

    seeds = ray.data.from_items(
        [{"node": v, "walk": k} for k in range(walks_per_node) for v in nodes]
    )

    def gen_walks(batch: pa.Table) -> pa.Table:
        a = ray.get(adj_ref)
        out = []
        for v, k in zip(batch.column("node").to_pylist(),
                        batch.column("walk").to_pylist()):
            rng = _seeded_rng(f"n2v:{v}:{k}")
            out.append(biased_walk(a, v, walk_length, return_param,
                                   inout_param, rng))
        return pa.Table.from_pydict(
            {"walk_nodes": pa.array(out, pa.list_(pa.string()))})

    walks_ds = seeds.map_batches(gen_walks, batch_format="pyarrow").materialize()

    # pair extraction once (walks are fixed across epochs, like the ref)
    def pair_rows(batch: pa.Table) -> pa.Table:
        t_idx, c_idx = [], []
        for walk in batch.column("walk_nodes").to_pylist():
            ids = [node_index[v] for v in walk]
            for i, ti in enumerate(ids):
                lo = max(0, i - context_size)
                hi = min(len(ids), i + context_size + 1)
                for j in range(lo, hi):
                    if j != i:
                        t_idx.append(ti)
                        c_idx.append(ids[j])
        return pa.Table.from_pydict(
            {"t": pa.array(t_idx, pa.int32()), "c": pa.array(c_idx, pa.int32())})

    pairs_ds = walks_ds.map_batches(pair_rows, batch_format="pyarrow").materialize()

    # init (embeddings.rs:250-261 shape, md5-seeded for determinism)
    # float64 state: epoch deltas are summed across blocks whose order is
    # not guaranteed; float64 keeps the result stable to ~1e-15 regardless
    emb = np.stack([
        (_seeded_rng(f"n2v-init:{v}").rand(dimension).astype(np.float64) - 0.5)
        / dimension
        for v in nodes
    ])
    for _ in range(epochs):
        emb_ref = ray.put(emb)

        def epoch_deltas(batch: pa.Table) -> pa.Table:
            e = ray.get(emb_ref)
            t = batch.column("t").to_numpy(zero_copy_only=False)
            c = batch.column("c").to_numpy(zero_copy_only=False)
            diff = e[c] - e[t]          # move target toward context,
            delta = np.zeros_like(e)    # context away (rs:282-305)
            np.add.at(delta, t, learning_rate * diff)
            np.add.at(delta, c, -learning_rate * diff)
            return pa.Table.from_pydict(
                {"delta": pa.array([delta.reshape(-1).tolist()],
                                   pa.list_(pa.float64()))})

        parts = pairs_ds.map_batches(epoch_deltas, batch_format="pyarrow",
                                     batch_size=None).take_all()
        total = np.zeros_like(emb)
        for p_ in parts:
            total += np.asarray(p_["delta"], dtype=np.float64).reshape(emb.shape)
        emb = emb + total
    return ray.data.from_items(
        [{"node_id": v, "embedding": emb[i].astype(np.float32).tolist()}
         for i, v in enumerate(nodes)]
    )


def graphsage(edges_ds, dimension: int = 32, num_layers: int = 2,
              weight_column: str | None = None):
    """GraphSAGE mean-aggregator embeddings (embeddings.rs:355-520, the
    'mean' variant): md5-initialized features, per-layer distributed map
    over nodes with the previous layer broadcast."""
    cols = ["src", "dst"] + ([weight_column] if weight_column else [])
    rows = edges_ds.select_columns(cols).take_all()
    adj = build_adjacency(
        [(r["src"], r["dst"],
          float(r[weight_column]) if weight_column else 1.0) for r in rows])
    nodes = sorted(adj)
    if not nodes:
        return ray.data.from_items([])
    node_index = {v: i for i, v in enumerate(nodes)}
    feats = np.stack([
        _seeded_rng(f"sage-init:{v}").uniform(-1, 1, dimension).astype(np.float32)
        for v in nodes
    ])
    norms = np.linalg.norm(feats, axis=1, keepdims=True)
    feats = np.divide(feats, norms, out=feats, where=norms > 0)
    adj_ref = ray.put({node_index[v]: [node_index[nb] for nb, _ in nbs]
                       for v, nbs in adj.items()})
    nodes_ds = ray.data.from_items(
        [{"idx": i} for i in range(len(nodes))]).materialize()
    for layer in range(num_layers):
        feats_ref = ray.put(feats)

        def layer_fn(batch: pa.Table) -> pa.Table:
            f = ray.get(feats_ref)
            a = ray.get(adj_ref)
            out = []
            idxs = batch.column("idx").to_pylist()
            for i in idxs:
                nbs = a.get(i, [])
                nb_mean = f[nbs].mean(axis=0) if nbs else np.zeros(f.shape[1],
                                                                   np.float32)
                h = 0.5 * f[i] + 0.5 * nb_mean  # combine (rs:577-590)
                nrm = np.linalg.norm(h)
                out.append((h / nrm if nrm > 0 else h).tolist())
            return pa.Table.from_pydict(
                {"idx": pa.array(idxs, pa.int32()),
                 "h": pa.array(out, pa.list_(pa.float32()))})

        got = nodes_ds.map_batches(layer_fn, batch_format="pyarrow").take_all()
        nxt = np.zeros_like(feats)
        for r in got:
            nxt[r["idx"]] = np.asarray(r["h"], dtype=np.float32)
        feats = nxt
    return ray.data.from_items(
        [{"node_id": v, "embedding": feats[node_index[v]].tolist()}
         for v in nodes]
    )
