"""Post-materialization graph analytics (SURVEY.md §2.9, §2.6).

The canonical entity graph is tiny relative to the corpus, so the iterative
algorithms (PageRank power iteration, connected components) run in one Ray
task over the collected node/edge tables — the same disposition as Leiden
(stages/community.py). Statistics are Dataset aggregations.

Semantics:
- PageRank: damping 0.85, ≤100 iterations, tolerance 1e-6, personalized
  reset vector optional (graph/pagerank.rs:19-43, 236-243).
- Connected components / degree centrality: graph/analytics.rs.
- Graph statistics: entity/type histogram + per-chunk density
  (graph/mod.rs:330-352).
- Top-k common entities (most chunks/mentions): bidirectional index
  get_common_entities (entity/bidirectional_index.rs:315-335) — the one
  global sort+limit, tiny output.
- Top-k semantic neighbors per entity (T1): cosine over entity-name hash
  embeddings, truncate max_connections=10, threshold 0.8
  (graph/mod.rs:244-289, config/mod.rs:1302-1305).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray


@ray.remote
def _pagerank_task(nodes, edges, damping, max_iterations, tolerance, personalization):
    """CSR-style vectorized power iteration (the reference itself uses a
    sparse CSR matvec, graph/pagerank.rs) — the per-edge Python loop is
    gone; each iteration is two numpy kernels (`take` + `np.add.at`)."""
    order = sorted(nodes)
    n = len(order)
    if n == 0:
        return pd.DataFrame({"entity_id": [], "score": []})
    node_index = pd.Index(order)
    if edges:
        ea = node_index.get_indexer([a for a, _ in edges])
        eb = node_index.get_indexer([b for _, b in edges])
        keep = (ea >= 0) & (eb >= 0) & (ea != eb)
        ea, eb = ea[keep], eb[keep]
        # undirected: each edge contributes both directions
        src = np.concatenate([ea, eb])
        tgt = np.concatenate([eb, ea])
    else:
        src = tgt = np.zeros(0, dtype=np.int64)
    out_deg = np.bincount(src, minlength=n).astype(np.float64)
    reset = np.full(n, 1.0 / n)
    if personalization:
        reset = np.zeros(n)
        for node, w in personalization.items():
            i = node_index.get_loc(node) if node in node_index else -1
            if i >= 0:
                reset[i] = w
        s = reset.sum()
        reset = reset / s if s > 0 else np.full(n, 1.0 / n)
    inv_deg = np.divide(1.0, out_deg, out=np.zeros(n), where=out_deg > 0)
    dangling_mask = out_deg == 0
    scores = np.full(n, 1.0 / n)
    for _ in range(max_iterations):
        contrib = scores * inv_deg
        new = np.zeros(n)
        np.add.at(new, tgt, contrib[src])
        dangling = scores[dangling_mask].sum()
        new = (1.0 - damping) * reset + damping * (new + dangling * reset)
        delta = np.abs(new - scores).sum()
        scores = new
        if delta < tolerance:
            break
    return pd.DataFrame({"entity_id": order, "score": scores})


def pagerank(
    entities_ds, edges_ds,
    damping: float = 0.85, max_iterations: int = 100, tolerance: float = 1e-6,
    personalization: dict[str, float] | None = None,
):
    nodes = [r["canonical_id"] for r in
             entities_ds.select_columns(["canonical_id"]).take_all()]
    edges = [(r["src"], r["dst"]) for r in
             edges_ds.select_columns(["src", "dst"]).take_all()]
    df = ray.get(_pagerank_task.remote(nodes, edges, damping, max_iterations,
                                       tolerance, personalization))
    return ray.data.from_pandas(df)


@ray.remote
def _components_task(nodes, edges):
    order = sorted(nodes)
    parent = {n: n for n in order}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a in parent and b in parent:
            ra, rb = find(a), find(b)
            if ra != rb:
                # deterministic union: smaller id becomes the root
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
    degree: dict[str, int] = {n: 0 for n in order}
    for a, b in edges:
        if a in degree and b in degree and a != b:
            degree[a] += 1
            degree[b] += 1
    return pd.DataFrame(
        {
            "entity_id": order,
            "component": [find(n) for n in order],
            "degree": [degree[n] for n in order],
        }
    )


def connected_components(entities_ds, edges_ds):
    """Union-find components + degree centrality (graph/analytics.rs)."""
    nodes = [r["canonical_id"] for r in
             entities_ds.select_columns(["canonical_id"]).take_all()]
    edges = [(r["src"], r["dst"]) for r in
             edges_ds.select_columns(["src", "dst"]).take_all()]
    return ray.data.from_pandas(ray.get(_components_task.remote(nodes, edges)))


def graph_stats(entities_ds, edges_ds, n_docs: int, n_chunks: int):
    """GraphStatistics parity (graph/mod.rs:330-352) + edge metrics."""
    ent = entities_ds.select_columns(["entity_type"]).to_pandas()
    n_entities = len(ent)
    n_edges = edges_ds.count()
    by_type = ent["entity_type"].value_counts().sort_index()
    rows = [
        {"stat": "entity_count", "value": float(n_entities)},
        {"stat": "relationship_count", "value": float(n_edges)},
        {"stat": "document_count", "value": float(n_docs)},
        {"stat": "chunk_count", "value": float(n_chunks)},
        {"stat": "average_entities_per_chunk",
         "value": float(n_entities / n_chunks) if n_chunks else 0.0},
        {"stat": "density",
         "value": float(n_edges / (n_entities * (n_entities - 1)))
         if n_entities > 1 else 0.0},
    ]
    rows.extend(
        {"stat": f"entity_type:{t}", "value": float(c)} for t, c in by_type.items()
    )
    return pd.DataFrame(rows)


def common_entities(entities_ds, k: int = 20):
    """T4: entities by mention count desc (tiny global sort+limit)."""
    df = entities_ds.select_columns(
        ["canonical_id", "canonical_name", "entity_type", "mention_count"]
    ).to_pandas()
    df = df.sort_values(["mention_count", "canonical_id"],
                        ascending=[False, True]).head(k)
    return df.reset_index(drop=True)


def semantic_neighbors(entities_ds, max_connections: int = 10,
                       similarity_threshold: float = 0.8, dim: int = 64):
    """T1: top-k cosine neighbors per entity over name hash-embeddings
    (graph/mod.rs:244-289), as DISTRIBUTED blocked all-pairs: entity blocks
    stay in the object store, (i, j) block pairs fan out across tasks (two
    blocks per task), each emits per-entity candidate rows above the
    threshold, and a groupby(entity) merge keeps the global top-k.
    Deterministic ordering: (-similarity, neighbor_id). Never a dense N×N
    on the driver."""
    import pyarrow as pa

    from .embed import HashEmbedder

    ds = entities_ds.select_columns(["canonical_id", "canonical_name"]).materialize()
    refs = ds.to_arrow_refs()
    nblocks = len(refs)
    if nblocks == 0:
        return pd.DataFrame({"entity_id": [], "neighbor_id": [], "similarity": []})
    pair_ds = ray.data.from_items(
        [{"i": i, "j": j} for i in range(nblocks) for j in range(i, nblocks)]
    )

    def block_pair(batch: pa.Table) -> pa.Table:
        emb = HashEmbedder(dim=dim)
        out_e, out_n, out_s = [], [], []

        def embed_block(tbl):
            names = tbl.column("canonical_name").to_pylist()
            ids = tbl.column("canonical_id").to_pylist()
            mat = (np.stack([emb.embed_text(nm) for nm in names])
                   if names else np.zeros((0, dim), dtype=np.float32))
            return ids, mat

        def emit(ids_a, mat_a, ids_b, mat_b, same):
            if not len(ids_a) or not len(ids_b):
                return
            sims = mat_a @ mat_b.T  # rows are unit vectors
            mask = sims > similarity_threshold
            if same:
                np.fill_diagonal(mask, False)
            ii, jj = np.nonzero(mask)
            for i_, j_ in zip(ii.tolist(), jj.tolist()):
                out_e.append(ids_a[i_])
                out_n.append(ids_b[j_])
                out_s.append(float(sims[i_, j_]))

        for i, j in zip(batch.column("i").to_pylist(),
                        batch.column("j").to_pylist()):
            tbl_i = ray.get(refs[i])
            ids_i, mat_i = embed_block(tbl_i)
            if j == i:
                emit(ids_i, mat_i, ids_i, mat_i, same=True)
            else:
                ids_j, mat_j = embed_block(ray.get(refs[j]))
                emit(ids_i, mat_i, ids_j, mat_j, same=False)
                emit(ids_j, mat_j, ids_i, mat_i, same=False)
        return pa.Table.from_pydict(
            {"entity_id": pa.array(out_e, pa.string()),
             "neighbor_id": pa.array(out_n, pa.string()),
             "similarity": pa.array(out_s, pa.float64())}
        )

    def topk_group(batch: pa.Table) -> pa.Table:
        sims = batch.column("similarity").to_numpy(zero_copy_only=False)
        nbr = np.asarray(batch.column("neighbor_id").to_pylist(), dtype=object)
        order = np.lexsort((nbr, -sims))[:max_connections]
        return batch.take(pa.array(order))

    cand = pair_ds.map_batches(block_pair, batch_size=1, batch_format="pyarrow")
    out = cand.groupby("entity_id").map_groups(topk_group, batch_format="pyarrow")
    return out.to_pandas()


def doc_cooccurrence_edges(extraction_ds, max_pairs_per_doc: int = 2000,
                           num_buckets: int = 64):
    """G8: per-doc entity pairs → 'co_occurs' edges conf 0.7
    (corpus/knowledge_graph.rs:192-240), pair count capped per doc to bound
    the quadratic blowup.

    A doc's entity rows may straddle block boundaries, so rows are first
    co-located by hash(doc_id) bucket (ONE small shuffle of entity rows),
    then pairs are formed per complete doc inside the group and summed.
    ``num_buckets`` is a floor — callers with corpus-proportional inputs
    derive it from the doc count (joins.derived_join_buckets) so
    per-bucket rows stay constant as the corpus grows."""
    import zlib

    import pyarrow as pa
    import pyarrow.compute as pc

    def bucketize(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.equal(batch.column("row_kind"), "entity"))
        docs = batch.column("doc_id").to_pylist()
        return pa.Table.from_pydict(
            {
                "bucket": pa.array(
                    [zlib.crc32(d.encode()) % num_buckets for d in docs], pa.int32()
                ),
                "doc_id": batch.column("doc_id"),
                "entity_id": batch.column("entity_id"),
            }
        )

    def pairs_in_bucket(batch: pa.Table) -> pa.Table:
        by_doc: dict[str, set[str]] = {}
        for doc, eid in zip(batch.column("doc_id").to_pylist(),
                            batch.column("entity_id").to_pylist()):
            by_doc.setdefault(doc, set()).add(eid)
        acc: dict[tuple[str, str], int] = {}
        for _doc, ent_set in by_doc.items():
            ents = sorted(ent_set)
            count = 0
            for i in range(len(ents)):
                for j in range(i + 1, len(ents)):
                    key = (ents[i], ents[j])
                    acc[key] = acc.get(key, 0) + 1
                    count += 1
                    if count >= max_pairs_per_doc:
                        break
                if count >= max_pairs_per_doc:
                    break
        return pa.Table.from_pydict(
            {
                "src": pa.array([k[0] for k in acc], pa.string()),
                "dst": pa.array([k[1] for k in acc], pa.string()),
                "n_docs": pa.array(list(acc.values()), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    agg = (
        extraction_ds.map_batches(bucketize, batch_format="pyarrow", batch_size=None)
        .groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )
    return agg.add_column("rel_type", lambda df: "co_occurs", batch_format="pandas") \
              .add_column("confidence", lambda df: 0.7, batch_format="pandas")


# ---------------------------------------------------------------------------
# L3: centralities + Louvain-style communities + graph metrics
# (behavioral transcription of graph/analytics.rs:69-487; same
# collected-graph disposition as PageRank — the canonical entity graph is
# tiny relative to the corpus. Betweenness/closeness are DISTRIBUTED: the
# CSR graph broadcasts once and per-source Dijkstras fan out as one task
# per source batch (_centrality_sources_task); above max_exact_sources the
# sources are sampled — source-sampled Brandes — so the V× multiplier
# stops being the scale killer. _centrality_task below is the single-task
# reference form kept for parity tests.)


@ray.remote
def _centrality_task(edges):
    """Degree / betweenness / closeness per node (analytics.rs:182-279).

    Betweenness counts ordered (source, target) pairs whose single
    Dijkstra shortest path contains the node as an interior vertex,
    normalized by (n-1)(n-2)/2 (:219-248); closeness is
    reachable/total_distance (:250-279). Efficient form: one Dijkstra tree
    per source + subtree-size accumulation (interior targets of v =
    subtree(v)-1) instead of the reference's per-pair re-Dijkstra —
    identical counts; shortest-path TIES are broken deterministically by
    (distance, node id) here, where the reference inherits HashMap
    iteration order (divergence only on equal-length paths)."""
    import heapq

    adjacency: dict[str, list] = {}
    degrees: dict[str, int] = {}
    for a, b, w in edges:
        adjacency.setdefault(a, []).append((b, w))
        adjacency.setdefault(b, []).append((a, w))
        degrees[a] = degrees.get(a, 0) + 1
        degrees[b] = degrees.get(b, 0) + 1
    nodes = sorted(adjacency)
    n = len(nodes)
    if n == 0:
        return pd.DataFrame({"node_id": [], "degree": [], "betweenness": [],
                             "closeness": []})
    bc = {v: 0.0 for v in nodes}
    closeness = {}
    for s in nodes:
        # deterministic Dijkstra (strict relaxation, (dist, id) heap order)
        dist = {s: 0.0}
        prev: dict[str, str] = {}
        done = set()
        heap = [(0.0, s)]
        order = []
        while heap:
            d, u = heapq.heappop(heap)
            if u in done:
                continue
            done.add(u)
            order.append(u)
            for v, w in adjacency.get(u, ()):
                alt = d + w
                if alt < dist.get(v, float("inf")):
                    dist[v] = alt
                    prev[v] = u
                    heapq.heappush(heap, (alt, v))
        # closeness (:250-279)
        reachable = len(done) - 1
        total = sum(dist[t] for t in done if t != s)
        closeness[s] = (reachable / total) if reachable > 0 and total > 0 else 0.0
        # subtree sizes over the shortest-path tree, farthest first
        size = {v: 1 for v in done}
        for v in reversed(order):
            p = prev.get(v)
            if p is not None:
                size[p] += size[v]
        for v in done:
            if v != s:
                interior_targets = size[v] - 1
                if interior_targets > 0:
                    bc[v] += interior_targets
    norm = (n - 1) * (n - 2) / 2.0 if n > 2 else 0.0
    return pd.DataFrame(
        {
            "node_id": nodes,
            "degree": [degrees.get(v, 0) / (n - 1) if n > 1 else 0.0
                       for v in nodes],
            "betweenness": [bc[v] / norm if norm else 0.0 for v in nodes],
            "closeness": [closeness[v] for v in nodes],
        }
    )


@ray.remote
def _centrality_sources_task(graph, src_indices):
    """One batch of Dijkstra sources over the broadcast CSR graph.

    Returns mergeable partials: betweenness accumulator (subtree-size
    counts per node), and incoming-distance (count, sum) per node — on an
    undirected graph d(s,v) = d(v,s), so closeness(v) =
    reachable(v)/total_dist(v) equals dist_cnt[v]/dist_sum[v] computed
    from the sources' trees; with ALL nodes as sources this is exactly the
    reference's per-node closeness (analytics.rs:250-279), with sampled
    sources it is the restricted-sample estimator (both counts scale
    linearly, so the ratio is consistent)."""
    import heapq

    nodes, indptr, nbrs, wts = graph
    n = len(nodes)
    bc = np.zeros(n, dtype=np.float64)
    dist_cnt = np.zeros(n, dtype=np.int64)
    dist_sum = np.zeros(n, dtype=np.float64)
    for s in src_indices:
        s = int(s)
        dist = {s: 0.0}
        prev: dict[int, int] = {}
        done: set[int] = set()
        heap = [(0.0, s)]
        order: list[int] = []
        while heap:
            d, u = heapq.heappop(heap)
            if u in done:
                continue
            done.add(u)
            order.append(u)
            for k in range(indptr[u], indptr[u + 1]):
                v = int(nbrs[k])
                alt = d + wts[k]
                if alt < dist.get(v, float("inf")):
                    dist[v] = alt
                    prev[v] = u
                    heapq.heappush(heap, (alt, v))
        size = {v: 1 for v in done}
        for v in reversed(order):
            p = prev.get(v)
            if p is not None:
                size[p] += size[v]
        for v in done:
            if v != s:
                interior = size[v] - 1
                if interior > 0:
                    bc[v] += interior
                dist_cnt[v] += 1
                dist_sum[v] += dist[v]
    return bc, dist_cnt, dist_sum


def centrality_scores(edges_ds, weight_column: str | None = None, *,
                      source_batches: int | None = None,
                      max_exact_sources: int = 4096, seed: int = 42):
    """L3 centralities (analytics.rs:182-279), DISTRIBUTED per source batch.

    The per-source Dijkstra loop is embarrassingly parallel: the CSR graph
    is broadcast once (``ray.put``), sources fan out as one task per batch,
    and the partials (betweenness accumulators, incoming-distance sums)
    merge by addition on the driver. Beyond ``max_exact_sources`` nodes the
    V× multiplier of exact betweenness stops scaling — sources are then
    SAMPLED (seeded, without replacement) and betweenness scaled by n/k
    (source-sampled Brandes estimator); closeness becomes the
    restricted-sample ratio. Exact results below the threshold are
    bit-identical to the single-task form (same (dist, sorted-node-rank)
    tie-breaks), which kgx_centrality oracles."""
    cols = ["src", "dst"] + ([weight_column] if weight_column else [])
    rows = edges_ds.select_columns(cols).take_all()
    edges = [(r["src"], r["dst"],
              float(r[weight_column]) if weight_column else 1.0)
             for r in rows]
    adjacency: dict[str, list] = {}
    degrees: dict[str, int] = {}
    for a, b, w in edges:
        adjacency.setdefault(a, []).append((b, w))
        adjacency.setdefault(b, []).append((a, w))
        degrees[a] = degrees.get(a, 0) + 1
        degrees[b] = degrees.get(b, 0) + 1
    nodes = sorted(adjacency)
    n = len(nodes)
    if n == 0:
        return ray.data.from_pandas(pd.DataFrame(
            {"node_id": [], "degree": [], "betweenness": [], "closeness": []}))
    idx_of = {v: i for i, v in enumerate(nodes)}
    indptr = np.zeros(n + 1, dtype=np.int64)
    for i, v in enumerate(nodes):
        indptr[i + 1] = indptr[i] + len(adjacency[v])
    nbrs = np.empty(indptr[-1], dtype=np.int64)
    wts = np.empty(indptr[-1], dtype=np.float64)
    pos = indptr[:-1].copy()
    for v in nodes:
        i = idx_of[v]
        for u, w in adjacency[v]:
            nbrs[pos[i]] = idx_of[u]
            wts[pos[i]] = w
            pos[i] += 1

    if n <= max_exact_sources:
        sources = np.arange(n)
        scale = 1.0
    else:
        rng = np.random.RandomState(seed)
        sources = np.sort(rng.choice(n, max_exact_sources, replace=False))
        scale = n / float(len(sources))
    graph_ref = ray.put((nodes, indptr, nbrs, wts))
    n_batches = source_batches or max(1, min(len(sources), 32))
    futures = [
        _centrality_sources_task.remote(graph_ref, batch)
        for batch in np.array_split(sources, n_batches) if len(batch)
    ]
    bc = np.zeros(n, dtype=np.float64)
    dist_cnt = np.zeros(n, dtype=np.int64)
    dist_sum = np.zeros(n, dtype=np.float64)
    for bcp, dc, ds_ in ray.get(futures):
        bc += bcp
        dist_cnt += dc
        dist_sum += ds_
    norm = (n - 1) * (n - 2) / 2.0 if n > 2 else 0.0
    closeness = np.where(dist_sum > 0, dist_cnt / np.where(dist_sum > 0,
                                                           dist_sum, 1.0), 0.0)
    return ray.data.from_pandas(pd.DataFrame(
        {
            "node_id": nodes,
            "degree": [degrees[v] / (n - 1) if n > 1 else 0.0 for v in nodes],
            "betweenness": bc * scale / norm if norm else np.zeros(n),
            "closeness": closeness,
        }
    ))


@ray.remote
def _louvain_task(edges):
    """'Louvain' community detection as shipped by the reference
    (analytics.rs:97-180): connected components as communities plus a
    simplified modularity = internal_edge_ends / (2 * node_count) — the
    node_count divisor is the reference's own quirk (:159), transcribed.
    Community ids are assigned in sorted-node order (the reference's
    HashMap order is nondeterministic)."""
    adjacency: dict[str, list] = {}
    for a, b, w in edges:
        adjacency.setdefault(a, []).append((b, w))
        adjacency.setdefault(b, []).append((a, w))
    nodes = sorted(adjacency)
    comm: dict[str, int] = {}
    next_id = 0
    for node in nodes:
        if node in comm:
            continue
        stack = [node]
        members = []
        while stack:
            u = stack.pop()
            if u in comm:
                continue
            comm[u] = next_id
            members.append(u)
            for v, _ in adjacency.get(u, ()):
                if v not in comm:
                    stack.append(v)
        next_id += 1
    total_nodes = len(adjacency)
    out = {"community_id": [], "node_id": [], "modularity": []}
    by_comm: dict[int, list] = {}
    for v, cid in comm.items():
        by_comm.setdefault(cid, []).append(v)
    for cid in sorted(by_comm):
        members = by_comm[cid]
        mset = set(members)
        internal = sum(1 for v in members
                       for (nb, _) in adjacency.get(v, ()) if nb in mset)
        modularity = internal / (2.0 * total_nodes) if total_nodes else 0.0
        for v in sorted(members):
            out["community_id"].append(cid)
            out["node_id"].append(v)
            out["modularity"].append(modularity)
    return pd.DataFrame(out)


def louvain_communities(edges_ds):
    rows = edges_ds.select_columns(["src", "dst"]).take_all()
    edges = [(r["src"], r["dst"], 1.0) for r in rows]
    return ray.data.from_pandas(ray.get(_louvain_task.remote(edges)))


def graph_metrics(edges_ds):
    """Density + average clustering coefficient (analytics.rs:432-487)."""
    rows = edges_ds.select_columns(["src", "dst"]).take_all()
    adjacency: dict[str, list] = {}
    for r in rows:
        adjacency.setdefault(r["src"], []).append(r["dst"])
        adjacency.setdefault(r["dst"], []).append(r["src"])
    n = len(adjacency)
    edge_ends = sum(len(v) for v in adjacency.values())
    actual_edges = edge_ends // 2
    density = (2.0 * actual_edges) / (n * (n - 1)) if n > 1 else 0.0
    total = 0.0
    count = 0
    for neighbors in adjacency.values():
        if len(neighbors) < 2:
            continue
        nset = set(neighbors)
        triangles = 0
        for n1 in neighbors:
            for n2 in adjacency.get(n1, ()):
                if n2 in nset:
                    triangles += 1
        k = len(neighbors)
        total += triangles / (k * (k - 1))
        count += 1
    clustering = total / count if count else 0.0
    return pd.DataFrame(
        {"stat": ["density", "avg_clustering_coefficient"],
         "value": [density, clustering]}
    )


# ---------------------------------------------------------------------------
# L7: graph traversal (analytics.rs:281-410) — query-side helpers over the
# collected edge list (deterministic Dijkstra + bounded-depth DFS)


def _adjacency_from_rows(rows, weight_column=None):
    adjacency: dict[str, list] = {}
    for r in rows:
        w = float(r[weight_column]) if weight_column else 1.0
        adjacency.setdefault(r["src"], []).append((r["dst"], w))
        adjacency.setdefault(r["dst"], []).append((r["src"], w))
    return adjacency


def shortest_path(edges_ds, start: str, end: str, weight_column=None):
    """Dijkstra shortest path (analytics.rs:281-346); returns
    (node list, total weight) or None. Ties break deterministically by
    (distance, node id) — the reference inherits HashSet order."""
    import heapq

    cols = ["src", "dst"] + ([weight_column] if weight_column else [])
    adjacency = _adjacency_from_rows(
        edges_ds.select_columns(cols).take_all(), weight_column)
    if start not in adjacency:
        return None
    dist = {start: 0.0}
    prev: dict[str, str] = {}
    done = set()
    heap = [(0.0, start)]
    while heap:
        d, u = heapq.heappop(heap)
        if u in done:
            continue
        if u == end:
            break
        done.add(u)
        for v, w in adjacency.get(u, ()):
            alt = d + w
            if alt < dist.get(v, float("inf")):
                dist[v] = alt
                prev[v] = u
                heapq.heappush(heap, (alt, v))
    if end not in dist:
        return None
    path = [end]
    while path[-1] != start:
        path.append(prev[path[-1]])
    path.reverse()
    return path, dist[end]


def all_paths(edges_ds, start: str, end: str, max_depth: int = 5,
              weight_column=None):
    """All simple paths up to max_depth (analytics.rs:357-410 DFS),
    deterministic neighbor order (sorted)."""
    cols = ["src", "dst"] + ([weight_column] if weight_column else [])
    adjacency = _adjacency_from_rows(
        edges_ds.select_columns(cols).take_all(), weight_column)
    for k in adjacency:
        adjacency[k] = sorted(adjacency[k])
    out: list[tuple[list[str], float]] = []
    visited: set[str] = set()

    def dfs(cur: str, path: list[str], weight: float) -> None:
        if len(path) > max_depth:
            return
        if cur == end:
            out.append((list(path), weight))
            return
        visited.add(cur)
        for nb, w in adjacency.get(cur, ()):
            if nb not in visited:
                path.append(nb)
                dfs(nb, path, weight + w)
                path.pop()
        visited.discard(cur)

    if start in adjacency:
        dfs(start, [start], 0.0)
    return out

@ray.remote
def _triangles_task(nodes, edges):
    """Per-node triangle participation over the simple undirected graph
    (distinct endpoint pairs, self-loops dropped). Triangle x<y<z is
    enumerated exactly once via its least edge (x,y) and common neighbor
    z > y."""
    order = sorted(set(nodes))
    node_set = set(order)
    und = {tuple(sorted((a, b))) for a, b in edges
           if a != b and a in node_set and b in node_set}
    adj: dict[str, set] = {n: set() for n in order}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    tri = {n: 0 for n in order}
    for a, b in und:
        for c in adj[a] & adj[b]:
            if c > b:
                tri[a] += 1
                tri[b] += 1
                tri[c] += 1
    return pd.DataFrame({
        "entity_id": order,
        "n_triangles": [tri[n] for n in order],
    })


def triangle_counts(entities_ds, edges_ds):
    """Per-node triangle counts — single task over the collected canonical
    graph (SURVEY §2.9 disposition: the canonical node/edge tables are
    corpus-sublinear; at 10^12 docs this is the stage to swap for a
    distributed edge-iterator join, same output contract)."""
    nodes = [r["canonical_id"] for r in
             entities_ds.select_columns(["canonical_id"]).take_all()]
    edges = [(r["src"], r["dst"]) for r in
             edges_ds.select_columns(["src", "dst"]).take_all()]
    return ray.data.from_pandas(ray.get(_triangles_task.remote(nodes, edges)))


# shared with syn_oracle_kg._kcore_replay — the SQL twin unrolls exactly
# this many peel rounds, so the Python side must REACH FIXPOINT within it
# (asserted below) or fail loudly instead of silently diverging
KCORE_MAX_ROUNDS = 24


@ray.remote
def _kcore_task(nodes, edges, k, max_rounds):
    """Bounded iterative peel: drop nodes of degree < k among survivors
    until a fixpoint. max_rounds is the SHARED bound with the unrolled SQL
    twin; not converging within it raises instead of returning a
    silently-diverged survivor set."""
    order = sorted(set(nodes))
    node_set = set(order)
    und = {tuple(sorted((a, b))) for a, b in edges
           if a != b and a in node_set and b in node_set}
    alive = set(order)
    converged = False
    for _ in range(max_rounds):
        deg = {n: 0 for n in alive}
        for a, b in und:
            if a in alive and b in alive:
                deg[a] += 1
                deg[b] += 1
        drop = {n for n in alive if deg.get(n, 0) < k}
        if not drop:
            converged = True
            break
        alive -= drop
    if not converged:
        # one extra probe: fixpoint exactly AT the bound is still fine
        deg = {n: 0 for n in alive}
        for a, b in und:
            if a in alive and b in alive:
                deg[a] += 1
                deg[b] += 1
        if any(deg.get(n, 0) < k for n in alive):
            raise RuntimeError(
                f"k-core did not reach fixpoint within {max_rounds} rounds; "
                f"the unrolled SQL twin would diverge — raise "
                f"KCORE_MAX_ROUNDS on both sides")
    deg = {n: 0 for n in alive}
    for a, b in und:
        if a in alive and b in alive:
            deg[a] += 1
            deg[b] += 1
    kept = sorted(alive)
    return pd.DataFrame({
        "entity_id": kept,
        "core_degree": [deg[n] for n in kept],
    })


def kcore(entities_ds, edges_ds, k: int = 2,
          max_rounds: int = KCORE_MAX_ROUNDS):
    """k-core membership + within-core degree (same single-task
    disposition as triangle_counts)."""
    nodes = [r["canonical_id"] for r in
             entities_ds.select_columns(["canonical_id"]).take_all()]
    edges = [(r["src"], r["dst"]) for r in
             edges_ds.select_columns(["src", "dst"]).take_all()]
    return ray.data.from_pandas(
        ray.get(_kcore_task.remote(nodes, edges, k, max_rounds)))

@ray.remote
def _link_pred_task(nodes, edges):
    """Common-neighbor / Adamic-Adar link prediction over the simple
    undirected graph: every NON-adjacent pair a<b sharing >=1 neighbor,
    scored by count and sum(1/ln(deg(c))) over common neighbors c."""
    import math

    order = sorted(set(nodes))
    node_set = set(order)
    und = {tuple(sorted((a, b))) for a, b in edges
           if a != b and a in node_set and b in node_set}
    adj: dict[str, set] = {n: set() for n in order}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    rows = []
    for i, a in enumerate(order):
        for b in order[i + 1:]:
            if b in adj[a]:
                continue
            common = adj[a] & adj[b]
            if not common:
                continue
            aa = sum(1.0 / math.log(len(adj[c])) for c in sorted(common)
                     if len(adj[c]) > 1)
            rows.append((a, b, len(common),
                         math.copysign(
                             math.floor(abs(aa) * 1e4 + 0.5) / 1e4, aa)))
    return pd.DataFrame(rows, columns=["src", "dst", "n_common",
                                       "adamic_adar"])


def link_prediction(entities_ds, edges_ds):
    """Missing-edge candidates by common-neighbor evidence (single-task
    canonical-graph disposition, as triangle_counts)."""
    nodes = [r["canonical_id"] for r in
             entities_ds.select_columns(["canonical_id"]).take_all()]
    edges = [(r["src"], r["dst"]) for r in
             edges_ds.select_columns(["src", "dst"]).take_all()]
    return ray.data.from_pandas(ray.get(_link_pred_task.remote(nodes, edges)))


@ray.remote
def _lpa_task(nodes, edges, rounds):
    """Synchronous label propagation, deterministic by construction: all
    nodes update simultaneously from the previous round's labels; the new
    label is the most frequent among neighbors, ties to the MIN label;
    isolated nodes keep their own. Exactly ``rounds`` rounds — the SQL
    twin unrolls the same count, so no convergence question arises."""
    from collections import Counter

    order = sorted(set(nodes))
    node_set = set(order)
    und = {tuple(sorted((a, b))) for a, b in edges
           if a != b and a in node_set and b in node_set}
    adj: dict[str, set] = {n: set() for n in order}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    labels = {n: n for n in order}
    for _ in range(rounds):
        new = {}
        for v in order:
            if not adj[v]:
                new[v] = labels[v]
                continue
            cnt = Counter(labels[u] for u in adj[v])
            top = max(cnt.values())
            new[v] = min(l for l, c in cnt.items() if c == top)
        labels = new
    return pd.DataFrame({"entity_id": order,
                         "label": [labels[n] for n in order]})


def label_propagation(entities_ds, edges_ds, rounds: int = 8):
    """LPA communities after a fixed round count (single-task canonical-
    graph disposition)."""
    nodes = [r["canonical_id"] for r in
             entities_ds.select_columns(["canonical_id"]).take_all()]
    edges = [(r["src"], r["dst"]) for r in
             edges_ds.select_columns(["src", "dst"]).take_all()]
    return ray.data.from_pandas(
        ray.get(_lpa_task.remote(nodes, edges, rounds)))

@ray.remote
def _ecc_task(nodes, edges, max_depth):
    """Per-node eccentricity within its connected component (BFS per
    node over the simple undirected graph; isolated nodes have 0).
    ``max_depth`` bounds the walk — shared with the SQL twin's bounded
    recursion; real diameters being far below it is pytest-asserted."""
    from collections import deque

    order = sorted(set(nodes))
    node_set = set(order)
    und = {tuple(sorted((a, b))) for a, b in edges
           if a != b and a in node_set and b in node_set}
    adj: dict[str, set] = {n: set() for n in order}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    eccs = []
    for src in order:
        seen = {src: 0}
        dq = deque([src])
        far = 0
        while dq:
            v = dq.popleft()
            d = seen[v]
            if d >= max_depth:
                continue
            for u in adj[v]:
                if u not in seen:
                    seen[u] = d + 1
                    far = max(far, d + 1)
                    dq.append(u)
        eccs.append(far)
    return pd.DataFrame({"entity_id": order, "eccentricity": eccs})


def eccentricity(entities_ds, edges_ds, max_depth: int = 16):
    """Eccentricity per node (single-task canonical-graph disposition)."""
    nodes = [r["canonical_id"] for r in
             entities_ds.select_columns(["canonical_id"]).take_all()]
    edges = [(r["src"], r["dst"]) for r in
             edges_ds.select_columns(["src", "dst"]).take_all()]
    return ray.data.from_pandas(
        ray.get(_ecc_task.remote(nodes, edges, max_depth)))

@ray.remote
def _assortativity_task(nodes, edges):
    """Degree assortativity (Newman 2002): Pearson correlation of endpoint
    degrees over the directed double cover of the simple undirected graph.
    All accumulators are integers; the single float division happens once
    at the end (round4), so the SQL twin is bit-exact."""
    import math

    order = sorted(set(nodes))
    node_set = set(order)
    und = {tuple(sorted((a, b))) for a, b in edges
           if a != b and a in node_set and b in node_set}
    deg: dict[str, int] = {n: 0 for n in order}
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    m2 = 2 * len(und)  # directed double cover size
    if m2 == 0:
        return pd.DataFrame({"n_edges": [0], "assortativity": [0.0]})
    s_jk = sum(deg[a] * deg[b] for a, b in und) * 2
    s_sum = sum(deg[a] + deg[b] for a, b in und)      # Σ(j+k) over cover /1
    s_sq = sum(deg[a] ** 2 + deg[b] ** 2 for a, b in und)
    num = s_jk / m2 - (s_sum / m2) ** 2
    den = s_sq / m2 - (s_sum / m2) ** 2
    r = 0.0 if den == 0 else num / den
    r4 = math.copysign(math.floor(abs(r) * 1e4 + 0.5) / 1e4, r)
    return pd.DataFrame({"n_edges": [len(und)], "assortativity": [r4]})


def assortativity(entities_ds, edges_ds):
    """Degree assortativity coefficient (single-task disposition)."""
    nodes = [r["canonical_id"] for r in
             entities_ds.select_columns(["canonical_id"]).take_all()]
    edges = [(r["src"], r["dst"]) for r in
             edges_ds.select_columns(["src", "dst"]).take_all()]
    return ray.data.from_pandas(
        ray.get(_assortativity_task.remote(nodes, edges)))


def component_sizes(entities_ds, edges_ds):
    """Component-size histogram: (size, n_components) — derived from the
    oracled connected-components labels."""
    comp = connected_components(entities_ds, edges_ds).to_pandas()
    sizes = comp.groupby("component").size()
    hist = sizes.value_counts().sort_index()
    return pd.DataFrame({"size": hist.index.astype("int64"),
                         "n_components": hist.values.astype("int64")})


@ray.remote
def _hits_task(nodes, edges, iterations):
    """HITS hubs/authorities (Kleinberg 1999) on the DIRECTED extraction
    graph (subj→obj as emitted; self-loops dropped). Unnormalized power
    iteration — auth ← AᵀΒ·hub, hub ← A·auth — with one L1 normalization
    at the end; per-iteration normalization only rescales, and deferring
    it keeps every intermediate an exact sum of products so the SQL twin
    replays the arithmetic verbatim (values stay ≪ 1e308 for any graph
    small enough for the single-task disposition)."""
    order = sorted(set(nodes))
    n = len(order)
    if n == 0:
        return pd.DataFrame({"entity_id": [], "authority": [], "hub": []})
    idx = pd.Index(order)
    if edges:
        ea = idx.get_indexer([a for a, _ in edges])
        eb = idx.get_indexer([b for _, b in edges])
        keep = (ea >= 0) & (eb >= 0) & (ea != eb)
        ea, eb = ea[keep], eb[keep]
    else:
        ea = eb = np.zeros(0, dtype=np.int64)
    hub = np.ones(n)
    auth = np.ones(n)
    for _ in range(iterations):
        auth = np.zeros(n)
        np.add.at(auth, eb, hub[ea])
        hub = np.zeros(n)
        np.add.at(hub, ea, auth[eb])
    sa, sh = auth.sum(), hub.sum()
    if sa > 0:
        auth = auth / sa
    if sh > 0:
        hub = hub / sh
    return pd.DataFrame({"entity_id": order, "authority": auth, "hub": hub})


def hits(entities_ds, edges_ds, iterations: int = 8):
    """HITS over the canonical graph (single-task disposition, SURVEY
    §2.9: canonical node/edge tables are small after canonicalization)."""
    nodes = [r["canonical_id"] for r in
             entities_ds.select_columns(["canonical_id"]).take_all()]
    edges = [(r["src"], r["dst"]) for r in
             edges_ds.select_columns(["src", "dst"]).take_all()]
    return ray.data.from_pandas(
        ray.get(_hits_task.remote(nodes, edges, iterations)))
