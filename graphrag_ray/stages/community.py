"""Leiden-style community detection + extractive summaries.

Behavioral transcription of the reference's single-level Leiden
(graph/leiden.rs:429-783): singleton init → greedy local moving on the
Newman modularity delta (:711-736, ≤100 iterations) → refinement that
splits communities which are not connected subgraphs into connected
components (:598-708). Summaries follow the extractive format of
graph/leiden.rs:145-198 (top 5 entity names per type).

Ray-Data disposition (SURVEY.md §2.9): the entity graph is tiny relative to
the corpus (|entities| ≪ |docs|), so the algorithm runs in ONE Ray task over
the collected node/edge tables — the idiomatic choice for an iterative
global algorithm the Dataset API can't express. Determinism: nodes are
iterated in sorted-id order and neighbor communities in sorted order (the
reference iterates petgraph insertion order / HashSet order; community
*labels* may differ — parity is partition equality, per SURVEY.md §7.5).
"""

from __future__ import annotations

import pandas as pd

import ray


def _leiden_partition(
    nodes: list[str],
    edges: list[tuple[str, str]],
    resolution: float = 1.0,
    max_iterations: int = 100,
) -> dict[str, int]:
    order = sorted(nodes)
    adj: dict[str, list[str]] = {n: [] for n in order}
    n_edge_rows = 0
    for a, b in edges:
        if a in adj and b in adj and a != b:
            adj[a].append(b)
            adj[b].append(a)
            n_edge_rows += 1
    total_edges = float(n_edge_rows) * 2.0  # leiden.rs:718 (undirected 2m)
    if total_edges == 0:
        return {n: i for i, n in enumerate(order)}

    communities = {n: i for i, n in enumerate(order)}  # leiden.rs:524-535
    degree = {n: float(len(adj[n])) for n in order}

    # maintained incrementally for O(1) sigma lookups
    sigma_tot: dict[int, float] = {}
    for n in order:
        sigma_tot[communities[n]] = sigma_tot.get(communities[n], 0.0) + degree[n]

    improved = True
    iteration = 0
    while improved and iteration < max_iterations:  # leiden.rs:516-533
        improved = False
        for node in order:
            current = communities[node]
            # one pass over the adjacency: per-community neighbor-edge
            # counts (integer-identical to the per-candidate rescans the
            # reference does; ~deg× less work on dense graphs)
            k_in: dict[int, int] = {}
            for nb in adj[node]:
                cn = communities[nb]
                k_in[cn] = k_in.get(cn, 0) + 1
            neighbor_comms = sorted(k_in)
            best, best_delta = current, 0.0
            k_in_from = k_in.get(current, 0)
            for cand in neighbor_comms:
                if cand == current:
                    continue
                k_in_to = k_in[cand]
                d = degree[node]
                # Newman delta (leiden.rs:711-736)
                delta = (k_in_to - k_in_from) / total_edges - resolution * d * (
                    (sigma_tot[cand] - sigma_tot[current] + d) / (total_edges * total_edges)
                )
                if delta > best_delta:
                    best_delta = delta
                    best = cand
            if best != current:
                communities[node] = best
                sigma_tot[current] -= degree[node]
                sigma_tot[best] = sigma_tot.get(best, 0.0) + degree[node]
                improved = True
        iteration += 1

    # refinement: split disconnected communities (leiden.rs:598-708)
    by_comm: dict[int, list[str]] = {}
    for n, c in communities.items():
        by_comm.setdefault(c, []).append(n)
    for comm_id in sorted(by_comm):
        members = sorted(by_comm[comm_id])
        member_set = set(members)
        components: list[list[str]] = []
        unvisited = set(members)
        while unvisited:
            start = min(unvisited)
            stack = [start]
            comp = []
            while stack:
                node = stack.pop()
                if node not in unvisited:
                    continue
                unvisited.discard(node)
                comp.append(node)
                for nb in adj[node]:
                    if nb in member_set and nb in unvisited:
                        stack.append(nb)
            components.append(comp)
        if len(components) > 1:
            max_id = max(communities.values())
            for idx, comp in enumerate(components):
                new_id = max_id + idx + 1
                for node in comp:
                    communities[node] = new_id
    return communities


def _summaries(
    partition: dict[str, int],
    meta: dict[str, tuple[str, str]],  # id → (name, type)
    level: int = 0,
    max_length: int = 2000,
) -> list[dict]:
    """Extractive per-community summary (graph/leiden.rs:145-198).
    Type groups iterated in sorted order (reference: HashMap order)."""
    by_comm: dict[int, list[str]] = {}
    for node, comm in partition.items():
        by_comm.setdefault(comm, []).append(node)
    out = []
    for comm_id in sorted(by_comm):
        members = sorted(by_comm[comm_id])
        by_type: dict[str, list[str]] = {}
        for m in members:
            name, etype = meta.get(m, (m, "UNKNOWN"))
            by_type.setdefault(etype, []).append(name)
        parts = [
            f"Community {comm_id} (Level {level})",
            f"Contains {len(members)} entities:",
        ]
        for etype in sorted(by_type):
            names = by_type[etype]
            more = f" and {len(names) - 5} more" if len(names) > 5 else ""
            parts.append(f"- {etype}: {', '.join(names[:5])}{more}")
        summary = "\n".join(parts)
        if len(summary) > max_length:
            summary = summary[: max(0, max_length - 3)] + "..."
        out.append(
            {"level": level, "community_id": comm_id, "summary": summary,
             "entity_count": len(members)}
        )
    return out


def _contract(partition: dict[str, int], edges: list[tuple[str, str]]
              ) -> tuple[list[str], list[tuple[str, str]]]:
    """Contract each community into a supernode (id = 'c<id>'); inter-
    community edges survive with multiplicity (the hierarchical Leiden
    aggregation step)."""
    nodes = sorted({f"c{c}" for c in partition.values()})
    contracted = []
    for a, b in edges:
        ca, cb = partition.get(a), partition.get(b)
        if ca is None or cb is None or ca == cb:
            continue
        contracted.append((f"c{ca}", f"c{cb}"))
    return nodes, contracted


@ray.remote
def _detect_task(nodes, edges, meta, resolution, max_iterations, max_length,
                 max_levels):
    """Hierarchical detection: level 0 on the entity graph, then contract
    communities into supernodes and repeat until the partition stops
    changing or max_levels is reached (north-star hierarchical summaries;
    the reference structures HierarchicalCommunities the same way,
    graph/leiden.rs:40-55, filling level 0)."""
    comm_rows = []
    summary_rows = []
    cur_nodes, cur_edges, cur_meta = nodes, edges, dict(meta)
    # entity → community chain so deeper levels still map back to entities
    entity_to_comm = {n: n for n in nodes}
    for level in range(max_levels):
        partition = _leiden_partition(cur_nodes, cur_edges, resolution,
                                      max_iterations)
        entity_to_comm = {e: partition[c] for e, c in entity_to_comm.items()
                          if c in partition}
        for entity_id in sorted(entity_to_comm):
            comm_rows.append({"level": level, "community_id":
                              entity_to_comm[entity_id], "entity_id": entity_id})
        level_meta = {}
        by_comm: dict[int, list[str]] = {}
        for e, c in entity_to_comm.items():
            by_comm.setdefault(c, []).append(e)
        ent_partition = dict(entity_to_comm)
        summary_rows.extend(_summaries(ent_partition, meta, level, max_length))
        n_comms = len(set(partition.values()))
        if n_comms >= len(cur_nodes) or n_comms <= 1:
            break  # no further contraction possible
        cur_nodes, cur_edges = _contract(partition, cur_edges)
        entity_to_comm = {e: f"c{c}" for e, c in entity_to_comm.items()}
        _ = level_meta
    communities = pd.DataFrame(comm_rows, columns=["level", "community_id",
                                                   "entity_id"])
    if communities.empty:
        communities = pd.DataFrame({"level": pd.Series(dtype="int32"),
                                    "community_id": pd.Series(dtype="int64"),
                                    "entity_id": pd.Series(dtype="str")})
    communities["level"] = communities["level"].astype("int32")
    communities["community_id"] = communities["community_id"].astype("int64")
    summaries = pd.DataFrame(summary_rows)
    if summaries.empty:
        summaries = pd.DataFrame(
            {"level": pd.Series(dtype="int32"),
             "community_id": pd.Series(dtype="int64"),
             "summary": pd.Series(dtype="str"),
             "entity_count": pd.Series(dtype="int64")}
        )
    return communities, summaries


def detect_communities(
    entities_ds: "ray.data.Dataset",
    edges_ds: "ray.data.Dataset",
    resolution: float = 1.0,
    max_iterations: int = 100,
    summary_max_length: int = 2000,
    max_levels: int = 3,
) -> tuple["ray.data.Dataset", "ray.data.Dataset"]:
    """Collect the (small) canonical graph and run hierarchical Leiden in
    one Ray task (level 0 + contracted levels, ≤ max_levels)."""
    ent = entities_ds.select_columns(["canonical_id", "canonical_name", "entity_type"]).take_all()
    edg = edges_ds.select_columns(["src", "dst"]).take_all()
    nodes = [r["canonical_id"] for r in ent]
    meta = {r["canonical_id"]: (r["canonical_name"], r["entity_type"]) for r in ent}
    edges = [(r["src"], r["dst"]) for r in edg]
    communities, summaries = ray.get(
        _detect_task.remote(nodes, edges, meta, resolution, max_iterations,
                            summary_max_length, max_levels)
    )
    return ray.data.from_pandas(communities), ray.data.from_pandas(summaries)


# ---------------------------------------------------------------------------
# L4: hierarchical RELATIONSHIP clustering (graph/hierarchical_relationships.rs)


def _relationship_sim_edges(rels: list[tuple[str, str, str]],
                            threshold: float = 0.3) -> list[tuple[int, int]]:
    """Similarity graph over relationships (hierarchical_relationships.rs
    :371-393): +0.5 same relation type, +0.3 shared source or target,
    (+0.2·temporal overlap — no temporal info on the pattern path), edge
    iff similarity > threshold STRICT. Without temporal data an edge
    therefore needs the same relation type (0.5, optionally +0.3) — the
    graph is a union of per-type cliques. Pair generation exploits that:
    pairs enumerate per type block only, Σ_t R_t² not R² (the documented
    blocking assumption; at corpus scale the per-type blocks shard by
    endpoint bucket before pairing)."""
    by_type: dict[str, list[int]] = {}
    for i, (_s, _d, t) in enumerate(rels):
        by_type.setdefault(t, []).append(i)
    edges = []
    for t in sorted(by_type):
        idxs = by_type[t]
        for ai in range(len(idxs)):
            for bi in range(ai + 1, len(idxs)):
                edges.append((idxs[ai], idxs[bi]))
    return edges


@ray.remote
def _relationship_hierarchy_task(rels, resolutions, min_cluster_size,
                                 max_iterations):
    """One task over the collected canonical edge list (edges ≪ corpus):
    each level re-clusters the SAME relationship-similarity graph at its
    own resolution (hierarchical_relationships.rs:251-267 — levels are
    resolution sweeps, not contractions), drops clusters below
    min_cluster_size (:305-308), attaches the no-LLM fallback summary
    'Cluster {id} with {n} relationships' (:313-319) and the cohesion
    score 0.2 + 0.6·internal_edge_density (:586-662; size-1 clusters are
    perfectly cohesive = 1.0)."""
    rel_ids = [f"{s}_{d}_{t}" for s, d, t in rels]
    sim_edges = _relationship_sim_edges(rels)
    node_names = [f"r{i}" for i in range(len(rels))]
    name_edges = [(f"r{a}", f"r{b}") for a, b in sim_edges]
    adj_sets: dict[int, set[int]] = {}
    for a, b in sim_edges:
        adj_sets.setdefault(a, set()).add(b)
        adj_sets.setdefault(b, set()).add(a)

    member_rows = []
    cluster_rows = []
    for level, resolution in enumerate(resolutions):
        partition = _leiden_partition(node_names, name_edges, resolution,
                                      max_iterations)
        by_comm: dict[int, list[int]] = {}
        for name, comm in partition.items():
            by_comm.setdefault(comm, []).append(int(name[1:]))
        # stable cluster numbering: communities ordered by min member index
        ordered = sorted(by_comm.items(), key=lambda kv: min(kv[1]))
        for cnum, (_comm, members) in enumerate(ordered):
            if len(members) < min_cluster_size:
                continue
            cid = f"L{level}C{cnum}"
            members = sorted(members)
            mset = set(members)
            internal = sum(1 for m in members
                           for nb in adj_sets.get(m, ()) if nb > m and nb in mset)
            size = len(members)
            if size == 1:
                cohesion = 1.0
            else:
                max_possible = size * (size - 1) / 2
                cohesion = 0.2 + (internal / max_possible) * 0.6
            for m in members:
                member_rows.append({"level": level, "cluster_id": cid,
                                    "rel_id": rel_ids[m]})
            cluster_rows.append({
                "level": level, "cluster_id": cid, "size": size,
                "summary": f"Cluster {cid} with {size} relationships",
                "cohesion": round(cohesion, 6),
            })
    members = pd.DataFrame(member_rows,
                           columns=["level", "cluster_id", "rel_id"])
    clusters = pd.DataFrame(cluster_rows,
                            columns=["level", "cluster_id", "size",
                                     "summary", "cohesion"])
    for df, int_cols in ((members, ["level"]), (clusters, ["level", "size"])):
        for c in int_cols:
            df[c] = df[c].astype("int64")
    return members, clusters


@ray.remote
def _relationship_blocks_task(rels, blocks, resolutions, min_cluster_size,
                              max_iterations):
    """One batch of independent similarity blocks (each a per-type clique
    shard — no cross-block edges by construction, so each block clusters
    in isolation). Per level: run the SAME Leiden local-move over the
    block's clique subgraph at that level's resolution; emit clusters
    keyed by (level, min member index) for the driver's global renumber.
    Returns (member_rows, cluster_rows) with a placeholder cluster key."""
    member_rows: list[dict] = []
    cluster_rows: list[dict] = []
    for idxs in blocks:
        node_names = [f"r{i}" for i in idxs]
        name_edges = [(f"r{idxs[a]}", f"r{idxs[b]}")
                      for a in range(len(idxs))
                      for b in range(a + 1, len(idxs))]
        for level, resolution in enumerate(resolutions):
            partition = _leiden_partition(node_names, name_edges, resolution,
                                          max_iterations)
            by_comm: dict[int, list[int]] = {}
            for name, comm in partition.items():
                by_comm.setdefault(comm, []).append(int(name[1:]))
            for members in by_comm.values():
                if len(members) < min_cluster_size:
                    continue
                members = sorted(members)
                size = len(members)
                # block subgraph is a clique: any subset of size >= 2 has
                # internal density exactly 1, so cohesion = 0.2 + 0.6*1
                cohesion = 1.0 if size == 1 else 0.8
                key = (level, members[0])
                for m in members:
                    member_rows.append({"level": level, "key": key[1],
                                        "rel_idx": m})
                cluster_rows.append({
                    "level": level, "key": key[1], "size": size,
                    "cohesion": round(cohesion, 6),
                })
    return member_rows, cluster_rows


def _shard_blocks(rels, max_block: int) -> list[list[int]]:
    """Per-type blocks, sharded by crc32(src) when a type exceeds
    ``max_block`` (the docstring'd endpoint-bucket blocking: shards of one
    type stay cliques, relationships in a shard share source buckets)."""
    import zlib

    by_type: dict[str, list[int]] = {}
    for i, (_s, _d, t) in enumerate(rels):
        by_type.setdefault(t, []).append(i)
    blocks: list[list[int]] = []
    for t in sorted(by_type):
        idxs = by_type[t]
        n_shards = -(-len(idxs) // max_block)
        if n_shards == 1:
            blocks.append(idxs)
            continue
        shards: list[list[int]] = [[] for _ in range(n_shards)]
        for i in idxs:
            shards[zlib.crc32(rels[i][0].encode()) % n_shards].append(i)
        blocks.extend(s for s in shards if s)
    return blocks


def relationship_hierarchy(
    edges_ds: "ray.data.Dataset",
    resolutions: tuple[float, ...] = (1.0, 0.5),
    min_cluster_size: int = 2,
    max_iterations: int = 100,
    exact_max_rels: int = 1000,
    max_block: int = 256,
) -> tuple["ray.data.Dataset", "ray.data.Dataset"]:
    """L4: recursive relationship clustering with per-level summaries
    (graph/hierarchical_relationships.rs:183-340). Returns (members,
    clusters) Datasets.

    Two dispositions: ≤ ``exact_max_rels`` relationships run the exact
    whole-graph single task (the pytest-fixtured semantics). Above it the
    similarity graph — a union of per-type cliques on the pattern path —
    is BLOCKED: types shard by source-endpoint bucket to ≤ ``max_block``
    relationships (the in-docstring blocking assumption of
    _relationship_sim_edges), blocks fan out as parallel tasks (no
    O(R_t²) whole-type clique ever materializes; the local-move sweep
    over a 5000-node clique is O(n³)-ish Python and was measured in
    minutes, vs ~0.3 s at 256), and the driver renumbers the per-level
    clusters by min member index. Blocking trades within-type cluster
    granularity (one clique → n_shards cliques) for scale; at extreme
    relationship counts the renumber itself becomes a (level, key)
    groupby with members kept distributed."""
    rows = edges_ds.select_columns(["src", "dst", "rel_type"]).take_all()
    rels = [(r["src"], r["dst"], r["rel_type"]) for r in rows]
    if len(rels) <= exact_max_rels:
        members, clusters = ray.get(_relationship_hierarchy_task.remote(
            rels, tuple(resolutions), min_cluster_size, max_iterations))
        return ray.data.from_pandas(members), ray.data.from_pandas(clusters)

    blocks = _shard_blocks(rels, max_block)
    n_tasks = min(len(blocks), 32)
    batches: list[list[list[int]]] = [[] for _ in range(n_tasks)]
    for bi, blk in enumerate(blocks):
        batches[bi % n_tasks].append(blk)
    rels_ref = ray.put(rels)
    futures = [
        _relationship_blocks_task.remote(
            rels_ref, batch, tuple(resolutions), min_cluster_size,
            max_iterations)
        for batch in batches if batch
    ]
    member_rows: list[dict] = []
    cluster_rows: list[dict] = []
    for mrows, crows in ray.get(futures):
        member_rows.extend(mrows)
        cluster_rows.extend(crows)
    # global renumber: per level, clusters ordered by min member index
    rel_ids = [f"{s}_{d}_{t}" for s, d, t in rels]
    cid_of: dict[tuple[int, int], str] = {}
    for level in range(len(resolutions)):
        keys = sorted(c["key"] for c in cluster_rows if c["level"] == level)
        for cnum, key in enumerate(keys):
            cid_of[(level, key)] = f"L{level}C{cnum}"
    members = pd.DataFrame(
        [{"level": m["level"], "cluster_id": cid_of[(m["level"], m["key"])],
          "rel_id": rel_ids[m["rel_idx"]]} for m in member_rows],
        columns=["level", "cluster_id", "rel_id"])
    clusters = pd.DataFrame(
        [{"level": c["level"], "cluster_id": cid_of[(c["level"], c["key"])],
          "size": c["size"],
          "summary": (f"Cluster {cid_of[(c['level'], c['key'])]} "
                      f"with {c['size']} relationships"),
          "cohesion": c["cohesion"]} for c in cluster_rows],
        columns=["level", "cluster_id", "size", "summary", "cohesion"])
    for df, int_cols in ((members, ["level"]), (clusters, ["level", "size"])):
        for c in int_cols:
            df[c] = df[c].astype("int64")
    return ray.data.from_pandas(members), ray.data.from_pandas(clusters)
