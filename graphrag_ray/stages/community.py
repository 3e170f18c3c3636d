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

    def edges_to_community(node: str, comm: int) -> int:
        return sum(1 for nb in adj[node] if communities[nb] == comm)

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
            neighbor_comms = sorted({communities[nb] for nb in adj[node]})
            best, best_delta = current, 0.0
            k_in_from = edges_to_community(node, current)
            for cand in neighbor_comms:
                if cand == current:
                    continue
                k_in_to = edges_to_community(node, cand)
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
