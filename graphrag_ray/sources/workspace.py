"""Workspace persistence: the reference's 4-table Parquet layout (S3/S4/S7).

Reference: persistence/parquet.rs writes entities/relationships/chunks/
documents into a workspace directory (:6-14, :143-205) with Snappy and
fixed schemas (:219-230 entities, :425-435 relationships); the workspace
manager adds metadata + load-if-exists resume semantics
(persistence/workspace.rs:9-120, graphrag/lifecycle.rs:64-110).

Ray-Data form: one partitioned-Parquet directory per logical table plus a
``workspace.json`` with row counts — each table is a directory of part
files (resumable output layout), never one giant file.
"""

from __future__ import annotations

import json
import os

import ray
import ray.data

TABLES = ("documents", "chunks", "entities", "edges", "triples")


def save_workspace(path: str, *, documents=None, chunks=None, entities=None,
                   edges=None, triples=None, extra_meta: dict | None = None) -> dict:
    """Write present tables; returns the metadata written."""
    os.makedirs(path, exist_ok=True)
    counts = {}
    for name, ds in (("documents", documents), ("chunks", chunks),
                     ("entities", entities), ("edges", edges),
                     ("triples", triples)):
        if ds is None:
            continue
        table_dir = os.path.join(path, name)
        ds.write_parquet(table_dir)
        counts[name] = ray.data.read_parquet(table_dir).count()
    meta = {"tables": counts}
    if extra_meta:
        meta.update(extra_meta)
    with open(os.path.join(path, "workspace.json"), "w") as f:
        json.dump(meta, f)
    return meta


def load_workspace(path: str) -> dict:
    """Read back whatever tables exist → {name: Dataset} (+ '_meta')."""
    out: dict = {}
    meta_path = os.path.join(path, "workspace.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            out["_meta"] = json.load(f)
    for name in TABLES:
        d = os.path.join(path, name)
        if os.path.isdir(d):
            out[name] = ray.data.read_parquet(d)
    return out


def workspace_exists(path: str) -> bool:
    """Resume probe (lifecycle.rs:64-110 load-if-exists semantics)."""
    return os.path.exists(os.path.join(path, "workspace.json"))


def save_graph_json(path: str, entities_ds, edges_ds, metadata: dict | None = None) -> None:
    """S6: whole-graph JSON snapshot with a metadata header
    (core/mod.rs:498-770) — a small-scale debug sink, not the scale path."""
    import json as _json

    snapshot = {
        "metadata": {"format": "graphrag_ray-graph-v1", **(metadata or {})},
        "entities": entities_ds.take_all(),
        "edges": edges_ds.take_all(),
    }
    with open(path, "w") as f:
        _json.dump(snapshot, f, default=str)


def load_graph_json(path: str) -> dict:
    import json as _json

    with open(path) as f:
        snap = _json.load(f)
    import ray as _ray

    out = {"metadata": snap.get("metadata", {})}
    if snap.get("entities"):
        out["entities"] = _ray.data.from_items(snap["entities"])
    if snap.get("edges"):
        out["edges"] = _ray.data.from_items(snap["edges"])
    return out
