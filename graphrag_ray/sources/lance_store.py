"""S5: Lance vector-store write/read path (persistence/lance.rs:151-407).

The north rule names Lance tables as the storage format. The reference's
LanceVectorStore persists embeddings + metadata and builds an IVF-PQ ANN
index (:341-407). In this environment the ``lance`` package is not
installed, so the writer is a SEAM: it uses ``Dataset.write_lance`` /
``ray.data.read_lance`` when lance is importable and otherwise falls back
to partitioned Parquet with identical schema plus a ``_FORMAT`` marker —
callers get the same logical table either way, and the real Lance branch
is exercised automatically wherever lance IS installed.

ANN indexing over the stored table is provided by stages/ann.py (IVF /
LSH) rather than a storage-level index — the distributed scan-time
equivalent of lance.rs:341-407's IVF-PQ build.
"""

from __future__ import annotations

import json
import os

import ray
import ray.data


def write_vector_store(ds: "ray.data.Dataset", path: str,
                       meta: dict | None = None) -> str:
    """Write a Dataset as a Lance dataset when available, else Parquet.
    Returns the format actually written ('lance' | 'parquet')."""
    os.makedirs(path, exist_ok=True)
    fmt = "parquet"
    try:
        import lance  # noqa: F401

        ds.write_lance(os.path.join(path, "table.lance"))
        fmt = "lance"
    except ImportError:
        ds.write_parquet(os.path.join(path, "table.parquet"))
    with open(os.path.join(path, "_FORMAT"), "w") as f:
        json.dump({"format": fmt, "meta": meta or {}}, f)
    return fmt


def read_vector_store(path: str) -> "ray.data.Dataset":
    with open(os.path.join(path, "_FORMAT")) as f:
        fmt = json.load(f)["format"]
    if fmt == "lance":  # pragma: no cover - lance not installed in sandbox
        return ray.data.read_lance(os.path.join(path, "table.lance"))
    return ray.data.read_parquet(os.path.join(path, "table.parquet"))


def store_meta(path: str) -> dict:
    with open(os.path.join(path, "_FORMAT")) as f:
        return json.load(f)
