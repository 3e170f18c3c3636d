"""Stage-boundary checkpointing with manifests and per-row lineage.

The reference's resume story is coarse (whole-workspace auto-load,
graphrag/lifecycle.rs:64-110). At cluster scale we checkpoint every stage
boundary instead (SURVEY.md §4):

- each stage writes partitioned Parquet under ``{out}/{run_id}/{stage}/``
  via a temp-dir + atomic rename, then a ``manifest.json``
  (config hash, row count, schema fingerprint) and a ``_SUCCESS`` marker;
- every persisted row carries a ``lineage`` struct column
  ``{stage, attempt, part}`` (part = content-derived partition id) so a
  partially-written run is attributable per partition;
- on rerun with the same run_id + config hash, a stage with a valid marker
  is *skipped* — the Dataset is re-opened from Parquet and streams onward.

Only deterministic stages may be skipped this way; the default pattern path
is fully deterministic. Nondeterministic (LLM) stages must replay through a
response cache instead (SURVEY.md §7.5) — not part of the v1 path.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
import zlib
from collections.abc import Callable

import pyarrow as pa

import ray

LINEAGE_FIELD = "lineage"


def _lineage_type() -> pa.DataType:
    return pa.struct([("stage", pa.string()), ("attempt", pa.int32()), ("part", pa.int32())])


def make_lineage_stamper(stage: str, attempt: int, key_column: str | None):
    """map_batches UDF appending the per-row lineage struct column."""

    def stamp(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if key_column and key_column in batch.column_names and n > 0:
            first = batch.column(key_column)[0].as_py() or ""
            part = zlib.crc32(str(first).encode()) % 1024
        else:
            part = 0
        lineage = pa.array(
            [{"stage": stage, "attempt": attempt, "part": part}] * n,
            type=_lineage_type(),
        )
        return batch.append_column(LINEAGE_FIELD, lineage)

    return stamp


def dataset_fingerprint(ds) -> str:
    """Identity fingerprint of a Dataset's INPUT (not its content): the
    (path, size, mtime) triple of every source file when the dataset
    derives from file reads, else its row count. Folded into checkpoint
    manifests so rerunning a run_id over a CHANGED corpus invalidates the
    stale stage Parquet instead of silently reusing it (ADVICE r01)."""
    import hashlib

    try:
        files = sorted(ds.input_files())
    except Exception:  # noqa: BLE001 - non-read datasets
        files = []
    if files:
        sig = [(f, *_stat_sig(f)) for f in files]
    else:
        # Non-file dataset: fingerprint the schema plus a bounded row
        # sample (first 64 rows). A bare row count would let a changed
        # corpus with an identical count silently reuse stale stage
        # checkpoints, and forcing ds.count() executes the whole upstream
        # plan; the prefix sample only executes the first block(s).
        sig = [("schema", str(ds.schema()))]
        try:
            head = ds.limit(64).take_batch(64, batch_format="pyarrow")
            sig.append(("head", [
                (name, [str(v) for v in col.to_pylist()])
                for name, col in zip(head.column_names, head.columns)
            ]))
        except Exception:  # noqa: BLE001 - empty datasets
            sig.append(("head", []))
    return hashlib.sha256(json.dumps(sig, sort_keys=True).encode()).hexdigest()[:16]


def _stat_sig(path: str) -> tuple:
    try:
        st = os.stat(path)
        return (st.st_size, int(st.st_mtime))
    except OSError:
        return (0, 0)


class CheckpointManager:
    def __init__(self, out_dir: str, run_id: str, config_hash: str,
                 enabled: bool = True, input_fingerprint: str | None = None):
        self.root = os.path.join(out_dir, run_id)
        self.config_hash = config_hash
        self.input_fingerprint = input_fingerprint
        self.enabled = enabled
        self.skipped: list[str] = []
        self.written: list[str] = []
        if enabled:
            os.makedirs(self.root, exist_ok=True)

    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def is_valid(self, stage: str) -> bool:
        d = self._stage_dir(stage)
        if not os.path.exists(os.path.join(d, "_SUCCESS")):
            return False
        try:
            with open(os.path.join(d, "manifest.json")) as f:
                manifest = json.load(f)
        except (OSError, json.JSONDecodeError):
            return False
        if manifest.get("config_hash") != self.config_hash:
            return False
        if self.input_fingerprint is not None:
            return manifest.get("input_fingerprint") == self.input_fingerprint
        return True

    def load_or_compute(
        self,
        stage: str,
        compute: Callable[[], "ray.data.Dataset"],
        key_column: str | None = None,
    ) -> "ray.data.Dataset":
        """Return the stage's Dataset, either reopened from a valid
        checkpoint or computed + persisted (atomic rename + manifest)."""
        if not self.enabled:
            return compute()
        d = self._stage_dir(stage)
        if self.is_valid(stage):
            self.skipped.append(stage)
            ds = ray.data.read_parquet(d, file_extensions=["parquet"])
            return ds.drop_columns([LINEAGE_FIELD])

        attempt = 1
        marker = os.path.join(d, "manifest.json")
        if os.path.exists(marker):
            try:
                with open(marker) as f:
                    attempt = int(json.load(f).get("attempt", 0)) + 1
            except (OSError, json.JSONDecodeError, ValueError):
                attempt = 1
        import time

        tmp = d + f".tmp-{uuid.uuid4().hex[:8]}"
        shutil.rmtree(d, ignore_errors=True)
        t0 = time.perf_counter()
        ds = compute()
        stamped = ds.map_batches(
            make_lineage_stamper(stage, attempt, key_column), batch_format="pyarrow"
        )
        stamped.write_parquet(tmp)
        os.replace(tmp, d)
        elapsed = time.perf_counter() - t0
        n_rows = ray.data.read_parquet(d).count()
        with open(os.path.join(d, "manifest.json"), "w") as f:
            json.dump(
                {"stage": stage, "config_hash": self.config_hash,
                 "input_fingerprint": self.input_fingerprint,
                 "rows": n_rows, "attempt": attempt,
                 "elapsed_sec": round(elapsed, 3),
                 "rows_per_sec": round(n_rows / elapsed, 1) if elapsed > 0 else None},
                f,
            )
        with open(os.path.join(d, "_SUCCESS"), "w") as f:
            f.write("")
        self.written.append(stage)
        out = ray.data.read_parquet(d, file_extensions=["parquet"])
        return out.drop_columns([LINEAGE_FIELD])
