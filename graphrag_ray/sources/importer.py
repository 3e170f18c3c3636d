"""Data importer (S2): CSV/TSV/JSON/JSONL → entity / relationship rows.

Reference: pipeline/data_import.rs:26-250 — header-mapped columns to
ImportedEntity/ImportedRelationship, processed in batches (batch_size 1000)
with an error budget (``max_errors`` abort). Ray-Data form: ``read_csv`` /
``read_json`` → vectorized parse in map_batches; bad rows go to an errors
side-channel column instead of killing the task, and the driver enforces
the error budget on the (tiny) error count.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa

import ray
import ray.data

from ..functions.textfns import normalize_name


@dataclass(frozen=True)
class ImportMapping:
    """Header mapping (data_import.rs ImportConfig)."""

    name_col: str = "name"
    type_col: str = "type"
    confidence_col: str | None = "confidence"
    src_col: str = "source"
    dst_col: str = "target"
    rel_col: str = "relation"


def read_any(path: str) -> "ray.data.Dataset":
    if path.endswith((".csv", ".tsv")):
        import csv  # noqa: F401  (delimiter sniffing below)

        if path.endswith(".tsv"):
            from pyarrow import csv as pacsv

            return ray.data.read_csv(
                path, parse_options=pacsv.ParseOptions(delimiter="\t")
            )
        return ray.data.read_csv(path)
    if path.endswith((".json", ".jsonl")):
        return ray.data.read_json(path)
    raise ValueError(f"unsupported import format: {path}")


def make_entity_parser(mapping: ImportMapping = ImportMapping()):
    """Rows → imported-entity rows + error tag (never raises per row)."""

    def parse(batch: pa.Table) -> pa.Table:
        names = batch.column(mapping.name_col).to_pylist() \
            if mapping.name_col in batch.column_names else [None] * batch.num_rows
        types = batch.column(mapping.type_col).to_pylist() \
            if mapping.type_col in batch.column_names else ["UNKNOWN"] * batch.num_rows
        confs = (batch.column(mapping.confidence_col).to_pylist()
                 if mapping.confidence_col and mapping.confidence_col in batch.column_names
                 else [1.0] * batch.num_rows)
        out = {"entity_id": [], "name": [], "entity_type": [], "confidence": [],
               "error": []}
        for name, etype, conf in zip(names, types, confs):
            err = None
            if not name or not str(name).strip():
                err = "missing name"
            try:
                conf_f = float(conf) if conf is not None else 1.0
            except (TypeError, ValueError):
                conf_f, err = 0.0, "bad confidence"
            etype_s = str(etype or "UNKNOWN").upper()
            name_s = str(name or "").strip()
            out["entity_id"].append(f"{etype_s}_{normalize_name(name_s)}" if not err else None)
            out["name"].append(name_s)
            out["entity_type"].append(etype_s)
            out["confidence"].append(conf_f)
            out["error"].append(err)
        return pa.Table.from_pydict(
            {
                "entity_id": pa.array(out["entity_id"], pa.string()),
                "name": pa.array(out["name"], pa.string()),
                "entity_type": pa.array(out["entity_type"], pa.string()),
                "confidence": pa.array(out["confidence"], pa.float32()),
                "error": pa.array(out["error"], pa.string()),
            }
        )

    return parse


def make_relationship_parser(mapping: ImportMapping = ImportMapping()):
    def parse(batch: pa.Table) -> pa.Table:
        cols = batch.column_names
        srcs = batch.column(mapping.src_col).to_pylist() if mapping.src_col in cols \
            else [None] * batch.num_rows
        dsts = batch.column(mapping.dst_col).to_pylist() if mapping.dst_col in cols \
            else [None] * batch.num_rows
        rels = batch.column(mapping.rel_col).to_pylist() if mapping.rel_col in cols \
            else ["RELATED_TO"] * batch.num_rows
        out = {"src": [], "dst": [], "rel_type": [], "error": []}
        for s, d, r in zip(srcs, dsts, rels):
            err = None
            if not s or not d:
                err = "missing endpoint"
            out["src"].append(str(s or ""))
            out["dst"].append(str(d or ""))
            out["rel_type"].append(str(r or "RELATED_TO").upper())
            out["error"].append(err)
        return pa.Table.from_pydict(
            {
                "src": pa.array(out["src"], pa.string()),
                "dst": pa.array(out["dst"], pa.string()),
                "rel_type": pa.array(out["rel_type"], pa.string()),
                "error": pa.array(out["error"], pa.string()),
            }
        )

    return parse


def import_entities(path: str, mapping: ImportMapping = ImportMapping(),
                    max_errors: int = 100):
    """Read + parse; raises when the error budget is exceeded
    (data_import.rs max_errors abort)."""
    import pyarrow.compute as pc

    ds = read_any(path).map_batches(make_entity_parser(mapping),
                                    batch_format="pyarrow")
    errors = ds.filter(lambda r: r["error"] is not None)
    n_err = errors.count()
    if n_err > max_errors:
        raise ValueError(f"import aborted: {n_err} errors > max_errors={max_errors}")
    good = ds.map_batches(
        lambda t: t.filter(pc.is_null(t.column("error"))).drop_columns(["error"]),
        batch_format="pyarrow",
    )
    return good, errors
