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


# ---------------------------------------------------------------------------
# S2 continued: RDF/Turtle + GraphML import (data_import.rs:562-676 RDF,
# :688-820 GraphML). Pure parse functions + a distributed file reader:
# files are self-contained graphs, so the Ray shape is
# read_binary_files → one parse per file inside map_batches.


def extract_local_name(uri: str) -> str:
    """Last path/#fragment segment of a URI (data_import.rs:678-685)."""
    cleaned = uri.strip().lstrip("<").rstrip(">")
    for sep in ("#", "/"):
        if sep in cleaned:
            cleaned = cleaned.rsplit(sep, 1)[1]
    return cleaned


def _turtle_statements(text: str):
    """Split a Turtle document into '.'-terminated statements, respecting
    quoted literals and stripping comments. Subset: @prefix declarations,
    <uri> / prefix:name terms, plain + typed/lang literals, ';' predicate
    lists and ',' object lists."""
    statements, cur, in_str, in_uri = [], [], False, False
    i = 0
    while i < len(text):
        ch = text[i]
        if ch == '"':
            in_str = not in_str
            cur.append(ch)
        elif ch == "<" and not in_str:
            in_uri = True
            cur.append(ch)
        elif ch == ">" and in_uri:
            in_uri = False
            cur.append(ch)
        elif ch == "#" and not in_str and not in_uri:
            while i < len(text) and text[i] != "\n":
                i += 1
            continue
        elif ch == "." and not in_str and not in_uri and (
                i + 1 >= len(text) or text[i + 1] in " \t\r\n"):
            statements.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
        i += 1
    if "".join(cur).strip():
        statements.append("".join(cur).strip())
    return [s for s in statements if s]


def _turtle_tokens(stmt: str) -> list[str]:
    tokens, cur, in_str, in_uri = [], [], False, False
    for ch in stmt:
        if in_str:
            cur.append(ch)
            if ch == '"':
                in_str = False
        elif in_uri:
            cur.append(ch)
            if ch == ">":
                in_uri = False
        elif ch == '"':
            cur.append(ch)
            in_str = True
        elif ch == "<":
            cur.append(ch)
            in_uri = True
        elif ch in " \t\r\n":
            if cur:
                tokens.append("".join(cur))
                cur = []
        elif ch in ";,":
            if cur:
                tokens.append("".join(cur))
                cur = []
            tokens.append(ch)
        else:
            cur.append(ch)
    if cur:
        tokens.append("".join(cur))
    return tokens


def parse_rdf_turtle(text: str):
    """Turtle subset → (entities, relationships, errors) dicts-of-lists.

    Reference semantics (data_import.rs:562-660): URI objects become
    relationships between local names; literal objects become entity
    attributes; entity name = label|name attr else id; entity type =
    type|rdf:type attr else 'resource'."""
    prefixes: dict[str, str] = {}
    entity_attrs: dict[str, dict[str, str]] = {}
    rels: list[tuple[str, str, str]] = []
    errors: list[str] = []

    def resolve(term: str) -> str:
        if term.startswith("<"):
            return term
        if ":" in term and not term.startswith('"'):
            pfx, local = term.split(":", 1)
            base = prefixes.get(pfx)
            if base is not None:
                return f"<{base}{local}>"
        return term

    for stmt in _turtle_statements(text):
        if stmt.startswith("@prefix"):
            try:
                _, pfx, uri = stmt.split(None, 2)
                prefixes[pfx.rstrip(":")] = uri.strip().lstrip("<").rstrip(">")
            except ValueError:
                errors.append(f"bad @prefix: {stmt[:60]}")
            continue
        toks = _turtle_tokens(stmt)
        if len(toks) < 3:
            errors.append(f"short statement: {stmt[:60]}")
            continue
        subject = resolve(toks[0])
        entity_attrs.setdefault(subject, {})
        i = 1
        predicate = None
        while i < len(toks):
            t = toks[i]
            if t == ";":
                predicate = None
                i += 1
                continue
            if t == ",":
                i += 1
                continue
            if predicate is None:
                predicate = resolve(t)
                i += 1
                continue
            obj = toks[i]
            i += 1
            if obj.startswith('"'):
                # literal (strip quotes and any @lang/^^type suffix)
                value = obj.split('"')[1] if obj.count('"') >= 2 else obj.strip('"')
                prop = extract_local_name(predicate)
                if prop == "a":
                    prop = "type"
                entity_attrs[subject][prop] = value
            else:
                obj_uri = resolve(obj)
                if predicate == "a":  # turtle shorthand for rdf:type
                    entity_attrs[subject]["type"] = extract_local_name(obj_uri)
                    continue
                entity_attrs.setdefault(obj_uri, {})
                rels.append((extract_local_name(subject),
                             extract_local_name(obj_uri),
                             extract_local_name(predicate)))
    entities = []
    for uri, attrs in entity_attrs.items():
        eid = extract_local_name(uri)
        name = attrs.get("label") or attrs.get("name") or eid
        etype = attrs.get("type") or attrs.get("rdf:type") or "resource"
        entities.append((eid, name, etype))
    return entities, rels, errors


def parse_graphml(text: str):
    """GraphML → (entities, relationships, errors).

    Reference semantics (data_import.rs:688-820): node name =
    name|label data else id; node type = type|category else 'node';
    edge relation = type|label data else 'related'."""
    import xml.etree.ElementTree as ET

    entities, rels, errors = [], [], []
    try:
        root = ET.fromstring(text)
    except ET.ParseError as e:
        return [], [], [f"xml parse error: {e}"]

    def local(tag: str) -> str:
        return tag.rsplit("}", 1)[-1]

    # key id → attr.name mapping (GraphML <key> declarations); data keys
    # may reference either the key id or the declared name
    key_names: dict[str, str] = {}
    for el in root.iter():
        if local(el.tag) == "key":
            kid, kname = el.get("id"), el.get("attr.name")
            if kid and kname:
                key_names[kid] = kname

    def data_attrs(el) -> dict[str, str]:
        out = {}
        for d in el:
            if local(d.tag) == "data":
                k = d.get("key") or ""
                out[key_names.get(k, k)] = (d.text or "").strip()
        return out

    for el in root.iter():
        tag = local(el.tag)
        if tag == "node":
            nid = el.get("id") or ""
            if not nid:
                errors.append("node without id")
                continue
            attrs = data_attrs(el)
            name = attrs.get("name") or attrs.get("label") or nid
            etype = attrs.get("type") or attrs.get("category") or "node"
            entities.append((nid, name, etype))
        elif tag == "edge":
            src, dst = el.get("source") or "", el.get("target") or ""
            if not src or not dst:
                errors.append("edge missing endpoint")
                continue
            attrs = data_attrs(el)
            rel = attrs.get("type") or attrs.get("label") or "related"
            rels.append((src, dst, rel))
    return entities, rels, errors


GRAPH_IMPORT_SCHEMA = pa.schema(
    [
        ("row_kind", pa.string()),     # 'entity' | 'relationship' | 'error'
        ("entity_id", pa.string()),
        ("name", pa.string()),
        ("entity_type", pa.string()),
        ("src", pa.string()),
        ("dst", pa.string()),
        ("rel_type", pa.string()),
        ("error", pa.string()),
        ("source_file", pa.string()),
    ]
)


def import_graph_files(paths: str | list[str], fmt: str | None = None):
    """Distributed RDF/GraphML import: each file parses independently
    inside map_batches (read_binary_files → flat tagged rows)."""
    ds = ray.data.read_binary_files(paths, include_paths=True)

    def parse_files(batch: pa.Table) -> pa.Table:
        rows = {name: [] for name in GRAPH_IMPORT_SCHEMA.names}

        def emit(kind, path, eid="", name="", etype="", src="", dst="",
                 rel="", err=""):
            rows["row_kind"].append(kind)
            rows["entity_id"].append(eid)
            rows["name"].append(name)
            rows["entity_type"].append(etype)
            rows["src"].append(src)
            rows["dst"].append(dst)
            rows["rel_type"].append(rel)
            rows["error"].append(err)
            rows["source_file"].append(path)

        for path, data in zip(batch.column("path").to_pylist(),
                              batch.column("bytes").to_pylist()):
            text = data.decode("utf-8", errors="replace")
            use = fmt or ("graphml" if path.endswith((".graphml", ".xml"))
                          else "rdf")
            ents, rels, errs = (parse_graphml(text) if use == "graphml"
                                else parse_rdf_turtle(text))
            for eid, name, etype in sorted(ents):
                emit("entity", path, eid=eid, name=name, etype=etype)
            for src, dst, rel in rels:
                emit("relationship", path, src=src, dst=dst, rel=rel)
            for err in errs:
                emit("error", path, err=err)
        return pa.Table.from_arrays(
            [pa.array(rows[f.name], f.type) for f in GRAPH_IMPORT_SCHEMA],
            schema=GRAPH_IMPORT_SCHEMA,
        )

    return ds.map_batches(parse_files, batch_format="pyarrow")
