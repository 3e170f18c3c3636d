"""Layout parsers (S8): plaintext / markdown / HTML → document sections.

Reference: text/parsers/{plaintext,markdown,html}.rs — each parser emits the
document's structural sections (heading hierarchy) used by the chunk
enricher for chapter/section metadata. Stateless ``map_batches`` UDF per
format with auto-detection (LayoutParserFactory, text/mod.rs:219-222).
"""

from __future__ import annotations

import re

import pyarrow as pa

SECTIONS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("section_idx", pa.int32()),
        ("level", pa.int32()),
        ("title", pa.string()),
        ("start_offset", pa.int64()),
    ]
)

_MD_HEADING = re.compile(r"(?m)^(#{1,6})\s+(.+?)\s*$")
_HTML_HEADING = re.compile(r"<h([1-6])[^>]*>(.*?)</h\1>", re.I | re.S)
_HTML_TAG = re.compile(r"<[^>]+>")
_PLAIN_HEADING = re.compile(
    r"(?m)^\s*((?:CHAPTER|Chapter|PART|Part|BOOK|Book)\s+\S+.*?|[A-Z][A-Z \d:,'-]{6,60})\s*$"
)


def detect_format(text: str) -> str:
    """LayoutParserFactory auto-detection: html tags → html, '#' headings →
    markdown, else plaintext."""
    sample = text[:4000]
    if _HTML_HEADING.search(sample) or "<html" in sample.lower() or "<p>" in sample.lower():
        return "html"
    if _MD_HEADING.search(sample):
        return "markdown"
    return "plaintext"


def parse_sections(text: str, fmt: str | None = None) -> list[dict]:
    fmt = fmt or detect_format(text)
    sections = []
    if fmt == "markdown":
        for m in _MD_HEADING.finditer(text):
            sections.append({"level": len(m.group(1)), "title": m.group(2),
                             "start_offset": m.start(), "end_offset": m.end()})
    elif fmt == "html":
        for m in _HTML_HEADING.finditer(text):
            title = _HTML_TAG.sub("", m.group(2)).strip()
            sections.append({"level": int(m.group(1)), "title": title,
                             "start_offset": m.start(), "end_offset": m.end()})
    else:
        for m in _PLAIN_HEADING.finditer(text):
            sections.append({"level": 1, "title": m.group(1).strip(),
                             "start_offset": m.start(), "end_offset": m.end()})
    return sections


def sections_batch(batch: pa.Table) -> pa.Table:
    """documents(text or spans) → section rows."""
    out = {name: [] for name in SECTIONS_SCHEMA.names}
    if "spans" in batch.column_names:
        texts = ["".join(s["text"] for s in spans if s["kind"] == "text")
                 for spans in batch.column("spans").to_pylist()]
        doc_ids = batch.column("doc_id").to_pylist()
    else:
        texts = batch.column("text").to_pylist()
        doc_ids = [str(d) for d in batch.column("doc_id").to_pylist()]
    for doc_id, text in zip(doc_ids, texts):
        for i, sec in enumerate(parse_sections(text or "")):
            out["doc_id"].append(str(doc_id))
            out["section_idx"].append(i)
            out["level"].append(sec["level"])
            out["title"].append(sec["title"])
            out["start_offset"].append(sec["start_offset"])
    return pa.Table.from_arrays(
        [pa.array(out[f.name], f.type) for f in SECTIONS_SCHEMA],
        schema=SECTIONS_SCHEMA,
    )


# ---------------------------------------------------------------------------
# Hierarchical document structure (text/document_structure.rs +
# parsers/markdown.rs:18-72 build_sections / build_hierarchy)

STRUCTURE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("section_idx", pa.int32()),
        ("level", pa.int32()),
        ("title", pa.string()),
        ("parent_idx", pa.int32()),      # -1 for root sections
        ("depth", pa.int32()),
        ("path", pa.string()),           # root→leaf titles joined ' > '
        ("content_start", pa.int64()),   # after the heading
        ("content_end", pa.int64()),     # next heading start or len(text)
    ]
)


def build_structure(sections: list[dict], text_len: int) -> list[dict]:
    """Section hierarchy over parsed headings (markdown.rs:18-72):
    content spans run heading-end → next heading start; a section's parent
    is the nearest preceding section with a strictly smaller level (the
    stack rule); depth counts parent links; path is the root→leaf heading
    title chain."""
    n = len(sections)
    out: list[dict] = []
    stack: list[int] = []
    parents: list[int] = [-1] * n
    for i, sec in enumerate(sections):
        while stack and sections[stack[-1]]["level"] >= sec["level"]:
            stack.pop()
        parents[i] = stack[-1] if stack else -1
        stack.append(i)
    for i, sec in enumerate(sections):
        depth = 0
        path = [sec["title"]]
        cur = parents[i]
        while cur != -1:
            depth += 1
            path.append(sections[cur]["title"])
            cur = parents[cur]
        out.append(
            {
                "section_idx": i,
                "level": sec["level"],
                "title": sec["title"],
                "parent_idx": parents[i],
                "depth": depth,
                "path": " > ".join(reversed(path)),
                "content_start": sec["end_offset"],
                "content_end": (sections[i + 1]["start_offset"]
                                if i + 1 < n else text_len),
            }
        )
    return out


def structure_batch(batch: pa.Table) -> pa.Table:
    """documents(text or spans) → hierarchical structure rows."""
    out = {name: [] for name in STRUCTURE_SCHEMA.names}
    if "spans" in batch.column_names:
        texts = ["".join(s["text"] for s in spans if s["kind"] == "text")
                 for spans in batch.column("spans").to_pylist()]
        doc_ids = batch.column("doc_id").to_pylist()
    else:
        texts = batch.column("text").to_pylist()
        doc_ids = [str(d) for d in batch.column("doc_id").to_pylist()]
    for doc_id, text in zip(doc_ids, texts):
        text = text or ""
        for row in build_structure(parse_sections(text), len(text)):
            out["doc_id"].append(str(doc_id))
            for k, v in row.items():
                out[k].append(v)
    return pa.Table.from_arrays(
        [pa.array(out[f.name], f.type) for f in STRUCTURE_SCHEMA],
        schema=STRUCTURE_SCHEMA,
    )
