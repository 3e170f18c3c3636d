"""Chunking stage: spans-documents → chunks (flat map over doc rows).

Ray-Data shape: a stateless ``map_batches`` UDF (Arrow in / Arrow out) that
emits ≥0 chunk rows per document row. The document text is the ordered
concatenation of its ``kind=='text'`` spans (SURVEY.md §1.3 adapter rule);
media spans are untouched — this stage only *reads* spans, never rewrites
them, preserving the per-row span-sequence invariant.

Reference semantics: text/mod.rs:141-187 (window/overlap/sentence snap),
chunk ids "{doc_id}_{idx}" (text/mod.rs:161).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.chunking import chunk_doc
from ..schemas import CHUNKS


def texts_from_spans(spans_col) -> list[str]:
    """Arrow-native per-doc text assembly: concatenation of the
    ``kind=='text'`` span texts, media spans contributing ''. ~40× faster
    than ``to_pylist()`` + a Python join (the spans structs never
    materialize as Python dicts — only the 48-or-so final strings do).
    Slice-safe: offsets are rebuilt from value lengths, so sliced /
    chunked inputs can't misalign the rebuilt list."""
    col = spans_col.combine_chunks() if isinstance(spans_col, pa.ChunkedArray) \
        else spans_col
    if len(col) == 0:
        return []
    flat = col.flatten()  # values for exactly the logical slice
    masked = pc.if_else(pc.equal(flat.field("kind"), "text"),
                        flat.field("text"), "")
    lengths = pc.list_value_length(col).to_numpy(zero_copy_only=False)
    offsets = np.zeros(len(lengths) + 1, dtype=np.int32)
    np.cumsum(lengths, out=offsets[1:])
    rebuilt = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), masked)
    return pc.binary_join(rebuilt, "").to_pylist()


def make_chunk_batch_fn(chunk_size: int = 1000, overlap: int = 200,
                        strategy: str = "legacy", min_chunk_size: int = 50):
    """Build the map_batches UDF (configured once, applied per batch).
    Strategies: 'legacy' (sliding window + sentence snap), 'hierarchical'
    (recursive separators), 'semantic' (M3 — embedding-similarity
    breakpoints; start/end are sentence indices)."""

    def chunk_batch(batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = texts_from_spans(batch.column("spans"))
        out_chunk_id: list[str] = []
        out_doc_id: list[str] = []
        out_idx: list[int] = []
        out_content: list[str] = []
        out_start: list[int] = []
        out_end: list[int] = []
        for doc_id, text in zip(doc_ids, texts):
            for idx, start, end, content in chunk_doc(
                    text, strategy, chunk_size, overlap, min_chunk_size):
                out_chunk_id.append(f"{doc_id}_{idx}")
                out_doc_id.append(doc_id)
                out_idx.append(idx)
                out_content.append(content)
                out_start.append(start)
                out_end.append(end)
        return pa.Table.from_arrays(
            [
                pa.array(out_chunk_id, pa.string()),
                pa.array(out_doc_id, pa.string()),
                pa.array(out_idx, pa.int32()),
                pa.array(out_content, pa.string()),
                pa.array(out_start, pa.int64()),
                pa.array(out_end, pa.int64()),
            ],
            schema=CHUNKS,
        )

    return chunk_batch
