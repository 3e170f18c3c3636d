"""Fixed Arrow schemas for every logical table.

The reference declares fixed schemas in code at its persistence boundary
(graphrag-core/src/persistence/parquet.rs:219-230, 425-435, 617-651) and the
driver fixes our *input* table shape (BASELINE.json input_hint): a Lance/
parquet table of interleaved text+media documents. These pyarrow schemas are
the in-flight block schemas of the whole pipeline.
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),       # 'text' | 'image' | 'audio' | ...
        ("text", pa.string()),       # non-empty iff kind == 'text'
        ("media_ref", pa.string()),  # non-empty iff kind != 'text'
        ("offset", pa.int32()),      # monotonically increasing within the list
    ]
)

# input table (driver-mandated shape)
DOCUMENTS = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# chunker output (reference chunk ids: text/mod.rs:161 "{doc_id}_{counter}")
CHUNKS = pa.schema(
    [
        ("chunk_id", pa.string()),
        ("doc_id", pa.string()),
        ("chunk_idx", pa.int32()),
        ("content", pa.string()),
        ("start_offset", pa.int64()),  # char offset into concatenated text spans
        ("end_offset", pa.int64()),
    ]
)

# tagged union emitted by the extraction stage in a single pass, already
# combined within each batch (the earliest combiner): 'entity' rows are
# keyed (doc_id, name, entity_type) with occurrence counts; 'edge' rows are
# keyed (src_id, dst_id, rel_type) with counts + capped context chunk ids.
EXTRACTION = pa.schema(
    [
        ("row_kind", pa.string()),      # 'entity' | 'edge'
        # entity columns (entity/mod.rs:602-631)
        ("doc_id", pa.string()),
        ("entity_id", pa.string()),     # "{TYPE}_{normalized_name}"
        ("name", pa.string()),
        ("entity_type", pa.string()),
        ("confidence", pa.float32()),
        ("n_rows", pa.int64()),         # chunk-level occurrence count
        ("n_mentions", pa.int64()),
        # edge columns (entity/mod.rs:812-879)
        ("src_id", pa.string()),
        ("dst_id", pa.string()),
        ("rel_type", pa.string()),
        ("n_occurrences", pa.int64()),
        # capped pipe-joined sample of context chunk ids (provenance); a
        # string column instead of list<string> keeps the hottest shuffle
        # free of per-row Python list conversion
        ("contexts", pa.string()),
    ]
)

# the J4 mentions table (offsets re-derived by the dedicated mentions stage)
MENTIONS = pa.schema(
    [
        ("entity_id", pa.string()),
        ("chunk_id", pa.string()),
        ("start_offset", pa.int64()),
        ("end_offset", pa.int64()),
        ("confidence", pa.float32()),
    ]
)

# canonical entity table (corpus/entity_linker.rs:7-27 + knowledge_graph.rs:13-25)
ENTITIES = pa.schema(
    [
        ("canonical_id", pa.string()),
        ("canonical_name", pa.string()),
        ("entity_type", pa.string()),
        ("aliases", pa.list_(pa.string())),
        ("doc_frequency", pa.int64()),
        ("mention_count", pa.int64()),
        ("confidence", pa.float32()),
    ]
)

# alias→canonical map rows (string_similarity_linker.rs:68-124 output)
ALIAS_MAP = pa.schema(
    [
        ("entity_id", pa.string()),
        ("canonical_id", pa.string()),
        ("canonical_name", pa.string()),
        ("entity_type", pa.string()),
    ]
)

# deduplicated edge table (persistence/parquet.rs:425-435)
EDGES = pa.schema(
    [
        ("src", pa.string()),           # canonical_id
        ("dst", pa.string()),
        ("rel_type", pa.string()),
        ("confidence", pa.float32()),
        ("n_occurrences", pa.int64()),
        ("context", pa.list_(pa.string())),  # chunk ids (capped)
    ]
)

# the (subj, pred, obj) triples (entity/atomic_fact_extractor.rs:29-40 shape)
TRIPLES = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("confidence", pa.float32()),
        ("n_occurrences", pa.int64()),
    ]
)

COMMUNITIES = pa.schema(
    [
        ("level", pa.int32()),
        ("community_id", pa.int64()),
        ("entity_id", pa.string()),  # canonical_id
    ]
)

COMMUNITY_SUMMARIES = pa.schema(
    [
        ("level", pa.int32()),
        ("community_id", pa.int64()),
        ("summary", pa.string()),
        ("entity_count", pa.int64()),
    ]
)

EMBEDDINGS = pa.schema(
    [
        ("id", pa.string()),
        ("vector", pa.list_(pa.float32())),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
