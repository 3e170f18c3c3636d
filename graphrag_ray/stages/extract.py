"""Extraction stage: chunks → combined entity/edge partial rows in ONE pass.

Ray-Data shape: one ``map_batches`` over chunk batches emits a tagged-union
table (``row_kind`` ∈ {'entity','edge'}); downstream branches filter by
tag. This replaces the reference's two sequential driver loops over all
chunks (graphrag/build.rs:537-553 entity pass, :560-624 relationship pass)
without reading the corpus twice.

Fan-out control (the scale lesson): the raw per-chunk emission is
quadratic in co-occurring entities (~100-200 rows per chunk). The UDF
therefore COMBINES within each batch before emitting —
  entity rows keyed by (doc_id, name, entity_type):
      n_rows (chunk-level occurrence count), n_mentions sum, max confidence
  edge rows keyed by (src_id, dst_id, rel_type):
      n_occurrences sum, context chunk-id list (capped)
— an associative/commutative pre-aggregation, so the downstream salted
groupbys see 10-100× fewer rows while final counts are exactly the
reference's (G1/G7 merge semantics). Mention *offsets* are not carried
through this hot path; the dedicated mentions stage re-derives them
(make_mentions_batch_fn) for consumers that need the J4 table.

The extractor itself is a pure function (functions/extraction.py) — a
transcription of entity/mod.rs:114-1108 — shared with the parity oracle.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.extraction import extract_entities, extract_relationships
from ..schemas import EXTRACTION


class PatternExtractor:
    """Callable class → actor-pool-friendly; also works as a plain task.

    State (word lists) is module-level constants so __init__ is trivial; we
    still use the class form so model-based extractors (GLiNER/LLM stubs)
    can swap in behind the same stage signature (SURVEY.md §2.3).
    """

    def __init__(
        self,
        min_confidence: float = 0.7,
        entity_types: tuple[str, ...] = ("PERSON", "ORGANIZATION", "LOCATION"),
        extract_rels: bool = True,
        relationship_confidence: float = 0.5,
        max_contexts: int = 64,
    ):
        self.min_confidence = min_confidence
        self.entity_types = tuple(entity_types)
        self.extract_rels = extract_rels
        self.relationship_confidence = relationship_confidence
        self.max_contexts = max_contexts

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.extraction import _pair_rel_table

        chunk_ids = batch.column("chunk_id").to_pylist()
        doc_ids = batch.column("doc_id").to_pylist()
        contents = batch.column("content").to_pylist()

        # in-batch combiners
        ent_acc: dict[tuple[str, str, str], list] = {}  # (doc,name,type) -> [id,conf,n_rows,n_mentions]
        # edge combiner keyed by a packed int (src_i<<34 | dst_i<<8 | rel_i)
        # over per-batch interned ids — the quadratic pair loop is the
        # hottest code in the whole pipeline and a single small-int dict op
        # is ~2× a 3-string-tuple one. Same accumulation semantics as the
        # tuple-keyed form (counts exact, contexts = first max_contexts
        # chunk ids in encounter order).
        edge_acc: dict[int, list] = {}
        id_intern: dict[str, int] = {}   # entity_id -> packed index
        id_list: list[str] = []
        rel_intern: dict[str, int] = {}  # rel type -> small index
        rel_list: list[str] = []
        type_intern: dict[str, int] = {}
        type_list: list[str] = []
        max_contexts = self.max_contexts

        for chunk_id, doc_id, text in zip(chunk_ids, doc_ids, contents):
            ents = extract_entities(text, self.min_confidence, self.entity_types,
                                     with_offsets=False)
            for ent in ents:
                key = (doc_id, ent.name, ent.entity_type)
                slot = ent_acc.get(key)
                if slot is None:
                    ent_acc[key] = [ent.entity_id, ent.confidence, 1, ent.n_mentions]
                else:
                    slot[1] = max(slot[1], ent.confidence)
                    slot[2] += 1
                    slot[3] += ent.n_mentions
            if self.extract_rels and len(ents) >= 2:
                # fused pair emission: same semantics as
                # extract_relationships (all i<j pairs typed by the chunk's
                # keyword table) but updating the combiner directly — the
                # quadratic tuple list never materializes
                table = _pair_rel_table(text)
                n = len(ents)
                int_ids = []
                t_idx = []
                for e in ents:
                    ii = id_intern.get(e.entity_id)
                    if ii is None:
                        ii = id_intern[e.entity_id] = len(id_list)
                        id_list.append(e.entity_id)
                    int_ids.append(ii)
                    ti = type_intern.get(e.entity_type)
                    if ti is None:
                        ti = type_intern[e.entity_type] = len(type_list)
                        type_list.append(e.entity_type)
                    t_idx.append(ti)
                # per-chunk (type_i, type_j) -> interned rel matrix
                nt = len(type_list)
                rel_m = []
                for a in range(nt):
                    row = []
                    for b in range(nt):
                        r = table.get((type_list[a], type_list[b]), "RELATED_TO")
                        ri = rel_intern.get(r)
                        if ri is None:
                            ri = rel_intern[r] = len(rel_list)
                            rel_list.append(r)
                        row.append(ri)
                    rel_m.append(row)
                get_edge = edge_acc.get
                for i in range(n):
                    hi = int_ids[i] << 34
                    row = rel_m[t_idx[i]]
                    for j in range(i + 1, n):
                        ekey = hi | (int_ids[j] << 8) | row[t_idx[j]]
                        eslot = get_edge(ekey)
                        if eslot is None:
                            # [n_occurrences, n_contexts, context ids]
                            edge_acc[ekey] = [1, 1, chunk_id]
                        else:
                            eslot[0] += 1
                            if eslot[1] < max_contexts:
                                eslot[1] += 1
                                eslot[2] += "|" + chunk_id

        # packed-key invariants (26-bit dst index, 8-bit rel index)
        assert len(id_list) < (1 << 26) and len(rel_list) < 256

        n_ent, n_edge = len(ent_acc), len(edge_acc)
        row_kind = ["entity"] * n_ent + ["edge"] * n_edge
        doc_col: list = [k[0] for k in ent_acc] + [None] * n_edge
        eid: list = [v[0] for v in ent_acc.values()] + [None] * n_edge
        name: list = [k[1] for k in ent_acc] + [None] * n_edge
        etype: list = [k[2] for k in ent_acc] + [None] * n_edge
        conf: list = [v[1] for v in ent_acc.values()] + [self.relationship_confidence] * n_edge
        n_rows: list = [v[2] for v in ent_acc.values()] + [None] * n_edge
        n_mentions: list = [v[3] for v in ent_acc.values()] + [None] * n_edge
        src: list = [None] * n_ent + [id_list[k >> 34] for k in edge_acc]
        dst: list = [None] * n_ent + [id_list[(k >> 8) & 0x3FFFFFF] for k in edge_acc]
        rel: list = [None] * n_ent + [rel_list[k & 0xFF] for k in edge_acc]
        n_occ: list = [None] * n_ent + [v[0] for v in edge_acc.values()]
        contexts: list = [None] * n_ent + [v[2] for v in edge_acc.values()]

        return pa.Table.from_arrays(
            [
                pa.array(row_kind, pa.string()),
                pa.array(doc_col, pa.string()),
                pa.array(eid, pa.string()),
                pa.array(name, pa.string()),
                pa.array(etype, pa.string()),
                pa.array(conf, pa.float32()),
                pa.array(n_rows, pa.int64()),
                pa.array(n_mentions, pa.int64()),
                pa.array(src, pa.string()),
                pa.array(dst, pa.string()),
                pa.array(rel, pa.string()),
                pa.array(n_occ, pa.int64()),
                pa.array(contexts, pa.string()),
            ],
            schema=EXTRACTION,
        )


class ChunkExtract:
    """Fused chunk+extract stage: spans-document batches → combined
    extraction rows.

    Fusing in ONE UDF (instead of two fused map_batches) does two things at
    scale: (a) the in-batch combiner spans every chunk of a whole document
    batch, cutting the quadratic edge-pair stream ~10× before it hits the
    object store; (b) ``batch_size`` is unambiguously documents-per-UDF-call
    (Ray sizes fused-chain task bundles by the largest batch_size in
    upstream rows, which made chunk-level batch sizes balloon task inputs).
    The chunks *table* is produced by the separate chunk stage only for
    consumers that ask for it; the hot path never materializes chunk text.
    """

    def __init__(
        self,
        chunk_size: int = 1000,
        chunk_overlap: int = 200,
        min_confidence: float = 0.7,
        entity_types: tuple[str, ...] = ("PERSON", "ORGANIZATION", "LOCATION"),
        extract_rels: bool = True,
        relationship_confidence: float = 0.5,
        max_contexts: int = 8,
        chunking_strategy: str = "legacy",
        min_chunk_size: int = 50,
    ):
        self.chunk_size = chunk_size
        self.chunk_overlap = chunk_overlap
        self.chunking_strategy = chunking_strategy
        self.min_chunk_size = min_chunk_size
        self.extractor = PatternExtractor(
            min_confidence, entity_types, extract_rels,
            relationship_confidence, max_contexts,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.chunking import chunk_doc

        doc_ids = batch.column("doc_id").to_pylist()
        spans_col = batch.column("spans").to_pylist()
        chunk_ids: list[str] = []
        chunk_docs: list[str] = []
        contents: list[str] = []
        for doc_id, spans in zip(doc_ids, spans_col):
            text = "".join(s["text"] for s in spans if s["kind"] == "text")
            for idx, _start, _end, content in chunk_doc(
                    text, self.chunking_strategy, self.chunk_size,
                    self.chunk_overlap, self.min_chunk_size):
                chunk_ids.append(f"{doc_id}_{idx}")
                chunk_docs.append(doc_id)
                contents.append(content)
        inner = pa.Table.from_pydict(
            {
                "chunk_id": pa.array(chunk_ids, pa.string()),
                "doc_id": pa.array(chunk_docs, pa.string()),
                "content": pa.array(contents, pa.string()),
            }
        )
        return self.extractor(inner)


def make_mentions_batch_fn(
    min_confidence: float = 0.7,
    entity_types: tuple[str, ...] = ("PERSON", "ORGANIZATION", "LOCATION"),
):
    """The J4 mentions table (entity_id, chunk_id, start, end, confidence)
    with character offsets — a separate scan so the hot KG path doesn't
    carry offset lists."""

    def mentions_batch(batch: pa.Table) -> pa.Table:
        out = {"entity_id": [], "chunk_id": [], "start_offset": [],
               "end_offset": [], "confidence": []}
        for chunk_id, text in zip(
            batch.column("chunk_id").to_pylist(), batch.column("content").to_pylist()
        ):
            for ent in extract_entities(text, min_confidence, entity_types):
                for s, e in ent.mentions:
                    out["entity_id"].append(ent.entity_id)
                    out["chunk_id"].append(chunk_id)
                    out["start_offset"].append(s)
                    out["end_offset"].append(e)
                    out["confidence"].append(ent.confidence)
        return pa.Table.from_pydict(
            {
                "entity_id": pa.array(out["entity_id"], pa.string()),
                "chunk_id": pa.array(out["chunk_id"], pa.string()),
                "start_offset": pa.array(out["start_offset"], pa.int64()),
                "end_offset": pa.array(out["end_offset"], pa.int64()),
                "confidence": pa.array(out["confidence"], pa.float32()),
            }
        )

    return mentions_batch
