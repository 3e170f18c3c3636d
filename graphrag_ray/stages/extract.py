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


# cached i<j index templates for the vectorized pair emission (row-major,
# identical order to the reference's nested loop)
_TRIU_CACHE: dict = {}


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
        use_vectorized: bool = True,
    ):
        from ..functions import extraction_vec

        self.min_confidence = min_confidence
        self.entity_types = tuple(entity_types)
        self.extract_rels = extract_rels
        self.relationship_confidence = relationship_confidence
        self.max_contexts = max_contexts
        self.use_vectorized = (use_vectorized
                               and extraction_vec.supported(self.entity_types))

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.use_vectorized:
            return self._call_vectorized(batch)
        return self._call_rows(batch)

    def _call_vectorized(self, batch: pa.Table) -> pa.Table:
        """Batch-level Arrow/numpy extraction (functions/extraction_vec.py)
        — same output content as the per-row path, ~5× less CPU."""
        import numpy as np
        import pyarrow.compute as pc

        from ..functions.extraction_vec import extract_batch

        doc_ids = batch.column("doc_id").to_pylist()
        contents = batch.column("content").to_pylist()
        n_chunks = len(contents)
        doc_intern: dict[str, int] = {}
        doc_list: list[str] = []
        doc_ord = np.empty(n_chunks, np.int64)
        for i, d in enumerate(doc_ids):
            o = doc_intern.get(d)
            if o is None:
                o = doc_intern[d] = len(doc_list)
                doc_list.append(d)
            doc_ord[i] = o

        ents, pairs = extract_batch(contents, doc_ord, self.min_confidence,
                                    self.entity_types, self.extract_rels)
        if ents is None:
            return EXTRACTION.empty_table()

        # --- doc-level entity aggregation (== the row path's ent_acc dict)
        n_u = len(ents["chunk"])
        first_ord = ents["first_ord"]
        g = np.lexsort((first_ord, ents["namekey"], ents["type_id"],
                        ents["doc_ord"]))
        gd = ents["doc_ord"][g]
        gt = ents["type_id"][g]
        gk = ents["namekey"][g]
        newg = np.empty(n_u, bool)
        newg[0] = True
        newg[1:] = (gd[1:] != gd[:-1]) | (gt[1:] != gt[:-1]) | (gk[1:] != gk[:-1])
        starts = np.flatnonzero(newg)
        sizes = np.diff(np.append(starts, n_u))
        conf_g = np.maximum.reduceat(ents["conf"][g], starts)
        mentions_each = ents["k"] * ents["count"]
        nm_g = np.add.reduceat(mentions_each[g], starts)
        first_g = first_ord[g][starts]  # min: ordv ascending within group
        row_order = np.argsort(first_g, kind="stable")
        first_rows = g[starts][row_order]

        n_ent = len(starts)
        names, eid_strs = ents["names"], ents["eid_strs"]
        name_code, eid_code = ents["name_code"], ents["eid_code"]
        ent_doc = [doc_list[ents["doc_ord"][r]] for r in first_rows]
        ent_eid = [eid_strs[eid_code[r]] for r in first_rows]
        ent_name = [names[name_code[r]] for r in first_rows]
        type_strs = ("PERSON", "ORGANIZATION", "LOCATION")
        ent_type = [type_strs[ents["type_id"][r]] for r in first_rows]
        ent_conf = conf_g[row_order]
        ent_nrows = sizes[row_order]
        ent_nm = nm_g[row_order]

        # --- edge combine: ONE stable argsort over packed keys (the
        # np.unique(return_inverse) + lexsort double-sort was ~40% of this
        # UDF's wall on the bench corpus)
        if pairs is not None and len(pairs[0]):
            keys, pair_chunk, id_list, rel_list = pairs
            order = np.argsort(keys, kind="stable")
            sk = keys[order]
            sorted_chunks = pair_chunk[order]
            newk = np.empty(len(sk), bool)
            newk[0] = True
            np.not_equal(sk[1:], sk[:-1], out=newk[1:])
            kstarts = np.flatnonzero(newk)
            edge_keys = sk[kstarts]
            edge_counts = np.diff(np.append(kstarts, len(sk)))
            lengths = np.minimum(edge_counts, self.max_contexts)
            group_base = np.concatenate(([0], np.cumsum(lengths)[:-1]))
            within = np.arange(int(lengths.sum())) - np.repeat(group_base,
                                                               lengths)
            sel = np.repeat(kstarts, lengths) + within
            vals = pc.take(batch.column("chunk_id"),
                           pa.array(sorted_chunks[sel], pa.int64()))
            if isinstance(vals, pa.ChunkedArray):
                vals = vals.combine_chunks()
            list_arr = pa.ListArray.from_arrays(
                pa.array(np.concatenate(([0], np.cumsum(lengths))),
                         pa.int32()),
                vals.cast(pa.string()))
            edge_contexts = pc.binary_join(list_arr, "|")
        else:
            id_list, rel_list = [], []
            edge_keys = np.empty(0, dtype=np.int64)
            edge_counts = np.empty(0, dtype=np.int64)
            edge_contexts = pa.array([], pa.string())

        n_edge = len(edge_keys)
        row_kind = pc.take(
            pa.array(["entity", "edge"], pa.string()),
            pa.array(np.repeat(np.array([0, 1], np.int8),
                               [n_ent, n_edge]), pa.int8()))
        if isinstance(row_kind, pa.ChunkedArray):
            row_kind = row_kind.combine_chunks()

        def _ent_col(values: list) -> pa.Array:
            return pa.concat_arrays(
                [pa.array(values, pa.string()), pa.nulls(n_edge, pa.string())])

        doc_col = _ent_col(ent_doc)
        eid = _ent_col(ent_eid)
        name = _ent_col(ent_name)
        etype = _ent_col(ent_type)
        conf = np.concatenate(
            [ent_conf, np.full(n_edge, self.relationship_confidence)])
        n_rows_col = pa.concat_arrays(
            [pa.array(ent_nrows, pa.int64()), pa.nulls(n_edge, pa.int64())])
        n_mentions_col = pa.concat_arrays(
            [pa.array(ent_nm, pa.int64()), pa.nulls(n_edge, pa.int64())])
        def _decode(idx_arr: np.ndarray, strs: list) -> pa.Array:
            """null-prefixed string column decoded via one C++ take
            (dictionary decode), no per-row Python."""
            if not len(idx_arr):
                return pa.nulls(n_ent, pa.string())
            decoded = pc.take(pa.array(strs, pa.string()),
                              pa.array(idx_arr, pa.int64()))
            return pa.concat_arrays(
                [pa.nulls(n_ent, pa.string()),
                 decoded.combine_chunks() if isinstance(decoded, pa.ChunkedArray)
                 else decoded])

        src = _decode(edge_keys >> 34, id_list)
        dst = _decode((edge_keys >> 8) & 0x3FFFFFF, id_list)
        rel = _decode(edge_keys & 0xFF, rel_list)
        n_occ = pa.concat_arrays(
            [pa.nulls(n_ent, pa.int64()), pa.array(edge_counts, pa.int64())])
        contexts = pa.concat_arrays(
            [pa.nulls(n_ent, pa.string()), edge_contexts])

        return pa.Table.from_arrays(
            [
                row_kind,
                doc_col,
                eid,
                name,
                etype,
                pa.array(conf, pa.float32()),
                n_rows_col,
                n_mentions_col,
                src,
                dst,
                rel,
                n_occ,
                contexts,
            ],
            schema=EXTRACTION,
        )

    def _call_rows(self, batch: pa.Table) -> pa.Table:
        """Reference per-row path (kept verbatim: non-default entity types,
        allow/deny patterns, and the A/B identity tests run through it)."""
        import numpy as np

        from ..functions.extraction import _pair_rel_table

        chunk_ids = batch.column("chunk_id").to_pylist()
        doc_ids = batch.column("doc_id").to_pylist()
        contents = batch.column("content").to_pylist()

        # in-batch combiners
        ent_acc: dict[tuple[str, str, str], list] = {}  # (doc,name,type) -> [id,conf,n_rows,n_mentions]
        # The quadratic pair stream is VECTORIZED: per chunk, all i<j pair
        # keys pack into one int64 array ((src_i<<34)|(dst_i<<8)|rel_i over
        # per-batch interned ids) via cached triu index templates; the
        # batch-level combine is a single np.unique. Accumulation semantics
        # identical to the reference loop (counts exact; contexts = the
        # first max_contexts EMISSIONS' chunk ids in encounter order, since
        # emissions concatenate in chunk order and i<j row-major order ==
        # np.triu_indices order, and the lexsort below is stable on the
        # emission ordinal).
        id_intern: dict[str, int] = {}   # entity_id -> packed index
        id_list: list[str] = []
        rel_intern: dict[str, int] = {}  # rel type -> small index
        rel_list: list[str] = []
        type_intern: dict[str, int] = {}
        type_list: list[str] = []
        max_contexts = self.max_contexts
        key_parts: list[np.ndarray] = []   # per-chunk packed pair keys
        part_chunk: list[int] = []         # chunk ordinal per part

        for c_ord, (chunk_id, doc_id, text) in enumerate(
                zip(chunk_ids, doc_ids, contents)):
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
                rel_m = np.empty((nt, nt), dtype=np.int64)
                for a in range(nt):
                    for b in range(nt):
                        r = table.get((type_list[a], type_list[b]), "RELATED_TO")
                        ri = rel_intern.get(r)
                        if ri is None:
                            ri = rel_intern[r] = len(rel_list)
                            rel_list.append(r)
                        rel_m[a, b] = ri
                ids_arr = np.asarray(int_ids, dtype=np.int64)
                t_arr = np.asarray(t_idx, dtype=np.int64)
                iu = _TRIU_CACHE.get(n)
                if iu is None:
                    iu = _TRIU_CACHE[n] = np.triu_indices(n, 1)
                ii_, jj_ = iu
                key_parts.append(
                    (ids_arr[ii_] << 34) | (ids_arr[jj_] << 8)
                    | rel_m[t_arr[ii_], t_arr[jj_]]
                )
                part_chunk.append(c_ord)

        # --- batch-level edge combine (one np.unique over all emissions)
        if key_parts:
            import pyarrow.compute as pc

            all_keys = np.concatenate(key_parts)
            emission_chunk = np.repeat(
                np.asarray(part_chunk, dtype=np.int64),
                [len(p) for p in key_parts])
            uniq, inverse, counts = np.unique(
                all_keys, return_inverse=True, return_counts=True)
            # stable order by (edge, emission ordinal) → per-edge emission
            # chunks in encounter order
            order = np.lexsort((np.arange(len(all_keys)), inverse))
            sorted_chunks = emission_chunk[order]
            starts = np.zeros(len(uniq) + 1, dtype=np.int64)
            np.cumsum(counts, out=starts[1:])
            edge_keys = uniq
            edge_counts = counts
            # context strings fully vectorized: first max_contexts emission
            # ordinals per group gathered with one fancy-index, chunk ids
            # taken zero-copy from the input column, one Arrow binary_join
            # (this listcomp->kernel swap was ~40% of the UDF wall)
            lengths = np.minimum(counts, max_contexts)
            group_base = np.concatenate(([0], np.cumsum(lengths)[:-1]))
            within = np.arange(int(lengths.sum())) - np.repeat(group_base,
                                                               lengths)
            sel = np.repeat(starts[:-1], lengths) + within
            vals = pc.take(batch.column("chunk_id"),
                           pa.array(sorted_chunks[sel], pa.int64()))
            if isinstance(vals, pa.ChunkedArray):
                vals = vals.combine_chunks()
            list_arr = pa.ListArray.from_arrays(
                pa.array(np.concatenate(([0], np.cumsum(lengths))),
                         pa.int32()),
                vals.cast(pa.string()))
            edge_contexts = pc.binary_join(list_arr, "|")
        else:
            edge_keys = np.empty(0, dtype=np.int64)
            edge_counts = np.empty(0, dtype=np.int64)
            edge_contexts = pa.array([], pa.string())

        # packed-key invariants (26-bit dst index, 8-bit rel index)
        assert len(id_list) < (1 << 26) and len(rel_list) < 256

        n_ent, n_edge = len(ent_acc), len(edge_keys)
        row_kind = ["entity"] * n_ent + ["edge"] * n_edge
        doc_col: list = [k[0] for k in ent_acc] + [None] * n_edge
        eid: list = [v[0] for v in ent_acc.values()] + [None] * n_edge
        name: list = [k[1] for k in ent_acc] + [None] * n_edge
        etype: list = [k[2] for k in ent_acc] + [None] * n_edge
        conf: list = [v[1] for v in ent_acc.values()] + [self.relationship_confidence] * n_edge
        n_rows: list = [v[2] for v in ent_acc.values()] + [None] * n_edge
        n_mentions: list = [v[3] for v in ent_acc.values()] + [None] * n_edge
        src: list = [None] * n_ent + [id_list[k] for k in (edge_keys >> 34)]
        dst: list = [None] * n_ent + [id_list[k] for k in ((edge_keys >> 8) & 0x3FFFFFF)]
        rel: list = [None] * n_ent + [rel_list[k] for k in (edge_keys & 0xFF)]
        n_occ: list = [None] * n_ent + edge_counts.tolist()
        contexts = pa.concat_arrays(
            [pa.nulls(n_ent, pa.string()), edge_contexts])

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
                contexts,
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
        from .chunk import texts_from_spans

        doc_ids = batch.column("doc_id").to_pylist()
        texts = texts_from_spans(batch.column("spans"))
        chunk_ids: list[str] = []
        chunk_docs: list[str] = []
        contents: list[str] = []
        for doc_id, text in zip(doc_ids, texts):
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
