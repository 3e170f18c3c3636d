"""Extraction stage: chunks → tagged entity/edge rows in ONE pass.

Ray-Data shape: one ``map_batches`` over chunk batches emits a tagged-union
table (``row_kind`` ∈ {'entity','edge'}) so entities and co-occurrence edge
candidates are computed in a single scan of the text (the expensive part);
downstream branches filter by tag. This replaces the reference's two
sequential driver loops over all chunks (graphrag/build.rs:537-553 entity
pass, :560-624 relationship pass) without reading the corpus twice.

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
    ):
        self.min_confidence = min_confidence
        self.entity_types = tuple(entity_types)
        self.extract_rels = extract_rels
        self.relationship_confidence = relationship_confidence

    def __call__(self, batch: pa.Table) -> pa.Table:
        chunk_ids = batch.column("chunk_id").to_pylist()
        doc_ids = batch.column("doc_id").to_pylist()
        contents = batch.column("content").to_pylist()

        cols: dict[str, list] = {name: [] for name in EXTRACTION.names}

        def emit_entity(chunk_id, doc_id, ent):
            cols["row_kind"].append("entity")
            cols["chunk_id"].append(chunk_id)
            cols["doc_id"].append(doc_id)
            cols["entity_id"].append(ent.entity_id)
            cols["name"].append(ent.name)
            cols["entity_type"].append(ent.entity_type)
            cols["confidence"].append(ent.confidence)
            cols["n_mentions"].append(len(ent.mentions))
            cols["mention_starts"].append([m[0] for m in ent.mentions])
            cols["mention_ends"].append([m[1] for m in ent.mentions])
            cols["src_id"].append(None)
            cols["dst_id"].append(None)
            cols["rel_type"].append(None)

        def emit_edge(chunk_id, doc_id, src, dst, rel):
            cols["row_kind"].append("edge")
            cols["chunk_id"].append(chunk_id)
            cols["doc_id"].append(doc_id)
            cols["entity_id"].append(None)
            cols["name"].append(None)
            cols["entity_type"].append(None)
            cols["confidence"].append(self.relationship_confidence)
            cols["n_mentions"].append(None)
            cols["mention_starts"].append(None)
            cols["mention_ends"].append(None)
            cols["src_id"].append(src)
            cols["dst_id"].append(dst)
            cols["rel_type"].append(rel)

        for chunk_id, doc_id, text in zip(chunk_ids, doc_ids, contents):
            ents = extract_entities(text, self.min_confidence, self.entity_types)
            for ent in ents:
                emit_entity(chunk_id, doc_id, ent)
            if self.extract_rels and len(ents) >= 2:
                for src, dst, rel in extract_relationships(ents, text):
                    emit_edge(chunk_id, doc_id, src, dst, rel)

        return pa.Table.from_arrays(
            [pa.array(cols[f.name], f.type) for f in EXTRACTION],
            schema=EXTRACTION,
        )
