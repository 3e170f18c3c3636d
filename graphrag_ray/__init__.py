"""graphrag_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch rebuild of the *semantics* of automataIA/graphrag-rs's indexing
flow (chunking, pattern entity/relation extraction, cross-document entity
canonicalization, graph materialization, Leiden-style communities) expressed
as streaming ``ray.data.Dataset`` pipelines:

- every logical table (documents/spans, chunks, entities, edges, triples,
  communities) is a Dataset with a fixed Arrow schema (``schemas.py``);
- per-record transforms are vectorized ``map_batches`` over Arrow batches;
- the canonicalization "shuffle" is a salted two-phase groupby-aggregate on
  normalized entity keys (hot-key skew handled explicitly);
- small sides (alias→canonical maps) are broadcast via ``ray.put``;
- stage outputs checkpoint to partitioned Parquet with manifests + lineage
  so a failed run resumes mid-pipeline.

Reference semantics citations throughout point into /root/reference
(``graphrag-core/src/...``) — behavior parity, not a code port.
"""

__version__ = "0.1.0"
