"""M3 semantic chunking: reference inline tests (semantic_chunking.rs
tests at :319-410, hand-transcribed expectations) + full-pipeline parity at
chunking_strategy='semantic'."""

import numpy as np
import pytest

import ray

from graphrag_ray.config import PipelineConfig
from graphrag_ray.functions.chunking import (
    _semantic_threshold,
    chunk_text_semantic,
    split_sentences_semantic,
)
from graphrag_ray.oracle import run_oracle, triple_precision_recall
from graphrag_ray.pipelines.kg import build_kg
from graphrag_ray.stages.embed import HashEmbedder
from graphrag_ray.synth import doc_text_from_spans, synth_documents_table


def test_sentence_splitting_reference_case():
    # semantic_chunking.rs:322-335
    text = "This is sentence one. This is sentence two! Is this sentence three?"
    sentences = split_sentences_semantic(text)
    assert len(sentences) == 3
    assert "sentence one" in sentences[0]
    assert "sentence two" in sentences[1]
    assert "sentence three" in sentences[2]


def test_sentence_splitting_multiline_and_blank():
    text = "First part\ncontinues here. Second one!\n\nAfter blank no punct"
    s = split_sentences_semantic(text)
    assert s[0] == "First part continues here."
    assert s[1] == "Second one!"
    assert s[2] == "After blank no punct"


def test_percentile_threshold_reference_case():
    # semantic_chunking.rs:366-379: 95th pct of 0.1..1.0 → >= 0.9
    diffs = [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0]
    thr = _semantic_threshold(diffs, "percentile", 95.0)
    assert thr >= 0.9


def test_std_threshold_reference_case():
    # semantic_chunking.rs:382-394: zero variance → threshold == mean
    thr = _semantic_threshold([0.5] * 5, "stddev", 3.0)
    assert abs(thr - 0.5) < 1e-3


def test_semantic_chunking_basic_reference_case():
    # semantic_chunking.rs:397-417 (threshold 50 → several chunks)
    emb = HashEmbedder(dim=64)
    text = ("Alice loves programming. Bob also codes daily. "
            "The weather is sunny. Rain is expected tomorrow.")
    chunks = chunk_text_semantic(text, emb.embed_text,
                                 strategy="percentile", threshold_amount=50.0)
    assert chunks
    for _idx, start, end, content in chunks:
        assert content
        assert end > start
    # sentence spans tile [0, 4) without overlap
    assert chunks[0][1] == 0
    assert chunks[-1][2] == 4


def test_min_chunk_merges_forward():
    """The reference's `continue` quirk: a too-small segment merges into
    the following chunk instead of being dropped."""
    emb = HashEmbedder(dim=64)
    text = "Aaa bbb. Ccc ddd. Eee fff. Ggg hhh."
    # absolute threshold 0 → every boundary is a breakpoint
    chunks = chunk_text_semantic(text, emb.embed_text, strategy="absolute",
                                 threshold_amount=0.0,
                                 min_chunk_sentences=2)
    # each 1-sentence segment merges forward → one final chunk of 2+
    assert all(c[2] - c[1] >= 2 for c in chunks)
    total = sum(c[2] - c[1] for c in chunks)
    assert total == 4


def test_max_chunk_splits():
    emb = HashEmbedder(dim=64)
    text = "One two. Three four. Five six. Seven eight. Nine ten."
    chunks = chunk_text_semantic(text, emb.embed_text, strategy="absolute",
                                 threshold_amount=2.0,  # no breakpoints
                                 max_chunk_sentences=2)
    assert [c[2] - c[1] for c in chunks] == [2, 2, 1]


def test_semantic_strategy_pipeline_parity(ray_session):
    """Full pipeline vs single-process oracle at chunking_strategy=
    'semantic' (VERDICT r01 item 6)."""
    tbl = synth_documents_table(40)
    cfg = PipelineConfig(chunking_strategy="semantic")
    res = build_kg(ray.data.from_arrow(tbl), cfg)
    predicted = {(r["subj"], r["pred"], r["obj"]) for r in res.triples.take_all()}
    docs = [(row["doc_id"], doc_text_from_spans(row["spans"]))
            for row in tbl.to_pylist()]
    expected = run_oracle(docs, cfg).triples
    precision, recall = triple_precision_recall(predicted, expected)
    assert precision >= 0.95 and recall >= 0.95
    assert predicted == expected
    # semantic chunks must differ from legacy chunking output
    legacy = build_kg(ray.data.from_arrow(tbl), PipelineConfig())
    assert res.chunks.count() != 0
    assert (res.chunks.select_columns(["chunk_id"]).count()
            != legacy.chunks.select_columns(["chunk_id"]).count()
            or res.chunks.take(1)[0]["content"]
            != legacy.chunks.take(1)[0]["content"])


def test_late_chunk_embedder_sees_document_context(ray_session):
    """Late chunking contract: identical chunk text in different documents
    gets DIFFERENT embeddings (document context mixed in), while the plain
    embedder gives identical ones."""
    import pyarrow as pa

    from graphrag_ray.stages.embed import HashEmbedder, LateChunkEmbedder

    batch = pa.table({
        "chunk_id": ["a_0", "b_0"],
        "doc_id": ["a", "b"],
        "content": ["same chunk text here", "same chunk text here"],
        "doc_text": ["same chunk text here alpha context",
                     "same chunk text here totally different context words"],
    })
    plain = HashEmbedder(dim=32)(batch)
    late = LateChunkEmbedder(dim=32, doc_text_column="doc_text")(batch)
    pv = plain.column("vector").to_pylist()
    lv = late.column("vector").to_pylist()
    assert pv[0] == pv[1]
    assert lv[0] != lv[1]
    # unit norm preserved
    assert abs(float(np.linalg.norm(lv[0])) - 1.0) < 1e-3


def test_late_chunk_embedder_in_pipeline(ray_session):
    """Actor-pool usage over the chunk table (Ray-side plumbing)."""
    tbl = synth_documents_table(12)
    res = build_kg(ray.data.from_arrow(tbl), PipelineConfig())
    from graphrag_ray.stages.embed import LateChunkEmbedder

    out = res.chunks.map_batches(
        LateChunkEmbedder,
        fn_constructor_kwargs={"dim": 32},
        batch_format="pyarrow",
        concurrency=(1, 2),
    )
    rows = out.take_all()
    assert len(rows) == res.chunks.count()
    assert all(len(r["vector"]) == 32 for r in rows)
