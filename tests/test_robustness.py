"""Edge-case robustness: empty corpus, media-only docs, unicode text,
stale/corrupt checkpoints, JSON snapshot round-trip."""

import json
import os
import shutil

import pyarrow as pa
import pytest

import ray

from graphrag_ray.config import PipelineConfig
from graphrag_ray.pipelines.kg import build_kg
from graphrag_ray.schemas import DOCUMENTS
from graphrag_ray.synth import synth_documents_table


def make_docs(rows):
    return ray.data.from_arrow(pa.Table.from_pylist(rows, schema=DOCUMENTS))


def span(kind, text="", media_ref="", offset=0):
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def test_empty_corpus(ray_session):
    docs = ray.data.from_arrow(DOCUMENTS.empty_table())
    res = build_kg(docs, PipelineConfig(chunk_size=256, chunk_overlap=50))
    assert res.entities.count() == 0
    assert res.triples.count() == 0
    assert res.report["entity_count"] == 0


def test_media_only_and_empty_docs(ray_session):
    docs = make_docs([
        {"doc_id": "m1", "spans": [span("image", media_ref="lance://media/a")]},
        {"doc_id": "m2", "spans": []},
        {"doc_id": "t1", "spans": [span("text", text="Alice Harmon met Bob Tanner.")]},
    ])
    res = build_kg(docs, PipelineConfig(chunk_size=256, chunk_overlap=50))
    ents = {r["canonical_name"] for r in res.entities.take_all()}
    assert "Alice Harmon" in ents
    # media-only and empty docs flow through without errors and produce no
    # chunks
    chunk_docs = {r["doc_id"] for r in res.chunks.take_all()}
    assert chunk_docs == {"t1"}


def test_unicode_text(ray_session):
    text = "Ünïcode Nàmé lives in Tokyo. 漢字もある. Alice Harmon too. "
    docs = make_docs([{"doc_id": "u1", "spans": [span("text", text=text * 3)]}])
    res = build_kg(docs, PipelineConfig(chunk_size=64, chunk_overlap=16))
    names = {r["canonical_name"] for r in res.entities.take_all()}
    assert "Tokyo" in names  # known location still detected amid unicode


def test_stale_tmp_and_corrupt_manifest(ray_session, tmp_path):
    out = str(tmp_path / "ckpt")
    cfg = PipelineConfig(chunk_size=256, chunk_overlap=50, out_dir=out,
                         run_id="rX", checkpoint=True)
    docs = ray.data.from_arrow(synth_documents_table(10))
    build_kg(docs, cfg)

    # corrupt one manifest + leave a stale tmp dir → rerun must recompute
    # that stage (not crash, not reuse)
    stage_dir = os.path.join(out, "rX", "canonical")
    with open(os.path.join(stage_dir, "manifest.json"), "w") as f:
        f.write("{not json")
    os.makedirs(os.path.join(out, "rX", "canonical.tmp-dead"), exist_ok=True)
    res = build_kg(docs, cfg)
    assert "canonical" in res.report["checkpoint_stages_written"]
    assert "extraction" in res.report["checkpoint_stages_skipped"]
    manifest = json.load(open(os.path.join(stage_dir, "manifest.json")))
    assert manifest["config_hash"] == cfg.config_hash()


def test_graph_json_snapshot_roundtrip(ray_session, tmp_path):
    from graphrag_ray.sources.workspace import load_graph_json, save_graph_json

    docs = ray.data.from_arrow(synth_documents_table(10))
    res = build_kg(docs, PipelineConfig(chunk_size=256, chunk_overlap=50))
    p = str(tmp_path / "graph.json")
    save_graph_json(p, res.entities, res.edges, metadata={"run": "t"})
    back = load_graph_json(p)
    assert back["metadata"]["run"] == "t"
    assert back["entities"].count() == res.entities.count()
    assert back["edges"].count() == res.edges.count()
