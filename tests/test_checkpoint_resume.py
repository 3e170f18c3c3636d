"""Checkpoint/resume fixture (FIXTURES.md §F7): run with checkpointing, kill
conceptually after stage k (simulated by a fresh pipeline build over the
same run dir), verify stages are skipped and final tables are identical;
per-row lineage column must be present and consistent in persisted files."""

import glob
import json
import os
import shutil

import pyarrow.parquet as pq
import pytest

import ray

from graphrag_ray.config import PipelineConfig
from graphrag_ray.pipelines.kg import build_kg
from graphrag_ray.synth import synth_documents_table

OUT = "/tmp/graphrag_ray_test_ckpt"


@pytest.fixture()
def docs_ds(ray_session):
    return ray.data.from_arrow(synth_documents_table(30))


def triples_set(res):
    return {(r["subj"], r["pred"], r["obj"], r["n_occurrences"])
            for r in res.triples.take_all()}


def test_checkpoint_write_and_resume(docs_ds):
    shutil.rmtree(OUT, ignore_errors=True)
    cfg = PipelineConfig(chunk_size=256, chunk_overlap=50, out_dir=OUT,
                         run_id="r1", checkpoint=True)
    res1 = build_kg(docs_ds, cfg)
    t1 = triples_set(res1)
    assert res1.report["checkpoint_stages_written"] == ["extraction", "canonical", "edges"]
    assert res1.report["checkpoint_stages_skipped"] == []

    # stage dirs have _SUCCESS + manifest with the config hash
    for stage in ("extraction", "canonical", "edges"):
        d = os.path.join(OUT, "r1", stage)
        assert os.path.exists(os.path.join(d, "_SUCCESS"))
        manifest = json.load(open(os.path.join(d, "manifest.json")))
        assert manifest["config_hash"] == cfg.config_hash()
        assert manifest["rows"] > 0
        # per-row lineage struct present in the persisted parquet
        files = glob.glob(os.path.join(d, "*.parquet"))
        assert files
        tbl = pq.read_table(files[0])
        assert "lineage" in tbl.column_names
        lin = tbl.column("lineage")[0].as_py()
        assert lin["stage"] == stage
        assert lin["attempt"] == 1

    # rerun same run_id: all stages skipped, identical output
    res2 = build_kg(docs_ds, cfg)
    assert res2.report["checkpoint_stages_skipped"] == ["extraction", "canonical", "edges"]
    assert res2.report["checkpoint_stages_written"] == []
    assert triples_set(res2) == t1


def test_partial_failure_resume(docs_ds):
    """Simulate a mid-pipeline crash: valid extraction checkpoint, broken
    later stages → extraction is skipped, the rest recomputed, output
    identical to a clean run."""
    cfg = PipelineConfig(chunk_size=256, chunk_overlap=50, out_dir=OUT,
                         run_id="r2", checkpoint=True)
    shutil.rmtree(os.path.join(OUT, "r2"), ignore_errors=True)
    clean = build_kg(docs_ds, cfg)
    want = triples_set(clean)

    # "crash after extraction": drop the later checkpoints (as if never written)
    for stage in ("canonical", "edges"):
        shutil.rmtree(os.path.join(OUT, "r2", stage), ignore_errors=True)
    res = build_kg(docs_ds, cfg)
    assert res.report["checkpoint_stages_skipped"] == ["extraction"]
    assert set(res.report["checkpoint_stages_written"]) == {"canonical", "edges"}
    assert triples_set(res) == want


def test_config_change_invalidates(docs_ds):
    cfg = PipelineConfig(chunk_size=256, chunk_overlap=50, out_dir=OUT,
                         run_id="r3", checkpoint=True)
    build_kg(docs_ds, cfg)
    cfg2 = PipelineConfig(chunk_size=200, chunk_overlap=50, out_dir=OUT,
                          run_id="r3", checkpoint=True)
    res = build_kg(docs_ds, cfg2)
    # different semantics hash → nothing skipped
    assert res.report["checkpoint_stages_skipped"] == []


def test_checkpoint_matches_nocheckpoint(docs_ds):
    cfg_ck = PipelineConfig(chunk_size=256, chunk_overlap=50, out_dir=OUT,
                            run_id="r4", checkpoint=True)
    cfg_no = PipelineConfig(chunk_size=256, chunk_overlap=50)
    shutil.rmtree(os.path.join(OUT, "r4"), ignore_errors=True)
    assert triples_set(build_kg(docs_ds, cfg_ck)) == triples_set(build_kg(docs_ds, cfg_no))


def test_changed_input_invalidates(docs_ds, ray_session):
    """Same run_id + config over a DIFFERENT corpus must not reuse stale
    stage parquet (input fingerprint in the manifest, ADVICE r01)."""
    shutil.rmtree(OUT, ignore_errors=True)
    cfg = PipelineConfig(chunk_size=256, chunk_overlap=50, out_dir=OUT,
                         run_id="rfp", checkpoint=True)
    res1 = build_kg(docs_ds, cfg)
    assert res1.report["checkpoint_stages_skipped"] == []

    other = ray.data.from_arrow(synth_documents_table(31))
    res2 = build_kg(other, cfg)
    assert res2.report["checkpoint_stages_skipped"] == []  # recomputed
    assert res2.report["checkpoint_stages_written"] == [
        "extraction", "canonical", "edges"]
    # and the new checkpoints are themselves reusable
    res3 = build_kg(other, cfg)
    assert res3.report["checkpoint_stages_skipped"] == [
        "extraction", "canonical", "edges"]
    assert triples_set(res2) == triples_set(res3)


def test_fingerprint_distinguishes_same_rowcount(ray_session):
    """ADVICE r02: non-file datasets with equal row counts but different
    content must fingerprint differently (content sample, not count)."""
    import ray as _ray

    from graphrag_ray.state.checkpoint import dataset_fingerprint

    a = _ray.data.from_items([{"doc_id": "a", "text": "alpha"}] * 5)
    b = _ray.data.from_items([{"doc_id": "a", "text": "beta"}] * 5)
    assert dataset_fingerprint(a) != dataset_fingerprint(b)
    # deterministic for identical content
    a2 = _ray.data.from_items([{"doc_id": "a", "text": "alpha"}] * 5)
    assert dataset_fingerprint(a) == dataset_fingerprint(a2)
