"""Pipeline validation harness tests (evaluation/pipeline_validation.rs)."""

import pytest

from graphrag_ray.stages.pipeline_validation import (
    build_report, validate_document_processing, validate_entity_extraction,
    validate_graph_construction, validate_relationship_extraction)


def _checks(p):
    return {c["name"]: c["passed"] for c in p["checks"]}


def test_document_processing_pass_and_coverage():
    p = validate_document_processing(
        doc_chars=1000, n_docs=10, n_chunks=5, chunk_chars=950,
        n_empty_chunks=0, n_meta_chunks=0)
    c = _checks(p)
    assert c["content_coverage"]          # 0.95 ≥ 0.9
    assert p["passed"]
    assert p["metrics"]["coverage_ratio"] == pytest.approx(0.95)
    # metadata warning below 50%
    assert any("enriched metadata" in w for w in p["warnings"])


def test_document_processing_failures():
    p = validate_document_processing(0, 0, 0, 0, 0, 0)
    c = _checks(p)
    assert not c["document_not_empty"] and not c["chunks_created"]
    assert not p["passed"]
    p2 = validate_document_processing(1000, 10, 5, 500, 2, 5)
    assert not _checks(p2)["content_coverage"]   # 0.5 < 0.9
    assert not _checks(p2)["no_empty_chunks"]


def test_entity_extraction_checks():
    ok = validate_entity_extraction(10, 0, 0, 0)
    assert ok["passed"]
    bad = validate_entity_extraction(10, 2, 1, 0)
    c = _checks(bad)
    assert not c["entity_confidence_valid"]
    assert not c["entity_types_populated"]


def test_relationship_extraction_conditional_first_check():
    # with ≤1 entity the relationships_extracted check is skipped
    p = validate_relationship_extraction(1, 0, 0, 0, 0)
    assert "relationships_extracted" not in _checks(p)
    p2 = validate_relationship_extraction(5, 0, 0, 0, 0)
    assert not _checks(p2)["relationships_extracted"]


def test_graph_construction_bands_and_warnings():
    p = validate_graph_construction(10, 100, 5, 50)
    c = _checks(p)
    assert not c["entity_chunk_ratio_reasonable"]  # 0.05 < 0.1
    assert c["graph_connectivity"]                 # 10 > 0.1
    p2 = validate_graph_construction(10, 10, 30, 1)
    assert _checks(p2)["entity_chunk_ratio_reasonable"]  # 3.0
    assert not _checks(p2)["graph_connectivity"]         # 0.033
    assert any("sparsely connected" in w for w in p2["warnings"])


def test_report_summary():
    phases = [validate_entity_extraction(10, 0, 0, 0),
              validate_graph_construction(10, 100, 5, 50)]
    rep = build_report(phases)
    assert not rep["overall_passed"]
    assert "Graph Construction" in rep["summary"]
    assert rep["passed_checks"] == rep["total_checks"] - 1
    ok = build_report([validate_entity_extraction(10, 0, 0, 0)])
    assert ok["overall_passed"] and ok["summary"].startswith("✅")
