"""Pipeline validation harness (reference
graphrag-core/src/evaluation/pipeline_validation.rs).

Data-quality checks between build phases — document processing, entity
extraction, relationship extraction, graph construction — plus the
aggregate report.  Check names, pass conditions, expected/actual strings
and messages follow the reference; every count the checks consume is
computed DISTRIBUTED (dataset aggregations), and the corpus-level
adaptation (the reference validates one document at a time; here the
sums run over the whole corpus) is noted per check.
"""

from __future__ import annotations


def _fmt2(x: float) -> str:
    return f"{x:.2f}"


def validate_document_processing(doc_chars: int, n_docs: int,
                                 n_chunks: int, chunk_chars: int,
                                 n_empty_chunks: int,
                                 n_meta_chunks: int) -> dict:
    """pipeline_validation.rs:45-163 (corpus-aggregated)."""
    checks = []
    warnings = []
    metrics = {}
    checks.append({
        "name": "document_not_empty", "passed": doc_chars > 0,
        "expected": "Non-empty content",
        "actual": f"{doc_chars} characters",
        "message": ("Document content is empty" if doc_chars == 0
                    else "Document contains content")})
    checks.append({
        "name": "chunks_created", "passed": n_chunks > 0,
        "expected": "At least 1 chunk", "actual": f"{n_chunks} chunks",
        "message": ("No chunks were created from document"
                    if n_chunks == 0
                    else f"Successfully created {n_chunks} chunks")})
    if n_chunks > 0:
        coverage = chunk_chars / doc_chars if doc_chars else 0.0
        checks.append({
            "name": "content_coverage", "passed": coverage >= 0.9,
            "expected": "Coverage ratio >= 0.9",
            "actual": _fmt2(coverage),
            "message": (f"Chunks cover {coverage * 100.0:.1f}% of "
                        "original content")})
        metrics["coverage_ratio"] = coverage
    checks.append({
        "name": "no_empty_chunks", "passed": n_empty_chunks == 0,
        "expected": "0 empty chunks",
        "actual": f"{n_empty_chunks} empty chunks",
        "message": (f"Found {n_empty_chunks} empty chunks"
                    if n_empty_chunks else "All chunks have content")})
    meta_ratio = n_meta_chunks / n_chunks if n_chunks else 0.0
    if meta_ratio < 0.5:
        warnings.append(
            f"Only {n_meta_chunks}/{n_chunks} chunks have enriched "
            f"metadata ({int(meta_ratio * 100.0)}%)")
    checks.append({
        "name": "metadata_enrichment", "passed": True,
        "expected": "Metadata enrichment (optional)",
        "actual": f"{n_meta_chunks}/{n_chunks} chunks",
        "message": f"{meta_ratio * 100.0:.1f}% of chunks have metadata"})
    metrics["metadata_ratio"] = meta_ratio
    metrics["chunks_count"] = float(n_chunks)
    metrics["avg_chunk_size"] = chunk_chars / max(n_chunks, 1)
    return {"phase_name": "Document Processing",
            "passed": all(c["passed"] for c in checks),
            "checks": checks, "warnings": warnings, "metrics": metrics}


def validate_entity_extraction(n_entities: int, n_bad_conf: int,
                               n_missing_types: int,
                               n_empty_names: int) -> dict:
    """pipeline_validation.rs:170-297 (checks 1-4)."""
    checks = [
        {"name": "entities_extracted", "passed": n_entities > 0,
         "expected": "At least 1 entity",
         "actual": f"{n_entities} entities",
         "message": ("No entities extracted" if n_entities == 0
                     else f"Extracted {n_entities} entities")},
        {"name": "entity_confidence_valid", "passed": n_bad_conf == 0,
         "expected": "All confidence in (0, 1]",
         "actual": f"{n_bad_conf} invalid",
         "message": (f"{n_bad_conf} entities have invalid confidence"
                     if n_bad_conf else "All confidence scores valid")},
        {"name": "entity_types_populated", "passed": n_missing_types == 0,
         "expected": "All entities typed",
         "actual": f"{n_missing_types} missing",
         "message": (f"{n_missing_types} entities missing types"
                     if n_missing_types else "All entities typed")},
        {"name": "entity_names_not_empty", "passed": n_empty_names == 0,
         "expected": "All names non-empty",
         "actual": f"{n_empty_names} empty",
         "message": (f"{n_empty_names} entities have empty names"
                     if n_empty_names else "All entity names populated")},
    ]
    return {"phase_name": "Entity Extraction",
            "passed": all(c["passed"] for c in checks),
            "checks": checks, "warnings": [],
            "metrics": {"entities_count": float(n_entities)}}


def validate_relationship_extraction(n_entities: int, n_rels: int,
                                     n_bad_conf: int,
                                     n_missing_types: int,
                                     n_orphans: int) -> dict:
    """pipeline_validation.rs:304-427."""
    checks = []
    if n_entities > 1:
        checks.append({
            "name": "relationships_extracted", "passed": n_rels > 0,
            "expected": "At least 1 relationship",
            "actual": f"{n_rels} relationships",
            "message": ("No relationships found between entities"
                        if n_rels == 0
                        else f"Extracted {n_rels} relationships")})
    checks.append({
        "name": "relationship_confidence_valid", "passed": n_bad_conf == 0,
        "expected": "All confidence in (0, 1]",
        "actual": f"{n_bad_conf} invalid",
        "message": (f"{n_bad_conf} relationships have invalid confidence"
                    if n_bad_conf else "All confidence scores valid")})
    checks.append({
        "name": "relationship_types_populated",
        "passed": n_missing_types == 0,
        "expected": "All relationships typed",
        "actual": f"{n_missing_types} missing",
        "message": (f"{n_missing_types} relationships missing types"
                    if n_missing_types
                    else "All relationships typed")})
    checks.append({
        "name": "relationship_entities_exist", "passed": n_orphans == 0,
        "expected": "0 orphan relationships",
        "actual": f"{n_orphans} orphans",
        "message": (f"{n_orphans} relationships reference missing "
                    "entities" if n_orphans
                    else "All relationship endpoints exist")})
    return {"phase_name": "Relationship Extraction",
            "passed": all(c["passed"] for c in checks),
            "checks": checks, "warnings": [],
            "metrics": {"relationships_count": float(n_rels)}}


def validate_graph_construction(n_docs: int, n_chunks: int,
                                n_entities: int, n_rels: int) -> dict:
    """pipeline_validation.rs:434-524."""
    checks = []
    warnings = []
    metrics = {}
    checks.append({
        "name": "graph_not_empty",
        "passed": n_entities > 0 or n_docs > 0,
        "expected": "At least some nodes",
        "actual": f"{n_entities} entities, {n_docs} docs",
        "message": ("Graph is completely empty"
                    if n_entities == 0 and n_docs == 0
                    else "Graph contains content")})
    if n_chunks > 0:
        epc = n_entities / n_chunks
        reasonable = 0.1 <= epc <= 10.0
        checks.append({
            "name": "entity_chunk_ratio_reasonable", "passed": reasonable,
            "expected": "0.1 to 10 entities per chunk",
            "actual": f"{_fmt2(epc)} entities/chunk",
            "message": (f"Unusual entity-to-chunk ratio: {_fmt2(epc)}"
                        if not reasonable
                        else "Entity density looks reasonable")})
        metrics["entities_per_chunk"] = epc
        if epc < 0.5:
            warnings.append(
                "Low entity density - may need better entity extraction")
        if epc > 5.0:
            warnings.append(
                "High entity density - may have duplicate extractions")
    if n_entities > 1:
        conn = n_rels / n_entities
        checks.append({
            "name": "graph_connectivity", "passed": conn > 0.1,
            "expected": ">0.1 relationships per entity",
            "actual": f"{_fmt2(conn)} rels/entity",
            "message": ("Graph is sparsely connected" if conn <= 0.1
                        else "Graph has reasonable connectivity")})
        metrics["connectivity"] = conn
        if conn < 0.5:
            warnings.append(
                "Graph is sparsely connected - entities may be isolated")
    metrics.update({"documents": float(n_docs), "chunks": float(n_chunks),
                    "entities": float(n_entities),
                    "relationships": float(n_rels)})
    return {"phase_name": "Graph Construction",
            "passed": all(c["passed"] for c in checks),
            "checks": checks, "warnings": warnings, "metrics": metrics}


def build_report(phases: list[dict]) -> dict:
    """PipelineValidationReport::from_phases
    (pipeline_validation.rs:543-580)."""
    overall = all(p["passed"] for p in phases)
    total = sum(len(p["checks"]) for p in phases)
    passed = sum(1 for p in phases for c in p["checks"] if c["passed"])
    if overall:
        summary = (f"✅ All pipeline phases validated successfully "
                   f"({passed}/{total} checks passed)")
    else:
        failed = ", ".join(p["phase_name"] for p in phases
                           if not p["passed"])
        summary = (f"❌ Pipeline validation failed in: {failed} "
                   f"({passed}/{total} checks passed)")
    return {"phases": phases, "overall_passed": overall,
            "total_checks": total, "passed_checks": passed,
            "summary": summary}
