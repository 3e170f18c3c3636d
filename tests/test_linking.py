"""Canonicalization logic tests (reference: corpus/entity_linker.rs:379-429,
string_similarity_linker.rs:126-165, canonical name rule :524-536)."""

from graphrag_ray.functions.linking import (
    ExactCluster,
    block_key,
    canonicalize,
    exact_clusters_from_rows,
    fuzzy_cluster_block,
    select_canonical_name,
)


def rows(*specs):
    # (doc_id, name, type, conf, n_mentions)
    return [tuple(s) for s in specs]


def test_exact_grouping_collapses_case_and_whitespace():
    exact = exact_clusters_from_rows(rows(
        ("d1", "Alice Harmon", "PERSON", 0.8, 2),
        ("d2", "ALICE HARMON", "PERSON", 0.8, 1),
        ("d3", "Alice  Harmon", "PERSON", 0.8, 1),
    ))
    assert len(exact) == 1
    c = exact[("PERSON", "alice harmon")]
    assert c.total_count == 3
    assert c.mention_count == 4
    assert c.docs == {"d1", "d2", "d3"}


def test_fuzzy_merges_typo_variant():
    exact = exact_clusters_from_rows(rows(
        ("d1", "Alice Harmon", "PERSON", 0.8, 5),
        ("d1", "Alice Harmon", "PERSON", 0.8, 5),
        ("d2", "Alice Harmn", "PERSON", 0.8, 1),   # typo, lev=1
    ))
    out = canonicalize(exact, threshold=0.85)
    assert len(out) == 1
    c = out[0]
    assert c.canonical_name == "Alice Harmon"  # most frequent wins
    assert c.canonical_id == "PERSON_aliceharmon"
    assert set(c.aliases) == {"Alice Harmon", "Alice Harmn"}
    assert c.doc_frequency == 2
    assert c.mention_count == 11
    assert "PERSON_aliceharmn" in c.member_entity_ids


def test_different_types_never_merge():
    # string_similarity_linker.rs:128-130
    exact = exact_clusters_from_rows(rows(
        ("d1", "New York", "PERSON", 0.8, 1),
        ("d1", "New York", "LOCATION", 0.9, 1),
    ))
    out = canonicalize(exact, threshold=0.85)
    assert len(out) == 2
    assert {c.entity_type for c in out} == {"PERSON", "LOCATION"}


def test_unrelated_names_stay_separate():
    exact = exact_clusters_from_rows(rows(
        ("d1", "Alice Harmon", "PERSON", 0.8, 1),
        ("d1", "Bob Tanner", "PERSON", 0.8, 1),
    ))
    out = canonicalize(exact, threshold=0.85)
    assert len(out) == 2


def test_canonical_name_most_frequent_then_longest():
    assert select_canonical_name({"Al": 3, "Alice": 3, "Bob": 1}) == "Alice"
    assert select_canonical_name({"Al": 5, "Alice": 3}) == "Al"


def test_greedy_cluster_deterministic_order():
    # seeds ordered by (-count, norm); absorb at >= threshold
    clusters = [
        ExactCluster("PERSON", "alice harmon", {"Alice Harmon": 10}, 10, 0.8, {"d1"}),
        ExactCluster("PERSON", "alice harmn", {"Alice Harmn": 1}, 1, 0.8, {"d2"}),
        ExactCluster("PERSON", "alice hrman", {"Alice Hrman": 1}, 1, 0.8, {"d3"}),
    ]
    out = fuzzy_cluster_block(clusters, threshold=0.85)
    assert len(out) == 1
    assert out[0].canonical_name == "Alice Harmon"


def test_block_key_shape():
    assert block_key("PERSON", "alice harmon") == f"PERSON|{block_key('X','alice')[2:]}"
    # same first token soundex → same block
    assert block_key("PERSON", "alice harmon") == block_key("PERSON", "alice harmn")


# --- G5: LMCD clustering strategy (entity_linker.rs:296-376)


def test_lmcd_exact_names_merge_high_confidence():
    from graphrag_ray.functions.linking import (ExactCluster,
                                                lmcd_cluster_block)

    clusters = [
        ExactCluster("PERSON", "alice harmon", {"Alice Harmon": 3},
                     mention_count=3, max_confidence=0.8,
                     docs={"d1", "d2"}),
        ExactCluster("PERSON", "bob tanner", {"Bob Tanner": 1},
                     mention_count=1, max_confidence=0.8, docs={"d3"}),
    ]
    out = lmcd_cluster_block(clusters, confidence_threshold=0.8)
    by_name = {c.canonical_name: c for c in out}
    # dissimilar names: both accepted at high confidence (+0.1)
    assert abs(by_name["Alice Harmon"].confidence - 0.9) < 1e-6
    assert abs(by_name["Bob Tanner"].confidence - 0.9) < 1e-6
    assert by_name["Alice Harmon"].doc_frequency == 2


def test_lmcd_similar_name_becomes_low_confidence_singleton():
    from graphrag_ray.functions.linking import (ExactCluster,
                                                lmcd_cluster_block)

    clusters = [
        ExactCluster("PERSON", "alice harmon", {"Alice Harmon": 5},
                     mention_count=5, max_confidence=0.8, docs={"d1"}),
        # similarity("alice harmon", "alice harmons") = 1 - 1/13 ≈ 0.923 > 0.9
        ExactCluster("PERSON", "alice harmons", {"Alice Harmons": 1},
                     mention_count=1, max_confidence=0.8, docs={"d2"}),
    ]
    out = lmcd_cluster_block(clusters, confidence_threshold=0.8)
    by_name = {c.canonical_name: c for c in out}
    # NOT merged (unlike fuzzy): kept as separate low-confidence singleton
    assert len(out) == 2
    assert abs(by_name["Alice Harmon"].confidence - 0.9) < 1e-6
    assert abs(by_name["Alice Harmons"].confidence - 0.7) < 1e-6
    assert by_name["Alice Harmons"].canonical_id.endswith("__lmcd_singleton")


def test_lmcd_pipeline_runs(ray_session):
    import ray as _ray

    from graphrag_ray.config import PipelineConfig
    from graphrag_ray.pipelines.kg import build_kg
    from graphrag_ray.synth import synth_documents_table

    tbl = synth_documents_table(30)
    res = build_kg(_ray.data.from_arrow(tbl),
                   PipelineConfig(chunk_size=256, chunk_overlap=50,
                                  linking_strategy="lmcd"))
    ents = res.entities.take_all()
    assert ents
    confs = {round(float(r["confidence"]), 2) for r in ents}
    # LMCD assigns threshold±0.1, never the extraction confidences
    assert confs <= {0.7, 0.9}
    # fuzzy variants stay separate under LMCD → at least as many clusters
    base = build_kg(_ray.data.from_arrow(tbl),
                    PipelineConfig(chunk_size=256, chunk_overlap=50))
    assert len(ents) >= base.entities.count()
