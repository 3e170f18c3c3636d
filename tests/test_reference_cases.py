"""Known-value cases ported from the reference's own inline test suites
(SURVEY.md §5 strategy (a)): entity/mod.rs:1110-1154,
string_similarity_linker.rs:468-563."""

from graphrag_ray.functions import textfns as tf
from graphrag_ray.functions.extraction import extract_entities, extract_relationships
from graphrag_ray.functions.linking import canonicalize, exact_clusters_from_rows


def test_person_extraction_reference_case():
    # entity/mod.rs:1115-1136 (threshold 0.5 in the reference test)
    text = "Entity Name works at Test Corp. Dr. Second Entity is a professor."
    ents = extract_entities(text, 0.5)
    assert ents, "should extract entities"
    persons = [e for e in ents if e.entity_type == "PERSON"]
    assert persons, "should extract persons"
    names = {e.name for e in persons}
    assert "Entity Name" in names        # PHASE 1 known fixture name
    assert "Second Entity" in names      # PHASE 1 beats the Dr. title phase


def test_relationship_extraction_reference_case():
    # entity/mod.rs:1138-1153
    text = "Entity Name works for Test Corp in Test City."
    ents = extract_entities(text, 0.5)
    rels = extract_relationships(ents, text)
    assert rels, "should extract relationships"
    # PERSON + ORG co-occurrence with 'works for' context → WORKS_FOR
    assert any(r == "WORKS_FOR" for _s, _d, r in rels)


def test_levenshtein_reference_values():
    # string_similarity_linker.rs:474-481
    assert tf.levenshtein("kitten", "sitting") == 3
    assert tf.levenshtein("saturday", "sunday") == 3
    assert tf.levenshtein("", "") == 0
    assert tf.levenshtein("abc", "abc") == 0


def test_jaro_winkler_reference_values():
    # string_similarity_linker.rs:484-495
    assert tf.jaro_winkler("martha", "marhta") > 0.9
    assert tf.jaro_winkler("dwayne", "duane") > 0.8
    assert tf.jaro_winkler("abc", "xyz") < 0.3


def test_jaccard_reference_values():
    # string_similarity_linker.rs:498-507
    sim = tf.token_jaccard("the quick brown fox", "the lazy brown dog")
    assert 0.3 < sim < 0.5
    assert abs(tf.token_jaccard("apple orange banana", "apple orange banana") - 1.0) < 1e-3


def test_soundex_reference_values():
    # string_similarity_linker.rs:510-519
    assert tf.soundex("Robert") == "R163"
    assert tf.soundex("Rupert") == "R163"
    assert tf.soundex("Rubin") == "R150"
    assert tf.soundex("Smith") == "S530"
    assert tf.soundex("Smyth") == "S530"


def test_normalize_string_reference_values():
    # string_similarity_linker.rs:522-527
    assert tf.normalize_string("John  Smith!") == "john smith"
    assert tf.normalize_string("ACME Corp.") == "acme corp"


def test_canonical_link_with_typo_reference_case():
    # mirrors find_canonical_entity (string_similarity_linker.rs:536-563):
    # "Jon Smith"/"Jhon Smith" link to "John Smith" (PERSON) at 0.8; the
    # wrong type never links.
    exact = exact_clusters_from_rows([
        ("d1", "John Smith", "PERSON", 0.9, 3),
        ("d1", "John Smith", "PERSON", 0.9, 1),
        ("d2", "Jon Smith", "PERSON", 0.8, 1),
        ("d3", "Acme Corp", "ORG", 0.85, 1),
    ])
    out = canonicalize(exact, threshold=0.8)
    by_name = {c.canonical_name: c for c in out}
    assert "John Smith" in by_name
    assert "Jon Smith" in by_name["John Smith"].aliases
    assert by_name["Acme Corp"].entity_type == "ORG"


# --- round 2: more ported inline cases with hand-written expectations
# (the reference's own asserts are weak "not empty" checks; expectations
# here are hand-derived from the transcribed semantics)


def test_person_extraction_full_expectation():
    """entity/mod.rs:1115-1136 fixture at min_confidence 0.5 — full
    hand-derived entity set: phase-1 known names beat the title phase,
    'Test Corp' is caught by phase 3 as PERSON and by the suffix scan as
    the bare 'Corp' ORGANIZATION."""
    from graphrag_ray.functions.extraction import extract_entities

    text = "Entity Name works at Test Corp. Dr. Second Entity is a professor."
    got = [(e.name, e.entity_type, round(e.confidence, 2), e.n_mentions)
           for e in extract_entities(text, 0.5, with_offsets=False)]
    assert got == [
        ("Entity Name", "PERSON", 0.95, 1),
        ("Second Entity", "PERSON", 0.95, 1),
        ("Test Corp", "PERSON", 0.8, 1),
        ("Corp", "ORGANIZATION", 0.9, 1),
    ]


def test_relationship_extraction_full_expectation():
    """entity/mod.rs:1138-1154 fixture — hand-derived ordered pair set
    with 'works for' context typing."""
    from graphrag_ray.functions.extraction import (extract_entities,
                                                   extract_relationships)

    text = "Entity Name works for Test Corp in Test City."
    ents = extract_entities(text, 0.5, with_offsets=False)
    rels = extract_relationships(ents, text)
    assert [(e.name, e.entity_type) for e in ents] == [
        ("Entity Name", "PERSON"), ("Test Corp", "PERSON"),
        ("Test City", "PERSON"), ("Corp", "ORGANIZATION"),
    ]
    P = "PERSON_"
    assert rels == [
        (P + "entityname", P + "testcorp", "KNOWS"),
        (P + "entityname", P + "testcity", "KNOWS"),
        (P + "entityname", "ORGANIZATION_corp", "WORKS_FOR"),
        (P + "testcorp", P + "testcity", "KNOWS"),
        (P + "testcorp", "ORGANIZATION_corp", "WORKS_FOR"),
        (P + "testcity", "ORGANIZATION_corp", "WORKS_FOR"),
    ]


def test_chunking_single_window_exact():
    """text/mod.rs:572-583 fixture: 97-char text inside one 100-char
    window → exactly one chunk spanning the whole text."""
    from graphrag_ray.functions.chunking import chunk_text

    text = ("This is a test document. It has multiple sentences. "
            "Each sentence should be processed correctly.")
    assert len(text) == 96
    assert chunk_text(text, 100, 20) == [(0, 0, 96)]


def test_sentence_extraction_reference_case():
    """text/mod.rs:596-606 (sentences split on .!?); our tokenizer keeps
    the terminal punctuation."""
    from graphrag_ray.functions.chunking import split_sentences_semantic

    s = split_sentences_semantic("First sentence. Second sentence! Third sentence?")
    assert s == ["First sentence.", "Second sentence!", "Third sentence?"]


def test_tfidf_keywords_tie_break_deterministic():
    """text/mod.rs:586-593 fixture: all terms tf=1 and equal idf → the
    top-3 is the deterministic lexicographic head."""
    from graphrag_ray.stages.enrich import extract_keywords

    text = ("machine learning artificial intelligence data science "
            "computer vision natural language processing")
    kws = extract_keywords(text, df={}, total_docs=1, top_k=3)
    assert len(kws) == 3
    assert kws == sorted(kws)


def test_leiden_config_defaults_parity():
    """leiden.rs:836-843: resolution 1.0 default (our config carries the
    same default; max-iteration/seed knobs exist)."""
    from graphrag_ray.config import PipelineConfig

    cfg = PipelineConfig()
    assert cfg.leiden_resolution == 1.0
    assert cfg.leiden_seed == 42
    assert cfg.leiden_max_iterations == 100


# ---------------------------------------------------------------------------
# graph/analytics.rs + graph/traversal.rs inline fixtures, ported with
# HAND-DERIVED exact expectations for this engine's deterministic tie-breaks
# (the reference asserts weaker properties; values below were derived on
# paper from the documented (distance, node-id) ordering).

_DIAMOND = [("A", "B"), ("A", "C"), ("B", "C"), ("B", "D"), ("C", "D")]
_CHAIN = [("A", "B"), ("B", "C"), ("A", "D")]  # traversal.rs fixture


def _edges_ds(pairs):
    import ray.data

    return ray.data.from_items([{"src": a, "dst": b} for a, b in pairs])


def test_shortest_path_diamond_reference_case(ray_session):
    # analytics.rs test_shortest_path: 3 nodes, weight 2.0; our (dist, id)
    # heap order pins the B branch: A -> B -> D
    from graphrag_ray.stages.graph_analytics import shortest_path

    path, weight = shortest_path(_edges_ds(_DIAMOND), "A", "D")
    assert path == ["A", "B", "D"]
    assert weight == 2.0


def test_all_paths_diamond_exact(ray_session):
    # analytics.rs:357-410 DFS semantics, sorted neighbor order → exact
    # enumeration order and weights
    from graphrag_ray.stages.graph_analytics import all_paths

    out = all_paths(_edges_ds(_DIAMOND), "A", "D", max_depth=5)
    assert out == [
        (["A", "B", "C", "D"], 3.0),
        (["A", "B", "D"], 2.0),
        (["A", "C", "B", "D"], 3.0),
        (["A", "C", "D"], 2.0),
    ]


def test_all_paths_chain_reference_case(ray_session):
    # traversal.rs test_find_all_paths: exactly one A→C path via B
    from graphrag_ray.stages.graph_analytics import all_paths

    out = all_paths(_edges_ds(_CHAIN), "A", "C", max_depth=5)
    assert out == [(["A", "B", "C"], 2.0)]


def test_centrality_diamond_exact(ray_session):
    # hand-derived: every source's shortest-path tree routes through the
    # min-id predecessor, so only B accumulates betweenness (sources A and
    # D each route their far corner through B): bc = {B: 2} / norm 3
    from graphrag_ray.stages.graph_analytics import centrality_scores

    df = centrality_scores(_edges_ds(_DIAMOND)).to_pandas().set_index("node_id")
    assert abs(df.loc["A", "degree"] - 2 / 3) < 1e-12
    assert abs(df.loc["B", "degree"] - 1.0) < 1e-12
    assert abs(df.loc["B", "betweenness"] - 2 / 3) < 1e-12
    assert df.loc["A", "betweenness"] == 0.0
    assert df.loc["C", "betweenness"] == 0.0
    assert abs(df.loc["A", "closeness"] - 0.75) < 1e-12
    assert abs(df.loc["B", "closeness"] - 1.0) < 1e-12
    assert abs(df.loc["D", "closeness"] - 0.75) < 1e-12


def test_graph_metrics_diamond_exact(ray_session):
    # density = 2*5/(4*3); clustering = (1 + 2/3 + 2/3 + 1)/4
    from graphrag_ray.stages.graph_analytics import graph_metrics

    df = graph_metrics(_edges_ds(_DIAMOND)).set_index("stat")
    assert abs(df.loc["density", "value"] - 5 / 6) < 1e-12
    assert abs(df.loc["avg_clustering_coefficient", "value"] - 5 / 6) < 1e-12


def test_louvain_diamond_reference_case(ray_session):
    # analytics.rs test_community_detection: one component of 4 nodes;
    # shipped modularity = internal edge ends / (2 * node count) = 10/8
    from graphrag_ray.stages.graph_analytics import louvain_communities

    df = louvain_communities(_edges_ds(_DIAMOND)).to_pandas()
    assert sorted(df["node_id"]) == ["A", "B", "C", "D"]
    assert set(df["community_id"]) == {0}
    assert all(abs(m - 1.25) < 1e-12 for m in df["modularity"])


def test_pagerank_reference_properties(ray_session):
    # pagerank.rs test_pagerank_convergence / test_personalized_pagerank:
    # scores sum to 1, all nodes scored, and a personalized reset biased
    # 0.8 toward A lifts A significantly above uniform
    import ray.data

    from graphrag_ray.stages.graph_analytics import pagerank

    ents = ray.data.from_items(
        [{"canonical_id": n} for n in ("A", "B", "C")])
    edges = _edges_ds([("A", "B"), ("A", "C"), ("B", "C")])
    df = pagerank(ents, edges).to_pandas()
    assert abs(df["score"].sum() - 1.0) < 1e-6
    assert len(df) == 3
    pdf = pagerank(ents, edges,
                   personalization={"A": 0.8, "B": 0.2}).to_pandas()
    assert pdf.set_index("entity_id").loc["A", "score"] > 1 / 3


def test_generic_type_dispatch_reference_semantics():
    """entity/mod.rs:138-160 type dispatch: unknown types fall through to
    generic capitalized-word extraction (len>3, non-common, conf 0.5), NOT
    the concept heuristics; HAPPENING/DIALOGUE_SPEAKER alias to their
    families. Expectations hand-derived from entity/mod.rs:1060-1089."""
    from graphrag_ray.functions.extraction import extract_entities

    text = "The Fluffy cat chased Rex near Chapter Paris today"
    # generic ANIMAL: capitalized, len>3, not common ("The" len 3 fails the
    # >3 gate; "Chapter" IS in the reference common-word list; "Rex" len 3)
    got = {(e.name, e.entity_type, e.confidence)
           for e in extract_entities(text, 0.5, ("ANIMAL",))}
    assert got == {("Fluffy", "ANIMAL", 0.5), ("Paris", "ANIMAL", 0.5)}
    # below min_confidence 0.6 the generic arm emits nothing
    assert extract_entities(text, 0.6, ("ANIMAL",)) == []
    # HAPPENING aliases to the EVENT extractor, DIALOGUE_SPEAKER to PERSON
    ev = "The great battle began"
    assert ({e.entity_type for e in extract_entities(ev, 0.5, ("HAPPENING",))}
            == {e.entity_type for e in extract_entities(ev, 0.5, ("EVENT",))})
    ps = "Dr. Alice Harmon spoke"
    assert ([(e.name, e.confidence)
             for e in extract_entities(ps, 0.7, ("DIALOGUE_SPEAKER",))]
            == [(e.name, e.confidence)
                for e in extract_entities(ps, 0.7, ("PERSON",))])
