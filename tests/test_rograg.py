"""ROGRAG subsystem tests (reference graphrag-core/src/rograg/*).

Hand-derived expectations for the pure rules plus an end-to-end
run_rograg over a small in-memory KG.
"""

import pyarrow as pa
import pytest

from graphrag_ray.stages import rograg as R


# --------------------------------------------------------------------- intent

def test_intent_factual_high_confidence():
    r = R.classify_intent("how many how much which is what is alice harmon")
    assert r["primary_intent"] == "factual"
    assert r["confidence"] == 1.0
    assert not r["should_refuse"]


def test_intent_inappropriate():
    r = R.classify_intent("why is violence illegal")
    assert r["primary_intent"] == "inappropriate"
    assert r["should_refuse"] and r["confidence"] == 1.0
    assert r["complexity"] == 0.0


def test_intent_no_match_is_ambiguous():
    r = R.classify_intent("12345 67890")
    assert r["primary_intent"] == "ambiguous"
    assert r["confidence"] == 0.0 and r["should_refuse"]
    assert r["refusal_reason"] == "Unable to understand the query intent"


def test_intent_ambiguous_when_secondary_close():
    # factual 0.25 vs relational 0.225 > 0.8*0.25
    r = R.classify_intent("who is peter morrison and what is berlin")
    assert r["primary_intent"] == "ambiguous"
    assert r["should_refuse"]


def test_intent_low_confidence_refuses_with_reformulation():
    r = R.classify_intent("tell me about the morrison group")
    assert r["should_refuse"]
    assert r["refusal_reason"] == \
        "Insufficient confidence in understanding the query"
    assert r["suggested_reformulation"].startswith("Try asking a more")


def test_intent_score_formula():
    # keywords are substring matches: "what" alone = 1/4 * 0.5, plus
    # regex "what is" = 1/4 * 0.5
    assert R._intent_score("what is x", "factual") == pytest.approx(0.25)
    # summary: 5/5 keywords + 3/5 regexes = 0.5 + 0.3
    s = R._intent_score(
        "summarize summary overview tell me about describe alice harmon",
        "summary")
    assert s == pytest.approx(0.8)


def test_complexity_formula():
    # 4 words, no terminals (→1 sentence), alpha=15, avg len 3.75
    c = R.complexity_score("what is alice harmon"[:19])  # "what is alice harmo"
    assert 0.0 < c < 1.0
    # construct bonus
    assert R.complexity_score("a and b") - R.complexity_score("a nda b") \
        == pytest.approx(0.3, abs=1e-9)


# ---------------------------------------------------------------- decompose

def test_decompose_semantic_pattern1():
    d = R.decompose_query("who is peter morrison and what is berlin")
    assert d["strategy"] == "hybrid" and d["confidence"] == 0.8
    texts = [s["text"] for s in d["subqueries"]]
    assert texts == ["who is peter morrison", "what is berlin"]
    assert d["subqueries"][0]["query_type"] == "entity"
    assert d["subqueries"][1]["dependencies"] == "sem_0"


def test_decompose_semantic_pattern2():
    d = R.decompose_query("how is alice related to bob")
    texts = [s["text"] for s in d["subqueries"]]
    assert texts == ["What is alice", "What is bob",
                     "How are alice and bob related"]
    assert all(s["query_type"] == "relationship" for s in d["subqueries"])


def test_decompose_semantic_case_sensitive():
    # the reference's semantic patterns have no (?i): "Who is" does not hit
    d = R.decompose_query("Who is peter morrison and what is berlin")
    # falls through to syntactic ("and" separator; "morrison" has no "or"?
    # it does: m-o-r — so boundaries exist)
    assert d["strategy"] == "hybrid"
    assert all(s["id"].startswith("syn_") for s in d["subqueries"])


def test_decompose_syntactic_midword_separator():
    # "corp" contains "or" → boundary mid-word, faithful to the
    # reference's substring scan (decomposer.rs:627-649)
    d = R.decompose_query("compare corp to tokyo")
    texts = [s["text"] for s in d["subqueries"]]
    assert texts == ["compare c", "p to tokyo"]


def test_decompose_single_when_no_separator():
    d = R.decompose_query("what is berlin")
    assert len(d["subqueries"]) == 1
    assert d["subqueries"][0]["id"] == "single"
    assert d["confidence"] == 1.0


def test_syntactic_strip_fold_and_min_length():
    # leading separators stripped in declaration order; short clauses drop
    clauses = R._syntactic_clauses("alpha beta, and gamma delta")
    assert clauses == ["alpha beta", "gamma delta"]


# --------------------------------------------------------------- logic form

def test_parse_what_is_swallows_question_mark():
    lf = R.parse_logic_form("what is alice harmon?")
    assert lf == {"predicate": "is", "args": ["alice harmon?"]}


def test_parse_related():
    lf = R.parse_logic_form("how is alice harmon related to bob tanner")
    assert lf["predicate"] == "related"
    assert lf["args"] == ["alice harmon", "bob tanner"]


def test_parse_compare_greedy_second_arg():
    lf = R.parse_logic_form("compare a and b in terms of c")
    assert lf["predicate"] == "compare"
    # (.+) is greedy: the optional "in terms of" group never matches
    assert lf["args"] == ["a", "b in terms of c"]


def test_parse_happened_and_caused():
    assert R.parse_logic_form("when did the merger happen")["predicate"] \
        == "happened"
    assert R.parse_logic_form("why did x cause y")["predicate"] == "caused"
    assert R.parse_logic_form("hello world") is None


def test_name_similarity():
    assert R.name_similarity("alice harmon", "Alice Harmon") == 1.0
    assert R.name_similarity("alice", "Alice Harmon") == 0.8
    assert R.name_similarity("alice smith", "bob harmon") == 0.0
    # word jaccard branch
    assert R.name_similarity("xy alice", "zq alice") == pytest.approx(1 / 3)


# -------------------------------------------------------------------- fuzzy

def test_levenshtein_reference_values():
    assert R.levenshtein_distance("kitten", "sitting") == 3
    assert R.levenshtein_distance("", "abc") == 3
    assert R.levenshtein_sim("abc", "abc") == 1.0


def test_combined_similarity_weights():
    # identical → 0.4 + 0.4 + 0.2
    assert R.combined_text_sim("Alpha Beta", "alpha beta") == pytest.approx(1.0)
    s = R.combined_text_sim("alice harmon", "Alice Harmon Jones")
    jac, cont = 2 / 3, 1.0
    lev = 1 - R.levenshtein_distance("alice harmon", "alice harmon jones") / 18
    assert s == pytest.approx(jac * 0.4 + cont * 0.4 + lev * 0.2)


def test_word_overlap_uses_raw_lengths():
    # min() over raw list lengths, intersection over sets
    assert R.word_overlap(["a", "a", "b"], ["a"]) == 1.0
    assert R.word_overlap(["a", "b"], ["a", "c", "d"]) == 0.5


def test_content_preview_short_passthrough():
    assert R.content_preview("  short text ", "q") == "short text"


def test_content_preview_long_window():
    content = "x" * 300 + " needle target " + "y" * 300
    p = R.content_preview(content, "needle", max_length=40)
    assert "needle" in p and p.startswith("...")


def test_fuzzy_confidence_weighting():
    ms = [{"similarity": 1.0, "match_type": "exact_entity"},
          {"similarity": 0.5, "match_type": "chunk_content"}]
    num = 1.0 * 1.0 * 1.0 + 0.5 * 0.5 * 0.6
    den = 1.0 * 1.0 + 0.5 * 0.6
    assert R.fuzzy_confidence(ms) == pytest.approx(num / den)


def test_fuzzy_content_format():
    ms = [{"content": f"c{i}", "similarity": 0.5} for i in range(5)]
    txt = R.fuzzy_content(ms)
    assert txt.startswith("• c0 (similarity: 0.50)\n")
    assert txt.endswith("... and 2 more results")


# --------------------------------------------------------------- validation

def test_validate_query_rules():
    assert not R.validate_query("")["is_valid"]
    assert R.validate_query("x" * 1001)["issues"][0][2] == "Query is very long"
    v = R.validate_query("12345")
    assert v["is_valid"] and v["validation_score"] == pytest.approx(0.9)
    assert R.validate_query("ok question")["validation_score"] == 1.0


def test_response_quality_formulas():
    qm = R.response_quality("what is x", "However, x is y. Therefore z.",
                            ["s1", "s2", "s3"], 2)
    # 3 sentence splits (incl trailing ''), 2 contain connectors
    assert qm["coherence"] == pytest.approx(2 / 3)
    assert qm["consistency"] == 1.0
    assert qm["completeness"] == pytest.approx(
        (len("However, x is y. Therefore z.") / 100 + 1.0 + 1.0) / 3)
    assert qm["credibility"] == pytest.approx((3 / 5 + 1.0) / 2)


# ---------------------------------------------------------------- synthesis

def _res(content, conf, sources=()):
    return {"content": content, "confidence": conf,
            "sources": list(sources), "result_type": "logic_form"}


def test_weighted_synthesis():
    rs = [_res("a", 0.9, ["s1"]), _res("b", 0.4, ["s2"]), _res("c", 0.8)]
    out = R.synthesize_weighted(rs)
    assert out["content"] == "a. c. b"
    assert out["confidence"] == pytest.approx(
        ((0.81 + 0.16 + 0.64) / 3) ** 0.5)
    assert out["sources"] == ["s1", "s2"]


def test_build_response_factual_template():
    intent = {"primary_intent": "factual", "confidence": 1.0}
    resp = R.build_response("q", intent, [_res("Alice Harmon (PERSON)", 1.0,
                                               ["PERSON_alice"])])
    assert resp["content"].startswith(
        "Based on the available information, Alice Harmon (PERSON). "
        "I'm very confident in this information.")
    assert "Sources: [1] PERSON_alice" in resp["content"]
    assert resp["confidence"] == 1.0


def test_build_response_fallback_template_for_causal():
    intent = {"primary_intent": "causal", "confidence": 0.9}
    resp = R.build_response("q", intent, [_res("xx", 0.5)])
    assert resp["content"].startswith("Based on the available information: xx")


def test_stream_chunks():
    chunks = R.stream_chunks("one two three four five", 2)
    assert [c["content"] for c in chunks] == \
        ["one two", "three four", "five"]
    assert [c["is_final"] for c in chunks] == [False, False, True]
    assert R.stream_chunks("", 4) == []


# ------------------------------------------------------------- end-to-end

@pytest.fixture(scope="module")
def mini_kg(ray_session):
    import ray as _ray

    entities = pa.table({
        "canonical_id": ["LOCATION_tokyo", "ORGANIZATION_corp",
                         "PERSON_aliceharmon", "PERSON_bobtanner"],
        "canonical_name": ["Tokyo", "Corp", "Alice Harmon", "Bob Tanner"],
        "entity_type": ["LOCATION", "ORGANIZATION", "PERSON", "PERSON"],
    })
    chunks = pa.table({
        "chunk_id": ["1_0", "2_0"],
        "content": ["Alice Harmon married Bob Tanner last spring.",
                    "Acme Corp is headquartered in Tokyo."],
    })
    edges = pa.table({
        "src": ["PERSON_aliceharmon"],
        "dst": ["PERSON_bobtanner"],
        "rel_type": ["KNOWS"],
        "confidence": [0.5],
    })
    return (_ray.data.from_arrow(entities), _ray.data.from_arrow(chunks),
            _ray.data.from_arrow(edges))


def test_run_rograg_end_to_end(mini_kg):
    ents, chunks, edges = mini_kg
    queries = [
        "how many how much which is what is alice harmon",
        "how is alice harmon related to bob tanner",
        "compare corp and tokyo",
        "alice harmon",
        "why is violence illegal",
    ]
    run = R.run_rograg(queries, ents, chunks, edges)

    # logic form: is-binding exact
    lb = run.logic_bindings
    is_rows = lb[lb.query_ == queries[0]] if hasattr(lb, "query_") else \
        lb[lb["query"] == queries[0]]
    assert list(is_rows["value"]) == ["Alice Harmon (PERSON)"]
    assert list(is_rows["confidence"]) == [1.0]

    # related: direct edge found
    rel_rows = lb[lb["query"] == queries[1]]
    assert list(rel_rows["value"]) == ["Alice Harmon KNOWS Bob Tanner"]
    assert list(rel_rows["confidence"]) == [0.5]

    # compare
    cmp_rows = lb[lb["query"] == queries[2]]
    assert list(cmp_rows["value"]) == \
        ["Corp is a ORGANIZATION while Tokyo is a LOCATION"]

    # fuzzy: exact entity match ranks first for the bare name query
    fz = run.fuzzy_matches
    fz4 = fz[fz["query"] == queries[3]]
    assert fz4.iloc[0]["match_type"] == "exact_entity"
    assert fz4.iloc[0]["similarity"] == 1.0
    # chunk keyword match present ({alice,harmon} / min(2,7) = 1.0)
    assert (fz4["match_type"] == "chunk_content").any()

    # responses: factual answer, refusals
    resp = run.responses.set_index("query")
    assert not resp.loc[queries[0], "is_refusal"]
    assert resp.loc[queries[0], "content"].startswith(
        "Based on the available information, Alice Harmon (PERSON).")
    assert resp.loc[queries[4], "is_refusal"]
    assert resp.loc[queries[4], "content"] == \
        "Unable to provide an answer: Query contains inappropriate content"

    # quality rows only for answered queries; stream covers each response
    assert set(run.quality["query"]) == \
        {q for q in queries if not resp.loc[q, "is_refusal"]}
    assert (run.stream.groupby("query")["is_final"].sum() == 1).all()
