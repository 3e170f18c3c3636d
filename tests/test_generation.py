"""Answer generation tests (reference graphrag-core/src/generation/mod.rs
— MockLLM scoring, context assembly, hybrid orchestration)."""

import pytest

from graphrag_ray.stages import generation as G


def test_extract_sentences_char_walk():
    assert G.extract_sentences("A b. C d! E?  tail") == \
        ["A b", "C d", "E", "tail"]
    assert G.extract_sentences("...") == []


def test_extractive_scoring_exact_and_partial():
    ctx = "Alice works here. Bob sleeps. Alicette dreams."
    ans = G.mock_extractive_answer(ctx, "alice working")
    # 'alice' exact in s1 (2.0) and substring of 'alicette' in s3 (2.0 —
    # contains check hits the whole sentence string first)
    assert "Alice works here (relevance:" in ans
    # 'working' (len>4) partial-matches 'works'
    first = ans.split("\n\n")[0]
    assert first.startswith("Alice works here")


def test_extractive_short_query_words_filtered():
    assert G.mock_extractive_answer("Some text.", "a of we") == \
        "Query too short or contains no meaningful words."
    assert G.mock_extractive_answer("", "alice") == \
        "No relevant context found."


def test_extractive_low_confidence_fallback():
    ctx = "Totally unrelated sentence. Another one here."
    ans = G.mock_extractive_answer(ctx, "zebra quantum")
    assert ans == "No directly relevant information found in the context."


def test_summary_accumulation_limit():
    content = ("x" * 80 + ". " + "y" * 60 + ". " + "z" * 60 + ".")
    s = G.mock_summary(content, 150)
    # s1 (80) + s2 (60) = 140 ≤ 150; adding s3 (60) would exceed
    assert s == "x" * 80 + " " + "y" * 60


def test_qa_prompt_roundtrip():
    prompt = G.QA_TEMPLATE.replace("{context}", "Alice runs fast.") \
                          .replace("{question}", "alice")
    out = G.mock_generate_response(prompt)
    assert "Alice runs fast" in out


def test_assemble_context_bands_and_confidence():
    results = [
        {"id": "a", "content": "A", "score": 0.9, "result_type": "chunk",
         "entities": ["Alice"]},
        {"id": "b", "content": "B", "score": 0.5, "result_type": "chunk",
         "entities": []},
        {"id": "c", "content": "C", "score": 0.1, "result_type": "chunk",
         "entities": []},
    ]
    ctx = G.assemble_context(results, [])
    assert [r["id"] for r in ctx["primary"]] == ["a"]
    assert [r["id"] for r in ctx["supporting"]] == ["b"]
    assert ctx["confidence"] == pytest.approx(0.9 * 0.5 + 0.5 * 0.3)
    assert ctx["entities"] == {"Alice"}


def test_generate_answer_insufficient_branch():
    ans = G.generate_answer("q", [
        {"id": "b", "content": "B", "score": 0.35, "result_type": "chunk",
         "entities": []}])
    assert ans["answer"].startswith("Insufficient information")
    assert ans["confidence"] == pytest.approx(0.35 * 0.3)


def test_generate_answer_entity_boost_and_citations():
    results = [
        {"id": "c1", "content": "Alice Harmon lives in Berlin today.",
         "score": 1.0, "result_type": "chunk", "entities": []},
        {"id": "e1", "content": "Alice Harmon (PERSON)", "score": 1.0,
         "result_type": "entity", "entities": ["Alice Harmon"]},
    ]
    ans = G.generate_answer("alice harmon", results)
    assert "relevance:" in ans["answer"]
    # 0.5 context confidence + 0.1 single entity mention boost
    assert ans["confidence"] == pytest.approx(0.6)
    formatted = G.format_with_citations(ans)
    assert "\n\nSources:\n[1] chunk (confidence: 1.00) - " in formatted
    assert formatted.endswith("Overall confidence: 0.60")
    assert G.quality_assessment(ans) == \
        "Confidence: Medium | Sources: Moderately sourced | " \
        "Context Quality: 0.50"


def test_truncation_at_max_answer_length():
    long = "word " * 300
    results = [{"id": "c", "content": long + ".", "score": 1.0,
                "result_type": "chunk", "entities": []}]
    ans = G.generate_answer("word", results)
    assert len(ans["answer"]) == 500
    assert ans["answer"].endswith("...")
