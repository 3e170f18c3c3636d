"""LLM-judge / critic / planner shell tests
(evaluation/mod.rs, critic/mod.rs, query/planner.rs)."""

import json

import pytest

from graphrag_ray.stages import llm_eval as E


def test_format_helpers_truncation():
    ents = [{"name": f"E{i}", "entity_type": "PERSON", "confidence": 0.5}
            for i in range(12)]
    s = E.format_entities(ents)
    assert s.count("\n") == 9 and "E9" in s and "E11" not in s
    assert E.format_entities([]) == "No entities retrieved."
    chunks = ["x" * 250, "short"]
    cs = E.format_chunks(chunks)
    assert "x" * 200 + "..." in cs and "Chunk 2:" in cs
    assert E.format_relationships([]) == "No relationships retrieved."


def test_build_evaluation_prompt_sections():
    p = E.build_evaluation_prompt(
        "what is x", "x is y",
        [{"name": "X", "entity_type": "T", "confidence": 1.0}],
        [{"source": "a", "relation_type": "R", "target": "b",
          "confidence": 0.5}],
        ["chunk text"])
    assert "## Query\nwhat is x" in p
    assert "### Entities (1 total)" in p
    assert "- a --[R]--> b (confidence: 0.50)" in p
    assert p.endswith("Evaluate now:")


def _eval_payload():
    dims = {d: {"score": i + 1, "reasoning": f"r{d}"}
            for i, d in enumerate(E.EVAL_DIMENSIONS)}
    return {**dims, "overall_score": 3.0, "summary": "ok"}


def test_parse_and_report():
    payload = _eval_payload()
    parsed = E.parse_evaluation(
        "```json\n" + json.dumps(payload) + "\n```")
    assert E.passes_threshold(parsed, 3.0)
    assert not E.passes_threshold(parsed, 3.5)
    name, wd = E.weakest_dimension(parsed)
    assert name == "relevance" and wd["score"] == 1
    rep = E.evaluation_report(parsed)
    assert "**Overall Score**: 3.00/5.0" in rep
    assert "relevance: rrelevance (score 1/5)" in rep


def test_parse_evaluation_missing_dimension():
    with pytest.raises(ValueError):
        E.parse_evaluation(json.dumps({"overall_score": 1}))


def test_critic_roundtrip():
    def fake_generate(prompt):
        assert "strict critic" in prompt
        return "```json\n" + json.dumps(
            {"score": 0.8, "grounded": True, "feedback": "fine"}) + "\n```"

    c = E.Critic(fake_generate)
    out = c.evaluate("q", ["ctx1", "ctx2"], "ans")
    assert out == {"score": 0.8, "grounded": True, "feedback": "fine"}

    def bad_generate(prompt):
        return json.dumps({"score": 0.8})

    with pytest.raises(ValueError):
        E.Critic(bad_generate).evaluate("q", [], "a")


def test_critic_refine_prompt():
    seen = {}

    def gen(prompt):
        seen["p"] = prompt
        return "better answer"

    out = E.Critic(gen).refine("q", "old", "too vague")
    assert out == "better answer"
    assert "Critique/Feedback:\ntoo vague" in seen["p"]


def test_planner_decompose():
    def gen(prompt):
        assert "query planner" in prompt
        return "```json\n" + json.dumps(
            {"sub_queries": ["a?", "b?"]}) + "\n```"

    assert E.plan_decompose("a and b?", gen) == ["a?", "b?"]
    with pytest.raises(ValueError):
        E.plan_decompose("x", lambda p: json.dumps({"wrong": []}))
