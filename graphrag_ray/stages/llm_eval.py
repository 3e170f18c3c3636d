"""LLM-judge evaluation, critic and planner shells (reference
graphrag-core/src/{evaluation/mod.rs,critic/mod.rs,query/planner.rs}).

Deterministic prompt builders and response parsers around a pluggable
``generate(prompt) -> str`` callable (the repo's Ollama-shaped HTTP
backend, a MockLLM, or any real model).  The prompts, dimension
formatting, JSON extraction (markdown-fence stripping) and report
rendering follow the reference byte-for-byte where the reference fixes
the strings.
"""

from __future__ import annotations

import json

EVAL_DIMENSIONS = ("relevance", "faithfulness", "completeness",
                   "coherence", "groundedness")


def format_entities(entities: list[dict]) -> str:
    """evaluation/mod.rs:185-196 — top-10 entity lines."""
    if not entities:
        return "No entities retrieved."
    return "\n".join(
        f"- {e['name']} (type: {e['entity_type']}, "
        f"confidence: {e['confidence']:.2f})"
        for e in entities[:10])


def format_relationships(rels: list[dict]) -> str:
    """evaluation/mod.rs:198-210."""
    if not rels:
        return "No relationships retrieved."
    return "\n".join(
        f"- {r['source']} --[{r['relation_type']}]--> {r['target']} "
        f"(confidence: {r['confidence']:.2f})"
        for r in rels[:10])


def format_chunks(chunks: list[str]) -> str:
    """evaluation/mod.rs:212-231 — top-5 numbered 200-char previews."""
    if not chunks:
        return "No context chunks retrieved."
    out = []
    for i, chunk in enumerate(chunks[:5]):
        preview = chunk if len(chunk) <= 200 else chunk[:200] + "..."
        out.append(f"Chunk {i + 1}:\n{preview}\n")
    return "\n".join(out)


def build_evaluation_prompt(query: str, answer: str, entities: list[dict],
                            relationships: list[dict],
                            chunks: list[str]) -> str:
    """evaluation/mod.rs:82-183 — the five-dimension judge prompt."""
    header = (
        "You are an expert evaluator for question-answering systems. "
        "Evaluate the following GraphRAG query result.\n\n"
        f"## Query\n{query}\n\n"
        f"## Generated Answer\n{answer}\n\n"
        "## Retrieved Context\n"
        f"### Entities ({len(entities)} total)\n"
        f"{format_entities(entities)}\n\n"
        f"### Relationships ({len(relationships)} total)\n"
        f"{format_relationships(relationships)}\n\n"
        f"### Text Chunks ({len(chunks)} total)\n"
        f"{format_chunks(chunks)}\n\n")
    criteria = (
        "## Evaluation Criteria\n"
        "Please evaluate the answer on the following dimensions "
        "(score 1-5, where 5 is best):\n\n"
        "1. **Relevance**: How well does the answer address the query?\n"
        "2. **Faithfulness**: Is the answer grounded in the provided "
        "context?\n"
        "3. **Completeness**: Does the answer cover all aspects of the "
        "query?\n"
        "4. **Coherence**: Is the answer well-structured and clear?\n"
        "5. **Groundedness**: Are entity names and relationships "
        "correctly mentioned?\n\n"
        "## Output Format\n"
        "Provide your evaluation as a JSON object with per-dimension "
        "{score, reasoning}, overall_score and summary.\n\nEvaluate now:")
    return header + criteria


def strip_markdown_fences(text: str) -> str:
    """critic/mod.rs:76-82 / query/planner.rs:40-46."""
    return (text.strip()
            .removeprefix("```json").removeprefix("```")
            .removesuffix("```").strip())


def parse_evaluation(json_str: str) -> dict:
    """LLMEvaluation::from_json (evaluation/mod.rs:264-269)."""
    data = json.loads(strip_markdown_fences(json_str))
    for dim in EVAL_DIMENSIONS:
        if dim not in data or "score" not in data[dim]:
            raise ValueError(f"missing dimension '{dim}'")
    return data


def passes_threshold(evaluation: dict, min_score: float) -> bool:
    return evaluation["overall_score"] >= min_score


def weakest_dimension(evaluation: dict) -> tuple[str, dict]:
    """evaluation/mod.rs:276-291 — min by score, first wins ties."""
    return min(((d, evaluation[d]) for d in EVAL_DIMENSIONS),
               key=lambda t: t[1]["score"])


def evaluation_report(evaluation: dict) -> str:
    """LLMEvaluation::report (evaluation/mod.rs:293-330)."""
    wd_name, wd = weakest_dimension(evaluation)
    lines = [f"## LLM Evaluation Report\n",
             f"**Overall Score**: {evaluation['overall_score']:.2f}/5.0\n",
             "### Dimension Scores"]
    labels = {"relevance": "Relevance:    ",
              "faithfulness": "Faithfulness: ",
              "completeness": "Completeness: ",
              "coherence": "Coherence:    ",
              "groundedness": "Groundedness: "}
    for d in EVAL_DIMENSIONS:
        lines.append(f"- {labels[d]} {evaluation[d]['score']}/5 - "
                     f"{evaluation[d]['reasoning']}")
    lines += ["", "### Summary", evaluation["summary"], "",
              "### Weakest Dimension",
              f"{wd_name}: {wd['reasoning']} (score {wd['score']}/5)"]
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# critic (critic/mod.rs:23-115)


def build_critic_prompt(query: str, context: list[str],
                        answer: str) -> str:
    context_text = "\n\n".join(context)
    return (
        "You are a strict critic for a RAG system. Your job is to "
        "evaluate the quality of a generated answer based on the "
        "provided query and retrieved context.\n\n"
        f"Query: '{query}'\n\nRetrieved Context:\n{context_text}\n\n"
        f"Generated Answer:\n{answer}\n\n"
        "Evaluate the answer on: \n"
        "1. Grounding: Is every claim in the answer supported by the "
        "context? \n"
        "2. Relevance: Does it answer the user's query? \n"
        "3. Completeness: Is it missing critical info present in the "
        "context? \n\n"
        "Return ONLY a raw JSON object with these keys: \n"
        "- 'score': float between 0.0 and 1.0 \n"
        "- 'grounded': boolean \n"
        "- 'feedback': string explanation \n\nJSON Response:")


def build_refine_prompt(query: str, current_answer: str,
                        feedback: str) -> str:
    return (
        "You are an expert editor refining an answer for a RAG "
        "system.\n\n"
        f"Original Query: '{query}'\n\n"
        f"Current Answer:\n{current_answer}\n\n"
        f"Critique/Feedback:\n{feedback}\n\n"
        "Please rewrite the answer to address the critique while "
        "maintaining accuracy and relevance. \n"
        "Return ONLY the refined answer text.")


class Critic:
    """critic/mod.rs — evaluate/refine around a generate callable."""

    def __init__(self, generate):
        self.generate = generate

    def evaluate(self, query: str, context: list[str],
                 answer: str) -> dict:
        response = self.generate(build_critic_prompt(query, context,
                                                     answer))
        data = json.loads(strip_markdown_fences(response))
        for key in ("score", "grounded", "feedback"):
            if key not in data:
                raise ValueError(f"critic response missing '{key}'")
        return data

    def refine(self, query: str, current_answer: str,
               feedback: str) -> str:
        return self.generate(build_refine_prompt(query, current_answer,
                                                 feedback))


# ---------------------------------------------------------------------------
# planner (query/planner.rs:20-59)


def build_planner_prompt(query: str) -> str:
    return (
        "You are an expert query planner for a RAG system. Your task is "
        "to decompose the following complex user query into a list of "
        "simple, independent sub-queries that can be answered using "
        "vector search. Return ONLY a raw JSON object with a single key "
        "'sub_queries' containing the list of strings. Do not include "
        "any explanation, markdown formatting, or preamble. "
        f"Query: '{query}' JSON Response:")


def plan_decompose(query: str, generate) -> list[str]:
    """QueryPlanner::decompose — prompt, strip fences, parse."""
    response = generate(build_planner_prompt(query))
    data = json.loads(strip_markdown_fences(response))
    subs = data.get("sub_queries")
    if not isinstance(subs, list):
        raise ValueError("planner response missing 'sub_queries'")
    return [str(s) for s in subs]
