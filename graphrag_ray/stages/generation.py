"""Answer generation (reference graphrag-core/src/generation/mod.rs).

MockLLM extractive/contextual answering, prompt templates, context
assembly from scored search results, hybrid answer orchestration,
citation formatting and answer-confidence scoring — all deterministic
rule engines (the reference's MockLLM is itself rule-based), so every
branch is SQL-replayable (generation_oracle.py).

Floats are computed in float64 (the reference uses f32; at the 1- and
2-decimal display precisions used here the formatting agrees).
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# sentence splitting (text/mod.rs:361-385)


def extract_sentences(text: str) -> list[str]:
    out = []
    cur = []
    for ch in text:
        if ch in ".!?":
            s = "".join(cur).strip()
            if s:
                out.append(s)
            cur = []
        else:
            cur.append(ch)
    s = "".join(cur).strip()
    if s:
        out.append(s)
    return out


# ---------------------------------------------------------------------------
# MockLLM (generation/mod.rs:29-400)

QA_TEMPLATE = ("Context:\n{context}\n\nQuestion: {question}\n\nBased on "
               "the provided context, please answer the question. If the "
               "context doesn't contain enough information, please say so.")
EXTRACTIVE_TEMPLATE = ("Extract the most relevant information from the "
                       "following context to answer the question.\n\n"
                       "Context: {context}\n\nQuestion: {question}\n\n"
                       "Relevant information:")

_CHARACTER_NAMES = ("entity", "second", "third", "fourth", "fifth", "sixth",
                    "guardian", "companion", "friend", "character")
_EVENT_KEYWORDS = ("activity", "discovery", "location", "place", "action",
                   "building", "structure", "area", "water")
_LOCATION_KEYWORDS = ("settlement", "waterway", "river", "cavern",
                      "landmass", "town", "building", "institution",
                      "dwelling")


def mock_extractive_answer(context: str, query: str) -> str:
    """MockLLM::generate_extractive_answer (generation/mod.rs:72-160):
    per-sentence keyword scoring (exact 2.0, partial-for-long-words 1.0,
    coverage bonus), stable top-5 > 0.5 with '(relevance: %.1f)' suffix,
    low-confidence fallback top-2 > 0."""
    sentences = extract_sentences(context)
    if not sentences:
        return "No relevant context found."
    qwords = [w for w in query.lower().split() if len(w) > 2]
    if not qwords:
        return "Query too short or contains no meaningful words."
    scored = []
    for i, sentence in enumerate(sentences):
        sl = sentence.lower()
        total = 0.0
        matches = 0
        swords = sl.split()
        for w in qwords:
            if w in sl:
                total += 2.0
                matches += 1
            elif len(w) > 4:
                for sw in swords:
                    if w in sw or sw in w:
                        total += 1.0
                        matches += 1
                        break
        total += matches / len(qwords) * 0.5
        scored.append((i, total))
    scored.sort(key=lambda t: -t[1])  # stable: ties keep sentence order
    answers = [f"{sentences[i].strip()} (relevance: {s:.1f})"
               for i, s in scored[:5] if s > 0.5]
    if not answers:
        answers = [f"{sentences[i].strip()} (low confidence: {s:.1f})"
                   for i, s in scored[:2] if s > 0.0]
    if not answers:
        return "No directly relevant information found in the context."
    return "\n\n".join(answers)


def mock_summary(content: str, max_length: int = 150) -> str:
    """MockLLM::generate_summary (generation/mod.rs:357-375)."""
    summary = ""
    for s in extract_sentences(content)[:3]:
        if len(summary) + len(s) > max_length:
            break
        if summary:
            summary += " "
        summary += s
    return summary


def mock_contextual_response(context: str, question: str) -> str:
    """generation/mod.rs:175-213."""
    ql = question.lower()
    cl = context.lower()
    if "who" in ql and "friend" in ql:
        names = [n for n in _CHARACTER_NAMES if n in cl]
        if names:
            return ("Based on the context, the main characters mentioned "
                    f"include: {', '.join(names)}. These appear to be "
                    "friends and companions in the story.")
    if "what" in ql and ("adventure" in ql or "happen" in ql):
        events = [f"events involving {e}" for e in _EVENT_KEYWORDS
                  if e in cl]
        if events:
            return f"The context describes several events: {', '.join(events)}"
    if "where" in ql:
        locs = [x for x in _LOCATION_KEYWORDS if x in cl]
        if locs:
            return ("The story takes place in locations such as: "
                    + ", ".join(locs))
    return f"Based on the available context: {mock_summary(context, 150)}"


def mock_smart_answer(context: str, question: str) -> str:
    """generation/mod.rs:162-173."""
    res = mock_extractive_answer(context, question)
    if "No relevant" in res or "No directly" in res:
        return mock_contextual_response(context, question)
    return res


def mock_generate_response(prompt: str) -> str:
    """MockLLM::generate_response (generation/mod.rs:318-356): Q&A prompt
    parse → smart answer (the question section keeps the template's
    trailing instruction text — a faithful quirk)."""
    pl = prompt.lower()
    if "context:" in pl and "question:" in pl:
        cstart = prompt.find("Context:")
        if cstart != -1:
            section = prompt[cstart + 8:]
            qstart = section.find("Question:")
            if qstart != -1:
                context = section[:qstart].strip()
                question = section[qstart + 9:].strip()
                return mock_smart_answer(context, question)
    if any(w in pl for w in ("who", "what", "where", "when", "how", "why")):
        # generate_question_response (mod.rs:216-236)
        if "entity" in pl and "friend" in pl:
            return ("Entity Name's main friends include Second Entity, "
                    "Friend Entity, and Companion Entity. These characters "
                    "share many relationships throughout the story.")
        if "guardian" in pl:
            return ("Guardian Entity is Entity Name's guardian who raised "
                    "them. They are known for their caring but strict "
                    "nature.")
        if "activity" in pl and "main" in pl:
            return ("The main activity episode is one of the most famous "
                    "events, where they cleverly convince other characters "
                    "to participate in the main activity.")
        return ("I need more specific context to provide a detailed answer "
                "to this question.")
    return "I cannot provide a response based on the given prompt."


# ---------------------------------------------------------------------------
# answer generator (generation/mod.rs:736-1060)

MAX_ANSWER_LENGTH = 500          # GenerationConfig::default
MIN_CONFIDENCE_THRESHOLD = 0.3
MAX_SOURCES = 10


def _truncate_answer(s: str) -> str:
    if len(s) > MAX_ANSWER_LENGTH:
        return s[:MAX_ANSWER_LENGTH - 3] + "..."
    return s


def assemble_context(search_results: list[dict],
                     hierarchical: list[dict]) -> dict:
    """generation/mod.rs:828-905.  Each search result:
    {id, content, score, result_type ('chunk'|'entity'), entities}."""
    primary, supporting = [], []
    entities: set[str] = set()
    for r in search_results:
        entities.update(r.get("entities", ()))
        if r["score"] >= 0.7 and r["result_type"] in ("chunk", "entity"):
            primary.append(r)
        elif r["score"] >= 0.3:
            supporting.append(r)
    primary.sort(key=lambda r: -r["score"])
    supporting.sort(key=lambda r: -r["score"])
    primary = primary[:MAX_SOURCES // 2]
    supporting = supporting[:MAX_SOURCES // 2]
    hier = sorted(hierarchical, key=lambda r: -r["score"])[:3]
    avg_p = sum(r["score"] for r in primary) / len(primary) if primary \
        else 0.0
    avg_s = sum(r["score"] for r in supporting) / len(supporting) \
        if supporting else 0.0
    avg_h = sum(r["score"] for r in hier) / len(hier) if hier else 0.0
    conf = min(avg_p * 0.5 + avg_s * 0.3 + avg_h * 0.2, 1.0)
    return {"primary": primary, "supporting": supporting, "hier": hier,
            "entities": entities, "confidence": conf,
            "source_count": len(primary) + len(supporting) + len(hier)}


def combined_content(ctx: dict) -> str:
    parts = ([r["content"] for r in ctx["primary"]]
             + [r["content"] for r in ctx["supporting"]]
             + [r["summary"] for r in ctx["hier"]])
    return "\n\n".join(p for p in parts)


def context_sources(ctx: dict) -> list[dict]:
    """generation/mod.rs:557-604 — numbered source attributions."""
    out = []
    sid = 1
    for kind, rows, key in (("chunk", ctx["primary"], "content"),
                            ("supporting_chunk", ctx["supporting"],
                             "content"),
                            ("summary", ctx["hier"], "summary")):
        for r in rows:
            content = r[key]
            snippet = content if len(content) <= 100 \
                else content[:100] + "..."
            out.append({"id": sid, "content_type": kind,
                        "source_id": r["id"], "confidence": r["score"],
                        "snippet": snippet})
            sid += 1
    return out


def generate_answer(query: str, search_results: list[dict],
                    hierarchical: list[dict] | None = None) -> dict:
    """AnswerGenerator::generate_answer, Hybrid mode (the default)."""
    ctx = assemble_context(search_results, hierarchical or [])
    sources = context_sources(ctx)
    if ctx["confidence"] < MIN_CONFIDENCE_THRESHOLD:
        return {"query": query,
                "answer": ("Insufficient information available to answer "
                           "this question."),
                "confidence": ctx["confidence"],
                "context_quality": ctx["confidence"],
                "sources": sources, "entities": ctx["entities"]}
    content = combined_content(ctx)

    def extractive() -> str:
        if not content:
            return "No relevant content found."
        prompt = EXTRACTIVE_TEMPLATE.replace("{context}", content) \
                                    .replace("{question}", query)
        return _truncate_answer(mock_generate_response(prompt))

    def abstractive() -> str:
        if not content:
            return "No relevant content found."
        prompt = QA_TEMPLATE.replace("{context}", content) \
                            .replace("{question}", query)
        return _truncate_answer(mock_generate_response(prompt))

    answer = extractive()
    if len(answer) < 50 or "No relevant" in answer:
        answer = abstractive()
    # calculate_answer_confidence (mod.rs:1018-1045)
    conf = ctx["confidence"]
    if len(answer) < 20:
        conf *= 0.7
    if "No relevant" in answer or "insufficient" in answer:
        conf *= 0.5
    al = answer.lower()
    mentions = sum(1 for e in ctx["entities"] if e.lower() in al)
    if mentions > 0:
        conf += min(mentions * 0.1, 0.2)
    return {"query": query, "answer": answer, "confidence": min(conf, 1.0),
            "context_quality": ctx["confidence"], "sources": sources,
            "entities": ctx["entities"]}


def format_with_citations(ans: dict) -> str:
    """GeneratedAnswer::format_with_citations (mod.rs:687-709)."""
    out = ans["answer"]
    if ans["sources"]:
        out += "\n\nSources:"
        for s in ans["sources"]:
            out += (f"\n[{s['id']}] {s['content_type']} (confidence: "
                    f"{s['confidence']:.2f}) - {s['snippet']}")
    if ans["confidence"] > 0.0:
        out += f"\n\nOverall confidence: {ans['confidence']:.2f}"
    return out


def quality_assessment(ans: dict) -> str:
    """GeneratedAnswer::get_quality_assessment (mod.rs:711-733)."""
    c = ans["confidence"]
    level = "High" if c >= 0.8 else "Medium" if c >= 0.5 else "Low"
    n = len(ans["sources"])
    srcq = ("Well-sourced" if n >= 3
            else "Moderately sourced" if n else "Poorly sourced")
    return (f"Confidence: {level} | Sources: {srcq} | Context Quality: "
            f"{ans['context_quality']:.2f}")


# fixed workload for the driver-oracled surface: short bare-name queries
# hit the rich extractive path (exact entity + keyword chunk matches at
# similarity 1.0); the longer ones land in the supporting band and refuse
# with the insufficient-context branch
GEN_QUERIES: tuple[str, ...] = (
    "alice harmon",
    "corp",
    "peter morrison",
    "what is new york",
    "what is alice harmon?",
    "12345 67890",
)


# ---------------------------------------------------------------------------
# explained retrieval (retrieval/explained.rs:93-203)


def explained_answer(query: str, search_results: list[dict]) -> dict:
    """ExplainedAnswer::from_results — reasoning-step trace and source
    references.  The reference draws step entities from a HashSet
    (unspecified order); here the order is pinned to sorted(name)."""
    if search_results:
        avg = sum(r["score"] for r in search_results) / len(search_results)
        confidence = min(max(avg * 0.7 + 0.3, 0.0), 1.0)
    else:
        confidence = 0.0
    sources = []
    for r in search_results[:5]:
        excerpt = r["content"] if len(r["content"]) <= 200 \
            else r["content"][:200] + "..."
        sources.append({"id": r["id"],
                        "source_type": ("entity" if r["result_type"]
                                        == "entity" else "text_chunk"),
                        "excerpt": excerpt,
                        "relevance_score": r["score"]})
    uniq = sorted({e for r in search_results for e in r["entities"]})
    steps = [{"step_number": 1,
              "description": f'Analyzed query: "{query}"',
              "entities_used": [], "evidence_snippet": "",
              "confidence": 0.95}]
    if uniq:
        steps.append({"step_number": len(steps) + 1,
                      "description": f"Found {len(uniq)} relevant entities",
                      "entities_used": uniq[:5], "evidence_snippet": "",
                      "confidence": 0.85})
    chunk_count = sum(1 for r in search_results
                      if r["result_type"] == "chunk")
    if chunk_count > 0:
        first = search_results[0]["content"]
        snippet = first if len(first) <= 100 else first[:100] + "..."
        steps.append({"step_number": len(steps) + 1,
                      "description":
                          f"Retrieved {chunk_count} relevant text chunks",
                      "entities_used": [], "evidence_snippet": snippet,
                      "confidence": confidence})
    steps.append({"step_number": len(steps) + 1,
                  "description":
                      "Synthesized answer from retrieved information",
                  "entities_used": uniq[:3], "evidence_snippet": "",
                  "confidence": confidence})
    key_entities = [e for r in search_results for e in r["entities"]][:10]
    return {"confidence": confidence, "sources": sources, "steps": steps,
            "key_entities": key_entities}
