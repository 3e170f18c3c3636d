"""Model-based extractor stages (A1 LLM single-pass, A2 gleaning, A3
GLiNER-shaped NER) behind the same actor-pool interface as the pattern path.

The real backends (Ollama HTTP, ONNX GLiNER) are not available in this
environment, so a **deterministic MockLLM** stands in — it "answers" the
Microsoft-GraphRAG JSON prompt (entity/prompts.rs:8-51) by running the
deterministic pattern extractor over the prompt's input text and emitting
the same JSON shape the reference parses. That keeps the *semantics* under
test exactly where the reference's logic lives:

- the gleaning loop runs INSIDE the actor's per-chunk call, up to
  ``max_gleaning_rounds`` (default 3, config/mod.rs:1347-1349), stopping
  when the completion check says done (entity/gleaning_extractor.rs:116-238);
- round results merge by lowercase name keeping the LONGER description
  (gleaning_extractor.rs:240-290);
- relationships dedup by "src->dst:type" first-wins
  (gleaning_extractor.rs:450-467);
- malformed JSON is repaired-or-skipped per response (llm_extractor.rs
  jsonfixer path) — the mock can inject malformed output to exercise it.

A real backend plugs in by implementing ``complete(prompt) -> str``; the
stage signature, batching and actor-pool shape do not change.
"""

from __future__ import annotations

import json

import pyarrow as pa

from ..functions.extraction import extract_entities, extract_relationships
from ..schemas import EXTRACTION

ENTITY_EXTRACTION_PROMPT = (
    "-Goal-\nGiven a text document, identify all entities of types "
    "[{entity_types}] and all relationships among them. Return JSON "
    '{{"entities": [...], "relationships": [...]}}.\n'
    "-Real Data-\nEntity Types: {entity_types}\nText: {input_text}\nOutput:\n"
)

GLEANING_CONTINUATION_PROMPT = (
    "-Goal-\nReview your previous extraction and the original text to "
    "identify any additional entities or relationships you may have "
    "missed.\nPrevious: {previous}\nText: {input_text}\nOutput:\n"
)

COMPLETION_CHECK_PROMPT = (
    "Answer YES if all entities in the text have been extracted, else NO.\n"
    "Extracted: {previous}\nText: {input_text}\nAnswer:"
)


class MockLLM:
    """Deterministic stand-in for the Ollama client (the reference ships an
    async mock too: generation/async_mock_llm.rs). Parses the input text out
    of the prompt and answers with pattern-extractor results as JSON."""

    def __init__(self, min_confidence: float = 0.5,
                 malformed_every: int = 0):
        self.min_confidence = min_confidence
        self.malformed_every = malformed_every
        self._calls = 0

    def complete(self, prompt: str) -> str:
        self._calls += 1
        if "Answer YES" in prompt:
            return "YES"  # mock always believes extraction is complete
        text = prompt.rsplit("Text: ", 1)[-1]
        for suffix in ("\nOutput:", "Output:"):
            if text.endswith((suffix, suffix + "\n")):
                text = text.rsplit(suffix, 1)[0]
        ents = extract_entities(text, self.min_confidence)
        rels = extract_relationships(ents, text) if len(ents) >= 2 else []
        id_to_name = {e.entity_id: e.name for e in ents}
        payload = {
            "entities": [
                {"name": e.name, "type": e.entity_type,
                 "description": f"{e.entity_type} (confidence: {e.confidence:.2f})"}
                for e in ents
            ],
            "relationships": [
                {"source": id_to_name.get(s, s), "target": id_to_name.get(d, d),
                 "description": r, "strength": 0.8}
                for s, d, r in rels
            ],
        }
        out = json.dumps(payload)
        if self.malformed_every and self._calls % self.malformed_every == 0:
            return out[:-1]  # truncated JSON → repair path
        return out


def _repair_json(raw: str) -> dict | None:
    """jsonfixer-style repair: try as-is, then with closing braces appended."""
    for candidate in (raw, raw + "}", raw + "]}", raw + '"}]}'):
        try:
            return json.loads(candidate)
        except json.JSONDecodeError:
            continue
    return None


def merge_entity_rounds(existing: list[dict], new: list[dict]) -> list[dict]:
    """Keep the longer description per lowercase name
    (gleaning_extractor.rs:240-290); first-seen order preserved."""
    merged: dict[str, dict] = {}
    for e in existing:
        merged[e["name"].lower()] = e
    for e in new:
        key = e["name"].lower()
        cur = merged.get(key)
        if cur is None or len(e.get("description", "")) > len(cur.get("description", "")):
            merged[key] = e
    return list(merged.values())


def dedup_relationships(rels: list[dict]) -> list[dict]:
    """src->dst:type first-wins (gleaning_extractor.rs:450-467)."""
    seen = set()
    out = []
    for r in rels:
        key = f"{r['source']}->{r['target']}:{r.get('description', '')}"
        if key not in seen:
            seen.add(key)
            out.append(r)
    return out


class GleaningExtractor:
    """A2: multi-round extraction actor stage over chunk batches.

    Emits the same tagged EXTRACTION schema as the pattern stage, so the
    rest of the pipeline (canonicalization, edges) is extractor-agnostic.
    """

    def __init__(self, llm=None, ollama: dict | None = None,
                 max_gleaning_rounds: int = 3,
                 entity_types: tuple[str, ...] = ("PERSON", "ORGANIZATION", "LOCATION"),
                 relationship_confidence: float = 0.5, max_contexts: int = 8):
        # A6 live seam: ``ollama={"base_url": ...}`` builds the real HTTP
        # backend HERE, once per actor — kwargs (a plain dict) ship through
        # fn_constructor_kwargs where a constructed client (thread locks in
        # the rate limiter) could not. MockLLM stays the no-backend default.
        if llm is None:
            if ollama is not None:
                from ..state.httpclient import OllamaLLMBackend

                llm = OllamaLLMBackend(**ollama)
            else:
                llm = MockLLM()
        self.llm = llm
        self.max_rounds = max_gleaning_rounds
        self.entity_types = entity_types
        self.relationship_confidence = relationship_confidence
        self.max_contexts = max_contexts

    def extract_chunk(self, text: str) -> tuple[list[dict], list[dict]]:
        """The per-chunk gleaning loop (gleaning_extractor.rs:116-238)."""
        types = ",".join(self.entity_types)
        prompt = ENTITY_EXTRACTION_PROMPT.format(entity_types=types, input_text=text)
        parsed = _repair_json(self.llm.complete(prompt))
        entities = list(parsed.get("entities", [])) if parsed else []
        rels = list(parsed.get("relationships", [])) if parsed else []
        for _round in range(1, self.max_rounds):
            check = self.llm.complete(
                COMPLETION_CHECK_PROMPT.format(previous=json.dumps(entities),
                                               input_text=text)
            )
            if check.strip().upper().startswith("YES"):
                break
            more = _repair_json(self.llm.complete(
                GLEANING_CONTINUATION_PROMPT.format(previous=json.dumps(entities),
                                                    input_text=text)
            ))
            if not more:
                continue
            entities = merge_entity_rounds(entities, more.get("entities", []))
            rels.extend(more.get("relationships", []))
        return entities, dedup_relationships(rels)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.textfns import normalize_name

        ent_acc: dict[tuple[str, str, str], list] = {}
        edge_acc: dict[tuple[str, str, str], list] = {}
        for chunk_id, doc_id, text in zip(
            batch.column("chunk_id").to_pylist(),
            batch.column("doc_id").to_pylist(),
            batch.column("content").to_pylist(),
        ):
            entities, rels = self.extract_chunk(text)
            name_to_id = {}
            for e in entities:
                etype = e.get("type", "UNKNOWN")
                eid = f"{etype}_{normalize_name(e['name'])}"
                name_to_id[e["name"]] = eid
                key = (doc_id, e["name"], etype)
                slot = ent_acc.get(key)
                if slot is None:
                    ent_acc[key] = [eid, 0.8, 1, 1]
                else:
                    slot[2] += 1
                    slot[3] += 1
            for r in rels:
                s = name_to_id.get(r["source"])
                d = name_to_id.get(r["target"])
                if s is None or d is None:
                    continue
                rel = str(r.get("description", "RELATED_TO")).upper().replace(" ", "_")
                ekey = (s, d, rel)
                eslot = edge_acc.get(ekey)
                if eslot is None:
                    edge_acc[ekey] = [1, 1, chunk_id]
                else:
                    eslot[0] += 1
                    if eslot[1] < self.max_contexts:
                        eslot[1] += 1
                        eslot[2] += "|" + chunk_id

        n_ent, n_edge = len(ent_acc), len(edge_acc)
        return pa.Table.from_arrays(
            [
                pa.array(["entity"] * n_ent + ["edge"] * n_edge, pa.string()),
                pa.array([k[0] for k in ent_acc] + [None] * n_edge, pa.string()),
                pa.array([v[0] for v in ent_acc.values()] + [None] * n_edge, pa.string()),
                pa.array([k[1] for k in ent_acc] + [None] * n_edge, pa.string()),
                pa.array([k[2] for k in ent_acc] + [None] * n_edge, pa.string()),
                pa.array([v[1] for v in ent_acc.values()]
                         + [self.relationship_confidence] * n_edge, pa.float32()),
                pa.array([v[2] for v in ent_acc.values()] + [None] * n_edge, pa.int64()),
                pa.array([v[3] for v in ent_acc.values()] + [None] * n_edge, pa.int64()),
                pa.array([None] * n_ent + [k[0] for k in edge_acc], pa.string()),
                pa.array([None] * n_ent + [k[1] for k in edge_acc], pa.string()),
                pa.array([None] * n_ent + [k[2] for k in edge_acc], pa.string()),
                pa.array([None] * n_ent + [v[0] for v in edge_acc.values()], pa.int64()),
                pa.array([None] * n_ent + [v[2] for v in edge_acc.values()], pa.string()),
            ],
            schema=EXTRACTION,
        )


class GlinerStubExtractor:
    """A3-shaped stage: a "model" held per actor (here: the deterministic
    pattern extractor standing in for ONNX weights), loaded once in
    __init__ — the canonical stateful NER pool
    (entity/gliner_extractor.rs:32-120, invocation graphrag/build.rs:427-515).
    Swap ``self.model`` for a real GLiNER session to go live."""

    def __init__(self, min_confidence: float = 0.7,
                 entity_types: tuple[str, ...] = ("PERSON", "ORGANIZATION", "LOCATION"),
                 relationship_confidence: float = 0.5, max_contexts: int = 8,
                 onnx_model_path: str | None = None):
        # A3 live seam: with ``onnx_model_path`` and onnxruntime importable,
        # the actor loads a real ONNX session once per actor (the reference
        # builds its session the same way, entity/gliner_extractor.rs:32-78).
        # The sandbox ships neither onnxruntime nor GLiNER weights, so the
        # session path is exercised only for its load/error behavior here;
        # the span-decode itself is a declared STRICT seam (same policy as
        # the media decode stages).
        self.session = None
        if onnx_model_path is not None:
            try:
                import onnxruntime  # noqa: F401  (not in this sandbox)
            except ImportError as e:
                raise RuntimeError(
                    "GLiNER ONNX path requested but onnxruntime is not "
                    "installed; omit onnx_model_path for the pattern fallback"
                ) from e
            self.session = onnxruntime.InferenceSession(
                onnx_model_path, providers=["CPUExecutionProvider"])
        from .extract import PatternExtractor

        # fallback "model load" happens here, once per actor
        self.model = PatternExtractor(
            min_confidence, entity_types, True, relationship_confidence, max_contexts
        )

    def _onnx_batch(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "STRICT seam: GLiNER span decode (tokenize → session.run → "
            "span-logit decode, entity/gliner_extractor.rs:80-120) needs the "
            "model's tokenizer assets, not shipped in this sandbox")

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.session is not None:
            return self._onnx_batch(batch)
        return self.model(batch)
