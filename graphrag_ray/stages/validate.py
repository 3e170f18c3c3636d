"""Triple-reflection validation (A4) and semantic entity merging (A8).

A4 (entity/llm_relationship_extractor.rs:281-360, wiring
graphrag/build.rs:148-235): for each candidate edge, ask a validator
whether the chunk text EXPLICITLY supports (subject, relation, object);
keep the edge iff ``is_valid && confidence ≥ validation_min_confidence``
(default 0.7, config/mod.rs:1351-1353); on validator ERROR keep the edge
anyway (build.rs:217-226). Runs as an actor-pool map_batches over candidate
edges joined with their context chunk text.

A8 (entity/semantic_merging.rs:32-200): heuristic fallback merge — same
type + name similarity > 0.8 → merge, canonical = best (longest then
lexicographic) name. The LLM decision path plugs in via the same
``validator``/``merger`` callables.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.textfns import name_similarity, normalize_string


class MockTripleValidator:
    """Deterministic validator: a triple is 'explicitly supported' when
    both entity names occur verbatim in the context text."""

    def validate(self, subj: str, rel: str, obj: str, context: str
                 ) -> tuple[bool, float]:
        ok = subj in context and obj in context
        return ok, 0.9 if ok else 0.2


class TripleValidationStage:
    """Actor-pool stage over rows (subj, pred, obj, context_text)."""

    def __init__(self, validator=None, min_confidence: float = 0.7,
                 keep_on_error: bool = True):
        self.validator = validator if validator is not None else MockTripleValidator()
        self.min_confidence = min_confidence
        self.keep_on_error = keep_on_error

    def __call__(self, batch: pa.Table) -> pa.Table:
        keep = []
        valid_flags = []
        val_conf = []
        for subj, _pred, obj, ctx in zip(
            batch.column("subj").to_pylist(),
            batch.column("pred").to_pylist(),
            batch.column("obj").to_pylist(),
            batch.column("context_text").to_pylist(),
        ):
            try:
                ok, conf = self.validator.validate(subj, _pred, obj, ctx or "")
                keep.append(bool(ok and conf >= self.min_confidence))
                valid_flags.append(ok)
                val_conf.append(conf)
            except Exception:  # validator error → keep (build.rs:217-226)
                keep.append(self.keep_on_error)
                valid_flags.append(None)
                val_conf.append(None)
        out = batch.append_column("is_valid", pa.array(valid_flags, pa.bool_()))
        out = out.append_column("validation_confidence", pa.array(val_conf, pa.float32()))
        return out.filter(pa.array(keep, pa.bool_()))


def semantic_merge_candidates(
    entities: list[dict], similarity_threshold: float = 0.8
) -> list[tuple[str, str]]:
    """A8 heuristic fallback: (loser_id → winner_id) merges for same-type
    pairs with normalized-name similarity > threshold
    (semantic_merging.rs:32-200). Winner = longer name, then lexicographic.
    O(n²) — run per blocking group, never globally."""
    merges = []
    merged: set[str] = set()
    ordered = sorted(entities, key=lambda e: (-len(e["name"]), e["name"]))
    for i in range(len(ordered)):
        a = ordered[i]
        if a["canonical_id"] in merged:
            continue
        for j in range(i + 1, len(ordered)):
            b = ordered[j]
            if b["canonical_id"] in merged:
                continue
            if a["entity_type"] != b["entity_type"]:
                continue
            sim = name_similarity(
                normalize_string(a["name"]), normalize_string(b["name"]),
                max_edit_distance=3,
            )
            if sim > similarity_threshold:
                merges.append((b["canonical_id"], a["canonical_id"]))
                merged.add(b["canonical_id"])
    return merges
