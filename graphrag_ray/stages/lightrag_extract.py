"""LightRAG graph indexer extraction (reference
graphrag-core/src/lightrag/graph_indexer.rs).

Pattern-stub entity extraction (3-word all-capitalized windows at
confidence 0.6, single capitalized words >2 chars at 0.5 — punctuation
stays attached, a faithful quirk), name-sorted first-kept dedup, and
between-text relationship patterns with type-based confidence boosts
and the positional direction/reversal rules.
"""

from __future__ import annotations

ENTITY_TYPES = ("person", "organization", "location")

# (pattern, rel_type, base_confidence) in scan order — first match wins.
# the bare "in"/"from" substrings over-fire (e.g. "joined" contains
# "in"), faithfully to graph_indexer.rs:129-152
REL_PATTERNS: tuple[tuple[str, str, float], ...] = (
    ("works at", "works_at", 0.7),
    ("works for", "works_at", 0.7),
    ("employed by", "works_at", 0.7),
    ("employee of", "works_at", 0.7),
    ("works as", "works_as", 0.6),
    ("located in", "located_in", 0.8),
    ("based in", "located_in", 0.7),
    ("in", "located_in", 0.4),
    ("from", "from", 0.5),
    ("founded", "founded", 0.8),
    ("created", "created", 0.7),
    ("manages", "manages", 0.8),
    ("leads", "leads", 0.7),
    ("owns", "owns", 0.8),
    ("part of", "part_of", 0.7),
    ("subsidiary of", "subsidiary_of", 0.8),
    ("collaborates with", "collaborates_with", 0.7),
    ("partners with", "partners_with", 0.7),
    ("associated with", "associated_with", 0.6),
    ("related to", "related_to", 0.5),
    ("knows", "knows", 0.6),
)

_REVERSED_TYPES = ("works_at", "located_in", "from")


def guess_entity_type(text: str) -> str:
    """graph_indexer.rs:250-269."""
    lower = text.lower()
    for et in ENTITY_TYPES:
        if et in lower:
            return et
    if lower.endswith(("company", "corp", "inc")):
        return "organization"
    if "city" in lower or "country" in lower or "state" in lower:
        return "location"
    if len(text.split()) == 1 and len(text) < 20:
        return "person"
    return "other"


def extract_entities(text: str) -> list[dict]:
    """graph_indexer.rs:68-115: window-3 capitalized phrases, single
    capitalized words, name-sorted stable dedup (first kept)."""
    words = text.split()
    entities = []
    for w in zip(words, words[1:], words[2:]):
        if all(x and x[0].isupper() for x in w):
            phrase = " ".join(w)
            entities.append({"name": phrase,
                             "entity_type": guess_entity_type(phrase),
                             "confidence": 0.6})
    for word in words:
        if len(word) > 2 and word[0].isupper():
            entities.append({"name": word,
                             "entity_type": guess_entity_type(word),
                             "confidence": 0.5})
    entities.sort(key=lambda e: e["name"])  # stable
    out = []
    for e in entities:
        if not out or out[-1]["name"] != e["name"]:
            out.append(e)
    return out


def extract_relationships(text: str,
                          entities: list[dict]) -> list[dict]:
    """graph_indexer.rs:121-248."""
    tl = text.lower()
    rels = []
    for i, e1 in enumerate(entities):
        for e2 in entities[i + 1:]:
            p1 = tl.find(e1["name"].lower())
            p2 = tl.find(e2["name"].lower())
            if p1 == -1 or p2 == -1:
                continue
            forward = p1 < p2
            first, second = (e1, e2) if forward else (e2, e1)
            between = tl[min(p1, p2):max(p1, p2)]
            for pattern, rel_type, base in REL_PATTERNS:
                if pattern in between:
                    conf = base
                    ft, st = first["entity_type"], second["entity_type"]
                    if rel_type == "works_at" and ft == "person" \
                            and st == "organization":
                        conf += 0.2
                    elif rel_type == "located_in" and st == "location":
                        conf += 0.2
                    elif rel_type == "founded" and ft == "person" \
                            and st == "organization":
                        conf += 0.2
                    elif rel_type == "manages" and ft == "person":
                        conf += 0.1
                    conf = min(conf, 1.0)
                    if forward:
                        src, dst = first["name"], second["name"]
                    elif rel_type in _REVERSED_TYPES:
                        src, dst = second["name"], first["name"]
                    else:
                        src, dst = first["name"], second["name"]
                    rels.append({"source": src, "target": dst,
                                 "rel_type": rel_type,
                                 "confidence": conf})
                    break
    rels.sort(key=lambda r: (r["source"], r["target"], r["rel_type"]))
    out = []
    for r in rels:
        if not out or (out[-1]["source"], out[-1]["target"],
                       out[-1]["rel_type"]) != (r["source"], r["target"],
                                                r["rel_type"]):
            out.append(r)
    return out


def make_indexer_batch_fn(kind: str):
    """map_batches fn over (doc_id, content) emitting entity or
    relationship rows."""
    import pyarrow as pa

    def fn(batch: pa.Table) -> pa.Table:
        if kind == "entities":
            out = {"doc_id": [], "name": [], "entity_type": [],
                   "confidence": []}
            for doc_id, content in zip(
                    batch.column("doc_id").to_pylist(),
                    batch.column("content").to_pylist()):
                for e in extract_entities(content):
                    out["doc_id"].append(int(doc_id))
                    out["name"].append(e["name"])
                    out["entity_type"].append(e["entity_type"])
                    out["confidence"].append(e["confidence"])
            return pa.Table.from_pydict({
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "name": pa.array(out["name"], pa.string()),
                "entity_type": pa.array(out["entity_type"], pa.string()),
                "confidence": pa.array(out["confidence"], pa.float64()),
            })
        import math

        out = {"doc_id": [], "source": [], "target": [], "rel_type": [],
               "confidence": []}
        for doc_id, content in zip(batch.column("doc_id").to_pylist(),
                                   batch.column("content").to_pylist()):
            ents = extract_entities(content)
            for r in extract_relationships(content, ents):
                out["doc_id"].append(int(doc_id))
                out["source"].append(r["source"])
                out["target"].append(r["target"])
                out["rel_type"].append(r["rel_type"])
                out["confidence"].append(
                    math.floor(r["confidence"] * 1e4 + 0.5) / 1e4)
        return pa.Table.from_pydict({
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "source": pa.array(out["source"], pa.string()),
            "target": pa.array(out["target"], pa.string()),
            "rel_type": pa.array(out["rel_type"], pa.string()),
            "confidence": pa.array(out["confidence"], pa.float64()),
        })

    return fn
