"""Atomic-fact (ATOM) extraction → (subj, pred, obj) facts table (M10/A5).

Reference: entity/atomic_fact_extractor.rs — LLM-decomposed self-contained
facts; the year→unix-timestamp parsing incl. BC dates (:52-86, approximate
365-day years) and fact→graph-element conversion with ``pred.to_uppercase()``
as the relation and temporal ranges from markers (:242-310).

The LLM is mocked deterministically: each sentence with a recognized
"<Person/Org> <verb phrase> <Entity>" shape becomes a fact, the verb phrase
the predicate, a trailing "in <year>" a temporal marker. A real backend
swaps in via ``llm.complete`` exactly as in stages/llm_extract.py.
"""

from __future__ import annotations

import re

import pyarrow as pa

FACTS_SCHEMA = pa.schema(
    [
        ("chunk_id", pa.string()),
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("temporal_marker", pa.string()),
        ("timestamp", pa.int64()),
        ("confidence", pa.float32()),
    ]
)

_YEAR_SECONDS = 365 * 24 * 3600

_FACT_RE = re.compile(
    r"([A-Z][\w']+(?: [A-Z][\w']+)?)\s+"
    r"(works for|founded|is employed by|was born in|lives in|married|"
    r"visited|met|partnered with|joined|traveled to|opened)\s+"
    r"(?:a |the )?([A-Z][\w']+(?: [A-Z][\w']+){0,3})"
    r"(?=[\s.,;]|$)"
)
_TEMPORAL_RE = re.compile(r"\b(in \d{3,4}(?: ?BCE?)?|\d{3,4} ?BCE?|during [A-Za-z]+)\b")


def extract_timestamp(marker: str | None) -> int | None:
    """Year → approximate unix seconds, BC negative
    (atomic_fact_extractor.rs:52-86)."""
    if not marker:
        return None
    digits = "".join(c for c in marker if c.isdigit())
    if not digits:
        return None
    year = int(digits)
    if "BC" in marker or "BCE" in marker:
        return -year * _YEAR_SECONDS
    if 1000 < year < 3000:
        return (year - 1970) * _YEAR_SECONDS
    return None


def extract_facts(text: str, confidence: float = 0.8) -> list[dict]:
    """Deterministic sentence→fact decomposition (mock of the ATOM LLM)."""
    facts = []
    for m in _FACT_RE.finditer(text):
        subj, pred, obj = m.group(1), m.group(2), m.group(3)
        tail = text[m.end(): m.end() + 40]
        tm = _TEMPORAL_RE.search(tail)
        marker = tm.group(1) if tm else None
        facts.append(
            {
                "subj": subj,
                "pred": pred,
                "obj": obj,
                "temporal_marker": marker,
                "timestamp": extract_timestamp(marker),
                "confidence": confidence,
            }
        )
    return facts


def facts_batch(batch: pa.Table) -> pa.Table:
    """chunks → facts rows; predicate uppercased with underscores (the
    relation form, atomic_fact_extractor.rs:288-291)."""
    out = {name: [] for name in FACTS_SCHEMA.names}
    for chunk_id, text in zip(batch.column("chunk_id").to_pylist(),
                              batch.column("content").to_pylist()):
        for f in extract_facts(text):
            out["chunk_id"].append(chunk_id)
            out["subj"].append(f["subj"])
            out["pred"].append(f["pred"].upper().replace(" ", "_"))
            out["obj"].append(f["obj"])
            out["temporal_marker"].append(f["temporal_marker"])
            out["timestamp"].append(f["timestamp"])
            out["confidence"].append(f["confidence"])
    return pa.Table.from_arrays(
        [pa.array(out[f.name], f.type) for f in FACTS_SCHEMA],
        schema=FACTS_SCHEMA,
    )


def entity_temporal(facts_ds):
    """Entity temporal fields (core/mod.rs:236-243: first_mentioned /
    last_mentioned / temporal_validity carried on entities; builders
    :1285-1292): per-subject rollup of atomic-fact timestamps —
    first/last_mentioned = min/max, temporal_validity = that range.
    Ray shape: filter → per-batch combiner → tiny keyed aggregate."""
    from ray.data.aggregate import Max, Min

    def partial(batch: pa.Table) -> pa.Table:
        subs = batch.column("subj").to_pylist()
        ts = batch.column("timestamp").to_pylist()
        acc: dict[str, list[int]] = {}
        for s, t in zip(subs, ts):
            if t is None:
                continue
            slot = acc.get(s)
            if slot is None:
                acc[s] = [t, t]
            else:
                slot[0] = min(slot[0], t)
                slot[1] = max(slot[1], t)
        return pa.Table.from_pydict(
            {
                "entity_name": pa.array(list(acc.keys()), pa.string()),
                "ts_min": pa.array([v[0] for v in acc.values()], pa.int64()),
                "ts_max": pa.array([v[1] for v in acc.values()], pa.int64()),
            }
        )

    agg = (facts_ds.map_batches(partial, batch_format="pyarrow")
           .groupby("entity_name")
           .aggregate(Min("ts_min", alias_name="first_mentioned"),
                      Max("ts_max", alias_name="last_mentioned")))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "entity_name": batch.column("entity_name"),
                "first_mentioned": batch.column("first_mentioned"),
                "last_mentioned": batch.column("last_mentioned"),
                "valid_from": batch.column("first_mentioned"),
                "valid_to": batch.column("last_mentioned"),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")
