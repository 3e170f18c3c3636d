"""Deterministic interleaved text+media spans corpus.

The driver fixes our input table shape (BASELINE.json input_hint):

    documents(doc_id: string,
              spans: list<struct<kind:string, text:string,
                                 media_ref:string, offset:int32>>)

No such table exists in /root/testdata, so we synthesize it deterministically
(per-doc seeding → order-independent, embarrassingly parallel, scales to any
row count) from the driver's flat ``documents.parquet`` (doc_id, text, ...):
each document keeps its raw text as leading spans and gains a deterministic
entity-bearing narrative that exercises every extractor rule
(FIXTURES.md §F1): two-word PERSON names, title-based names, ORG
suffix/prefix forms, known LOCATIONs, relation-trigger contexts, Zipf-skewed
entity popularity (hot canonicalization keys), fuzzy name variants, and
interleaved media spans that must pass through untouched.

Everything is a pure function of (seed, doc_id) — no global RNG sequence —
so generation distributes inside ``map_batches`` without coordination.
"""

from __future__ import annotations

import hashlib
import random

import numpy as np
import pyarrow as pa

from .schemas import DOCUMENTS

SEED = 42

FIRST_NAMES = (
    "Alice Bob Carol David Elena Frank Grace Henry Irene James Karen Louis "
    "Maria Nathan Olivia Peter Quinn Robert Sarah Thomas Ursula Victor Wendy "
    "Xavier Yvonne Zachary Amelia Brian Clara Daniel Edith Felix Gloria Hugo "
    "Isabel Jacob Katherine Leon Martha Nicholas"
).split()
LAST_NAMES = (
    "Harmon Tanner Mendez Okafor Vasquez Larson Whitfield Donovan Ferguson "
    "Galloway Hampton Ingram Jamison Kessler Lockhart Morrison Norwood "
    "Oakley Pemberton Quimby Radford Sanderson Thornton Underwood Vickers "
    "Wharton Yardley Ashford Bradford Carlson Dawson Ellison Fenton Garrison "
    "Hutton Iverson Jensen Kingston Lawson Merton"
).split()
ORGS = (
    "Acme Corp", "Orion Technologies", "Globex Corporation", "Initech LLC",
    "Umbrella Company", "Stark Solutions", "Wayne Group", "Cyberdyne Inc",
    "Tyrell Corp", "Vandelay Company", "Hooli Inc", "Massive Dynamic Group",
    "University of Westfield", "Institute of Advanced Study",
    "University of Northgate", "Institute of Marine Science",
)
LOCATIONS = (
    "New York", "London", "Paris", "Tokyo", "Berlin", "Washington", "Boston",
    "Chicago", "California", "United States",
)
TITLES = ("Dr.", "Prof.", "Captain", "Judge", "Sir")

# templates: {p}=person, {p2}=person, {o}=org, {l}=location.
# keywords chosen to trigger every relation type in entity/mod.rs:841-879.
TEMPLATES = (
    "{p} works for {o} in {l}.",
    "{p} founded {o} two years ago.",
    "{p} is employed by {o}.",
    "{p} was born in {l} long ago.",
    "{p} lives in {l} with family.",
    "{p} married {p2} last spring.",
    "{p} and {p2} are colleague researchers.",
    "{p} met {p2} at the office.",
    "{o} is headquartered in {l}.",
    "{o} opened a new office in {l}.",
    "{t} {p} joined {o} recently.",
    "{t} {p} traveled to {l} yesterday.",
    "{p} visited {l} and then met {p2}.",
    "{p} partnered with {p2} on the project for {o}.",
)


def _person_pool() -> list[str]:
    rng = random.Random(SEED)
    pool = []
    seen = set()
    while len(pool) < 120:
        name = f"{rng.choice(FIRST_NAMES)} {rng.choice(LAST_NAMES)}"
        if name not in seen:
            seen.add(name)
            pool.append(name)
    return pool


PERSONS = _person_pool()


def _u(key: str) -> float:
    """Named md5 draw, uniform in [0, 1).

    EVERY random decision in the corpus is a pure function of its own
    (doc, sentence, field) key — no sequential RNG stream — which makes
    the whole corpus SQL-reproducible: DuckDB recomputes any draw as
    ``('0x'||substr(md5(key),1,8))::BIGINT / 4294967296.0`` (the same
    md5-arithmetic trick as the kgx oracle corpus, graphrag_ray/kgx.py).
    That property is what lets kg_chunks / media_features carry hard
    driver oracles over this corpus."""
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) / 4294967296.0


def _zipf_idx(u: float, n: int) -> int:
    """Zipf-ish skewed index: index 0 is the hot key (skew/salting fixture).
    Written as u*u*u (not u**3) so DuckDB's replay is bit-identical."""
    v = u * u * u
    return min(n - 1, int(n * v))


def _variant(doc_id: int, s: int, name: str) -> str:
    """Fuzzy-linking variants (FIXTURES.md §F1): typo in the last token,
    extra internal whitespace, or ALL CAPS. All collapse to the same
    canonical cluster under the reference's similarity rules."""
    r = _u(f"syn:{doc_id}:{s}:vkind")
    if r < 0.4:
        # drop one char from the last token (keeps first token intact so the
        # (type, soundex(first-token)) blocking key still matches)
        parts = name.split()
        last = parts[-1]
        if len(last) > 4:
            k = 2 + int(_u(f"syn:{doc_id}:{s}:vk") * (len(last) - 3))
            parts[-1] = last[:k] + last[k + 1:]
        return " ".join(parts)
    if r < 0.7:
        return name.replace(" ", "  ", 1)
    return name.upper()


def synth_spans_for_doc(doc_id: int, base_text: str = "", factor: int = 1) -> list[dict]:
    """Deterministic spans for one document — pure function of (doc_id,
    factor). ``factor`` scales the sentence count per doc (bench corpora use
    larger docs so per-doc text size is realistic; tests use factor=1)."""
    spans: list[dict] = []
    offset = 0

    def add_text(t: str) -> None:
        nonlocal offset
        spans.append({"kind": "text", "text": t, "media_ref": "", "offset": offset})
        offset += len(t)

    def add_media(k: int) -> None:
        spans.append({
            "kind": "image",
            "text": "",
            "media_ref": f"lance://media/img_{doc_id}_{k}",
            "offset": offset,
        })

    if base_text:
        add_text(base_text.strip() + " ")

    n_sentences = (3 + int(_u(f"syn:{doc_id}:ns") * 6)) * max(1, factor)
    media_doc = doc_id % 10 == 0
    media_count = 0
    for s in range(n_sentences):
        template = TEMPLATES[int(_u(f"syn:{doc_id}:{s}:tmpl") * len(TEMPLATES))]
        p = PERSONS[_zipf_idx(_u(f"syn:{doc_id}:{s}:p"), len(PERSONS))]
        p2 = PERSONS[_zipf_idx(_u(f"syn:{doc_id}:{s}:p2"), len(PERSONS))]
        if _u(f"syn:{doc_id}:{s}:var") < 0.12:
            p = _variant(doc_id, s, p)
        sentence = template.format(
            p=p,
            p2=p2,
            o=ORGS[_zipf_idx(_u(f"syn:{doc_id}:{s}:o"), len(ORGS))],
            l=LOCATIONS[_zipf_idx(_u(f"syn:{doc_id}:{s}:l"), len(LOCATIONS))],
            t=TITLES[int(_u(f"syn:{doc_id}:{s}:t") * len(TITLES))],
        )
        add_text(sentence + " ")
        if media_doc and s % 3 == 1:
            add_media(media_count)
            media_count += 1
    return spans


def doc_text_from_spans(spans: list[dict]) -> str:
    """The per-row invariant's text view: ordered concatenation of text
    spans; media spans are carried through untouched (SURVEY.md §1.3)."""
    return "".join(s["text"] for s in spans if s["kind"] == "text")


def spans_batch_from_flat(batch: pa.Table, include_base_text: bool = True,
                          factor: int = 1) -> pa.Table:
    """Adapter: flat driver table (doc_id:int64, text:string) → spans table.

    Runs inside ``map_batches`` so the spans corpus is generated
    distributedly, never materialized on the driver.
    """
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist() if include_base_text and "text" in batch.column_names \
        else [""] * len(doc_ids)
    out_ids = []
    out_spans = []
    for doc_id, text in zip(doc_ids, texts):
        out_ids.append(f"doc_{int(doc_id):08d}")
        out_spans.append(synth_spans_for_doc(int(doc_id), text or "", factor))
    return pa.Table.from_arrays(
        [
            pa.array(out_ids, type=pa.string()),
            pa.array(out_spans, type=DOCUMENTS.field("spans").type),
        ],
        schema=DOCUMENTS,
    )


def synth_documents_table(n_docs: int, include_base_text: bool = False) -> pa.Table:
    """Standalone deterministic corpus (tests; no testdata dependency)."""
    flat = pa.table({
        "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
        "text": pa.array([""] * n_docs, type=pa.string()),
    })
    return spans_batch_from_flat(flat, include_base_text=include_base_text)
