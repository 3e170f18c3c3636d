"""A/B identity: the batch-vectorized extractor (functions/extraction_vec.py)
must produce EXACTLY the row path's output table for every supported config
(reference semantics: entity/mod.rs:114-1108).

The comparison is content-exact (sorted-row multiset equality, float32
confidence bit-compare) across fixture sentences, the Zipf synth corpus,
hypothesis-random word soup, and adversarial edge cases.
"""

from __future__ import annotations

import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from graphrag_ray.functions import extraction_vec
from graphrag_ray.stages.extract import PatternExtractor

DEFAULT_TYPES = ("PERSON", "ORGANIZATION", "LOCATION")

FIXTURES = [
    "Alice Harmon went home.",
    "We met Dr. Vasquez at noon.",
    "Prof. Elena Vasquez spoke.",
    "Then Gandalf vanished quietly.",
    "The Guardian Entity appeared.",
    "She joined Acme Corp yesterday.",
    "The University of Westfield opened.",
    "The University of Westfield. Next.",
    "The Department of Magic ruled.",
    "They flew from New York to Tokyo.",
    "Alice Harmon works for Acme Corp in New York.",
    "Bob Stone founded Stone Inc. He is the CEO.",
    "Maria Lopez was born in Tokyo and lives in Paris.",
    "Acme Corp is headquartered in London.",
    "John Smith married Jane Smith. They are colleagues at MegaCorp Ltd.",
    "Alice Harmon met Alice Harmon. Alice Harmon everywhere.",
    "Dr. Chen and Dr. Wu and Prof. Kim attended.",
    "A B C D E F G H.",  # single-letter caps: clean len < 2 filtered
    "THE QUICK BROWN FOX",  # all-caps words
    "lowercase only sentence with no entities at all",
    "",
    "   ",
    "\tword\n word2  ",
    "Ünïcödé Nämes Äre Hard. Ünïcödé Nämes again.",
    "Mr. O'Brien-Smythe visited St. Mary's Hospital Inc.",
    "X" * 300 + " Y Corp.",
    "First Second Third Fourth Fifth Sixth.",  # greedy adjacent-pair runs
    "One Two. Three Four Five Six Seven.",
]


def make_batch(texts, doc_per=2):
    """Chunks table: doc ids cycle so per-doc aggregation is exercised."""
    n = len(texts)
    return pa.table({
        "doc_id": pa.array([f"doc{i % doc_per}" for i in range(n)]),
        "chunk_id": pa.array([f"c{i}" for i in range(n)]),
        "content": pa.array(texts, pa.string()),
    })


def canon(tbl: pa.Table):
    """Order-insensitive exact content: sorted list of row tuples."""
    rows = [tuple(r[c] for c in tbl.column_names) for r in tbl.to_pylist()]
    return sorted(rows, key=lambda t: tuple((v is None, v) for v in t))


def assert_identical(batch, **kw):
    ext_v = PatternExtractor(use_vectorized=True, **kw)
    ext_r = PatternExtractor(use_vectorized=False, **kw)
    assert ext_v.use_vectorized, f"vectorized path not engaged for {kw}"
    tv, tr = ext_v(batch), ext_r(batch)
    assert tv.schema.equals(tr.schema)
    assert canon(tv) == canon(tr)


def test_fixture_sentences_each_alone():
    for text in FIXTURES:
        assert_identical(make_batch([text]))


def test_fixture_corpus_one_batch():
    assert_identical(make_batch(FIXTURES, doc_per=3))


@pytest.mark.parametrize("minc", [0.0, 0.5, 0.6, 0.7, 0.8, 0.9, 0.95, 1.0])
def test_confidence_sweep(minc):
    assert_identical(make_batch(FIXTURES, doc_per=4), min_confidence=minc)


def test_no_rels():
    assert_identical(make_batch(FIXTURES), extract_rels=False)


def test_context_cap():
    texts = ["Alice Harmon met Bob Stone in Tokyo."] * 40
    assert_identical(make_batch(texts, doc_per=1), max_contexts=3)


@pytest.mark.parametrize("types", [
    ("PERSON",),
    ("ORGANIZATION",),
    ("LOCATION",),
    ("LOCATION", "PERSON"),  # order changes emission order
    ("CHARACTER", "BRAND", "SETTING"),  # alias dispatch
    ("PERSON", "CHARACTER"),  # duplicate dispatch fn → double emissions
])
def test_entity_type_envelopes(types):
    assert_identical(make_batch(FIXTURES, doc_per=3), entity_types=types)


def test_unsupported_types_fall_back():
    ext = PatternExtractor(entity_types=("PERSON", "EVENT"))
    assert not ext.use_vectorized
    assert not extraction_vec.supported(("PERSON", "EVENT"))
    assert not extraction_vec.supported(DEFAULT_TYPES, with_offsets=True)
    assert not extraction_vec.supported(DEFAULT_TYPES,
                                        allowed_patterns=("^A",))


def test_synth_corpus():
    from graphrag_ray.synth import doc_text_from_spans, synth_spans_for_doc

    texts = [doc_text_from_spans(synth_spans_for_doc(d, "", 1))
             for d in range(24)]
    # split long docs into chunk-sized pieces like the pipeline does
    chunks = []
    for t in texts:
        for s in range(0, len(t), 180):
            chunks.append(t[s:s + 180])
    assert_identical(make_batch(chunks, doc_per=5))
    assert_identical(make_batch(chunks, doc_per=5), min_confidence=0.5)


WORDS = st.one_of(
    st.sampled_from([
        "Alice", "Harmon", "Bob", "Corp", "Inc", "Dr.", "Prof.", "Mr.",
        "University", "of", "Tokyo", "New", "York", "the", "works", "for",
        "married", "born", "in", "founded", "CEO", "colleague", "from",
        "headquartered", "based", "The", "And", "Guardian", "Entity",
        "lives", "a", "X", "Ab", "ABC", "O'Brien", "St.", "end.",
    ]),
    st.text(alphabet="abcDEFgh.', ", min_size=1, max_size=8),
)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.lists(WORDS, min_size=0, max_size=30), min_size=1,
                max_size=6),
       st.sampled_from([0.5, 0.7, 0.9]))
def test_random_word_soup(wordlists, minc):
    texts = [" ".join(ws) for ws in wordlists]
    assert_identical(make_batch(texts, doc_per=2), min_confidence=minc)
