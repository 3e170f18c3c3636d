"""BAR-RAG boundary detection + boundary-aware chunking
(graphrag_ray/functions/boundaries.py vs text/boundary_detection.rs,
chunking_strategies.rs:529-588). Unit cases hand-derived from the
reference rules; corpus-wide assertions pin the assumptions the
syn_boundaries SQL oracle relies on."""

from __future__ import annotations

from graphrag_ray.functions.boundaries import (
    chunk_text_boundary_aware,
    detect_boundaries,
    split_positions,
)
from graphrag_ray.synth import doc_text_from_spans, synth_spans_for_doc


def _types(bs):
    return [b.boundary_type for b in bs]


def test_abbreviation_suppression():
    """boundary_detection.rs test_abbreviation_handling: 'Dr.' must not
    end a sentence; real terminals must."""
    text = "Dr. Smith went to the store. He bought milk. The end came."
    bs = [b for b in detect_boundaries(text) if b.boundary_type == "sentence"]
    # 'Dr.' suppressed; '...store. ' and '...milk. ' fire (terminal
    # '...came.' has no trailing whitespace so the regex can't match it)
    assert [b.position for b in bs] == [
        text.index("He"), text.index("The")]
    assert all(b.confidence == 0.9 for b in bs)


def test_min_sentence_length_gate():
    """A terminal closer than 10 chars to the last accepted boundary is
    dropped (rs:146-153: the gate measures to the previous ACCEPTED
    boundary's end)."""
    text = "A very long first sentence here. Too few. Another long sentence follows. "
    bs = [b for b in detect_boundaries(text) if b.boundary_type == "sentence"]
    # 'Too few. ' terminal sits 9 chars after the first boundary -> dropped
    assert [b.position for b in bs] == [
        text.index("Too"), len(text)]


def test_heading_rules():
    text = "\n".join([
        "# Markdown Title",
        "body line that is long enough. ",
        "Underlined",
        "==========",
        "CHAPTER 12",
        "Chapter marker line",
        "lowercase not a heading",
    ])
    hs = [b for b in detect_boundaries(text) if b.boundary_type == "heading"]
    ctx = [(b.context, round(b.confidence, 2)) for b in hs]
    assert ("Markdown Title", 0.95) in ctx          # markdown
    assert ("Underlined", 0.9) in ctx               # RST underline
    assert ("CHAPTER 12", 0.7) in ctx               # ALL-CAPS line
    assert ("Chapter marker line", 0.85) in ctx     # configured marker
    assert len(hs) == 4


def test_list_and_code_transitions():
    text = "\n".join([
        "intro line before anything",
        "- first bullet",
        "- second bullet",
        "after the list now",
        "```",
        "code inside",
        "```",
        "    indented code line",
    ])
    bs = detect_boundaries(text)
    lists = [b for b in bs if b.boundary_type == "list"]
    assert [b.context for b in lists] == ["list_start", "list_end"]
    codes = [b for b in bs if b.boundary_type == "code_block"]
    assert [b.context for b in codes] == [
        "code_start", "code_end", "indented_code"]


def test_dedup_keeps_first_of_equal_positions():
    """Stable sort + dedup_by_key keeps the earlier-inserted boundary at a
    tied position (rs:156-159): when the sentence terminal's match end,
    the paragraph break end and the heading start all land at the same
    offset, the SENTENCE entry (inserted first) survives."""
    text = "Long enough first sentence. \n\n# Heading\nrest of the body"
    pos = text.index("# Heading")
    bs = detect_boundaries(text)
    at = [b for b in bs if b.position == pos]
    assert len(at) == 1 and at[0].boundary_type == "sentence"


def test_split_positions_filter():
    text = "intro body line\n# Head\nmore body text here"
    bs = detect_boundaries(text)
    sp = split_positions(bs)
    assert all(
        any(b.position == p and b.boundary_type in
            ("paragraph", "heading", "code_block") for b in bs)
        for p in sp)
    assert text.index("# Head") in sp


def test_boundary_aware_chunking_packs_sentences():
    """chunking_strategies.rs:540-588 sync path: sentences pack greedily
    to max_chunk_chars with cumulative synthetic offsets."""
    text = "Alpha beta gamma. Delta epsilon zeta! Eta theta iota? Kappa."
    chunks = chunk_text_boundary_aware(text, max_chunk_chars=40)
    contents = [c[3] for c in chunks]
    assert contents == ["Alpha beta gamma Delta epsilon zeta",
                        "Eta theta iota Kappa"]
    # offsets are cumulative over packed content (separator-free)
    assert chunks[0][1:3] == (0, 35)
    assert chunks[1][1:3] == (35, 55)
    # one oversized sentence still emits (cap applies only at joins)
    one = chunk_text_boundary_aware("x" * 100 + ".", max_chunk_chars=10)
    assert len(one) == 1 and one[0][3] == "x" * 100


N_FULL = 500


def test_syn_boundaries_oracle_assumptions():
    """The syn_boundaries SQL oracle emits cumulative sentence-length
    positions; valid only if corpus-wide (a) every boundary is a sentence
    terminal (no paragraph/heading/list/code pattern in synth text),
    (b) no terminal is abbreviation-suppressed, (c) the min-length gate
    never trips. Asserted by full equality with the span sentences."""
    for d in range(N_FULL):
        spans = synth_spans_for_doc(d, "", 1)
        text = doc_text_from_spans(spans)
        sents = [s["text"] for s in spans if s["kind"] == "text"]
        exp, pos = [], 0
        for s in sents:
            pos += len(s)
            exp.append((pos, "sentence", 0.9))
        got = [(b.position, b.boundary_type, b.confidence)
               for b in detect_boundaries(text)]
        assert got == exp, d


def _topic_embed(sentence: str):
    """Deterministic topic embedding: axis 0 for 'cat' sentences, axis 1
    for 'car' sentences, a diagonal otherwise."""
    import numpy as np

    v = np.zeros(4, dtype=np.float32)
    low = sentence.lower()
    if "cat" in low:
        v[0] = 1.0
    elif "car" in low:
        v[1] = 1.0
    else:
        v[2] = 1.0
    return v


def test_coherence_scoring_reference_semantics():
    """semantic_coherence.rs:118-204: identical-topic chunks score 1.0,
    mixed-topic chunks lower; single sentence is perfect coherence."""
    import numpy as np

    from graphrag_ray.functions.coherence import (CoherenceScorer,
                                                  cosine_similarity,
                                                  split_sentences_coherence)

    sc = CoherenceScorer(_topic_embed)
    same = "The cat sat on a mat. The cat ate some food. A cat slept well."
    mixed = "The cat sat on a mat. The car drove very fast."
    assert sc.score_chunk_coherence(same) == 1.0
    assert sc.score_chunk_coherence(mixed) == 0.0
    assert sc.score_chunk_coherence("One sentence only.") == 1.0
    # cosine guards (rs:358-375)
    assert cosine_similarity(np.zeros(3), np.ones(3)) == 0.0
    assert cosine_similarity(np.ones(2), np.ones(3)) == 0.0
    # splitter merges <=3-char fragments forward (rs only clears the
    # buffer when a sentence is actually pushed)
    assert split_sentences_coherence("Hi. A proper sentence here.") == [
        "Hi. A proper sentence here."]


def test_find_optimal_split_prefers_topic_boundary():
    """The greedy search must place the split exactly at the cat→car
    topic change and report higher overall coherence than unsplit."""
    from graphrag_ray.functions.coherence import CoherenceScorer

    text = ("The cat sat quietly. The cat purred loudly. "
            "The car drove away. The car honked twice.")
    split_at = text.index("The car")
    sc = CoherenceScorer(_topic_embed)
    base = sc.score_chunk_coherence(text)
    res = sc.find_optimal_split(
        text, [split_at, text.index("The cat purred")])
    assert res["split_positions"] == [split_at]
    assert res["overall_coherence"] == 1.0 > base
    assert [c["start_pos"] for c in res["chunks"]] == [0, split_at]
    # min-sentences validation: a split leaving a 1-sentence chunk is
    # rejected (popped), leaving no splits
    res2 = CoherenceScorer(_topic_embed, min_sentences_per_chunk=3
                           ).find_optimal_split(text, [split_at])
    assert res2["split_positions"] == []


def test_adaptive_threshold():
    from graphrag_ray.functions.coherence import CoherenceScorer

    sc = CoherenceScorer(_topic_embed)
    short = "The cat sat. " * 2
    assert sc.calculate_adaptive_threshold(short) > 0.6
    sc_off = CoherenceScorer(_topic_embed, adaptive_threshold=False)
    assert sc_off.calculate_adaptive_threshold(short) == 0.65


def test_boundary_scored_chunker():
    """Note: a paragraph break directly after sentence punctuation ends at
    the SAME position as the sentence boundary, which wins the first-wins
    dedup — so split candidates only survive where the preceding line has
    no terminal punctuation (reference-faithful interaction)."""
    from graphrag_ray.functions.boundaries import chunk_text_boundary_scored

    text = ("The cat sat quietly. The cat purred loudly\n\n"
            "The car drove away. The car honked twice.")
    chunks = chunk_text_boundary_scored(text, _topic_embed)
    assert len(chunks) == 2
    assert chunks[0][3].strip().endswith("purred loudly")
    assert chunks[1][3].strip().startswith("The car drove")
    # spans tile the text exactly
    assert chunks[0][1] == 0 and chunks[1][2] == len(text)
    assert chunks[0][2] == chunks[1][1]
