"""Chunker semantics tests (reference: text/mod.rs:141-187, chunking tests at
text/chunking.rs:264-351)."""

from graphrag_ray.functions.chunking import chunk_text


def test_short_text_single_chunk():
    text = "Hello world. This is a tiny document."
    chunks = chunk_text(text, 1000, 200)
    assert chunks == [(0, 0, len(text))]


def test_empty_text():
    assert chunk_text("", 1000, 200) == []
    assert chunk_text("   ", 1000, 200) == []  # whitespace-only chunk skipped


def test_sentence_boundary_snap():
    # window of 50 cuts mid-second-sentence; boundary snaps to after '.'
    text = "First sentence here. Second sentence is quite a bit longer than that."
    chunks = chunk_text(text, 50, 10)
    idx, start, end = chunks[0]
    assert idx == 0 and start == 0
    assert text[end - 1] == "."  # cut right after sentence punctuation
    assert end == len("First sentence here.")


def test_overlap_and_progress():
    text = ("word " * 300).strip()  # 1499 chars, no sentence endings
    chunks = chunk_text(text, 100, 20)
    # every chunk starts within overlap distance of the previous end
    for (i1, s1, e1), (i2, s2, e2) in zip(chunks, chunks[1:]):
        assert i2 == i1 + 1
        assert s2 == max(s1 + 1, e1 - 20)
    # full coverage
    assert chunks[0][1] == 0
    assert chunks[-1][2] == len(text)


def test_word_boundary_fallback():
    # no sentence punctuation → cut lands on a space within last 50 chars
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    chunks = chunk_text(text, 80, 10)
    _, s, e = chunks[0]
    assert text[e] == " " or e == len(text)


def test_monotone_and_deterministic():
    text = "A sentence. " * 500
    a = chunk_text(text, 256, 50)
    b = chunk_text(text, 256, 50)
    assert a == b
    ends = [e for _, _, e in a]
    assert ends == sorted(ends)


def test_abbreviation_detection():
    from graphrag_ray.functions.chunking import (find_sentence_boundary_smart,
                                                 is_likely_abbreviation)

    text = "We met Dr. Smith today. He was fine and then some more text"
    # the period after "Dr" is flagged as abbreviation
    assert is_likely_abbreviation(text, text.index("Dr.") + 2)
    # ...so the smart boundary lands after "today.", not after "Dr."
    b = find_sentence_boundary_smart(text, 0, len(text))
    assert text[:b].endswith("today. ") or text[:b].endswith("today.")


def test_single_initial_is_abbreviation():
    from graphrag_ray.functions.chunking import is_likely_abbreviation

    assert is_likely_abbreviation("J. Smith", 1)
    assert not is_likely_abbreviation("x. Smith", 1)
