"""Sliding-window chunker with sentence-boundary snapping.

Behavioral transcription of the reference's legacy chunker
(graphrag-core/src/text/mod.rs:141-187 ``chunk_text``, sentence boundary at
:285-327, word boundary at :330-347). Offsets here are *character* offsets
(Python strings are char sequences, so the reference's UTF-8
``find_char_boundary`` safety dance collapses to identity).

Semantics:
- window = [start, start+chunk_size)
- if the window doesn't reach end-of-text, snap the cut to the last
  sentence end ('.', '!', '?' followed by whitespace or window end) within
  the final 200 chars of the window; else to the last space within the final
  50 chars; else hard cut at the window end;
- empty/whitespace-only chunks are skipped but do not consume a chunk index;
- next start = max(start+1, cut-overlap).
"""

from __future__ import annotations

_SENTENCE_ENDINGS = ".!?"


def _find_sentence_boundary(text: str, start: int, preferred_end: int) -> int | None:
    """Return absolute cut position, or None (text/mod.rs:285-327)."""
    if start >= preferred_end:
        return None
    window = text[start:preferred_end]
    search_start = max(0, len(window) - 200)
    search = window[search_start:]

    # rightmost boundary wins — scan from the right and exit on the first
    # hit (sentence-dense text exits within a few chars; the full-window
    # left-to-right scan was the chunker's hot loop)
    m = len(search)
    for i in range(m - 1, -1, -1):
        if search[i] in _SENTENCE_ENDINGS:
            next_pos = i + 1
            # boundary counts when followed by whitespace *within the window*
            # or when the punctuation ends the window
            if next_pos >= m or search[next_pos].isspace():
                return start + search_start + next_pos
    return _find_word_boundary(text, start, preferred_end)


def _find_word_boundary(text: str, start: int, preferred_end: int) -> int | None:
    """Last space within the final 50 chars of the window; cut lands *on*
    the space (text/mod.rs:330-347)."""
    if start >= preferred_end:
        return None
    window = text[start:preferred_end]
    search_start = max(0, len(window) - 50)
    pos = window.rfind(" ", search_start)
    if pos == -1:
        return None
    return start + pos


HIERARCHICAL_SEPARATORS = ("\n\n", "\n", ". ", "! ", "? ", "; ", ": ", " ")

_ABBREVIATIONS = ("dr", "mr", "mrs", "ms", "prof", "jr", "sr", "inc", "corp",
                  "ltd", "co", "etc", "vs", "e.g", "i.e", "cf", "pp")


def is_likely_abbreviation(text: str, period_pos: int) -> bool:
    """Abbreviation/initial detection before a period
    (text/chunking.rs:203-237): known abbreviation word immediately before
    the period, or a single uppercase initial at position 1."""
    if period_pos == 0:
        return False
    before = text[:period_pos]
    word_start = before.rfind(" ")
    if word_start != -1:
        return before[word_start + 1:].lower() in _ABBREVIATIONS
    if period_pos == 1 and before[:1].isupper():
        return True
    return False


def find_sentence_boundary_smart(text: str, start: int, preferred_end: int
                                 ) -> int | None:
    """Abbreviation-aware sentence boundary (text/chunking.rs:155-199):
    searches the last 300 chars of the window, requires the ending to be
    followed by space/newline (or window end), and skips boundaries that
    follow a likely abbreviation — 'Dr.' never ends a sentence."""
    if start >= preferred_end:
        return None
    window = text[start:preferred_end]
    search_start = max(0, len(window) - 300)
    search = window[search_start:]
    last_boundary = None
    for i, ch in enumerate(search):
        if ch in _SENTENCE_ENDINGS:
            next_pos = i + 1
            if next_pos >= len(search):
                last_boundary = start + search_start + next_pos
            elif search[next_pos] in (" ", "\n") and not is_likely_abbreviation(search, i):
                last_boundary = start + search_start + next_pos
    return last_boundary


def _word_boundary_backward(text: str, pos: int) -> int:
    """Nearest word boundary going backward (text/chunking.rs:128-152)."""
    while pos > 0:
        if text[pos - 1].isspace():
            return pos
        pos -= 1
    return pos


def _find_optimal_boundary(text: str, start: int, max_end: int) -> int:
    """Hierarchical separator search (text/chunking.rs:104-126): try each
    separator in preference order, accept the last occurrence if it keeps
    at least a quarter of the window."""
    search = text[start:max_end]
    for sep in HIERARCHICAL_SEPARATORS:
        pos = search.rfind(sep)
        if pos != -1:
            boundary = start + pos + len(sep)
            if boundary > start + (max_end - start) // 4:
                return boundary
    return _word_boundary_backward(text, max_end)


def chunk_text_hierarchical(
    text: str, chunk_size: int, overlap: int, min_chunk_size: int = 50
) -> list[tuple[int, int, int]]:
    """Recursive-separator chunker (M2, text/chunking.rs:6-152): splits on
    the highest-priority separator within each window, keeps chunks with
    ≥ min_chunk_size trimmed chars, re-aligns the overlapped next start to
    a word boundary. Deviation from the reference: forward progress is
    guaranteed (next start > current start) — the reference has no such
    guard and relies on data never degenerating."""
    chunks: list[tuple[int, int, int]] = []
    n = len(text)
    start = 0
    counter = 0
    while start < n:
        end = min(start + chunk_size, n)
        if end >= n:
            if len(text[start:].strip()) >= min_chunk_size:
                chunks.append((counter, start, n))
                counter += 1
            break
        optimal = _find_optimal_boundary(text, start, end)
        if optimal > start:
            end = optimal
        if len(text[start:end].strip()) >= min_chunk_size:
            chunks.append((counter, start, end))
            counter += 1
        if end >= n:
            break
        next_start = max(0, end - overlap)
        next_start = _word_boundary_backward(text, next_start)
        start = max(start + 1, next_start)
    return chunks


def chunk_text(text: str, chunk_size: int, overlap: int) -> list[tuple[int, int, int]]:
    """Yield (chunk_idx, start, end) char spans (text/mod.rs:141-187)."""
    chunks: list[tuple[int, int, int]] = []
    n = len(text)
    start = 0
    counter = 0
    while start < n:
        end = min(start + chunk_size, n)
        if end < n:
            boundary = _find_sentence_boundary(text, start, end)
            actual_end = boundary if boundary is not None else end
        else:
            actual_end = end
        if text[start:actual_end].strip():
            chunks.append((counter, start, actual_end))
            counter += 1
        if actual_end >= n:
            break
        start = max(start + 1, actual_end - overlap)
    return chunks


# ---------------------------------------------------------------------------
# M3: semantic chunking (behavioral transcription of
# text/semantic_chunking.rs:95-310 with the hash embedder standing in for
# the reference's EmbeddingGenerator — the reference's own tests use the
# same hash-based generator)


def split_sentences_semantic(text: str) -> list[str]:
    """Sentence tokenization per semantic_chunking.rs:126-163: line-wise,
    split inclusive on .!?, rebuild with single spaces, trim. (One
    normalization: sentences flushed at blank lines are trimmed here; the
    reference keeps a trailing space there.)"""
    import re

    sentences: list[str] = []
    cur = ""
    for line in text.splitlines():
        line = line.strip()
        if not line:
            if cur:
                sentences.append(cur.strip())
                cur = ""
            continue
        for part in re.split(r"(?<=[.!?])", line):
            part = part.strip()
            if not part:
                continue
            cur += part + " "
            if part.endswith((".", "!", "?")):
                sentences.append(cur.strip())
                cur = ""
    if cur.strip():
        sentences.append(cur.strip())
    return sentences


def _semantic_threshold(diffs, strategy: str, amount: float) -> float:
    import numpy as np

    d = np.asarray(diffs, dtype=np.float32)
    if strategy == "percentile":  # semantic_chunking.rs:240-249
        s = np.sort(d, kind="stable")
        idx = min(int(len(s) * (amount / 100.0)), len(s) - 1)
        return float(s[idx])
    if strategy == "stddev":  # semantic_chunking.rs:252-262
        mean = float(d.mean())
        std = float(np.sqrt(((d - mean) ** 2).mean()))
        return mean + amount * std
    return amount  # absolute


def chunk_text_semantic(
    text: str,
    embed_fn,
    strategy: str = "percentile",
    threshold_amount: float = 95.0,
    min_chunk_sentences: int = 1,
    max_chunk_sentences: int = 0,
    buffer_size: int = 1,
) -> list[tuple[int, int, int, str]]:
    """Semantic chunking: embedding-similarity breakpoints
    (semantic_chunking.rs:95-310). Returns (chunk_idx, start_sentence,
    end_sentence, content) — offsets are SENTENCE indices (the reference's
    SemanticChunk carries sentence spans, not char offsets); content is the
    single-space sentence join.

    Quirk preserved: a segment shorter than ``min_chunk_sentences`` does
    not emit AND does not advance the start index, so it merges into the
    following chunk (semantic_chunking.rs:265-276 ``continue``)."""
    import numpy as np

    sentences = split_sentences_semantic(text)
    if not sentences:
        return []
    if len(sentences) == 1:
        return [(0, 0, 1, text)]
    emb = np.stack([embed_fn(s) for s in sentences]).astype(np.float32)
    # cosine distance between sentence i and i+buffer (rs:179-192)
    a = emb[:-buffer_size] if buffer_size < len(emb) else emb[:0]
    b = emb[buffer_size:]
    dots = (a * b).sum(axis=1)
    na = np.sqrt((a * a).sum(axis=1))
    nb = np.sqrt((b * b).sum(axis=1))
    with np.errstate(divide="ignore", invalid="ignore"):
        sims = np.where((na > 0) & (nb > 0), dots / (na * nb), 0.0)
    diffs = 1.0 - sims
    breakpoints = []
    if len(diffs):
        thr = _semantic_threshold(diffs, strategy, threshold_amount)
        breakpoints = [i + 1 for i, d in enumerate(diffs) if d > thr]
    breakpoints.append(len(sentences))

    chunks: list[tuple[int, int, int, str]] = []
    start = 0
    counter = 0
    for end in breakpoints:
        if end <= start:
            continue
        count = end - start
        if count < min_chunk_sentences:
            continue  # merges into the next chunk (start not advanced)
        if max_chunk_sentences > 0 and count > max_chunk_sentences:
            sub = start
            while sub < end:
                sub_end = min(sub + max_chunk_sentences, end)
                chunks.append((counter, sub, sub_end,
                               " ".join(sentences[sub:sub_end])))
                counter += 1
                sub = sub_end
        else:
            chunks.append((counter, start, end, " ".join(sentences[start:end])))
            counter += 1
        start = end
    return chunks


def chunk_doc(text: str, strategy: str, chunk_size: int, overlap: int,
              min_chunk_size: int) -> list[tuple[int, int, int, str]]:
    """Strategy dispatch shared by the chunk stage and the fused
    chunk+extract stage: returns (idx, start, end, content). For the char-
    span strategies content is text[start:end]; for 'semantic' the spans
    are sentence indices."""
    if strategy == "semantic":
        from ..stages.embed import HashEmbedder

        emb = HashEmbedder(dim=64)
        return chunk_text_semantic(text, emb.embed_text)
    if strategy == "boundary_aware":
        from .boundaries import chunk_text_boundary_aware

        # content is sentence-joined, offsets synthetic (see boundaries.py)
        return chunk_text_boundary_aware(text, chunk_size, min_chunk_size)
    if strategy == "hierarchical":
        spans = chunk_text_hierarchical(text, chunk_size, overlap, min_chunk_size)
    else:
        spans = chunk_text(text, chunk_size, overlap)
    return [(i, s, e, text[s:e]) for (i, s, e) in spans]
