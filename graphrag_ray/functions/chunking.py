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

    last_boundary = None
    for i, ch in enumerate(search):
        if ch in _SENTENCE_ENDINGS:
            next_pos = i + 1
            # boundary counts when followed by whitespace *within the window*
            # or when the punctuation ends the window
            if next_pos >= len(search) or search[next_pos].isspace():
                last_boundary = start + search_start + next_pos
    if last_boundary is not None:
        return last_boundary
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
