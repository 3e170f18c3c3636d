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
