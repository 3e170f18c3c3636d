"""Semantic boundary detection + boundary-aware chunking (BAR-RAG).

Transcription of the reference's boundary machinery:

- ``detect_boundaries`` — text/boundary_detection.rs:129-378: sentence
  endings (``[.!?]+\\s+`` with abbreviation suppression and a running
  min-sentence-length gate), paragraph breaks (``\\n\\s*\\n``), headings
  (markdown ``#``, RST underlines, ALL-CAPS lines, configured plaintext
  markers), list start/end transitions, fenced + indented code blocks —
  then a stable sort by position with first-wins dedup (rs:156-159,
  Vec::dedup_by_key keeps the first of equal keys after the stable sort).
- ``chunk_text_boundary_aware`` — the reference's deterministic sync path
  (text/chunking_strategies.rs:540-588, the non-async
  BoundaryAwareChunkingStrategy::chunk): split on ``[.!?]``, trim, drop
  empties, greedily pack sentences until ``max_chunk_chars``. Offsets are
  the reference's synthetic cumulative offsets (separators dropped), not
  raw text offsets — preserved as-is. One deliberate deviation: chunk
  indices are per-document ordinals instead of the reference's global
  ``CHUNK_COUNTER`` atomic (a process-global counter cannot distribute;
  chunk ids stay ``{doc_id}_{idx}`` like every other strategy here).

The reference's async path (coherence-scored optimal splits over sentence
embeddings, semantic_coherence.rs) lives in ``chunk_text_boundary_scored``
below with the embedding provider injected (functions/coherence.py holds
the scorer transcription); its boundary-position fallback is exactly what
``detect_boundaries`` returns.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

SENTENCE_ENDINGS = re.compile(r"[.!?]+\s+")
MARKDOWN_HEADING = re.compile(r"^#{1,6}\s+.+$")
NUMBERED_LIST = re.compile(r"^\d+[.)]\s+")
BULLET_LIST = re.compile(r"^[\-\*\+]\s+")
CODE_BLOCK_FENCE = re.compile(r"^```")
RST_HEADING_UNDERLINE = re.compile(r'^[=\-~^"]+\s*$')
PARAGRAPH_BREAK = re.compile(r"\n\s*\n")

# boundary_detection.rs:165-171 — trailing dot stripped before the
# ends_with check (the regex match starts AT the dot)
ABBREVIATIONS = (
    "Dr.", "Mr.", "Mrs.", "Ms.", "Prof.", "Sr.", "Jr.", "etc.", "e.g.",
    "i.e.", "vs.", "cf.", "Jan.", "Feb.", "Mar.", "Apr.", "Jun.", "Jul.",
    "Aug.", "Sep.", "Oct.", "Nov.", "Dec.",
)
_ABBR_STEMS = tuple(a[:-1] for a in ABBREVIATIONS)

DEFAULT_HEADING_MARKERS = ("Chapter", "Section", "Introduction",
                           "Conclusion")


@dataclass
class Boundary:
    position: int
    boundary_type: str          # sentence|paragraph|heading|list|code_block
    confidence: float
    context: str | None = None


def _sentence_boundaries(text: str, min_sentence_length: int
                         ) -> list[Boundary]:
    out: list[Boundary] = []
    for mat in SENTENCE_ENDINGS.finditer(text):
        position = mat.start()
        if text[:position].endswith(_ABBR_STEMS):
            continue
        sentence_start = out[-1].position if out else 0
        if position - sentence_start >= min_sentence_length:
            out.append(Boundary(mat.end(), "sentence", 0.9))
    return out


def _paragraph_boundaries(text: str) -> list[Boundary]:
    return [Boundary(m.end(), "paragraph", 1.0)
            for m in PARAGRAPH_BREAK.finditer(text)]


def _heading_boundaries(text: str, markers) -> list[Boundary]:
    out: list[Boundary] = []
    lines = text.split("\n")
    pos = 0
    for i, line in enumerate(lines):
        t = line.strip()
        if MARKDOWN_HEADING.match(line):
            out.append(Boundary(pos, "heading", 0.95, t.lstrip("#").strip()))
        if i > 0 and RST_HEADING_UNDERLINE.match(t):
            prev = lines[i - 1].strip()
            if prev and len(t) >= len(prev):
                out.append(Boundary(pos, "heading", 0.9, prev))
        if (len(t) > 3
                and all(c.isupper() or c.isspace() or c.isdigit() for c in t)
                and any(c.isalpha() for c in t)):
            out.append(Boundary(pos, "heading", 0.7, t))
        for marker in markers:
            if t.startswith(marker):
                out.append(Boundary(pos, "heading", 0.85, t))
                break
        pos += len(line) + 1
    return out


def _list_boundaries(text: str) -> list[Boundary]:
    out: list[Boundary] = []
    pos = 0
    in_list = False
    for line in text.split("\n"):
        t = line.strip()
        is_item = bool(NUMBERED_LIST.match(t) or BULLET_LIST.match(t))
        if is_item and not in_list:
            out.append(Boundary(pos, "list", 0.9, "list_start"))
            in_list = True
        if not is_item and in_list and t:
            out.append(Boundary(pos, "list", 0.9, "list_end"))
            in_list = False
        pos += len(line) + 1
    return out


def _code_block_boundaries(text: str) -> list[Boundary]:
    out: list[Boundary] = []
    pos = 0
    in_code = False
    for line in text.split("\n"):
        t = line.strip()
        if CODE_BLOCK_FENCE.match(t):
            out.append(Boundary(pos, "code_block", 1.0,
                                "code_end" if in_code else "code_start"))
            in_code = not in_code
        if not in_code and line.startswith("    ") and t:
            out.append(Boundary(pos, "code_block", 0.7, "indented_code"))
        pos += len(line) + 1
    return out


def detect_boundaries(
    text: str,
    detect_sentences: bool = True,
    detect_paragraphs: bool = True,
    detect_headings: bool = True,
    detect_lists: bool = True,
    detect_code_blocks: bool = True,
    min_sentence_length: int = 10,
    heading_markers=DEFAULT_HEADING_MARKERS,
) -> list[Boundary]:
    """All semantic boundaries of ``text``, position-sorted, first-wins
    deduped per position (boundary_detection.rs:129-159)."""
    out: list[Boundary] = []
    if detect_sentences:
        out.extend(_sentence_boundaries(text, min_sentence_length))
    if detect_paragraphs:
        out.extend(_paragraph_boundaries(text))
    if detect_headings:
        out.extend(_heading_boundaries(text, heading_markers))
    if detect_lists:
        out.extend(_list_boundaries(text))
    if detect_code_blocks:
        out.extend(_code_block_boundaries(text))
    out.sort(key=lambda b: b.position)  # stable → insertion order on ties
    dedup: list[Boundary] = []
    for b in out:
        if not dedup or dedup[-1].position != b.position:
            dedup.append(b)
    return dedup


def split_positions(boundaries: list[Boundary]) -> list[int]:
    """Positions suitable for chunk splits — paragraph/heading/code only
    (chunking_strategies.rs:330-341)."""
    return [b.position for b in boundaries
            if b.boundary_type in ("paragraph", "heading", "code_block")]


def chunk_text_boundary_aware(text: str, max_chunk_chars: int = 2000,
                              min_chunk_chars: int = 200
                              ) -> list[tuple[int, int, int, str]]:
    """Deterministic boundary-aware chunking
    (chunking_strategies.rs:540-588): sentence-packed chunks capped at
    ``max_chunk_chars``; returns (idx, start, end, content) with the
    reference's cumulative synthetic offsets. ``min_chunk_chars`` is
    accepted for config parity; the reference's sync path ignores it."""
    sentences = [s.strip() for s in re.split(r"[.!?]", text) if s.strip()]
    chunks: list[tuple[int, int, int, str]] = []
    current = ""
    start_offset = 0
    for sentence in sentences:
        if current and len(current) + len(sentence) > max_chunk_chars:
            end = start_offset + len(current)
            chunks.append((len(chunks), start_offset, end, current))
            start_offset = end
            current = ""
        if current:
            current += " "
        current += sentence
    if current:
        chunks.append((len(chunks), start_offset,
                       start_offset + len(current), current))
    return chunks


def chunk_text_boundary_scored(text: str, embed_fn,
                               max_chunk_chars: int = 2000,
                               min_chunk_chars: int = 200,
                               ) -> list[tuple[int, int, int, str]]:
    """The reference's full boundary-aware path
    (chunking_strategies.rs:323-360 chunk_async): detect boundaries →
    keep paragraph/heading/code positions → coherence-scored greedy
    optimal split (semantic_coherence.rs) → (idx, start, end, content)
    char-span chunks. Oversized chunks are kept (the reference's size
    enforcement trims only via further boundary splits, which the greedy
    search already considered)."""
    from .coherence import CoherenceScorer

    boundaries = detect_boundaries(text)
    positions = split_positions(boundaries)
    scorer = CoherenceScorer(embed_fn)
    result = scorer.find_optimal_split(text, positions)
    return [(i, c["start_pos"], c["end_pos"], c["text"])
            for i, c in enumerate(result["chunks"])]
