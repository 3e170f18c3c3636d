"""Semantic coherence scoring + optimal-split search (BAR-RAG).

Transcription of text/semantic_coherence.rs:

- ``split_sentences_coherence`` — rs:378-420 char-walk splitter (terminal
  [.!?] followed by whitespace; fragments of <=3 chars are dropped except
  a final fragment flushed AT a terminal with no lookahead, which skips
  the length gate — quirk preserved).
- ``CoherenceScorer.calculate_coherence`` — rs:160-204: 0.7 × mean
  adjacent-sentence cosine + 0.3 × mean windowed-pair cosine (window 3),
  clamped to [0, 1]; single sentence scores 1.0.
- ``find_optimal_split`` — rs:214-307: greedy hill-climb over candidate
  boundary positions maximizing mean per-chunk coherence, stopping when no
  candidate improves or a split violates min_sentences_per_chunk (the
  violating split is popped and the loop ends, as the reference does).
- ``calculate_adaptive_threshold`` — rs:418-441.

The embedding provider is injected (``embed_fn``: text → 1-D numpy);
sentence embeddings are memoized per scorer so the greedy loop's repeated
chunk scoring embeds each sentence once.
"""

from __future__ import annotations

import numpy as np


def split_sentences_coherence(text: str) -> list[str]:
    """rs:378-420 — see module docstring for the final-fragment quirk."""
    sentences: list[str] = []
    current: list[str] = []
    n = len(text)
    for i, ch in enumerate(text):
        current.append(ch)
        if ch in ".!?":
            if i + 1 < n:
                if text[i + 1].isspace():
                    trimmed = "".join(current).strip()
                    if trimmed and len(trimmed) > 3:
                        sentences.append(trimmed)
                        current = []
            else:
                trimmed = "".join(current).strip()
                if trimmed:
                    sentences.append(trimmed)
                    current = []
    trimmed = "".join(current).strip()
    if trimmed and len(trimmed) > 3:
        sentences.append(trimmed)
    return sentences


def cosine_similarity(a: np.ndarray, b: np.ndarray) -> float:
    """rs:358-375 (zero-norm and length-mismatch guards included)."""
    if len(a) != len(b) or len(a) == 0:
        return 0.0
    na = float(np.sqrt((a * a).sum()))
    nb = float(np.sqrt((b * b).sum()))
    if na == 0.0 or nb == 0.0:
        return 0.0
    return float(np.clip(float((a * b).sum()) / (na * nb), -1.0, 1.0))


class CoherenceScorer:
    def __init__(self, embed_fn, *, min_coherence_threshold: float = 0.65,
                 max_sentences_per_chunk: int = 20,
                 min_sentences_per_chunk: int = 2,
                 coherence_window_size: int = 3,
                 adjacency_weight: float = 0.7,
                 adaptive_threshold: bool = True):
        self.embed_fn = embed_fn
        self.min_coherence_threshold = min_coherence_threshold
        self.max_sentences_per_chunk = max_sentences_per_chunk
        self.min_sentences_per_chunk = min_sentences_per_chunk
        self.coherence_window_size = coherence_window_size
        self.adjacency_weight = adjacency_weight
        self.adaptive_threshold = adaptive_threshold
        self._emb_cache: dict[str, np.ndarray] = {}

    def _embed(self, sentence: str) -> np.ndarray:
        v = self._emb_cache.get(sentence)
        if v is None:
            v = np.asarray(self.embed_fn(sentence), dtype=np.float32)
            self._emb_cache[sentence] = v
        return v

    def calculate_coherence(self, embeddings: list[np.ndarray]) -> float:
        """rs:160-204."""
        m = len(embeddings)
        if m < 2:
            return 1.0
        adjacent = [cosine_similarity(embeddings[i], embeddings[i + 1])
                    for i in range(m - 1)]
        adjacent_avg = sum(adjacent) / len(adjacent)
        w = self.coherence_window_size
        if w > 1:
            window_sims: list[float] = []
            for i in range(m):
                lo = max(0, i - w // 2)
                hi = min(m, i + w // 2 + 1)
                for j in range(lo, hi):
                    if i != j:
                        window_sims.append(
                            cosine_similarity(embeddings[i], embeddings[j]))
            window_avg = (sum(window_sims) / len(window_sims)
                          if window_sims else adjacent_avg)
        else:
            window_avg = adjacent_avg
        coherence = (self.adjacency_weight * adjacent_avg
                     + (1.0 - self.adjacency_weight) * window_avg)
        return float(np.clip(coherence, 0.0, 1.0))

    def score_chunk_coherence(self, text: str) -> float:
        """rs:118-152 (single sentence == 1.0; capped sentence count)."""
        sentences = split_sentences_coherence(text)
        if len(sentences) < 2:
            return 1.0
        sentences = sentences[: self.max_sentences_per_chunk]
        return self.calculate_coherence([self._embed(s) for s in sentences])

    def _chunks_for(self, text: str, splits: list[int]) -> list[dict]:
        """rs:310-335."""
        bounds = [0] + list(splits) + [len(text)]
        out = []
        for i in range(len(bounds) - 1):
            chunk = text[bounds[i]: bounds[i + 1]]
            score = self.score_chunk_coherence(chunk)
            out.append({
                "text": chunk,
                "start_pos": bounds[i],
                "end_pos": bounds[i + 1],
                "coherence_score": score,
                "sentence_count": len(split_sentences_coherence(chunk)),
                "avg_similarity": score,
            })
        return out

    def _validate_splits(self, text: str, splits: list[int]) -> bool:
        """rs:338-356."""
        bounds = [0] + list(splits) + [len(text)]
        for i in range(len(bounds) - 1):
            chunk = text[bounds[i]: bounds[i + 1]]
            if (len(split_sentences_coherence(chunk))
                    < self.min_sentences_per_chunk):
                return False
        return True

    def find_optimal_split(self, text: str,
                           candidate_boundaries: list[int]) -> dict:
        """rs:214-307 greedy hill-climb; returns {split_positions, chunks,
        overall_coherence, optimization_iterations}."""
        if not candidate_boundaries:
            score = self.score_chunk_coherence(text)
            return {
                "split_positions": [],
                "chunks": [{
                    "text": text, "start_pos": 0, "end_pos": len(text),
                    "coherence_score": score,
                    "sentence_count": len(split_sentences_coherence(text)),
                    "avg_similarity": score,
                }],
                "overall_coherence": score,
                "optimization_iterations": 1,
            }
        splits: list[int] = []
        iterations = 0
        while iterations <= 100:
            iterations += 1
            if iterations > 100:
                break
            current = self._chunks_for(text, splits)
            best_score = (sum(c["coherence_score"] for c in current)
                          / len(current))
            best_new = None
            for boundary in candidate_boundaries:
                if boundary in splits:
                    continue
                trial = sorted(splits + [boundary])
                chunks = self._chunks_for(text, trial)
                score = (sum(c["coherence_score"] for c in chunks)
                         / len(chunks))
                if score > best_score:
                    best_score = score
                    best_new = boundary
            if best_new is None:
                break
            splits.append(best_new)
            splits.sort()
            if not self._validate_splits(text, splits):
                splits.pop()
                break
        final = self._chunks_for(text, splits)
        return {
            "split_positions": splits,
            "chunks": final,
            "overall_coherence": (sum(c["coherence_score"] for c in final)
                                  / len(final)),
            "optimization_iterations": iterations,
        }

    def calculate_adaptive_threshold(self, text: str) -> float:
        """rs:418-441."""
        if not self.adaptive_threshold:
            return self.min_coherence_threshold
        n = len(split_sentences_coherence(text))
        length_factor = min(n / 50.0, 1.0)
        return float(np.clip(
            self.min_coherence_threshold - length_factor * 0.05, 0.5, 0.9))
