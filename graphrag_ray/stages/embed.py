"""Hash-based deterministic embeddings (M11) as an actor-pool stage.

Reference: vector/mod.rs:573-660 — per-word hash vectors, mean-pooled,
L2-normalized, with a word-vector cache. The Rust DefaultHasher is not
reproducible across languages, so the word-vector derivation is re-specced
(SURVEY.md §2.2 M11 note) as md5(word)-seeded uniform[-1,1) draws — same
shape and properties (deterministic, unit-norm word vectors), not
bit-identical to the reference.

Actor-pool shape: the word-vector cache is per-actor state built lazily in
``__call__``s after a one-time ``__init__`` — the canonical stateful-stage
pattern (map_batches(Cls, concurrency=N)).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


class HashEmbedder:
    def __init__(self, dim: int = 384, text_column: str = "content",
                 id_column: str = "chunk_id"):
        self.dim = dim
        self.text_column = text_column
        self.id_column = id_column
        self.word_vectors: dict[str, np.ndarray] = {}  # per-actor cache

    def _word_vector(self, word: str) -> np.ndarray:
        v = self.word_vectors.get(word)
        if v is None:
            seed = int.from_bytes(hashlib.md5(word.encode()).digest()[:4], "big")
            rng = np.random.RandomState(seed)
            v = rng.uniform(-1.0, 1.0, self.dim).astype(np.float32)
            n = np.linalg.norm(v)
            if n > 0:
                v /= n
            self.word_vectors[word] = v
        return v

    def embed_text(self, text: str) -> np.ndarray:
        words = (text or "").split()
        if not words:
            return np.zeros(self.dim, dtype=np.float32)
        acc = np.zeros(self.dim, dtype=np.float32)
        for w in words:
            acc += self._word_vector(w.lower())
        acc /= np.float32(len(words))
        n = np.linalg.norm(acc)
        if n > 0:
            acc /= n
        return acc

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        vecs = [self.embed_text(t).tolist() for t in texts]
        return pa.Table.from_pydict(
            {
                "id": batch.column(self.id_column),
                "vector": pa.array(vecs, pa.list_(pa.float32())),
            }
        )
