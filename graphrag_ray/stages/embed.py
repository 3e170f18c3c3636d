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


class LateChunkEmbedder:
    """Late chunking (M3 sibling): context-preserving chunk embeddings
    (reference text/late_chunking.rs:1-120 — Jina-style 'embed the whole
    document, pool per-chunk spans').

    The real path encodes the full document with a long-context model and
    mean-pools each chunk's token span. No model runs in this sandbox, so
    the POOLING CONTRACT is implemented over the deterministic hash
    embedder: per-chunk vector = normalize((1-alpha)·chunk_mean +
    alpha·document_mean), i.e. every chunk's embedding 'sees' the whole
    document — the property late chunking exists for — while staying
    deterministic and testable. Swap ``embed_doc_tokens`` for a real
    encoder to get true span pooling (seam marked below).

    Expects chunk rows grouped per doc is NOT required: each actor caches
    the last document embedding keyed by doc_id, so sorted-by-doc input
    (the chunk stage's natural order) hits the cache; unsorted input is
    correct, just slower.
    """

    def __init__(self, dim: int = 384, alpha: float = 0.3,
                 text_column: str = "content", id_column: str = "chunk_id",
                 doc_column: str = "doc_id", doc_text_column: str | None = None):
        self.inner = HashEmbedder(dim=dim)
        self.dim = dim
        self.alpha = np.float32(alpha)
        self.text_column = text_column
        self.id_column = id_column
        self.doc_column = doc_column
        self.doc_text_column = doc_text_column
        self._doc_cache: tuple[str, np.ndarray] | None = None

    # --- seam: replace with a real long-context encoder + span pooling
    def _doc_vector(self, doc_id: str, doc_text: str) -> np.ndarray:
        if self._doc_cache is not None and self._doc_cache[0] == doc_id:
            return self._doc_cache[1]
        v = self.inner.embed_text(doc_text)
        self._doc_cache = (doc_id, v)
        return v

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        doc_ids = batch.column(self.doc_column).to_pylist()
        if self.doc_text_column and self.doc_text_column in batch.column_names:
            doc_texts = batch.column(self.doc_text_column).to_pylist()
        else:
            # without the full doc text column, approximate the document
            # context as the concatenation of this batch's chunks per doc
            per_doc: dict[str, list[str]] = {}
            for d, t in zip(doc_ids, texts):
                per_doc.setdefault(d, []).append(t or "")
            joined = {d: " ".join(ts) for d, ts in per_doc.items()}
            doc_texts = [joined[d] for d in doc_ids]
        out = []
        for doc_id, text, doc_text in zip(doc_ids, texts, doc_texts):
            cv = self.inner.embed_text(text)
            dv = self._doc_vector(doc_id, doc_text)
            v = (np.float32(1.0) - self.alpha) * cv + self.alpha * dv
            n = np.linalg.norm(v)
            if n > 0:
                v = v / n
            out.append(v.astype(np.float32).tolist())
        return pa.Table.from_pydict(
            {
                "id": batch.column(self.id_column),
                "doc_id": batch.column(self.doc_column),
                "vector": pa.array(out, pa.list_(pa.float32())),
            }
        )
