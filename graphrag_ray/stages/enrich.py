"""Chunk enrichment (M4): TF-IDF keywords, extractive summary, chapter
detection.

Reference semantics: text/keyword_extraction.rs:37-140 (tokenize → TF =
count/total → IDF = ln(N/df) clipped ≥ 0, default df 1 → top-k),
text/extractive_summarizer.rs:100-160 (weighted position/length/word-freq/
proper-noun/numeric sentence scoring), text/chunk_enricher.rs:92-100
(heading path → chapter).

Ray-Data shape: corpus document frequencies are the G10 aggregate (flat_map
tokens → groupby count) broadcast into a stateful enricher actor pool —
the classic small-side broadcast, computed once, read once per actor.
"""

from __future__ import annotations

import math
import re

import pyarrow as pa

import ray
from ray.data.aggregate import Sum

# text/keyword_extraction.rs:118-137
STOPWORDS = frozenset(
    """the be to of and a in that have i it for not on with he as you do at
    this but his by from they we say her she or an will my one all would
    there their what so up out if about who get which go me when make can
    like time no just him know take people into year your good some could
    them see other than then now look only come its over think also back
    after use two how our work first well way even new want because any
    these give day most us is was are been has had were said did""".split()
)

_CHAPTER_RE = re.compile(r"(?m)^\s*(#+\s+.+|Chapter\s+\S+.*|CHAPTER\s+\S+.*)\s*$")


def tokenize_keywords(text: str) -> list[str]:
    """keyword_extraction.rs:67-85."""
    out = []
    for word in text.split():
        w = "".join(c for c in word if c.isalnum() or c in "-_").lower()
        if w and len(w) > 2 and w not in STOPWORDS and not w.isdigit():
            out.append(w)
    return out


def document_frequencies(docs_or_chunks, text_column: str = "content"):
    """Corpus DF table (G10): per-batch partial counts → groupby sum."""

    def partial(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for t in batch.column(text_column).to_pylist():
            for w in set(tokenize_keywords(t or "")):
                counts[w] = counts.get(w, 0) + 1
        return pa.Table.from_pydict(
            {
                "term": pa.array(list(counts.keys()), pa.string()),
                "df": pa.array(list(counts.values()), pa.int64()),
            }
        )

    return (
        docs_or_chunks.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
    )


def extract_keywords(text: str, df: dict[str, int], total_docs: int,
                     top_k: int = 5) -> list[str]:
    """TF-IDF top-k (keyword_extraction.rs:37-116); ties broken by term."""
    tokens = tokenize_keywords(text)
    if not tokens:
        return []
    counts: dict[str, int] = {}
    for t in tokens:
        counts[t] = counts.get(t, 0) + 1
    total = len(tokens)
    scored = []
    for term, cnt in counts.items():
        idf = max(0.0, math.log(total_docs / df.get(term, 1)))
        scored.append((cnt / total * idf, term))
    scored.sort(key=lambda x: (-x[0], x[1]))
    return [t for _s, t in scored[:top_k]]


_SENT_SPLIT_RE = re.compile(r"(?<=[.!?])\s+")


def extractive_summary(text: str, max_sentences: int = 2) -> str:
    """Weighted sentence scoring (extractive_summarizer.rs:100-160);
    selected sentences keep original order."""
    sentences = [s for s in _SENT_SPLIT_RE.split(text.strip()) if s.strip()]
    if len(sentences) <= max_sentences:
        return " ".join(sentences)
    all_words = [w.lower().strip(".,!?;:") for s in sentences for w in s.split()]
    freq: dict[str, int] = {}
    for w in all_words:
        if w and w not in STOPWORDS:
            freq[w] = freq.get(w, 0) + 1
    scores = []
    n = len(sentences)
    for i, s in enumerate(sentences):
        if i == 0:
            pos = 2.0
        elif i == n - 1:
            pos = 1.5
        else:
            pos = 1.0 - (i / n) * 0.5
        words = s.split()
        wc = len(words)
        if wc < 5:
            length = 0.3
        elif wc > 40:
            length = 0.5
        elif 10 <= wc <= 25:
            length = 1.0
        else:
            length = 0.7
        content = [w.lower().strip(".,!?;:") for w in words]
        wf = sum(freq.get(w, 0) for w in content if w not in STOPWORDS)
        wf_norm = min(1.0, wf / max(1, len(content)) / 3.0)
        proper = sum(1 for w in words if w[:1].isupper()) / max(1, wc)
        numeric = 1.0 if any(any(c.isdigit() for c in w) for w in words) else 0.0
        score = pos * 0.3 + length * 0.2 + wf_norm * 0.3 + proper * 0.1 + numeric * 0.1
        scores.append((score, i, s))
    top = sorted(scores, key=lambda x: (-x[0], x[1]))[:max_sentences]
    top.sort(key=lambda x: x[1])
    return " ".join(s for _sc, _i, s in top)


def detect_chapter(text: str) -> str | None:
    """First markdown heading / 'Chapter N' line (chunk_enricher.rs:92-100)."""
    m = _CHAPTER_RE.search(text)
    return m.group(1).strip() if m else None


class ChunkEnricher:
    """Actor-pool stage: chunks → chunk_id, keywords, summary, chapter.
    The corpus DF dict is broadcast and read once per actor."""

    def __init__(self, df_ref, total_docs: int, top_k: int = 5,
                 max_sentences: int = 2, algorithm: str = "tfidf"):
        self.df: dict[str, int] = ray.get(df_ref)
        self.total_docs = max(1, total_docs)
        self.top_k = top_k
        self.max_sentences = max_sentences
        self.algorithm = algorithm  # 'tfidf' | 'yake' (config/mod.rs:409-425)

    def __call__(self, batch: pa.Table) -> pa.Table:
        contents = batch.column("content").to_pylist()
        if self.algorithm == "yake":
            keywords = [yake_keywords(t, self.top_k) for t in contents]
        else:
            keywords = [extract_keywords(t, self.df, self.total_docs, self.top_k)
                        for t in contents]
        summaries = [extractive_summary(t, self.max_sentences) for t in contents]
        chapters = [detect_chapter(t) for t in contents]
        return pa.Table.from_pydict(
            {
                "chunk_id": batch.column("chunk_id"),
                "keywords": pa.array(keywords, pa.list_(pa.string())),
                "summary": pa.array(summaries, pa.string()),
                "chapter": pa.array(chapters, pa.string()),
            }
        )


def enrich_chunks(chunks_ds, total_docs: int, top_k: int = 5,
                  max_sentences: int = 2, algorithm: str = "tfidf",
                  min_broadcast_df: int = 2,
                  max_broadcast_terms: int | None = None):
    """M4 pipeline: DF aggregate → broadcast → enrich actor pool.
    ``algorithm='yake'`` swaps the TF-IDF keywords for single-document
    YAKE (no corpus DF needed in the scoring, the broadcast still carries
    it for the summary/tfidf path).

    Open-vocabulary cap (VERDICT r02 #7): the enricher resolves missing
    terms as df=1 (``df.get(term, 1)``), so dropping the df==1 hapax tail
    from the broadcast — the unbounded payload of web-scale text, often
    half the vocabulary — is LOSSLESS; the filter runs inside the Dataset
    before anything reaches the driver. ``max_broadcast_terms`` adds a
    lossy guard for adversarial vocabularies: beyond M terms keep the
    top-M by df; a dropped term's idf is then overestimated by ln(its
    true df), which can only promote rarer terms within the chunk's own
    top-k — bounded, documented drift."""
    import pyarrow.compute as _pc

    df_ds = document_frequencies(chunks_ds)
    if min_broadcast_df > 1:
        df_ds = df_ds.map_batches(
            lambda t: t.filter(
                _pc.greater_equal(t.column("df"), min_broadcast_df)),
            batch_format="pyarrow",
        )
    import pandas as pd

    df_tbl = df_ds.to_pandas()
    if len(df_tbl) == 0:
        # all terms were hapaxes (tiny corpus): Ray drops the schema on an
        # all-empty dataset, and the enricher's df.get(term, 1) default is
        # exactly right for every term — broadcast an empty map.
        df_tbl = pd.DataFrame({"term": [], "df": []})
    if max_broadcast_terms is not None and len(df_tbl) > max_broadcast_terms:
        df_tbl = df_tbl.nlargest(max_broadcast_terms, "df")
    df_dict = dict(zip(df_tbl["term"], df_tbl["df"].astype(int)))
    ref = ray.put(df_dict)
    return chunks_ds.map_batches(
        ChunkEnricher,
        fn_constructor_kwargs={"df_ref": ref, "total_docs": total_docs,
                               "top_k": top_k, "max_sentences": max_sentences,
                               "algorithm": algorithm},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


# ---------------------------------------------------------------------------
# YAKE keyword variant. The reference CONFIG lists "yake" among its keyword
# algorithms (config/mod.rs:409-425, 525-528) but ships only TF-IDF; this
# implements single-term YAKE per the published method (Campos et al. 2020,
# "YAKE! Keyword extraction from single documents using multiple local
# features") — casing, position, frequency, relatedness-to-context and
# sentence-dispersion features; LOWER score = better keyword.


def yake_keywords(text: str, top_k: int = 5, window: int = 2) -> list[str]:
    import math
    import re as _re

    sentences = [s for s in _re.split(r"(?<=[.!?])\s+", text or "") if s.strip()]
    raw_tokens: list[list[str]] = [
        [w for w in _re.findall(r"[A-Za-z][A-Za-z0-9_']*", s)] for s in sentences
    ]
    # per-term stats over the whole document
    tf: dict[str, int] = {}
    tf_upper: dict[str, int] = {}
    tf_proper: dict[str, int] = {}
    sent_ids: dict[str, set] = {}
    positions: dict[str, list[int]] = {}
    left: dict[str, set] = {}
    right: dict[str, set] = {}
    pos = 0
    for si, toks in enumerate(raw_tokens):
        for i, w in enumerate(toks):
            lw = w.lower()
            tf[lw] = tf.get(lw, 0) + 1
            if w.isupper() and len(w) > 1:
                tf_upper[lw] = tf_upper.get(lw, 0) + 1
            elif w[0].isupper() and i != 0:
                tf_proper[lw] = tf_proper.get(lw, 0) + 1
            sent_ids.setdefault(lw, set()).add(si)
            positions.setdefault(lw, []).append(pos)
            for j in range(max(0, i - window), i):
                left.setdefault(lw, set()).add(toks[j].lower())
            for j in range(i + 1, min(len(toks), i + 1 + window)):
                right.setdefault(lw, set()).add(toks[j].lower())
            pos += 1
    terms = [t for t in tf
             if t not in STOPWORDS and len(t) > 2 and not t.isdigit()]
    if not terms:
        return []
    tfs = [tf[t] for t in terms]
    mean_tf = sum(tfs) / len(tfs)
    std_tf = (sum((x - mean_tf) ** 2 for x in tfs) / len(tfs)) ** 0.5
    max_tf = max(tf.values())
    n_sent = max(1, len(sentences))
    scored = []
    for t in terms:
        f = tf[t]
        w_case = max(tf_upper.get(t, 0), tf_proper.get(t, 0)) / (1.0 + math.log(f))
        med_pos = sorted(positions[t])[len(positions[t]) // 2]
        w_pos = math.log(math.log(3.0 + med_pos))
        w_freq = f / (mean_tf + std_tf + 1e-9)
        dl = len(left.get(t, ())) / f
        dr = len(right.get(t, ())) / f
        w_rel = 1.0 + (dl + dr) * f / max_tf
        w_dif = len(sent_ids[t]) / n_sent
        score = (w_rel * w_pos) / (w_case + w_freq / w_rel + w_dif / w_rel + 1e-9)
        scored.append((score, t))
    scored.sort(key=lambda st: (st[0], st[1]))
    return [t for _s, t in scored[:top_k]]


# ---------------------------------------------------------------------------
# Contextual chunk enrichment (Anthropic contextual-retrieval pattern;
# text/contextual_enricher.rs)


def estimate_tokens(text: str) -> int:
    """contextual_enricher.rs:125-127 — chars/4."""
    return len(text) // 4


def calculate_num_ctx(document_text: str, chunk_texts, *,
                      max_output_tokens: int = 150,
                      safety_margin: float = 0.05) -> int:
    """contextual_enricher.rs:141-160: 100 instruction tokens + document
    (the KV-cached static prefix) + largest chunk + output budget + 5%
    margin, rounded up to 1024, clamped to [4096, 131072]."""
    base = (100 + estimate_tokens(document_text)
            + max((estimate_tokens(c) for c in chunk_texts), default=0)
            + max_output_tokens)
    with_margin = int(base * (1.0 + safety_margin))
    rounded = ((with_margin + 1023) // 1024) * 1024
    return max(4096, min(131_072, rounded))


def build_context_prompt(document_text: str, chunk_text: str) -> str:
    """contextual_enricher.rs:167-179 — KV-cache-friendly structure: the
    full document is the STATIC prefix (evaluated once per document with
    keep_alive), the chunk the dynamic suffix."""
    return (
        f"<document>\n{document_text}\n</document>\n\n"
        "Here is the chunk we want to situate within the whole document:\n"
        f"<chunk>\n{chunk_text}\n</chunk>\n\n"
        "Please give a short succinct context to situate this chunk within "
        "the overall document for the purposes of improving search retrieval "
        "of the chunk. Answer only with the succinct context and nothing else."
    )


class MockContextLLM:
    """Deterministic stand-in for the Ollama client in the contextual
    enricher: answers with the document's first sentence (a legitimate
    'situating context' that the SQL oracle can re-derive). Parses the
    document back out of the prompt the same way the gleaning MockLLM
    does."""

    def complete(self, prompt: str) -> str:
        doc = prompt.split("<document>\n", 1)[-1].split("\n</document>", 1)[0]
        end = doc.find(". ")
        return doc[: end + 2] if end != -1 else doc


class ContextualEnricher:
    """Actor-pool stage: spans-document batches → contextually enriched
    chunk rows ('{context}\\n\\n{chunk}', contextual_enricher.rs:200-204).

    The reference groups chunks by source document so Ollama's KV cache
    evaluates the document prefix ONCE per doc (keep_alive pinned); the
    Ray-native equivalent fuses chunking + enrichment per document inside
    one actor — the per-actor ``llm`` client is the KV-cache seam, and the
    document prompt prefix is built once per doc per batch. num_ctx is
    computed per document exactly as the reference does and carried on
    every row (it is what a real Ollama backend would pass)."""

    def __init__(self, llm=None, chunk_size: int = 256, overlap: int = 50,
                 max_output_tokens: int = 150, safety_margin: float = 0.05,
                 context_separator: str = "\n\n"):
        self.llm = llm if llm is not None else MockContextLLM()
        self.chunk_size = chunk_size
        self.overlap = overlap
        self.max_output_tokens = max_output_tokens
        self.safety_margin = safety_margin
        self.context_separator = context_separator

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.chunking import chunk_text
        from .chunk import texts_from_spans

        out = {"chunk_id": [], "doc_id": [], "num_ctx": [],
               "enriched_content": []}
        doc_ids = batch.column("doc_id").to_pylist()
        texts = texts_from_spans(batch.column("spans"))
        for doc_id, text in zip(doc_ids, texts):
            spans = chunk_text(text, self.chunk_size, self.overlap)
            contents = [text[s:e] for (_i, s, e) in spans]
            num_ctx = calculate_num_ctx(
                text, contents, max_output_tokens=self.max_output_tokens,
                safety_margin=self.safety_margin)
            for (i, _s, _e), content in zip(spans, contents):
                context = self.llm.complete(
                    build_context_prompt(text, content)).strip()
                out["chunk_id"].append(f"{doc_id}_{i}")
                out["doc_id"].append(doc_id)
                out["num_ctx"].append(num_ctx)
                out["enriched_content"].append(
                    f"{context}{self.context_separator}{content}")
        return pa.Table.from_pydict(
            {
                "chunk_id": pa.array(out["chunk_id"], pa.string()),
                "doc_id": pa.array(out["doc_id"], pa.string()),
                "num_ctx": pa.array(out["num_ctx"], pa.int64()),
                "enriched_content": pa.array(out["enriched_content"],
                                             pa.string()),
            }
        )
