"""Text-analysis operators over flat document tables (training-data ops).

These extend the engine beyond the reference's own operator set with the
stages a large-scale training-data pipeline needs (driver instruction):
token counting, quality metrics, language-ID, document fingerprinting.
Each is a stateless vectorized ``map_batches`` UDF over Arrow batches and
has an exact DuckDB SQL oracle in ``__ray_entry__.oracle_sql``.

Design for oracle hash-compare: outputs are integers or md5 strings
wherever possible (no float rounding hazards); the one ratio-free contract
is documented per function.
"""

from __future__ import annotations

import hashlib
import math
import re

import pyarrow as pa
import pyarrow.compute as pc

# fixed stopword list (shared with the SQL oracle)
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "on", "at")

# language function-word profiles for the n-gram/stopword language-ID
# heuristic; priority order breaks ties deterministically (matches the SQL
# CASE chain in the oracle).
LANG_PROFILES = (
    ("en", ("the", "a", "and", "of", "to")),
    ("de", ("der", "die", "das", "und", "zu")),
    ("es", ("el", "la", "de", "los", "y")),
    ("fr", ("le", "la", "de", "et", "les")),
    ("zh", ("de", "shi", "bu", "le", "zai")),
)


def sql_round(x: float, digits: int = 4) -> float:
    """DuckDB-compatible rounding (half away from zero) for non-negative x."""
    scale = 10 ** digits
    return math.floor(x * scale + 0.5) / scale


def token_stats(batch: pa.Table) -> pa.Table:
    """Per-doc token statistics: doc_id, n_chars, n_tokens, n_uniq_tokens,
    sum_token_len. Token = maximal non-whitespace run."""
    texts = batch.column("text").to_pylist()
    n_tokens, n_uniq, sum_len = [], [], []
    for t in texts:
        toks = (t or "").split()
        n_tokens.append(len(toks))
        n_uniq.append(len(set(toks)))
        sum_len.append(sum(len(w) for w in toks))
    return pa.Table.from_pydict(
        {
            "doc_id": batch.column("doc_id"),
            "n_chars": pc.cast(pc.utf8_length(batch.column("text")), pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "n_uniq_tokens": pa.array(n_uniq, pa.int64()),
            "sum_token_len": pa.array(sum_len, pa.int64()),
        }
    )


def quality_stats(batch: pa.Table) -> pa.Table:
    """Quality-scoring counts: doc_id, n_tokens, n_stop_tokens,
    n_uniq_tokens (integer contract; ratios are downstream arithmetic)."""
    texts = batch.column("text").to_pylist()
    stop = set(STOPWORDS)
    n_tokens, n_stop, n_uniq = [], [], []
    for t in texts:
        toks = (t or "").split()
        n_tokens.append(len(toks))
        n_stop.append(sum(1 for w in toks if w in stop))
        n_uniq.append(len(set(toks)))
    return pa.Table.from_pydict(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "n_stop_tokens": pa.array(n_stop, pa.int64()),
            "n_uniq_tokens": pa.array(n_uniq, pa.int64()),
        }
    )


def lang_id(batch: pa.Table) -> pa.Table:
    """Stopword-profile language ID: doc_id, pred_lang (+ per-profile hit
    counts). Ties resolved by profile priority order."""
    texts = batch.column("text").to_pylist()
    preds = []
    counts: dict[str, list[int]] = {lang: [] for lang, _ in LANG_PROFILES}
    for t in texts:
        toks = (t or "").split()
        best_lang, best_count = LANG_PROFILES[0][0], -1
        for lang, words in LANG_PROFILES:
            c = sum(1 for w in toks if w in words)
            counts[lang].append(c)
            if c > best_count:
                best_lang, best_count = lang, c
        preds.append(best_lang)
    cols = {"doc_id": batch.column("doc_id"), "pred_lang": pa.array(preds, pa.string())}
    for lang, _ in LANG_PROFILES:
        cols[f"hits_{lang}"] = pa.array(counts[lang], pa.int64())
    return pa.Table.from_pydict(cols)


def fingerprint(batch: pa.Table) -> pa.Table:
    """Document fingerprint: md5 of the raw text (exact-dedup key) plus a
    64-bit rolling-hash style content id derived from it."""
    texts = batch.column("text").to_pylist()
    fps = [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
    return pa.Table.from_pydict(
        {
            "doc_id": batch.column("doc_id"),
            "fp": pa.array(fps, pa.string()),
        }
    )


def make_term_stats_fn(terms: tuple[str, ...]):
    """Per-batch partial for corpus term statistics (mention finder M12 +
    TF-IDF document-frequency G10 as a combiner): for each term, total
    non-overlapping occurrences and docs containing it within the batch."""

    def term_stats(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        occ = {t: 0 for t in terms}
        df = {t: 0 for t in terms}
        for text in texts:
            text = text or ""
            for term in terms:
                c = text.count(term)  # non-overlapping, like replace-count
                if c:
                    occ[term] += c
                    df[term] += 1
        return pa.Table.from_pydict(
            {
                "term": pa.array(list(terms), pa.string()),
                "n_occurrences": pa.array([occ[t] for t in terms], pa.int64()),
                "doc_freq": pa.array([df[t] for t in terms], pa.int64()),
            }
        )

    return term_stats


def make_cooccur_fn(terms: tuple[str, ...]):
    """Per-batch partial for doc-level term co-occurrence (G8 analogue over
    the flat corpus): counts of docs containing both terms of each pair.
    Pairs are oriented alphabetically (term_a < term_b) to match the SQL
    oracle's a.term < b.term join condition."""
    pairs = sorted(
        {tuple(sorted((a, b))) for i, a in enumerate(terms) for b in terms[i + 1:]}
    )

    def cooccur(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        counts = {p: 0 for p in pairs}
        for text in texts:
            text = text or ""
            present = [t for t in terms if t in text]
            ps = set(present)
            for a, b in pairs:
                if a in ps and b in ps:
                    counts[(a, b)] += 1
        return pa.Table.from_pydict(
            {
                "term_a": pa.array([a for a, _ in pairs], pa.string()),
                "term_b": pa.array([b for _, b in pairs], pa.string()),
                "n_docs": pa.array([counts[p] for p in pairs], pa.int64()),
            }
        )

    return cooccur


def tokenize_partial(batch: pa.Table) -> pa.Table:
    """Per-batch partial term counts for the global top-terms aggregation
    (T4 analogue): term → count within batch."""
    texts = batch.column("text").to_pylist()
    counts: dict[str, int] = {}
    for t in texts:
        for w in (t or "").split():
            counts[w] = counts.get(w, 0) + 1
    return pa.Table.from_pydict(
        {
            "term": pa.array(list(counts.keys()), pa.string()),
            "cnt": pa.array(list(counts.values()), pa.int64()),
        }
    )


def length_count_rows(batch: pa.Table) -> pa.Table:
    """Per-batch value-count combiner for discrete length quantiles:
    (n_chars, n) partial rows — the exchange carries distinct lengths,
    never documents."""
    import collections

    counts = collections.Counter(
        pc.utf8_length(batch.column("text")).to_pylist())
    ks = sorted(counts)
    return pa.Table.from_pydict({
        "n_chars": pa.array(ks, pa.int64()),
        "n": pa.array([counts[k] for k in ks], pa.int64()),
    })


def quantiles_from_counts(counts_tbl: pa.Table,
                          qpcts: tuple[int, ...]) -> pa.Table:
    """Exact discrete quantiles from a (value, count) table. Contract:
    nearest-rank with k = ceil(n * q) computed in INTEGER arithmetic from
    percent points (k = (n*qpct + 99) // 100) — immune to the float-
    product tie ambiguity that makes quantile_disc's .5 cases
    implementation-defined; the SQL twin uses the same integer rank."""
    import numpy as np

    vals = counts_tbl.column("n_chars").to_numpy(zero_copy_only=False)
    ns = counts_tbl.column("n").to_numpy(zero_copy_only=False)
    order = np.argsort(vals, kind="stable")
    vals, ns = vals[order], ns[order]
    cum = np.cumsum(ns)
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for qpct in qpcts:
        k = (n * qpct + 99) // 100
        idx = int(np.searchsorted(cum, k, side="left"))
        out_q.append(qpct / 100.0)
        out_v.append(int(vals[idx]))
    return pa.Table.from_pydict({
        "q": pa.array(out_q, pa.float64()),
        "value": pa.array(out_v, pa.int64()),
    })


# GPT-2-style pre-tokenizer classes, RE2-compatible (no lookahead — the
# same pattern strings run verbatim in DuckDB's regexp_extract_all).
BPE_ALPHA = r" ?[A-Za-z]+"
BPE_NUM = r" ?[0-9]+"
BPE_OTHER = r" ?[^ \tA-Za-z0-9]+"


def bpe_token_counts(batch: pa.Table) -> pa.Table:
    """BPE-ish token counting (driver-brief op): per doc, counts of
    GPT-2-pre-tokenizer-style alpha / numeric / other runs (optional
    leading space attached, as BPE vocabularies do). Contract: the three
    class patterns are counted INDEPENDENTLY over the raw text — exactly
    what the SQL twin's regexp_extract_all does."""
    import re

    import numpy as np

    pats = [re.compile(p) for p in (BPE_ALPHA, BPE_NUM, BPE_OTHER)]
    texts = batch.column("text").to_pylist()
    counts = [[], [], []]
    for t in texts:
        t = t or ""
        for i, p in enumerate(pats):
            counts[i].append(len(p.findall(t)))
    alpha, num, other = (np.asarray(c, dtype=np.int64) for c in counts)
    return pa.Table.from_pydict({
        "doc_id": batch.column("doc_id"),
        "n_alpha_tokens": pa.array(alpha),
        "n_num_tokens": pa.array(num),
        "n_other_tokens": pa.array(other),
        "n_bpe_tokens": pa.array(alpha + num + other),
    })


_VOWEL_GROUPS = re.compile(r"[aeiouy]+")
_SENT_ENDS = re.compile(r"[.!?]+")


def readability_stats(batch: pa.Table) -> pa.Table:
    """Flesch reading-ease inputs under a deterministic syllable heuristic
    (maximal [aeiouy]+ groups per lowercased word, floor 1) and sentence
    count = maximal [.!?]+ runs (floor 1). Integer counts + one float
    expression at the end — the SQL twin replays it with
    regexp_extract_all over the same token array."""
    texts = batch.column("text").to_pylist()
    n_sents, n_words, n_syll, flesch = [], [], [], []
    for t in texts:
        t = t or ""
        toks = t.split()
        sents = max(1, len(_SENT_ENDS.findall(t)))
        syll = sum(max(1, len(_VOWEL_GROUPS.findall(w.lower()))) for w in toks)
        n_sents.append(sents)
        n_words.append(len(toks))
        n_syll.append(syll)
        if toks:
            score = (206.835 - 1.015 * (len(toks) / sents)
                     - 84.6 * (syll / len(toks)))
        else:
            score = 0.0
        flesch.append(
            math.copysign(math.floor(abs(score) * 1e4 + 0.5) / 1e4, score))
    return pa.Table.from_pydict(
        {
            "doc_id": batch.column("doc_id"),
            "n_sentences": pa.array(n_sents, pa.int64()),
            "n_words": pa.array(n_words, pa.int64()),
            "n_syllables": pa.array(n_syll, pa.int64()),
            "flesch": pa.array(flesch, pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# deterministic Bernoulli sampling (training-data plumbing; complements the
# hash split in stages/curation.hash_split and the stratified lang_sample)

SAMPLE_SALT = "sample:v1"


def sample_filter(batch: pa.Table, *, rate_pct: int = 10) -> pa.Table:
    """Keep docs whose md5 hash bucket falls below rate_pct. A hash draw —
    never position or RNG state — keeps the sample stable under
    re-partitioning, resume and incremental appends, with no coordination.
    The salt is distinct from the splitter's spec (bare md5(doc_id)), so
    sampling is uncorrelated with the train/valid/test assignment."""
    ids = batch.column("doc_id").to_pylist()
    keep = [
        int(hashlib.md5(f"{SAMPLE_SALT}:{d}".encode()).hexdigest()[:8], 16)
        % 100 < rate_pct
        for d in ids
    ]
    return batch.filter(pa.array(keep, pa.bool_()))


# ---------------------------------------------------------------------------
# Gopher line-structure quality rules (Rae et al., arXiv:2112.11446 §A1.1)

# Gopher's "must contain >=2 of these" stopword list (distinct from the
# corpus-stats STOPWORDS above — the paper's own eight words).
GOPHER_STOPWORDS = frozenset(
    ("the", "be", "to", "of", "and", "that", "have", "with"))

_GOPHER_BULLET = re.compile(r"^[ \t]*[-*•]")
_GOPHER_ELL_LINE = re.compile(r"\.\.\.[ \t]*$")
_GOPHER_ELL_SEQ = re.compile(r"\.\.\.")
_GOPHER_ALPHA = re.compile(r"[A-Za-z]")


def gopher_stats(batch: pa.Table) -> pa.Table:
    """Per-doc Gopher quality signals and keep verdict.

    All signals are INTEGER counts and every threshold is applied by
    integer cross-multiplication (e.g. frac_bullet_lines < 0.9 becomes
    10*n_bullet_lines < 9*n_lines), so the DuckDB twin is bit-exact with
    no float-rounding contract at all. Rules (the published thresholds):
    50 <= words <= 100_000; mean word length in [3, 10]; symbol-to-word
    ratio ('#' chars + '...' sequences) < 0.1; < 90% of lines start with
    a bullet; < 30% of lines end with an ellipsis; > 80% of words contain
    an alphabetic character; >= 2 of the eight Gopher stopwords."""
    texts = batch.column("text").to_pylist()
    cols: dict[str, list] = {k: [] for k in (
        "n_words", "sum_word_len", "n_alpha_words", "n_stop_words",
        "n_symbols", "n_lines", "n_bullet_lines", "n_ellipsis_lines")}
    keeps = []
    for t in texts:
        t = t or ""
        toks = t.split()
        n = len(toks)
        sum_len = sum(len(w) for w in toks)
        n_alpha = sum(1 for w in toks if _GOPHER_ALPHA.search(w))
        n_stop = sum(1 for w in toks if w.lower() in GOPHER_STOPWORDS)
        n_sym = t.count("#") + len(_GOPHER_ELL_SEQ.findall(t))
        lines = t.split("\n")
        n_lines = len(lines)
        n_bullet = sum(1 for l in lines if _GOPHER_BULLET.match(l))
        n_ell = sum(1 for l in lines if _GOPHER_ELL_LINE.search(l))
        keep = (50 <= n <= 100_000
                and 3 * n <= sum_len <= 10 * n
                and 10 * n_sym < n
                and 10 * n_bullet < 9 * n_lines
                and 10 * n_ell < 3 * n_lines
                and 5 * n_alpha > 4 * n
                and n_stop >= 2)
        for k, v in (("n_words", n), ("sum_word_len", sum_len),
                     ("n_alpha_words", n_alpha), ("n_stop_words", n_stop),
                     ("n_symbols", n_sym), ("n_lines", n_lines),
                     ("n_bullet_lines", n_bullet),
                     ("n_ellipsis_lines", n_ell)):
            cols[k].append(v)
        keeps.append(keep)
    out = {"doc_id": batch.column("doc_id")}
    for k, v in cols.items():
        out[k] = pa.array(v, pa.int64())
    out["keep"] = pa.array(keeps, pa.bool_())
    return pa.Table.from_pydict(out)
