"""Driver-facing query callables (one per operator surface).

Each function takes ``sf_dir`` (a /root/testdata/sf* directory) and returns
a Dataset / DataFrame / Arrow table. Matching DuckDB oracle SQL lives in
``__ray_entry__.oracle_sql``; column names are kept identical on both sides
(the driver's compare is schema+value-hash based).

None of these call ray.init() — the driver owns the session.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data
from ray.data.aggregate import Sum

from .config import PipelineConfig
from .stages import ann, dedup, text_analysis
from .stages.community import detect_communities
from .stages.embed import HashEmbedder
from .stages.media import MediaFeatureExtractor, explode_media_spans
from .pipelines.kg import build_kg, spans_dataset_from_flat_parquet

# fixed term list for corpus term statistics (present in the driver corpus
# vocabulary; shared with the SQL oracle)
TERMS = ("spark", "table", "join", "window", "stream", "vector")

KG_CFG = PipelineConfig(chunk_size=512, chunk_overlap=100)


def _docs(sf_dir: str, columns=("doc_id", "text")) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


def _embeddings(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")


# ---------------------------------------------------------------------------
# benchmark harness (monitoring/benchmark.rs parity — SQL-oracled)


def _quality_pairs(batch: pa.Table) -> pa.Table:
    """Deterministic (generated, ground_truth) pairs from the documents
    table: generated = first 10 whitespace tokens, ground truth = tokens
    3..14 (partial overlap), except every 10th doc where the truth equals
    the generated text (exact-match rows). Shared spec with the DuckDB
    oracle (synth_oracle.bench_quality_sql)."""
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    gen, gt = [], []
    for d, t in zip(ids, texts):
        toks = t.split()
        g = " ".join(toks[:10])
        gen.append(g)
        gt.append(g if int(d) % 10 == 0 else " ".join(toks[2:14]))
    return pa.Table.from_pydict({
        "doc_id": batch.column("doc_id"),
        "generated": pa.array(gen, pa.string()),
        "ground_truth": pa.array(gt, pa.string()),
    })


def bench_quality(sf_dir: str):
    """Per-query RAG quality metrics (benchmark.rs:411-652): exact match,
    token-overlap F1, BLEU-4 (clipped n-gram precision + brevity
    penalty), ROUGE-L (LCS F, beta=1.2) — stateless map_batches over the
    deterministic pair table; SQL twin replays all four metrics (the
    ROUGE LCS as a recursive-CTE DP over prefix-max rows)."""
    from .stages import monitoring

    scored = (_docs(sf_dir)
              .map_batches(_quality_pairs, batch_format="pyarrow")
              .map_batches(monitoring.quality_batch, batch_format="pyarrow"))

    def finish(batch: pa.Table) -> pa.Table:
        out = {"doc_id": batch.column("doc_id")}
        for c in ("exact_match", "f1_score", "bleu_score", "rouge_l"):
            out[c] = pa.array(
                _round4(batch.column(c).to_numpy(zero_copy_only=False)),
                pa.float64())
        return pa.Table.from_pydict(out)

    return scored.map_batches(finish, batch_format="pyarrow")


def bench_rag_summary(sf_dir: str):
    """BenchmarkSummary over a deterministic question set (one per doc)
    in the reference's simulation mode (benchmark.rs:291-760): answer =
    'Generated answer for: <q>', LightRAG token estimates, default
    pricing. Latency fields are nondeterministic and excluded; the
    quality/token/cost half is SQL-oracled."""
    import pandas as pd

    from .stages.monitoring import BenchmarkConfig, BenchmarkRunner

    def mk(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        qs, ans = [], []
        for d, t in zip(ids, texts):
            q = f"What is in document {d}?"
            qs.append(q)
            ans.append(f"Generated answer for: {q}" if int(d) % 10 == 0
                       else " ".join(t.split()[:10]))
        return pa.Table.from_pydict({"question": pa.array(qs, pa.string()),
                                     "answer": pa.array(ans, pa.string())})

    ds = _docs(sf_dir).map_batches(mk, batch_format="pyarrow")
    runner = BenchmarkRunner(BenchmarkConfig(enable_lightrag=True,
                                             enable_leiden=True))
    s = runner.run_dataset("sim", ds)
    return pd.DataFrame([{
        "config_name": s["config_name"],
        "total_queries": s["total_queries"],
        "total_input_tokens": s["total_input_tokens"],
        "total_output_tokens": s["total_output_tokens"],
        "total_cost_usd": float(_round4(np.array([s["total_cost_usd"]]))[0]),
        "avg_tokens_per_query": float(
            _round4(np.array([s["avg_tokens_per_query"]]))[0]),
        "avg_exact_match": float(_round4(np.array([s["avg_exact_match"]]))[0]),
        "avg_f1_score": float(_round4(np.array([s["avg_f1_score"]]))[0]),
        "avg_bleu_score": float(_round4(np.array([s["avg_bleu_score"]]))[0]),
        "avg_rouge_l": float(_round4(np.array([s["avg_rouge_l"]]))[0]),
        "features": ",".join(s["features"]),
    }])


# ---------------------------------------------------------------------------
# text analysis (SQL-oracled)


def doc_token_stats(sf_dir: str):
    return _docs(sf_dir).map_batches(text_analysis.token_stats, batch_format="pyarrow")


def doc_quality(sf_dir: str):
    return _docs(sf_dir).map_batches(text_analysis.quality_stats, batch_format="pyarrow")


def doc_lang_id(sf_dir: str):
    return _docs(sf_dir).map_batches(text_analysis.lang_id, batch_format="pyarrow")


def doc_fingerprint(sf_dir: str):
    return _docs(sf_dir).map_batches(text_analysis.fingerprint, batch_format="pyarrow")


def doc_split_counts(sf_dir: str):
    """Split × language stratification audit over the doc_split assignment
    (stages/curation.hash_split): per-batch Arrow group_by partials → tiny
    keyed aggregate — per-doc rows never enter the exchange."""
    from .stages import curation

    def partial(batch: pa.Table) -> pa.Table:
        assigned = curation.hash_split(batch)
        tbl = pa.table({"split": assigned.column("split"),
                        "lang": batch.column("lang")})
        g = tbl.group_by(["split", "lang"]).aggregate([([], "count_all")])
        # rename BY NAME: pyarrow has moved key vs aggregate column order
        # across versions; positional renaming could silently mislabel the
        # count as a key and corrupt the stratification audit
        return g.select(["split", "lang", "count_all"]).rename_columns(
            ["split", "lang", "n"])

    return (
        _docs(sf_dir, columns=("doc_id", "lang"))
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["split", "lang"])
        .aggregate(Sum("n", alias_name="n_docs"))
    )


def doc_sample(sf_dir: str):
    """Deterministic 10% Bernoulli sample by hash bucket (salt distinct
    from the splitter's, so sampling is uncorrelated with split)."""
    return _docs(sf_dir, columns=("doc_id", "lang")).map_batches(
        text_analysis.sample_filter, batch_format="pyarrow")


def corpus_stats(sf_dir: str):
    """Per-language corpus rollup (G9 analogue): partial counts per batch →
    tiny groupby-aggregate."""

    def partial(batch: pa.Table) -> pa.Table:
        langs = batch.column("lang").to_pylist()
        texts = batch.column("text").to_pylist()
        acc: dict[str, list[int]] = {}
        for lang, text in zip(langs, texts):
            slot = acc.setdefault(lang, [0, 0, 0])
            slot[0] += 1
            slot[1] += len(text or "")
            slot[2] += len((text or "").split())
        return pa.Table.from_pydict(
            {
                "lang": pa.array(list(acc.keys()), pa.string()),
                "n_docs": pa.array([v[0] for v in acc.values()], pa.int64()),
                "n_chars": pa.array([v[1] for v in acc.values()], pa.int64()),
                "n_tokens": pa.array([v[2] for v in acc.values()], pa.int64()),
            }
        )

    return (
        _docs(sf_dir, ("doc_id", "text", "lang"))
        .map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_chars", alias_name="n_chars"),
            Sum("n_tokens", alias_name="n_tokens"),
        )
    )


def term_stats(sf_dir: str):
    """M12 mention counting + G10 document frequency for a fixed term list."""
    return (
        _docs(sf_dir)
        .map_batches(text_analysis.make_term_stats_fn(TERMS), batch_format="pyarrow")
        .groupby("term")
        .aggregate(
            Sum("n_occurrences", alias_name="n_occurrences"),
            Sum("doc_freq", alias_name="doc_freq"),
        )
    )


def term_cooccur(sf_dir: str):
    """G8 analogue: doc-level co-occurrence counts for term pairs."""
    return (
        _docs(sf_dir)
        .map_batches(text_analysis.make_cooccur_fn(TERMS), batch_format="pyarrow")
        .groupby(["term_a", "term_b"])
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )


def top_terms(sf_dir: str, k: int = 20):
    """T4 analogue: global top-k terms by count. The keyed aggregate holds
    EXACT per-term counts with terms disjoint across blocks, so a per-block
    local top-k is an exact combiner — the driver merges ≤ k·n_blocks
    candidate rows instead of the whole vocabulary (VERDICT r02 #7; the
    open-vocab ``to_pandas`` was the unbounded driver payload)."""

    _TOPK_SCHEMA = pa.schema([("term", pa.string()), ("n", pa.int64())])

    def local_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return _TOPK_SCHEMA.empty_table()  # schema-typed empty block
        df_ = batch.to_pandas()
        df_ = df_.sort_values(["n", "term"], ascending=[False, True]).head(k)
        return pa.Table.from_pandas(df_, preserve_index=False)

    agg = (
        _docs(sf_dir)
        .map_batches(text_analysis.tokenize_partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("cnt", alias_name="n"))
        .map_batches(local_topk, batch_format="pyarrow")
    )
    df = agg.to_pandas().sort_values(["n", "term"], ascending=[False, True]).head(k)
    return df.reset_index(drop=True)


# ---------------------------------------------------------------------------
# dedup family


def dedup_exact(sf_dir: str):
    """Exact dedup: per-batch fp combiner → native keyed aggregate (per-fp
    groups — no coarse bucket, per-task memory O(1) at any corpus size)."""
    from ray.data.aggregate import Min

    return (
        _docs(sf_dir)
        .map_batches(dedup.exact_dedup_partial, batch_format="pyarrow")
        .groupby("fp")
        .aggregate(Min("keep_doc_id", alias_name="keep_doc_id"),
                   Sum("n_docs", alias_name="n_docs"))
        .select_columns(["fp", "keep_doc_id", "n_docs"])
    )


def dedup_simhash(sf_dir: str):
    return _docs(sf_dir).map_batches(dedup.simhash_rows, batch_format="pyarrow")


def dedup_simhash_pairs(sf_dir: str, max_hamming: int = 3):
    """SimHash near-dup pairs, fully distributed with GUARANTEED recall:
    signature → 4×16-bit band rows → groupby(band, value) pair emission
    (pigeonhole: any pair ≤ 3 bits apart shares an exact band) →
    groupby(pair) dedupe. SQL-oracled against exact all-pairs
    bit_count(xor) ≤ 3 over the independently recomputed signatures."""
    from ray.data.aggregate import Min

    bands = (_docs(sf_dir)
             .map_batches(dedup.simhash_rows, batch_format="pyarrow")
             .map_batches(dedup.simhash_band_rows, batch_format="pyarrow"))
    cand = bands.groupby(["band", "band_val"]).map_groups(
        dedup.make_simhash_pairs_fn(max_hamming), batch_format="pyarrow")
    return (cand.groupby(["doc_a", "doc_b"])
            .aggregate(Min("hamming", alias_name="hamming")))


# all-pairs cell bound for hot dedup groups: a degenerate band value or
# boilerplate shingle shared by m ≫ cap docs expands as ceil(m/cap)² tasks
# of ≤ 2·cap members instead of one O(m²) task (salt-and-requeue,
# VERDICT r03 #4). Pair/intersection sets are provably identical.
DEDUP_GROUP_CAP = 512


def _split_tagged(ds, kind: str):
    """Filter a tagged-union Dataset by `kind`, dropping the tag column."""
    import pyarrow.compute as pc

    def pick(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch.column("kind"), kind)
        return batch.filter(mask).drop_columns(["kind"])

    return ds.map_batches(pick, batch_format="pyarrow")


def dedup_minhash_pairs(sf_dir: str, threshold: float = 0.5):
    """MinHash-LSH near-dup, fully distributed (no driver-side pair set,
    VERDICT r03 #3):

    shingle→sign→band rows → groupby(band bucket) → candidate pairs
    (hot band groups salt-and-requeue through a bounded second groupby) →
    per-doc participation rows (multi-band duplicates deduped batch-
    locally and inside the doc group — no global pair-distinct exchange) →
    union with per-doc shingle rows → groupby(doc) shuffle semi-join
    emitting shingle halves for candidate docs only → groupby(pair)
    exact-Jaccard verify (first half per side, so residual duplicate
    halves are harmless).

    The corpus is never materialized anywhere and the driver never holds
    the pair set — only Datasets flow. DuckDB-oracled: output equals exact
    all-pairs word-3-gram Jaccard ≥ threshold (LSH recall is ~1 at these
    similarities: every qualifying pair in the testdata has J ≥ 0.89; miss
    probability per pair < 1e-6 with 16 bands × 4 rows)."""
    from functools import partial

    docs = _docs(sf_dir)
    # bucket count derived from input size (parquet-metadata count): per-
    # bucket band rows stay ~constant as the corpus grows — no fixed B
    nb = max(64, int(docs.count()) // 64 + 1)
    bands = docs.map_batches(
        partial(dedup.minhash_band_rows, num_buckets=nb),
        batch_format="pyarrow")
    tagged = bands.groupby("bucket").map_groups(
        partial(dedup.candidate_pairs_from_bands, cap=DEDUP_GROUP_CAP),
        batch_format="pyarrow",
    ).materialize()  # candidate/rq rows: ≪ corpus by construction
    candidates = _split_tagged(tagged, "pair").select_columns(["doc_a", "doc_b"])
    rq = _split_tagged(tagged, "rq")
    if rq.count() > 0:
        requeued = rq.groupby(
            ["rq_band", "rq_hash", "cell_lo", "cell_hi"]
        ).map_groups(dedup.pairs_between_cells, batch_format="pyarrow")
        candidates = candidates.union(requeued)
    # candidate rows → per-doc participation rows directly (no global
    # pair-distinct exchange: batch-local + per-doc-group dedupe and the
    # first-half-per-side verify reducer make it redundant)
    pair_rows = candidates.map_batches(
        dedup.participation_rows_batch, batch_format="pyarrow"
    )
    doc_rows = docs.map_batches(dedup.doc_shingle_list_rows,
                                batch_format="pyarrow")
    halves = doc_rows.union(pair_rows).groupby("doc_id").map_groups(
        dedup.emit_pair_halves, batch_format="pyarrow"
    )
    return halves.groupby(["doc_a", "doc_b"]).map_groups(
        dedup.make_verify_pairs_fn(threshold), batch_format="pyarrow"
    )


def doc_bpe_tokens(sf_dir: str):
    """BPE-ish token counting (GPT-2 pre-tokenizer classes, RE2-safe —
    the same patterns run verbatim in the DuckDB twin)."""
    return _docs(sf_dir).map_batches(text_analysis.bpe_token_counts,
                                     batch_format="pyarrow")


def doc_lm_score(sf_dir: str):
    """CCNet-shaped LM quality scoring: add-one bigram model trained on
    the corpus, each doc scored by average token log-probability — one
    context-word-bucket exchange, no model broadcast
    (stages/lm_score.py)."""
    from .stages import lm_score

    return lm_score.lm_bigram_doc_scores(_docs(sf_dir))


def lm_quality_buckets(sf_dir: str):
    """CCNet-style head/middle/tail bucketing: every scored doc labeled
    by which LM-score tercile it falls in (head = best third). Terciles
    are EXACT nearest-rank over the e4-integer score via a value-count
    combiner (the exchange carries distinct scores only, same shape as
    doc_length_quantiles); the two boundary ints are broadcast into a
    stateless label pass. The per-doc score table (doc_id + int — ≪
    corpus) is materialized once so the LM pipeline runs once."""
    from ray.data.aggregate import Sum as _Sum

    from .stages import lm_score

    def to_e4(batch: pa.Table) -> pa.Table:
        avg = batch.column("avg_logprob").to_numpy(zero_copy_only=False)
        e4 = (np.sign(avg) * np.floor(np.abs(avg) * 1e4 + 0.5)).astype(np.int64)
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "score_e4": pa.array(e4, pa.int64()),
        })

    scored = (lm_score.lm_bigram_doc_scores(_docs(sf_dir))
              .map_batches(to_e4, batch_format="pyarrow")
              .materialize())

    def vc(batch: pa.Table) -> pa.Table:
        vals, cnts = np.unique(
            batch.column("score_e4").to_numpy(zero_copy_only=False),
            return_counts=True)
        return pa.Table.from_pydict({
            "score_e4": pa.array(vals.astype(np.int64), pa.int64()),
            "cnt": pa.array(cnts.astype(np.int64), pa.int64()),
        })

    counts = (scored.map_batches(vc, batch_format="pyarrow")
              .groupby("score_e4").aggregate(_Sum("cnt", alias_name="cnt")))
    df = counts.to_pandas().sort_values("score_e4").reset_index(drop=True)
    n = int(df["cnt"].sum()) if len(df) else 0
    if n == 0:
        return pa.schema([("doc_id", pa.int64()), ("score_e4", pa.int64()),
                          ("bucket", pa.string())]).empty_table()
    cum = df["cnt"].cumsum()
    k1, k2 = (n + 2) // 3, (2 * n + 2) // 3
    v1 = int(df.loc[cum >= k1, "score_e4"].iloc[0])
    v2 = int(df.loc[cum >= k2, "score_e4"].iloc[0])

    def label(batch: pa.Table) -> pa.Table:
        s = batch.column("score_e4").to_numpy(zero_copy_only=False)
        lab = np.where(s <= v1, "tail", np.where(s <= v2, "middle", "head"))
        return batch.append_column("bucket", pa.array(lab, pa.string()))

    return scored.map_batches(label, batch_format="pyarrow")


def top_bigrams(sf_dir: str, k: int = 20):
    """Corpus top-k bigrams (the LM head): combiner → groupby sum →
    partial top-k → tiny driver merge."""
    from .stages import lm_score

    return lm_score.top_bigrams(_docs(sf_dir), k)


def dup_passages(sf_dir: str):
    """Substring-level dedup (Lee et al. 2107.06499 shape): every 8-token
    rolling window fingerprinted, fingerprints seen in >=2 distinct docs
    reported with stats — stages/passages.py, one bucket exchange."""
    from .stages import passages

    return passages.dup_passages(_docs(sf_dir))


def doc_dup_passage_counts(sf_dir: str):
    """Per-doc duplicated-window counts (the filterable substring-dedup
    signal): (doc_id, n_dup_windows), inner semantics."""
    from .stages import passages

    return passages.doc_dup_passage_counts(_docs(sf_dir))


def doc_novel_window_counts(sf_dir: str):
    """Per-doc NOVEL-window counts (corpus-novelty curve — the dual of
    doc_dup_passage_counts): windows whose fingerprint first appears, in
    global (doc_id, pos) order, in this doc. Same one bucket exchange."""
    from .stages import passages

    return passages.doc_novel_window_counts(_docs(sf_dir))


def doc_winnow_fingerprints(sf_dir: str):
    """Robust winnowing fingerprint selection (Schleimer et al., the
    MOSS algorithm): rightmost-minimal k-gram hash per sliding winnow
    window — a ~1/w-density doc sketch with a match-coverage guarantee.
    Stateless vectorized map_batches; no exchange at all."""
    from .stages import passages

    return _docs(sf_dir, ("doc_id", "text")).map_batches(
        passages.winnow_rows, batch_format="pyarrow")


def winnow_dup_pairs(sf_dir: str, max_df: int = 10, min_shared: int = 2):
    """MOSS-style near-dup pairs over winnowing fingerprints: doc pairs
    sharing >= min_shared selected fingerprints. Fingerprints appearing
    in > max_df docs are EXCLUDED as boilerplate (the published MOSS
    common-code-elimination step) — which also bounds every
    per-fingerprint pair fan-out at max_df^2, so no hot group exists at
    any corpus size. Shape: winnow → per-doc distinct → groupby(phash)
    pair emit (bounded) → groupby(pair) count."""
    import pandas as pd

    from .stages import passages

    fp = (_docs(sf_dir, ("doc_id", "text"))
          .map_batches(passages.winnow_rows, batch_format="pyarrow")
          .map_batches(lambda t: pa.Table.from_pandas(
              t.to_pandas()[["doc_id", "phash"]].drop_duplicates(),
              preserve_index=False), batch_format="pyarrow")
          .groupby(["doc_id", "phash"]).count())

    def pairs_in_group(df: pd.DataFrame) -> pa.Table:
        docs = np.sort(df["doc_id"].unique())
        if len(docs) < 2 or len(docs) > max_df:  # boilerplate cut
            return pa.schema([("doc_a", pa.int64()),
                              ("doc_b", pa.int64())]).empty_table()
        a, b = np.triu_indices(len(docs), k=1)
        return pa.table({"doc_a": pa.array(docs[a], pa.int64()),
                         "doc_b": pa.array(docs[b], pa.int64())})

    def finalize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.rename_columns(["doc_a", "doc_b", "n_shared"])
        t = t.set_column(2, "n_shared",
                         t.column("n_shared").cast(pa.int64()))
        return t.filter(pc.greater_equal(t.column("n_shared"), min_shared))

    return (fp.groupby("phash")
            .map_groups(pairs_in_group, batch_format="pandas")
            .groupby(["doc_a", "doc_b"]).count()
            .map_batches(finalize, batch_format="pyarrow"))


def doc_passage_scrub(sf_dir: str):
    """Substring-level dedup REMOVAL (Lee et al.'s action): tokens
    covered by cross-doc duplicated 8-token windows are excised and the
    doc re-joined — (doc_id, clean_text, n_tokens_kept,
    n_tokens_removed). Window rows → bucket exchange → doc_id-keyed
    join + per-doc scrub."""
    from .stages import passages

    return passages.doc_passage_scrub(_docs(sf_dir, ("doc_id", "text")))


def dedup_ngram_pairs(sf_dir: str, threshold: float = 0.5):
    """EXACT n-gram Jaccard near-dup via a distributed inverted shingle
    index (no LSH recall risk): shingle posting rows → groupby(shingle
    bucket) pair-intersection partials (hot posting lists salt-and-requeue
    through a bounded second groupby) → groupby(pair) Jaccard from counts.
    Doc sizes ride on the posting rows, so nothing is broadcast."""
    from functools import partial

    docs = _docs(sf_dir)
    # input-derived shingle-bucket count: per-bucket posting rows stay
    # ~constant as the corpus grows — no fixed B on the exchange
    nb = max(64, int(docs.count()) // 64 + 1)
    rows = docs.map_batches(
        partial(dedup.ngram_shingle_rows, num_buckets=nb),
        batch_format="pyarrow")
    tagged = rows.groupby("bucket").map_groups(
        partial(dedup.ngram_pairs_from_bucket, cap=DEDUP_GROUP_CAP),
        batch_format="pyarrow",
    ).materialize()
    partials = _split_tagged(tagged, "pair").select_columns(
        ["doc_a", "doc_b", "n_a", "n_b", "inter"])
    rq = _split_tagged(tagged, "rq")
    if rq.count() > 0:
        requeued = rq.groupby(["rq_sh", "cell_lo", "cell_hi"]).map_groups(
            dedup.ngram_pairs_between_cells, batch_format="pyarrow"
        )
        partials = partials.union(requeued)
    return partials.groupby(["doc_a", "doc_b"]).map_groups(
        dedup.make_ngram_finalize_fn(threshold), batch_format="pyarrow"
    )


def embedding_near_dup(sf_dir: str, threshold: float = 0.45):
    """Exact cosine near-dup as distributed blocked all-pairs: embeddings
    are pinned as Arrow blocks in the object store; a Dataset of (i, j)
    block pairs fans the O(N²) comparison out across tasks that each hold
    only two blocks. No full-matrix broadcast, no driver-side matrix."""
    ds = _embeddings(sf_dir).materialize()
    refs = ds.to_arrow_refs()
    n = len(refs)
    pair_items = [{"i": i, "j": j} for i in range(n) for j in range(i, n)]
    pair_ds = ray.data.from_items(pair_items)
    return pair_ds.map_batches(
        ann.make_block_pair_near_dup_fn(refs, threshold),
        batch_size=1,
        batch_format="pyarrow",
    )


def embedding_near_dup_bucketed(sf_dir: str, threshold: float = 0.45):
    """Embedding near-dup via LSH band buckets + exact within-bucket verify
    — the SCALE-DEFAULT shape (VERDICT r02 #6): vectors shuffle once into
    band buckets (groupby), each bucket all-pairs-verifies locally, and a
    final (vec_a, vec_b) groupby drops multi-band duplicates. No O(N²/B²)
    task fan-out, no block-ref table on the driver. Oracled against the
    SAME exact SQL predicate as embedding_near_dup: the default band
    geometry (32 bands × 3 bits, deterministic planes) was validated to
    full recall at τ=0.45 on every testdata scale and the equality is
    pytest-asserted."""
    dim = len(_query_vector(sf_dir))
    rows = _embeddings(sf_dir).map_batches(
        ann.make_near_dup_band_rows_fn(dim), batch_format="pyarrow"
    )
    pairs = rows.groupby("bucket").map_groups(
        ann.make_bucket_verify_fn(threshold), batch_format="pyarrow"
    )
    return pairs.groupby(["vec_a", "vec_b"]).map_groups(
        ann.dedup_candidate_pairs, batch_format="pyarrow"
    )


def dedup_semantic_keep(sf_dir: str, threshold: float = 0.45):
    """Semantic dedup to cluster representatives: the distributed
    embedding near-dup pairs feed DISTRIBUTED hash-to-min label
    propagation (stages/dedup.py semantic_components_labels) — the pair
    set and the corpus id list never land on the driver (VERDICT r02 #5).
    The converged label table (dup nodes only, tiny by construction) is
    broadcast once and keep_id maps onto the vec_id column per batch;
    singletons keep themselves. SQL-oracled via the same pair predicate +
    recursive min-label closure.

    Pair source is the BUCKETED near-dup (LSH bands + within-bucket exact
    verify — the scale default, VERDICT r03 #2); its equality to the
    blocked all-pairs variant at this τ is pytest-asserted and both are
    oracled against the same SQL predicate. The O(N²) exact variant
    remains available as `embedding_near_dup` for oracle checks."""
    import pyarrow.compute as pc

    pairs = embedding_near_dup_bucketed(sf_dir, threshold).materialize()
    labels = dedup.semantic_components_labels(pairs)
    lbl_blocks = [t for t in ray.get(labels.to_arrow_refs()) if t.num_rows]
    lbl = (pa.concat_tables(lbl_blocks, promote_options="default")
           if lbl_blocks else
           pa.table({"node": pa.array([], pa.int64()),
                     "label": pa.array([], pa.int64())}))
    lbl_ref = ray.put(lbl)

    def assign(batch: pa.Table) -> pa.Table:
        lt = ray.get(lbl_ref)
        vid = batch.column("vec_id").cast(pa.int64())
        idx = pc.index_in(vid, lt.column("node"))
        keep = pc.coalesce(pc.take(lt.column("label"), idx), vid)
        return pa.table({"vec_id": vid, "keep_id": keep.cast(pa.int64())})

    return ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id"]
    ).map_batches(assign, batch_format="pyarrow")


def dedup_ngram_keep(sf_dir: str, threshold: float = 0.5):
    """TEXT near-dup to cluster representatives — the most common web
    curation op: the distributed n-gram-Jaccard pairs feed the same
    hash-to-min label propagation as the semantic variant; keep_id =
    minimum doc_id reachable through the near-dup graph, singletons keep
    themselves. SQL-oracled via the same Jaccard predicate + recursive
    min-label closure."""
    import pyarrow.compute as pc

    def to_nodes(batch: pa.Table) -> pa.Table:
        return pa.table({"vec_a": batch.column("doc_a"),
                         "vec_b": batch.column("doc_b")})

    pairs = dedup_ngram_pairs(sf_dir, threshold).map_batches(
        to_nodes, batch_format="pyarrow").materialize()
    labels = dedup.semantic_components_labels(pairs)
    lbl_blocks = [t for t in ray.get(labels.to_arrow_refs()) if t.num_rows]
    lbl = (pa.concat_tables(lbl_blocks, promote_options="default")
           if lbl_blocks else
           pa.table({"node": pa.array([], pa.int64()),
                     "label": pa.array([], pa.int64())}))
    lbl_ref = ray.put(lbl)

    def assign(batch: pa.Table) -> pa.Table:
        lt = ray.get(lbl_ref)
        did = batch.column("doc_id").cast(pa.int64())
        idx = pc.index_in(did, lt.column("node"))
        keep = pc.coalesce(pc.take(lt.column("label"), idx), did)
        return pa.table({"doc_id": did, "keep_id": keep.cast(pa.int64())})

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(assign, batch_format="pyarrow")


def dedup_minhash_keep(sf_dir: str, threshold: float = 0.5):
    """MinHash-LSH dedup to cluster representatives — the scale path a
    100-TB run uses (banded LSH candidates + exact verify, vs the
    inverted-shingle-index pair source of dedup_ngram_keep): the verified
    pair stream feeds the same distributed hash-to-min label propagation;
    keep_id = min doc_id reachable through the near-dup graph. Oracled by
    the identical recursive min-label closure over exact all-pairs
    Jaccard (LSH recall is ~1 at these similarities, see
    dedup_minhash_pairs)."""
    import pyarrow.compute as pc

    def to_nodes(batch: pa.Table) -> pa.Table:
        return pa.table({"vec_a": batch.column("doc_a"),
                         "vec_b": batch.column("doc_b")})

    pairs = dedup_minhash_pairs(sf_dir, threshold).map_batches(
        to_nodes, batch_format="pyarrow").materialize()
    labels = dedup.semantic_components_labels(pairs)
    lbl_blocks = [t for t in ray.get(labels.to_arrow_refs()) if t.num_rows]
    lbl = (pa.concat_tables(lbl_blocks, promote_options="default")
           if lbl_blocks else
           pa.table({"node": pa.array([], pa.int64()),
                     "label": pa.array([], pa.int64())}))
    lbl_ref = ray.put(lbl)

    def assign(batch: pa.Table) -> pa.Table:
        lt = ray.get(lbl_ref)
        did = batch.column("doc_id").cast(pa.int64())
        idx = pc.index_in(did, lt.column("node"))
        keep = pc.coalesce(pc.take(lt.column("label"), idx), did)
        return pa.table({"doc_id": did, "keep_id": keep.cast(pa.int64())})

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(assign, batch_format="pyarrow")


def dedup_simhash_keep(sf_dir: str, max_hamming: int = 3):
    """SimHash dedup to cluster representatives — completes the
    keep-table family (ngram / minhash-LSH / simhash): the banded
    Hamming pair stream (guaranteed recall by pigeonhole) feeds the
    distributed hash-to-min label propagation; keep_id = min doc_id
    reachable through the near-dup graph. Oracled by the recursive
    min-label closure over exact all-pairs bit_count(xor) <= 3."""
    import pyarrow.compute as pc

    def to_nodes(batch: pa.Table) -> pa.Table:
        return pa.table({"vec_a": batch.column("doc_a").cast(pa.int64()),
                         "vec_b": batch.column("doc_b").cast(pa.int64())})

    pairs = dedup_simhash_pairs(sf_dir, max_hamming).map_batches(
        to_nodes, batch_format="pyarrow").materialize()
    labels = dedup.semantic_components_labels(pairs)
    lbl_blocks = [t for t in ray.get(labels.to_arrow_refs()) if t.num_rows]
    lbl = (pa.concat_tables(lbl_blocks, promote_options="default")
           if lbl_blocks else
           pa.table({"node": pa.array([], pa.int64()),
                     "label": pa.array([], pa.int64())}))
    lbl_ref = ray.put(lbl)

    def assign(batch: pa.Table) -> pa.Table:
        lt = ray.get(lbl_ref)
        did = batch.column("doc_id").cast(pa.int64())
        idx = pc.index_in(did, lt.column("node"))
        keep = pc.coalesce(pc.take(lt.column("label"), idx), did)
        return pa.table({"doc_id": did, "keep_id": keep.cast(pa.int64())})

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(assign, batch_format="pyarrow")


def curation_pipeline(sf_dir: str):
    """END-TO-END curation composition — the pipeline a training-data user
    actually runs: quality filter (first-failing-rule verdict) ∧ text
    near-dup dedup (keep only cluster representatives) → hash split.
    ONE document scan: verdict + split are per-row; the dedup-cluster
    label table (dup nodes only, tiny by construction) is the only
    broadcast. Output: the kept training rows (doc_id, split, n_tokens)."""
    import pyarrow.compute as pc

    from .stages import curation

    def to_nodes(batch: pa.Table) -> pa.Table:
        return pa.table({"vec_a": batch.column("doc_a"),
                         "vec_b": batch.column("doc_b")})

    pairs = dedup_ngram_pairs(sf_dir).map_batches(
        to_nodes, batch_format="pyarrow").materialize()
    labels = dedup.semantic_components_labels(pairs)
    lbl_blocks = [t for t in ray.get(labels.to_arrow_refs()) if t.num_rows]
    lbl = (pa.concat_tables(lbl_blocks, promote_options="default")
           if lbl_blocks else
           pa.table({"node": pa.array([], pa.int64()),
                     "label": pa.array([], pa.int64())}))
    lbl_ref = ray.put(lbl)

    def annotate(batch: pa.Table) -> pa.Table:
        lt = ray.get(lbl_ref)
        v = curation.filter_verdict(batch)
        s = curation.hash_split(batch)
        did = batch.column("doc_id").cast(pa.int64())
        idx = pc.index_in(did, lt.column("node"))
        keep_id = pc.coalesce(pc.take(lt.column("label"), idx), did)
        mask = pc.and_(v.column("keep"), pc.equal(keep_id, did))
        out = pa.table({"doc_id": did, "split": s.column("split"),
                        "n_tokens": v.column("n_tokens")})
        return out.filter(mask)

    return _docs(sf_dir).map_batches(annotate, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# similarity search


def _query_vector(sf_dir: str) -> np.ndarray:
    """Single query vector without a whole-table read: streams row-group
    batches and stops at the first batch containing vec_id 0."""
    f = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    for batch in f.iter_batches(batch_size=1024, columns=["vec_id", "embedding"]):
        ids = batch.column("vec_id").to_pylist()
        if 0 in ids:
            return np.array(batch.column("embedding")[ids.index(0)].as_py(),
                            dtype=np.float32)
    raise KeyError("vec_id 0 not found")


def _ivf_sample(sf_dir: str, n: int = 1024) -> np.ndarray:
    """Quantizer training sample = rows with vec_id < n in vec_id order,
    read with predicate pushdown (row-group pruned, never the whole
    table) — a sample definition the DuckDB oracle states as
    ``WHERE vec_id < n ORDER BY vec_id``."""
    tbl = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", n)],
    )
    order = np.argsort(
        np.asarray(tbl.column("vec_id").to_pylist(), dtype=np.int64))
    return np.array(tbl.column("embedding").to_pylist(),
                    dtype=np.float32)[order]


def ann_topk(sf_dir: str, k: int = 10):
    q = _query_vector(sf_dir)
    partials = _embeddings(sf_dir).map_batches(
        ann.make_topk_partial_fn(q, k), batch_format="pyarrow"
    )
    return ann.finalize_topk(partials, k)


def ann_lsh_topk(sf_dir: str, k: int = 10):
    q = _query_vector(sf_dir)
    dim = len(q)
    partials = _embeddings(sf_dir).map_batches(
        ann.make_lsh_topk_partial_fn(q, k, dim), batch_format="pyarrow"
    )
    return ann.finalize_topk(partials, k)


# ---------------------------------------------------------------------------
# KG pipeline surfaces (non-SQL-expressible → rows-only driver checks;
# correctness is gated by the oracle parity tests in tests/)


_KG_CACHE: dict[str, object] = {}


def _kg(sf_dir: str):
    """Memoized per sf_dir: many query surfaces share one KG build; the
    result's intermediates are materialized Datasets, safe to reuse within
    a session."""
    res = _KG_CACHE.get(sf_dir)
    if res is None:
        docs = spans_dataset_from_flat_parquet(f"{sf_dir}/documents.parquet")
        res = _KG_CACHE[sf_dir] = build_kg(docs, KG_CFG)
    return res


def kg_chunks(sf_dir: str):
    return _kg(sf_dir).chunks.select_columns(
        ["chunk_id", "doc_id", "chunk_idx", "start_offset", "end_offset"]
    )


def kg_entities(sf_dir: str):
    return _kg(sf_dir).entities.select_columns(
        ["canonical_id", "canonical_name", "entity_type", "doc_frequency",
         "mention_count"]
    )


def kg_triples(sf_dir: str):
    def project(batch: pa.Table) -> pa.Table:
        conf = batch.column("confidence").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "subj": batch.column("subj"),
                "pred": batch.column("pred"),
                "obj": batch.column("obj"),
                "confidence": pa.array(_round4(conf), pa.float64()),
                "n_occurrences": batch.column("n_occurrences"),
            }
        )

    return _kg(sf_dir).triples.map_batches(project, batch_format="pyarrow")


def kg_alias_map(sf_dir: str):
    return _kg(sf_dir).alias_map


def kg_communities(sf_dir: str):
    res = _kg(sf_dir)
    communities, _ = detect_communities(res.entities, res.edges)
    return communities


def _leiden_level(res, level: int):
    """Level-``level`` rows of detect_communities canonicalized to
    min-member labels (partition equality, SURVEY §7.5)."""
    import pandas as pd

    comm, _ = detect_communities(res.entities, res.edges)
    df = comm.to_pandas()
    df = df[df["level"] == level]
    if df.empty:
        return pd.DataFrame({"entity_id": pd.Series(dtype="str"),
                             "community_rep": pd.Series(dtype="str")})
    rep = df.groupby("community_id")["entity_id"].transform("min")
    return (pd.DataFrame({"entity_id": df["entity_id"],
                          "community_rep": rep})
            .sort_values("entity_id").reset_index(drop=True))


def kg_leiden(sf_dir: str):
    """L1 Leiden over the FLAGSHIP graph, canonicalized for partition
    equality — hard-oracled by syn_oracle_kg.kg_leiden_sql (the same
    recursive-CTE local-move + refinement replay over the chunked-corpus
    replay graph)."""
    return _leiden_level(_kg(sf_dir), 0)


def kg_leiden_l1(sf_dir: str):
    """Hierarchical Leiden LEVEL 1 over the flagship graph (oracle
    syn_oracle_kg.kg_leiden_l1_sql: exact level-0 label replay +
    contraction + second recursive-CTE replay)."""
    return _leiden_level(_kg(sf_dir), 1)


def kg_community_summaries(sf_dir: str):
    res = _kg(sf_dir)
    _, summaries = detect_communities(res.entities, res.edges)
    return summaries


def kg_chunk_embeddings(sf_dir: str):
    docs = spans_dataset_from_flat_parquet(f"{sf_dir}/documents.parquet")
    res = build_kg(docs, KG_CFG)
    emb = res.chunks.map_batches(
        HashEmbedder,
        fn_constructor_kwargs={"dim": 64},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def summarize(batch: pa.Table) -> pa.Table:
        vecs = np.array(batch.column("vector").to_pylist(), dtype=np.float32)
        norms = np.linalg.norm(vecs, axis=1) if len(vecs) else np.array([])
        return pa.Table.from_pydict(
            {
                "id": batch.column("id"),
                "dim": pa.array([vecs.shape[1] if len(vecs) else 0] * len(batch),
                                 pa.int32()),
                "norm_ok": pa.array([bool(abs(n - 1.0) < 1e-3 or n == 0.0)
                                      for n in norms], pa.bool_()),
            }
        )

    return emb.map_batches(summarize, batch_format="pyarrow")


def kg_semantic_chunks(sf_dir: str):
    """M3 semantic chunking over the spans corpus (start/end are sentence
    indices — the reference's SemanticChunk span shape)."""
    from .stages.chunk import make_chunk_batch_fn

    docs = spans_dataset_from_flat_parquet(f"{sf_dir}/documents.parquet")
    return docs.map_batches(
        make_chunk_batch_fn(strategy="semantic"), batch_format="pyarrow"
    ).select_columns(["chunk_id", "doc_id", "chunk_idx", "start_offset",
                      "end_offset"])


def kg_semantic_chunk_coverage(sf_dir: str):
    """Hard invariant oracle for M3 semantic chunking: per doc the spans
    must tile [0, n_sentences) exactly — covered == max_end == n_sentences
    and min_start == 0. The breakpoints themselves depend on MT-seeded
    hash-embedding draws (not SQL-replayable), but the sentence count IS
    (synth_oracle.kg_semantic_chunk_coverage_sql), so this pins the span
    arithmetic of the real chunker output."""
    from ray.data.aggregate import Max, Min, Sum

    ch = kg_semantic_chunks(sf_dir)

    def widen(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.append_column(
            "span_len", pc.cast(pc.subtract(batch.column("end_offset"),
                                            batch.column("start_offset")),
                                pa.int64()))

    agg = (ch.map_batches(widen, batch_format="pyarrow")
             .groupby("doc_id")
             .aggregate(Sum("span_len", alias_name="covered"),
                        Max("end_offset", alias_name="max_end"),
                        Min("start_offset", alias_name="min_start")))

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "n_sentences": pc.cast(batch.column("max_end"), pa.int64()),
            "covered": pc.cast(batch.column("covered"), pa.int64()),
            "max_end": pc.cast(batch.column("max_end"), pa.int64()),
            "min_start": pc.cast(batch.column("min_start"), pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def kg_late_chunk_embeddings(sf_dir: str):
    """Late-chunking embeddings (document-context pooling) over the chunk
    table — actor-pool stage, per-actor doc-vector cache."""
    from .stages.embed import LateChunkEmbedder

    res = _kg(sf_dir)
    out = res.chunks.map_batches(
        LateChunkEmbedder,
        fn_constructor_kwargs={"dim": 64},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def summarize(batch: pa.Table) -> pa.Table:
        vecs = np.array(batch.column("vector").to_pylist(), dtype=np.float32)
        norms = np.linalg.norm(vecs, axis=1) if len(vecs) else np.array([])
        return pa.Table.from_pydict(
            {"id": batch.column("id"),
             "norm_ok": pa.array([bool(abs(n - 1.0) < 1e-3 or n == 0.0)
                                  for n in norms], pa.bool_())}
        )

    return out.map_batches(summarize, batch_format="pyarrow")


def media_features(sf_dir: str):
    docs = spans_dataset_from_flat_parquet(f"{sf_dir}/documents.parquet")
    media = docs.map_batches(explode_media_spans, batch_format="pyarrow")
    return media.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"mode": "fake", "feature_dim": 8},
        batch_format="pyarrow",
        batch_size=16,
        concurrency=(1, 4),
    ).select_columns(["doc_id", "media_ref", "kind", "span_index"])


def media_frames(sf_dir: str):
    """Video/image frame sampling pipeline: explode media spans → bytes
    load (actor pool, small batches) → frame-timestamp explode."""
    from .stages.media import (MediaBytesLoader, explode_media_spans,
                               make_frame_sampler)

    docs = spans_dataset_from_flat_parquet(f"{sf_dir}/documents.parquet")
    media = docs.map_batches(explode_media_spans, batch_format="pyarrow")
    loaded = media.map_batches(
        MediaBytesLoader, batch_format="pyarrow", batch_size=16,
        concurrency=(1, 4),
    )
    return loaded.map_batches(make_frame_sampler(fps_sample=1.0),
                              batch_format="pyarrow")


def media_resized(sf_dir: str):
    """Image decode+resize pipeline (block-mean downsample over the
    deterministic-fake decode; real resize math)."""
    from .stages.media import (ImageResizeStage, MediaBytesLoader,
                               explode_media_spans)

    docs = spans_dataset_from_flat_parquet(f"{sf_dir}/documents.parquet")
    media = docs.map_batches(explode_media_spans, batch_format="pyarrow")
    loaded = media.map_batches(
        MediaBytesLoader, batch_format="pyarrow", batch_size=16,
        concurrency=(1, 4),
    )
    out = loaded.map_batches(
        ImageResizeStage, fn_constructor_kwargs={"target": 16},
        batch_format="pyarrow", batch_size=16, concurrency=(1, 4),
    )
    return out.select_columns(
        ["doc_id", "media_ref", "width", "height", "crop_byte_sum"])


def kg_mentions(sf_dir: str):
    """J4 mentions table with character offsets (separate scan so the hot
    KG path doesn't carry offset lists)."""
    from .stages.extract import make_mentions_batch_fn

    res = _kg(sf_dir)
    ds = res.chunks.map_batches(
        make_mentions_batch_fn(KG_CFG.min_confidence, KG_CFG.entity_types),
        batch_format="pyarrow",
    )

    def project(batch: pa.Table) -> pa.Table:
        conf = batch.column("confidence").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "entity_id": batch.column("entity_id"),
                "chunk_id": batch.column("chunk_id"),
                "start_offset": batch.column("start_offset"),
                "end_offset": batch.column("end_offset"),
                "confidence": pa.array(_round4(conf), pa.float64()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# kgx: SQL-oracled KG pipeline surfaces (md5-derived corpus, kgx.py)


_KGX_CACHE: dict[str, object] = {}

KGX_CFG = PipelineConfig(
    chunk_size=2048,
    chunk_overlap=0,
    canonical_merge="salted_groupby",  # oracle the KEYED scale path
    edge_merge="groupby",
    salt_partitions=4,
)


def _kgx(sf_dir: str):
    """KG build over the md5-derived oracle corpus (kgx.py) using the keyed
    (salted groupby) canonicalization + edge shuffles — the driver's DuckDB
    side derives the expected output independently from the hand-written
    per-template expectation constants."""
    res = _KGX_CACHE.get(sf_dir)
    if res is None:
        from . import kgx

        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id"]
        ).map_batches(kgx.kgx_spans_batch, batch_format="pyarrow")
        res = _KGX_CACHE[sf_dir] = build_kg(docs, KGX_CFG)
    return res


def _round4(col_np):
    x = np.asarray(col_np, dtype=np.float64)
    return np.floor(np.abs(x) * 1e4 + 0.5) / 1e4 * np.sign(x)


def kgx_doc_entities(sf_dir: str):
    """Per-doc extracted entities over the kgx corpus (extraction stream)."""

    def project(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.equal(batch.column("row_kind"), "entity"))
        conf = batch.column("confidence").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(
                    [int(d) for d in batch.column("doc_id").to_pylist()],
                    pa.int64(),
                ),
                "name": batch.column("name"),
                "entity_type": batch.column("entity_type"),
                "confidence": pa.array(_round4(conf), pa.float64()),
                "n_mentions": batch.column("n_mentions"),
            }
        )

    return _kgx(sf_dir).extraction.map_batches(project, batch_format="pyarrow")


def kgx_entities(sf_dir: str):
    def project(batch: pa.Table) -> pa.Table:
        conf = batch.column("confidence").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "canonical_id": batch.column("canonical_id"),
                "canonical_name": batch.column("canonical_name"),
                "entity_type": batch.column("entity_type"),
                "doc_frequency": batch.column("doc_frequency"),
                "mention_count": batch.column("mention_count"),
                "confidence": pa.array(_round4(conf), pa.float64()),
            }
        )

    return _kgx(sf_dir).entities.map_batches(project, batch_format="pyarrow")


def kgx_alias_map(sf_dir: str):
    return _kgx(sf_dir).alias_map


_KGXF_CACHE: dict[str, object] = {}


def _kgxf(sf_dir: str):
    """KG build over the FUZZY oracle corpus (kgx_fuzzy.py): the person pool
    carries near-miss variant groups so the greedy fuzzy clustering
    (functions/linking.py, reference corpus/entity_linker.rs:213-273) is
    actually exercised by a hard driver oracle — the kgx pools are
    collision-free by design and reduce to exact grouping."""
    res = _KGXF_CACHE.get(sf_dir)
    if res is None:
        from . import kgx_fuzzy

        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id"]
        ).map_batches(kgx_fuzzy.kgxf_spans_batch, batch_format="pyarrow")
        res = _KGXF_CACHE[sf_dir] = build_kg(docs, KGX_CFG)
    return res


def kgx_fuzzy_entities(sf_dir: str):
    def project(batch: pa.Table) -> pa.Table:
        conf = batch.column("confidence").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "canonical_id": batch.column("canonical_id"),
                "canonical_name": batch.column("canonical_name"),
                "entity_type": batch.column("entity_type"),
                "doc_frequency": batch.column("doc_frequency"),
                "mention_count": batch.column("mention_count"),
                "confidence": pa.array(_round4(conf), pa.float64()),
            }
        )

    return _kgxf(sf_dir).entities.map_batches(project, batch_format="pyarrow")


def kgx_fuzzy_alias_map(sf_dir: str):
    return _kgxf(sf_dir).alias_map


def kgx_fuzzy_edges(sf_dir: str):
    return _kgxf(sf_dir).edges.select_columns(
        ["src", "dst", "rel_type", "n_occurrences"]
    )


def kgx_fuzzy_triples(sf_dir: str):
    return _kgxf(sf_dir).triples.select_columns(
        ["subj", "pred", "obj", "n_occurrences"]
    )


# --- syn_*: SQL-oracled KG build over the SYNTH corpus itself (no base
# text) — multi-sentence Zipf-skewed docs with md5-derived fuzzy variants;
# the DuckDB twin (syn_oracle_kg.py) replays extraction over the word
# stream and the greedy fuzzy clustering as recursive CTEs, sharing only
# pool constants with the pipeline.

_SYN_CACHE: dict[str, object] = {}

SYN_CFG = PipelineConfig(
    chunk_size=2048,        # factor=1 docs are single-chunk at this size
    chunk_overlap=0,
    canonical_merge="salted_groupby",   # oracle the KEYED scale paths
    edge_merge="groupby",
    salt_partitions=4,
)


def _syn(sf_dir: str):
    res = _SYN_CACHE.get(sf_dir)
    if res is None:
        docs = spans_dataset_from_flat_parquet(
            f"{sf_dir}/documents.parquet", include_base_text=False)
        res = _SYN_CACHE[sf_dir] = build_kg(docs, SYN_CFG)
    return res


def syn_doc_entities(sf_dir: str):
    """Per-doc extraction stream over the synth corpus (hard-oracled: the
    SQL twin replays the 4-phase word-stream heuristics)."""

    def project(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.equal(batch.column("row_kind"), "entity"))
        conf = batch.column("confidence").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "name": batch.column("name"),
                "entity_type": batch.column("entity_type"),
                "confidence": pa.array(_round4(conf), pa.float64()),
                "n_mentions": batch.column("n_mentions"),
            }
        )

    return _syn(sf_dir).extraction.map_batches(project, batch_format="pyarrow")


def syn_entities(sf_dir: str):
    """Canonical entities over the synth corpus — the fuzzy greedy
    clustering exercised on Zipf-hot keys + data-dependent typo variants,
    hard-oracled by the recursive-CTE greedy replay."""

    def project(batch: pa.Table) -> pa.Table:
        conf = batch.column("confidence").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "canonical_id": batch.column("canonical_id"),
                "canonical_name": batch.column("canonical_name"),
                "entity_type": batch.column("entity_type"),
                "doc_frequency": batch.column("doc_frequency"),
                "mention_count": batch.column("mention_count"),
                "confidence": pa.array(_round4(conf), pa.float64()),
            }
        )

    return _syn(sf_dir).entities.map_batches(project, batch_format="pyarrow")


def syn_alias_map(sf_dir: str):
    return _syn(sf_dir).alias_map


def syn_edges(sf_dir: str):
    return _syn(sf_dir).edges.select_columns(
        ["src", "dst", "rel_type", "n_occurrences"]
    )


def syn_triples(sf_dir: str):
    return _syn(sf_dir).triples.select_columns(
        ["subj", "pred", "obj", "n_occurrences"]
    )


# --- syn graph-analytics twins: the SAME stage code the kg_* surfaces run,
# here over the replayed syn graph so every row is hard-oracled (the SQL
# side composes syn_oracle_kg._full_cte with the kgx-style recursive-CTE
# analytics).


def syn_stats(sf_dir: str):
    """G9 graph statistics over the syn graph (driver-oracled twin of
    kg_stats on the north-rule corpus shape)."""
    from .stages import graph_analytics as ga

    res = _syn(sf_dir)
    n_docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).count()
    df = ga.graph_stats(res.entities, res.edges, n_docs, res.chunks.count())
    df["value"] = _round4(df["value"].to_numpy())
    return df


def syn_cooccur(sf_dir: str):
    """G8 co-occurrence edges over the syn extraction stream
    (driver-oracled twin of kg_cooccur_edges)."""
    from .stages import graph_analytics as ga
    from .stages.joins import derived_join_buckets

    ds = ga.doc_cooccurrence_edges(
        _syn(sf_dir).extraction,
        num_buckets=derived_join_buckets(sf_dir, "documents",
                                         floor=64, rows_per_bucket=512))

    def project(batch: pa.Table) -> pa.Table:
        conf = batch.column("confidence").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "src": batch.column("src"),
                "dst": batch.column("dst"),
                "n_docs": batch.column("n_docs"),
                "rel_type": batch.column("rel_type"),
                "confidence": pa.array(_round4(conf), pa.float64()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


def syn_common_entities(sf_dir: str):
    """T4 top-k common entities over the syn graph (driver-oracled)."""
    from .stages import graph_analytics as ga

    return ga.common_entities(_syn(sf_dir).entities)


def syn_components(sf_dir: str):
    """L3 connected components + degree over the syn graph
    (driver-oracled)."""
    from .stages import graph_analytics as ga

    res = _syn(sf_dir)
    return ga.connected_components(res.entities, res.edges)


def syn_leiden(sf_dir: str):
    """L1 Leiden over the syn graph, canonicalized for partition equality
    (SURVEY §7.5): level-0 output of the REAL detect_communities stage,
    each entity mapped to the min entity_id of its community — hard-oracled
    by syn_oracle_kg.syn_leiden_sql's recursive-CTE local-move replay +
    connected-component refinement."""
    import pandas as pd

    res = _syn(sf_dir)
    comm, _ = detect_communities(res.entities, res.edges)
    df = comm.to_pandas()
    df = df[df["level"] == 0]
    rep = df.groupby("community_id")["entity_id"].transform("min")
    return (pd.DataFrame({"entity_id": df["entity_id"],
                          "community_rep": rep})
            .sort_values("entity_id").reset_index(drop=True))


def syn_leiden_l1(sf_dir: str):
    """Hierarchical Leiden LEVEL 1 over the syn graph, canonicalized for
    partition equality — the level-1 rows of the REAL detect_communities
    stage (contract level-0 communities into supernodes, re-run the local
    move), hard-oracled by syn_oracle_kg.syn_leiden_l1_sql's exact
    level-0 label replay + contraction + second recursive-CTE replay."""
    import pandas as pd

    res = _syn(sf_dir)
    comm, _ = detect_communities(res.entities, res.edges)
    df = comm.to_pandas()
    df = df[df["level"] == 1]
    if df.empty:
        return pd.DataFrame({"entity_id": pd.Series(dtype="str"),
                             "community_rep": pd.Series(dtype="str")})
    rep = df.groupby("community_id")["entity_id"].transform("min")
    return (pd.DataFrame({"entity_id": df["entity_id"],
                          "community_rep": rep})
            .sort_values("entity_id").reset_index(drop=True))


def syn_leiden_l2(sf_dir: str):
    """Hierarchical Leiden LEVEL 2 over the syn graph, canonicalized for
    partition equality — the last rung of detect_communities'
    max_levels=3 (oracle syn_oracle_kg.syn_leiden_l2_sql)."""
    import pandas as pd

    res = _syn(sf_dir)
    comm, _ = detect_communities(res.entities, res.edges)
    df = comm.to_pandas()
    df = df[df["level"] == 2]
    if df.empty:
        return pd.DataFrame({"entity_id": pd.Series(dtype="str"),
                             "community_rep": pd.Series(dtype="str")})
    rep = df.groupby("community_id")["entity_id"].transform("min")
    return (pd.DataFrame({"entity_id": df["entity_id"],
                          "community_rep": rep})
            .sort_values("entity_id").reset_index(drop=True))


def syn_louvain(sf_dir: str):
    """L3 Louvain-as-shipped over the syn graph (driver-oracled)."""
    from .stages import graph_analytics as ga

    df = ga.louvain_communities(_syn(sf_dir).edges).to_pandas()
    df["modularity"] = _round4(df["modularity"].to_numpy())
    return df


def syn_graph_metrics(sf_dir: str):
    """L3 density + clustering coefficient over the syn graph
    (driver-oracled)."""
    from .stages import graph_analytics as ga

    df = ga.graph_metrics(_syn(sf_dir).edges)
    df["value"] = _round4(df["value"].to_numpy())
    return df


def syn_pagerank(sf_dir: str):
    """L2 PageRank over the syn graph (driver-oracled: same recursive-CTE
    power iteration as kgx_pagerank, here on the fuzzy-merged graph)."""
    from .stages import graph_analytics as ga

    res = _syn(sf_dir)
    df = ga.pagerank(res.entities, res.edges).to_pandas()
    df["score"] = _round4(df["score"].to_numpy())
    return df


def syn_centrality(sf_dir: str):
    """L3 centralities over the syn graph (driver-oracled: the distributed
    per-source-batch Brandes path runs exact below max_exact_sources; the
    SQL twin rebuilds every source's deterministic shortest-path tree)."""
    from .stages import graph_analytics as ga

    df = ga.centrality_scores(_syn(sf_dir).edges).to_pandas()
    for c in ("degree", "betweenness", "closeness"):
        df[c] = _round4(df[c].to_numpy())
    return df


def _dual_retrieval(sf_dir: str, strategy: str):
    """T2/LightRAG dual-level retrieval over the driver documents table:
    high level = BM25 over the 12-word abstract index, low level = BM25
    over full text (lightrag/dual_retrieval.rs; SQL-oracled merge)."""
    from .stages.retrieval import dual_level_retrieve

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])

    def abstract(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "text": pa.array([" ".join(t.split(" ")[:12]) for t in texts],
                                 pa.string()),
            }
        )

    high_store = docs.map_batches(abstract, batch_format="pyarrow")
    return dual_level_retrieve(
        high_store, docs,
        high_keywords=("data", "window"),
        low_keywords=("spark", "table", "join", "vector"),
        top_k=10, strategy=strategy,
    )


def dual_retrieval_topk(sf_dir: str):
    return _dual_retrieval(sf_dir, "interleave")


def dual_retrieval_weighted(sf_dir: str):
    return _dual_retrieval(sf_dir, "weighted")


def syn_contextual_chunks(sf_dir: str):
    """Contextual chunk enrichment (Anthropic contextual-retrieval
    pattern, text/contextual_enricher.rs) over the spans corpus —
    driver-oracled: the mock context LLM answers with the document's
    first-sentence prefix, so enriched content and the per-doc num_ctx
    are fully SQL-derivable."""
    from .stages.enrich import ContextualEnricher

    docs = spans_dataset_from_flat_parquet(f"{sf_dir}/documents.parquet")
    return docs.map_batches(
        ContextualEnricher, batch_format="pyarrow", concurrency=(1, 4))


def syn_anchors(sf_dir: str):
    """Symbolic anchoring (CatRAG, retrieval/symbolic_anchoring.rs) for
    the fixed ANCHOR_QUERIES over the syn graph — driver-oracled: concept
    extraction constants hand-derived, grounding + count relevance + the
    top-5 ranking replayed in SQL."""
    import pandas as pd

    from .functions.anchoring import ANCHOR_QUERIES, extract_anchors

    res = _syn(sf_dir)
    ents = sorted(
        (r["canonical_id"], r["canonical_name"], r["entity_type"])
        for r in res.entities.select_columns(
            ["canonical_id", "canonical_name", "entity_type"]).take_all())
    rels: dict[str, list] = {}
    for r in res.edges.select_columns(["src", "rel_type"]).take_all():
        rels.setdefault(r["src"], []).append(r["rel_type"])
    rows = []
    for query in ANCHOR_QUERIES:
        for a in extract_anchors(query, ents, rels, min_relevance=0.1):
            rows.append({
                "query": query,
                "concept": a["concept"],
                "n_entities": len(a["grounded_entities"]),
                "entities": "|".join(sorted(a["grounded_entities"])),
                "relevance": _round4([a["relevance_score"]])[0],
            })
    return pd.DataFrame(rows)


def kgx_causal_chains(sf_dir: str):
    """Causal chain discovery with temporal validation
    (retrieval/causal_analysis.rs) over the md5-derived kgxc DAG —
    driver-oracled: per-pair dedup, BFS path enumeration, weighted
    confidence products and temporal monotonicity all replayed as a
    recursive CTE. Edge generation is distributed; chain search runs on
    the deduped <=56-edge graph (small-side disposition, like
    PageRank)."""
    import pandas as pd

    from . import kgx
    from .stages.temporal import find_causal_chains

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"])

    def edge_rows(batch: pa.Table) -> pa.Table:
        rows = [kgx.kgxc_edge_for_doc(int(d))
                for d in batch.column("doc_id").to_pylist()]
        return pa.Table.from_pylist(rows)

    raw = docs.map_batches(edge_rows, batch_format="pyarrow").take_all()
    # per-(src,dst) dedup: highest confidence grid, then (rel, year)
    raw.sort(key=lambda e: (e["src"], e["dst"], -e["c50"], e["rel_type"],
                            e["t_start"]))
    edges, seen = [], set()
    for e in raw:
        key = (e["src"], e["dst"])
        if key not in seen:
            seen.add(key)
            edges.append(e)
    chains = find_causal_chains(edges, "EV0", "EV7", max_depth=5)
    return pd.DataFrame([
        {"path": c["path"], "n_steps": c["n_steps"],
         "total_confidence": _round4([c["total_confidence"]])[0],
         "temporal_consistency": c["temporal_consistency"],
         "time_span": c["time_span"]}
        for c in chains])


def kgx_structure(sf_dir: str):
    """Hierarchical document structure (document_structure.rs +
    markdown.rs build_sections/build_hierarchy) over the kgxs corpus —
    driver-oracled: stack-rule parents, depths, heading paths and content
    spans all re-derived in SQL from the md5 level sequence."""
    from . import kgx
    from .stages.layout import structure_batch

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"])

    def to_text(batch: pa.Table) -> pa.Table:
        ids = [int(d) for d in batch.column("doc_id").to_pylist()]
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array([str(d) for d in ids], pa.string()),
                "text": pa.array([kgx.kgxs_text(d) for d in ids],
                                 pa.string()),
            }
        )

    return docs.map_batches(to_text, batch_format="pyarrow").map_batches(
        structure_batch, batch_format="pyarrow")


def syn_query_analysis(sf_dir: str):
    """Rule-based query analysis (retrieval/mod.rs:497-581) for the fixed
    ANALYSIS_QUERIES set against the syn canonical entities —
    driver-oracled: containment matching, the type cascade, intent
    precedence and the complexity formula all replayed in SQL."""
    import pandas as pd

    from .stages.retrieval import ANALYSIS_QUERIES, analyze_query

    names = sorted(
        r["canonical_name"]
        for r in _syn(sf_dir).entities.select_columns(
            ["canonical_name"]).take_all())
    rows = []
    for query in ANALYSIS_QUERIES:
        a = analyze_query(query, names)
        rows.append({
            "query": query,
            "query_type": a["query_type"],
            "intent": a["intent"],
            "key_entities": "|".join(a["key_entities"]),
            "concepts": "|".join(a["concepts"]),
            "complexity": _round4([a["complexity_score"]])[0],
        })
    return pd.DataFrame(rows)


def syn_boundaries(sf_dir: str):
    """BAR-RAG semantic boundary detection over the synth spans corpus
    (driver-oracled: every synth sentence terminal is a boundary, title
    abbreviations suppressed — the SQL twin emits cumulative
    sentence-length positions)."""
    from .functions.boundaries import detect_boundaries
    from .stages.chunk import texts_from_spans

    docs = spans_dataset_from_flat_parquet(
        f"{sf_dir}/documents.parquet", include_base_text=False)

    def fn(batch: pa.Table) -> pa.Table:
        out = {"doc_id": [], "position": [], "boundary_type": [],
               "confidence": []}
        texts = texts_from_spans(batch.column("spans"))
        for doc_id, text in zip(batch.column("doc_id").to_pylist(), texts):
            for b in detect_boundaries(text):
                out["doc_id"].append(doc_id)
                out["position"].append(b.position)
                out["boundary_type"].append(b.boundary_type)
                out["confidence"].append(round(b.confidence, 4))
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(out["doc_id"], pa.string()),
                "position": pa.array(out["position"], pa.int64()),
                "boundary_type": pa.array(out["boundary_type"], pa.string()),
                "confidence": pa.array(out["confidence"], pa.float64()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow")


def kg_boundary_chunks(sf_dir: str):
    """Boundary-aware chunking strategy (BAR-RAG sync path) over the spans
    corpus — sentence-packed chunks capped at 2000 chars."""
    from .stages.chunk import make_chunk_batch_fn

    docs = spans_dataset_from_flat_parquet(f"{sf_dir}/documents.parquet")
    return docs.map_batches(
        make_chunk_batch_fn(strategy="boundary_aware", chunk_size=2000),
        batch_format="pyarrow",
    ).select_columns(["chunk_id", "doc_id", "chunk_idx", "start_offset",
                      "end_offset"])


def syn_incremental(sf_dir: str):
    """§2.10 incremental build over the SYNTH corpus: extract the even-doc
    half first (the 'previous run'), then incrementally add the odd half —
    union the persisted extraction partials and re-run the
    canonicalization → edges tail. Triples must equal the full rebuild
    (oracle = syn_triples_sql), pinning incremental semantics against the
    FUZZY-merged graph: newly added docs' typo variants can flip canonical
    picks, and the tail re-canonicalizes globally, so equality must hold."""
    import pyarrow.compute as pc

    from .pipelines.incremental import (extraction_for_docs,
                                        incremental_update)

    def half(parity: int):
        docs = spans_dataset_from_flat_parquet(
            f"{sf_dir}/documents.parquet", include_base_text=False)

        def fn(batch: pa.Table) -> pa.Table:
            nums = pc.cast(
                pc.utf8_slice_codeunits(batch.column("doc_id"), 4, 32),
                pa.int64())
            return batch.filter(pc.equal(pc.bit_wise_and(nums, 1), parity))

        return docs.map_batches(fn, batch_format="pyarrow")

    old_ex = extraction_for_docs(half(0), SYN_CFG)
    res = incremental_update(old_ex, half(1), SYN_CFG)
    return res.triples.select_columns(["subj", "pred", "obj",
                                       "n_occurrences"])


def syn_mentions(sf_dir: str):
    """M12 mention offsets over the syn corpus (driver-oracled: the SQL
    twin replays the non-overlapping occurrence scan as a recursive CTE,
    repeated per extraction event)."""
    from .stages.extract import make_mentions_batch_fn

    ds = _syn(sf_dir).chunks.map_batches(
        make_mentions_batch_fn(0.7, ("PERSON", "ORGANIZATION", "LOCATION")),
        batch_format="pyarrow",
    )

    def project(batch: pa.Table) -> pa.Table:
        conf = batch.column("confidence").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "entity_id": batch.column("entity_id"),
                "chunk_id": batch.column("chunk_id"),
                "start_offset": batch.column("start_offset"),
                "end_offset": batch.column("end_offset"),
                "confidence": pa.array(_round4(conf), pa.float64()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


def kgx_edges(sf_dir: str):
    return _kgx(sf_dir).edges.select_columns(
        ["src", "dst", "rel_type", "n_occurrences"]
    )


def kgx_triples(sf_dir: str):
    return _kgx(sf_dir).triples.select_columns(
        ["subj", "pred", "obj", "n_occurrences"]
    )


def kgx_chunks(sf_dir: str):
    """Chunk-content fidelity over the kgx corpus (one chunk per doc; the
    oracle re-renders each sentence with SQL replace())."""

    def project(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "chunk_id": batch.column("chunk_id"),
                "doc_id": pa.array(
                    [int(d) for d in batch.column("doc_id").to_pylist()],
                    pa.int64(),
                ),
                "content": batch.column("content"),
            }
        )

    return _kgx(sf_dir).chunks.map_batches(project, batch_format="pyarrow")


def kgx_mentions(sf_dir: str):
    """M12 mention offsets over the kgx corpus (driver-oracled: the SQL
    side recomputes each entity's occurrence offsets with strpos)."""
    from .stages.extract import make_mentions_batch_fn

    ds = _kgx(sf_dir).chunks.map_batches(
        make_mentions_batch_fn(0.7, ("PERSON", "ORGANIZATION", "LOCATION")),
        batch_format="pyarrow",
    )

    def project(batch: pa.Table) -> pa.Table:
        conf = batch.column("confidence").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "entity_id": batch.column("entity_id"),
                "chunk_id": batch.column("chunk_id"),
                "start_offset": batch.column("start_offset"),
                "end_offset": batch.column("end_offset"),
                "confidence": pa.array(_round4(conf), pa.float64()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


def kgx_stats(sf_dir: str):
    """G9 graph statistics over the kgx graph (driver-oracled twin of
    kg_stats — same stage code, SQL-derivable expectation)."""
    from .stages import graph_analytics as ga

    res = _kgx(sf_dir)
    n_docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).count()
    df = ga.graph_stats(res.entities, res.edges, n_docs, res.chunks.count())
    df["value"] = _round4(df["value"].to_numpy())
    return df


def kgx_cooccur(sf_dir: str):
    """G8 co-occurrence edges over the kgx corpus (driver-oracled twin of
    kg_cooccur_edges)."""
    from .stages import graph_analytics as ga
    from .stages.joins import derived_join_buckets

    ds = ga.doc_cooccurrence_edges(
        _kgx(sf_dir).extraction,
        num_buckets=derived_join_buckets(sf_dir, "documents",
                                         floor=64, rows_per_bucket=512))

    def project(batch: pa.Table) -> pa.Table:
        conf = batch.column("confidence").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "src": batch.column("src"),
                "dst": batch.column("dst"),
                "n_docs": batch.column("n_docs"),
                "rel_type": batch.column("rel_type"),
                "confidence": pa.array(_round4(conf), pa.float64()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


def kgx_common_entities(sf_dir: str):
    """T4 top-k common entities over the kgx graph (driver-oracled)."""
    from .stages import graph_analytics as ga

    return ga.common_entities(_kgx(sf_dir).entities)


def kgx_components(sf_dir: str):
    """L3 connected components + degree over the kgx graph
    (driver-oracled: union-find root == min id of the component)."""
    from .stages import graph_analytics as ga

    res = _kgx(sf_dir)
    return ga.connected_components(res.entities, res.edges)


def kgx_triangles(sf_dir: str):
    """Per-node triangle counts over the kgx graph (driver-oracled:
    ordered triple-join twin)."""
    from .stages import graph_analytics as ga

    res = _kgx(sf_dir)
    return ga.triangle_counts(res.entities, res.edges)


def kgx_kcore(sf_dir: str):
    """2-core membership + within-core degree over the kgx graph
    (driver-oracled: unrolled-peel twin)."""
    from .stages import graph_analytics as ga

    res = _kgx(sf_dir)
    return ga.kcore(res.entities, res.edges, k=2)


def kgx_link_pred(sf_dir: str):
    """Adamic-Adar link prediction over the kgx graph (driver-oracled)."""
    from .stages import graph_analytics as ga

    res = _kgx(sf_dir)
    return ga.link_prediction(res.entities, res.edges)


def kgx_lpa(sf_dir: str):
    """Synchronous label-propagation communities (8 fixed rounds) over
    the kgx graph (driver-oracled: unrolled-round twin)."""
    from .stages import graph_analytics as ga

    res = _kgx(sf_dir)
    return ga.label_propagation(res.entities, res.edges, rounds=8)


def syn_link_pred(sf_dir: str):
    """Adamic-Adar link prediction over the replayed syn graph."""
    from .stages import graph_analytics as ga

    res = _syn(sf_dir)
    return ga.link_prediction(res.entities, res.edges)


def syn_lpa(sf_dir: str):
    """Synchronous LPA communities over the replayed syn graph."""
    from .stages import graph_analytics as ga

    res = _syn(sf_dir)
    return ga.label_propagation(res.entities, res.edges, rounds=8)


def kgx_assortativity(sf_dir: str):
    """Degree assortativity over the kgx graph (integer-sum contract)."""
    from .stages import graph_analytics as ga

    res = _kgx(sf_dir)
    return ga.assortativity(res.entities, res.edges)


def kgx_component_sizes(sf_dir: str):
    """Component-size histogram over the kgx graph."""
    from .stages import graph_analytics as ga

    res = _kgx(sf_dir)
    return ga.component_sizes(res.entities, res.edges)


def syn_assortativity(sf_dir: str):
    """Degree assortativity over the replayed syn graph."""
    from .stages import graph_analytics as ga

    res = _syn(sf_dir)
    return ga.assortativity(res.entities, res.edges)


def syn_component_sizes(sf_dir: str):
    """Component-size histogram over the replayed syn graph."""
    from .stages import graph_analytics as ga

    res = _syn(sf_dir)
    return ga.component_sizes(res.entities, res.edges)


def kgx_eccentricity(sf_dir: str):
    """Per-node eccentricity over the kgx graph (driver-oracled:
    bounded-BFS recursive twin)."""
    from .stages import graph_analytics as ga

    res = _kgx(sf_dir)
    return ga.eccentricity(res.entities, res.edges)


def syn_eccentricity(sf_dir: str):
    """Per-node eccentricity over the replayed syn graph."""
    from .stages import graph_analytics as ga

    res = _syn(sf_dir)
    return ga.eccentricity(res.entities, res.edges)


def syn_triangles(sf_dir: str):
    """Per-node triangle counts over the replayed syn graph."""
    from .stages import graph_analytics as ga

    res = _syn(sf_dir)
    return ga.triangle_counts(res.entities, res.edges)


def syn_kcore(sf_dir: str):
    """2-core membership + within-core degree over the syn graph."""
    from .stages import graph_analytics as ga

    res = _syn(sf_dir)
    return ga.kcore(res.entities, res.edges, k=2)


def kgx_leiden(sf_dir: str):
    """L1 Leiden over the kgx graph, canonicalized for partition equality
    — level-0 output of the REAL detect_communities stage, hard-oracled by
    the same recursive-CTE local-move replay as syn_leiden
    (syn_oracle_kg.kgx_leiden_sql)."""
    import pandas as pd

    res = _kgx(sf_dir)
    comm, _ = detect_communities(res.entities, res.edges)
    df = comm.to_pandas()
    df = df[df["level"] == 0]
    rep = df.groupby("community_id")["entity_id"].transform("min")
    return (pd.DataFrame({"entity_id": df["entity_id"],
                          "community_rep": rep})
            .sort_values("entity_id").reset_index(drop=True))


def kgx_rel_hierarchy(sf_dir: str):
    """L4 hierarchical relationship clustering over a pinned 64-edge kgx
    fixture (sorted (src,dst,rel_type) then limit — deterministic input
    order, so the 'r{i}' relationship-node naming is SQL-replayable):
    per-level cluster rows from the REAL relationship_hierarchy stage,
    hard-oracled by a resolution-sweep pair of recursive-CTE Leiden
    replays over the per-type-clique similarity graph
    (syn_oracle_kg.kgx_rel_hierarchy_sql)."""
    from .stages.community import relationship_hierarchy

    res = _kgx(sf_dir)
    edges64 = (res.edges.select_columns(["src", "dst", "rel_type"])
               .sort(["src", "dst", "rel_type"]).limit(64))
    _members, clusters = relationship_hierarchy(edges64)
    df = clusters.to_pandas()
    df["cohesion"] = _round4(df["cohesion"].to_numpy())
    return df


def kgx_leiden_l1(sf_dir: str):
    """Hierarchical Leiden LEVEL 1 over the kgx graph, canonicalized for
    partition equality (twin of syn_leiden_l1; oracle
    syn_oracle_kg.kgx_leiden_l1_sql)."""
    import pandas as pd

    res = _kgx(sf_dir)
    comm, _ = detect_communities(res.entities, res.edges)
    df = comm.to_pandas()
    df = df[df["level"] == 1]
    if df.empty:
        return pd.DataFrame({"entity_id": pd.Series(dtype="str"),
                             "community_rep": pd.Series(dtype="str")})
    rep = df.groupby("community_id")["entity_id"].transform("min")
    return (pd.DataFrame({"entity_id": df["entity_id"],
                          "community_rep": rep})
            .sort_values("entity_id").reset_index(drop=True))


def kgx_louvain(sf_dir: str):
    """L3 Louvain-as-shipped over the kgx graph (driver-oracled)."""
    from .stages import graph_analytics as ga

    df = ga.louvain_communities(_kgx(sf_dir).edges).to_pandas()
    df["modularity"] = _round4(df["modularity"].to_numpy())
    return df


def kgx_graph_metrics(sf_dir: str):
    """L3 density + clustering coefficient over the kgx graph
    (driver-oracled)."""
    from .stages import graph_analytics as ga

    df = ga.graph_metrics(_kgx(sf_dir).edges)
    df["value"] = _round4(df["value"].to_numpy())
    return df


def kgx_centrality(sf_dir: str):
    """L3 centralities over the kgx graph (driver-oracled: the SQL twin
    rebuilds each source's deterministic shortest-path tree)."""
    from .stages import graph_analytics as ga

    df = ga.centrality_scores(_kgx(sf_dir).edges).to_pandas()
    for c in ("degree", "betweenness", "closeness"):
        df[c] = _round4(df[c].to_numpy())
    return df


def kgx_pagerank(sf_dir: str):
    """L2 PageRank over the kgx graph (driver-oracled: the SQL twin runs
    the same damped power iteration as a recursive CTE)."""
    from .stages import graph_analytics as ga

    res = _kgx(sf_dir)
    df = ga.pagerank(res.entities, res.edges).to_pandas()
    df["score"] = _round4(df["score"].to_numpy())
    return df


def kgx_atomic_facts(sf_dir: str):
    """M10/A5 atomic facts over the kgx corpus (driver-oracled: the SQL
    twin renders each template's single hand-derived fact)."""
    from .stages.atomic_facts import facts_batch

    ds = _kgx(sf_dir).chunks.map_batches(facts_batch, batch_format="pyarrow")

    def project(batch: pa.Table) -> pa.Table:
        conf = batch.column("confidence").to_numpy(zero_copy_only=False)
        return batch.set_column(
            batch.schema.get_field_index("confidence"), "confidence",
            pa.array(_round4(conf), pa.float64()),
        )

    return ds.map_batches(project, batch_format="pyarrow")


def kgx_validated_facts(sf_dir: str):
    """A4 triple reflection over the kgx facts (driver-oracled: subj/obj
    are verbatim slot values, so the mock validator accepts everything —
    the oracle checks nothing is dropped and the pred transform)."""
    from .stages.atomic_facts import extract_facts
    from .stages.validate import TripleValidationStage

    def facts_with_context(batch: pa.Table) -> pa.Table:
        out = {"chunk_id": [], "subj": [], "pred": [], "obj": [],
               "context_text": []}
        for chunk_id, text in zip(batch.column("chunk_id").to_pylist(),
                                  batch.column("content").to_pylist()):
            for f in extract_facts(text):
                out["chunk_id"].append(chunk_id)
                out["subj"].append(f["subj"])
                out["pred"].append(f["pred"].upper().replace(" ", "_"))
                out["obj"].append(f["obj"])
                out["context_text"].append(text)
        return pa.Table.from_pydict(out)

    candidates = _kgx(sf_dir).chunks.map_batches(
        facts_with_context, batch_format="pyarrow")
    validated = candidates.map_batches(
        TripleValidationStage, batch_format="pyarrow", concurrency=(1, 4))

    def project(batch: pa.Table) -> pa.Table:
        conf = batch.column("validation_confidence").to_numpy(
            zero_copy_only=False)
        batch = batch.set_column(
            batch.schema.get_field_index("validation_confidence"),
            "validation_confidence", pa.array(_round4(conf), pa.float64()),
        )
        return batch.select(["chunk_id", "subj", "pred", "obj", "is_valid",
                             "validation_confidence"])

    return validated.map_batches(project, batch_format="pyarrow")


def kgx_gleaning(sf_dir: str):
    """A1/A2 gleaning extraction (MockLLM, min_confidence 0.7) over the kgx
    corpus, aggregated batch-invariantly: per-doc entity rows plus the
    globally distinct edge triple set (driver-oracled — the SQL twin
    derives the expected rows incl. the name-keyed JSON round trip's
    two-word-location PERSON→LOCATION endpoint rewrite)."""
    from ray.data.aggregate import Count

    from .stages.llm_extract import GleaningExtractor, MockLLM

    out = _kgx(sf_dir).chunks.map_batches(
        GleaningExtractor,
        fn_constructor_kwargs={"llm": MockLLM(min_confidence=0.7)},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def ent_project(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.equal(batch.column("row_kind"), "entity"))
        n = batch.num_rows
        return pa.Table.from_pydict(
            {
                "row_kind": pa.array(["entity"] * n, pa.string()),
                "doc_id": batch.column("doc_id"),
                "entity_id": batch.column("entity_id"),
                "name": batch.column("name"),
                "entity_type": batch.column("entity_type"),
                "src_id": pa.array([None] * n, pa.string()),
                "dst_id": pa.array([None] * n, pa.string()),
                "rel_type": pa.array([None] * n, pa.string()),
            }
        )

    def edge_project(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.Table.from_pydict(
            {
                "row_kind": pa.array(["edge"] * n, pa.string()),
                "doc_id": pa.array([None] * n, pa.string()),
                "entity_id": pa.array([None] * n, pa.string()),
                "name": pa.array([None] * n, pa.string()),
                "entity_type": pa.array([None] * n, pa.string()),
                "src_id": batch.column("src_id"),
                "dst_id": batch.column("dst_id"),
                "rel_type": batch.column("rel_type"),
            }
        )

    ents = out.map_batches(ent_project, batch_format="pyarrow")
    edges = (
        out.filter(lambda r: r["row_kind"] == "edge")
        .groupby(["src_id", "dst_id", "rel_type"])
        .aggregate(Count(alias_name="n"))
        .drop_columns(["n"])
        .map_batches(edge_project, batch_format="pyarrow")
    )
    return ents.union(edges)


def kgx_enriched(sf_dir: str):
    """M4 chunk enrichment over the kgx corpus (driver-oracled: TF-IDF
    keyword ranking, trivial single-sentence summary and chapter are all
    SQL-recomputable; keywords pipe-joined for a stable value compare)."""
    from .stages.enrich import enrich_chunks

    res = _kgx(sf_dir)
    n_docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]).count()
    ds = enrich_chunks(res.chunks.materialize(), total_docs=n_docs)

    def project(batch: pa.Table) -> pa.Table:
        kws = batch.column("keywords").to_pylist()
        return pa.Table.from_pydict(
            {
                "chunk_id": batch.column("chunk_id"),
                "keywords": pa.array(["|".join(k) for k in kws], pa.string()),
                "summary": batch.column("summary"),
                "chapter": batch.column("chapter"),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


def kgx_metadata_search(sf_dir: str):
    """Enriched metadata-aware retrieval (retrieval/enriched.rs) over the
    kgx enriched chunks — driver-oracled: the keyword/summary boosting and
    the significance gate replayed in SQL over the enrichment replay."""
    from . import kgx
    from .stages.enrich import enrich_chunks
    from .stages.enriched_retrieval import make_metadata_search_fn

    res = _kgx(sf_dir)
    n_docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]).count()
    ds = enrich_chunks(res.chunks.materialize(), total_docs=n_docs)
    out = ds.map_batches(
        make_metadata_search_fn(kgx.METADATA_SEARCH_QUERY),
        batch_format="pyarrow")

    def project(batch: pa.Table) -> pa.Table:
        s = batch.column("score").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {"chunk_id": batch.column("chunk_id"),
             "score": pa.array(_round4(s), pa.float64())})

    return out.map_batches(project, batch_format="pyarrow")


def kgx_csv_import(sf_dir: str):
    """S2 CSV import, driver-oracled: a CSV of (name, type, confidence)
    rows derived from the md5 choices goes through the distributed CSV
    reader + entity parser; the grouped result (count + max confidence)
    is md5-recomputable in SQL."""
    import hashlib
    import os

    from ray.data.aggregate import Count, Max

    from . import kgx
    from .sources.importer import import_entities

    doc_ids = pq.read_table(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"]).column("doc_id").to_pylist()
    lines = ["name,type,confidence"]
    for d in sorted(doc_ids):
        c = kgx.kgx_choices(int(d))
        conf = (kgx._h(int(d), 6) % 100) / 100.0
        lines.append(f"{kgx.KGX_PERSONS[c['p']]},person,{conf:.2f}")
    content = "\n".join(lines) + "\n"
    tag = hashlib.md5(content.encode()).hexdigest()[:12]
    path = f"/tmp/graphrag_ray_csv_{tag}.csv"
    if not os.path.exists(path):
        with open(path, "w") as f:
            f.write(content)
    ents, _errors = import_entities(path)
    agg = (ents.groupby(["entity_id", "name", "entity_type"])
           .aggregate(Count(alias_name="n"),
                      Max("confidence", alias_name="max_conf")))

    def project(batch: pa.Table) -> pa.Table:
        conf = batch.column("max_conf").to_numpy(zero_copy_only=False)
        return batch.set_column(
            batch.schema.get_field_index("max_conf"), "max_conf",
            pa.array(_round4(conf), pa.float64()))

    return agg.map_batches(project, batch_format="pyarrow")


def kgx_graphml_import(sf_dir: str):
    """S2 GraphML import, driver-oracled: a GraphML file (node
    declarations with name/type data keys + one edge per doc from the md5
    choices) goes through the distributed parser; entity rows and
    aggregated relationship counts are both md5-recomputable in SQL."""
    import hashlib
    import os

    from ray.data.aggregate import Count

    from . import kgx
    from .sources.importer import import_graph_files

    doc_ids = pq.read_table(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"]).column("doc_id").to_pylist()
    lines = ['<?xml version="1.0"?>',
             '<graphml xmlns="http://graphml.graphdrawing.org/xmlns">',
             '<key id="d0" for="node" attr.name="name"/>',
             '<key id="d1" for="node" attr.name="type"/>',
             '<key id="d2" for="edge" attr.name="type"/>',
             '<graph edgedefault="directed">']
    for i, name in enumerate(kgx.KGX_PERSONS):
        lines.append(f'<node id="p{i}"><data key="d0">{name}</data>'
                     f'<data key="d1">person</data></node>')
    for i, (name, _sfx) in enumerate(kgx.KGX_ORGS):
        lines.append(f'<node id="o{i}"><data key="d0">{name}</data>'
                     f'<data key="d1">org</data></node>')
    for d in sorted(doc_ids):
        c = kgx.kgx_choices(int(d))
        lines.append(f'<edge source="p{c["p"]}" target="o{c["o"]}">'
                     f'<data key="d2">r{c["tid"]}</data></edge>')
    lines.append("</graph></graphml>")
    content = "\n".join(lines)
    tag = hashlib.md5(content.encode()).hexdigest()[:12]
    path = f"/tmp/graphrag_ray_gml_{tag}.graphml"
    if not os.path.exists(path):
        with open(path, "w") as f:
            f.write(content)
    rows = import_graph_files(path, fmt="graphml")
    ents = (rows.filter(lambda r: r["row_kind"] == "entity")
            .select_columns(["entity_id", "name", "entity_type"]))

    def ent_project(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.Table.from_pydict(
            {
                "row_kind": pa.array(["entity"] * n, pa.string()),
                "entity_id": batch.column("entity_id"),
                "name": batch.column("name"),
                "entity_type": batch.column("entity_type"),
                "src": pa.array([None] * n, pa.string()),
                "dst": pa.array([None] * n, pa.string()),
                "rel_type": pa.array([None] * n, pa.string()),
                "n": pa.array([None] * n, pa.int64()),
            }
        )

    rels = (rows.filter(lambda r: r["row_kind"] == "relationship")
            .select_columns(["src", "dst", "rel_type"])
            .groupby(["src", "dst", "rel_type"])
            .aggregate(Count(alias_name="n")))

    def rel_project(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.Table.from_pydict(
            {
                "row_kind": pa.array(["relationship"] * n, pa.string()),
                "entity_id": pa.array([None] * n, pa.string()),
                "name": pa.array([None] * n, pa.string()),
                "entity_type": pa.array([None] * n, pa.string()),
                "src": batch.column("src"),
                "dst": batch.column("dst"),
                "rel_type": batch.column("rel_type"),
                "n": batch.column("n"),
            }
        )

    return (ents.map_batches(ent_project, batch_format="pyarrow")
            .union(rels.map_batches(rel_project, batch_format="pyarrow")))


def kgx_ppr(sf_dir: str, k: int = 10):
    """T2/HippoRAG-style personalized-PageRank retrieval over the kgx
    graph (retrieval/hipporag_ppr.rs, pagerank_retrieval.rs): reset mass
    concentrated on the lexicographically first canonical entity (the
    deterministic 'query seed'); top-k nodes by (round4 score DESC, id).
    Driver-oracled by the recursive-CTE power iteration with the
    indicator reset vector."""
    from .stages import graph_analytics as ga

    res = _kgx(sf_dir)
    seed = min(r["canonical_id"] for r in
               res.entities.select_columns(["canonical_id"]).take_all())
    df = ga.pagerank(res.entities, res.edges,
                     personalization={seed: 1.0}).to_pandas()
    df["score"] = _round4(df["score"].to_numpy())
    return (df.sort_values(["score", "entity_id"], ascending=[False, True])
            .head(k).reset_index(drop=True))


def bm25_topk(sf_dir: str, query: str = "spark table join vector",
              k: int = 10):
    """T2 keyword retrieval: distributed BM25 ranking over the documents
    table (retrieval/bm25.rs semantics — Lucene idf, normalized tf,
    k1=1.2 b=0.75), SQL-oracled."""
    from .stages.retrieval import bm25_topk as _bm25

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    return _bm25(docs, query, k=k)


def kgx_community_summaries(sf_dir: str):
    """A9 extractive community summaries, driver-oracled: the REAL
    summarizer (stages/community.py _summaries — sorted members, per-type
    top-5 lines, 'and N more' overflow) runs over the kgx graph's
    connected-component partition (dense ids in root order), which SQL can
    rebuild; Leiden itself stays pytest-gated (its local-move order is not
    SQL-expressible)."""
    from .stages import graph_analytics as ga
    from .stages.community import _summaries

    res = _kgx(sf_dir)
    comp = ga.connected_components(res.entities, res.edges).to_pandas()
    roots = sorted(comp["component"].unique())
    rid = {r: i for i, r in enumerate(roots)}
    partition = {e: rid[c] for e, c in zip(comp["entity_id"],
                                           comp["component"])}
    ent = res.entities.select_columns(
        ["canonical_id", "canonical_name", "entity_type"]).to_pandas()
    meta = {i: (n, t) for i, n, t in zip(ent["canonical_id"],
                                         ent["canonical_name"],
                                         ent["entity_type"])}
    import pandas as pd

    return pd.DataFrame(_summaries(partition, meta))


def kgx_layout(sf_dir: str):
    """S8 layout parsers, driver-oracled: even docs get a markdown layout,
    odd docs an HTML layout, both built from the md5 slot choices around
    the rendered kgx sentence; the distributed section parser's
    (level, title, start_offset) rows are recomputed in SQL from the
    template component lengths."""
    from . import kgx
    from .stages.layout import sections_batch

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"])

    def to_text(batch: pa.Table) -> pa.Table:
        ids, texts = [], []
        for d in batch.column("doc_id").to_pylist():
            d = int(d)
            c = kgx.kgx_choices(d)
            p = kgx.KGX_PERSONS[c["p"]]
            loc = kgx.KGX_LOCS[c["l"]][0]
            s = kgx.kgx_sentence(d)
            if d % 2 == 0:
                text = f"# Intro {p}\n{s}\n## More {loc}\n{s}\n"
            else:
                text = f"<h1>Main {p}</h1><p>{s}</p><h2>Sub {loc}</h2>"
            ids.append(str(d))
            texts.append(text)
        return pa.Table.from_pydict(
            {"doc_id": pa.array(ids, pa.string()),
             "text": pa.array(texts, pa.string())}
        )

    return docs.map_batches(to_text, batch_format="pyarrow").map_batches(
        sections_batch, batch_format="pyarrow")


def kgx_incremental(sf_dir: str):
    """§2.10 incremental build, driver-oracled: extract the even-doc half
    first (the 'previous run'), then incrementally add the odd-doc half —
    union the persisted extraction partials and re-run only the
    canonicalization → edges tail. The resulting triples must equal the
    full-corpus expectation (the same oracle as kgx_triples), which pins
    the incremental path's semantics to a from-scratch rebuild."""
    import pyarrow.compute as pc

    from . import kgx
    from .pipelines.incremental import (extraction_for_docs,
                                        incremental_update)

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"])

    def spans_half(parity: int):
        def fn(batch: pa.Table) -> pa.Table:
            keep = pc.equal(pc.bit_wise_and(batch.column("doc_id"), 1),
                            parity)
            return kgx.kgx_spans_batch(batch.filter(keep))

        return fn

    old_ex = extraction_for_docs(
        docs.map_batches(spans_half(0), batch_format="pyarrow"), KGX_CFG)
    res = incremental_update(
        old_ex, docs.map_batches(spans_half(1), batch_format="pyarrow"),
        KGX_CFG)
    return res.triples.select_columns(["subj", "pred", "obj",
                                       "n_occurrences"])


def kgx_yake(sf_dir: str):
    """YAKE keywords over the kgx corpus (driver-oracled: the SQL twin
    recomputes every YAKE feature and the score formula op-for-op)."""
    from .stages.enrich import enrich_chunks

    res = _kgx(sf_dir)
    n_docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]).count()
    ds = enrich_chunks(res.chunks.materialize(), total_docs=n_docs,
                       algorithm="yake")

    def project(batch: pa.Table) -> pa.Table:
        kws = batch.column("keywords").to_pylist()
        return pa.Table.from_pydict(
            {
                "chunk_id": batch.column("chunk_id"),
                "keywords": pa.array(["|".join(k) for k in kws], pa.string()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


def _kgx_media_rows(sf_dir: str):
    """md5-addressable media rows (one image span per doc) — the kgx
    counterpart of the media explode, with refs DuckDB can re-derive."""

    def to_media(batch: pa.Table) -> pa.Table:
        ids = [str(int(d)) for d in batch.column("doc_id").to_pylist()]
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, pa.string()),
                "media_ref": pa.array([f"media://{d}" for d in ids],
                                      pa.string()),
                "kind": pa.array(["image"] * len(ids), pa.string()),
                "span_index": pa.array([0] * len(ids), pa.int32()),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(to_media, batch_format="pyarrow")


def kgx_media_meta(sf_dir: str):
    """Media bytes-loader metadata over md5-addressable refs
    (driver-oracled: width/height/duration are md5-byte arithmetic the SQL
    twin recomputes; the binary payload plumbing runs for real)."""
    from .stages.media import MediaBytesLoader

    loaded = _kgx_media_rows(sf_dir).map_batches(
        MediaBytesLoader, batch_format="pyarrow", batch_size=16,
        concurrency=(1, 4),
    )
    return loaded.select_columns(
        ["doc_id", "media_ref", "width", "height", "duration_ms"])


def kgx_media_frames(sf_dir: str):
    """Video frame sampling over md5-addressable refs (driver-oracled:
    the SQL twin re-derives each duration and explodes the 1-fps frame
    timestamps with generate_series)."""
    from .stages.media import MediaBytesLoader, make_frame_sampler

    loaded = _kgx_media_rows(sf_dir).map_batches(
        MediaBytesLoader, batch_format="pyarrow", batch_size=16,
        concurrency=(1, 4),
    )
    return loaded.map_batches(make_frame_sampler(1.0), batch_format="pyarrow")


def kgx_rdf_import(sf_dir: str):
    """S2 RDF import, driver-oracled: a Turtle file is derived
    deterministically from the documents' md5 choices (kgx.py), imported
    through the distributed RDF parser, and the relationship rows are
    aggregated — DuckDB recomputes the expectation from the same md5
    arithmetic without touching the file."""
    import hashlib
    import os

    from ray.data.aggregate import Count

    from . import kgx
    from .sources.importer import import_graph_files

    doc_ids = pq.read_table(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"]).column("doc_id").to_pylist()
    lines = []
    for d in sorted(doc_ids):
        c = kgx.kgx_choices(int(d))
        lines.append(f"<http://x/p{c['p']}> <http://x/r{c['tid']}> "
                     f"<http://x/o{c['o']}> .")
    content = "\n".join(lines) + "\n"
    tag = hashlib.md5(content.encode()).hexdigest()[:12]
    path = f"/tmp/graphrag_ray_rdf_{tag}.ttl"
    if not os.path.exists(path):
        with open(path, "w") as f:
            f.write(content)
    rows = import_graph_files(path, fmt="rdf")
    rels = rows.filter(lambda r: r["row_kind"] == "relationship")
    return (rels.select_columns(["src", "dst", "rel_type"])
            .groupby(["src", "dst", "rel_type"])
            .aggregate(Count(alias_name="n")))


# ---------------------------------------------------------------------------
# graph analytics (SURVEY.md §2.9 / §2.6)


def kg_stats(sf_dir: str):
    from .stages import graph_analytics as ga

    res = _kg(sf_dir)
    n_docs = spans_dataset_from_flat_parquet(f"{sf_dir}/documents.parquet").count()
    n_chunks = res.chunks.count()
    df = ga.graph_stats(res.entities, res.edges, n_docs, n_chunks)
    df["value"] = _round4(df["value"].to_numpy())
    return df


def kg_pagerank(sf_dir: str):
    from .stages import graph_analytics as ga

    res = _kg(sf_dir)
    df = ga.pagerank(res.entities, res.edges).to_pandas()
    df["score"] = _round4(df["score"].to_numpy())
    return df


def kg_components(sf_dir: str):
    from .stages import graph_analytics as ga

    res = _kg(sf_dir)
    return ga.connected_components(res.entities, res.edges)


def kg_common_entities(sf_dir: str):
    from .stages import graph_analytics as ga

    res = _kg(sf_dir)
    return ga.common_entities(res.entities)


def kg_semantic_neighbors(sf_dir: str):
    from .stages import graph_analytics as ga

    res = _kg(sf_dir)
    return ga.semantic_neighbors(res.entities)


def kg_centrality(sf_dir: str):
    """L3 degree/betweenness/closeness centralities (analytics.rs:182-279)."""
    from .stages import graph_analytics as ga

    res = _kg(sf_dir)
    df = ga.centrality_scores(res.edges).to_pandas()
    for c in ("degree", "betweenness", "closeness"):
        df[c] = _round4(df[c].to_numpy())
    return df


def kg_louvain(sf_dir: str):
    """L3 Louvain-style communities (analytics.rs:97-180)."""
    from .stages import graph_analytics as ga

    res = _kg(sf_dir)
    df = ga.louvain_communities(res.edges).to_pandas()
    df["modularity"] = _round4(df["modularity"].to_numpy())
    return df


def kg_graph_metrics(sf_dir: str):
    """Density + clustering coefficient (analytics.rs:432-487)."""
    from .stages import graph_analytics as ga

    res = _kg(sf_dir)
    df = ga.graph_metrics(res.edges)
    df["value"] = _round4(df["value"].to_numpy())
    return df


def kg_relationship_hierarchy(sf_dir: str):
    """L4 hierarchical relationship clustering: per-level clusters over the
    relationship-similarity graph with fallback summaries + cohesion
    (graph/hierarchical_relationships.rs; rows-only driver check, exact
    semantics pytest-fixed in tests/test_community.py)."""
    from .stages.community import relationship_hierarchy

    res = _kg(sf_dir)
    _members, clusters = relationship_hierarchy(res.edges)
    return clusters


def kg_cooccur_edges(sf_dir: str):
    from .stages import graph_analytics as ga
    from .stages.joins import derived_join_buckets

    res = _kg(sf_dir)
    # one co-location bucket per ~512 docs (footer-count derived, no fixed B)
    ds = ga.doc_cooccurrence_edges(
        res.extraction,
        num_buckets=derived_join_buckets(sf_dir, "documents",
                                         floor=64, rows_per_bucket=512))

    def project(batch: pa.Table) -> pa.Table:
        conf = batch.column("confidence").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "src": batch.column("src"),
                "dst": batch.column("dst"),
                "n_docs": batch.column("n_docs"),
                "rel_type": batch.column("rel_type"),
                "confidence": pa.array(_round4(conf), pa.float64()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# extended operator surfaces (M4, M10, A2, A4)


def kg_enriched_chunks(sf_dir: str):
    """M4 chunk enrichment: TF-IDF keywords, extractive summary, chapter.
    SQL-oracled by synth_oracle.kg_enriched_sql (full keyword + summary
    replay over the chunked-corpus replay); keywords pipe-joined for a
    stable value compare."""
    from .stages.enrich import enrich_chunks

    res = _kg(sf_dir)
    chunks = res.chunks.materialize()
    n_docs = spans_dataset_from_flat_parquet(f"{sf_dir}/documents.parquet").count()
    ds = enrich_chunks(chunks, total_docs=n_docs)

    def project(batch: pa.Table) -> pa.Table:
        kws = batch.column("keywords").to_pylist()
        return pa.Table.from_pydict(
            {
                "chunk_id": batch.column("chunk_id"),
                "keywords": pa.array(["|".join(k) for k in kws], pa.string()),
                "summary": batch.column("summary"),
                "chapter": batch.column("chapter"),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


def kg_atomic_facts(sf_dir: str):
    """M10/A5 atomic (subj, pred, obj) facts with temporal markers
    (SQL-oracled: synth_oracle.kg_atomic_facts_sql replays the fact regex
    over the replayed chunk text with RE2-compatible delimiter
    consumption)."""
    from .stages.atomic_facts import facts_batch

    res = _kg(sf_dir)
    ds = res.chunks.map_batches(facts_batch, batch_format="pyarrow")

    def project(batch: pa.Table) -> pa.Table:
        conf = batch.column("confidence").to_numpy(zero_copy_only=False)
        return batch.set_column(
            batch.schema.get_field_index("confidence"), "confidence",
            pa.array(_round4(conf), pa.float64()),
        )

    return ds.map_batches(project, batch_format="pyarrow")


def kgx_entity_temporal(sf_dir: str):
    """Entity temporal fields rollup (core/mod.rs:236-243) over an
    md5-derived temporal corpus: '{person} founded {org} in {year}.' —
    atomic-fact extraction parses the year marker (BC-capable,
    atomic_fact_extractor.rs:52-86), then first/last_mentioned aggregate
    per subject. DuckDB recomputes the expectation from the same md5
    arithmetic."""
    import hashlib

    from . import kgx
    from .stages.atomic_facts import entity_temporal, extract_facts

    def temporal_chunks(batch: pa.Table) -> pa.Table:
        out_id, out_subj, out_ts = [], [], []
        for d in batch.column("doc_id").to_pylist():
            doc_id = int(d)
            c = kgx.kgx_choices(doc_id)
            year = 1900 + (int(hashlib.md5(
                f"kgx:{doc_id}:6".encode()).hexdigest()[:8], 16) % 120)
            text = (f"{kgx.KGX_PERSONS[c['p']]} founded "
                    f"{kgx.KGX_ORGS[c['o']][0]} in {year}.")
            for f in extract_facts(text):
                out_id.append(str(doc_id))
                out_subj.append(f["subj"])
                out_ts.append(f["timestamp"])
        return pa.Table.from_pydict(
            {"chunk_id": pa.array(out_id, pa.string()),
             "subj": pa.array(out_subj, pa.string()),
             "timestamp": pa.array(out_ts, pa.int64())}
        )

    facts = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(temporal_chunks, batch_format="pyarrow")
    return entity_temporal(facts)


def kgx_temporal_snapshot(sf_dir: str, start_year: int = 1950,
                          end_year: int = 1999):
    """L6 temporal snapshot, driver-oracled: temporal FOUNDED edges from
    the md5-derived corpus (person→org at the founding year), filtered to
    the [1950, 1999] activity window, then per-node degree stats — DuckDB
    recomputes from the same md5 arithmetic."""
    import hashlib

    from . import kgx
    from .stages.temporal import snapshot_range, snapshot_stats

    def temporal_edges(batch: pa.Table) -> pa.Table:
        out = {"src": [], "dst": [], "edge_type": [], "timestamp": [],
               "weight": [], "start_time": [], "end_time": []}
        for d in batch.column("doc_id").to_pylist():
            doc_id = int(d)
            c = kgx.kgx_choices(doc_id)
            year = 1900 + (int(hashlib.md5(
                f"kgx:{doc_id}:6".encode()).hexdigest()[:8], 16) % 120)
            out["src"].append(kgx.KGX_PERSONS[c["p"]])
            out["dst"].append(kgx.KGX_ORGS[c["o"]][0])
            out["edge_type"].append("FOUNDED")
            out["timestamp"].append(year)
            out["weight"].append(1.0)
            out["start_time"].append(None)
            out["end_time"].append(None)
        return pa.Table.from_pydict(
            {"src": pa.array(out["src"], pa.string()),
             "dst": pa.array(out["dst"], pa.string()),
             "edge_type": pa.array(out["edge_type"], pa.string()),
             "timestamp": pa.array(out["timestamp"], pa.int64()),
             "weight": pa.array(out["weight"], pa.float32()),
             "start_time": pa.array(out["start_time"], pa.int64()),
             "end_time": pa.array(out["end_time"], pa.int64())}
        )

    edges = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(temporal_edges, batch_format="pyarrow")
    snap = snapshot_range(edges, start_year, end_year)
    return snapshot_stats(snap)


def kg_yake_keywords(sf_dir: str):
    """YAKE keyword variant over the chunk table (config/mod.rs:409-425
    names the algorithm; scoring per Campos et al. 2020). SQL-oracled by
    synth_oracle.kg_yake_sql (the shared yake_tail over the chunked-corpus
    replay); keywords pipe-joined for a stable value compare."""
    from .stages.enrich import enrich_chunks

    res = _kg(sf_dir)
    chunks = res.chunks.materialize()
    n_docs = spans_dataset_from_flat_parquet(f"{sf_dir}/documents.parquet").count()
    ds = enrich_chunks(chunks, total_docs=n_docs, algorithm="yake")

    def project(batch: pa.Table) -> pa.Table:
        kws = batch.column("keywords").to_pylist()
        return pa.Table.from_pydict(
            {
                "chunk_id": batch.column("chunk_id"),
                "keywords": pa.array(["|".join(k) for k in kws], pa.string()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


def kg_gleaning_extraction(sf_dir: str):
    """A2 gleaning extractor (deterministic MockLLM at its default
    min_confidence 0.5 — the only surface exercising extraction PHASE 4
    and the sub-0.7 ORG tail) over the chunk table, aggregated
    batch-invariantly: one entity row per (doc, name, type) plus the
    globally distinct edge triple set. SQL-oracled by
    syn_oracle_kg.kg_gleaning_sql."""
    from ray.data.aggregate import Count

    from .stages.llm_extract import GleaningExtractor

    res = _kg(sf_dir)
    out = res.chunks.map_batches(
        GleaningExtractor,
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def ent_project(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.equal(batch.column("row_kind"), "entity"))
        n = batch.num_rows
        return pa.Table.from_pydict(
            {
                "row_kind": pa.array(["entity"] * n, pa.string()),
                "doc_id": batch.column("doc_id"),
                "entity_id": batch.column("entity_id"),
                "name": batch.column("name"),
                "entity_type": batch.column("entity_type"),
                "src_id": pa.array([None] * n, pa.string()),
                "dst_id": pa.array([None] * n, pa.string()),
                "rel_type": pa.array([None] * n, pa.string()),
            }
        )

    def edge_project(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.Table.from_pydict(
            {
                "row_kind": pa.array(["edge"] * n, pa.string()),
                "doc_id": pa.array([None] * n, pa.string()),
                "entity_id": pa.array([None] * n, pa.string()),
                "name": pa.array([None] * n, pa.string()),
                "entity_type": pa.array([None] * n, pa.string()),
                "src_id": batch.column("src_id"),
                "dst_id": batch.column("dst_id"),
                "rel_type": batch.column("rel_type"),
            }
        )

    ents = (
        out.map_batches(ent_project, batch_format="pyarrow")
        .groupby(["doc_id", "name", "entity_type", "entity_id"])
        .aggregate(Count(alias_name="n"))
        .drop_columns(["n"])
        .map_batches(
            lambda t: pa.Table.from_pydict(
                {
                    "row_kind": pa.array(["entity"] * t.num_rows, pa.string()),
                    "doc_id": t.column("doc_id"),
                    "entity_id": t.column("entity_id"),
                    "name": t.column("name"),
                    "entity_type": t.column("entity_type"),
                    "src_id": pa.array([None] * t.num_rows, pa.string()),
                    "dst_id": pa.array([None] * t.num_rows, pa.string()),
                    "rel_type": pa.array([None] * t.num_rows, pa.string()),
                }
            ),
            batch_format="pyarrow",
        )
    )
    edges = (
        out.filter(lambda r: r["row_kind"] == "edge")
        .groupby(["src_id", "dst_id", "rel_type"])
        .aggregate(Count(alias_name="n"))
        .drop_columns(["n"])
        .map_batches(edge_project, batch_format="pyarrow")
    )
    return ents.union(edges)


def kg_validated_facts(sf_dir: str):
    """A4 triple-reflection validation over atomic facts (keep iff the
    context explicitly supports the triple)."""
    import pyarrow as pa

    from .stages.atomic_facts import extract_facts
    from .stages.validate import TripleValidationStage

    def facts_with_context(batch: pa.Table) -> pa.Table:
        out = {"chunk_id": [], "subj": [], "pred": [], "obj": [],
               "context_text": []}
        for chunk_id, text in zip(batch.column("chunk_id").to_pylist(),
                                  batch.column("content").to_pylist()):
            for f in extract_facts(text):
                out["chunk_id"].append(chunk_id)
                out["subj"].append(f["subj"])
                out["pred"].append(f["pred"].upper().replace(" ", "_"))
                out["obj"].append(f["obj"])
                out["context_text"].append(text)
        return pa.Table.from_pydict(out)

    res = _kg(sf_dir)
    candidates = res.chunks.map_batches(facts_with_context, batch_format="pyarrow")
    validated = candidates.map_batches(
        TripleValidationStage, batch_format="pyarrow", concurrency=(1, 4)
    )

    def project(batch: pa.Table) -> pa.Table:
        conf = batch.column("validation_confidence").to_numpy(
            zero_copy_only=False)
        batch = batch.set_column(
            batch.schema.get_field_index("validation_confidence"),
            "validation_confidence", pa.array(_round4(conf), pa.float64()),
        )
        return batch.select(["chunk_id", "subj", "pred", "obj", "is_valid",
                             "validation_confidence"])

    return validated.map_batches(project, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# stream-shaped event operators (windowed aggregate / sessionization)


def _round_col(ds, col: str, digits: int = 4):
    import pyarrow as pa

    def do(batch: pa.Table) -> pa.Table:
        import numpy as np

        x = batch.column(col).to_numpy(zero_copy_only=False).astype(float)
        rounded = np.floor(np.abs(x) * 10 ** digits + 0.5) / 10 ** digits * np.sign(x)
        i = batch.column_names.index(col)
        return batch.set_column(i, col, pa.array(rounded, pa.float64()))

    return ds.map_batches(do, batch_format="pyarrow")


def events_tumbling(sf_dir: str):
    from .stages.events import tumbling_window_agg

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "user_id", "value"])
    return _round_col(tumbling_window_agg(ds, window_hours=6), "sum_value")


def events_sessionize(sf_dir: str):
    from .stages.events import sessionize

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "user_id", "value"])
    out = sessionize(ds, gap_minutes=120).select_columns(
        ["user_id", "session_idx", "n_events", "start_ts", "end_ts", "sum_value"]
    )
    return _round_col(out, "sum_value")


def events_hopping(sf_dir: str):
    from .stages.events import hopping_window_agg

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "user_id", "value"])
    return _round_col(hopping_window_agg(ds, window_hours=6, hop_hours=3),
                      "sum_value")


def events_type_stats(sf_dir: str):
    from .stages.events import event_type_stats

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])
    return _round_col(event_type_stats(ds), "sum_value")


def events_user_running(sf_dir: str):
    """Per-event running count + value sum within each user's ts-ordered
    stream (ordered-window operator; bucketed cumsum)."""
    from .stages.events import user_running_totals

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id", "value"])
    return _round_col(user_running_totals(ds), "running_value")


def events_funnel(sf_dir: str):
    """Ordered funnel signup -> click -> purchase: earliest completion of
    each stage strictly after the previous one, per user."""
    from .stages.events import funnel_stages

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "user_id", "event_type"])
    return funnel_stages(ds)


def events_value_quantiles(sf_dir: str):
    """Exact per-event-type value quantiles (grouped order statistics)."""
    from .stages.events import value_quantiles_by_type

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])
    return value_quantiles_by_type(ds)


def events_retention(sf_dir: str):
    """Weekly retention cohorts (cohort_week, week_offset, n_users)."""
    from .stages.events import retention_cohorts

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "user_id"])
    return retention_cohorts(ds)


def events_bursts(sf_dir: str):
    """Burst windows per event type (all-integer contract:
    n * n_windows > 2 * total)."""
    from .stages.events import burst_windows

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type"])
    return burst_windows(ds)


def events_asof(sf_dir: str):
    """As-of join (the canonical operator Ray Data lacks): every purchase
    event matched with the same user's most recent click at-or-before it —
    bucketed `pandas.merge_asof` composition (stages/events.py asof_join),
    one hash(user) exchange, inner/backward/inclusive semantics."""
    import pyarrow.compute as _pc

    from .stages.events import asof_join

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"])

    def only(kind: str):
        def fn(batch):
            return (batch.filter(_pc.equal(batch.column("event_type"), kind))
                    .drop_columns(["event_type"]))
        return fn

    left = ds.map_batches(only("purchase"), batch_format="pyarrow")
    right = ds.map_batches(only("click"), batch_format="pyarrow")
    # size buckets from the RAW parquet row count (metadata-only): letting
    # asof_join count the filtered sides would execute both filter
    # pipelines once extra just for the bucket count; the total-event
    # upper bound only makes buckets slightly smaller, never hotter
    from .stages.events import NUM_BUCKETS, ROWS_PER_BUCKET
    nb = max(NUM_BUCKETS, int(ds.count()) // ROWS_PER_BUCKET + 1)
    out = asof_join(left, right, on="ts", by="user_id",
                    left_cols=("event_id",), right_cols=("event_id",),
                    num_buckets=nb)
    return out.select_columns(
        ["event_id", "user_id", "ts", "r_event_id", "r_ts", "gap"])


def ivf_cluster_sizes(sf_dir: str):
    """k-means cluster sizes over the full embedding table (the IVF
    quantizer's cell occupancy): combiner partials + tiny groupby."""
    centroids = ann.train_ivf_centroids(_ivf_sample(sf_dir))
    return ann.ivf_cluster_sizes(_embeddings(sf_dir), centroids)


def embedding_pca_top(sf_dir: str):
    """Top principal component of the embedding cloud: distributed moment
    partials + driver power iteration (embedding whitening/compression
    building block)."""
    return ann.pca_top_component(_embeddings(sf_dir))


def ann_ivf_topk(sf_dir: str, k: int = 10):
    """IVF-bucketed approximate top-k: seeded k-means coarse quantizer
    trained on a sample, query probes its nprobe nearest cells."""
    q = _query_vector(sf_dir)
    centroids = ann.train_ivf_centroids(_ivf_sample(sf_dir))
    partials = _embeddings(sf_dir).map_batches(
        ann.make_ivf_topk_partial_fn(q, k, centroids), batch_format="pyarrow"
    )
    return ann.finalize_topk(partials, k)


def rrf_fusion(sf_dir: str, k: int = 60, top_n: int = 10):
    """Reciprocal-rank fusion of two retrieval rankings (the reference's
    query side fuses vector + keyword rankings; RRF per Cormack et al.):
    score(d) = Σ_r 1/(k + rank_r(d)). Rankings here: cosine-to-query over
    embeddings and |value| over the same vec_ids' labels — both derived
    distributively, fused with a tiny driver-side merge. SQL-oracled."""
    q = _query_vector(sf_dir)
    cos_partials = _embeddings(sf_dir).map_batches(
        ann.make_topk_partial_fn(q, 100), batch_format="pyarrow"
    )
    cos_top = ann.finalize_topk(cos_partials, 100)

    def label_partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        labels = np.asarray(batch.column("label").to_pylist(), dtype=np.int64)
        order = np.lexsort((ids, -labels))[:100]  # per-batch top-k combiner
        return pa.Table.from_pydict(
            {"vec_id": pa.array(ids[order]), "label": pa.array(labels[order])}
        )

    lab = (_embeddings(sf_dir)
           .map_batches(label_partial, batch_format="pyarrow")
           .to_pandas())
    lab = lab.sort_values(["label", "vec_id"],
                          ascending=[False, True]).head(100)
    scores: dict[int, float] = {}
    for rank, vid in enumerate(cos_top["vec_id"].tolist(), start=1):
        scores[vid] = scores.get(vid, 0.0) + 1.0 / (k + rank)
    for rank, vid in enumerate(lab["vec_id"].tolist(), start=1):
        scores[vid] = scores.get(vid, 0.0) + 1.0 / (k + rank)
    import pandas as pd

    out = pd.DataFrame(
        {"vec_id": list(scores.keys()),
         "rrf": [float(np.floor(s * 1e6 + 0.5) / 1e6) for s in scores.values()]}
    ).sort_values(["rrf", "vec_id"], ascending=[False, True]).head(top_n)
    return out.reset_index(drop=True)


def hybrid_topk(sf_dir: str, k: int = 60, top_n: int = 10):
    """T2 hybrid retrieval (retrieval/hybrid.rs shape): the distributed
    BM25 keyword ranking over documents fused with the cosine vector
    ranking over the id-aligned embeddings via RRF. SQL-oracled by
    composing the two oracled ranking expressions."""
    from .stages.retrieval import bm25_topk as _bm25

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    kw = _bm25(docs, "spark table join vector", k=100)
    qv = _query_vector(sf_dir)
    cos_partials = _embeddings(sf_dir).map_batches(
        ann.make_topk_partial_fn(qv, 100), batch_format="pyarrow")
    cos_top = ann.finalize_topk(cos_partials, 100)
    scores: dict[int, float] = {}
    for rank, vid in enumerate(cos_top["vec_id"].tolist(), start=1):
        scores[vid] = scores.get(vid, 0.0) + 1.0 / (k + rank)
    for rank, did in enumerate(kw["doc_id"].tolist(), start=1):
        scores[did] = scores.get(did, 0.0) + 1.0 / (k + rank)
    import pandas as pd

    out = pd.DataFrame(
        {"doc_id": list(scores.keys()),
         "rrf": [float(np.floor(s * 1e6 + 0.5) / 1e6)
                 for s in scores.values()]}
    ).sort_values(["rrf", "doc_id"], ascending=[False, True]).head(top_n)
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.reset_index(drop=True)


# ---------------------------------------------------------------------------
# join-pattern operators over the relational tables (J-family, SQL-oracled)


def nation_region_join(sf_dir: str):
    """Broadcast join: nations (large side role) × regions (broadcast)."""
    from .stages.joins import broadcast_join

    nations = ray.data.read_parquet(f"{sf_dir}/nation.parquet")
    regions = pq.read_table(f"{sf_dir}/region.parquet")
    return broadcast_join(nations, regions, key="n_regionkey",
                          small_key="r_regionkey")


def customer_order_counts(sf_dir: str):
    """Bucketed count-join: order counts per customer + customer name."""
    from .stages.joins import bucketed_count_join

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey"])
    customers = pq.read_table(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_name"])
    out = bucketed_count_join(orders, "o_custkey", customers, "c_custkey",
                              "c_name")
    return out


def customer_order_join(sf_dir: str):
    """Large×large bucketed hash join (no broadcast side): orders ⋈
    customer on custkey, co-located by one groupby(bucket) exchange;
    bucket count derived from the parquet footers (no fixed B)."""
    from .stages.joins import bucketed_hash_join, derived_join_buckets

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey"])
    customers = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                      columns=["c_custkey", "c_name"])
    return bucketed_hash_join(orders, customers, "o_custkey", "c_custkey",
                              ["o_orderkey"], ["c_name"],
                              num_buckets=derived_join_buckets(
                                  sf_dir, "orders", "customer"))


def doc_length_histogram(sf_dir: str):
    """Bucketed doc-length histogram (100-char buckets)."""
    import pyarrow as pa

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        lengths = [len(t or "") // 100 for t in batch.column("text").to_pylist()]
        acc: dict[int, int] = {}
        for b in lengths:
            acc[b] = acc.get(b, 0) + 1
        return pa.Table.from_pydict(
            {"len_bucket": pa.array(list(acc.keys()), pa.int64()),
             "n_docs": pa.array(list(acc.values()), pa.int64())}
        )

    return (_docs(sf_dir).map_batches(partial, batch_format="pyarrow")
            .groupby("len_bucket").aggregate(Sum("n_docs", alias_name="n_docs")))


def kg_node2vec(sf_dir: str):
    """L5 Node2Vec embeddings over the canonical entity graph (distributed
    walks + batch-synchronous skip-gram; graph/embeddings.rs)."""
    from .stages.graph_embeddings import node2vec

    res = _kg(sf_dir)
    out = node2vec(res.edges, dimension=16, walk_length=10, walks_per_node=2,
                   epochs=2)

    def summarize(batch: pa.Table) -> pa.Table:
        vecs = np.array(batch.column("embedding").to_pylist(), dtype=np.float32)
        return pa.Table.from_pydict(
            {"node_id": batch.column("node_id"),
             "dim": pa.array([vecs.shape[1]] * len(vecs), pa.int32())}
        )

    return out.map_batches(summarize, batch_format="pyarrow")


def kg_graphsage(sf_dir: str):
    """L5 GraphSAGE mean-aggregator embeddings over the entity graph."""
    from .stages.graph_embeddings import graphsage

    res = _kg(sf_dir)
    out = graphsage(res.edges, dimension=16, num_layers=2)
    return out.select_columns(["node_id"])


# ---------------------------------------------------------------------------
# rograg_*: ROGRAG query-side subsystem over the kgx graph
# (reference graphrag-core/src/rograg/* — intent, decomposition, logic-form
# retrieval, fuzzy fallback, validation, synthesis, streaming).  The fixed
# ROGRAG_QUERIES workload runs through ONE distributed pass over each of
# the kgx entity / chunk / edge tables; the DuckDB twin (rograg_oracle.py)
# replays every rule over the md5-derived corpus expectations.

_ROGRAG_CACHE: dict[str, object] = {}


def _rograg(sf_dir: str):
    run = _ROGRAG_CACHE.get(sf_dir)
    if run is None:
        from .stages.rograg import ROGRAG_QUERIES, run_rograg

        res = _kgx(sf_dir)
        run = _ROGRAG_CACHE[sf_dir] = run_rograg(
            list(ROGRAG_QUERIES), res.entities, res.chunks, res.edges)
    return run


def rograg_intent(sf_dir: str):
    """Intent classification (rograg/intent_classifier.rs:308-700):
    per-query primary intent, confidence, refusal decision, reformulation
    suggestion and complexity score."""
    return _rograg(sf_dir).intents


def rograg_decompose(sf_dir: str):
    """Hybrid query decomposition (rograg/decomposer.rs:291-830):
    semantic-pattern subqueries, syntactic clause splitting (including the
    reference's mid-word separator hits), single-query fallback."""
    return _rograg(sf_dir).decompositions


def rograg_logic_form(sf_dir: str):
    """Logic-form retrieval (rograg/logic_form/*): pattern parse to
    (predicate, args), executed against the kgx canonical entities and
    edges — is/related/compare/happened variable bindings."""
    return _rograg(sf_dir).logic_bindings


def rograg_fuzzy(sf_dir: str):
    """Fuzzy matching fallback (rograg/fuzzy_matcher.rs): combined
    jaccard/containment/levenshtein entity matches, chunk content/keyword
    matches, top-10 per query."""
    return _rograg(sf_dir).fuzzy_matches


def rograg_responses(sf_dir: str):
    """End-to-end ROGRAG processor (rograg/processor.rs:356-536): validate
    → classify → decompose → dual-level retrieval (logic form, fuzzy
    fallback) → weighted synthesis → template response → quality-folded
    confidence."""
    return _rograg(sf_dir).responses


def rograg_quality(sf_dir: str):
    """Response quality metrics (rograg/validator.rs:497-620): coherence,
    relevance, consistency, completeness, readability, credibility and
    their mean for every answered query."""
    return _rograg(sf_dir).quality


def rograg_stream(sf_dir: str):
    """Streaming chunk generation (rograg/streaming.rs:714-744): word-window
    response chunks with final-chunk flags."""
    return _rograg(sf_dir).stream


def qi_rewrite(sf_dir: str):
    """Query intelligence rewrite (query/intelligence.rs:92-381): type
    cascade, template rewrite, in-order synonym expansion with stateful
    dedup, stop-word key terms, specificity confidence."""
    import pandas as pd

    from .stages.query_intel import QI_QUERIES, rewrite_query

    qds = ray.data.from_items([{"query": q} for q in QI_QUERIES])

    def fn(batch: pa.Table) -> pa.Table:
        out = {"query": [], "rewritten": [], "query_type": [],
               "expanded_terms": [], "confidence": []}
        for q in batch.column("query").to_pylist():
            r = rewrite_query(q)
            out["query"].append(q)
            out["rewritten"].append(r["rewritten"])
            out["query_type"].append(r["query_type"])
            out["expanded_terms"].append("|".join(r["expanded_terms"]))
            out["confidence"].append(
                float(np.floor(r["confidence"] * 1e4 + 0.5) / 1e4))
        return pa.Table.from_pydict({
            "query": pa.array(out["query"], pa.string()),
            "rewritten": pa.array(out["rewritten"], pa.string()),
            "query_type": pa.array(out["query_type"], pa.string()),
            "expanded_terms": pa.array(out["expanded_terms"], pa.string()),
            "confidence": pa.array(out["confidence"], pa.float64()),
        })

    return qds.map_batches(fn, batch_format="pyarrow")


def qi_routing(sf_dir: str):
    """Adaptive query routing (query/adaptive_routing.rs:77-270):
    keyword/length/entity-weighted complexity → hierarchical level."""
    from .stages.query_intel import QI_QUERIES, analyze_complexity

    qds = ray.data.from_items([{"query": q} for q in QI_QUERIES])

    def fn(batch: pa.Table) -> pa.Table:
        rows = [analyze_complexity(q)
                for q in batch.column("query").to_pylist()]
        return pa.Table.from_pydict({
            "query": pa.array([r["query"] for r in rows], pa.string()),
            "complexity": pa.array([r["complexity"] for r in rows],
                                   pa.string()),
            "suggested_level": pa.array(
                [r["suggested_level"] for r in rows], pa.int64()),
            "keyword_score": pa.array(
                _round4([r["keyword_score"] for r in rows]), pa.float64()),
            "length_score": pa.array(
                _round4([r["length_score"] for r in rows]), pa.float64()),
            "entity_score": pa.array(
                _round4([r["entity_score"] for r in rows]), pa.float64()),
        })

    return qds.map_batches(fn, batch_format="pyarrow")


def qopt_plans(sf_dir: str):
    """Plan optimizer (query/optimizer.rs:141-475) over kgx graph
    statistics (computed distributed: entity-type groupby + edge count):
    rewrite swap, greedy multi-way join order, cost/cardinality/
    selectivity estimates for the fixed plan workload."""
    import pandas as pd

    from .stages.query_intel import (OPTIMIZER_PLANS, QueryOptimizer,
                                     graph_statistics, serialize_plan)

    res = _kgx(sf_dir)
    stats = graph_statistics(res.entities, res.edges)
    opt = QueryOptimizer(stats)
    rows = []
    for name, plan in OPTIMIZER_PLANS:
        best = opt.optimize(plan)
        cost = opt.estimate_cost(best)
        rows.append({
            "plan": name,
            "optimized": serialize_plan(best),
            "cardinality": int(cost["cardinality"]),
            "cost": float(_round4([cost["cost"]])[0]),
            "selectivity": float(_round4([cost["selectivity"]])[0]),
        })
    return pd.DataFrame(rows)


_GENR_CACHE: dict[str, object] = {}
_GENRUN_CACHE: dict[str, object] = {}


def _gen_run(sf_dir: str):
    """Shared fuzzy-retrieval pass for the generation + explained
    surfaces (one corpus scan for the GEN_QUERIES workload)."""
    run = _GENRUN_CACHE.get(sf_dir)
    if run is None:
        from .stages.generation import GEN_QUERIES
        from .stages.rograg import run_rograg

        res = _kgx(sf_dir)
        run = _GENRUN_CACHE[sf_dir] = run_rograg(
            list(GEN_QUERIES), res.entities, res.chunks, res.edges)
    return run


def _gen_search_results(sf_dir: str, q: str) -> list:
    fz = _gen_run(sf_dir).fuzzy_matches
    sub = fz[fz["query"] == q].sort_values("rank")
    results = []
    for r in sub.itertuples(index=False):
        is_ent = r.match_type.endswith("_entity")
        results.append({
            "id": r.match_id, "content": r.content,
            "score": float(r.similarity),
            "result_type": "entity" if is_ent else "chunk",
            "entities": ([r.content.split(" (")[0]] if is_ent else []),
        })
    return results


def gen_answers(sf_dir: str):
    """Answer generation (generation/mod.rs:736-1060, Hybrid mode):
    context assembly from the published 4-decimal fuzzy-match scores over
    the kgx graph, MockLLM extractive sentence scoring, abstractive /
    contextual fallbacks, citation formatting and answer confidence."""
    import pandas as pd

    out = _GENR_CACHE.get(sf_dir)
    if out is not None:
        return out
    from .stages.generation import (GEN_QUERIES, format_with_citations,
                                    generate_answer, quality_assessment)

    rows = []
    for q in GEN_QUERIES:
        results = _gen_search_results(sf_dir, q)
        ans = generate_answer(q, results)
        rows.append({
            "query": q,
            "answer": format_with_citations(ans),
            "confidence": float(_round4([ans["confidence"]])[0]),
            "context_quality": float(_round4([ans["context_quality"]])[0]),
            "n_sources": len(ans["sources"]),
            "quality": quality_assessment(ans),
        })
    out = _GENR_CACHE[sf_dir] = pd.DataFrame(rows)
    return out


def explained_steps(sf_dir: str):
    """Explained retrieval reasoning trace (retrieval/explained.rs:93-180):
    per query the 1-indexed step list with pinned-order entity sets and
    evidence snippets."""
    import pandas as pd

    from .stages.generation import GEN_QUERIES, explained_answer

    rows = []
    for q in GEN_QUERIES:
        ex = explained_answer(q, _gen_search_results(sf_dir, q))
        for s in ex["steps"]:
            rows.append({
                "query": q, "step_number": s["step_number"],
                "description": s["description"],
                "entities_used": "|".join(s["entities_used"]),
                "evidence": s["evidence_snippet"],
                "confidence": float(_round4([s["confidence"]])[0]),
            })
    return pd.DataFrame(rows)


def explained_sources(sf_dir: str):
    """Explained retrieval source references (explained.rs:104-125):
    top-5 results with typed excerpts and relevance."""
    import pandas as pd

    from .stages.generation import GEN_QUERIES, explained_answer

    rows = []
    for q in GEN_QUERIES:
        ex = explained_answer(q, _gen_search_results(sf_dir, q))
        for i, s in enumerate(ex["sources"]):
            rows.append({
                "query": q, "rank": i, "source_id": s["id"],
                "source_type": s["source_type"], "excerpt": s["excerpt"],
                "relevance": float(_round4([s["relevance_score"]])[0]),
            })
    return pd.DataFrame(
        rows, columns=["query", "rank", "source_id", "source_type",
                       "excerpt", "relevance"])


def rograg_metrics(sf_dir: str):
    """Quality-metrics tracking scores (rograg/quality_metrics.rs:986-1122
    — its OWN weights, distinct from the validator's six-way mean) over
    every processed ROGRAG response, consuming the published 4-decimal
    response confidences."""
    import pandas as pd

    from .state.quality_metrics import response_quality

    resp = _rograg(sf_dir).responses
    rows = []
    for r in resp.itertuples(index=False):
        sources = [s for s in str(r.sources).split("|") if s]
        q = response_quality(r.query, r.content, float(r.confidence),
                            sources, int(r.n_subqueries))
        rows.append({"query": r.query,
                     **{k: float(_round4([v])[0]) for k, v in q.items()}})
    return pd.DataFrame(
        rows, columns=["query", "accuracy", "completeness", "coherence",
                       "relevance", "credibility", "overall"])


def rerank_fuzzy(sf_dir: str):
    """Cross-encoder reranking (reranking/cross_encoder.rs:168-198) of the
    fuzzy retrieval candidates with the deterministic Dice-sigmoid scorer
    seam (min_confidence 0.45 exercises the filter): stable re-sort by
    reranked relevance, top-10."""
    import pandas as pd

    from .stages.generation import GEN_QUERIES
    from .stages.rerank import rerank

    rows = []
    for q in GEN_QUERIES:
        ranked = rerank(q, _gen_search_results(sf_dir, q),
                        min_confidence=0.45)
        for i, r in enumerate(ranked):
            rows.append({
                "query": q, "rank": i, "id": r["id"],
                "relevance": float(_round4([r["relevance_score"]])[0]),
                "original": float(_round4([r["original_score"]])[0]),
                "delta": float(_round4([r["score_delta"]])[0]),
            })
    return pd.DataFrame(
        rows, columns=["query", "rank", "id", "relevance", "original",
                       "delta"])


def rerank_stats(sf_dir: str):
    """RerankingStats (cross_encoder.rs:284-314) per query for the same
    rerank pass: filter rate and score-improvement aggregates."""
    import pandas as pd

    from .stages.generation import GEN_QUERIES
    from .stages.rerank import rerank, reranking_stats

    rows = []
    for q in GEN_QUERIES:
        cands = _gen_search_results(sf_dir, q)
        ranked = rerank(q, cands, min_confidence=0.45)
        st = reranking_stats(len(cands), ranked)
        rows.append({
            "query": q,
            "candidates_count": st["candidates_count"],
            "results_count": st["results_count"],
            "avg_improvement": float(_round4([st["avg_score_improvement"]])[0]),
            "max_improvement": float(_round4([st["max_score_improvement"]])[0]),
            "filter_rate": float(_round4([st["filter_rate"]])[0]),
        })
    return pd.DataFrame(rows)


def _kgx_sentences(sf_dir: str):
    """kgx chunks → (doc_id, content) — the corpus for the NLP surfaces."""
    return _kgx(sf_dir).chunks


def nlp_pos(sf_dir: str):
    """Dictionary POS tagger with suffix fallbacks
    (nlp/syntax_analyzer.rs:194-356) over the kgx sentences."""
    from .stages.nlp import pos_tag

    def fn(batch: pa.Table) -> pa.Table:
        out = {"doc_id": [], "idx": [], "token": [], "position": [],
               "pos": [], "lemma": []}
        for doc_id, content in zip(batch.column("doc_id").to_pylist(),
                                   batch.column("content").to_pylist()):
            for i, t in enumerate(pos_tag(content)):
                out["doc_id"].append(int(doc_id))
                out["idx"].append(i)
                out["token"].append(t["text"])
                out["position"].append(t["position"])
                out["pos"].append(t["pos"])
                out["lemma"].append(t["lemma"])
        return pa.Table.from_pydict({
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "idx": pa.array(out["idx"], pa.int64()),
            "token": pa.array(out["token"], pa.string()),
            "position": pa.array(out["position"], pa.int64()),
            "pos": pa.array(out["pos"], pa.string()),
            "lemma": pa.array(out["lemma"], pa.string()),
        })

    return _kgx_sentences(sf_dir).map_batches(fn, batch_format="pyarrow")


def nlp_noun_phrases(sf_dir: str):
    """DET/ADJ/NOUN-run noun-phrase chunking
    (syntax_analyzer.rs:451-509)."""
    from .stages.nlp import extract_noun_phrases, pos_tag

    def fn(batch: pa.Table) -> pa.Table:
        out = {"doc_id": [], "phrase_idx": [], "text": [], "head_idx": []}
        for doc_id, content in zip(batch.column("doc_id").to_pylist(),
                                   batch.column("content").to_pylist()):
            for i, p in enumerate(extract_noun_phrases(pos_tag(content))):
                out["doc_id"].append(int(doc_id))
                out["phrase_idx"].append(i)
                out["text"].append(p["text"])
                out["head_idx"].append(p["head_idx"])
        return pa.Table.from_pydict({
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "phrase_idx": pa.array(out["phrase_idx"], pa.int64()),
            "text": pa.array(out["text"], pa.string()),
            "head_idx": pa.array(out["head_idx"], pa.int64()),
        })

    return _kgx_sentences(sf_dir).map_batches(fn, batch_format="pyarrow")


def nlp_dependencies(sf_dir: str):
    """First-match dependency heuristic (syntax_analyzer.rs:359-448)."""
    from .stages.nlp import parse_dependencies, pos_tag

    def fn(batch: pa.Table) -> pa.Table:
        out = {"doc_id": [], "head": [], "dependent": [], "relation": []}
        for doc_id, content in zip(batch.column("doc_id").to_pylist(),
                                   batch.column("content").to_pylist()):
            for d in parse_dependencies(pos_tag(content)):
                out["doc_id"].append(int(doc_id))
                out["head"].append(d["head"])
                out["dependent"].append(d["dependent"])
                out["relation"].append(d["relation"])
        return pa.Table.from_pydict({
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "head": pa.array(out["head"], pa.int64()),
            "dependent": pa.array(out["dependent"], pa.int64()),
            "relation": pa.array(out["relation"], pa.string()),
        })

    return _kgx_sentences(sf_dir).map_batches(fn, batch_format="pyarrow")


def ner_custom(sf_dir: str):
    """Rule-based custom NER (nlp/custom_ner.rs:104-390) with the fixed
    seven-kind rule set and greedy overlap resolution."""
    from .stages.nlp import NER_DICTIONARIES, NER_RULES, ner_extract

    def fn(batch: pa.Table) -> pa.Table:
        out = {"doc_id": [], "start": [], "end": [], "text": [],
               "entity_type": [], "confidence": [], "rule_name": []}
        for doc_id, content in zip(batch.column("doc_id").to_pylist(),
                                   batch.column("content").to_pylist()):
            for e in ner_extract(content, list(NER_RULES),
                                 NER_DICTIONARIES):
                out["doc_id"].append(int(doc_id))
                out["start"].append(e["start"])
                out["end"].append(e["end"])
                out["text"].append(e["text"])
                out["entity_type"].append(e["entity_type"])
                out["confidence"].append(e["confidence"])
                out["rule_name"].append(e["rule_name"])
        return pa.Table.from_pydict({
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "start": pa.array(out["start"], pa.int64()),
            "end": pa.array(out["end"], pa.int64()),
            "text": pa.array(out["text"], pa.string()),
            "entity_type": pa.array(out["entity_type"], pa.string()),
            "confidence": pa.array(out["confidence"], pa.float64()),
            "rule_name": pa.array(out["rule_name"], pa.string()),
        })

    return _kgx_sentences(sf_dir).map_batches(fn, batch_format="pyarrow")


def _fc_graph(sf_dir: str):
    """Pinned-order entity/edge lists for the function-calling surfaces
    (one collect of the small canonical tables)."""
    res = _kgx(sf_dir)
    ents = sorted(res.entities.select_columns(
        ["canonical_id", "canonical_name", "entity_type", "confidence",
         "mention_count"]).take_all(), key=lambda r: r["canonical_id"])
    entities = [{"id": r["canonical_id"], "name": r["canonical_name"],
                 "type": r["entity_type"],
                 "confidence": float(_round4([r["confidence"]])[0]),
                 "mention_count": int(r["mention_count"])} for r in ents]
    edge_rows = sorted(res.edges.select_columns(
        ["src", "dst", "rel_type", "confidence", "n_occurrences"])
        .take_all(), key=lambda r: (r["src"], r["dst"], r["rel_type"]))
    edges = [{"src": r["src"], "dst": r["dst"], "rel_type": r["rel_type"],
              "confidence": float(_round4([r["confidence"]])[0]),
              "n_occurrences": int(r["n_occurrences"])} for r in edge_rows]
    return entities, edges


def fc_graph_search(sf_dir: str):
    """Phased agent entity search (function_calling/functions.rs:121-197)
    for the fixed argument workload."""
    import pandas as pd

    from .stages.function_calling import FC_SEARCH_ARGS, graph_search

    entities, _ = _fc_graph(sf_dir)
    rows = []
    for qname, limit in FC_SEARCH_ARGS:
        for rank, m in enumerate(graph_search(qname, entities, limit)):
            rows.append({
                "qname": qname, "rank": rank, "entity_id": m["id"],
                "name": m["name"], "entity_type": m["type"],
                "confidence": m["confidence"],
                "relevance": m["relevance"],
                "mention_count": m["mention_count"],
            })
    return pd.DataFrame(
        rows, columns=["qname", "rank", "entity_id", "name", "entity_type",
                       "confidence", "relevance", "mention_count"])


def fc_entity_expand(sf_dir: str):
    """Agent entity expansion (functions.rs:247-318): incident
    relationships with direction, first-N in pinned edge order."""
    import pandas as pd

    from .stages.function_calling import FC_EXPAND_ARGS, entity_expand

    entities, edges = _fc_graph(sf_dir)
    rows = []
    for eid, limit in FC_EXPAND_ARGS:
        ex = entity_expand(eid, entities, edges, limit)
        if ex is None:
            continue
        for i, r in enumerate(ex["relationships"]):
            rows.append({
                "entity_id": eid, "rel_idx": i,
                "relationship_type": r["relationship_type"],
                "direction": r["direction"],
                "related_id": r["related_id"],
                "related_name": r["related_name"],
                "related_type": r["related_type"],
                "confidence": r["confidence"],
                "context_count": r["context_count"],
            })
    return pd.DataFrame(
        rows, columns=["entity_id", "rel_idx", "relationship_type",
                       "direction", "related_id", "related_name",
                       "related_type", "confidence", "context_count"])


def pipeline_validation(sf_dir: str):
    """Pipeline validation harness (evaluation/pipeline_validation.rs)
    over the kgx build: per-(phase, check) rows with the reference's pass
    conditions and messages, plus the aggregate report row.  Every count
    is a distributed dataset aggregation."""
    import pandas as pd

    from .stages.pipeline_validation import (build_report,
                                             validate_document_processing,
                                             validate_entity_extraction,
                                             validate_graph_construction,
                                             validate_relationship_extraction)

    res = _kgx(sf_dir)

    def chunk_stats(batch: pa.Table) -> pa.Table:
        contents = batch.column("content").to_pylist()
        return pa.Table.from_pydict({
            "n": pa.array([len(contents)], pa.int64()),
            "chars": pa.array([sum(len(c) for c in contents)], pa.int64()),
            "empty": pa.array([sum(1 for c in contents
                                   if not c.strip())], pa.int64()),
        })

    cs = res.chunks.map_batches(chunk_stats,
                                batch_format="pyarrow").take_all()
    n_chunks = sum(r["n"] for r in cs)
    chunk_chars = sum(r["chars"] for r in cs)
    n_empty = sum(r["empty"] for r in cs)
    n_docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]).count()
    # kgx documents are single-sentence spans; the chunker passes the
    # full text through, so corpus doc chars == chunk chars
    doc_chars = chunk_chars

    def ent_stats(batch: pa.Table) -> pa.Table:
        conf = batch.column("confidence").to_pylist()
        types = batch.column("entity_type").to_pylist()
        names = batch.column("canonical_name").to_pylist()
        return pa.Table.from_pydict({
            "n": pa.array([len(conf)], pa.int64()),
            "bad_conf": pa.array([sum(1 for c in conf
                                      if c <= 0.0 or c > 1.0)], pa.int64()),
            "no_type": pa.array([sum(1 for t in types if not t)],
                                pa.int64()),
            "no_name": pa.array([sum(1 for n in names
                                     if not n.strip())], pa.int64()),
        })

    es = res.entities.map_batches(ent_stats,
                                  batch_format="pyarrow").take_all()
    n_entities = sum(r["n"] for r in es)
    ent_ids = {r["canonical_id"] for r in
               res.entities.select_columns(["canonical_id"]).take_all()}
    ids_ref = ray.put(ent_ids)

    def rel_stats(batch: pa.Table) -> pa.Table:
        import ray as _ray

        ids = _ray.get(ids_ref)
        conf = batch.column("confidence").to_pylist()
        types = batch.column("rel_type").to_pylist()
        srcs = batch.column("src").to_pylist()
        dsts = batch.column("dst").to_pylist()
        return pa.Table.from_pydict({
            "n": pa.array([len(conf)], pa.int64()),
            "bad_conf": pa.array([sum(1 for c in conf
                                      if c <= 0.0 or c > 1.0)], pa.int64()),
            "no_type": pa.array([sum(1 for t in types if not t)],
                                pa.int64()),
            "orphans": pa.array([sum(1 for s, d in zip(srcs, dsts)
                                     if s not in ids or d not in ids)],
                                pa.int64()),
        })

    rs = res.edges.map_batches(rel_stats,
                               batch_format="pyarrow").take_all()
    n_rels = sum(r["n"] for r in rs)

    phases = [
        validate_document_processing(doc_chars, n_docs, n_chunks,
                                     chunk_chars, n_empty, 0),
        validate_entity_extraction(
            n_entities, sum(r["bad_conf"] for r in es),
            sum(r["no_type"] for r in es), sum(r["no_name"] for r in es)),
        validate_relationship_extraction(
            n_entities, n_rels, sum(r["bad_conf"] for r in rs),
            sum(r["no_type"] for r in rs), sum(r["orphans"] for r in rs)),
        validate_graph_construction(n_docs, n_chunks, n_entities, n_rels),
    ]
    report = build_report(phases)
    rows = []
    for p in phases:
        for c in p["checks"]:
            rows.append({"phase": p["phase_name"], "check": c["name"],
                         "passed": c["passed"], "expected": c["expected"],
                         "actual": c["actual"], "message": c["message"]})
    rows.append({"phase": "Report", "check": "summary",
                 "passed": report["overall_passed"],
                 "expected": f"{report['total_checks']} checks",
                 "actual": f"{report['passed_checks']} passed",
                 "message": report["summary"]})
    return pd.DataFrame(rows)


def _concept_rows(sf_dir: str):
    from .stages.concept_graph import make_concept_batch_fn

    return _kgx(sf_dir).chunks.map_batches(
        make_concept_batch_fn(), batch_format="pyarrow")


def concept_nodes(sf_dir: str):
    """LazyGraphRAG concept-graph nodes (lightrag/concept_graph.rs:
    319-356): per-document concept extraction (regex phrases + frequency
    keywords) aggregated to node frequencies via a distributed groupby."""

    def project(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({
            "concept": batch.column("concept"),
            # per-doc extraction is deduplicated, so frequency ==
            # document count == chunk count for this corpus shape
            "frequency": batch.column("count()"),
            "n_docs": batch.column("count()"),
            "n_chunks": batch.column("count()"),
        })

    return _concept_rows(sf_dir).groupby("concept").count().map_batches(
        project, batch_format="pyarrow")


def concept_edges(sf_dir: str):
    """Concept co-occurrence relations (concept_graph.rs:387-447):
    lexicographically-ordered pairs sharing ≥1 chunk with Jaccard
    confidence; pair counting and node totals are groupby passes, node
    totals broadcast into the confidence map."""
    rows = _concept_rows(sf_dir)

    from .stages.concept_graph import extract_concepts

    def pairs(batch: pa.Table) -> pa.Table:
        # pairs are emitted inside the SAME per-document extraction pass
        # (a document never spans batches), so no doc-key shuffle is
        # needed before the pair groupby
        out = []
        for content in batch.column("content").to_pylist():
            cs = extract_concepts(content)
            for i in range(len(cs)):
                for j in range(i + 1, len(cs)):
                    out.append(cs[i] + "\x1f" + cs[j])
        return pa.Table.from_pydict({"pair": pa.array(out, pa.string())})

    pair_counts = _kgx(sf_dir).chunks.map_batches(
        pairs, batch_format="pyarrow").groupby("pair").count()
    totals = {r["concept"]: r["count()"] for r in
              rows.groupby("concept").count().take_all()}
    totals_ref = ray.put(totals)

    def finish(batch: pa.Table) -> pa.Table:
        import ray as _ray

        t = _ray.get(totals_ref)
        srcs, dsts, counts, confs = [], [], [], []
        for pair, n in zip(batch.column("pair").to_pylist(),
                           batch.column("count()").to_pylist()):
            a, b = pair.split("\x1f")
            union = t[a] + t[b] - n
            srcs.append(a)
            dsts.append(b)
            counts.append(int(n))
            confs.append(float(np.floor((n / union if union else 0.0)
                                        * 1e4 + 0.5) / 1e4))
        return pa.Table.from_pydict({
            "source": pa.array(srcs, pa.string()),
            "target": pa.array(dsts, pa.string()),
            "count": pa.array(counts, pa.int64()),
            "confidence": pa.array(confs, pa.float64()),
        })

    return pair_counts.map_batches(finish, batch_format="pyarrow")


def _concept_rank_raw(sf_dir: str):
    """Raw (unrounded) ranked concepts shared by the rank/match
    surfaces.  The concept vocabulary is the small side (bounded by the
    template pools; ≪ corpus), so the global ranking runs driver-side —
    same disposition as the entity-graph analytics."""
    from .stages.concept_select import rank_concepts

    nodes = [{"concept": r["concept"], "frequency": r["frequency"],
              "n_docs": r["n_docs"]}
             for r in concept_nodes(sf_dir).take_all()]
    nodes.sort(key=lambda r: r["concept"])
    edges = [(r["source"], r["target"])
             for r in concept_edges(sf_dir)
             .select_columns(["source", "target"]).take_all()]
    n_docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]).count()
    return rank_concepts(nodes, edges, n_docs)


def concept_rank(sf_dir: str):
    """Concept selection ranking (lightrag/concept_selection.rs:134-303):
    0.4·degree + 0.4·normalized-PageRank + 0.2·tanh-IDF, min-score 0.1."""
    import pandas as pd

    rows = []
    for r in _concept_rank_raw(sf_dir):
        rows.append({
            "concept": r["concept"],
            "score": float(_round4([r["score"]])[0]),
            "degree_score": float(_round4([r["degree_score"]])[0]),
            "pagerank_score": float(_round4([r["pagerank_score"]])[0]),
            "idf_score": float(_round4([r["idf_score"]])[0]),
            "document_frequency": int(r["document_frequency"]),
            "total_frequency": int(r["total_frequency"]),
        })
    return pd.DataFrame(rows)


def concept_match(sf_dir: str):
    """Query→concept matching (lightrag/query_concepts.rs:135-377):
    exact containment + edit-distance-bounded fuzzy + ranking boost over
    the fixed CONCEPT_QUERIES workload."""
    import pandas as pd

    from .stages.concept_select import (CONCEPT_QUERIES,
                                        match_query_to_concepts)

    ranked = _concept_rank_raw(sf_dir)
    rows = []
    for q in CONCEPT_QUERIES:
        for i, m in enumerate(match_query_to_concepts(q, ranked)):
            rows.append({
                "query": q, "rank": i, "concept": m["concept"],
                "match_score": float(_round4([m["match_score"]])[0]),
                "exact_score": float(_round4([m["exact_score"]])[0]),
                "fuzzy_score": float(_round4([m["fuzzy_score"]])[0]),
                "matched_tokens": "|".join(m["matched_tokens"]),
            })
    return pd.DataFrame(
        rows, columns=["query", "rank", "concept", "match_score",
                       "exact_score", "fuzzy_score", "matched_tokens"])


def _concept_view(sf_dir: str):
    """ConceptGraphView over the kgx concept graph (small-side collect of
    the concept tables; the per-document extraction behind them is the
    distributed pass)."""
    from .stages.lazy_search import ConceptGraphView
    from .stages.concept_graph import extract_concepts

    freqs = {r["concept"]: int(r["frequency"])
             for r in concept_nodes(sf_dir).take_all()}
    rels = [(r["source"], r["target"], float(r["confidence"]))
            for r in concept_edges(sf_dir).take_all()]

    def cc(batch: pa.Table) -> pa.Table:
        docs, cons = [], []
        for doc_id, content in zip(batch.column("doc_id").to_pylist(),
                                   batch.column("content").to_pylist()):
            for c in extract_concepts(content):
                docs.append(str(doc_id))
                cons.append(c)
        return pa.Table.from_pydict({
            "doc_id": pa.array(docs, pa.string()),
            "concept": pa.array(cons, pa.string())})

    concept_chunks: dict[str, list[str]] = {}
    for r in _kgx(sf_dir).chunks.map_batches(
            cc, batch_format="pyarrow").take_all():
        concept_chunks.setdefault(r["concept"], []).append(r["doc_id"])
    return ConceptGraphView(freqs, rels, concept_chunks)


def query_refine(sf_dir: str):
    """LazyGraphRAG query refinement (lightrag/query_refinement.rs:
    104-301): initial query concepts + co-occurrence expansion with
    connectivity scoring and relevance feedback (rows-only; gated by
    tests/test_lazy_search.py hand fixtures)."""
    import pandas as pd

    from .stages.concept_select import CONCEPT_QUERIES
    from .stages.lazy_search import refine_query

    view = _concept_view(sf_dir)
    rows = []
    for q in CONCEPT_QUERIES:
        r = refine_query(q, view)
        for c in r["initial_concepts"]:
            rows.append({"query": q, "kind": "initial", "concept": c,
                         "score": 1.0,
                         "n_chunks": len(r["relevant_chunk_ids"])})
        for c in r["expanded_concepts"]:
            rows.append({"query": q, "kind": "expanded", "concept": c,
                         "score": float(_round4(
                             [r["relevance_scores"][c]])[0]),
                         "n_chunks": len(r["relevant_chunk_ids"])})
    return pd.DataFrame(
        rows, columns=["query", "kind", "concept", "score", "n_chunks"])


def ids_search_depths(sf_dir: str):
    """Iterative-deepening search (lightrag/iterative_deepening.rs:
    112-313): per-depth exploration stats + the terminal stop reason
    (rows-only; gated by hand fixtures)."""
    import pandas as pd

    from .stages.concept_select import CONCEPT_QUERIES
    from .stages.lazy_search import ids_search

    view = _concept_view(sf_dir)
    rows = []
    for q in CONCEPT_QUERIES:
        r = ids_search(q, view)
        for d in r["depths"]:
            rows.append({"query": q, "depth": d["depth"],
                         "concepts_explored": d["concepts_explored"],
                         "new_chunks_found": d["new_chunks_found"],
                         "stop_reason": ""})
        rows.append({"query": q, "depth": -1,
                     "concepts_explored": r["total_concepts"],
                     "new_chunks_found": r["total_chunks"],
                     "stop_reason": r["stop_reason"]})
    return pd.DataFrame(
        rows, columns=["query", "depth", "concepts_explored",
                       "new_chunks_found", "stop_reason"])


def lightrag_entities(sf_dir: str):
    """LightRAG graph-indexer entity extraction
    (lightrag/graph_indexer.rs:68-115) over the kgx sentences."""
    from .stages.lightrag_extract import make_indexer_batch_fn

    return _kgx_sentences(sf_dir).map_batches(
        make_indexer_batch_fn("entities"), batch_format="pyarrow")


def lightrag_relationships(sf_dir: str):
    """LightRAG graph-indexer relationship patterns
    (graph_indexer.rs:121-248): between-text scan with type boosts and
    positional reversal rules."""
    from .stages.lightrag_extract import make_indexer_batch_fn

    return _kgx_sentences(sf_dir).map_batches(
        make_indexer_batch_fn("relationships"), batch_format="pyarrow")


def weight_opt_history(sf_dir: str):
    """Graph weight optimizer (optimization/graph_weight_optimizer.rs:
    228-305, DW-GRPO-style): heuristic relevance/faithfulness/conciseness
    over the kgx graph, slope-based stagnation boosting of the objective
    weights across the 20-iteration loop (the reference's weight-adjust
    step is a placeholder, so per-iteration metrics are flat and the
    weight drift is the observable)."""
    import pandas as pd

    from .stages.weight_optimizer import (WEIGHT_TEST_QUERIES,
                                          optimize_weights)

    res = _kgx(sf_dir)
    entities = [{"name": r["canonical_name"],
                 "entity_type": r["entity_type"]}
                for r in res.entities.select_columns(
                    ["canonical_name", "entity_type"]).take_all()]
    relationships = [{"rel_type": r["rel_type"],
                      "confidence": float(r["confidence"])}
                     for r in res.edges.select_columns(
                         ["rel_type", "confidence"]).take_all()]
    history = optimize_weights(entities, relationships,
                               list(WEIGHT_TEST_QUERIES))
    rows = []
    for s in history:
        rows.append({
            "iteration": s["iteration"],
            "relevance": float(_round4([s["relevance_score"]])[0]),
            "faithfulness": float(_round4([s["faithfulness_score"]])[0]),
            "conciseness": float(_round4([s["conciseness_score"]])[0]),
            "combined": float(_round4([s["combined_score"]])[0]),
            "w_relevance": float(_round4([s["weights"]["relevance"]])[0]),
            "w_faithfulness": float(_round4(
                [s["weights"]["faithfulness"]])[0]),
            "w_conciseness": float(_round4(
                [s["weights"]["conciseness"]])[0]),
        })
    return pd.DataFrame(rows)


def inferred_relations(sf_dir: str):
    """Implicit relationship inference (inference.rs:83-156) for the
    fixed targets over the kgx corpus: per-chunk evidence scoring
    (base + proximity + weighted patterns), chunk-count normalization,
    0.3 threshold, top-10."""
    import pandas as pd

    from .stages.inference import INFER_TARGETS, infer_relationships

    res = _kgx(sf_dir)

    def project(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.equal(batch.column("row_kind"), "entity"))
        names = batch.column("name").to_pylist()
        types = batch.column("entity_type").to_pylist()
        return pa.Table.from_pydict({
            "doc_id": pa.array([str(d) for d in
                                batch.column("doc_id").to_pylist()],
                               pa.string()),
            "canonical_id": pa.array(
                [f"{t}_{n.replace(' ', '').lower()}"
                 for n, t in zip(names, types)], pa.string()),
        })

    # Only chunks containing a target can contribute evidence (the stage
    # filters to target_chunks and normalizes by their count), so prune to
    # them distributed-side: the driver holds target-proportional rows, not
    # the corpus (the old full-corpus take_all was a 100 TB driver payload).
    target_ids = {t for t, _ in INFER_TARGETS}

    def target_chunk_row(group: pa.Table) -> pa.Table:
        ents = sorted(set(group.column("canonical_id").to_pylist()))
        if not target_ids.intersection(ents):
            return pa.Table.from_pydict(
                {"doc_id": pa.array([], pa.string()),
                 "ents": pa.array([], pa.list_(pa.string()))})
        d = group.column("doc_id")[0].as_py()
        return pa.Table.from_pydict(
            {"doc_id": pa.array([d], pa.string()),
             "ents": pa.array([ents], pa.list_(pa.string()))})

    tc_rows = (res.extraction.map_batches(project, batch_format="pyarrow")
               .groupby("doc_id")
               .map_groups(target_chunk_row, batch_format="pyarrow")
               .take_all())
    chunk_entities = sorted((r["doc_id"], list(r["ents"])) for r in tc_rows)
    docset = {d for d, _ in chunk_entities}

    def keep_target_docs(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = pa.array([str(d) for d in batch.column("doc_id").to_pylist()],
                       pa.string())
        return batch.filter(
            pc.is_in(ids, value_set=pa.array(sorted(docset), pa.string())))

    contents = {str(r["doc_id"]): r["content"] for r in
                res.chunks.select_columns(["doc_id", "content"])
                .map_batches(keep_target_docs, batch_format="pyarrow")
                .take_all()}

    rows = []
    for target, rel_type in INFER_TARGETS:
        for r in infer_relationships(target, rel_type, chunk_entities,
                                     contents, min_confidence=0.05):
            rows.append({
                "source": r["source"], "target": r["target"],
                "relation_type": r["relation_type"],
                "confidence": float(_round4([r["confidence"]])[0]),
                "evidence_count": r["evidence_count"],
            })
    return pd.DataFrame(
        rows, columns=["source", "target", "relation_type", "confidence",
                       "evidence_count"])


# ---------------------------------------------------------------------------
# training-data curation surfaces (stages/curation.py — all SQL-oracled)


def pii_detect(sf_dir: str):
    """PII counts per doc over the deterministically injected twin corpus
    (vectorized RE2 kernels; see stages/curation.py)."""
    from .stages import curation

    return _docs(sf_dir).map_batches(curation.pii_detect, batch_format="pyarrow")


def pii_redacted(sf_dir: str):
    """Redacted text (emails/phones/IPv4 → placeholders), exact-string oracle."""
    from .stages import curation

    return _docs(sf_dir).map_batches(curation.pii_redact, batch_format="pyarrow")


def doc_split(sf_dir: str):
    """Deterministic 80/10/10 train/valid/test hash split by md5(doc_id)."""
    from .stages import curation

    return _docs(sf_dir, ("doc_id",)).map_batches(
        curation.hash_split, batch_format="pyarrow")


def doc_repetition(sf_dir: str):
    """Gopher-style repetition signals (token / 2-gram counts) per doc."""
    from .stages import curation

    return _docs(sf_dir).map_batches(
        curation.repetition_stats, batch_format="pyarrow")


def doc_decontam(sf_dir: str):
    """Benchmark decontamination: 5-gram overlap of every training doc
    against the benchmark members (doc_id % 97 == 0). The benchmark
    shingle index is tiny by construction (eval sets are small) and is
    broadcast once via ray.put — the training side streams."""
    from .stages import curation

    docs = _docs(sf_dir)
    bench_rows = docs.map_batches(
        curation.bench_shingle_partial, batch_format="pyarrow").take_all()
    bench = frozenset(r["shingle"] for r in bench_rows)
    ref = ray.put(bench)
    return docs.map_batches(
        curation.make_decontam_fn(ref), batch_format="pyarrow")


def source_stats(sf_dir: str):
    """Per-source mixing statistics (domain-weighting input): in-batch
    (source, lang) partials → keyed groupby → per-source rollup."""
    from .stages import curation

    ds = _docs(sf_dir, ("doc_id", "text", "lang", "source"))
    partial = ds.map_batches(curation.source_lang_partial, batch_format="pyarrow")
    agg = partial.groupby(["source", "lang"]).aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("n_chars", alias_name="n_chars"),
        Sum("n_tokens", alias_name="n_tokens"),
    )
    return agg.groupby("source").map_groups(
        curation.source_rollup, batch_format="pyarrow")


def source_mix_weights(sf_dir: str, alpha: float = 0.3):
    """Temperature-scaled source sampling weights — the multinomial
    temperature scheme of XLM-R (arXiv:1911.02116 §3.1) / mT5 with
    alpha=0.3: w_s = p_s^alpha / sum_t p_t^alpha, p_s = n_s / N. The
    distributed part is the per-source count (in-batch combiner → keyed
    groupby); the finalize runs on the tiny one-row-per-source table in
    a defined source-sorted order so the float sum is reproducible."""
    import numpy as np

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        g = (pd.Series(batch.column("source").to_pylist())
             .value_counts(sort=False))
        return pa.table({"source": pa.array(g.index.astype(str)),
                         "n": pa.array(g.to_numpy(), pa.int64())})

    counts = (_docs(sf_dir, ("source",))
              .map_batches(partial, batch_format="pyarrow")
              .groupby("source").aggregate(Sum("n", alias_name="n_docs")))
    df = counts.to_pandas().sort_values("source").reset_index(drop=True)
    n = df["n_docs"].to_numpy(np.float64)
    s = np.power(n / n.sum(), alpha)
    w = s / s.sum()
    return pa.table({
        "source": pa.array(df["source"].astype(str)),
        "n_docs": pa.array(df["n_docs"].to_numpy(np.int64)),
        "weight": pa.array(np.floor(w * 1e6 + 0.5) / 1e6, pa.float64()),
    })


def lang_sample(sf_dir: str):
    """Stratified deterministic sampling: 5 docs per lang in md5(doc_id)
    hash order — per-batch partial top-k, tiny final merge per lang."""
    from .stages import curation

    ds = _docs(sf_dir, ("doc_id", "lang"))
    partials = ds.map_batches(curation.sample_partial, batch_format="pyarrow")
    return partials.groupby("lang").map_groups(
        curation.sample_final, batch_format="pyarrow")


def source_cap(sf_dir: str, cap: int = 10):
    """Per-source (per-domain) document cap: within each source keep the
    cap docs ranked by a deterministic md5 draw — unbiased per-source
    thinning for source-mix control. A per-batch local top-cap combiner
    runs before the groupby so a hot domain ships ≤ cap rows per block
    into the exchange (provably result-identical: min-k semilattice)."""
    from .stages import curation

    ds = _docs(sf_dir, ("doc_id", "source"))
    return (ds.map_batches(curation.make_source_cap_thin_fn(cap),
                           batch_format="pandas")
            .groupby("source").map_groups(
                curation.make_source_cap_fn(cap), batch_format="pandas"))


def doc_shard_assignment(sf_dir: str):
    """Deterministic global shuffle into fixed-size training shards:
    shard = salted md5 draw, pos = within-shard shuffle order. The shard
    COUNT is derived from the doc footer count (shard size stays
    ~SHARD_DOCS at any corpus scale, so the per-group finalize is
    constant-memory); the SQL twin computes the same count from
    count(*). This is the 'shuffle the corpus for training' step — the
    output is directly writable as one parquet file per shard."""
    from .stages import curation

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    n_shards = curation.derived_shard_count(n_docs)
    return (
        _docs(sf_dir, ("doc_id",))
        .map_batches(curation.make_shard_partial_fn(n_shards),
                     batch_format="pyarrow")
        .groupby("shard")
        .map_groups(curation.shard_positions, batch_format="pyarrow")
    )


def shard_packing(sf_dir: str, seqlen: int = 4096):
    """Concat-then-chop sequence packing over the training-shard order
    (the 'concatenate the shuffled corpus and cut every seqlen tokens'
    step): per doc, the tokens that precede it in its shard stream and
    the training sequence it starts in. Same derived shard count and
    constant-size per-shard finalize as doc_shard_assignment."""
    from .stages import curation

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    n_shards = curation.derived_shard_count(n_docs)
    return (
        _docs(sf_dir, ("doc_id", "text"))
        .map_batches(curation.make_shard_pack_partial_fn(n_shards),
                     batch_format="pyarrow")
        .groupby("shard")
        .map_groups(curation.make_shard_pack_fn(seqlen),
                    batch_format="pyarrow")
    )


def doc_length_quantiles(sf_dir: str):
    """Exact discrete length quantiles via a value-count combiner: the
    exchange carries distinct lengths only (quantile_disc twin)."""
    from ray.data.aggregate import Sum

    from .stages import text_analysis

    counts = (_docs(sf_dir).map_batches(text_analysis.length_count_rows,
                                        batch_format="pyarrow")
              .groupby("n_chars")
              .aggregate(Sum("n", alias_name="n")))
    blocks = [t for t in ray.get(counts.to_arrow_refs()) if t.num_rows]
    if not blocks:  # empty corpus: typed empty result, not ArrowInvalid
        return pa.table({"q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.int64())})
    tbl = pa.concat_tables(blocks, promote_options="default")
    return text_analysis.quantiles_from_counts(tbl, (25, 50, 75, 90, 99))


def doc_filter_verdict(sf_dir: str):
    """Composite C4/Gopher-style keep/drop verdict per doc with the
    first-failing-rule reason (integer-threshold rules; SQL-oracled)."""
    from .stages import curation

    return _docs(sf_dir).map_batches(
        curation.filter_verdict, batch_format="pyarrow")


def gopher_quality(sf_dir: str):
    """Gopher line-structure quality rules (Rae et al. 2112.11446 §A1.1):
    per-doc integer signals (bullet/ellipsis line counts, alpha-word and
    symbol counts, the paper's 8-stopword presence) and the keep verdict
    under the published thresholds — all integer cross-multiplied, so the
    DuckDB twin is bit-exact. Complements doc_filter_verdict (token-level
    C4 rules) with the line-shape rule family."""
    from .stages import text_analysis

    return _docs(sf_dir).map_batches(
        text_analysis.gopher_stats, batch_format="pyarrow")


def split_leakage(sf_dir: str):
    """Cross-split contamination: SimHash near-dup pairs whose two docs
    land in different train/valid/test hash-split buckets. Split is a
    pure function of doc_id, so the pair stream is annotated in-flight
    with no extra shuffle."""
    from .stages import curation

    return dedup_simhash_pairs(sf_dir).map_batches(
        curation.pair_split_leakage, batch_format="pyarrow")


def syn_hits(sf_dir: str):
    """HITS hubs/authorities over the replayed syn graph (driver-oracled:
    the SQL twin replays the unnormalized directed power iteration as a
    recursive CTE — syn_oracle_kg._hits_replay)."""
    from .stages import graph_analytics as ga

    res = _syn(sf_dir)
    df = ga.hits(res.entities, res.edges).to_pandas()
    for c in ("authority", "hub"):
        df[c] = _round4(df[c].to_numpy())
    return df


def kgx_hits(sf_dir: str):
    """HITS hubs/authorities over the kgx graph (same recursive-CTE twin
    over the template corpus graph)."""
    from .stages import graph_analytics as ga

    res = _kgx(sf_dir)
    df = ga.hits(res.entities, res.edges).to_pandas()
    for c in ("authority", "hub"):
        df[c] = _round4(df[c].to_numpy())
    return df


def lineitem_pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped pricing summary over the biggest table: per-batch
    Arrow partial aggregation into integer-scaled accumulators (cents /
    1e-4 / 1e-6 dollars — exact under ANY summation order, so the
    distributed combine is bit-identical to the SQL twin), then a tiny
    groupby over ≤6 (returnflag, linestatus) groups. Averages are one
    float division at the end (round4)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        cutoff = np.datetime64("1998-09-02T23:59:59")
        ship = batch.column("l_shipdate").to_numpy(zero_copy_only=False)
        mask = ship <= cutoff
        if not mask.any():
            return pa.Table.from_pydict(
                {c: pa.array([], t) for c, t in (
                    ("l_returnflag", pa.string()),
                    ("l_linestatus", pa.string()),
                    ("sum_qty", pa.int64()),
                    ("sum_base_cents", pa.int64()),
                    ("sum_disc_e4", pa.int64()),
                    ("sum_charge_e6", pa.int64()),
                    ("sum_disc100", pa.int64()),
                    ("count_order", pa.int64()))})
        flag = np.asarray(batch.column("l_returnflag").to_pylist(),
                          dtype=object)[mask]
        status = np.asarray(batch.column("l_linestatus").to_pylist(),
                            dtype=object)[mask]
        qty = batch.column("l_quantity").to_numpy()[mask]
        ext = batch.column("l_extendedprice").to_numpy()[mask]
        disc = batch.column("l_discount").to_numpy()[mask]
        tax = batch.column("l_tax").to_numpy()[mask]
        # integer-scaled: all inputs are 2-decimal money/ratio values, so
        # rint(x*100) recovers the exact integer (never a .5 tie)
        qty_i = np.rint(qty).astype(np.int64)
        ext_c = np.rint(ext * 100).astype(np.int64)
        d100 = np.rint(disc * 100).astype(np.int64)
        t100 = np.rint(tax * 100).astype(np.int64)
        disc_e4 = ext_c * (100 - d100)
        charge_e6 = disc_e4 * (100 + t100)
        keys = np.char.add(np.char.add(flag.astype(str), "|"),
                           status.astype(str))
        uniq, inv = np.unique(keys, return_inverse=True)
        n = len(uniq)
        out = {
            "l_returnflag": [k.split("|")[0] for k in uniq],
            "l_linestatus": [k.split("|")[1] for k in uniq],
            "sum_qty": np.bincount(inv, qty_i, n).astype(np.int64),
            "sum_base_cents": np.bincount(inv, ext_c, n).astype(np.int64),
            "sum_disc_e4": np.bincount(inv, disc_e4, n).astype(np.int64),
            "sum_charge_e6": np.bincount(inv, charge_e6, n).astype(np.int64),
            "sum_disc100": np.bincount(inv, d100, n).astype(np.int64),
            "count_order": np.bincount(inv, minlength=n).astype(np.int64),
        }
        return pa.Table.from_pydict(out)

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax", "l_shipdate"])
    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["l_returnflag", "l_linestatus"])
           .aggregate(*[Sum(c, alias_name=c) for c in
                        ("sum_qty", "sum_base_cents", "sum_disc_e4",
                         "sum_charge_e6", "sum_disc100", "count_order")]))
    df = agg.to_pandas()
    cnt = df["count_order"].to_numpy().astype(np.float64)
    df["avg_qty"] = _round4(df["sum_qty"].to_numpy() / cnt)
    df["avg_price_cents"] = _round4(df["sum_base_cents"].to_numpy() / cnt)
    df["avg_disc100"] = _round4(df["sum_disc100"].to_numpy() / cnt)
    df = df.drop(columns=["sum_disc100"])
    return df


def ship_latency_histogram(sf_dir: str):
    """Order→ship latency distribution: big×big bucketed hash join
    (lineitem ⋈ orders on the high-cardinality orderkey, one
    groupby(bucket) exchange) feeding a per-batch integer-day histogram
    partial and a tiny groupby — the canonical fact⋈dimension + rollup
    shape at 100-TB scale (all-integer contract)."""
    from ray.data.aggregate import Sum

    from .stages.joins import bucketed_hash_join, derived_join_buckets

    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_shipdate"])
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_orderdate"])
    joined = bucketed_hash_join(li, orders, "l_orderkey", "o_orderkey",
                                ["l_shipdate"], ["o_orderdate"],
                                num_buckets=derived_join_buckets(
                                    sf_dir, "lineitem", "orders"))

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.Table.from_pydict(
                {"latency_days": pa.array([], pa.int64()),
                 "n_items": pa.array([], pa.int64())})
        ship = batch.column("l_shipdate").to_numpy(zero_copy_only=False)
        odate = batch.column("o_orderdate").to_numpy(zero_copy_only=False)
        us = (ship - odate).astype("timedelta64[us]").astype(np.int64)
        days = us // 86_400_000_000
        uniq, counts = np.unique(days, return_counts=True)
        return pa.Table.from_pydict(
            {"latency_days": pa.array(uniq, pa.int64()),
             "n_items": pa.array(counts.astype(np.int64), pa.int64())})

    return (joined.map_batches(partial, batch_format="pyarrow")
            .groupby("latency_days")
            .aggregate(Sum("n_items", alias_name="n_items")))


def doc_readability(sf_dir: str):
    """Flesch reading-ease per document (deterministic vowel-group
    syllable heuristic; stateless map_batches)."""
    return _docs(sf_dir).map_batches(text_analysis.readability_stats,
                                     batch_format="pyarrow")


def embedding_mutual_knn(sf_dir: str):
    """Mutual nearest-neighbor pairs over the embedding table (the
    classic near-duplicate / translation-pair miner): blocked all-pairs
    NN partials over object-store block refs (bounded per-task memory),
    a per-vector max-reduce, then a groupby on the unordered pair key to
    keep only mutually-nearest pairs. Ties break to the smallest
    neighbor id on both sides."""
    import pyarrow.compute as _pc

    ds = _embeddings(sf_dir).materialize()
    refs = ds.to_arrow_refs()
    n = len(refs)
    pair_ds = ray.data.from_items(
        [{"i": i, "j": j} for i in range(n) for j in range(i, n)])
    partials = pair_ds.map_batches(
        ann.make_block_pair_nn_fn(refs), batch_size=1,
        batch_format="pyarrow")
    nn = partials.groupby("vec_id").map_groups(
        ann.nn_reduce, batch_format="pyarrow")

    def pair_key(batch: pa.Table) -> pa.Table:
        a = batch.column("vec_id").to_numpy()
        b = batch.column("nbr_id").to_numpy()
        return batch.append_column(
            "pmin", pa.array(np.minimum(a, b), pa.int64())).append_column(
            "pmax", pa.array(np.maximum(a, b), pa.int64()))

    return (nn.map_batches(pair_key, batch_format="pyarrow")
            .groupby(["pmin", "pmax"])
            .map_groups(ann.mutual_pairs, batch_format="pyarrow"))


def customers_without_orders(sf_dir: str, price_floor: float = 400000.0):
    """Distributed ANTI-join (J-family): customers with no high-value
    order (o_totalprice > price_floor — the floor keeps the result
    non-degenerate at every test scale). Both sides hash into the same
    bucket space on the join key, ONE groupby(bucket) exchange
    co-locates them, and the per-bucket task keeps left rows whose key
    is absent from the right side (vectorized pc.index_in null-mask) —
    the scale shape for EXCEPT/NOT-EXISTS at 100 TB. The right side is
    filtered BEFORE the exchange, so only qualifying keys shuffle; the
    bucket count is DERIVED FROM THE INPUT SIZE (metadata-cheap parquet
    count, one bucket per ~8k left keys) so per-bucket memory stays
    constant as the corpus grows — no fixed B on the path."""
    import pyarrow.compute as _pc

    num_buckets = max(32, int(ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey"]).count()) // 8192 + 1)

    def tag(side: int, key_col: str, name_col: str | None):
        def fn(batch: pa.Table) -> pa.Table:
            keys = batch.column(key_col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            bucket = ((keys.astype(np.uint64) * np.uint64(2654435761))
                      % np.uint64(1 << 32)) % np.uint64(num_buckets)
            return pa.Table.from_pydict(
                {"bucket": pa.array(bucket.astype(np.int32)),
                 "jkey": pa.array(keys),
                 "side": pa.array(np.full(len(keys), side, dtype=np.int8)),
                 "c_name": (batch.column(name_col) if name_col
                            else pa.nulls(len(keys), pa.string()))})
        return fn

    customers = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])

    def high_value(batch: pa.Table) -> pa.Table:
        return batch.filter(
            _pc.greater(batch.column("o_totalprice"), price_floor))

    left = customers.map_batches(tag(0, "c_custkey", "c_name"),
                                 batch_format="pyarrow")
    right = (orders.map_batches(high_value, batch_format="pyarrow")
             .map_batches(tag(1, "o_custkey", None), batch_format="pyarrow"))

    def anti(batch: pa.Table) -> pa.Table:
        side = batch.column("side")
        l = batch.filter(_pc.equal(side, 0))
        r = batch.filter(_pc.equal(side, 1))
        idx = _pc.index_in(l.column("jkey"), r.column("jkey"))
        keep = _pc.is_null(idx)
        l = l.filter(keep)
        return pa.Table.from_pydict(
            {"c_custkey": l.column("jkey"), "c_name": l.column("c_name")})

    return (left.union(right).groupby("bucket")
            .map_groups(anti, batch_format="pyarrow"))


def large_order_customers(sf_dir: str, min_qty: int = 250):
    """TPC-H Q18 shape — HAVING over a corpus-wide aggregation, joined
    back to the fact table: orders whose total lineitem quantity
    exceeds min_qty (~p99), with their customer. The aggregate is the
    standard combiner → keyed groupby; the filtered survivors (a ~1%
    slice, still corpus-proportional at 100 TB) flow through an
    orderkey-keyed Dataset.join with a derived partition count — never
    a driver collect or broadcast of a fact-sized side."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        g = (pd.DataFrame({
                "o_orderkey": batch.column("l_orderkey").to_numpy(),
                "q": batch.column("l_quantity").to_numpy()})
             .groupby("o_orderkey", sort=False)["q"].sum().reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    totals = (ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                                    columns=["l_orderkey", "l_quantity"])
              .map_batches(partial, batch_format="pyarrow")
              .groupby("o_orderkey").aggregate(Sum("q", alias_name="q")))

    def having(batch: pa.Table) -> pa.Table:
        q = batch.column("q").to_numpy()
        keep = q > min_qty
        return pa.table({
            "o_orderkey": pa.array(
                batch.column("o_orderkey").to_numpy()[keep], pa.int64()),
            "total_qty": pa.array(np.rint(q[keep]).astype(np.int64))})

    big = totals.map_batches(having, batch_format="pyarrow")
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey"])
    n_orders = pq.read_metadata(f"{sf_dir}/orders.parquet").num_rows
    p = max(8, n_orders // 2_000_000 + 1)
    return big.join(orders, "inner", int(p), on=("o_orderkey",))


def orders_rollup(sf_dir: str):
    """Multi-level aggregate (GROUP BY ROLLUP twin): order counts and
    exact cent-sums by (status, priority), by status, and the grand
    total, with 'ALL' filling the rolled-up level. The corpus is scanned
    ONCE: a per-batch combiner feeds the finest-level keyed groupby, and
    the two coarser levels are re-aggregated from that tiny base table
    (|statuses| x |priorities| rows) — never from a second scan."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        cents = np.rint(
            batch.column("o_totalprice").to_numpy() * 100).astype(np.int64)
        g = (pd.DataFrame({
                "o_orderstatus": batch.column("o_orderstatus").to_pylist(),
                "o_orderpriority": batch.column("o_orderpriority").to_pylist(),
                "n_orders": 1, "sum_cents": cents})
             .groupby(["o_orderstatus", "o_orderpriority"], sort=False)
             .agg(n_orders=("n_orders", "sum"), sum_cents=("sum_cents", "sum"))
             .reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    base = (ray.data.read_parquet(
                f"{sf_dir}/orders.parquet",
                columns=["o_orderstatus", "o_orderpriority", "o_totalprice"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby(["o_orderstatus", "o_orderpriority"])
            .aggregate(Sum("n_orders", alias_name="n_orders"),
                       Sum("sum_cents", alias_name="sum_cents")))
    df = base.to_pandas()  # tiny by construction
    lvl1 = (df.groupby("o_orderstatus", as_index=False)
            [["n_orders", "sum_cents"]].sum())
    lvl1["o_orderpriority"] = "ALL"
    lvl0 = pd.DataFrame({"o_orderstatus": ["ALL"], "o_orderpriority": ["ALL"],
                         "n_orders": [df["n_orders"].sum()],
                         "sum_cents": [df["sum_cents"].sum()]})
    out = pd.concat([df, lvl1, lvl0], ignore_index=True)
    return pa.table({
        "o_orderstatus": pa.array(out["o_orderstatus"].astype(str)),
        "o_orderpriority": pa.array(out["o_orderpriority"].astype(str)),
        "n_orders": pa.array(out["n_orders"].to_numpy(np.int64)),
        "sum_cents": pa.array(out["sum_cents"].to_numpy(np.int64)),
    })


def part_type_supplier_counts(sf_dir: str,
                              broadcast_limit: int = 5_000_000):
    """Distributed COUNT(DISTINCT) after a dimension join (the TPC-H
    Q16 shape): distinct suppliers shipping each part type. ADAPTIVE
    join strategy (the lm_score broadcast_limit pattern): below the
    threshold the partkey→type dimension ships once via ray.put (sorted
    driver-side so batches binary-search with no per-batch sort) and
    each lineitem batch maps locally — no shuffle join; above it — a
    100-TB part table is NOT broadcastable — the dimension flows
    through a partkey-keyed Dataset.join with a partition count derived
    from the fact side. Either way the distinct then runs as the
    standard two-phase exchange: batch-local dedup → groupby(type,
    supp) → per-type count; per-group size is bounded by |suppliers|."""
    import pandas as pd

    def local_distinct(batch: pa.Table) -> pa.Table:
        g = (pd.DataFrame({
                "p_type": batch.column("p_type").to_pylist(),
                "l_suppkey": batch.column("l_suppkey").to_numpy()})
             .drop_duplicates())
        return pa.Table.from_pandas(g[["p_type", "l_suppkey"]],
                                    preserve_index=False)

    n_part = pq.read_metadata(f"{sf_dir}/part.parquet").num_rows
    if n_part > broadcast_limit:
        fact = (ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                                      columns=["l_partkey", "l_suppkey"])
                .map_batches(
                    lambda t: t.rename_columns(["p_partkey", "l_suppkey"]),
                    batch_format="pyarrow"))
        dim = ray.data.read_parquet(f"{sf_dir}/part.parquet",
                                    columns=["p_partkey", "p_type"])
        n_fact = pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows
        joined = fact.join(dim, "inner",
                           max(16, n_fact // 2_000_000 + 1),
                           on=("p_partkey",))
        pairs = joined.map_batches(local_distinct, batch_format="pyarrow")
    else:
        part = pq.read_table(f"{sf_dir}/part.parquet",
                             columns=["p_partkey", "p_type"])
        type_codes = (part.column("p_type").dictionary_encode()
                      .combine_chunks())
        keys = part.column("p_partkey").to_numpy()
        codes = type_codes.indices.to_numpy(zero_copy_only=False)
        order = np.argsort(keys)  # sorted ONCE here, not per batch
        lookup_ref = ray.put((keys[order], codes[order],
                              type_codes.dictionary.to_pylist()))

        def attach(batch: pa.Table) -> pa.Table:
            keys, codes, names = ray.get(lookup_ref)
            pos = np.searchsorted(keys, batch.column("l_partkey").to_numpy())
            g = (pd.DataFrame({"tc": codes[pos],
                               "l_suppkey": batch.column(
                                   "l_suppkey").to_numpy()})
                 .drop_duplicates())
            return pa.table({
                "p_type": pa.array([names[c] for c in g["tc"]], pa.string()),
                "l_suppkey": pa.array(g["l_suppkey"].to_numpy(), pa.int64())})

        pairs = (ray.data.read_parquet(
                     f"{sf_dir}/lineitem.parquet",
                     columns=["l_partkey", "l_suppkey"])
                 .map_batches(attach, batch_format="pyarrow"))

    distinct = pairs.groupby(["p_type", "l_suppkey"]).count()

    def per_type_partial(batch: pa.Table) -> pa.Table:
        g = (pd.Series(batch.column("p_type").to_pylist())
             .value_counts(sort=False))
        return pa.table({"p_type": pa.array(g.index.astype(str)),
                         "n": pa.array(g.to_numpy(), pa.int64())})

    return (distinct.map_batches(per_type_partial, batch_format="pyarrow")
            .groupby("p_type").aggregate(Sum("n", alias_name="n_suppliers")))


def top_orders_per_customer(sf_dir: str, k: int = 3):
    """Distributed top-N-per-group with ranks (the row_number() <= N
    window pattern): each customer's k priciest orders, rank attached.
    Per-batch partial top-k collapses every batch to <= k rows per key
    BEFORE the exchange (min-k semilattice, result-identical), then the
    keyed groupby finishes with the final sort+rank — shuffle volume is
    O(k * |keys|), never O(rows)."""

    def partial(batch: pa.Table) -> pa.Table:
        cust = batch.column("o_custkey").to_numpy()
        okey = batch.column("o_orderkey").to_numpy()
        price = batch.column("o_totalprice").to_numpy()
        order = np.lexsort((okey, -price, cust))
        cust_s = cust[order]
        # position within each customer's run (runs are contiguous)
        starts = np.ones(len(cust_s), dtype=bool)
        starts[1:] = cust_s[1:] != cust_s[:-1]
        pos = np.arange(len(cust_s)) - np.maximum.accumulate(
            np.where(starts, np.arange(len(cust_s)), 0))
        sel = order[pos < k]
        return pa.Table.from_pydict(
            {"o_custkey": pa.array(cust[sel], pa.int64()),
             "o_orderkey": pa.array(okey[sel], pa.int64()),
             "o_totalprice": pa.array(price[sel], pa.float64())})

    def final(group: pa.Table) -> pa.Table:
        okey = group.column("o_orderkey").to_numpy()
        price = group.column("o_totalprice").to_numpy()
        best = np.lexsort((okey, -price))[:k]
        return pa.Table.from_pydict(
            {"o_custkey": group.column("o_custkey").take(best),
             "rn": pa.array(np.arange(1, len(best) + 1), pa.int64()),
             "o_orderkey": pa.array(okey[best], pa.int64()),
             "price_cents": pa.array(
                 np.rint(price[best] * 100).astype(np.int64), pa.int64())})

    return (ray.data.read_parquet(
                f"{sf_dir}/orders.parquet",
                columns=["o_custkey", "o_orderkey", "o_totalprice"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("o_custkey")
            .map_groups(final, batch_format="pyarrow"))


def latest_order_per_customer(sf_dir: str):
    """Distributed argmax-per-group: each customer's most recent order
    (latest o_orderdate; ties to the smallest orderkey). Per-batch
    partial argmax collapses each batch to ≤1 row per key BEFORE the
    exchange, then a keyed groupby finishes — the pre-aggregate shape
    that keeps the shuffle proportional to |keys|, not |rows|."""

    def partial(batch: pa.Table) -> pa.Table:
        cust = batch.column("o_custkey").to_numpy()
        okey = batch.column("o_orderkey").to_numpy()
        odate = batch.column("o_orderdate").to_numpy(
            zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        price = batch.column("o_totalprice").to_numpy()
        # sort by (cust, -date, okey) then take first per cust
        order = np.lexsort((okey, -odate, cust))
        cust_s = cust[order]
        first = np.ones(len(cust_s), dtype=bool)
        first[1:] = cust_s[1:] != cust_s[:-1]
        sel = order[first]
        return pa.Table.from_pydict(
            {"o_custkey": pa.array(cust[sel], pa.int64()),
             "o_orderkey": pa.array(okey[sel], pa.int64()),
             "odate_us": pa.array(odate[sel], pa.int64()),
             "price_cents": pa.array(
                 np.rint(price[sel] * 100).astype(np.int64), pa.int64())})

    def final(group: pa.Table) -> pa.Table:
        okey = group.column("o_orderkey").to_numpy()
        odate = group.column("odate_us").to_numpy()
        best = np.lexsort((okey, -odate))[0]
        return group.take([best])

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"])
    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("o_custkey").map_groups(final, batch_format="pyarrow"))


def late_shipment_priority_counts(sf_dir: str, grace_days: int = 60):
    """Distributed EXISTS semi-join (J-family, TPC-H Q4 shape): count
    orders per priority that had at least one lineitem shipped more than
    ``grace_days`` after the order date. The EXISTS is pre-aggregated —
    a per-batch max-shipdate combiner collapses lineitem to ≤1 row per
    orderkey BEFORE any exchange (shuffle ∝ |orderkeys|, not |lineitems|),
    a keyed groupby finishes the max, and ONE bucketed hash join lands the
    per-order predicate against orders. All comparisons are integer
    microseconds, so the SQL twin is exact."""
    from ray.data.aggregate import Max

    from .stages.joins import bucketed_hash_join, derived_join_buckets

    grace_us = grace_days * 86_400_000_000

    def ship_partial(batch: pa.Table) -> pa.Table:
        okey = batch.column("l_orderkey").to_numpy()
        ship = (batch.column("l_shipdate").to_numpy(zero_copy_only=False)
                .astype("datetime64[us]").astype(np.int64))
        order = np.lexsort((-ship, okey))
        okey_s, ship_s = okey[order], ship[order]
        first = np.ones(len(okey_s), dtype=bool)
        first[1:] = okey_s[1:] != okey_s[:-1]
        return pa.Table.from_pydict(
            {"l_orderkey": pa.array(okey_s[first], pa.int64()),
             "max_ship_us": pa.array(ship_s[first], pa.int64())})

    def orders_proj(batch: pa.Table) -> pa.Table:
        odate = (batch.column("o_orderdate").to_numpy(zero_copy_only=False)
                 .astype("datetime64[us]").astype(np.int64))
        return pa.Table.from_pydict(
            {"o_orderkey": batch.column("o_orderkey"),
             "odate_us": pa.array(odate, pa.int64()),
             "o_orderpriority": batch.column("o_orderpriority")})

    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_shipdate"])
    per_order = (li.map_batches(ship_partial, batch_format="pyarrow")
                 .groupby("l_orderkey")
                 .aggregate(Max("max_ship_us", alias_name="max_ship_us")))
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(orders_proj, batch_format="pyarrow")
    joined = bucketed_hash_join(per_order, orders, "l_orderkey", "o_orderkey",
                                ["max_ship_us"], ["odate_us", "o_orderpriority"],
                                # per_order holds ≤1 row per orderkey, so
                                # both join sides are bounded by |orders|
                                num_buckets=derived_join_buckets(
                                    sf_dir, "orders", "orders"))

    def late_counts(batch: pa.Table) -> pa.Table:
        ship = batch.column("max_ship_us").to_numpy()
        odate = batch.column("odate_us").to_numpy()
        late = ship > odate + grace_us
        if not late.any():
            return pa.Table.from_pydict(
                {"o_orderpriority": pa.array([], pa.string()),
                 "n_late_orders": pa.array([], pa.int64())})
        prio = np.asarray(batch.column("o_orderpriority").to_pylist(),
                          dtype=object)[late]
        uniq, counts = np.unique(prio.astype(str), return_counts=True)
        return pa.Table.from_pydict(
            {"o_orderpriority": pa.array(uniq.tolist(), pa.string()),
             "n_late_orders": pa.array(counts.astype(np.int64), pa.int64())})

    return (joined.map_batches(late_counts, batch_format="pyarrow")
            .groupby("o_orderpriority")
            .aggregate(Sum("n_late_orders", alias_name="n_late_orders")))


def top_segment_order_revenue(sf_dir: str, segment: str = "BUILDING",
                              cutoff: str = "1995-03-15", k: int = 10):
    """Multi-way join chain (TPC-H Q3 shape): top-k open-order revenue
    for one market segment — customer ⋈ orders ⋈ lineitem as TWO chained
    bucketed hash joins (no broadcast side; each join is one
    groupby(bucket) exchange), a per-batch integer-e4 revenue combiner,
    a keyed groupby per orderkey, then per-block partial top-k so only
    ≤k rows per block reach the driver. Revenue is integer-scaled
    (cents × (100-disc100)) — exact under any summation order. Ties
    break to the smallest orderkey."""
    import pyarrow.compute as _pc

    from .stages.joins import bucketed_hash_join, derived_join_buckets

    cut = np.datetime64(cutoff)

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(
        lambda b: b.filter(_pc.equal(b.column("c_mktsegment"), segment))
        .select(["c_custkey"]),
        batch_format="pyarrow")

    def orders_proj(batch: pa.Table) -> pa.Table:
        odate = (batch.column("o_orderdate").to_numpy(zero_copy_only=False)
                 .astype("datetime64[us]"))
        keep = odate < cut
        batch = batch.filter(pa.array(keep))
        return pa.Table.from_pydict(
            {"o_orderkey": batch.column("o_orderkey"),
             "o_custkey": batch.column("o_custkey"),
             "odate_us": pa.array(
                 odate[keep].astype(np.int64), pa.int64()),
             "o_orderpriority": batch.column("o_orderpriority")})

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(orders_proj, batch_format="pyarrow")

    # join 1: orders ⋈ segment customers on custkey (semi via N:1 inner)
    seg_orders = bucketed_hash_join(
        orders, cust, "o_custkey", "c_custkey",
        ["o_orderkey", "odate_us", "o_orderpriority"], [],
        num_buckets=derived_join_buckets(sf_dir, "orders", "customer"))

    def li_partial(batch: pa.Table) -> pa.Table:
        ship = (batch.column("l_shipdate").to_numpy(zero_copy_only=False)
                .astype("datetime64[us]"))
        keep = ship > cut
        if not keep.any():
            return pa.Table.from_pydict(
                {"l_orderkey": pa.array([], pa.int64()),
                 "revenue_e4": pa.array([], pa.int64())})
        okey = batch.column("l_orderkey").to_numpy()[keep]
        ext_c = np.rint(
            batch.column("l_extendedprice").to_numpy()[keep] * 100
        ).astype(np.int64)
        d100 = np.rint(
            batch.column("l_discount").to_numpy()[keep] * 100
        ).astype(np.int64)
        rev = ext_c * (100 - d100)
        uniq, inv = np.unique(okey, return_inverse=True)
        return pa.Table.from_pydict(
            {"l_orderkey": pa.array(uniq, pa.int64()),
             "revenue_e4": pa.array(
                 np.bincount(inv, rev, len(uniq)).astype(np.int64),
                 pa.int64())})

    li = (ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"])
        .map_batches(li_partial, batch_format="pyarrow"))

    # join 2: per-orderkey revenue partials ⋈ qualifying orders on orderkey
    joined = bucketed_hash_join(
        li, seg_orders, "l_orderkey", "o_orderkey",
        ["revenue_e4"], ["odate_us", "o_orderpriority"],
        num_buckets=derived_join_buckets(sf_dir, "lineitem", "orders"))

    # per-orderkey final merge: sum the revenue partials; odate/priority
    # are constant within the group (N:1 join), take the first
    def order_merge(g: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {"o_orderkey": g.column("l_orderkey").slice(0, 1),
             "revenue_e4": pa.array(
                 [int(g.column("revenue_e4").to_numpy().sum())], pa.int64()),
             "odate_us": g.column("odate_us").slice(0, 1),
             "o_orderpriority": g.column("o_orderpriority").slice(0, 1)})

    merged = joined.groupby("l_orderkey").map_groups(
        order_merge, batch_format="pyarrow")

    def topk_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        rev = batch.column("revenue_e4").to_numpy()
        okey = batch.column("o_orderkey").to_numpy()
        sel = np.lexsort((okey, -rev))[:k]
        return batch.take(pa.array(np.sort(sel)))

    partials = merged.map_batches(topk_partial, batch_format="pyarrow")
    df = partials.to_pandas()
    df = df.sort_values(["revenue_e4", "o_orderkey"],
                        ascending=[False, True], kind="mergesort").head(k)
    return df.reset_index(drop=True)


def events_top_users(sf_dir: str, k: int = 5):
    """EXACT grouped top-k by count (the exact counterpart to the
    events_user_cms sketch): each event type's k most active users with
    their counts. Shape: per-batch (type, user) count combiner → keyed
    groupby sum (per-group size bounded by |users|, key-partitioned) →
    per-block partial top-k per type → tiny per-type final merge. Ties
    break on user_id ascending (the row_number twin's order)."""
    import pandas as pd

    def partial_counts(batch: pa.Table) -> pa.Table:
        g = (pd.DataFrame({
                "event_type": batch.column("event_type").to_pylist(),
                "user_id": batch.column("user_id").to_numpy()})
             .groupby(["event_type", "user_id"], sort=False).size()
             .rename("n").reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = (ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                    columns=["event_type", "user_id"])
              .map_batches(partial_counts, batch_format="pyarrow")
              .groupby(["event_type", "user_id"])
              .aggregate(Sum("n", alias_name="n")))

    def partial_topk(batch: pa.Table) -> pa.Table:
        # a block can hold many types: keep k rows per TYPE, not per block
        df = (batch.to_pandas()
              .sort_values(["n", "user_id"], ascending=[False, True],
                           kind="mergesort")
              .groupby("event_type", sort=False).head(k))
        return pa.Table.from_pandas(df, preserve_index=False)

    def final_topk(df: pd.DataFrame) -> pa.Table:
        df = (df.sort_values(["n", "user_id"], ascending=[False, True],
                             kind="mergesort").head(k))
        return pa.table({
            "event_type": pa.array(df["event_type"].astype(str)),
            "rn": pa.array(np.arange(1, len(df) + 1), pa.int64()),
            "user_id": pa.array(df["user_id"].to_numpy(np.int64)),
            "n": pa.array(df["n"].to_numpy(np.int64))})

    return (counts.map_batches(partial_topk, batch_format="pyarrow")
            .groupby("event_type")
            .map_groups(final_topk, batch_format="pandas"))


def events_user_cms(sf_dir: str, k: int = 20):
    """Count-Min heavy hitters: per-user event counts estimated through a
    distributed 4×256 md5-hashed Count-Min sketch (per-batch partial
    counter tables merged by one tiny keyed groupby — the sketch, not the
    keys, crosses the wire), reported for the exact top-k users alongside
    their exact counts. The sketch arithmetic is md5-replayable, so the
    SQL twin recomputes every estimate."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from .functions import sketch

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id"])

    def exact_partial(batch: pa.Table) -> pa.Table:
        users, counts = np.unique(batch.column("user_id").to_numpy(),
                                  return_counts=True)
        return pa.Table.from_pydict(
            {"user_id": pa.array(users, pa.int64()),
             "cnt": pa.array(counts.astype(np.int64), pa.int64())})

    def cms_partial(batch: pa.Table) -> pa.Table:
        users, counts = np.unique(batch.column("user_id").to_numpy(),
                                  return_counts=True)
        r, b, c = sketch.cms_partial_counts(users, counts)
        return pa.Table.from_pydict(
            {"row": pa.array(r, pa.int64()),
             "bucket": pa.array(b, pa.int64()),
             "cnt": pa.array(c, pa.int64())})

    exact = (ds.map_batches(exact_partial, batch_format="pyarrow")
             .groupby("user_id").aggregate(Sum("cnt", alias_name="cnt")))
    cms = (ds.map_batches(cms_partial, batch_format="pyarrow")
           .groupby(["row", "bucket"]).aggregate(Sum("cnt", alias_name="cnt")))

    # both reduced tables are tiny (|users| and ≤ DEPTH×WIDTH rows)
    exact_df = exact.to_pandas().sort_values(
        ["cnt", "user_id"], ascending=[False, True]).head(k)
    merged = {(int(r), int(b)): int(c) for r, b, c in
              cms.to_pandas()[["row", "bucket", "cnt"]].itertuples(index=False)}
    est = [sketch.cms_estimate(merged, str(int(u)))
           for u in exact_df["user_id"]]
    return pd.DataFrame(
        {"user_id": exact_df["user_id"].to_numpy(),
         "exact_count": exact_df["cnt"].to_numpy().astype(np.int64),
         "cms_estimate": np.asarray(est, dtype=np.int64)})


def events_user_hll(sf_dir: str):
    """Distributed HyperLogLog cardinality: distinct users in the events
    stream estimated through the same mergeable md5 sketch the
    canonicalization path uses for doc-frequency at 10^12 docs
    (functions/sketch.py). Per-batch partials emit sparse (register,
    rank) rows; one tiny groupby-max merges them (≤1024 rows cross the
    wire); the estimate and the exact distinct count are reported side
    by side. Every register and the HLL arithmetic are SQL-replayable."""
    from ray.data.aggregate import Max

    from .functions import sketch

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id"])
    p = sketch.DEFAULT_P

    def partial(batch: pa.Table) -> pa.Table:
        users = np.unique(batch.column("user_id").to_numpy())
        reg = sketch.hll_create(p)
        for u in users:
            sketch.hll_add(reg, str(int(u)), p)
        r = np.frombuffer(bytes(reg), dtype=np.uint8)
        nz = np.nonzero(r)[0]
        return pa.Table.from_pydict(
            {"idx": pa.array(nz.astype(np.int64), pa.int64()),
             "rank": pa.array(r[nz].astype(np.int64), pa.int64())})

    merged = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("idx").aggregate(Max("rank", alias_name="rank")))
    dense = bytearray(1 << p)
    for row in merged.take_all():
        dense[int(row["idx"])] = int(row["rank"])
    est = sketch.hll_estimate(bytes(dense))

    import pandas as pd

    # exact distinct via the same partial-unique → global unique shape
    uniq = (ds.map_batches(lambda b: pa.Table.from_pydict(
        {"user_id": pa.array(np.unique(b.column("user_id").to_numpy()),
                             pa.int64())}), batch_format="pyarrow")
        .groupby("user_id").count())
    exact = uniq.count()
    return pd.DataFrame({"exact_distinct": [np.int64(exact)],
                         "hll_estimate": [np.int64(est)]})
