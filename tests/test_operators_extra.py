"""Tests for the extended operator set: hierarchical chunker, enricher,
gleaning/mock-LLM, atomic facts, validation, semantic merge, workspace,
importer, incremental update."""

import os

import pandas as pd
import pyarrow as pa
import pytest

import ray

from graphrag_ray.config import PipelineConfig
from graphrag_ray.functions.chunking import chunk_text_hierarchical
from graphrag_ray.stages.atomic_facts import extract_facts, extract_timestamp, facts_batch
from graphrag_ray.stages.enrich import (
    detect_chapter,
    extract_keywords,
    extractive_summary,
    tokenize_keywords,
)
from graphrag_ray.stages.llm_extract import (
    GleaningExtractor,
    MockLLM,
    dedup_relationships,
    merge_entity_rounds,
)
from graphrag_ray.stages.validate import (
    MockTripleValidator,
    TripleValidationStage,
    semantic_merge_candidates,
)


# --- hierarchical chunker (M2)

def test_hierarchical_chunker_prefers_paragraphs():
    text = ("para one is right here with sufficient text to pass the minimum\n\n"
            "para two follows with more content than the minimum chunk size ok")
    chunks = chunk_text_hierarchical(text, 80, 10, min_chunk_size=10)
    assert chunks[0][2] <= text.index("para two") + 1  # cut at/before para 2
    # boundary lands after the separator
    first = text[chunks[0][1]:chunks[0][2]]
    assert first.endswith("\n\n") or first.endswith(" ")


def test_hierarchical_min_size_filter():
    assert chunk_text_hierarchical("tiny", 100, 10, min_chunk_size=50) == []


def test_hierarchical_forward_progress():
    text = "x" * 5000  # no separators at all
    chunks = chunk_text_hierarchical(text, 100, 90, min_chunk_size=1)
    starts = [s for _, s, _ in chunks]
    assert starts == sorted(set(starts))
    assert len(chunks) > 1


# --- enricher (M4)

def test_tokenize_keywords_filters():
    toks = tokenize_keywords("The Alpha-3 system ran 42 times; the beta run")
    assert "alpha-3" in toks and "system" in toks and "run" in toks
    assert "the" not in toks and "42" not in toks


def test_extract_keywords_tfidf_ordering():
    df = {"common": 100, "rare": 1}
    kws = extract_keywords("rare rare common word", df, total_docs=100, top_k=2)
    assert kws[0] == "rare"


def test_extractive_summary_keeps_order_and_picks_first():
    text = ("First sentence introduces everything important here. "
            "Second one rambles on. Third mentions Alice Harmon and 42 facts. "
            "Fourth is filler words only.")
    out = extractive_summary(text, max_sentences=2)
    assert out.startswith("First sentence")
    assert out.index("First") < len(out)


def test_detect_chapter():
    assert detect_chapter("# Chapter 1\nbody") == "# Chapter 1"
    assert detect_chapter("Chapter 12: The End\nmore") == "Chapter 12: The End"
    assert detect_chapter("no heading here") is None


# --- gleaning / mock LLM (A1/A2)

def test_mock_llm_answers_json():
    import json

    llm = MockLLM()
    out = llm.complete("prompt stuff\nText: Alice Harmon works for Acme Corp in Tokyo.\nOutput:\n")
    data = json.loads(out)
    names = {e["name"] for e in data["entities"]}
    assert "Alice Harmon" in names
    assert any(r["description"] == "WORKS_FOR" for r in data["relationships"])


def test_merge_entity_rounds_longer_description_wins():
    a = [{"name": "Alice", "type": "PERSON", "description": "short"}]
    b = [{"name": "alice", "type": "PERSON", "description": "much longer text"}]
    merged = merge_entity_rounds(a, b)
    assert len(merged) == 1
    assert merged[0]["description"] == "much longer text"


def test_dedup_relationships_first_wins():
    rels = [
        {"source": "A", "target": "B", "description": "KNOWS", "strength": 0.8},
        {"source": "A", "target": "B", "description": "KNOWS", "strength": 0.1},
        {"source": "A", "target": "B", "description": "LIKES", "strength": 0.5},
    ]
    out = dedup_relationships(rels)
    assert len(out) == 2
    assert out[0]["strength"] == 0.8


def test_gleaning_extractor_stage(ray_session):
    chunks = pa.Table.from_pydict({
        "chunk_id": ["c1"],
        "doc_id": ["d1"],
        "content": ["Alice Harmon works for Acme Corp in Tokyo."],
    })
    stage = GleaningExtractor()
    out = stage(chunks)
    kinds = set(out.column("row_kind").to_pylist())
    assert kinds == {"entity", "edge"}


def test_gleaning_handles_malformed_json():
    stage = GleaningExtractor(llm=MockLLM(malformed_every=1))
    ents, rels = stage.extract_chunk("Alice Harmon met Bob Tanner.")
    # truncated JSON is repaired or skipped without crashing
    assert isinstance(ents, list) and isinstance(rels, list)


# --- atomic facts (M10)

def test_extract_timestamp():
    ysec = 365 * 24 * 3600
    assert extract_timestamp("in 1876") == (1876 - 1970) * ysec
    assert extract_timestamp("380 BC") == -380 * ysec
    assert extract_timestamp("during summer") is None
    assert extract_timestamp(None) is None


def test_extract_facts_shapes():
    facts = extract_facts("Alice Harmon works for Acme Corp. Bob Tanner lives in Tokyo.")
    triples = {(f["subj"], f["pred"], f["obj"]) for f in facts}
    assert ("Alice Harmon", "works for", "Acme Corp") in triples
    assert ("Bob Tanner", "lives in", "Tokyo") in triples


def test_facts_batch_uppercases_predicate():
    batch = pa.Table.from_pydict({
        "chunk_id": ["c1"], "content": ["Alice Harmon works for Acme Corp in 1876."],
    })
    out = facts_batch(batch)
    assert "WORKS_FOR" in out.column("pred").to_pylist()
    ts = out.column("timestamp").to_pylist()
    assert ts[0] == (1876 - 1970) * 365 * 24 * 3600


# --- validation (A4) + semantic merge (A8)

def test_triple_validation_keeps_supported():
    stage = TripleValidationStage()
    batch = pa.Table.from_pydict({
        "subj": ["Alice", "Ghost"],
        "pred": ["KNOWS", "KNOWS"],
        "obj": ["Bob", "Bob"],
        "context_text": ["Alice met Bob.", "Bob was alone."],
    })
    out = stage(batch)
    assert out.column("subj").to_pylist() == ["Alice"]


def test_validator_semantics():
    v = MockTripleValidator()
    assert v.validate("Alice", "KNOWS", "Bob", "Alice met Bob")[0]
    assert not v.validate("Alice", "KNOWS", "Bob", "nothing here")[0]


def test_semantic_merge_candidates():
    ents = [
        {"canonical_id": "P_a", "name": "Alice Harmon", "entity_type": "PERSON"},
        {"canonical_id": "P_b", "name": "Alice Harmonn", "entity_type": "PERSON"},
        {"canonical_id": "P_c", "name": "Zed", "entity_type": "PERSON"},
        {"canonical_id": "L_d", "name": "Alice Harmon", "entity_type": "LOCATION"},
    ]
    merges = dict(semantic_merge_candidates(ents))
    assert merges == {"P_a": "P_b"} or merges == {"P_b": "P_a"}


# --- workspace (S3/S4/S7)

def test_workspace_roundtrip(ray_session, tmp_path):
    from graphrag_ray.sources.workspace import (load_workspace, save_workspace,
                                                workspace_exists)

    path = str(tmp_path / "ws")
    ents = ray.data.from_pandas(pd.DataFrame({"canonical_id": ["A"], "name": ["a"]}))
    trip = ray.data.from_pandas(pd.DataFrame({"subj": ["a"], "pred": ["R"], "obj": ["b"]}))
    assert not workspace_exists(path)
    meta = save_workspace(path, entities=ents, triples=trip)
    assert meta["tables"] == {"entities": 1, "triples": 1}
    assert workspace_exists(path)
    back = load_workspace(path)
    assert back["entities"].count() == 1
    assert back["triples"].take_all()[0]["pred"] == "R"


# --- importer (S2)

def test_import_entities_csv(ray_session, tmp_path):
    from graphrag_ray.sources.importer import import_entities

    p = tmp_path / "ents.csv"
    p.write_text("name,type,confidence\nAlice Harmon,PERSON,0.9\n,PERSON,0.5\nBob,PERSON,bad\n")
    good, errors = import_entities(str(p), max_errors=10)
    rows = good.take_all()
    assert {r["entity_id"] for r in rows} == {"PERSON_aliceharmon"}
    errs = errors.take_all()
    assert len(errs) == 2


def test_import_error_budget(ray_session, tmp_path):
    from graphrag_ray.sources.importer import import_entities

    p = tmp_path / "bad.csv"
    p.write_text("name,type\n" + "\n".join("," for _ in range(5)) + "\n")
    with pytest.raises(ValueError):
        import_entities(str(p), max_errors=1)


# --- incremental (§2.10)

def test_incremental_matches_full_rebuild(ray_session):
    from graphrag_ray.pipelines.incremental import (extraction_for_docs,
                                                    incremental_update)
    from graphrag_ray.pipelines.kg import build_kg
    from graphrag_ray.synth import synth_documents_table

    cfg = PipelineConfig(chunk_size=256, chunk_overlap=50)
    all_docs = synth_documents_table(30)
    old_docs = ray.data.from_arrow(all_docs.slice(0, 20))
    new_docs = ray.data.from_arrow(all_docs.slice(20, 10))

    prev_extraction = extraction_for_docs(old_docs, cfg).materialize()
    inc = incremental_update(prev_extraction, new_docs, cfg)
    full = build_kg(ray.data.from_arrow(all_docs), cfg)

    def tset(res):
        return {(r["subj"], r["pred"], r["obj"], r["n_occurrences"])
                for r in res.triples.take_all()}

    assert tset(inc) == tset(full)


# --- RAPTOR summary tree (A10)

def test_summary_tree(ray_session):
    import ray as _ray

    import pyarrow as pa

    from graphrag_ray.stages.raptor import build_summary_tree

    chunks = _ray.data.from_arrow(pa.Table.from_pydict({
        "doc_id": [f"d{i//3}" for i in range(12)],
        "chunk_idx": [i % 3 for i in range(12)],
        "content": [f"Sentence number {i} talks about Alice Harmon. More text follows here."
                    for i in range(12)],
    }))
    tree = build_summary_tree(chunks, merge_size=5)
    lvl0 = tree[tree["level"] == 0]
    assert len(lvl0) == 12
    top = tree[tree["level"] == tree["level"].max()]
    assert len(top) == 1  # single root
    # 12 -> 3 -> 1 with merge_size 5
    assert set(tree["level"]) == {0, 1, 2}
    assert all(tree["summary"].str.len() > 0)


# --- YAKE keywords + entity temporal fields (round 2)


def test_yake_keywords_basic():
    from graphrag_ray.stages.enrich import yake_keywords

    text = ("Machine learning systems analyze data. Machine learning "
            "models require data. The weather is nice today.")
    kws = yake_keywords(text, top_k=4)
    assert kws
    assert all(k not in ("the", "is") for k in kws)
    # repeated multi-sentence content terms rank in the top set
    assert "machine" in kws or "learning" in kws or "data" in kws
    # deterministic
    assert kws == yake_keywords(text, top_k=4)


def test_yake_empty_and_stopword_only():
    from graphrag_ray.stages.enrich import yake_keywords

    assert yake_keywords("") == []
    assert yake_keywords("the and of to in") == []


def test_enricher_yake_algorithm(ray_session):
    import ray as _ray

    from graphrag_ray.stages.enrich import enrich_chunks

    chunks = _ray.data.from_items([
        {"chunk_id": "c0",
         "content": "Alice Harmon studies graph algorithms. Graph "
                    "algorithms power search engines."},
        {"chunk_id": "c1", "content": "Data pipelines stream records."},
    ])
    out = enrich_chunks(chunks, total_docs=2, algorithm="yake").take_all()
    assert len(out) == 2
    assert all(isinstance(r["keywords"], list) for r in out)
    assert any(r["keywords"] for r in out)


def test_entity_temporal_rollup(ray_session):
    import ray as _ray

    from graphrag_ray.stages.atomic_facts import entity_temporal

    facts = _ray.data.from_items([
        {"subj": "Alice Harmon", "timestamp": 100, "pred": "X", "obj": "Y"},
        {"subj": "Alice Harmon", "timestamp": 900, "pred": "X", "obj": "Z"},
        {"subj": "Bob Tanner", "timestamp": None, "pred": "X", "obj": "Y"},
        {"subj": "Carol Mendez", "timestamp": -500, "pred": "X", "obj": "Y"},
    ])
    rows = {r["entity_name"]: r for r in entity_temporal(facts).take_all()}
    assert rows["Alice Harmon"]["first_mentioned"] == 100
    assert rows["Alice Harmon"]["last_mentioned"] == 900
    assert rows["Alice Harmon"]["valid_from"] == 100
    assert rows["Carol Mendez"]["first_mentioned"] == -500  # BC-negative
    assert "Bob Tanner" not in rows  # no timestamped facts


def test_lance_store_roundtrip(ray_session, tmp_path):
    """S5 write/read seam: lance when importable, parquet fallback here."""
    import ray as _ray

    from graphrag_ray.sources.lance_store import (read_vector_store,
                                                  store_meta,
                                                  write_vector_store)

    ds = _ray.data.from_items(
        [{"id": i, "vector": [float(i), 0.5]} for i in range(20)])
    path = str(tmp_path / "vs")
    fmt = write_vector_store(ds, path, meta={"dim": 2})
    assert fmt in ("lance", "parquet")
    meta = store_meta(path)
    assert meta["meta"]["dim"] == 2
    back = read_vector_store(path)
    assert back.count() == 20
    assert sorted(r["id"] for r in back.take_all()) == list(range(20))


# --- round 2: media pipeline extensions (load → resize / frame-sample)


def _media_rows(ray_session, n_docs=40):
    import ray as _ray

    from graphrag_ray.stages.media import explode_media_spans
    from graphrag_ray.synth import synth_documents_table

    docs = _ray.data.from_arrow(synth_documents_table(n_docs))
    return docs.map_batches(explode_media_spans, batch_format="pyarrow")


def test_media_bytes_loader(ray_session):
    from graphrag_ray.stages.media import MediaBytesLoader

    loaded = _media_rows(ray_session).map_batches(
        MediaBytesLoader, batch_format="pyarrow", batch_size=8,
        concurrency=(1, 2),
    )
    rows = loaded.take_all()
    assert rows
    for r in rows:
        assert len(r["payload"]) == 256
        assert 64 <= r["width"] <= 255 and 64 <= r["height"] <= 255
        assert 1000 <= r["duration_ms"] <= 30000
    # deterministic: same ref → same payload
    a = [r for r in rows if r["media_ref"] == rows[0]["media_ref"]][0]
    assert a["payload"] == rows[0]["payload"]


def test_image_resize_stage(ray_session):
    from graphrag_ray.stages.media import ImageResizeStage, MediaBytesLoader

    out = (_media_rows(ray_session)
           .map_batches(MediaBytesLoader, batch_format="pyarrow",
                        batch_size=8, concurrency=(1, 2))
           .map_batches(ImageResizeStage,
                        fn_constructor_kwargs={"target": 16},
                        batch_format="pyarrow", batch_size=8,
                        concurrency=(1, 2))
           .take_all())
    assert out
    for r in out:
        assert len(r["pixels"]) == 16 * 16
        assert all(0.0 <= p <= 1.0 for p in r["pixels"])


def test_frame_sampler(ray_session):
    from graphrag_ray.stages.media import MediaBytesLoader, make_frame_sampler

    frames = (_media_rows(ray_session)
              .map_batches(MediaBytesLoader, batch_format="pyarrow",
                           concurrency=(1, 2))
              .map_batches(make_frame_sampler(fps_sample=2.0),
                           batch_format="pyarrow")
              .take_all())
    assert frames
    by_ref = {}
    for f in frames:
        by_ref.setdefault(f["media_ref"], []).append(f)
    for ref, fs in by_ref.items():
        idxs = sorted(x["frame_idx"] for x in fs)
        assert idxs == list(range(len(fs)))          # contiguous
        assert all(x["ts_ms"] % 500 == 0 for x in fs)  # 2 fps → 500 ms grid


def test_strict_mode_raises(ray_session):
    import pytest as _pytest

    from graphrag_ray.stages.media import STRICT, MediaBytesLoader

    loader = MediaBytesLoader(mode=STRICT)
    import pyarrow as _pa

    batch = _pa.table({"doc_id": ["d"], "media_ref": ["lance://x"],
                       "kind": ["image"], "span_index": [0]})
    with _pytest.raises(NotImplementedError):
        loader(batch)


def test_hopping_window_non_divisible(ray_session):
    """ADVICE r02: window=6h hop=4h — an event must land in every window
    that truly covers it (ceil(window/hop) candidates, filtered), not the
    floor(window/hop) undercount."""
    import pyarrow as _pa
    import ray as _ray

    from graphrag_ray.stages.events import hopping_window_agg

    hour = 3_600_000_000
    ts_list = [0, 1 * hour, 4 * hour + 1, 7 * hour, 11 * hour + 5]
    ds = _ray.data.from_arrow(_pa.table({
        "user_id": _pa.array([7] * len(ts_list), _pa.int64()),
        "ts": _pa.array(ts_list, _pa.int64()),
        "value": _pa.array([1.0] * len(ts_list), _pa.float64()),
    }))
    rows = hopping_window_agg(ds, window_hours=6, hop_hours=4).take_all()
    got = {(r["window_id"]): (r["n_events"], r["sum_value"]) for r in rows}
    # brute force: window w spans [w*4h, w*4h + 6h)
    window_us, hop_us = 6 * hour, 4 * hour
    expect = {}
    for ts in ts_list:
        w = ts // hop_us
        while w * hop_us + window_us > ts:
            if w * hop_us <= ts:
                n, s = expect.get(w, (0, 0.0))
                expect[w] = (n + 1, s + 1.0)
            w -= 1
    assert got == expect


def test_simhash_pairs_hamming_budget_validated():
    """ADVICE r02: max_hamming beyond the band recall guarantee must fail
    loudly at construction, not silently lose pairs."""
    import pytest as _pytest

    from graphrag_ray.stages.dedup import make_simhash_pairs_fn

    make_simhash_pairs_fn(max_hamming=3, n_bands=4)  # boundary ok
    with _pytest.raises(ValueError):
        make_simhash_pairs_fn(max_hamming=4, n_bands=4)


def test_frame_sampler_non_divisor_fps():
    """ADVICE r02: fps=3 must not drift (333,667,1000... not 333,666,999)
    and huge fps must not die on a zero step."""
    import pyarrow as _pa

    from graphrag_ray.stages.media import make_frame_sampler

    batch = _pa.table({
        "doc_id": _pa.array(["d"], _pa.string()),
        "media_ref": _pa.array(["lance://v"], _pa.string()),
        "duration_ms": _pa.array([2001], _pa.int64()),
    })
    out = make_frame_sampler(fps_sample=3.0)(batch)
    assert out.column("ts_ms").to_pylist() == [0, 333, 667, 1000, 1333, 1667, 2000]
    big = make_frame_sampler(fps_sample=2000.0)(_pa.table({
        "doc_id": _pa.array(["d"], _pa.string()),
        "media_ref": _pa.array(["lance://v"], _pa.string()),
        "duration_ms": _pa.array([3], _pa.int64()),
    }))
    assert big.column("ts_ms").to_pylist() == [0, 1, 2]


def test_image_resize_smaller_than_target():
    """ADVICE r02: an image below the target size must upsample (no NaNs /
    empty-axis mean)."""
    import numpy as np
    import pyarrow as _pa

    from graphrag_ray.stages.media import ImageResizeStage

    stage = ImageResizeStage(target=16)
    batch = _pa.table({
        "doc_id": _pa.array(["d"], _pa.string()),
        "media_ref": _pa.array(["lance://i"], _pa.string()),
        "payload": _pa.array([b"\x80" * 12], _pa.binary()),
        "width": _pa.array([3], _pa.int64()),
        "height": _pa.array([4], _pa.int64()),
    })
    out = stage(batch)
    px = np.asarray(out.column("pixels").to_pylist()[0])
    assert px.shape == (256,)
    assert not np.isnan(px).any()
    assert ((0.0 <= px) & (px <= 1.0)).all()
    # upsample path checksum: 4x3 of 0x80 repeats to 16x18, crops to
    # 16x16 -> 256 * 128
    assert out.column("crop_byte_sum").to_pylist() == [256 * 128]
    assert out.column("width").to_pylist() == [3]
    assert out.column("height").to_pylist() == [4]


def test_sessionize_time_bucketed_equals_one_group(ray_session):
    """The hot-user scale path (time-bucketed pre-split + boundary merge
    over session rows) must reproduce the one-group-per-user result
    EXACTLY — including sessions spanning bucket boundaries."""
    import numpy as np
    import ray.data as rd

    from graphrag_ray.stages.events import sessionize

    rng = np.random.RandomState(5)
    rows = []
    t = 0
    # one hot user with a long alternating stream (sessions crossing any
    # 6h boundary) + a handful of normal users
    for i in range(400):
        t += int(rng.choice([60, 3600, 200 * 60, 7200 * 3]) * 1e6)
        rows.append({"user_id": 7, "ts": t, "value": float(i % 10)})
    for u in (1, 2, 3):
        base = int(u * 3.6e9)
        for i in range(25):
            rows.append({"user_id": u,
                         "ts": base + int(i * (100 + u) * 60e6),
                         "value": 1.0})
    ds = rd.from_items(rows)
    key = ["user_id", "session_idx"]
    a = (sessionize(ds).to_pandas()
         .sort_values(key).reset_index(drop=True))
    b = (sessionize(ds, time_bucket_hours=6).to_pandas()
         .sort_values(key).reset_index(drop=True))
    assert len(a) == len(b)
    for col in a.columns:
        assert (a[col].to_numpy() == b[col].to_numpy()).all(), col
    # sanity: the time-bucket split actually produced multi-bucket users
    assert a[a["user_id"] == 7]["n_events"].sum() == 400


def test_dual_merge_strategies_reference_semantics():
    """dual_retrieval.rs:189-323 merge replay on hand-built rank lists:
    interleave alternates starting high and dedups without consuming a
    slot; concat orders first-then-second; weighted sorts by weighted
    score with the stable high-before-low tie-break."""
    import pandas as pd

    from graphrag_ray.stages.retrieval import _merge_dual

    high = pd.DataFrame({"doc_id": ["a", "b", "c"],
                         "score": [3.0, 2.0, 1.0]})
    low = pd.DataFrame({"doc_id": ["b", "d"], "score": [5.0, 4.0]})

    m = _merge_dual(high, low, 10, "interleave", 0.6, 0.4)
    # slots: a(h0) b(l0) b(h1 dup) d(l1) c(h2)
    assert list(m.doc_id) == ["a", "b", "d", "c"]
    assert list(m.level) == ["high", "low", "low", "high"]
    assert list(m.merged_rank) == [1, 2, 3, 4]

    m = _merge_dual(high, low, 10, "high_first", 0.6, 0.4)
    assert list(m.doc_id) == ["a", "b", "c", "d"]
    m = _merge_dual(high, low, 10, "low_first", 0.6, 0.4)
    assert list(m.doc_id) == ["b", "d", "a", "c"]

    # weighted: a=1.8 b_h=1.2 c=0.6 | b_l=2.0 d=1.6 → b(2.0) a(1.8) d(1.6)
    # b_h(1.2, dup) c(0.6)
    m = _merge_dual(high, low, 10, "weighted", 0.6, 0.4)
    assert list(m.doc_id) == ["b", "a", "d", "c"]
    assert list(m.level) == ["low", "high", "low", "high"]

    # top_k truncation
    m = _merge_dual(high, low, 2, "interleave", 0.6, 0.4)
    assert list(m.doc_id) == ["a", "b"]


def test_extract_dual_keywords_fallback_and_llm():
    """keyword_extraction.rs:174-197: LLM JSON path (with surrounding
    prose) and the heuristic fallback (>3-char words, first 10, lower)."""
    from graphrag_ray.stages.retrieval import extract_dual_keywords

    class JsonLLM:
        def complete(self, prompt):
            return ('Sure! {"high_level": ["Themes"], '
                    '"low_level": ["Tom", "Huck"]}')

    got = extract_dual_keywords("q", llm=JsonLLM())
    assert got == {"high_level": ["Themes"], "low_level": ["Tom", "Huck"]}

    class BrokenLLM:
        def complete(self, prompt):
            raise RuntimeError("down")

    got = extract_dual_keywords(
        "How did Tom and Huck find the treasure fast", llm=BrokenLLM())
    assert got["high_level"] == []
    assert got["low_level"] == ["huck", "find", "treasure", "fast"]
    # the 10-word fallback cap
    long_q = " ".join(f"word{i:02d}" for i in range(15))
    assert len(extract_dual_keywords(long_q)["low_level"]) == 10


def test_contextual_enricher_reference_semantics():
    """contextual_enricher.rs: prompt structure (KV-cache static document
    prefix), '{context}\\n\\n{chunk}' output, and the num_ctx formula
    (100 + doc/4 + max-chunk/4 + output budget, +5%, round-1024, clamp)."""
    from graphrag_ray.stages.enrich import (build_context_prompt,
                                            calculate_num_ctx,
                                            estimate_tokens)

    p = build_context_prompt("full document text", "chunk excerpt")
    assert p.startswith("<document>\nfull document text\n</document>")
    assert "<chunk>\nchunk excerpt\n</chunk>" in p
    assert estimate_tokens("abcdefgh") == 2
    # rs test_calculate_num_ctx_minimum: tiny inputs clamp to 4096
    assert calculate_num_ctx("short", ["c"]) == 4096
    # large doc: 40000 chars -> 10000 tokens; base = 100+10000+25+150
    # = 10275; *1.05 = 10788; round up -> 11264
    assert calculate_num_ctx("x" * 40000, ["y" * 100]) == 11264
    # clamp at 128k
    assert calculate_num_ctx("x" * 4_000_000, ["y"]) == 131072


def test_contextual_enricher_stage_output():
    import pyarrow as pa

    from graphrag_ray.stages.enrich import ContextualEnricher

    spans = [[{"kind": "text", "text": "First sentence here. ",
               "media_ref": None, "offset": 0},
              {"kind": "text", "text": "Second one follows. ",
               "media_ref": None, "offset": 1}]]
    batch = pa.Table.from_pydict({"doc_id": ["d0"], "spans": spans})
    out = ContextualEnricher(chunk_size=2048, overlap=0)(batch)
    assert out.num_rows == 1
    row = out.to_pylist()[0]
    assert row["chunk_id"] == "d0_0"
    assert row["enriched_content"].startswith("First sentence here.\n\n")
    assert row["enriched_content"].endswith("Second one follows. ")
    assert row["num_ctx"] == 4096


def test_analyze_query_reference_rules():
    """retrieval/mod.rs:497-581 classification cascade + intent rule
    precedence ('precise' wins over 'cause' because the detailed rule is
    checked first) + the complexity formula."""
    from graphrag_ray.stages.retrieval import (analyze_query,
                                               calculate_strategy_weights)

    names = ["Alice Harmon", "Acme Corp"]
    a = analyze_query("overview about Alice please", names)
    assert a["query_type"] == "entity_focused"
    assert a["intent"] == "overview"
    assert a["key_entities"] == ["Alice Harmon"]
    a = analyze_query("compare Alice versus Acme", names)
    assert a["query_type"] == "relationship" and a["intent"] == "comparative"
    a = analyze_query("the meaning of truth", [])
    assert a["query_type"] == "conceptual"
    a = analyze_query("explain this thing", [])
    assert a["query_type"] == "exploratory"
    a = analyze_query("plain data numbers", [])
    assert a["query_type"] == "factual" and a["intent"] == "detailed"
    a = analyze_query("precise cause of failure", [])
    assert a["intent"] == "detailed"  # rule order: detailed before causal
    # complexity = 0.1*4 + 0.3*0 + 0.2*3 (precise/cause/failure) = 1.0
    assert a["complexity_score"] == 1.0
    b = analyze_query("so do we", [])
    assert b["complexity_score"] == pytest.approx(0.3)
    # strategy weight table (mod.rs:807-819)
    assert calculate_strategy_weights("entity_focused", "detailed") == (0.5, 0.4, 0.1)
    assert calculate_strategy_weights("conceptual", "overview") == (0.2, 0.2, 0.6)
    assert calculate_strategy_weights("exploratory", "detailed") == (0.4, 0.4, 0.2)
    assert calculate_strategy_weights("factual", "overview") == (0.6, 0.3, 0.1)


def test_adaptive_retrieve_composes_strategies(ray_session):
    """Weighted fusion: a relationship query routes weight 0.6 to the PPR
    seeds' neighborhood and dedups across strategies."""
    from graphrag_ray.stages.retrieval import adaptive_retrieve

    docs = ray.data.from_pandas(pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["alice works with acme systems daily",
                 "bob tanner plays guitar alone",
                 "acme factory output numbers rising"],
    }))
    ents = ray.data.from_pandas(pd.DataFrame({
        "canonical_id": ["P_alice", "O_acme", "P_bob"],
        "canonical_name": ["Alice Harmon", "Acme Corp", "Bob Tanner"],
    }))
    edges = ray.data.from_pandas(pd.DataFrame({
        "src": ["P_alice", "O_acme"],
        "dst": ["O_acme", "P_bob"],
    }))
    analysis, out = adaptive_retrieve(
        docs, "compare Alice versus Acme", ["Acme Corp", "Alice Harmon",
                                            "Bob Tanner"],
        entities_ds=ents, edges_ds=edges, top_k=8)
    assert analysis["query_type"] == "relationship"
    sources = set(out.source)
    assert "graph" in sources and "vector" in sources
    # graph results are the PPR-ranked entity ids
    assert {"P_alice", "O_acme"} <= set(out[out.source == "graph"].id)
    assert out.score.is_monotonic_decreasing
    assert out.id.is_unique


def test_symbolic_anchoring_reference_semantics():
    """symbolic_anchoring.rs: concept extraction (marker-following words
    incl. the 'the'-after-'is' quirk, abstract words, capitalized
    fallback), grounding by name/relationship containment, count + PR
    relevance, and boost_with_anchors rescoring."""
    from graphrag_ray.functions.anchoring import (ANCHOR_QUERY_CONCEPTS,
                                                  boost_with_anchors,
                                                  calculate_relevance,
                                                  extract_anchors,
                                                  extract_concepts)

    # the hand-derived SQL constants must equal the rule output
    for q, want in ANCHOR_QUERY_CONCEPTS.items():
        assert tuple(extract_concepts(q)) == want, q

    ents = [("E1", "Temple of Love", "LOCATION"),
            ("E2", "Socrates", "PERSON"),
            ("E3", "Lovelace Inc", "ORGANIZATION")]
    rels = {"E2": ["TEACHES_LOVE"], "E3": ["OWNS"]}
    anchors = extract_anchors("what is the nature of love", ents, rels,
                              min_relevance=0.1)
    by_concept = {a["concept"]: a for a in anchors}
    # 'love' grounds via name containment (E1, E3) and relationship (E2)
    assert by_concept["love"]["grounded_entities"] == ["E1", "E2", "E3"]
    assert by_concept["love"]["relevance_score"] == pytest.approx(0.3)
    # PR-boosted relevance: 0.4*count + 0.6*avgPR over scored entities
    assert calculate_relevance(["E1", "E2"], {"E1": 0.5}) == pytest.approx(
        0.2 * 0.4 + 0.5 * 0.6)
    # boost: score multiplied by 1 + mean anchor relevance of matches
    results = [{"id": "r1", "score": 1.0, "entities": ["E2"]},
               {"id": "r2", "score": 1.1, "entities": ["nope"]}]
    out = boost_with_anchors(results, [by_concept["love"]])
    assert out[0]["id"] == "r1" and out[0]["score"] == pytest.approx(1.3)


def test_cache_key_strategies():
    """cache_key.rs: strategy-specific normalization — semantic strips
    punctuation/normalizes quotes, content additionally drops stop words
    and expands contractions, with_parameters mixes the 3dp param
    serialization into the key."""
    from graphrag_ray.state.cache import CacheKeyGenerator

    g = CacheKeyGenerator("simple")
    assert g.generate_key("a  b\n c") == g.generate_key("a b c")  # ws
    sem = CacheKeyGenerator("semantic")
    assert sem.generate_key("What is love?") == sem.generate_key(
        "What is love")
    con = CacheKeyGenerator("content_based")
    assert con.generate_key("the meaning of love") == con.generate_key(
        "meaning love")
    assert con.generate_key("x", model_name="m1") != con.generate_key(
        "x", model_name="m2")
    wp = CacheKeyGenerator("with_parameters")
    k1 = wp.generate_key("p", params={"temperature": 0.1})
    k2 = wp.generate_key("p", params={"temperature": 0.2})
    assert k1 != k2
    assert CacheKeyGenerator.serialize_params(
        {"max_tokens": 10, "temperature": 0.5, "top_p": 0.9,
         "stop_sequences": ["a", "b"]}
    ) == "max_tokens:10;temp:0.500;top_p:0.900;stop:a,b"


def test_cache_stats_efficiency_and_warming():
    """stats.rs efficiency formula (0.4/0.3/0.3, memory normalized at
    1 KiB/entry) + warming outcomes."""
    from graphrag_ray.state.cache import (CachedLLM, CacheStats,
                                          CacheWarmer, ResponseCache)

    st = CacheStats()
    st.record_miss()
    st.record_insertion(1024)
    st.record_hit(time_saved_s=0.5)
    assert st.hit_rate() == 0.5
    # memory score at exactly 1KiB/entry = 1/(1+1) = 0.5
    assert st.efficiency_score() == pytest.approx(
        0.5 * 0.4 + 0.5 * 0.3 + 1.0 * 0.3)
    st2 = CacheStats()
    assert st2.efficiency_score() == pytest.approx(0.3 + 0.3)  # empty cache

    calls = []

    class Echo:
        def complete(self, p):
            calls.append(p)
            return p.upper()

    llm = CachedLLM(Echo(), cache=ResponseCache(capacity=16))
    report = CacheWarmer("predefined").warm(llm)
    assert report["warmed"] == 5 and report["failed"] == 0
    n = len(calls)
    llm.complete("Summarize the main entities in this document.")
    assert len(calls) == n  # warm hit — no new model call
    custom = CacheWarmer("custom", custom_queries=("q1", "q2"),
                         max_queries=1).warm(llm)
    assert custom["warmed"] == 1
    with pytest.raises(ValueError):
        CacheWarmer("made_up")


def test_enriched_retrieval_reference_semantics():
    """retrieval/enriched.rs: keyword-fraction/structure/summary boosts,
    the 0.05 significance gate, completeness bonus at >0.7, and
    search_by_keywords fractional scoring."""
    from graphrag_ray.stages.enriched_retrieval import (
        completeness_score, extract_structure_references, matches_query,
        score_chunk, structure_boost)

    assert extract_structure_references(
        "what happens in chapter 3 and section 1.2") == [
            "chapter 3", "section 1.2"]
    qw = {"louis", "london", "about"}
    meta = {"keywords": ["Louis", "paris"], "summary": "louis in london",
            "entities": []}
    # keyword boost 1/3*0.3 = 0.1; summary hits 2 >= 1 -> +0.15
    assert score_chunk(qw, [], meta) == pytest.approx(0.5 + 0.1 + 0.15)
    # gate: insignificant boost emits nothing
    assert score_chunk({"zzzz"}, [], {"keywords": ["a"], "summary": None,
                                      "entities": ["e"]}) is None
    # structure boost: chapter 0.5 + section 0.3 weights then *0.2
    sb = structure_boost({"chapter": "Chapter 3", "section": "section 1.2"},
                         ["chapter 3", "section 1.2"])
    assert sb == pytest.approx(0.8)
    # completeness: 7 of 9 fields -> bonus applies
    full = {"chapter": "c", "section": "s", "subsection": "ss",
            "topic": "t", "summary": "x", "structural_level": 1,
            "position_in_document": 0.1, "keywords": ["k"],
            "heading_path": []}
    assert completeness_score(full) == pytest.approx(8 / 9)
    # threshold is >= half: 2 of 4 matches, 1 of 4 does not
    assert matches_query("alpha beta", {"alpha", "beta", "gamma",
                                        "delta"}) is True
    assert matches_query("alpha only", {"alpha", "beta", "gamma",
                                        "delta"}) is False


def test_search_by_keywords(ray_session):
    from graphrag_ray.stages.enriched_retrieval import search_by_keywords

    chunks = ray.data.from_pandas(pd.DataFrame({
        "chunk_id": ["c1", "c2", "c3"],
        "keywords": [["Alpha", "beta"], ["beta"], ["gamma"]],
    }))
    out = search_by_keywords(chunks, ["alpha", "BETA"], top_k=2)
    assert list(out.chunk_id) == ["c1", "c2"]
    assert list(out.score) == [pytest.approx(1.0), pytest.approx(0.5)]
