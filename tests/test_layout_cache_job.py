"""Tests for layout parsers (S8), response cache (A7), and the job
entrypoint (ray job submit surface)."""

import json
import subprocess
import sys

import pyarrow as pa
import pyarrow.parquet as pq

from graphrag_ray.stages.layout import detect_format, parse_sections, sections_batch
from graphrag_ray.state.cache import CachedLLM, ResponseCache, cache_key


def test_detect_format():
    assert detect_format("# Title\nbody") == "markdown"
    assert detect_format("<html><h1>T</h1></html>") == "html"
    assert detect_format("plain old text") == "plaintext"


def test_parse_markdown_sections():
    secs = parse_sections("# One\ntext\n## Two\nmore", "markdown")
    assert [(s["level"], s["title"]) for s in secs] == [(1, "One"), (2, "Two")]


def test_parse_html_sections():
    secs = parse_sections("<h1>Main <b>T</b></h1><p>x</p><h2>Sub</h2>", "html")
    assert [(s["level"], s["title"]) for s in secs] == [(1, "Main T"), (2, "Sub")]


def test_parse_plaintext_chapters():
    secs = parse_sections("Chapter 1: Start\nbody text\nCHAPTER TWO\nmore", "plaintext")
    titles = [s["title"] for s in secs]
    assert "Chapter 1: Start" in titles
    assert "CHAPTER TWO" in titles


def test_sections_batch_flat_and_spans():
    flat = pa.Table.from_pydict({"doc_id": [1], "text": ["# A\nbody"]})
    out = sections_batch(flat)
    assert out.num_rows == 1 and out.column("title")[0].as_py() == "A"

    spans_tbl = pa.Table.from_pydict({
        "doc_id": ["d1"],
        "spans": [[{"kind": "text", "text": "# B\nbody", "media_ref": "", "offset": 0}]],
    })
    out2 = sections_batch(spans_tbl)
    assert out2.column("title")[0].as_py() == "B"


# --- response cache (A7)

class CountingLLM:
    def __init__(self):
        self.calls = 0

    def complete(self, prompt):
        self.calls += 1
        return f"resp:{prompt}"


def test_cache_hits_memory():
    inner = CountingLLM()
    llm = CachedLLM(inner)
    assert llm.complete("p1") == "resp:p1"
    assert llm.complete("p1") == "resp:p1"
    assert inner.calls == 1
    assert llm.cache.hits == 1 and llm.cache.misses == 1


def test_cache_disk_tier(tmp_path):
    inner = CountingLLM()
    cache = ResponseCache(capacity=2, disk_dir=str(tmp_path))
    llm = CachedLLM(inner, cache=cache)
    llm.complete("p1")
    # a fresh memory tier over the same disk dir replays without the model
    cache2 = ResponseCache(capacity=2, disk_dir=str(tmp_path))
    inner2 = CountingLLM()
    llm2 = CachedLLM(inner2, cache=cache2)
    assert llm2.complete("p1") == "resp:p1"
    assert inner2.calls == 0


def test_cache_lru_eviction():
    cache = ResponseCache(capacity=2)
    cache.put("m", "a", "1")
    cache.put("m", "b", "2")
    cache.put("m", "c", "3")
    assert cache.get("m", "a") is None
    assert cache.get("m", "c") == "3"


def test_cache_key_stable():
    assert cache_key("m", "p") == cache_key("m", "p")
    assert cache_key("m", "p") != cache_key("m2", "p")


# --- job entrypoint

def test_job_entrypoint_end_to_end(tmp_path):
    from graphrag_ray.synth import synth_documents_table

    inp = tmp_path / "docs.parquet"
    pq.write_table(synth_documents_table(15), str(inp))
    out = subprocess.run(
        [sys.executable, "-m", "graphrag_ray.job",
         "--input", str(inp), "--output", str(tmp_path / "out"),
         "--run-id", "t", "--chunk-size", "256", "--chunk-overlap", "50",
         "--no-communities"],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    )
    report = json.loads(out.stdout.strip().splitlines()[-1])
    assert report["triple_count"] > 0
    assert set(report["tables_written"]) == {"edges", "entities", "triples"}
    assert (tmp_path / "out" / "t" / "workspace.json").exists()


# --- file-driven config (config/loader.rs + json5_loader.rs parity)

def test_load_config_toml_sections_and_overrides(tmp_path):
    from graphrag_ray.config import load_config

    p = tmp_path / "pipeline.toml"
    p.write_text(
        "[chunking]\nchunk_size = 512\nchunk_overlap = 100\n"
        "[extraction]\nmin_confidence = 0.6\n"
        "entity_types = ['PERSON', 'LOCATION']\n"
        "[canonicalization]\nfuzzy_threshold = 0.9\n"
    )
    cfg = load_config(str(p), run_id="r9")
    assert (cfg.chunk_size, cfg.chunk_overlap) == (512, 100)
    assert cfg.min_confidence == 0.6
    assert cfg.entity_types == ("PERSON", "LOCATION")
    assert cfg.fuzzy_threshold == 0.9
    assert cfg.run_id == "r9"          # override wins
    assert cfg.chunking_strategy == "legacy"  # untouched default


def test_load_config_json5_comments_and_trailing_commas(tmp_path):
    from graphrag_ray.config import load_config

    p = tmp_path / "pipeline.json5"
    p.write_text(
        '{\n'
        '  // sliding window\n'
        '  "chunk_size": 256, /* chars */\n'
        '  "entity_types": ["PERSON",],\n'
        '}\n'
    )
    cfg = load_config(str(p))
    assert cfg.chunk_size == 256
    assert cfg.entity_types == ("PERSON",)


def test_load_config_rejects_unknown_and_duplicate_keys(tmp_path):
    import pytest

    from graphrag_ray.config import load_config

    bad = tmp_path / "bad.toml"
    bad.write_text("chunk_sz = 5\n")
    with pytest.raises(ValueError, match="unknown config keys"):
        load_config(str(bad))

    dup = tmp_path / "dup.toml"
    dup.write_text("chunk_size = 5\n[chunking]\nchunk_size = 6\n")
    with pytest.raises(ValueError, match="defined twice"):
        load_config(str(dup))

    with pytest.raises(FileNotFoundError):
        load_config(str(tmp_path / "missing.toml"))


def test_job_entrypoint_with_config_file(tmp_path):
    from graphrag_ray.synth import synth_documents_table

    inp = tmp_path / "docs.parquet"
    pq.write_table(synth_documents_table(12), str(inp))
    cfgf = tmp_path / "pipeline.toml"
    cfgf.write_text("[chunking]\nchunk_size = 256\nchunk_overlap = 50\n")
    out = subprocess.run(
        [sys.executable, "-m", "graphrag_ray.job",
         "--input", str(inp), "--output", str(tmp_path / "out"),
         "--run-id", "tc", "--config", str(cfgf), "--no-communities"],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    )
    report = json.loads(out.stdout.strip().splitlines()[-1])
    assert report["triple_count"] > 0
    assert (tmp_path / "out" / "tc" / "workspace.json").exists()


def test_document_structure_hierarchy():
    """document_structure.rs + markdown.rs:18-72: stack-rule parents,
    depths, root→leaf paths, content spans (hand-derived fixture; the
    reference's own test asserts H2's parent is H1)."""
    from graphrag_ray.stages.layout import build_structure, parse_sections

    t = "# A\nbody\n## B\nbody\n### C\nx\n## D\nend\n# E\ntail"
    rows = build_structure(parse_sections(t), len(t))
    assert [(r["title"], r["parent_idx"], r["depth"]) for r in rows] == [
        ("A", -1, 0), ("B", 0, 1), ("C", 1, 2), ("D", 0, 1), ("E", -1, 0)]
    assert rows[2]["path"] == "A > B > C"
    assert rows[3]["path"] == "A > D"
    # content spans: heading end → next heading start (or len)
    assert rows[0]["content_start"] == 3
    assert rows[0]["content_end"] == t.index("## B")
    assert rows[4]["content_end"] == len(t)
    # level jump down by 2 then root again: parent skips to nearest lower
    t2 = "# R\n### deep\n## mid"
    rows2 = build_structure(parse_sections(t2), len(t2))
    assert [(r["title"], r["parent_idx"]) for r in rows2] == [
        ("R", -1), ("deep", 0), ("mid", 0)]
