"""synth_oracle.py: the DuckDB md5 replay of the synth corpus must equal
the Python generator + real pipeline exactly (the driver's kg_chunks /
media_features / media_frames hard oracles depend on it)."""

import duckdb
import pandas as pd
import pytest

from graphrag_ray import synth_oracle as so
from graphrag_ray.functions.chunking import chunk_text
from graphrag_ray.synth import _u, doc_text_from_spans, synth_spans_for_doc

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(f"CREATE VIEW documents AS SELECT * FROM "
          f"read_parquet('{SF}/documents.parquet')")
    return c


def test_md5_draw_parity(con):
    for key in ("syn:0:ns", "syn:7:3:tmpl", "syn:123:14:vk"):
        sql = con.sql(
            f"select ('0x'||substr(md5('{key}'),1,8))::BIGINT / 4294967296.0"
        ).fetchone()[0]
        assert _u(key) == sql


def test_text_replay_exact_all_docs(con):
    got = con.sql(so._text_cte() + " SELECT doc_id, text FROM texts"
                  ).df().set_index("doc_id")["text"]
    docs = con.sql("SELECT doc_id, text FROM documents").df()
    for _, r in docs.iterrows():
        did = int(r["doc_id"])
        want = doc_text_from_spans(synth_spans_for_doc(did, r["text"], 1))
        assert got[f"doc_{did:08d}"] == want, did


def test_chunker_cte_exact_all_docs(con):
    got = (con.sql(so.kg_chunks_sql())
           .df().sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True))
    docs = con.sql("SELECT doc_id, text FROM documents").df()
    rows = []
    for _, r in docs.iterrows():
        did = int(r["doc_id"])
        text = doc_text_from_spans(synth_spans_for_doc(did, r["text"], 1))
        for idx, s, e in chunk_text(text, 512, 100):
            rows.append((f"doc_{did:08d}_{idx}", f"doc_{did:08d}", idx, s, e))
    want = pd.DataFrame(rows, columns=list(got.columns)) \
        .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    assert len(want) == len(got)
    for col in want.columns:
        assert (want[col].to_numpy() == got[col].to_numpy()).all(), col


def test_media_structure_replay(con):
    feats = con.sql(so.media_features_sql()).df()
    frames = con.sql(so.media_frames_sql()).df()
    docs = con.sql("SELECT doc_id, text FROM documents "
                   "WHERE doc_id % 10 = 0").df()
    n_media = 0
    for _, r in docs.iterrows():
        spans = synth_spans_for_doc(int(r["doc_id"]), r["text"], 1)
        media = [(i, s) for i, s in enumerate(spans) if s["kind"] != "text"]
        n_media += len(media)
        for i, s in media:
            row = feats[feats["media_ref"] == s["media_ref"]]
            assert len(row) == 1 and row["span_index"].iloc[0] == i
    assert len(feats) == n_media
    # every media ref has >= 1 frame at ts 0 and 1-30 frames total
    per_ref = frames.groupby("media_ref")["frame_idx"].agg(["min", "max", "size"])
    assert (per_ref["min"] == 0).all()
    assert per_ref["size"].between(1, 30).all()
    assert set(per_ref.index) == set(feats["media_ref"])
