"""Multimodal span handling (training-data ops, plumbing real / decode stubbed).

Media spans (kind != 'text') are opaque references with typed metadata; the
Ray-side machinery — schema, explode, actor-pool stage signature, batch
sizing, output layout — is real and tested. The *decode* itself is stubbed
(image/audio libraries are not in this container): ``DETERMINISTIC_FAKE``
produces a stable md5-derived feature vector so downstream stages are
exercisable; ``STRICT`` raises NotImplementedError at the exact point a
real decoder (PIL/ffmpeg) would plug in.

Scale notes encoded in the defaults: media payloads are large → the stage
takes SMALL batch sizes (batch_size=16) and is an actor pool so codec
state/model weights load once per actor, not per batch.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_FEATURES_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("kind", pa.string()),
        ("span_index", pa.int32()),
        ("feature", pa.list_(pa.float32())),
    ]
)

DETERMINISTIC_FAKE = "fake"
STRICT = "strict"


def explode_media_spans(batch: pa.Table) -> pa.Table:
    """documents(spans) → one row per media span (text spans untouched in
    the source — this is a read-only projection preserving span order)."""
    out = {"doc_id": [], "media_ref": [], "kind": [], "span_index": []}
    for doc_id, spans in zip(
        batch.column("doc_id").to_pylist(), batch.column("spans").to_pylist()
    ):
        for i, s in enumerate(spans):
            if s["kind"] != "text":
                out["doc_id"].append(doc_id)
                out["media_ref"].append(s["media_ref"])
                out["kind"].append(s["kind"])
                out["span_index"].append(i)
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "media_ref": pa.array(out["media_ref"], pa.string()),
            "kind": pa.array(out["kind"], pa.string()),
            "span_index": pa.array(out["span_index"], pa.int32()),
        }
    )


class MediaFeatureExtractor:
    """Actor-pool decode/feature stage (stub behind a clearly-marked seam).

    Usage: ds.map_batches(MediaFeatureExtractor, fn_constructor_kwargs=...,
    batch_size=16, concurrency=N) — small batches because real media rows
    are large binary payloads.
    """

    def __init__(self, mode: str = DETERMINISTIC_FAKE, feature_dim: int = 8):
        self.mode = mode
        self.feature_dim = feature_dim
        # a real implementation loads the codec / vision model HERE, once
        # per actor (e.g. PIL / torchvision weights).

    def _decode_and_featurize(self, media_ref: str) -> np.ndarray:
        if self.mode == STRICT:
            raise NotImplementedError(
                "media decode requires image/audio libraries not present in "
                "this environment; plug a real decoder here"
            )
        # deterministic fake: md5(media_ref) → unit vector
        seed = int.from_bytes(hashlib.md5(media_ref.encode()).digest()[:4], "big")
        rng = np.random.RandomState(seed)
        v = rng.uniform(-1.0, 1.0, self.feature_dim).astype(np.float32)
        n = np.linalg.norm(v)
        return v / n if n > 0 else v

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self._decode_and_featurize(ref).tolist()
            for ref in batch.column("media_ref").to_pylist()
        ]
        return pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                batch.column("media_ref"),
                batch.column("kind"),
                batch.column("span_index"),
                pa.array(feats, pa.list_(pa.float32())),
            ],
            schema=MEDIA_FEATURES_SCHEMA,
        )
