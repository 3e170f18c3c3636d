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


MEDIA_BYTES_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("kind", pa.string()),
        ("span_index", pa.int32()),
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int64()),
    ]
)


class MediaBytesLoader:
    """Actor-pool fetch stage: media_ref → binary payload + typed metadata.

    Real path: resolve the ref against object storage (s3/lance blob) once
    per row; here the payload is a deterministic md5-stream stand-in so
    byte-level plumbing (binary column, per-row sizes, small batches) is
    exercised for real. Metadata (width/height/duration) is derived
    deterministically from the ref — a real loader reads it from the
    container header at the marked seam."""

    def __init__(self, mode: str = DETERMINISTIC_FAKE, payload_bytes: int = 256):
        self.mode = mode
        self.payload_bytes = payload_bytes

    def _fetch(self, media_ref: str) -> tuple[bytes, int, int, int]:
        if self.mode == STRICT:
            raise NotImplementedError(
                "media fetch requires object-storage access; plug the real "
                "reader here"
            )
        h = hashlib.md5(media_ref.encode()).digest()
        reps = self.payload_bytes // len(h) + 1
        payload = (h * reps)[: self.payload_bytes]
        width = 64 + h[0] % 192          # 64..255
        height = 64 + h[1] % 192
        duration = 1000 + int.from_bytes(h[2:4], "big") % 29000  # 1-30 s
        return payload, width, height, duration

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {"payload": [], "width": [], "height": [], "duration_ms": []}
        for ref in batch.column("media_ref").to_pylist():
            p, w, hgt, d = self._fetch(ref)
            rows["payload"].append(p)
            rows["width"].append(w)
            rows["height"].append(hgt)
            rows["duration_ms"].append(d)
        return pa.Table.from_arrays(
            [
                batch.column("doc_id"),
                batch.column("media_ref"),
                batch.column("kind"),
                batch.column("span_index"),
                pa.array(rows["payload"], pa.binary()),
                pa.array(rows["width"], pa.int32()),
                pa.array(rows["height"], pa.int32()),
                pa.array(rows["duration_ms"], pa.int64()),
            ],
            schema=MEDIA_BYTES_SCHEMA,
        )


class ImageResizeStage:
    """Resize stage over decoded image arrays. The DECODE is the fake seam
    (payload bytes → deterministic grayscale array); the RESIZE itself is
    real vectorized math (block-mean downsampling via reshape) — exactly
    the compute shape a PIL/torchvision resize replaces."""

    def __init__(self, target: int = 32, mode: str = DETERMINISTIC_FAKE):
        self.target = target
        self.mode = mode

    def _decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        if self.mode == STRICT:
            raise NotImplementedError("plug a real image decoder here")
        raw = np.frombuffer(
            (payload * ((width * height) // max(1, len(payload)) + 1))
            [: width * height], dtype=np.uint8)
        return raw.reshape(height, width)

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = self.target
        out = []
        widths: list[int] = []
        heights: list[int] = []
        crop_sums: list[int] = []
        for payload, w, hgt in zip(batch.column("payload").to_pylist(),
                                   batch.column("width").to_pylist(),
                                   batch.column("height").to_pylist()):
            widths.append(int(w))
            heights.append(int(hgt))
            img = self._decode(payload, w, hgt)
            # images smaller than the target would crop to 0 rows/cols and
            # the block-mean would emit NaNs — upsample by pixel repetition
            # first (nearest-neighbor) so every input has >= t per axis.
            if img.shape[0] < t:
                img = np.repeat(img, -(-t // img.shape[0]), axis=0)
            if img.shape[1] < t:
                img = np.repeat(img, -(-t // img.shape[1]), axis=1)
            hgt, w = img.shape
            # crop to a multiple of target, then block-mean (vectorized)
            ch, cw = (hgt // t) * t, (w // t) * t
            crop = img[:ch, :cw]
            # integer-exact checksum of the cropped region (uint8 sum in
            # int64 BEFORE the float cast) — the oracle replays it from the
            # 16-periodic md5 payload with a counting identity, verifying
            # decode+crop byte-for-byte without float-rounding drift.
            crop_sums.append(int(crop.sum(dtype=np.int64)))
            resized = crop.astype(np.float32).reshape(
                t, ch // t, t, cw // t).mean(axis=(1, 3))
            out.append((resized / 255.0).reshape(-1).tolist())
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "media_ref": batch.column("media_ref"),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "crop_byte_sum": pa.array(crop_sums, pa.int64()),
                "pixels": pa.array(out, pa.list_(pa.float32())),
            }
        )


def make_frame_sampler(fps_sample: float = 1.0):
    """Video frame sampling: one row per sampled frame timestamp
    (flat-map explode; a real implementation seeks the container at each
    ts — the explode/emit plumbing is identical)."""

    def sample_frames(batch: pa.Table) -> pa.Table:
        out = {"doc_id": [], "media_ref": [], "frame_idx": [], "ts_ms": []}
        for doc_id, ref, dur in zip(batch.column("doc_id").to_pylist(),
                                    batch.column("media_ref").to_pylist(),
                                    batch.column("duration_ms").to_pylist()):
            # per-index timestamps (round(i*1000/fps)) rather than an int
            # step accumulator: no drift at non-divisor rates (fps=3 →
            # 0,333,667,1000…) and no zero-step at fps_sample > 1000 —
            # sub-ms rates clamp to one frame per ms (ts is ms-granular).
            i, emitted, prev_ts, dur_i = 0, 0, -1, int(dur)
            while True:
                ts = round(i * 1000 / fps_sample)
                if ts >= dur_i:
                    break
                i += 1
                if ts == prev_ts:
                    continue
                prev_ts = ts
                out["doc_id"].append(doc_id)
                out["media_ref"].append(ref)
                out["frame_idx"].append(emitted)
                out["ts_ms"].append(ts)
                emitted += 1
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(out["doc_id"], pa.string()),
                "media_ref": pa.array(out["media_ref"], pa.string()),
                "frame_idx": pa.array(out["frame_idx"], pa.int32()),
                "ts_ms": pa.array(out["ts_ms"], pa.int64()),
            }
        )

    return sample_frames
