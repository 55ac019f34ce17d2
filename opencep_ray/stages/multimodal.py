"""Multimodal columns: images / audio / video as opaque binary columns with
typed metadata.

The container has no image/audio codecs, so the decode kernels are STUBS:
``DecodeImage(real_decode=True)`` raises ``NotImplementedError``; the
default mode produces a deterministic fake feature vector derived from the
payload bytes, so the Ray-side plumbing — schema, actor-pool stage shape,
batch sizing for wide binary rows, output layout — is real and tested.

Scale notes baked into the stage signatures: binary payloads dominate
bytes, so these stages run with SMALL ``batch_size`` (default 64) and
actor pools (decoder init once per actor); blocks stay Arrow end-to-end
(binary columns must never round-trip through pandas object dtype).
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa

from ray.data import Dataset

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),            # image | audio | video
    ("payload", pa.binary()),
    ("mime", pa.string()),
    ("width", pa.int32()),            # images/video
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),      # audio/video
])


def synth_media(n: int = 64, seed: int = 5, payload_bytes: int = 4096,
                kind: str = "image") -> pa.Table:
    """Deterministic fake media table for plumbing tests."""
    rng = np.random.RandomState(seed)
    payloads = [rng.bytes(payload_bytes) for _ in range(n)]
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "kind": pa.array([kind] * n),
        "payload": pa.array(payloads, pa.binary()),
        "mime": pa.array(["image/png" if kind == "image" else "audio/wav"]
                         * n),
        "width": pa.array(rng.randint(64, 1024, n).astype(np.int32)),
        "height": pa.array(rng.randint(64, 1024, n).astype(np.int32)),
        "duration_ms": pa.array(rng.randint(500, 60000, n)
                                .astype(np.int32)),
    })


class DecodeImage:
    """Actor-pool decode/feature stage.

    Real decoding is not available in this container — with
    ``real_decode=True`` the first batch raises ``NotImplementedError``
    naming the missing dependency.  The default produces a deterministic
    16-dim feature from a blake2b digest of the payload, preserving the
    exact stage contract (binary in → fixed-width ``list<float>`` out).
    """

    FEATURE_DIM = 16

    def __init__(self, real_decode: bool = False):
        self.real_decode = real_decode
        # real path would load the codec/model here, once per actor

    def features(self, payload: bytes) -> np.ndarray:
        if self.real_decode:
            raise NotImplementedError(
                "image decoding requires PIL/opencv, not present in this "
                "environment; run with real_decode=False for the "
                "deterministic stub")
        digest = hashlib.blake2b(payload, digest_size=self.FEATURE_DIM * 4)
        raw = np.frombuffer(digest.digest(), dtype=np.uint32)
        return (raw / np.float64(2 ** 32)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self.features(p) for p in batch["payload"].to_pylist()]
        out = batch.drop_columns(["payload"])
        return out.append_column(
            "features", pa.array([f.tolist() for f in feats],
                                 pa.list_(pa.float32())))


class FrameSample:
    """Video frame sampling stub: emits ``n_frames`` (media_id, frame_idx,
    frame_ts_ms) rows per video — the real decoder would also attach the
    frame payload.  Demonstrates the 1→N flat-map layout."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, fts = [], [], []
        for mid, dur in zip(batch["media_id"].to_pylist(),
                            batch["duration_ms"].to_pylist()):
            step = max(1, (dur or 1000) // self.n_frames)
            for i in range(self.n_frames):
                ids.append(mid)
                fidx.append(i)
                fts.append(i * step)
        return pa.table({"media_id": pa.array(ids, pa.int64()),
                         "frame_idx": pa.array(fidx, pa.int32()),
                         "frame_ts_ms": pa.array(fts, pa.int32())})


def decode_features(ds: Dataset, batch_size: int = 64,
                    concurrency=(1, 8)) -> Dataset:
    """The canonical multimodal pipeline stage: small batches (binary rows
    are wide), actor pool, Arrow end-to-end."""
    return ds.map_batches(DecodeImage, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)
