"""Multimodal binary columns: decode / feature / resize / frame-sample.

Images, audio and video travel as opaque ``binary`` columns with typed
metadata; every transform is an actor-pool ``map_batches`` stage with the
Ray-side plumbing (schema, batch sizing, actor signature, output layout)
fully real. The codec libraries (PIL/av/soundfile) are NOT in this
container, so the byte-level decode is stubbed: with ``fake=True``
(default) a deterministic fake decoder derives features from the bytes
alone; with ``fake=False`` the stage raises ``NotImplementedError`` at
the decode call, marking exactly where a codec would slot in.

Batch sizes are small (256) because rows carry large payloads — a batch
must stay well under the object-store block target.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from raygraph.util import mix64

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("kind", pa.string()),       # image | audio | video
        pa.field("payload", pa.binary()),
        pa.field("meta_width", pa.int32()),
        pa.field("meta_height", pa.int32()),
        pa.field("meta_duration_ms", pa.int32()),
    ]
)


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in feature: seeded from the payload hash."""
    h = np.uint64(len(payload))
    with np.errstate(over="ignore"):
        b = np.frombuffer(payload[:256], np.uint8).astype(np.uint64)
        for x in b[:: max(1, len(b) // 32)]:
            h = mix64(h ^ x)
    rng = np.random.default_rng(int(h))
    return rng.standard_normal(dim)


class ImageDecoder:
    """payload -> decoded pixel stats + feature vector (stub codec).

    Actor state (the would-be model / codec handle) is built once.
    """

    def __init__(self, feature_dim: int = 16, fake: bool = True):
        self.dim = feature_dim
        self.fake = fake
        try:  # real codec gate — absent in this container
            import PIL.Image  # type: ignore  # noqa: F401

            self._pil = True
        except ImportError:
            self._pil = False

    def decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        if self.fake:
            # deterministic fake: pretend-decode to a mean-intensity
            # statistic — the default regardless of whether PIL happens
            # to be importable (fake=True must never hit a codec)
            return _fake_feature(payload, self.dim)
        if self._pil:
            raise NotImplementedError("real PIL decode path not exercised in sandbox")
        raise NotImplementedError("image codec not available in this container")

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        w = np.asarray(t["meta_width"].to_numpy(zero_copy_only=False))
        h = np.asarray(t["meta_height"].to_numpy(zero_copy_only=False))
        feats = np.stack(
            [self.decode(p or b"", int(wi), int(hi)) for p, wi, hi in zip(payloads, w, h)]
        ) if len(payloads) else np.zeros((0, self.dim))
        return pa.table(
            {
                "media_id": t["media_id"],
                "feature": pa.array(list(feats), pa.list_(pa.float64())),
                "n_bytes": pa.array([len(p or b"") for p in payloads], pa.int64()),
            }
        )


class FrameSampler:
    """video payload -> every Nth 'frame' feature (stub frame extraction);
    output explodes one row per sampled frame (flat-map shape)."""

    def __init__(self, every_ms: int = 1000, feature_dim: int = 8, fake: bool = True):
        self.every_ms = every_ms
        self.dim = feature_dim
        self.fake = fake

    def __call__(self, t: pa.Table) -> pa.Table:
        ids_out, frame_out, feat_out = [], [], []
        ids = np.asarray(t["media_id"].to_numpy(zero_copy_only=False))
        dur = np.asarray(t["meta_duration_ms"].to_numpy(zero_copy_only=False))
        payloads = t["payload"].to_pylist()
        for mid, d, p in zip(ids, dur, payloads):
            if not self.fake:
                raise NotImplementedError("video codec not available in this container")
            n_frames = max(1, int(d) // self.every_ms)
            for fi in range(n_frames):
                ids_out.append(int(mid))
                frame_out.append(fi * self.every_ms)
                feat_out.append(_fake_feature((p or b"") + fi.to_bytes(4, "little"), self.dim))
        return pa.table(
            {
                "media_id": pa.array(ids_out, pa.int64()),
                "frame_ms": pa.array(frame_out, pa.int64()),
                "feature": pa.array([list(f) for f in feat_out], pa.list_(pa.float64())),
            }
        )


def decode_images(media_ds, *, feature_dim: int = 16, concurrency=(1, 4),
                  batch_size: int = 256):
    return media_ds.map_batches(
        ImageDecoder,
        fn_constructor_kwargs={"feature_dim": feature_dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_frames(media_ds, *, every_ms: int = 1000, concurrency=(1, 4),
                  batch_size: int = 64):
    return media_ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"every_ms": every_ms},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows for plumbing tests."""
    rng = np.random.default_rng(seed)
    kinds = np.asarray(["image", "audio", "video"])[rng.integers(0, 3, n)]
    payloads = [rng.integers(0, 256, size=int(rng.integers(64, 512)), dtype=np.uint8)
                .tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), pa.int64()),
            "kind": pa.array(kinds.tolist(), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "meta_width": pa.array(rng.integers(16, 256, n).astype(np.int32)),
            "meta_height": pa.array(rng.integers(16, 256, n).astype(np.int32)),
            "meta_duration_ms": pa.array(rng.integers(500, 5000, n).astype(np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


class ImageResizer:
    """payload -> resized payload + updated meta (stub codec).

    Real path would decode, resize with the actor-held codec, re-encode;
    the fake path keeps the bytes and rescales the metadata so downstream
    schema/flow (including object-store sizing) is exercised for real."""

    def __init__(self, max_side: int = 64, fake: bool = True):
        self.max_side = max_side
        self.fake = fake

    def __call__(self, t: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("image codec not available in this container")
        w = np.asarray(t["meta_width"].to_numpy(zero_copy_only=False), np.float64)
        h = np.asarray(t["meta_height"].to_numpy(zero_copy_only=False), np.float64)
        scale = np.minimum(1.0, self.max_side / np.maximum(np.maximum(w, h), 1.0))
        return pa.table(
            {
                "media_id": t["media_id"],
                "kind": t["kind"],
                "payload": t["payload"],  # fake: bytes unchanged
                "meta_width": pa.array((w * scale).astype(np.int32)),
                "meta_height": pa.array((h * scale).astype(np.int32)),
                "meta_duration_ms": t["meta_duration_ms"],
            }
        )


class AudioFeaturizer:
    """audio payload -> fixed-size feature vector (stub codec).

    Real path: decode with the actor-held soundfile/ffmpeg handle, then
    frame + FFT; fake path derives a deterministic feature from the bytes
    and duration so batching/schema are real."""

    def __init__(self, feature_dim: int = 12, fake: bool = True):
        self.dim = feature_dim
        self.fake = fake

    def __call__(self, t: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("audio codec not available in this container")
        payloads = t["payload"].to_pylist()
        dur = np.asarray(t["meta_duration_ms"].to_numpy(zero_copy_only=False))
        feats = [
            _fake_feature((p or b"") + int(d).to_bytes(4, "little"), self.dim)
            for p, d in zip(payloads, dur)
        ]
        return pa.table(
            {
                "media_id": t["media_id"],
                "feature": pa.array([list(f) for f in feats], pa.list_(pa.float64())),
                "duration_ms": pa.array(dur.astype(np.int64)),
            }
        )


def resize_images(media_ds, *, max_side: int = 64, concurrency=(1, 4),
                  batch_size: int = 256):
    return media_ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"max_side": max_side},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def audio_features(media_ds, *, feature_dim: int = 12, concurrency=(1, 4),
                   batch_size: int = 256):
    return media_ds.map_batches(
        AudioFeaturizer,
        fn_constructor_kwargs={"feature_dim": feature_dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
