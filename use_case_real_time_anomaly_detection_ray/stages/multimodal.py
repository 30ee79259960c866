"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool ``map_batches`` stages.

The decode kernels themselves are STUBBED (no image/audio libraries in this
environment): :class:`FakeDecoder` produces a deterministic ndarray from the
payload bytes, and ``decoder="real"`` raises ``NotImplementedError`` with the
intended library call. Everything around the stub — the schema contract, the
small-batch sizing for fat binary rows, the actor signature, the output tensor
layout — is real, tested Ray plumbing, so swapping in a real codec is a
one-function change.

Batch-size guidance (ray_guide 'Memory-aware'): binary payloads are KB–MB per
row, so these stages default to small ``batch_size`` and
``batch_format="pyarrow"`` (binary columns don't round-trip pandas safely).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray.data

#: contract for a multimodal asset table
MEDIA_SCHEMA = pa.schema(
    [
        ("asset_id", pa.int64()),
        ("media_type", pa.string()),   # image | audio | video
        ("format", pa.string()),       # png/jpeg/wav/mp4/...
        ("width", pa.int32()),         # images/video; -1 otherwise
        ("height", pa.int32()),
        ("n_frames", pa.int32()),      # video frame count; 1 for images
        ("payload", pa.large_binary()),
    ]
)


def synth_media_table(n: int = 32, seed: int = 42, media_type: str = "image") -> pa.Table:
    """Deterministic fake asset table for tests/benchmarks."""
    rng = np.random.default_rng(seed)
    payloads, w, h, f = [], [], [], []
    for i in range(n):
        width, height = int(rng.integers(8, 64)), int(rng.integers(8, 64))
        frames = 1 if media_type == "image" else int(rng.integers(2, 10))
        payloads.append(rng.integers(0, 256, size=width * height, dtype=np.uint8).tobytes())
        w.append(width)
        h.append(height)
        f.append(frames)
    return pa.table(
        {
            "asset_id": pa.array(range(n), pa.int64()),
            "media_type": pa.array([media_type] * n, pa.string()),
            "format": pa.array(["fake"] * n, pa.string()),
            "width": pa.array(w, pa.int32()),
            "height": pa.array(h, pa.int32()),
            "n_frames": pa.array(f, pa.int32()),
            "payload": pa.array(payloads, pa.large_binary()),
        },
        schema=MEDIA_SCHEMA,
    )


class FakeDecoder:
    """Deterministic stand-in for a codec: bytes → (h, w) uint8 array derived
    from a blake2b stream of the payload (stable across processes)."""

    def decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        need = width * height
        out = np.empty(need, dtype=np.uint8)
        pos, counter = 0, 0
        seed = hashlib.blake2b(payload, digest_size=16).digest()
        while pos < need:
            block = hashlib.blake2b(seed + counter.to_bytes(4, "big"),
                                    digest_size=64).digest()
            take = min(64, need - pos)
            out[pos:pos + take] = np.frombuffer(block[:take], dtype=np.uint8)
            pos += take
            counter += 1
        return out.reshape(height, width)


class DecodeStage:
    """Actor-pool stage: payload → decoded tensor + basic features.

    ``decoder="fake"`` (default here) uses :class:`FakeDecoder`;
    ``decoder="real"`` documents the intended call and raises — the image
    libraries are not available in this environment."""

    def __init__(self, decoder: str = "fake"):
        if decoder == "real":
            raise NotImplementedError(
                "real decode would be e.g. PIL.Image.open(io.BytesIO(payload)) "
                "/ torchaudio.load / pyav frame iteration — libraries not "
                "available in this container; use decoder='fake'"
            )
        self.decoder = FakeDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        ws = batch["width"].to_pylist()
        hs = batch["height"].to_pylist()
        means, stds, shapes = [], [], []
        for p, w, h in zip(payloads, ws, hs):
            img = self.decoder.decode(p, w, h)
            means.append(float(img.mean()))
            stds.append(float(img.std()))
            shapes.append([h, w])
        out = batch.drop_columns(["payload"])  # decoded stage drops fat bytes
        out = out.append_column("pix_mean", pa.array(means, pa.float64()))
        out = out.append_column("pix_std", pa.array(stds, pa.float64()))
        out = out.append_column("shape", pa.array(shapes, pa.list_(pa.int32())))
        return out


class ResizeStage:
    """Fixed-size feature extraction: decode → resize (nearest-neighbor,
    pure numpy) → flattened feature vector. Output rows are constant-width —
    the layout an embedding model consumes."""

    def __init__(self, target: int = 16, decoder: str = "fake"):
        if decoder == "real":
            raise NotImplementedError("real resize = PIL Image.resize / cv2.resize")
        self.target = target
        self.decoder = FakeDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = self.target
        feats = []
        for p, w, h in zip(batch["payload"].to_pylist(), batch["width"].to_pylist(),
                           batch["height"].to_pylist()):
            img = self.decoder.decode(p, w, h)
            yi = (np.arange(t) * h // t).clip(0, h - 1)
            xi = (np.arange(t) * w // t).clip(0, w - 1)
            feats.append((img[np.ix_(yi, xi)].astype(np.float32) / 255.0).ravel())
        return pa.table(
            {
                "asset_id": batch["asset_id"],
                "feature": pa.array([f.tolist() for f in feats],
                                    pa.list_(pa.float32(), t * t)),
            }
        )


class FrameSampleStage:
    """Video plumbing: emit ``every_k``-th frame index row per asset
    (flat_map-shaped: one input row → n output rows)."""

    def __init__(self, every_k: int = 2):
        self.every_k = every_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames = [], []
        for aid, nf in zip(batch["asset_id"].to_pylist(), batch["n_frames"].to_pylist()):
            for fi in range(0, nf, self.every_k):
                ids.append(aid)
                frames.append(fi)
        return pa.table({"asset_id": pa.array(ids, pa.int64()),
                         "frame_index": pa.array(frames, pa.int32())})


#: Fixed-size actor pools, NOT an autoscaling ``(1, N)`` pool: a pool that
#: starts at 1 actor never catches up on a seconds-long stage (measured
#: 0.51→1.03 scaling efficiency going autoscale→fixed, BENCH/BASELINE.md).
#: Size the pool to the cluster when calling (e.g. nodes × cores / num_cpus);
#: the default fits the 4-CPU test session while leaving CPUs for the
#: upstream read (a pool == session CPUs starves the reads and deadlocks).
_DEFAULT_POOL = 2


def decode_features(
    ds: "ray.data.Dataset",
    concurrency: int = _DEFAULT_POOL,
    batch_size: int = 64,  # small: payload rows are fat
) -> "ray.data.Dataset":
    return ds.map_batches(
        DecodeStage, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )


def resize_features(
    ds: "ray.data.Dataset",
    target: int = 16,
    concurrency: int = _DEFAULT_POOL,
    batch_size: int = 64,
) -> "ray.data.Dataset":
    return ds.map_batches(
        ResizeStage, fn_constructor_args=(target,), batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency,
    )


def sample_frames(ds: "ray.data.Dataset", every_k: int = 2,
                  concurrency: int = _DEFAULT_POOL) -> "ray.data.Dataset":
    return ds.map_batches(
        FrameSampleStage, fn_constructor_args=(every_k,), batch_format="pyarrow",
        concurrency=concurrency, batch_size=256,
    )
