"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by actor-pool ``map_batches`` stages.

Two decoder tiers:

- ``decoder="real"`` (:class:`RealDecoder`) — genuine spec-conformant
  decoders for the public formats implementable with pure numpy + stdlib
  (:mod:`.codecs`): BMP, PGM, PNG, GIF and baseline JPEG images (PNG/GIF/
  JPEG are real compressed codecs — DEFLATE via stdlib ``zlib``, pure
  LZW, canonical-Huffman + IDCT), PCM16 WAV audio, YUV4MPEG2 (Y4M) video,
  and MP4 (ISO BMFF) video with Motion-JPEG tracks — a real demuxer
  (stsc/stco/stsz sample-table resolution, O(1) frame seek) whose samples
  decode through the JPEG codec. Round-trip-tested (byte-exact for the
  lossless codecs). AVC/HEVC tracks and remaining compressed formats
  (MP3/...) raise ``NotImplementedError`` naming the payload's sniffed
  format and the intended library call — those codecs genuinely need
  external libraries this container doesn't have.
- ``decoder="fake"`` (:class:`FakeDecoder`) — deterministic ndarray from a
  blake2b stream of the payload, for plumbing tests that want payload-shape
  independence.

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

from . import codecs

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


def synth_media_table(n: int = 32, seed: int = 42, media_type: str = "image",
                      fmt: str = "fake") -> pa.Table:
    """Deterministic asset table for tests/benchmarks.

    ``fmt="fake"`` keeps the legacy raw-bytes payloads (for
    :class:`FakeDecoder`); ``fmt in {"bmp", "pgm", "png", "gif", "jpeg",
    "wav", "y4m", "mp4"}`` encodes REAL format bytes (``media_type`` is
    then implied by the format); ``fmt="mixed"`` cycles
    bmp/wav/y4m/png/gif/jpeg/mp4 per row."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        row_fmt = fmt if fmt != "mixed" else (
            "bmp", "wav", "y4m", "png", "gif", "jpeg", "mp4")[i % 7]
        width, height = int(rng.integers(8, 64)), int(rng.integers(8, 64))
        if row_fmt == "fake":
            frames = 1 if media_type == "image" else int(rng.integers(2, 10))
            payload = rng.integers(0, 256, size=width * height,
                                   dtype=np.uint8).tobytes()
            rows.append((media_type, "fake", width, height, frames, payload))
        elif row_fmt in ("bmp", "pgm", "png", "gif", "jpeg"):
            # smooth gradient + noise so the adaptive PNG filter chooser
            # actually picks different filters across rows
            img = (rng.integers(0, 128, size=(height, width), dtype=np.uint8)
                   + (np.arange(height, dtype=np.uint8)[:, None] % 128))
            enc = {"bmp": codecs.encode_bmp, "pgm": codecs.encode_pgm,
                   "png": codecs.encode_png, "gif": codecs.encode_gif,
                   "jpeg": codecs.encode_jpeg}[row_fmt]
            rows.append(("image", row_fmt, width, height, 1, enc(img)))
        elif row_fmt == "wav":
            n_samp = int(rng.integers(500, 2000))
            t = np.arange(n_samp)
            freq = float(rng.uniform(0.01, 0.2))
            samples = (8000 * np.sin(freq * t)
                       + rng.integers(-500, 500, n_samp)).astype(np.int16)
            rows.append(("audio", "wav", -1, -1, 1, codecs.encode_wav(samples)))
        elif row_fmt == "y4m":
            frames = int(rng.integers(2, 10))
            vid = rng.integers(0, 256, size=(frames, height, width),
                               dtype=np.uint8)
            rows.append(("video", "y4m", width, height, frames,
                         codecs.encode_y4m(vid)))
        elif row_fmt == "mp4":
            frames = int(rng.integers(2, 10))
            vid = rng.integers(0, 256, size=(frames, height, width),
                               dtype=np.uint8)
            rows.append(("video", "mp4", width, height, frames,
                         codecs.encode_mp4(vid)))
        else:
            raise ValueError(f"unknown fmt {row_fmt!r}")
    mt, ft, w, h, f, payloads = zip(*rows)
    return pa.table(
        {
            "asset_id": pa.array(range(n), pa.int64()),
            "media_type": pa.array(mt, pa.string()),
            "format": pa.array(ft, pa.string()),
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


class RealDecoder:
    """Spec-conformant decode for the stdlib-decodable public formats
    (:mod:`.codecs`), dispatched on magic bytes. Returns the decoded array:
    (h, w) uint8 for images, (n,) int16 for audio, (n_frames, h, w) uint8
    for video. Payloads in formats needing external codec libraries raise
    ``NotImplementedError`` naming the sniffed format and the library a
    full deployment would plug in here."""

    def decode(self, payload: bytes) -> np.ndarray:
        kind = codecs.sniff_format(payload)
        if kind == "bmp":
            return codecs.decode_bmp(payload)
        if kind == "pgm":
            return codecs.decode_pgm(payload)
        if kind == "png":
            return codecs.decode_png(payload)
        if kind == "gif":
            return codecs.decode_gif(payload)
        if kind == "jpeg":
            return codecs.decode_jpeg(payload)
        if kind == "wav":
            return codecs.decode_wav(payload)[1]
        if kind == "y4m":
            return codecs.decode_y4m(payload)
        if kind == "mp4":
            return codecs.decode_mp4(payload)
        raise NotImplementedError(
            f"payload sniffs as {kind!r}: this codec needs an external "
            "library (soundfile.read / av.open) not present in this "
            "container; re-encode as png/gif/jpeg/bmp/pgm/wav/y4m or use "
            "decoder='fake' for plumbing tests"
        )


class DecodeStage:
    """Actor-pool stage: payload → decoded tensor + basic features.

    ``decoder="real"`` (:class:`RealDecoder`) decodes actual BMP/PGM/WAV/Y4M
    bytes; ``decoder="fake"`` (:class:`FakeDecoder`, default for legacy raw
    payloads) synthesizes deterministic pixels. Output columns are identical
    either way: ``pix_mean``/``pix_std`` are the mean/std over the decoded
    array (pixels, samples, or all video luma), ``shape`` its dimensions."""

    def __init__(self, decoder: str = "fake"):
        if decoder not in ("fake", "real"):
            raise ValueError(f"decoder must be 'fake' or 'real', got {decoder!r}")
        self.real = decoder == "real"
        self.decoder = RealDecoder() if self.real else FakeDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        ws = batch["width"].to_pylist()
        hs = batch["height"].to_pylist()
        means, stds, shapes = [], [], []
        for p, w, h in zip(payloads, ws, hs):
            if self.real:
                arr = self.decoder.decode(p)
                if arr.ndim == 2 and w >= 0 and (arr.shape != (h, w)):
                    raise ValueError(
                        f"metadata says {h}x{w} but payload decodes to "
                        f"{arr.shape}"
                    )
            else:
                arr = self.decoder.decode(p, w, h)
            means.append(float(arr.mean()))
            stds.append(float(arr.std()))
            shapes.append(list(arr.shape))
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
        if decoder not in ("fake", "real"):
            raise ValueError(f"decoder must be 'fake' or 'real', got {decoder!r}")
        self.target = target
        self.real = decoder == "real"
        self.decoder = RealDecoder() if self.real else FakeDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = self.target
        feats = []
        for p, w, h in zip(batch["payload"].to_pylist(), batch["width"].to_pylist(),
                           batch["height"].to_pylist()):
            if self.real:
                img = self.decoder.decode(p)
                if img.ndim == 3:       # video: resize the first frame
                    img = img[0]
                elif img.ndim == 1:     # audio has no 2-D resize
                    raise ValueError("ResizeStage is image/video-only; "
                                     "filter audio rows upstream")
                h, w = img.shape
            else:
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
    """Video plumbing: emit ``every_k``-th frame row per asset
    (flat_map-shaped: one input row → n output rows).

    ``decode=False`` emits (asset_id, frame_index) from metadata only.
    ``decode=True`` accepts Y4M or MP4 (Motion-JPEG) payloads: each sampled
    frame's luma plane is actually extracted (O(1) seek per frame — the
    Y4M stride / MP4 sample table is resolved once per asset, never a
    full-stream decode) and its mean is emitted as ``frame_mean``; the
    metadata ``n_frames`` is cross-checked against the container's real
    frame count."""

    def __init__(self, every_k: int = 2, decode: bool = False):
        self.every_k = every_k
        self.decode = decode

    @staticmethod
    def _frame_reader(payload: bytes):
        """(n_frames, frame_index -> luma array) for a video container."""
        kind = codecs.sniff_format(payload)
        if kind == "y4m":
            return (codecs.y4m_frame_count(payload),
                    lambda i: codecs.decode_y4m_frame(payload, i))
        if kind == "mp4":
            _, _, _, offs, sizes = codecs._mp4_sample_table(payload)
            return (len(offs),
                    lambda i: codecs.decode_jpeg(
                        bytes(payload[int(offs[i]):int(offs[i] + sizes[i])])))
        raise ValueError(
            f"FrameSampleStage(decode=True) wants a video container "
            f"(y4m/mp4), payload sniffs as {kind!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, means = [], [], []
        payloads = batch["payload"].to_pylist() if self.decode else None
        for i, (aid, nf) in enumerate(zip(batch["asset_id"].to_pylist(),
                                          batch["n_frames"].to_pylist())):
            if self.decode:
                real_n, read_frame = self._frame_reader(payloads[i])
                if real_n != nf:
                    raise ValueError(
                        f"asset {aid}: metadata n_frames={nf} but the "
                        f"stream has {real_n} frames"
                    )
            for fi in range(0, nf, self.every_k):
                ids.append(aid)
                frames.append(fi)
                if self.decode:
                    means.append(float(read_frame(fi).mean()))
        cols = {"asset_id": pa.array(ids, pa.int64()),
                "frame_index": pa.array(frames, pa.int32())}
        if self.decode:
            cols["frame_mean"] = pa.array(means, pa.float64())
        return pa.table(cols)


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
    decoder: str = "fake",
) -> "ray.data.Dataset":
    return ds.map_batches(
        DecodeStage, fn_constructor_args=(decoder,), batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency,
    )


def resize_features(
    ds: "ray.data.Dataset",
    target: int = 16,
    concurrency: int = _DEFAULT_POOL,
    batch_size: int = 64,
    decoder: str = "fake",
) -> "ray.data.Dataset":
    return ds.map_batches(
        ResizeStage, fn_constructor_args=(target, decoder),
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
    )


def sample_frames(ds: "ray.data.Dataset", every_k: int = 2,
                  concurrency: int = _DEFAULT_POOL,
                  decode: bool = False) -> "ray.data.Dataset":
    return ds.map_batches(
        FrameSampleStage, fn_constructor_args=(every_k, decode),
        batch_format="pyarrow", concurrency=concurrency, batch_size=256,
    )
