"""Pure-numpy/stdlib codecs for uncompressed public media formats.

These are REAL decoders — byte-exact against the published format specs —
implementable without any image/audio library:

- **BMP** (Windows bitmap, BITMAPINFOHEADER): 8-bit palette and 24-bit
  uncompressed, bottom-up or top-down rows, 4-byte row padding.
- **PGM** (netpbm ``P5``): binary grayscale, maxval <= 255.
- **WAV** (RIFF PCM): 16-bit mono via the stdlib :mod:`wave` module.
- **Y4M** (YUV4MPEG2, mjpegtools): ``Cmono`` and ``C420*`` streams; the
  decoder returns the luma (Y) plane per frame.

Compressed formats (PNG/JPEG/MP3/MP4/...) genuinely need external codec
libraries that are not in this container; :func:`sniff_format` classifies
them so callers can raise an explicit ``NotImplementedError`` instead of
misparsing. Encoders exist for every decoder so tests can pin byte-exact
round-trips (encode -> decode == original array).
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

# --------------------------------------------------------------------------
# format sniffing
# --------------------------------------------------------------------------

#: magic -> format name for compressed formats we explicitly do NOT decode
_COMPRESSED_MAGIC = (
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF8", "gif"),
    (b"ID3", "mp3"),
    (b"\xff\xfb", "mp3"),
    (b"OggS", "ogg"),
    (b"\x1a\x45\xdf\xa3", "webm/mkv"),
)


def sniff_format(payload: bytes) -> str:
    """Classify a payload by magic bytes.

    Returns one of ``bmp pgm wav y4m`` (decodable here), a compressed-format
    name (``png jpeg ...`` — NOT decodable here), or ``unknown``.
    """
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] == b"P5":
        return "pgm"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:9] == b"YUV4MPEG2":
        return "y4m"
    if payload[4:8] == b"ftyp":  # ISO BMFF (mp4/mov): size box then 'ftyp'
        return "mp4"
    for magic, name in _COMPRESSED_MAGIC:
        if payload[: len(magic)] == magic:
            return name
    return "unknown"


# --------------------------------------------------------------------------
# BMP — BITMAPFILEHEADER + BITMAPINFOHEADER, 8-bit palette or 24-bit BGR
# --------------------------------------------------------------------------

def encode_bmp(img: np.ndarray) -> bytes:
    """Encode a (h, w) uint8 grayscale array as a 24-bit uncompressed BMP
    (R=G=B, bottom-up rows, 4-byte row padding) — decodes byte-exactly."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 2:
        raise ValueError(f"encode_bmp wants (h, w) grayscale, got {img.shape}")
    h, w = img.shape
    row_size = (3 * w + 3) & ~3
    data = np.zeros((h, row_size), dtype=np.uint8)
    # BGR with B=G=R=gray; rows stored bottom-up
    data[:, : 3 * w] = np.repeat(img[::-1], 3, axis=1)
    pixel_bytes = data.tobytes()
    file_size = 54 + len(pixel_bytes)
    header = struct.pack(
        "<2sIHHI"      # BITMAPFILEHEADER
        "IiiHHIIiiII",  # BITMAPINFOHEADER
        b"BM", file_size, 0, 0, 54,
        40, w, h, 1, 24, 0, len(pixel_bytes), 2835, 2835, 0, 0,
    )
    return header + pixel_bytes


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 8-bit-palette or 24-bit BMP to a (h, w) uint8
    grayscale array (24-bit color reduces via integer Rec.601 luma)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h_signed = struct.unpack_from("<Iii", payload, 14)
    bpp, compression = struct.unpack_from("<HI", payload, 28)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    if compression != 0:
        raise ValueError(f"compressed BMP (BI code {compression}) unsupported")
    h = abs(h_signed)
    top_down = h_signed < 0
    if bpp == 24:
        row_size = (3 * w + 3) & ~3
        rows = np.frombuffer(payload, np.uint8, count=h * row_size,
                             offset=offset).reshape(h, row_size)
        bgr = rows[:, : 3 * w].reshape(h, w, 3).astype(np.uint32)
        gray = ((114 * bgr[..., 0] + 587 * bgr[..., 1] + 299 * bgr[..., 2]
                 + 500) // 1000).astype(np.uint8)
    elif bpp == 8:
        n_colors = struct.unpack_from("<I", payload, 46)[0] or 256
        palette = np.frombuffer(payload, np.uint8, count=n_colors * 4,
                                offset=14 + hdr_size).reshape(n_colors, 4)
        pal = palette.astype(np.uint32)
        pal_gray = ((114 * pal[:, 0] + 587 * pal[:, 1] + 299 * pal[:, 2]
                     + 500) // 1000).astype(np.uint8)
        row_size = (w + 3) & ~3
        rows = np.frombuffer(payload, np.uint8, count=h * row_size,
                             offset=offset).reshape(h, row_size)
        gray = pal_gray[rows[:, :w]]
    else:
        raise ValueError(f"{bpp}-bit BMP unsupported (8/24 only)")
    return gray if top_down else gray[::-1].copy()


# --------------------------------------------------------------------------
# PGM — netpbm P5 binary grayscale
# --------------------------------------------------------------------------

def encode_pgm(img: np.ndarray) -> bytes:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 2:
        raise ValueError(f"encode_pgm wants (h, w) grayscale, got {img.shape}")
    h, w = img.shape
    return b"P5\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_pgm(payload: bytes) -> np.ndarray:
    """Decode binary PGM (maxval <= 255), tolerating comments/whitespace."""
    if payload[:2] != b"P5":
        raise ValueError("not a P5 PGM payload")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PGM unsupported")
    pos += 1  # single whitespace byte after maxval per spec
    return np.frombuffer(payload, np.uint8, count=w * h,
                         offset=pos).reshape(h, w).copy()


# --------------------------------------------------------------------------
# WAV — RIFF PCM16 mono via stdlib wave
# --------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    samples = np.ascontiguousarray(samples, dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode PCM16 WAV to (rate, (n,) int16 mono samples); multi-channel
    input keeps channel 0."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        if f.getsampwidth() != 2:
            raise ValueError(f"{8 * f.getsampwidth()}-bit WAV unsupported")
        rate = f.getframerate()
        nch = f.getnchannels()
        raw = f.readframes(f.getnframes())
    samples = np.frombuffer(raw, np.int16)
    if nch > 1:
        samples = samples[::nch]
    return rate, samples.copy()


# --------------------------------------------------------------------------
# Y4M — YUV4MPEG2 stream (mjpegtools spec): Cmono and C420* supported
# --------------------------------------------------------------------------

def encode_y4m(frames: np.ndarray, fps: str = "25:1",
               colorspace: str = "mono") -> bytes:
    """Encode (n_frames, h, w) uint8 luma as a YUV4MPEG2 stream. ``mono``
    writes Y planes only; ``420`` adds neutral (128) chroma planes."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    if frames.ndim != 3:
        raise ValueError(f"encode_y4m wants (n, h, w), got {frames.shape}")
    n, h, w = frames.shape
    if colorspace == "mono":
        tag, chroma = b"Cmono", b""
    elif colorspace == "420":
        if h % 2 or w % 2:
            raise ValueError("C420 needs even dimensions")
        tag, chroma = b"C420", bytes([128]) * ((h // 2) * (w // 2) * 2)
    else:
        raise ValueError(f"unsupported colorspace {colorspace!r}")
    out = [b"YUV4MPEG2 W%d H%d F%s Ip A1:1 %s\n" % (w, h, fps.encode(), tag)]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(frames[i].tobytes())
        out.append(chroma)
    return b"".join(out)


def _y4m_layout(payload: bytes) -> tuple[int, int, int, int, int]:
    """Parse a Y4M stream header -> (w, h, data_start, frame_stride, n_frames).

    Frames are assumed parameter-free (``FRAME\\n``) and uniform, which is
    what every fixed-format encoder (including ours) emits."""
    nl = payload.index(b"\n")
    w = h = None
    chroma = "420"  # spec default when no C tag present
    for tok in payload[:nl].split(b" ")[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C":
            chroma = tok[1:].decode()
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    if chroma == "mono":
        plane = w * h
    elif chroma.startswith("420"):
        plane = w * h + 2 * ((w // 2) * (h // 2))
    else:
        raise ValueError(f"Y4M colorspace C{chroma} unsupported (mono/420*)")
    start = nl + 1
    stride = 6 + plane  # b"FRAME\n" + planes
    body = len(payload) - start
    if body % stride:
        raise ValueError("Y4M stream has trailing bytes / per-frame params")
    return w, h, start, stride, body // stride


def y4m_frame_count(payload: bytes) -> int:
    return _y4m_layout(payload)[4]


def decode_y4m_frame(payload: bytes, index: int) -> np.ndarray:
    """Zero-copy-ish extraction of one frame's luma plane as (h, w) uint8."""
    w, h, start, stride, n = _y4m_layout(payload)
    if not 0 <= index < n:
        raise IndexError(f"frame {index} out of range ({n} frames)")
    off = start + index * stride
    if payload[off:off + 6] != b"FRAME\n":
        raise ValueError("misaligned Y4M frame marker")
    return np.frombuffer(payload, np.uint8, count=w * h,
                         offset=off + 6).reshape(h, w).copy()


def decode_y4m(payload: bytes) -> np.ndarray:
    """Decode every luma plane -> (n_frames, h, w) uint8."""
    w, h, start, stride, n = _y4m_layout(payload)
    return np.stack([decode_y4m_frame(payload, i) for i in range(n)]) \
        if n else np.empty((0, h, w), np.uint8)
