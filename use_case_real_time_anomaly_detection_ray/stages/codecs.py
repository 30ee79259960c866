"""Pure-numpy/stdlib codecs for uncompressed public media formats.

These are REAL decoders — byte-exact against the published format specs —
implementable without any image/audio library:

- **BMP** (Windows bitmap, BITMAPINFOHEADER): 8-bit palette and 24-bit
  uncompressed, bottom-up or top-down rows, 4-byte row padding.
- **PGM** (netpbm ``P5``): binary grayscale, maxval <= 255.
- **WAV** (RIFF PCM): 16-bit mono via the stdlib :mod:`wave` module.
- **Y4M** (YUV4MPEG2, mjpegtools): ``Cmono`` and ``C420*`` streams; the
  decoder returns the luma (Y) plane per frame.
- **PNG** (RFC 2083 / ISO 15948): 8-bit grayscale, RGB, palette,
  gray+alpha and RGBA, all five scanline filters (None/Sub/Up/Average/
  Paeth), CRC-verified chunks — DEFLATE comes from the stdlib
  :mod:`zlib`, so this is a real compressed-codec path with no external
  library. Adam7 interlacing and 1/2/4/16-bit depths raise.

- **GIF** (GIF87a/89a): variable-width LSB-first LZW with dictionary
  reset, global/local color tables, Adam-style 4-pass interlacing,
  extension-block skipping — a second real compressed codec in pure
  python/numpy (LZW needs no external decompressor at all).
- **JPEG** (ITU-T T.81 baseline sequential DCT): canonical Huffman
  entropy decoding, zigzag dequantization, orthonormal 8x8 IDCT,
  byte-stuffing, restart markers, 8/16-bit DQT, grayscale and
  interleaved color (full-resolution luma); returns the Y plane.
  Progressive/arithmetic/12-bit/hierarchical frames raise ValueError.
- **MP4** (ISO/IEC 14496-12 base media): a real demuxer — box tree walk
  (incl. 64-bit largesize and co64), first ``vide`` track, general
  stsc/stco/stsz sample-table resolution with O(1) frame seek — whose
  Motion-JPEG (``'jpeg'``) samples decode through the JPEG codec above.
  AVC/HEVC sample entries raise ``NotImplementedError`` naming the
  external codec they need.

Remaining compressed formats (MP3/...) genuinely need external
codec libraries that are not in this container; :func:`sniff_format`
classifies them so callers can raise an explicit ``NotImplementedError``
instead of misparsing. Encoders exist for every decoder so tests can pin
round-trips — byte-exact for the lossless codecs (and for JPEG at
quant=1 on per-block-constant images, where every DCT coefficient is
integral), ±1/pixel for general JPEG (coefficient rounding).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

# --------------------------------------------------------------------------
# format sniffing
# --------------------------------------------------------------------------

#: magic -> format name for compressed formats we explicitly do NOT decode
_COMPRESSED_MAGIC = (
    (b"ID3", "mp3"),
    (b"\xff\xfb", "mp3"),
    (b"OggS", "ogg"),
    (b"\x1a\x45\xdf\xa3", "webm/mkv"),
)


def sniff_format(payload: bytes) -> str:
    """Classify a payload by magic bytes.

    Returns one of ``bmp pgm wav y4m png gif jpeg`` (decodable here), a
    compressed-format name (``mp3 mp4 ...`` — NOT decodable here), or
    ``unknown``.
    """
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:4] == b"GIF8":
        return "gif"
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


# --------------------------------------------------------------------------
# PNG — ISO 15948 / RFC 2083; DEFLATE via stdlib zlib, filters in numpy
# --------------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
#: color type -> samples per pixel (bit depth 8 only, so bytes == samples)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Integer Rec.601 luma, identical rounding to decode_bmp so a color image
# encoded as PNG and as BMP reduces to the same grayscale bytes.
def _rgb_to_gray(rgb: np.ndarray) -> np.ndarray:
    r = rgb.astype(np.uint32)
    return ((299 * r[..., 0] + 587 * r[..., 1] + 114 * r[..., 2] + 500)
            // 1000).astype(np.uint8)


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def _paeth_predict(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor over int32 lane arrays (spec §6.6)."""
    p = a + b - c
    pa_, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa_ <= pb) & (pa_ <= pc), a, np.where(pb <= pc, b, c))


def _filter_rows(img2d: np.ndarray, bpp: int, filters) -> tuple[np.ndarray, bytes]:
    """Compute all five filtered variants of every scanline, pick one per row.

    ``img2d`` is (h, stride) uint8 raw scanline bytes. ``filters`` is an int,
    a per-row sequence, or ``"adaptive"`` (minimum sum of absolute signed
    filtered bytes — the classic deterministic heuristic, exercises every
    filter on real data). Returns (chosen filter ids, raw filtered stream).
    """
    h, stride = img2d.shape
    cur = img2d.astype(np.int32)
    prev = np.zeros_like(cur)
    prev[1:] = cur[:-1]
    left = np.zeros_like(cur)
    left[:, bpp:] = cur[:, :-bpp]
    upleft = np.zeros_like(cur)
    upleft[1:, bpp:] = cur[:-1, :-bpp]
    cand = np.empty((5, h, stride), np.uint8)
    cand[0] = img2d
    cand[1] = (cur - left) & 0xFF
    cand[2] = (cur - prev) & 0xFF
    cand[3] = (cur - ((left + prev) >> 1)) & 0xFF
    cand[4] = (cur - _paeth_predict(left, prev, upleft)) & 0xFF
    if isinstance(filters, str):
        if filters != "adaptive":
            raise ValueError(f"unknown filter strategy {filters!r}")
        signed = np.abs(cand.astype(np.int16) - 256 * (cand > 127))
        chosen = np.argmin(signed.sum(axis=2, dtype=np.int64), axis=0)
    else:
        chosen = np.broadcast_to(np.asarray(filters, np.int64), (h,))
        if chosen.min() < 0 or chosen.max() > 4:
            raise ValueError("PNG filter types are 0..4")
    out = np.empty((h, 1 + stride), np.uint8)
    out[:, 0] = chosen
    out[:, 1:] = cand[chosen, np.arange(h)]
    return chosen, out.tobytes()


def encode_png(img: np.ndarray, filters="adaptive", level: int = 6) -> bytes:
    """Encode (h, w) uint8 grayscale (color type 0) or (h, w, 3) uint8 RGB
    (color type 2) as a non-interlaced 8-bit PNG. ``filters`` picks the
    per-scanline filter: an int (0..4), a per-row sequence, or
    ``"adaptive"`` (deterministic min-abs-sum heuristic)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color_type, bpp = 0, 1
        h, w = img.shape
        raw = img
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, bpp = 2, 3
        h, w = img.shape[:2]
        raw = img.reshape(h, w * 3)
    else:
        raise ValueError(f"encode_png wants (h,w) gray or (h,w,3) RGB, "
                         f"got {img.shape}")
    _, filtered = _filter_rows(raw, bpp, filters)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (_PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(filtered, level))
            + _png_chunk(b"IEND", b""))


def _png_unfilter(filtered: np.ndarray, bpp: int) -> np.ndarray:
    """Reverse the scanline filters: (h, 1+stride) -> (h, stride) uint8.

    None/Sub/Up are fully vectorized (Sub is a per-lane cumsum mod 256);
    Average/Paeth are sequential per pixel-column with vectorized lanes —
    O(w) Python steps per such row, bounded by the small per-asset images
    this stage is built for."""
    h = filtered.shape[0]
    stride = filtered.shape[1] - 1
    w = stride // bpp
    recon = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        ftype = int(filtered[y, 0])
        row = filtered[y, 1:]
        if ftype == 0:
            cur = row.copy()
        elif ftype == 1:   # Sub: recon[x] = filt[x] + recon[x-bpp]
            cur = (row.reshape(w, bpp).astype(np.uint32).cumsum(axis=0)
                   & 0xFF).astype(np.uint8).reshape(stride)
        elif ftype == 2:   # Up (uint8 addition wraps mod 256)
            cur = row + prev
        elif ftype == 3:   # Average
            rowm = row.reshape(w, bpp).astype(np.int32)
            prevm = prev.reshape(w, bpp).astype(np.int32)
            out = np.empty((w, bpp), np.int32)
            lane = np.zeros(bpp, np.int32)
            for x in range(w):
                lane = (rowm[x] + ((lane + prevm[x]) >> 1)) & 0xFF
                out[x] = lane
            cur = out.astype(np.uint8).reshape(stride)
        elif ftype == 4:   # Paeth
            rowm = row.reshape(w, bpp).astype(np.int32)
            prevm = prev.reshape(w, bpp).astype(np.int32)
            out = np.empty((w, bpp), np.int32)
            lane = np.zeros(bpp, np.int32)
            ul = np.zeros(bpp, np.int32)
            for x in range(w):
                lane = (rowm[x] + _paeth_predict(lane, prevm[x], ul)) & 0xFF
                ul = prevm[x]
                out[x] = lane
            cur = out.astype(np.uint8).reshape(stride)
        else:
            raise ValueError(f"PNG filter type {ftype} invalid")
        recon[y] = cur
        prev = cur
    return recon


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to (h, w) uint8 grayscale.

    Color types 0/2/3/4/6 all supported; RGB(A) and palette entries reduce
    via the same integer Rec.601 luma as :func:`decode_bmp` (alpha is
    ignored — feature extraction wants the raw intensity). Every chunk's
    CRC is verified. 1/2/4/16-bit depths and Adam7 interlacing raise."""
    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = color_type = None
    palette = None
    idat: list[bytes] = []
    while pos + 12 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        if pos + 12 + length > len(payload):
            raise ValueError("PNG stream truncated mid-chunk")
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype.decode('latin1')} CRC mismatch")
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, depth, color_type, comp, fmethod, interlace = \
                struct.unpack(">IIBBBBB", data)
            if comp or fmethod:
                raise ValueError("nonstandard PNG compression/filter method")
            if interlace:
                raise ValueError("Adam7 interlaced PNG unsupported")
            if depth != 8:
                raise ValueError(f"{depth}-bit PNG unsupported (8 only)")
            if color_type not in _PNG_CHANNELS:
                raise ValueError(f"PNG color type {color_type} invalid")
        elif ctype == b"PLTE":
            if length % 3:
                raise ValueError("PLTE length not a multiple of 3")
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    bpp = _PNG_CHANNELS[color_type]
    if not idat:
        raise ValueError("PNG stream has no IDAT data")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"PNG DEFLATE stream corrupt: {e}") from e
    stride = width * bpp
    if len(raw) != height * (stride + 1):
        raise ValueError(
            f"PNG pixel stream is {len(raw)} bytes, "
            f"want {height * (stride + 1)}"
        )
    filtered = np.frombuffer(raw, np.uint8).reshape(height, stride + 1)
    recon = _png_unfilter(filtered, bpp)
    if color_type == 0:
        return recon.copy()
    if color_type == 2:
        return _rgb_to_gray(recon.reshape(height, width, 3))
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        if recon.size and int(recon.max()) >= len(palette):
            # uniform malformed-payload contract: ValueError, not a bare
            # IndexError from the fancy index (ADVICE r4)
            raise ValueError("palette index out of range")
        return _rgb_to_gray(palette)[recon]  # luma on ≤256 entries, not h×w
    if color_type == 4:   # gray + alpha: keep the gray sample
        return recon.reshape(height, width, 2)[..., 0].copy()
    return _rgb_to_gray(recon.reshape(height, width, 4)[..., :3])


# --------------------------------------------------------------------------
# GIF — GIF87a/89a; variable-width LSB-first LZW (Welch 1984), pure python
# --------------------------------------------------------------------------

_GIF_MAX_CODE = 4096  # 12-bit ceiling per spec


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-flavor LZW: variable code width, LSB-first bit packing, CLEAR
    emitted up front and on dictionary overflow, EOI at the end."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prev = -1
    for px in indices.tolist():
        if prev < 0:
            prev = px
            continue
        key = (prev, px)
        code = table.get(key)
        if code is not None:
            prev = code
            continue
        emit(prev, width)
        table[key] = next_code
        next_code += 1
        if next_code > (1 << width):
            width += 1
        if next_code >= _GIF_MAX_CODE:
            emit(clear, width)
            table.clear()
            next_code = eoi + 1
            width = min_code_size + 1
        prev = px
    if prev >= 0:
        emit(prev, width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> np.ndarray:
    """Inverse of :func:`_lzw_encode`; stops after ``expected`` pixels or
    EOI. Prefix-linked dictionary with stack unwinding — O(pixels) total."""
    clear = 1 << min_code_size
    eoi = clear + 1
    prefix = [0] * _GIF_MAX_CODE
    suffix = [0] * _GIF_MAX_CODE
    first = [0] * _GIF_MAX_CODE  # first pixel of each code's expansion
    for c in range(clear):
        suffix[c] = first[c] = c
    out = np.empty(expected, np.uint8)
    n_out = 0
    width = min_code_size + 1
    next_code = eoi + 1
    acc = 0
    nbits = 0
    pos = 0
    prev = -1
    stack: list[int] = []
    while n_out < expected:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            width = min_code_size + 1
            next_code = eoi + 1
            prev = -1
            continue
        if code == eoi:
            break
        if prev < 0:
            if code >= clear:
                raise ValueError("GIF LZW: first code after CLEAR not literal")
            out[n_out] = code
            n_out += 1
            prev = code
            continue
        if code < next_code:
            cur = code
        elif code == next_code:
            cur = prev           # the KwKwK special case
            stack.append(first[prev])
        else:
            raise ValueError("GIF LZW: code beyond dictionary")
        while cur >= clear:
            stack.append(suffix[cur])
            cur = prefix[cur]
        stack.append(cur)
        fst = cur
        take = min(len(stack), expected - n_out)
        for i in range(take):
            out[n_out + i] = stack[-1 - i]
        n_out += take
        stack.clear()
        if next_code < _GIF_MAX_CODE:
            prefix[next_code] = prev
            suffix[next_code] = fst
            first[next_code] = fst
            next_code += 1
            if next_code >= (1 << width) and width < 12:
                width += 1
        prev = code
    if n_out != expected:
        raise ValueError(f"GIF LZW produced {n_out} pixels, want {expected}")
    return out


def encode_gif(img: np.ndarray, interlace: bool = False) -> bytes:
    """Encode (h, w) uint8 grayscale as GIF87a with a 256-entry grayscale
    global color table (identity palette, so decode is byte-exact)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 2:
        raise ValueError(f"encode_gif wants (h, w) grayscale, got {img.shape}")
    h, w = img.shape
    pal = np.repeat(np.arange(256, dtype=np.uint8), 3)
    rows = _gif_interlace_order(h) if interlace else np.arange(h)
    lzw = _lzw_encode(img[rows].ravel(), 8)
    parts = [
        b"GIF87a",
        struct.pack("<HHBBB", w, h, 0xF7, 0, 0),  # global table, 256 entries
        pal.tobytes(),
        struct.pack("<BHHHHB", 0x2C, 0, 0, w, h,
                    0x40 if interlace else 0x00),
        bytes([8]),  # LZW min code size
    ]
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        parts.append(bytes([len(chunk)]) + chunk)
    parts.append(b"\x00;")  # block terminator + trailer
    return b"".join(parts)


def _gif_interlace_order(h: int) -> np.ndarray:
    """Row storage order for the four GIF interlace passes."""
    return np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                           np.arange(2, h, 4), np.arange(1, h, 2)])


def decode_gif(payload: bytes) -> np.ndarray:
    """Decode the first image of a GIF87a/89a stream to (h, w) uint8
    grayscale (palette entries reduce via the shared integer Rec.601 luma).
    Handles global/local color tables, interlacing, and skips extension
    blocks (89a graphic-control/comment/application)."""
    if payload[:4] != b"GIF8" or payload[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("GIF stream truncated in screen descriptor")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    global_pal = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_pal = np.frombuffer(payload, np.uint8, count=n * 3,
                                   offset=pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while pos < len(payload) and payload[pos]:
                pos += 1 + payload[pos]
            if pos >= len(payload):
                raise ValueError("GIF stream truncated in extension blocks")
            pos += 1
        elif block == 0x2C:  # image descriptor
            if pos + 9 > len(payload):
                raise ValueError("GIF stream truncated in image descriptor")
            _l, _t, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos)
            pos += 9
            pal = global_pal
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                pal = np.frombuffer(payload, np.uint8, count=n * 3,
                                    offset=pos).reshape(n, 3)
                pos += n * 3
            if pal is None:
                raise ValueError("GIF image has no color table")
            if pos >= len(payload):
                raise ValueError("GIF stream truncated before image data")
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while pos < len(payload) and payload[pos]:
                ln = payload[pos]
                data += payload[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            if pos >= len(payload):
                raise ValueError("GIF stream truncated in image data blocks")
            pos += 1
            idx = _lzw_decode(bytes(data), min_code, w * h).reshape(h, w)
            if iflags & 0x40:
                rows = np.empty(h, np.int64)
                rows[_gif_interlace_order(h)] = np.arange(h)
                idx = idx[rows]
            if idx.size and int(idx.max()) >= len(pal):
                raise ValueError("color table index out of range")
            return _rgb_to_gray(pal)[idx]
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF stream contains no image")


# --------------------------------------------------------------------------
# JPEG — ITU-T T.81 baseline sequential DCT (SOF0), pure numpy + stdlib
# --------------------------------------------------------------------------
#
# A third REAL compressed codec: canonical Huffman entropy coding, zigzag
# dequantization, 8x8 type-II/III DCT via an orthonormal basis matrix,
# byte-stuffing and restart-marker handling. The decoder returns the LUMA
# plane — JPEG's Y channel IS the Rec.601 luma every other decoder here
# reduces to — decoding every component's entropy data (the interleaved
# bitstream cannot be skipped) but running the IDCT only on Y blocks.
# Progressive (SOF2), arithmetic-coded, hierarchical and 12-bit frames
# raise ValueError naming the feature. The encoder produces baseline
# grayscale or 4:4:4 YCbCr JPEGs with the Annex K "typical" Huffman tables,
# so decode(encode(img)) round-trips: exactly for per-block-constant images
# at quant=1 (DC is integral, every AC is zero), within ±1/pixel otherwise
# (DCT-coefficient rounding) — pinned by tests, alongside an independent
# O(N^4) direct-sum IDCT oracle.

#: zigzag scan position -> natural (row-major) coefficient index (T.81 fig 5)
_JPEG_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], np.int64)

#: orthonormal 8-point DCT-II basis: A[u,x] = c(u) cos((2x+1)uπ/16);
#: FDCT F = A f Aᵀ, IDCT f = Aᵀ F A
_JPEG_A = np.array([
    [(np.sqrt(1 / 8) if u == 0 else 0.5) * np.cos((2 * x + 1) * u * np.pi / 16)
     for x in range(8)] for u in range(8)
])

# Annex K.3 "typical" Huffman tables: (BITS counts for lengths 1..16, values)
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
])
_AC_CHR = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
])


def _huff_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: value -> (code, length) (T.81 C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffDecoder:
    """T.81 F.2.2.3 DECODE: mincode/maxcode/valptr per code length."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        if sum(bits) != len(vals):
            raise ValueError("DHT counts do not match value list length")
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code, k = 0, 0
        for length in range(1, 17):
            n = bits[length - 1]
            if n:
                self.valptr[length] = k
                self.mincode[length] = code
                code += n
                k += n
                self.maxcode[length] = code - 1
            code <<= 1

    def decode(self, br: "_BitReader") -> int:
        code = br.bit()
        length = 1
        while code > self.maxcode[length]:
            length += 1
            if length > 16:
                raise ValueError("invalid JPEG Huffman code")
            code = (code << 1) | br.bit()
        return self.vals[self.valptr[length] + code - self.mincode[length]]


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing;
    restart markers are consumed explicitly via :meth:`restart`."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        self.cur = 0
        self.nbits = 0

    def _next_byte(self) -> int:
        buf, p = self.buf, self.pos
        if p >= len(buf):
            raise ValueError("JPEG entropy stream truncated")
        b = buf[p]
        self.pos = p + 1
        if b == 0xFF:
            if self.pos >= len(buf):
                raise ValueError("JPEG entropy stream truncated after 0xFF")
            if buf[self.pos] != 0x00:
                raise ValueError(
                    f"marker 0xFF{buf[self.pos]:02X} inside entropy segment")
            self.pos += 1
        return b

    def bit(self) -> int:
        if self.nbits == 0:
            self.cur = self._next_byte()
            self.nbits = 8
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self, expected: int) -> None:
        """Byte-align and consume the RSTn marker between restart intervals."""
        self.nbits = 0
        buf = self.buf
        if self.pos + 1 >= len(buf):
            raise ValueError("JPEG truncated at restart marker")
        if buf[self.pos] != 0xFF or buf[self.pos + 1] != 0xD0 + expected:
            raise ValueError("missing or out-of-order JPEG restart marker")
        self.pos += 2


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map an s-bit magnitude code to its signed value."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline sequential DCT JPEG to its (h, w) uint8 LUMA plane
    (JPEG's Y channel is Rec.601 luma). Raises ``ValueError`` for malformed
    streams and for honest unsupported-feature gates (progressive,
    arithmetic coding, 12-bit, hierarchical)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _HuffDecoder] = {}
    ac_tabs: dict[int, _HuffDecoder] = {}
    frame = None
    restart_interval = 0
    scan = None
    while scan is None:
        if pos + 1 >= len(payload):
            raise ValueError("JPEG truncated before SOS")
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker, got 0x{payload[pos]:02X}")
        while pos < len(payload) and payload[pos] == 0xFF:
            pos += 1  # fill bytes
        if pos >= len(payload):
            raise ValueError("JPEG truncated in marker")
        m = payload[pos]
        pos += 1
        if m in (0x01,) or 0xD0 <= m <= 0xD7:
            continue  # standalone markers
        if m == 0xD9:
            raise ValueError("JPEG ended (EOI) before any scan")
        if pos + 2 > len(payload):
            raise ValueError("JPEG truncated in segment length")
        ln = struct.unpack(">H", payload[pos:pos + 2])[0]
        seg = payload[pos + 2:pos + ln]
        if len(seg) != ln - 2:
            raise ValueError("JPEG segment extends past end of stream")
        pos += ln
        if m == 0xDB:  # DQT: tables stored in ZIGZAG order, 8- or 16-bit
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq not in (0, 1):
                    raise ValueError(f"bad DQT precision {pq}")
                n = 64 * (pq + 1)
                raw = np.frombuffer(seg, np.uint8, 64, i) if pq == 0 else \
                    np.frombuffer(seg, ">u2", 64, i)
                q = np.zeros(64, np.int64)
                q[_JPEG_ZIGZAG] = raw
                qts[tq] = q
                i += n
        elif m == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1:i + 17])
                if len(bits) < 16:
                    raise ValueError("truncated DHT segment (BITS list cut)")
                nv = sum(bits)
                vals = list(seg[i + 17:i + 17 + nv])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _HuffDecoder(bits, vals)
                i += 17 + nv
        elif m == 0xC0:  # SOF0 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError(f"{prec}-bit JPEG not supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif m == 0xC2:
            raise ValueError("progressive JPEG (SOF2) not supported")
        elif m in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise ValueError(f"JPEG frame type 0xC{m & 0xF:X} not supported "
                             "(only baseline SOF0)")
        elif m == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif m == 0xDA:  # SOS
            ns = seg[0]
            sel = []
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                sel.append((cid, tt >> 4, tt & 0x0F))
            scan = sel
        # APPn / COM / anything else with a length: skipped

    if frame is None:
        raise ValueError("JPEG has no SOF0 frame header")
    h, w, comps = frame
    if h == 0 or w == 0:
        raise ValueError("JPEG frame has zero dimension")
    by_id = {cid: (hs, vs, tq) for cid, hs, vs, tq in comps}
    order = []
    for cid, td, ta in scan:
        if cid not in by_id:
            raise ValueError(f"SOS references unknown component {cid}")
        hs, vs, tq = by_id[cid]
        if tq not in qts:
            raise ValueError(f"missing quantization table {tq}")
        if td not in dc_tabs or ta not in ac_tabs:
            raise ValueError("missing Huffman table referenced by SOS")
        order.append((cid, hs, vs, qts[tq], dc_tabs[td], ac_tabs[ta]))

    y_cid = comps[0][0]  # first frame component is Y (single-comp: the image)
    hmax = max(hs for _, hs, _, _, _, _ in order)
    vmax = max(vs for _, _, vs, _, _, _ in order)
    interleaved = len(order) > 1
    if interleaved:
        yh, yv = by_id[y_cid][0], by_id[y_cid][1]
        if (yh, yv) != (hmax, vmax):
            raise ValueError("subsampled luma not supported (Y must be "
                             "full-resolution)")
        mcus_x = -(-w // (8 * hmax))
        mcus_y = -(-h // (8 * vmax))
        blocks_per_mcu = [(hs, vs) for _, hs, vs, _, _, _ in order]
        yw_blocks, yh_blocks = mcus_x * hmax, mcus_y * vmax
    else:
        mcus_x = -(-w // 8)
        mcus_y = -(-h // 8)
        blocks_per_mcu = [(1, 1)]
        yw_blocks, yh_blocks = mcus_x, mcus_y

    br = _BitReader(payload, pos)
    preds = {cid: 0 for cid, *_ in order}
    y_coefs = np.zeros((yh_blocks * yw_blocks, 8, 8))
    zz = _JPEG_ZIGZAG
    n_mcus = mcus_x * mcus_y
    rst = 0
    for mi in range(n_mcus):
        if restart_interval and mi and mi % restart_interval == 0:
            br.restart(rst)
            rst = (rst + 1) & 7
            preds = {cid: 0 for cid in preds}
        my, mx = divmod(mi, mcus_x)
        for (cid, hs, vs, q, dct, act), (bh, bv) in zip(order, blocks_per_mcu):
            for b in range(bh * bv):
                coef = np.zeros(64, np.int64)
                s = dct.decode(br)
                diff = _extend(br.receive(s), s)
                preds[cid] += diff
                coef[0] = preds[cid]
                k = 1
                while k < 64:
                    rs = act.decode(br)
                    r, size = rs >> 4, rs & 0x0F
                    if size == 0:
                        if rs == 0xF0:  # ZRL: sixteen zeros
                            k += 16
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("JPEG AC run past end of block")
                    coef[zz[k]] = _extend(br.receive(size), size)
                    k += 1
                if cid == y_cid:
                    bby, bbx = divmod(b, bh)
                    yb = (my * (bv if interleaved else 1) + bby) * yw_blocks \
                        + mx * (bh if interleaved else 1) + bbx
                    y_coefs[yb] = (coef * q).reshape(8, 8)

    # batch IDCT over every Y block: f = Aᵀ F A
    A = _JPEG_A
    px = np.einsum("ux,nuv,vy->nxy", A, y_coefs, A) + 128.0
    px = np.clip(np.floor(px + 0.5), 0, 255).astype(np.uint8)
    plane = (px.reshape(yh_blocks, yw_blocks, 8, 8)
             .transpose(0, 2, 1, 3)
             .reshape(yh_blocks * 8, yw_blocks * 8))
    return plane[:h, :w].copy()


class _BitWriter:
    """MSB-first bit writer with JPEG 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad final byte with 1s

    def marker(self, m: int) -> None:
        """Byte-align and emit a marker (restart) — markers are never
        byte-stuffed."""
        self.flush()
        self.out += bytes([0xFF, m])


def _encode_blocks(plane: np.ndarray, q: np.ndarray, bw: _BitWriter,
                   dc_codes: dict, ac_codes: dict, pred: int) -> int:
    """FDCT + quantize + entropy-code every 8x8 block of one component
    plane (already padded to multiples of 8), row-major. Returns the final
    DC predictor."""
    Fi = _fdct_quant(plane, q)
    for n in range(len(Fi)):
        pred = _code_block(Fi[n], bw, dc_codes, ac_codes, pred)
    return pred


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """FDCT + quantize EVERY 8x8 block of a plane in one vectorized pass →
    (n_blocks, 64) int64 coefficients in raster block order."""
    hb, wb = plane.shape[0] // 8, plane.shape[1] // 8
    f = plane.reshape(hb, 8, wb, 8).transpose(0, 2, 1, 3).astype(np.float64)
    f -= 128.0
    A = _JPEG_A
    F = np.einsum("xu,nmxy,yv->nmuv", A.T, f, A.T)  # F = A f Aᵀ
    Fq = F.reshape(hb * wb, 64) / q
    return np.where(Fq >= 0, np.floor(Fq + 0.5),
                    np.ceil(Fq - 0.5)).astype(np.int64)


def _code_block(coef: np.ndarray, bw: _BitWriter, dc_codes, ac_codes,
                pred: int) -> int:
    """Entropy-code one block's 64 quantized coefficients; returns the new
    DC predictor."""
    zz = _JPEG_ZIGZAG
    diff = int(coef[0]) - pred
    pred = int(coef[0])
    s = abs(diff).bit_length()
    mag = diff if diff >= 0 else diff + (1 << s) - 1
    code, ln = dc_codes[s]
    bw.write(code, ln)
    if s:
        bw.write(mag, s)
    run = 0
    zzc = coef[zz]
    nz = np.flatnonzero(zzc[1:]) + 1
    last = nz[-1] if len(nz) else 0
    k = 1
    while k <= last:
        v = int(zzc[k])
        if v == 0:
            run += 1
            k += 1
            continue
        while run >= 16:
            code, ln = ac_codes[0xF0]
            bw.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        mag = v if v >= 0 else v + (1 << s) - 1
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(mag, s)
        run = 0
        k += 1
    if last < 63:
        code, ln = ac_codes[0x00]
        bw.write(code, ln)
    return pred


def _pad8(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, (-h) % 8), (0, (-w) % 8)), mode="edge")


def encode_jpeg(img: np.ndarray, quant: "np.ndarray | int" = 1,
                restart_interval: int = 0) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 as a baseline
    sequential JPEG (grayscale single-component or 4:4:4 YCbCr, Annex K
    typical Huffman tables). ``quant`` is a scalar or 64-entry/(8, 8)
    quantization table used for every component; the default all-ones
    table makes ``decode_jpeg(encode_jpeg(x))`` exact for per-block-
    constant images and within ±1/pixel generally. ``restart_interval``
    > 0 emits DRI + RSTn markers every that many MCUs."""
    if img.ndim == 2:
        planes = [img]
    elif img.ndim == 3 and img.shape[2] == 3:
        r, g, b = (img[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [np.clip(np.floor(p + 0.5), 0, 255) for p in (y, cb, cr)]
    else:
        raise ValueError(f"encode_jpeg wants (h,w) gray or (h,w,3) RGB, "
                         f"got {img.shape}")
    h, w = img.shape[:2]
    if h == 0 or w == 0 or h > 0xFFFF or w > 0xFFFF:
        raise ValueError(f"encode_jpeg dimensions out of range: {img.shape}")
    q = np.asarray(quant, np.int64)
    if q.ndim == 0:
        q = np.full(64, int(q), np.int64)
    q = q.reshape(64)
    if (q < 1).any() or (q > 0xFFFF).any():
        raise ValueError("quantization entries must be in [1, 65535]")

    out = bytearray(b"\xff\xd8")  # SOI
    pq = 1 if (q > 255).any() else 0
    zzq = q[_JPEG_ZIGZAG]  # DQT stores zigzag order
    body = bytes([(pq << 4) | 0]) + (
        zzq.astype(">u2").tobytes() if pq else zzq.astype(np.uint8).tobytes())
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body
    nc = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for c in range(nc):
        sof += bytes([c + 1, 0x11, 0])  # h=v=1 (4:4:4), quant table 0
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    tabs = [(0x00, *_DC_LUM), (0x10, *_AC_LUM)]
    if nc == 3:
        tabs += [(0x01, *_DC_CHR), (0x11, *_AC_CHR)]
    for tid, bits, vals in tabs:
        body = bytes([tid]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += b"\x00\x3f\x00"  # Ss/Se/AhAl for sequential
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    bw = _BitWriter()
    dc_l, ac_l = _huff_encode_table(*_DC_LUM), _huff_encode_table(*_AC_LUM)
    dc_c, ac_c = _huff_encode_table(*_DC_CHR), _huff_encode_table(*_AC_CHR)
    if nc == 1 and not restart_interval:
        _encode_blocks(_pad8(planes[0]), q, bw, dc_l, ac_l, 0)
    else:
        # MCU-by-MCU (interleaved 4:4:4 = one block of each component per
        # MCU) so predictors, block order and restart boundaries match the
        # decoder's scan
        padded = [_pad8(p) for p in planes]
        hb, wb = padded[0].shape[0] // 8, padded[0].shape[1] // 8
        # FDCT+quantize each whole component once (one vectorized pass per
        # plane, like the grayscale path); the MCU walk below only does
        # entropy coding over the precomputed coefficient rows
        coefs = [_fdct_quant(p, q) for p in padded]
        preds = [0] * nc
        codes = ([(dc_l, ac_l)] + [(dc_c, ac_c)] * 2)[:nc]
        rst = 0
        mi = 0
        for by in range(hb):
            for bx in range(wb):
                if restart_interval and mi and mi % restart_interval == 0:
                    bw.marker(0xD0 + rst)
                    rst = (rst + 1) & 7
                    preds = [0] * nc
                mi += 1
                for c in range(nc):
                    preds[c] = _code_block(coefs[c][by * wb + bx], bw,
                                           *codes[c], preds[c])
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# MP4 — ISO/IEC 14496-12 base media file format; Motion-JPEG ('jpeg')
# sample entries decode through decode_jpeg, so the whole video path is
# pure numpy + stdlib. AVC/HEVC sample entries name the codec they need.
# --------------------------------------------------------------------------

def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _fullbox(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(btype, bytes([version]) + flags.to_bytes(3, "big") + payload)


_MP4_MATRIX = struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
                          0x40000000)


def encode_mp4(frames: np.ndarray, fps: int = 25,
               quant: "np.ndarray | int" = 1) -> bytes:
    """Encode (n_frames, h, w) uint8 luma as an ISO BMFF (MP4) file with a
    single Motion-JPEG video track: each sample is a baseline JPEG from
    :func:`encode_jpeg`. Layout is ftyp + moov + mdat with one chunk, one
    sample per frame (stts/stsc/stsz/stco fully populated), so any
    demuxer — including :func:`decode_mp4` — can seek frames in O(1)."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    if frames.ndim != 3:
        raise ValueError(f"encode_mp4 wants (n, h, w), got {frames.shape}")
    n, h, w = frames.shape
    if n == 0:
        raise ValueError("encode_mp4 needs at least one frame")
    samples = [encode_jpeg(frames[i], quant=quant) for i in range(n)]
    sizes = [len(s) for s in samples]

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200)
                + b"isom" + b"iso2" + b"mp41")

    entry_body = (
        b"\x00" * 6 + struct.pack(">H", 1)          # reserved, data_ref_idx
        + b"\x00" * 16                               # pre_defined/reserved
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4 + struct.pack(">H", 1)         # reserved, frame_count
        + bytes([10]) + b"Motion-JPEG".ljust(31, b"\x00")[:31]
        + struct.pack(">Hh", 0x0018, -1)             # depth, pre_defined
    )
    stsd = _fullbox(b"stsd", 0, 0, struct.pack(">I", 1)
                    + _box(b"jpeg", entry_body))
    stts = _fullbox(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = _fullbox(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _fullbox(b"stsz", 0, 0, struct.pack(">II", 0, n)
                    + struct.pack(">%dI" % n, *sizes))
    stco = _fullbox(b"stco", 0, 0, struct.pack(">II", 1, 0))  # patched below

    def build_moov(chunk_off: int) -> bytes:
        stco_p = _fullbox(b"stco", 0, 0, struct.pack(">II", 1, chunk_off))
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco_p)
        url = _fullbox(b"url ", 0, 1, b"")
        dref = _fullbox(b"dref", 0, 0, struct.pack(">I", 1) + url)
        dinf = _box(b"dinf", dref)
        vmhd = _fullbox(b"vmhd", 0, 1, b"\x00" * 8)
        minf = _box(b"minf", vmhd + dinf + stbl)
        hdlr = _fullbox(b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12
                        + b"VideoHandler\x00")
        mdhd = _fullbox(b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, fps, n,
                                                   0x55C4, 0))
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        tkhd = _fullbox(b"tkhd", 0, 7, struct.pack(">IIII", 0, 0, 1, 0)
                        + struct.pack(">I", n) + b"\x00" * 8
                        + struct.pack(">HHHH", 0, 0, 0, 0) + _MP4_MATRIX
                        + struct.pack(">II", w << 16, h << 16))
        trak = _box(b"trak", tkhd + mdia)
        mvhd = _fullbox(b"mvhd", 0, 0, struct.pack(">IIII", 0, 0, fps, n)
                        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
                        + b"\x00" * 8 + _MP4_MATRIX + b"\x00" * 24
                        + struct.pack(">I", 2))
        return _box(b"moov", mvhd + trak)

    moov_len = len(build_moov(0))            # stco field is fixed-width
    chunk_off = len(ftyp) + moov_len + 8     # + mdat header
    moov = build_moov(chunk_off)
    assert len(moov) == moov_len
    mdat = _box(b"mdat", b"".join(samples))
    return ftyp + moov + mdat


def _mp4_boxes(buf: bytes, start: int, end: int):
    """Iterate (type, body_start, body_end) over the boxes in [start, end);
    handles 64-bit largesize and size==0 (to-end) per ISO 14496-12 §4.2."""
    off = start
    while off < end:
        if off + 8 > end:
            raise ValueError("mp4: truncated box header")
        size = struct.unpack_from(">I", buf, off)[0]
        btype = bytes(buf[off + 4:off + 8])
        hdr = 8
        if size == 1:
            if off + 16 > end:
                raise ValueError("mp4: truncated largesize box")
            size = struct.unpack_from(">Q", buf, off + 8)[0]
            hdr = 16
        elif size == 0:
            size = end - off
        if size < hdr or off + size > end:
            raise ValueError("mp4: box size out of range")
        yield btype, off + hdr, off + size
        off += size


def _mp4_child_opt(buf: bytes, start: int, end: int, btype: bytes):
    for t, s, e in _mp4_boxes(buf, start, end):
        if t == btype:
            return s, e
    return None


def _mp4_child(buf: bytes, start: int, end: int, btype: bytes):
    found = _mp4_child_opt(buf, start, end, btype)
    if found is None:
        raise ValueError(f"mp4: missing {btype.decode()} box")
    return found


def _mp4_sample_table(payload: bytes):
    """Demux the first video track -> (codec, width, height, offsets, sizes).

    Walks moov→trak→mdia (hdlr 'vide')→minf→stbl and resolves every
    sample's absolute file offset from stsc (chunk runs) + stco/co64
    (chunk offsets) + stsz (sizes) — the general mapping, fully
    vectorized, not just the one-chunk layout our encoder writes."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("mp4: not an ISO BMFF payload")
    moov = _mp4_child(payload, 0, len(payload), b"moov")
    stbl = None
    codec = wh = None
    for t, s, e in _mp4_boxes(payload, *moov):
        if t != b"trak":
            continue
        mdia = _mp4_child(payload, s, e, b"mdia")
        hs, he = _mp4_child(payload, *mdia, b"hdlr")
        if payload[hs + 8:hs + 12] != b"vide":
            continue
        minf = _mp4_child(payload, *mdia, b"minf")
        stbl = _mp4_child(payload, *minf, b"stbl")
        break
    if stbl is None:
        raise ValueError("mp4: no video track")
    ss, se = _mp4_child(payload, *stbl, b"stsd")
    if se - ss < 16:
        raise ValueError("mp4: truncated stsd")
    entry_s = ss + 8                       # fullbox header + entry_count
    codec = bytes(payload[entry_s + 4:entry_s + 8])
    wh = struct.unpack_from(">HH", payload, entry_s + 8 + 24)
    if codec != b"jpeg":
        raise NotImplementedError(
            f"mp4: sample entry {codec.decode(errors='replace')!r} needs an "
            "external codec (e.g. avc1/hvc1 -> libavcodec); this demuxer "
            "decodes Motion-JPEG ('jpeg') tracks"
        )
    zs, ze = _mp4_child(payload, *stbl, b"stsz")
    fixed, n = struct.unpack_from(">II", payload, zs + 4)
    if fixed:
        sizes = np.full(n, fixed, np.int64)
    else:
        if ze - zs - 12 < 4 * n:
            raise ValueError("mp4: stsz shorter than sample_count")
        sizes = np.frombuffer(payload, ">u4", count=n,
                              offset=zs + 12).astype(np.int64)
    # probe for stco FIRST so a present-but-truncated stco surfaces as its
    # own error instead of being masked as "missing co64"
    stco = _mp4_child_opt(payload, *stbl, b"stco")
    if stco is not None:
        cs, ce = stco
        n_chunks = struct.unpack_from(">I", payload, cs + 4)[0]
        if ce - cs - 8 < 4 * n_chunks:
            raise ValueError("mp4: stco shorter than entry_count")
        chunk_offs = np.frombuffer(payload, ">u4", count=n_chunks,
                                   offset=cs + 8).astype(np.int64)
    else:
        cs, ce = _mp4_child(payload, *stbl, b"co64")
        n_chunks = struct.unpack_from(">I", payload, cs + 4)[0]
        if ce - cs - 8 < 8 * n_chunks:
            raise ValueError("mp4: co64 shorter than entry_count")
        chunk_offs = np.frombuffer(payload, ">u8", count=n_chunks,
                                   offset=cs + 8).astype(np.int64)
    ts, te = _mp4_child(payload, *stbl, b"stsc")
    n_runs = struct.unpack_from(">I", payload, ts + 4)[0]
    if te - ts - 8 < 12 * n_runs:
        raise ValueError("mp4: stsc shorter than entry_count")
    runs = np.frombuffer(payload, ">u4", count=3 * n_runs,
                         offset=ts + 8).astype(np.int64).reshape(n_runs, 3)
    # expand stsc runs -> samples-per-chunk for every chunk
    firsts = runs[:, 0]
    if n_runs == 0 or firsts[0] != 1 or np.any(np.diff(firsts) <= 0):
        raise ValueError("mp4: malformed stsc chunk runs")
    run_len = np.diff(np.append(firsts, n_chunks + 1))
    spc = np.repeat(runs[:, 1], run_len)            # per chunk
    if spc.sum() != n:
        raise ValueError(
            f"mp4: stsc maps {int(spc.sum())} samples over {n_chunks} "
            f"chunks but stsz declares {n}")
    sample_chunk = np.repeat(np.arange(n_chunks), spc)
    csum = np.concatenate(([0], np.cumsum(sizes[:-1])))
    chunk_first = np.concatenate(([0], np.cumsum(spc[:-1])))
    offsets = chunk_offs[sample_chunk] + csum - csum[chunk_first][sample_chunk]
    if np.any(offsets < 0) or np.any(offsets + sizes > len(payload)):
        raise ValueError("mp4: sample extents fall outside the file")
    return codec, int(wh[0]), int(wh[1]), offsets, sizes


def mp4_frame_count(payload: bytes) -> int:
    return len(_mp4_sample_table(payload)[3])


def decode_mp4_frame(payload: bytes, index: int) -> np.ndarray:
    """O(1)-seek decode of one frame's luma via the sample table."""
    _, _, _, offs, sizes = _mp4_sample_table(payload)
    if not 0 <= index < len(offs):
        raise IndexError(f"frame {index} out of range ({len(offs)} frames)")
    o, s = int(offs[index]), int(sizes[index])
    return decode_jpeg(bytes(payload[o:o + s]))


def decode_mp4(payload: bytes) -> np.ndarray:
    """Decode every Motion-JPEG sample -> (n_frames, h, w) uint8 luma."""
    _, _, _, offs, sizes = _mp4_sample_table(payload)
    return np.stack([decode_jpeg(bytes(payload[int(o):int(o) + int(s)]))
                     for o, s in zip(offs, sizes)])
