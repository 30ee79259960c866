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

Remaining compressed formats (JPEG/MP3/MP4/...) genuinely need external
codec libraries that are not in this container; :func:`sniff_format`
classifies them so callers can raise an explicit ``NotImplementedError``
instead of misparsing. Encoders exist for every decoder so tests can pin
byte-exact round-trips (encode -> decode == original array).
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
    (b"\xff\xd8\xff", "jpeg"),
    (b"ID3", "mp3"),
    (b"\xff\xfb", "mp3"),
    (b"OggS", "ogg"),
    (b"\x1a\x45\xdf\xa3", "webm/mkv"),
)


def sniff_format(payload: bytes) -> str:
    """Classify a payload by magic bytes.

    Returns one of ``bmp pgm wav y4m png gif`` (decodable here), a
    compressed-format name (``jpeg mp4 ...`` — NOT decodable here), or
    ``unknown``.
    """
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
