"""Byte-exact round-trip pins for the pure-numpy/stdlib media codecs
(``stages/codecs.py``): BMP, PGM, WAV, Y4M against their published specs.
No Ray needed — these are the kernels the multimodal stages wrap."""

import struct

import numpy as np
import pytest

from use_case_real_time_anomaly_detection_ray.stages import codecs as C


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(1234)


# --------------------------------------------------------------------- BMP

@pytest.mark.parametrize("h,w", [(1, 1), (13, 7), (32, 33), (8, 64), (3, 253)])
def test_bmp_roundtrip_exact(rng, h, w):
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    payload = C.encode_bmp(img)
    assert payload[:2] == b"BM"
    # declared file size matches actual, rows padded to 4 bytes
    assert struct.unpack_from("<I", payload, 2)[0] == len(payload)
    assert (len(payload) - 54) % 4 == 0
    assert (C.decode_bmp(payload) == img).all()


def test_bmp_8bit_palette_and_topdown(rng):
    """Hand-built 8-bit palette BMP (grayscale identity palette), top-down
    rows (negative height) — the other half of the decoder's spec surface."""
    h, w = 5, 6
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    row_size = (w + 3) & ~3
    rows = np.zeros((h, row_size), np.uint8)
    rows[:, :w] = img  # top-down: first stored row is the top row
    palette = np.zeros((256, 4), np.uint8)
    palette[:, 0] = palette[:, 1] = palette[:, 2] = np.arange(256)
    offset = 54 + 1024
    pixel_bytes = rows.tobytes()
    payload = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM", offset + len(pixel_bytes), 0, 0, offset,
        40, w, -h, 1, 8, 0, len(pixel_bytes), 2835, 2835, 256, 0,
    ) + palette.tobytes() + pixel_bytes
    assert (C.decode_bmp(payload) == img).all()


def test_bmp_rejects_compressed():
    bad = bytearray(C.encode_bmp(np.zeros((2, 2), np.uint8)))
    struct.pack_into("<I", bad, 30, 1)  # BI_RLE8
    with pytest.raises(ValueError, match="compressed"):
        C.decode_bmp(bytes(bad))


# --------------------------------------------------------------------- PGM

def test_pgm_roundtrip_and_comments(rng):
    img = rng.integers(0, 256, (11, 17), dtype=np.uint8)
    assert (C.decode_pgm(C.encode_pgm(img)) == img).all()
    with_comment = b"P5\n# made by hand\n3 2\n255\n" + bytes(range(6))
    assert (C.decode_pgm(with_comment)
            == np.arange(6, dtype=np.uint8).reshape(2, 3)).all()


# --------------------------------------------------------------------- WAV

def test_wav_roundtrip_exact(rng):
    samples = rng.integers(-32768, 32768, 1234).astype(np.int16)
    rate, out = C.decode_wav(C.encode_wav(samples, rate=16000))
    assert rate == 16000
    assert out.dtype == np.int16 and (out == samples).all()


def test_wav_multichannel_keeps_channel0():
    import io
    import wave

    left = np.arange(10, dtype=np.int16)
    right = -left
    inter = np.empty(20, np.int16)
    inter[0::2], inter[1::2] = left, right
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(2)
        f.setsampwidth(2)
        f.setframerate(8000)
        f.writeframes(inter.tobytes())
    rate, out = C.decode_wav(buf.getvalue())
    assert (out == left).all()


# --------------------------------------------------------------------- Y4M

@pytest.mark.parametrize("colorspace", ["mono", "420"])
def test_y4m_roundtrip_exact(rng, colorspace):
    vid = rng.integers(0, 256, (5, 10, 12), dtype=np.uint8)
    payload = C.encode_y4m(vid, colorspace=colorspace)
    assert payload[:9] == b"YUV4MPEG2"
    assert C.y4m_frame_count(payload) == 5
    assert (C.decode_y4m(payload) == vid).all()
    assert (C.decode_y4m_frame(payload, 3) == vid[3]).all()
    with pytest.raises(IndexError):
        C.decode_y4m_frame(payload, 5)


def test_y4m_default_chroma_is_420():
    # spec: a stream with no C tag is 4:2:0
    vid = np.full((2, 4, 6), 9, np.uint8)
    payload = C.encode_y4m(vid, colorspace="420").replace(b" C420", b"", 1)
    assert C.y4m_frame_count(payload) == 2
    assert (C.decode_y4m(payload) == vid).all()


def test_y4m_odd_dims_rejected_for_420():
    with pytest.raises(ValueError, match="even"):
        C.encode_y4m(np.zeros((1, 3, 4), np.uint8), colorspace="420")


# --------------------------------------------------------------------- PNG

@pytest.mark.parametrize("h,w", [(1, 1), (13, 7), (32, 33), (3, 253)])
def test_png_gray_roundtrip_adaptive(rng, h, w):
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    payload = C.encode_png(img)
    assert payload[:8] == b"\x89PNG\r\n\x1a\n"
    assert (C.decode_png(payload) == img).all()


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_every_filter_type_roundtrips(rng, ftype):
    """Each of the five scanline filters forced on every row of both a gray
    and an RGB image — exercises every unfilter branch, byte-exact."""
    gray = rng.integers(0, 256, (9, 14), dtype=np.uint8)
    assert (C.decode_png(C.encode_png(gray, filters=ftype)) == gray).all()
    rgb = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    assert (C.decode_png(C.encode_png(rgb, filters=ftype))
            == C._rgb_to_gray(rgb)).all()


def test_png_per_row_filter_mix_roundtrips(rng):
    img = rng.integers(0, 256, (10, 8), dtype=np.uint8)
    filters = [0, 1, 2, 3, 4, 4, 3, 2, 1, 0]
    assert (C.decode_png(C.encode_png(img, filters=filters)) == img).all()


def test_png_adaptive_picks_multiple_filters():
    """A smooth gradient must NOT encode as all-None scanlines — the
    adaptive heuristic should reach for the predictive filters."""
    img = (np.arange(32)[:, None] * 7 + np.arange(48)[None, :] * 3) % 256
    payload = C.encode_png(img.astype(np.uint8))
    import zlib

    at = payload.index(b"IDAT")
    (length,) = struct.unpack_from(">I", payload, at - 4)
    raw = zlib.decompress(payload[at + 4:at + 4 + length])
    chosen = set(np.frombuffer(raw, np.uint8).reshape(32, 49)[:, 0].tolist())
    assert len(chosen) > 1
    assert (C.decode_png(payload) == img).all()


def test_png_rgb_matches_bmp_luma(rng):
    """Color → gray reduction is the SAME integer Rec.601 rounding as the
    BMP decoder, so one image encoded both ways decodes identically."""
    h, w = 7, 11
    rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    png_gray = C.decode_png(C.encode_png(rgb))
    # hand-build a 24-bit BMP of the same pixels (BMP stores BGR bottom-up)
    row_size = (3 * w + 3) & ~3
    rows = np.zeros((h, row_size), np.uint8)
    rows[:, : 3 * w] = rgb[::-1, :, ::-1].reshape(h, 3 * w)
    header = struct.pack(
        "<2sIHHIIiiHHIIiiII", b"BM", 54 + rows.size, 0, 0, 54,
        40, w, h, 1, 24, 0, rows.size, 2835, 2835, 0, 0)
    assert (png_gray == C.decode_bmp(header + rows.tobytes())).all()


def test_png_palette_and_alpha_color_types(rng):
    """Hand-built color-type 3 (palette), 4 (gray+alpha) and 6 (RGBA)
    streams decode per spec."""
    import zlib

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    def build(w, h, color_type, pixel_bytes, extra=b""):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
        stride = w * {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
        scan = b"".join(b"\x00" + pixel_bytes[y * stride:(y + 1) * stride]
                        for y in range(h))
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + extra
                + chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b""))

    # palette: 4 entries, indices identity-mapped to known luma
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]],
                   np.uint8)
    idx = np.array([[0, 1], [2, 3]], np.uint8)
    out = C.decode_png(build(2, 2, 3, idx.tobytes(),
                             extra=chunk(b"PLTE", pal.tobytes())))
    p32 = pal.astype(np.uint32)
    want = ((299 * p32[:, 0] + 587 * p32[:, 1] + 114 * p32[:, 2] + 500)
            // 1000).astype(np.uint8)[idx]
    assert (out == want).all()

    # gray+alpha keeps the gray sample, ignores alpha
    ga = np.array([[50, 0], [200, 255]], np.uint8)  # one row, two pixels
    assert (C.decode_png(build(2, 1, 4, ga.tobytes()))
            == np.array([[50, 200]])).all()

    # RGBA reduces RGB via luma, ignores alpha
    rgba = np.array([[100, 150, 200, 7]], np.uint8)
    want = (299 * 100 + 587 * 150 + 114 * 200 + 500) // 1000
    assert C.decode_png(build(1, 1, 6, rgba.tobytes())).item() == want


def test_png_crc_and_unsupported_rejected(rng):
    img = rng.integers(0, 256, (4, 4), dtype=np.uint8)
    good = bytearray(C.encode_png(img))
    good[20] ^= 0xFF  # corrupt one IHDR byte; stored CRC no longer matches
    with pytest.raises(ValueError, match="CRC"):
        C.decode_png(bytes(good))
    ihdr16 = struct.pack(">IIBBBBB", 4, 4, 16, 0, 0, 0, 0)
    p16 = (b"\x89PNG\r\n\x1a\n" + C._png_chunk(b"IHDR", ihdr16))
    with pytest.raises(ValueError, match="16-bit"):
        C.decode_png(p16)
    ihdr_i = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 1)
    with pytest.raises(ValueError, match="interlaced"):
        C.decode_png(b"\x89PNG\r\n\x1a\n" + C._png_chunk(b"IHDR", ihdr_i))


# --------------------------------------------------------------------- GIF

@pytest.mark.parametrize("h,w", [(1, 1), (13, 7), (64, 65), (3, 253)])
@pytest.mark.parametrize("interlace", [False, True])
def test_gif_roundtrip_exact(rng, h, w, interlace):
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    payload = C.encode_gif(img, interlace=interlace)
    assert payload[:6] == b"GIF87a"
    assert (C.decode_gif(payload) == img).all()


def test_gif_dictionary_overflow_and_runs(rng):
    """A 60k-pixel random image forces the 12-bit LZW dictionary past 4096
    (CLEAR + reset mid-stream); a constant image exercises the KwKwK case."""
    big = rng.integers(0, 256, (200, 300), dtype=np.uint8)
    assert (C.decode_gif(C.encode_gif(big)) == big).all()
    const = np.full((50, 50), 7, np.uint8)
    assert (C.decode_gif(C.encode_gif(const)) == const).all()


def test_gif_89a_extensions_and_local_palette(rng):
    """Hand-built GIF89a: graphic-control extension block ahead of an image
    with a LOCAL 4-entry color table — decoder must skip the extension and
    prefer the local palette."""
    idx = np.array([[0, 1], [2, 3]], np.uint8)
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]],
                   np.uint8)
    lzw = C._lzw_encode(idx.ravel(), 2)
    payload = (
        b"GIF89a" + struct.pack("<HHBBB", 2, 2, 0x00, 0, 0)  # no global table
        + b"\x21\xf9\x04\x00\x00\x00\x00\x00"         # graphic control ext
        + struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 2, 0x81)      # local table, 4
        + pal.tobytes() + bytes([2])
        + bytes([len(lzw)]) + lzw + b"\x00;"
    )
    p32 = pal.astype(np.uint32)
    want = ((299 * p32[:, 0] + 587 * p32[:, 1] + 114 * p32[:, 2] + 500)
            // 1000).astype(np.uint8)[idx]
    assert (C.decode_gif(payload) == want).all()


def test_gif_truncated_stream_rejected(rng):
    img = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    payload = C.encode_gif(img)
    with pytest.raises(ValueError):
        C.decode_gif(payload[:40])


# ----------------------------------------------------------------- sniffing

def test_sniff_formats(rng):
    img = rng.integers(0, 256, (4, 4), dtype=np.uint8)
    assert C.sniff_format(C.encode_bmp(img)) == "bmp"
    assert C.sniff_format(C.encode_pgm(img)) == "pgm"
    assert C.sniff_format(C.encode_wav(np.zeros(4, np.int16))) == "wav"
    assert C.sniff_format(C.encode_y4m(img[None])) == "y4m"
    assert C.sniff_format(b"\x89PNG\r\n\x1a\n....") == "png"
    assert C.sniff_format(C.encode_gif(img)) == "gif"
    assert C.sniff_format(b"\xff\xd8\xff\xe0JFIF") == "jpeg"
    assert C.sniff_format(b"\x00\x00\x00\x18ftypmp42") == "mp4"
    assert C.sniff_format(b"ID3\x04rest") == "mp3"
    assert C.sniff_format(b"\x00garbage") == "unknown"


def test_palette_index_out_of_range_is_valueerror():
    """Malformed palettes follow the uniform ValueError contract, not a bare
    IndexError from the fancy index — PNG color type 3 and GIF alike."""
    import zlib

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    pal = np.array([[255, 0, 0], [0, 255, 0]], np.uint8)  # 2 entries
    idx = np.array([[0, 5]], np.uint8)                    # index 5 > 1
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"PLTE", pal.tobytes())
           + chunk(b"IDAT", zlib.compress(b"\x00" + idx.tobytes()))
           + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="palette index out of range"):
        C.decode_png(png)

    # GIF: shrink the encoder's color-table size field so decoded LZW
    # indices exceed the table (encode_gif emits a 256-entry identity table;
    # flags 0xF7 -> 2<<7 = 256, patch to 0xF0 -> 2<<0 = 2 entries)
    img = np.array([[0, 200]], np.uint8)
    g = bytearray(C.encode_gif(img))
    assert g[10] & 0x80  # global color table present
    g[10] = (g[10] & 0xF8) | 0x00  # table size 2
    # drop the extra 254*3 palette bytes the header no longer claims
    del g[13 + 2 * 3:13 + 256 * 3]
    with pytest.raises(ValueError, match="index out of range"):
        C.decode_gif(bytes(g))


# -------------------------------------------------------------------- JPEG

def test_jpeg_idct_basis_matches_direct_sum(rng):
    """The orthonormal-basis IDCT (Aᵀ F A) must equal the T.81 A.3.3 direct
    sum f(x,y) = ΣΣ c(u)c(v) F(u,v) cos((2x+1)uπ/16) cos((2y+1)vπ/16) —
    an independent oracle for the DCT convention."""
    F = rng.normal(0, 100, (8, 8))
    A = C._JPEG_A
    fast = A.T @ F @ A
    direct = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = np.sqrt(1 / 8) if u == 0 else 0.5
                    cv = np.sqrt(1 / 8) if v == 0 else 0.5
                    s += (cu * cv * F[u, v]
                          * np.cos((2 * x + 1) * u * np.pi / 16)
                          * np.cos((2 * y + 1) * v * np.pi / 16))
            direct[x, y] = s
    assert np.abs(fast - direct).max() < 1e-9


def test_jpeg_block_constant_roundtrip_exact(rng):
    """At quant=1 a per-block-constant image has integral DC and zero ACs:
    decode(encode(x)) must be byte-exact."""
    for h, w in ((1, 1), (2, 3), (4, 4)):
        img = np.repeat(np.repeat(
            rng.integers(0, 256, (h, w), dtype=np.uint8), 8, 0), 8, 1)
        assert (C.decode_jpeg(C.encode_jpeg(img)) == img).all()


@pytest.mark.parametrize("h,w", [(8, 8), (24, 33), (40, 56), (7, 3), (64, 1)])
def test_jpeg_gray_roundtrip_within_one(rng, h, w):
    """quant=1 random gray: the only loss is DCT-coefficient rounding,
    bounded at ±1 per pixel."""
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    out = C.decode_jpeg(C.encode_jpeg(img))
    assert out.shape == (h, w)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1


@pytest.mark.parametrize("ri", [1, 3, 7])
def test_jpeg_restart_intervals(rng, ri):
    """DRI + RSTn markers: predictors reset per interval; reconstruction
    stays within the quant=1 ±1 bound. (Restart vs non-restart payloads may
    differ by single coefficient ULPs — batched vs per-block FDCT rounds a
    coefficient sitting exactly on .5 differently — so compare against the
    ORIGINAL image, not the other payload.)"""
    img = rng.integers(0, 256, (40, 56), dtype=np.uint8)
    payload = C.encode_jpeg(img, restart_interval=ri)
    n_rst = sum(payload.count(bytes([0xFF, 0xD0 + k])) for k in range(8))
    assert n_rst >= (35 - 1) // ri  # 5x7 MCUs, a restart between intervals
    out = C.decode_jpeg(payload)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1
    # color interleaved with restarts: same MCU-loop encoder both sides ->
    # byte-identical coefficients, exact match
    img3 = rng.integers(0, 256, (17, 25, 3), dtype=np.uint8)
    a = C.decode_jpeg(C.encode_jpeg(img3, restart_interval=2))
    b = C.decode_jpeg(C.encode_jpeg(img3))
    assert (a == b).all()


def test_jpeg_color_luma(rng):
    """Interleaved 4:4:4 color: the decoded plane is the Y channel, within
    ±1 of the Rec.601 luma of the RGB input (round-trip rounding)."""
    img = rng.integers(0, 256, (25, 31, 3), dtype=np.uint8)
    out = C.decode_jpeg(C.encode_jpeg(img))
    r, g, b = (img[..., i].astype(float) for i in range(3))
    y = np.clip(np.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5), 0, 255)
    assert np.abs(out.astype(float) - y).max() <= 1


def test_jpeg_16bit_quant_tables(rng):
    """quant entries > 255 switch DQT to 16-bit precision on both sides."""
    img = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    payload = C.encode_jpeg(img, quant=np.full(64, 300))
    out = C.decode_jpeg(payload)
    assert out.shape == img.shape  # heavy quantization: shape/validity only
    # a block-constant image survives even 16-bit quantization of zero ACs
    flat = np.full((16, 16), 144, np.uint8)
    dec = C.decode_jpeg(C.encode_jpeg(flat, quant=np.full(64, 300)))
    # DC quantizes to round(8*(144-128)/300)=0 -> reconstructs 128
    assert (dec == 128).all()


def test_jpeg_quantized_plausible(rng):
    img = (rng.integers(0, 64, (32, 32), dtype=np.uint8)
           + np.linspace(0, 128, 32, dtype=np.uint8)[None, :])
    out = C.decode_jpeg(C.encode_jpeg(img, quant=16))
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 8


def test_jpeg_malformed_and_unsupported():
    img = np.full((8, 8), 100, np.uint8)
    good = C.encode_jpeg(img)
    with pytest.raises(ValueError, match="SOI"):
        C.decode_jpeg(b"\x00\x01")
    with pytest.raises(ValueError, match="truncated|extends past"):
        C.decode_jpeg(good[:len(good) - 6])
    big = C.encode_jpeg(np.arange(64 * 64, dtype=np.uint8).reshape(64, 64))
    with pytest.raises(ValueError, match="truncated"):
        C.decode_jpeg(big[:len(big) - 40])  # cut inside the entropy stream
    # flip SOF0 -> SOF2: progressive must be an explicit gate
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="progressive"):
        C.decode_jpeg(prog)
    with pytest.raises(ValueError):
        C.encode_jpeg(np.zeros((0, 8), np.uint8))
    with pytest.raises(ValueError):
        C.encode_jpeg(img, quant=0)
    assert C.sniff_format(good) == "jpeg"


def test_jpeg_real_decoder_and_media_table(ray_session):
    """RealDecoder dispatches jpeg; the mixed synth table round-trips
    through decode_features with real decoding."""
    from use_case_real_time_anomaly_detection_ray.stages.multimodal import (
        RealDecoder, decode_features, synth_media_table,
    )
    import ray.data

    img = np.repeat(np.repeat(
        np.arange(4, dtype=np.uint8).reshape(2, 2) * 60, 8, 0), 8, 1)
    assert (RealDecoder().decode(C.encode_jpeg(img)) == img).all()
    t = synth_media_table(n=18, seed=3, fmt="mixed")
    assert "jpeg" in set(t["format"].to_pylist())
    out = decode_features(ray.data.from_arrow(t), decoder="real").to_pandas()
    assert len(out) == 18
    jp = out[out["format"] == "jpeg"]
    assert len(jp) == len([i for i in range(18) if i % 7 == 5])
    assert (jp["pix_std"] > 0).all()


# --------------------------------------------------------------------- MP4

def test_mp4_block_constant_roundtrip_exact(rng):
    """Per-block-constant frames at quant=1 have integral DC and zero ACs:
    the whole MJPEG-in-MP4 round trip is byte-exact."""
    blocks = rng.integers(0, 256, (5, 3, 4), dtype=np.uint8)
    frames = np.repeat(np.repeat(blocks, 8, axis=1), 8, axis=2)
    p = C.encode_mp4(frames)
    assert C.sniff_format(p) == "mp4"
    assert C.mp4_frame_count(p) == 5
    assert (C.decode_mp4(p) == frames).all()


def test_mp4_frame_seek_matches_full_decode(rng):
    frames = rng.integers(0, 256, (4, 17, 23), dtype=np.uint8)
    p = C.encode_mp4(frames)
    full = C.decode_mp4(p)
    assert np.abs(full.astype(int) - frames.astype(int)).max() <= 1
    for i in range(4):
        assert (C.decode_mp4_frame(p, i) == full[i]).all()
    with pytest.raises(IndexError):
        C.decode_mp4_frame(p, 4)


def _stbl_payloads(n_samples, sizes, stsc_runs, chunk_offs, co64=False,
                   entry_type=b"jpeg"):
    """Hand-build ftyp+moov+mdat-less scaffolding around given tables (the
    general stsc/stco layouts our encoder never writes)."""
    entry_body = (b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
                  + struct.pack(">HH", 16, 16)
                  + struct.pack(">II", 0x00480000, 0x00480000)
                  + b"\x00" * 4 + struct.pack(">H", 1)
                  + bytes(32) + struct.pack(">Hh", 24, -1))
    stsd = C._fullbox(b"stsd", 0, 0, struct.pack(">I", 1)
                      + C._box(entry_type, entry_body))
    stts = C._fullbox(b"stts", 0, 0, struct.pack(">III", 1, n_samples, 1))
    stsc = C._fullbox(b"stsc", 0, 0,
                      struct.pack(">I", len(stsc_runs))
                      + b"".join(struct.pack(">III", *r) for r in stsc_runs))
    stsz = C._fullbox(b"stsz", 0, 0,
                      struct.pack(">II", 0, n_samples)
                      + struct.pack(">%dI" % n_samples, *sizes))
    if co64:
        stco = C._fullbox(b"co64", 0, 0,
                          struct.pack(">I", len(chunk_offs))
                          + struct.pack(">%dQ" % len(chunk_offs), *chunk_offs))
    else:
        stco = C._fullbox(b"stco", 0, 0,
                          struct.pack(">I", len(chunk_offs))
                          + struct.pack(">%dI" % len(chunk_offs), *chunk_offs))
    stbl = C._box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = C._fullbox(b"vmhd", 0, 1, b"\x00" * 8)
    minf = C._box(b"minf", vmhd + stbl)
    hdlr = C._fullbox(b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12
                      + b"V\x00")
    mdhd = C._fullbox(b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, 25,
                                                 n_samples, 0x55C4, 0))
    mdia = C._box(b"mdia", mdhd + hdlr + minf)
    trak = C._box(b"trak", C._fullbox(b"tkhd", 0, 7, bytes(80)) + mdia)
    moov = C._box(b"moov", trak)
    ftyp = C._box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom")
    return ftyp, moov


def test_mp4_multichunk_stsc_and_co64(rng):
    """General sample-table resolution: 3 samples split 2+1 across two
    chunks whose offsets are NOT contiguous, addressed via 64-bit co64 —
    the layout a real muxer interleaving audio would produce."""
    frames = np.repeat(np.repeat(
        rng.integers(0, 256, (3, 2, 2), dtype=np.uint8), 8, 1), 8, 2)
    samples = [C.encode_jpeg(frames[i]) for i in range(3)]
    sizes = [len(s) for s in samples]
    ftyp, moov = _stbl_payloads(3, sizes, [(1, 2, 1), (2, 1, 1)], [0, 0],
                                co64=True)
    gap = b"\xde\xad\xbe\xef" * 4            # foreign bytes between chunks
    base = len(ftyp) + len(moov) + 8
    chunk_offs = [base, base + sizes[0] + sizes[1] + len(gap)]
    ftyp, moov = _stbl_payloads(3, sizes, [(1, 2, 1), (2, 1, 1)], chunk_offs,
                                co64=True)
    mdat = C._box(b"mdat", samples[0] + samples[1] + gap + samples[2])
    p = ftyp + moov + mdat
    assert C.mp4_frame_count(p) == 3
    assert (C.decode_mp4(p) == frames).all()
    assert (C.decode_mp4_frame(p, 2) == frames[2]).all()


def test_mp4_malformed_and_unsupported(rng):
    frames = np.repeat(np.repeat(
        rng.integers(0, 256, (2, 2, 2), dtype=np.uint8), 8, 1), 8, 2)
    good = C.encode_mp4(frames)
    with pytest.raises(ValueError):
        C.decode_mp4(good[:40])              # moov truncated away
    bad = bytearray(good)
    bad[0:4] = struct.pack(">I", len(good) + 999)   # ftyp size overruns
    with pytest.raises(ValueError, match="out of range"):
        C.decode_mp4(bytes(bad))
    with pytest.raises(NotImplementedError, match="avc1"):
        C.decode_mp4(good.replace(b"jpeg", b"avc1", 1))
    # stsc that maps more samples than stsz declares
    sizes = [100, 100]
    ftyp, moov = _stbl_payloads(2, sizes, [(1, 3, 1)], [0])
    with pytest.raises(ValueError, match="stsc maps"):
        C.decode_mp4(ftyp + moov + C._box(b"mdat", bytes(300)))
    # sample extents beyond the file
    ftyp, moov = _stbl_payloads(2, sizes, [(1, 2, 1)], [10 ** 6])
    with pytest.raises(ValueError, match="outside the file"):
        C.decode_mp4(ftyp + moov + C._box(b"mdat", bytes(200)))


def test_mp4_real_decoder_and_frame_sample(ray_session):
    """RealDecoder dispatches mp4; FrameSampleStage(decode=True) samples
    REAL frames from both containers (Y4M stride seek, MP4 sample-table
    seek) and cross-checks metadata frame counts."""
    from use_case_real_time_anomaly_detection_ray.stages.multimodal import (
        RealDecoder, sample_frames, synth_media_table,
    )
    import pyarrow as pa
    import ray.data

    t = synth_media_table(n=14, seed=5, fmt="mixed")
    assert "mp4" in set(t["format"].to_pylist())
    vid = t.filter(pa.compute.equal(t["media_type"], "video"))
    out = (sample_frames(ray.data.from_arrow(vid), every_k=2, decode=True)
           .to_pandas())
    rd = RealDecoder()
    for aid, g in out.groupby("asset_id"):
        row = vid.filter(pa.compute.equal(vid["asset_id"], aid))
        arr = rd.decode(row["payload"][0].as_py())
        for _, r in g.iterrows():
            assert r["frame_mean"] == float(arr[int(r["frame_index"])].mean())
    # metadata mismatch is caught for mp4 payloads too
    mp4_only = synth_media_table(n=2, seed=6, fmt="mp4")
    wrong = mp4_only.set_column(5, "n_frames", pa.array([99, 99], pa.int32()))
    with pytest.raises(Exception, match="stream has"):
        sample_frames(ray.data.from_arrow(wrong), decode=True).materialize()


def test_jpeg_truncated_dht_is_valueerror(rng):
    """A DHT segment cut mid-BITS must follow the uniform malformed-payload
    contract (ValueError), not leak an IndexError from table construction."""
    img = np.repeat(np.repeat(
        rng.integers(0, 256, (2, 2), dtype=np.uint8), 8, 0), 8, 1)
    good = C.encode_jpeg(img)
    i = good.index(b"\xff\xc4")
    # rewrite the DHT length so the segment ends 10 bytes into BITS
    trunc = good[:i + 2] + struct.pack(">H", 2 + 1 + 10) \
        + good[i + 4:i + 4 + 11] + good[i + 4 + 11:]
    with pytest.raises(ValueError):
        C.decode_jpeg(trunc)


def test_mp4_truncated_stco_names_stco(rng):
    """A present-but-truncated stco must surface as its own error, not be
    masked by the co64 fallback as 'missing co64'."""
    frames = np.repeat(np.repeat(
        rng.integers(0, 256, (2, 2, 2), dtype=np.uint8), 8, 1), 8, 2)
    good = C.encode_mp4(frames)
    i = good.index(b"stco")
    bad = bytearray(good)
    # claim 1000 chunk offsets in a box that holds one
    bad[i + 8:i + 12] = struct.pack(">I", 1000)
    with pytest.raises(ValueError, match="stco shorter"):
        C.decode_mp4(bytes(bad))
