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


# ----------------------------------------------------------------- sniffing

def test_sniff_formats(rng):
    img = rng.integers(0, 256, (4, 4), dtype=np.uint8)
    assert C.sniff_format(C.encode_bmp(img)) == "bmp"
    assert C.sniff_format(C.encode_pgm(img)) == "pgm"
    assert C.sniff_format(C.encode_wav(np.zeros(4, np.int16))) == "wav"
    assert C.sniff_format(C.encode_y4m(img[None])) == "y4m"
    assert C.sniff_format(b"\x89PNG\r\n\x1a\n....") == "png"
    assert C.sniff_format(b"\xff\xd8\xff\xe0JFIF") == "jpeg"
    assert C.sniff_format(b"\x00\x00\x00\x18ftypmp42") == "mp4"
    assert C.sniff_format(b"ID3\x04rest") == "mp3"
    assert C.sniff_format(b"\x00garbage") == "unknown"
