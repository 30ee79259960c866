"""Multimodal plumbing: schema contract, deterministic fake decode, resize
layout, frame sampling, and the real-decoder stub gate."""

import numpy as np
import pytest

import ray.data

from use_case_real_time_anomaly_detection_ray.stages import multimodal as MM


@pytest.fixture(scope="module")
def media_ds(ray_session):
    t = MM.synth_media_table(n=24, media_type="video")
    assert t.schema.equals(MM.MEDIA_SCHEMA)
    return ray.data.from_arrow(t)


def test_decode_features(media_ds):
    out = MM.decode_features(media_ds).to_pandas()
    assert len(out) == 24
    assert "payload" not in out.columns  # fat bytes dropped after decode
    assert out["pix_mean"].between(0, 255).all()
    # deterministic: second run bitwise identical
    out2 = MM.decode_features(media_ds).to_pandas()
    assert (out.sort_values("asset_id")["pix_mean"].to_numpy()
            == out2.sort_values("asset_id")["pix_mean"].to_numpy()).all()


def test_resize_fixed_width(media_ds):
    out = MM.resize_features(media_ds, target=8).to_pandas()
    assert len(out) == 24
    lens = out["feature"].map(len)
    assert (lens == 64).all()
    vals = np.concatenate([np.asarray(f) for f in out["feature"]])
    assert vals.min() >= 0.0 and vals.max() <= 1.0


def test_frame_sampling(media_ds):
    src = media_ds.to_pandas()
    out = MM.sample_frames(media_ds, every_k=2).to_pandas()
    want = int(sum((nf + 1) // 2 for nf in src["n_frames"]))
    assert len(out) == want
    assert (out["frame_index"] % 2 == 0).all()


def test_compressed_codecs_are_explicit_stubs():
    """Real decode works for BMP/PGM/PNG/GIF/JPEG/WAV/Y4M; payloads in
    formats that genuinely need external codec libraries (MP3 here) raise
    an explicit NotImplementedError naming the sniffed format."""
    stage = MM.DecodeStage(decoder="real")
    mp3_table = MM.synth_media_table(n=1, fmt="bmp").set_column(
        6, "payload",
        __import__("pyarrow").array([b"ID3\x04\x00....."],
                                    __import__("pyarrow").large_binary()))
    with pytest.raises(NotImplementedError, match="mp3"):
        stage(mp3_table)
    with pytest.raises(ValueError):
        MM.DecodeStage(decoder="nonsense")


def test_real_decode_features_end_to_end(ray_session):
    """Mixed REAL-format assets (BMP + WAV + Y4M + PNG) through the Ray
    actor-pool decode stage: features equal a direct numpy recompute,
    bitwise."""
    t = MM.synth_media_table(n=18, seed=11, fmt="mixed")
    assert "png" in set(t["format"].to_pylist())  # compressed codec in play
    out = (MM.decode_features(ray.data.from_arrow(t), decoder="real")
           .to_pandas().sort_values("asset_id").reset_index(drop=True))
    assert len(out) == 18
    rd = MM.RealDecoder()
    for i in range(18):
        arr = rd.decode(t["payload"][i].as_py())
        assert out.loc[i, "pix_mean"] == float(arr.mean())
        assert out.loc[i, "pix_std"] == float(arr.std())
        assert list(out.loc[i, "shape"]) == list(arr.shape)
    # media_type column survived and matches the decoded dimensionality
    dims = {"image": 2, "audio": 1, "video": 3}
    for i in range(18):
        assert len(out.loc[i, "shape"]) == dims[out.loc[i, "media_type"]]


def test_real_decode_rejects_metadata_mismatch(ray_session):
    t = MM.synth_media_table(n=2, seed=1, fmt="bmp")
    import pyarrow as pa

    bad = t.set_column(3, "width", pa.array([999, 999], pa.int32()))
    with pytest.raises(Exception, match="decodes to"):
        MM.decode_features(ray.data.from_arrow(bad),
                           decoder="real").materialize()


def test_real_resize_and_video_first_frame(ray_session):
    t = MM.synth_media_table(n=6, seed=2, fmt="bmp")
    out = MM.resize_features(ray.data.from_arrow(t), target=8,
                             decoder="real").to_pandas()
    assert (out["feature"].map(len) == 64).all()
    tv = MM.synth_media_table(n=4, seed=3, fmt="y4m")
    outv = MM.resize_features(ray.data.from_arrow(tv), target=4,
                              decoder="real").to_pandas()
    assert (outv["feature"].map(len) == 16).all()


def test_real_frame_sampling_decodes_luma(ray_session):
    """decode=True extracts each sampled frame's real luma plane; means match
    a direct numpy recompute and the metadata cross-check trips on lies."""
    from use_case_real_time_anomaly_detection_ray.stages import codecs as C

    t = MM.synth_media_table(n=5, seed=4, fmt="y4m")
    out = (MM.sample_frames(ray.data.from_arrow(t), every_k=3, decode=True)
           .to_pandas().sort_values(["asset_id", "frame_index"]))
    src = t.to_pandas()
    for _, r in out.iterrows():
        payload = src.loc[src.asset_id == r.asset_id, "payload"].iloc[0]
        frame = C.decode_y4m_frame(payload, int(r.frame_index))
        assert r.frame_mean == float(frame.mean())
    import pyarrow as pa

    lied = t.set_column(5, "n_frames", pa.array([99] * 5, pa.int32()))
    with pytest.raises(Exception, match="frames"):
        MM.sample_frames(ray.data.from_arrow(lied), decode=True).materialize()
