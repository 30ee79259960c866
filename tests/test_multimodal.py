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


def test_real_decoder_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        MM.DecodeStage(decoder="real")
    with pytest.raises(NotImplementedError):
        MM.ResizeStage(decoder="real")
