"""Multimodal plumbing: schema, actor signature, stub behavior,
explode layout — the decode itself is stubbed (no codecs here)."""

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data

from dedupe_api_ray.extras.multimodal import (MediaDecoder,
                                              extract_media_features,
                                              frame_sample,
                                              make_fake_media_table)


def test_stub_raises_without_fake():
    dec = MediaDecoder(fake=False)
    with pytest.raises(NotImplementedError):
        dec._decode(b"xx", "image/png")


def test_feature_extraction_plumbing(ray_session):
    media = make_fake_media_table(n=32)
    ds = ray.data.from_arrow(media)
    out = extract_media_features(ds, fake=True, batch_size=8).to_pandas()
    assert len(out) == 32
    assert set(out.columns) == {"media_id", "media_type", "feature"}
    feats = np.stack(out["feature"].to_list())
    assert feats.shape == (32, MediaDecoder.FEATURE_DIM)
    assert (feats >= 0).all() and (feats <= 1).all()
    # deterministic across runs
    out2 = extract_media_features(ds, fake=True, batch_size=16).to_pandas()
    m1 = dict(zip(out["media_id"], map(tuple, out["feature"])))
    m2 = dict(zip(out2["media_id"], map(tuple, out2["feature"])))
    assert m1 == m2


def test_frame_sample_explode(ray_session):
    media = make_fake_media_table(n=8)
    ds = ray.data.from_arrow(media)
    frames = frame_sample(ds, every_n_bytes=512, max_frames=4).to_pandas()
    assert set(frames.columns) == {"media_id", "frame_idx", "frame_bytes"}
    assert frames.groupby("media_id").size().max() <= 4
    assert (frames["frame_bytes"].str.len() <= 512).all()
    # features over fake-decoded frames feed downstream ANN: shape check
    per_media = frames[frames["media_id"] == 0]
    assert list(per_media["frame_idx"]) == sorted(per_media["frame_idx"])
