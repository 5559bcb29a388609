"""Multimodal plumbing: binary columns through mapInPandas — schema,
batch shape, deterministic fake features, frame sampling; the real
codec stays a loud stub."""

from __future__ import annotations

import numpy as np
import pytest

from bugzilla_etl_spark.operators.multimodal import (
    decode_image,
    extract_features,
    fake_feature,
    media_from_documents,
    sample_frames,
)

SF = "/root/testdata/sf0.001"


def test_decode_stub_is_loud():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")


def test_fake_feature_deterministic():
    a = fake_feature(b"hello", dim=8)
    b = fake_feature(b"hello", dim=8)
    c = fake_feature(b"other", dim=8)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
    assert a.dtype == np.float32 and a.shape == (8,)
    assert (a >= 0).all() and (a < 1).all()


def test_extract_features_pipeline(spark):
    media = media_from_documents(spark, SF)
    feats = extract_features(media, dim=8).limit(20).collect()
    assert len(feats) == 20
    for r in feats:
        assert r["kind"] == "blob"
        assert len(r["feature"]) == 8
        assert r["byte_len"] > 0


def test_extract_features_matches_local(spark):
    media = media_from_documents(spark, SF)
    row = media.filter("media_id = 1").collect()[0]
    feat_row = (
        extract_features(media, dim=8).filter("media_id = 1").collect()[0]
    )
    want = fake_feature(bytes(row["media"]), dim=8)
    assert np.allclose(np.array(feat_row["feature"], dtype=np.float32), want)


def test_frame_sampling(spark):
    media = media_from_documents(spark, SF)
    frames = sample_frames(media, frame_bytes=64, max_frames=3)
    pdf = frames.filter("media_id < 5").toPandas()
    assert set(pdf.columns) == {"media_id", "frame_idx", "frame"}
    assert pdf.groupby("media_id")["frame_idx"].max().max() <= 2
    for f in pdf["frame"]:
        assert 0 < len(bytes(f)) <= 64
