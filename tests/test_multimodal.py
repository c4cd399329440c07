"""Multimodal plumbing tests: the Spark-side contract (schema, batch
iteration, row expansion) is real even though the codec is a stub."""

from __future__ import annotations

import pytest

from time_series_and_data_lakes_spark.operators.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    decode_media,
    extract_features,
    frame_sample,
    pack_fake_payload,
)


def _media_df(spark):
    rows = [
        (1, "image", pack_fake_payload(640, 480, 1, b"imagebody"), ("s3", "tsdl-fake")),
        (2, "video", pack_fake_payload(1920, 1080, 7, b"vbody"), ("s3", "tsdl-fake")),
        (3, "audio", pack_fake_payload(0, 0, 0, b"abody"), ("s3", "tsdl-fake")),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_media_parses_header(spark):
    got = {r["media_id"]: r for r in decode_media(_media_df(spark)).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["n_frames"]) == (640, 480, 1)
    assert (got[2]["width"], got[2]["height"]) == (1920, 1080)
    assert got[1]["n_bytes"] == len(pack_fake_payload(640, 480, 1, b"imagebody"))


def test_unknown_codec_is_explicitly_stubbed(spark):
    df = spark.createDataFrame(
        [(9, "image", b"\x89PNG....", ("s3", "png"))], MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="NotImplementedError|stubbed"):
        decode_media(df).collect()


def test_extract_features_shape_and_normalization(spark):
    rows = extract_features(_media_df(spark)).collect()
    assert len(rows) == 3
    for r in rows:
        assert len(r["features"]) == FEATURE_DIM
        assert abs(sum(r["features"]) - 1.0) < 1e-6


def test_frame_sample_expands_rows(spark):
    got = frame_sample(_media_df(spark), every_n=2).collect()
    frames = sorted((r["media_id"], r["frame_index"]) for r in got)
    # image: 1 frame -> [0]; video: 7 frames every 2 -> [0,2,4,6]; audio: 0
    assert frames == [(1, 0), (2, 0), (2, 2), (2, 4), (2, 6)]


def test_resize_media_aspect_fit_and_chains(spark):
    from time_series_and_data_lakes_spark.operators.multimodal import (
        _resize_dims,
        resize_media,
    )

    # integer aspect-fit math
    assert _resize_dims(1920, 1080, 640, 480) == (640, 360)
    assert _resize_dims(1080, 1920, 640, 480) == (270, 480)
    assert _resize_dims(320, 200, 640, 480) == (320, 200)  # already fits
    assert _resize_dims(0, 0, 640, 480) == (0, 0)  # invalid payload guard

    # header rewrite chains into decode; body length preserved
    resized = resize_media(_media_df(spark), max_width=640, max_height=480)
    got = {r["media_id"]: r for r in decode_media(resized).collect()}
    assert (got[2]["width"], got[2]["height"]) == (640, 360)
    assert got[2]["n_frames"] == 7  # frames untouched
    assert (got[1]["width"], got[1]["height"]) == (640, 480)  # exact fit kept
