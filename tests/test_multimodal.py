import pytest

from data_engineering_capstone_project__spark.operators import multimodal as mm


def _media(spark):
    rows = [
        (1, "image", b"\x89PNG fake bytes 1", "image/png", 4, 4, None),
        (2, "image", b"\x89PNG fake bytes 2", "image/png", 8, 8, None),
        (3, "video", b"fake mp4", "video/mp4", 16, 16, 3500),
        (4, "audio", b"fake wav", "audio/wav", None, None, 2000),
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"x")
    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"x")


def test_extract_image_features_plumbing(spark):
    df = _media(spark)
    out = mm.extract_image_features(df, fake=True)
    rows = {r["media_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2}
    assert len(rows[1]["feat"]) == 8
    assert rows[1]["sha256"] != rows[2]["sha256"]
    # determinism
    again = {r["media_id"]: r for r in mm.extract_image_features(df, fake=True).collect()}
    assert again[1]["feat"] == rows[1]["feat"]


def test_sample_video_frames(spark):
    df = _media(spark)
    out = mm.sample_video_frames(df, every_ms=1000, fake=True).collect()
    assert [r["frame_ts_ms"] for r in out] == [0, 1000, 2000, 3000]


def test_resize_images_composes(spark):
    df = _media(spark)
    out = mm.resize_images(df, target_w=64, target_h=32, fake=True)
    rows = {r["media_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["width"] == 64 and rows[1]["height"] == 32
    assert rows[1]["resize_sha256"] != rows[2]["resize_sha256"]
    # output is MEDIA-shaped -> feature extraction composes on top
    feats = mm.extract_image_features(out.drop("resize_sha256"), fake=True)
    assert feats.count() == 2


def test_extract_audio_features_windows(spark):
    df = _media(spark)
    out = mm.extract_audio_features(df, window_ms=500, fake=True).collect()
    # 2000 ms / 500 ms -> 4 windows for media_id 4
    assert [r["window_start_ms"] for r in out] == [0, 500, 1000, 1500]
    assert all(len(r["feat"]) == 16 for r in out)
    # content+window derived -> windows differ
    assert out[0]["feat"] != out[1]["feat"]
