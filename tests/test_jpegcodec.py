"""Baseline JPEG codec (stdlib+numpy): round-trip quality, format
routing, and Spark-side integration (VERDICT r2 next-round #4)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from data_engineering_capstone_project__spark.operators import (
    imagecodec as ic,
    jpegcodec as jc,
    multimodal as mm,
)


def _gradient(h=40, w=56):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    return np.stack(
        [xx * 255 / w, yy * 255 / h, (xx + yy) * 255 / (w + h)], axis=2
    ).astype(np.uint8)


def test_dct_basis_and_zigzag_invariants():
    assert np.allclose(jc._M @ jc._M.T, np.eye(8), atol=1e-12)
    assert sorted(jc.ZIGZAG.tolist()) == list(range(64))
    # first diagonal sweep of the spec's zigzag
    assert jc.ZIGZAG[:8].tolist() == [0, 1, 8, 16, 9, 2, 3, 10]


@pytest.mark.parametrize("subsample", [False, True])
def test_jpeg_roundtrip(subsample):
    img = _gradient()
    payload = jc.encode_jpeg(img, quality=90, subsample=subsample)
    assert payload[:3] == b"\xff\xd8\xff" and payload[-2:] == b"\xff\xd9"
    dec = jc.decode_jpeg(payload)
    assert dec.shape == img.shape and dec.dtype == np.uint8
    err = np.abs(dec.astype(int) - img.astype(int))
    # smooth content: tight reconstruction (chroma subsampling is lossier)
    assert err.mean() < (3.0 if subsample else 1.5)
    assert err.max() <= (16 if subsample else 8)


def test_jpeg_flat_color_near_exact():
    flat = np.full((16, 24, 3), 137, dtype=np.uint8)
    dec = jc.decode_jpeg(jc.encode_jpeg(flat, quality=90))
    assert np.abs(dec.astype(int) - 137).max() <= 1


def test_jpeg_deterministic_and_odd_sizes():
    img = _gradient(17, 23)  # forces edge padding in both dims
    a = jc.encode_jpeg(img, quality=80, subsample=True)
    assert a == jc.encode_jpeg(img, quality=80, subsample=True)
    dec = jc.decode_jpeg(a)
    assert dec.shape == (17, 23, 3)


def test_progressive_decode_matches_baseline_exactly():
    """Progressive and baseline encodings quantize identically, so their
    decodes must be BIT-IDENTICAL — this exercises interleaved DC
    first/refine, AC spectral bands, successive approximation (luma
    refined twice), EOB runs, and ZRL-with-correction-bits ordering."""
    rng = np.random.default_rng(3)
    imgs = [
        _gradient(40, 56),
        rng.integers(0, 256, size=(33, 41, 3), dtype=np.uint8),
        np.full((16, 16, 3), 77, np.uint8),
        (
            np.kron(rng.integers(0, 2, size=(5, 7)), np.ones((8, 8), int))[
                :37, :51
            ][..., None].repeat(3, 2)
            * 255
        ).astype(np.uint8),
    ]
    for im in imgs:
        for q in (85, 30):
            base = jc.decode_jpeg(jc.encode_jpeg(im, quality=q))
            prog = jc.decode_jpeg(jc.encode_jpeg_progressive(im, quality=q))
            assert np.array_equal(base, prog)


def test_progressive_truncated_raises():
    good = jc.encode_jpeg_progressive(_gradient(24, 24))
    with pytest.raises(ValueError):
        jc.decode_jpeg(good[: len(good) // 2] + b"\xff\xd9")


def test_decode_image_bytes_routes_jpeg():
    img = _gradient(24, 24)
    payload = jc.encode_jpeg(img, quality=95)
    assert ic.sniff_format(payload) == "jpeg"
    dec = ic.decode_image_bytes(payload)
    assert dec.shape == (24, 24, 3)


def test_image_pixel_stats_real_jpeg(spark):
    """Spark-side real decode of a JPEG payload: stable dims + identical
    pixel_sum/sha on re-run (decode is deterministic)."""
    img = _gradient(32, 32)
    payload = jc.encode_jpeg(img, quality=90)
    rows = [(1, "image", payload, "image/jpeg", 32, 32, None)]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in mm.image_pixel_stats(df).collect()}
    assert got[1]["width"] == 32 and got[1]["height"] == 32
    expected = jc.decode_jpeg(payload)
    assert got[1]["pixel_sum"] == int(expected.astype(np.int64).sum())
    again = {r["media_id"]: r for r in mm.image_pixel_stats(df).collect()}
    assert again[1]["rgb_sha256"] == got[1]["rgb_sha256"]


def test_resize_images_real_jpeg_input(spark):
    img = _gradient(32, 48)
    payload = jc.encode_jpeg(img, quality=90)
    rows = [(5, "image", payload, "image/jpeg", 48, 32, None)]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = mm.resize_images(df, target_w=8, target_h=8, fake=False).collect()
    resized = ic.decode_png(out[0]["payload"])
    assert resized.shape == (8, 8, 3)


def test_fill_bytes_before_marker_decode():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
    marker; the segment parser must skip them (ADVICE r3)."""
    img = _gradient(24, 24)
    payload = jc.encode_jpeg(img, quality=90)
    i = payload.index(b"\xff\xc0")  # pad before SOF0
    padded = payload[:i] + b"\xff\xff\xff" + payload[i:]
    assert np.array_equal(jc.decode_jpeg(padded), jc.decode_jpeg(payload))


def test_truncated_restart_intervals_raise_value_error():
    """A DRI stream with fewer restart intervals than MCUs must raise the
    codec's documented ValueError, not IndexError (ADVICE r3)."""
    import pytest

    img = _gradient(64, 64)
    payload = jc.encode_jpeg(img, quality=90)
    # inject a DRI segment (interval=1) without providing restart markers
    i = payload.index(b"\xff\xda")
    dri = b"\xff\xdd\x00\x04\x00\x01"
    hacked = payload[:i] + dri + payload[i:]
    with pytest.raises(ValueError):
        jc.decode_jpeg(hacked)


def test_huffman_lut_cache_shared_tables():
    """Decoders are memoized on the raw (bits, vals) tables — two decodes
    with the standard Annex K tables must reuse the same LUT objects."""
    img = _gradient(16, 16)
    p1 = jc.encode_jpeg(img, quality=90)
    jc.decode_jpeg(p1)
    before = len(jc._DECODER_CACHE)
    jc.decode_jpeg(jc.encode_jpeg(img, quality=50))  # same huffman tables
    assert len(jc._DECODER_CACHE) == before


def test_progressive_restart_intervals_match_baseline():
    """DRI + RSTn inside progressive scans (predictor/EOB-run resets per
    interval) must not change a single pixel vs the baseline decode."""
    rng = np.random.default_rng(5)
    im = rng.integers(0, 256, size=(33, 41, 3), dtype=np.uint8)
    base = jc.decode_jpeg(jc.encode_jpeg(im, quality=70))
    for ri in (1, 3, 7):
        prog = jc.decode_jpeg(
            jc.encode_jpeg_progressive(im, quality=70, restart_interval=ri)
        )
        assert np.array_equal(base, prog), ri


def test_multiscan_baseline_matches_interleaved():
    """Non-interleaved baseline (three per-component scans, DC predictor
    reset per scan) must decode bit-identical to the interleaved form."""
    rng = np.random.default_rng(9)
    for im in (
        rng.integers(0, 256, size=(33, 41, 3), dtype=np.uint8),
        _gradient(40, 56),
    ):
        for q in (85, 40):
            a = jc.decode_jpeg(jc.encode_jpeg(im, quality=q))
            b = jc.decode_jpeg(
                jc.encode_jpeg(im, quality=q, scan_mode="per_component")
            )
            assert np.array_equal(a, b)
