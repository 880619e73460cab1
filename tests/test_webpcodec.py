"""VP8L (WebP lossless) codec tests — round-trips over every encoder
branch plus hand-crafted streams for the decoder-only transform paths
(predictor, cross-color). Third-party fixtures are impossible in this
container (no libwebp/Pillow); the disclosed validation story is
round-trip + structural + known-value kernels."""

import numpy as np
import pytest

from data_engineering_capstone_project__spark.operators import (
    imagecodec as ic,
    webpcodec as wc,
)


def _rand(h, w, seed=7):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )


def test_roundtrip_literals_and_codes():
    a = _rand(13, 17)
    p = wc.encode_webp_lossless(a)
    assert p[:4] == b"RIFF" and p[8:12] == b"WEBP"
    assert (wc.decode_webp(p) == a).all()
    flat = np.full((5, 9, 3), 77, np.uint8)  # simple 1-symbol codes
    assert (wc.decode_webp(wc.encode_webp_lossless(flat)) == flat).all()
    one = _rand(1, 1)
    assert (wc.decode_webp(wc.encode_webp_lossless(one)) == one).all()


def test_roundtrip_backrefs_and_cache():
    rng = np.random.default_rng(3)
    runs = np.repeat(
        rng.integers(0, 4, size=(20, 1, 3)) * 80, 30, axis=1
    ).astype(np.uint8)
    plain = wc.encode_webp_lossless(runs)
    refs = wc.encode_webp_lossless(runs, use_backrefs=True)
    assert (wc.decode_webp(refs) == runs).all()
    assert len(refs) < len(plain) / 3  # the RLE really engaged
    cached = wc.encode_webp_lossless(runs, cache_bits=4)
    assert (wc.decode_webp(cached) == runs).all()
    both = wc.encode_webp_lossless(runs, use_backrefs=True, cache_bits=6)
    assert (wc.decode_webp(both) == runs).all()


def test_roundtrip_subtract_green_and_palette():
    a = _rand(11, 23)
    sg = wc.encode_webp_lossless(a, transform="subtract_green")
    assert (wc.decode_webp(sg) == a).all()
    rng = np.random.default_rng(5)
    for ncol in (2, 4, 16, 200):  # 3/2/1/0-bit bundling widths
        img = (
            rng.integers(0, ncol, size=(10, 33, 1))
            * np.array([[[max(1, 251 // max(1, ncol - 1)), 1, 3]]])
        ).astype(np.uint8)
        enc = wc.encode_webp_lossless(img, transform="palette")
        assert (wc.decode_webp(enc) == img).all(), ncol


def test_predictor_transform_stream():
    """Hand-crafted level-0 stream with a PREDICTOR transform: the test
    forward-applies the transform (residual = pixel - predict, per the
    shared mode kernel and the spec's edge rules), emits it, and the
    decoder must reconstruct the original exactly — for every block
    mode 0..13 planted across the block grid."""
    rng = np.random.default_rng(11)
    h, w, size_bits = 9, 17, 2
    a = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    px = wc._join(
        np.full((h, w), 255, np.uint32),
        a[:, :, 0].astype(np.uint32),
        a[:, :, 1].astype(np.uint32),
        a[:, :, 2].astype(np.uint32),
    )
    bw_, bh_ = wc._sub(w, size_bits), wc._sub(h, size_bits)
    modes = (np.arange(bw_ * bh_) % 14).reshape(bh_, bw_)
    resid = np.zeros_like(px)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(px[0, x - 1])
            elif x == 0:
                pred = int(px[y - 1, 0])
            else:
                m = int(modes[y >> size_bits, x >> size_bits])
                l = int(px[y, x - 1])
                t = int(px[y - 1, x])
                # Spec TR wrap at the rightmost column: offset (y-1)*w+x+1
                # == y*w+0, i.e. the CURRENT row's leftmost pixel.
                tr = int(px[y - 1, x + 1]) if x + 1 < w else int(px[y, 0])
                tl = int(px[y - 1, x - 1])
                pred = wc._predict(m, l, t, tr, tl)
            d = 0
            for sh in (0, 8, 16, 24):
                d |= ((int(px[y, x]) >> sh) - (pred >> sh) & 0xFF) << sh
            resid[y, x] = d
    bw = wc._BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(1, 1)  # a transform follows
    bw.write(0, 2)  # PREDICTOR
    bw.write(size_bits - 2, 3)
    mode_px = (np.uint32(0xFF000000) | (modes.astype(np.uint32) << 8)).reshape(-1)
    wc._encode_pixels(bw, mode_px, False, 0, level0=False)
    bw.write(0, 1)  # no more transforms
    wc._encode_pixels(bw, resid.reshape(-1), False, 0, level0=True)
    stream = bw.bytes()
    import struct

    chunk = b"VP8L" + struct.pack("<I", len(stream)) + stream
    if len(stream) & 1:
        chunk += b"\x00"
    payload = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    assert (wc.decode_webp(payload) == a).all()


def test_color_transform_stream():
    """Hand-crafted stream with a CROSS-COLOR transform: residuals are
    forward-computed with the spec's signed (t*c)>>5 delta, the decoder
    must invert them exactly under per-block element values."""
    rng = np.random.default_rng(13)
    h, w, size_bits = 8, 12, 2
    a = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    bw_, bh_ = wc._sub(w, size_bits), wc._sub(h, size_bits)
    elems = rng.integers(0, 256, size=(bh_, bw_, 3)).astype(np.uint32)
    elem_px = (
        np.uint32(0xFF000000)
        | (elems[:, :, 0] << 16)  # red_to_blue
        | (elems[:, :, 1] << 8)  # green_to_blue
        | elems[:, :, 2]  # green_to_red
    )

    def delta(t, c):
        ts = t - 256 if t > 127 else t
        c &= 0xFF
        cs = c - 256 if c > 127 else c
        return (ts * cs) >> 5

    resid = np.zeros((h, w), np.uint32)
    for y in range(h):
        for x in range(w):
            e = elem_px[y >> size_bits, x >> size_bits]
            g2r, g2b, r2b = int(e) & 0xFF, (int(e) >> 8) & 0xFF, (int(e) >> 16) & 0xFF
            r, g, b = (int(v) for v in a[y, x])
            r_res = (r - delta(g2r, g)) & 0xFF
            b_res = (b - delta(g2b, g) - delta(r2b, r_res + delta(g2r, g))) & 0xFF
            # decoder recovers tmp_red = r_res + delta(g2r, g) == r, so
            # the blue residual must subtract delta(r2b, r)
            b_res = (b - delta(g2b, g) - delta(r2b, r)) & 0xFF
            resid[y, x] = (255 << 24) | (r_res << 16) | (g << 8) | b_res
    bw = wc._BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(1, 1)
    bw.write(1, 2)  # COLOR (cross-color) transform
    bw.write(size_bits - 2, 3)
    wc._encode_pixels(bw, elem_px.reshape(-1), False, 0, level0=False)
    bw.write(0, 1)
    wc._encode_pixels(bw, resid.reshape(-1), False, 0, level0=True)
    stream = bw.bytes()
    import struct

    chunk = b"VP8L" + struct.pack("<I", len(stream)) + stream
    if len(stream) & 1:
        chunk += b"\x00"
    payload = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    assert (wc.decode_webp(payload) == a).all()


def test_predict_kernels_known_values():
    """Spec semantics pinned on hand values: Select's channel-sum tie
    rule and ClampAddSubtractHalf's C-style truncation toward zero."""
    # Select picks whichever of T/L is closer (channel-sum L1) to the
    # gradient prediction p = L + T - TL: |p-T| = |L-TL|, |p-L| = |T-TL|
    T = 0xFF000000 | (10 << 16) | (10 << 8) | 10
    L = 0xFF000000 | (30 << 16) | (30 << 8) | 30
    TL = 0xFF000000 | (11 << 16) | (11 << 8) | 11
    # p = 29 per channel -> closer to L(30) than T(10) -> L either way
    assert wc._select(T, L, TL) == L
    assert wc._select(L, T, TL) == L
    # and the tie (|L-TL| == |T-TL|) resolves to the first argument
    T2 = 0xFF000000 | (12 << 16) | (12 << 8) | 12
    TL2 = 0xFF000000 | (21 << 16) | (21 << 8) | 21
    assert wc._select(T2, L, TL2) == T2
    # ClampAddSubtractHalf: ave=(L+T)/2 per channel, + trunc((ave-TL)/2)
    ave = wc._average2(L, T)  # channels (30+10)>>1 = 20
    out = wc._cas_half(ave, TL)  # 20 + trunc((20-11)/2)=20+4=24
    assert (out >> 16) & 0xFF == 24
    # negative delta truncates toward zero: ave=20, TL=25 -> 20+trunc(-5/2)=18
    TL2 = 0xFF000000 | (25 << 16) | (25 << 8) | 25
    assert (wc._cas_half(ave, TL2) >> 16) & 0xFF == 18  # NOT floor(-2.5)=-3


def test_container_errors_and_dispatch():
    a = _rand(6, 6)
    p = wc.encode_webp_lossless(a)
    assert ic.sniff_format(p) == "webp"
    assert (ic.decode_image_bytes(p) == a).all()
    # lossy VP8 still raises, named
    import struct

    lossy = (
        b"RIFF" + struct.pack("<I", 16) + b"WEBP"
        + b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
    )
    with pytest.raises(NotImplementedError, match="lossy VP8"):
        wc.decode_webp(lossy)
    with pytest.raises(ValueError):
        wc.decode_webp(b"not a webp")
