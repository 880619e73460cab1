"""WebP LOSSLESS (VP8L) codec — stdlib + numpy, from scratch
(VERDICT r10 #8: the last common image format behind the honest
codec boundary).

Implements the public VP8L bitstream specification (the
"WebP Lossless Bitstream Specification", Google, 2012 — a public
document; no code is taken from libwebp):

- LSB-first bit reading; canonical prefix (Huffman) codes in DEFLATE
  order (lengths → codes numerically increasing by (length, symbol));
- code-length codes (the 19-symbol order, repeats 16/17/18, the
  optional max-symbol short-circuit) and 1/2-symbol "simple" codes;
- the five per-group codes (green+length+cache, red, blue, alpha,
  distance), LZ77 backward references with the distance plane-code
  neighborhood map, and the 0x1e35a7bd color cache;
- meta prefix images (per-block code groups) and subresolution
  entropy images;
- all four transforms, inverted in reverse order: predictor (14
  modes, C-truncation semantics for mode 13), cross-color,
  subtract-green, color-indexing (including sub-byte pixel bundling).

``encode_webp_lossless`` is the deterministic fixture half (the
``jpegcodec``/``avicodec``/``mp4codec`` pattern): real canonical
prefix codes built from symbol frequencies, optional dist-1 RLE
backrefs and color cache, so round-trip tests exercise the literal,
backref, cache, and code-length machinery against planted ground
truth. Validation is round-trip + structural (this container has no
WebP encoder to produce third-party fixtures; Pillow remains the
``prefer='auto'`` cross-check path where installed).

Distance neighborhood table: the spec defines a 120-entry (dx, dy)
map ordered by pixel distance. It is reconstructed here by the
documented ordering rule — candidates ``y∈[0..8]`` (``x∈[1..8]`` when
``y=0``, else ``x∈[-8..8]``) sorted by ``(x²+y², -y, x>0 first,
|x|)``, first 120 — which reproduces the spec's printed prefix; both
halves of this module share it, so round-trips cannot mask a
divergence from the table itself (disclosed limitation: a
third-party encoder's neighborhood codes are untestable in this
container).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- bits


class _BitReader:
    """LSB-first bit reader over bytes."""

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.bit = pos * 8

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.bit >> 3
            if byte >= len(self.buf):
                raise ValueError("vp8l: bitstream truncated")
            v |= ((self.buf[byte] >> (self.bit & 7)) & 1) << i
            self.bit += 1
        return v


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def write_code(self, code: int, length: int) -> None:
        """Prefix codes are MSB-first within the code."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        out = bytes(self.out)
        if self.nbits:
            out += bytes([self.acc & 0xFF])
        return out


# ------------------------------------------------------------- huffman

_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length), DEFLATE canonical assignment."""
    pairs = sorted(
        (l, s) for s, l in enumerate(lengths) if l > 0
    )
    codes: dict[int, tuple[int, int]] = {}
    code, prev_len = 0, 0
    for l, s in pairs:
        code <<= l - prev_len
        codes[s] = (code, l)
        code += 1
        prev_len = l
    return codes


class _Decoder:
    """Walk-a-bit prefix decoder from a lengths vector."""

    def __init__(self, lengths: list[int]):
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if len(nz) == 1:
            # single-symbol code: reads ZERO bits
            self.single = nz[0][1]
            self.table = {}
            return
        self.single = None
        self.table = {
            (l, c): s for s, (c, l) in _canonical_codes(lengths).items()
        }
        if not self.table:
            raise ValueError("vp8l: empty prefix code")
        self.max_len = max(l for l, _ in self.table)

    def decode(self, bits: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code, length = 0, 0
        while True:
            code = (code << 1) | bits.read(1)
            length += 1
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
            if length > self.max_len:
                raise ValueError("vp8l: invalid prefix code in stream")


def _read_code(bits: _BitReader, alphabet_size: int) -> _Decoder:
    """One prefix code: simple (1-2 symbols) or normal (code-length
    coded lengths with 16/17/18 repeats and the max-symbol option)."""
    lengths = [0] * alphabet_size
    if bits.read(1):  # simple
        n_sym = bits.read(1) + 1
        if bits.read(1):  # first symbol is 8 bits
            sym0 = bits.read(8)
        else:
            sym0 = bits.read(1)
        lengths[sym0] = 1
        if n_sym == 2:
            sym1 = bits.read(8)
            lengths[sym1] = 1
        return _Decoder(lengths)
    # normal: code-length code
    n_cl = 4 + bits.read(4)
    cl_lengths = [0] * 19
    for i in range(n_cl):
        cl_lengths[_CL_ORDER[i]] = bits.read(3)
    cl = _Decoder(cl_lengths)
    if bits.read(1):  # max-symbol short-circuit
        length_nbits = 2 + 2 * bits.read(3)
        max_symbol = 2 + bits.read(length_nbits)
    else:
        max_symbol = alphabet_size
    # symbol code lengths
    prev = 8
    i = 0
    while i < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        s = cl.decode(bits)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            for _ in range(3 + bits.read(2)):
                if i < alphabet_size:
                    lengths[i] = prev
                    i += 1
        elif s == 17:
            i += 3 + bits.read(3)
        else:  # 18
            i += 11 + bits.read(7)
    return _Decoder(lengths)


# -------------------------------------------------- distance neighborhood


def _plane_table() -> list[tuple[int, int]]:
    cands = []
    for y in range(0, 9):
        xs = range(1, 9) if y == 0 else range(-8, 9)
        for x in xs:
            cands.append((x, y))
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1],
                              0 if p[0] > 0 else 1, abs(p[0])))
    return cands[:120]


_PLANE = _plane_table()
_PLANE_INDEX = {p: i for i, p in enumerate(_PLANE)}


def _plane_to_dist(code: int, xsize: int) -> int:
    """1-based plane code → pixel distance."""
    if code > 120:
        return code - 120
    dx, dy = _PLANE[code - 1]
    return max(1, dy * xsize + dx)


def _prefix_value(code: int, bits: _BitReader) -> int:
    """LZ77 length/distance prefix decode (1-based value)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + bits.read(extra) + 1


def _prefix_encode(value: int) -> tuple[int, int, int]:
    """value (≥1) → (prefix code, extra bits value, extra bit count)."""
    v = value - 1
    if v < 4:
        return v, 0, 0
    nbits = v.bit_length() - 1
    rest = v - (1 << nbits)
    code = 2 * nbits + (rest >> (nbits - 1) if nbits else 0)
    extra = rest & ((1 << (nbits - 1)) - 1)
    return code, extra, nbits - 1


def _cache_hash(argb: int, cache_bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)


# ------------------------------------------------------------- decoder


def _decode_image_stream(
    bits: _BitReader, w: int, h: int, level0: bool
) -> tuple[np.ndarray, list]:
    """→ (ARGB uint32 array (h, w), transforms list [(type, data), ...])."""
    transforms = []
    xsize = w
    if level0:
        seen = set()
        while bits.read(1):
            t = bits.read(2)
            if t in seen:
                raise ValueError("vp8l: duplicate transform")
            seen.add(t)
            if t == 0 or t == 1:  # predictor / cross-color
                size_bits = bits.read(3) + 2
                bw = _sub(xsize, size_bits)
                bh = _sub(h, size_bits)
                img, _ = _decode_image_stream(bits, bw, bh, False)
                transforms.append((t, (size_bits, img)))
            elif t == 2:  # subtract-green
                transforms.append((t, None))
            else:  # color indexing
                n_colors = bits.read(8) + 1
                pal_img, _ = _decode_image_stream(bits, n_colors, 1, False)
                # palette entries are DELTA-coded per channel
                pal = pal_img[0].copy()
                acc = np.uint32(0)
                for i in range(n_colors):
                    acc = _add_argb(acc, pal[i])
                    pal[i] = acc
                if n_colors <= 2:
                    width_bits = 3
                elif n_colors <= 4:
                    width_bits = 2
                elif n_colors <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                transforms.append((t, (n_colors, pal, width_bits)))
                xsize = _sub(xsize, width_bits)
    # color cache
    cache_bits = bits.read(4) if bits.read(1) else 0
    if cache_bits and not 1 <= cache_bits <= 11:
        raise ValueError(f"vp8l: cache_bits {cache_bits}")
    # meta prefix image (level0 only)
    meta = None
    n_groups = 1
    if level0 and bits.read(1):
        hb = bits.read(3) + 2
        mw, mh = _sub(xsize, hb), _sub(h, hb)
        meta_img, _ = _decode_image_stream(bits, mw, mh, False)
        idx = ((meta_img >> 8) & 0xFFFF).astype(np.int64)
        n_groups = int(idx.max()) + 1
        meta = (hb, idx)
    green_size = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _read_code(bits, green_size),
                _read_code(bits, 256),
                _read_code(bits, 256),
                _read_code(bits, 256),
                _read_code(bits, 40),
            )
        )
    # pixel loop
    cache = [0] * (1 << cache_bits) if cache_bits else None
    n = xsize * h
    px = np.zeros(n, dtype=np.uint32)
    pos = 0
    cur_group = groups[0]
    while pos < n:
        x, y = pos % xsize, pos // xsize
        if meta is not None:
            hb, idx = meta
            cur_group = groups[int(idx[y >> hb, x >> hb])]
        g, r_c, b_c, a_c, d_c = cur_group
        sym = g.decode(bits)
        if sym < 256:  # literal
            red = r_c.decode(bits)
            blue = b_c.decode(bits)
            alpha = a_c.decode(bits)
            argb = (alpha << 24) | (red << 16) | (sym << 8) | blue
            px[pos] = argb
            if cache is not None:
                cache[_cache_hash(argb, cache_bits)] = argb
            pos += 1
        elif sym < 256 + 24:  # backward reference
            length = _prefix_value(sym - 256, bits)
            dcode = d_c.decode(bits)
            dist = _plane_to_dist(_prefix_value(dcode, bits), xsize)
            if dist > pos or pos + length > n:
                raise ValueError("vp8l: backref out of range")
            for _ in range(length):
                argb = int(px[pos - dist])
                px[pos] = argb
                if cache is not None:
                    cache[_cache_hash(argb, cache_bits)] = argb
                pos += 1
        else:  # color cache
            if cache is None:
                raise ValueError("vp8l: cache symbol without cache")
            px[pos] = cache[sym - 256 - 24]
            pos += 1
    return px.reshape(h, xsize), transforms


def _sub(size: int, bits_: int) -> int:
    return (size + (1 << bits_) - 1) >> bits_


def _add_argb(a, b) -> np.uint32:
    """Per-channel modular byte add of two ARGB words."""
    a, b = int(a), int(b)
    out = 0
    for sh in (0, 8, 16, 24):
        out |= (((a >> sh) + (b >> sh)) & 0xFF) << sh
    return np.uint32(out)


# ------------------------------------------------- inverse transforms


def _split(px: np.ndarray):
    return (
        (px >> 24) & 0xFF,
        (px >> 16) & 0xFF,
        (px >> 8) & 0xFF,
        px & 0xFF,
    )


def _join(a, r, g, b) -> np.ndarray:
    return (
        (a.astype(np.uint32) << 24)
        | (r.astype(np.uint32) & 0xFF) << 16
        | (g.astype(np.uint32) & 0xFF) << 8
        | (b.astype(np.uint32) & 0xFF)
    )


def _avg2(a: int, b: int, sh: int) -> int:
    return (((a >> sh) & 0xFF) + ((b >> sh) & 0xFF)) >> 1


def _average2(a: int, b: int) -> int:
    return (
        (_avg2(a, b, 24) << 24)
        | (_avg2(a, b, 16) << 16)
        | (_avg2(a, b, 8) << 8)
        | _avg2(a, b, 0)
    )


def _clip255(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _select(t: int, l, tl: int) -> int:
    s = 0
    for sh in (24, 16, 8, 0):
        tc, lc, tlc = (t >> sh) & 0xFF, (l >> sh) & 0xFF, (tl >> sh) & 0xFF
        s += abs(lc - tlc) - abs(tc - tlc)
    return t if s <= 0 else l


def _cas_full(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        c = _clip255(((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF))
        out |= c << sh
    return out


def _cas_half(ave: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 0xFF
        d = a - ((tl >> sh) & 0xFF)
        # C truncation toward zero, not Python floor
        c = _clip255(a + int(d / 2))
        out |= c << sh
    return out


def _predict(mode: int, l: int, t: int, tr: int, tl: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _average2(_average2(l, tr), t)
    if mode == 6:
        return _average2(l, tl)
    if mode == 7:
        return _average2(l, t)
    if mode == 8:
        return _average2(tl, t)
    if mode == 9:
        return _average2(t, tr)
    if mode == 10:
        return _average2(_average2(l, tl), _average2(t, tr))
    if mode == 11:
        return _select(t, l, tl)
    if mode == 12:
        return _cas_full(l, t, tl)
    if mode == 13:
        return _cas_half(_average2(l, t), tl)
    raise ValueError(f"vp8l: predictor mode {mode}")


def _inv_predictor(px: np.ndarray, size_bits: int, modes: np.ndarray) -> np.ndarray:
    h, w = px.shape
    out = px.copy()
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(out[0, x - 1])  # L
            elif x == 0:
                pred = int(out[y - 1, 0])  # T
            else:
                mode = int(modes[y >> size_bits, x >> size_bits] >> 8) & 0xFF
                l = int(out[y, x - 1])
                t = int(out[y - 1, x])
                # At the rightmost column the spec's TR offset
                # ((y-1)*w + x+1) wraps to (y*w + 0): the CURRENT row's
                # leftmost pixel, which is already decoded (x > 0 here).
                tr = int(out[y - 1, x + 1]) if x + 1 < w else int(out[y, 0])
                tl = int(out[y - 1, x - 1])
                pred = _predict(mode, l, t, tr, tl)
            out[y, x] = _add_argb(out[y, x], pred)
    return out


def _ct_delta(t: np.ndarray, c: np.ndarray) -> np.ndarray:
    """((int8)t * (int8)c) >> 5 — arithmetic, per the spec."""
    ts = t.astype(np.int64)
    ts = np.where(ts > 127, ts - 256, ts)
    cs = c.astype(np.int64) & 0xFF
    cs = np.where(cs > 127, cs - 256, cs)
    return (ts * cs) >> 5


def _inv_color_transform(
    px: np.ndarray, size_bits: int, elems: np.ndarray
) -> np.ndarray:
    h, w = px.shape
    ys = (np.arange(h)[:, None] >> size_bits).repeat(w, 1)
    xs = (np.arange(w)[None, :] >> size_bits).repeat(h, 0)
    e = elems[ys, xs]
    g2r = e & 0xFF
    g2b = (e >> 8) & 0xFF
    r2b = (e >> 16) & 0xFF
    a, r, g, b = _split(px)
    r = (r.astype(np.int64) + _ct_delta(g2r, g)) & 0xFF
    b_ = (b.astype(np.int64) + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
    return _join(a, r, g, b_)


def _inv_subtract_green(px: np.ndarray) -> np.ndarray:
    a, r, g, b = _split(px)
    return _join(a, (r + g) & 0xFF, g, (b + g) & 0xFF)


def _inv_color_index(
    px: np.ndarray, n_colors: int, pal: np.ndarray, width_bits: int, w: int
) -> np.ndarray:
    h = px.shape[0]
    if width_bits:
        per = 1 << width_bits
        bits_pp = 8 >> width_bits
        mask = (1 << bits_pp) - 1
        g = ((px >> 8) & 0xFF).astype(np.int64)
        out_idx = np.zeros((h, w), dtype=np.int64)
        for i in range(per):
            xs = np.arange(px.shape[1]) * per + i
            sel = xs < w
            out_idx[:, xs[sel]] = (g[:, sel] >> (i * bits_pp)) & mask
    else:
        out_idx = ((px >> 8) & 0xFF).astype(np.int64)
    safe = np.where(out_idx < n_colors, out_idx, 0)
    mapped = pal[safe]
    return np.where(out_idx < n_colors, mapped, np.uint32(0)).astype(np.uint32)


def decode_vp8l(stream: bytes) -> np.ndarray:
    """VP8L bitstream → (H, W, 3) uint8 RGB (alpha dropped)."""
    if not stream or stream[0] != 0x2F:
        raise ValueError("vp8l: bad signature")
    bits = _BitReader(stream, 1)
    w = bits.read(14) + 1
    h = bits.read(14) + 1
    bits.read(1)  # alpha hint
    if bits.read(3) != 0:
        raise ValueError("vp8l: unknown version")
    px, transforms = _decode_image_stream(bits, w, h, True)
    for t, data in reversed(transforms):
        if t == 3:
            n_colors, pal, width_bits = data
            px = _inv_color_index(px, n_colors, pal, width_bits, w)
        elif t == 2:
            px = _inv_subtract_green(px)
        elif t == 1:
            px = _inv_color_transform(px, *data)
        else:
            px = _inv_predictor(px, *data)
    a, r, g, b = _split(px)
    return np.stack(
        [r.astype(np.uint8), g.astype(np.uint8), b.astype(np.uint8)], axis=-1
    )


def decode_webp(payload: bytes) -> np.ndarray:
    """RIFF/WEBP container → RGB. Lossless (VP8L) decodes here; lossy
    VP8 raises ``NotImplementedError`` naming the variant (a full VP8
    intra decoder — boolean arithmetic coding + loop filter — stays
    behind the honest boundary; Pillow remains the ``prefer='auto'``
    upgrade path)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WEBP container")
    off = 12
    while off + 8 <= len(payload):
        tag = payload[off : off + 4]
        (size,) = struct.unpack_from("<I", payload, off + 4)
        body = payload[off + 8 : off + 8 + size]
        if tag == b"VP8L":
            return decode_vp8l(body)
        if tag == b"VP8 ":
            raise NotImplementedError(
                "lossy VP8 webp decode unsupported (VP8L lossless decodes "
                "here; route through Pillow via prefer='auto' for lossy)"
            )
        off += 8 + size + (size & 1)
    raise ValueError("WEBP container carries no VP8L/VP8 chunk")


# ------------------------------------------------------------- encoder


def _length_limited_lengths(freqs: dict[int, int], max_len: int = 15) -> dict[int, int]:
    """Huffman code lengths from frequencies (package-merge-free: plain
    Huffman, lengths re-limited by the simple overflow fixup — fixture
    scale, not a production entropy coder)."""
    syms = [s for s, f in freqs.items() if f > 0]
    if not syms:
        return {}
    if len(syms) == 1:
        return {syms[0]: 1}
    import heapq

    heap = [(f, i, (s,)) for i, (s, f) in enumerate(sorted(freqs.items())) if f > 0]
    heapq.heapify(heap)
    depth = {s: 0 for s in syms}
    uid = len(heap)
    while len(heap) > 1:
        f1, _, g1 = heapq.heappop(heap)
        f2, _, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, uid, g1 + g2))
        uid += 1
    # overflow fixup (rare at fixture scale)
    while max(depth.values()) > max_len:
        over = [s for s, d in depth.items() if d > max_len]
        for s in over:
            depth[s] = max_len
        # rebalance Kraft by deepening the shallowest leaf
        while sum(2 ** -d for d in depth.values()) > 1.0:
            sh = min(depth, key=lambda s: depth[s])
            depth[sh] += 1
    return depth


def _write_code_lengths(
    bw: _BitWriter, lengths: list[int]
) -> None:
    """Emit a NORMAL code: code-length code + plain symbol lengths
    (no 16/17/18 repeats except long zero runs via 17/18)."""
    # build the code-length symbol stream
    stream: list[tuple[int, int, int]] = []  # (cl symbol, extra, extra bits)
    i, n = 0, len(lengths)
    while i < n:
        if lengths[i] == 0:
            j = i
            while j < n and lengths[j] == 0:
                j += 1
            run = j - i
            if run < 3:
                for _ in range(run):
                    stream.append((0, 0, 0))
            else:
                while run >= 3:
                    take = min(run, 138)
                    if take >= 11:
                        stream.append((18, take - 11, 7))
                    else:
                        stream.append((17, take - 3, 3))
                    run -= take
                for _ in range(run):
                    stream.append((0, 0, 0))
            i = j
        else:
            stream.append((lengths[i], 0, 0))
            i += 1
    cl_freq: dict[int, int] = {}
    for s, _, _ in stream:
        cl_freq[s] = cl_freq.get(s, 0) + 1
    cl_len_map = _length_limited_lengths(cl_freq, 7)
    if len(cl_len_map) == 1:
        # the cl code must still decode; give the lone symbol length 1
        # by adding a never-used second symbol
        lone = next(iter(cl_len_map))
        other = 0 if lone != 0 else 1
        cl_len_map = {lone: 1, other: 1}
    cl_lengths = [cl_len_map.get(s, 0) for s in range(19)]
    # order-trimmed emission
    order_pos = {s: i for i, s in enumerate(_CL_ORDER)}
    last = max(order_pos[s] for s in range(19) if cl_lengths[s] > 0)
    n_cl = max(4, last + 1)
    bw.write(n_cl - 4, 4)
    for i in range(n_cl):
        bw.write(cl_lengths[_CL_ORDER[i]], 3)
    bw.write(0, 1)  # no max-symbol short-circuit
    cl_codes = _canonical_codes(cl_lengths)
    for s, extra, nbits in stream:
        code, length = cl_codes[s]
        bw.write_code(code, length)
        if nbits:
            bw.write(extra, nbits)


def _write_code(bw: _BitWriter, freqs: dict[int, int], alphabet: int):
    """Emit one prefix code; → symbol → (code, len) for payload writes."""
    used = {s: f for s, f in freqs.items() if f > 0}
    if len(used) <= 2 and all(s < 256 for s in used):
        bw.write(1, 1)  # simple
        syms = sorted(used)
        bw.write(len(syms) - 1, 1)
        if syms[0] > 1:
            bw.write(1, 1)
            bw.write(syms[0], 8)
        else:
            bw.write(0, 1)
            bw.write(syms[0], 1)
        if len(syms) == 2:
            bw.write(syms[1], 8)
        if len(syms) == 1:
            return {syms[0]: (0, 0)}
        return {syms[0]: (0, 1), syms[1]: (1, 1)}
    bw.write(0, 1)  # normal
    len_map = _length_limited_lengths(used)
    lengths = [len_map.get(s, 0) for s in range(alphabet)]
    _write_code_lengths(bw, lengths)
    return _canonical_codes(lengths)


def _encode_pixels(
    bw: _BitWriter,
    px: np.ndarray,
    use_backrefs: bool,
    cache_bits: int,
    level0: bool,
) -> None:
    """Emit one image stream (cache header, [meta bit], 5 codes,
    token payload) for a flat ARGB vector."""
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if level0:
        bw.write(0, 1)  # no meta prefix image
    # tokenize
    tokens = []  # ('lit', argb) | ('ref', length) | ('cache', idx)
    cache = [None] * (1 << cache_bits) if cache_bits else None
    i, n = 0, len(px)
    while i < n:
        v = int(px[i])
        if use_backrefs and i > 0 and v == int(px[i - 1]):
            j = i
            while j < n and int(px[j]) == int(px[i - 1]):
                j += 1
            tokens.append(("ref", j - i))
            if cache is not None:
                cache[_cache_hash(v, cache_bits)] = v
            i = j
            continue
        if cache is not None:
            hsh = _cache_hash(v, cache_bits)
            if cache[hsh] == v:
                tokens.append(("cache", hsh))
                i += 1
                continue
            cache[hsh] = v
        tokens.append(("lit", v))
        i += 1
    # frequencies
    gfreq: dict[int, int] = {}
    rfreq: dict[int, int] = {}
    bfreq: dict[int, int] = {}
    afreq: dict[int, int] = {}
    dfreq: dict[int, int] = {}
    dist1_code, dist1_extra, dist1_nbits = _prefix_encode(
        _PLANE_INDEX[(1, 0)] + 1
    )
    for kind, val in tokens:
        if kind == "lit":
            gfreq[(val >> 8) & 0xFF] = gfreq.get((val >> 8) & 0xFF, 0) + 1
            rfreq[(val >> 16) & 0xFF] = rfreq.get((val >> 16) & 0xFF, 0) + 1
            bfreq[val & 0xFF] = bfreq.get(val & 0xFF, 0) + 1
            afreq[(val >> 24) & 0xFF] = afreq.get((val >> 24) & 0xFF, 0) + 1
        elif kind == "ref":
            code, _, _ = _prefix_encode(val)
            gfreq[256 + code] = gfreq.get(256 + code, 0) + 1
            dfreq[dist1_code] = dfreq.get(dist1_code, 0) + 1
        else:
            gfreq[256 + 24 + val] = gfreq.get(256 + 24 + val, 0) + 1
    if not dfreq:
        dfreq[0] = 1  # the distance code must exist even if unused
    green_size = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    gc = _write_code(bw, gfreq, green_size)
    rc = _write_code(bw, rfreq, 256)
    bc = _write_code(bw, bfreq, 256)
    ac = _write_code(bw, afreq, 256)
    dc = _write_code(bw, dfreq, 40)
    for kind, val in tokens:
        if kind == "lit":
            bw.write_code(*gc[(val >> 8) & 0xFF])
            bw.write_code(*rc[(val >> 16) & 0xFF])
            bw.write_code(*bc[val & 0xFF])
            bw.write_code(*ac[(val >> 24) & 0xFF])
        elif kind == "ref":
            code, extra, nbits = _prefix_encode(val)
            bw.write_code(*gc[256 + code])
            if nbits:
                bw.write(extra, nbits)
            bw.write_code(*dc[dist1_code])
            if dist1_nbits:
                bw.write(dist1_extra, dist1_nbits)
        else:
            bw.write_code(*gc[256 + 24 + val])


def encode_webp_lossless(
    arr: np.ndarray,
    use_backrefs: bool = False,
    cache_bits: int = 0,
    transform: str | None = None,
) -> bytes:
    """(H, W, 3) uint8 → RIFF/WEBP with one VP8L lossless chunk.

    Fixture-grade but fully spec-shaped: real canonical prefix codes
    from the image's actual symbol frequencies; ``use_backrefs=True``
    additionally RLE-compresses runs of the previous pixel as dist-1
    LZ77 references (plane code through the neighborhood table);
    ``cache_bits>0`` routes repeated colors through the color cache;
    ``transform`` in {None, 'subtract_green', 'palette'} emits the
    corresponding VP8L transform (palette includes sub-byte pixel
    bundling at ≤16 colors, with the delta-coded palette image) — so
    round-trips cover the literal/backref/cache branches, the code
    machinery, and both emitted inverse transforms."""
    a = np.asarray(arr, dtype=np.uint8)
    h, w = a.shape[:2]
    px2 = _join(
        np.full((h, w), 255, np.uint32),
        a[:, :, 0].astype(np.uint32),
        a[:, :, 1].astype(np.uint32),
        a[:, :, 2].astype(np.uint32),
    )
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # no alpha hint
    bw.write(0, 3)  # version
    if transform == "subtract_green":
        bw.write(1, 1)
        bw.write(2, 2)  # SUBTRACT_GREEN
        aa, r, g, b = _split(px2)
        px2 = _join(aa, (r - g) & 0xFF, g, (b - g) & 0xFF)
        bw.write(0, 1)  # no more transforms
    elif transform == "palette":
        colors = list(dict.fromkeys(int(v) for v in px2.reshape(-1)))
        if len(colors) > 256:
            raise ValueError("palette transform needs <=256 colors")
        n_colors = len(colors)
        index = {c: i for i, c in enumerate(colors)}
        bw.write(1, 1)
        bw.write(3, 2)  # COLOR_INDEXING
        bw.write(n_colors - 1, 8)
        # delta-coded palette as a 1×n sub-image (no meta bit)
        deltas, prev = [], 0
        for c in colors:
            d = 0
            for sh in (0, 8, 16, 24):
                d |= (((c >> sh) - (prev >> sh)) & 0xFF) << sh
            deltas.append(d)
            prev = c
        _encode_pixels(
            bw, np.asarray(deltas, np.uint32), False, 0, level0=False
        )
        if n_colors <= 2:
            width_bits = 3
        elif n_colors <= 4:
            width_bits = 2
        elif n_colors <= 16:
            width_bits = 1
        else:
            width_bits = 0
        idx = np.vectorize(index.__getitem__)(px2).astype(np.uint32)
        if width_bits:
            per = 1 << width_bits
            bits_pp = 8 >> width_bits
            xs = _sub(w, width_bits)
            packed = np.zeros((h, xs), np.uint32)
            for i in range(per):
                src = np.arange(xs) * per + i
                sel = src < w
                packed[:, sel] |= idx[:, src[sel]] << (i * bits_pp)
            px2 = np.uint32(0xFF000000) | (packed << 8)
        else:
            px2 = np.uint32(0xFF000000) | (idx << 8)
        bw.write(0, 1)  # no more transforms
    elif transform is not None:
        raise ValueError(f"unsupported encoder transform {transform!r}")
    else:
        bw.write(0, 1)  # no transforms
    _encode_pixels(
        bw, px2.reshape(-1), use_backrefs, cache_bits, level0=True
    )
    stream = bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(stream)) + stream
    if len(stream) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
