"""Pure-stdlib image codec: PNG (zlib), BMP, PPM — no optional deps.

Why this exists: the engine's multimodal surface (operators/multimodal.py)
must decode real image payloads, but the container has no Pillow. PNG is
deflate + per-scanline filtering — both fully decodable with stdlib
``zlib`` + numpy. This module provides REAL pixel decoding for the three
formats a training-data pipeline most often stores losslessly (PNG, BMP,
PPM), plus a PNG encoder and a deterministic nearest-neighbor resize, so
``decode → transform → re-encode`` runs end-to-end with zero optional
dependencies. Baseline JPEG lives in the sibling ``jpegcodec`` module
(also stdlib+numpy — baseline AND progressive SOF2) and is routed
through ``decode_image_bytes``; WebP raises ``NotImplementedError`` with
Pillow as the optional upgrade path.

Everything here is per-item CPU work executed inside Arrow-batched
``mapInPandas`` loops (see multimodal.py) — the Spark-side contract
(schema, batching, partitioning) is unchanged by which decoder runs.

Format support (decode):
- PNG: 8-bit depth; color types 0 (gray), 2 (RGB), 3 (palette),
  4 (gray+alpha), 6 (RGBA); all five scanline filters (None/Sub/Up/
  Average/Paeth); non-interlaced. 16-bit and Adam7 raise.
- BMP: uncompressed 24/32-bit BI_RGB, bottom-up or top-down.
- PPM: binary P6, maxval 255.

All decodes return ``(H, W, 3) uint8`` RGB (alpha composited over white,
matching Pillow's ``convert("RGB")`` on a white background intent; we
drop alpha by compositing so downstream features are deterministic).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# bytes per pixel on the wire for each PNG color type at bit depth 8
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """PNG Paeth predictor, vectorized over one scanline's prior bytes."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def _unfilter(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filtering → (height, stride) uint8 of raw samples.

    Scanlines are sequential (each depends on the fully reconstructed
    previous line) but within a line the Sub/Paeth recurrences step by
    ``bpp``, so we vectorize across the ``bpp`` byte lanes and loop only
    over ``stride // bpp`` positions — numpy does the per-lane work.

    Size bound: Sub/Average/Paeth lines still cost O(W) Python loop
    iterations, ~1-2 ms per megapixel-row-set — fine for the test-scale
    payloads this repo decodes. Corpus-scale image pipelines should route
    decode through Pillow/turbojpeg when present; this codec's job is a
    dependency-free exact reference.
    """
    if len(raw) < height * (stride + 1):
        raise ValueError("PNG data truncated")
    data = np.frombuffer(raw, dtype=np.uint8)[: height * (stride + 1)]
    data = data.reshape(height, stride + 1)
    filters = data[:, 0]
    lines = data[:, 1:].copy()
    prev = np.zeros(stride, dtype=np.uint8)
    zero_lane = np.zeros(bpp, dtype=np.uint8)
    for y in range(height):
        f, line = int(filters[y]), lines[y]
        if f == 0:  # None
            pass
        elif f == 1:  # Sub: left recurrence, lane-vectorized
            for x in range(bpp, stride, bpp):
                line[x : x + bpp] += line[x - bpp : x]
        elif f == 2:  # Up
            line += prev
        elif f == 3:  # Average
            line[:bpp] += (prev[:bpp] // 2).astype(np.uint8)
            for x in range(bpp, stride, bpp):
                avg = (
                    line[x - bpp : x].astype(np.uint16)
                    + prev[x : x + bpp].astype(np.uint16)
                ) // 2
                line[x : x + bpp] += avg.astype(np.uint8)
        elif f == 4:  # Paeth
            line[:bpp] += _paeth(zero_lane, prev[:bpp], zero_lane)
            for x in range(bpp, stride, bpp):
                line[x : x + bpp] += _paeth(
                    line[x - bpp : x], prev[x : x + bpp], prev[x - bpp : x]
                )
        else:
            raise ValueError(f"bad PNG filter type {f}")
        prev = line
    return lines


def _to_rgb(px: np.ndarray, color_type: int, palette: bytes | None) -> np.ndarray:
    """(H, W, C) samples for the PNG color type → (H, W, 3) RGB uint8,
    alpha composited over white."""
    if color_type == 2:
        return px
    if color_type == 0:
        return np.repeat(px, 3, axis=2)
    if color_type == 3:
        if palette is None:
            raise ValueError("paletted PNG missing PLTE chunk")
        pal = np.frombuffer(palette, dtype=np.uint8).reshape(-1, 3)
        return pal[px[:, :, 0]]
    # alpha formats: composite over white so output is deterministic RGB
    alpha = px[:, :, -1:].astype(np.float32) / 255.0
    color = px[:, :, :-1].astype(np.float32)
    if color_type == 4:
        color = np.repeat(color, 3, axis=2)
    out = color * alpha + 255.0 * (1.0 - alpha)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (H, W, 3) uint8 RGB. Stdlib zlib + numpy only."""
    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG (bad signature)")
    off, width = len(_PNG_SIG), None
    idat, palette = [], None
    height = bit_depth = color_type = interlace = None
    while off + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, off)
        ctype = payload[off + 4 : off + 8]
        body = payload[off + 8 : off + 8 + length]
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"PLTE":
            palette = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        off += 12 + length  # length + type + body + CRC
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8:
        raise NotImplementedError(f"PNG bit depth {bit_depth} unsupported (8 only)")
    if interlace != 0:
        raise NotImplementedError("interlaced (Adam7) PNG unsupported")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"bad PNG color type {color_type}")
    channels = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(b"".join(idat))
    lines = _unfilter(raw, height, width * channels, channels)
    px = lines.reshape(height, width, channels)
    return _to_rgb(px, color_type, palette)


def encode_png(arr: np.ndarray, level: int = 6) -> bytes:
    """(H, W, 3) uint8 RGB → PNG bytes (filter type 0, one IDAT chunk)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_png expects (H, W, 3) uint8")
    h, w, _ = arr.shape

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    scanlines = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scanlines, level))
        + chunk(b"IEND", b"")
    )


def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP → (H, W, 3) uint8 RGB: uncompressed 24/32-bit BI_RGB, plus
    16/32-bit BI_BITFIELDS (compression=3 — the channel-mask layout
    32bpp BGRA files in the wild overwhelmingly use; found live by
    CPython's external ``python.bmp`` fixture, which is 32bpp
    BITFIELDS, round 15). Masks sit at file offset 54 for every header
    ≥ BITMAPINFOHEADER: a 40-byte header is followed by three DWORD
    masks, and the V4/V5 headers embed their RGBA masks at the same
    byte positions. Each channel extracts by mask+shift and rescales
    its mask width to 0-255 (round-half-up, Netpbm-style)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP unsupported")
    width, height = struct.unpack_from("<ii", payload, 18)
    _planes, bpp = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if not (
        (compression == 0 and bpp in (24, 32))
        or (compression == 3 and bpp in (16, 32))
    ):
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
    bottom_up = height > 0
    height = abs(height)
    nbytes = bpp // 8
    stride = (width * nbytes + 3) // 4 * 4  # rows pad to 4 bytes
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=height * stride, offset=data_off
    ).reshape(height, stride)
    if compression == 3:
        rm, gm, bm = struct.unpack_from("<III", payload, 54)
        if rm == 0 or gm == 0 or bm == 0:
            raise ValueError("BI_BITFIELDS BMP with a zero channel mask")
        words = np.ascontiguousarray(rows[:, : width * nbytes]).view(
            np.uint16 if bpp == 16 else np.uint32
        ).reshape(height, width).astype(np.uint32)

        def chan(mask: int) -> np.ndarray:
            shift = (mask & -mask).bit_length() - 1
            maxv = mask >> shift
            v = (words & np.uint32(mask)) >> np.uint32(shift)
            if maxv != 255:
                v = (v * 255 + maxv // 2) // maxv
            return v.astype(np.uint8)

        rgb = np.dstack([chan(rm), chan(gm), chan(bm)])
    else:
        px = rows[:, : width * nbytes].reshape(height, width, nbytes)
        rgb = px[:, :, 2::-1]  # BGR(A) → RGB
    if bottom_up:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


def decode_ppm(payload: bytes) -> np.ndarray:
    """Netpbm family → (H, W, 3) uint8 RGB.

    The full anymap set (r15 — CPython's external ``python.pgm`` /
    ``python.pbm`` fixtures exposed the P6-only gap): binary P6 (RGB),
    P5 (gray, replicated to RGB), P4 (bilevel, 8 packed pixels/byte,
    1 = BLACK per PBM semantics), and the ASCII forms P3/P2/P1.
    maxval ≤ 255; samples rescale as fractions of maxval
    (round-half-up) per Netpbm semantics."""
    magic = payload[:2]
    if magic not in (b"P1", b"P2", b"P3", b"P4", b"P5", b"P6"):
        raise ValueError("not a PNM (P1–P6)")
    kind = int(magic[1:2])
    bilevel = kind in (1, 4)
    n_fields = 2 if bilevel else 3  # PBM has no maxval
    # header: magic <w> <h> [<maxval>] with comments/whitespace
    fields, pos = [], 2
    while len(fields) < n_fields:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to EOL
            while pos < len(payload) and payload[pos] not in (10, 13):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    if bilevel:
        w, h = fields
        maxval = 1
    else:
        w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PNM unsupported")
    if kind in (1, 2, 3):
        # ASCII rasters: whitespace-separated sample values (P1 allows
        # unseparated digit runs; split() handles both since each P1
        # sample is a single character — split per-token then flatten)
        toks = payload[pos:].split()
        if kind == 1:
            vals = [int(c) for t in toks for c in t.decode("ascii")]
        else:
            vals = [int(t) for t in toks]
        n = w * h * (3 if kind == 3 else 1)
        px = np.array(vals[:n], dtype=np.uint32)
    elif kind == 4:
        pos += 1  # single whitespace after the last header field
        rowbytes = (w + 7) // 8
        raw = np.frombuffer(
            payload, dtype=np.uint8, count=h * rowbytes, offset=pos
        ).reshape(h, rowbytes)
        bits = np.unpackbits(raw, axis=1)[:, :w]
        px = bits.astype(np.uint32).reshape(-1)
    else:  # P5 / P6 binary
        pos += 1  # single whitespace after maxval
        n = w * h * (3 if kind == 6 else 1)
        px = np.frombuffer(
            payload, dtype=np.uint8, count=n, offset=pos
        ).astype(np.uint32)
    if bilevel:
        # PBM: 1 = black, 0 = white
        px = np.where(px != 0, np.uint32(0), np.uint32(255))
    elif maxval != 255:
        # Netpbm semantics: samples are fractions of maxval — rescale to
        # 0-255 with round-half-up so e.g. maxval=15 white stays white
        px = (px * 255 + maxval // 2) // maxval
    px = px.astype(np.uint8)
    if kind in (3, 6):
        return px.reshape(h, w, 3).copy()
    gray = px.reshape(h, w)
    return np.ascontiguousarray(np.repeat(gray[:, :, None], 3, axis=2))


def _gif_lzw_decode(
    data: bytes, min_code_size: int, expected: int
) -> np.ndarray:
    """GIF-variant LZW → palette-index array of length ``expected``.
    Codes pack LSB-first into the byte stream; the table resets on
    CLEAR and code width grows at 2^width up to 12 bits."""
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    # table as list of tuples; entries < clear are literals
    base = [(i,) for i in range(clear)] + [(), ()]
    table = list(base)
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    acc = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < code_size:
            if pos >= len(data):
                # truncated stream: tolerate, like most consumers
                return np.array(out[:expected], dtype=np.uint16)
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and table[code]:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + (prev[0],)  # the KwKwK case
        else:
            raise ValueError(f"corrupt GIF LZW stream (code {code})")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + (entry[0],))
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
        if len(out) >= expected:
            break
    return np.array(out[:expected], dtype=np.uint16)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF87a/89a FIRST FRAME → (H, W, 3) uint8 RGB (r15 — closes the
    ValueError boundary CPython's external ``python.gif`` fixture sat
    behind): logical-screen canvas, global/local color tables, the
    full LZW decode (LSB-first packing, CLEAR resets, KwKwK), and
    4-pass interlace reordering. Extensions (including GCE
    transparency) are skipped — the first frame renders its palette
    colors as stored, animation frames beyond the first are ignored
    (single-image semantics, the corpus-pipeline contract)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    W, H = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(
            payload, dtype=np.uint8, count=3 * n, offset=pos
        ).reshape(n, 3)
        pos += 3 * n
    canvas = np.zeros((H, W, 3), dtype=np.uint8)
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise ValueError(f"corrupt GIF (block 0x{b0:02x})")
        left, top, w, h = struct.unpack_from("<HHHH", payload, pos + 1)
        ipacked = payload[pos + 9]
        pos += 10
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(
                payload, dtype=np.uint8, count=3 * n, offset=pos
            ).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image with no color table")
        min_code = payload[pos]
        pos += 1
        chunks = []
        while pos < len(payload) and payload[pos] != 0:
            ln = payload[pos]
            chunks.append(payload[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = _gif_lzw_decode(b"".join(chunks), min_code, w * h)
        if len(idx) < w * h:  # truncated raster: pad with index 0
            idx = np.concatenate(
                [idx, np.zeros(w * h - len(idx), dtype=np.uint16)]
            )
        rows = np.clip(idx.reshape(h, w), 0, len(pal) - 1)
        if ipacked & 0x40:  # interlaced: reorder the 4 passes
            ordered = np.empty_like(rows)
            src = 0
            for start, step in _GIF_INTERLACE_PASSES:
                n_rows = len(range(start, h, step))
                ordered[start::step] = rows[src : src + n_rows]
                src += n_rows
            rows = ordered
        frame = pal[rows]
        canvas[top : top + h, left : left + w] = frame
        return canvas  # FIRST frame only, by contract
    raise ValueError("GIF with no image data")


def encode_gif_minimal(arr: np.ndarray) -> bytes:
    """Test-support GIF89a encoder: palette built from the array's
    distinct colors (≤ 256), raster emitted as 'uncompressed' LZW
    (a CLEAR before every literal keeps the code width fixed — valid
    LZW any decoder accepts). Exists so gates/tests can round-trip
    deterministic closed-form images; not a production write path."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_gif_minimal wants (H, W, 3) uint8")
    h, w = arr.shape[:2]
    flat = arr.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("more than 256 distinct colors")
    bits = max(2, int(len(colors) - 1).bit_length())
    table_n = 1 << bits
    pal = np.zeros((table_n, 3), dtype=np.uint8)
    pal[: len(colors)] = colors
    out = [
        b"GIF89a",
        struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0),
        pal.tobytes(),
        b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0),
        bytes([bits]),
    ]
    clear, eoi = 1 << bits, (1 << bits) + 1
    code_size = bits + 1
    acc = nbits = 0
    stream = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    for v in idx:
        emit(int(v))
        emit(clear)  # keep the table (and code width) fixed
    emit(eoi)
    if nbits:
        stream.append(acc & 0xFF)
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out.append(bytes([len(chunk)]) + bytes(chunk))
    out.append(b"\x00\x3b")
    return b"".join(out)


def sniff_format(payload: bytes) -> str | None:
    """Identify the payload's image container from magic bytes."""
    if payload.startswith(_PNG_SIG):
        return "png"
    if payload[:2] == b"BM":
        return "bmp"
    if (
        len(payload) > 2
        and payload[0:1] == b"P"
        and payload[1:2] in b"123456"
        and payload[2:3].isspace()
    ):
        return "ppm"  # whole Netpbm family routes to decode_ppm
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        return "webp"
    return None


def _pil_image():
    """Pillow's Image module when importable, else None (lazy probe —
    the container this repo tests in has no Pillow; real deployments
    often do)."""
    try:
        from PIL import Image

        return Image
    except Exception:  # noqa: BLE001 — absence or broken install both mean "no"
        return None


def decode_image_bytes(payload: bytes, prefer: str = "stdlib") -> np.ndarray:
    """Sniff + decode any supported format → (H, W, 3) uint8 RGB.

    ``prefer='stdlib'`` (default): the exact, dependency-free reference
    codecs — PNG/BMP/PPM decode here; JPEG (baseline + progressive)
    routes to ``jpegcodec``; lossless WebP (VP8L) routes to
    ``webpcodec`` (all stdlib+numpy). Raises
    ``NotImplementedError`` for recognized-but-unsupported variants
    (lossy VP8 WebP, arithmetic-coded JPEG — Pillow remains the
    upgrade path) and
    ``ValueError`` for unrecognized bytes. Every oracle-checked query
    pins this path: its output is bit-deterministic everywhere.

    ``prefer='auto'``: route through Pillow when importable — C-speed
    libjpeg is the corpus-scale throughput path and also unlocks
    WebP/arithmetic JPEG — falling back to the stdlib codecs when
    Pillow is absent or rejects the payload. NOT bit-identical to the
    reference for lossy formats (libjpeg's IDCT differs) or
    alpha-compositing corner cases; a throughput knob, never the
    oracle path.
    """
    if prefer not in ("stdlib", "auto"):
        raise ValueError(f"unknown prefer {prefer!r}")
    if prefer == "auto":
        Image = _pil_image()
        if Image is not None:
            import io

            try:
                return np.asarray(
                    Image.open(io.BytesIO(payload or b"")).convert("RGB"),
                    dtype=np.uint8,
                )
            except Exception:  # noqa: BLE001 — let the exact path decide
                pass
    fmt = sniff_format(payload or b"")
    if fmt == "png":
        return decode_png(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    if fmt == "ppm":
        return decode_ppm(payload)
    if fmt == "gif":
        return decode_gif(payload)
    if fmt == "jpeg":
        from data_engineering_capstone_project__spark.operators import (
            jpegcodec,
        )

        return jpegcodec.decode_jpeg(payload)
    if fmt == "webp":
        from data_engineering_capstone_project__spark.operators import (
            webpcodec,
        )

        # lossless (VP8L) decodes from scratch (r11); lossy VP8 raises
        # NotImplementedError inside, naming the variant
        return webpcodec.decode_webp(payload)
    raise ValueError("unrecognized image payload")


def resize_nearest(arr: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize: (H, W, 3) → (th, tw, 3).

    Sample grid matches the standard pixel-center mapping
    ``src = floor((dst + 0.5) * scale)`` so results are stable across
    numpy versions (pure integer indexing, no interpolation).
    """
    h, w = arr.shape[:2]
    ys = np.minimum(((np.arange(target_h) + 0.5) * h / target_h), h - 1).astype(int)
    xs = np.minimum(((np.arange(target_w) + 0.5) * w / target_w), w - 1).astype(int)
    return arr[ys][:, xs]


def downsample_mean(arr: np.ndarray, grid: int = 4) -> np.ndarray:
    """Area-mean downsample to a (grid, grid, 3) float32 patch in [0, 1].

    Used for the 48-dim image feature when decoding without Pillow: each
    cell is the exact mean of its pixel block (uniform partition of rows/
    columns), so features are integer-exact rationals — oracle-friendly.
    """
    h, w = arr.shape[:2]
    out = np.empty((grid, grid, 3), dtype=np.float64)
    ye = np.linspace(0, h, grid + 1).astype(int)
    xe = np.linspace(0, w, grid + 1).astype(int)
    for i in range(grid):
        for j in range(grid):
            block = arr[ye[i] : ye[i + 1], xe[j] : xe[j + 1]].astype(np.float64)
            out[i, j] = block.mean(axis=(0, 1)) if block.size else 0.0
    return (out / 255.0).astype(np.float32)
