"""ISO-BMFF (MP4) sample-table parsing — stdlib only (VERDICT r10 #6).

The reference has no video surface (SURVEY.md §2 — the multimodal tier
is a north-star extension); this module is the MP4 half of the honest
video boundary: pixel DECODE of H.264 is infeasible without a codec
library (``sample_video_frames`` keeps NULL pixel columns, or routes
through PyAV when importable), but the container's SAMPLE TABLES are
plain big-endian structs, so per-frame byte sizes, exact media
timestamps, and file offsets are all derivable from the real bytes:

- ``stts``  decode deltas  → each sample's decode timestamp (DTS)
- ``stsz``  sample sizes   → each sample's encoded byte length
- ``stsc``  sample→chunk   → which chunk a sample lives in
- ``stco``/``co64`` chunk offsets → byte offset of each chunk
  (offset-of-sample = chunk offset + sizes of earlier samples in it)

``parse_mp4_sample_table`` walks ftyp/moov/trak/mdia/minf/stbl, picks
the first VIDEO track (``hdlr`` handler ``vide``; falls back to the
first track carrying a full sample table), and returns per-sample
``(dts_ms, size, offset)`` — everything a 100 TB video-corpus pipeline
needs for frame-granular sampling, dedup digests over frame payloads,
and size/bitrate statistics WITHOUT decoding a single pixel.

``encode_minimal_mp4`` writes a minimal-but-well-formed MP4 with known
sample tables — the deterministic fixture generator (the
``avicodec.encode_avi_mjpeg`` pattern) that lets tests and the
``x_video_frames`` gate check the parser SQL-exactly against planted
ground truth.
"""

from __future__ import annotations

import struct


def _walk(buf: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for each box in [start, end)."""
    off = start
    while off + 8 <= end:
        (size,) = struct.unpack_from(">I", buf, off)
        btype = buf[off + 4 : off + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            if off + 16 > end:
                return
            (size,) = struct.unpack_from(">Q", buf, off + 8)
            hdr = 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - off
        if size < hdr or off + size > end:
            return
        yield btype, off + hdr, off + size
        off += size


def _find(buf: bytes, start: int, end: int, btype: bytes):
    for t, s, e in _walk(buf, start, end):
        if t == btype:
            return s, e
    return None


def parse_mp4_sample_table(payload: bytes) -> dict | None:
    """Per-sample (dts_ms, size, offset) of the first video track.

    Returns ``{"timescale": int, "n_samples": int, "dts_ms": [int],
    "sizes": [int], "offsets": [int]}`` or None when the payload is not
    a parseable MP4 / carries no complete sample table (a bare
    moov+mvhd probe-only file, a fragmented MP4 whose samples live in
    moof boxes, ...). All values come from the actual bytes — never
    from trusted metadata columns."""
    if not payload or len(payload) < 16:
        return None
    moov = _find(payload, 0, len(payload), b"moov")
    if moov is None:
        return None
    best = None
    for t, s, e in _walk(payload, *moov):
        if t != b"trak":
            continue
        mdia = _find(payload, s, e, b"mdia")
        if mdia is None:
            continue
        mdhd = _find(payload, *mdia, b"mdhd")
        hdlr = _find(payload, *mdia, b"hdlr")
        minf = _find(payload, *mdia, b"minf")
        if mdhd is None or minf is None:
            continue
        stbl = _find(payload, *minf, b"stbl")
        if stbl is None:
            continue
        version = payload[mdhd[0]]
        try:
            if version == 1:
                (timescale,) = struct.unpack_from(">I", payload, mdhd[0] + 20)
            else:
                (timescale,) = struct.unpack_from(">I", payload, mdhd[0] + 12)
        except struct.error:
            continue
        if timescale == 0:
            continue
        tab = _parse_stbl(payload, stbl, timescale)
        if tab is None:
            continue
        handler = (
            payload[hdlr[0] + 8 : hdlr[0] + 12] if hdlr is not None else b""
        )
        if handler == b"vide":
            return tab  # the video track — done
        if best is None:
            best = tab  # fallback: first track with a full table
    return best


def _parse_stbl(buf: bytes, stbl: tuple[int, int], timescale: int) -> dict | None:
    stts = _find(buf, *stbl, b"stts")
    stsz = _find(buf, *stbl, b"stsz")
    stsc = _find(buf, *stbl, b"stsc")
    stco = _find(buf, *stbl, b"stco")
    co64 = _find(buf, *stbl, b"co64")
    if stts is None or stsz is None or stsc is None or (
        stco is None and co64 is None
    ):
        return None
    try:
        # stts: full box header (4) + entry_count + (count, delta)*
        (n_stts,) = struct.unpack_from(">I", buf, stts[0] + 4)
        dts, t = [], 0
        for i in range(n_stts):
            count, delta = struct.unpack_from(">II", buf, stts[0] + 8 + 8 * i)
            for _ in range(count):
                dts.append(t)
                t += delta
        # stsz: sample_size (uniform when nonzero) + sample_count
        uniform, n_samples = struct.unpack_from(">II", buf, stsz[0] + 4)
        if uniform:
            sizes = [uniform] * n_samples
        else:
            sizes = list(
                struct.unpack_from(f">{n_samples}I", buf, stsz[0] + 12)
            )
        # stsc: (first_chunk, samples_per_chunk, sample_desc_idx)*
        (n_stsc,) = struct.unpack_from(">I", buf, stsc[0] + 4)
        runs = [
            struct.unpack_from(">III", buf, stsc[0] + 8 + 12 * i)[:2]
            for i in range(n_stsc)
        ]
        # chunk offsets
        if stco is not None:
            (n_chunks,) = struct.unpack_from(">I", buf, stco[0] + 4)
            chunk_offs = list(
                struct.unpack_from(f">{n_chunks}I", buf, stco[0] + 8)
            )
        else:
            (n_chunks,) = struct.unpack_from(">I", buf, co64[0] + 4)
            chunk_offs = list(
                struct.unpack_from(f">{n_chunks}Q", buf, co64[0] + 8)
            )
    except struct.error:
        return None
    if len(dts) < n_samples or not chunk_offs:
        return None
    # expand sample→chunk runs (each run holds until the next
    # first_chunk), then lay samples into chunks in order
    offsets: list[int] = []
    si = 0
    for ci in range(len(chunk_offs)):
        spc = 0
        for first, per in runs:
            if ci + 1 >= first:
                spc = per
        off = chunk_offs[ci]
        for _ in range(spc):
            if si >= n_samples:
                break
            offsets.append(off)
            off += sizes[si]
            si += 1
    if si < n_samples:
        return None
    # first stsd sample-entry fourcc (r12): identifies the sample
    # CODEC — 'jpeg'/'mjpa'/'mjpb' samples are whole JPEG images the
    # stdlib JPEG path can decode; 'avc1' etc. stay size/ts-only
    codec = None
    stsd = _find(buf, *stbl, b"stsd")
    if stsd is not None and stsd[1] - stsd[0] >= 16:
        try:
            (n_entries,) = struct.unpack_from(">I", buf, stsd[0] + 4)
            if n_entries >= 1:
                codec = buf[stsd[0] + 12 : stsd[0] + 16].decode(
                    "ascii", "replace"
                )
        except struct.error:
            pass
    return {
        "timescale": timescale,
        "n_samples": n_samples,
        "dts_ms": [d * 1000 // timescale for d in dts[:n_samples]],
        "sizes": sizes,
        "offsets": offsets,
        "codec": codec,
    }


def encode_minimal_mp4(
    samples: list[bytes],
    timescale: int = 1000,
    delta: int = 250,
    sample_entry: bytes = b"avc1",
) -> bytes:
    """Deterministic MP4 fixture with REAL sample tables: ``samples``
    land concatenated in one mdat chunk; stts declares a uniform
    ``delta`` (media-timescale units) per sample; stsz/stsc/stco
    describe exactly that layout. mvhd/mdhd carry the true duration.
    Video handler (``vide``) so the parser's track selection is
    exercised, with a minimal ``avc1`` sample description. Not meant to
    be playable — meant to be BYTE-ACCOUNTABLE."""

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    n = len(samples)
    dur = n * delta
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat_payload = b"".join(samples)
    mdat = box(b"mdat", mdat_payload)
    mdat_off = len(ftyp) + 8  # absolute offset of the first sample

    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00"
        + struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, dur)
        + b"\x00" * 80,
    )
    tkhd = box(
        b"tkhd",
        b"\x00\x00\x00\x07"
        + struct.pack(">II", 0, 0)
        + struct.pack(">I", 1)  # track id
        + b"\x00" * 4
        + struct.pack(">I", dur)
        + b"\x00" * 60,
    )
    mdhd = box(
        b"mdhd",
        b"\x00\x00\x00\x00"
        + struct.pack(">II", 0, 0)
        + struct.pack(">II", timescale, dur)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = box(
        b"hdlr",
        b"\x00\x00\x00\x00" + b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"v\x00",
    )
    stsd = box(
        b"stsd",
        b"\x00\x00\x00\x00"
        + struct.pack(">I", 1)
        + box(sample_entry, b"\x00" * 78),
    )
    stts = box(
        b"stts",
        b"\x00\x00\x00\x00" + struct.pack(">III", 1, n, delta),
    )
    stsz = box(
        b"stsz",
        b"\x00\x00\x00\x00"
        + struct.pack(">II", 0, n)
        + struct.pack(f">{n}I", *[len(s) for s in samples]),
    )
    stsc = box(
        b"stsc",
        b"\x00\x00\x00\x00" + struct.pack(">IIII", 1, 1, n, 1),
    )
    stco = box(
        b"stco",
        b"\x00\x00\x00\x00" + struct.pack(">II", 1, mdat_off),
    )
    stbl = box(b"stbl", stsd + stts + stsz + stsc + stco)
    vmhd = box(b"vmhd", b"\x00\x00\x00\x01" + b"\x00" * 8)
    dref = box(
        b"dref",
        b"\x00\x00\x00\x00"
        + struct.pack(">I", 1)
        + box(b"url ", b"\x00\x00\x00\x01"),
    )
    dinf = box(b"dinf", dref)
    minf = box(b"minf", vmhd + dinf + stbl)
    mdia = box(b"mdia", mdhd + hdlr + minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
