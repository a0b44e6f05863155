"""Pure-stdlib ISO-BMFF (MP4 / QuickTime) demuxer + deterministic
muxer twin (multimodal REAL-demux path for video containers).

Box walking with 32-bit, 64-bit (``size==1`` + largesize) and
to-end-of-file (``size==0``) sizes; ``moov`` tree parsing — ``mvhd``
(movie timescale/duration, versions 0 and 1), per-track ``tkhd`` /
``mdhd`` / ``hdlr`` / ``stsd``, and the full sample-table walk:
``stts`` decode-time runs, ``stsz``/``stz2`` sample sizes, ``stsc``
sample-to-chunk runs, ``stco``/``co64`` chunk offsets and ``stss``
sync samples, resolved into one absolute (offset, size, t_ms) triple
per sample. That makes frame *extraction* — which sample is on screen
at time t, and its exact bytes — fully real for any MP4.

Frame *decoding* is real where this repo owns a codec: ``png `` and
motion-JPEG (``jpeg``/``mjpa``/``mjpb``) sample entries route to
kernels/media.decode_png and kernels/jpeg.decode_jpeg. Compressed
inter-frame codecs (``avc1``/``hvc1``/``vp09``...) genuinely need
external decoders, so their samples are returned as demuxed bitstream
bytes (real container-level frames, not byte-slice stand-ins) and the
pixel path reports None — callers fall back, as with the other
kernels.

``mux_mp4`` is the deterministic muxer twin (ftyp + mdat + moov with a
single video track, optional multi-chunk layout so the stsc/stco walk
is actually exercised) used by round-trip tests and
``synth_media_real`` — fixtures stay self-contained, no external
corpus, no ffmpeg.

Same totality contract as the sibling kernels (kernels/media.py):
anything unparseable raises ``MediaDecodeError``; same bytes give the
same samples on every executor.

The reference crawler stores fetched media as opaque bytes and never
demuxes (/root/reference has no media pipeline); this module is part
of the training-data extension the brief asks for.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from pathik_spark.kernels.media import MediaDecodeError

#: boxes whose payload is a sequence of child boxes
_CONTAINERS = frozenset(
    {"moov", "trak", "mdia", "minf", "stbl", "edts", "dinf", "udta", "mvex"}
)

#: sample-entry fourccs this repo can decode to pixels itself
DECODABLE_VIDEO_CODECS = frozenset({"png ", "jpeg", "mjpa", "mjpb"})

#: hard cap on declared table sizes — adversarial crawl payloads must
#: not allocate unbounded lists from a 4-byte count field
_MAX_TABLE = 4_000_000


def _iter_boxes(buf: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for each box in [start, end).

    Bounds-checked: a declared size that escapes the parent raises
    MediaDecodeError rather than slicing garbage.
    """
    pos = start
    while pos + 8 <= end:
        size, raw_type = struct.unpack_from(">I4s", buf, pos)
        header = 8
        if size == 1:
            if pos + 16 > end:
                raise MediaDecodeError("truncated largesize box header")
            size = struct.unpack_from(">Q", buf, pos + 8)[0]
            header = 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < header or pos + size > end:
            raise MediaDecodeError(
                f"box {raw_type!r} size {size} escapes [{pos}, {end})"
            )
        try:
            fourcc = raw_type.decode("latin1")
        except UnicodeDecodeError:  # pragma: no cover - latin1 is total
            raise MediaDecodeError("undecodable box type")
        yield fourcc, pos + header, pos + size
        pos += size


def _child(buf: bytes, start: int, end: int, fourcc: str) -> tuple[int, int] | None:
    for name, b, e in _iter_boxes(buf, start, end):
        if name == fourcc:
            return b, e
    return None


def _full_box(buf: bytes, start: int, end: int) -> tuple[int, int, int]:
    """(version, flags, body_start) of a FullBox."""
    if start + 4 > end:
        raise MediaDecodeError("truncated full box")
    version = buf[start]
    flags = int.from_bytes(buf[start + 1 : start + 4], "big")
    return version, flags, start + 4


def _u32s(buf: bytes, pos: int, n: int, end: int) -> list[int]:
    if n > _MAX_TABLE or pos + 4 * n > end:
        raise MediaDecodeError(f"table of {n} u32 entries escapes box")
    return list(struct.unpack_from(f">{n}I", buf, pos))


@dataclass
class Mp4Track:
    track_id: int
    handler: str  # 'vide' / 'soun' / ...
    codec: str  # first sample-entry fourcc
    width: int
    height: int
    timescale: int
    duration_ms: int
    #: per-sample (absolute file offset, byte size, decode time in ms)
    samples: list[tuple[int, int, int]]
    #: 1-based sync-sample indices; None = every sample is sync
    sync_samples: list[int] | None


@dataclass
class Mp4Info:
    major_brand: str
    timescale: int
    duration_ms: int
    tracks: list[Mp4Track]

    def video_track(self) -> Mp4Track | None:
        for t in self.tracks:
            if t.handler == "vide":
                return t
        return None


def _parse_stsd(buf: bytes, b: int, e: int) -> tuple[str, int, int]:
    """First sample-entry fourcc (+ width/height for visual entries)."""
    _, _, body = _full_box(buf, b, e)
    (count,) = struct.unpack_from(">I", buf, body)
    if count < 1:
        raise MediaDecodeError("empty stsd")
    entry = body + 4
    if entry + 8 > e:
        raise MediaDecodeError("truncated sample entry")
    _, raw_fourcc = struct.unpack_from(">I4s", buf, entry)
    codec = raw_fourcc.decode("latin1")
    width = height = 0
    # VisualSampleEntry: 8 header + 6 reserved + 2 dref + 16 predefined
    # then width(2) height(2)
    if entry + 36 <= e:
        width, height = struct.unpack_from(">HH", buf, entry + 32)
    return codec, width, height


def _parse_stts(buf: bytes, b: int, e: int) -> list[tuple[int, int]]:
    _, _, body = _full_box(buf, b, e)
    (count,) = struct.unpack_from(">I", buf, body)
    vals = _u32s(buf, body + 4, 2 * count, e)
    return list(zip(vals[0::2], vals[1::2]))


def _parse_stsz(buf: bytes, b: int, e: int) -> list[int]:
    _, _, body = _full_box(buf, b, e)
    fixed, count = struct.unpack_from(">II", buf, body)
    if count > _MAX_TABLE:
        raise MediaDecodeError(f"stsz declares {count} samples")
    if fixed:
        return [fixed] * count
    return _u32s(buf, body + 8, count, e)


def _parse_stsc(buf: bytes, b: int, e: int) -> list[tuple[int, int]]:
    """(first_chunk, samples_per_chunk) runs (desc index ignored)."""
    _, _, body = _full_box(buf, b, e)
    (count,) = struct.unpack_from(">I", buf, body)
    vals = _u32s(buf, body + 4, 3 * count, e)
    return [(vals[3 * i], vals[3 * i + 1]) for i in range(count)]


def _parse_stco(buf: bytes, b: int, e: int, co64: bool) -> list[int]:
    _, _, body = _full_box(buf, b, e)
    (count,) = struct.unpack_from(">I", buf, body)
    if co64:
        if count > _MAX_TABLE or body + 4 + 8 * count > e:
            raise MediaDecodeError("co64 table escapes box")
        return list(struct.unpack_from(f">{count}Q", buf, body + 4))
    return _u32s(buf, body + 4, count, e)


def _resolve_samples(
    sizes: list[int],
    stsc: list[tuple[int, int]],
    chunk_offsets: list[int],
    stts: list[tuple[int, int]],
    timescale: int,
) -> list[tuple[int, int, int]]:
    """Flatten the four tables into (offset, size, t_ms) per sample."""
    # per-sample decode timestamps from the stts runs
    times: list[int] = []
    t = 0
    for n, delta in stts:
        if n > _MAX_TABLE or len(times) + n > _MAX_TABLE:
            raise MediaDecodeError("stts run overflow")
        for _ in range(min(n, len(sizes) - len(times))):
            times.append(t * 1000 // max(timescale, 1))
            t += delta
    while len(times) < len(sizes):  # tolerate short stts: repeat last delta
        times.append(times[-1] if times else 0)

    # samples-per-chunk for each actual chunk from the stsc runs
    out: list[tuple[int, int, int]] = []
    sample = 0
    n_chunks = len(chunk_offsets)
    for run_idx, (first_chunk, per_chunk) in enumerate(stsc):
        last_chunk = (
            stsc[run_idx + 1][0] - 1 if run_idx + 1 < len(stsc) else n_chunks
        )
        for chunk in range(first_chunk, last_chunk + 1):
            if chunk < 1 or chunk > n_chunks:
                raise MediaDecodeError(f"stsc references chunk {chunk}")
            offset = chunk_offsets[chunk - 1]
            for _ in range(per_chunk):
                if sample >= len(sizes):
                    return out
                out.append((offset, sizes[sample], times[sample]))
                offset += sizes[sample]
                sample += 1
    return out


def parse_mp4(payload: bytes) -> Mp4Info:
    """Parse an ISO-BMFF file into movie + per-track sample tables.

    Totality: any malformed input raises MediaDecodeError (struct
    underruns on truncated boxes are folded into it)."""
    try:
        return _parse_mp4(payload)
    except struct.error as exc:
        raise MediaDecodeError(f"truncated box payload: {exc}") from exc


def _parse_mp4(payload: bytes) -> Mp4Info:
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise MediaDecodeError("not an ISO-BMFF file (no ftyp)")
    major_brand = payload[8:12].decode("latin1")

    moov = _child(payload, 0, len(payload), "moov")
    if moov is None:
        raise MediaDecodeError("no moov box")
    mb, me = moov

    mvhd = _child(payload, mb, me, "mvhd")
    if mvhd is None:
        raise MediaDecodeError("no mvhd box")
    version, _, body = _full_box(payload, *mvhd)
    if version == 1:
        _, _, timescale, duration = struct.unpack_from(">QQIQ", payload, body)
    else:
        _, _, timescale, duration = struct.unpack_from(">IIII", payload, body)
    duration_ms = duration * 1000 // max(timescale, 1)

    tracks: list[Mp4Track] = []
    for name, tb, te in _iter_boxes(payload, mb, me):
        if name != "trak":
            continue
        tkhd = _child(payload, tb, te, "tkhd")
        if tkhd is None:
            raise MediaDecodeError("trak without tkhd")
        v, _, body = _full_box(payload, *tkhd)
        if v == 1:
            track_id = struct.unpack_from(">I", payload, body + 16)[0]
        else:
            track_id = struct.unpack_from(">I", payload, body + 8)[0]
        # width/height are the last two 16.16 fields of tkhd
        tw, th = struct.unpack_from(">II", payload, tkhd[1] - 8)

        mdia = _child(payload, tb, te, "mdia")
        if mdia is None:
            raise MediaDecodeError("trak without mdia")
        mdhd = _child(payload, *mdia, "mdhd")
        hdlr = _child(payload, *mdia, "hdlr")
        minf = _child(payload, *mdia, "minf")
        if mdhd is None or hdlr is None or minf is None:
            raise MediaDecodeError("incomplete mdia")
        v, _, body = _full_box(payload, *mdhd)
        if v == 1:
            mts, mdur = struct.unpack_from(">IQ", payload, body + 16)
        else:
            mts, mdur = struct.unpack_from(">II", payload, body + 8)
        _, _, body = _full_box(payload, *hdlr)
        handler = payload[body + 4 : body + 8].decode("latin1")

        stbl = _child(payload, *minf, "stbl")
        if stbl is None:
            raise MediaDecodeError("minf without stbl")
        stsd = _child(payload, *stbl, "stsd")
        stts = _child(payload, *stbl, "stts")
        stsz = _child(payload, *stbl, "stsz")
        stsc = _child(payload, *stbl, "stsc")
        stco = _child(payload, *stbl, "stco")
        co64 = _child(payload, *stbl, "co64")
        if stsd is None or stts is None or stsz is None or stsc is None:
            raise MediaDecodeError("incomplete stbl")
        if stco is None and co64 is None:
            raise MediaDecodeError("stbl without chunk offsets")
        codec, sw, sh = _parse_stsd(payload, *stsd)
        width = (tw >> 16) or sw
        height = (th >> 16) or sh
        sizes = _parse_stsz(payload, *stsz)
        chunk_offsets = (
            _parse_stco(payload, *co64, True)
            if co64 is not None
            else _parse_stco(payload, *stco, False)
        )
        samples = _resolve_samples(
            sizes,
            _parse_stsc(payload, *stsc),
            chunk_offsets,
            _parse_stts(payload, *stts),
            mts,
        )
        for off, size, _t in samples:
            if off < 0 or off + size > len(payload):
                raise MediaDecodeError("sample escapes file")
        stss = _child(payload, *stbl, "stss")
        sync: list[int] | None = None
        if stss is not None:
            _, _, body = _full_box(payload, *stss)
            (n,) = struct.unpack_from(">I", payload, body)
            sync = _u32s(payload, body + 4, n, stss[1])
        tracks.append(
            Mp4Track(
                track_id=track_id,
                handler=handler,
                codec=codec,
                width=width,
                height=height,
                timescale=mts,
                duration_ms=mdur * 1000 // max(mts, 1),
                samples=samples,
                sync_samples=sync,
            )
        )
    return Mp4Info(
        major_brand=major_brand,
        timescale=timescale,
        duration_ms=duration_ms,
        tracks=tracks,
    )


def sample_bytes(payload: bytes, track: Mp4Track, idx: int) -> bytes:
    off, size, _ = track.samples[idx]
    return payload[off : off + size]


def decode_video_sample(codec: str, sample: bytes) -> np.ndarray | None:
    """Pixels for self-contained sample codecs this repo owns (png /
    motion-JPEG); None for inter-frame codecs (avc1...) — the caller
    keeps the demuxed bitstream bytes instead."""
    if codec == "png ":
        from pathik_spark.kernels.media import decode_png

        return decode_png(sample)
    if codec in ("jpeg", "mjpa", "mjpb"):
        from pathik_spark.kernels.jpeg import decode_jpeg

        return decode_jpeg(sample)
    return None


def video_frames_at(
    payload: bytes, every_ms: int
) -> tuple[str, list[tuple[int, bytes]]] | None:
    """(codec, [(t_ms, sample_bytes), ...]) — the sample on screen at
    each every_ms tick of the first video track's stts timeline (the
    MP4 analogue of multimodal._gif_sampled_frames). None when the
    payload has no video track."""
    info = parse_mp4(payload)
    track = info.video_track()
    if track is None or not track.samples:
        return None
    total_ms = track.duration_ms
    if total_ms <= 0:
        total_ms = track.samples[-1][2] + every_ms
    out: list[tuple[int, bytes]] = []
    t = 0
    i = 0
    shown = track.samples[0]
    while t < total_ms:  # merged walk: O(ticks + samples), not O(t*s)
        while i < len(track.samples) and track.samples[i][2] <= t:
            shown = track.samples[i]
            i += 1
        out.append((t, payload[shown[0] : shown[0] + shown[1]]))
        t += every_ms
    return track.codec, out


# ---------------------------------------------------------------------------
# deterministic muxer twin
# ---------------------------------------------------------------------------


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(body), fourcc) + body


def _full(fourcc: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(fourcc, bytes([version]) + flags.to_bytes(3, "big") + body)


_UNITY_MATRIX = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def mux_mp4(
    samples: list[tuple[int, bytes]],
    codec: str = "png ",
    width: int = 0,
    height: int = 0,
    timescale: int = 1000,
    samples_per_chunk: int = 0,
) -> bytes:
    """Mux (duration_ms, sample_bytes) into a one-video-track MP4.

    ``samples_per_chunk > 0`` splits the mdat into multiple chunks
    (multi-entry stco + a real stsc walk); 0 = single chunk. With
    ``timescale=1000`` sample durations are milliseconds exactly.
    """
    if not samples:
        raise ValueError("mux_mp4 needs at least one sample")
    durations = [max(1, int(d)) for d, _ in samples]
    blobs = [b for _, b in samples]
    n = len(blobs)
    spc = samples_per_chunk if samples_per_chunk > 0 else n

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat_body = b"".join(blobs)
    mdat = _box(b"mdat", mdat_body)
    data_start = len(ftyp) + 8  # absolute offset of first sample

    # chunk offsets: samples are contiguous; a chunk starts every spc samples
    chunk_offsets: list[int] = []
    pos = data_start
    for i, blob in enumerate(blobs):
        if i % spc == 0:
            chunk_offsets.append(pos)
        pos += len(blob)

    total = sum(durations)

    # stts: run-length compress consecutive equal durations
    runs: list[tuple[int, int]] = []
    for d in durations:
        if runs and runs[-1][1] == d:
            runs[-1] = (runs[-1][0] + 1, d)
        else:
            runs.append((1, d))
    stts = _full(
        b"stts",
        0,
        0,
        struct.pack(">I", len(runs))
        + b"".join(struct.pack(">II", c, d) for c, d in runs),
    )
    stsz = _full(
        b"stsz",
        0,
        0,
        struct.pack(">II", 0, n) + struct.pack(f">{n}I", *[len(b) for b in blobs]),
    )
    # stsc: one run (every chunk holds spc samples) + a trailer run when
    # the last chunk is short
    stsc_runs = [(1, spc, 1)]
    if n % spc and n > spc:
        stsc_runs.append((len(chunk_offsets), n % spc, 1))
    stsc = _full(
        b"stsc",
        0,
        0,
        struct.pack(">I", len(stsc_runs))
        + b"".join(struct.pack(">III", f, s, d) for f, s, d in stsc_runs),
    )
    stco = _full(
        b"stco",
        0,
        0,
        struct.pack(">I", len(chunk_offsets))
        + struct.pack(f">{len(chunk_offsets)}I", *chunk_offsets),
    )
    entry = (
        struct.pack(">I4s", 86, codec.encode("latin1"))
        + b"\x00" * 6
        + struct.pack(">H", 1)  # data-reference index
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)  # frame count
        + b"\x00" * 32  # compressor name
        + struct.pack(">Hh", 24, -1)
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)

    url = _full(b"url ", 0, 1, b"")  # flag 1: media in this file
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + url)
    dinf = _box(b"dinf", dref)
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + dinf + stbl)

    mdhd = _full(
        b"mdhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, timescale, total) + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _full(
        b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"pathik\x00"
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)

    tkhd = _full(
        b"tkhd",
        0,
        7,  # enabled | in movie | in preview
        struct.pack(">IIIII", 0, 0, 1, 0, total)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + _UNITY_MATRIX
        + struct.pack(">II", width << 16, height << 16),
    )
    trak = _box(b"trak", tkhd + mdia)

    mvhd = _full(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, timescale, total)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8
        + _UNITY_MATRIX
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
