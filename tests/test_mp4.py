"""ISO-BMFF demuxer (kernels/mp4.py): mux/demux round-trips, the
stsc/stco multi-chunk walk, stts timeline sampling, real decode of
png / motion-JPEG sample entries, adversarial totality, and the
plumbing through operators/multimodal (sample_frames, features,
synth_media_real) and the content sniffer.

The reference crawler never demuxes media (/root/reference stores
opaque bytes); this suite covers the training-data extension's
stdlib-only MP4 arm the same way test_gif.py covers GIF.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pathik_spark.kernels import mp4 as M
from pathik_spark.kernels.media import MediaDecodeError, decode_png, encode_png


def _png_samples(n, dur_ms=500, side=8, step=40):
    return [
        (dur_ms, encode_png(np.full((side, side, 3), (step * k) % 256, np.uint8)))
        for k in range(n)
    ]


def test_mux_parse_roundtrip_single_chunk():
    blob = M.mux_mp4(_png_samples(4), codec="png ", width=8, height=8)
    assert blob[4:8] == b"ftyp"
    info = M.parse_mp4(blob)
    assert info.major_brand == "isom"
    assert info.duration_ms == 2000
    track = info.video_track()
    assert track is not None
    assert track.codec == "png "
    assert (track.width, track.height) == (8, 8)
    assert track.duration_ms == 2000
    assert [t for _, _, t in track.samples] == [0, 500, 1000, 1500]
    for i in range(4):
        px = M.decode_video_sample(track.codec, M.sample_bytes(blob, track, i))
        assert px[0, 0, 0] == 40 * i


@pytest.mark.parametrize("spc", [1, 2, 3, 5, 7])
def test_multi_chunk_stsc_walk(spc):
    """Sample offsets must survive any chunking (incl. a short trailer
    chunk) — this is the real stsc/stco resolution path."""
    samples = _png_samples(7, dur_ms=250, step=30)
    blob = M.mux_mp4(samples, codec="png ", samples_per_chunk=spc)
    track = M.parse_mp4(blob).video_track()
    assert len(track.samples) == 7
    for i, (_, want) in enumerate(samples):
        assert M.sample_bytes(blob, track, i) == want


def test_variable_durations_compress_to_stts_runs():
    samples = [(100, b"a"), (100, b"bb"), (300, b"ccc"), (300, b"d"), (50, b"e")]
    blob = M.mux_mp4(samples, codec="rawv")
    track = M.parse_mp4(blob).video_track()
    assert [t for _, _, t in track.samples] == [0, 100, 200, 500, 800]
    assert [M.sample_bytes(blob, track, i) for i in range(5)] == [
        b"a", b"bb", b"ccc", b"d", b"e"
    ]


def test_video_frames_at_timeline():
    # frames at t=0,500,1000,1500; ticking every 700ms shows 0,1,2
    blob = M.mux_mp4(_png_samples(4), codec="png ")
    codec, ticks = M.video_frames_at(blob, 700)
    assert codec == "png "
    assert [t for t, _ in ticks] == [0, 700, 1400]
    greys = [decode_png(s)[0, 0, 0] for _, s in ticks]
    assert greys == [0, 40, 80]  # sample on screen at each tick


def test_mjpeg_samples_decode_via_own_codec():
    from pathik_spark.kernels.jpeg import encode_jpeg_baseline

    frames = [
        encode_jpeg_baseline(np.full((8, 8, 3), 60 * k, np.uint8), quality=90)
        for k in range(3)
    ]
    blob = M.mux_mp4([(1000, f) for f in frames], codec="jpeg", width=8, height=8)
    track = M.parse_mp4(blob).video_track()
    for i in range(3):
        px = M.decode_video_sample(track.codec, M.sample_bytes(blob, track, i))
        assert px is not None and abs(int(px[4, 4, 0]) - 60 * i) <= 6


def test_interframe_codec_returns_bitstream_not_pixels():
    nal = b"\x00\x00\x00\x01\x67deadbeef"
    blob = M.mux_mp4([(40, nal)], codec="avc1", width=16, height=16)
    track = M.parse_mp4(blob).video_track()
    assert track.codec == "avc1"
    assert M.sample_bytes(blob, track, 0) == nal  # real demux
    assert M.decode_video_sample(track.codec, nal) is None  # no fake pixels


def test_largesize_and_co64_parse():
    """64-bit box size on mdat + co64 chunk offsets (the 100 TB-archive
    branch of the grammar)."""
    blob = bytearray(M.mux_mp4(_png_samples(2), codec="png "))
    # rewrite mdat as a largesize box: size=1 + 8-byte largesize
    ftyp_size = struct.unpack_from(">I", blob, 0)[0]
    mdat_size = struct.unpack_from(">I", blob, ftyp_size)[0]
    mdat_body = bytes(blob[ftyp_size + 8 : ftyp_size + mdat_size])
    big_mdat = (
        struct.pack(">I4sQ", 1, b"mdat", 16 + len(mdat_body)) + mdat_body
    )
    rest = bytes(blob[ftyp_size + mdat_size :])
    out = bytearray(bytes(blob[:ftyp_size]) + big_mdat + rest)
    # samples moved +8 bytes: patch stco to co64 with shifted offsets
    track0 = M.parse_mp4(bytes(blob)).video_track()
    stco_at = out.find(b"stco")
    n = struct.unpack_from(">I", out, stco_at + 8)[0]
    offsets = [
        struct.unpack_from(">I", out, stco_at + 12 + 4 * i)[0] + 8
        for i in range(n)
    ]
    co64 = (
        struct.pack(">I4s", 16 + 8 * n, b"co64")
        + b"\x00" * 4
        + struct.pack(">I", n)
        + struct.pack(f">{n}Q", *offsets)
    )
    old = bytes(out[stco_at - 4 : stco_at + 12 + 4 * n])
    patched = bytes(out).replace(old, co64)
    # fix enclosing box sizes (stbl/minf/mdia/trak/moov each grew by 4)
    grew = len(co64) - len(old)
    for name in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        at = patched.find(name)
        patched = (
            patched[: at - 4]
            + struct.pack(">I", struct.unpack_from(">I", patched, at - 4)[0] + grew)
            + patched[at:]
        )
    track = M.parse_mp4(patched).video_track()
    assert len(track.samples) == len(track0.samples)
    for i in range(2):
        px = M.decode_video_sample("png ", M.sample_bytes(patched, track, i))
        assert px[0, 0, 0] == 40 * i


def test_parse_totality_on_adversarial_bytes():
    good = M.mux_mp4(_png_samples(3), codec="png ")
    for bad in (
        b"",
        b"\x00\x00\x00\x08free",  # no ftyp
        good[:20],  # truncated mid-mdat
        good[:4] + b"ftyp",  # ftyp but nothing else
    ):
        with pytest.raises(MediaDecodeError):
            M.parse_mp4(bad)
    # declared box size escaping the file must raise, not slice garbage
    evil = bytearray(good)
    struct.pack_into(">I", evil, 0, 2**31)
    with pytest.raises(MediaDecodeError):
        M.parse_mp4(bytes(evil))
    # stsz declaring an absurd sample count must raise, not allocate
    at = good.find(b"stsz")
    evil = bytearray(good)
    struct.pack_into(">I", evil, at + 12, 2**31)
    with pytest.raises(MediaDecodeError):
        M.parse_mp4(bytes(evil))


def test_parse_mutation_totality():
    """Truncations and byte mutations of a valid MP4 must either parse
    or raise MediaDecodeError — never any other exception (crawl media
    is adversarial; a Spark task must not crash)."""
    good = M.mux_mp4(_png_samples(3), codec="png ", samples_per_chunk=2)
    cases = [good[:k] for k in range(0, len(good), 7)]
    for i in range(0, len(good), 3):
        for val in (0x00, 0xFF, good[i] ^ 0x40):
            cases.append(good[:i] + bytes([val]) + good[i + 1 :])
    crashed = 0
    for blob in cases:
        try:
            M.parse_mp4(blob)
        except MediaDecodeError:
            crashed += 1
    assert crashed > 0  # the sweep does hit real failures


def test_stdlib_features_route_mp4_to_pixels():
    from pathik_spark.kernels.media import image_features, stdlib_decode_features

    px = np.full((8, 8, 3), 120, np.uint8)
    blob = M.mux_mp4([(500, encode_png(px))], codec="png ", width=8, height=8)
    assert stdlib_decode_features(blob, 8) == image_features(px, 8)
    # avc1: parses but no pixel decode -> deterministic fallback
    from pathik_spark.operators.multimodal import fake_decode_features

    blob = M.mux_mp4([(40, b"\x00\x00\x01\x67nal")], codec="avc1")
    assert stdlib_decode_features(blob, 8) == fake_decode_features(blob, 8)


def test_real_mp4_frame_sampling_through_spark(spark):
    """sample_frames fans an MJPEG MP4 out to one REAL decoded PNG
    frame per tick of the stts timeline."""
    from pathik_spark.kernels.jpeg import encode_jpeg_baseline
    from pathik_spark.operators.multimodal import MEDIA_SCHEMA, sample_frames

    frames = [
        encode_jpeg_baseline(np.full((8, 8, 3), 70 * k, np.uint8), quality=90)
        for k in range(4)
    ]
    blob = M.mux_mp4([(1000, f) for f in frames], codec="jpeg", width=8, height=8)
    media = spark.createDataFrame([(1, blob, "video", 8, 8, 4000)], MEDIA_SCHEMA)
    got = sample_frames(media, every_ms=1000).orderBy("frame_idx").collect()
    assert len(got) == 4
    for k, row in enumerate(got):
        px = decode_png(bytes(row["frame"]))  # re-encoded self-describing PNG
        assert abs(int(px[4, 4, 0]) - 70 * k) <= 6


def test_synth_media_real_includes_mp4_videos(spark):
    from pathik_spark.operators import multimodal as MM

    media = MM.synth_media_real(spark, 48)
    blobs = [bytes(r["media"]) for r in media.filter("media_type = 'video'").collect()]
    mp4s = [b for b in blobs if b[4:8] == b"ftyp"]
    assert mp4s, "synth_media_real should emit MJPEG MP4 videos"
    for b in mp4s:
        track = M.parse_mp4(b).video_track()
        assert track.codec == "jpeg" and len(track.samples) == 4
