"""GIF codec (kernels/gif.py): LZW round-trips, animation compositing,
interlace, transparency/disposal, dispatch through the media kernels,
and REAL frame sampling through operators/multimodal.sample_frames.

The reference crawler never decodes media (/root/reference stores
opaque bytes); this suite covers the training-data extension's
stdlib-only GIF arm the same way test_multimodal.py covers PNG/JPEG.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pathik_spark.kernels import media as MK
from pathik_spark.kernels.gif import (
    decode_gif,
    decode_gif_frames,
    encode_gif,
)
from pathik_spark.kernels.media import MediaDecodeError


def _rand_px(h, w, colors, seed):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(colors, 3), dtype=np.uint8)
    idx = rng.integers(0, colors, size=(h, w))
    return pal[idx]


def test_gif_single_frame_roundtrip_exact():
    for colors, seed in ((2, 0), (5, 1), (256, 2)):
        px = _rand_px(21, 17, colors, seed)
        payload = encode_gif(px)
        assert payload[:6] == b"GIF89a"
        out = decode_gif(payload)
        assert out.shape == px.shape and (out == px).all()


def test_gif_interlaced_roundtrip_exact():
    px = _rand_px(23, 9, 16, 7)  # odd height crosses all 4 pass strides
    out = decode_gif(encode_gif(px, interlace=True))
    assert (out == px).all()


def test_gif_lzw_dictionary_reset_roundtrip():
    # >4096 dictionary entries forces the mid-stream CLEAR/reset path
    px = _rand_px(128, 128, 256, 11)
    out = decode_gif(encode_gif(px))
    assert (out == px).all()


def test_gif_animation_frames_and_delays():
    frames = [
        np.full((8, 10, 3), 30 * k, dtype=np.uint8) for k in range(4)
    ]
    payload = encode_gif(frames, delays_ms=[100, 250, 0, 500])
    decoded = decode_gif_frames(payload)
    assert [d for d, _ in decoded] == [100, 250, 0, 500]
    for (_, got), want in zip(decoded, frames):
        assert (got == want).all()
    # still-image arm sees the first composed frame
    assert (decode_gif(payload) == frames[0]).all()


def test_gif_deterministic_encode():
    px = _rand_px(12, 12, 9, 3)
    assert encode_gif(px) == encode_gif(px)


def test_gif_encode_rejects_bad_input():
    with pytest.raises(ValueError):
        encode_gif([])
    with pytest.raises(ValueError):
        encode_gif(np.zeros((4, 4), dtype=np.uint8))  # not (H, W, 3)
    rng = np.random.default_rng(5)
    too_many = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    # 1024 pixels of random 24-bit color: >256 distinct with overwhelming
    # probability under this fixed seed
    with pytest.raises(ValueError):
        encode_gif(too_many)


def _hand_gif(blocks: bytes, w=4, h=4, gct=True) -> bytes:
    head = b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 if gct else 0, 1, 0)
    if gct:
        # 2-entry global palette: index 0 red, index 1 (background) green
        head += bytes((255, 0, 0, 0, 255, 0))
    return head + blocks + b"\x3b"


def _image_block(indices: np.ndarray, left=0, top=0, transparent=None,
                 disposal=0, delay_cs=0) -> bytes:
    from pathik_spark.kernels.gif import _lzw_encode

    h, w = indices.shape
    out = b""
    if transparent is not None or disposal or delay_cs:
        gflags = (disposal & 7) << 2 | (1 if transparent is not None else 0)
        out += b"\x21\xf9\x04" + struct.pack(
            "<BHB", gflags, delay_cs, transparent or 0
        ) + b"\x00"
    out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, 0)
    packed = _lzw_encode(indices.reshape(-1), 2)
    out += bytes((2,))
    for i in range(0, len(packed), 255):
        chunk = packed[i : i + 255]
        out += bytes((len(chunk),)) + chunk
    return out + b"\x00"


def test_gif_transparency_and_subrect_compositing():
    # frame 1: full canvas of index 0 (red); frame 2: 2x2 sub-rect at
    # (1,1) where index 1 is transparent -> red shows through holes
    f1 = np.zeros((4, 4), dtype=np.uint8)
    f2 = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    payload = _hand_gif(
        _image_block(f1) + _image_block(f2, left=1, top=1, transparent=1)
    )
    decoded = decode_gif_frames(payload)
    assert len(decoded) == 2
    red, green = (255, 0, 0), (0, 255, 0)
    canvas = decoded[1][1]
    assert tuple(canvas[0, 0]) == red  # untouched by sub-rect
    assert tuple(canvas[1, 1]) == red  # f2 opaque index 0 -> red
    assert tuple(canvas[1, 2]) == red  # transparent hole keeps frame-1 red
    assert tuple(canvas[2, 2]) == red


def test_gif_disposal_background_and_previous():
    # disposal 2 restores the painted rect to background (green) before
    # the next frame; disposal 3 restores the pre-frame canvas
    f_red = np.zeros((4, 4), dtype=np.uint8)
    sub = np.zeros((2, 2), dtype=np.uint8)
    probe = np.zeros((1, 1), dtype=np.uint8)
    payload2 = _hand_gif(
        _image_block(f_red)
        + _image_block(sub, left=0, top=0, disposal=2)
        + _image_block(probe, left=3, top=3)
    )
    frames2 = decode_gif_frames(payload2)
    # after disposal-2 frame, its 2x2 rect is background green
    assert tuple(frames2[2][1][0, 0]) == (0, 255, 0)
    assert tuple(frames2[2][1][2, 2]) == (255, 0, 0)

    payload3 = _hand_gif(
        _image_block(f_red)
        + _image_block(
            np.ones((2, 2), dtype=np.uint8), left=0, top=0, disposal=3
        )
        + _image_block(probe, left=3, top=3)
    )
    frames3 = decode_gif_frames(payload3)
    assert tuple(frames3[1][1][0, 0]) == (0, 255, 0)  # painted green
    assert tuple(frames3[2][1][0, 0]) == (255, 0, 0)  # restored to red


def test_gif_decode_totality_on_garbage():
    px = _rand_px(9, 9, 8, 13)
    good = encode_gif(px)
    for bad in (
        b"",
        b"GIF89a",
        good[:20],
        good[:-5],
        b"GIF89a" + b"\xff" * 40,
        _hand_gif(b"\x99"),  # unknown block marker where an image belongs
        b"NOTGIF" + good[6:],
    ):
        with pytest.raises(MediaDecodeError):
            decode_gif_frames(bad)
    # mutation sweep: flip bytes across the payload; decode either
    # succeeds or raises MediaDecodeError -- never anything else
    for pos in range(6, len(good), max(1, len(good) // 60)):
        mutated = good[:pos] + bytes((good[pos] ^ 0xFF,)) + good[pos + 1 :]
        try:
            decode_gif_frames(mutated)
        except MediaDecodeError:
            pass


def test_gif_dispatch_through_image_hashes_and_features():
    px = _rand_px(16, 16, 32, 17)
    payload = encode_gif(px)
    hashes = MK.image_hashes(payload)
    assert hashes is not None and hashes == (
        MK.average_hash(px), MK.difference_hash(px),
    )
    feats = MK.stdlib_decode_features(payload, dim=8)
    assert feats == MK.image_features(px, 8)


def test_gif_real_frame_sampling_through_spark(spark):
    from pathik_spark.kernels.media import decode_png
    from pathik_spark.operators import multimodal as M

    frames = [np.full((6, 6, 3), 60 * k, dtype=np.uint8) for k in range(3)]
    payload = encode_gif(frames, delays_ms=[1000, 1000, 1000])
    df = spark.createDataFrame(
        [(7, payload, "video", 6, 6, 3000)], M.MEDIA_SCHEMA
    )
    out = sorted(
        M.sample_frames(df, every_ms=1000).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [r["frame_idx"] for r in out] == [0, 1, 2]
    for r, want in zip(out, frames):
        got = decode_png(bytes(r["frame"]))
        assert (got == want).all()


def test_synth_media_real_includes_gif_videos(spark):
    from pathik_spark.operators import multimodal as M

    media = M.synth_media_real(spark, 48)
    rows = media.collect()
    gif_rows = [r for r in rows if bytes(r["media"] or b"")[:6] == b"GIF89a"]
    assert gif_rows, "synth_media_real should emit animated-GIF videos"
    for r in gif_rows:
        decoded = decode_gif_frames(bytes(r["media"]))
        assert len(decoded) == 4 and all(d == 1000 for d, _ in decoded)
