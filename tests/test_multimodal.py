"""Multimodal binary-column plumbing (decode stubbed, plumbing real)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pathik_spark.operators import multimodal as M


def test_feature_extraction_schema_and_determinism(spark):
    media = M.synth_media(spark, 30)
    out = M.extract_features(media, dim=8)
    rows = sorted(out.collect(), key=lambda r: r["doc_id"])
    assert out.columns == ["doc_id", "media_type", "n_bytes", "feature"]
    assert all(len(r["feature"]) == 8 for r in rows)
    assert all(abs(sum(r["feature"]) - 1.0) < 1e-5 for r in rows if r["n_bytes"] > 0)
    rows2 = sorted(M.extract_features(media, dim=8).collect(), key=lambda r: r["doc_id"])
    assert [r["feature"] for r in rows] == [r["feature"] for r in rows2]


def test_strict_mode_marks_decoder_boundary(spark):
    media = M.synth_media(spark, 3)
    with pytest.raises(NotImplementedError):
        M.extract_features(media, strict=True)


def test_frame_sampling_fanout(spark):
    media = M.synth_media(spark, 30)
    frames = M.sample_frames(media, every_ms=1000)
    per_doc = {r["doc_id"]: r["n"] for r in frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    videos = {r["doc_id"] for r in media.filter(F.col("media_type") == "video").collect()}
    assert set(per_doc) == videos
    assert all(n == 4 for n in per_doc.values())  # 4000ms / 1000ms


def test_null_media_safe(spark):
    df = spark.createDataFrame(
        [(1, None, "image", None, None, None)], M.MEDIA_SCHEMA
    )
    out = M.extract_features(df).collect()
    assert out[0]["n_bytes"] == 0 and out[0]["feature"] == [0.0] * 8


# ---------------------------------------------------------------------------
# stdlib REAL-decode kernels (kernels/media.py)
# ---------------------------------------------------------------------------

def test_png_roundtrip_all_channel_counts():
    import numpy as np

    from pathik_spark.kernels import media as M

    rng = np.random.default_rng(3)
    for c in (1, 2, 3, 4):
        px = rng.integers(0, 256, size=(13, 17, c), dtype=np.uint8)
        out = M.decode_png(M.encode_png(px))
        assert out.shape == (13, 17, c)
        assert (out == px).all()


def test_png_unfilters_all_five_filter_types():
    """Craft an IDAT whose scanlines cycle filters 0..4 and check the
    decoder reproduces the exact source pixels (RFC 2083 §6)."""
    import struct
    import zlib

    import numpy as np

    from pathik_spark.kernels import media as M

    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
    h, w, ch = px.shape
    stride = w * ch
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        line = px[y].tobytes()
        ft = y % 5
        f = bytearray(line)
        if ft == 1:
            for i in range(stride - 1, ch - 1, -1):
                f[i] = (f[i] - line[i - ch]) & 0xFF
        elif ft == 2:
            for i in range(stride):
                f[i] = (f[i] - prev[i]) & 0xFF
        elif ft == 3:
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                f[i] = (f[i] - ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                f[i] = (f[i] - M._paeth(left, prev[i], ul)) & 0xFF
        raw += bytes([ft]) + bytes(f)
        prev = line

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(
            ">I", zlib.crc32(t + b) & 0xFFFFFFFF
        )

    png = (
        M.PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert (M.decode_png(png) == px).all()


def test_bmp_roundtrip_with_row_padding():
    import numpy as np

    from pathik_spark.kernels import media as M

    px = np.random.default_rng(7).integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    assert (M.decode_bmp(M.encode_bmp(px)) == px).all()


def test_wav_roundtrip():
    import numpy as np

    from pathik_spark.kernels import media as M

    s = np.sin(np.linspace(0, 20, 800))
    rate, got = M.decode_wav(M.encode_wav(s, rate=8000))
    assert rate == 8000 and got.shape == (800, 1)
    assert np.abs(got[:, 0] - s).max() < 1e-3


def test_stdlib_decode_features_dispatch_and_totality():
    import numpy as np

    from pathik_spark.kernels import media as M
    from pathik_spark.operators.multimodal import fake_decode_features

    px = np.full((4, 8, 3), 128, dtype=np.uint8)
    feat = M.stdlib_decode_features(M.encode_png(px), 8)
    assert feat == [round(128 / 255.0, 6)] * 8  # real pixels, not byte salad

    silent = M.stdlib_decode_features(M.encode_wav(np.zeros(64)), 4)
    assert silent == [0.0] * 4

    # corrupt container / None / unknown magic -> byte-histogram fallback
    bad = b"\x89PNG\r\n\x1a\ngarbage"
    assert M.stdlib_decode_features(bad, 8) == fake_decode_features(bad, 8)
    assert M.stdlib_decode_features(None, 8) == fake_decode_features(None, 8)
    assert M.stdlib_decode_features(b"JFIF-ish", 8) == fake_decode_features(b"JFIF-ish", 8)


def test_adversarial_media_never_raises():
    """Crawl media is adversarial: negative/zero declared dimensions,
    truncated headers, and lying sizes must yield a null hash / fallback
    features — never a crashed task (ADVICE round-2 fix)."""
    import struct

    from pathik_spark.kernels import media as M
    from pathik_spark.operators.multimodal import fake_decode_features

    def bmp_with_dims(width: int, height: int) -> bytes:
        off = 54
        header = struct.pack("<2sIHHI", b"BM", off + 64, 0, 0, off)
        info = struct.pack(
            "<IiiHHIIiiII", 40, width, height, 1, 24, 0, 64, 2835, 2835, 0, 0
        )
        return header + info + b"\x00" * 64

    def png_with_dims(width: int, height: int) -> bytes:
        import zlib

        ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)

        def chunk(ctype: bytes, body: bytes) -> bytes:
            return (
                struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
            )

        return (
            M.PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 8))
            + chunk(b"IEND", b"")
        )

    adversarial = [
        bmp_with_dims(-5, 4),        # negative width -> numpy reshape blow-up before
        bmp_with_dims(0, 4),         # zero width -> IndexError in resize before
        bmp_with_dims(4, 0),         # zero height
        png_with_dims(0, 4),         # zero-width PNG
        png_with_dims(4, 0),         # zero-height PNG
        M.PNG_MAGIC + struct.pack(">I", 5) + b"IHDR" + b"\x00" * 9,  # short IHDR
        b"BM" + b"\x00" * 60,        # zeroed BMP header
    ]
    for payload in adversarial:
        assert M.image_hashes(payload) is None, payload[:20]
        feats = M.stdlib_decode_features(payload, 8)
        assert feats == fake_decode_features(payload, 8)


def test_resize_nearest_shape_and_determinism():
    import numpy as np

    from pathik_spark.kernels import media as M

    px = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    r = M.resize_nearest(px, 3, 2)
    assert r.shape == (2, 3, 3)
    assert (r == M.resize_nearest(px, 3, 2)).all()
    # upscale repeats source pixels
    up = M.resize_nearest(px, 12, 8)
    assert up.shape == (8, 12, 3)


def test_extract_features_real_decode_through_spark(spark):
    """The default decoder now REALLY decodes PNG/BMP/WAV payloads: the
    operator's features over synth_media_real equal the kernel's
    locally computed pixel/waveform statistics, row for row."""
    import numpy as np

    from pathik_spark.kernels import media as K

    media = M.synth_media_real(spark, 18)
    local = {
        r["doc_id"]: K.stdlib_decode_features(bytes(r["media"]), 8)
        for r in media.collect()
    }
    got = {
        r["doc_id"]: r["feature"]
        for r in M.extract_features(media, dim=8).collect()
    }
    assert set(got) == set(local)
    for i in got:
        assert np.allclose(got[i], local[i], atol=1e-6), i
    # and the image rows' features are genuine pixel means, not histograms
    img0 = [r for r in media.collect() if r["media_type"] == "image"][0]
    px = K.decode_png(bytes(img0["media"]))
    assert got[img0["doc_id"]] == pytest.approx(K.image_features(px, 8), abs=1e-6)


# --- baseline JPEG codec ------------------------------------------------------


def _smooth_rgb(h: int = 40, w: int = 48):
    import numpy as np

    x = np.linspace(0, 255, w)[None, :]
    y = np.linspace(0, 255, h)[:, None]
    img = np.zeros((h, w, 3))
    img[:, :, 0] = x
    img[:, :, 1] = y
    img[:, :, 2] = (x + y) / 2
    img[h // 4 : h // 2, w // 4 : w // 2] += 40
    return np.clip(img, 0, 255).astype(np.uint8)


def test_jpeg_roundtrip_within_quantization_loss():
    import numpy as np

    from pathik_spark.kernels import jpeg as J

    img = _smooth_rgb()
    for subsample in (False, True):
        enc = J.encode_jpeg_baseline(img, quality=90, subsample_420=subsample)
        dec = J.decode_jpeg(enc)
        assert dec.shape == img.shape and dec.dtype == np.uint8
        err = np.abs(dec.astype(float) - img.astype(float))
        assert err.mean() < 3.0 and err.max() < 32, (subsample, err.mean())
    # determinism: same pixels -> same bytes -> same pixels
    assert J.encode_jpeg_baseline(img) == J.encode_jpeg_baseline(img)


def test_jpeg_odd_dimensions_and_grayscale():
    import numpy as np

    from pathik_spark.kernels import jpeg as J

    odd = _smooth_rgb(37, 43)
    for subsample in (False, True):
        dec = J.decode_jpeg(J.encode_jpeg_baseline(odd, subsample_420=subsample))
        assert dec.shape == (37, 43, 3)
    grey = _smooth_rgb().mean(axis=2).astype(np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg_baseline(grey, quality=92))
    assert dec.shape == (*grey.shape, 3)
    assert np.abs(dec.astype(float) - grey[:, :, None].astype(float)).mean() < 3.0


def test_jpeg_restart_markers_do_not_change_pixels():
    from pathik_spark.kernels import jpeg as J

    img = _smooth_rgb()
    base = J.decode_jpeg(J.encode_jpeg_baseline(img, subsample_420=True))
    for interval in (1, 3, 7):
        enc = J.encode_jpeg_baseline(
            img, subsample_420=True, restart_interval=interval
        )
        assert (J.decode_jpeg(enc) == base).all(), interval


def test_jpeg_rejects_non_baseline_and_garbage():
    import struct as _s

    import pytest as _pt

    from pathik_spark.kernels import jpeg as J
    from pathik_spark.kernels.media import MediaDecodeError

    img = _smooth_rgb(16, 16)
    good = J.encode_jpeg_baseline(img)
    # flipping a baseline stream's SOF0 to SOF2 yields a MALFORMED
    # progressive stream (its SOS declares Ss=0, Se=63 — an illegal DC
    # scan per T.81 G.1) — must raise, not misdecode
    progressive = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with _pt.raises(MediaDecodeError):
        J.decode_jpeg(progressive)
    with _pt.raises(MediaDecodeError):
        J.decode_jpeg(good[: len(good) // 2])  # truncated entropy stream
    with _pt.raises(MediaDecodeError):
        J.decode_jpeg(b"\xff\xd8\xff\xd9")  # SOI+EOI, no scan
    with _pt.raises(MediaDecodeError):
        J.decode_jpeg(b"not a jpeg")
    # zero-dimension SOF
    bad_sof = good.replace(
        _s.pack(">BHHB", 8, 16, 16, 3), _s.pack(">BHHB", 8, 0, 16, 3), 1
    )
    with _pt.raises(MediaDecodeError):
        J.decode_jpeg(bad_sof)


def test_progressive_jpeg_decode_parity():
    """decode(SOF2 progressive encode) must be byte-identical to
    decode(SOF0 baseline encode) of the same image: both encoders share
    color transform, padding, and quantization, so the only difference
    is the entropy layer — the progressive scan decoder (DC/AC first +
    refinement, EOB runs) under test. Covers 4:4:4, 4:2:0 with odd
    (non-MCU-multiple) dimensions, and a dense-AC noise image."""
    import numpy as _np

    from pathik_spark.kernels import jpeg as J

    for (h, w), sub, q in [
        ((24, 24), False, 85),
        ((17, 23), False, 90),
        ((33, 41), True, 75),  # Y own-grid < padded MCU grid
        ((64, 48), True, 92),
        ((8, 8), False, 50),
    ]:
        img = _smooth_rgb(h, w)
        base = J.decode_jpeg(
            J.encode_jpeg_baseline(img, quality=q, subsample_420=sub)
        )
        prog = J.decode_jpeg(
            J.encode_jpeg_progressive(img, quality=q, subsample_420=sub)
        )
        assert _np.array_equal(base, prog), (h, w, sub, q)
    # worst case for AC scan density / ZRL+EOB interplay
    rng = _np.random.default_rng(11)
    noise = rng.integers(0, 256, size=(40, 56, 3)).astype(_np.uint8)
    assert _np.array_equal(
        J.decode_jpeg(J.encode_jpeg_baseline(noise, quality=95)),
        J.decode_jpeg(J.encode_jpeg_progressive(noise, quality=95)),
    )


def test_progressive_jpeg_structure_and_determinism():
    """The progressive twin emits a real multi-scan SOF2 stream (10
    SOS markers, one per script entry), is deterministic, and feeds
    image_hashes/phash identically to the baseline encode."""
    from pathik_spark.kernels import jpeg as J
    from pathik_spark.kernels.media import image_hashes

    img = _smooth_rgb(32, 32)
    enc = J.encode_jpeg_progressive(img, quality=80)
    assert enc == J.encode_jpeg_progressive(img, quality=80)
    assert b"\xff\xc2" in enc and b"\xff\xc0" not in enc
    assert enc.count(b"\xff\xda") == 10
    hp = image_hashes(enc)
    assert hp is not None
    assert hp == image_hashes(J.encode_jpeg_baseline(img, quality=80))


def test_jpeg_mutation_totality():
    """Crawl-robustness: 200 seeded random byte corruptions of a valid
    JPEG either decode or raise MediaDecodeError — image_hashes never
    leaks any other exception (it must emit a null-hash row, not crash
    a task)."""
    import random

    from pathik_spark.kernels import jpeg as J
    from pathik_spark.kernels import media as K
    from pathik_spark.kernels.media import MediaDecodeError

    good = bytearray(J.encode_jpeg_baseline(_smooth_rgb(24, 24), quality=80))
    rng = random.Random(1234)
    for _ in range(200):
        mut = bytearray(good)
        for _ in range(rng.randint(1, 4)):
            mut[rng.randrange(len(mut))] = rng.randrange(256)
        payload = bytes(mut)
        try:
            J.decode_jpeg(payload)
        except MediaDecodeError:
            pass  # the declared failure mode
        # and through the dispatch layer: null or hash, never a raise
        K.image_hashes(payload)
        K.stdlib_decode_features(payload, 8)


def test_jpeg_dqt_emitted_in_zigzag_order():
    """T.81 B.2.4.1: DQT bodies are in zigzag scan order — an external
    decoder must recover the intended Annex-K table (the round-trip
    alone can't catch a self-consistent scramble)."""
    import struct as _s

    from pathik_spark.kernels import jpeg as J

    enc = J.encode_jpeg_baseline(_smooth_rgb(16, 16), quality=75)
    # walk segments, collect DQT bodies
    pos, dqt = 2, {}
    while pos + 4 <= len(enc):
        marker = enc[pos + 1]
        if marker == 0xDA:
            break
        (seglen,) = _s.unpack_from(">H", enc, pos + 2)
        body = enc[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:
            dqt[body[0] & 0x0F] = list(body[1:65])
        pos += 2 + seglen
    want_luma = J._scaled_quant(J.QUANT_LUMA, 75)[J.ZIGZAG]
    want_chroma = J._scaled_quant(J.QUANT_CHROMA, 75)[J.ZIGZAG]
    assert dqt[0] == [int(v) for v in want_luma]
    assert dqt[1] == [int(v) for v in want_chroma]
    # zigzag of the luma table differs from natural order, so this test
    # genuinely distinguishes the two emissions
    assert dqt[0] != [int(v) for v in J._scaled_quant(J.QUANT_LUMA, 75)]


def test_jpeg_grayscale_scan_is_noninterleaved():
    """T.81 A.2.2: a single-component scan is non-interleaved (one
    block per MCU, row-major) regardless of declared sampling factors.
    Hand-build a 1-component hv=2x2 JPEG and check the pixels land in
    the right places — the interleaved misread would scramble blocks
    with no stream error."""
    import struct as _s

    import numpy as np

    from pathik_spark.kernels import jpeg as J

    # 16x16 grey: four 8x8 blocks with distinct flat levels
    grey = np.zeros((16, 16))
    levels = [40.0, 90.0, 150.0, 210.0]
    for b, lv in enumerate(levels):
        by, bx = divmod(b, 2)
        grey[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = lv

    q = J._scaled_quant(J.QUANT_LUMA, 90)[J.ZIGZAG]
    dc = J._encode_codes(J.DC_LUMA_BITS, J.DC_LUMA_VALS)
    ac = J._encode_codes(J.AC_LUMA_BITS, J.AC_LUMA_VALS)
    bw = J._BitWriter()
    pred = 0
    for by in range(2):  # non-interleaved: row-major single blocks
        for bx in range(2):
            pred = J._encode_block(
                bw, grey[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8], q, pred, dc, ac
            )
    entropy = bw.flush()

    def seg(marker, body):
        return _s.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, b"\x00" + bytes(int(v) for v in q))
    out += seg(0xC0, _s.pack(">BHHB", 8, 16, 16, 1) + bytes([1, 0x22, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(J.DC_LUMA_BITS) + bytes(J.DC_LUMA_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(J.AC_LUMA_BITS) + bytes(J.AC_LUMA_VALS))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += entropy + b"\xff\xd9"

    dec = J.decode_jpeg(bytes(out)).astype(float)
    for b, lv in enumerate(levels):
        by, bx = divmod(b, 2)
        block = dec[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, 0]
        assert abs(block.mean() - lv) < 4.0, (b, lv, block.mean())


def test_jpeg_dispatch_through_hashes_and_features():
    import numpy as np

    from pathik_spark.kernels import jpeg as J
    from pathik_spark.kernels import media as K

    img = _smooth_rgb(32, 32)
    jpg = J.encode_jpeg_baseline(img, quality=92)
    png = K.encode_png(img)
    hj, hp = K.image_hashes(jpg), K.image_hashes(png)
    assert hj is not None and hp is not None
    # same underlying picture: perceptual hashes agree within a few bits
    ham = bin((hj[1] ^ hp[1]) & (2**64 - 1)).count("1")
    assert ham <= 4, ham
    fj = K.stdlib_decode_features(jpg, 8)
    fp = K.stdlib_decode_features(png, 8)
    assert np.allclose(fj, fp, atol=0.02)
    # adversarial JPEG payloads fall back, never raise
    from pathik_spark.operators.multimodal import fake_decode_features

    bad = jpg[:40]
    assert K.image_hashes(bad) is None
    assert K.stdlib_decode_features(bad, 8) == fake_decode_features(bad, 8)


# --- perceptual image hashing -------------------------------------------------


def _png_gradient(shift: int = 0, flip: bool = False) -> bytes:
    import numpy as np

    from pathik_spark.kernels.media import encode_png

    x = np.linspace(0, 200, 32, dtype=np.uint8)
    px = np.tile(x, (32, 1))
    if flip:
        px = px[:, ::-1]
    px = np.clip(px.astype(np.int64) + shift, 0, 255).astype(np.uint8)
    return encode_png(np.stack([px] * 3, axis=2))


def test_image_hashes_kernel_invariances():
    from pathik_spark.kernels.media import image_hashes

    base = image_hashes(_png_gradient())
    bright = image_hashes(_png_gradient(shift=30))
    flipped = image_hashes(_png_gradient(flip=True))
    assert base is not None and bright is not None and flipped is not None
    # dHash is brightness-invariant (per-pair gradient, not global mean)
    assert base[1] == bright[1]
    # a mirrored gradient reverses every gradient bit
    assert bin((base[1] ^ flipped[1]) & (2**64 - 1)).count("1") == 64
    # non-images and garbage return None
    assert image_hashes(b"RIFFxxxxWAVE") is None
    assert image_hashes(b"\x89PNG\r\n\x1a\nbroken") is None
    assert image_hashes(None) is None


def test_image_phash_and_near_pairs(spark):
    from pathik_spark.operators.multimodal import image_near_pairs, image_phash

    rows = [
        (1, "image", bytearray(_png_gradient())),
        (2, "image", bytearray(_png_gradient(shift=25))),  # near-dup of 1
        (3, "image", bytearray(_png_gradient(flip=True))),  # far from 1
        (4, "audio", bytearray(b"RIFF0000WAVEjunk")),
        (5, "image", None),
    ]
    media = spark.createDataFrame(rows, "doc_id long, media_type string, media binary")
    hashes = image_phash(media)
    got = {r["doc_id"]: r for r in hashes.collect()}
    assert got[1]["dhash"] == got[2]["dhash"]
    assert got[4]["ahash"] is None and got[5]["dhash"] is None
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in image_near_pairs(hashes).collect()}
    assert pairs == {(1, 2): 0}
