"""Pure-stdlib media decode kernels (multimodal REAL-decode path).

The container has no PIL/ffmpeg, but four interchange formats decode
with nothing beyond ``zlib``/``struct``/``wave``/numpy, so for them
the multimodal operators run REAL decoding instead of the
byte-histogram stand-in (operators/multimodal.py keeps that fake only
for the inter-frame bitstream codecs that genuinely need external
decoders; MP4 *containers* demux for real via kernels/mp4.py, and
png/motion-JPEG samples inside them decode here):

- PNG: 8-bit greyscale / grey+alpha / RGB / RGBA, non-interlaced;
  full scanline unfiltering (None/Sub/Up/Average/Paeth, RFC 2083 §6).
- BMP: the classic uncompressed 24-bit DIB (BITMAPINFOHEADER),
  bottom-up or top-down, 4-byte row padding.
- WAV: PCM 8/16-bit via the stdlib ``wave`` module.
- JPEG: baseline sequential (SOF0) and progressive (SOF2) JFIF — the
  two dominant web image layouts — via kernels/jpeg.py: Huffman
  entropy decode, dequant, exact 8x8 IDCT, chroma upsample, BT.601
  YCbCr->RGB; arithmetic/12-bit fall back (MediaDecodeError).
- GIF: 87a/89a via kernels/gif.py — variable-width LZW, global/local
  palettes, interlace, transparency, animated multi-frame compositing
  (disposal 0-3); stills dispatch here, animations additionally feed
  REAL frames to operators/multimodal.sample_frames.

Decoders are total over garbage: anything unparseable raises
``MediaDecodeError`` and the caller picks its fallback. Feature
extraction is deterministic pixel/waveform math (numpy), so the same
bytes give the same feature vector on every executor.
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


class MediaDecodeError(ValueError):
    """Payload is not decodable by the stdlib kernels."""


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples/pixel


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, C) uint8 array. Supports bit depth 8, color
    types 0/2/4/6, interlace 0; everything else raises."""
    if len(payload) < 8 or payload[:8] != PNG_MAGIC:
        raise MediaDecodeError("not a PNG")
    pos, width = 8, None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos : pos + 4]), payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) < length:
            raise MediaDecodeError("truncated chunk")
        if ctype == b"IHDR":
            if len(body) != 13:
                raise MediaDecodeError(f"bad IHDR length {len(body)}")
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color not in _PNG_CHANNELS or interlace != 0:
                raise MediaDecodeError(
                    f"unsupported PNG (depth={depth} color={color} interlace={interlace})"
                )
            if width <= 0 or height <= 0:
                raise MediaDecodeError(f"bad PNG dimensions {width}x{height}")
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + body + crc
    if width is None or not idat:
        raise MediaDecodeError("missing IHDR/IDAT")
    channels = _PNG_CHANNELS[color]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise MediaDecodeError(f"bad IDAT: {e}") from e
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise MediaDecodeError("bad decompressed size")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = bytearray(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                ul = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise MediaDecodeError(f"unknown filter {ftype}")
        out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
        prev = line
    return out.reshape(height, width, channels)


def encode_png(pixels: np.ndarray) -> bytes:
    """(H, W, C) uint8 -> PNG bytes (filter 0, one IDAT). The roundtrip
    twin of decode_png for synth corpora and tests."""
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, c = pixels.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# BMP (uncompressed 24-bit BITMAPINFOHEADER)
# ---------------------------------------------------------------------------


def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP bytes -> (H, W, 3) uint8 RGB array."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise MediaDecodeError("not a BMP")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    (hdr_size, width, height) = struct.unpack_from("<Iii", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if hdr_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        raise MediaDecodeError(f"unsupported BMP (bpp={bpp} comp={compression})")
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise MediaDecodeError(f"bad BMP dimensions {width}x{height}")
    row_bytes = (width * 3 + 3) & ~3
    need = data_off + row_bytes * height
    if len(payload) < need:
        raise MediaDecodeError("truncated BMP")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * height, offset=data_off
    ).reshape(height, row_bytes)[:, : width * 3]
    img = rows.reshape(height, width, 3)[:, :, ::-1]  # BGR -> RGB
    return img if top_down else img[::-1]


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> bottom-up 24-bit BMP bytes."""
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, _ = pixels.shape
    row_bytes = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):
        row = pixels[y, :, ::-1].tobytes()
        body += row + b"\x00" * (row_bytes - len(row))
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + bytes(body)


# ---------------------------------------------------------------------------
# WAV (PCM via stdlib wave)
# ---------------------------------------------------------------------------


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes -> (sample_rate, (n_frames, n_channels) float64 array
    in [-1, 1])."""
    import wave

    try:
        with wave.open(io.BytesIO(payload), "rb") as f:
            rate, n_ch, width = f.getframerate(), f.getnchannels(), f.getsampwidth()
            frames = f.readframes(f.getnframes())
    except (wave.Error, EOFError) as e:
        raise MediaDecodeError(f"not a PCM WAV: {e}") from e
    if width == 2:
        arr = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        arr = (np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise MediaDecodeError(f"unsupported sample width {width}")
    return rate, arr.reshape(-1, n_ch)


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """(n_frames,) or (n_frames, n_ch) float in [-1, 1] -> 16-bit PCM WAV."""
    import wave

    samples = np.atleast_2d(np.asarray(samples, dtype=np.float64))
    if samples.shape[0] == 1 and samples.ndim == 2 and samples.shape[1] > 1:
        samples = samples.T if samples.shape[0] < samples.shape[1] else samples
    pcm = (np.clip(samples, -1.0, 1.0) * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(pcm.shape[1] if pcm.ndim == 2 else 1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# Deterministic features over REAL decoded content
# ---------------------------------------------------------------------------


def image_features(pixels: np.ndarray, dim: int) -> list[float]:
    """Mean grey intensity (0..1) over ``dim`` vertical strips — a tiny,
    deterministic visual signature with real spatial content."""
    grey = pixels.astype(np.float64).mean(axis=2)
    strips = np.array_split(grey, dim, axis=1)
    return [float(round(s.mean() / 255.0, 6)) if s.size else 0.0 for s in strips]


def audio_features(samples: np.ndarray, dim: int) -> list[float]:
    """RMS energy per ``dim`` equal time segments of the mono mix."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    segs = np.array_split(mono, dim)
    return [
        float(round(np.sqrt((s**2).mean()), 6)) if s.size else 0.0 for s in segs
    ]


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (H, W, C) -> (out_h, out_w, C) — the
    decode/resize step of an image-training pipeline, numpy-indexed."""
    h, w = pixels.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return pixels[ys][:, xs]


def _to_signed64(bits: int) -> int:
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def _grey_small(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    return resize_nearest(pixels, out_w, out_h).astype(np.float64).mean(axis=2)


def average_hash(pixels: np.ndarray, hash_size: int = 8) -> int:
    """aHash: resize to hash_size^2 grey pixels, threshold at the mean,
    pack row-major into a signed 64-bit int (hash_size=8)."""
    small = _grey_small(pixels, hash_size, hash_size)
    bits = (small > small.mean()).flatten()
    acc = 0
    for b in bits:
        acc = (acc << 1) | int(b)
    return _to_signed64(acc)


def difference_hash(pixels: np.ndarray, hash_size: int = 8) -> int:
    """dHash: (hash_size+1) x hash_size grey grid, bit = left<right
    horizontal gradient — more robust to global brightness shifts than
    aHash (the threshold is per-pixel-pair, not the global mean)."""
    small = _grey_small(pixels, hash_size + 1, hash_size)
    bits = (small[:, 1:] > small[:, :-1]).flatten()
    acc = 0
    for b in bits:
        acc = (acc << 1) | int(b)
    return _to_signed64(acc)


def image_hashes(payload: bytes | None, hash_size: int = 8) -> tuple[int, int] | None:
    """(ahash, dhash) for stdlib-decodable images (PNG/BMP/JPEG/GIF),
    None for everything else (audio, undecodable, null) — callers emit
    nullable columns, never a crashed task."""
    if not payload:
        return None
    try:
        if payload[:8] == PNG_MAGIC:
            px = decode_png(payload)
        elif payload[:2] == b"BM":
            px = decode_bmp(payload)
        elif payload[:2] == b"\xff\xd8":
            from pathik_spark.kernels.jpeg import decode_jpeg

            px = decode_jpeg(payload)
        elif payload[:6] in (b"GIF87a", b"GIF89a"):
            from pathik_spark.kernels.gif import decode_gif

            px = decode_gif(payload)
        else:
            return None
        return (average_hash(px, hash_size), difference_hash(px, hash_size))
    except (MediaDecodeError, ValueError, IndexError, struct.error, OverflowError):
        # decoders validate dimensions, but crawl media is adversarial:
        # any residual numpy/struct blow-up must become a null-hash row,
        # never a crashed Spark task
        return None


def stdlib_decode_features(payload: bytes | None, dim: int = 8) -> list[float]:
    """REAL-decode feature extraction with magic-byte dispatch:
    PNG/BMP/JPEG/GIF pixels or WAV waveform when the payload is
    one of the stdlib-decodable formats, else the byte-histogram
    fallback (same contract as
    operators/multimodal.fake_decode_features — total, deterministic,
    fixed ``dim``)."""
    if payload:
        try:
            if payload[:8] == PNG_MAGIC:
                return image_features(decode_png(payload), dim)
            if payload[:2] == b"BM":
                return image_features(decode_bmp(payload), dim)
            if payload[:2] == b"\xff\xd8":
                from pathik_spark.kernels.jpeg import decode_jpeg

                return image_features(decode_jpeg(payload), dim)
            if payload[:6] in (b"GIF87a", b"GIF89a"):
                from pathik_spark.kernels.gif import decode_gif

                return image_features(decode_gif(payload), dim)
            if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
                return audio_features(decode_wav(payload)[1], dim)
            if len(payload) >= 12 and payload[4:8] == b"ftyp":
                from pathik_spark.kernels.mp4 import (
                    decode_video_sample,
                    parse_mp4,
                    sample_bytes,
                )

                track = parse_mp4(payload).video_track()
                if track is not None and track.samples:
                    px = decode_video_sample(
                        track.codec, sample_bytes(payload, track, 0)
                    )
                    if px is not None:  # png/mjpeg-in-mp4: real pixels
                        return image_features(px, dim)
                # inter-frame codec (avc1...): no stdlib decode -> fallback
        except (MediaDecodeError, ValueError, IndexError, struct.error, OverflowError):
            pass  # corrupt container -> fallback, never a crashed task
    from pathik_spark.operators.multimodal import fake_decode_features

    return fake_decode_features(payload, dim)
