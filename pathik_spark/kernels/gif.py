"""Pure-stdlib GIF codec (multimodal REAL-decode path, animation-aware).

GIF87a/GIF89a decode with nothing beyond ``struct``/numpy: variable
code-width LZW (GIF flavor: LSB-first bit packing, CLEAR/EOI codes,
4096-entry dictionary reset), global and local color tables,
interlaced images (the four-pass row shuffle), GIF89a graphic-control
extensions (frame delay, transparency index, disposal methods 0-3),
and full multi-frame canvas compositing — so animated GIFs yield REAL
frames for the video-style frame-sampling operator
(operators/multimodal.sample_frames), not byte-slice stand-ins.

``encode_gif`` is the deterministic encoder twin (real LZW
compression, optional interlace + per-frame delays) used by the
round-trip identity tests and ``synth_media_real``; like the JPEG twin
(kernels/jpeg.py) it exists so fixtures are self-contained — no
external corpus, no PIL.

Same totality contract as the other kernels (kernels/media.py):
anything unparseable raises ``MediaDecodeError`` and the caller picks
its fallback; same bytes give the same pixels on every executor.

The reference crawler stores fetched media as opaque bytes and never
decodes (/root/reference has no media pipeline); this module is part
of the training-data extension the brief asks for.
"""

from __future__ import annotations

import struct

import numpy as np

from pathik_spark.kernels.media import MediaDecodeError

GIF_MAGICS = (b"GIF87a", b"GIF89a")

# interlace pass layout: (first row, row step) per RFC-equivalent spec
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(height: int) -> np.ndarray:
    """Row indices in the order an interlaced stream stores them."""
    rows: list[np.ndarray] = [
        np.arange(start, height, step) for start, step in _INTERLACE_PASSES
    ]
    return np.concatenate(rows) if rows else np.arange(0)


# ---------------------------------------------------------------------------
# LZW (GIF flavor)
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> np.ndarray:
    """GIF LZW decode -> uint8 index array of length >= ``expected``
    (trailing surplus is tolerated and truncated by the caller)."""
    if not 2 <= min_code_size <= 11:
        raise MediaDecodeError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    # dictionary as flat byte strings; rebuilt on CLEAR
    base = [bytes((i,)) for i in range(clear)] + [b"", b""]

    out = bytearray()
    table = list(base)
    width = min_code_size + 1
    prev: bytes | None = None

    # incremental LSB-first bit reader: O(1) per code, never a big int
    acc = 0
    accbits = 0
    bytepos = 0
    nbytes = len(data)
    while True:
        while accbits < width and bytepos < nbytes:
            acc |= data[bytepos] << accbits
            accbits += 8
            bytepos += 1
        if accbits < width:
            break
        code = acc & ((1 << width) - 1)
        acc >>= width
        accbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise MediaDecodeError("LZW first code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise MediaDecodeError("LZW code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) >= expected:
            break
    if len(out) < expected:
        raise MediaDecodeError(
            f"LZW stream short: {len(out)} of {expected} pixels"
        )
    return np.frombuffer(bytes(out[:expected]), dtype=np.uint8)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF LZW encode (the decoder's exact inverse): emits CLEAR first,
    resets the dictionary at 4096 entries, EOI last, LSB-first."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out_bits: list[tuple[int, int]] = []  # (code, width)
    width = min_code_size + 1
    table: dict[bytes, int] = {bytes((i,)): i for i in range(clear)}
    next_code = eoi + 1

    out_bits.append((clear, width))
    seq = b""
    data = indices.astype(np.uint8).tobytes()
    for byte in data:
        cand = seq + bytes((byte,))
        if cand in table:
            seq = cand
            continue
        out_bits.append((table[seq], width))
        table[cand] = next_code
        next_code += 1
        # decoder widens when ITS table fills 2^width; its table size
        # tracks next_code, so widen after assigning code 2^width - 1
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            out_bits.append((clear, width))
            table = {bytes((i,)): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        seq = bytes((byte,))
    if seq:
        out_bits.append((table[seq], width))
    out_bits.append((eoi, width))

    acc = 0
    accbits = 0
    packed = bytearray()
    for code, w in out_bits:
        acc |= code << accbits
        accbits += w
        while accbits >= 8:
            packed.append(acc & 0xFF)
            acc >>= 8
            accbits -= 8
    if accbits:
        packed.append(acc & 0xFF)
    return bytes(packed)


def _sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate GIF data sub-blocks starting at ``pos``; returns
    (data, position after the 0-length terminator)."""
    chunks: list[bytes] = []
    n = len(payload)
    while True:
        if pos >= n:
            raise MediaDecodeError("truncated sub-block stream")
        size = payload[pos]
        pos += 1
        if size == 0:
            return b"".join(chunks), pos
        if pos + size > n:
            raise MediaDecodeError("truncated sub-block")
        chunks.append(payload[pos : pos + size])
        pos += size


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def decode_gif_frames(payload: bytes) -> list[tuple[int, np.ndarray]]:
    """GIF bytes -> [(delay_ms, (H, W, 3) uint8 RGB frame), ...] with
    full canvas compositing: each returned frame is the composed canvas
    as a viewer would show it (sub-rect placement, transparency holes,
    disposal 0/1 keep, 2 restore-background, 3 restore-previous)."""
    if len(payload) < 13 or payload[:6] not in GIF_MAGICS:
        raise MediaDecodeError("not a GIF payload")
    width, height, flags, bg_index, _aspect = struct.unpack_from(
        "<HHBBB", payload, 6
    )
    if width == 0 or height == 0 or width * height > 64_000_000:
        raise MediaDecodeError(f"bad logical screen {width}x{height}")
    pos = 13
    global_pal: np.ndarray | None = None
    if flags & 0x80:
        gct_size = 2 << (flags & 0x07)
        end = pos + 3 * gct_size
        if end > len(payload):
            raise MediaDecodeError("truncated global color table")
        global_pal = np.frombuffer(payload[pos:end], dtype=np.uint8).reshape(
            gct_size, 3
        )
        pos = end

    if global_pal is not None and bg_index < len(global_pal):
        background = global_pal[bg_index].astype(np.uint8)
    else:
        background = np.zeros(3, dtype=np.uint8)
    canvas = np.broadcast_to(background, (height, width, 3)).copy()

    frames: list[tuple[int, np.ndarray]] = []
    # pending graphic-control state (applies to the next image only)
    delay_ms = 0
    transparent: int | None = None
    disposal = 0
    n = len(payload)
    while pos < n:
        marker = payload[pos]
        pos += 1
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension
            if pos >= n:
                raise MediaDecodeError("truncated extension")
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                block, after = _sub_blocks(payload, pos)
                if len(block) < 4:
                    raise MediaDecodeError("short graphic control block")
                gflags, delay_cs, tindex = struct.unpack_from("<BHB", block, 0)
                delay_ms = delay_cs * 10
                disposal = (gflags >> 2) & 0x07
                transparent = tindex if gflags & 0x01 else None
                pos = after
            else:  # comment / plain text / application: skip
                _, pos = _sub_blocks(payload, pos)
            continue
        if marker != 0x2C:  # image descriptor is the only other block
            raise MediaDecodeError(f"unknown GIF block 0x{marker:02x}")
        if pos + 9 > n:
            raise MediaDecodeError("truncated image descriptor")
        left, top, iw, ih, iflags = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if iw == 0 or ih == 0 or left + iw > width or top + ih > height:
            raise MediaDecodeError("image rect outside logical screen")
        pal = global_pal
        if iflags & 0x80:
            lct_size = 2 << (iflags & 0x07)
            end = pos + 3 * lct_size
            if end > n:
                raise MediaDecodeError("truncated local color table")
            pal = np.frombuffer(payload[pos:end], dtype=np.uint8).reshape(
                lct_size, 3
            )
            pos = end
        if pal is None:
            raise MediaDecodeError("image has no color table")
        if pos >= n:
            raise MediaDecodeError("missing LZW min code size")
        mcs = payload[pos]
        pos += 1
        data, pos = _sub_blocks(payload, pos)
        idx = _lzw_decode(data, mcs, iw * ih).reshape(ih, iw)
        if int(idx.max(initial=0)) >= len(pal):
            raise MediaDecodeError("palette index out of range")
        if iflags & 0x40:  # interlaced: stored rows -> display rows
            display = np.empty_like(idx)
            display[_interlace_order(ih)] = idx
            idx = display

        saved = canvas.copy() if disposal == 3 else None
        rect = canvas[top : top + ih, left : left + iw]
        rgb = pal[idx]
        if transparent is not None:
            opaque = idx != transparent
            rect[opaque] = rgb[opaque]
        else:
            rect[:] = rgb
        frames.append((delay_ms, canvas.copy()))
        if disposal == 2:
            canvas[top : top + ih, left : left + iw] = background
        elif disposal == 3 and saved is not None:
            canvas = saved
        delay_ms, transparent, disposal = 0, None, 0

    if not frames:
        raise MediaDecodeError("GIF contains no image blocks")
    return frames


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF bytes -> first composed frame as (H, W, 3) uint8 (the still
    arm: phash / feature dispatch treats a GIF like any other image)."""
    return decode_gif_frames(payload)[0][1]


# ---------------------------------------------------------------------------
# encode (deterministic twin for fixtures/round-trip tests)
# ---------------------------------------------------------------------------


def _quantize_frames(frames: list[np.ndarray]) -> tuple[np.ndarray, list[np.ndarray]]:
    """Exact-palette quantization: collect the distinct RGB triples
    across all frames (must be <= 256 — the twin is a fixture encoder,
    not a dithering quantizer) -> (palette (P,3), index frames)."""
    stacked = np.concatenate([f.reshape(-1, 3) for f in frames], axis=0)
    palette, inverse = np.unique(stacked, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(
            f"encode_gif needs <= 256 distinct colors, got {len(palette)}"
        )
    idx_frames: list[np.ndarray] = []
    off = 0
    for f in frames:
        count = f.shape[0] * f.shape[1]
        idx_frames.append(
            inverse[off : off + count].astype(np.uint8).reshape(f.shape[:2])
        )
        off += count
    return palette.astype(np.uint8), idx_frames


def encode_gif(
    frames: list[np.ndarray] | np.ndarray,
    delays_ms: list[int] | None = None,
    interlace: bool = False,
) -> bytes:
    """(H, W, 3) uint8 frame(s) -> GIF89a bytes (GIF87a-compatible
    single image when one frame and no delay). Exact palette (<= 256
    distinct colors across frames), real LZW, optional interlace;
    deterministic for identical input."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape != (h, w, 3) or f.dtype != np.uint8:
            raise ValueError("all frames must be (H, W, 3) uint8 and same size")
    palette, idx_frames = _quantize_frames(list(frames))
    pal_bits = max(1, int(len(palette) - 1).bit_length())
    table_size = 1 << pal_bits
    pal_bytes = bytearray(palette.tobytes())
    pal_bytes += b"\x00" * (3 * table_size - len(pal_bytes))

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (pal_bits - 1), 0, 0)
    out += pal_bytes
    if len(frames) > 1:
        # Netscape 2.0 loop-forever block, as real animated GIFs carry
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    delays = delays_ms or [0] * len(frames)
    mcs = max(2, pal_bits)
    for frame_idx, idx in enumerate(idx_frames):
        if len(frames) > 1 or delays[frame_idx]:
            out += b"\x21\xf9\x04"
            out += struct.pack("<BHB", 0x00, delays[frame_idx] // 10, 0)
            out += b"\x00"
        out += b"\x2c"
        out += struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0x00)
        stored = idx[_interlace_order(h)] if interlace else idx
        out.append(mcs)
        packed = _lzw_encode(stored.reshape(-1), mcs)
        for i in range(0, len(packed), 255):
            chunk = packed[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
