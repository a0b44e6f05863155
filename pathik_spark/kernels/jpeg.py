"""Pure-stdlib baseline JPEG codec (multimodal REAL-decode path).

The container has no PIL/libjpeg, but baseline sequential JFIF — the
dominant web image format — decodes with nothing beyond ``struct`` and
numpy: segment parse (DQT/SOF0/DHT/DRI/SOS), Huffman entropy decode
with byte-unstuffing and restart markers, dequantize + dezigzag, exact
float 8x8 IDCT (DCT-III basis matmul), nearest chroma upsample for
4:4:4 / 4:2:2 / 4:2:0 and grayscale, ITU-R BT.601 YCbCr -> RGB.

The encoder twins produce deterministic baseline JFIF and progressive
JFIF (Annex-K quant tables scaled by quality, Annex-K Huffman tables,
optional 4:2:0; the progressive twin uses libjpeg's default 10-scan
spectral-selection + successive-approximation script over the SAME
quantized coefficients) so round-trip and cross-mode parity tests and
synthetic crawl corpora need no binary fixtures.

Scope (matches the perceptual-hash dedup need, not a general codec):
- decode: baseline sequential DCT (SOF0) AND progressive DCT (SOF2 —
  spectral selection + successive approximation, T.81 Annex G: DC/AC
  first + refinement scans, EOB runs, per-scan Huffman redefinition),
  8-bit, 1 or 3 components, sampling factors up to 2x2. Arithmetic
  coding, hierarchical, 12-bit, and CMYK raise MediaDecodeError and
  the caller falls back (operators/multimodal.py keeps the labeled
  histogram stand-in).
- This is NOT bit-identical to libjpeg (integer IDCT variants differ
  by +-1 LSB); it is a real DCT decode of the real entropy stream,
  which is what perceptual hashing needs. Per-row Python cost is fine
  for the Pandas-UDF batch path (hashes are computed once per payload,
  downstream dedup joins run on the 8-byte hashes, never pixels).

Reference behavioral spec: ITU-T T.81 (JPEG), Annex F (baseline),
Annex K (example tables). The reference repo has no image pipeline;
this closes a gap-vs-brief (training-data dedup over crawl images).
"""

from __future__ import annotations

import struct

import numpy as np

from pathik_spark.kernels.media import MediaDecodeError

# ---------------------------------------------------------------------------
# Shared tables
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

_UNZIGZAG = np.argsort(ZIGZAG)  # natural -> zigzag position inverse

# ITU-T T.81 Annex K.1 example quantization tables (quality 50 base)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# ITU-T T.81 Annex K.3 example Huffman tables: (bits[1..16], values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_basis() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis C: spatial = C.T @ coef @ C."""
    k = np.arange(8)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16.0)
    c *= np.sqrt(2.0 / 8.0)
    c[0] = np.sqrt(1.0 / 8.0)
    return c


_DCT_C = _dct_basis()


def _build_huffman_codes(bits: list[int], values: list[int]) -> dict[int, int]:
    """Canonical JPEG Huffman assignment: {(length << 16) | code: symbol}."""
    codes: dict[int, int] = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[(length << 16) | code] = values[vi]
            vi += 1
            code += 1
        code <<= 1
    return codes


# ---------------------------------------------------------------------------
# Bit I/O over the entropy-coded segment
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    stops at any non-RST marker. ``restart()`` realigns past RSTn."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                raise MediaDecodeError("truncated entropy stream")
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
                if nxt == 0x00:
                    self.pos += 2  # stuffed 0xFF
                elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                    break  # restart marker: stop filling, restart() eats it
                else:
                    break  # EOI / next segment
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
            if self.nbits == 0:
                raise MediaDecodeError("bit read past stream end")
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[int, int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length << 16) | code)
            if sym is not None:
                return sym
        raise MediaDecodeError("invalid Huffman code")

    def restart(self) -> None:
        """Byte-align and consume the expected RSTn marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise MediaDecodeError("missing restart marker")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 sign extension of an s-bit magnitude code."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """JFIF bytes -> (H, W, 3) uint8 RGB (grayscale replicated).

    Handles baseline sequential (SOF0) and progressive (SOF2) Huffman
    streams. Raises MediaDecodeError for anything else (arithmetic,
    hierarchical, 12-bit, >2x2 sampling, CMYK) and for any
    malformed/truncated structure."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise MediaDecodeError("not a JPEG (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[int, int]] = {}  # (class, id) -> codes
    frame = None
    restart_interval = 0
    coefs: list[np.ndarray] | None = None  # progressive coefficient store
    n = len(payload)
    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            raise MediaDecodeError("desynced segment stream")
        marker = payload[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            if coefs is not None:
                return _reconstruct_progressive(frame, coefs, qt)
            raise MediaDecodeError("EOI before scan")
        if pos + 4 > n:
            raise MediaDecodeError("truncated segment header")
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise MediaDecodeError("truncated segment")
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0:
                    raise MediaDecodeError("16-bit quant tables unsupported")
                if b + 65 > len(body):
                    raise MediaDecodeError("truncated DQT")
                qt[tq] = np.frombuffer(
                    body[b + 1 : b + 65], dtype=np.uint8
                ).astype(np.int64)
                b += 65
        elif marker == 0xC4:  # DHT
            b = 0
            while b + 17 <= len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                nv = sum(bits)
                vals = list(body[b + 17 : b + 17 + nv])
                if len(vals) != nv:
                    raise MediaDecodeError("truncated DHT")
                huff[(tc, th)] = _build_huffman_codes(bits, vals)
                b += 17 + nv
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise MediaDecodeError(f"{prec}-bit JPEG unsupported")
            if h == 0 or w == 0:
                raise MediaDecodeError(f"bad JPEG dimensions {w}x{h}")
            if nc not in (1, 3):
                raise MediaDecodeError(f"{nc}-component JPEG unsupported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * ci)
                ch, cv = hv >> 4, hv & 0x0F
                if not (1 <= ch <= 2 and 1 <= cv <= 2):
                    raise MediaDecodeError(f"sampling {ch}x{cv} unsupported")
                comps.append({"id": cid, "h": ch, "v": cv, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise MediaDecodeError(f"unsupported SOF 0x{marker:02X}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise MediaDecodeError("SOS before SOF")
            ns = body[0]
            if ns < 1 or len(body) < 4 + 2 * ns:
                raise MediaDecodeError("malformed SOS")
            scan = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si], body[2 + 2 * si]
                ci = next(
                    (i for i, c in enumerate(frame["comps"]) if c["id"] == cs),
                    None,
                )
                if ci is None:
                    raise MediaDecodeError("scan names unknown component")
                scan.append((ci, frame["comps"][ci], tt >> 4, tt & 0x0F))
            if not frame["progressive"]:
                if ns != len(frame["comps"]):
                    raise MediaDecodeError("partial scan in baseline stream")
                return _decode_scan(
                    payload, pos + 2 + seglen, frame,
                    [(c, d, a) for _, c, d, a in scan], qt, huff,
                    restart_interval,
                )
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahl = body[3 + 2 * ns]
            if coefs is None:
                coefs = _alloc_prog_coefs(frame)
            end = _decode_prog_scan(
                payload, pos + 2 + seglen, frame, scan, huff,
                restart_interval, coefs, ss, se, ahl >> 4, ahl & 0x0F,
            )
            pos = end
            continue
        pos += 2 + seglen
    raise MediaDecodeError("no scan found")


def _decode_scan(
    data: bytes,
    pos: int,
    frame: dict,
    scan: list,
    qt: dict[int, np.ndarray],
    huff: dict[tuple[int, int], dict[int, int]],
    restart_interval: int,
) -> np.ndarray:
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    if len(comps) == 1:
        # T.81 A.2.2: a single-component scan is NON-interleaved — one
        # 8x8 block per MCU in row-major order, whatever sampling
        # factors the SOF declares (they only matter relative to other
        # components). Treating hv=2x2 grayscale as interleaved would
        # decode blocks into scrambled positions with no stream error.
        comps = [dict(comps[0], h=1, v=1)]
        scan = [(comps[0], scan[0][1], scan[0][2])]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    planes = []
    for c in comps:
        if c["tq"] not in qt:
            raise MediaDecodeError("missing quant table")
        planes.append(
            np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64)
        )
    for comp, dc_id, ac_id in scan:
        if (0, dc_id) not in huff or (1, ac_id) not in huff:
            raise MediaDecodeError("missing Huffman table")

    reader = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    ct = _DCT_C.T
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.restart()
                pred = [0] * len(comps)
            for ci, (comp, dc_id, ac_id) in enumerate(scan):
                dct = huff[(0, dc_id)]
                act = huff[(1, ac_id)]
                q = qt[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        s = reader.decode_symbol(dct)
                        if s > 11:
                            raise MediaDecodeError("bad DC category")
                        diff = _extend(reader.read_bits(s), s) if s else 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(act)
                            r, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise MediaDecodeError("AC index overrun")
                            zz[k] = _extend(reader.read_bits(size), size)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[ZIGZAG] = zz * q
                        block = ct @ coef.reshape(8, 8) @ _DCT_C + 128.0
                        py = (my * comp["v"] + by) * 8
                        px = (mx * comp["h"] + bx) * 8
                        planes[ci][py : py + 8, px : px + 8] = block
            mcu_count += 1

    return _planes_to_rgb(planes, comps, h, w, hmax, vmax)


def _planes_to_rgb(
    planes: list[np.ndarray], comps: list, h: int, w: int, hmax: int, vmax: int
) -> np.ndarray:
    """Upsample each component plane to full MCU-grid resolution, crop
    to (h, w), YCbCr->RGB (BT.601) or replicate grayscale."""
    full = []
    for ci, comp in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(comps) == 1:
        y = np.clip(full[0], 0.0, 255.0)
        return np.repeat(y[:, :, None], 3, axis=2).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(rgb, 0.0, 255.0).round().astype(np.uint8)


# ---------------------------------------------------------------------------
# Progressive decode (SOF2, T.81 Annex G)
# ---------------------------------------------------------------------------


def _prog_geometry(frame: dict) -> list[dict]:
    """Per-component block geometry: the padded MCU grid (interleaved
    scans cover it all) and the component's own block grid (the smaller
    region non-interleaved scans cover, T.81 A.2.2)."""
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    geo = []
    for c in comps:
        cw = (w * c["h"] + hmax - 1) // hmax
        ch = (h * c["v"] + vmax - 1) // vmax
        geo.append(
            {
                "bw_mcu": mcus_x * c["h"],
                "bh_mcu": mcus_y * c["v"],
                "bw": (cw + 7) // 8,
                "bh": (ch + 7) // 8,
            }
        )
    frame["hmax"], frame["vmax"] = hmax, vmax
    frame["mcus_x"], frame["mcus_y"] = mcus_x, mcus_y
    return geo


def _alloc_prog_coefs(frame: dict) -> list[np.ndarray]:
    """Zigzag-order coefficient store, one (bh, bw, 64) int32 array per
    component on the padded MCU grid (superset of the non-interleaved
    grid; padding blocks get DC from interleaved scans and zero ACs —
    cropped away at assembly)."""
    frame["geo"] = _prog_geometry(frame)
    return [
        np.zeros((g["bh_mcu"], g["bw_mcu"], 64), dtype=np.int32)
        for g in frame["geo"]
    ]


def _decode_prog_scan(
    data: bytes,
    pos: int,
    frame: dict,
    scan: list,
    huff: dict[tuple[int, int], dict[int, int]],
    restart_interval: int,
    coefs: list[np.ndarray],
    ss: int,
    se: int,
    ah: int,
    al: int,
) -> int:
    """Decode ONE progressive scan into the coefficient store and
    return the byte offset of the next marker. Implements all four scan
    kinds of T.81 G.2: DC first / DC refinement (interleaved or not),
    AC first / AC refinement (always single-component), with EOB runs
    and restart-marker resync."""
    if ss == 0:
        if se != 0:
            raise MediaDecodeError("progressive DC scan with Se != 0")
    else:
        if len(scan) != 1:
            raise MediaDecodeError("interleaved AC scan")
        if not (ss <= se <= 63):
            raise MediaDecodeError("bad spectral band")
    if ah not in range(14) or al not in range(14):
        raise MediaDecodeError("bad successive-approximation bits")

    reader = _BitReader(data, pos)
    geo = frame["geo"]

    if ss == 0:
        for ci, _, dc_id, _ in scan:
            if ah == 0 and (0, dc_id) not in huff:
                raise MediaDecodeError("missing DC table")
        pred = {ci: 0 for ci, *_ in scan}

        def dc_block(ci: int, dc_id: int, by: int, bx: int) -> None:
            zz = coefs[ci]
            if ah == 0:
                s = reader.decode_symbol(huff[(0, dc_id)])
                if s > 11:
                    raise MediaDecodeError("bad DC category")
                diff = _extend(reader.read_bits(s), s) if s else 0
                pred[ci] += diff
                zz[by, bx, 0] = pred[ci] << al
            else:
                if reader.read_bit():
                    zz[by, bx, 0] = int(zz[by, bx, 0]) | (1 << al)

        if len(scan) > 1:  # interleaved DC over the MCU grid
            unit = 0
            for my in range(frame["mcus_y"]):
                for mx in range(frame["mcus_x"]):
                    if restart_interval and unit and unit % restart_interval == 0:
                        reader.restart()
                        pred = {ci: 0 for ci, *_ in scan}
                    for ci, comp, dc_id, _ in scan:
                        for by in range(comp["v"]):
                            for bx in range(comp["h"]):
                                dc_block(
                                    ci, dc_id,
                                    my * comp["v"] + by, mx * comp["h"] + bx,
                                )
                    unit += 1
        else:  # non-interleaved DC: the component's own block grid
            ci, comp, dc_id, _ = scan[0]
            g = geo[ci]
            unit = 0
            for by in range(g["bh"]):
                for bx in range(g["bw"]):
                    if restart_interval and unit and unit % restart_interval == 0:
                        reader.restart()
                        pred = {ci: 0}
                    dc_block(ci, dc_id, by, bx)
                    unit += 1
        return _next_marker(data, reader.pos)

    # AC scan: single component, non-interleaved block order
    ci, comp, _, ac_id = scan[0]
    if (1, ac_id) not in huff:
        raise MediaDecodeError("missing AC table")
    act = huff[(1, ac_id)]
    g = geo[ci]
    arr = coefs[ci]
    eobrun = 0
    p1, m1 = 1 << al, -(1 << al)
    unit = 0
    for by in range(g["bh"]):
        for bx in range(g["bw"]):
            if restart_interval and unit and unit % restart_interval == 0:
                reader.restart()
                eobrun = 0
            unit += 1
            zz = arr[by, bx]
            if ah == 0:  # first pass for this band
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = reader.decode_symbol(act)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:
                            k += 16  # ZRL
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.read_bits(r)
                        break
                    k += r
                    if k > se:
                        raise MediaDecodeError("AC band overrun")
                    zz[k] = _extend(reader.read_bits(s), s) << al
                    k += 1
                continue
            # refinement pass (T.81 G.1.2.3 / libjpeg decode_mcu_AC_refine)
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = reader.decode_symbol(act)
                    r, s = rs >> 4, rs & 0x0F
                    newval = 0
                    if s == 0:
                        if r < 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += reader.read_bits(r)
                            break
                        # r == 15: advance over 16 zero-history coeffs
                    else:
                        if s != 1:
                            raise MediaDecodeError("bad refinement size")
                        newval = p1 if reader.read_bit() else m1
                    while k <= se:
                        v = int(zz[k])
                        if v != 0:
                            if reader.read_bit() and (abs(v) & p1) == 0:
                                zz[k] = v + (p1 if v > 0 else m1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if newval and k <= se:
                        zz[k] = newval
                    k += 1
            if eobrun > 0:
                while k <= se:
                    v = int(zz[k])
                    if v != 0:
                        if reader.read_bit() and (abs(v) & p1) == 0:
                            zz[k] = v + (p1 if v > 0 else m1)
                    k += 1
                eobrun -= 1
    return _next_marker(data, reader.pos)


def _next_marker(data: bytes, pos: int) -> int:
    """Byte offset of the next real marker (skips entropy padding,
    stuffed 0xFF00 and stray RSTn) — where the segment loop resumes
    after a progressive scan's entropy data."""
    n = len(data)
    while pos + 1 < n:
        if data[pos] == 0xFF:
            nxt = data[pos + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                pos += 2
                continue
            if nxt == 0xFF:  # fill byte
                pos += 1
                continue
            return pos
        pos += 1
    raise MediaDecodeError("truncated stream after scan")


def _reconstruct_progressive(
    frame: dict, coefs: list[np.ndarray], qt: dict[int, np.ndarray]
) -> np.ndarray:
    """Dequantize + dezigzag + IDCT the accumulated coefficient store
    (one vectorized einsum per component) and assemble RGB."""
    comps = frame["comps"]
    planes = []
    for ci, comp in enumerate(comps):
        if comp["tq"] not in qt:
            raise MediaDecodeError("missing quant table")
        q = qt[comp["tq"]]
        zz = coefs[ci].astype(np.float64) * q[None, None, :]
        bh, bw = zz.shape[:2]
        nat = np.zeros_like(zz)
        nat[:, :, ZIGZAG] = zz
        blocks = nat.reshape(bh, bw, 8, 8)
        spatial = np.einsum("ij,abjk,kl->abil", _DCT_C.T, blocks, _DCT_C) + 128.0
        planes.append(
            spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
    return _planes_to_rgb(
        planes, comps, frame["h"], frame["w"], frame["hmax"], frame["vmax"]
    )


# ---------------------------------------------------------------------------
# Encoder (deterministic baseline JFIF for tests / synth corpora)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.out)


def _encode_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) for the encoder side."""
    table: dict[int, tuple[int, int]] = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[values[vi]] = (code, length)
            vi += 1
            code += 1
        code <<= 1
    return table


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255)


def _encode_block(
    bw: _BitWriter,
    block: np.ndarray,
    q: np.ndarray,
    pred: int,
    dc_table: dict[int, tuple[int, int]],
    ac_table: dict[int, tuple[int, int]],
) -> int:
    coef = _DCT_C @ (block - 128.0) @ _DCT_C.T
    zz = np.round(coef.reshape(64)[ZIGZAG] / q).astype(np.int64)
    dc = int(zz[0])
    diff = dc - pred
    s = _category(diff)
    code, length = dc_table[s]
    bw.write(code, length)
    if s:
        mag = diff if diff >= 0 else diff + (1 << s) - 1
        bw.write(mag, s)
    run = 0
    last_nz = int(np.nonzero(zz[1:])[0][-1]) + 1 if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_table[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_table[(run << 4) | s]
        bw.write(code, length)
        mag = v if v >= 0 else v + (1 << s) - 1
        bw.write(mag, s)
        run = 0
    if last_nz < 63:
        code, length = ac_table[0x00]  # EOB
        bw.write(code, length)
    return dc


def encode_jpeg_baseline(
    pixels: np.ndarray,
    quality: int = 85,
    subsample_420: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """(H, W, 3) uint8 RGB -> deterministic baseline JFIF bytes.

    Annex-K tables scaled by ``quality``; 4:4:4 by default,
    ``subsample_420=True`` emits 2x2-subsampled chroma (the common web
    layout) to exercise the decoder's upsampling path;
    ``restart_interval=N`` emits DRI + RSTn every N MCUs (exercises the
    decoder's restart/resync path)."""
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    if pixels.ndim == 2:
        pixels = np.repeat(pixels[:, :, None], 3, axis=2)
    h, w, _ = pixels.shape
    rgb = pixels.astype(np.float64)
    r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    # T.81 B.2.4.1: DQT bodies are in ZIGZAG scan order, and
    # _encode_block divides zigzag-ordered coefficients — so both the
    # division and the emitted bytes use the zigzagged tables (natural-
    # order emission would scramble which frequency gets which step)
    ql = _scaled_quant(QUANT_LUMA, quality)[ZIGZAG]
    qc = _scaled_quant(QUANT_CHROMA, quality)[ZIGZAG]
    dc_l = _encode_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _encode_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _encode_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _encode_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    if subsample_420:
        lh = lv = 2
        mcu_w, mcu_h = 16, 16
        # pad to MCU grid by edge replication, then 2x2-mean the chroma
        pw = (w + mcu_w - 1) // mcu_w * mcu_w
        ph = (h + mcu_h - 1) // mcu_h * mcu_h
    else:
        lh = lv = 1
        mcu_w = mcu_h = 8
        pw = (w + 7) // 8 * 8
        ph = (h + 7) // 8 * 8

    def pad(p: np.ndarray) -> np.ndarray:
        return np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")

    y, cb, cr = pad(y), pad(cb), pad(cr)
    if subsample_420:
        cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))

    bw = _BitWriter()
    preds = [0, 0, 0]
    mcu_count = 0
    entropy_parts: list[bytes] = []
    rst = 0
    for my in range(ph // mcu_h):
        for mx in range(pw // mcu_w):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                entropy_parts.append(bw.flush())
                entropy_parts.append(bytes([0xFF, 0xD0 + rst]))
                rst = (rst + 1) % 8
                bw = _BitWriter()
                preds = [0, 0, 0]
            mcu_count += 1
            for by in range(lv):
                for bx in range(lh):
                    py, px = my * mcu_h + by * 8, mx * mcu_w + bx * 8
                    preds[0] = _encode_block(
                        bw, y[py : py + 8, px : px + 8], ql, preds[0], dc_l, ac_l
                    )
            cy, cx = my * 8, mx * 8
            preds[1] = _encode_block(
                bw, cb[cy : cy + 8, cx : cx + 8], qc, preds[1], dc_c, ac_c
            )
            preds[2] = _encode_block(
                bw, cr[cy : cy + 8, cx : cx + 8], qc, preds[2], dc_c, ac_c
            )
    entropy_parts.append(bw.flush())
    entropy = b"".join(entropy_parts)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + bytes(int(v) for v in ql))
    out += seg(0xDB, b"\x01" + bytes(int(v) for v in qc))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, (lh << 4) | lv, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += seg(0xC0, sof)
    for tc, th, bits, vals in (
        (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
        (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
        (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ):
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive encoder twin (T.81 Annex G) — spectral selection +
# successive approximation with libjpeg's default 10-scan script, so the
# progressive decode path can be parity-tested against the baseline
# decode of the SAME quantized coefficients without binary fixtures.
# EOB runs are capped at 1 block (always EOB0) because the Annex-K
# Huffman tables define no EOBn symbols for n>0 — spec-valid, just a
# few percent larger, irrelevant for a test twin.
# ---------------------------------------------------------------------------

# (components, Ss, Se, Ah, Al) — libjpeg jcparam.c default progression
_PROG_SCRIPT = (
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((2,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
)


def _emit_dc_first(
    bwr: "_BitWriter",
    frame: dict,
    grids: list[np.ndarray],
    al: int,
    dc_tbls: list[dict[int, tuple[int, int]]],
) -> None:
    """Interleaved DC first scan over the padded MCU grid; the encoded
    value is the arithmetic >> Al of the quantized DC (floor — the
    decoder reconstructs pred << Al and the refinement scan ORs bit Al
    back in, which only round-trips for floor division)."""
    preds = [0] * len(frame["comps"])
    for my in range(frame["mcus_y"]):
        for mx in range(frame["mcus_x"]):
            for ci, comp in enumerate(frame["comps"]):
                tbl = dc_tbls[ci]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        v = int(grids[ci][my * comp["v"] + by,
                                          mx * comp["h"] + bx, 0]) >> al
                        diff = v - preds[ci]
                        preds[ci] = v
                        s = _category(diff)
                        code, ln = tbl[s]
                        bwr.write(code, ln)
                        if s:
                            mag = diff if diff >= 0 else diff + (1 << s) - 1
                            bwr.write(mag, s)


def _emit_dc_refine(
    bwr: "_BitWriter", frame: dict, grids: list[np.ndarray], al: int
) -> None:
    """DC refinement: one raw bit (bit Al of the quantized DC) per
    block in interleaved MCU order — no Huffman coding at all."""
    for my in range(frame["mcus_y"]):
        for mx in range(frame["mcus_x"]):
            for ci, comp in enumerate(frame["comps"]):
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        v = int(grids[ci][my * comp["v"] + by,
                                          mx * comp["h"] + bx, 0])
                        bwr.write((v >> al) & 1, 1)


def _emit_ac_first(
    bwr: "_BitWriter",
    zz: np.ndarray,
    g: dict,
    ss: int,
    se: int,
    al: int,
    act: dict[int, tuple[int, int]],
) -> None:
    """AC first scan for one band: run-length + category coding of the
    magnitude-truncated (toward zero, T.81 G.1.2.2) coefficients over
    the component's OWN block grid (non-interleaved, A.2.2)."""
    for by in range(g["bh"]):
        for bx in range(g["bw"]):
            band = [int(v) for v in zz[by, bx, ss : se + 1]]
            tval = [
                (abs(v) >> al) * (1 if v >= 0 else -1) for v in band
            ]
            nz = [i for i, t in enumerate(tval) if t]
            if not nz:
                code, ln = act[0x00]  # EOB0
                bwr.write(code, ln)
                continue
            run = 0
            for i in range(nz[-1] + 1):
                t = tval[i]
                if t == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = act[0xF0]  # ZRL
                    bwr.write(code, ln)
                    run -= 16
                s = _category(t)
                code, ln = act[(run << 4) | s]
                bwr.write(code, ln)
                mag = t if t >= 0 else t + (1 << s) - 1
                bwr.write(mag, s)
                run = 0
            if nz[-1] < se - ss:
                code, ln = act[0x00]
                bwr.write(code, ln)


def _emit_ac_refine(
    bwr: "_BitWriter",
    zz: np.ndarray,
    g: dict,
    ss: int,
    se: int,
    al: int,
    act: dict[int, tuple[int, int]],
) -> None:
    """AC refinement scan (T.81 G.1.2.3, the encode mirror of libjpeg's
    encode_mcu_AC_refine): newly-significant coefficients get a
    (run<<4)|1 symbol + sign bit; history-nonzero coefficients get one
    buffered correction bit, flushed positionally after the next
    symbol; trailing runs fold into EOB0."""
    for by in range(g["bh"]):
        for bx in range(g["bw"]):
            band = [int(v) for v in zz[by, bx, ss : se + 1]]
            absv = [abs(v) >> al for v in band]
            newly = [i for i, a in enumerate(absv) if a == 1]
            eob = newly[-1] if newly else -1
            run = 0
            br: list[int] = []
            for i, a in enumerate(absv):
                if a == 0:
                    run += 1
                    continue
                if i <= eob:
                    while run > 15:
                        code, ln = act[0xF0]
                        bwr.write(code, ln)
                        for bit in br:
                            bwr.write(bit, 1)
                        br = []
                        run -= 16
                if a > 1:
                    br.append(a & 1)
                    continue
                code, ln = act[(run << 4) | 1]
                bwr.write(code, ln)
                bwr.write(1 if band[i] >= 0 else 0, 1)
                for bit in br:
                    bwr.write(bit, 1)
                br = []
                run = 0
            if run > 0 or br:
                code, ln = act[0x00]
                bwr.write(code, ln)
                for bit in br:
                    bwr.write(bit, 1)


def encode_jpeg_progressive(
    pixels: np.ndarray, quality: int = 85, subsample_420: bool = False
) -> bytes:
    """(H, W, 3) uint8 RGB -> deterministic progressive (SOF2) JFIF.

    Identical color transform, padding, Annex-K tables, and coefficient
    quantization to encode_jpeg_baseline — only the entropy layer
    differs — so decode_jpeg() of this stream must be byte-identical to
    decode_jpeg() of the baseline encode of the same image."""
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    if pixels.ndim == 2:
        pixels = np.repeat(pixels[:, :, None], 3, axis=2)
    h, w, _ = pixels.shape
    rgb = pixels.astype(np.float64)
    r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    lh = lv = 2 if subsample_420 else 1
    frame = {
        "h": h, "w": w,
        "comps": [
            {"id": 1, "h": lh, "v": lv, "tq": 0},
            {"id": 2, "h": 1, "v": 1, "tq": 1},
            {"id": 3, "h": 1, "v": 1, "tq": 1},
        ],
    }
    geo = _prog_geometry(frame)
    ph = frame["mcus_y"] * 8 * frame["vmax"]
    pw = frame["mcus_x"] * 8 * frame["hmax"]

    def pad(p: np.ndarray) -> np.ndarray:
        return np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")

    y, cb, cr = pad(y), pad(cb), pad(cr)
    if subsample_420:
        cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))

    ql = _scaled_quant(QUANT_LUMA, quality)[ZIGZAG]
    qc = _scaled_quant(QUANT_CHROMA, quality)[ZIGZAG]

    grids: list[np.ndarray] = []
    for plane, q in ((y, ql), (cb, qc), (cr, qc)):
        bh, bw_ = plane.shape[0] // 8, plane.shape[1] // 8
        blocks = (
            plane.reshape(bh, 8, bw_, 8).transpose(0, 2, 1, 3) - 128.0
        )
        coef = np.einsum("ij,abjk,kl->abil", _DCT_C, blocks, _DCT_C.T)
        nat = coef.reshape(bh, bw_, 64)
        grids.append(np.round(nat[:, :, ZIGZAG] / q).astype(np.int32))

    dc_tbls = [
        _encode_codes(DC_LUMA_BITS, DC_LUMA_VALS),
        _encode_codes(DC_CHROMA_BITS, DC_CHROMA_VALS),
        _encode_codes(DC_CHROMA_BITS, DC_CHROMA_VALS),
    ]
    ac_tbls = [
        _encode_codes(AC_LUMA_BITS, AC_LUMA_VALS),
        _encode_codes(AC_CHROMA_BITS, AC_CHROMA_VALS),
        _encode_codes(AC_CHROMA_BITS, AC_CHROMA_VALS),
    ]
    dc_ids, ac_ids = (0, 1, 1), (0, 1, 1)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + bytes(int(v) for v in ql))
    out += seg(0xDB, b"\x01" + bytes(int(v) for v in qc))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, (lh << 4) | lv, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += seg(0xC2, sof)
    for tc, th, bits, vals in (
        (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
        (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
        (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ):
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    for comps, ss, se, ah, al in _PROG_SCRIPT:
        sos = bytearray([len(comps)])
        for ci in comps:
            sos += bytes(
                [frame["comps"][ci]["id"], (dc_ids[ci] << 4) | ac_ids[ci]]
            )
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, bytes(sos))
        bwr = _BitWriter()
        if ss == 0:
            if ah == 0:
                _emit_dc_first(bwr, frame, grids, al, dc_tbls)
            else:
                _emit_dc_refine(bwr, frame, grids, al)
        else:
            (ci,) = comps
            if ah == 0:
                _emit_ac_first(
                    bwr, grids[ci], geo[ci], ss, se, al, ac_tbls[ci]
                )
            else:
                _emit_ac_refine(
                    bwr, grids[ci], geo[ci], ss, se, al, ac_tbls[ci]
                )
        out += bwr.flush()
    out += b"\xff\xd9"
    return bytes(out)
