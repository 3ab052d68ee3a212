"""Pure-Python baseline JFIF (JPEG) codec — the last image-format seam
from VERDICT r6 #5: web corpora are mostly JPEG, and the container has no
PIL/libjpeg, so the multimodal kernels (ahash_assets / phash_near_dup)
previously raised NotImplementedError on the one format that matters.

This module implements the sequential-baseline subset of ITU-T T.81
(public spec) with stdlib only:

* :func:`decode_jpeg_luma` — full marker parse (DQT/SOF0/DHT/SOS/DRI),
  Huffman entropy decode with byte-unstuffing and restart markers, then
  dequantize + dezigzag + separable float IDCT of the LUMA component
  only. The pipeline's contract is grayscale pixels (codecs.decode_image
  returns (w, h, gray)), and JPEG stores luma as its own component — so
  chroma blocks are entropy-decoded (the bitstream demands it) but never
  reconstructed: no upsampling, no color convert, ~3x less IDCT work.
* :func:`encode_jpeg_baseline` — single-component (grayscale) baseline
  encoder with the T.81 Annex K example quantization/Huffman tables, so
  tests and fixtures can synthesize REAL JPEG payloads without any
  library.

Determinism: the IDCT/FDCT use IEEE-double cosine tables and a fixed
summation order, and every rounding is an explicit int() — bit-stable
across platforms, which the perceptual-dedup oracle checks require.

Progressive (SOF2), arithmetic coding, 12-bit precision, and hierarchical
modes raise NotImplementedError — inject a library codec via
``codecs.register_decoder`` when those matter.

Reference analogue: none (the reference has no multimodal surface);
public-spec reimplementation, no third-party code.
"""

from __future__ import annotations

import math
import struct

# zig-zag order: index i in scan order -> position in the 8x8 block
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# T.81 Annex K.1 example luminance quantization table (quality 50 base)
STD_LUMA_QT = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

# T.81 Annex K.3 example Huffman tables (luminance DC and AC):
# (bits[1..16] code counts, values)
STD_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
STD_DC_VALS = list(range(12))
STD_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
STD_AC_VALS = [
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

# IEEE-double cosine table for the separable (I)DCT, fixed order
_COS = [[math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)] for u in range(8)]
_C = [1 / math.sqrt(2)] + [1.0] * 7


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _Huff:
    """Canonical Huffman table: (length, code) -> symbol."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; restart markers (FFD0-D7) are surfaced to the caller."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                # past the scan (EOI / next segment): pad with zeros, the
                # spec's defined behavior for a truncated final byte run
                self.bitbuf = (self.bitbuf << 8) & 0xFFFFFFFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.bitbuf = ((self.bitbuf << 8) | b) & 0xFFFFFFFF
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_after_restart(self) -> None:
        """Skip the restart marker and byte-align."""
        d = self.data
        # find the FFDx pair from the current byte position
        while not (d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7):
            self.pos += 1
        self.pos += 2
        self.bitbuf = 0
        self.nbits = 0

    def decode_huff(self, table: _Huff) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a t-bit magnitude to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _idct_block(coef: list[float]) -> list[int]:
    """Separable 2-D inverse DCT of one dequantized 8x8 block, returning
    level-shifted (+128) clamped samples. Fixed summation order."""
    # rows (u over columns) then columns: tmp[y][x]
    tmp = [[0.0] * 8 for _ in range(8)]
    for y in range(8):
        base = y * 8
        for x in range(8):
            s = 0.0
            for u in range(8):
                s += _C[u] * coef[base + u] * _COS[u][x]
            tmp[y][x] = s / 2
    out = [0] * 64
    for x in range(8):
        for y in range(8):
            s = 0.0
            for v in range(8):
                s += _C[v] * tmp[v][x] * _COS[v][y]
            val = int(round(s / 2)) + 128
            out[y * 8 + x] = 0 if val < 0 else (255 if val > 255 else val)
    return out


def decode_jpeg_luma(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline JFIF payload to (width, height, grayscale) —
    the luma plane at full image resolution. See module docstring for
    the supported subset."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qts: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], _Huff] = {}  # (class, id) -> table
    frame = None
    restart_interval = 0
    n = len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables")
                qts[tq] = list(seg[p : p + 64])
                p += 64
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec}")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0/1) is supported; "
                "register a library codec for progressive/arithmetic files"
            )
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                cnt = sum(bits)
                vals = list(seg[p + 17 : p + 17 + cnt])
                huff[(tc, th)] = _Huff(bits, vals)
                p += 17 + cnt
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG scan before frame header")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tda = seg[1 + 2 * i : 3 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tda >> 4, tda & 15))
            data_pos = pos + seglen
            return _decode_scan(
                payload, data_pos, frame, scan, qts, huff, restart_interval
            )
        pos += seglen
    raise ValueError("JPEG payload has no scan data")


def _decode_scan(data, pos, frame, scan, qts, huff, restart_interval):
    w, h = frame["w"], frame["h"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    luma = comps[0]
    # luma plane dimensions in blocks (full MCU grid coverage)
    lw = mcux * luma["h"] * 8
    plane = bytearray(lw * mcuy * luma["v"] * 8)
    qt_l = qts[luma["tq"]]
    reader = _BitReader(data, pos)
    preds = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align_after_restart()
                for cid in preds:
                    preds[cid] = 0
            try:
                for comp, td, ta in scan:
                    is_luma = comp["id"] == luma["id"]
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            block = _decode_block(
                                reader, huff[(0, td)], huff[(1, ta)], preds, comp
                            )
                            if is_luma:
                                _place(
                                    plane, lw, block, qt_l,
                                    (mx * comp["h"] + bx) * 8,
                                    (my * comp["v"] + by) * 8,
                                )
            except _RestartMarker:
                # tolerated misalignment: treat as interval boundary
                reader.align_after_restart()
                for cid in preds:
                    preds[cid] = 0
            mcu_count += 1
    # crop the MCU-padded plane to the luma component's true size (= image
    # size when luma sampling is maximal, the overwhelmingly common case)
    cw = (w * luma["h"] + hmax - 1) // hmax
    ch = (h * luma["v"] + vmax - 1) // vmax
    out = bytearray(cw * ch)
    for y in range(ch):
        out[y * cw : (y + 1) * cw] = plane[y * lw : y * lw + cw]
    return cw, ch, bytes(out)


def _decode_block(reader, dc_table, ac_table, preds, comp):
    coef = [0] * 64
    t = reader.decode_huff(dc_table)
    diff = _extend(reader.read_bits(t), t) if t else 0
    preds[comp["id"]] += diff
    coef[0] = preds[comp["id"]]
    k = 1
    while k < 64:
        rs = reader.decode_huff(ac_table)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            break
        coef[ZIGZAG[k]] = _extend(reader.read_bits(s), s)
        k += 1
    return coef


def _place(plane, lw, coef, qt, x0, y0):
    # qt is stored in zig-zag order; coef is already in natural order
    # (dezigzagged during entropy decode), so dequantize positionally
    deq = [0.0] * 64
    for i in range(64):
        deq[ZIGZAG[i]] = coef[ZIGZAG[i]] * qt[i]
    px = _idct_block(deq)
    for y in range(8):
        row = (y0 + y) * lw + x0
        plane[row : row + 8] = bytes(px[y * 8 : y * 8 + 8])


# ---------------------------------------------------------------------------
# encoder (grayscale baseline, Annex K tables)
# ---------------------------------------------------------------------------


def _fdct_block(samples: list[int]) -> list[float]:
    """Forward 2-D DCT of one level-shifted 8x8 block."""
    shifted = [s - 128 for s in samples]
    tmp = [[0.0] * 8 for _ in range(8)]
    for u in range(8):
        for y in range(8):
            s = 0.0
            for x in range(8):
                s += shifted[y * 8 + x] * _COS[u][x]
            tmp[u][y] = s * _C[u] / 2
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for y in range(8):
                s += tmp[u][y] * _COS[v][y]
            out[v * 8 + u] = s * _C[v] / 2
    return out


class _BitWriter:
    def __init__(self):
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
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _quality_qt(quality: int) -> list[int]:
    """libjpeg-compatible quality scaling of the Annex K luma table."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    return [min(255, max(1, (q * scale + 50) // 100)) for q in STD_LUMA_QT]


def _magnitude(v: int) -> tuple[int, int]:
    """(bit-size, magnitude code) of a signed coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    return t, v if v > 0 else v + (1 << t) - 1


def _encode_block(wtr: _BitWriter, samples: list[int], qt, dc_codes, ac_codes, pred: int) -> int:
    """FDCT + quantize + entropy-encode one 8x8 block; returns the new
    DC predictor."""
    f = _fdct_block(samples)
    zz = [int(round(f[ZIGZAG[i]] / qt[i])) for i in range(64)]
    diff = zz[0] - pred
    t, mag = _magnitude(diff)
    code, ln = dc_codes[t]
    wtr.write(code, ln)
    if t:
        wtr.write(mag, t)
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
    for i in range(1, last_nz + 1):
        if zz[i] == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            wtr.write(code, ln)
            run -= 16
        t, mag = _magnitude(zz[i])
        code, ln = ac_codes[(run << 4) | t]
        wtr.write(code, ln)
        wtr.write(mag, t)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        wtr.write(code, ln)
    return zz[0]


def _block_at(plane: bytes, w: int, h: int, x0: int, y0: int) -> list[int]:
    """8x8 block with edge replication past the plane boundary."""
    return [
        plane[min(y0 + y, h - 1) * w + min(x0 + x, w - 1)]
        for y in range(8)
        for x in range(8)
    ]


def encode_jpeg_ycbcr(
    width: int,
    height: int,
    rgb: bytes,
    quality: int = 75,
    subsample: tuple[int, int] = (2, 2),
) -> bytes:
    """Three-component baseline JFIF from an RGB raster, with luma
    sampling factors *subsample* (=(2,2) is 4:2:0, (1,1) is 4:4:4).
    All components share the Annex K luma tables (legal, simpler).
    Exists so tests can exercise the decoder's multi-component MCU
    geometry and chroma-skip on real color payloads."""
    assert len(rgb) == width * height * 3
    sh, sv = subsample
    # RGB -> YCbCr (JFIF full-range), integer rounded
    npix = width * height
    ybuf = bytearray(npix)
    cb_full = bytearray(npix)
    cr_full = bytearray(npix)
    for i in range(npix):
        r, g, b = rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2]
        yv = (299 * r + 587 * g + 114 * b + 500) // 1000
        cb = round(-0.168736 * r - 0.331264 * g + 0.5 * b + 128)
        cr = round(0.5 * r - 0.418688 * g - 0.081312 * b + 128)
        ybuf[i] = min(255, max(0, yv))
        cb_full[i] = min(255, max(0, cb))
        cr_full[i] = min(255, max(0, cr))
    # box-average chroma downsample by (sh, sv)
    cw = (width + sh - 1) // sh
    ch = (height + sv - 1) // sv
    def down(full: bytearray) -> bytes:
        out = bytearray(cw * ch)
        for cy in range(ch):
            for cx in range(cw):
                s = cnt = 0
                for y in range(cy * sv, min((cy + 1) * sv, height)):
                    for x in range(cx * sh, min((cx + 1) * sh, width)):
                        s += full[y * width + x]
                        cnt += 1
                out[cy * cw + cx] = s // cnt
        return bytes(out)
    cbp, crp = down(cb_full), down(cr_full)

    qt = _quality_qt(quality)
    dc_codes = _huff_codes(STD_DC_BITS, STD_DC_VALS)
    ac_codes = _huff_codes(STD_AC_BITS, STD_AC_VALS)
    wtr = _BitWriter()
    preds = [0, 0, 0]
    mcux = (width + 8 * sh - 1) // (8 * sh)
    mcuy = (height + 8 * sv - 1) // (8 * sv)
    for my in range(mcuy):
        for mx in range(mcux):
            for by in range(sv):
                for bx in range(sh):
                    blk = _block_at(
                        bytes(ybuf), width, height,
                        (mx * sh + bx) * 8, (my * sv + by) * 8,
                    )
                    preds[0] = _encode_block(wtr, blk, qt, dc_codes, ac_codes, preds[0])
            preds[1] = _encode_block(
                wtr, _block_at(cbp, cw, ch, mx * 8, my * 8), qt, dc_codes, ac_codes, preds[1]
            )
            preds[2] = _encode_block(
                wtr, _block_at(crp, cw, ch, mx * 8, my * 8), qt, dc_codes, ac_codes, preds[2]
            )
    entropy = wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = b"\xff\xd8"
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(qt))
    out += seg(
        0xC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([1, (sh << 4) | sv, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    out += seg(0xC4, bytes([0x00]) + bytes(STD_DC_BITS) + bytes(STD_DC_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(STD_AC_BITS) + bytes(STD_AC_VALS))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    out += entropy
    out += b"\xff\xd9"
    return out


def encode_jpeg_baseline(width: int, height: int, gray: bytes, quality: int = 75) -> bytes:
    """Single-component (grayscale) baseline JFIF from a width*height
    luma raster — real, spec-conformant JPEG output for fixtures."""
    assert len(gray) == width * height
    qt = _quality_qt(quality)
    dc_codes = _huff_codes(STD_DC_BITS, STD_DC_VALS)
    ac_codes = _huff_codes(STD_AC_BITS, STD_AC_VALS)
    wtr = _BitWriter()
    pred = 0
    for y0 in range(0, height, 8):
        for x0 in range(0, width, 8):
            block = _block_at(gray, width, height, x0, y0)
            pred = _encode_block(wtr, block, qt, dc_codes, ac_codes, pred)
    entropy = wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = b"\xff\xd8"  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(qt))
    out += seg(0xC0, struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(STD_DC_BITS) + bytes(STD_DC_VALS))
    out += seg(0xC4, bytes([0x10]) + bytes(STD_AC_BITS) + bytes(STD_AC_VALS))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += entropy
    out += b"\xff\xd9"  # EOI
    return out
