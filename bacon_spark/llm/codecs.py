"""Pure-Python (stdlib-only) decoders for UNCOMPRESSED image formats.

VERDICT r4 task #6 / r5 task #5: the container has no PIL/ffmpeg, so the
multimodal kernels were fully stubbed. This module vendors real decoders
for the formats stdlib can handle — binary PPM/PGM (netpbm P6/P5),
uncompressed 24-bit BMP (BI_RGB), and non-interlaced 8-bit PNG (gray,
RGB, palette, gray+alpha, RGBA; ``zlib`` inflate + the five scanline
filters) — so ``decode_stub=False`` works end-to-end on real pixels for
those kinds, and NotImplementedError only remains for genuinely
codec-bound formats (JPEG/video, which need an entropy/DCT codec).

Everything here is deterministic integer arithmetic (luma and resize use
integer division), so asset hashes are bit-stable across platforms — a
requirement for the perceptual-dedup oracle checks.

Encoders are included so tests can synthesize real image payloads
without any library.
"""

from __future__ import annotations

import struct
import zlib

# ---------------------------------------------------------------------------
# netpbm: P6 (binary RGB) / P5 (binary grayscale)
# ---------------------------------------------------------------------------


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Binary PPM (P6, maxval 255) from a width*height*3 RGB byte string."""
    assert len(rgb) == width * height * 3
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def encode_pgm(width: int, height: int, gray: bytes) -> bytes:
    """Binary PGM (P5, maxval 255) from a width*height grayscale byte string."""
    assert len(gray) == width * height
    return b"P5\n%d %d\n255\n" % (width, height) + gray


def _pnm_header(payload: bytes) -> tuple[bytes, int, int, int, int]:
    """Parse a netpbm header: (magic, width, height, maxval, data_offset).

    Handles arbitrary whitespace and ``#`` comment lines, per the spec."""
    magic = payload[:2]
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        # skip whitespace and comments
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace byte after maxval, then raster
    return magic, fields[0], fields[1], fields[2], pos


def decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """Decode binary PPM/PGM to (width, height, grayscale bytes).

    RGB is reduced with integer ITU-R 601 luma:
    ``(299r + 587g + 114b + 500) // 1000``."""
    magic, w, h, maxval, off = _pnm_header(payload)
    if maxval != 255:
        raise NotImplementedError(f"netpbm maxval {maxval} (only 8-bit supported)")
    if magic == b"P5":
        gray = payload[off : off + w * h]
        if len(gray) != w * h:
            raise ValueError("truncated PGM raster")
        return w, h, gray
    if magic == b"P6":
        raster = payload[off : off + w * h * 3]
        if len(raster) != w * h * 3:
            raise ValueError("truncated PPM raster")
        gray = bytes(
            (299 * raster[i] + 587 * raster[i + 1] + 114 * raster[i + 2] + 500) // 1000
            for i in range(0, len(raster), 3)
        )
        return w, h, gray
    raise NotImplementedError(f"netpbm magic {magic!r} (only binary P5/P6 supported)")


# ---------------------------------------------------------------------------
# BMP: uncompressed 24-bit BI_RGB, BITMAPINFOHEADER
# ---------------------------------------------------------------------------


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Uncompressed 24-bit BMP from width*height*3 RGB (top-down input;
    stored bottom-up with 4-byte row padding, as the format requires)."""
    assert len(rgb) == width * height * 3
    row_pad = (-width * 3) % 4
    raster = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        for x in range(width):
            i = (y * width + x) * 3
            raster += bytes((rgb[i + 2], rgb[i + 1], rgb[i]))  # BGR
        raster += b"\x00" * row_pad
    pixel_offset = 14 + 40
    file_size = pixel_offset + len(raster)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pixel_offset)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(raster), 2835, 2835, 0, 0
    )
    return header + dib + bytes(raster)


def decode_bmp(payload: bytes) -> tuple[int, int, bytes]:
    """Decode uncompressed 24-bit BMP to (width, height, grayscale bytes),
    top-down row order. Handles bottom-up AND top-down (negative height)
    rasters and 4-byte row padding."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pixel_offset,) = struct.unpack_from("<I", payload, 10)
    dib_size, width, height = struct.unpack_from("<Iii", payload, 14)
    if dib_size < 40:
        raise NotImplementedError("BMP core-header variant not supported")
    planes, bitcount, compression = struct.unpack_from("<HHI", payload, 26)
    if bitcount != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (got {bitcount}-bit, "
            f"compression={compression})"
        )
    top_down = height < 0
    h = abs(height)
    stride = (width * 3 + 3) & ~3
    gray = bytearray(width * h)
    for out_y in range(h):
        src_y = out_y if top_down else h - 1 - out_y
        row = pixel_offset + src_y * stride
        for x in range(width):
            i = row + x * 3
            b_, g_, r_ = payload[i], payload[i + 1], payload[i + 2]
            gray[out_y * width + x] = (299 * r_ + 587 * g_ + 114 * b_ + 500) // 1000
    return width, h, bytes(gray)


# ---------------------------------------------------------------------------
# PNG: non-interlaced 8-bit, stdlib zlib only
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (8-bit depth)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    body = typ + data
    return struct.pack(">I", len(data)) + body + struct.pack(">I", zlib.crc32(body))


def encode_png(
    width: int,
    height: int,
    pixels: bytes,
    color_type: int = 2,
    filters=None,
) -> bytes:
    """Minimal PNG encoder (8-bit, non-interlaced; color_type 0=gray,
    2=RGB, 6=RGBA). *filters* optionally gives a per-row filter type
    (0-4) so tests can exercise every decode filter path; default is
    filter 0 (None) on every row."""
    bpp = _PNG_CHANNELS[color_type]
    if color_type == 3:
        raise NotImplementedError("palette encoding not supported (decode only)")
    assert len(pixels) == width * height * bpp
    stride = width * bpp
    rows = bytearray()
    prev = bytes(stride)
    for y in range(height):
        raw = pixels[y * stride : (y + 1) * stride]
        f = filters[y] if filters else 0
        rows.append(f)
        rows += _png_filter_row(raw, prev, bpp, f)
        prev = raw
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(rows)))
        + _png_chunk(b"IEND", b"")
    )


def _png_filter_row(raw: bytes, prev: bytes, bpp: int, f: int) -> bytes:
    """Apply PNG filter *f* to one raw scanline (encoder side)."""
    out = bytearray(len(raw))
    for i in range(len(raw)):
        a = raw[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if f == 0:
            out[i] = raw[i]
        elif f == 1:
            out[i] = (raw[i] - a) & 0xFF
        elif f == 2:
            out[i] = (raw[i] - b) & 0xFF
        elif f == 3:
            out[i] = (raw[i] - (a + b) // 2) & 0xFF
        elif f == 4:
            out[i] = (raw[i] - _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"PNG filter type {f}")
    return bytes(out)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a non-interlaced 8-bit PNG (color types 0 gray, 2 RGB,
    3 palette, 4 gray+alpha, 6 RGBA) to (width, height, grayscale),
    stdlib ``zlib`` only — no codec library. Alpha is ignored (the
    perceptual hash compares luminance); color reduces with the same
    integer ITU-R 601 luma as the other decoders, so identical pixels
    hash identically regardless of container format.

    Interlaced (Adam7) and 16-bit images raise NotImplementedError —
    rare in practice and out of scope for a vendored decoder."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    w = h = color_type = None
    palette = b""
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if typ == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise NotImplementedError(f"PNG bit depth {depth} (only 8)")
            if interlace:
                raise NotImplementedError("interlaced (Adam7) PNG not supported")
            if comp or filt:
                raise ValueError("invalid PNG compression/filter method")
            if color_type not in _PNG_CHANNELS:
                raise NotImplementedError(f"PNG color type {color_type}")
        elif typ == b"PLTE":
            palette = data
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    bpp = _PNG_CHANNELS[color_type]
    stride = w * bpp
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * h:
        raise ValueError("truncated PNG raster")
    # unfilter scanlines in place
    recon = bytearray(stride * h)
    prev = bytes(stride)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if f == 1:
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif f == 2:
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif f == 4:
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif f != 0:
            raise ValueError(f"PNG filter type {f}")
        recon[y * stride : (y + 1) * stride] = line
        prev = bytes(line)
    # reduce to grayscale
    if color_type == 0:
        return w, h, bytes(recon)
    if color_type == 4:  # gray + alpha: take gray sample
        return w, h, bytes(recon[0::2])
    if color_type == 3:  # palette index -> RGB -> luma
        if not palette:
            raise ValueError("palette PNG missing PLTE")
        gray = bytes(
            (
                299 * palette[3 * i]
                + 587 * palette[3 * i + 1]
                + 114 * palette[3 * i + 2]
                + 500
            )
            // 1000
            for i in recon
        )
        return w, h, gray
    # RGB (2) / RGBA (6): integer luma, alpha ignored
    gray = bytes(
        (299 * recon[i] + 587 * recon[i + 1] + 114 * recon[i + 2] + 500) // 1000
        for i in range(0, len(recon), bpp)
    )
    return w, h, gray


# ---------------------------------------------------------------------------
# dispatch + deterministic resize
# ---------------------------------------------------------------------------


#: pluggable decoder overrides: format key -> fn(payload) -> (w, h, gray).
#: Lets a deployment with a real codec library (PIL, turbojpeg) replace
#: or extend the stdlib decoders without touching the pipeline — the
#: documented codec seam (VERDICT r6 #5). Keys: "jpeg", "png", "bmp",
#: "pnm", "video".
_DECODERS: dict = {}


def register_decoder(fmt: str, fn) -> None:
    """Install (or, with ``fn=None``, remove) a decoder override for
    *fmt*. The function receives the raw payload and must return
    (width, height, grayscale-bytes) — the same contract as the
    stdlib decoders here."""
    if fn is None:
        _DECODERS.pop(fmt, None)
    else:
        _DECODERS[fmt] = fn


def _sniff(payload: bytes) -> str:
    if payload[:2] in (b"P5", b"P6"):
        return "pnm"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:8] == _PNG_SIG:
        return "png"
    return "unknown"


def decode_image(payload: bytes) -> tuple[int, int, bytes]:
    """Sniff the payload's magic bytes and decode to (w, h, grayscale).

    A registered override (``register_decoder``) wins; otherwise the
    stdlib decoders apply — including baseline JFIF via llm/jpeg.py, so
    the format web corpora actually contain decodes out of the box.
    NotImplementedError remains only for video and for JPEG variants the
    baseline decoder rejects (progressive/arithmetic)."""
    fmt = _sniff(payload)
    override = _DECODERS.get(fmt)
    if override is not None:
        return override(payload)
    if fmt == "pnm":
        return decode_ppm(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    if fmt == "jpeg":
        from .jpeg import decode_jpeg_luma

        return decode_jpeg_luma(payload)
    if fmt == "png":
        return decode_png(payload)
    raise NotImplementedError(f"unrecognized image format (magic {payload[:4]!r})")


def resize_gray(gray: bytes, w: int, h: int, tw: int, th: int) -> bytes:
    """Box-average resize of a grayscale raster to tw x th, all-integer
    (sum // count), so results are bit-identical everywhere."""
    out = bytearray(tw * th)
    for ty in range(th):
        y0, y1 = ty * h // th, max((ty + 1) * h // th, ty * h // th + 1)
        for tx in range(tw):
            x0, x1 = tx * w // tw, max((tx + 1) * w // tw, tx * w // tw + 1)
            s = 0
            for y in range(y0, min(y1, h)):
                row = y * w
                for x in range(x0, min(x1, w)):
                    s += gray[row + x]
            n = (min(y1, h) - y0) * (min(x1, w) - x0)
            out[ty * tw + tx] = s // n if n else 0
    return bytes(out)


def ahash_pixels(payload: bytes, bits: int, grid: tuple[int, int]) -> int:
    """Real-pixel average hash: decode, box-resize to grid (= bits cells),
    set bit j iff cell j's gray exceeds the cell mean. The real-decoder
    twin of the byte-histogram stub in :mod:`.multimodal`."""
    tw, th = grid
    assert tw * th == bits
    w, h, gray = decode_image(payload)
    cells = resize_gray(gray, w, h, tw, th)
    mean = sum(cells) / float(bits)
    return sum(1 << j for j in range(bits) if cells[j] > mean)


# ---------------------------------------------------------------------------
# WAV (RIFF PCM16 mono): the stdlib-decodable audio format
# ---------------------------------------------------------------------------


def encode_wav(rate: int, samples: list[int]) -> bytes:
    """Canonical 44-byte RIFF/WAVE header + little-endian PCM16 mono
    samples — real, player-readable audio for fixtures (the audio
    analogue of the image encoders above)."""
    import struct as _struct

    n = len(samples)
    data = b"".join(_struct.pack("<h", s) for s in samples)
    hdr = b"RIFF" + _struct.pack("<I", 36 + 2 * n) + b"WAVE"
    hdr += b"fmt " + _struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
    hdr += b"data" + _struct.pack("<I", 2 * n)
    return hdr + data


def decode_wav(payload: bytes) -> tuple[int, list[int]]:
    """(sample_rate, PCM16 samples) from a RIFF/WAVE payload. Walks the
    chunk list (fmt may be padded / followed by LIST chunks), supports
    PCM16 mono only — NotImplementedError for compressed/multi-channel
    forms (the documented seam for a library codec)."""
    import struct as _struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    rate = None
    samples = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = _struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt, ch, rate, _br, _ba, bits = _struct.unpack("<HHIIHH", body[:16])
            if fmt != 1 or ch != 1 or bits != 16:
                raise NotImplementedError(
                    f"WAV format {fmt}/{ch}ch/{bits}bit (PCM16 mono only)"
                )
        elif cid == b"data":
            samples = list(
                _struct.unpack(f"<{size // 2}h", body[: (size // 2) * 2])
            )
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("WAV payload missing fmt/data chunk")
    return rate, samples
