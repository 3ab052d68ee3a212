"""Real-pixel decode path for the multimodal kernels (VERDICT r4 task #6
+ r5 task #5): the vendored stdlib-only PPM/PGM/BMP/PNG codecs, the
integer box resize, and the end-to-end aHash/near-dup pipeline on REAL
images (decode_stub=False). NotImplementedError must remain only for
codec-bound formats (JPEG/video)."""

import pytest

from bacon_spark.llm.codecs import (
    _png_chunk,
    ahash_pixels,
    decode_bmp,
    decode_image,
    decode_png,
    decode_ppm,
    encode_bmp,
    encode_pgm,
    encode_png,
    encode_ppm,
    resize_gray,
)
from bacon_spark.llm.multimodal import (
    ASSET_SCHEMA,
    PHASH_BITS,
    ahash_assets,
    extract_image_features,
    phash_near_dup,
)


def _gradient_rgb(w, h, invert=False, noise_at=()):
    """Deterministic RGB gradient; noise_at pixels get a brightness bump."""
    px = bytearray()
    for y in range(h):
        for x in range(w):
            v = (x * 255 // max(w - 1, 1) + y * 255 // max(h - 1, 1)) // 2
            if invert:
                v = 255 - v
            if (x, y) in noise_at:
                v = min(255, v + 40)
            px += bytes((v, v, v))
    return bytes(px)


def test_ppm_pgm_roundtrip_exact():
    w, h = 5, 3
    rgb = _gradient_rgb(w, h)
    dw, dh, gray = decode_ppm(encode_ppm(w, h, rgb))
    assert (dw, dh) == (w, h)
    # gray of an (v,v,v) pixel is v exactly under integer luma
    assert list(gray) == [rgb[i] for i in range(0, len(rgb), 3)]
    # P5 grayscale round-trips bit-exactly
    assert decode_ppm(encode_pgm(w, h, gray)) == (w, h, gray)


def test_ppm_header_comments_and_whitespace():
    raw = b"P5 #comment\n# another\n 3\t2 #dims\n255\n" + bytes(range(6))
    assert decode_ppm(raw) == (3, 2, bytes(range(6)))


def test_bmp_roundtrip_padding_and_row_order():
    # width 5 -> 15-byte rows padded to 16: exercises the stride logic
    w, h = 5, 3
    rgb = _gradient_rgb(w, h)
    dw, dh, gray = decode_bmp(encode_bmp(w, h, rgb))
    assert (dw, dh) == (w, h)
    assert list(gray) == [rgb[i] for i in range(0, len(rgb), 3)]


def test_bmp_matches_ppm_for_same_pixels():
    rgb = _gradient_rgb(8, 8)
    assert decode_bmp(encode_bmp(8, 8, rgb)) == decode_ppm(encode_ppm(8, 8, rgb))


def test_luma_weights():
    # pure red / green / blue pixels hit the integer 601 luma exactly
    _, _, gray = decode_ppm(encode_ppm(3, 1, bytes((255, 0, 0, 0, 255, 0, 0, 0, 255))))
    assert list(gray) == [76, 150, 29]  # (299*255+500)//1000 etc.


def test_decode_image_dispatch_and_codec_stubs():
    rgb = _gradient_rgb(4, 4)
    assert decode_image(encode_ppm(4, 4, rgb)) == decode_ppm(encode_ppm(4, 4, rgb))
    assert decode_image(encode_bmp(4, 4, rgb)) == decode_bmp(encode_bmp(4, 4, rgb))
    assert decode_image(encode_png(4, 4, rgb)) == decode_png(encode_png(4, 4, rgb))
    with pytest.raises(ValueError, match="no scan data"):
        decode_image(b"\xff\xd8\xff\xe0 fake jpeg")


# --- baseline JPEG (llm/jpeg.py) --------------------------------------------


def _jpeg_mods():
    from bacon_spark.llm import jpeg

    return jpeg


def test_jpeg_gray_roundtrip_and_determinism():
    jpeg = _jpeg_mods()
    w, h = 48, 32
    gray = bytes(
        ((x * 4 + y * 3) % 256) if (x // 8 + y // 8) % 2 else (x * 5) % 256
        for y in range(h)
        for x in range(w)
    )
    p = jpeg.encode_jpeg_baseline(w, h, gray, quality=90)
    assert p[:3] == b"\xff\xd8\xff" and p[-2:] == b"\xff\xd9"
    dw, dh, dec = jpeg.decode_jpeg_luma(p)
    assert (dw, dh) == (w, h)
    err = [abs(a - b) for a, b in zip(gray, dec)]
    assert sum(err) / len(err) < 2.0 and max(err) < 24
    # bit-determinism both ways (oracle-hash requirement)
    assert jpeg.encode_jpeg_baseline(w, h, gray, quality=90) == p
    assert jpeg.decode_jpeg_luma(p)[2] == dec
    # flat image near-exact
    flat = bytes([77]) * (w * h)
    assert max(
        abs(a - b)
        for a, b in zip(flat, jpeg.decode_jpeg_luma(jpeg.encode_jpeg_baseline(w, h, flat))[2])
    ) <= 1


@pytest.mark.parametrize("sub", [(2, 2), (1, 1), (2, 1)])
def test_jpeg_color_decodes_luma_across_subsampling(sub):
    jpeg = _jpeg_mods()
    w, h = 40, 24
    rgb = bytes(
        c
        for y in range(h)
        for x in range(w)
        for c in ((x * 6) % 256, (y * 9) % 256, (x * 3 + y * 5) % 256)
    )
    luma = [
        (299 * rgb[3 * i] + 587 * rgb[3 * i + 1] + 114 * rgb[3 * i + 2] + 500) // 1000
        for i in range(w * h)
    ]
    p = jpeg.encode_jpeg_ycbcr(w, h, rgb, quality=90, subsample=sub)
    dw, dh, dec = jpeg.decode_jpeg_luma(p)
    assert (dw, dh) == (w, h)
    err = [abs(a - b) for a, b in zip(luma, dec)]
    assert sum(err) / len(err) < 2.0, (sub, max(err))


def test_jpeg_odd_dimensions_and_quality_floor():
    jpeg = _jpeg_mods()
    w, h = 13, 9  # non-multiple-of-8 / non-multiple-of-MCU
    gray = bytes((x * 19 + y * 7) % 256 for y in range(h) for x in range(w))
    for q in (25, 75, 95):
        dw, dh, dec = jpeg.decode_jpeg_luma(jpeg.encode_jpeg_baseline(w, h, gray, q))
        assert (dw, dh) == (w, h) and len(dec) == w * h
    p = jpeg.encode_jpeg_ycbcr(
        w, h, bytes(b for g in gray for b in (g, g, g)), subsample=(2, 2)
    )
    dw, dh, dec = jpeg.decode_jpeg_luma(p)
    assert (dw, dh) == (w, h)


def test_jpeg_progressive_rejected_with_clear_error():
    jpeg = _jpeg_mods()
    p = bytearray(jpeg.encode_jpeg_baseline(8, 8, bytes(range(64)) , 75))
    sof = p.find(b"\xff\xc0")
    p[sof + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="baseline"):
        jpeg.decode_jpeg_luma(bytes(p))


def test_decode_image_routes_jpeg_and_ahash_matches_png():
    """The pipeline contract: ahash over a JPEG of an image equals (to
    within a few noise bits) ahash over the lossless PNG of the same
    image — JPEG is now a first-class decodable format."""
    from bacon_spark.llm.codecs import ahash_pixels
    from bacon_spark.llm.jpeg import encode_jpeg_ycbcr

    w, h = 64, 64
    rgb = _gradient_rgb(w, h)
    a_png = ahash_pixels(encode_png(w, h, rgb), 64, (8, 8))
    a_jpg = ahash_pixels(encode_jpeg_ycbcr(w, h, rgb, quality=92), 64, (8, 8))
    assert bin(a_png ^ a_jpg).count("1") <= 6  # near-identical perceptual hash


def test_register_decoder_override_wins_and_unregisters():
    from bacon_spark.llm import codecs

    calls = []

    def fake(payload):
        calls.append(len(payload))
        return 1, 1, b"\x00"

    codecs.register_decoder("jpeg", fake)
    try:
        assert decode_image(b"\xff\xd8\xff\xe0 fake jpeg") == (1, 1, b"\x00")
        assert calls
    finally:
        codecs.register_decoder("jpeg", None)
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0 fake jpeg")


def test_png_every_filter_type_matches_ppm():
    w, h = 9, 6
    rgb = _gradient_rgb(w, h, noise_at={(2, 1), (5, 4)})
    want = decode_ppm(encode_ppm(w, h, rgb))
    for filters in (None, [1] * h, [2] * h, [3] * h, [4] * h, [0, 1, 2, 3, 4, 4]):
        assert decode_png(encode_png(w, h, rgb, filters=filters)) == want, filters


def test_png_gray_and_alpha_color_types():
    w, h = 6, 4
    gray = bytes((x * 31 + y * 17) % 256 for y in range(h) for x in range(w))
    # type 0 (gray) round-trips bit-exactly through Paeth
    assert decode_png(encode_png(w, h, gray, color_type=0, filters=[4] * h)) == (w, h, gray)
    # type 4 (gray+alpha) ignores alpha
    ga = b"".join(bytes((g, 200)) for g in gray)
    assert decode_png(encode_png(w, h, ga, color_type=4)) == (w, h, gray)
    # type 6 (RGBA) ignores alpha, reduces via the shared luma
    rgb = _gradient_rgb(w, h)
    rgba = b"".join(rgb[i * 3 : i * 3 + 3] + b"\x7f" for i in range(w * h))
    assert decode_png(encode_png(w, h, rgba, color_type=6, filters=[3] * h)) == decode_ppm(
        encode_ppm(w, h, rgb)
    )


def test_png_palette_decode():
    import struct as _struct

    # hand-built 2x2 palette PNG: indices 0..2 -> red, green, blue
    ihdr = _struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    plte = bytes((255, 0, 0, 0, 255, 0, 0, 0, 255))
    import zlib as _zlib

    idat = _zlib.compress(b"\x00\x00\x01\x00\x02\x00")  # rows: [0,1],[2,0]
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", plte)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )
    assert decode_png(payload) == (2, 2, bytes((76, 150, 29, 76)))  # luma weights


def test_png_unsupported_variants_raise():
    import struct as _struct

    def mk(depth, interlace):
        ihdr = _struct.pack(">IIBBBBB", 1, 1, depth, 0, 0, 0, interlace)
        return b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)

    with pytest.raises(NotImplementedError):
        decode_png(mk(16, 0))  # 16-bit
    with pytest.raises(NotImplementedError):
        decode_png(mk(8, 1))  # Adam7 interlaced
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\n")  # missing IHDR


def test_resize_gray_box_average():
    # 4x2 -> 2x1: each output cell is the integer mean of a 2x2 box
    gray = bytes([10, 20, 30, 40, 50, 60, 70, 80])
    assert list(resize_gray(gray, 4, 2, 2, 1)) == [(10 + 20 + 50 + 60) // 4, (30 + 40 + 70 + 80) // 4]
    # identity resize is exact
    assert resize_gray(gray, 4, 2, 4, 2) == gray
    # upscale (target > source) must not crash or zero out
    up = resize_gray(bytes([0, 255]), 2, 1, 4, 1)
    assert list(up) == [0, 0, 255, 255]


def test_ahash_invariance_and_sensitivity():
    big = encode_ppm(32, 24, _gradient_rgb(32, 24))
    # format-invariant: same pixels via BMP give the same hash
    assert ahash_pixels(big, 60, (10, 6)) == ahash_pixels(
        encode_bmp(32, 24, _gradient_rgb(32, 24)), 60, (10, 6)
    )
    # resolution-robust: the same gradient at 2x resolution hashes close
    h1 = ahash_pixels(big, 60, (10, 6))
    h2 = ahash_pixels(encode_ppm(64, 48, _gradient_rgb(64, 48)), 60, (10, 6))
    assert bin(h1 ^ h2).count("1") <= 3
    # inversion flips (nearly) every bit
    h3 = ahash_pixels(encode_ppm(32, 24, _gradient_rgb(32, 24, invert=True)), 60, (10, 6))
    assert bin(h1 ^ h3).count("1") >= 40


def _asset_rows():
    """6 real images: 0=gradient(ppm), 1=same pixels as BMP (exact dup),
    2=lightly-noised gradient (near dup), 3=inverted (far), 4=flat gray
    (far), 5=2x-resolution gradient (near)."""
    g = _gradient_rgb(32, 24)
    return [
        (0, "image", encode_ppm(32, 24, g), "image/x-portable-pixmap", 32, 24, 0),
        (1, "image", encode_bmp(32, 24, g), "image/bmp", 32, 24, 0),
        (2, "image", encode_ppm(32, 24, _gradient_rgb(32, 24, noise_at={(3, 3), (10, 7)})),
         "image/x-portable-pixmap", 32, 24, 0),
        (3, "image", encode_ppm(32, 24, _gradient_rgb(32, 24, invert=True)),
         "image/x-portable-pixmap", 32, 24, 0),
        (4, "image", encode_pgm(16, 16, bytes([128] * 256)), "image/x-portable-graymap", 16, 16, 0),
        (5, "image", encode_ppm(64, 48, _gradient_rgb(64, 48)), "image/x-portable-pixmap", 64, 48, 0),
        (6, "image", encode_png(32, 24, g, filters=[4] * 24), "image/png", 32, 24, 0),
    ]


def test_real_pixel_ahash_end_to_end(spark):
    rows = _asset_rows()
    df = spark.createDataFrame(rows, ASSET_SCHEMA)
    got = {r["asset_id"]: r["ahash"] for r in ahash_assets(df, decode_stub=False).collect()}
    # the Spark kernel must equal the local pure-Python hash, per asset
    for rid, _, payload, *_ in rows:
        assert got[rid] == ahash_pixels(payload, PHASH_BITS, (10, 6)), rid
    assert got[0] == got[1] == got[6]  # exact dup across formats (PPM/BMP/PNG)


def test_real_pixel_near_dup_matches_brute_force(spark):
    rows = _asset_rows()
    df = spark.createDataFrame(rows, ASSET_SCHEMA)
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_near_dup(df, max_hamming=3, decode_stub=False).collect()
    }
    hashes = {rid: ahash_pixels(p, PHASH_BITS, (10, 6)) for rid, _, p, *_ in rows}
    brute = {
        (a, b): bin(hashes[a] ^ hashes[b]).count("1")
        for a in hashes
        for b in hashes
        if a < b and bin(hashes[a] ^ hashes[b]).count("1") <= 3
    }
    assert pairs == brute  # banded join is pigeonhole-COMPLETE on real pixels
    assert (0, 1) in pairs and pairs[(0, 1)] == 0  # cross-format exact dup found
    assert (0, 6) in pairs and pairs[(0, 6)] == 0  # PNG joins the dup cluster


def test_real_pixel_features(spark):
    rows = _asset_rows()
    df = spark.createDataFrame(rows, ASSET_SCHEMA)
    feats = {r["asset_id"]: r for r in extract_image_features(df, dim=8, decode_stub=False).collect()}
    flat = feats[4]
    assert flat["mean_byte"] == pytest.approx(128.0)
    # flat-gray image: every pixel lands in bucket 128*8//256 = 4
    assert flat["feature"][4] == pytest.approx(1.0)
    assert sum(feats[0]["feature"]) == pytest.approx(1.0)
    assert feats[0]["n_bytes"] == len(rows[0][2])

def test_wav_roundtrip_chunk_walk_and_limits():
    from bacon_spark.llm.codecs import decode_wav, encode_wav

    samples = [((i * 37) % 2048) - 1024 for i in range(500)] + [-32768, 32767, 0]
    p = encode_wav(8000, samples)
    assert p[:4] == b"RIFF" and p[8:12] == b"WAVE"
    rate, got = decode_wav(p)
    assert rate == 8000 and got == samples
    # chunk walking: a LIST chunk between fmt and data is skipped
    import struct

    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd size, padded
    p2 = p[:fmt_end] + extra + p[fmt_end:]
    assert decode_wav(p2) == (8000, samples)
    # stereo refused loudly
    stereo = bytearray(p)
    struct.pack_into("<H", stereo, 12 + 8 + 2, 2)
    with pytest.raises(NotImplementedError, match="PCM16 mono"):
        decode_wav(bytes(stereo))
    with pytest.raises(ValueError):
        decode_wav(b"nope")


def test_audio_features_match_direct_computation(spark):
    import math

    from bacon_spark.llm.codecs import decode_wav
    from bacon_spark.llm.multimodal import (
        extract_audio_features,
        synthetic_audio_assets,
    )

    assets = synthetic_audio_assets(spark, 6)
    got = {r["asset_id"]: r for r in extract_audio_features(assets).collect()}
    for a, row in (
        (r["asset_id"], r) for r in assets.select("asset_id", "payload").collect()
    ):
        rate, s = decode_wav(bytes(row["payload"]))
        n = len(s)
        sumsq = sum(v * v for v in s)
        zc = sum(1 for i in range(1, n) if (s[i - 1] < 0) != (s[i] < 0))
        g = got[a]
        assert (g["sample_rate"], g["n_samples"]) == (rate, n)
        assert g["duration_ms"] == n * 1000 // rate
        assert g["sumsq"] == sumsq
        assert g["rms"] == round(math.sqrt(sumsq / n), 6)
        assert g["zero_crossings"] == zc
        assert g["peak"] == max(abs(v) for v in s)
