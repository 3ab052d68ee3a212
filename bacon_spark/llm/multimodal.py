"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas iterators.

Engine extension (north star). The decode/resize/feature kernels the real
pipeline would use (PIL/ffmpeg/torchvision) are NOT in this container, so
the kernels are stubbed two ways:

* ``decode_stub=True`` (default): a deterministic fake decoder that derives
  "features" from the binary payload's bytes — real enough to test schema,
  batching, partitioning and ordering end-to-end;
* ``decode_stub=False``: decodes REAL pixels for the formats the vendored
  stdlib-only codecs support (binary PPM/PGM, uncompressed 24-bit BMP,
  non-interlaced 8-bit PNG — see :mod:`.codecs`); raises
  NotImplementedError only for codec-bound formats (JPEG/video), clearly
  marking where PIL/ffmpeg goes.

The SPARK side is fully real: ``mapInPandas`` with an explicit output
schema streams Arrow record batches through the Python worker — the correct
shape for binary-heavy data because (a) payload bytes move Arrow-zero-copy,
(b) batch size is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
so executor memory stays flat at 100 TB, and (c) the operation is map-side
only — no shuffle, scales linearly with executors.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: schema of a multimodal asset table: payload + typed metadata
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("mean_byte", DoubleType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def synthetic_assets(spark, n: int = 64) -> DataFrame:
    """Deterministic fake asset table for tests (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        payload = bytes((i * 31 + j * 7) % 256 for j in range(128 + (i % 5) * 16))
        kind = ("image", "audio", "video")[i % 3]
        rows.append((i, kind, payload, f"application/x-{kind}", 64 + i % 8, 48 + i % 8, 1000 + i))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def synthetic_image_assets(spark, n_pairs: int = 24) -> DataFrame:
    """REAL-image asset table with planted cross-format near-duplicate
    twins: pair k is one deterministic 64x48 pattern encoded twice, in
    two DIFFERENT formats cycling png/bmp/ppm/JPEG (q=92) — the
    image-dedup reality of a scraped corpus, where the same picture
    circulates as a lossless PNG and a lossy JPEG. Distinct patterns are
    frequency-separated, so planted twins sit at aHash hamming <= 1 and
    every cross-pattern pair is >= 9 (measured at n_pairs=24): the
    planted set IS the provable near-dup answer for max_hamming <= 3.

    Exercises the full real-decode path including the baseline JFIF
    decoder (llm/jpeg.py) inside Arrow mapInPandas workers."""
    from .codecs import encode_bmp, encode_png, encode_ppm
    from .jpeg import encode_jpeg_ycbcr

    w, h = 64, 48

    def base_rgb(k: int) -> bytes:
        out = bytearray()
        for y in range(h):
            for x in range(w):
                out += bytes(
                    (
                        (x * (3 + k) + y * (2 * k + 1)) % 256,
                        (x * x // (k + 2) + y * 5 + k * 37) % 256,
                        ((x + y) * (k + 7) + (x * y) // 8) % 256,
                    )
                )
        return bytes(out)

    encoders = [
        lambda rgb: encode_png(w, h, rgb),
        lambda rgb: encode_bmp(w, h, rgb),
        lambda rgb: encode_ppm(w, h, rgb),
        lambda rgb: encode_jpeg_ycbcr(w, h, rgb, quality=92),
    ]
    rows = []
    for k in range(n_pairs):
        rgb = base_rgb(k)
        for twin, fi in ((0, k % 4), (1, (k + 1) % 4)):
            payload = encoders[fi](rgb)
            rows.append(
                (2 * k + twin, "image", payload, "image/mixed", w, h, 0)
            )
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def _fake_decode(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real decoder: dim-bucket byte histogram
    normalized to [0,1]. Replace with PIL/ffmpeg in production."""
    if not payload:
        return [0.0] * dim
    hist = [0] * dim
    for b in payload:
        hist[b % dim] += 1
    total = len(payload)
    return [h / total for h in hist]


def extract_image_features(
    df: DataFrame, dim: int = 8, decode_stub: bool = True, batch_hint: int | None = None
) -> DataFrame:
    """Decode + feature-extract over binary payloads via mapInPandas.

    decode_stub=False decodes real pixels (PPM/PGM/BMP/PNG via :mod:`.codecs`;
    feature = dim-bucket GRAY-LEVEL histogram, mean_byte = mean gray);
    NotImplementedError remains only for codec-bound formats.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codecs import decode_image

        def real_features(p: bytes) -> tuple[float, list[float]]:
            _, _, gray = decode_image(bytes(p))
            hist = [0] * dim
            for g in gray:
                hist[g * dim // 256] += 1
            n = len(gray) or 1
            return sum(gray) / float(n), [c / n for c in hist]

        for pdf in batches:
            payloads = pdf["payload"]
            if decode_stub:
                mean = payloads.map(lambda p: float(sum(p)) / len(p) if len(p) else 0.0)
                feat = payloads.map(lambda p: _fake_decode(p, dim))
            else:
                decoded = payloads.map(real_features)
                mean = decoded.map(lambda t: t[0])
                feat = decoded.map(lambda t: t[1])
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "mean_byte": mean,
                    "feature": feat,
                }
            )

    return df.select("asset_id", "payload").mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled timestamp
    (the decode of each frame is the stubbed kernel). Pure built-in
    ``sequence``+``explode`` — the expensive fan-out happens JVM-side and
    partitions stay balanced because explode distributes with its parent."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "asset_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


# ---------------------------------------------------------------------------
# Perceptual-hash near-duplicate detection (the multimodal dedup pass)
# ---------------------------------------------------------------------------

PHASH_BITS = 60  # fits a non-negative BIGINT in both engines
PHASH_BANDS = 4  # 4 x 15-bit bands

AHASH_SCHEMA = StructType(
    [StructField("asset_id", LongType()), StructField("ahash", LongType())]
)


def ahash_assets(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Average-hash signatures over binary payloads via mapInPandas — the
    perceptual-dedup analogue of extract_image_features.

    decode_stub=True: bit j is set iff byte j of the payload exceeds the
    mean of the first PHASH_BITS bytes (schema/plumbing-exercising fake).
    decode_stub=False (r5): REAL aHash — decode pixels (PPM/PGM/BMP via
    the vendored :mod:`.codecs`), integer box-resize to a 10x6 gray grid
    (= PHASH_BITS cells), bit j set iff cell j exceeds the grid mean.
    All-integer decode/resize, so hashes are bit-stable cross-platform."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codecs import ahash_pixels

        def h_stub(p: bytes) -> int:
            head = p[:PHASH_BITS]
            if not head:
                return 0
            mean = sum(head) / float(PHASH_BITS)
            return sum(1 << j for j, b in enumerate(head) if b > mean)

        def h_real(p: bytes) -> int:
            return ahash_pixels(bytes(p), PHASH_BITS, (10, 6))

        h = h_stub if decode_stub else h_real
        for pdf in batches:
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"], "ahash": pdf["payload"].map(h).astype("int64")}
            )

    return df.select("asset_id", "payload").mapInPandas(run, AHASH_SCHEMA)


def phash_near_dup(df: DataFrame, max_hamming: int = 3, decode_stub: bool = True) -> DataFrame:
    """Perceptual near-duplicate pairs over a multimodal asset table:
    (id_a, id_b, hamming) with Hamming(aHash_a, aHash_b) <= max_hamming.

    Scale shape: signatures band into PHASH_BANDS 15-bit keys; candidate
    pairs come from band-bucket EQUI-joins (never all-pairs) and the
    exact Hamming check is one codegen bit_count(xor).  Completeness is
    pigeonhole-exact, not probabilistic: max_hamming < PHASH_BANDS
    guarantees every qualifying pair shares at least one unchanged band,
    so the banded join finds EXACTLY the brute-force answer (the oracle
    computes it brute-force)."""
    assert max_hamming < PHASH_BANDS, "pigeonhole completeness needs max_hamming < bands"
    sig = ahash_assets(df, decode_stub=decode_stub)
    width = PHASH_BITS // PHASH_BANDS
    keyed = sig.select(
        "asset_id",
        "ahash",
        F.explode(
            F.array(*[
                F.concat(
                    F.lit(f"{b}:"),
                    F.shiftright(F.col("ahash"), b * width).bitwiseAND(
                        F.lit((1 << width) - 1)
                    ).cast("string"),
                )
                for b in range(PHASH_BANDS)
            ])
        ).alias("band_key"),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    pairs = (
        a.join(b, (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.asset_id") < F.col("b.asset_id")))
        .select(
            F.col("a.asset_id").alias("id_a"),
            F.col("b.asset_id").alias("id_b"),
            F.bit_count(
                F.col("a.ahash").bitwiseXOR(F.col("b.ahash"))
            ).cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", LongType()),
        StructField("sumsq", LongType()),
        StructField("rms", DoubleType()),
        StructField("zero_crossings", LongType()),
        StructField("peak", LongType()),
    ]
)


def synthetic_audio_assets(spark, n: int = 48) -> DataFrame:
    """REAL RIFF/PCM16 audio asset table: asset a holds
    800 + (a % 5) * 160 samples of the integer waveform
    ``((i*37 + a*11) % 2048) - 1024`` at 8 kHz — pure integer
    construction, so an oracle can re-derive every feature from the
    formula without parsing bytes, proving the engine's decode exact."""
    from .codecs import encode_wav

    rows = []
    for a in range(n):
        ns = 800 + (a % 5) * 160
        samples = [((i * 37 + a * 11) % 2048) - 1024 for i in range(ns)]
        payload = encode_wav(8000, samples)
        rows.append((a, "audio", payload, "audio/wav", 0, 0, ns * 1000 // 8000))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def extract_audio_features(df: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Decode + feature-extract PCM16 audio via mapInPandas (Arrow
    batches, the audio twin of extract_image_features): per asset the
    sample rate, count, integer duration, EXACT integer energy (sum of
    squares — folded in int, so no float accumulation order exists),
    rms = sqrt(sumsq/n) (one IEEE double op on exact ints:
    cross-engine bit-identical), strict sign-crossing count (a zero
    sample breaks a run; the s<0 vs s>=0 convention is mirrored in the
    oracle), and peak |amplitude|."""
    import math

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codecs import decode_wav

        def feats(p: bytes):
            rate, s = decode_wav(bytes(p))
            n = len(s)
            sumsq = 0
            zc = 0
            for i, v in enumerate(s):
                sumsq += v * v
                if i and (s[i - 1] < 0) != (v < 0):
                    zc += 1
            rms = round(math.sqrt(sumsq / n), 6) if n else 0.0
            peak = max((abs(v) for v in s), default=0)
            return rate, n, n * 1000 // rate, sumsq, rms, zc, peak

        for pdf in batches:
            cols = list(zip(*pdf["payload"].map(feats)))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "sample_rate": cols[0],
                    "n_samples": cols[1],
                    "duration_ms": cols[2],
                    "sumsq": cols[3],
                    "rms": cols[4],
                    "zero_crossings": cols[5],
                    "peak": cols[6],
                }
            )

    return df.select("asset_id", "payload").mapInPandas(run, AUDIO_FEATURES_SCHEMA)
