"""Compaction / clustering maintenance (operators/maintenance.py)."""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from bacon_spark.operators.maintenance import compact, table_files, zorder_key


@pytest.fixture()
def small_files_dir(spark, tmp_path):
    path = str(tmp_path / "events_frag")
    (
        spark.range(0, 20_000)
        .select(
            F.col("id").alias("event_id"),
            (F.col("id") % 97).alias("user_id"),
            (F.col("id") * 7 % 1000).cast("double").alias("value"),
        )
        .repartition(64)
        .write.parquet(path)
    )
    return path


def _content_fingerprint(spark, path):
    df = spark.read.parquet(path)
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.hash("event_id", "user_id", "value").cast("long")).alias("h"),
    ).collect()[0]
    return row["n"], row["h"]


def test_compact_binpacks_without_losing_rows(spark, small_files_dir):
    before = _content_fingerprint(spark, small_files_dir)
    assert len(table_files(small_files_dir)) == 64
    total = sum(b for _, b in table_files(small_files_dir))
    stats = compact(spark, small_files_dir, target_file_bytes=total // 4)
    assert stats["files_before"] == 64
    assert stats["files_after"] == 4
    assert _content_fingerprint(spark, small_files_dir) == before


def test_compact_clustered_gives_disjoint_file_ranges(spark, small_files_dir):
    before = _content_fingerprint(spark, small_files_dir)
    total = sum(b for _, b in table_files(small_files_dir))
    compact(
        spark, small_files_dir, target_file_bytes=total // 8, cluster_by=["event_id"]
    )
    assert _content_fingerprint(spark, small_files_dir) == before
    ranges = []
    for f, _ in table_files(small_files_dir):
        t = pq.read_table(f, columns=["event_id"])
        ids = t.column("event_id").to_pylist()
        if ids:
            ranges.append((min(ids), max(ids)))
    ranges.sort()
    assert len(ranges) >= 4
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi < lo  # footer min/max prune a point lookup to ONE file


def _morton_ref(vals, bits):
    # independent reference: round-robin interleave, MSB level first
    out = []
    for b in range(bits - 1, -1, -1):
        for v in vals:
            out.append((v >> b) & 1)
    key = 0
    for bit in out:
        key = (key << 1) | bit
    return key


def test_zorder_key_matches_reference(spark):
    bits = 6
    hi = (1 << bits) - 1
    df = spark.createDataFrame(
        [(x, y) for x in (0, 1, 17, 40, hi) for y in (0, 5, 33, hi)], "x: long, y: long"
    )
    got = df.select(
        "x", "y", zorder_key([("x", 0, hi), ("y", 0, hi)], bits=bits).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _morton_ref([r["x"], r["y"]], bits), (r["x"], r["y"])


def test_zorder_compact_roundtrip(spark, small_files_dir):
    before = _content_fingerprint(spark, small_files_dir)
    total = sum(b for _, b in table_files(small_files_dir))
    z = zorder_key([("user_id", 0, 96), ("event_id", 0, 19_999)], bits=10)
    stats = compact(spark, small_files_dir, target_file_bytes=total // 8, cluster_by=z)
    assert stats["files_after"] >= 4
    assert _content_fingerprint(spark, small_files_dir) == before
    # clustering on the z-key bounds BOTH dimensions per file: no single
    # file spans the full user_id range once 8+ files are range-split on
    # the interleaved key
    spans = []
    for f, _ in table_files(small_files_dir):
        t = pq.read_table(f, columns=["user_id"])
        u = t.column("user_id").to_pylist()
        spans.append(max(u) - min(u))
    assert min(spans) < 96  # at least some files see a narrowed user range
