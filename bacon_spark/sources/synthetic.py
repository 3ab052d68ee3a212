"""Custom Python data source (Spark 4 DataSource API): deterministic
synthetic event generator.

§2.1 breadth on the modern API surface: where the reference's sources are
adapter classes feeding one in-memory dataset (/root/reference/bacon/
sql.py:197-337), Spark 4 lets a Python class BE a first-class source —
``spark.read.format("synthetic_events")`` plans partitions, runs the
generator distributedly, and composes with every downstream operator.

The generator is seeded-deterministic per (seed, partition): the same
options always produce the same rows, which makes it usable as a test
fixture factory and as a load generator whose output can be oracle'd.
Partitioned: ``numPartitions`` splits the id range so generation scales
exactly like a parquet scan (one task per split, no driver involvement).
"""

from __future__ import annotations

import hashlib

try:  # pyspark >= 4.0
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    _HAS_DATASOURCE_API = True
except ImportError:  # pragma: no cover - older pyspark
    DataSource = DataSourceReader = InputPartition = object
    _HAS_DATASOURCE_API = False

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)

EVENT_TYPES = ("view", "click", "purchase", "error")
EPOCH_US = 1_704_067_200_000_000  # 2024-01-01 UTC


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def gen_row(seed: int, i: int):
    """One deterministic synthetic event — pure function of (seed, i),
    reproducible in any engine (md5-based, same construction as
    llm/dedup.hash60)."""
    import datetime as dt

    h = _h60(f"{seed}:{i}")
    ts = dt.datetime.fromtimestamp(
        (EPOCH_US + (h % 2_592_000_000_000)) / 1e6, dt.timezone.utc
    ).replace(tzinfo=None)
    return (
        i,
        ts,
        h % 997,
        EVENT_TYPES[h % len(EVENT_TYPES)],
        round((h % 1_000_000) / 100.0, 2),
    )


class _SyntheticPartition(InputPartition):
    def __init__(self, seed: int, start: int, end: int):
        self.seed, self.start, self.end = seed, start, end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.seed = int(options.get("seed", 42))
        self.n = int(options.get("numRows", 1000))
        self.parts = int(options.get("numPartitions", 4))

    def partitions(self):
        step = max(1, self.n // self.parts)
        bounds = list(range(0, self.n, step)) + [self.n]
        return [
            _SyntheticPartition(self.seed, lo, hi)
            for lo, hi in zip(bounds, bounds[1:])
        ]

    def read(self, partition):
        for i in range(partition.start, partition.end):
            yield gen_row(partition.seed, i)


class SyntheticEventsSource(DataSource):
    """``spark.read.format("synthetic_events").option("numRows", 10_000)``
    after ``spark.dataSource.register(SyntheticEventsSource)``."""

    @classmethod
    def name(cls):
        return "synthetic_events"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return SyntheticEventsReader(self.options)


def register(spark) -> bool:
    """Register the source if this Spark exposes the Python DataSource
    API; returns False (caller may skip) otherwise."""
    if not _HAS_DATASOURCE_API or not hasattr(spark, "dataSource"):
        return False
    spark.dataSource.register(SyntheticEventsSource)
    return True
