"""Environment-drift guards.

Round-1 regression class: the events fixture stores NANOSECOND parquet
timestamps, and the type Spark surfaces for them changed across versions
(bigint under the legacy conf on 3.x, TIMESTAMP_NTZ natively on 4.x).
Every downstream consumer — withWatermark, unix_micros, window ranges —
requires a session-local TIMESTAMP (LTZ). These tests pin the contract at
the read boundary so a Spark upgrade fails here, at commit time, instead
of in six temporal/streaming gate queries in the driver environment.
"""

import datetime as dt

from pyspark.sql import functions as F

from bacon_spark.sources.star import TABLES, load_tables, read_table


def test_events_ts_is_ltz_timestamp(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp", (
        "events.ts must surface as TIMESTAMP (LTZ); got something else — "
        "the parquet-nanos normalization in sources/star.read_table no "
        "longer fires under this Spark version"
    )
    # and the values are sane (fixture epoch is 2024, sub-second precision)
    row = ev.select(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    assert row["lo"] >= dt.datetime(2023, 1, 1)
    assert row["hi"] < dt.datetime(2026, 1, 1)


def test_events_ts_supports_watermark_and_unix_micros(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    # withWatermark on a batch frame validates the event-time type eagerly
    ev.withWatermark("ts", "1 hour")
    # unix_micros is the temporal-join workhorse; NTZ would throw here
    assert ev.select(F.unix_micros("ts").alias("us")).first()["us"] > 0


def test_events_roundtrip_preserves_ltz(spark, sf_dir, tmp_path):
    """The streaming paths re-write the converted frame and re-read it via
    readStream.schema(...); a plain batch write/read round-trip must keep
    the LTZ type so those schemas stay valid."""
    ev = read_table(spark, sf_dir, "events").limit(100)
    out = str(tmp_path / "ev_roundtrip")
    ev.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    assert dict(back.dtypes)["ts"] == "timestamp"


def test_all_fixture_tables_load(spark, sf_dir):
    dfs = load_tables(spark, sf_dir, TABLES)
    for name, df in dfs.items():
        assert len(df.columns) > 0, name
