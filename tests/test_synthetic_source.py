"""Custom Python DataSource (Spark 4 API): deterministic synthetic
events — registration, partitioned planning, reproducibility, and
composition with downstream operators."""

import pytest

from bacon_spark.sources import synthetic


@pytest.fixture(scope="module")
def registered(spark):
    if not synthetic.register(spark):
        pytest.skip("pyspark DataSource API not available")
    return spark


def _read(spark, **opts):
    r = spark.read.format("synthetic_events")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_rowcount_and_schema(registered):
    df = _read(registered, numRows=500, seed=7)
    assert df.count() == 500
    assert [f.name for f in df.schema.fields] == [
        "event_id", "ts", "user_id", "event_type", "value",
    ]


def test_deterministic_across_reads(registered):
    a = sorted(map(tuple, _read(registered, numRows=200, seed=7).collect()))
    b = sorted(map(tuple, _read(registered, numRows=200, seed=7).collect()))
    assert a == b
    c = sorted(map(tuple, _read(registered, numRows=200, seed=8).collect()))
    assert a != c


def test_partitioned_generation(registered):
    df = _read(registered, numRows=1000, numPartitions=8)
    assert df.rdd.getNumPartitions() == 8
    # partitioning must not change content
    one = sorted(r["event_id"] for r in _read(registered, numRows=100, numPartitions=1).collect())
    many = sorted(r["event_id"] for r in _read(registered, numRows=100, numPartitions=7).collect())
    assert one == many == list(range(100))


def test_composes_with_operators(registered):
    from pyspark.sql import functions as F

    df = _read(registered, numRows=1000)
    agg = df.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    assert sum(r["n"] for r in agg) == 1000
    assert set(r["event_type"] for r in agg) <= set(synthetic.EVENT_TYPES)
    # matches the pure-python generator exactly
    rows = {r["event_id"]: r for r in df.collect()}
    for i in (0, 17, 999):
        g = synthetic.gen_row(42, i)
        got = rows[i]
        assert (got["event_id"], got["user_id"], got["event_type"]) == (g[0], g[2], g[3])
        assert abs(got["value"] - g[4]) < 1e-9
