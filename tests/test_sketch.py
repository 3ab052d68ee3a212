"""HLL / KMV sketch operators (operators/sketch.py): accuracy against
exact distinct counts, the register-merge (re-aggregation) property, the
small-range linear-counting branch, and bounded-memory KMV semantics."""

import pytest
from pyspark.sql import functions as F

from bacon_spark.operators import sketch as sk


def _est(df):
    return df.collect()[0]["hll_estimate"]


def test_hll_accuracy_large(spark):
    # 50k distinct values: the raw-estimate branch; m=4096 registers give
    # ~1.04/sqrt(m) ~ 1.6% standard error — assert a generous 5%
    df = spark.range(50_000).select(F.col("id").alias("v"))
    reg = sk.hll_registers(df, "v")
    est = _est(sk.hll_estimate(reg))
    assert abs(est - 50_000) / 50_000 < 0.05


def test_hll_linear_counting_small(spark):
    # 100 distinct values << 2.5*m: the ln small-range correction branch
    # is near-exact there
    df = spark.range(100).select(F.col("id").alias("v"))
    est = _est(sk.hll_estimate(sk.hll_registers(df, "v")))
    assert abs(est - 100) / 100 < 0.05


def test_hll_duplicates_do_not_inflate(spark):
    # registers are max-based: 100x duplication must not move the estimate
    base = spark.range(5_000).select(F.col("id").alias("v"))
    dup = spark.range(500_000).select((F.col("id") % 5_000).alias("v"))
    assert _est(sk.hll_estimate(sk.hll_registers(base, "v"))) == _est(
        sk.hll_estimate(sk.hll_registers(dup, "v"))
    )


def test_hll_merge_equals_global(spark):
    # the re-aggregation property: merging per-group register frames must
    # give EXACTLY the estimate of a single global sketch
    df = spark.range(20_000).select(
        (F.col("id") % 4).cast("string").alias("g"), F.col("id").alias("v")
    )
    merged = _est(sk.hll_merge(sk.hll_registers(df, "v", ["g"])))
    direct = _est(sk.hll_estimate(sk.hll_registers(df, "v")))
    assert merged == direct


def test_kmv_exact_below_k(spark):
    # fewer distinct values than k: the synopsis IS the distinct set and
    # the estimator returns the exact count
    df = spark.range(1_000).select((F.col("id") % 37).alias("v"))
    syn = sk.kmv_synopsis(df, "v", k=256)
    assert syn.count() == 37
    assert sk.kmv_estimate(syn, k=256).collect()[0]["kmv_estimate"] == 37.0


def test_kmv_accuracy_large(spark):
    # 100k distinct, k=256: std error ~ 1/sqrt(k-2) ~ 6.3%; assert 20%
    df = spark.range(100_000).select(F.col("id").alias("v"))
    syn = sk.kmv_synopsis(df, "v", k=256)
    est = sk.kmv_estimate(syn, k=256).collect()[0]["kmv_estimate"]
    assert abs(est - 100_000) / 100_000 < 0.20


def test_kmv_partitioning_invariant(spark):
    # per-partition k-minima then global top-k must equal the single-
    # partition answer — the bounded-memory path can't change the set
    df = spark.range(30_000).select(F.col("id").alias("v"))
    one = {r["h"] for r in sk.kmv_synopsis(df.coalesce(1), "v", k=64).collect()}
    many = {r["h"] for r in sk.kmv_synopsis(df.repartition(17), "v", k=64).collect()}
    assert one == many and len(one) == 64


@pytest.mark.parametrize("p", [8, 12])
def test_hll_register_bounds(spark, p):
    # at most 2^p register rows regardless of input size, rho within
    # [1, 60-p+1]
    df = spark.range(200_000).select(F.col("id").alias("v"))
    reg = sk.hll_registers(df, "v", p=p).collect()
    assert len(reg) <= (1 << p)
    assert all(1 <= r["reg"] <= 60 - p + 1 for r in reg)
