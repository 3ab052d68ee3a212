"""Incremental slice refresh, keyset pagination, capped distinct
collection, percentile accumulators — the scale-path extensions added on
top of the reference's batch/offset/unbounded forms.

Refresh soundness rests on the accumulator partial/final contract
(/root/reference/bacon/accumulators.py add/__iadd__); keyset paging
replaces the reference's OFFSET paging
(/root/reference/bacon/observers/tables.py:16-130) with a sargable seek.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from bacon_spark import (
    Average,
    Count,
    CubeDef,
    CubeQuery,
    CuttingBoard,
    Label,
    Measure,
    MonthLabel,
    Sum,
)
from bacon_spark.accumulators import CappedCollectSet, Percentile
from bacon_spark.engine import keyset_page
from bacon_spark.operators.scale import capped_distinct

SCHEMA = "date date, item string, place string, number long"

BASE = [
    (dt.date(2010, 1, 1), "apples", "italy", 100),
    (dt.date(2010, 1, 1), "pears", "italy", 101),
    (dt.date(2010, 1, 1), "apples", "england", 80),
    (dt.date(2010, 2, 1), "apples", "italy", 50),
]
DELTA = [
    (dt.date(2010, 2, 1), "pears", "france", 7),
    (dt.date(2010, 1, 1), "apples", "italy", 20),
]


@pytest.fixture()
def cubedef():
    cd = CubeDef("sells")
    cd.add_label(MonthLabel("month", "date"))
    cd.add_label(Label("item"))
    cd.add_label(Label("place"))
    cd.add_measure(Measure("number", acc=Sum()))
    cd.add_measure(Measure("n", "number", acc=Count()))
    cd.add_measure(Measure("avg_number", "number", acc=Average()))
    return cd


# --- incremental refresh ----------------------------------------------------


def test_refresh_merges_cached_slices(cubedef, spark):
    base = spark.createDataFrame(BASE, SCHEMA)
    delta = spark.createDataFrame(DELTA, SCHEMA)
    b = CuttingBoard(cubedef, base)
    q = CubeQuery().add_axis("month").add_axis("item").add_value("number").add_value("n")
    b.slice(q).rows()  # populate the cache
    assert len(b._cache) == 1

    b.refresh(delta)
    assert len(b._cache) == 1  # mergeable slice kept and updated

    jan, feb = dt.date(2010, 1, 1), dt.date(2010, 2, 1)
    s = b.slice(q)
    assert s[jan]["apples"].record == {"number": 200, "n": 3}
    assert s[feb]["pears"].record == {"number": 7, "n": 1}

    # merged result == full recompute over base+delta
    fresh = CuttingBoard(cubedef, base.unionByName(delta), cache_results=False).slice(q)
    assert sorted(map(tuple, (r.values() for r in s.rows()))) == sorted(
        map(tuple, (r.values() for r in fresh.rows()))
    )
    b.clear_cache()


def test_refresh_evicts_non_mergeable(cubedef, spark):
    base = spark.createDataFrame(BASE, SCHEMA)
    delta = spark.createDataFrame(DELTA, SCHEMA)
    b = CuttingBoard(cubedef, base)
    q = CubeQuery().add_axis("month").add_value("avg_number")
    b.slice(q).rows()
    assert len(b._cache) == 1

    b.refresh(delta)
    assert len(b._cache) == 0  # Average partials can't merge from finished values

    # recompute over the grown frame is still correct:
    # Jan: (100+101+80+20)/4 = 75.25, Feb: (50+7)/2 = 28.5
    s = b.slice(q)
    assert s[dt.date(2010, 1, 1)].record["avg_number"] == pytest.approx(75.25)
    assert s[dt.date(2010, 2, 1)].record["avg_number"] == pytest.approx(28.5)
    b.clear_cache()


def test_count_rollup_reuse(cubedef, spark):
    """Count is mergeable (sum of finished counts), so a Count-bearing
    cached slice now serves coarser queries without rescanning."""
    base = spark.createDataFrame(BASE, SCHEMA)
    b = CuttingBoard(cubedef, base)
    fine = CubeQuery().add_axis("month").add_axis("item").add_value("n")
    b.slice(fine).rows()
    coarse = CubeQuery().add_axis("month").add_value("n")
    s = b.slice(coarse)
    assert s[dt.date(2010, 1, 1)].record["n"] == 3
    assert len(b._cache) == 1  # rollup served from cache, nothing new cached
    b.clear_cache()


# --- keyset pagination ------------------------------------------------------


def test_keyset_walk_covers_all_rows_once(spark, sf_dir):
    from bacon_spark.sources.star import read_table

    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("d"), F.col("o_orderkey").alias("k")
    )
    total = o.count()
    seen = []
    after = None
    while True:
        page = keyset_page(o, ["d", "k"], after, 400).collect()
        if not page:
            break
        seen.extend((r["d"], r["k"]) for r in page)
        after = (page[-1]["d"], page[-1]["k"])
    assert len(seen) == total
    assert len(set(seen)) == total  # no row repeated across pages
    assert seen == sorted(seen)  # global key order preserved across pages


def test_keyset_matches_offset_paging(spark):
    rows = [(i // 3, i) for i in range(30)]
    df = spark.createDataFrame(rows, "g long, k long")
    ordered = df.orderBy("g", "k").collect()
    page2_offset = [tuple(r) for r in ordered[10:20]]
    last = tuple(ordered[9])
    page2_keyset = [tuple(r) for r in keyset_page(df, ["g", "k"], last, 10).collect()]
    assert page2_keyset == page2_offset


def test_keyset_arity_error(spark):
    df = spark.createDataFrame([(1, 2)], "a long, b long")
    with pytest.raises(Exception, match="arity"):
        keyset_page(df, ["a", "b"], (1,), 5).collect()


# --- capped distinct --------------------------------------------------------


def test_capped_forms_equivalent(spark, sf_dir):
    from bacon_spark.sources.star import read_table

    o = read_table(spark, sf_dir, "orders")
    via_op = {
        r["o_orderpriority"]: r["ck"]
        for r in capped_distinct(o, ["o_orderpriority"], "o_custkey", 5, out="ck").collect()
    }
    via_acc = {
        r["o_orderpriority"]: r["ck"]
        for r in o.groupBy("o_orderpriority")
        .agg(CappedCollectSet(5).agg(F.col("o_custkey")).alias("ck"))
        .collect()
    }
    assert via_op == via_acc
    assert all(len(v) <= 5 for v in via_op.values())
    assert all(v == sorted(v) for v in via_op.values())


def test_capped_distinct_bounds_rows_before_collect(spark):
    """The scale form ranks and drops BEFORE collecting: the plan contains
    a window + filter upstream of the final aggregate."""
    df = spark.createDataFrame([(1, i % 7) for i in range(50)], "g long, v long")
    plan = capped_distinct(df, ["g"], "v", 3)._jdf.queryExecution().optimizedPlan().toString()
    assert "row_number" in plan
    rows = capped_distinct(df, ["g"], "v", 3).collect()
    assert rows[0]["v_capped"] == [0, 1, 2]


# --- percentile -------------------------------------------------------------


def test_percentile_golden(spark):
    # median of 1..4 = 2.5 (interpolated); p90 of 1..4 = 3.7
    df = spark.createDataFrame([(1,), (2,), (3,), (4,)], "x long")
    row = df.agg(
        Percentile(0.5).agg(F.col("x")).alias("med"),
        Percentile(0.9).agg(F.col("x")).alias("p90"),
    ).collect()[0]
    assert row["med"] == pytest.approx(2.5)
    assert row["p90"] == pytest.approx(3.7)


def test_percentile_validates_p():
    with pytest.raises(ValueError):
        Percentile(1.5)


def test_snapshot_cache_survives_source_writes(spark, tmp_path):
    """Writing to the base path invalidates persisted plans (refreshByPath)
    — a snapshot_cache board pins cached slices against that, so refresh
    never double-counts a delta that also landed in the base dir."""
    path = str(tmp_path / "data")
    spark.createDataFrame(BASE, SCHEMA).write.mode("append").parquet(path)

    cd = CubeDef("sells")
    cd.add_label(Label("item"))
    cd.add_measure(Measure("number", acc=Sum()))
    b = CuttingBoard(cd, spark.read.schema(SCHEMA).parquet(path), snapshot_cache=True)
    q = CubeQuery().add_axis("item").add_value("number")
    assert b.slice(q)["apples"].record["number"] == 230

    # delta lands in the SAME path (what a stream sink does), then refresh
    spark.createDataFrame(DELTA, SCHEMA).write.mode("append").parquet(path)
    key, (cq, cdf) = next(iter(b._cache.items()))
    frozen = {r["item"]: r["number"] for r in cdf.collect()}
    assert frozen["apples"] == 230  # snapshot did NOT absorb the new files

    b.refresh(spark.createDataFrame(DELTA, SCHEMA), grow_base=False)
    s = b.slice(q)
    assert s["apples"].record["number"] == 250  # 230 + 20, not 250 + 20
    assert s["pears"].record["number"] == 101 + 7
    b.clear_cache()
