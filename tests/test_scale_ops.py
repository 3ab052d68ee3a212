"""Plan-shape and semantics tests for the scale operators: cube lattice,
bucketed joins (no Exchange), salted aggregation."""

import pytest
from pyspark.sql import functions as F

from bacon_spark import Average, Count, CubeDef, CubeQuery, CuttingBoard, Label, Measure, Sum
from bacon_spark.operators.lattice import CubeLattice, grouping_sets_df
from bacon_spark.operators.scale import salted_agg, write_bucketed


@pytest.fixture(scope="module")
def sales(spark):
    rows = []
    for i in range(100):
        rows.append((f"s{i % 3}", f"c{i % 5}", i % 7, float(i)))
    return spark.createDataFrame(rows, "state string, city string, units long, price double")


@pytest.fixture(scope="module")
def cubedef():
    cd = CubeDef("t")
    cd.add_label(Label("state"))
    cd.add_label(Label("city"))
    cd.add_measure(Measure("units", acc=Sum()))
    cd.add_measure(Measure("n", "units", acc=Count()))
    cd.add_measure(Measure("avg_price", "price", acc=Average()))
    return cd


def test_lattice_serves_all_grains(sales, cubedef):
    lat = CubeLattice(cubedef, sales, axes=("state", "city"), values=("units", "n", "avg_price"))
    board = CuttingBoard(cubedef, sales, cache_results=False)

    for wanted in [("state", "city"), ("state",), ("city",), ()]:
        got = {
            tuple(r[a] for a in wanted): (r["units"], r["n"], r["avg_price"])
            for r in lat.slice_df(wanted).collect()
        }
        q = CubeQuery().add_value("units").add_value("n").add_value("avg_price")
        for a in wanted:
            q = q.add_axis(a)
        want = {
            tuple(r[a] for a in wanted): (r["units"], r["n"], r["avg_price"])
            for r in board.slice(q).to_df().collect()
        }
        assert got == want, wanted
    # non-additive accumulator (Average) is exact at EVERY grain because the
    # lattice stores finished values per grouping set, not re-aggregations
    lat.unpersist()


def test_grouping_sets(sales, cubedef):
    out = grouping_sets_df(
        cubedef, sales, sets=[("state", "city"), ("state",), ()], values=("units",)
    )
    rows = out.collect()
    gids = {r["_gid"] for r in rows}
    assert len(gids) == 3
    total = [r for r in rows if r["state"] is None and r["city"] is None]
    assert len(total) == 1


def test_bucketed_join_has_no_shuffle(spark):
    left = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("a"))
    right = spark.range(0, 1000).select(F.col("id").alias("k2"), (F.col("id") * 3).alias("b"))
    write_bucketed(left, "t_bucket_l", "k", buckets=4)
    write_bucketed(right, "t_bucket_r", "k2", buckets=4)
    # disable broadcast so the join strategy decision is about shuffles
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("t_bucket_l").join(
            spark.table("t_bucket_r"), F.col("k") == F.col("k2")
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: bucketing removed the shuffle
        assert j.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS t_bucket_l")
        spark.sql("DROP TABLE IF EXISTS t_bucket_r")


def test_salted_agg_matches_plain(spark):
    # skewed: 90% of rows share one key
    rows = [("hot" if i % 10 else f"k{i}", float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows, "k string, v double")
    out = salted_agg(
        df,
        "k",
        aggs={"s": F.sum("v"), "c": F.count(F.lit(1))},
        merges={"s": F.sum("s"), "c": F.sum("c")},
    )
    got = {r["k"]: (r["s"], r["c"]) for r in out.collect()}
    want = {
        r["k"]: (r["s"], r["c"])
        for r in df.groupBy("k").agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c")).collect()
    }
    assert got == want


def test_lattice_registered_in_planner(sales, cubedef):
    from bacon_spark import CubeQuery, CuttingBoard
    from bacon_spark.operators.lattice import CubeLattice

    board = CuttingBoard(cubedef, sales)
    lat = CubeLattice(cubedef, sales, axes=("state", "city"), values=("units", "n"))
    board.register_lattice(lat)
    try:
        q = CubeQuery().add_axis("state").add_value("units")
        df = board.slice(q).to_df()
        # answered from the lattice: no scan of the in-memory base relation
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "_gid" in plan  # grouping_id filter present -> lattice path
        got = {r["state"]: r["units"] for r in df.collect()}
        want = {
            r["state"]: r["units"]
            for r in sales.groupBy("state").agg(F.sum("units").alias("units")).collect()
        }
        assert got == want
        # eq-filter on a lattice axis drills INTO the lattice: read grain
        # (state, city), pin city, project — exact for any accumulator
        q2 = q.add_filter("city", "eq", "c1")
        df2 = board.slice(q2).to_df()
        assert "_gid" in df2._jdf.queryExecution().optimizedPlan().toString()
        got2 = {r["state"]: r["units"] for r in df2.collect()}
        want2 = {
            r["state"]: r["units"]
            for r in sales.filter(F.col("city") == "c1")
            .groupBy("state")
            .agg(F.sum("units").alias("units"))
            .collect()
        }
        assert got2 == want2
        # `in` filter on a dropped axis: several pinned rows per output
        # group -> merge of finished values, allowed because Sum is
        # reaggregatable
        q3 = (
            CubeQuery()
            .add_axis("state")
            .add_value("units")
            .add_filter("city", "in", ("c1", "c2"))
        )
        df3 = board.slice(q3).to_df()
        assert "_gid" in df3._jdf.queryExecution().optimizedPlan().toString()
        got3 = {r["state"]: r["units"] for r in df3.collect()}
        want3 = {
            r["state"]: r["units"]
            for r in sales.filter(F.col("city").isin("c1", "c2"))
            .groupBy("state")
            .agg(F.sum("units").alias("units"))
            .collect()
        }
        assert got3 == want3
        # same `in` drill with a non-reaggregatable value (Average) must
        # bypass the lattice — merging finished averages would be wrong
        board2 = CuttingBoard(cubedef, sales)
        lat2 = CubeLattice(
            cubedef, sales, axes=("state", "city"), values=("units", "avg_price")
        )
        board2.register_lattice(lat2)
        q4 = (
            CubeQuery()
            .add_axis("state")
            .add_value("avg_price")
            .add_filter("city", "in", ("c1", "c2"))
        )
        df4 = board2.slice(q4).to_df()
        assert "_gid" not in df4._jdf.queryExecution().optimizedPlan().toString()
        # ...and a RANGE drill on a dropped axis is gated the same way
        q4r = (
            CubeQuery()
            .add_axis("state")
            .add_value("avg_price")
            .add_filter("city", "ge", "c2")
        )
        assert "_gid" not in (
            board2.slice(q4r).to_df()._jdf.queryExecution().optimizedPlan().toString()
        )
        lat2.unpersist()
        board2.clear_cache()
        # range/ne filters on a dropped lattice axis drill in too (merge of
        # finished values, reaggregatable-gated): scan bounds over the
        # materialized grain instead of a base re-scan
        for op, val, pred in (
            ("ne", "c1", F.col("city") != "c1"),
            ("ge", "c2", F.col("city") >= "c2"),
            ("lt", "c2", F.col("city") < "c2"),
        ):
            q5 = (
                CubeQuery()
                .add_axis("state")
                .add_value("units")
                .add_filter("city", op, val)
            )
            df5 = board.slice(q5).to_df()
            assert "_gid" in df5._jdf.queryExecution().optimizedPlan().toString(), op
            got5 = {r["state"]: r["units"] for r in df5.collect()}
            want5 = {
                r["state"]: r["units"]
                for r in sales.filter(pred)
                .groupBy("state")
                .agg(F.sum("units").alias("units"))
                .collect()
            }
            assert got5 == want5, op
        # a range filter on a KEPT axis projects one-to-one — no reagg, so
        # it serves even non-reaggregatable values
        q6 = (
            CubeQuery()
            .add_axis("state")
            .add_axis("city")
            .add_value("units")
            .add_filter("city", "ge", "c2")
        )
        df6 = board.slice(q6).to_df()
        assert "_gid" in df6._jdf.queryExecution().optimizedPlan().toString()
        got6 = {(r["state"], r["city"]): r["units"] for r in df6.collect()}
        want6 = {
            (r["state"], r["city"]): r["units"]
            for r in sales.filter(F.col("city") >= "c2")
            .groupBy("state", "city")
            .agg(F.sum("units").alias("units"))
            .collect()
        }
        assert got6 == want6
    finally:
        lat.unpersist()
        board.clear_cache()


def test_approx_count_distinct_tolerance(spark):
    from bacon_spark import CubeDef, CubeQuery, CuttingBoard, Label, Measure
    from bacon_spark.accumulators import ApproxCountDistinct

    df = spark.range(0, 20000).selectExpr("cast(id % 7 as string) k", "id v")
    cd = CubeDef("t")
    cd.add_label(Label("k"))
    cd.add_measure(Measure("nd", "v", acc=ApproxCountDistinct()))
    q = CubeQuery().add_axis("k").add_value("nd")
    rows = CuttingBoard(cd, df, cache_results=False).slice(q).rows()
    for r in rows:
        exact = 20000 / 7
        assert abs(r["nd"] - exact) / exact < 0.15


def test_q61_join_is_exchange_free_up_to_aggregation(spark, sf_dir):
    """The gate query's fact-to-fact join must read both bucketed tables
    without an Exchange or Sort below the SortMergeJoin — only the final
    small groupBy may shuffle."""
    from bacon_spark.queries import bucketed_star_tables

    li, od = bucketed_star_tables(spark, sf_dir)
    # at sf0.001 orders fits under the broadcast threshold and Catalyst
    # rightly broadcasts; disable it to see the shape the plan takes once
    # orders outgrows broadcast — the scenario bucketing exists for
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        l, o = spark.table(li), spark.table(od)
        j = l.join(o, l["l_orderkey"] == o["o_orderkey"]).filter(
            F.col("o_orderstatus") == "F"
        )
        j.count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert "BroadcastHashJoin" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql(f"DROP TABLE IF EXISTS {li}")
        spark.sql(f"DROP TABLE IF EXISTS {od}")


def test_lattice_refresh_matches_full_rebuild(spark, sales, cubedef):
    first = sales.filter(F.col("units") < 4)
    delta = sales.filter(F.col("units") >= 4)
    lat = CubeLattice(cubedef, first, axes=("state", "city"), values=("units", "n"))
    try:
        lat.refresh(delta)
        full = CubeLattice(cubedef, sales, axes=("state", "city"), values=("units", "n"))
        for wanted in [("state", "city"), ("state",), ("city",), ()]:
            got = {
                tuple(r[a] for a in wanted): (r["units"], r["n"])
                for r in lat.slice_df(wanted).collect()
            }
            want = {
                tuple(r[a] for a in wanted): (r["units"], r["n"])
                for r in full.slice_df(wanted).collect()
            }
            assert got == want, wanted
        full.unpersist()
    finally:
        lat.unpersist()


def test_lattice_refresh_rejects_non_reaggregatable(sales, cubedef):
    from bacon_spark.errors import QueryError

    lat = CubeLattice(cubedef, sales, axes=("state",), values=("avg_price",))
    try:
        with pytest.raises(QueryError):
            lat.refresh(sales.limit(1))
    finally:
        lat.unpersist()


def test_board_refresh_keeps_registered_lattice_fresh(spark, sales, cubedef):
    """Regression: the planner consults lattices FIRST, so a board refresh
    must fold the delta into them (stale-lattice bug)."""
    first = sales.filter(F.col("units") < 4)
    delta = sales.filter(F.col("units") >= 4)
    board = CuttingBoard(cubedef, first)
    lat = CubeLattice(cubedef, first, axes=("state", "city"), values=("units", "n"))
    board.register_lattice(lat)
    try:
        board.refresh(delta)
        q = CubeQuery().add_axis("state").add_value("units").add_value("n")
        df = board.slice(q).to_df()
        assert "_gid" in df._jdf.queryExecution().optimizedPlan().toString()
        got = {r["state"]: (r["units"], r["n"]) for r in df.collect()}
        want = {
            r["state"]: (r["units"], r["n"])
            for r in sales.groupBy("state")
            .agg(F.sum("units").alias("units"), F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got == want
    finally:
        lat.unpersist()
        board.clear_cache()


def test_board_refresh_unregisters_non_mergeable_lattice(spark, sales, cubedef):
    first = sales.filter(F.col("units") < 4)
    delta = sales.filter(F.col("units") >= 4)
    board = CuttingBoard(cubedef, first)
    lat = CubeLattice(
        cubedef, first, axes=("state", "city"), values=("units", "avg_price")
    )
    board.register_lattice(lat)
    try:
        board.refresh(delta)
        q = CubeQuery().add_axis("state").add_value("avg_price")
        df = board.slice(q).to_df()
        # lattice dropped -> computed fresh over the grown base, and correct
        assert "_gid" not in df._jdf.queryExecution().optimizedPlan().toString()
        got = {r["state"]: round(r["avg_price"], 9) for r in df.collect()}
        want = {
            r["state"]: round(r["w"], 9)
            for r in sales.groupBy("state")
            .agg((F.sum("price") / F.count(F.lit(1))).alias("w"))
            .collect()
        }
        assert got == want
    finally:
        board.clear_cache()


def test_pivot_and_totals_served_from_lattice(sales, cubedef):
    """A pivoted query AND all three totals flavours (row, column, grand)
    must execute against the materialized lattice, never re-scanning the
    base relation: the executing plan above the InMemoryRelation is
    Project/Filter(_gid)/InMemoryTableScan. (The cached relation PRINTS
    its stored build plan — including the original scan — so the
    assertion splits the plan at the InMemoryRelation boundary.)"""
    from bacon_spark.observers.tables import TablePivot

    board = CuttingBoard(cubedef, sales, cache_results=False)
    lat = CubeLattice(cubedef, sales, axes=("state", "city"), values=("units", "n"))
    board.register_lattice(lat)

    def executing_plan(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        head = plan.split("InMemoryRelation")[0]
        return head

    q = (
        CubeQuery()
        .add_axis("state")
        .add_axis("city")
        .add_value("units")
        .add_value("n")
        .set_pivot("city")
    )
    # main pivoted slice
    head = executing_plan(board.slice(q).to_df())
    assert "InMemoryTableScan" in head and "FileScan" not in head
    assert "Scan ExistingRDD" not in head  # the base createDataFrame relation

    # row totals (query minus pivot axes), column totals (minus row axes),
    # grand total (dim 0) — every derived totals query must hit the lattice
    qrow = q.remove_axis("city")
    qcol = q.remove_axis("state")
    q0 = qrow.remove_axis("state")
    for dq in (qrow, qcol, q0):
        h = executing_plan(board.slice(dq).to_df())
        assert "InMemoryTableScan" in h and "FileScan" not in h, dq
        assert "Scan ExistingRDD" not in h, dq

    # and the rendered pivot table agrees with direct aggregation
    t = TablePivot(board, q)
    direct = {
        (r["state"], r["city"]): (r["u"], r["n"])
        for r in sales.groupBy("state", "city")
        .agg(F.sum("units").alias("u"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for rk in t.row_keys:
        for pk in t.columns:
            cell = t.cells.get(rk, {}).get(pk)
            if cell is not None:
                assert (cell["units"], cell["n"]) == direct[(rk[0], pk[0])]
    grand = t.grand_total()
    assert grand["units"] == sum(v[0] for v in direct.values())
    assert grand["n"] == 100


def test_histogram_buckets_edges_and_zero_fill(spark):
    """width_bucket semantics: underflow->0, overflow->nbins+1, boundary
    values land in the bin whose lower edge they equal; empty bins appear
    with n=0; nulls dropped."""
    from bacon_spark.operators.profile import histogram

    df = spark.createDataFrame(
        [(-1.0,), (0.0,), (4.999,), (5.0,), (9.999,), (10.0,), (25.0,), (None,)],
        "x double",
    )
    out = {r["bucket"]: (r["edge_lo"], r["n"]) for r in histogram(df, "x", 0.0, 10.0, 2).collect()}
    assert out[0] == (None, 1)        # -1 underflows
    assert out[1] == (0.0, 2)         # 0.0 and 4.999
    assert out[2] == (5.0, 2)         # 5.0 boundary and 9.999
    assert out[3] == (10.0, 2)        # 10.0 and 25.0 overflow
    assert len(out) == 4


def test_profile_split_aggregation_values(spark):
    """r13: profile()'s counting aggregates and min/max run in separate
    one-row aggregations (min/max over strings forced the combined
    multi-distinct Expand into a SortAggregate that fully sorted the
    expanded rows). Pin exact values on a mixed-type frame with nulls
    and strings so the split can never drift from the combined form."""
    from bacon_spark.operators.profile import profile

    df = spark.createDataFrame(
        [(1, "b", 2.0), (2, "a", None), (2, None, 4.0), (3, "a", 4.0)],
        "k int, s string, v double",
    )
    out = {r["column"]: r.asDict() for r in profile(df, ["k", "s", "v"]).collect()}
    assert set(out) == {"k", "s", "v"}
    for c in out:
        assert out[c]["n_rows"] == 4
    assert (out["k"]["n_nulls"], out["k"]["n_distinct"]) == (0, 3)
    assert (out["k"]["min_value"], out["k"]["max_value"]) == ("1", "3")
    assert (out["s"]["n_nulls"], out["s"]["n_distinct"]) == (1, 2)
    assert (out["s"]["min_value"], out["s"]["max_value"]) == ("a", "b")
    assert (out["v"]["n_nulls"], out["v"]["n_distinct"]) == (1, 2)
    assert (out["v"]["min_value"], out["v"]["max_value"]) == ("2.0", "4.0")


def test_lattice_decision_recorded(sales, cubedef):
    """VERDICT r11 next #6: the planner's serve-vs-rescan choice is
    auditable after the fact — decisions.last('lattice') explains whether
    a registered lattice answered the query, and why not when it didn't.
    Boards tag records with their decisions_context so concurrent boards
    can be told apart (ADVICE r11)."""
    from bacon_spark.operators import decisions

    decisions.clear()
    board = CuttingBoard(cubedef, sales, cache_results=False)
    lat = CubeLattice(cubedef, sales, axes=("state", "city"), values=("units", "n"))
    try:
        # no lattice registered: no vacuous rescan records
        board.slice(CubeQuery().add_axis("state").add_value("units")).collect()
        assert decisions.last("lattice") is None

        board.register_lattice(lat)
        board.slice(CubeQuery().add_axis("state").add_value("units")).collect()
        d = decisions.last("lattice", context=board.decisions_context)
        assert d is not None and d.route == "serve"
        assert d.detail["level"] == "finished" and not d.detail["reaggregated"]

        # value outside the lattice -> rescan, reason recorded
        board.slice(CubeQuery().add_axis("state").add_value("avg_price")).collect()
        d = decisions.last("lattice", context=board.decisions_context)
        assert d.route == "rescan" and d.detail["reason"] == "not_covered"

        # non-eq filter on a dropped axis with a non-reaggregatable value
        # -> the reagg gate refuses the covering lattice
        board2 = CuttingBoard(cubedef, sales, cache_results=False)
        lat2 = CubeLattice(
            cubedef, sales, axes=("state", "city"), values=("avg_price",)
        )
        board2.register_lattice(lat2)
        try:
            board2.slice(
                CubeQuery()
                .add_axis("state")
                .add_value("avg_price")
                .add_filter("city", "in", ("c1", "c2"))
            ).collect()
            d2 = decisions.last("lattice", context=board2.decisions_context)
            assert d2.route == "rescan" and d2.detail["reason"] == "reagg_gate"
            # context filtering: board's last record is unaffected by
            # board2's interleaved one
            assert (
                decisions.last("lattice", context=board.decisions_context).detail[
                    "reason"
                ]
                == "not_covered"
            )
        finally:
            lat2.unpersist()
    finally:
        lat.unpersist()
        decisions.clear()
