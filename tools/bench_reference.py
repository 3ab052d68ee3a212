"""Measure the REFERENCE engine (GambitResearch/bacon, pure-Python
in-memory cube) on the same fixture data and the same queries as our q01 /
q03 / q09, for a direct single-node throughput comparison against
bacon_spark's bench numbers (BASELINE.md notes the reference publishes no
numbers of its own; this produces them empirically).

The reference code is executed as-is from /root/reference (read-only,
imported - not copied). Data is loaded through DuckDB into namedtuples,
which is bacon's native input shape (any iterable of objects).

Usage: python tools/bench_reference.py [sf_dir]
Prints one JSON line: {"engine": "reference-bacon", "queries": {...}, ...}
"""

from __future__ import annotations

import json
import sys
import time
from collections import namedtuple

import duckdb

sys.path.insert(0, "/root/reference")


def _pq(sf_dir: str, name: str) -> str:
    """Parquet path for DuckDB: the driver fixtures are single files,
    the .scale replicas are Spark-written directories — glob those."""
    import os

    p = f"{sf_dir}/{name}.parquet"
    return f"{p}/*.parquet" if os.path.isdir(p) else p

from bacon import accumulators as accs  # noqa: E402
from bacon import cubedef as cd_mod  # noqa: E402
from bacon.cubedef import (  # noqa: E402
    AttributeLabel,
    AttributeMeasure,
    CubeDef,
    Label,
    Measure,
)
from bacon.cubequery import CubeQuery  # noqa: E402
from bacon.cutting import CuttingBoard  # noqa: E402


def load_lineitem(sf_dir: str):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT l_returnflag, l_linestatus, l_quantity, l_extendedprice,
               l_discount, l_tax, cast(l_shipdate as date) AS l_shipdate
        FROM '{_pq(sf_dir, 'lineitem')}'
        """
    ).fetchall()
    Item = namedtuple(
        "Item",
        "l_returnflag l_linestatus l_quantity l_extendedprice l_discount l_tax l_shipdate",
    )
    return [Item(*r) for r in rows]


def build_cubedef() -> CubeDef:
    cd = CubeDef()
    cd.add_label(AttributeLabel("l_returnflag"))
    cd.add_label(AttributeLabel("l_linestatus"))
    cd.add_label(cd_mod.MonthLabel("l_shipdate"))
    cd.add_label(Label("qty_f", extract=lambda r: r.l_quantity))
    cd.add_measure(AttributeMeasure("l_quantity"))
    cd.add_measure(AttributeMeasure("l_extendedprice"))
    cd.add_measure(
        Measure("disc_price", extract=lambda r: r.l_extendedprice * (1 - r.l_discount))
    )
    cd.add_measure(
        Measure(
            "charge",
            extract=lambda r: r.l_extendedprice * (1 - r.l_discount) * (1 + r.l_tax),
        )
    )
    return cd


def load_customer(sf_dir: str):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT c_nationkey, c_acctbal FROM '{_pq(sf_dir, 'customer')}'"
    ).fetchall()
    Cust = namedtuple("Cust", "c_nationkey c_acctbal")
    return [Cust(*r) for r in rows]


def load_part(sf_dir: str):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT p_partkey, p_brand, p_size, p_retailprice FROM '{_pq(sf_dir, 'part')}'"
    ).fetchall()
    Part = namedtuple("Part", "p_partkey p_brand p_size p_retailprice")
    return [Part(*r) for r in rows]


def load_joined_sales(sf_dir: str):
    """The q02 shape's input for bacon: the reference has NO join operator
    — its model is a PRE-JOINED stream (any iterable of objects), so the
    5-way star join runs in DuckDB at load time and only the cube pays
    per-query. The engine side declares the joins in-query (broadcast
    dims), so the comparison is cube-vs-cube on identical rows with the
    reference's join cost billed to load_seconds."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT r.r_name AS region, n.n_name AS nation,
               l.l_extendedprice, l.l_discount
        FROM '{_pq(sf_dir, 'lineitem')}' l
        JOIN '{_pq(sf_dir, 'orders')}' o ON l.l_orderkey = o.o_orderkey
        JOIN '{_pq(sf_dir, 'customer')}' c ON o.o_custkey = c.c_custkey
        JOIN '{_pq(sf_dir, 'nation')}' n ON c.c_nationkey = n.n_nationkey
        JOIN '{_pq(sf_dir, 'region')}' r ON n.n_regionkey = r.r_regionkey
        """
    ).fetchall()
    Sale = namedtuple("Sale", "region nation l_extendedprice l_discount")
    return [Sale(*r) for r in rows]


def load_orders(sf_dir: str):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT o_custkey, o_totalprice FROM '{_pq(sf_dir, 'orders')}'"
    ).fetchall()
    Order = namedtuple("Order", "o_custkey o_totalprice")
    return [Order(*r) for r in rows]


def load_part_names(sf_dir: str):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT p_brand, p_name FROM '{_pq(sf_dir, 'part')}'"
    ).fetchall()
    PartN = namedtuple("PartN", "p_brand p_name")
    return [PartN(*r) for r in rows]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    t0 = time.perf_counter()
    data = load_lineitem(sf_dir)
    load_s = time.perf_counter() - t0

    cd = build_cubedef()
    board = CuttingBoard(cd, data)
    timings = {}

    # q01-shaped: returnflag x linestatus, 4 sum measures (bacon has no
    # shipdate filter pushdown over objects; add the filter for parity)
    q = (
        CubeQuery()
        .add_axis("l_returnflag")
        .add_axis("l_linestatus")
        .add_value("l_quantity")
        .add_value("l_extendedprice")
        .add_value("disc_price")
        .add_value("charge")
    )
    import datetime as dt

    q = q.add_filter("l_shipdate_month", dt.date(1998, 9, 1), operator="le")
    t0 = time.perf_counter()
    board.slice(q)
    timings["q01_pricing_summary"] = round(time.perf_counter() - t0, 3)

    # q03-shaped: group by month, one sum
    q2 = CubeQuery().add_axis("l_shipdate_month").add_value("l_quantity")
    t0 = time.perf_counter()
    board.slice(q2)
    timings["q03_by_month"] = round(time.perf_counter() - t0, 3)

    # q09-shaped: scalar filters + 1-axis agg
    q3 = (
        CubeQuery()
        .add_axis("l_linestatus")
        .add_value("l_quantity")
        .add_filter("qty_f", 10, operator="gt")
        .add_filter("qty_f", 45, operator="le")
    )
    t0 = time.perf_counter()
    board.slice(q3)
    timings["q09_filter_scalar"] = round(time.perf_counter() - t0, 3)

    # q07-shaped: Min/Max/StdDev accumulators over customer balances
    cust = load_customer(sf_dir)
    cd7 = CubeDef()
    cd7.add_label(AttributeLabel("c_nationkey"))
    cd7.add_measure(Measure("min_bal", extract=lambda r: r.c_acctbal, acc=accs.Min))
    cd7.add_measure(Measure("max_bal", extract=lambda r: r.c_acctbal, acc=accs.Max))
    cd7.add_measure(Measure("std_bal", extract=lambda r: r.c_acctbal, acc=accs.StdDev))
    b7 = CuttingBoard(cd7, cust)
    q7 = (
        CubeQuery()
        .add_axis("c_nationkey")
        .add_value("min_bal")
        .add_value("max_bal")
        .add_value("std_bal")
    )
    t0 = time.perf_counter()
    b7.slice(q7)
    timings["q07_minmax_stddev"] = round(time.perf_counter() - t0, 3)

    # q10-shaped: in/ni membership filters over part
    part = load_part(sf_dir)
    cd10 = CubeDef()
    cd10.add_label(AttributeLabel("p_brand"))
    cd10.add_label(AttributeLabel("p_size"))
    cd10.add_measure(Measure("n", extract=lambda r: 1, acc=accs.Count))
    cd10.add_measure(Measure("sum_price", extract=lambda r: r.p_retailprice))
    b10 = CuttingBoard(cd10, part)
    q10 = (
        CubeQuery()
        .add_axis("p_brand")
        .add_value("n")
        .add_value("sum_price")
        .add_filter("p_brand", frozenset({"Brand#1", "Brand#2", "Brand#3"}), operator="in")
        .add_filter("p_size", frozenset({1, 2, 3}), operator="ni")
    )
    t0 = time.perf_counter()
    b10.slice(q10)
    timings["q10_filter_in_ni"] = round(time.perf_counter() - t0, 3)

    # ---- round-10 widened shapes (VERDICT r9 next #5) ----

    # q02-shaped: region x nation cube over the PRE-JOINED sales stream
    # (the reference's join model; DuckDB join billed to load)
    t0 = time.perf_counter()
    sales = load_joined_sales(sf_dir)
    load_join_s = time.perf_counter() - t0
    cd2 = CubeDef()
    cd2.add_label(AttributeLabel("region"))
    cd2.add_label(AttributeLabel("nation"))
    cd2.add_measure(
        Measure("revenue", extract=lambda r: r.l_extendedprice * (1 - r.l_discount))
    )
    cd2.add_measure(Measure("n_items", extract=lambda r: 1, acc=accs.Count))
    b2 = CuttingBoard(cd2, sales)
    q2j = (
        CubeQuery().add_axis("region").add_axis("nation")
        .add_value("revenue").add_value("n_items")
    )
    t0 = time.perf_counter()
    b2.slice(q2j)
    timings["q02_region_nation"] = round(time.perf_counter() - t0, 3)

    # q04-shaped: order-by-measure desc + top-10. The reference sorts in
    # its Table renderer (observers/tables.py:411-427) AFTER the slice;
    # the timed region replays that renderer sort + cut so it pays the
    # same work the engine's in-query sort+limit pays.
    orders = load_orders(sf_dir)
    cd4 = CubeDef()
    cd4.add_label(AttributeLabel("o_custkey"))
    cd4.add_measure(Measure("total", extract=lambda r: r.o_totalprice))
    b4 = CuttingBoard(cd4, orders)
    q4 = CubeQuery().add_axis("o_custkey").add_value("total").order_by("-total")
    t0 = time.perf_counter()
    s4 = b4.slice(q4)
    rows4 = [(lv.value, sub.record["total"].get()) for lv, sub in s4]
    rows4.sort(key=lambda t: (-(t[1] or 0), t[0]))
    top10 = rows4[:10]
    timings["q04_top_customers"] = round(time.perf_counter() - t0, 3)
    assert len(top10) == 10

    # q12-shaped: set-algebra filters (hasany/hasall/hasnone,
    # cutting.py:799-870) on an extract-derived set label — the split
    # runs per row per query, matching the engine's in-query F.split.
    parts = load_part_names(sf_dir)
    cd12 = CubeDef()
    cd12.add_label(AttributeLabel("p_brand"))
    cd12.add_label(Label("tags", extract=lambda r: r.p_name.split(" ")))
    cd12.add_measure(Measure("n", extract=lambda r: 1, acc=accs.Count))
    b12 = CuttingBoard(cd12, parts)
    q12 = (
        CubeQuery().add_axis("p_brand").add_value("n")
        .add_filter("tags", frozenset({"red", "blue", "green"}), operator="hasany")
        .add_filter("tags", frozenset({"widget"}), operator="hasall")
        .add_filter("tags", frozenset({"bolt", "gear"}), operator="hasnone")
    )
    t0 = time.perf_counter()
    b12.slice(q12)
    timings["q12_set_filters"] = round(time.perf_counter() - t0, 3)

    # q17-shaped: 2-axis slice + pivot CROSS-TAB walk (the Table2D
    # renderer's alignment work, observers/tables.py:325-508): one row
    # per linestatus, one qty column per returnflag value.
    q17 = (
        CubeQuery().add_axis("l_linestatus").add_axis("l_returnflag")
        .add_value("l_quantity").set_pivot("l_returnflag")
    )
    t0 = time.perf_counter()
    s17 = board.slice(q17)
    xtab = []
    for lv, row in s17:
        cells = []
        for v in ("A", "N", "R"):
            try:
                cells.append(row[v].record["l_quantity"].get())
            except KeyError:
                cells.append(None)
        xtab.append((lv.value, *cells))
    timings["q17_pivot_returnflag"] = round(time.perf_counter() - t0, 3)
    assert len(xtab) >= 2 and any(c is not None for _, *cs in xtab for c in cs)

    print(
        json.dumps(
            {
                "engine": "reference-bacon (pure Python, in-memory)",
                "sf_dir": sf_dir,
                "rows": len(data),
                "load_seconds": round(load_s, 3),
                "load_joined_seconds": round(load_join_s, 3),
                "queries": timings,
            }
        )
    )


if __name__ == "__main__":
    main()
