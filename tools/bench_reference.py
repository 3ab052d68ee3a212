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

    print(
        json.dumps(
            {
                "engine": "reference-bacon (pure Python, in-memory)",
                "sf_dir": sf_dir,
                "rows": len(data),
                "load_seconds": round(load_s, 3),
                "queries": timings,
            }
        )
    )


if __name__ == "__main__":
    main()
