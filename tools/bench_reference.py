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
        FROM '{sf_dir}/lineitem.parquet'
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
