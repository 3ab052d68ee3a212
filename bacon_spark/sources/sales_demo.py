"""Demo sales cube: CSV source + the reference demo's cube definition.

Mirrors /root/reference/bacon_demo/data.py:12-98 (34-row sales CSV, time
hierarchy year→{month,week}→day on creation_date, location hierarchy
state→city, measures units / forecasted_units / amount=units·price) with a
synthetic but schema-identical dataset (FIXTURES.md §1.1). Demonstrates the
CSV source path: explicit schema, header, typed parse — Catalyst pushes
projection into the csv reader.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..accumulators import Count, Sum
from ..cubedef import (
    CubeDef,
    DayLabel,
    Label,
    Measure,
    MonthLabel,
    NullableLabel,
    WeekLabel,
    YearLabel,
)

CSV_SCHEMA = (
    "contact string, city string, company string, state string, zip string, "
    "creation_date date, close_date date, status string, sales_stage string, "
    "product string, probability int, units int, forecasted_units int, price double"
)

_STATES = {
    "NY": ["New York", "Buffalo"],
    "CA": ["Los Angeles", "San Diego"],
    "TX": ["Austin", "Houston"],
}
_STATUSES = ["Sales Opportunity", "Closed Won", "Closed Lost", None]
_STAGES = ["Prospecting", "Negotiation", "Closed"]
_PRODUCTS = ["Widget", "Gadget", "Gizmo"]


def demo_rows(n: int = 34) -> list[tuple]:
    """Deterministic synthetic rows shaped like the reference demo CSV."""
    rows = []
    base = dt.date(2011, 1, 3)
    states = sorted(_STATES)
    for i in range(n):
        state = states[i % 3]
        city = _STATES[state][i % 2]
        creation = base + dt.timedelta(days=11 * i % 365)
        close = creation + dt.timedelta(days=30 + i % 60)
        status = _STATUSES[i % 4]
        rows.append(
            (
                f"Contact {i}",
                city,
                f"Company {i % 7}",
                state,
                f"{10000 + i}",
                creation,
                close,
                status,
                _STAGES[i % 3],
                _PRODUCTS[i % 3],
                (i * 13) % 100,
                1 + i % 9,
                1 + (i + 3) % 9,
                round(9.99 + (i % 5) * 2.5, 2),
            )
        )
    return rows


def write_demo_csv(spark: SparkSession, path: str, n: int = 34) -> None:
    spark.createDataFrame(demo_rows(n), CSV_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).option("header", "true").csv(path)


def read_sales_csv(spark: SparkSession, path: str) -> DataFrame:
    """CSV source with declared schema (reference parses per-column,
    /root/reference/bacon_demo/data.py:34-46; here the schema does it)."""
    return spark.read.schema(CSV_SCHEMA).option("header", "true").csv(path)


def demo_cubedef() -> CubeDef:
    """The demo cube (/root/reference/bacon_demo/data.py:59-98)."""
    cd = CubeDef("sales demo")
    cd.add_label(YearLabel("creation_date_year", "creation_date"))
    cd.add_label(MonthLabel("creation_date_month", "creation_date"))
    cd.add_label(WeekLabel("creation_date_week", "creation_date"))
    cd.add_label(DayLabel("creation_date_day", "creation_date"))
    cd.add_hierarchy("creation_date_month", "creation_date_year")
    cd.add_hierarchy("creation_date_week", "creation_date_year")
    cd.add_hierarchy("creation_date_day", "creation_date_month")
    cd.add_hierarchy("creation_date_day", "creation_date_week")

    cd.add_label(Label("state"))
    cd.add_label(Label("city", child_of="state"))
    cd.add_label(NullableLabel("status"))
    cd.add_label(Label("sales_stage"))
    cd.add_label(Label("product"))

    cd.add_measure(Measure("units", acc=Sum()))
    cd.add_measure(Measure("forecasted_units", acc=Sum()))
    cd.add_measure(Measure("amount", F.col("units") * F.col("price"), acc=Sum()))
    cd.add_measure(
        Measure("forecasted_amount", F.col("forecasted_units") * F.col("price"), acc=Sum())
    )
    cd.add_measure(Measure("n", "units", acc=Count()))
    return cd
