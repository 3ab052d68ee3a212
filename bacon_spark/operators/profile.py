"""Table profiling: per-column null counts, exact distinct counts, and
min/max — the ``ANALYZE TABLE``-style summary a pipeline runs before
deciding partition keys, dictionary-encoding candidates, or skew risks.

Scale design (100 TB): one pass computes every per-column aggregate in a
single global aggregation (Catalyst plans multi-distinct via Expand —
one shuffle per distinct-column group, each carrying only that column's
values, with map-side partial aggregation). The wide 1-row result is
then unpivoted driver-free via ``stack``. For quick profiles swap
``exact=False`` to HLL ``approx_count_distinct`` — identical plan shape
minus the Expand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str], exact: bool = True) -> DataFrame:
    """One row per profiled column: (column, n_rows, n_nulls, n_distinct,
    min_value, max_value) with min/max rendered as strings so mixed-type
    columns share one schema."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        col = F.col(c)
        aggs.append(F.count(F.when(col.isNull(), 1)).alias(f"{c}__nulls"))
        distinct = (
            F.countDistinct(col) if exact else F.approx_count_distinct(col)
        )
        aggs.append(distinct.alias(f"{c}__distinct"))
        aggs.append(F.min(col).cast("string").alias(f"{c}__min"))
        aggs.append(F.max(col).cast("string").alias(f"{c}__max"))
    wide = df.agg(*aggs)
    stack_args = []
    for c in cols:
        stack_args += [
            f"'{c}'", f"`{c}__nulls`", f"`{c}__distinct`", f"`{c}__min`", f"`{c}__max`",
        ]
    stacked = wide.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {', '.join(stack_args)}) "
            "as (column, n_nulls, n_distinct, min_value, max_value)"
        ),
    )
    return stacked.select(
        "column", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value"
    )


def profile_sql(table: str, cols: list[str]) -> str:
    """DuckDB twin: same aggregates, unpivoted via UNION ALL."""
    parts = []
    for c in cols:
        parts.append(
            f"SELECT '{c}' AS column, count(*) AS n_rows, "
            f"count(*) FILTER ({c} IS NULL) AS n_nulls, "
            f"count(DISTINCT {c}) AS n_distinct, "
            f"min({c})::VARCHAR AS min_value, max({c})::VARCHAR AS max_value "
            f"FROM {table}"
        )
    return " UNION ALL ".join(parts)
