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
    columns share one schema.

    The counting aggregates (row/null/distinct) and the min/max
    aggregates are computed in SEPARATE one-row aggregations joined at
    the end (r13).  In one combined aggregation the multi-distinct
    rewrite's Expand stage must also carry the min/max functions, and a
    min/max over a string (or other var-length) column makes the
    aggregation buffer non-mutable — Spark falls back from
    HashAggregate to SortAggregate and fully SORTS the Expanded
    (n_rows x (len(cols)+1)) rows on every profiled column (measured:
    20.3 s summed task time on a 4-column orders profile at sf0.1,
    96% of the query).  Split, the Expand path carries only long
    buffers (stays HashAggregate, no sort) and the min/max pass is a
    keyless streaming fold (SortAggregate with no keys needs no sort).
    The input subtree is referenced twice but canonicalizes identically,
    so the scan/exchange is shared via ReusedExchange; the join of two
    1-row frames is a broadcast of scalars.

    Assumes *df* is DETERMINISTIC (a table/file scan or a pure
    transformation of one): the two aggregation passes re-evaluate it,
    so a non-deterministic input (``df.sample()``, ``rand()``-derived
    columns) could feed the count stats and the min/max from different
    row sets — ``managed_persist(df)`` first in that case."""
    count_aggs = [F.count(F.lit(1)).alias("__n")]
    mm_aggs = []
    for c in cols:
        col = F.col(c)
        count_aggs.append(F.count(F.when(col.isNull(), 1)).alias(f"{c}__nulls"))
        distinct = (
            F.countDistinct(col) if exact else F.approx_count_distinct(col)
        )
        count_aggs.append(distinct.alias(f"{c}__distinct"))
        mm_aggs.append(F.min(col).cast("string").alias(f"{c}__min"))
        mm_aggs.append(F.max(col).cast("string").alias(f"{c}__max"))
    wide = df.agg(*count_aggs).crossJoin(df.agg(*mm_aggs))
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


def histogram(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    nbins: int,
) -> DataFrame:
    """Fixed-width histogram with SQL-standard width_bucket semantics:
    bucket 0 holds x < lo, bucket nbins+1 holds x >= hi, else bucket
    1 + floor((x - lo) * nbins / (hi - lo)); nulls are dropped. Every
    bucket 0..nbins+1 appears (zero-filled via a generated spine), with
    its inclusive lower edge for the regular bins.

    The bucket expression is a fixed IEEE shape (same ops, same order)
    shared with the DuckDB twin, so boundary-adjacent doubles land in the
    same bin in both engines. Scale shape: one narrow groupBy on a
    bounded key domain (nbins+2 values) — partial aggregation collapses
    each partition to <= nbins+2 rows before the shuffle; the spine is
    driver-tiny. The classic data-profiling pass over any numeric column
    at any corpus size."""
    x = F.col(col)
    bucket = (
        F.when(x < lo, F.lit(0))
        .when(x >= hi, F.lit(nbins + 1))
        .otherwise((F.lit(1) + F.floor((x - lo) * nbins / (hi - lo))).cast("int"))
    )
    counts = (
        df.filter(x.isNotNull())
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spark = df.sparkSession
    spine = spark.range(0, nbins + 2).select(F.col("id").cast("int").alias("bucket"))
    w = (hi - lo) / nbins
    edge = (
        F.when(F.col("bucket") == 0, F.lit(None).cast("double"))
        .when(F.col("bucket") == nbins + 1, F.lit(float(hi)))
        .otherwise(F.lit(float(lo)) + (F.col("bucket") - 1) * F.lit(w))
    )
    return (
        spine.join(counts, "bucket", "left")
        .select(
            "bucket",
            edge.alias("edge_lo"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        )
        .orderBy("bucket")
    )


def histogram_sql(table: str, col: str, lo: float, hi: float, nbins: int) -> str:
    """DuckDB twin of :func:`histogram` — identical bucket/edge IEEE
    expression shapes."""
    w = (hi - lo) / nbins
    bucket = (
        f"CASE WHEN {col} < {lo} THEN 0 "
        f"WHEN {col} >= {hi} THEN {nbins + 1} "
        f"ELSE (1 + floor(({col} - {lo}) * {nbins} / ({hi} - {lo})))::INT END"
    )
    return f"""
    WITH counts AS (
      SELECT {bucket} AS bucket, count(*) AS n
      FROM {table} WHERE {col} IS NOT NULL GROUP BY 1
    ),
    spine AS (SELECT unnest(range(0, {nbins + 2}))::INT AS bucket)
    SELECT s.bucket,
           (CASE WHEN s.bucket = 0 THEN NULL
                 WHEN s.bucket = {nbins + 1} THEN {float(hi)}
                 ELSE {float(lo)} + (s.bucket - 1) * {w} END)::DOUBLE AS edge_lo,
           coalesce(c.n, 0)::BIGINT AS n
    FROM spine s LEFT JOIN counts c ON s.bucket = c.bucket
    ORDER BY s.bucket
    """
