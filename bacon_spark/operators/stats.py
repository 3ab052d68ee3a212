"""Distributed statistics operators: grouped least-squares regression and
robust (median/MAD) outlier detection.

Engine extensions beyond the reference surface (the reference's
accumulator set stops at StdDev; cf. /root/reference/bacon — Sum/Count/
Min/Max/Average/StdDev).  Both operators are pure aggregations:

* ``grouped_regression`` computes slope / intercept / r² from the five
  classic power sums.  Inputs are INTEGER columns and the sums are
  ``decimal(38,0)`` — exact in both Spark and DuckDB regardless of row
  count — so the only floating-point ops are the final divisions, done
  on identical integers in both engines.  One partial-aggregated shuffle
  on the group key; no second pass.
* ``mad_outliers`` is the classic robust filter: per-group median m,
  MAD = median(|x - m|), flag x where |x - m| > k · 1.4826 · MAD.
  Two median passes (exact interpolated percentile, the same definition
  in Spark's ``percentile`` and DuckDB's ``median``) + one broadcast
  join back.  On integer inputs every median is an exact multiple of
  0.5, so the comparison is deterministic cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Grouped OLS regression
# ---------------------------------------------------------------------------


def grouped_regression(
    df: DataFrame, group: str, x_col: str, y_col: str
) -> DataFrame:
    """Per-group OLS of y on x: ``group, n, slope, intercept, r2``.

    *x_col* / *y_col* must be integer-valued columns; sums are decimal-
    exact.  r² = (n·Sxy − Sx·Sy)² / ((n·Sxx − Sx²) · (n·Syy − Sy²));
    degenerate groups (zero variance in x) yield NULL slope/r².

    Overflow guard (ADVICE r3): under non-ANSI Spark an overflowing
    decimal(38,0) product/sum goes NULL *silently* (and per-row product
    overflow silently drops rows from the sum), while DuckDB's HUGEINT
    raises — the engines would diverge quietly.  The same aggregation
    therefore also computes per-group max|x| / max|y|, and the output
    raises (JVM-side ``raise_error``) when n·max² could approach 10³⁸ —
    a conservative bound (guard may fire slightly before true overflow),
    so overflow surfaces as an ERROR on both engines instead of NULLs on
    one.  Input bound: n·max(|x|,|y|)² < 9.9e37."""
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    sums = df.groupBy(group).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(d(x_col)).alias("sx"),
        F.sum(d(y_col)).alias("sy"),
        F.sum((d(x_col) * d(y_col)).cast("decimal(38,0)")).alias("sxy"),
        F.sum((d(x_col) * d(x_col)).cast("decimal(38,0)")).alias("sxx"),
        F.sum((d(y_col) * d(y_col)).cast("decimal(38,0)")).alias("syy"),
        F.max(F.abs(d(x_col))).cast("double").alias("_mx"),
        F.max(F.abs(d(y_col))).cast("double").alias("_my"),
    )
    big = F.greatest(F.col("_mx"), F.col("_my"))
    overflow_risk = big * big * F.col("n").cast("double") >= F.lit(9.9e37)
    # decimal(38,0) products can exceed 38 digits for the cross terms;
    # evaluate the covariance numerators in double AFTER the exact sums
    # (identical doubles both engines: same integer inputs, same ops).
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    slope = F.when(var_x != 0, cov_n / var_x)
    intercept = F.when(var_x != 0, (sy - slope * sx) / n)
    r2 = F.when((var_x != 0) & (var_y != 0), (cov_n * cov_n) / (var_x * var_y))
    n_guarded = F.when(
        overflow_risk,
        F.raise_error(
            F.concat(
                F.lit("grouped_regression overflow risk in group "),
                F.col(group).cast("string"),
                F.lit(": n*max(|x|,|y|)^2 approaches decimal(38,0); "
                      "rescale inputs or pre-aggregate"),
            )
        ).cast("long"),
    ).otherwise(F.col("n").cast("long"))
    return sums.select(
        F.col(group),
        n_guarded.alias("n"),
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )


def grouped_regression_sql(
    table: str, group: str, x_expr: str, y_expr: str
) -> str:
    """DuckDB twin of :func:`grouped_regression`.  DuckDB's exact wide
    integer is HUGEINT (int128) — same values as Spark's decimal(38,0)
    sums for any input that fits, and both engines convert the identical
    integers to double for the final divisions."""
    return f"""
    WITH _sums AS (
        SELECT {group},
               count(*) AS n,
               sum(cast({x_expr} as hugeint)) AS sx,
               sum(cast({y_expr} as hugeint)) AS sy,
               sum(cast({x_expr} as hugeint) * cast({y_expr} as hugeint)) AS sxy,
               sum(cast({x_expr} as hugeint) * cast({x_expr} as hugeint)) AS sxx,
               sum(cast({y_expr} as hugeint) * cast({y_expr} as hugeint)) AS syy
        FROM {table}
        GROUP BY {group}
    ),
    _d AS (
        SELECT {group},
               cast(n as double) AS n, cast(sx as double) AS sx,
               cast(sy as double) AS sy, cast(sxy as double) AS sxy,
               cast(sxx as double) AS sxx, cast(syy as double) AS syy
        FROM _sums
    )
    SELECT {group},
           cast(n as bigint) AS n,
           CASE WHEN (n*sxx - sx*sx) <> 0
                THEN (n*sxy - sx*sy) / (n*sxx - sx*sx) END AS slope,
           CASE WHEN (n*sxx - sx*sx) <> 0
                THEN (sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n END
               AS intercept,
           CASE WHEN (n*sxx - sx*sx) <> 0 AND (n*syy - sy*sy) <> 0
                THEN ((n*sxy - sx*sy) * (n*sxy - sx*sy))
                     / ((n*sxx - sx*sx) * (n*syy - sy*sy)) END AS r2
    FROM _d
    """


# ---------------------------------------------------------------------------
# Median / MAD robust outliers
# ---------------------------------------------------------------------------

#: consistency constant mapping MAD to sigma for normal data
MAD_SIGMA = 1.4826


def mad_outliers(
    df: DataFrame, group: str, value_col: str, k: float = 3.0
) -> DataFrame:
    """Per-group robust outlier summary over the INTEGER column
    *value_col*: ``group, n, med, mad, n_outliers`` where outliers are
    rows with |x − med| > k · 1.4826 · MAD.

    Shape: two exact-percentile aggregations on the group key (the
    second over |x − med|, med joined back broadcast) and a final
    count — group-cardinality state only, never row-cardinality."""
    med = df.groupBy(group).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("med"),
        F.count(F.lit(1)).alias("n"),
    )
    with_med = df.join(F.broadcast(med), group)
    dev = with_med.withColumn("_adev", F.abs(F.col(value_col) - F.col("med")))
    mad = dev.groupBy(group).agg(F.expr("percentile(_adev, 0.5)").alias("mad"))
    flagged = (
        dev.join(F.broadcast(mad), group)
        .withColumn(
            "_is_out",
            (F.col("_adev") > F.lit(k) * F.lit(MAD_SIGMA) * F.col("mad")).cast("int"),
        )
        .groupBy(group)
        .agg(F.sum("_is_out").alias("n_outliers"))
    )
    return (
        med.join(mad, group)
        .join(flagged, group)
        .select(group, "n", "med", "mad", "n_outliers")
    )


def mad_outliers_sql(table: str, group: str, value_expr: str, k: float = 3.0) -> str:
    """DuckDB twin of :func:`mad_outliers` (median == Spark's exact
    interpolated percentile on integer inputs)."""
    return f"""
    WITH _v AS (SELECT {group} AS g, {value_expr} AS v FROM {table}),
    _med AS (
        SELECT g, median(v) AS med, count(*) AS n FROM _v GROUP BY g
    ),
    _dev AS (
        SELECT _v.g, abs(_v.v - _med.med) AS adev, _med.med, _med.n
        FROM _v JOIN _med USING (g)
    ),
    _mad AS (SELECT g, median(adev) AS mad FROM _dev GROUP BY g),
    _out AS (
        SELECT _dev.g,
               sum(CASE WHEN _dev.adev > {k} * {MAD_SIGMA} * _mad.mad
                        THEN 1 ELSE 0 END) AS n_outliers
        FROM _dev JOIN _mad USING (g)
        GROUP BY _dev.g
    )
    SELECT _med.g AS {group}, _med.n AS n, _med.med AS med,
           _mad.mad AS mad, cast(_out.n_outliers as bigint) AS n_outliers
    FROM _med JOIN _mad USING (g) JOIN _out USING (g)
    """
