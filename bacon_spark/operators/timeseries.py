"""Time-series operators: exponentially weighted moving averages,
interval-concurrency sweep-lines, and the grouped-map (applyInPandas)
surface (LTTB downsampling, per-group fits).

Engine extensions beyond the reference surface (the reference's cube
engine has date-hierarchy labels but no ordered-state operators; cf.
/root/reference/bacon/cubedef.py date labels). The EWMA and sweep-line
operators compile to built-in window/aggregate expressions — no Python
UDFs — and each has a DuckDB twin generated from the same constants so
oracles stay in lockstep by construction; the grouped-map operators at
the bottom are the DOCUMENTED Arrow slow-path for genuinely sequential
per-group algorithms.

Determinism across engines is engineered, not hoped for:

* ``dyadic_ewma`` uses alpha = 1/2 with a fixed *depth*-row frame, so
  every weight is a power of two and the weighted numerator/denominator
  are exact 64-bit integer sums — the final single division is the only
  float op, performed on identical integers in both engines.
* ``interval_concurrency`` is a +1/-1 sweep-line; every prefix sum is an
  integer.  Intervals are half-open [start, end): at equal timestamps
  ends sort before starts (delta ascending), so a session ending exactly
  when another starts never double-counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Dyadic EWMA
# ---------------------------------------------------------------------------


def dyadic_ewma(
    df: DataFrame,
    key: str,
    order: list[str],
    value_col: str,
    depth: int = 16,
    out: str = "ewma",
) -> DataFrame:
    """Per-*key* EWMA of the integer column *value_col* with alpha = 1/2
    over the last *depth* rows (ordered by *order*).

    ewma_n = sum_{k=0..depth-1} v_{n-k} * 2^(depth-1-k)
             / sum_{k available} 2^(depth-1-k)

    Missing lags (short history) drop out of BOTH sums, so early rows
    are a correctly-normalized average of what exists.  Numerator and
    denominator are exact integer window sums; only the final division
    is floating point.

    Scale shape: one shuffle on *key*; the frame is ``depth`` lag()
    expressions over that single window — per-row state is O(depth),
    independent of partition length, and the whole thing stays in
    whole-stage codegen."""
    w = Window.partitionBy(key).orderBy(*order)
    num: Column = F.lit(0).cast("long")
    den: Column = F.lit(0).cast("long")
    for k in range(depth):
        weight = 1 << (depth - 1 - k)
        lagged = F.lag(F.col(value_col), k).over(w)
        num = num + F.coalesce(lagged * F.lit(weight), F.lit(0))
        den = den + F.when(lagged.isNotNull(), F.lit(weight)).otherwise(F.lit(0))
    return df.withColumn(out, (num.cast("double") / den.cast("double")))


def dyadic_ewma_sql(
    key: str, order: list[str], value_expr: str, depth: int = 16
) -> str:
    """DuckDB twin of :func:`dyadic_ewma`'s EWMA expression (same lag
    unrolling, same integer weights)."""
    order_by = ", ".join(order)
    over = f"OVER (PARTITION BY {key} ORDER BY {order_by})"
    nums, dens = [], []
    for k in range(depth):
        weight = 1 << (depth - 1 - k)
        lagged = f"lag({value_expr}, {k}) {over}"
        nums.append(f"coalesce(({lagged}) * {weight}, 0)")
        dens.append(f"CASE WHEN ({lagged}) IS NOT NULL THEN {weight} ELSE 0 END")
    num = " + ".join(nums)
    den = " + ".join(dens)
    return f"(cast({num} as double) / cast({den} as double))"


# ---------------------------------------------------------------------------
# Interval concurrency (sweep-line)
# ---------------------------------------------------------------------------


def interval_deltas(
    df: DataFrame, start_col: str, end_col: str
) -> DataFrame:
    """Explode [start, end) intervals into (+1 at start, -1 at end)
    sweep events.  Map-side only."""
    starts = df.select(F.col(start_col).alias("t"), F.lit(1).alias("delta"))
    ends = df.select(F.col(end_col).alias("t"), F.lit(-1).alias("delta"))
    return starts.unionByName(ends)


def interval_concurrency(
    df: DataFrame,
    start_col: str,
    end_col: str,
    chunk: str = "day",
) -> DataFrame:
    """Running concurrency level at every sweep event of the half-open
    intervals [start_col, end_col): columns ``t, delta, level`` where
    ``level`` is the number of live intervals just AFTER the event.

    NOT a single global window: a total order over all events would
    serialize 100 TB through one partition.  Instead the classic
    distributed prefix-sum decomposition:

    1. events are bucketed by ``date_trunc(chunk, t)``;
    2. within each chunk, an ordinary partitioned window computes the
       local prefix sum (order: t, then delta ascending, so -1 ends
       sort before +1 starts at equal t — half-open semantics);
    3. a chunk-level carry-in (the sum of ALL deltas in earlier chunks)
       is computed by a chunk-count-sized aggregate + running sum and
       joined back.

    level(t) = carry_in(chunk) + local_prefix(t) — exact even for
    intervals that span chunk boundaries, because carry_in is just "all
    deltas before this chunk" regardless of which interval they came
    from.  All arithmetic is integer."""
    deltas = interval_deltas(df, start_col, end_col).withColumn(
        "_chunk", F.date_trunc(chunk, F.col("t"))
    )
    local_w = (
        Window.partitionBy("_chunk")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = deltas.withColumn("_local", F.sum("delta").over(local_w))
    chunk_totals = deltas.groupBy("_chunk").agg(F.sum("delta").alias("_chunk_sum"))
    carry_w = (
        Window.orderBy("_chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carries = chunk_totals.withColumn(
        "_carry", F.coalesce(F.sum("_chunk_sum").over(carry_w), F.lit(0))
    ).select("_chunk", "_carry")
    return (
        local.join(F.broadcast(carries), "_chunk")
        .withColumn("level", (F.col("_carry") + F.col("_local")).cast("long"))
        .select("t", "delta", "level")
    )


def hourly_max_concurrency(
    df: DataFrame, start_col: str, end_col: str
) -> DataFrame:
    """Per-hour peak concurrency: for every hour that contains at least
    one sweep event, the max level observed in that hour — including
    the level *inherited* from before the hour's first event
    (``level - delta`` = the plateau the hour walked in on)."""
    levels = interval_concurrency(df, start_col, end_col)
    return (
        levels.withColumn("hour", F.date_trunc("hour", F.col("t")))
        .groupBy("hour")
        .agg(
            F.max(F.greatest(F.col("level"), F.col("level") - F.col("delta"))).alias(
                "peak"
            ),
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0)).alias("n_starts"),
        )
    )


def hourly_max_concurrency_sql(intervals_cte: str) -> str:
    """DuckDB twin of :func:`hourly_max_concurrency`.

    *intervals_cte* must select columns ``s`` (start) and ``e`` (end).
    The oracle uses ONE global window (fine at oracle scale; the Spark
    side uses the chunked decomposition — same arithmetic, same
    order)."""
    return f"""
    WITH _iv AS ({intervals_cte}),
    _deltas AS (
        SELECT s AS t, 1 AS delta FROM _iv
        UNION ALL
        SELECT e AS t, -1 AS delta FROM _iv
    ),
    _levels AS (
        SELECT t, delta,
               sum(delta) OVER (ORDER BY t, delta
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS level
        FROM _deltas
    )
    SELECT date_trunc('hour', t) AS hour,
           cast(max(greatest(level, level - delta)) as bigint) AS peak,
           cast(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) as bigint) AS n_starts
    FROM _levels
    GROUP BY 1
    """


# ---------------------------------------------------------------------------
# Grouped-map (applyInPandas) operators
# ---------------------------------------------------------------------------


def lttb_downsample(
    df: DataFrame,
    key: str,
    t_col: str,
    v_col: str,
    n_out: int = 50,
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013)
    per *key*: reduce each key's (t, v) series to *n_out* visually
    representative points — the standard plot-decimation algorithm
    feeding dashboard/plot sinks.

    LTTB is genuinely imperative (each bucket's pick depends on the
    previous pick — a data-dependent sequential scan), so this is the
    documented applyInPandas (grouped-map Arrow) use case rather than a
    built-in-expression composition: one shuffle on *key*, then pure
    pandas per group; group state is that key's series.

    Deterministic: ties in triangle area keep the earliest point."""
    import numpy as np
    import pandas as pd

    out_schema = f"{key} long, {t_col} long, {v_col} double"

    def lttb(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values([t_col]).reset_index(drop=True)
        n = len(pdf)
        if n <= n_out:
            return pdf[[key, t_col, v_col]]
        t = pdf[t_col].to_numpy(dtype=np.float64)
        v = pdf[v_col].to_numpy(dtype=np.float64)
        # bucket boundaries over the n-2 interior points
        bounds = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
        picked = [0]
        prev = 0
        for i in range(n_out - 2):
            lo, hi = bounds[i], bounds[i + 1]
            nlo, nhi = (hi, n) if i == n_out - 3 else (hi, min(bounds[i + 2], n))
            avg_t, avg_v = t[nlo:nhi].mean(), v[nlo:nhi].mean()
            # triangle area vs previous pick and next bucket's centroid
            area = np.abs(
                (t[prev] - avg_t) * (v[lo:hi] - v[prev])
                - (t[prev] - t[lo:hi]) * (avg_v - v[prev])
            )
            prev = lo + int(np.argmax(area))  # argmax: first max on ties
            picked.append(prev)
        picked.append(n - 1)
        return pdf.iloc[picked][[key, t_col, v_col]]

    return df.select(key, t_col, v_col).groupBy(key).applyInPandas(lttb, out_schema)


def grouped_fit_pandas(
    df: DataFrame, group: str, x_col: str, y_col: str
) -> DataFrame:
    """Per-group OLS fit via applyInPandas — the grouped-map twin of
    stats.grouped_regression, same integer-exact closed form (Python
    ints are arbitrary precision, so the sums are exact like the
    decimal path) — proving the Arrow grouped-map surface produces
    bit-identical numbers to the declarative plan and the SQL oracle.

    Use the declarative form in production (JVM-side, no Python);
    this form is the template for fits Catalyst CAN'T express
    (scipy optimizers, sklearn per-group models)."""
    import pandas as pd

    out_schema = f"{group} string, n long, slope double, intercept double, r2 double"

    def fit(pdf: "pd.DataFrame") -> "pd.DataFrame":
        xs = [int(x) for x in pdf[x_col]]
        ys = [int(y) for y in pdf[y_col]]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx = sum(a * a for a in xs)
        syy = sum(b * b for b in ys)
        nf, sxf, syf = float(n), float(sx), float(sy)
        var_x = nf * float(sxx) - sxf * sxf
        var_y = nf * float(syy) - syf * syf
        cov_n = nf * float(sxy) - sxf * syf
        slope = cov_n / var_x if var_x != 0 else None
        intercept = (syf - slope * sxf) / nf if slope is not None else None
        r2 = (cov_n * cov_n) / (var_x * var_y) if var_x != 0 and var_y != 0 else None
        return pd.DataFrame(
            [{group: pdf[group].iloc[0], "n": n, "slope": slope,
              "intercept": intercept, "r2": r2}]
        )

    return df.groupBy(group).applyInPandas(fit, out_schema)
