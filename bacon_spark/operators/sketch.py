"""Bounded-state cardinality / similarity sketches (HyperLogLog, KMV).

Complements the Count-Min heavy-hitter prefilter (gate q140): where CM
bounds *frequency* state, these bound *distinct-count* state. At 100 TB a
`COUNT(DISTINCT x)` over a high-cardinality column (n-gram vocabulary,
user ids, URLs) shuffles every distinct value; an HLL register array is
m = 2^p cells no matter the input size, and a KMV synopsis is k values.
Both reduce the shuffle to a constant-size partial-aggregate — the only
plan shape that survives the scale-up.

Unlike `approx_count_distinct` (whose xxHash64-based registers DuckDB
cannot reproduce), every sketch here is built from the shared 60-bit md5
hash (`llm/dedup.hash60` — identical SQL on both engines) with all
register math in exact integer arithmetic:

* HLL: bucket = h mod 2^p; the remaining 60-p bits w give the register
  value rho = (60-p) - bitlength(w) + 1 (bitlength via `length(bin(w))`,
  identical in Spark and DuckDB). The harmonic sum Σ 2^-M_j is kept as the
  exact BIGINT Σ 2^(R-M_j) at scale R = 60-p+1 (max 2^p · 2^R ≤ 2^62, no
  overflow), so the only float ops are the final alpha·m²·2^R / S division
  and the small-range `ln` correction — both verified bit-identical across
  Spark / DuckDB / CPython on this platform, and rounded to 6 digits
  before comparison anyway.
* KMV: the k smallest *distinct* hashes; estimate (k-1)·2^60 / h_(k).
  Integer until the single final division. The same k-min synopsis of a
  union estimates Jaccard overlap between two corpora: |kmin(A∪B) ∩ A ∩ B|
  / k (Beyer et al., "On Synopses for Distinct-Value Estimation Under
  Multiset Operations", SIGMOD'07).

Scale shapes:

* `hll_registers` is a two-level aggregate: partial max(rho) per
  (group, bucket) map-side, then a shuffle of at most |groups|·2^p tiny
  rows. Registers MERGE by max — `hll_merge` computes a global estimate
  from per-group register frames without touching the raw data again
  (the re-aggregation property that makes HLL a lattice/rollup citizen).
* `kmv_synopsis` dedups per partition and keeps k minima there
  (`mapInPandas`, bounded memory), so the global top-k sees at most
  k · n_partitions candidate rows instead of the full distinct set.

Reference analogue: none — the reference (GambitResearch/bacon) has no
approximate aggregates; this is scale surface mandated by the brief.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llm.dedup import hash60, hash60_sql

#: default HLL precision: m = 2^12 = 4096 registers, ~1.6% standard error
DEFAULT_P = 12


def _alpha_expr(m: int) -> str:
    """The HLL bias constant alpha_m as an expression string evaluated
    identically (same literals, same op order) on both engines."""
    # float literals are wrapped in cast(.. as double): DuckDB parses a
    # bare 0.7213 as DECIMAL(5,4) and would divide in decimal, drifting
    # from Spark's double math by an ulp (observed at the gate)
    if m >= 128:
        return f"(cast(0.7213 as double) / (cast(1.0 as double) + cast(1.079 as double) / {m}))"
    # small-m constants from Flajolet et al. §4; not used by the defaults
    return {16: "0.673", 32: "0.697", 64: "0.709"}[m]


def hll_registers(
    df: DataFrame, value: str, groups: Sequence[str] = (), p: int = DEFAULT_P
) -> DataFrame:
    """Per-group HLL register frame: one row per (groups..., bucket) with
    the max rank rho. This is the mergeable sketch state — at most 2^p
    rows per group regardless of input size, built with map-side partial
    aggregation (the shuffle moves registers, not values)."""
    m = 1 << p
    width = 60 - p  # bits left after the bucket index
    h = hash60(F.col(value).cast("string"))
    w = F.shiftright(h, p)
    rho = F.when(w == 0, F.lit(width + 1)).otherwise(
        F.lit(width) - F.length(F.bin(w)) + F.lit(1)
    )
    return (
        df.where(F.col(value).isNotNull())  # distinct-count semantics skip nulls
        .select(*groups, (h % m).alias("bucket"), rho.alias("rho"))
        .groupBy(*groups, "bucket")
        .agg(F.max("rho").alias("reg"))
    )


def hll_estimate(reg: DataFrame, groups: Sequence[str] = (), p: int = DEFAULT_P) -> DataFrame:
    """Estimate per group from a register frame. Harmonic sum in exact
    BIGINT at scale 2^R (R = 60-p+1); empty registers contribute 2^R
    each. Small-range correction: linear counting m·ln(m/V) when the raw
    estimate ≤ 2.5m and V > 0 empty registers remain."""
    m = 1 << p
    r = 60 - p + 1
    scale = 1 << r
    terms = reg.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("b_used"),
        F.sum(F.expr(f"shiftleft(1L, {r} - reg)")).alias("s_used"),
    )
    s_total = F.col("s_used") + (F.lit(m) - F.col("b_used")) * F.lit(scale)
    raw = F.expr(_alpha_expr(m)) * m * m * scale / s_total
    v_empty = F.lit(m) - F.col("b_used")
    est = F.when(
        (raw <= 2.5 * m) & (v_empty > 0), F.lit(float(m)) * F.log(F.lit(float(m)) / v_empty)
    ).otherwise(raw)
    return terms.select(
        *groups,
        F.col("b_used").alias("buckets_used"),
        F.round(est, 4).alias("hll_estimate"),
    )


def hll_merge(reg: DataFrame, p: int = DEFAULT_P) -> DataFrame:
    """Merge a grouped register frame into ONE global register set (max
    per bucket) and estimate from it — no rescan of the raw data. The
    merged estimate is exactly what a single global HLL would have
    produced (max is associative/commutative/idempotent)."""
    merged = reg.groupBy("bucket").agg(F.max("reg").alias("reg"))
    return hll_estimate(merged, (), p)


def hll_registers_sql(table_expr: str, value_expr: str, groups: str = "", p: int = DEFAULT_P) -> str:
    """DuckDB form of :func:`hll_registers` (oracle building block).
    `groups` is a comma-led column list prefix, e.g. ``"source, "``."""
    m = 1 << p
    width = 60 - p
    h = hash60_sql(f"cast({value_expr} as varchar)")
    gsel = f"{groups.strip().rstrip(',')}, " if groups.strip() else ""
    return f"""
      SELECT {gsel}({h}) % {m} AS bucket,
             max(CASE WHEN ({h}) // {m} = 0 THEN {width + 1}
                      ELSE {width} - length(bin(({h}) // {m})) + 1 END) AS reg
      FROM {table_expr}
      WHERE ({value_expr}) IS NOT NULL
      GROUP BY ALL
    """


def hll_estimate_sql(reg_cte: str, groups: str = "", p: int = DEFAULT_P) -> str:
    """DuckDB form of :func:`hll_estimate` over a register CTE."""
    m = 1 << p
    r = 60 - p + 1
    scale = 1 << r
    gsel = f"{groups.strip().rstrip(',')}, " if groups.strip() else ""
    gby = "GROUP BY ALL" if groups.strip() else ""
    return f"""
      SELECT {gsel}b_used AS buckets_used,
             round(CASE WHEN ({_alpha_expr(m)} * {m} * {m} * {scale} / s_total) <= 2.5 * {m}
                         AND ({m} - b_used) > 0
                        THEN cast({m} as double) * ln(cast({m} as double) / ({m} - b_used))
                        ELSE {_alpha_expr(m)} * {m} * {m} * {scale} / s_total END,
                   4) AS hll_estimate
      FROM (
        SELECT {gsel}count(*) AS b_used,
               cast(sum(1::BIGINT << ({r} - reg)) as bigint)
                 + ({m} - count(*)) * {scale}::BIGINT AS s_total
        FROM {reg_cte}
        {gby}
      )
    """


# ---------------------------------------------------------------------------
# KMV (k minimum values)
# ---------------------------------------------------------------------------


def kmv_from_hashes(hdf: DataFrame, k: int = 256) -> DataFrame:
    """The k smallest distinct values of an `h` (long) column, computed
    with bounded memory: each partition dedups and keeps its own k minima
    (Arrow batch iterator, never materializing the partition), so the
    global exact top-k (TakeOrderedAndProject) sees ≤ k·n_partitions rows.
    Returns a frame with a single `h` column, ≤ k rows."""

    def kmin(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        best: pd.Series | None = None
        for b in batches:
            cand = b["h"] if best is None else pd.concat([best, b["h"]])
            best = cand.drop_duplicates().nsmallest(k)
        if best is not None:
            yield best.to_frame()

    partial = hdf.select("h").mapInPandas(kmin, schema="h long")
    return partial.distinct().orderBy("h").limit(k)


def kmv_synopsis(df: DataFrame, value: str, k: int = 256) -> DataFrame:
    """:func:`kmv_from_hashes` over the shared 60-bit hash of `value`.
    NULLs are excluded explicitly (distinct-count semantics, matching
    hll_registers) — relying on hash-of-null propagating is engine-
    dependent: DuckDB's DISTINCT would admit the NULL hash row when fewer
    than k distinct values exist and over-count by one."""
    return kmv_from_hashes(
        df.where(F.col(value).isNotNull()).select(
            hash60(F.col(value).cast("string")).alias("h")
        ),
        k,
    )


def kmv_estimate(syn: DataFrame, k: int = 256) -> DataFrame:
    """Distinct-count estimate (k-1)·2^60 / h_(k) from a synopsis frame.
    If fewer than k distinct values exist the synopsis IS the distinct
    set and the exact count is returned instead."""
    agg = syn.agg(F.count(F.lit(1)).alias("n"), F.max("h").alias("hk"))
    est = F.when(
        F.col("n") < k, F.col("n").cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(float(1 << 60)) / F.col("hk"))
    return agg.select(F.round(est, 4).alias("kmv_estimate"))


def kmv_synopsis_sql(table_expr: str, value_expr: str, k: int = 256) -> str:
    """DuckDB form of :func:`kmv_synopsis`."""
    h = hash60_sql(f"cast({value_expr} as varchar)")
    return f"""
      SELECT DISTINCT ({h}) AS h FROM {table_expr}
      WHERE ({value_expr}) IS NOT NULL
      ORDER BY 1 LIMIT {k}
    """


def ams_f2(df: DataFrame, value: str, d: int = 64, salt: str = "ams") -> DataFrame:
    """AMS second-frequency-moment sketch (Alon-Matias-Szegedy, STOC'96):
    estimates F2 = sum over keys of frequency^2 — the SELF-JOIN SIZE of
    the column, the quantity that decides whether a join key needs
    salting (operators/scale.py) — in ONE map-side pass with d counters,
    no groupBy on the key.

    Z_j = sum over rows of sign_j(v), sign_j in {-1,+1} taken from bit
    (j mod 30) of the 60-bit md5 hash of ('{salt}{j//30}:' || v); the
    estimator is mean(Z_j^2). Everything is exact integer arithmetic
    (sums of +-1, squares, one final division by d), so the estimate is
    bit-identical across engines and partitionings, and the Z_j sums
    merge by ADDITION — partial aggregation applies and per-shard
    sketches re-aggregate to global for free.

    Returns one row: f2_estimate (double). Relative std error ~
    sqrt(2/d) (~18% at d=64); use the estimate for order-of-magnitude
    skew decisions, not accounting."""
    nh = (d + 29) // 30  # 30 usable sign bits per 60-bit hash
    base = df.where(F.col(value).isNotNull()).select(
        *[
            hash60(F.concat(F.lit(f"{salt}{i}:"), F.col(value).cast("string"))).alias(
                f"_h{i}"
            )
            for i in range(nh)
        ]
    )
    # one-parse fragments (r13): the d sum columns + d-term square fold
    # were ~5d py4j round-trips of Column building (~0.5 s of driver
    # time per sketch at d=64); the parsed SQL is the identical tree —
    # same shiftright/%/*2-1 ops, same left-assoc fold, same int->double
    # division — so estimates stay bit-identical (tests/test_sketch.py).
    zs = ",".join(
        f"'z{j}', sum((shiftright(_h{j // 30}, {j % 30}) % 2) * 2 - 1)"
        for j in range(d)
    )
    z = base.agg(F.expr(f"named_struct({zs})").alias("_z"))
    sq = " + ".join(f"(_z.z{j} * _z.z{j})" for j in range(d))
    return z.select(
        F.expr(f"(CAST(0 AS BIGINT) + {sq}) / {d}").alias("f2_estimate")
    )


def ams_f2_sql(table_expr: str, value_expr: str, d: int = 64, salt: str = "ams") -> str:
    """DuckDB form of :func:`ams_f2` (identical hash, bit and op order)."""
    nh = (d + 29) // 30
    hs = ", ".join(
        f"{hash60_sql(f'{chr(39)}{salt}{i}:{chr(39)} || cast({value_expr} as varchar)')} AS _h{i}"
        for i in range(nh)
    )
    zs = ", ".join(
        f"sum((_h{j // 30} >> {j % 30}) % 2 * 2 - 1) AS z{j}" for j in range(d)
    )
    sq = " + ".join(f"z{j} * z{j}" for j in range(d))
    return f"""
      SELECT (0 + {sq}) / {d} AS f2_estimate
      FROM (SELECT {zs}
            FROM (SELECT {hs} FROM {table_expr}
                  WHERE ({value_expr}) IS NOT NULL))
    """


def kmv_estimate_sql(syn_cte: str, k: int = 256) -> str:
    """DuckDB form of :func:`kmv_estimate` (same literals, same op order,
    so the one float division is bit-identical)."""
    return f"""
      SELECT round(CASE WHEN count(*) < {k} THEN count(*)::DOUBLE
                        ELSE {float(k - 1)} * {float(1 << 60)} / max(h) END,
                   4) AS kmv_estimate
      FROM {syn_cte}
    """


# ---------------------------------------------------------------------------
# Log-bucketed histogram sketch (HDR-histogram-shaped, integer-exact)
# ---------------------------------------------------------------------------

#: sub-buckets per power-of-two octave: 8 -> worst-case relative bucket
#: width 12.5%, <= 16 + 8*59 = 488 buckets over the full bigint range
HIST_SUB = 8


def hist_bucket(v):
    """Bucket id for a non-negative integer metric, HDR-histogram style:
    values < 16 get exact unit buckets; above that, 8 sub-buckets per
    power-of-two octave (worst-case 12.5% relative width). Pure integer
    arithmetic — bit length via ``length(bin(v))`` and a right shift,
    both of which evaluate identically on Spark and DuckDB (the same
    trick HLL's rho uses above), so bucket ids are cross-engine exact."""
    b = F.length(F.bin(v))  # bit length of v (v >= 1)
    # call_function: the SQL shiftright accepts a COLUMN shift amount,
    # which the typed F.shiftright wrapper (int-literal only) does not
    shifted = F.call_function("shiftright", v, (b - 4).cast("int"))
    return F.when(v < 16, v.cast("long")).otherwise(
        (16 + (b - 5) * 8 + (shifted - 8)).cast("long")
    )


def hist_bucket_sql(expr: str) -> str:
    """DuckDB twin of :func:`hist_bucket` (same shifts, same bin trick)."""
    b = f"length(bin({expr}))"
    return (
        f"CASE WHEN ({expr}) < 16 THEN cast(({expr}) as bigint) "
        f"ELSE cast(16 + ({b} - 5) * 8 + ((({expr}) >> ({b} - 4)) - 8) as bigint) END"
    )


def hist_lower(bucket):
    """Lower bound (the deterministic representative value) of a bucket:
    exact for unit buckets, ``(8 + sub) << (octave + 1)`` above. Every
    value in the bucket is >= this and < 112.5% of it."""
    o = F.floor((bucket - 16) / 8).cast("int")
    m = (bucket - 16) % 8
    return F.when(bucket < 16, bucket.cast("long")).otherwise(
        F.call_function("shiftleft", (8 + m).cast("long"), o + 1)
    )


def hist_lower_sql(expr: str) -> str:
    """DuckDB twin of :func:`hist_lower`."""
    return (
        f"CASE WHEN ({expr}) < 16 THEN cast(({expr}) as bigint) "
        f"ELSE cast((8 + (({expr}) - 16) % 8) as bigint) << ((({expr}) - 16) // 8 + 1) END"
    )


def hist_bucket_spark_sql(expr: str) -> str:
    """Spark-SQL dialect twin of :func:`hist_bucket_sql` (named
    shiftright — Spark's SQL function accepts a column shift amount;
    DuckDB's ``>>`` / ``//`` spellings don't parse in Spark)."""
    b = f"length(bin({expr}))"
    return (
        f"CASE WHEN ({expr}) < 16 THEN cast(({expr}) as bigint) "
        f"ELSE cast(16 + ({b} - 5) * 8 + "
        f"(shiftright({expr}, cast({b} - 4 as int)) - 8) as bigint) END"
    )


def hist_lower_spark_sql(expr: str) -> str:
    """Spark-SQL dialect twin of :func:`hist_lower_sql`."""
    return (
        f"CASE WHEN ({expr}) < 16 THEN cast(({expr}) as bigint) "
        f"ELSE shiftleft(cast(8 + (({expr}) - 16) % 8 as bigint), "
        f"cast((({expr}) - 16) div 8 + 1 as int)) END"
    )


def hist_lower_of_value_spark_sql(expr: str) -> str:
    """``hist_lower(hist_bucket(v))`` as one Spark-SQL expression — the
    deterministic bucket representative of a raw value (monotone
    non-decreasing in v, which is what lets SketchPercentile's pushdown
    SQL reproduce the engine estimate via an exact-rank selection)."""
    return hist_lower_spark_sql(hist_bucket_spark_sql(expr))


def hist_sketch(df: DataFrame, value: str, groups: Sequence[str] = ()) -> DataFrame:
    """Mergeable quantile/distribution sketch: per-(groups, bucket) row
    counts over :func:`hist_bucket`. State is <= |groups| * 488 rows no
    matter the input size — the constant-size partial aggregate that
    replaces a full sort/percentile shuffle at 100 TB — and sketches
    MERGE BY ADDITION (sum counts per bucket), so per-source histograms
    roll up to a global one without rescanning the data. Nulls and
    negatives are excluded (the metrics this serves — token counts,
    byte sizes, latencies — are non-negative by construction)."""
    v = F.col(value)
    return (
        df.where(v.isNotNull() & (v >= 0))
        .select(*groups, hist_bucket(v).alias("bucket"))
        .groupBy(*groups, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_sketch_sql(table_expr: str, value_expr: str, groups: str = "") -> str:
    """DuckDB twin of :func:`hist_sketch`; *groups* is a 'col, ' prefix."""
    return f"""
      SELECT {groups}{hist_bucket_sql(value_expr)} AS bucket,
             count(*)::BIGINT AS cnt
      FROM {table_expr}
      WHERE ({value_expr}) IS NOT NULL AND ({value_expr}) >= 0
      GROUP BY ALL
    """


def hist_quantiles(
    hist: DataFrame, pcts: Sequence[int] = (50, 90, 99), groups: Sequence[str] = ()
) -> DataFrame:
    """Type-1 (lower) quantile estimates from a histogram sketch: for
    each integer percentile p, the :func:`hist_lower` bound of the first
    bucket whose cumulative count reaches rank ceil(p*n/100). All
    integer arithmetic (the rank is ``(p*n + 99) div 100``), so the
    estimates hash-match DuckDB's replay exactly. Estimate error is the
    bucket width: q_est <= true quantile < 1.125 * q_est above 16."""
    from pyspark.sql.window import Window

    w_cum = (
        Window.partitionBy(*groups)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*groups)
    cum = hist.select(
        *groups,
        "bucket",
        F.sum("cnt").over(w_cum).alias("_cum"),
        F.sum("cnt").over(w_all).alias("_n"),
    )
    out = None
    for p in pcts:
        rank = F.expr(f"({int(p)} * _n + 99) div 100")
        sel = (
            cum.where(F.col("_cum") >= rank)
            .groupBy(*groups)
            .agg(F.min("bucket").alias("_b"))
            .select(
                *groups,
                F.lit(int(p)).cast("int").alias("pct"),
                hist_lower(F.col("_b")).alias("q_est"),
            )
        )
        out = sel if out is None else out.unionByName(sel)
    return out


def hist_quantiles_sql(
    hist_cte: str, pcts: Sequence[int] = (50, 90, 99), groups: str = ""
) -> str:
    """DuckDB twin of :func:`hist_quantiles`; *groups* is a 'col, ' prefix."""
    gcols = [g.strip() for g in groups.split(",") if g.strip()]
    part = f"PARTITION BY {', '.join(gcols)} " if gcols else ""
    gsel = "".join(f"{g}, " for g in gcols)
    cum = f"""
        SELECT {gsel}bucket,
               sum(cnt) OVER ({part}ORDER BY bucket) AS _cum,
               sum(cnt) OVER ({part.rstrip()}) AS _n
        FROM {hist_cte}
    """
    return " UNION ALL ".join(
        f"""
        SELECT {gsel}cast({int(p)} as int) AS pct,
               {hist_lower_sql("min(bucket)")} AS q_est
        FROM ({cum}) AS _c{int(p)}
        WHERE _cum >= ({int(p)} * _n + 99) // 100
        {"GROUP BY " + ", ".join(gcols) if gcols else ""}
        """
        for p in pcts
    )
