"""Global total-order operators that avoid the single-partition window:
distributed global rank and exact-quantile bucketing.

The naive ``row_number() OVER (ORDER BY ...)`` forces every row through
ONE task — the classic scale-killer for "assign a stable global ordinal"
jobs (corpus sharding, deterministic pagination, priority sampling).
``global_rank`` instead uses the two-pass range-partition scheme
(TeraSort's numbering step):

1. ``repartitionByRange`` on the order keys (sampled range exchange —
   parallel), then ``sortWithinPartitions`` (local sort, no exchange);
2. an Arrow-batched ``mapInPandas`` stamps each row with its partition
   id and LOCAL ordinal (a running counter over the partition's batches
   — batches arrive in partition sort order);
3. per-partition row counts (a partition-count-sized aggregate) turn
   into exclusive prefix offsets via a window over that tiny table,
   broadcast-joined back: ``rank = offset + local ordinal``.

The only full-data movements are the range exchange and the local sort;
no task ever sees more than its partition.  ``quantile_buckets`` uses
exact interpolated percentiles (group-sized state) as thresholds and a
broadcast join for assignment — deciles/percentile-bands at corpus scale
with no global sort at all.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["global_rank", "quantile_buckets", "quantile_buckets_sql"]


def global_rank(
    df: DataFrame,
    order: list,
    out: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a 1-based global dense ordinal *out* following the total order
    of *order* (list of Columns or column-name strings; the caller must
    include a tiebreaker column so the order is total — otherwise ranks
    within a tie group are arbitrary-but-valid).

    Scale shape: range exchange + local sort + map-side stamping + a
    partition-count-sized offset join.  No single-partition stage."""
    import pandas as pd  # noqa: F401  (worker-side dependency, fail fast)

    cols = [F.col(c) if isinstance(c, str) else c for c in order]
    n_parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n_parts, *cols).sortWithinPartitions(*cols)

    fields = ranged.schema.fields
    out_schema = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in fields)
        + ", _pid int, _ord long"
    )

    def stamp(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seen = 0
        for b in batches:
            b = b.copy()
            b["_pid"] = pid
            b["_ord"] = range(seen, seen + len(b))
            seen += len(b)
            yield b

    # persisted (managed, r13): TWO consumers read the stamped frame —
    # the per-partition counts and the final offset join — and the
    # subtree above it is an opaque mapInPandas, so each consumer
    # otherwise re-runs the range-exchange read, the local sort AND a
    # full second pass of every row through the Python workers
    # (measured: two equal 6.2 s task-time stages at sf0.1; the guide
    # §4 boundary tax paid twice). The stamped rows are the input plus
    # two small ints, so the cache is input-sized; both consumers and
    # the recompute-vs-cache trade differ from the winnow case (q150)
    # exactly because the duplicated work here crosses the Python
    # boundary instead of staying in codegen.
    from ..utils.caching import managed_persist

    stamped = managed_persist(ranged.mapInPandas(stamp, schema=out_schema))
    counts = stamped.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_n").over(off_w), F.lit(0))
    ).select("_pid", "_off")
    return (
        stamped.join(F.broadcast(offsets), "_pid")
        .withColumn(out, (F.col("_off") + F.col("_ord") + 1).cast("long"))
        .drop("_pid", "_ord", "_off")
    )


def quantile_buckets(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 10,
    out: str = "bucket",
) -> DataFrame:
    """Assign each row a 1-based quantile bucket by exact interpolated
    percentile thresholds of *value_col* (integer column).

    bucket(x) = 1 + #{thresholds t_i : x > t_i},  t_i = percentile(i/n)

    This is NOT ntile (which splits tie runs by row position — an order-
    dependent, engine-divergent rule); threshold bucketing maps equal
    values to equal buckets, which is what corpus-quality banding needs,
    and is bit-deterministic: exact percentiles over integers are exact
    multiples of 1/n_buckets.

    Scale shape: one percentile aggregation (group-sized state via a
    single-row reduce), thresholds broadcast as a literal comparison
    chain — assignment is pure map-side codegen, no sort anywhere."""
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    row = df.select(
        F.expr(
            f"percentile({value_col}, array({', '.join(str(f) for f in fracs)}))"
        ).alias("_ts")
    ).collect()[0]
    thresholds = list(row["_ts"])
    bucket = F.lit(1)
    for t in thresholds:
        bucket = bucket + F.when(F.col(value_col) > F.lit(t), 1).otherwise(0)
    return df.withColumn(out, bucket.cast("int"))


def quantile_buckets_sql(
    source_sql: str, value_expr: str, n_buckets: int = 10
) -> str:
    """DuckDB twin of :func:`quantile_buckets`: *source_sql* is a SELECT
    producing the input rows; returns a SELECT of those rows plus
    ``bucket``.  quantile_cont is the same interpolated definition as
    Spark's percentile."""
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    frac_list = ", ".join(str(f) for f in fracs)
    terms = " + ".join(
        f"(CASE WHEN {value_expr} > _t.ts[{i + 1}] THEN 1 ELSE 0 END)"
        for i in range(len(fracs))
    )
    return f"""
    WITH _src AS ({source_sql})
    SELECT _src.*, cast(1 + {terms} as int) AS bucket
    FROM _src CROSS JOIN
         (SELECT quantile_cont({value_expr}, [{frac_list}]) AS ts
          FROM _src) _t
    """
