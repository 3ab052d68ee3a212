"""Similarity search over embedding columns (array<float>).

Engine extension (north star): brute-force cosine top-k as the exact
baseline, plus a random-hyperplane LSH bucketed variant as the scale path.

Scale design (100 TB): brute-force is a single map-side pass (score every
vector against the broadcast query vector) followed by a top-k — Spark's
``orderBy().limit(k)`` compiles to TakeOrderedAndProject, which keeps only
k rows per partition and merges on the driver: no global sort, no shuffle
of the full corpus. The LSH variant cuts the scan itself: vectors are
bucketed by hyperplane sign bits at write time; a query probes only its own
bucket (and optionally neighboring buckets), turning an O(N) scan into
O(N / 2^bits) with a partition-pruned read when the table is written
partitioned by bucket.

All arithmetic is element-wise double multiply + sequential sum via
``aggregate``/``zip_with`` (built-in, codegen'd; identical evaluation order
in DuckDB's ``list_sum``/``list_transform`` makes it oracle-exact).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: deterministic pseudo-random hyperplane seeds (no RNG at plan time)
HYPERPLANE_SEEDS = tuple(range(1, 9))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def dot_sql(a: str, b: str) -> str:
    return (
        f"coalesce(list_sum(list_transform(list_zip({a}, {b}), "
        f"p -> p[1]::DOUBLE * p[2]::DOUBLE))::DOUBLE, 0.0)"
    )


def norm_sql(a: str) -> str:
    return f"sqrt(coalesce(list_sum(list_transform({a}, x -> x::DOUBLE * x::DOUBLE))::DOUBLE, 0.0))"


def cosine_sql(a: str, b: str) -> str:
    return (
        f"CASE WHEN {norm_sql(a)} * {norm_sql(b)} > 0 "
        f"THEN {dot_sql(a, b)} / ({norm_sql(a)} * {norm_sql(b)}) ELSE 0.0 END"
    )


def brute_force_topk(
    df: DataFrame,
    query_vec: Column,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a single query vector.

    Compiles to a map-side score + TakeOrderedAndProject — the right
    physical plan at any corpus size for single-query top-k."""
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), query_vec), 6).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)


def hyperplane_bits(vec: Column, dim: int, seeds=HYPERPLANE_SEEDS) -> Column:
    """Sign-bit bucket id from deterministic pseudo-hyperplanes.

    Hyperplane s has component c_j = hash60(s:j) mod 2001 - 1000 (a fixed
    pseudo-random integer in [-1000, 1000]); bit_s = [v · h_s > 0]. Same
    construction is reproducible in any engine (md5-based)."""
    from .dedup import hash60

    def plane_component(seed):
        return lambda j: (
            hash60(F.concat_ws(":", F.lit(str(seed)), j.cast("string"))) % 2001 - 1000
        ).cast("double")

    bucket = F.lit(0).cast("long")
    for si, seed in enumerate(seeds):
        comp = F.sequence(F.lit(0), F.lit(dim - 1))
        plane = F.transform(comp, plane_component(seed))
        proj = F.aggregate(
            F.zip_with(vec, plane, lambda x, h: x.cast("double") * h),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << si)).otherwise(F.lit(0)).cast("long")
    return bucket


def ann_lsh_topk(
    df: DataFrame,
    query_vec_row: list[float],
    dim: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's hyperplane
    bucket. At scale the table is stored partitioned by `bucket` so this
    becomes a partition-pruned read of ~1/2^bits of the data."""
    lit_q = F.array(*[F.lit(float(v)) for v in query_vec_row])
    bucketed = df.withColumn("bucket", hyperplane_bits(F.col(vec_col), dim))
    qdf = df.sparkSession.range(1).select(hyperplane_bits(lit_q, dim).alias("qbucket"))
    qbucket = qdf.head()[0]
    cand = bucketed.filter(F.col("bucket") == F.lit(qbucket))
    return brute_force_topk(cand, lit_q, k, id_col, vec_col)
