"""Deterministic distributed k-means over embedding columns — the
clustering stage of SemDeDup-style semantic dedup (cluster first, then
dedup WITHIN clusters, so the near-dup search never compares across
clusters; Abbas et al. 2023, public preprint).

Engine extension (no reference analogue — the reference has no vector
surface). Everything is constructed for cross-engine bit-equality so the
DuckDB oracle can replay it:

* seeding: the k vectors with the smallest (md5 draw, id) — no RNG;
* assignment: argmin of squared L2 distance, rounded to 6 dp with the
  centroid index as tie-break (the repo's proven cosine-oracle pattern);
* centroid update: per-component DECIMAL-exact sums divided as doubles —
  summation-order-independent, so distributed recompute matches the
  oracle's single-threaded one bit-for-bit.

Scale shape (the reason k-means is THE semantic-dedup clusterer at
100 TB): per Lloyd step, assignment is MAP-SIDE (k x dim centroid
literals folded into whole-stage codegen — no broadcast join, no
shuffle) and the update is ONE groupBy(cluster, component) shuffle whose
output is k*dim rows, independent of corpus size. Driver state is the
k x dim centroid matrix (bounded); the corpus is never collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.exprs import darr, sfrag
from ..operators.sampling import _draw, draw_sql

#: decimal scale for the exact component sums in the centroid update
_DEC = "decimal(38,12)"


def _d2_frag(vec: str, cent: list[float]) -> str:
    """Spark-SQL fragment of :func:`_d2` — identical tree, parsed in one
    py4j round-trip (a k×dim literal matrix built per-F.lit cost ~1 s of
    driver time per Lloyd step pre-r13)."""
    return (
        f"aggregate(zip_with({vec}, {darr(cent)}, (a, b) -> (a - b) * (a - b)), "
        f"0.0D, (acc, x) -> acc + x)"
    )


def _d2(vec, cent: list[float]):
    """Squared L2 distance between an array<double> column and a literal
    centroid, folded left-to-right (matches DuckDB's list_sum order)."""
    fv = sfrag(vec)
    if fv is not None:
        return F.expr(_d2_frag(fv, cent))
    c = F.array(*[F.lit(float(x)) for x in cent])
    return F.aggregate(
        F.zip_with(vec, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign(vec, cents: list[tuple[int, list[float]]]):
    """argmin_ci round(d2, 6), ties to the smallest centroid index."""
    fv = sfrag(vec)
    if fv is not None:
        structs = ",".join(
            f"struct(round({_d2_frag(fv, c)}, 6) AS d, {int(ci)} AS ci)"
            for ci, c in cents
        )
        return F.expr(f"array_min(array({structs})).ci")
    structs = [
        F.struct(F.round(_d2(vec, c), 6).alias("d"), F.lit(ci).alias("ci"))
        for ci, c in cents
    ]
    return F.array_min(F.array(*structs))["ci"]


#: above this many centroid floats (k x dim summed over all centroids),
#: assignment stops folding the centroids into the plan as literals and
#: carries them as DATA in a single-row broadcast frame instead. The
#: literal path is the right call at gate sizes (k=8-16: whole-stage
#: codegen, zero joins, zero broadcasts) but folds k*dim doubles into the
#: expression tree — at SemDeDup-production k (1e4-1e5 clusters) that is
#: a multi-MB plan and a codegen blowup. The broadcast path costs one
#: BroadcastNestedLoopJoin against a ONE-ROW frame (cheaper than the
#: groupBy-argmin alternative, which would shuffle the corpus) and keeps
#: the identical rounded-argmin float sequence, so results are
#: bit-identical either way. Threshold documented in SCALE.md.
LITERAL_ASSIGN_FLOATS = 10_000


def _assign_dyn(vec, cents_col):
    """:func:`_assign` against a COLUMN of (ci, c) structs instead of
    plan literals — same zip_with/aggregate left fold, same round(·,6),
    same min-struct tie-break, so the result is bit-identical."""
    return F.array_min(
        F.transform(
            cents_col,
            lambda s: F.struct(
                F.round(
                    F.aggregate(
                        F.zip_with(vec, s["c"], lambda a, b: (a - b) * (a - b)),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ),
                    6,
                ).alias("d"),
                s["ci"].alias("ci"),
            ),
        )
    )["ci"]


def centroid_frame(spark, cents: list[tuple[int, list[float]]]) -> DataFrame:
    """The centroid model as a ONE-ROW DataFrame (array of (ci, c)
    structs) — broadcast-join fodder for :func:`assign_column`'s
    above-threshold path."""
    payload = [[(int(ci), [float(x) for x in c]) for ci, c in cents]]
    return spark.createDataFrame(
        [payload], "_cents array<struct<ci:int,c:array<double>>>"
    )


def assign_column(
    df: DataFrame,
    cents: list[tuple[int, list[float]]],
    vec,
    out: str,
    threshold: int = LITERAL_ASSIGN_FLOATS,
) -> DataFrame:
    """*df* plus column *out* = deterministic nearest-centroid index.

    Below *threshold* total centroid floats: literal-codegen `_assign`
    (zero joins). Above: the centroids ride as data in a single-row
    broadcast frame and the identical expression runs against the joined
    column — plan size and codegen stay O(1) in k while the per-row work
    is unchanged. Results are bit-identical on both paths (equivalence
    is pinned by tests/test_clustering.py at k=64)."""
    n_floats = sum(len(c) for _, c in cents)
    if n_floats <= threshold:
        return df.withColumn(out, _assign(vec, cents))
    joined = df.crossJoin(F.broadcast(centroid_frame(df.sparkSession, cents)))
    return joined.withColumn(out, _assign_dyn(vec, F.col("_cents"))).drop("_cents")


def seed_centroids(
    df: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding",
    salt: str = "km",
) -> list[tuple[int, list[float]]]:
    """The k vectors with the smallest (md5 draw, id), as (index, vector).
    A TakeOrderedAndProject of k rows — no full sort, no RNG."""
    rows = (
        df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy(_draw(F.col(id_col), salt), F.col(id_col))
        .limit(k)
        .collect()
    )
    return [(i, list(r["v"])) for i, r in enumerate(rows)]


def kmeans_centroids(
    df: DataFrame,
    k: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "km",
    assign_threshold: int = LITERAL_ASSIGN_FLOATS,
) -> list[tuple[int, list[float]]]:
    """The (index, centroid) list after *iters* Lloyd updates from the
    md5-draw seeds — the trained model :func:`kmeans_assign` applies,
    exposed for compositions that need the centroids themselves (IVF-PQ
    residual encoding).

    Each update: map-side assignment against centroid literals, then one
    bounded groupBy(cluster, component) producing k*dim decimal-exact
    sums (collected — k*dim rows, corpus-size-independent). Empty
    clusters drop out of the update (both engines identically); indices
    are NOT renumbered, so labels stay stable across iterations."""
    vec = F.col(vec_col).cast("array<double>")
    cents = seed_centroids(df, k, id_col, vec_col, salt)
    for _ in range(iters):
        assigned = assign_column(
            df.select(F.col(id_col), vec.alias("_v")),
            cents,
            "_v",
            "_ci",
            assign_threshold,
        )
        sums = (
            assigned.select("_ci", F.posexplode("_v").alias("_j", "_x"))
            .groupBy("_ci", "_j")
            .agg(
                F.sum(F.col("_x").cast(_DEC)).alias("_s"),
                F.count(F.lit(1)).alias("_n"),
            )
            .collect()  # k*dim rows — bounded, corpus-size-independent
        )
        by_ci: dict[int, dict[int, float]] = {}
        n_ci: dict[int, int] = {}
        for r in sums:
            by_ci.setdefault(r["_ci"], {})[r["_j"]] = float(r["_s"])
            n_ci[r["_ci"]] = r["_n"]
        cents = [
            (ci, [comp[j] / n_ci[ci] for j in sorted(comp)])
            for ci, comp in sorted(by_ci.items())
        ]
    return cents


def kmeans_assign(
    df: DataFrame,
    k: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "km",
    include_vec: bool = False,
    assign_threshold: int = LITERAL_ASSIGN_FLOATS,
) -> DataFrame:
    """(id, cluster) under :func:`kmeans_centroids`'s model (plus the
    double-cast vector as ``_v`` when *include_vec* — the semantic-dedup
    composition needs it without a second corpus scan). Assignment is
    pure map-side codegen against the centroid literals below
    *assign_threshold* total centroid floats, a single-row broadcast
    centroid frame above it (see :func:`assign_column`)."""
    vec = F.col(vec_col).cast("array<double>")
    cents = kmeans_centroids(df, k, iters, id_col, vec_col, salt, assign_threshold)
    base = df.select(F.col(id_col), vec.alias("_v"))
    out = assign_column(base, cents, "_v", "cluster", assign_threshold)
    out = out.withColumn("cluster", F.col("cluster").cast("int"))
    cols = [id_col, "cluster"] + (["_v"] if include_vec else [])
    return out.select(*cols)


_D2_SQL = (
    "list_sum(list_transform(list_zip({v}, {c}), "
    "p -> (p[1]::DOUBLE - p[2]::DOUBLE) * (p[1]::DOUBLE - p[2]::DOUBLE)))"
)


def _kmeans_cte_sql(
    k: int, dim: int, id_col: str, vec_col: str, table: str, salt: str
) -> str:
    """Shared WITH-body ending in ``a1(id, v, cluster)`` — the iters=1
    assignment both oracle builders select from."""
    d2 = _D2_SQL
    return f"""seeds AS (
      SELECT row_number() OVER (ORDER BY {draw_sql(id_col, salt)}, {id_col}) - 1 AS ci,
             {vec_col} AS c
      FROM {table}
      ORDER BY {draw_sql(id_col, salt)}, {id_col}
      LIMIT {k}
    ),
    a0 AS (
      SELECT e.{id_col} AS id, e.{vec_col} AS v,
             (SELECT s.ci FROM seeds s
              ORDER BY round({d2.format(v=f'e.{vec_col}', c='s.c')}, 6), s.ci
              LIMIT 1) AS ci
      FROM {table} e
    ),
    upd AS (
      SELECT ci, j,
             sum((v[j]::DOUBLE)::DECIMAL(38,12))::DOUBLE / count(*) AS m
      FROM a0 CROSS JOIN range(1, {dim} + 1) t(j)
      GROUP BY ci, j
    ),
    c1 AS (
      SELECT ci, list(m ORDER BY j) AS c FROM upd GROUP BY ci
    ),
    a1 AS MATERIALIZED (
      SELECT e.{id_col} AS id, e.{vec_col} AS v,
             (SELECT c1.ci FROM c1
              ORDER BY round({d2.format(v=f'e.{vec_col}', c='c1.c')}, 6), c1.ci
              LIMIT 1)::INT AS cluster
      FROM {table} e
    )"""


def kmeans_assign_sql(
    k: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    table: str = "embeddings",
    salt: str = "km",
) -> str:
    """DuckDB twin of :func:`kmeans_assign` with iters=1: identical seeds,
    identical rounded-argmin assignment, identical decimal-exact update."""
    return f"""
    WITH {_kmeans_cte_sql(k, dim, id_col, vec_col, table, salt)}
    SELECT id AS {id_col}, cluster FROM a1 ORDER BY 1
    """


def semantic_dedup_stats(
    df: DataFrame,
    k: int = 8,
    threshold: float = 0.2,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "km",
) -> DataFrame:
    """SemDeDup: k-means cluster, then keep-one WITHIN each cluster for
    members whose exact cosine to the cluster's minimum-id hub clears
    *threshold*. Returns per-cluster accounting
    (cluster, n_vecs, n_removed, n_kept).

    The within-cluster graph is the HUB STAR (member -> cluster-min), the
    same linear-edge trade as embedding_dedup_scalable — but here the
    candidate set is the k-means cluster, not a hash bucket, so the
    search respects learned structure and never compares across clusters.
    Scale shape: assignment is map-side (see kmeans_assign); hubs are a
    k-row aggregate broadcast back; the verify is one map-side cosine per
    member. No corpus-sized shuffle beyond the assignment's k*dim update.
    The assignment frame is PERSISTED (managed — session owner releases
    via release_caches): three consumers read it (hub aggregate, hub
    vectors, the verify), and without the cache each re-scans the corpus
    and re-computes the k x dim argmin (plan-audited: 4 parquet scans
    pre-fix, 1 after).
    """
    from ..utils.caching import managed_persist
    from .similarity import cosine

    assigned = managed_persist(
        kmeans_assign(
            df, k=k, iters=iters, id_col=id_col, vec_col=vec_col, salt=salt,
            include_vec=True,
        )
    )
    hubs = assigned.groupBy("cluster").agg(F.min(id_col).alias("_hub"))
    hub_vecs = (
        assigned.join(F.broadcast(hubs), "cluster")
        .filter(F.col(id_col) == F.col("_hub"))
        .select("cluster", F.col("_v").alias("_hv"))
    )
    # the hub itself always survives: only NON-hub members can be removed
    flagged = (
        assigned.join(F.broadcast(hubs), "cluster")
        .join(F.broadcast(hub_vecs), "cluster")
        .select(
            "cluster",
            F.when(
                (F.col(id_col) != F.col("_hub"))
                & (F.round(cosine("_v", "_hv"), 6) >= threshold),
                1,
            ).otherwise(0).alias("_removed"),
        )
    )
    return (
        flagged.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("_removed").cast("bigint").alias("n_removed"),
            (F.count(F.lit(1)) - F.sum("_removed")).cast("bigint").alias("n_kept"),
        )
        .orderBy("cluster")
    )


def semantic_dedup_stats_sql(
    k: int = 8,
    dim: int = 64,
    threshold: float = 0.2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    table: str = "embeddings",
    salt: str = "km",
) -> str:
    """DuckDB twin of :func:`semantic_dedup_stats` (iters=1)."""
    from .similarity import cosine_sql

    return f"""
    WITH {_kmeans_cte_sql(k, dim, id_col, vec_col, table, salt)},
    hub AS (SELECT cluster, min(id) AS hub FROM a1 GROUP BY 1),
    hv AS (
      SELECT h.cluster, a.v AS hvec FROM hub h JOIN a1 a ON a.id = h.hub
    ),
    flagged AS (
      SELECT a.cluster,
             CASE WHEN a.id <> h.hub
                   AND round({cosine_sql('a.v', 'hv.hvec')}, 6) >= {threshold}
                  THEN 1 ELSE 0 END AS removed
      FROM a1 a JOIN hub h USING (cluster) JOIN hv USING (cluster)
    )
    SELECT cluster,
           count(*)::BIGINT AS n_vecs,
           sum(removed)::BIGINT AS n_removed,
           (count(*) - sum(removed))::BIGINT AS n_kept
    FROM flagged
    GROUP BY cluster
    ORDER BY cluster
    """
