"""Deterministic k-means + SemDeDup (llm/clustering): seeding, Lloyd
updates, empty-cluster handling, hub survival, and the oracle twins.
The cross-engine hash equivalence itself is gate-checked (q156/q157);
these tests pin the operator-level properties the gate can't see."""

import duckdb
import pytest
from pyspark.sql import functions as F

from bacon_spark.llm.clustering import (
    kmeans_assign,
    kmeans_assign_sql,
    seed_centroids,
    semantic_dedup_stats,
    semantic_dedup_stats_sql,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    from bacon_spark.sources.star import read_table

    return read_table(spark, SF, "embeddings")


def test_seeds_are_deterministic_and_k_sized(spark):
    emb = _emb(spark)
    s1 = seed_centroids(emb, 5)
    s2 = seed_centroids(emb.repartition(7), 5)
    assert s1 == s2  # partitioning-independent
    assert [ci for ci, _ in s1] == [0, 1, 2, 3, 4]
    assert seed_centroids(emb, 5, salt="other") != s1  # salt actually used


def test_every_vector_assigned_exactly_once(spark):
    emb = _emb(spark)
    out = kmeans_assign(emb, k=8, iters=1)
    n = emb.count()
    assert out.count() == n
    assert out.select("vec_id").distinct().count() == n
    clusters = {r["cluster"] for r in out.select("cluster").distinct().collect()}
    assert clusters <= set(range(8))


def test_more_iters_weakly_improve_inertia(spark):
    """Lloyd's algorithm never increases within-cluster SS distance —
    pin the update step actually moves centroids toward their members."""
    from bacon_spark.llm.clustering import _assign, seed_centroids

    emb = _emb(spark)

    def inertia(cents):
        vec = F.col("embedding").cast("array<double>")
        from bacon_spark.llm.clustering import _d2

        d_min = F.array_min(
            F.array(*[F.round(_d2(vec, c), 6) for _, c in cents])
        )
        return emb.agg(F.sum(d_min)).first()[0]

    seeds = seed_centroids(emb, 4)
    i0 = inertia(seeds)

    # recompute the centroids two different ways and compare inertia:
    # the iters=1 centroids must not be worse than the seeds
    assigned = kmeans_assign(emb, k=4, iters=1, include_vec=True)
    # reconstruct iter-1 centroids from the assignment (exact means)
    rows = (
        assigned.select("cluster", F.posexplode("_v").alias("j", "x"))
        .groupBy("cluster", "j")
        .agg(F.avg("x").alias("m"))
        .collect()
    )
    cents = {}
    for r in rows:
        cents.setdefault(r["cluster"], {})[r["j"]] = r["m"]
    c1 = [(ci, [m[j] for j in sorted(m)]) for ci, m in sorted(cents.items())]
    assert inertia(c1) <= i0 + 1e-6


def test_empty_cluster_drops_identically_in_oracle(spark):
    """Force an empty cluster: k larger than the distinct vectors in a
    tiny frame. Both engines must converge on the same surviving labels."""
    emb = _emb(spark).filter(F.col("vec_id") < 12)
    got = sorted(tuple(r) for r in kmeans_assign(emb, k=8, iters=1).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF}/embeddings.parquet') WHERE vec_id < 12"
    )
    want = sorted(tuple(r) for r in con.execute(kmeans_assign_sql(k=8, dim=64)).fetchall())
    assert got == want


def test_semantic_dedup_hub_always_survives(spark):
    emb = _emb(spark)
    stats = semantic_dedup_stats(emb, k=8, threshold=0.2).collect()
    for r in stats:
        assert r["n_kept"] >= 1  # the hub can never remove itself
        assert r["n_kept"] + r["n_removed"] == r["n_vecs"]
    assert sum(r["n_removed"] for r in stats) > 0  # threshold binds


def test_semantic_dedup_threshold_monotone(spark):
    emb = _emb(spark)

    def removed(t):
        return sum(
            r["n_removed"] for r in semantic_dedup_stats(emb, k=8, threshold=t).collect()
        )

    assert removed(0.1) >= removed(0.2) >= removed(0.9)


def test_semantic_dedup_oracle_matches_at_other_params(spark):
    """The gate pins (k=8, t=0.2); exercise a different configuration so
    the SQL builder isn't accidentally constant-specific."""
    emb = _emb(spark)
    got = [tuple(r) for r in semantic_dedup_stats(emb, k=5, threshold=0.15).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
    )
    want = con.execute(semantic_dedup_stats_sql(k=5, dim=64, threshold=0.15)).fetchall()
    assert got == [tuple(r) for r in want]


# --- broadcast-vs-literal assignment (r6: the k-ceiling fix) -------------


def test_assign_column_broadcast_equivalence_k64(spark):
    """Above the literal threshold, assignment switches to a single-row
    broadcast centroid frame — results must be BIT-identical to the
    literal-codegen path (same fold, same round, same tie-break) at
    k=64, and the plan must show the broadcast (not folded literals)."""
    from bacon_spark.llm.clustering import assign_column, kmeans_centroids

    emb = _emb(spark)
    cents = kmeans_centroids(emb, k=64, iters=1)
    vec = F.col("embedding").cast("array<double>")
    base = emb.select("vec_id", vec.alias("_v"))
    lit = assign_column(base, cents, F.col("_v"), "c", threshold=10**9)
    bc = assign_column(base, cents, F.col("_v"), "c", threshold=0)
    got_l = sorted((r["vec_id"], r["c"]) for r in lit.collect())
    got_b = sorted((r["vec_id"], r["c"]) for r in bc.collect())
    assert got_l == got_b and len(got_l) > 0
    plan = bc._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def test_kmeans_assign_threshold_end_to_end(spark):
    # the full kmeans_assign pipeline (centroid update included) must be
    # path-invariant: broadcast assignment inside the Lloyd loop and the
    # final labeling give the same clusters as the literal build
    emb = _emb(spark)
    a_lit = kmeans_assign(emb, k=8, iters=1, assign_threshold=10**9)
    a_bc = kmeans_assign(emb, k=8, iters=1, assign_threshold=0)
    assert sorted(map(tuple, a_lit.collect())) == sorted(map(tuple, a_bc.collect()))


def test_ivf_cell_assign_broadcast_equivalence(spark):
    from bacon_spark.llm.ivf import cell_assign

    emb = _emb(spark)
    cents = [[float(i == j) for i in range(64)] for j in range(16)]
    lit = cell_assign(emb, cents, threshold=10**9).select("vec_id", "cell")
    bc = cell_assign(emb, cents, threshold=0).select("vec_id", "cell")
    assert sorted(map(tuple, lit.collect())) == sorted(map(tuple, bc.collect()))
    assert "Broadcast" in bc._jdf.queryExecution().executedPlan().toString()
