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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.exprs import darr, sfrag

#: deterministic pseudo-random hyperplane seeds (no RNG at plan time)
HYPERPLANE_SEEDS = tuple(range(1, 9))

# Each builder below accepts a Column OR a Spark-SQL fragment (a column
# name / parenthesized expression / darr(...) literal). The fragment
# path composes ONE SQL string and parses it JVM-side in a single py4j
# round-trip — the Column path builds the same tree call-by-call (1-3
# round-trips each, ~1.5 ms apiece on the bench host: a 16x64 literal
# matrix cost ~1.3 s of driver time pre-r13). Both paths produce the
# IDENTICAL expression tree (same fold order, same casts, same
# literals), so results are bit-for-bit equal — pinned by
# tests/test_fast_exprs.py.


def dot_frag(a: str, b: str) -> str:
    """Spark-SQL fragment of :func:`dot` (same tree, one parse)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * "
        f"CAST(y AS DOUBLE)), 0.0D, (acc, x) -> acc + x)"
    )


def norm_frag(a: str) -> str:
    """Spark-SQL fragment of :func:`norm`."""
    return (
        f"sqrt(aggregate(transform({a}, x -> CAST(x AS DOUBLE) * "
        f"CAST(x AS DOUBLE)), 0.0D, (acc, x) -> acc + x))"
    )


def cosine_frag(a: str, b: str) -> str:
    """Spark-SQL fragment of :func:`cosine`."""
    d = f"({norm_frag(a)} * {norm_frag(b)})"
    return f"CASE WHEN {d} > 0 THEN {dot_frag(a, b)} / {d} ELSE 0.0D END"


def dot(a: Column | str, b: Column | str) -> Column:
    fa, fb = sfrag(a), sfrag(b)
    if fa is not None and fb is not None:
        return F.expr(dot_frag(fa, fb))
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    fa = sfrag(a)
    if fa is not None:
        return F.expr(norm_frag(fa))
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    fa, fb = sfrag(a), sfrag(b)
    if fa is not None and fb is not None:
        return F.expr(cosine_frag(fa, fb))
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
    query_vec: Column | str,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a single query vector (a Column, or a
    SQL fragment such as ``darr(vec)`` for the one-parse fast path).

    Compiles to a map-side score + TakeOrderedAndProject — the right
    physical plan at any corpus size for single-query top-k."""
    qf = sfrag(query_vec)
    scored = df.select(
        F.col(id_col),
        F.round(
            cosine(f"`{vec_col}`" if qf is not None else F.col(vec_col), query_vec), 6
        ).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)


def plane_constants(dim: int, seeds=HYPERPLANE_SEEDS) -> list[list[float]]:
    """The deterministic pseudo-hyperplane components, computed ONCE
    driver-side: c_j = md5-hash60(f"{seed}:{j}") mod 2001 - 1000, a fixed
    pseudo-random integer in [-1000, 1000]. Identical to the SQL-side
    construction (hash60_sql) — DuckDB oracles recompute it and match."""
    import hashlib

    planes = []
    for seed in seeds:
        comps = []
        for j in range(dim):
            h = int(hashlib.md5(f"{seed}:{j}".encode()).hexdigest()[:15], 16)
            comps.append(float(h % 2001 - 1000))
        planes.append(comps)
    return planes


def jl_signs(dim: int, out_dim: int = 16, salt: str = "jl") -> list[list[float]]:
    """±1 sign matrix for a Johnson-Lindenstrauss random projection —
    Achlioptas (2003)'s database-friendly construction, where each
    entry is an independent ±1 draw (here: md5 parity of
    f"{salt}{j}:{i}", the same deterministic pseudo-randomness as
    plane_constants) and the JL distance-preservation guarantee holds
    with the same constants as Gaussian entries. out_dim rows of dim
    signs, computed once driver-side."""
    import hashlib

    rows = []
    for j in range(out_dim):
        row = []
        for i in range(dim):
            h = int(hashlib.md5(f"{salt}{j}:{i}".encode()).hexdigest()[:15], 16)
            row.append(float(h % 2 * 2 - 1))
        rows.append(row)
    return rows


def jl_project(vec: Column | str, dim: int, out_dim: int = 16, salt: str = "jl") -> Column:
    """Project *vec* (length dim) to out_dim components: each output is
    the signed sum dot(vec, ±1 row), rounded to 6 dp. Map-side literal
    arithmetic — no shuffle, no join, whole-stage codegen — and scale
    factors are dropped because cosine is scale-invariant. At 100 TB
    this is the compression pass in front of similarity search: 64→16
    dims cuts both the ANN index and every downstream distance to 1/4
    while JL keeps relative distances within the usual ε band (recall
    measured by the gate query rather than assumed)."""
    fv = sfrag(vec)
    if fv is not None:
        comps = ",".join(
            f"round({dot_frag(fv, darr(row))}, 6)"
            for row in jl_signs(dim, out_dim, salt)
        )
        return F.expr(f"array({comps})")
    comps = [
        F.round(dot(vec, F.array(*[F.lit(s) for s in row])), 6)
        for row in jl_signs(dim, out_dim, salt)
    ]
    return F.array(*comps)


def jl_project_sql(vec_expr: str, dim: int, out_dim: int = 16, salt: str = "jl") -> str:
    """DuckDB twin of :func:`jl_project`: the same ±1 literals, the same
    list_zip/list_sum fold, the same per-component round."""
    comps = ", ".join(
        f"round({dot_sql(vec_expr, '[' + ', '.join(str(s) for s in row) + ']')}, 6)"
        for row in jl_signs(dim, out_dim, salt)
    )
    return f"[{comps}]"


def hyperplane_bits(vec: Column | str, dim: int, seeds=HYPERPLANE_SEEDS) -> Column:
    """Sign-bit bucket id from deterministic pseudo-hyperplanes:
    bit_s = [v · h_s > 0].

    The plane components are row-independent, so they are computed once
    on the driver (plane_constants) and shipped as array literals — the
    previous per-row form re-derived 8·dim md5 hashes for EVERY vector
    (~0.5M JVM md5 calls per 1k rows), dominating bucket assignment
    cost. The dot-product fold order is unchanged, so bucket ids are
    bit-identical to the md5-in-SQL oracle construction."""
    fv = sfrag(vec)
    if fv is not None:
        parts = ["CAST(0 AS BIGINT)"]
        for si, comps in enumerate(plane_constants(dim, seeds)):
            proj = (
                f"aggregate(zip_with({fv}, {darr(comps)}, (x, h) -> "
                f"CAST(x AS DOUBLE) * h), 0.0D, (acc, x) -> acc + x)"
            )
            parts.append(
                f"CAST(CASE WHEN {proj} > 0 THEN {1 << si} ELSE 0 END AS BIGINT)"
            )
        return F.expr(" + ".join(parts))
    bucket = F.lit(0).cast("long")
    for si, comps in enumerate(plane_constants(dim, seeds)):
        plane = F.array(*[F.lit(c) for c in comps])
        proj = F.aggregate(
            F.zip_with(vec, plane, lambda x, h: x.cast("double") * h),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << si)).otherwise(F.lit(0)).cast("long")
    return bucket


def blocked_all_pairs_cosine(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    blocks: int = 8,
) -> DataFrame:
    """EXACT all-pairs cosine >= threshold via block-partitioned
    comparison — the scale shape for exact pairwise similarity.

    A naive ``a.join(b, id_a < id_b)`` plans a BroadcastNestedLoopJoin
    (round-1 q40): a single-task cartesian that cannot distribute. Exact
    all-pairs is inherently O(N²) compares, but the *distribution* is
    fixable: assign each vector to one of B blocks, build the B(B+1)/2
    unordered block pairs as a tiny broadcast relation, replicate each
    side to its block pairs, and equi-join on the block-pair id. Every
    vector pair is compared exactly once; work is spread over B(B+1)/2
    shuffle keys (size B ≈ sqrt(2·parallelism) to the cluster); each
    vector is replicated (B+1)/2 ≈ O(√tasks) times — the standard
    triangle-partitioning trade for blocked all-pairs similarity.

    LSH (hyperplane_bits) is NOT used here on purpose: at thresholds as
    low as 0.3 (≈72°) sign-bit LSH recall is poor, so a bucketed variant
    would be approximate. For high-threshold near-dup (>0.8) compose
    hyperplane buckets with exact verification instead (ann_lsh_topk /
    q28→q30 pattern).

    Norms are computed once per vector (not per pair); the final
    ``least/greatest`` canonicalization plus the ``gi<gj OR id_a<id_b``
    predicate dedupes orderings."""
    spark = df.sparkSession
    normed = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_vec"),
        norm(f"`{vec_col}`").alias("_nrm"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(blocks)).alias("_g"),
    )
    pair_rows = [
        (gi * blocks + gj, gi, gj) for gi in range(blocks) for gj in range(gi, blocks)
    ]
    bp = spark.createDataFrame(pair_rows, "pid int, gi int, gj int")
    a = normed.join(F.broadcast(bp), normed["_g"] == bp["gi"]).select(
        "pid", "gi", "gj",
        F.col("_id").alias("id_a"), F.col("_vec").alias("ea"), F.col("_nrm").alias("na"),
    )
    b = normed.join(
        F.broadcast(bp.select("pid", F.col("gj").alias("gj2"))),
        normed["_g"] == F.col("gj2"),
    ).select(
        F.col("pid").alias("pid2"),
        F.col("_id").alias("id_b"), F.col("_vec").alias("eb"), F.col("_nrm").alias("nb"),
    )
    joined = a.join(b, a["pid"] == b["pid2"]).filter(
        (F.col("gi") < F.col("gj")) | (F.col("id_a") < F.col("id_b"))
    )
    denom = F.col("na") * F.col("nb")
    sim = F.round(
        F.when(denom > 0, dot("ea", "eb") / denom).otherwise(F.lit(0.0)), 6
    )
    return (
        joined.select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            sim.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= F.lit(threshold))
    )


def lsh_bucket_pairs(
    df: DataFrame,
    dim: int,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seeds=HYPERPLANE_SEEDS,
) -> DataFrame:
    """Candidate pairs from shared hyperplane-LSH buckets, verified with
    exact cosine — the embedding twin of the MinHash band→bucket→verify
    pipeline (q28→q30).

    Each vector gets ONE bucket (its sign-bit signature), so the
    self-join on bucket compares only same-bucket pairs: O(Σ bucket²)
    work instead of O(N²), and at scale the table is written partitioned
    by bucket so the join is partition-local. Approximate by
    construction (a pair split across buckets is never compared) — the
    deterministic md5 hyperplanes make the *same* candidate set
    reproducible in any engine, which is what the oracle pins."""
    bucketed = df.select(
        F.col(id_col), F.col(vec_col), hyperplane_bits(f"`{vec_col}`", dim, seeds).alias("bucket")
    )
    a = bucketed.select(
        "bucket", F.col(id_col).alias("id_a"), F.col(vec_col).alias("ea")
    )
    b = bucketed.select(
        "bucket", F.col(id_col).alias("id_b"), F.col(vec_col).alias("eb")
    )
    sim = F.round(cosine("ea", "eb"), 6)
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "bucket", sim.alias("cos_sim"))
        .filter(F.col("cos_sim") >= F.lit(threshold))
    )


def hyperplane_planes_sql_cte(dim: int, seeds=HYPERPLANE_SEEDS) -> str:
    """DuckDB CTE body computing the same pseudo-hyperplanes as
    hyperplane_bits: one row per seed index with the component list.

    The seed VALUES list is built from the ACTUAL ``seeds`` argument (not
    a hard-coded 1..N), so Python-side buckets and the oracle agree for
    any caller-supplied seed set."""
    from .dedup import hash60_sql

    comp = hash60_sql("seed || ':' || j::VARCHAR")
    values = ", ".join(f"({si}, '{seed}')" for si, seed in enumerate(seeds))
    return (
        f"SELECT si, list_transform(range(0, {dim}), "
        f"j -> (({comp}) % 2001 - 1000)::DOUBLE) AS plane "
        f"FROM (SELECT * FROM (VALUES {values}) AS _seeds(si, seed))"
    )


def adaptive_planes_sql_cte(
    dim: int, table: str, target_bucket: int = 8, floor: int = 8
) -> str:
    """Planes CTE whose SEED COUNT is computed in SQL from the table's
    row count — the exact twin of :func:`adaptive_seed_count`, so an
    oracle built on it is valid at EVERY corpus size, not just the gate
    fixtures the static-seed form was pinned to (found by the round-11
    sf1 gate: q73/q152 "failed" at sf1 only because the registered
    oracle was the 8-plane instantiation while the engine had correctly
    adapted to 12). Seed identities are 1..planes stringified, matching
    the engine's ``range(1, planes + 1)``."""
    from .dedup import hash60_sql

    comp = hash60_sql("seed || ':' || j::VARCHAR")
    n_planes = (
        f"(SELECT CASE WHEN count(*) <= {target_bucket} THEN {floor} "
        f"ELSE greatest({floor}, ceil(log2(count(*)::DOUBLE / {target_bucket}))::BIGINT) "
        f"END FROM {table})"
    )
    return (
        f"SELECT (i - 1)::BIGINT AS si, i::VARCHAR AS seed, "
        f"list_transform(range(0, {dim}), "
        f"j -> ((({comp}) % 2001 - 1000))::DOUBLE) AS plane "
        f"FROM (SELECT unnest(range(1, {n_planes} + 1)) AS i)"
    )


def lsh_bucket_pairs_sql(
    dim: int,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    table: str = "embeddings",
    seeds=HYPERPLANE_SEEDS,
) -> str:
    """Oracle SQL twin of lsh_bucket_pairs (identical buckets, identical
    candidate set, identical rounded cosines). ``seeds="adaptive"``
    derives the plane count from the table's row count in SQL
    (:func:`adaptive_planes_sql_cte`) — the form that matches the
    engine's adaptive rule at every SF."""
    proj = (
        f"list_sum(list_transform(list_zip({vec_col}, plane), "
        f"p -> p[1]::DOUBLE * p[2]::DOUBLE))"
    )
    planes_cte = (
        adaptive_planes_sql_cte(dim, table)
        if seeds == "adaptive"
        else hyperplane_planes_sql_cte(dim, seeds)
    )
    return f"""
    WITH planes AS ({planes_cte}),
    bucketed AS (
      SELECT {id_col}, {vec_col},
             sum(CASE WHEN {proj} > 0 THEN (1::BIGINT << si) ELSE 0 END)::BIGINT AS bucket
      FROM {table} CROSS JOIN planes
      GROUP BY 1, 2
    )
    SELECT a.{id_col} AS id_a, b.{id_col} AS id_b, a.bucket,
           round({cosine_sql(f'a.{vec_col}', f'b.{vec_col}')}, 6) AS cos_sim
    FROM bucketed a JOIN bucketed b
      ON a.bucket = b.bucket AND a.{id_col} < b.{id_col}
    WHERE round({cosine_sql(f'a.{vec_col}', f'b.{vec_col}')}, 6) >= {threshold}
    """


def embedding_dedup_scalable(
    df: DataFrame,
    dim: int,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seeds=HYPERPLANE_SEEDS,
) -> DataFrame:
    """Keep-one embedding near-dup dedup via bucket STAR edges — the
    embedding twin of llm/dedup.canonical_dedup_scalable (and the scale
    path past :func:`lsh_bucket_pairs`' Σ bucket² enumeration): every
    hyperplane bucket contributes member→bucket-min hub edges (Σ bucket,
    linear in bucket size), hub edges are verified with exact cosine ≥
    *threshold*, connected components label clusters, and the cluster-
    minimum id survives.

    Returns (id, n_removed): the retained vectors with how many
    near-duplicates each absorbed.  Recall trade (documented, same as
    the text-side star graph): a member whose hub edge fails the cosine
    verify disconnects even if some non-hub in-bucket pair would have
    passed."""
    from ..operators.graph import connected_components

    bucketed = df.select(
        F.col(id_col),
        F.col(vec_col),
        hyperplane_bits(f"`{vec_col}`", dim, seeds).alias("bucket"),
    )
    hubs = (
        bucketed.groupBy("bucket")
        .agg(F.min(id_col).alias("_hub"), F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > 1)
        .select("bucket", "_hub")
    )
    hub_vec = bucketed.select(
        F.col(id_col).alias("_hub"), F.col(vec_col).alias("_hv")
    )
    edges = (
        bucketed.join(hubs, "bucket")
        .filter(F.col(id_col) != F.col("_hub"))
        .join(hub_vec, "_hub")
        .filter(F.round(cosine("_hv", f"`{vec_col}`"), 6) >= F.lit(threshold))
        .select(F.col("_hub").alias("id_a"), F.col(id_col).alias("id_b"))
        .distinct()
    )
    cc = connected_components(edges, src="id_a", dst="id_b")
    losers = cc.filter(F.col("id") != F.col("component")).select("id")
    stats = (
        cc.groupBy("component")
        .agg((F.count(F.lit(1)) - 1).alias("n_removed"))
        .withColumnRenamed("component", id_col)
    )
    return (
        df.select(id_col)
        .join(losers.withColumnRenamed("id", id_col), id_col, "left_anti")
        .join(stats, id_col, "left")
        .withColumn("n_removed", F.coalesce(F.col("n_removed"), F.lit(0)))
    )


def embedding_dedup_scalable_sql(
    dim: int,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    table: str = "embeddings",
    seeds=HYPERPLANE_SEEDS,
) -> str:
    """DuckDB twin of :func:`embedding_dedup_scalable` (identical buckets,
    identical star edges, identical verify, recursive-CTE components).
    ``seeds="adaptive"`` mirrors the engine's corpus-size plane rule in
    SQL — valid at every SF (see :func:`adaptive_planes_sql_cte`)."""
    proj = (
        f"list_sum(list_transform(list_zip({vec_col}, plane), "
        f"p -> p[1]::DOUBLE * p[2]::DOUBLE))"
    )
    planes_cte = (
        adaptive_planes_sql_cte(dim, table)
        if seeds == "adaptive"
        else hyperplane_planes_sql_cte(dim, seeds)
    )
    return f"""
    WITH RECURSIVE planes AS ({planes_cte}),
    bucketed AS MATERIALIZED (
      SELECT {id_col} AS id, {vec_col} AS v,
             sum(CASE WHEN {proj} > 0 THEN (1::BIGINT << si) ELSE 0 END)::BIGINT AS bucket
      FROM {table} CROSS JOIN planes
      GROUP BY 1, 2
    ),
    hub AS (
      SELECT bucket, min(id) AS hub FROM bucketed GROUP BY 1 HAVING count(*) > 1
    ),
    edges AS MATERIALIZED (
      SELECT DISTINCT h.hub AS a, m.id AS b
      FROM bucketed m
      JOIN hub h USING (bucket)
      JOIN bucketed hv ON hv.id = h.hub
      WHERE m.id <> h.hub
        AND round({cosine_sql('hv.v', 'm.v')}, 6) >= {threshold}
    ),
    sym AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
    reach(id, lbl) AS (
      SELECT a, a FROM sym
      UNION
      SELECT s.a, r.lbl FROM sym s JOIN reach r ON s.b = r.id
    ),
    comp AS (SELECT id, min(lbl) AS cluster_id FROM reach GROUP BY id),
    removed AS (SELECT id FROM comp WHERE id <> cluster_id),
    stats AS (SELECT cluster_id, count(*) - 1 AS n_removed FROM comp GROUP BY 1)
    SELECT e.{id_col},
           coalesce(s.n_removed, 0)::BIGINT AS n_removed
    FROM {table} e
    LEFT JOIN stats s ON e.{id_col} = s.cluster_id
    WHERE e.{id_col} NOT IN (SELECT id FROM removed)
    ORDER BY e.{id_col}
    """


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
    lit_q = darr(query_vec_row)
    bucketed = df.withColumn("bucket", hyperplane_bits(f"`{vec_col}`", dim))
    qdf = df.sparkSession.range(1).select(hyperplane_bits(lit_q, dim).alias("qbucket"))
    qbucket = qdf.head()[0]
    cand = bucketed.filter(F.col("bucket") == F.lit(qbucket))
    return brute_force_topk(cand, lit_q, k, id_col, vec_col)


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    query_vec_col: str = "embedding",
    exclude_same_id: bool = False,
) -> DataFrame:
    """Exact batch k-NN join: for EVERY query vector, its top-k corpus
    neighbors by cosine — (query_id, vec_id, cos_sim, rank).

    Scale shape: the query batch is broadcast (bounded — a probe set,
    not a corpus), so scoring is map-side over corpus partitions. The
    naive lowering would then shuffle |Q|x|N| scored rows to rank them;
    instead a per-partition pre-top-k (mapInPandas, Arrow-batched,
    running heap state bounded by |Q|*k) cuts the exchange to
    |Q| * k * num_partitions rows before the final per-query window.
    Exact at any corpus size; for corpus-x-corpus joins use the LSH /
    IVF paths (lsh_bucket_pairs, ivf.IVFIndex) — this operator is the
    exact harness and the query-batch server."""
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("_qv")
        )
    )
    pairs = corpus.crossJoin(q)
    if exclude_same_id:
        # drop self-matches BEFORE ranking (a query drawn from the corpus
        # always ranks itself first at cos=1 otherwise)
        pairs = pairs.filter(F.col(id_col) != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col(id_col),
        F.round(cosine(f"`{vec_col}`", "_qv"), 6).alias("cos_sim"),
    )

    out_schema = scored.schema

    def _partition_topk(batches):
        import heapq

        heaps: dict = {}
        cols = None
        for pdf in batches:
            cols = list(pdf.columns)
            for qid, vid, cs in pdf.itertuples(index=False):
                h = heaps.setdefault(qid, [])
                # heap orders by (cos asc, vec_id desc): the root is the
                # WORST kept candidate; ties on cos keep the smaller id
                item = (cs, -vid, vid)
                if len(h) < k:
                    heapq.heappush(h, item)
                else:
                    heapq.heappushpop(h, item)
        import pandas as pd

        rows = [
            (qid, vid, cs)
            for qid, h in heaps.items()
            for cs, _negvid, vid in h
        ]
        yield pd.DataFrame(rows, columns=cols or ["query_id", "vec_id", "cos_sim"])

    partial = scored.mapInPandas(_partition_topk, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cos_sim", F.col("rank").cast("int"))
    )


def adaptive_seed_count(n_vectors: int, target_bucket: int = 8, floor: int = 8) -> int:
    """Hyperplane count for ~*target_bucket* vectors per LSH bucket:
    planes = max(floor, ceil(log2(n / target))).

    Fixed bucket granularity is the classic LSH scale trap: at 10x the
    vectors each bucket holds 10x members and the in-bucket verify grows
    100x (measured: q73 20.3x wall at 10x data with 8 static planes).
    Bucket count must track corpus size — recall for a given cosine
    threshold is then tuned by OR-ing multiple tables (rerunning with
    shifted seed ranges), not by coarser buckets."""
    import math

    if n_vectors <= target_bucket:
        return floor
    return max(floor, math.ceil(math.log2(n_vectors / target_bucket)))
