"""IVF (inverted-file) approximate nearest-neighbor search.

The k-means scale path for similarity search (complementing the
hyperplane-LSH variant in similarity.py): partition the corpus into nlist
Voronoi cells, store the cell id as a column (at real scale: write the
table partitioned by ``cell`` → a query probing nprobe cells is a
partition-pruned read of ~nprobe/nlist of the data), and answer top-k by
brute-force cosine inside the probed cells only.

Training follows the FAISS IVF recipe: k-means on a **bounded sample**
(centroid quality needs thousands of points, not the corpus), run
driver-side in numpy — milliseconds, zero cluster jobs — then the nlist
centroids are shipped inside the plan as array literals and every row's
cell is computed by a pure Spark SQL expression (zip_with/aggregate
distance fold + array_position of the min). Assignment is therefore
map-side, whole-stage-codegen JVM work with no ML-library UDF transform
and no extra jobs; on 100 TB it is exactly as parallel as the scan.
(Previously pyspark.ml KMeans: ~2s of iterative-job overhead per build at
sf0.1 vs ~0.3s total for this path.)

Recall/latency trades off via nprobe exactly as in FAISS-style IVF-Flat.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.exprs import let
from .similarity import brute_force_topk

#: FAISS-style default training budget: ~256 sample points per centroid
TRAIN_PER_CELL = 256


def _lloyd(X: "np.ndarray", k: int, seed: int, max_iter: int = 25) -> "np.ndarray":
    """Plain Lloyd's k-means on the (small) training sample, seeded."""
    rng = np.random.RandomState(seed)
    cent = X[rng.choice(len(X), size=min(k, len(X)), replace=False)].astype(np.float64)
    if len(cent) < k:  # degenerate tiny input: pad with jittered copies
        cent = np.concatenate([cent, cent[: k - len(cent)] + 1e-6])
    for _ in range(max_iter):
        d = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=-1)
        lab = d.argmin(axis=1)
        new = np.array(
            [X[lab == j].mean(axis=0) if (lab == j).any() else cent[j] for j in range(k)]
        )
        if np.allclose(new, cent):
            break
        cent = new
    return cent


def _nearest_from(cents: Column, v: Column) -> Column:
    """argmin cell index from a centroid ARRAY column — shared by the
    literal and broadcast paths so both run the identical distance fold
    and first-position tie-break."""
    dists = F.transform(
        cents,
        lambda c: F.aggregate(
            F.zip_with(v, c, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return let(dists, lambda d: (F.array_position(d, F.array_min(d)) - 1).cast("int"))


def nearest_cell(vec: Column | str, centroids: list[list[float]]) -> Column:
    """Index of the nearest centroid (squared L2), as one JVM-side
    expression: distances fold via zip_with/aggregate over centroid array
    literals, let-bound so the distance array is computed once. A string
    *vec* (column name / SQL fragment) builds the identical tree via one
    parsed expression instead of per-F.lit py4j calls (r13)."""
    from ..functions.exprs import darr, sfrag

    fv = sfrag(vec)
    if fv is not None:
        cents = "array(" + ",".join(darr(c) for c in centroids) + ")"
        dists = (
            f"transform({cents}, c -> aggregate(zip_with("
            f"CAST({fv} AS ARRAY<DOUBLE>), c, (a, b) -> (a - b) * (a - b)), "
            f"0.0D, (acc, x) -> acc + x))"
        )
        return F.expr(
            f"transform(array({dists}), d -> "
            f"CAST((array_position(d, array_min(d)) - 1) AS INT))[0]"
        )
    cents = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in centroids])
    return _nearest_from(cents, vec.cast("array<double>"))


def cell_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out: str = "cell",
    threshold: int | None = None,
) -> DataFrame:
    """*df* plus column *out* = nearest-centroid index, switching from
    plan-literal centroids to a single-row broadcast centroid frame when
    nlist x dim exceeds *threshold* floats (default
    clustering.LITERAL_ASSIGN_FLOATS). Production IVF wants nlist ~
    sqrt(corpus) — 1e4-1e5 cells at 100 TB — where literal folding means
    multi-MB plans; the broadcast path keeps plan size O(1) in nlist
    while the per-row distance fold (and therefore the result) is
    bit-identical. See SCALE.md."""
    from .clustering import LITERAL_ASSIGN_FLOATS

    threshold = LITERAL_ASSIGN_FLOATS if threshold is None else threshold
    if sum(len(c) for c in centroids) <= threshold:
        return df.withColumn(out, nearest_cell(f"`{vec_col}`", centroids))
    cent_df = df.sparkSession.createDataFrame(
        [([[float(x) for x in c] for c in centroids],)],
        "_cells array<array<double>>",
    )
    joined = df.crossJoin(F.broadcast(cent_df))
    return joined.withColumn(
        out, _nearest_from(F.col("_cells"), F.col(vec_col).cast("array<double>"))
    ).drop("_cells")


class IVFIndex:
    def __init__(
        self,
        df: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        nlist: int = 16,
        seed: int = 42,
        train_sample: int | None = None,
        max_iter: int = 25,
    ):
        self.id_col = id_col
        self.vec_col = vec_col
        self.nlist = nlist
        budget = train_sample or TRAIN_PER_CELL * nlist
        # Training sample must be key-spread, not positional: limit(N)
        # takes the first N rows of whatever partition order yields — at
        # scale that is one file's worth of possibly-skewed vectors.
        # hash_sample draws a deterministic Bernoulli sample over the id
        # hash (map-side, reproducible), oversampled 1.2x then capped.
        from ..operators.sampling import hash_sample

        n = df.count()
        vecs = df.select(F.col(id_col), F.col(vec_col).cast("array<double>"))
        if n > budget:
            rate = min(1.0, 1.2 * budget / n)
            vecs = hash_sample(vecs, F.col(id_col), rate, salt="ivf-train").limit(budget)
        sample = vecs.collect()
        X = np.array([r[1] for r in sample], dtype=np.float64)
        self.centroids = [[float(x) for x in c] for c in _lloyd(X, nlist, seed, max_iter)]
        self.indexed = cell_assign(df, self.centroids, vec_col, "cell").persist()

    def probe_cells(self, query_vec: list[float], nprobe: int) -> list[int]:
        """nprobe nearest centroids by cosine (driver-side: nlist is small
        by construction — centroids are index metadata, not data)."""
        import math

        qn = math.sqrt(sum(x * x for x in query_vec)) or 1.0
        scored = []
        for i, c in enumerate(self.centroids):
            cn = math.sqrt(sum(x * x for x in c)) or 1.0
            dot = sum(a * b for a, b in zip(query_vec, c))
            scored.append((dot / (qn * cn), i))
        scored.sort(reverse=True)
        return [i for _, i in scored[:nprobe]]

    def topk(self, query_vec: list[float], k: int = 10, nprobe: int = 4) -> DataFrame:
        cells = self.probe_cells(query_vec, nprobe)
        cand = self.indexed.filter(F.col("cell").isin(cells))
        from ..functions.exprs import darr

        lit_q = darr(query_vec)
        return brute_force_topk(cand, lit_q, k, self.id_col, self.vec_col)

    def unpersist(self) -> None:
        self.indexed.unpersist()
