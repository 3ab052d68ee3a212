"""IVF (inverted-file) approximate nearest-neighbor search.

The k-means scale path for similarity search (complementing the
hyperplane-LSH variant in similarity.py): partition the corpus into
nlist Voronoi cells with pyspark.ml KMeans, store the cell id as a column
(at real scale: write the table partitioned by ``cell`` → a query probing
nprobe cells is a partition-pruned read of ~nprobe/nlist of the data), and
answer top-k by brute-force cosine inside the probed cells only.

Recall/latency trades off via nprobe exactly as in FAISS-style IVF-Flat;
everything distributed: training samples are bounded, assignment is a
map-side model transform, search is a pruned scan + TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import brute_force_topk


class IVFIndex:
    def __init__(self, df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
                 nlist: int = 16, seed: int = 42):
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        self.id_col = id_col
        self.vec_col = vec_col
        self.nlist = nlist
        with_vec = df.withColumn("_features", array_to_vector(F.col(vec_col).cast("array<double>")))
        km = KMeans(k=nlist, seed=seed, featuresCol="_features", predictionCol="cell")
        self.model = km.fit(with_vec)
        self.indexed = self.model.transform(with_vec).drop("_features").persist()
        self.centroids = [list(map(float, c)) for c in self.model.clusterCenters()]

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
        lit_q = F.array(*[F.lit(float(v)) for v in query_vec])
        return brute_force_topk(cand, lit_q, k, self.id_col, self.vec_col)

    def unpersist(self) -> None:
        self.indexed.unpersist()
