"""IVF ANN: recall against exact brute force on the fixture embeddings."""

import pytest
from pyspark.sql import functions as F

from bacon_spark.llm.ivf import IVFIndex
from bacon_spark.llm.similarity import brute_force_topk


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_ivf_topk_recall(emb):
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    qvec = [float(v) for v in qrow]

    idx = IVFIndex(emb, nlist=8, seed=42)
    try:
        approx = [r["vec_id"] for r in idx.topk(qvec, k=10, nprobe=3).collect()]
        lit_q = F.array(*[F.lit(v) for v in qvec])
        exact = [r["vec_id"] for r in brute_force_topk(emb, lit_q, k=10).collect()]
        # the query vector itself must be #1 and recall@10 must be high
        assert approx[0] == 0
        recall = len(set(approx) & set(exact)) / 10
        assert recall >= 0.7, (recall, approx, exact)
        # probing ALL cells must recover the exact result
        full = [r["vec_id"] for r in idx.topk(qvec, k=10, nprobe=8).collect()]
        assert full == exact
    finally:
        idx.unpersist()


def test_ivf_cells_partition_corpus(emb):
    idx = IVFIndex(emb, nlist=4, seed=42)
    try:
        counts = idx.indexed.groupBy("cell").count().collect()
        assert sum(r["count"] for r in counts) == emb.count()
        assert len(counts) == 4
    finally:
        idx.unpersist()
