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


# ---------------------------------------------------------------------------
# Product quantization (r5)
# ---------------------------------------------------------------------------


def _toy_vectors(spark):
    # two tight groups in each half-space so subspace codebooks separate them
    rows = [
        (0, [0.0, 0.0, 10.0, 10.0]),
        (1, [0.1, 0.0, 10.0, 10.1]),
        (2, [5.0, 5.0, 0.0, 0.0]),
        (3, [5.1, 5.0, 0.0, 0.1]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pq_codes_group_near_identical_vectors(spark):
    from bacon_spark.llm import pq

    df = _toy_vectors(spark)
    cbs = pq.pq_codebooks(df, m=2, k=2, dim=4)
    assert len(cbs) == 2 and all(len(cb) <= 2 for cb in cbs)
    codes = {r["vec_id"]: (r["c0"], r["c1"]) for r in pq.pq_codes(df, cbs).collect()}
    assert codes[0] == codes[1]  # near-identical vectors share codes
    assert codes[2] == codes[3]
    assert codes[0] != codes[2]  # the two groups separate


def test_pq_ann_topk_ranks_own_group_first(spark):
    from bacon_spark.llm import pq
    from pyspark.sql import functions as F

    df = _toy_vectors(spark)
    cbs = pq.pq_codebooks(df, m=2, k=2, dim=4)
    probes = [(0, [0.0, 0.0, 10.0, 10.0])]
    out = [(r["vec_id"], r["rn"]) for r in pq.pq_ann_topk(df, cbs, probes, n=4).collect()]
    ranked_ids = [v for v, _ in out]
    # group {0,1} (same reconstruction) must rank ahead of group {2,3}
    assert set(ranked_ids[:2]) == {0, 1}
    assert set(ranked_ids[2:]) == {2, 3}


def test_ivfpq_routes_and_ranks_by_cell(spark):
    from bacon_spark.llm import pq
    from bacon_spark.utils.caching import release_caches

    # two far-apart groups: coarse quantizer must separate them, and a
    # probe at group A must rank A members first while only probing
    # nprobe=1 cell (so group B never appears at all)
    rows = [
        (0, [0.0, 0.0, 10.0, 10.0]),
        (1, [0.1, 0.0, 10.0, 10.1]),
        (2, [50.0, 50.0, 0.0, 0.0]),
        (3, [50.1, 50.0, 0.0, 0.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    probes = [(0, [0.0, 0.0, 10.0, 10.0])]
    out = [(r["vec_id"], r["rn"]) for r in
           pq.ivfpq_ann_topk(df, probes, coarse_k=2, m=2, k=2, dim=4,
                             nprobe=1, n=4).collect()]
    ids = [v for v, _ in out]
    assert set(ids) <= {0, 1}          # the far cell is never scanned
    assert ids[0] in (0, 1)
    release_caches()


def test_ivfpq_cache_hygiene(spark):
    from bacon_spark.llm import pq
    from bacon_spark.utils.caching import release_caches

    # order-independence: other fixtures (the demo CuttingBoard) own
    # long-lived slice caches; start from a clean shared cacheManager so
    # the emptiness asserts below see only THIS operator's persists.
    release_caches()
    spark.catalog.clearCache()

    rows = [(i, [float(i), 0.0, 1.0, 0.0]) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pq.ivfpq_ann_topk(df, [(0, [0.0, 0.0, 1.0, 0.0])], coarse_k=2, m=2,
                      k=2, dim=4, nprobe=1, n=3).collect()
    assert not spark._jsparkSession.sharedState().cacheManager().isEmpty()
    release_caches()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_qualify_pred_token_boundaries_and_literals():
    """ADVICE r6: predicate qualification must be token-boundary aware
    (doc_id is not id) and must not rewrite inside string literals."""
    from bacon_spark.llm.pq import _qualify_pred

    assert _qualify_pred("vec_id < 5", "vec_id", "e.vec_id") == "e.vec_id < 5"
    # substring identifiers are untouched
    assert _qualify_pred("doc_id < 5 AND id = 3", "id", "e.id") == (
        "doc_id < 5 AND e.id = 3"
    )
    # string literals are copied verbatim (including doubled quotes)
    assert _qualify_pred("tag = 'id' AND id > 1", "id", "pr.id") == (
        "tag = 'id' AND pr.id > 1"
    )
    assert _qualify_pred("tag = 'it''s id' AND id > 1", "id", "pr.id") == (
        "tag = 'it''s id' AND pr.id > 1"
    )
    # multiple bare references all qualify
    assert _qualify_pred("id > 1 OR id < -5", "id", "t.id") == (
        "t.id > 1 OR t.id < -5"
    )


def test_ivfpq_sql_pred_qualification_end_to_end(spark):
    """The DuckDB replay with an id column that is a SUBSTRING of
    another column name still parses and matches the Spark plan."""
    import duckdb
    import pandas as pd

    from bacon_spark.llm import pq
    from bacon_spark.utils.caching import release_caches

    rows = [
        (i, i * 10, [float(i % 4), float((i * 7) % 5), float(i % 3), 1.0])
        for i in range(24)
    ]
    df = spark.createDataFrame(rows, "id long, doc_id long, embedding array<double>")
    probes = [(int(r["id"]), list(r["embedding"])) for r in
              df.where("id < 3").collect()]
    got = sorted(
        (r["probe_id"], r["id"], r["rn"])
        for r in pq.ivfpq_ann_topk(
            df, probes, coarse_k=2, m=2, k=2, dim=4, nprobe=2, n=5, id_col="id"
        ).collect()
    )
    release_caches()
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(rows, columns=["id", "doc_id", "embedding"]),
    )
    sql = pq.ivfpq_ann_topk_sql(
        coarse_k=2, m=2, k=2, dim=4, nprobe=2, n=5,
        probe_pred="id < 3 AND doc_id >= 0", id_col="id",
    )
    want = sorted((r[0], r[1], r[3]) for r in con.execute(sql).fetchall())
    con.close()
    assert got == want
