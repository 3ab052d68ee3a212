"""Connected components (operators/graph.py) — large-star/small-star."""

import random

from pyspark.sql import Row

from bacon_spark.operators.graph import connected_components


def _got(df):
    return {r["id"]: r["component"] for r in df.collect()}


def _union_find(n_edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in n_edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min of component
    label = {}
    for x in list(parent):
        r = find(x)
        label.setdefault(r, r)
        label[x] = min(label.get(x, x), r)
    return {x: find(x) for x in parent}


def test_cc_chain_converges_fast(spark):
    # a 40-node path is the adversarial case for plain label propagation
    # (diameter rounds); star-contraction must still finish well under
    # max_iter and label everything with the minimum
    edges = spark.createDataFrame([Row(src=i, dst=i + 1) for i in range(40)])
    out = _got(connected_components(edges, max_iter=12))
    assert out == {i: 0 for i in range(41)}


def test_cc_multiple_components_and_self_loops(spark):
    edges = spark.createDataFrame(
        [
            Row(src=5, dst=3),
            Row(src=3, dst=9),
            Row(src=7, dst=7),      # self loop: ignored entirely
            Row(src=20, dst=21),
            Row(src=22, dst=21),
        ]
    )
    out = _got(connected_components(edges))
    assert out == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20, 22: 20}
    assert 7 not in out  # self-loop-only vertex has no edges


def test_cc_string_ids(spark):
    edges = spark.createDataFrame(
        [Row(src="banana", dst="apple"), Row(src="banana", dst="cherry"),
         Row(src="x", dst="y")]
    )
    out = _got(connected_components(edges))
    assert out == {
        "apple": "apple", "banana": "apple", "cherry": "apple",
        "x": "x", "y": "x",
    }


def test_cc_random_vs_union_find(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(300), rng.randrange(300)) for _ in range(250)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame([Row(src=a, dst=b) for a, b in edges])
    want = _union_find(edges)
    assert _got(connected_components(df)) == want
