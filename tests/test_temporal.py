"""As-of join and range join (operators/temporal.py).

The reference has no joins (SURVEY §2.4); these are scale-out extensions.
Correctness is pinned against hand-computed expectations and (for the
gate queries) the DuckDB oracle; plan shape is asserted because the whole
point of both operators is avoiding the quadratic physical plans Spark
would otherwise pick.
"""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from bacon_spark.operators.temporal import asof_join, range_join

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def ts(sec):
    return T0 + dt.timedelta(seconds=sec)


@pytest.fixture(scope="module")
def quotes(spark):
    # key, ts, price — the "right" side
    return spark.createDataFrame(
        [
            Row(sym="A", qts=ts(0), price=10.0),
            Row(sym="A", qts=ts(10), price=11.0),
            Row(sym="A", qts=ts(20), price=12.0),
            Row(sym="B", qts=ts(5), price=100.0),
        ]
    )


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            Row(sym="A", tts=ts(10), qty=1),   # exactly on a quote
            Row(sym="A", tts=ts(15), qty=2),   # between quotes
            Row(sym="A", tts=ts(25), qty=3),   # after last quote
            Row(sym="B", tts=ts(1), qty=4),    # before any quote of B
            Row(sym="C", tts=ts(9), qty=5),    # key with no quotes at all
        ]
    )


def _by_qty(rows):
    return {r["qty"]: (r["q_price"], r["q_qts"]) for r in rows}


def test_asof_backward_exact(quotes, trades):
    out = asof_join(trades, quotes, on=["sym"], left_ts="tts", right_ts="qts", prefix="q_")
    got = _by_qty(out.collect())
    assert got[1] == (11.0, ts(10))   # exact match included
    assert got[2] == (11.0, ts(10))   # most recent before
    assert got[3] == (12.0, ts(20))
    assert got[4] == (None, None)     # no quote yet
    assert got[5] == (None, None)     # key absent from right
    assert out.count() == 5           # left-join row preservation


def test_asof_backward_strict(quotes, trades):
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="tts", right_ts="qts",
        allow_exact_matches=False, prefix="q_",
    )
    got = _by_qty(out.collect())
    assert got[1] == (10.0, ts(0))    # equal-ts quote excluded


def test_asof_forward(quotes, trades):
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="tts", right_ts="qts",
        direction="forward", prefix="q_",
    )
    got = _by_qty(out.collect())
    assert got[1] == (11.0, ts(10))   # exact match included
    assert got[2] == (12.0, ts(20))   # next quote after
    assert got[3] == (None, None)     # nothing later
    assert got[4] == (100.0, ts(5))


def test_asof_forward_strict(quotes, trades):
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="tts", right_ts="qts",
        direction="forward", allow_exact_matches=False, prefix="q_",
    )
    got = _by_qty(out.collect())
    assert got[1] == (12.0, ts(20))   # equal-ts quote skipped forward


def test_asof_tolerance(quotes, trades):
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="tts", right_ts="qts",
        tolerance_us=5_000_000, prefix="q_",
    )
    got = _by_qty(out.collect())
    assert got[1] == (11.0, ts(10))   # gap 0 <= 5s
    assert got[2] == (11.0, ts(10))   # gap 5s, on the boundary -> kept
    assert got[3] == (12.0, ts(20))   # gap 5s, kept
    assert got[4] == (None, None)     # no earlier quote at all


def test_asof_plan_has_no_join(quotes, trades):
    out = asof_join(trades, quotes, on=["sym"], left_ts="tts", right_ts="qts", prefix="q_")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan  # union+window formulation: one shuffle, no join


def test_range_join_keyed(spark, quotes):
    # intervals per key: [qts, qts+10s) with the quote's price
    ivals = quotes.select(
        "sym", F.col("qts").alias("lo"),
        (F.col("qts") + F.expr("interval 10 seconds")).alias("hi"), "price",
    )
    pts = spark.createDataFrame(
        [Row(sym="A", pts=ts(12), tag="x"), Row(sym="A", pts=ts(45), tag="y")]
    )
    out = range_join(pts, ivals, point="pts", lower="lo", upper="hi", on=["sym"])
    rows = {r["tag"]: r["price"] for r in out.collect()}
    assert rows == {"x": 11.0}  # ts(45) matches nothing; inner join drops it


def test_range_join_bucketed_correct_and_hash_joined(spark):
    # no equality key: every point vs every interval would be a
    # BroadcastNestedLoopJoin; the bucketed path must give the same rows
    # through a hash join on the bucket id.
    pts = spark.createDataFrame(
        [Row(pid=i, pts=ts(i * 7)) for i in range(30)]
    )
    ivals = spark.createDataFrame(
        [
            Row(iid=1, lo=ts(10), hi=ts(40)),
            Row(iid=2, lo=ts(35), hi=ts(36)),   # narrow, overlaps iid=1
            Row(iid=3, lo=ts(100), hi=ts(130)),
            Row(iid=4, lo=ts(500), hi=ts(600)), # matches nothing
        ]
    )
    naive = pts.join(
        ivals,
        (F.col("pts") >= F.col("lo")) & (F.col("pts") < F.col("hi")),
        "inner",
    )
    want = sorted((r["pid"], r["iid"]) for r in naive.collect())
    assert want  # sanity: fixture produces matches

    out = range_join(
        pts, ivals, point="pts", lower="lo", upper="hi", bucket_us=30_000_000
    )
    got = sorted((r["pid"], r["iid"]) for r in out.collect())
    assert got == want
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_bucketed_no_duplicate_pairs(spark):
    # an interval spanning many buckets must still yield each pair once
    pts = spark.createDataFrame([Row(pid=1, pts=ts(50))])
    ivals = spark.createDataFrame([Row(iid=1, lo=ts(0), hi=ts(300))])
    out = range_join(pts, ivals, point="pts", lower="lo", upper="hi", bucket_us=10_000_000)
    assert out.count() == 1


def test_range_join_keyed_and_bucketed_match(spark, quotes):
    # bucket_us composes with equality keys (skewed-key split): results
    # must be identical to the plain keyed residual join
    ivals = quotes.select(
        "sym", F.col("qts").alias("lo"),
        (F.col("qts") + F.expr("interval 10 seconds")).alias("hi"), "price",
    )
    pts = spark.createDataFrame(
        [Row(sym="A", pts=ts(s), tag=f"t{s}") for s in (0, 3, 12, 21, 29, 45)]
        + [Row(sym="B", pts=ts(7), tag="b7")]
    )
    plain = range_join(pts, ivals, point="pts", lower="lo", upper="hi", on=["sym"])
    bucketed = range_join(
        pts, ivals, point="pts", lower="lo", upper="hi", on=["sym"],
        bucket_us=5_000_000,
    )
    want = sorted((r["tag"], r["price"]) for r in plain.collect())
    got = sorted((r["tag"], r["price"]) for r in bucketed.collect())
    assert got == want and want
    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_chunked_matches_plain(spark, quotes, trades):
    plain = asof_join(trades, quotes, on=["sym"], left_ts="tts", right_ts="qts", prefix="q_")
    chunked = asof_join(
        trades, quotes, on=["sym"], left_ts="tts", right_ts="qts", prefix="q_",
        chunk_us=7_000_000,
    )
    assert _by_qty(chunked.collect()) == _by_qty(plain.collect())


def test_asof_chunked_matches_plain_dense(spark):
    # denser interleaving across many chunk boundaries, incl. chunks with
    # no right rows (carry must jump several chunks) and strict ties,
    # both directions
    lrows = [Row(k=i % 3, lts=ts((i * 37) % 500), lid=i) for i in range(200)]
    rrows = [Row(k=i % 3, rts=ts((i * 91) % 300), rid=i) for i in range(60)]
    left = spark.createDataFrame(lrows)
    right = spark.createDataFrame(rrows).dropDuplicates(["k", "rts"])
    for direction in ("backward", "forward"):
        for exact in (True, False):
            plain = asof_join(
                left, right, on=["k"], left_ts="lts", right_ts="rts",
                direction=direction, allow_exact_matches=exact, prefix="r_",
            )
            chunked = asof_join(
                left, right, on=["k"], left_ts="lts", right_ts="rts",
                direction=direction, allow_exact_matches=exact, prefix="r_",
                chunk_us=25_000_000,
            )
            got = {r["lid"]: (r["r_rid"], r["r_rts"]) for r in chunked.collect()}
            want = {r["lid"]: (r["r_rid"], r["r_rts"]) for r in plain.collect()}
            assert got == want, (direction, exact)


def test_asof_chunked_forward_boundary(spark, quotes, trades):
    # forward carry: a trade in a chunk with no later in-chunk quote must
    # pick the earliest quote from a later chunk
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="tts", right_ts="qts",
        direction="forward", prefix="q_", chunk_us=7_000_000,
    )
    got = _by_qty(out.collect())
    assert got[2] == (12.0, ts(20))   # ts(15) -> quote at ts(20), next chunk
    assert got[3] == (None, None)     # nothing later in any chunk
    assert got[4] == (100.0, ts(5))


def test_asof_chunked_partitions_by_key_and_chunk(spark, quotes, trades):
    chunked = asof_join(
        trades, quotes, on=["sym"], left_ts="tts", right_ts="qts", prefix="q_",
        chunk_us=7_000_000,
    )
    plan = chunked._jdf.queryExecution().optimizedPlan().toString()
    assert "_chk" in plan  # data window runs per (key, chunk), not per key


def test_overlap_join_bucketed_matches_naive(spark):
    from bacon_spark.operators.temporal import overlap_join

    # sessions x windows, many shared buckets per pair (dedup must hold),
    # boundary-touching intervals (half-open: no match), zero-length
    sess = spark.createDataFrame(
        [
            Row(sid=1, s_lo=ts(0), s_hi=ts(100)),
            Row(sid=2, s_lo=ts(95), s_hi=ts(105)),
            Row(sid=3, s_lo=ts(200), s_hi=ts(200)),   # zero-length
            Row(sid=4, s_lo=ts(300), s_hi=ts(310)),
        ]
    )
    wins = spark.createDataFrame(
        [
            Row(wid=1, w_lo=ts(50), w_hi=ts(300)),    # spans many buckets
            Row(wid=2, w_lo=ts(100), w_hi=ts(110)),   # touches sid=1 boundary only
            Row(wid=3, w_lo=ts(310), w_hi=ts(320)),   # touches sid=4 upper
        ]
    )
    naive = sess.join(
        wins,
        (F.col("s_lo") < F.col("w_hi")) & (F.col("w_lo") < F.col("s_hi")),
        "inner",
    )
    want = sorted((r["sid"], r["wid"]) for r in naive.collect())
    assert want  # sanity
    got_rows = overlap_join(
        sess, wins, "s_lo", "s_hi", "w_lo", "w_hi", bucket_us=10_000_000
    ).collect()
    got = sorted((r["sid"], r["wid"]) for r in got_rows)
    assert got == want
    assert (1, 2) not in got  # half-open: [0,100) vs [100,110) don't overlap
    plan = overlap_join(
        sess, wins, "s_lo", "s_hi", "w_lo", "w_hi", bucket_us=10_000_000
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def test_overlap_join_keyed(spark):
    from bacon_spark.operators.temporal import overlap_join

    sess = spark.createDataFrame(
        [Row(k="a", sid=1, s_lo=ts(0), s_hi=ts(50)),
         Row(k="b", sid=2, s_lo=ts(0), s_hi=ts(50))]
    )
    wins = spark.createDataFrame([Row(k="a", wid=1, w_lo=ts(10), w_hi=ts(20))])
    out = overlap_join(sess, wins, "s_lo", "s_hi", "w_lo", "w_hi", on=["k"])
    assert [(r["sid"], r["wid"]) for r in out.collect()] == [(1, 1)]


def test_overlap_join_bucketed_rejects_outer(spark):
    from bacon_spark.operators.temporal import overlap_join

    df = spark.createDataFrame([Row(lo=ts(0), hi=ts(10))])
    df2 = df.select(F.col("lo").alias("lo2"), F.col("hi").alias("hi2"))
    with pytest.raises(ValueError):
        overlap_join(df, df2, "lo", "hi", "lo2", "hi2", how="left", bucket_us=1_000_000)


def test_asof_nearest(quotes, trades):
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="tts", right_ts="qts",
        direction="nearest", prefix="q_",
    )
    got = _by_qty(out.collect())
    assert got[1] == (11.0, ts(10))   # exact match, distance 0
    assert got[2] == (11.0, ts(10))   # 5s back == 5s fwd -> tie breaks backward
    assert got[3] == (12.0, ts(20))   # only a backward candidate
    assert got[4] == (100.0, ts(5))   # only a forward candidate
    assert got[5] == (None, None)     # key absent from right
    assert out.count() == 5


def test_asof_nearest_tolerance_per_side(quotes, trades):
    # tolerance nulls each directional candidate independently BEFORE the
    # nearest pick: qty=3 sits 5s after its only (backward) quote, so a
    # 4s tolerance leaves it unmatched rather than falling further back
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="tts", right_ts="qts",
        direction="nearest", tolerance_us=4_000_000, prefix="q_",
    )
    got = _by_qty(out.collect())
    assert got[1] == (11.0, ts(10))
    assert got[2] == (None, None)     # both candidates 5s away > 4s
    assert got[3] == (None, None)
    assert got[4] == (100.0, ts(5))


def test_asof_nearest_strict_excludes_exact(quotes, trades):
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="tts", right_ts="qts",
        direction="nearest", allow_exact_matches=False, prefix="q_",
    )
    got = _by_qty(out.collect())
    # trade at ts(10): quote at ts(10) excluded; ts(0) is 10s back,
    # ts(20) is 10s forward -> tie breaks backward
    assert got[1] == (10.0, ts(0))


def test_asof_nearest_matches_bruteforce(spark):
    # pin against a driver-side brute force over a dense interleaving,
    # plain and chunked paths both
    lrows = [Row(k=i % 3, lts=ts((i * 37) % 500), lid=i) for i in range(200)]
    rrows = [Row(k=i % 3, rts=ts((i * 91) % 300), rid=i) for i in range(60)]
    left = spark.createDataFrame(lrows)
    right = spark.createDataFrame(rrows).dropDuplicates(["k", "rts"])
    rmap = {}
    for r in right.collect():
        rmap.setdefault(r["k"], []).append((r["rts"], r["rid"]))

    def brute(lrow):
        best = None
        for rts, rid in rmap.get(lrow["k"], []):
            gap = abs((rts - lrow["lts"]).total_seconds())
            # tie -> backward (rts <= lts beats rts > lts at equal gap)
            rank = (gap, rts > lrow["lts"], -rid)
            if best is None or rank < best[0]:
                best = (rank, rid)
        return best[1] if best else None

    want = {r["lid"]: brute(r) for r in left.collect()}
    for kw in ({}, {"chunk_us": 25_000_000}):
        out = asof_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts",
            direction="nearest", prefix="r_", **kw,
        )
        got = {r["lid"]: r["r_rid"] for r in out.collect()}
        assert got == want, kw


def test_asof_nearest_single_shuffle(quotes, trades):
    # both directional windows share one hash partitioning: exactly one
    # exchange, and still no join node
    out = asof_join(
        trades, quotes, on=["sym"], left_ts="tts", right_ts="qts",
        direction="nearest", prefix="q_",
    )
    opt = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in opt
    phys = out._jdf.queryExecution().executedPlan().toString()
    assert phys.count("Exchange hashpartitioning") == 1
