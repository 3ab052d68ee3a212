"""Temporal joins: as-of join and range (interval) join.

Absent from the reference (it has no joins at all, SURVEY §2.4 —
/root/reference/bacon/sql.py:301-330 is the closest thing); these are the
two temporal operators a time-series/training-data pipeline needs and that
Spark lacks as built-ins.

Scale design (100 TB):

* ``asof_join`` is the union+window formulation: tag both inputs, union,
  sort each key partition once by (ts, tag), and carry the latest right
  payload forward with ``last(ignorenulls)``.  That is ONE shuffle of
  left+right on the key — no per-key range explosion, no nested-loop
  join, and skew behaves like any window (AQE-visible).  The pandas-style
  alternative (per-key merge in applyInPandas) moves every byte through
  Python; this stays whole-stage-codegen except nothing — it is pure JVM.
* ``range_join`` with equality keys is a plain shuffled join with the
  interval as a residual predicate.  WITHOUT equality keys Spark would
  plan BroadcastNestedLoopJoin (quadratic scans); instead we bucketize
  the time axis: each left point gets one bucket id, each right interval
  explodes to the few bucket ids it covers, and the join runs on bucket
  equality with the interval as residual — a hash join whose fan-out is
  bounded by interval_length/bucket + 1.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "overlap_join", "range_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str | None = None,
    *,
    direction: str = "backward",
    allow_exact_matches: bool = True,
    tolerance_us: int | None = None,
    prefix: str = "",
    chunk_us: int | None = None,
) -> DataFrame:
    """Left as-of join: for every left row, the single right row with the
    nearest ``right_ts`` at-or-before (``backward``) / at-or-after
    (``forward``) / closest in absolute distance (``nearest``, ties
    break backward) the left row's ``left_ts``, matching on the equality
    columns ``on`` (same names both sides).  Unmatched left rows keep
    nulls (left-join semantics).  ``nearest`` computes both directional
    candidates over the SAME union — still one shuffle on the key (two
    sorts inside one exchange) — and picks per row after applying
    ``tolerance_us`` to each side independently.

    Every non-key right column (including ``right_ts``) appears in the
    output as ``prefix + name``.  ``tolerance_us`` nulls the match when
    ``|left_ts - right_ts|`` exceeds that many microseconds.  When several
    right rows share (key, ts) the winner is the greatest payload struct —
    deterministic, but callers should de-duplicate for meaningful output.

    ``chunk_us`` is the hot-key scale path: the window normally sorts
    each key in ONE task, so a key holding a large share of the data
    serializes.  With chunking, rows partition by (key, time-chunk) — a
    hot key splits across chunks — and matches that cross a chunk
    boundary are patched from a per-(key, chunk) "carry" table of each
    chunk's latest (backward) / earliest (forward) right row, itself
    tiny (≤ one row per key per chunk) and prefix-/suffix-scanned per
    key.  Results are identical to the unchunked path
    (equivalence-tested both directions).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    dirs = ("backward", "forward") if direction == "nearest" else (direction,)
    rt = right_ts or left_ts
    on = list(on)
    payload_cols = [c for c in right.columns if c not in on]
    r2 = right.select(
        *on,
        F.col(rt).alias("_asof_ts"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_asof"),
    )
    l2 = left.withColumn("_asof_ts", F.col(left_ts))

    # Tie handling via a per-direction sort tag: the window frame is
    # anchored at the left row (tag 1), so a right row with equal ts is
    # included iff it sorts on the frame's side of the left row.
    def right_tag(d: str) -> int:
        if d == "backward":
            return 0 if allow_exact_matches else 2
        return 2 if allow_exact_matches else 0

    FRAMES = {
        "backward": (Window.unboundedPreceding, Window.currentRow),
        "forward": (Window.currentRow, Window.unboundedFollowing),
    }
    PICKS = {"backward": F.last, "forward": F.first}

    rr, ll = r2.withColumn("_tag", F.lit(0)), l2.withColumn("_tag", F.lit(1))
    for d in dirs:
        rr = rr.withColumn(f"_ot_{d}", F.lit(right_tag(d)))
        ll = ll.withColumn(f"_ot_{d}", F.lit(1))
    merged = rr.unionByName(ll, allowMissingColumns=True)

    def order(d: str):
        return [
            F.col("_asof_ts"),
            F.col(f"_ot_{d}"),
            F.col("_asof").asc_nulls_first(),
        ]

    if chunk_us is None:
        # all windows share partitionBy(on): ONE exchange, one sort per
        # direction inside it
        matched = merged
        for d in dirs:
            w = Window.partitionBy(*on).orderBy(*order(d)).rowsBetween(*FRAMES[d])
            matched = matched.withColumn(
                f"_m_{d}", PICKS[d]("_asof", ignorenulls=True).over(w)
            )
        matched = matched.filter(F.col("_tag") == 1)
    else:
        b = F.lit(chunk_us)
        us = F.unix_micros(F.col("_asof_ts"))
        merged = merged.withColumn("_chk", ((us - us % b) / b).cast("long"))
        # carry into a chunk = best right row of ANY earlier chunk
        # (backward) / later chunk (forward): a running extremum over the
        # (key, chunk) sequence — which must include every chunk the LEFT
        # visits too (a chunk with no right rows still inherits the carry
        # across it). Exactness never matters here: rows in another chunk
        # are strictly before/after every ts in this one. Rows number at
        # most keys x chunks (distinct is map-side-combined down to
        # that), so this window is cheap and, unlike the data window,
        # never hot.
        chunk_ids = merged.select(*on, "_chk").distinct()
        r_chunked = r2.withColumn(
            "_chk",
            (
                (F.unix_micros(F.col("_asof_ts")) - F.unix_micros(F.col("_asof_ts")) % b)
                / b
            ).cast("long"),
        )
        matched = merged
        carries = []
        for d in dirs:
            # per-(key, chunk) best right row as a struct extremum on
            # (ts, payload): backward wants the latest (struct max = max
            # ts, then max payload — the winner the in-chunk `last`
            # picks), forward the earliest (struct min — the in-chunk
            # `first` winner)
            chunk_agg = F.max if d == "backward" else F.min
            chunk_best = r_chunked.groupBy(*on, "_chk").agg(
                chunk_agg(F.struct(F.col("_asof_ts"), F.col("_asof"))).alias("_cl")
            )
            carry_frame = (
                (Window.unboundedPreceding, -1)
                if d == "backward"
                else (1, Window.unboundedFollowing)
            )
            wc = (
                Window.partitionBy(*on)
                .orderBy(F.col("_chk"))
                .rowsBetween(*carry_frame)
            )
            carries.append(
                chunk_ids.join(chunk_best, on=[*on, "_chk"], how="left").select(
                    *on,
                    "_chk",
                    chunk_agg("_cl").over(wc).getField("_asof").alias(f"_carry_{d}"),
                )
            )
            w = (
                Window.partitionBy(*on, "_chk")
                .orderBy(*order(d))
                .rowsBetween(*FRAMES[d])
            )
            matched = matched.withColumn(
                f"_m0_{d}", PICKS[d]("_asof", ignorenulls=True).over(w)
            )
        matched = matched.filter(F.col("_tag") == 1)
        for d, carry in zip(dirs, carries):
            matched = matched.join(carry, on=[*on, "_chk"], how="left").withColumn(
                f"_m_{d}", F.coalesce(F.col(f"_m0_{d}"), F.col(f"_carry_{d}"))
            )

    def with_tol(m: Column) -> Column:
        if tolerance_us is None:
            return m
        gap = F.abs(F.unix_micros(F.col(left_ts)) - F.unix_micros(m.getField(rt)))
        return F.when(gap <= F.lit(tolerance_us), m)

    if direction != "nearest":
        m = with_tol(F.col(f"_m_{direction}"))
    else:
        mb = with_tol(F.col("_m_backward"))
        mf = with_tol(F.col("_m_forward"))
        gb = F.unix_micros(F.col(left_ts)) - F.unix_micros(mb.getField(rt))
        gf = F.unix_micros(mf.getField(rt)) - F.unix_micros(F.col(left_ts))
        m = (
            F.when(mb.isNull(), mf)
            .when(mf.isNull(), mb)
            .when(gf < gb, mf)
            .otherwise(mb)
        )
    out_cols = [F.col(c) for c in left.columns]
    out_cols += [m.getField(c).alias(prefix + c) for c in payload_cols]
    return matched.select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    point: str,
    lower: str,
    upper: str,
    on: Sequence[str] = (),
    *,
    how: str = "inner",
    bucket_us: int | None = None,
    extra: Column | None = None,
) -> DataFrame:
    """Join left points to right intervals: ``lower <= point < upper``
    (plus optional equality keys ``on`` and an ``extra`` residual
    predicate).  ``point``/``lower``/``upper`` are timestamp columns
    (``point`` on left, bounds on right).

    With equality keys the interval is a residual on a normal shuffled
    equi-join.  Without keys, pass ``bucket_us``: both sides are mapped to
    time-bucket ids (intervals explode to every bucket they cover) and the
    join runs on bucket equality — a hash join instead of the
    BroadcastNestedLoopJoin Spark plans for pure inequality joins.
    Pick ``bucket_us`` near the typical interval length so intervals
    explode to ~2 buckets.  ``bucket_us`` composes with keys too: joining
    on (keys, bucket) splits a skewed key's rows across time, so one hot
    key with millions of intervals no longer meets every one of its
    points in a single hash bucket.
    """
    p_us = F.unix_micros(F.col(point))
    lo_us = F.unix_micros(F.col(lower))
    up_us = F.unix_micros(F.col(upper))
    cond = (p_us >= lo_us) & (p_us < up_us)
    if extra is not None:
        cond = cond & extra
    for k in on:
        cond = cond & (left[k] == right[k])
    if bucket_us is None:
        if not on:
            import warnings

            warnings.warn(
                "range_join without keys or bucket_us plans a nested-loop "
                "join; pass bucket_us for a hash join",
                stacklevel=2,
            )
        return left.join(right, cond, how)

    b = F.lit(bucket_us)

    def bkt(us: Column) -> Column:
        # exact integer bucketing: (us - us % b) is an exact multiple of b
        # and both fit a double's 53-bit mantissa, so the division is
        # exact — a bare us/b float division can round across a bucket
        # boundary at epoch magnitudes
        return ((us - us % b) / b).cast("long")

    l2 = left.withColumn("_bkt", bkt(p_us))
    r2 = right.withColumn("_bkt", F.explode(F.sequence(bkt(lo_us), bkt(up_us))))
    jcond = l2["_bkt"] == r2["_bkt"]
    for k in on:
        jcond = jcond & (l2[k] == r2[k])
    jcond = jcond & (p_us >= lo_us) & (p_us < up_us)
    if extra is not None:
        jcond = jcond & extra
    joined = l2.join(r2, jcond, how)
    return joined.drop(l2["_bkt"]).drop(r2["_bkt"])


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lower: str,
    left_upper: str,
    lower: str,
    upper: str,
    on: Sequence[str] = (),
    *,
    how: str = "inner",
    bucket_us: int | None = None,
    extra: Column | None = None,
) -> DataFrame:
    """Interval-overlap join: match when ``[left_lower, left_upper)``
    intersects ``[right.lower, right.upper)`` (half-open on both sides),
    plus optional equality keys and an ``extra`` residual.  The
    interval-x-interval sibling of ``range_join`` (sessions x maintenance
    windows, readings x outages).

    Without ``bucket_us`` the interval test rides a keyed equi-join (or,
    keyless, a warned nested-loop).  With ``bucket_us`` BOTH sides
    explode onto the time buckets they cover and join on bucket
    equality; a pair sharing several buckets would duplicate, so a match
    is emitted only in the FIRST bucket the two intervals share —
    ``floor(max(lowers)/bucket)`` — which keeps each pair exactly once
    without a distinct pass.  Column names must be unambiguous across
    the two frames (rename before a self-join).

    The bucketed path supports ``how='inner'`` only: outer semantics
    over an exploded left side would need a row identity to collapse
    per-bucket unmatched copies.  Recover left-join behavior at the call
    site by re-joining the inner result (or its aggregate) onto the
    original left frame.
    """
    if bucket_us is not None and how != "inner":
        raise ValueError("bucketed overlap_join supports how='inner' only")
    llo = F.unix_micros(F.col(left_lower))
    lup = F.unix_micros(F.col(left_upper))
    rlo = F.unix_micros(F.col(lower))
    rup = F.unix_micros(F.col(upper))
    cond = (llo < rup) & (rlo < lup)
    if extra is not None:
        cond = cond & extra
    for k in on:
        cond = cond & (left[k] == right[k])
    if bucket_us is None:
        if not on:
            import warnings

            warnings.warn(
                "overlap_join without keys or bucket_us plans a nested-loop "
                "join; pass bucket_us for a hash join",
                stacklevel=2,
            )
        return left.join(right, cond, how)

    b = F.lit(bucket_us)

    def bkt(us: Column) -> Column:
        return ((us - us % b) / b).cast("long")

    # upper bounds are exclusive: the last covered bucket is the one
    # holding (upper - 1us), so zero-length intervals cover nothing and
    # an interval ending exactly on a boundary doesn't leak into the
    # next bucket
    l2 = left.withColumn(
        "_bkt", F.explode(F.sequence(bkt(llo), bkt(lup - F.lit(1))))
    )
    r2 = right.withColumn(
        "_bkt", F.explode(F.sequence(bkt(rlo), bkt(rup - F.lit(1))))
    )
    jcond = l2["_bkt"] == r2["_bkt"]
    for k in on:
        jcond = jcond & (l2[k] == r2[k])
    jcond = jcond & (llo < rup) & (rlo < lup)
    # dedup: emit only in the first shared bucket
    jcond = jcond & (l2["_bkt"] == bkt(F.greatest(llo, rlo)))
    if extra is not None:
        jcond = jcond & extra
    joined = l2.join(r2, jcond, how)
    return joined.drop(l2["_bkt"]).drop(r2["_bkt"])
