"""Streaming interval-overlap join: emit every overlapping pair of
intervals from two streams, each pair exactly once, as a custom
stateful operator (``applyInPandasWithState``).

Absent in the reference (no joins, no streaming — SURVEY §2.4/§2.10);
Structured Streaming's built-in stream-stream join handles point-in-
interval conditions but its state cleanup reasons about a single event
time per side, so interval×interval overlap with bounded state needs
the custom-state escape hatch.

Design (scale): a symmetric hash join. Both sides are tagged, reduced
to (key-JSON, lower, upper, payload-JSON), unioned, watermarked on the
LOWER bound, and grouped into ``shards`` by key hash (with
``bucket_us``, by hash of (key, covered time bucket) — each interval
explodes JVM-side onto the buckets it covers, exactly the batch
``overlap_join`` trick, so a hot key's intervals split across time).
Per shard and trigger the new rows pair against state and against each
other (new×old, old×new, new×new — never old×old), which yields each
pair in exactly the first trigger where both sides exist; in bucketed
mode a pair sharing several buckets is emitted only in the first
shared bucket, ``floor(max(lowers)/bucket)``, so multi-bucket overlap
never duplicates. Pairs therefore emit AS SOON as the second side
arrives — no watermark wait and no flush sentinel; the watermark's
only job is state pruning: an interval is dropped once
``upper <= watermark``, because every future interval has
``lower >= watermark`` and can no longer overlap it. State is bounded
by the intervals still open at the horizon, not by stream length.

Payloads and keys cross the Python boundary as JSON strings (fixed
state schema for any input schema; types restored from the declared
output schema), as in ``streaming/asof.py``.
"""

from __future__ import annotations

import json
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["streaming_overlap_join"]

_STATE_SCHEMA = (
    "lkj array<string>, llo array<long>, lup array<long>, "
    "lpay array<string>, lbk array<long>, "
    "rkj array<string>, rlo array<long>, rup array<long>, "
    "rpay array<string>, rbk array<long>"
)


def _make_fn(
    key_names: list[str],
    left_cols: list[str],
    payload_cols: list[str],
    ts_names: set[str],
    prefix: str,
    bucket_us: int | None,
):
    out_names = [*key_names, *left_cols, *[prefix + c for c in payload_cols]]
    mk = ["_kj", "_bkt"] if bucket_us is not None else ["_kj"]

    def fn(key, pdf_iter, state):
        import pandas as pd

        cols = ["_kj", "_lo", "_up", "_pay", "_bkt"]
        if state.exists:
            st = state.get
            old_l = pd.DataFrame(dict(zip(cols, (list(x) for x in st[:5]))))
            old_r = pd.DataFrame(dict(zip(cols, (list(x) for x in st[5:]))))
        else:
            old_l = pd.DataFrame(columns=cols)
            old_r = pd.DataFrame(columns=cols)
        dt_ = {"_kj": "object", "_lo": "int64", "_up": "int64",
               "_pay": "object", "_bkt": "int64"}
        old_l, old_r = old_l.astype(dt_), old_r.astype(dt_)

        news = []
        if not state.hasTimedOut:
            for pdf in pdf_iter:
                news.append(
                    pd.DataFrame({
                        "_kj": pdf["_kj"],
                        "_lo": pdf["_lo_us"].astype("int64"),
                        "_up": pdf["_up_us"].astype("int64"),
                        "_pay": pdf["_pay"],
                        "_bkt": pdf["_bkt"].astype("int64"),
                        "_tag": pdf["_tag"],
                    })
                )
        new = (
            pd.concat(news, ignore_index=True)
            if news
            else pd.DataFrame(columns=[*cols, "_tag"]).astype({**dt_, "_tag": "int64"})
        )
        new_l = new[new["_tag"] == 1][cols].astype(dt_)
        new_r = new[new["_tag"] == 0][cols].astype(dt_)

        def pairs(l, r):
            if not (len(l) and len(r)):
                return None
            m = l.merge(r, on=mk, suffixes=("_l", "_r"))
            if not len(m):
                return None
            ok = (m["_lo_l"] < m["_up_r"]) & (m["_lo_r"] < m["_up_l"])
            if bucket_us is not None:
                first = m[["_lo_l", "_lo_r"]].max(axis=1)
                ok &= (first - first % bucket_us) // bucket_us == m["_bkt"]
            return m[ok]

        got = [p for p in (
            pairs(new_l, old_r), pairs(old_l, new_r), pairs(new_l, new_r)
        ) if p is not None and len(p)]

        wm_us = state.getCurrentWatermarkMs() * 1000
        keep_l = pd.concat([old_l, new_l], ignore_index=True)
        keep_r = pd.concat([old_r, new_r], ignore_index=True)
        keep_l = keep_l[keep_l["_up"] > wm_us]
        keep_r = keep_r[keep_r["_up"] > wm_us]
        if len(keep_l) or len(keep_r):
            state.update(tuple(
                df[c].tolist()
                for df in (keep_l, keep_r)
                for c in cols
            ))
            # wake on the next watermark advance purely to prune state
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
        elif state.exists:
            state.remove()

        if not got:
            return
        em = pd.concat(got, ignore_index=True)
        krecs = [json.loads(s) for s in em["_kj"]]
        lrecs = [json.loads(s) for s in em["_pay_l"]]
        rrecs = [json.loads(s) for s in em["_pay_r"]]
        out = {}
        for c in key_names:
            out[c] = [k.get(c) for k in krecs]
        for c in left_cols:
            out[c] = [r.get(c) for r in lrecs]
        for c in payload_cols:
            out[prefix + c] = [r.get(c) for r in rrecs]
        pdf = pd.DataFrame(out, columns=out_names)
        for n in out_names:
            if n in ts_names:
                pdf[n] = (
                    pd.to_datetime(pdf[n], format="ISO8601", utc=True)
                    .dt.tz_localize(None)
                )
        yield pdf

    return fn


def streaming_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lower: str,
    left_upper: str,
    lower: str,
    upper: str,
    on: Sequence[str] = (),
    *,
    bucket_us: int | None = None,
    prefix: str = "",
    delay: str = "1 hour",
    shards: int = 128,
) -> DataFrame:
    """Inner overlap join of two STREAMING frames (append output): every
    pair whose half-open intervals ``[left_lower, left_upper)`` and
    ``[lower, upper)`` intersect — matched on the equality columns
    ``on`` (same names both sides) — is emitted exactly once, in the
    first micro-batch where both rows have arrived.  Unlike the
    streaming as-of join, nothing waits for the watermark: the
    watermark (``delay`` behind the max LOWER bound seen) only prunes
    state, dropping an interval once its upper bound falls behind it.

    Keyless (or hot-keyed) streams need ``bucket_us``: intervals
    explode onto the time buckets they cover and pairing runs per
    (key, bucket), the streaming analogue of the batch
    ``overlap_join`` bucket path, with the same first-shared-bucket
    rule keeping each pair single.  Without ``bucket_us``, ``on`` must
    be non-empty (a keyless symmetric join would put every row in
    every shard's way).  Long-running intervals pin state until their
    upper bound passes the watermark — at 100 TB keep intervals
    clipped (e.g. session-ized) so the open set stays bounded.

    On batch frames this delegates to the batch ``overlap_join`` (same
    pair set), so batch runs pin the streaming semantics for oracles.
    Right columns appear as ``prefix + name``; names must not collide
    with left columns.
    """
    on = list(on)
    if not on and bucket_us is None:
        raise ValueError("streaming overlap join needs keys or bucket_us")
    left_cols = [c for c in left.columns if c not in on]
    payload_cols = [c for c in right.columns if c not in on]
    clash = set(left_cols) & {prefix + c for c in payload_cols}
    if clash:
        raise ValueError(f"output name collision (use prefix): {sorted(clash)}")

    if not (left.isStreaming or right.isStreaming):
        from functools import reduce
        from operator import and_

        from ..operators.temporal import overlap_join

        rk = [f"_rk_{k}" for k in on]
        r2 = right.select(
            *[F.col(k).alias(a) for k, a in zip(on, rk)],
            *[F.col(c).alias(prefix + c) for c in payload_cols],
        )
        extra = (
            reduce(and_, [left[k] == F.col(a) for k, a in zip(on, rk)])
            if on
            else None
        )
        import warnings

        with warnings.catch_warnings():
            # keyed-but-unbucketed: the key equalities in `extra` make
            # this an equi-join, so the keyless nested-loop warning the
            # batch operator emits does not apply
            warnings.simplefilter("ignore")
            j = overlap_join(
                left, r2, left_lower, left_upper,
                prefix + lower, prefix + upper,
                bucket_us=bucket_us, extra=extra,
            )
        return j.drop(*rk)

    from pyspark.sql.streaming.state import GroupStateTimeout

    jopt = {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"}
    kj = F.to_json(F.struct(*[F.col(c) for c in on]), jopt)

    def prep(df, lo, up, cols, tag):
        lo_us, up_us = F.unix_micros(F.col(lo)), F.unix_micros(F.col(up))
        out = df.select(
            kj.alias("_kj"),
            F.col(lo).alias("_lo"),
            lo_us.alias("_lo_us"),
            up_us.alias("_up_us"),
            F.lit(tag).alias("_tag"),
            F.to_json(F.struct(*[F.col(c) for c in cols]), jopt).alias("_pay"),
        )
        if bucket_us is None:
            return out.withColumn("_bkt", F.lit(0))
        b = F.lit(bucket_us)

        def bkt(us):
            return ((us - us % b) / b).cast("long")

        # upper is exclusive: last covered bucket holds (upper - 1us)
        return out.withColumn(
            "_bkt",
            F.explode(
                F.sequence(bkt(F.col("_lo_us")), bkt(F.col("_up_us") - F.lit(1)))
            ),
        )

    merged = (
        prep(left, left_lower, left_upper, left_cols, 1)
        .unionByName(prep(right, lower, upper, payload_cols, 0))
        .withColumn("_shard", F.pmod(F.hash("_kj", "_bkt"), F.lit(shards)))
        .withWatermark("_lo", delay)
    )

    lf = {f.name: f for f in left.schema.fields}
    rf = {f.name: f for f in right.schema.fields}
    out_fields = (
        [(k, lf[k].dataType.simpleString()) for k in on]
        + [(c, lf[c].dataType.simpleString()) for c in left_cols]
        + [(prefix + c, rf[c].dataType.simpleString()) for c in payload_cols]
    )
    ddl = ", ".join(f"`{n}` {t}" for n, t in out_fields)
    ts_names = {n for n, t in out_fields if t.startswith("timestamp")}

    fn = _make_fn(on, left_cols, payload_cols, ts_names, prefix, bucket_us)
    return merged.groupBy("_shard").applyInPandasWithState(
        fn, ddl, _STATE_SCHEMA, "append", GroupStateTimeout.EventTimeTimeout
    )
