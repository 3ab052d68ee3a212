"""Temporal / event-analytics gates: as-of & range joins, SCD2 and
point-in-time lookups, sessionization, funnels, retention, EWMA,
gap detection, rolling windows, drift.

Split from the original single-module query inventory (r4); the
registration registry and helpers live in gate/_base.py.
"""

from ._base import *  # noqa: F401,F403


@query(
    "q59_asof_join",
    """
    SELECT e.event_id, e.user_id, e.value,
           c.event_id AS click_event_id,
           epoch_us(e.ts) - epoch_us(c.ts) AS gap_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') e
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON e.user_id = c.user_id AND e.ts >= c.ts
    """,
)
def q59_asof_join(spark, sf_dir):
    """As-of join (operators/temporal.py): each purchase event matched to
    the same user's most recent click at-or-before it; purchases with no
    prior click keep nulls. Union+window formulation — one shuffle on
    user_id, no join node, no per-key range explosion."""
    ev = _read(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    out = _temporal.asof_join(
        purchases, clicks, on=["user_id"], left_ts="ts", prefix="click_"
    )
    return out.select(
        "event_id",
        "user_id",
        "value",
        F.col("click_event_id"),
        (F.unix_micros("ts") - F.unix_micros("click_ts")).alias("gap_us"),
    )


@query(
    "q60_range_join",
    """
    SELECT e.event_id AS error_id,
           count(x.event_id) AS n_events,
           round(cast(sum(cast(x.value as decimal(38,4))) as double), 2) AS sum_value
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    LEFT JOIN events x
      ON x.ts >= e.ts AND x.ts < e.ts + INTERVAL 60 SECOND
     AND x.event_id <> e.event_id
    GROUP BY 1
    """,
)
def q60_range_join(spark, sf_dir):
    """Range join (operators/temporal.py): events inside the 60s window
    after each error event, with NO equality key — the bucketed path
    (points and exploded intervals hash-join on a 60s time bucket) replaces
    the BroadcastNestedLoopJoin Spark would plan for a pure inequality
    join. Interval fan-out is bounded at 2 buckets per error."""
    ev = _read(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("lo"),
        (F.col("ts") + F.expr("interval 60 seconds")).alias("hi"),
    )
    points = ev.select(
        F.col("event_id").alias("x_id"), F.col("ts").alias("pts"),
        F.col("value").cast("decimal(38,4)").alias("x_value"),
    )
    joined = _temporal.range_join(
        points,
        errors,
        point="pts",
        lower="lo",
        upper="hi",
        how="right",
        bucket_us=60_000_000,
        extra=F.col("x_id") != F.col("error_id"),
    )
    out = joined.groupBy("error_id").agg(
        F.count("x_id").alias("n_events"), F.sum("x_value").alias("sum_value")
    )
    return finalize(out, {"sum_value": 2})


@query(
    "q63_overlap_join",
    """
    WITH spans AS (
      SELECT user_id, event_type,
             date_trunc('week', ts) AS wk,
             min(ts) AS lo,
             max(ts) + INTERVAL 1 MICROSECOND AS hi
      FROM events GROUP BY 1, 2, 3
    ),
    err AS (SELECT * FROM spans WHERE event_type = 'error'),
    pur AS (SELECT * FROM spans WHERE event_type = 'purchase')
    SELECT err.user_id, strftime(err.wk, '%Y-%m-%d') AS week,
           count(pur.user_id) AS n_overlaps
    FROM err LEFT JOIN pur
      ON err.lo < pur.hi AND pur.lo < err.hi
    GROUP BY 1, 2
    """,
)
def q63_overlap_join(spark, sf_dir):
    """Interval-overlap join (operators/temporal.py): per-(user, week)
    error-activity spans overlap-joined against ALL purchase-activity
    spans with NO equality key — the bucketed path (both interval sides
    explode onto day buckets, match emitted only in the first shared
    bucket) keeps it a hash join. Half-open spans [min_ts, max_ts+1us)."""
    ev = _read(spark, sf_dir, "events")
    spans = (
        ev.groupBy(
            "user_id",
            F.date_trunc("week", F.col("ts")).alias("wk"),
            "event_type",
        )
        .agg(
            F.min("ts").alias("lo"),
            (F.max("ts") + F.expr("interval 1 microsecond")).alias("hi"),
        )
    )
    err = spans.filter(F.col("event_type") == "error").select(
        "user_id", F.col("wk").alias("err_wk"),
        F.col("lo").alias("err_lo"), F.col("hi").alias("err_hi"),
    )
    pur = spans.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("lo").alias("p_lo"), F.col("hi").alias("p_hi"),
    )
    joined = _temporal.overlap_join(
        err, pur, "err_lo", "err_hi", "p_lo", "p_hi",
        bucket_us=86_400_000_000,
    )
    counts = joined.groupBy("user_id", "err_wk").agg(
        F.count("p_user").alias("n_overlaps")
    )
    # left-join semantics (error spans with zero overlaps) recovered by
    # re-joining the inner-join counts onto the span frame — the bucketed
    # path is inner-only by design
    return (
        err.select("user_id", "err_wk")
        .join(counts, ["user_id", "err_wk"], "left")
        .select(
            "user_id",
            F.date_format("err_wk", "yyyy-MM-dd").alias("week"),
            F.coalesce(F.col("n_overlaps"), F.lit(0)).alias("n_overlaps"),
        )
    )


@query(
    "q65_lattice_range_drill",
    """
    SELECT l_returnflag AS returnflag,
           round(cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(38,4))) as double), 2) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE date_trunc('month', l_shipdate) >= DATE '1997-06-01'
    GROUP BY 1
    """,
)
def q65_lattice_range_drill(spark, sf_dir):
    """Range-filtered query served FROM a registered cube lattice: the
    planner reads the (returnflag, ship_month) grain, applies the >= bound
    to the materialized month values (a scan-bound over aggregate-sized
    data, not a base re-scan), and merges finished values down to
    returnflag — allowed because Sum/Count are reaggregatable. Extends the
    eq/in lattice drills to every row-level filter op (engine._lattice_plan);
    plan shape asserted in tests/test_scale_ops.py."""
    from ..operators.lattice import CubeLattice

    cd = CubeDef("li")
    cd.add_label(Label("returnflag", "l_returnflag"))
    cd.add_label(Label("ship_month", "cast(date_trunc('month', l_shipdate) as date)"))
    cd.add_measure(
        Measure("revenue", dec("l_extendedprice * (1 - l_discount)"), acc=Sum())
    )
    cd.add_measure(Measure("n", "l_orderkey", acc=Count()))
    li = _read(spark, sf_dir, "lineitem")
    board = CuttingBoard(cd, li, cache_results=False)
    lat = CubeLattice(
        cd, li, axes=("returnflag", "ship_month"),
        values=("revenue", "n"), persist=False,
    )
    board.register_lattice(lat)
    q = (
        CubeQuery()
        .add_axis("returnflag")
        .add_value("revenue")
        .add_value("n")
        .add_filter("ship_month", "ge", dt.date(1997, 6, 1))
    )
    return finalize(board.slice(q).to_df(), {"revenue": 2})


@query(
    "q68_asof_nearest",
    """
    WITH e AS (SELECT * FROM events WHERE event_type = 'purchase'),
    c AS (SELECT * FROM events WHERE event_type = 'click'),
    b AS (SELECT e.event_id, c.event_id AS bid, c.ts AS bts
          FROM e ASOF LEFT JOIN c
            ON e.user_id = c.user_id AND e.ts >= c.ts),
    f AS (SELECT e.event_id, c.event_id AS fid, c.ts AS fts
          FROM e ASOF LEFT JOIN c
            ON e.user_id = c.user_id AND e.ts <= c.ts)
    SELECT e.event_id, e.user_id,
      CASE WHEN b.bid IS NULL THEN f.fid
           WHEN f.fid IS NULL THEN b.bid
           WHEN epoch_us(f.fts) - epoch_us(e.ts)
              < epoch_us(e.ts) - epoch_us(b.bts) THEN f.fid
           ELSE b.bid END AS click_event_id,
      CASE WHEN b.bid IS NULL THEN epoch_us(f.fts) - epoch_us(e.ts)
           WHEN f.fid IS NULL THEN epoch_us(b.bts) - epoch_us(e.ts)
           WHEN epoch_us(f.fts) - epoch_us(e.ts)
              < epoch_us(e.ts) - epoch_us(b.bts)
             THEN epoch_us(f.fts) - epoch_us(e.ts)
           ELSE epoch_us(b.bts) - epoch_us(e.ts) END AS gap_us
    FROM e
    JOIN b USING (event_id)
    JOIN f USING (event_id)
    """,
)
def q68_asof_nearest(spark, sf_dir):
    """Nearest-direction as-of join (operators/temporal.py): each
    purchase matched to the same user's click closest in time, either
    side, ties breaking backward. One shuffle on user_id — both
    directional candidates come from two window passes inside the same
    exchange, no join node. The oracle reconstructs 'nearest' from
    DuckDB's backward and forward ASOF joins plus a CASE pick, which
    also pins the tie-break (forward wins only on strictly smaller
    gap)."""
    ev = _read(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    out = _temporal.asof_join(
        purchases, clicks, on=["user_id"], left_ts="ts",
        direction="nearest", prefix="click_",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("click_event_id"),
        (F.unix_micros("click_ts") - F.unix_micros("ts")).alias("gap_us"),
    )


@query(
    "q90_rolling_1h_window",
    """
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           count(*) OVER w AS n_1h,
           round(cast(sum(cast(value as decimal(38,4))) OVER w as double), 2) AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
)
def q90_rolling_1h_window(spark, sf_dir):
    """Time-RANGE window frame: per user, the rolling 1-hour event count
    and value sum ending at each event — Window.rangeBetween over epoch
    microseconds (not ROWS: peers at the same instant and irregular event
    spacing are handled by value range, the semantics ROWS frames get
    wrong). The sum runs in exact decimal inside the frame so the
    engine's sliding-frame accumulation order cannot flap the oracle.

    Scale shape: one hash shuffle on user_id, per-partition sort by time,
    frame maintained incrementally (add/evict) — no self-join, no
    explode-by-interval blowup; state is the frame's width, not the
    partition's."""
    from pyspark.sql import Window

    ev = _read(spark, sf_dir, "events").withColumn("t_us", F.unix_micros("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_us")
        .rangeBetween(-3_600_000_000, 0)
    )
    out = ev.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.round(F.sum(F.expr(dec("value"))).over(w).cast("double"), 2).alias("sum_1h"),
    )
    return out.orderBy("event_id")


@query(
    "q92_event_funnel",
    """
    WITH u AS (SELECT DISTINCT user_id FROM events),
    v AS (SELECT user_id, min(ts) AS t FROM events WHERE event_type = 'view' GROUP BY 1),
    c AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND epoch_us(e.ts) >= epoch_us(v.t)
        AND epoch_us(e.ts) < epoch_us(v.t) + 86400000000 GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= epoch_us(c.t)
        AND epoch_us(e.ts) < epoch_us(c.t) + 86400000000 GROUP BY 1
    ),
    staged AS (
      SELECT u.user_id,
             CASE WHEN p.user_id IS NOT NULL THEN 3
                  WHEN c.user_id IS NOT NULL THEN 2
                  WHEN v.user_id IS NOT NULL THEN 1 ELSE 0 END AS stage,
             epoch_us(p.t) - epoch_us(v.t) AS lat_us
      FROM u
      LEFT JOIN v ON u.user_id = v.user_id
      LEFT JOIN c ON u.user_id = c.user_id
      LEFT JOIN p ON u.user_id = p.user_id
    )
    SELECT stage, count(*)::BIGINT AS n_users,
           (sum(lat_us) // 1000000)::BIGINT AS sum_latency_s
    FROM staged GROUP BY 1 ORDER BY 1
    """,
)
def q92_event_funnel(spark, sf_dir):
    """Ordered conversion funnel over the event stream: view -> first
    click within 24 hours of the first view -> first purchase within 24
    hours of that click; users counted at their deepest ordered stage, with the total
    view->purchase latency for full conversions (integer microsecond
    arithmetic — no float). The sequential-pattern query every product
    analytics stack runs.

    Scale shape: three conditional min-aggregations all keyed user_id —
    one shuffle establishes the key partitioning and the subsequent
    joins/aggs are co-partitioned (no re-exchange under AQE); event rows
    are filtered to the funnel's event types before any shuffle."""
    ev = _read(spark, sf_dir, "events")
    u = ev.select("user_id").distinct()
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.unix_micros("ts") >= F.unix_micros("t_view"))
            & (F.unix_micros("ts") < F.unix_micros("t_view") + 86_400_000_000)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.unix_micros("ts") >= F.unix_micros("t_click"))
            & (F.unix_micros("ts") < F.unix_micros("t_click") + 86_400_000_000)
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_buy"))
    )
    staged = (
        u.join(v, "user_id", "left")
        .join(c.select("user_id", "t_click"), "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            F.when(F.col("t_buy").isNotNull(), 3)
            .when(F.col("t_click").isNotNull(), 2)
            .when(F.col("t_view").isNotNull(), 1)
            .otherwise(0)
            .alias("stage"),
            (F.unix_micros("t_buy") - F.unix_micros("t_view")).alias("lat_us"),
        )
    )
    out = staged.groupBy("stage").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.expr("sum(lat_us) div 1000000").cast("long").alias("sum_latency_s"),
    )
    return out.orderBy("stage")


@query(
    "q94_cumulative_users",
    """
    WITH fs AS (
      SELECT user_id, min(cast(ts AS date)) AS d FROM events GROUP BY 1
    ),
    daily AS (SELECT d, count(*) AS n_new FROM fs GROUP BY 1)
    SELECT strftime(d, '%Y-%m-%d') AS day, n_new::BIGINT AS n_new,
           (sum(n_new) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_users
    FROM daily ORDER BY d
    """,
)
def q94_cumulative_users(spark, sf_dir):
    """Cumulative-distinct-users-by-day without a running COUNT DISTINCT:
    reduce each user to their first-seen date (one narrow agg), count new
    users per day, then a running integer sum — the standard trick that
    turns an unbounded distinct-state metric into bounded aggregation
    state. The global ordered window runs over the DAY-cardinality frame
    (already aggregated, tiny), so the single-partition window is not a
    scale bottleneck."""
    from pyspark.sql import Window

    ev = _read(spark, sf_dir, "events")
    fs = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d"))
    daily = fs.groupBy("d").agg(F.count(F.lit(1)).alias("n_new"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.col("n_new").cast("long").alias("n_new"),
            F.sum("n_new").over(w).cast("long").alias("cum_users"),
        )
        .orderBy("day")
    )


@query(
    "q95_retention_cohorts",
    """
    WITH fs AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort FROM events GROUP BY 1
    ),
    act AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
    )
    SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort_week,
           ((cast(a.wk AS date) - cast(f.cohort AS date)) // 7)::BIGINT AS week_offset,
           count(*)::BIGINT AS n_users
    FROM fs f JOIN act a ON f.user_id = a.user_id
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q95_retention_cohorts(spark, sf_dir):
    """Retention cohort matrix: users bucketed by the ISO week of their
    first event, counted in every subsequent week they were active —
    the (cohort_week, week_offset, n_users) triangle behind every
    retention curve. Offsets are integer day arithmetic (no float).

    Scale shape: both the first-seen reduction and the distinct
    (user, week) activity set are keyed by user_id, so the join is
    co-partitioned after one shuffle; the output is cohort x offset —
    weeks-squared-sized, trivially small at any corpus scale."""
    ev = _read(spark, sf_dir, "events")
    fs = ev.groupBy("user_id").agg(F.date_trunc("week", F.min("ts")).alias("cohort"))
    act = ev.select("user_id", F.date_trunc("week", F.col("ts")).alias("wk")).distinct()
    out = (
        fs.join(act, "user_id")
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            F.expr("datediff(cast(wk as date), cast(cohort as date)) div 7")
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )
    return out.orderBy("cohort_week", "week_offset")


@query(
    "q96_activity_anomalies",
    """
    WITH daily AS (
      SELECT user_id, cast(ts AS date) AS d, count(*) AS cnt
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT user_id, count(*) AS n, sum(cnt) AS s, sum(cnt * cnt) AS ss
      FROM daily GROUP BY 1
    )
    SELECT d.user_id, strftime(d.d, '%Y-%m-%d') AS day, d.cnt::BIGINT AS cnt
    FROM daily d JOIN stats t ON d.user_id = t.user_id
    WHERE t.n >= 7
      AND (t.n * d.cnt - t.s) > 0
      AND (t.n * d.cnt - t.s) * (t.n * d.cnt - t.s) > 4 * (t.n * t.ss - t.s * t.s)
    ORDER BY d.user_id, day
    """,
)
def q96_activity_anomalies(spark, sf_dir):
    """Per-user activity-spike detection ENTIRELY in integer arithmetic:
    a day is anomalous when its event count exceeds the user's mean by
    more than 2 sample standard deviations. Clearing denominators turns
    (cnt-mu)^2 > 4*sigma^2 into
    (n*cnt - s)^2 > 4*(n*ss - s^2) over exact integer sums — no float
    anywhere, so the oracle match is bit-exact by construction (the same
    trick the engine's StdDev accumulator cannot use because it must
    emit the float, not the comparison).

    Scale shape: one groupBy(user, day) -> one groupBy(user), then a
    co-partitioned self-join of day rows against user stats — all keyed
    by user_id, single exchange under AQE."""
    ev = _read(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    stats = daily.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cnt").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("ss"),
    )
    dev = F.col("n") * F.col("cnt") - F.col("s")
    out = (
        daily.join(stats, "user_id")
        .filter(
            (F.col("n") >= 7)
            & (dev > 0)
            & (dev * dev > 4 * (F.col("n") * F.col("ss") - F.col("s") * F.col("s")))
        )
        .select(
            "user_id",
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.col("cnt").cast("long").alias("cnt"),
        )
    )
    return out.orderBy("user_id", "day")


_EWMA_ORDER = ["o_orderdate", "o_orderkey"]


_EWMA_CENTS = "cast(round(o_totalprice * 100) as bigint)"


@query(
    "q103_ewma_customer_spend",
    f"""
    WITH _e AS (
        SELECT o_custkey,
               o_orderkey,
               o_orderdate,
               {_ts.dyadic_ewma_sql('o_custkey', _EWMA_ORDER, _EWMA_CENTS, 16)} AS ewma_cents,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders
    )
    SELECT o_custkey, o_orderkey AS last_orderkey,
           round(ewma_cents / 100, 4) AS ewma_spend
    FROM _e WHERE rn = 1
    """,
)
def q103_ewma_customer_spend(spark, sf_dir):
    """Per-customer EWMA of order spend (operators/timeseries.dyadic_ewma):
    alpha=1/2 over the 16 most recent orders, evaluated at each
    customer's latest order.  Dyadic weights make the weighted sums
    exact 64-bit integers — the EWMA is bit-reproducible across engines
    and cluster topologies (no float reduction order anywhere).

    Scale shape: one shuffle on o_custkey; both the EWMA lags and the
    latest-row filter ride that single partitioning."""
    from pyspark.sql import Window

    orders = _read(spark, sf_dir, "orders").withColumn(
        "_cents", F.expr(_EWMA_CENTS)
    )
    with_ewma = _ts.dyadic_ewma(
        orders, "o_custkey", _EWMA_ORDER, "_cents", depth=16, out="_ewma_cents"
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        with_ewma.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("last_orderkey"),
            F.round(F.col("_ewma_cents") / 100, 4).alias("ewma_spend"),
        )
    )


_SESSION_LEN_US = "cast(round(value * 60 * 1000000) as bigint)"


@query(
    "q104_hourly_concurrency",
    _ts.hourly_max_concurrency_sql(
        f"SELECT ts AS s, make_timestamp(epoch_us(ts) + {_SESSION_LEN_US}) AS e "
        "FROM events"
    )
    + " ORDER BY hour",
)
def q104_hourly_concurrency(spark, sf_dir):
    """Peak concurrent sessions per hour (operators/timeseries
    .interval_concurrency): each event opens a session of value minutes;
    a +1/-1 sweep-line with half-open [start, end) semantics yields the
    exact concurrency level at every boundary, maxed per hour.

    Scale shape: NOT a global total order — the prefix sum decomposes
    into per-day partitioned windows plus a day-count-sized broadcast
    carry join, so the sweep parallelizes over any corpus length while
    matching the oracle's single-window arithmetic integer-for-integer."""
    ev = _read(spark, sf_dir, "events")
    sessions = ev.select(
        F.col("ts").alias("s"),
        F.timestamp_micros(F.unix_micros("ts") + F.expr(_SESSION_LEN_US)).alias("e"),
    )
    return _ts.hourly_max_concurrency(sessions, "s", "e").orderBy("hour")


@query(
    "q113_scd2_intervals",
    """
    SELECT user_id, event_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           coalesce(strftime(lead(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id),
                             '%Y-%m-%d %H:%M:%S'), 'current') AS valid_to
    FROM events
    WHERE user_id < 40
    ORDER BY user_id, valid_from, event_id
    """,
)
def q113_scd2_intervals(spark, sf_dir):
    """SCD-type-2 validity-interval construction: each per-user event
    becomes a [valid_from, valid_to) state row, valid_to = next event's
    timestamp ('current' for the open row) — the standard
    change-log → temporal-table build (CDC history, engine extension;
    the reference has no ordered-state ops, SURVEY §2.5).

    Scale shape: one shuffle on user_id; lead() rides that single
    partitioning, state O(1) per row."""
    from pyspark.sql import Window

    ev = _read(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
            F.coalesce(
                F.date_format(F.lead("ts").over(w), "yyyy-MM-dd HH:mm:ss"),
                F.lit("current"),
            ).alias("valid_to"),
        )
        .orderBy("user_id", "valid_from", "event_id")
    )


@query(
    "q122_time_weighted_avg",
    """
    WITH _d AS (
        SELECT user_id,
               cast(round(value * 100) as bigint) AS cents,
               epoch_us(lead(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id))
                   - epoch_us(ts) AS dur_us
        FROM events
    )
    SELECT user_id,
           round(cast(sum(cents * dur_us) as double)
                 / cast(sum(dur_us) as double), 4) AS twa,
           cast(count(*) as bigint) AS n_holds
    FROM _d WHERE dur_us IS NOT NULL
    GROUP BY user_id
    HAVING sum(dur_us) > 0
    ORDER BY user_id
    """,
)
def q122_time_weighted_avg(spark, sf_dir):
    """Per-user TIME-weighted average of a piecewise-constant signal:
    each event's value holds until the next event; the average weights
    by holding duration, not by sample count — the correct aggregate for
    irregularly-sampled metrics (sensor readings, account balances,
    position marks).  cents x micros products and both sums are exact
    integers; the single division happens on identical integers in both
    engines.

    Scale shape: one user-keyed shuffle; lead() and the aggregation ride
    the same partitioning."""
    from pyspark.sql import Window

    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = ev.select(
        "user_id",
        F.expr("cast(round(value * 100) as bigint)").alias("cents"),
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")).alias("dur_us"),
    ).filter(F.col("dur_us").isNotNull())
    return (
        d.groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.col("cents") * F.col("dur_us")).cast("double")
                / F.sum("dur_us").cast("double"),
                4,
            ).alias("twa"),
            F.count(F.lit(1)).alias("n_holds"),
            F.sum("dur_us").alias("_tot"),
        )
        .filter(F.col("_tot") > 0)
        .drop("_tot")
        .select("user_id", "twa", "n_holds")
        .orderBy("user_id")
    )


_GAP_MIN_US = 6 * 3_600 * 1_000_000  # 6 hours


@query(
    "q123_gap_detection",
    f"""
    WITH _d AS (
        SELECT user_id,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_ts,
               ts
        FROM events
    )
    SELECT user_id,
           strftime(prev_ts, '%Y-%m-%d %H:%M:%S') AS gap_start,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS gap_end,
           cast((epoch_us(ts) - epoch_us(prev_ts)) // 60000000 as bigint)
               AS gap_minutes
    FROM _d
    WHERE prev_ts IS NOT NULL
      AND epoch_us(ts) - epoch_us(prev_ts) > {_GAP_MIN_US}
    ORDER BY user_id, gap_start
    """,
)
def q123_gap_detection(spark, sf_dir):
    """Telemetry gap detection (data-quality / SLA monitoring): per-user
    inter-event deltas above a 6-hour threshold become gap records with
    integer-minute durations — the missing-data finder run before any
    downstream training-window build.

    Scale shape: one user-keyed shuffle, lag() on that partitioning,
    pure filter after — no second pass."""
    from pyspark.sql import Window

    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = ev.select(
        "user_id",
        F.lag("ts").over(w).alias("prev_ts"),
        F.col("ts"),
    ).filter(F.col("prev_ts").isNotNull())
    gap_us = F.unix_micros("ts") - F.unix_micros("prev_ts")
    return (
        d.filter(gap_us > _GAP_MIN_US)
        .select(
            "user_id",
            F.date_format("prev_ts", "yyyy-MM-dd HH:mm:ss").alias("gap_start"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("gap_end"),
            F.expr(f"(unix_micros(ts) - unix_micros(prev_ts)) div 60000000").alias(
                "gap_minutes"
            ),
        )
        .orderBy("user_id", "gap_start")
    )


@query(
    "q124_latency_percentiles",
    """
    SELECT event_type,
           cast(count(*) as bigint) AS n,
           round(quantile_cont(cents, 0.50), 4) AS p50,
           round(quantile_cont(cents, 0.95), 4) AS p95,
           round(quantile_cont(cents, 0.99), 4) AS p99,
           max(cents) AS max_cents
    FROM (SELECT event_type, cast(round(value * 100) as bigint) AS cents
          FROM events)
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q124_latency_percentiles(spark, sf_dir):
    """SLA-style percentile report (p50/p95/p99/max) per event type —
    exact interpolated percentiles over integer cents (deterministic
    multiples of 1/100 in both engines; Spark ``percentile`` ==
    DuckDB ``quantile_cont``).

    Scale shape: exact percentile is a sort-based aggregate per group —
    group-keyed shuffle, per-group state the group's values. For
    unbounded-cardinality metrics switch to approx_percentile (q51
    covers the sketch form); the exact form is the SLA-report gate."""
    ev = _read(spark, sf_dir, "events").select(
        "event_type", F.expr("cast(round(value * 100) as bigint)").alias("cents")
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.expr("percentile(cents, 0.50)"), 4).alias("p50"),
            F.round(F.expr("percentile(cents, 0.95)"), 4).alias("p95"),
            F.round(F.expr("percentile(cents, 0.99)"), 4).alias("p99"),
            F.max("cents").alias("max_cents"),
        )
        .orderBy("event_type")
    )


@query(
    "q126_point_in_time_lookup",
    """
    WITH _states AS (
        SELECT user_id, event_type AS state,
               ts AS valid_from,
               coalesce(lead(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id),
                        TIMESTAMP '9999-12-31') AS valid_to
        FROM events WHERE user_id < 200
    ),
    _purchases AS (
        SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'purchase' AND user_id < 200
    )
    SELECT p.event_id,
           p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           s.state AS preceding_state
    FROM _purchases p
    JOIN _states s
      ON p.user_id = s.user_id
     AND s.valid_from <= p.ts - INTERVAL 1 MICROSECOND
     AND p.ts - INTERVAL 1 MICROSECOND < s.valid_to
    ORDER BY p.event_id
    """,
)
def q126_point_in_time_lookup(spark, sf_dir):
    """Point-in-time correct dimension lookup (feature-store semantics):
    each purchase joins the SCD2 state row valid just BEFORE it
    (ts − 1µs), so no information from the purchase instant leaks into
    its own features — the leakage rule behind every training-data
    point-in-time join.  Uses the q113 interval build + the bucketed
    range-join operator (operators/temporal.range_join): equality on
    user_id, residual interval predicate on the same shuffle.

    Purchases whose user has no earlier event are dropped (inner) —
    exactly the rows with no defined prior state."""
    from pyspark.sql import Window

    from ..operators.temporal import range_join

    ev = _read(spark, sf_dir, "events").filter(F.col("user_id") < 200)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    states = ev.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.coalesce(
            F.lead("ts").over(w), F.lit("9999-12-31").cast("timestamp")
        ).alias("valid_to"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts"),
        F.timestamp_micros(F.unix_micros("ts") - 1).alias("_asof"),
    )
    joined = range_join(
        purchases, states, "_asof", "valid_from", "valid_to", on=["user_id"]
    ).drop(states["user_id"])
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.col("state").alias("preceding_state"),
    ).orderBy("event_id")


@query(
    "q135_markov_transitions",
    """
    WITH _seq AS (
        SELECT user_id, event_type AS cur,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    _pairs AS (
        SELECT cur, nxt, count(*) AS n
        FROM _seq WHERE nxt IS NOT NULL
        GROUP BY cur, nxt
    ),
    _tot AS (SELECT cur, sum(n) AS tot FROM _pairs GROUP BY cur)
    SELECT p.cur AS from_type, p.nxt AS to_type,
           cast(p.n as bigint) AS n,
           round(cast(p.n as double) / cast(t.tot as double), 6) AS prob
    FROM _pairs p JOIN _tot t ON p.cur = t.cur
    ORDER BY from_type, to_type
    """,
)
def q135_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences (lead() on one user-keyed shuffle): counts and empirical
    transition probabilities — the behavioural-model / anomalous-flow
    building block.  Probabilities are single divisions of identical
    integers in both engines.

    Scale shape: the transition domain is |event_types|² — partial
    aggregation collapses each partition before the tiny shuffle."""
    from pyspark.sql import Window

    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    pairs = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    tot = pairs.groupBy("cur").agg(F.sum("n").alias("tot"))
    return (
        pairs.join(F.broadcast(tot), "cur")
        .select(
            F.col("cur").alias("from_type"),
            F.col("nxt").alias("to_type"),
            "n",
            F.round(F.col("n").cast("double") / F.col("tot").cast("double"), 6).alias(
                "prob"
            ),
        )
        .orderBy("from_type", "to_type")
    )


@query(
    "q137_rolling_active_users",
    """
    WITH _du AS (
        SELECT DISTINCT cast(date_trunc('day', ts) as date) AS day, user_id
        FROM events
    ),
    _days AS (SELECT DISTINCT day FROM _du)
    SELECT d.day,
           cast(count(DISTINCT u.user_id) as bigint) AS wau,
           cast((SELECT count(DISTINCT u2.user_id) FROM _du u2
                 WHERE u2.day = d.day) as bigint) AS dau
    FROM _days d
    JOIN _du u ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
    GROUP BY d.day
    ORDER BY d.day
    """,
)
def q137_rolling_active_users(spark, sf_dir):
    """Rolling 7-day active users (WAU) + daily actives (DAU) per day —
    the engagement metric every product pipeline computes.  A windowed
    COUNT DISTINCT cannot partial-aggregate, so the scalable form
    reduces to DISTINCT (day, user) pairs first (one shuffle, partial
    agg), then each pair EXPLODES to the <= 7 report days it serves —
    bounded fan-out replacing an unbounded distinct window state.

    All integers; the oracle computes the same metric by a range join
    over the distinct pairs."""
    ev = _read(spark, sf_dir, "events")
    du = ev.select(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"), "user_id"
    ).distinct()
    contrib = du.select(
        F.explode(
            F.expr("sequence(day, date_add(day, 6), interval 1 day)")
        ).alias("report_day"),
        "day",
        "user_id",
    )
    observed = du.select(F.col("day").alias("report_day")).distinct()
    wau = (
        contrib.join(observed, "report_day")
        .groupBy("report_day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    dau = du.groupBy(F.col("day").alias("report_day")).agg(
        F.countDistinct("user_id").alias("dau")
    )
    return (
        wau.join(dau, "report_day")
        .select(F.col("report_day").alias("day"), "wau", "dau")
        .orderBy("day")
    )


@query(
    "q142_distribution_drift",
    """
    WITH _v AS (
        SELECT CASE WHEN doc_id % 2 = 0 THEN 'a' ELSE 'b' END AS split,
               n_chars
        FROM documents
    ),
    _edges AS (
        SELECT quantile_cont(n_chars, [0.25, 0.5, 0.75]) AS ts FROM _v
    ),
    _b AS (
        SELECT split,
               cast(1 + (CASE WHEN n_chars > ts[1] THEN 1 ELSE 0 END)
                      + (CASE WHEN n_chars > ts[2] THEN 1 ELSE 0 END)
                      + (CASE WHEN n_chars > ts[3] THEN 1 ELSE 0 END) as int)
                   AS bucket
        FROM _v CROSS JOIN _edges
    ),
    _counts AS (
        SELECT bucket,
               cast(sum(CASE WHEN split = 'a' THEN 1 ELSE 0 END) as bigint) AS n_a,
               cast(sum(CASE WHEN split = 'b' THEN 1 ELSE 0 END) as bigint) AS n_b
        FROM _b GROUP BY bucket
    ),
    _tot AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb FROM _counts)
    SELECT bucket, n_a, n_b,
           round(
             pow(cast(n_a as double) / ta - cast(n_b as double) / tb, 2)
             / (cast(n_a + n_b as double) / (ta + tb)), 10) AS chi2_term
    FROM _counts CROSS JOIN _tot
    ORDER BY bucket
    """,
)
def q142_distribution_drift(spark, sf_dir):
    """Distribution-drift check between two dataset splits (the
    monitoring gate run between training snapshots): both splits are
    bucketed by SHARED exact-quartile edges of the combined data
    (q112's threshold machinery), and a per-bucket chi-square-style
    drift term compares the splits' proportions.  Counts are integers;
    the drift terms are a fixed sequence of IEEE ops on identical
    integers — deterministic cross-engine (pow(x,2) is x*x in both).

    Scale shape: one percentile pass + one bucket aggregation; bucket
    cardinality state only."""
    docs = _read_docs(spark, sf_dir).select(
        F.when(F.col("doc_id") % 2 == 0, "a").otherwise("b").alias("split"),
        "n_chars",
    )
    row = docs.select(
        F.expr("percentile(n_chars, array(0.25, 0.5, 0.75))").alias("ts")
    ).collect()[0]
    t1, t2, t3 = row["ts"]
    bucket = (
        F.lit(1)
        + F.when(F.col("n_chars") > t1, 1).otherwise(0)
        + F.when(F.col("n_chars") > t2, 1).otherwise(0)
        + F.when(F.col("n_chars") > t3, 1).otherwise(0)
    ).cast("int")
    counts = (
        docs.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("split") == "a", 1).otherwise(0)).alias("n_a"),
            F.sum(F.when(F.col("split") == "b", 1).otherwise(0)).alias("n_b"),
        )
    )
    tot = counts.agg(
        F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb")
    )
    pa = F.col("n_a").cast("double") / F.col("ta")
    pb = F.col("n_b").cast("double") / F.col("tb")
    pooled = (F.col("n_a") + F.col("n_b")).cast("double") / (F.col("ta") + F.col("tb"))
    term = F.round(F.pow(pa - pb, 2) / pooled, 10)
    return (
        counts.crossJoin(F.broadcast(tot))
        .select("bucket", "n_a", "n_b", term.alias("chi2_term"))
        .orderBy("bucket")
    )
