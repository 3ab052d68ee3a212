"""Scale operators: bucketed co-located joins and skew salting.

These are the two knobs SCALE.md prescribes for the places where broadcast
can't apply: a fact-to-fact join (bucket both sides -> shuffle-free
SortMergeJoin) and a skewed aggregation key (salt -> two-phase aggregate).
Both are pure plan shape — verified by asserting on the physical plan in
tests, the same way a human would review `.explain()`.
"""

from __future__ import annotations

import hashlib
import json
import re
import os
import shutil
from urllib.parse import urlparse

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _drop_table_and_orphaned_location(spark, table_name: str, path: str | None) -> None:
    """Idempotency guard for ``saveAsTable``: a fresh (derby) metastore
    paired with a stale warehouse directory from a previous session makes
    ``mode("overwrite").saveAsTable`` throw LOCATION_ALREADY_EXISTS — the
    catalog doesn't know the table, so overwrite can't clean the dir.
    Drop the catalog entry if present, then remove the on-disk location
    the table would claim."""
    spark.sql(f"DROP TABLE IF EXISTS `{table_name}`")
    if path is None:
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse"))
        if wh.scheme not in ("", "file"):
            return  # non-local warehouse: nothing to clean from the driver
        path = f"{wh.path}/{table_name.lower()}"
    else:
        path = urlparse(path).path or path
    shutil.rmtree(path, ignore_errors=True)


def widen(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition *df* round-robin ONLY when its scan is narrower than the
    session's parallelism (default: ``sparkContext.defaultParallelism``).

    The test fixtures ship each table as ONE parquet file -> one input
    partition -> one core for CPU-bound expression work; a round-robin
    ``repartition`` buys full-width parallelism there. But an unconditional
    ``repartition(N)`` inserts an Exchange even when the scan is already
    thousands of partitions wide — at 100 TB that shuffles the full corpus
    (bodies included) for nothing. This guard makes the widening a no-op
    exactly when it should be: wide input -> same DataFrame, zero Exchange
    (asserted in tests/test_plans.py).

    ``df.rdd.getNumPartitions()`` costs one physical-plan conversion on the
    driver, no job."""
    spark = df.sparkSession
    target = target or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    buckets: int = 8,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Persist as a bucketed (+sorted) catalog table: joins and aggregates
    on *key* between same-bucketed tables need no shuffle (and no sort,
    when sorted). This is how lineitem⋈orders stops broadcasting `orders`
    at TB scale (SCALE.md §star-joins). ``path`` pins the data directory
    (external table) instead of the session's warehouse dir. Idempotent:
    tolerates both an existing table and an orphaned location left by an
    earlier session."""
    _drop_table_and_orphaned_location(df.sparkSession, table_name, path)
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def bucketed_join(spark, left_table: str, right_table: str, key_l: str, key_r: str) -> DataFrame:
    l = spark.table(left_table)
    r = spark.table(right_table)
    return l.join(r, l[key_l] == r[key_r])


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, Column],
    merges: dict[str, Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys: partial-agg on (key, salt),
    then final-agg on key. The first shuffle spreads each hot key over
    salt_buckets reducers; the second handles only (groups × salt) rows.

    ``aggs`` build the partial columns; ``merges`` re-aggregate them (the
    accumulator partial/final contract). Deterministic salt derived from a
    hash of the whole row keeps results reproducible."""
    salt = (F.abs(F.xxhash64(*[F.col(c) for c in df.columns])) % salt_buckets).alias("_salt")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(*[c.alias(n) for n, c in aggs.items()])
    )
    return partial.groupBy(key).agg(*[c.alias(n) for n, c in merges.items()])


def capped_distinct(
    df: DataFrame, keys: list[str], col: str, cap: int, out: str | None = None
) -> DataFrame:
    """The first *cap* distinct values of *col* per *keys* group, in sort
    order, with per-group state bounded END-TO-END.

    ``collect_set`` (and the reference's Union accumulator,
    /root/reference/bacon/accumulators.py:53-76) accumulates every distinct
    value per group before any cap applies — at 100 TB a single hot group
    can hold millions of values and OOM its reducer. Here the cap is applied
    BEFORE collection: distinct (partial-aggregating shuffle), rank within
    group (sort-based window, spills), keep rank <= cap, then collect at
    most *cap* values per group. Result is identical to
    ``accumulators.CappedCollectSet`` — use that form when per-group
    cardinality is known-small, this one when it is not."""
    from pyspark.sql.window import Window

    out = out or f"{col}_capped"
    w = Window.partitionBy(*keys).orderBy(F.col(col).asc())
    return (
        df.select(*keys, col)
        .distinct()
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .groupBy(*keys)
        .agg(F.sort_array(F.collect_list(col)).alias(out))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-proof inner equi-join: the big (skewed) side gets a
    deterministic per-row salt; the small side is replicated across all
    *salt_buckets* salts (one ``explode(sequence(...))``); the join runs
    on (key, salt) so a hot key's rows spread over salt_buckets reducers
    instead of serializing on one.

    Result is row-identical to ``big.join(small, key)`` — replication
    multiplies the small side only, each big row still matches exactly
    its key's rows (once, in its own salt bucket).

    This is the manual form of what AQE skew-join does adaptively; use
    it when the skew is KNOWN ahead of time (power-law user/domain keys
    in clickstream or web corpora) or when AQE's post-shuffle splitting
    is unavailable (e.g. the skewed side feeds a co-grouped op).  Salt
    is a hash of the whole big-side row — reproducible across runs and
    partitionings.  ``pmod``, not ``abs(hash) %``: ``abs(Long.MIN)`` is
    still negative on the JVM, and a negative salt would silently drop
    that row from the join (the agg twin tolerates any salt value; a
    join must land inside the replicated 0..n-1 range)."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets))
    b = big.withColumn("_salt", salt.cast("int"))
    s = small.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0).cast("int"), F.lit(salt_buckets - 1).cast("int"))),
    )
    return b.join(s, [key, "_salt"]).drop("_salt")


def _table_signature(path: str) -> str:
    """Cheap staleness token for the table at *path*: the latest manifest
    version when the table keeps a manifest log (operators/maintenance —
    a refresh always commits a new version), else an md5 over the sorted
    (file, bytes) listing of its parquet data files. Sidecar/_manifest
    files are excluded by ``table_files``, so writing stats never
    invalidates the stats."""
    from .maintenance import manifest_versions, table_files

    vs = manifest_versions(path)
    if vs:
        return f"manifest:v{vs[-1]}"
    digest = hashlib.md5(repr(table_files(path)).encode()).hexdigest()
    return f"files:{digest}"


def key_skew_stats(
    spark,
    path: str,
    key: str,
    d: int = 64,
    refresh: bool = False,
    df: DataFrame | None = None,
    view_tag: str | None = None,
) -> dict:
    """The per-(table, key) skew statistics behind :func:`auto_salt_join`,
    computed ONCE PER INGEST and cached in a stats sidecar
    ``<path>/_stats/key_skew_<key>.json`` next to the manifest log —
    the "cache the decision alongside the table statistics" contract.

    The record stores the raw moments (row count n, AMS F2 estimate)
    plus the collision factor F2/n, NOT the salted/plain verdict, so
    callers can vary ``skew_threshold`` without a rescan. Staleness is
    structural: the sidecar carries :func:`_table_signature` (manifest
    version, else data-file listing digest), and any refresh that
    changes the table's files invalidates it — the next call rescans
    and rewrites. ``refresh=True`` forces a rescan.

    *df* optionally supplies an already-loaded DataFrame for the scan
    (e.g. a view of the table with computed columns). A caller-supplied
    frame may be filtered/derived, so its moments are NOT the table's:
    without *view_tag* they are served UNCACHED (no sidecar read or
    write — a filtered view's skew must never drive another query's
    salting decision, ADVICE r6); with *view_tag* (a caller-chosen
    ``[A-Za-z0-9_-]`` token naming the view) the stats cache under
    ``key_skew_<key>__<view_tag>.json`` and only serve calls with the
    same tag. A read-only table location (no sidecar writable) degrades
    gracefully: stats are computed and returned, just not cached.
    Writes are atomic (temp file + ``os.replace``) so concurrent
    readers never see a torn record."""
    from .sketch import ams_f2

    if view_tag is not None and not re.fullmatch(r"[A-Za-z0-9_-]+", view_tag):
        raise ValueError(f"view_tag must match [A-Za-z0-9_-]+: {view_tag!r}")
    uncached = df is not None and view_tag is None
    suffix = f"__{view_tag}" if view_tag else ""
    stats_file = os.path.join(path, "_stats", f"key_skew_{key}{suffix}.json")
    sig = _table_signature(path)
    if not refresh and not uncached and os.path.isfile(stats_file):
        with open(stats_file) as fh:
            rec = json.load(fh)
        if (
            rec.get("signature") == sig
            and rec.get("d") == d
            and rec.get("view_tag") == view_tag
        ):
            rec["cached"] = True
            return rec

    if df is None:
        df = spark.read.parquet(path)
    row = (
        df.where(F.col(key).isNotNull())
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(ams_f2(df, key, d=d))
        .collect()[0]
    )
    n = int(row["n"] or 0)
    f2 = float(row["f2_estimate"] or 0.0)
    rec = {
        "key": key,
        "n": n,
        "f2_estimate": f2,
        "collision_factor": (f2 / n) if n else 0.0,
        "d": d,
        "signature": sig,
        "view_tag": view_tag,
        "cached": False,
    }
    if uncached:
        return rec  # arbitrary caller frame: never poisons the sidecar
    try:
        os.makedirs(os.path.dirname(stats_file), exist_ok=True)
        tmp = f"{stats_file}.{os.getpid()}.tmp"
        with open(tmp, "w") as fh:
            json.dump(rec, fh)
        os.replace(tmp, stats_file)
    except OSError:
        pass  # read-only table location: serve uncached stats
    return rec


def key_cardinality_stats(
    spark,
    path: str,
    key: str,
    refresh: bool = False,
) -> dict:
    """Distinct-key-count statistics for the table at *path*, computed
    once per ingest and cached in ``<path>/_stats/key_ndv_<key>.json`` —
    the :func:`key_skew_stats` sidecar contract applied to the OTHER
    routing input the engine needs: approximate key cardinality (one
    HLL ``approx_count_distinct`` scan), which drives the streaming
    funnel's per-user-vs-sharded decision
    (streaming/funnel.streaming_funnel_steps_auto). Stores the raw
    estimate, not a verdict, so callers can vary their thresholds
    without a rescan. Staleness is structural via
    :func:`_table_signature`; writes are atomic; a read-only location
    serves uncached stats."""
    stats_file = os.path.join(path, "_stats", f"key_ndv_{key}.json")
    sig = _table_signature(path)
    if not refresh and os.path.isfile(stats_file):
        with open(stats_file) as fh:
            rec = json.load(fh)
        if rec.get("signature") == sig and rec.get("key") == key:
            rec["cached"] = True
            return rec
    df = spark.read.parquet(path)
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.approx_count_distinct(F.col(key)).alias("ndv"),
    ).collect()[0]
    rec = {
        "key": key,
        "n": int(row["n"] or 0),
        "ndv": int(row["ndv"] or 0),
        "signature": sig,
        "cached": False,
    }
    try:
        os.makedirs(os.path.dirname(stats_file), exist_ok=True)
        tmp = f"{stats_file}.{os.getpid()}.tmp"
        with open(tmp, "w") as fh:
            json.dump(rec, fh)
        os.replace(tmp, stats_file)
    except OSError:
        pass  # read-only table location: serve uncached stats
    return rec


def max_event_time_stats(
    spark,
    path: str,
    ts_col: str = "ts",
    exclude_type: str | None = None,
    type_col: str = "event_type",
    refresh: bool = False,
) -> dict:
    """Maximum event time of the (staged stream) table at *path*, as
    epoch MICROSECONDS, computed once per ingest and cached in
    ``<path>/_stats/ts_max_<col>[...].json`` — the
    :func:`key_cardinality_stats` sidecar contract applied to the other
    scalar the streaming gates recover from their staged input: the
    sentinel-exclusion bound (max REAL event time). Without the sidecar
    every verification run re-scans the full staged corpus for one
    scalar — a corpus-sized job per query at any SF (r14, VERDICT r13
    next #5). *exclude_type* drops sentinel rows (``type_col`` equal to
    it) from the max. Staleness is structural via
    :func:`_table_signature`; writes are atomic; a read-only location
    serves uncached stats. The value is exact (same aggregate the
    queries ran inline), so results are bit-identical."""
    suffix = f"__ex_{exclude_type}" if exclude_type is not None else ""
    stats_file = os.path.join(path, "_stats", f"ts_max_{ts_col}{suffix}.json")
    sig = _table_signature(path)
    if not refresh and os.path.isfile(stats_file):
        with open(stats_file) as fh:
            rec = json.load(fh)
        if rec.get("signature") == sig and rec.get("ts_col") == ts_col:
            rec["cached"] = True
            return rec
    df = spark.read.parquet(path)
    if exclude_type is not None:
        df = df.filter(F.col(type_col) != exclude_type)
    row = df.agg(F.max(F.unix_micros(F.col(ts_col))).alias("mx")).collect()[0]
    rec = {
        "ts_col": ts_col,
        "exclude_type": exclude_type,
        "max_us": int(row["mx"]) if row["mx"] is not None else None,
        "signature": sig,
        "cached": False,
    }
    try:
        os.makedirs(os.path.dirname(stats_file), exist_ok=True)
        tmp = f"{stats_file}.{os.getpid()}.tmp"
        with open(tmp, "w") as fh:
            json.dump(rec, fh)
        os.replace(tmp, stats_file)
    except OSError:
        pass  # read-only table location: serve uncached stats
    return rec


def auto_salt_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    skew_threshold: float = 8.0,
    big_path: str | None = None,
) -> DataFrame:
    """:func:`salted_join` with the salting DECISION made by a sketch:
    one map-side AMS pass (operators/sketch.ams_f2 — 64 counters, no
    per-key shuffle) estimates the big side's self-join size F2; the
    mean collision factor F2/n is the expected number of same-key rows a
    reducer row meets, i.e. how hot the average probe is. Above
    *skew_threshold* the join runs salted, otherwise plain — the
    statistics-driven version of "salt it when the skew is KNOWN",
    without requiring the caller to know it.

    Results are row-identical either way (salting never changes join
    semantics); only the physical shuffle shape differs. The decision is
    DETERMINISTIC (md5-signed counters), so a pipeline re-run picks the
    same plan — unlike AQE's runtime stats, which this complements for
    engines/paths where AQE's skew handling doesn't reach (co-grouped
    inputs, streaming foreachBatch joins).

    Cost: one extra scan of the big side's key column (a scan-bound
    64-long aggregate) — unless *big_path* names the big side's table
    location, in which case the moments come from the per-ingest
    :func:`key_skew_stats` sidecar (computed on first use, reused until
    the table's manifest/files change) and repeated joins pay ZERO extra
    scans. That is the production form: the decision is table metadata,
    refreshed with the table, not a per-query job."""
    if big_path is not None:
        # moments come from the CANONICAL table read, never from *big*
        # (which may be a filtered view — its skew is not table metadata);
        # a computed key column absent from the raw table falls back to
        # the inline big-side scan below, uncached
        try:
            rec = key_skew_stats(big.sparkSession, big_path, key)
            n, f2 = rec["n"], rec["f2_estimate"]
        except Exception:
            big_path = None
    if big_path is None:
        from .sketch import ams_f2

        stats = (
            big.where(F.col(key).isNotNull())
            .agg(F.count(F.lit(1)).alias("n"))
            .crossJoin(ams_f2(big, key))
            .collect()[0]
        )
        n, f2 = stats["n"] or 0, stats["f2_estimate"]
    hot = n > 0 and (f2 / n) > skew_threshold
    from . import decisions

    decisions.record(
        "salt_join", "salted" if hot else "plain", key=key, n=n,
        collision_factor=(f2 / n if n else None),
        skew_threshold=skew_threshold, from_sidecar=big_path is not None,
    )
    if hot:
        return salted_join(big, small, key, salt_buckets)
    return big.join(small, key)
