"""Compaction / clustering maintenance (operators/maintenance.py)."""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from bacon_spark.operators.maintenance import compact, table_files, zorder_key


@pytest.fixture()
def small_files_dir(spark, tmp_path):
    path = str(tmp_path / "events_frag")
    (
        spark.range(0, 20_000)
        .select(
            F.col("id").alias("event_id"),
            (F.col("id") % 97).alias("user_id"),
            (F.col("id") * 7 % 1000).cast("double").alias("value"),
        )
        .repartition(64)
        .write.parquet(path)
    )
    return path


def _content_fingerprint(spark, path):
    df = spark.read.parquet(path)
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.hash("event_id", "user_id", "value").cast("long")).alias("h"),
    ).collect()[0]
    return row["n"], row["h"]


def test_compact_binpacks_without_losing_rows(spark, small_files_dir):
    before = _content_fingerprint(spark, small_files_dir)
    assert len(table_files(small_files_dir)) == 64
    total = sum(b for _, b in table_files(small_files_dir))
    stats = compact(spark, small_files_dir, target_file_bytes=total // 4)
    assert stats["files_before"] == 64
    assert stats["files_after"] == 4
    assert _content_fingerprint(spark, small_files_dir) == before


def test_compact_clustered_gives_disjoint_file_ranges(spark, small_files_dir):
    before = _content_fingerprint(spark, small_files_dir)
    total = sum(b for _, b in table_files(small_files_dir))
    compact(
        spark, small_files_dir, target_file_bytes=total // 8, cluster_by=["event_id"]
    )
    assert _content_fingerprint(spark, small_files_dir) == before
    ranges = []
    for f, _ in table_files(small_files_dir):
        t = pq.read_table(f, columns=["event_id"])
        ids = t.column("event_id").to_pylist()
        if ids:
            ranges.append((min(ids), max(ids)))
    ranges.sort()
    assert len(ranges) >= 4
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi < lo  # footer min/max prune a point lookup to ONE file


def _morton_ref(vals, bits):
    # independent reference: round-robin interleave, MSB level first
    out = []
    for b in range(bits - 1, -1, -1):
        for v in vals:
            out.append((v >> b) & 1)
    key = 0
    for bit in out:
        key = (key << 1) | bit
    return key


def test_zorder_key_matches_reference(spark):
    bits = 6
    hi = (1 << bits) - 1
    df = spark.createDataFrame(
        [(x, y) for x in (0, 1, 17, 40, hi) for y in (0, 5, 33, hi)], "x: long, y: long"
    )
    got = df.select(
        "x", "y", zorder_key([("x", 0, hi), ("y", 0, hi)], bits=bits).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _morton_ref([r["x"], r["y"]], bits), (r["x"], r["y"])


def test_zorder_compact_roundtrip(spark, small_files_dir):
    before = _content_fingerprint(spark, small_files_dir)
    total = sum(b for _, b in table_files(small_files_dir))
    z = zorder_key([("user_id", 0, 96), ("event_id", 0, 19_999)], bits=10)
    stats = compact(spark, small_files_dir, target_file_bytes=total // 8, cluster_by=z)
    assert stats["files_after"] >= 4
    assert _content_fingerprint(spark, small_files_dir) == before
    # clustering on the z-key bounds BOTH dimensions per file: no single
    # file spans the full user_id range once 8+ files are range-split on
    # the interleaved key
    spans = []
    for f, _ in table_files(small_files_dir):
        t = pq.read_table(f, columns=["user_id"])
        u = t.column("user_id").to_pylist()
        spans.append(max(u) - min(u))
    assert min(spans) < 96  # at least some files see a narrowed user range


def test_manifest_compact_snapshot_isolation(spark, small_files_dir):
    import os

    from bacon_spark.operators.maintenance import (
        manifest_read,
        manifest_versions,
    )

    before = _content_fingerprint(spark, small_files_dir)
    total = sum(b for _, b in table_files(small_files_dir))
    stats = compact(
        spark, small_files_dir, target_file_bytes=total // 4, manifest=True
    )
    # v1 = bootstrap of the original listing, v2 = the compaction
    assert manifest_versions(small_files_dir) == [1, 2]
    assert stats["version"] == 2 and stats["files_after"] == 4
    got = manifest_read(spark, small_files_dir)
    n, h = before
    row = got.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.hash("event_id", "user_id", "value").cast("long")).alias("h"),
    ).collect()[0]
    assert (row["n"], row["h"]) == (n, h)
    # time travel: v1 still resolves — no data file was renamed or deleted
    old = manifest_read(spark, small_files_dir, version=1)
    assert old.count() == n
    # both file generations coexist on disk until vacuum
    names = [f for f, _ in table_files(small_files_dir)]
    assert any("compact-" in f for f in names)
    assert any("compact-" not in f for f in names)
    assert os.path.isdir(os.path.join(small_files_dir, "_manifest"))


def test_manifest_commit_conflict_and_rollback(spark, small_files_dir, monkeypatch):
    import os

    import bacon_spark.operators.maintenance as M

    total = sum(b for _, b in table_files(small_files_dir))
    compact(spark, small_files_dir, target_file_bytes=total // 4, manifest=True)

    # the primitive: two committers from the same base race on one
    # create-exclusive file; the loser raises, nothing is half-written
    man = M.read_manifest(small_files_dir)
    files = [(f["path"], f["bytes"]) for f in man["files"]]
    M.commit_manifest(small_files_dir, files, base_version=man["version"])
    with pytest.raises(M.ManifestConflict):
        M.commit_manifest(small_files_dir, files, base_version=man["version"])

    # compact loses the race mid-commit: staged data files are rolled back
    real = M.commit_manifest

    def racer(path, fs, *, base_version=None, op="commit"):
        real(path, fs, base_version=base_version, op="racer")
        return real(path, fs, base_version=base_version, op=op)

    monkeypatch.setattr(M, "commit_manifest", racer)
    staged_before = {
        d for d in os.listdir(small_files_dir) if d.startswith("compact-")
    }
    with pytest.raises(M.ManifestConflict):
        M.compact(spark, small_files_dir, target_file_bytes=total // 2, manifest=True)
    staged_after = {
        d for d in os.listdir(small_files_dir) if d.startswith("compact-")
    }
    assert staged_after == staged_before  # loser's files are gone


def test_manifest_vacuum_drops_unreferenced(spark, small_files_dir):
    from bacon_spark.operators.maintenance import (
        manifest_read,
        manifest_versions,
        read_manifest,
        vacuum,
    )

    before = _content_fingerprint(spark, small_files_dir)
    total = sum(b for _, b in table_files(small_files_dir))
    compact(spark, small_files_dir, target_file_bytes=total // 4, manifest=True)
    stats = vacuum(small_files_dir, keep_versions=1)
    assert stats["deleted_files"] == 64        # the original fragments
    assert stats["kept_versions"] == [2]
    assert manifest_versions(small_files_dir) == [2]
    # the live snapshot is intact, and only its files remain on disk
    got = manifest_read(spark, small_files_dir)
    n, h = before
    row = got.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.hash("event_id", "user_id", "value").cast("long")).alias("h"),
    ).collect()[0]
    assert (row["n"], row["h"]) == (n, h)
    live = {f["path"] for f in read_manifest(small_files_dir)["files"]}
    import os

    on_disk = {
        os.path.relpath(f, small_files_dir)
        for f, _ in table_files(small_files_dir)
    }
    assert on_disk == live
    with pytest.raises(FileNotFoundError):
        read_manifest(small_files_dir, version=1)


def test_hive_partition_pruning(spark, tmp_path):
    """A partition-key predicate must prune at the DIRECTORY level:
    PartitionFilters in the scan, and only the matching day's files
    actually read."""
    import datetime as dt

    from pyspark.sql import Row, functions as F

    from bacon_spark.operators.maintenance import write_hive_partitioned

    rows = [
        Row(day=f"2024-01-0{d}", user=u, v=d * 10 + u)
        for d in (1, 2, 3)
        for u in range(5)
    ]
    path = str(tmp_path / "events_by_day")
    write_hive_partitioned(spark.createDataFrame(rows), path, ["day"])

    back = spark.read.parquet(path).filter(F.col("day") == "2024-01-02")
    explained = back._jdf.queryExecution().toString()
    assert "PartitionFilters" in explained
    assert "2024-01-02" in explained or "day#" in explained
    assert back.count() == 5

    def scanned_files(df):
        qe = df._jdf.queryExecution()
        df.collect()  # execute THIS plan instance so its metrics populate
        scan = qe.executedPlan().collectLeaves().head()
        return scan.metrics().get("numFiles").get().value()

    import os

    def files_under(sub):
        d = os.path.join(path, sub)
        return sum(1 for f in os.listdir(d) if f.endswith(".parquet"))

    # only the matching partition directory's files are scanned
    assert scanned_files(spark.read.parquet(path).filter(F.col("day") == "2024-01-02")) \
        == files_under("day=2024-01-02")
    # a non-partition filter reads every partition (pushdown, no pruning)
    total = sum(files_under(f"day=2024-01-0{d}") for d in (1, 2, 3))
    unpruned = spark.read.parquet(path).filter(F.col("user") == 1)
    assert scanned_files(unpruned) == total
    assert unpruned.count() == 3


def test_stats_pruned_read_skips_files(spark, tmp_path):
    """attach_file_stats + stats_pruned_read: a range predicate on a
    range-clustered layout reads a strict subset of files, and results
    equal the full-scan filter exactly (superset rule + residual)."""
    import datetime as dt

    from bacon_spark.operators import maintenance as M
    from bacon_spark.sources.star import read_table

    path = str(tmp_path / "ev_clustered")
    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    # legacy INT96 timestamps carry no footer stats; write MICROS
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try:
        ev.repartitionByRange(8, F.col("ts")).sortWithinPartitions("ts").write.parquet(path)
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    v = M.attach_file_stats(path, ["ts"])
    man = M.read_manifest(path)
    assert man["version"] == v and set(man["stats_cols"]) == {"ts"}
    assert all(st.get("ts") for st in man["file_stats"].values())

    lo, hi = dt.datetime(2024, 1, 15), dt.datetime(2024, 1, 16)
    df, info = M.stats_pruned_read(spark, path, "ts", lo, hi)
    assert info["files_total"] == 8
    assert 1 <= info["files_read"] <= 2  # disjoint ranges: 1 day ~ 1/30
    want = sorted(
        r["event_id"]
        for r in ev.where((F.col("ts") >= lo) & (F.col("ts") < hi)).collect()
    )
    got = sorted(
        r["event_id"]
        for r in df.where((F.col("ts") >= lo) & (F.col("ts") < hi)).collect()
    )
    assert got == want and got  # identical and non-vacuous

    # out-of-domain range: zero files read, schema preserved
    empty, info0 = M.stats_pruned_read(
        spark, path, "ts", dt.datetime(2030, 1, 1), dt.datetime(2030, 1, 2)
    )
    assert info0["files_read"] == 0 and empty.count() == 0
    assert empty.columns == df.columns

    # unbounded read covers everything
    full, infof = M.stats_pruned_read(spark, path, "ts")
    assert infof["files_read"] == 8 and full.count() == ev.count()

    # a table without a stats manifest refuses loudly
    import pytest as _pytest

    bare = str(tmp_path / "bare")
    ev.limit(10).write.parquet(bare)
    with _pytest.raises(FileNotFoundError):
        M.stats_pruned_read(spark, bare, "ts")


def test_stats_pruned_read_type_mismatch_is_superset_not_typeerror(spark, tmp_path):
    """ADVICE r6: a bound whose type tag disagrees with the stored stat
    must keep the file (superset rule), never raise TypeError or
    mis-prune; self-inconsistent lo/hi types fail loudly."""
    import pytest as _pytest

    from bacon_spark.operators import maintenance as M

    path = str(tmp_path / "typed")
    spark.range(100).selectExpr("id", "cast(id as string) AS s").write.parquet(path)
    M.attach_file_stats(path, ["id", "s"])
    total = M.read_manifest(path)["files"]

    # numeric bounds against the STRING column's stats: every file kept
    df, info = M.stats_pruned_read(spark, path, "s", 10, 20)
    assert info["files_read"] == len(total)
    assert df.count() == 100
    # string bounds against the NUMERIC column's stats: every file kept
    _, info2 = M.stats_pruned_read(spark, path, "id", "10", "20")
    assert info2["files_read"] == len(total)
    # matching tags still prune out-of-domain ranges to zero
    _, info3 = M.stats_pruned_read(spark, path, "id", 1000, 2000)
    assert info3["files_read"] == 0
    # lo/hi that disagree with EACH OTHER are a caller bug: loud error
    with _pytest.raises(ValueError, match="bound types disagree"):
        M.stats_pruned_read(spark, path, "id", 10, "zzz")


def test_manifest_two_writer_race_threads(spark, small_files_dir):
    """VERDICT r6 #4: REAL concurrent committers (threads) over one
    manifest log — per version exactly one winner, every loser gets
    ManifestConflict and retries from the re-read head, and concurrent
    readers never observe a torn or inconsistent manifest."""
    import hashlib
    import json as _json
    import threading

    import bacon_spark.operators.maintenance as M

    total = sum(b for _, b in table_files(small_files_dir))
    compact(spark, small_files_dir, target_file_bytes=total // 4, manifest=True)
    files = [
        (f["path"], f["bytes"]) for f in M.read_manifest(small_files_dir)["files"]
    ]

    def sig(version: int, tag: str) -> str:
        return hashlib.md5(f"{version}:{tag}".encode()).hexdigest()

    N_WRITERS, COMMITS_EACH = 6, 5
    conflicts = []
    wins = []
    reader_errors = []
    stop = threading.Event()

    def writer(tid: int):
        done = 0
        while done < COMMITS_EACH:
            base = M.read_manifest(small_files_dir)["version"]
            tag = f"w{tid}-{done}"
            try:
                v = M.commit_manifest(
                    small_files_dir, files, base_version=base,
                    op="race", extra={"tag": tag, "sig": sig(base + 1, tag)},
                )
                wins.append(v)
                done += 1
            except M.ManifestConflict:
                conflicts.append(tid)  # lost the version: re-read and retry

    def reader():
        while not stop.is_set():
            man = M.read_manifest(small_files_dir)  # must always parse
            if man.get("op") == "race":
                # internal consistency: the signed fields match — a torn
                # write or a version/name mismatch would break this
                if man["sig"] != sig(man["version"], man["tag"]):
                    reader_errors.append(man["version"])
            # raw file spot check: every committed manifest is valid JSON
            vs = M.manifest_versions(small_files_dir)
            with open(
                M._manifest_path(small_files_dir, vs[-1])
            ) as fh:
                _json.load(fh)

    writers = [threading.Thread(target=writer, args=(i,)) for i in range(N_WRITERS)]
    readers = [threading.Thread(target=reader) for _ in range(3)]
    for t in readers:
        t.start()
    for t in writers:
        t.start()
    for t in writers:
        t.join()
    stop.set()
    for t in readers:
        t.join()

    assert not reader_errors
    assert len(wins) == N_WRITERS * COMMITS_EACH
    assert len(set(wins)) == len(wins), "two writers claimed one version"
    # the log is contiguous: every version from 3 (first race commit)
    # to the head exists exactly once
    vs = M.manifest_versions(small_files_dir)
    assert vs == list(range(1, max(vs) + 1))
    assert max(vs) == 2 + len(wins)
    # with real contention at least someone lost a race and retried
    assert conflicts, "no interleaving happened — raise COMMITS_EACH"


def test_concurrent_controller_drills_one_board(spark):
    """VERDICT r6 #4 (second half): many threads drilling one shared
    Controller/board — the reference's RLock'd slice cache under a
    threaded server (/root/reference/bacon/cutting.py:45-46,
    bin/gammon-multithread.py) re-proven on the engine's LRU + rows
    memo. Every thread must get the same answers a fresh board gives."""
    import threading

    from bacon_spark import Count, CubeDef, CubeQuery, CuttingBoard, Label, Measure, Sum
    from bacon_spark.observers.controller import Controller

    rows = [
        (f"item{i % 7}", f"place{i % 3}", i % 100) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "item string, place string, number long")
    cd = CubeDef("t")
    cd.add_label(Label("item"))
    cd.add_label(Label("place"))
    cd.add_measure(Measure("number", acc=Sum()))
    cd.add_measure(Measure("n", "number", acc=Count()))
    board = CuttingBoard(cd, df, cache_results=True)
    ctrl = Controller(board)

    drills = [
        {"q": "a:item/v:number/v:n"},
        {"q": "a:item/a:place/v:number"},
        {"q": "a:item/v:number/f:place:place1"},
        {"q": "a:place/v:n/f:item:item3"},
        {"q": "v:number"},
    ]
    expected = {}
    fresh = Controller(CuttingBoard(cd, df, cache_results=False))
    for p in drills:
        expected[p["q"]] = fresh.render_json(p)

    errors = []

    def worker(i):
        try:
            p = drills[i % len(drills)]
            got = ctrl.render_json(p)
            assert got == expected[p["q"]], p["q"]
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(20)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors


def test_orders_month_layout_partition_prunes(spark):
    """q187's layout: the quarter drill's partition-key range must show
    PartitionFilters in the scan and list ONLY the three matching
    o_month= directories."""
    import os

    from pyspark.sql import functions as F

    from bacon_spark.gate.warehouse import _orders_month_layout_prebuilt
    from bacon_spark.operators.maintenance import read_manifest

    path = _orders_month_layout_prebuilt(spark, "/root/testdata/sf0.001")
    dd = read_manifest(path)["layout"]["data_dir"]
    df = spark.read.parquet(os.path.join(path, dd)).filter(
        (F.col("o_month") >= "1997-01") & (F.col("o_month") <= "1997-03")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_month" in plan.split(
        "PartitionFilters", 1
    )[1][:200]
    # the SELECTED-partition evidence lives in the executed scan's
    # metrics (inputFiles() reports the pre-pruning relation): the drill
    # must read exactly the three matching o_month= directories
    df.collect()
    metrics = (
        df._jdf.queryExecution().executedPlan().collectLeaves().apply(0).metrics()
    )
    assert int(metrics.apply("numPartitions").value()) == 3
    import glob

    on_disk = sum(
        len(glob.glob(os.path.join(path, dd, f"o_month=1997-0{i}", "*.parquet")))
        for i in (1, 2, 3)
    )
    assert int(metrics.apply("numFiles").value()) == on_disk > 0
