"""Production-hardening behaviors a 100 TB deployment depends on, proven
locally: RocksDB state store (bounded-memory streaming state), checkpoint
recovery across process restarts, parquet schema evolution, and corrupt-
input tolerance."""

import datetime as dt
import os
import shutil

import pytest
from pyspark.sql import functions as F

SCHEMA = "id long, ts timestamp, v double"


def _write(spark, path, rows, mode="overwrite"):
    spark.createDataFrame(rows, SCHEMA).repartition(1).write.mode(mode).parquet(path)


def test_rocksdb_state_store_streaming_agg(spark, tmpdir):
    """The scale-grade state backend: the same windowed aggregation, state
    kept in RocksDB instead of the in-memory HDFS-backed provider, must
    produce the identical result. At real scale this is what keeps
    executor heap flat when state outgrows memory."""
    data = str(tmpdir + "/data")
    rows = [(i, dt.datetime(2024, 1, 1, i % 24, 30), float(i)) for i in range(48)]
    _write(spark, data, rows)
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = spark.readStream.schema(SCHEMA).parquet(data)
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour"))
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
            .select(F.col("window.start").alias("ws"), "n", "s")
        )
        q = (
            agg.writeStream.format("memory").queryName("rocks_agg")
            .outputMode("complete").trigger(availableNow=True)
            .option("checkpointLocation", str(tmpdir + "/ck_rocks")).start()
        )
        q.awaitTermination()
        got = {r["ws"]: (r["n"], r["s"]) for r in spark.table("rocks_agg").collect()}
    finally:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    batch = (
        spark.read.parquet(data)
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .select(F.col("window.start").alias("ws"), "n", "s")
    )
    want = {r["ws"]: (r["n"], r["s"]) for r in batch.collect()}
    assert got == want


def test_checkpoint_recovery_resumes_aggregation_state(spark, tmpdir):
    """Two separate streaming RUNS sharing one checkpoint (a process
    restart): run 2 must resume run 1's aggregation state, and the final
    complete-mode table must equal the batch answer over ALL data — the
    exactly-once recovery contract incremental pipelines rely on."""
    data = str(tmpdir + "/data")
    ck = str(tmpdir + "/ck")
    half1 = [(i, dt.datetime(2024, 1, 1, 3, 0), 1.0) for i in range(10)]
    half2 = [(i + 10, dt.datetime(2024, 1, 1, 3, 30), 2.0) for i in range(5)]

    def run_once():
        stream = spark.readStream.schema(SCHEMA).parquet(data)
        agg = (
            stream.groupBy(F.window("ts", "1 hour"))
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
            .select(F.col("window.start").alias("ws"), "n", "s")
        )
        q = (
            agg.writeStream.format("memory").queryName("recov_agg")
            .outputMode("complete").trigger(availableNow=True)
            .option("checkpointLocation", ck).start()
        )
        q.awaitTermination()
        return {r["ws"]: (r["n"], r["s"]) for r in spark.table("recov_agg").collect()}

    _write(spark, data, half1)
    first = run_once()
    assert first == {dt.datetime(2024, 1, 1, 3, 0): (10, 10.0)}
    _write(spark, data, half2, mode="append")
    second = run_once()
    # resumed state: 10 rows from run 1 + 5 from run 2, one window
    assert second == {dt.datetime(2024, 1, 1, 3, 0): (15, 20.0)}


def test_parquet_schema_evolution_merge(spark, tmpdir):
    """Schema drift across files (a column added mid-stream, the normal
    state of a long-lived 100 TB table): mergeSchema reads old + new files
    with nulls backfilled for the missing column."""
    d = str(tmpdir + "/evo")
    spark.createDataFrame([(1, "a")], "id long, s string").write.parquet(d)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, s string, extra double"
    ).write.mode("append").parquet(d)
    df = spark.read.option("mergeSchema", "true").parquet(d)
    assert set(df.columns) == {"id", "s", "extra"}
    got = {r["id"]: r["extra"] for r in df.collect()}
    assert got == {1: None, 2: 9.5}


def test_ignore_corrupt_files(spark, tmpdir):
    """A torn/corrupt part file (failed writer, bad disk) must not take
    down the scan when ignoreCorruptFiles is on — the standard posture for
    petabyte archives where one bad file is a certainty."""
    d = str(tmpdir + "/corrupt")
    spark.createDataFrame([(i,) for i in range(10)], "id long").write.parquet(d)
    with open(os.path.join(d, "part-corrupt.parquet"), "wb") as f:
        f.write(b"PAR1 this is not a real parquet file")
    clean = spark.read.option("ignoreCorruptFiles", "true").parquet(d)
    assert clean.count() == 10
    with pytest.raises(Exception):
        spark.read.option("ignoreCorruptFiles", "false").parquet(d).count()


# ---------------------------------------------------------------------------
# Fault injection (r4): worker loss mid-query / mid-stream, manifest rot
# ---------------------------------------------------------------------------

_KILL_BATCH = r"""
import os, signal, sys
from pyspark import TaskContext
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

# local[4,3]: 4 threads, tasks may fail up to 3 times -> the killed
# attempt is retried (the local analogue of executor loss on a cluster)
spark = (SparkSession.builder.master("local[4,3]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

def fn(it):
    tc = TaskContext.get()
    if tc.partitionId() == 0 and tc.attemptNumber() == 0:
        os.kill(os.getpid(), signal.SIGKILL)  # first attempt dies mid-task
    for pdf in it:
        yield pdf

df = spark.range(0, 1000, 1, 4).toDF("id")
got = df.mapInPandas(fn, "id long").agg(F.sum("id").alias("s")).collect()[0]["s"]
assert got == 499500, got
print("BATCH_RETRY_OK")
"""

_KILL_STREAM = r"""
import datetime as dt, os, signal, sys, tempfile
from pyspark import TaskContext
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (SparkSession.builder.master("local[4,3]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

d = tempfile.mkdtemp(prefix="kill_stream_")
rows = [(i, dt.datetime(2024, 1, 1, i % 24, 30), float(i)) for i in range(96)]
spark.createDataFrame(rows, "id long, ts timestamp, v double") \
    .repartition(4).write.mode("overwrite").parquet(d + "/data")

def fn(it):
    tc = TaskContext.get()
    if tc.partitionId() == 0 and tc.attemptNumber() == 0:
        os.kill(os.getpid(), signal.SIGKILL)  # die inside the micro-batch
    for pdf in it:
        yield pdf

stream = spark.readStream.schema("id long, ts timestamp, v double").parquet(d + "/data")
agg = (stream.mapInPandas(fn, "id long, ts timestamp, v double")
       .withWatermark("ts", "1 hour")
       .groupBy(F.window("ts", "1 hour"))
       .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
       .select(F.col("window.start").alias("ws"), "n", "s"))
q = (agg.writeStream.format("memory").queryName("kill_agg")
     .outputMode("complete").trigger(availableNow=True)
     .option("checkpointLocation", d + "/ck").start())
q.awaitTermination()
got = {str(r["ws"]): (r["n"], r["s"]) for r in spark.table("kill_agg").collect()}
batch = (spark.read.parquet(d + "/data")
         .groupBy(F.window("ts", "1 hour"))
         .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
         .select(F.col("window.start").alias("ws"), "n", "s"))
want = {str(r["ws"]): (r["n"], r["s"]) for r in batch.collect()}
assert got == want, (got, want)
print("STREAM_RETRY_OK")
"""


def _run_isolated(code: str, marker: str):
    """Run a fault-injection scenario in its own process (it needs a
    local[N,maxFailures] master, which the shared session fixture can't
    provide, and a SIGKILLed worker must not destabilize other tests)."""
    import subprocess
    import sys
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(code)
        path = f.name
    try:
        r = subprocess.run(
            [sys.executable, path], capture_output=True, text=True, timeout=300
        )
        assert marker in r.stdout, (r.stdout[-2000:], r.stderr[-2000:])
    finally:
        os.unlink(path)


def test_worker_killed_mid_query_retries_to_same_answer():
    """SIGKILL a Python worker on the FIRST attempt of one partition of a
    batch query: the task must be retried and the job must converge on
    the exact same answer — the local[32] analogue of losing an executor
    on a 1000-executor cluster."""
    _run_isolated(_KILL_BATCH, "BATCH_RETRY_OK")


def test_worker_killed_mid_stream_retries_to_same_answer():
    """Same, inside a streaming micro-batch: the killed attempt retries,
    the stream completes, and the final state equals the batch answer
    (checkpointed offsets + deterministic input => exactly-once)."""
    _run_isolated(_KILL_STREAM, "STREAM_RETRY_OK")


def test_corrupt_manifest_fails_closed(spark, tmpdir):
    """A corrupted (truncated/garbage) manifest version must ERROR on
    read — never silently fall back to the raw directory listing, which
    could expose uncommitted/half-compacted data files."""
    from bacon_spark.operators.maintenance import (
        commit_manifest,
        manifest_read,
        read_manifest,
    )

    d = str(tmpdir + "/mtable")
    spark.createDataFrame([(i,) for i in range(10)], "id long").write.parquet(d)
    files = [
        (f, os.path.getsize(os.path.join(d, f)))
        for f in os.listdir(d)
        if f.endswith(".parquet")
    ]
    v = commit_manifest(d, files)
    assert manifest_read(spark, d, v).count() == 10

    man_path = os.path.join(d, "_manifest", f"v{v:010d}.json")
    with open(man_path, "w") as f:
        f.write('{"version": 1, "files": [{"pa')  # torn write
    with pytest.raises(Exception):
        read_manifest(d, v)
    with pytest.raises(Exception):
        manifest_read(spark, d, v).count()


def test_manifest_listing_missing_file_fails_closed(spark, tmpdir):
    """A manifest referencing a data file that no longer exists (deleted
    out-of-band) must fail the read, not silently return partial data."""
    from bacon_spark.operators.maintenance import commit_manifest, manifest_read

    d = str(tmpdir + "/mtable2")
    spark.createDataFrame([(i,) for i in range(10)], "id long").write.parquet(d)
    files = [
        (f, os.path.getsize(os.path.join(d, f)))
        for f in os.listdir(d)
        if f.endswith(".parquet")
    ]
    v = commit_manifest(d, files + [("ghost.parquet", 123)])
    with pytest.raises(Exception):
        manifest_read(spark, d, v).count()
