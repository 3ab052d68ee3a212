"""Exactly-once streaming sink (streaming/sink.py): idempotent
foreachBatch through the manifest protocol — replayed batches skipped,
uncommitted data invisible, real-stream end-to-end equality."""

import shutil

from pyspark.sql import Row
from pyspark.sql import functions as F

from bacon_spark.operators.maintenance import manifest_read, read_manifest
from bacon_spark.streaming.sink import committed_batch_ids, idempotent_batch_writer


def test_replayed_batch_not_double_counted(spark, tmp_path):
    path = str(tmp_path / "t")
    w = idempotent_batch_writer(path)
    b0 = spark.createDataFrame([Row(k=1, v=10), Row(k=2, v=20)])
    b1 = spark.createDataFrame([Row(k=3, v=30)])
    w(b0, 0)
    w(b1, 1)
    # crash-recovery replay: engine re-delivers batch 1 verbatim
    w(b1, 1)
    got = sorted(tuple(r) for r in manifest_read(spark, path).collect())
    assert got == [(1, 10), (2, 20), (3, 30)]
    assert committed_batch_ids(path) == {0, 1}
    assert read_manifest(path)["version"] == 2  # no version bump on replay


def test_uncommitted_files_invisible(spark, tmp_path):
    path = str(tmp_path / "t2")
    w = idempotent_batch_writer(path)
    w(spark.createDataFrame([Row(k=1, v=1)]), 0)
    # simulate a writer that died between data write and manifest commit
    orphan = str(tmp_path / "t2" / "batch-99-dead")
    spark.createDataFrame([Row(k=9, v=999)]).write.parquet(orphan)
    got = [tuple(r) for r in manifest_read(spark, path).collect()]
    assert got == [(1, 1)]  # the orphan rows never appear


def test_real_stream_exactly_once_end_to_end(spark, tmp_path):
    """Drive an actual file-source stream through the sink; the final
    table must equal the batch answer exactly (and a second identical
    run into the same table must be a no-op via batch-id dedup only if
    ids collide — here we assert the first run's totals)."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    rows = [Row(k=i % 4, v=i) for i in range(40)]
    spark.createDataFrame(rows[:20]).write.parquet(src)
    spark.createDataFrame(rows[20:]).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("k bigint, v bigint")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(idempotent_batch_writer(out))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in manifest_read(spark, out).collect())
    assert got == sorted((r.k, r.v) for r in rows)
    assert len(committed_batch_ids(out)) >= 1
    shutil.rmtree(ckpt, ignore_errors=True)
