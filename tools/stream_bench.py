"""Structured-Streaming throughput measurement: drive the full events
fixture through the watermarked tumbling-window pipeline (q62's shape) in
N file-triggered micro-batches and report rows/sec end-to-end — the
number behind SCALE.md's streaming-section claims.

r5 (VERDICT r4 task #8): also measures WHERE the state store bends the
throughput curve —

* ``--keys`` picks the grouping key, so state cardinality is a dial:
  ``event_type`` (the q62 shape) keeps state at #types x #windows rows;
  ``user_id`` grows state linearly with the corpus (the 100 TB shape);
* ``--rocksdb`` swaps the HDFS-backed store for RocksDB (the provider a
  real cluster runs once state outgrows executor heap);
* per-batch progress (trigger wall, state rows, state bytes) is emitted
  so the knee is visible IN the artifact instead of inferred: throughput
  bends where per-batch wall starts tracking cumulative state rows
  rather than input rows.

Usage: python tools/stream_bench.py [sf_dir] [n_batches]
       [--keys event_type|user_id] [--rocksdb] [--window 1 hour]
Prints one JSON line {"rows", "batches", "wall_s", "rows_per_s",
"state_rows_final", "state_bytes_final", "per_batch": [...]}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("n_batches", nargs="?", type=int, default=8)
    ap.add_argument("--keys", default="event_type",
                    help="comma-separated grouping keys (state-cardinality dial)")
    ap.add_argument("--rocksdb", action="store_true",
                    help="use the RocksDB state store provider")
    ap.add_argument("--window", default="1 hour")
    ap.add_argument("--mode", default="complete", choices=["complete", "update"],
                    help="complete = q62's shape (state never pruned; sink "
                         "rewrites the full result each trigger); update = "
                         "production shape (watermark evicts closed windows, "
                         "sink receives only changed rows) — use update for "
                         "high-cardinality state measurements so sink cost "
                         "doesn't mask state-store cost")
    args = ap.parse_args()

    builder = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.streaming.noDataMicroBatches.enabled", "false")
        # the HDFS-backed state store is ON-HEAP: high-cardinality keys
        # (--keys user_id at sf100 ≈ millions of state rows) OOM the 1g
        # local-mode default long before any real knee appears
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
    )
    if args.rocksdb:
        from bacon_spark.streaming.state import ROCKSDB_PROVIDER

        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    from bacon_spark.queries import dec
    from bacon_spark.sources.star import read_table
    from bacon_spark.streaming.windows import (
        run_stream_to_memory,
        scratch_dir,
        stage_ordered_files,
        tumbling_window_agg,
    )

    keys = tuple(k for k in args.keys.split(",") if k)
    ev = read_table(spark, args.sf_dir, "events")
    total = ev.count()
    n_batches = args.n_batches
    d = scratch_dir("stream_bench_")
    # N equal event_id slices, one file per trigger
    bounds = [round(i * total / n_batches) for i in range(n_batches + 1)]
    stage_ordered_files(
        [
            (
                d,
                ev.filter(
                    (F.col("event_id") >= bounds[i]) & (F.col("event_id") < bounds[i + 1])
                ),
                "overwrite" if i == 0 else "append",
            )
            for i in range(n_batches)
        ]
    )
    stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(d)
    agg = tumbling_window_agg(
        stream,
        {"n": F.count(F.lit(1)), "sum_value": F.sum(F.expr(dec("value")))},
        window=args.window,
        keys=keys,
        watermark="1 hour",
    )
    t0 = time.perf_counter()
    try:
        q = run_stream_to_memory(agg, "stream_bench", mode=args.mode)
        wall = time.perf_counter() - t0
    finally:
        shutil.rmtree(d, ignore_errors=True)

    per_batch = []
    state_rows = state_bytes = None
    for p in q.recentProgress:
        ops = p.get("stateOperators") or [{}]
        rec = {
            "batch": p.get("batchId"),
            "input_rows": p.get("numInputRows"),
            "trigger_ms": (p.get("durationMs") or {}).get("triggerExecution"),
            "state_rows": ops[0].get("numRowsTotal"),
            "state_bytes": ops[0].get("memoryUsedBytes")
            or (ops[0].get("customMetrics") or {}).get("rocksdbTotalMemoryUsageBytes"),
        }
        per_batch.append(rec)
        if rec["state_rows"] is not None:
            state_rows, state_bytes = rec["state_rows"], rec["state_bytes"]

    out = {
        "rows": total,
        "batches": n_batches,
        "keys": ",".join(keys),
        "mode": args.mode,
        "store": "rocksdb" if args.rocksdb else "hdfs",
        "wall_s": round(wall, 2),
        "rows_per_s": round(total / wall),
        "state_rows_final": state_rows,
        "state_bytes_final": state_bytes,
        "per_batch": per_batch,
    }
    print(json.dumps(out, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    main()
