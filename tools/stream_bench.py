"""Structured-Streaming throughput measurement: drive the full events
fixture through the watermarked tumbling-window pipeline (q62's shape) in
N file-triggered micro-batches and report rows/sec end-to-end — the
number behind SCALE.md's streaming-section claims.

Usage: python tools/stream_bench.py [sf_dir] [n_batches]
Prints one JSON line {"rows": N, "batches": B, "wall_s": W, "rows_per_s": R}.
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.streaming.noDataMicroBatches.enabled", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from bacon_spark.queries import dec
    from bacon_spark.sources.star import read_table
    from bacon_spark.streaming.windows import (
        run_stream_to_memory,
        scratch_dir,
        stage_ordered_files,
        tumbling_window_agg,
    )

    ev = read_table(spark, sf_dir, "events")
    total = ev.count()
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
        window="1 hour",
        keys=("event_type",),
        watermark="1 hour",
    )
    t0 = time.perf_counter()
    try:
        run_stream_to_memory(agg, "stream_bench", mode="complete")
        wall = time.perf_counter() - t0
    finally:
        shutil.rmtree(d, ignore_errors=True)
    out = {
        "rows": total,
        "batches": n_batches,
        "wall_s": round(wall, 2),
        "rows_per_s": round(total / wall),
    }
    print(json.dumps(out, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    main()
