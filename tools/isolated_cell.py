"""Measure ONE gate query at ONE dataset in a fresh JVM (VERDICT r10
next #1): the decade sweeps run every cell in a single long-lived
local-mode JVM, which is fine for the broad median but let measurement
order confound the q175/q184 containment-probe pair at sf100 (run-1's
9.6/139 vs 25.9/84 s spread for the same physical probe) and a clean
re-run of the pair OOM'd the shared 24 g heap in the parquet vectored
reader.  One process per (query, SF) cell removes both: no neighbour's
GC debris, and `spark.sql.parquet.columnarReaderBatchSize` capped so 32
concurrent column readers of the sf100 text column fit the local-mode
heap (a cluster executor brings its own heap; this cap is a local-mode
measurement aid, not a product setting).

Usage: python tools/isolated_cell.py QUERY SF_DIR [--out cell.json]
       [--batch-size 1024]
Writes {"query", "sf_dir", "build": s|None, "t": s, "rows": n} — the
same build/t split as tools/scale_sweep.py (prepare hooks billed to
build, steady-state query to t), warmed at sf0.001 first like the sweep
so codegen/JIT is absorbed.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

WARM = "/root/testdata/sf0.001"


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("sf_dir")
    ap.add_argument("--out", default=None)
    ap.add_argument("--batch-size", type=int, default=1024)
    ap.add_argument("--repeat", type=int, default=1,
                    help="time the query N times in this JVM; t is the "
                         "last run (steady state), t_all records all")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.parquet.columnarReaderBatchSize", str(args.batch_size))
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from bacon_spark.queries import QUERIES
    from tools.scale_sweep_builds import layout_builds  # shared registry

    fn = QUERIES[args.query]
    try:
        fn(spark, WARM).count()  # absorb codegen/JIT, as the sweep does
    except Exception as e:
        print(f"warmup error: {e}", file=sys.stderr)
    spark.catalog.clearCache()

    rec = {"query": args.query, "sf_dir": args.sf_dir,
           "batch_size": args.batch_size, "build": None}
    builder = layout_builds().get(args.query)
    if builder is not None:
        t0 = time.perf_counter()
        builder(spark, args.sf_dir)
        rec["build"] = round(time.perf_counter() - t0, 2)
        spark.catalog.clearCache()
    times = []
    for _ in range(max(1, args.repeat)):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        rec["rows"] = fn(spark, args.sf_dir).count()
        times.append(round(time.perf_counter() - t0, 2))
    rec["t"] = times[-1]
    if len(times) > 1:
        rec["t_all"] = times
    line = json.dumps(rec)
    print(line, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line)


if __name__ == "__main__":
    main()
