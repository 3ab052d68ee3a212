"""Per-query bench profiler (r13 optimization round): bench.py's exact
session + warmup + timing methodology, plus a breakdown the bench line
cannot show —

* build seconds (driver-side plan construction: the time from calling
  the query fn to having the DataFrame, before any action) vs exec
  seconds (the .count());
* Spark job/stage counts and per-stage task-time totals pulled from the
  UI REST API, so shuffle-heavy vs scheduling-bound vs Python-bound
  queries are distinguishable without screenshots.

Usage: python tools/profile_queries.py [sf_dir] [query ...] [--repeat N]
Writes JSON lines to stdout (one per query) and a summary to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def rest(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read().decode())


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="*")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bacon_spark-profile")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    from bacon_spark.queries import QUERIES

    names = args.names or list(QUERIES)
    warm_dir = "/root/testdata/sf0.001"

    # bench-identical warmup (codegen/JIT absorb) for the chosen queries
    for name in names:
        try:
            QUERIES[name](spark, warm_dir).count()
        except Exception:
            pass
    for name in names:
        prep = getattr(QUERIES[name], "prepare", None)
        if prep is not None:
            try:
                prep(spark, args.sf_dir)
            except Exception as e:
                print(f"prepare error in {name}: {e}", file=sys.stderr)
    spark.catalog.clearCache()

    def cleanup():
        from bacon_spark import release_caches

        for tbl in spark.catalog.listTables():
            if tbl.isTemporary:
                spark.catalog.dropTempView(tbl.name)
        release_caches()
        spark.catalog.clearCache()

    def jobs_snapshot():
        try:
            return {j["jobId"]: j for j in rest(f"{ui}/api/v1/applications/{app_id}/jobs")}
        except Exception:
            return {}

    records = []
    for name in names:
        fn = QUERIES[name]
        best = None
        for rep in range(args.repeat):
            before = jobs_snapshot()
            t0 = time.perf_counter()
            try:
                df = fn(spark, args.sf_dir)
                t1 = time.perf_counter()
                df.count()
                t2 = time.perf_counter()
            except Exception as e:
                print(f"error in {name}: {e}", file=sys.stderr)
                break
            after = jobs_snapshot()
            new_jobs = [j for jid, j in after.items() if jid not in before]
            stage_ids = sorted({s for j in new_jobs for s in j.get("stageIds", [])})
            stages = []
            try:
                all_stages = rest(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
                smap = {}
                for s in all_stages:
                    smap.setdefault(s["stageId"], s)
                for sid in stage_ids:
                    s = smap.get(sid)
                    if s:
                        stages.append(
                            {
                                "id": sid,
                                "name": s["name"].split("\n")[0][:60],
                                "tasks": s.get("numCompleteTasks"),
                                "ms": s.get("executorRunTime"),
                                "cpu_ms": round((s.get("executorCpuTime") or 0) / 1e6),
                                "sh_r": s.get("shuffleReadBytes"),
                                "sh_w": s.get("shuffleWriteBytes"),
                                "in": s.get("inputBytes"),
                            }
                        )
                stages.sort(key=lambda s: -(s["ms"] or 0))
            except Exception:
                pass
            rec = {
                "q": name,
                "rep": rep,
                "build_s": round(t1 - t0, 3),
                "exec_s": round(t2 - t1, 3),
                "total_s": round(t2 - t0, 3),
                "n_jobs": len(new_jobs),
                "n_stages": len(stage_ids),
                "task_ms_sum": sum(s["ms"] or 0 for s in stages),
                "stages": stages[:8],
            }
            if best is None or rec["total_s"] < best["total_s"]:
                best = rec
            cleanup()
        if best is not None:
            records.append(best)
            print(
                f"{name}: total={best['total_s']}s build={best['build_s']}s "
                f"exec={best['exec_s']}s jobs={best['n_jobs']} stages={best['n_stages']} "
                f"taskms={best['task_ms_sum']}",
                file=sys.stderr,
            )
    out = json.dumps(records, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out)
    else:
        print(out)
    spark.stop()


if __name__ == "__main__":
    main()
