"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet dir,
compare row count, schema (column names), and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]

Set CHECK_ORACLE_JSON=<path> to also write a driver-style JSON artifact
(one record per query: rows/schema/hash match booleans + row counts) —
the per-round CORRECTNESS_full_r{N}.json published in-repo because the
driver's own snapshot caps at 50 queries.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0/0.0 and format compactly
        return repr(round(v, 9) + 0.0)
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return repr(v)


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in idx) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    # sf100 shards need a bigger session than the sf0.01 default: cores /
    # heap / parquet batch follow the same env-override convention as the
    # DuckDB caps below (r12), so the harness source stays fixed per SF.
    cores = os.environ.get("CHECK_ORACLE_SPARK_CORES", "8")
    heap = os.environ.get("CHECK_ORACLE_SPARK_MEM", "8g")
    batch = os.environ.get("CHECK_ORACLE_PARQUET_BATCH", "4096")
    # default 2x cores matches the old fixed 16; sf100 needs far more —
    # per-task state in the stateful/as-of shapes scales with rows per
    # shuffle partition, and 16 partitions over 100M events OOMs a 20g
    # heap that 96 partitions fit comfortably
    shuf = os.environ.get("CHECK_ORACLE_SHUFFLE_PARTITIONS", str(2 * int(cores)))
    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", shuf)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", heap)
        # the harness collects every query's full result by design; the
        # 1g serialized-result fuse only breaks the sf100 multi-million-row
        # compares (the heap cap still bounds the process)
        .config("spark.driver.maxResultSize", "0")
        .config("spark.sql.parquet.columnarReaderBatchSize", batch)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    # sharded runs put several DuckDB processes on one VM; DuckDB's
    # default memory_limit is ~80% of PHYSICAL RAM per process, which
    # overcommits the moment two shards hit big oracles concurrently.
    # CHECK_ORACLE_DUCKDB_MEM / _THREADS cap each shard explicitly.
    mem = os.environ.get("CHECK_ORACLE_DUCKDB_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
    thr = os.environ.get("CHECK_ORACLE_DUCKDB_THREADS")
    if thr:
        con.execute(f"SET threads={int(thr)}")
    for t in TABLES:
        # driver fixtures ship each table as one file; the .scale replica
        # dirs are Spark-written DIRECTORIES of part files — glob those
        path = os.path.join(sf_dir, f"{t}.parquet")
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    n_pass = n_fail = n_weak = 0
    report: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        report[name] = rec
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(srows)
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            rec["err"] = f"spark: {e}"
            n_fail += 1
            continue
        finally:
            # operator-managed persists (q139/q140/q155/...) are owned by
            # the session driver: release per query so a 155-query sweep
            # doesn't accumulate executor cache (bench.py does the same)
            from bacon_spark import release_caches

            release_caches()
            spark.catalog.clearCache()
        if name not in oracles:
            print(f"WEAK {name}: rows-only check, {len(srows)} rows")
            rec["err"] = "no_oracle"
            n_weak += 1
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            rec["oracle_rows"] = len(drows)
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            rec["err"] = f"duckdb: {e}"
            n_fail += 1
            continue
        problems = []
        rec["schema_match"] = sorted(scols) == sorted(dcols)
        if not rec["schema_match"]:
            problems.append(f"schema: spark={sorted(scols)} duck={sorted(dcols)}")
        rec["rows_match"] = len(srows) == len(drows)
        if not rec["rows_match"]:
            problems.append(f"rowcount: spark={len(srows)} duck={len(drows)}")
        if not problems:
            s_n = norm_rows(scols, srows)
            d_n = norm_rows(dcols, drows)
            rec["hash_match"] = s_n == d_n
            if not rec["hash_match"]:
                diff = [(a, b) for a, b in zip(s_n, d_n) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} weak")
    out_json = os.environ.get("CHECK_ORACLE_JSON")
    if out_json:
        import json

        with open(out_json, "w") as f:
            json.dump(
                {"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
                 "n_weak": n_weak, "queries": report},
                f, indent=1,
            )
        print("wrote", out_json)
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
