"""The grading driver's contract, as a regression test: __spark_entry__
must expose entry/queries/oracle_sql with matching keys, entry must
return rows, and every oracle must be a non-empty SQL string for a
registered query.  A rename or a missed registration fails HERE, not in
the driver's snapshot."""

import importlib.util
import sys


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "_entry_contract", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_entry_contract"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_entry_returns_rows(spark):
    mod = _load_entry()
    df = mod.entry(spark)
    assert len(df.collect()) > 0
    assert df.columns  # stable, named schema


def test_queries_and_oracles_consistent(spark):
    mod = _load_entry()
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert len(qs) >= 147
    # every oracle key must be a registered query
    assert set(oracles) <= set(qs)
    # r4: every query has an exact oracle — q44 (the last rows-only entry)
    # gained a deterministic-subset multi-batch oracle this round
    missing = set(qs) - set(oracles)
    assert missing == set(), missing
    for name, sql in oracles.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
    for name, fn in qs.items():
        assert callable(fn), name


def test_sampled_queries_run_at_smoke_sf(spark):
    # one query per round-3 family, at the driver's smoke SF
    mod = _load_entry()
    qs = mod.queries()
    for name in [
        "q01_pricing_summary",
        "q102_bpe_pair_counts",
        "q111_global_rank",
        "q120_triangle_count",
        "q131_bloom_prefilter_decontam",
        "q136_jaccard_similarity_join",
        "q140_cm_heavy_hitters",
        "q144_group_kfold",
    ]:
        assert qs[name](spark, "/root/testdata/sf0.001").count() >= 0, name


def test_no_complex_typed_output_columns(spark):
    """r4 verdict task #2: the driver's canonicalizer sorts result cells
    via pandas, which cannot factorize list/struct/map cells — q53 went
    red in the driver's snapshot for exactly this (array<bigint> column)
    while hash-matching in a list-normalizing comparator.  Pin the
    contract: NO queries() output schema and NO oracle_sql() result
    relation may carry a complex-typed column.  Set-valued results must
    be flattened (sorted comma-joined string — the q13/q53 pattern)."""
    import duckdb
    from pyspark.sql.types import ArrayType, MapType, StructType

    mod = _load_entry()
    sf = "/root/testdata/sf0.001"

    bad_spark = []
    for name, fn in mod.queries().items():
        df = fn(spark, sf)
        for field in df.schema.fields:
            if isinstance(field.dataType, (ArrayType, MapType, StructType)):
                bad_spark.append((name, field.name, str(field.dataType)))
    assert bad_spark == [], bad_spark

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    bad_oracle = []
    for name, sql in mod.oracle_sql().items():
        desc = con.execute("DESCRIBE " + sql.rstrip().rstrip(";")).fetchall()
        for col, typ, *_ in desc:
            t = typ.upper()
            if "[]" in t or "STRUCT" in t or "MAP(" in t or "LIST" in t:
                bad_oracle.append((name, col, typ))
    assert bad_oracle == [], bad_oracle


def test_oracle_compare_detects_mutations(spark):
    """Negative control for the correctness harness: the same
    normalization+compare used by tools/check_oracle.py must FAIL on a
    value flip, a row drop, and a column rename — if this test passes,
    a green sweep can't be vacuous."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_co", "/root/repo/tools/check_oracle.py"
    )
    co = importlib.util.module_from_spec(spec)
    import sys as _sys

    _sys.modules["_co"] = co
    spec.loader.exec_module(co)

    cols = ["k", "v"]
    rows = [(1, 10.0), (2, 20.0), (3, None)]
    base = co.norm_rows(cols, rows)
    # identical data in a different row order and column order: EQUAL
    assert co.norm_rows(["v", "k"], [(20.0, 2), (None, 3), (10.0, 1)]) == base
    # value flip: DIFFERENT
    assert co.norm_rows(cols, [(1, 10.0), (2, 20.5), (3, None)]) != base
    # dropped row: DIFFERENT
    assert co.norm_rows(cols, rows[:2]) != base
    # null vs zero: DIFFERENT
    assert co.norm_rows(cols, [(1, 10.0), (2, 20.0), (3, 0.0)]) != base
    # float noise below the 1e-9 normalization threshold: EQUAL (the
    # documented tolerance), above it: DIFFERENT
    assert co.norm_rows(cols, [(1, 10.0 + 1e-12), (2, 20.0), (3, None)]) == base
    assert co.norm_rows(cols, [(1, 10.0 + 1e-6), (2, 20.0), (3, None)]) != base


def test_worker_import_from_foreign_cwd():
    """r4 regression: the gate/ split moved _ensure_workers_import into a
    subpackage and its __file__-relative zip shipped gate/ AS bacon_spark
    — workers then failed any mapInPandas/UDF query when the harness ran
    outside the repo root ('attempted relative import beyond top-level
    package'). Run a Python-worker gate query from /tmp to pin the fix."""
    import os
    import subprocess
    import sys
    import tempfile

    code = """
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as m
n = m.queries()["q46_multimodal_features"](spark, "/root/testdata/sf0.001").count()
assert n > 0, n
print("FOREIGN_CWD_OK")
"""
    # a stale zip from another session must not mask the logic under test
    stale = os.path.join(tempfile.gettempdir(), "bacon_spark_pkg.zip")
    if os.path.exists(stale):
        os.unlink(stale)
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=tempfile.gettempdir(),
    )
    assert "FOREIGN_CWD_OK" in r.stdout, (r.stdout[-1500:], r.stderr[-1500:])
