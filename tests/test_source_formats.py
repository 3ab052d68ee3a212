"""Source-format parity: the engine's tables round-trip through every
built-in columnar/row format Spark ships (parquet is the primary path;
ORC / JSON-lines / CSV / text must behave identically for ingest) —
the §2.1 sources axis beyond the star parquet reader."""

from pyspark.sql import functions as F

from bacon_spark.sources.star import read_table


def _orders(spark, sf_dir):
    return read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    src = _orders(spark, sf_dir)
    path = str(tmp_path / "orders_orc")
    src.write.orc(path)
    back = spark.read.orc(path)
    assert _canon(back) == _canon(src)
    # predicate pushdown reaches the ORC scan too
    filtered = back.filter(F.col("o_orderkey") < 100)
    explained = filtered._jdf.queryExecution().toString()
    assert "PushedFilters" in explained and "o_orderkey" in explained
    assert _canon(filtered) == _canon(src.filter(F.col("o_orderkey") < 100))


def test_jsonlines_roundtrip_with_schema(spark, sf_dir, tmp_path):
    src = _orders(spark, sf_dir)
    path = str(tmp_path / "orders_json")
    src.write.json(path)
    # schema-on-read: explicit schema avoids the double-scan inference
    schema = "o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double"
    back = spark.read.schema(schema).json(path).select(*src.columns)
    assert _canon(back) == _canon(src)


def test_text_source_feeds_document_operators(spark, tmp_path):
    # raw text ingest (one line = one doc) flows into the llm text ops
    from bacon_spark.llm.text import tokens

    lines = ["the quick brown fox", "pack my box", "the lazy dog"]
    p = tmp_path / "docs.txt"
    p.write_text("\n".join(lines) + "\n")
    df = spark.read.text(str(p))
    toks = df.select(F.explode(tokens(F.col("value"))).alias("w"))
    got = sorted(r["w"] for r in toks.collect())
    want = sorted(w for ln in lines for w in ln.split())
    assert got == want
