"""Deterministic sampling + decontamination operators (operators/sampling.py,
llm/decontam.py): semantics, determinism, and the plan shapes the 100 TB
design depends on (map-side-only filters, broadcast probe)."""

import pytest
from pyspark.sql import functions as F

from bacon_spark.llm.decontam import contaminated_ids, decontaminate
from bacon_spark.operators.sampling import (
    group_sample,
    hash_sample,
    mix_sources,
    mixture_rates,
    stratified_sample,
)
from bacon_spark.sources.star import read_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents")


def test_hash_sample_rate_and_determinism(docs):
    total = docs.count()
    kept = hash_sample(docs, "doc_id", 0.3, salt="t")
    n = kept.count()
    assert abs(n / total - 0.3) < 0.1  # uniform draw, small-sample tolerance
    # re-running selects the exact same rows (pure function of key+salt)
    again = {r.doc_id for r in hash_sample(docs, "doc_id", 0.3, salt="t").collect()}
    assert {r.doc_id for r in kept.collect()} == again
    # a different salt gives an independent (different) selection
    other = {r.doc_id for r in hash_sample(docs, "doc_id", 0.3, salt="u").collect()}
    assert again != other


def test_hash_sample_is_map_side_only(docs):
    plan = hash_sample(docs, "doc_id", 0.5)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle: a pure filter over the scan


def test_stratified_sample_respects_fractions(docs):
    kept = stratified_sample(docs, "lang", "doc_id", {"en": 1.0}, default=0.0)
    langs = {r.lang for r in kept.select("lang").distinct().collect()}
    assert langs == {"en"}
    assert kept.count() == docs.filter("lang = 'en'").count()  # rate 1.0 keeps all


def test_group_sample_k_per_group_and_uniqueness(docs):
    out = group_sample(docs, ["lang"], "doc_id", k=3, salt="g")
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    per_group = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in counts.items():
        assert n == min(3, per_group[lang])
    assert out.count() == out.select("doc_id").distinct().count()  # without replacement


def test_mixture_rates_resolution():
    rates = mixture_rates(
        counts={"a": 1000, "b": 1000}, weights={"a": 3, "b": 1}, target_total=400
    )
    assert rates == {"a": 0.3, "b": 0.1}
    # upsampling is capped at 1.0
    capped = mixture_rates(counts={"a": 10}, weights={"a": 1}, target_total=1000)
    assert capped == {"a": 1.0}


def test_mix_sources_tags_and_unions(docs):
    srcs = {n: docs.filter(F.col("source") == n) for n in ("src0", "src1")}
    mixed = mix_sources(srcs, {"src0": 1.0, "src1": 0.0}, "doc_id")
    tags = {r.mix_source for r in mixed.select("mix_source").distinct().collect()}
    assert tags == {"src0"}  # rate-0 source contributes nothing
    assert mixed.count() == docs.filter("source = 'src0'").count()
    plan = mixed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # filters + union: still zero-shuffle


def test_decontaminate_partitions_train(docs):
    eval_df = docs.filter(F.col("doc_id") % 10 == 0)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    bad = contaminated_ids(train, eval_df, k=3)
    clean = decontaminate(train, eval_df, k=3)
    n_bad, n_clean, n_train = bad.count(), clean.count(), train.count()
    assert n_bad > 0  # synthetic vocab guarantees 3-gram collisions
    assert n_bad + n_clean == n_train
    # clean set really shares no 3-gram with eval
    assert clean.join(bad, "doc_id", "left_semi").count() == 0


def test_decontam_probe_is_broadcast(docs):
    eval_df = docs.filter(F.col("doc_id") % 10 == 0)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    plan = (
        contaminated_ids(train, eval_df, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan  # eval shingles broadcast; train never shuffles


def test_dataset_split_thirds_never_null(docs):
    # regression (round-2 advice): {1/3,1/3,1/3} float-sums to 1.0 but the
    # rounded cumulative thresholds top out at 999999 — the last bucket
    # must be an OTHERWISE so no draw falls through to NULL, and the
    # DuckDB twin must agree on every row
    import duckdb

    from bacon_spark.operators.sampling import dataset_split, dataset_split_sql

    fracs = {"train": 1 / 3, "val": 1 / 3, "test": 1 / 3}
    out = dataset_split(docs, "doc_id", fracs, salt="thirds")
    assert out.filter(F.col("split").isNull()).count() == 0
    spark_rows = {r.doc_id: r.split for r in out.select("doc_id", "split").collect()}

    # recompute via the SQL twin over the same parquet
    con = duckdb.connect()
    sql = dataset_split_sql("doc_id", fracs, salt="thirds")
    paths = [f.replace("file:", "") for f in docs.inputFiles()]
    duck = dict(
        con.execute(
            f"SELECT doc_id, {sql} AS split FROM read_parquet({paths!r})"
        ).fetchall()
    )
    assert duck == spark_rows
    assert None not in set(duck.values())


def test_lsh_sql_twin_honors_custom_seeds(spark, sf_dir):
    # regression (round-2 advice): the SQL CTE hard-coded seeds 1..N; a
    # custom seed set must produce identical buckets in both engines
    import duckdb

    from bacon_spark.llm.similarity import hyperplane_bits, hyperplane_planes_sql_cte
    from bacon_spark.llm.dedup import hash60_sql  # noqa: F401  (dialect shared)
    from bacon_spark.sources.star import read_table

    seeds = (101, 7, 42)
    emb = read_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 40)
    dim = len(emb.select("embedding").head()[0])
    spark_buckets = {
        r.vec_id: r.b
        for r in emb.select(
            "vec_id", hyperplane_bits(F.col("embedding"), dim, seeds).alias("b")
        ).collect()
    }
    con = duckdb.connect()
    paths = [f.replace("file:", "") for f in emb.inputFiles()]
    proj = (
        "list_sum(list_transform(list_zip(embedding, plane), "
        "p -> p[1]::DOUBLE * p[2]::DOUBLE))"
    )
    duck_buckets = dict(
        con.execute(
            f"""
            WITH planes AS ({hyperplane_planes_sql_cte(dim, seeds)})
            SELECT vec_id,
                   sum(CASE WHEN {proj} > 0 THEN (1::BIGINT << si) ELSE 0 END)::BIGINT
            FROM read_parquet({paths!r}) CROSS JOIN planes
            WHERE vec_id < 40 GROUP BY 1
            """
        ).fetchall()
    )
    assert duck_buckets == spark_buckets


def test_mix_to_token_budget_quota_semantics(spark):
    from bacon_spark.operators.sampling import mix_to_token_budget

    rows = [
        (i, f"s{i % 3}", " ".join(["w"] * (10 + i % 7)))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    toks = F.size(F.split(F.col("text"), " "))
    weights = {"s0": 3.0, "s1": 1.0}  # s2 excluded entirely
    budget = 400  # quotas: s0=300, s1=100 — both bind (each source ~500 tokens)
    kept = mix_to_token_budget(df, weights, budget, toks)
    per = {
        r["source"]: (r["n"], r["tok"])
        for r in kept.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("token_count").alias("tok"))
        .collect()
    }
    assert set(per) == {"s0", "s1"}  # s2 never sampled
    max_doc = 16
    assert 300 <= per["s0"][1] < 300 + max_doc  # within one doc of quota
    assert 100 <= per["s1"][1] < 100 + max_doc
    # a source smaller than its quota is kept whole
    whole = mix_to_token_budget(df, {"s2": 1.0}, 10**6, toks)
    assert whole.count() == 40
    # deterministic across partitionings
    a = sorted(map(tuple, kept.collect()))
    b = sorted(map(tuple, mix_to_token_budget(df.repartition(13), weights, budget, toks).collect()))
    assert a == b
