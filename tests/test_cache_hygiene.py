"""VERDICT r4 task #4: operators that persist intermediates the returned
plan still reads (q139's quantized corpus, q140's token frame, q155's
filtered corpus + the shingle frame inside canonical_dedup_scalable) must
register them with utils.caching so the session owner can release them —
otherwise a user composing several such operators in one long session
re-inherits the cache leak the bench fixed for itself in round 3."""

from pyspark.sql import functions as F


def _cache_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_managed_queries_release_cleanly(spark):
    from bacon_spark import release_caches
    from bacon_spark.queries import QUERIES

    release_caches()
    spark.catalog.clearCache()
    assert _cache_empty(spark)

    sf = "/root/testdata/sf0.001"
    for name in [
        "q139_quantized_ann_topk",
        "q140_cm_heavy_hitters",
        "q155_corpus_prep_v2",
        "q158_segment_dedup",
    ]:
        assert QUERIES[name](spark, sf).count() > 0, name

    # negative control: the persists really happened (a vacuously empty
    # cache would make the release assertion below meaningless)
    assert not _cache_empty(spark)

    release_caches()
    assert _cache_empty(spark), "managed persists must all unpersist"


def test_release_caches_is_idempotent_and_counts(spark):
    from bacon_spark import managed_persist, release_caches

    release_caches()
    df = managed_persist(spark.range(10).withColumn("x", F.col("id") * 2))
    assert df.count() == 10
    assert release_caches() == 1
    assert release_caches() == 0
    assert _cache_empty(spark)
