"""Cluster-topology independence: the queries whose docstrings claim
bit-reproducibility must return IDENTICAL rows under different shuffle
partition counts (the local analogue of running on a different cluster
size).  Floating-point aggregation order, hash partitioning, and salt
derivation are the usual leak points — this pins them."""

import pytest

from bacon_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"

#: queries with engineered determinism claims (integer/dyadic/IEEE-exact
#: arithmetic or deterministic salts) — failures here mean results would
#: differ between a laptop and a 1000-executor cluster
SENSITIVE = [
    "q103_ewma_customer_spend",
    "q104_hourly_concurrency",
    "q105_price_quantity_regression",
    "q106_pagerank_doc_graph",
    "q111_global_rank",
    "q112_quantile_buckets",
    "q118_salted_skew_join",
    "q122_time_weighted_avg",
    "q132_temperature_mixture",
    "q121_grouped_fit_pandas",
    "q131_bloom_prefilter_decontam",
    "q135_markov_transitions",
    "q136_jaccard_similarity_join",
    "q139_quantized_ann_topk",
    "q140_cm_heavy_hitters",
    "q144_group_kfold",
    "q138_embedding_quantization",
    "q55_stratified_sample",
    "q82_dataset_split",
    # r4 additions: star-edge dedup (CC labels must not depend on
    # partitioning), df-capped winnowing, integer quality logits, pHash
    # banding, and the composed v2 pipeline
    "q150_winnow_capped_pairs",
    "q151_canonical_dedup_scalable",
    "q152_embedding_dedup_scalable",
    "q153_quality_filter_scores",
    "q154_multimodal_phash_dedup",
    "q155_corpus_prep_v2",
    # r5 additions: k-means assignment (decimal-exact centroid update)
    # and the SemDeDup composition on top of it
    "q156_kmeans_clusters",
    "q157_semantic_dedup",
    # r5 sketches: HLL registers merge by max (order-free); KMV k-minima
    # are a set property, not a partitioning property
    "q163_hll_vocabulary",
    "q164_kmv_corpus_overlap",
    "q165_sketch_distinct_measure",
    "q166_ams_selfjoin_size",
    "q168_auto_salted_join",
    # r6 additions: prebuilt/appended ANN search (routing + ADC must not
    # depend on partitioning), histogram-sketch quantiles (integer
    # buckets/ranks), JL projection (literal folds), containment
    # signatures (k-minima are a set property)
    "q169_ivfpq_index_search",
    "q171_hll_vocabulary_sketch_only",
    "q172_hist_sketch_quantiles",
    "q173_ivfpq_index_append",
    "q174_jl_projection_recall",
    "q175_containment_dedup",
    "q177_sketch_percentile_measure",
    "q178_event_funnel",
    "q179_cohort_retention",
    "q180_stats_pruned_scan",
    "q181_token_budget_mixture",
]


def _rows(spark, name):
    df = QUERIES[name](spark, SF)
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", SENSITIVE)
def test_identical_across_shuffle_partitions(spark, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        low = _rows(spark, name)
        spark.conf.set("spark.sql.shuffle.partitions", "29")
        high = _rows(spark, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert low == high, f"{name}: results depend on partitioning"
