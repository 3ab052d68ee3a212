"""Print formatted physical plans for the headline queries — the plan-shape
audit tool backing SCALE.md's claims (PushedFilters / BroadcastHashJoin /
WholeStageCodegen / TakeOrderedAndProject).

Usage: python tools/explain.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")

DEFAULT = [
    "q01_pricing_summary",
    "q02_revenue_by_region_nation",
    "q04_top_customers",
    "q28_lsh_candidate_pairs",
    "q31_cosine_topk",
    "q59_asof_join",
    "q60_range_join",
    "q61_bucketed_star_join",
    "q102_bpe_pair_counts",
    "q104_hourly_concurrency",
    "q107_inverted_index",
    "q111_global_rank",
    "q118_salted_skew_join",
    "q120_triangle_count",
    "q126_point_in_time_lookup",
    "q140_cm_heavy_hitters",
    "q150_winnow_capped_pairs",
    "q151_canonical_dedup_scalable",
    "q152_embedding_dedup_scalable",
    "q153_quality_filter_scores",
    "q155_corpus_prep_v2",
    "q156_kmeans_clusters",
    "q157_semantic_dedup",
    "q158_segment_dedup",
    "q159_leakage_safe_split",
    "q160_pq_ann_topk",
    "q161_ivfpq_ann_topk",
    "q162_within_doc_dedup",
    "q163_hll_vocabulary",
    "q164_kmv_corpus_overlap",
    "q165_sketch_distinct_measure",
    "q166_ams_selfjoin_size",
]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or DEFAULT
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from bacon_spark.queries import QUERIES

    for name in names:
        print(f"\n{'='*70}\n{name}\n{'='*70}")
        QUERIES[name](spark, sf_dir).explain("formatted")
    spark.stop()


if __name__ == "__main__":
    main()
