"""The gate-query -> one-time-layout-build registry shared by
tools/scale_sweep.py and tools/isolated_cell.py.

A gate query with a `prepare` hook (prebuilt index / bucketed layout /
staged stream input) must have its builder listed here, or a timing
harness bills the once-per-ingest build into the query's steady-state
number (VERDICT r4 task #5: q61's 19.9x decade headline was ~all build
cost).  Builders are idempotent: when the artifact already exists the
build slot records the (cheap) registration.
"""

from __future__ import annotations


def layout_builds() -> dict:
    from bacon_spark.gate._base import _token_prebuilt
    from bacon_spark.gate import streaming as _gs
    from bacon_spark.gate.llm import (
        _containment_delta_prebuilt,
        _containment_prebuilt,
        _ivfpq_append_prebuilt,
        _ivfpq_prebuilt,
        _neardup_edges_prebuilt,
        _pq_prebuilt,
    )
    from bacon_spark.gate.warehouse import (
        _orders_month_layout_prebuilt,
        _stats_layout_prebuilt,
        bucketed_star_tables,
    )

    return {
        "q61_bucketed_star_join": bucketed_star_tables,
        "q84_top_ngrams": _token_prebuilt,  # once-per-ingest token table (r8)
        "q86_top_ngrams_sampled": _token_prebuilt,
        "q87_boilerplate_ngrams": _token_prebuilt,
        "q140_cm_heavy_hitters": _token_prebuilt,
        "q151_canonical_dedup_scalable": _neardup_edges_prebuilt,  # verified star edges (r8)
        "q159_leakage_safe_split": _neardup_edges_prebuilt,
        "q160_pq_ann_topk": _pq_prebuilt,  # plain-PQ index ingest-build (r8)
        "q161_ivfpq_ann_topk": _ivfpq_prebuilt,  # shares the q169 artifact (r8)
        "q169_ivfpq_index_search": _ivfpq_prebuilt,  # ANN index ingest-build
        "q173_ivfpq_index_append": _ivfpq_append_prebuilt,  # build + frozen-model append
        "q180_stats_pruned_scan": _stats_layout_prebuilt,  # clustered layout + footer stats
        "q175_containment_dedup": _containment_prebuilt,  # r10: routed through the index
        "q184_containment_probe": _containment_prebuilt,  # bottom-k signature index
        "q187_partition_pruned_month_drill": _orders_month_layout_prebuilt,  # hive month layout (r8)
        "q186_containment_delta_probe": _containment_delta_prebuilt,  # corpus-slice index
        # streaming staged inputs (r8): arrival-order fabrication is the
        # once-per-ingest build; the timed pass is the stream run alone
        "q44_streaming_tumbling": _gs._stage_q44,
        "q62_streaming_oracle": _gs._stage_q62,
        "q64_streaming_asof": _gs._stage_q64,
        "q66_streaming_asof_forward": _gs._stage_q66,
        "q67_streaming_overlap_join": _gs._stage_q67,
        "q75_streaming_dedup_groups": _gs._stage_q75,
        "q85_streaming_session": _gs._stage_q85,
        "q99_watermark_late_drop": _gs._stage_q99,
        "q100_stream_stream_join": _gs._stage_q100,
        "q141_streaming_cdc_upsert": _gs._stage_q141,
        "q167_streaming_distinct_sketch": _gs._stage_q167,
        "q176_streaming_quantile_sketch": _gs._stage_q176,
        "q183_streaming_funnel": _gs._stage_q183,
        "q188_streaming_funnel_sharded": _gs._stage_q183,  # shared staged input
        "q189_streaming_funnel_auto": _gs._stage_q183,  # shared staged input
    }
