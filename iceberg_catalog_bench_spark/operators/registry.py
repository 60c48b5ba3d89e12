"""Query registry.

Every implemented operator from SURVEY.md §2 registers here as a
named query ``(spark, sf_dir) -> DataFrame`` plus (when expressible)
an equivalent ANSI-SQL oracle string that DuckDB runs on the same
parquet tables. The driver's correctness gate compares the two.

Column names are part of the contract: alias every computed column
identically in the Spark code and the oracle SQL — the driver sorts
columns by name before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` → driver does a rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Round-10 rotation (VERDICT r9 item 2, recomputed from the
# CORRECTNESS_r01-r09 union: staleness histogram r6:29, r7:50, r8:50,
# r9:50; never-green = exactly the 6 debuts). Tier (a) = the 6 debuts
# (2 staged in r9 + 4 new this round) + iceberg_register_adopted,
# whose adoption path this round rewired (bucket[N] partition values
# now convert to the murmur3 ibucket transform and PRUNE). Tier (b) =
# the FULL 29-query r6-latest cohort (4-rounds-stale if skipped).
# The remaining 14 slots take the riskiest r7 rows: the six VERDICT
# names (merge_upsert, snapshot_lineage, time_travel_checksum,
# harness_crud_plan, tag_and_rollback, iceberg_metadata_roundtrip —
# M5/T1/T2/T5/T6/V1-V4 pins; the roundtrip row also re-proves the
# export changes) + eight rows over this round's touched surfaces
# (the partitioned write path, overwrite, streaming source reads, the
# RRF sibling, and two bench headliners). 7 + 29 + 14 = 50 exactly;
# after this round nothing is latest-green older than r7.
# REFRESH EACH ROUND: rebuild from the union of CORRECTNESS_r*.json —
# never-green and code-touched queries first, oldest-green next.
PRIORITY: tuple[str, ...] = (
    # -- (a) never driver-checked debuts (6) + code-touched (1) --
    "adopted_bucket_pruning",        # r10 headline: murmur3 bucket interop
    "text_bm25_keyword_search",      # staged r9
    "iceberg_validate_preflight",    # staged r9; now 4-phase with repair
    "hybrid_search_bm25_rrf",        # r10: BM25-backed RRF
    "tpcds_frequent_buyer_segments", # r10: Q34/Q73 shape
    "tpcds_net_after_returns",       # r10: Q93 shape
    "iceberg_register_adopted",      # adoption path rewired this round
    # -- (b) the full r6-latest cohort (29; freshness bar: 4 rounds) --
    "centroid_by_label",
    "dedup_connected_components",
    "embedding_quantize_int8",
    "join_range_error_context",
    "multimodal_audio_features",
    "multimodal_frame_sample",
    "multimodal_image_meta",
    "pipeline_training_data",
    "sessionize_batch",
    "streaming_dedup_count",
    "streaming_enrich_join",
    "streaming_stream_stream_join",
    "streaming_windowed_agg",
    "text_fingerprint",
    "text_lang_id",
    "text_quality_pandas_udf",
    "text_quality_scores",
    "text_token_count",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_type_profit",
    "tpch_q10_returned_items",
    "tpch_q13_customer_distribution",
    "tpch_q14_promotion_effect",
    "tpch_q15_top_supplier",
    "tpch_q16_parts_supplier",
    # -- (c) riskiest r7-latest rows (14) --
    "merge_upsert",
    "snapshot_lineage",
    "time_travel_checksum",
    "harness_crud_plan",
    "tag_and_rollback",
    "iceberg_metadata_roundtrip",
    "insert_overwrite_backfill",
    "streaming_table_source_cdc_cow",
    "streaming_table_source_read",
    "incremental_read_changes",
    "merge_not_matched_by_source",
    "hybrid_search_rrf",
    "pipeline_curate_full",
    "percentile_approx_by_group",
    # ---- 50 cap lands exactly here ----
    # -- below-cap: r11 debuts (registered late in r10, after the cap
    # was already exactly full) --
    "dedup_semantic_clusters",
    "merge_schema_evolution",
    # -- below-cap: the remaining r7-latest cohort (36; the round-11
    # rotation tier), greens early only if the driver runs deeper
    # than 50 --
    "attribution_last_touch",
    "basket_part_affinity",
    "corpus_contamination_check",
    "corpus_mixture_weights",
    "corpus_shard_manifest",
    "corpus_shuffle_shards",
    "corpus_split_train_val_test",
    "customer_rfm_segments",
    "dedup_incremental_minhash",
    "dedup_minhash_lsh",
    "distinct_users_approx",
    "doc_length_histogram",
    "events_anomaly_zscore",
    "events_gapfill_locf",
    "events_resample_ohlc",
    "grouping_sets_revenue",
    "pipeline_pack_sequences",
    "regexp_functions_suite",
    "retention_cohort_weekly",
    "sample_importance_weighted",
    "sample_stratified_by_lang",
    "sketch_hll_union_rollup",
    "text_chunk_sliding",
    "text_pii_redaction",
    "text_repetition_scores",
    "text_unigram_logprob",
    "tokenizer_bpe_pair_counts",
    "top_tokens",
    "tpcds_multi_band_counts",
    "tpcds_rank_within_parent",
    "tpcds_star_join_multi_dim",
    "tpch_q2_min_cost_supplier",
    "tpch_q11_important_stock",
    "tpch_q12_priority_shipping",
    "tpch_q18_large_volume_customer",
    "tpch_q20_potential_promotion",
)


def load_all() -> None:
    """Import every operator module, then reorder the registry.

    Registration order is the driver's execution order, and the driver
    may stop at a query-count or time cap mid-suite (rounds 1-2 ran 50
    each). After importing all modules, :data:`PRIORITY` (the queries
    without a green CORRECTNESS row yet) is moved to the front so the
    cap verifies the never-verified surface first; already-green
    queries re-run only if the cap allows.
    """
    from . import crud  # noqa: F401  — UPDATE/DELETE/MERGE/travel/evolution
    from . import similarity  # noqa: F401
    from . import dedup  # noqa: F401
    from . import temporal  # noqa: F401
    from . import analytics  # noqa: F401
    from . import multimodal  # noqa: F401
    from ..streaming import events  # noqa: F401
    from ..streaming import table_source  # noqa: F401  — laketable format
    from ..sources import datagen  # noqa: F401
    from . import text  # noqa: F401
    from . import corpus  # noqa: F401
    from . import relational  # noqa: F401
    from . import relational_ext  # noqa: F401
    from . import tpcds  # noqa: F401
    from . import tpch_complete  # noqa: F401  — Q2/Q4/Q7/Q9/Q11-16/Q20
    from . import physical  # noqa: F401
    from . import quality  # noqa: F401

    ordered = [n for n in PRIORITY if n in QUERIES]
    ordered += [n for n in QUERIES if n not in PRIORITY]
    reordered = {n: QUERIES[n] for n in ordered}
    QUERIES.clear()
    QUERIES.update(reordered)
