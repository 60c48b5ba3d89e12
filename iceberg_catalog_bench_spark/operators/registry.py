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


# Round-15 rotation (VERDICT r14 item 1, recomputed from the
# CORRECTNESS_r01-r14 union: staleness histogram r10:24, r11:41,
# r12:50, r13:44, r14:50; 209/209 latest-green, zero red;
# never-green: the 2 staged r14 debuts).
# Tier (a) = the 2 staged r14 debuts + the 4 brand-new r15 debuts
# (binary-in-container netting, float/binary/nested-map-KEY netting,
# duplicate-span dedup, DAY-TO-SECOND interval pipe — never-green-
# first, each served the round it ships) + the 3 r15-code-touched
# rows: the canonical container rendering moved to raw bytes and
# rendered-key entry sort (_canon_strings — the cow-netting rows
# execute it) and changelog() gained map-column netting
# (cdc_changelog exercises the changelog path; its map-free schema
# takes the unchanged guard branch, but it IS the flagship changelog
# row). Demoted with reason: mv_incremental_maintenance and
# mv_join_incremental_maintenance also call changelog() but are
# map-free (guard-only delta, identical plan) and r12-latest — they
# rotate in with the r12 cohort next round rather than displace two
# r11 rows here. = 9.
# Tier (b) = ALL 24 r10-latest rows (five rounds stale if skipped;
# the VERDICT says no deferral) = 33 cumulative.
# Fill = 17 of the 41 r11-latest rows; none is r15-code-touched, so
# the pick is the most hand-written surface first: the merge matrix,
# the dedup/sketch bank, the text/corpus LLM-pipeline rows, and
# ddl_lifecycle. 9 + 24 + 17 = 50 exactly. Below the cap: the 5
# staged r16 TPC-DS shapes (oracle-green in the sweep) lead
# r16's tier (a), the 24 deferred r11 rows its tier (b); no
# driver-green row is older than r11 after this round.
# REFRESH EACH ROUND: rebuild from the union of CORRECTNESS_r*.json —
# never-green and code-touched queries first, oldest-green next.
PRIORITY: tuple[str, ...] = (
    # -- (a) staged r14 debuts (never driver-checked) --
    "tpcds_ticket_size_repeat_buyers",      # Q34/Q73: ticket buckets
    "tpcds_customer_value_yoy_lag",         # Q11 on the LAG spine
    # -- (a) r15 debuts: binary-in-container netting + float-map-key
    # netting + duplicate-span dedup + interval pipe, driver-checked
    # the round they ship (never-green-first) --
    "streaming_cdc_binary_netting",
    "streaming_cdc_mapkey_netting",
    "dedup_substring_spans",
    "streaming_interval_laketable",
    # -- (a) r15 code-touched (raw-bytes rendering / map changelog) --
    "streaming_cdc_nested_netting",
    "streaming_table_source_cdc_cow",
    "cdc_changelog",
    # -- (b) ALL 24 r10-latest rows (no deferral) --
    "centroid_by_label",
    "embedding_quantize_int8",
    "hybrid_search_bm25_rrf",
    "hybrid_search_rrf",
    "join_range_error_context",
    "percentile_approx_by_group",
    "pipeline_curate_full",
    "pipeline_training_data",
    "text_bm25_keyword_search",
    "text_quality_pandas_udf",
    "text_quality_scores",
    "tpcds_frequent_buyer_segments",
    "tpcds_net_after_returns",
    "tpch_q10_returned_items",
    "tpch_q13_customer_distribution",
    "tpch_q14_promotion_effect",
    "tpch_q15_top_supplier",
    "tpch_q16_parts_supplier",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_type_profit",
    # -- fill: 17 of the 41 r11-latest rows, most hand-written
    # surface first --
    "ddl_lifecycle",
    "merge_upsert",
    "merge_not_matched_by_source",
    "merge_schema_evolution",
    "dedup_minhash_lsh",
    "dedup_incremental_minhash",
    "dedup_semantic_clusters",
    "sketch_hll_union_rollup",
    "tokenizer_bpe_pair_counts",
    "text_pii_redaction",
    "text_unigram_logprob",
    "text_chunk_sliding",
    "text_repetition_scores",
    "corpus_contamination_check",
    "corpus_mixture_weights",
    "corpus_shard_manifest",
    "corpus_shuffle_shards",
    # ---- 50 cap lands exactly here ----
    # -- below-cap: the 5 staged r16 TPC-DS debuts (never
    # driver-checked; all oracle-green in the in-suite parity sweep;
    # lead r16's tier (a)) --
    "tpcds_customer_activity_profile",      # Q10/Q35/Q69 semi+anti
    "tpcds_monthly_return_pivot",           # Q66 month pivot
    "tpcds_two_existential_shipping",       # Q94/Q95 on the Q21 spine
    "tpcds_cross_channel_netted_ratio",     # Q78 on the Q75 spine
    "tpcds_customer_channel_setops",        # Q38/Q87 set-op collapse
    # -- below-cap: staged r16 pipeline debuts --
    "dedup_substring_cut",                  # span-cutting stage
    "corpus_ngram_novelty",                 # mixing novelty profile
    # -- below-cap: the 24 deferred r11 rows (lead r16's tier (b)) --
    "corpus_split_train_val_test",
    "pipeline_pack_sequences",
    "sample_stratified_by_lang",
    "attribution_last_touch",
    "basket_part_affinity",
    "customer_rfm_segments",
    "distinct_users_approx",
    "doc_length_histogram",
    "events_anomaly_zscore",
    "events_gapfill_locf",
    "events_resample_ohlc",
    "grouping_sets_revenue",
    "regexp_functions_suite",
    "retention_cohort_weekly",
    "sample_importance_weighted",
    "top_tokens",
    "tpcds_multi_band_counts",
    "tpcds_rank_within_parent",
    "tpcds_star_join_multi_dim",
    "tpch_q11_important_stock",
    "tpch_q12_priority_shipping",
    "tpch_q18_large_volume_customer",
    "tpch_q20_potential_promotion",
    "tpch_q2_min_cost_supplier",
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
