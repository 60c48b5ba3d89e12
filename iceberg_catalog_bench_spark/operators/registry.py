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


# Round-14 rotation (VERDICT r13 item 3, recomputed from the
# CORRECTNESS_r01-r13 union: staleness histogram r9:21, r10:44,
# r11:41, r12:50, r13:49; red: tpcds_brand_decline_yoy (the Q75
# oracle HUGEINT dtype leak, fixed this round); never-green: the 2
# staged r13 debuts).
# Tier (a) = the 2 staged debuts + the re-greened Q75 + the 5
# r13-green rows whose code r14 touched (table_source.py map netting
# refactors _read_cow_net/_expand/_stats_may_match — the pipe, cdc,
# ingest, calendar-fanout and bucket-pruning rows execute those
# paths) = 8.
# + the brand-new netting row (never-green-first, served the round
# it ships) = 9.
# Tier (b) = ALL 21 r9-latest rows (five rounds stale if skipped; the
# VERDICT says no deferral) = 30 cumulative.
# Fill = 20 of the 44 r10-latest rows, code-touched first
# (streaming_table_source_cdc_cow / _read / incremental_read_changes
# run the refactored netting+changelog code), then the catalog/
# streaming/multimodal rows with the most hand-written surface.
# 9 + 21 + 20 = 50 exactly. The 24 deferred r10 rows lead r15's
# tier (b); none is older than r10 and the bench-gated pair among
# them (percentile_approx_by_group, pipeline_curate_full) re-executes
# every round inside BENCH anyway.
# REFRESH EACH ROUND: rebuild from the union of CORRECTNESS_r*.json —
# never-green and code-touched queries first, oldest-green next.
PRIORITY: tuple[str, ...] = (
    # -- (a) staged r13 debuts (never driver-checked) --
    "tpcds_worst_return_ratios_dual_rank",  # Q49: dual rank, one pass
    "tpcds_cov_consecutive_months",         # Q39: integer-exact cov
    # -- (a) the r13 red row, oracle fixed this round --
    "tpcds_brand_decline_yoy",              # Q75: CAST AS BIGINT fix
    # -- (a) r14 code-touched (table_source map-netting refactor) --
    "streaming_struct_map_pipe",
    "streaming_table_source_cdc",
    "streaming_ingest_laketable",
    "streamed_calendar_fanout_pruning",
    "adopted_bucket_pruning",
    # -- (a) r14 debut: the new netting capability, driver-checked
    # the round it ships (never-green-first) --
    "streaming_cdc_nested_netting",
    # -- (b) ALL 21 r9-latest rows (no deferral) --
    "count_star",
    "dedup_exact",
    "distinct_pairs",
    "distinct_users_exact",
    "full_scan_projection",
    "groupby_count",
    "having_filter",
    "inlist_lookup",
    "knn_brute_force",
    "latest_event_top1",
    "limit_preview",
    "ordered_read",
    "percentile_by_group",
    "point_lookup",
    "pricing_summary",
    "range_pruned_agg",
    "reagg_total",
    "revenue_checksum",
    "shipping_priority_top10",
    "sum_checksum",
    "tpcds_channel_union",
    # -- fill: 20 oldest (r10) rows, code-touched first --
    "streaming_table_source_cdc_cow",       # runs the new netting code
    "streaming_table_source_read",
    "incremental_read_changes",
    "harness_crud_plan",
    "snapshot_lineage",
    "time_travel_checksum",
    "tag_and_rollback",
    "insert_overwrite_backfill",
    "streaming_dedup_count",
    "streaming_enrich_join",
    "streaming_stream_stream_join",
    "streaming_windowed_agg",
    "sessionize_batch",
    "multimodal_audio_features",
    "multimodal_frame_sample",
    "multimodal_image_meta",
    "text_lang_id",
    "text_fingerprint",
    "text_token_count",
    "dedup_connected_components",
    # ---- 50 cap lands exactly here ----
    # (join_range_error_context yields its fill slot to the r14 debut
    # above; it stays r10-latest and leads r15's fill with the other
    # deferred r10 rows)
    "join_range_error_context",
    # -- below-cap: the 23 deferred r10 rows (lead r15's tier (b)) --
    "centroid_by_label",
    "embedding_quantize_int8",
    "hybrid_search_bm25_rrf",
    "hybrid_search_rrf",
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
    # -- below-cap: staged r15 debuts (registered r14, cap full) --
    "tpcds_ticket_size_repeat_buyers",      # Q34/Q73: ticket buckets
    "tpcds_customer_value_yoy_lag",         # Q11 on the LAG spine
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
