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


# Round-9 rotation (VERDICT r8 item 2, recomputed from the
# CORRECTNESS_r01-r08 union: staleness histogram r5:40, r6:36, r7:50,
# r8:50 — NOT the pre-staged comment's "45 r5-latest"). Tier (a) = the
# 3 below-cap debuts, never driver-checked (iceberg_register_adopted —
# which this round ALSO re-proves over the new Avro-manifest adoption
# path — and the two TPC-DS shapes). Tier (b) = the FULL 40-query
# r5-latest cohort (4-rounds-stale if skipped). The remaining 7 slots
# take the riskiest r6-latest rows: schema_evolution_read (adoption
# reads schema history; this round touched it), cdc_replicate_table,
# datagen_tx_events_dims, maintenance_zorder, streaming_table_source_cdc
# (adopted tables became streaming sources in r8), join_asof_last_purchase,
# streaming_sessionize_stateful. 3 + 40 + 7 = 50 exactly; after this
# round nothing is latest-green older than r6.
# ROUND-10 ROTATION PLAN: tier (a) = any r9-code-touched rows + any r9
# non-greens; tier (b) = the remaining 29 r6-latest queries (listed
# right below the cap marker) + the oldest r7 rows to fill 50.
# REFRESH EACH ROUND: rebuild from the union of CORRECTNESS_r*.json —
# never-green and code-touched queries first, oldest-green next.
PRIORITY: tuple[str, ...] = (
    # -- (a) below-cap debuts, never driver-checked (3) --
    "iceberg_register_adopted",     # foreign-Iceberg adopt (r8) + the
    #                                 r9 Avro-manifest read path
    "tpcds_cumulative_channel_crossover",   # Q51 shape (r8)
    "tpcds_topn_over_rollup",               # Q67 shape (r8)
    # -- (b) the full r5-latest cohort (40; freshness bar: 4 rounds) --
    "ann_ivf",
    "ann_ivf_incremental",
    "ann_ivf_partitioned",
    "ann_lsh_buckets",
    "array_functions_suite",
    "count_star",
    "date_functions_suite",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_simhash",
    "delete_files_advisory",
    "distinct_pairs",
    "distinct_users_exact",
    "full_scan_projection",
    "groupby_count",
    "having_filter",
    "inlist_lookup",
    "knn_batch_queries",
    "knn_brute_force",
    "latest_event_top1",
    "limit_preview",
    "multimodal_phash_dedup",
    "ordered_read",
    "percentile_by_group",
    "point_lookup",
    "pricing_summary",
    "quality_gopher_rules",
    "range_pruned_agg",
    "reagg_total",
    "revenue_checksum",
    "shipping_priority_top10",
    "stats_aggregates",
    "streaming_ingest_laketable",
    "streaming_quarantine_gate",
    "string_functions_suite",
    "sum_checksum",
    "tpcds_channel_union",
    "tpch_q17_small_qty_revenue",
    "tpch_q19_discounted_revenue",
    "tpch_q22_global_sales_opportunity",
    # -- (c) riskiest r6-latest rows (7) --
    "schema_evolution_read",
    "cdc_replicate_table",
    "datagen_tx_events_dims",
    "maintenance_zorder",
    "streaming_table_source_cdc",
    "join_asof_last_purchase",
    "streaming_sessionize_stateful",
    # ---- 50 cap lands exactly here ----
    # -- below-cap: the remaining r6-latest cohort (29; the
    # round-10 rotation tier), greens early only if the driver
    # runs deeper than 50 --
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
