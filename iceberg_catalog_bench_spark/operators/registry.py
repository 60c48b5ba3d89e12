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


# Round-4 rotation. The r1+r2+r3 union is 130/130 green, so the
# objective is FRESHNESS (VERDICT r3 item 1): first the
# equality-delete/MoR family whose last green rows (r2) predate round
# 3's field-id tombstone surgery on catalog/table.py; then every query
# whose code changes THIS round (ADVICE fixes + hot-key hardening);
# then the round-4 additions; then the 42 queries whose only green row
# is round 1, least-trivial first so a 50-query cap drops only
# checksum/limit-grade queries to round 5.
# REFRESH EACH ROUND: rebuild from the union of CORRECTNESS_r*.json —
# never-green and code-touched queries first, oldest-green next.
PRIORITY: tuple[str, ...] = (
    # -- equality-delete / MoR family (r3 VERDICT item 1) --
    "cdc_equality_upsert",
    "mor_delete_update_read",
    "partitions_metadata",
    "streaming_cdc_upsert_laketable",
    "cdc_changelog",
    # -- code changed in round 4 (ADVICE fixes + hot-key hardening) --
    "knn_pq_adc",
    "streaming_ohlc_rollup",
    "mv_incremental_maintenance",
    "events_funnel_conversion",
    "events_transition_matrix",
    "dedup_ngram_jaccard",  # r4: pair core factored into _capped_pair_overlaps
    "rest_catalog_conformance",  # r4: +11-call privilege revoke/restore cycle
    "iceberg_metadata_roundtrip",  # r4: export gained spec-history manifests
    # -- new in round 4 --
    "mv_join_incremental_maintenance",
    "tpcds_returned_ratio_by_date",
    "tpcds_rollup_rolling_sales",
    "partition_evolution_read",
    "join_bucketed_colocated",
    "ann_ivf_incremental",
    "text_near_containment",
    "tpch_q21_sole_fault_supplier",
    "streaming_multibatch_windowed",
    "window_time_range_agg",
    "analyze_table_stats",
    "dq_expectation_suite",
    "knn_metadata_filtered",
    "multimodal_phash_dedup",
    "streaming_quarantine_gate",
    "migrate_parquet_inplace",
    "stats_gini_grouped_udaf",
    # -- r1-only-green backlog (stale two rounds), riskiest first --
    "pivot_event_types",
    "unpivot_part_metrics",
    "json_extraction",
    "window_topn_per_group",
    "window_moving_average",
    "window_running_sum",
    "window_lag_delta",
    "join_skew_salted",
    "join_multiway_region_revenue",
    "join_fact_fact",
    "join_broadcast_dim",
    "full_outer_join_sets",
    "left_outer_join_orders",
    "semi_anti_join",
    "set_ops_customers",
    "correlated_exists_subquery",
    "scalar_subquery_above_avg",
    "cube_aggregation",
    "rollup_aggregation",
    "conditional_aggregation",
    "percentile_by_group",
    "stats_aggregates",
    "array_functions_suite",
    "string_functions_suite",
    "date_functions_suite",
    "pricing_summary",
    "shipping_priority_top10",
    "range_pruned_agg",
    "latest_event_top1",
    "having_filter",
    "distinct_pairs",
    "distinct_users_exact",
    "ordered_read",
    "inlist_lookup",
    "reagg_total",
    "groupby_count",
    "full_scan_projection",
    "sum_checksum",
    "revenue_checksum",
    "point_lookup",
    "limit_preview",
    "count_star",
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
    from ..sources import datagen  # noqa: F401
    from . import text  # noqa: F401
    from . import corpus  # noqa: F401
    from . import relational  # noqa: F401
    from . import relational_ext  # noqa: F401
    from . import tpcds  # noqa: F401
    from . import physical  # noqa: F401
    from . import quality  # noqa: F401

    ordered = [n for n in PRIORITY if n in QUERIES]
    ordered += [n for n in QUERIES if n not in PRIORITY]
    reordered = {n: QUERIES[n] for n in ordered}
    QUERIES.clear()
    QUERIES.update(reordered)
