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


# Round-8 rotation (VERDICT r7 items 1-2: zero debut slots — the cap
# fits exactly). Tier (a) = the 7 standing-green queries over
# late-round-7-modified layers: ddl_lifecycle (DESCRIBE EXTENDED /
# SHOW TBLPROPERTIES in sql_frontend.py — oracle WIDENED this round
# per VERDICT item 3), cdc_equality_upsert (delete_by_keys default
# fix), mor_delete_update_read (compact_delete_files sibling paths),
# rest_catalog_conformance (REST commit protocol),
# branch_wap_publish (ref exists-semantics/REPLACE),
# maintenance_compaction (sort strategy, where-scoping),
# crud_update_delete (branch-DML routing). Tier (b) = the 43
# r4-latest queries (recomputed from the CORRECTNESS_r01-r07 union
# this round; identical to the pre-staged list). 7 + 43 = 50: after
# this round nothing is latest-green older than round 5.
# Below the cap: the r5-latest cohort in full (45 queries — the
# round-9 rotation tier), then r6/r7, then this round's below-cap
# debuts (feature-gated per VERDICT item 2, debuting green in r9).
# REFRESH EACH ROUND: rebuild from the union of CORRECTNESS_r*.json —
# never-green and code-touched queries first, oldest-green next.
# ROUND-9 ROTATION PLAN (pre-staged; recompute from CORRECTNESS_r08):
# tier (a) = the two r8 debuts, never driver-green yet
# (iceberg_register_adopted, tpcds_cumulative_channel_crossover) plus
# ~1 row over an r8-touched layer if any needs re-proof (the r8
# changes are additive/feature-gated: adopt/sync/register_table are
# new surface; the expire_snapshots external-file fix only changes
# behavior for absolute-path files no standing row commits); tier
# (b) = the FULL 45-query r5-latest cohort (list = the below-cap
# block right after the 50 marker; 4-rounds-stale if skipped).
# 2 + 45 = 47, leaving ~3 slots — fill from the oldest r6-latest
# queries (cdc_replicate_table, datagen_tx_events_dims,
# schema_evolution_read lead that cohort alphabetically-agnostic;
# pick by risk). Round 10 then owes the r6 cohort (38) + r7 tail.
PRIORITY: tuple[str, ...] = (
    # -- (a) round-7 code-touched, standing-green (7) --
    "ddl_lifecycle",                # DESCRIBE EXTENDED/FORMATTED, SHOW
    #                                 TBLPROPERTIES single-key; oracle
    #                                 widened r8 (VERDICT item 3)
    "cdc_equality_upsert",          # delete_by_keys silent-widen fix
    "mor_delete_update_read",       # compact_delete_files siblings
    "rest_catalog_conformance",     # REST commit protocol (CAS + txn)
    "branch_wap_publish",           # ref exists-semantics / REPLACE
    "maintenance_compaction",       # linear-sort strategy, where=> scope
    "crud_update_delete",           # branch-qualified DML routing
    # -- (b) the 43 r4-latest queries (freshness bar: 4 rounds) --
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
    # ---- 50 cap lands exactly here ----
    # -- below-cap: the r5-latest cohort (the round-9 rotation tier;
    # greens early only if the driver runs deeper than 50) --
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
