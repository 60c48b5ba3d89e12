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


# Round-12 rotation (VERDICT r11 item 2, recomputed from the
# CORRECTNESS_r01-r11 union: staleness histogram r8:45, r9:49,
# r10:44, r11:50; never-green = the 8 staged r12 debuts). Tier (a) =
# those 8 debuts + this round's new debut (iceberg_nested_roundtrip,
# the VERDICT item-1 "done" criterion) + 5 code-touched rows: the
# _lake_file percent-decode change rewired path matching on EVERY
# row-level op's green path (CoW probe, MoR tombstone write/read,
# equality deletes — crud_update_delete / mor_delete_update_read /
# cdc_equality_upsert re-verify it), and the export schema emission
# now routes all columns through the nested-capable type writer while
# adoption gained the statistics parse (iceberg_metadata_roundtrip /
# iceberg_register_adopted re-verify those). Code-touched rows whose
# EXECUTED delta is trivial were triaged below-cap with the reason:
# streamed_calendar_fanout_pruning (one additive startswith branch in
# _arrow_type; the 46 table_source pytest rows green), adopted_bucket_
# pruning + iceberg_validate_preflight (no-op loops over absent
# statistics/nested metadata; covered by the two kept iceberg rows +
# the nested debut). Tier (b) = the 35 riskiest of the 45 r8-latest
# rows (VERDICT's leads first; it was 36 until the REST register
# change made rest_catalog_conformance code-touched mid-round).
# 15 + 35 = 50 exactly; the 10 unserved
# r8 rows are all pure relational shapes over UNTOUCHED code
# (window/rollup/pivot/set-ops) and lead r13's list below the cap
# marker — the freshness bar yields to code-touched-first this round
# because re-verifying changed DML paths beats re-greening static
# window shapes.
# REFRESH EACH ROUND: rebuild from the union of CORRECTNESS_r*.json —
# never-green and code-touched queries first, oldest-green next.
PRIORITY: tuple[str, ...] = (
    # -- (a) never driver-checked debuts (8 staged + 1 new) --
    "iceberg_nested_roundtrip",            # r12 headline: list/struct/map
    "tpcds_returns_above_avg_customers",
    "tpcds_weekly_yoy_ratio",
    "tpcds_monthly_deviation_neighbors",   # Q47/Q57: windows over cells
    "tpcds_yoy_growth_channel_compare",    # Q4/Q11: 4 CTEs -> one scan
    "maintenance_hilbert_cluster",         # hilbert(a,b) sort strategy
    "tpcds_revenue_band_histogram",        # Q54: aggregate of aggregate
    "tpcds_return_repurchase_chain",       # Q17/Q29: disjoint-slice chain
    "dedup_semantic_incremental",          # SemDeDup continuous-ingest twin
    # -- (a) r12 code-touched (the _lake_file decode + export/adopt) --
    "crud_update_delete",            # CoW probe + MoR delete planning
    "mor_delete_update_read",        # MoR read + position_deletes table
    "cdc_equality_upsert",           # equality deletes through decode
    "iceberg_metadata_roundtrip",    # export types + MoR walker decode
    "iceberg_register_adopted",      # adoption + statistics parse
    "rest_catalog_conformance",      # RegisterTable now serves the
                                     # chain's own schema JSON (r12)
    # -- (b) the 35 riskiest r8-latest rows (VERDICT leads first) --
    "analyze_table_stats",
    "branch_wap_publish",
    "cdc_changelog",
    "mv_incremental_maintenance",
    "maintenance_compaction",
    "partitions_metadata",
    "events_funnel_conversion",
    "correlated_exists_subquery",
    "dedup_ngram_jaccard",
    "dq_expectation_suite",
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
    "migrate_parquet_inplace",
    "mv_join_incremental_maintenance",
    "partition_evolution_read",
    "scalar_subquery_above_avg",
    "semi_anti_join",
    "stats_gini_grouped_udaf",
    "streaming_cdc_upsert_laketable",
    "streaming_multibatch_windowed",
    "streaming_ohlc_rollup",
    "text_near_containment",
    "tpcds_returned_ratio_by_date",
    "tpcds_rollup_rolling_sales",
    "tpch_q21_sole_fault_supplier",
    "window_time_range_agg",
    # ---- 50 cap lands exactly here ----
    # -- below-cap: the 10 unserved r8 rows (untouched pure-relational
    # shapes; window_topn_per_group yielded its slot when the REST
    # register change made rest_catalog_conformance code-touched) —
    # these lead r13's tier (b) --
    "window_topn_per_group",
    "conditional_aggregation",
    "cube_aggregation",
    "pivot_event_types",
    "rollup_aggregation",
    "set_ops_customers",
    "unpivot_part_metrics",
    "window_lag_delta",
    "window_moving_average",
    "window_running_sum",
    # -- below-cap: staged r13 debuts (registered r12, cap full) --
    "tpcds_cross_channel_items",           # Q14: INTERSECT -> one pass
    "tpcds_buy_return_rebuy_margin",       # Q64 on the Q17/Q29 spine
    "iceberg_puffin_stats_roundtrip",      # ANALYZE -> Puffin -> adopt
    "tpcds_qoq_growth_nation_channels",    # Q31: 6 cells -> 2 scans
    "tpcds_frequent_items_best_customers",  # Q23: double semi-reduce
    "knn_over_adopted_store",              # ANN over an adopted chain
    # (Q31/Q23 stay OUT of the tpcds_report_run composite this round —
    # the 16->18 widening was already re-recorded; fold them into the
    # next adjudicated widening rather than re-basing twice)
    # -- below-cap: triaged code-touched (trivial executed delta;
    # pytest-covered) — green early only if the driver runs deep --
    "streamed_calendar_fanout_pruning",
    "adopted_bucket_pruning",
    "iceberg_validate_preflight",
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
