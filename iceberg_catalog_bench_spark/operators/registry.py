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


# Round-13 rotation (VERDICT r12 item 2, recomputed from the
# CORRECTNESS_r01-r12 union: staleness histogram r8:10, r9:49,
# r10:44, r11:44, r12:50; never-green = the 6 staged r12 debuts).
# Tier (a) = 3 NEW r13 debuts (streaming_struct_map_pipe — the
# VERDICT item-3 "done" criterion; the two item-5 TPC-DS widenings)
# + the 6 staged debuts + the 3 rows triaged below-cap in r12
# (streamed_calendar_fanout_pruning / adopted_bucket_pruning /
# iceberg_validate_preflight — the judge asked for them by name).
# Tier (b) = ALL 10 four-round-stale r8 rows (deferred once in r12;
# VERDICT: "no second deferral") + the 28 riskiest r9 rows:
# 12 + 10 + 28 = 50 exactly. The 21 unserved r9 rows (below the cap
# marker, leading r14's tier (b)) are all either single-operator
# relational scans over code untouched since r9 (count_star,
# limit_preview, ordered_read, point_lookup, full_scan_projection,
# groupby_count, having_filter, sum/revenue checksums, reagg_total,
# distinct_pairs/users, latest_event_top1) or re-executed EVERY round
# by the standing bench gate — pricing_summary, range_pruned_agg,
# inlist_lookup, shipping_priority_top10, dedup_exact,
# knn_brute_force, percentile_by_group (approx twin) are HEADLINE
# phases and tpcds_channel_union runs inside tpcds_report_run, so a
# breakage there moves BENCH_r13 even without a driver row.
# r13 code-touch triage: the struct/map streaming work
# (table_source.py) is strictly additive — new Arrow-type branches;
# primitive-path rows execute identical code — so the three r12-green
# laketable rows keep their r12 slots; the FOUR r9-stale
# streaming/table-source rows kept in tier (b) re-verify the shared
# source/sink spine anyway, and the new streaming_struct_map_pipe
# debut executes the new branches directly.
# REFRESH EACH ROUND: rebuild from the union of CORRECTNESS_r*.json —
# never-green and code-touched queries first, oldest-green next.
PRIORITY: tuple[str, ...] = (
    # -- (a) new r13 debuts --
    "streaming_struct_map_pipe",           # struct/map through the pipe
    "tpcds_item_day_channel_crossover",    # Q51 at item-day grain
    "tpcds_brand_decline_yoy",             # Q75: YoY decline, returns netted
    # -- (a) the 6 staged r12 debuts (never driver-checked) --
    "tpcds_cross_channel_items",           # Q14: INTERSECT -> one pass
    "tpcds_buy_return_rebuy_margin",       # Q64 on the Q17/Q29 spine
    "iceberg_puffin_stats_roundtrip",      # ANALYZE -> Puffin -> adopt
    "tpcds_qoq_growth_nation_channels",    # Q31: 6 cells -> 2 scans
    "tpcds_frequent_items_best_customers",  # Q23: double semi-reduce
    "knn_over_adopted_store",              # ANN over an adopted chain
    # -- (a) r12's triaged code-touched rows (judge-named) --
    "streamed_calendar_fanout_pruning",
    "adopted_bucket_pruning",
    "iceberg_validate_preflight",
    # -- (b) ALL 10 r8-latest rows (four rounds stale; no deferral) --
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
    # -- (b) the 28 riskiest r9-latest rows --
    "streaming_ingest_laketable",
    "streaming_table_source_cdc",
    "streaming_quarantine_gate",
    "streaming_sessionize_stateful",
    "ann_ivf",
    "ann_ivf_incremental",
    "ann_ivf_partitioned",
    "ann_lsh_buckets",
    "dedup_embedding_cosine",
    "dedup_simhash",
    "knn_batch_queries",
    "multimodal_phash_dedup",
    "join_asof_last_purchase",
    "cdc_replicate_table",
    "schema_evolution_read",
    "maintenance_zorder",
    "delete_files_advisory",
    "datagen_tx_events_dims",
    "array_functions_suite",
    "date_functions_suite",
    "string_functions_suite",
    "stats_aggregates",
    "quality_gopher_rules",
    "tpcds_cumulative_channel_crossover",
    "tpcds_topn_over_rollup",
    "tpch_q17_small_qty_revenue",
    "tpch_q19_discounted_revenue",
    "tpch_q22_global_sales_opportunity",
    # ---- 50 cap lands exactly here ----
    # -- below-cap: the 21 deferred r9 rows (reasons above) — these
    # lead r14's tier (b) --
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
    # -- below-cap: staged r14 debuts (registered r13, cap full) --
    "tpcds_worst_return_ratios_dual_rank",  # Q49: dual rank, one pass
    "tpcds_cov_consecutive_months",         # Q39: integer-exact cov
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
