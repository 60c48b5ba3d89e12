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


# Round-5 rotation (VERDICT r4 item 1: close the freshness backlog).
# Build order: (a) queries whose CODE changed this round (streaming
# replay-idempotency, auto-compact hooks on the delete paths, counted
# k_returned, quarantine domain rule, byte-based phash oracle,
# global partition field-ids, per-catalog REST privileges, the
# cherrypick leg in branch_wap_publish) plus the seven round-5 debuts;
# (b) the 22 queries whose ONLY green is round 1
# (the reference's §2.3 correctness core — three rounds stale); (c) as
# many of the 32 r2-latest (dedup/ANN/streaming families) as the
# 50-query cap admits — the remainder stays r2-latest (within the
# freshness bar) and leads round 6.
# REFRESH EACH ROUND: rebuild from the union of CORRECTNESS_r*.json —
# never-green and code-touched queries first, oldest-green next.
PRIORITY: tuple[str, ...] = (
    # -- (a) round-5 code-touched + debuts --
    "delete_files_advisory",            # NEW r5: advisory + auto-compact
    "tpcds_channel_union",              # NEW r5: multi-channel UNION template
    "tpch_q17_small_qty_revenue",       # NEW r5: correlated-avg decorrelation
    "tpch_q22_global_sales_opportunity",  # NEW r5: scalar sub + anti-join
    "quality_gopher_rules",             # NEW r5: one-pass corpus quality gate
    "branch_wap_publish",               # r5: + cherrypick_snapshot publish leg
    "streaming_table_source_read",      # NEW r5: laketable streaming source
    "streaming_table_source_cdc",       # NEW r5: CDC feed (mode=cdc)
    "tpch_q19_discounted_revenue",      # NEW r5: disjunctive pushdown
    "streaming_ingest_laketable",       # r5: replay-idempotent streaming_append
    "streaming_quarantine_gate",        # r5: domain + null rules added
    "multimodal_phash_dedup",           # r5: byte-based oracle
    "iceberg_metadata_roundtrip",       # r5: table-wide partition field-ids
    "rest_catalog_conformance",         # r5: per-catalog privilege resolution
    "ann_ivf",                          # r5: counted k_returned
    "ann_ivf_partitioned",              # r5: counted k_returned
    "ann_ivf_incremental",              # r5: counted k_returned
    "cdc_equality_upsert",              # r5: auto-compact hook on delete_by_keys
    "mor_delete_update_read",           # r5: auto-compact hook on MoR paths
    "crud_update_delete",               # r5: auto-compact hook on delete/update
    "merge_upsert",                     # r5: auto-compact hook on MoR merge
    # -- (b) the 22 r1-only-green backlog (stale three rounds) --
    "pricing_summary",
    "shipping_priority_top10",
    "range_pruned_agg",
    "latest_event_top1",
    "percentile_by_group",
    "distinct_users_exact",
    "distinct_pairs",
    "having_filter",
    "stats_aggregates",
    "array_functions_suite",
    "string_functions_suite",
    "date_functions_suite",
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
    # -- (c) r2-latest cohort, code-drift-riskiest first (fills the cap) --
    "knn_brute_force",
    "knn_batch_queries",
    "ann_lsh_buckets",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    # ---- 50-query cap lands here; the rest leads round 6 ----
    "dedup_connected_components",
    "embedding_quantize_int8",
    "streaming_enrich_join",
    "streaming_windowed_agg",
    "streaming_dedup_count",
    "streaming_sessionize_stateful",
    "streaming_stream_stream_join",
    "multimodal_image_meta",
    "multimodal_frame_sample",
    "multimodal_audio_features",
    "text_quality_scores",
    "text_quality_pandas_udf",
    "text_token_count",
    "text_lang_id",
    "text_fingerprint",
    "centroid_by_label",
    "join_asof_last_purchase",
    "join_range_error_context",
    "sessionize_batch",
    "maintenance_zorder",
    "pipeline_training_data",
    "datagen_tx_events_dims",
)
# ROUND-6 ROTATION PLAN (rebuild PRIORITY from CORRECTNESS_r05 + the
# r1-r5 union): (a) queries whose CODE changed in round 6, plus
# streaming_table_source_read/cdc if table_source.py changes again
# (round 5's late additions — rate limiting, branch/starting-position
# reads, the streaming sink, batch writer, filter pushdown — all live
# there); (b) the ~25 (c)-cohort queries above that missed round 5's
# 50-cap (still r2-latest; oldest first); (c) the round-3 cohort
# (merge_upsert, time_travel_checksum, schema_evolution_read, the
# window/join/setop/corpus suites) — r3-latest after this round, two
# rounds stale by round 6's end if not rotated.


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
    from . import physical  # noqa: F401
    from . import quality  # noqa: F401

    ordered = [n for n in PRIORITY if n in QUERIES]
    ordered += [n for n in QUERIES if n not in PRIORITY]
    reordered = {n: QUERIES[n] for n in ordered}
    QUERIES.clear()
    QUERIES.update(reordered)
