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


# Round-6 rotation (VERDICT r5 item 1: execute the planned rotation —
# after this round no query's latest green may be older than round 3).
# Build order: (a) queries whose CODE changed this round (the round-6
# table_source.py hardening: expired-offset semantics, CoW-changelog
# netting, NaN-safe float pushdown, pos-delete path matching) plus the
# cdc_cow debut and the 11 TPC-H-completion debuts (never-green, so
# they must make the cap); (b) the 22 r2-latest queries (dedup/
# streaming/multimodal/text tails — three rounds stale by now);
# (c) the r3 cohort, §2 DDL/harness/time-travel correctness core and
# TPC-H shapes first — 13 of the 40 fit a 50-run; the rest stay
# r3-latest (inside the freshness bar: nothing older than r3 after
# this round) and LEAD ROUND 7 together with whatever round 7
# touches. If the driver runs more than 50, the (c) tail below the
# cap greens too — the whole r3 cohort is enumerated in order.
# REFRESH EACH ROUND: rebuild from the union of CORRECTNESS_r*.json —
# never-green and code-touched queries first, oldest-green next.
PRIORITY: tuple[str, ...] = (
    # -- (a) round-6 code-touched + debuts --
    "streaming_table_source_cdc_cow",   # NEW r6: CoW commits netted into CDC
    "cdc_replicate_table",              # NEW r6: feed applied to a replica
    "streaming_table_source_read",      # r6: expired-offset + restart contract
    "streaming_table_source_cdc",       # r6: pos-delete path matching
    "iceberg_metadata_roundtrip",       # r6: + DuckDB second-engine leg, MoR
    "tpch_q2_min_cost_supplier",        # NEW r6: TPC-H completion (11 shapes)
    "tpch_q4_order_priority",
    "tpch_q7_volume_shipping",
    "tpch_q9_product_type_profit",
    "tpch_q11_important_stock",
    "tpch_q12_priority_shipping",
    "tpch_q13_customer_distribution",
    "tpch_q14_promotion_effect",
    "tpch_q15_top_supplier",
    "tpch_q16_parts_supplier",
    "tpch_q20_potential_promotion",
    # -- (b) the 22 r2-latest (three rounds stale) --
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
    # -- (c) r3 cohort, correctness-core first (fills the 50 cap) --
    "ddl_lifecycle",
    "harness_crud_plan",
    "time_travel_checksum",
    "schema_evolution_read",
    "snapshot_lineage",
    "tag_and_rollback",
    "incremental_read_changes",
    "maintenance_compaction",           # also r6 code-touched: orphan grace
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q8_market_share",
    "tpch_q10_returned_items",
    "tpch_q18_large_volume_customer",
    "grouping_sets_revenue",
    "pipeline_curate_full",
    "pipeline_pack_sequences",
    "corpus_contamination_check",
    "corpus_split_train_val_test",
    "corpus_shard_manifest",
    "sketch_hll_union_rollup",
    "percentile_approx_by_group",
    "distinct_users_approx",
    "events_resample_ohlc",
    "regexp_functions_suite",
    "text_pii_redaction",
    # ---- 50-query cap lands here; the (c) tail below greens only if
    # the driver runs deeper, else it stays r3-latest and leads r7 ----
    "attribution_last_touch",
    "basket_part_affinity",
    "corpus_mixture_weights",
    "corpus_shuffle_shards",
    "customer_rfm_segments",
    "doc_length_histogram",
    "events_anomaly_zscore",
    "events_gapfill_locf",
    "retention_cohort_weekly",
    "sample_importance_weighted",
    "sample_stratified_by_lang",
    "text_repetition_scores",
    "text_unigram_logprob",
    "tokenizer_bpe_pair_counts",
    "top_tokens",
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
