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


# Round-11 rotation (VERDICT r10 item 2, recomputed from the
# CORRECTNESS_r01-r10 union: staleness histogram r7:36, r8:50, r9:49,
# r10:50; never-green = the 3 debuts). Tier (a) = the 3 debuts (2
# staged since r10 + this round's streamed-calendar-fanout headline)
# + 6 code-touched rows: the export/adopt family (partition field-id
# keying and per-spec name dedup changed in iceberg_export) and the
# MERGE family (schema-evolution ordering + SET * parsing changed).
# Tier (b) = ALL 36 r7-latest rows (3-rounds-stale if skipped — the
# freshness bar). The remaining 5 slots take the riskiest r8 rows
# (M3/M4, the MoR read path, DDL, REST). 9 + 36 + 5 = 50 exactly;
# after this round nothing is latest-green older than r8.
# REFRESH EACH ROUND: rebuild from the union of CORRECTNESS_r*.json —
# never-green and code-touched queries first, oldest-green next.
PRIORITY: tuple[str, ...] = (
    # -- (a) never driver-checked debuts (3) + code-touched (6) --
    "streamed_calendar_fanout_pruning",  # r11 headline: days(ts) fanout
    "dedup_semantic_clusters",       # staged r11 (registered r10)
    "merge_schema_evolution",        # staged r11; evolution ordering fixed
    "adopted_bucket_pruning",        # export/adopt code touched (field-ids)
    "iceberg_register_adopted",      # export/adopt code touched
    "iceberg_metadata_roundtrip",    # re-proves the export field-id change
    "iceberg_validate_preflight",    # validate/repair over exported chains
    "merge_upsert",                  # merge code touched (evolution defer)
    "merge_not_matched_by_source",   # merge SET * parsing touched
    # -- (b) ALL 36 r7-latest rows (the freshness bar: 3 rounds) --
    "attribution_last_touch",
    "basket_part_affinity",
    "corpus_contamination_check",
    "corpus_mixture_weights",
    "corpus_shard_manifest",
    "corpus_shuffle_shards",
    "corpus_split_train_val_test",
    "customer_rfm_segments",
    "dedup_incremental_minhash",
    "dedup_minhash_lsh",
    "distinct_users_approx",
    "doc_length_histogram",
    "events_anomaly_zscore",
    "events_gapfill_locf",
    "events_resample_ohlc",
    "grouping_sets_revenue",
    "pipeline_pack_sequences",
    "regexp_functions_suite",
    "retention_cohort_weekly",
    "sample_importance_weighted",
    "sample_stratified_by_lang",
    "sketch_hll_union_rollup",
    "text_chunk_sliding",
    "text_pii_redaction",
    "text_repetition_scores",
    "text_unigram_logprob",
    "tokenizer_bpe_pair_counts",
    "top_tokens",
    "tpcds_multi_band_counts",
    "tpcds_rank_within_parent",
    "tpcds_star_join_multi_dim",
    "tpch_q2_min_cost_supplier",
    "tpch_q11_important_stock",
    "tpch_q12_priority_shipping",
    "tpch_q18_large_volume_customer",
    "tpch_q20_potential_promotion",
    # -- (c) riskiest r8-latest rows (5) --
    "crud_update_delete",            # M3/M4 CoW+MoR+branch
    "cdc_equality_upsert",           # equality-delete commit path
    "mor_delete_update_read",        # the MoR read path
    "ddl_lifecycle",                 # D2/D5/D9-D14 + frontend surface
    "rest_catalog_conformance",      # §2.8 server+client
    # ---- 50 cap lands exactly here ----
    # -- below-cap: r12 debuts (registered r11 with the cap already
    # exactly full) --
    "tpcds_returns_above_avg_customers",
    "tpcds_weekly_yoy_ratio",
    "tpcds_monthly_deviation_neighbors",   # Q47/Q57: windows over cells
    "tpcds_yoy_growth_channel_compare",    # Q4/Q11: 4 CTEs -> one scan
    "maintenance_hilbert_cluster",         # hilbert(a,b) sort strategy
    "tpcds_revenue_band_histogram",        # Q54: aggregate of aggregate
    "tpcds_return_repurchase_chain",       # Q17/Q29: disjoint-slice chain
    "dedup_semantic_incremental",          # SemDeDup continuous-ingest twin
    # -- below-cap: next-riskiest r8 rows, green early only if the
    # driver runs deeper than 50 --
    "maintenance_compaction",
    "partitions_metadata",
    "cdc_changelog",
    "mv_incremental_maintenance",
    "harness_crud_plan",
    "schema_evolution_read",
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
