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


# Queries lacking a green driver row after rounds 1-2, ordered by
# round-2 VERDICT demand first: the 15 never driver-run + 2 stale
# ``no_oracle`` re-runs (cheap, the judge's explicit item 1) lead, so
# even a time-capped driver pass closes them; round-3 additions follow
# cheapest-first with the heavy index/MV builders last. The driver
# executes queries in dict order and may stop at a 50-query cap.
# REFRESH EACH ROUND: rebuild this tuple from the union of
# CORRECTNESS_r*.json — never-green and newly-added queries first,
# everything already green after.
PRIORITY: tuple[str, ...] = (
    # -- round-2 tail (VERDICT r2 item 1) --
    "pipeline_curate_full",
    "pipeline_pack_sequences",
    "text_unigram_logprob",
    "corpus_contamination_check",
    "corpus_mixture_weights",
    "sample_stratified_by_lang",
    "corpus_shard_manifest",
    "corpus_split_train_val_test",
    "corpus_shuffle_shards",
    "text_pii_redaction",
    "doc_length_histogram",
    "top_tokens",
    "text_repetition_scores",
    "percentile_approx_by_group",
    "distinct_users_approx",
    "grouping_sets_revenue",
    "regexp_functions_suite",
    # -- round-3 additions, cheap first --
    "tokenizer_bpe_pair_counts",
    "sample_importance_weighted",
    "events_funnel_conversion",
    "retention_cohort_weekly",
    "events_resample_ohlc",
    "events_anomaly_zscore",
    "events_gapfill_locf",
    "tpch_q8_market_share",
    "attribution_last_touch",
    "tpch_q6_forecast_revenue",
    "tpch_q18_large_volume_customer",
    "streaming_ohlc_rollup",
    "events_transition_matrix",
    "customer_rfm_segments",
    "sketch_hll_union_rollup",
    "tpch_q10_returned_items",
    "tpch_q5_local_supplier_volume",
    "basket_part_affinity",
    "ddl_lifecycle",
    "knn_pq_adc",
    "mv_incremental_maintenance",
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

    ordered = [n for n in PRIORITY if n in QUERIES]
    ordered += [n for n in QUERIES if n not in PRIORITY]
    reordered = {n: QUERIES[n] for n in ordered}
    QUERIES.clear()
    QUERIES.update(reordered)
