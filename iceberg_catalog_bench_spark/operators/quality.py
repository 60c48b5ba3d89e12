"""Data-quality expectation checks — the gate a production pipeline
runs before publishing a batch (the Great-Expectations /
Deequ-shaped surface, Spark-first).

Design for 100 TB: all single-table expectations over a table
collapse into ONE map-combined aggregate pass (never a scan per
check); cross-table referential integrity is a broadcast anti-join
counting violations (0 rows expected → the join output is tiny by
construction). Each check returns (check_name, observed, passed) so
the pipeline can gate on `min(passed)` and report the measured value
when it fails.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register


@register(
    "dq_expectation_suite",
    oracle=(
        "WITH ev AS (SELECT * FROM events), "
        "ref AS (SELECT COUNT(*) AS viol FROM orders o "
        "LEFT JOIN customer c ON o.o_custkey = c.c_custkey "
        "WHERE c.c_custkey IS NULL) "
        "SELECT 'rows_nonzero' AS check_name, "
        "(SELECT COUNT(*) FROM ev) AS observed, "
        "(SELECT COUNT(*) FROM ev) > 0 AS passed "
        "UNION ALL SELECT 'event_id_unique', "
        "(SELECT COUNT(*) - COUNT(DISTINCT event_id) FROM ev), "
        "(SELECT COUNT(*) = COUNT(DISTINCT event_id) FROM ev) "
        "UNION ALL SELECT 'value_not_null', "
        "(SELECT COUNT(CASE WHEN value IS NULL THEN 1 END) FROM ev), "
        "(SELECT COUNT(CASE WHEN value IS NULL THEN 1 END) FROM ev) = 0 "
        "UNION ALL SELECT 'event_type_in_domain', "
        "(SELECT COUNT(CASE WHEN event_type NOT IN "
        "('click','view','purchase','signup','error') THEN 1 END) FROM ev), "
        "(SELECT COUNT(CASE WHEN event_type NOT IN "
        "('click','view','purchase','signup','error') THEN 1 END) FROM ev) = 0 "
        "UNION ALL SELECT 'ts_fresh_within_31d_of_epoch_start', "
        "(SELECT CAST(date_diff('day', TIMESTAMP '2024-01-01', MAX(ts)) AS BIGINT) FROM ev), "
        "(SELECT MAX(ts) >= TIMESTAMP '2024-01-25' FROM ev) "
        "UNION ALL SELECT 'orders_custkey_referential', "
        "(SELECT viol FROM ref), (SELECT viol = 0 FROM ref)"
    ),
)
def dq_expectation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six expectations over the star schema, (check_name, observed,
    passed) per row:

    - the five single-table checks on ``events`` (non-empty, key
      uniqueness, null ratio, categorical domain, freshness) compute
      in ONE aggregate pass — `observed` is each check's measured
      violation count / staleness, so a red row says *how* red;
    - referential integrity (`orders.o_custkey ⊆ customer.c_custkey`)
      is a broadcast LEFT JOIN counting orphans.

    At 100 TB this replaces six full scans with one, and the gate
    (`min(passed)`) is a 6-row driver-side reduce. Reference
    analogue: the spec's validation section
    (ICEBERG-Interoperability-Test-Spec.md §11 — results equivalence
    and integrity checks around every mutation)."""
    ev = load_table(spark, "events", sf_dir)
    domain = ["click", "view", "purchase", "signup", "error"]
    one_pass = ev.agg(
        F.count(F.lit(1)).alias("n"),
        (F.count(F.lit(1)) - F.countDistinct("event_id")).alias("dup_ids"),
        F.sum(F.col("value").isNull().cast("long")).alias("null_values"),
        F.sum((~F.col("event_type").isin(domain)).cast("long")).alias("out_of_domain"),
        F.max("ts").alias("max_ts"),
    ).collect()[0]
    orphans = (
        load_table(spark, "orders", sf_dir)
        .join(
            F.broadcast(load_table(spark, "customer", sf_dir).select("c_custkey")),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .count()
    )
    import datetime

    staleness = (one_pass["max_ts"] - datetime.datetime(2024, 1, 1)).days
    rows = [
        ("rows_nonzero", one_pass["n"], one_pass["n"] > 0),
        ("event_id_unique", one_pass["dup_ids"], one_pass["dup_ids"] == 0),
        ("value_not_null", one_pass["null_values"], one_pass["null_values"] == 0),
        ("event_type_in_domain", one_pass["out_of_domain"],
         one_pass["out_of_domain"] == 0),
        ("ts_fresh_within_31d_of_epoch_start", staleness,
         one_pass["max_ts"] >= datetime.datetime(2024, 1, 25)),
        ("orders_custkey_referential", orphans, orphans == 0),
    ]
    return spark.createDataFrame(
        rows, "check_name string, observed bigint, passed boolean"
    )


@register(
    "quality_gopher_rules",
    oracle=(
        # Per-doc metrics once in a CTE, then one row per rule. All
        # thresholds are cross-multiplied to integer comparisons so no
        # float ratio ever reaches the hash compare.
        "WITH m AS (SELECT "
        "  len(list_filter(regexp_split_to_array(trim(text), '\\s+'), "
        "      w -> w <> '')) AS n_words, "
        "  length(array_to_string(list_filter(regexp_split_to_array("
        "      trim(text), '\\s+'), w -> w <> ''), '')) AS n_chars, "
        "  len(list_filter(regexp_split_to_array(trim(text), '\\s+'), "
        "      w -> regexp_matches(w, '[a-z]'))) AS n_alpha, "
        "  len(list_filter(regexp_split_to_array(trim(text), '\\s+'), "
        "      w -> w IN ('the','a','of','and','to','in','is','on'))) AS n_stop, "
        "  length(text) - length(replace(text, '#', '')) AS n_sym "
        "FROM documents) "
        "SELECT 'word_count_20_1000' AS rule, CAST(COUNT(CASE WHEN "
        "n_words < 20 OR n_words > 1000 THEN 1 END) AS BIGINT) AS n_docs FROM m "
        "UNION ALL SELECT 'mean_word_len_4_10', CAST(COUNT(CASE WHEN "
        "n_chars < 4 * n_words OR n_chars > 10 * n_words THEN 1 END) AS BIGINT) FROM m "
        "UNION ALL SELECT 'symbol_ratio_le_10pct', CAST(COUNT(CASE WHEN "
        "10 * n_sym > n_words THEN 1 END) AS BIGINT) FROM m "
        "UNION ALL SELECT 'alpha_word_frac_ge_80pct', CAST(COUNT(CASE WHEN "
        "5 * n_alpha < 4 * n_words THEN 1 END) AS BIGINT) FROM m "
        "UNION ALL SELECT 'stopwords_ge_2', CAST(COUNT(CASE WHEN "
        "n_stop < 2 THEN 1 END) AS BIGINT) FROM m "
        "UNION ALL SELECT 'retained_all_rules', CAST(COUNT(CASE WHEN "
        "n_words >= 20 AND n_words <= 1000 "
        "AND n_chars >= 4 * n_words AND n_chars <= 10 * n_words "
        "AND 10 * n_sym <= n_words AND 5 * n_alpha >= 4 * n_words "
        "AND n_stop >= 2 THEN 1 END) AS BIGINT) FROM m"
    ),
)
def quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality gate (Rae et al. 2021, "Scaling
    Language Models" §A1.1): the five repetition-free heuristics that
    survive on this corpus's feature set — word count in [20, 1000],
    mean word length in [4, 10], symbol-to-word ratio ≤ 0.1 (# is the
    corpus's symbol), ≥ 80% of words contain an alphabetic character,
    and ≥ 2 stopwords — reported as per-rule failure counts plus the
    retained-document count.

    Scale shape: ONE scan. Per-doc metrics are JVM higher-order
    functions over a single split array (no Python, no explode — an
    exploded words table would shuffle |corpus words| rows); the six
    counts come out of one map-combined aggregate whose output is six
    numbers per map task. Every ratio threshold is cross-multiplied
    into integer arithmetic so the gate — and the oracle hash — never
    touches float rounding. At 100 TB this is the cheapest possible
    corpus pass: narrow projection (text only), partial aggs, a
    1-row-per-rule result."""
    stop = ("the", "a", "of", "and", "to", "in", "is", "on")
    doc = load_table(spark, "documents", sf_dir)
    words = F.filter(
        F.split(F.trim(F.col("text")), r"\s+"), lambda w: w != F.lit("")
    )
    m = doc.select(
        F.size(words).alias("n_words"),
        F.length(F.concat_ws("", words)).alias("n_chars"),
        F.size(F.filter(words, lambda w: w.rlike("[a-z]"))).alias("n_alpha"),
        F.size(F.filter(words, lambda w: w.isin(*stop))).alias("n_stop"),
        (
            F.length(F.col("text"))
            - F.length(F.regexp_replace(F.col("text"), "#", ""))
        ).alias("n_sym"),
    )
    fail_wc = (F.col("n_words") < 20) | (F.col("n_words") > 1000)
    fail_mwl = (F.col("n_chars") < 4 * F.col("n_words")) | (
        F.col("n_chars") > 10 * F.col("n_words")
    )
    fail_sym = 10 * F.col("n_sym") > F.col("n_words")
    fail_alpha = 5 * F.col("n_alpha") < 4 * F.col("n_words")
    fail_stop = F.col("n_stop") < 2
    retained = ~(fail_wc | fail_mwl | fail_sym | fail_alpha | fail_stop)
    agg = m.agg(
        F.sum(fail_wc.cast("long")).alias("word_count_20_1000"),
        F.sum(fail_mwl.cast("long")).alias("mean_word_len_4_10"),
        F.sum(fail_sym.cast("long")).alias("symbol_ratio_le_10pct"),
        F.sum(fail_alpha.cast("long")).alias("alpha_word_frac_ge_80pct"),
        F.sum(fail_stop.cast("long")).alias("stopwords_ge_2"),
        F.sum(retained.cast("long")).alias("retained_all_rules"),
    )
    return agg.selectExpr(
        "stack(6, "
        "'word_count_20_1000', word_count_20_1000, "
        "'mean_word_len_4_10', mean_word_len_4_10, "
        "'symbol_ratio_le_10pct', symbol_ratio_le_10pct, "
        "'alpha_word_frac_ge_80pct', alpha_word_frac_ge_80pct, "
        "'stopwords_ge_2', stopwords_ge_2, "
        "'retained_all_rules', retained_all_rules) AS (rule, n_docs)"
    )
