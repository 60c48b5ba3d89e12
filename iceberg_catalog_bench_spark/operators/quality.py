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
