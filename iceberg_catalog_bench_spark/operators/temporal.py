"""Temporal join operators — the time-series shapes Spark has no
built-in operator for (reference has none either; these are the
additive as-of/point-in-time joins a feature-store or event pipeline
needs, SURVEY.md §2.9 north-star family).

The as-of join is implemented JVM-side as union + last-non-null
window — one shuffle on the join key, one sort, no Python, no
non-equi join. This is the shape that scales: the naive formulation
(t1 JOIN t2 ON key AND t2.ts <= t1.ts + max-per-group) is a range
join that explodes quadratically per key, and the per-key
pandas merge_asof (cogrouped applyInPandas) serializes every row
through Arrow. Union+window gives Spark a sort-based single pass —
at 100 TB it's one shuffle keyed by (user), time-sorted within
partitions, exactly what a time-series store's storage order would
provide for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table
from .registry import register


@register(
    "join_asof_last_purchase",
    oracle=(
        # DuckDB's native ASOF JOIN is the oracle: per click, the
        # purchase row with the greatest ts <= click ts. Both sides
        # are truncated to microseconds (the Spark reader converts the
        # parquet ns timestamps to us), and equal-ts purchases are
        # pre-reduced to max event_id so the match is deterministic.
        "WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, "
        "event_type, value FROM events WHERE user_id < 50), "
        "p AS (SELECT user_id, ts, MAX(event_id) AS p_event_id, "
        "arg_max(value, event_id) AS p_value "
        "FROM ev WHERE event_type = 'purchase' GROUP BY user_id, ts), "
        "c AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'click') "
        "SELECT c.event_id, c.user_id, p.p_event_id AS asof_purchase_id, "
        "ROUND(p.p_value, 4) AS asof_purchase_value "
        "FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND p.ts <= c.ts"
    ),
)
def join_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (point-in-time) join: for every click event, the same
    user's latest purchase at-or-before the click — the lookup a
    feature store does for "state as of event time" (no future
    leakage). user_id < 50 bounds the checked slice.

    Plan shape: purchases and clicks union into one stream, one
    shuffle on user_id, one time sort; last(ignorenulls) over an
    unbounded-preceding window carries the most recent purchase
    forward; equal timestamps order purchases before clicks so
    `<=` semantics hold. Ties on (user, ts) among purchases are
    pre-reduced to max event_id, matching the oracle's arg_max."""
    ev = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("user_id") < 50)
        .select("event_id", "user_id", "ts", "event_type", "value")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(
            F.max("event_id").alias("p_event_id"),
            F.max_by("value", "event_id").alias("p_value"),
        )
        .withColumn("is_click", F.lit(0))
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts")
        .withColumn("is_click", F.lit(1))
    )
    merged = clicks.unionByName(purchases, allowMissingColumns=True)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_click")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        merged.withColumn("asof_purchase_id", F.last("p_event_id", ignorenulls=True).over(w))
        .withColumn("asof_value", F.last("p_value", ignorenulls=True).over(w))
        .filter(F.col("is_click") == 1)
        .select(
            "event_id",
            "user_id",
            "asof_purchase_id",
            F.round("asof_value", 4).alias("asof_purchase_value"),
        )
    )


_RANGE_S = 900  # ±15 minutes


@register(
    "join_range_error_context",
    oracle=(
        "WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts "
        "FROM events WHERE user_id < 30 AND event_type = 'error'), "
        "c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts "
        "FROM events WHERE user_id < 30 AND event_type = 'click') "
        "SELECT e.event_id, e.user_id, CAST(COUNT(c.ts) AS BIGINT) AS nearby_clicks "
        "FROM e LEFT JOIN c ON e.user_id = c.user_id "
        "AND c.ts BETWEEN e.ts - INTERVAL 15 MINUTE AND e.ts + INTERVAL 15 MINUTE "
        "GROUP BY e.event_id, e.user_id"
    ),
)
def join_range_error_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join via bucketization: for each error event,
    how many clicks the same user made within ±15 minutes — the
    incident-context query. The oracle is the naive non-equi join
    (fine at test SF); the Spark plan is the scale form: quantize time
    into range-width buckets, explode the probe side to its bucket ±1,
    equi-join on (user, bucket), then exact-filter |Δt| ≤ 15 min.
    Because bucket width equals the range, a true match can only sit
    in the adjacent bucket, so the equi-join is lossless and the plan
    contains no non-equi/cartesian node — candidate count tracks
    events-per-30-minutes density, not n² per user."""
    ev = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("user_id") < 30)
        .select("event_id", "user_id", "ts", "event_type")
        .withColumn("us", F.unix_micros("ts"))
    )
    # integer division: float quantization could off-by-one a bucket at
    # an exact boundary microsecond, silently separating a true pair
    bucket = F.expr(f"us div {_RANGE_S * 1_000_000}")
    errors = (
        ev.filter(F.col("event_type") == "error")
        .select("event_id", "user_id", F.col("us").alias("e_us"), bucket.alias("b"))
        .withColumn("bucket", F.explode(F.array(F.col("b") - 1, F.col("b"), F.col("b") + 1)))
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("us").alias("c_us"), bucket.alias("bucket")
    )
    matches = errors.join(clicks, ["user_id", "bucket"], "left").withColumn(
        "hit",
        (F.abs(F.col("c_us") - F.col("e_us")) <= F.lit(_RANGE_S * 1_000_000)).cast("int"),
    )
    return matches.groupBy("event_id", "user_id").agg(
        F.coalesce(F.sum("hit"), F.lit(0)).cast("bigint").alias("nearby_clicks")
    )
