"""Structured Streaming operators over the events table.

The reference has no streaming surface (SURVEY.md §2.9); these are
the additive stream-processing operators a training-data pipeline
needs, built on ``readStream`` → watermark → windowed aggregation →
``writeStream`` with ``availableNow`` (process-all-then-stop), which
makes every streaming query batch-replayable — and therefore
oracle-checkable against plain SQL over the same rows.

Scale notes: file-source streaming at 100 TB shards by file
(maxFilesPerTrigger); watermarks bound state; session windows use
Spark's native session_window (state store, not a Python UDF).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.registry import register

_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # TIMESTAMP(NANOS) read as long
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over events.parquet with the ns→µs timestamp
    conversion (same workaround as sources.tables — the file stores
    TIMESTAMP(NANOS), which Spark reads as long under nanosAsLong)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(_EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def _run_to_completion(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Execute a streaming aggregation with availableNow against a
    memory sink; block until the backlog is drained; return the result
    table. Complete output mode → final aggregates (equivalent to the
    batch query over the same input)."""
    name = f"stream_{uuid.uuid4().hex[:10]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@register(
    "streaming_windowed_agg",
    oracle=(
        "SELECT date_trunc('hour', ts) AS window_start, event_type, "
        "COUNT(*) AS cnt, ROUND(SUM(value), 2) AS sum_value "
        "FROM events GROUP BY date_trunc('hour', ts), event_type"
    ),
)
def streaming_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream → watermark(2h) → 1-hour tumbling window agg →
    availableNow to a memory sink. Because availableNow drains the
    whole backlog and the watermark only drops *late* data (none in a
    replay), the final aggregates equal the batch GROUP BY — which is
    exactly what the oracle asserts."""
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt", "sum_value")
    )
    return _run_to_completion(agg, spark)


@register(
    "streaming_dedup_count",
    oracle=(
        "SELECT CAST(COUNT(DISTINCT event_id) AS BIGINT) AS distinct_events FROM events"
    ),
)
def streaming_dedup_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: dropDuplicates on event_id under a
    watermark (bounded state), then a global count — the streaming
    ingestion-dedup idiom. availableNow replay == batch DISTINCT."""
    ev = _events_stream(spark, sf_dir)
    deduped = ev.withWatermark("ts", "1 day").dropDuplicates(["event_id"])
    agg = deduped.groupBy().agg(F.count(F.lit(1)).alias("distinct_events"))
    return _run_to_completion(agg, spark)


@register(
    "sessionize_batch",
    oracle=(
        "WITH gaps AS (SELECT user_id, ts, "
        "CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "> INTERVAL 30 MINUTE OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "IS NULL THEN 1 ELSE 0 END AS new_session "
        "FROM events WHERE user_id < 40) "
        "SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, "
        "COUNT(*) AS n_events FROM gaps GROUP BY user_id"
    ),
)
def sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap via Spark's
    native session_window (the same state-store operator streaming
    uses; in batch it runs as a sort-based session aggregation). The
    oracle reproduces session boundaries with LAG + cumulative gap
    counting. user_id < 40 keeps the check focused and fast."""
    from ..sources import load_table

    ev = load_table(spark, "events", sf_dir).filter(F.col("user_id") < 40)
    sessions = ev.groupBy(
        F.session_window("ts", "30 minutes").alias("sw"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return sessions.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
    )
