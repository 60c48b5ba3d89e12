"""Streaming throughput at 10M rows — the scale evidence for the
streaming family (BENCH phases run at sf0.1 ≈ 100k events).

Generates a 10M-row tx table as N parquet files, then runs the
standard windowed-aggregation stream (watermark 2h, 1-hour tumbling
windows, append-mode parquet sink) over it with maxFilesPerTrigger
sharding, and reports end-to-end wall time, rows/s, micro-batch
count, and sink row count. State-store partitions come from
SPARK_GRAFT_STREAM_STATE_PARTITIONS (the measured knob — see
streaming/events.py).

Usage: python scripts/streaming_scale_probe.py [rows] [files_per_trigger]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from iceberg_catalog_bench_spark.session import get_spark
from iceberg_catalog_bench_spark.sources.datagen import generate_tx_events
from iceberg_catalog_bench_spark.streaming.events import _STATE_PARTITIONS


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    fpt = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark(app_name="streaming-scale-probe")
    d = tempfile.mkdtemp(prefix="stream-scale-")
    try:
        src_dir = d + "/src"
        generate_tx_events(spark, rows).repartition(16).write.parquet(src_dir)

        raw = (
            spark.readStream.schema(
                "user_id bigint, ts timestamp, amount double, "
                "city string, category string"
            )
            .option("maxFilesPerTrigger", str(fpt))
            .parquet(src_dir)
        )
        agg = (
            raw.withWatermark("ts", "2 hours")
            .groupBy(F.window("ts", "1 hour").alias("w"), "category")
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.round(F.sum("amount"), 2).alias("sum_amount"))
            .select(F.col("w.start").alias("window_start"), "category",
                    "cnt", "sum_amount")
        )
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", _STATE_PARTITIONS)
        t0 = time.perf_counter()
        try:
            q = (
                agg.writeStream.format("parquet")
                .option("path", d + "/out")
                .option("checkpointLocation", d + "/ck")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            batches = sum(1 for p in q.recentProgress if p["numInputRows"] > 0)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        wall = time.perf_counter() - t0
        sink_rows = spark.read.parquet(d + "/out").count()
        print(json.dumps({
            "rows": rows,
            "files_per_trigger": fpt,
            "state_partitions": int(_STATE_PARTITIONS),
            "micro_batches": batches,
            "wall_s": round(wall, 2),
            "rows_per_sec": int(rows / wall),
            "finalized_window_rows": sink_rows,
        }))
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
