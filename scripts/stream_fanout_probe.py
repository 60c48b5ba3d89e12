"""Probe: what does partition-value fanout cost the Python write path?

The streaming sink / laketable batch writer fan rows out to one file
per partition value when every spec field is exactly computable in
Python (``_python_partition_fn``). This probe drains the same
100k-row events slice through the streaming sink into (a) an
unpartitioned table (single file per task, the old path) and (b) an
``ibucket(16, user_id)`` table (murmur3 fanout, 16 files per task),
(c) the reference's flagship shape ``days(ts) + ibucket(16,
user_id)`` (UTC-gated calendar fanout, r11 — the source table is
day-partitioned so each drained task covers one day and fanout stays
under the 64-writer cap), and prints wall time per drain — measuring
the fanout's per-row Python cost (grouping + murmur3 + calendar
rendering + multi-writer) against the baseline.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/stream_fanout_probe.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_catalog_bench_spark.catalog.table import LakeTable
from iceberg_catalog_bench_spark.session import get_spark
from iceberg_catalog_bench_spark.sources import load_table
from iceberg_catalog_bench_spark.streaming.table_source import register_source

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    spark = get_spark(app_name="stream-fanout-probe")
    register_source(spark)
    root = tempfile.mkdtemp(prefix="fanout-probe-")
    try:
        src = LakeTable.create(
            spark, os.path.join(root, "src"),
            "event_id bigint, ts timestamp, user_id bigint, value double",
            partition_by=["days(ts)"])
        src.append(load_table(spark, "events", SF_DIR).select(
            "event_id", "ts", "user_id", "value"))

        def drain(label: str, part):
            dst = LakeTable.create(
                spark, os.path.join(root, label),
                "event_id bigint, ts timestamp, user_id bigint, value double",
                partition_by=part)
            times = []
            for i in range(3):
                t0 = time.perf_counter()
                q = (
                    spark.readStream.format("laketable")
                    .option("path", src.path)
                    .load()
                    .writeStream.format("laketable")
                    .option("path", dst.path)
                    .option("checkpointLocation",
                            os.path.join(root, f"cp-{label}-{i}"))
                    .option("sink-query-id", f"{label}-{i}")
                    .trigger(availableNow=True).start()
                )
                q.awaitTermination(300)
                times.append(time.perf_counter() - t0)
            times.sort()
            t = LakeTable.load(spark, dst.path)
            snap = t._snapshot(t._meta["current_snapshot_id"])
            keyed = sum(1 for f in snap.files if f.partition)
            print(f"{label:>18}: median {times[1]:6.2f}s "
                  f"(min {times[0]:.2f}, max {times[2]:.2f})  "
                  f"rows={t.read().count()}  files={len(snap.files)} "
                  f"(keyed {keyed})")

        drain("unpartitioned", None)
        drain("ibucket16", ["ibucket(16, user_id)"])
        drain("days_ibucket16", ["days(ts)", "ibucket(16, user_id)"])
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
