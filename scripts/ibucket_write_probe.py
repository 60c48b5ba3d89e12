"""Probe: what does spec-true murmur3 bucketing (``ibucket``) cost on
the WRITE path vs the legacy JVM-side xxhash64 ``bucket``?

The ibucket clustering expression is the one place the native write
path leaves the JVM (an Arrow-batched pandas UDF over int64 lanes,
vectorized numpy murmur3). This probe appends the same events slice to
tables partitioned three ways — unpartitioned, ``bucket(16, user_id)``
(xxhash64, whole-stage codegen), ``ibucket(16, user_id)`` (murmur3
UDF) — and prints wall time per append, so the UDF's overhead is
measured, not guessed. The UDF runs once per written row at write time
only; reads and pruning are unaffected.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/ibucket_write_probe.py
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

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(app_name="ibucket-write-probe")
    ev = load_table(spark, "events", SF_DIR).select(
        "event_id", "user_id", "value").cache()
    n = ev.count()
    root = tempfile.mkdtemp(prefix="ibucket-probe-")
    try:
        for label, part in (
            ("unpartitioned", None),
            ("bucket16_xxhash64", ["bucket(16, user_id)"]),
            ("ibucket16_murmur3", ["ibucket(16, user_id)"]),
        ):
            t = LakeTable.create(
                spark, os.path.join(root, label),
                "event_id bigint, user_id bigint, value double",
                partition_by=part)
            t.append(ev)  # warm-up (JIT, python workers)
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                t.append(ev)
                times.append(time.perf_counter() - t0)
            times.sort()
            print(f"{label:>20}: median {times[1]:6.2f}s "
                  f"(min {times[0]:.2f}, max {times[2]:.2f})  rows={n}")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
