"""Bloom-filter lookup probe (round 3).

Writes the same 10M-row table twice — with and without
`write.parquet.bloom-filter-enabled.column.user_id` — as ONE unsorted
file each (no partitioning, no sort), then times an equality point
lookup. Unsorted means every row group's min/max spans ~the full key
domain, so footer stats prune nothing and the bloom filter is the only
thing standing between the reader and a full scan.

    python scripts/bloom_filter_probe.py [N_ROWS]
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from iceberg_catalog_bench_spark.catalog import LakeTable
from iceberg_catalog_bench_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark(app_name="bloom-probe")
    # 8 MB row groups → ~25 per file: the realistic 100 TB layout has
    # thousands of row groups per scan; default 128 MB groups on a 4-file
    # probe table leave almost nothing to skip
    spark.sparkContext._jsc.hadoopConfiguration().setInt(
        "parquet.block.size", 8 * 1024 * 1024
    )
    # shuffled key order → row-group min/max stats are useless
    df = spark.range(n).select(
        F.xxhash64("id").alias("user_id"),
        (F.col("id") % 1000).cast("double").alias("v"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    d = tempfile.mkdtemp(prefix="bloom-probe-")
    try:
        results = {}
        for label, props in [
            ("no_bloom", {}),
            ("bloom", {
                "write.parquet.bloom-filter-enabled.column.user_id": "true",
                "write.parquet.bloom-filter-expected-ndv.column.user_id": str(n),
            }),
        ]:
            t = LakeTable.create(
                spark, os.path.join(d, label),
                "user_id bigint, v double, payload string",
                properties=props,
            )
            t.append(df.coalesce(4))
            probe_keys = [r["user_id"] for r in t.read().limit(3).collect()]
            t.read().filter(F.col("user_id") == probe_keys[0]).count()  # warm
            t0 = time.perf_counter()
            for k in probe_keys:
                assert t.read().filter(F.col("user_id") == k).count() >= 1
            results[label] = round((time.perf_counter() - t0) / len(probe_keys), 3)
            print(label, "avg lookup:", results[label], "s", flush=True)
        print({"rows": n, **results,
               "speedup": round(results["no_bloom"] / results["bloom"], 2)})
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
