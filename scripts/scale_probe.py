"""Scale probe: 10M-row datagen → LakeTable write / pruned reads / CoW DML.

This is the probe that drove the fanout-partition-layout decision
(see BASELINE.md "Scale probe"). Run it after layout or pruning
changes to confirm the manifest-pruning numbers still hold:

    python scripts/scale_probe.py [N_ROWS]

Expected shape at 10M rows (local[32]): 480 files (30 days x 16
buckets), a 2-day window pruning to ~32 files driver-side, point
lookups touching 1/16 of files via bucket-dir pruning.
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
from iceberg_catalog_bench_spark.sources.datagen import generate_tx_events


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark(app_name="scale-probe")
    df = generate_tx_events(spark, n)

    root = tempfile.mkdtemp(prefix="scale-")
    t = LakeTable.create(
        spark, os.path.join(root, "tx"),
        "user_id bigint, ts timestamp, amount double, city string, category string",
        partition_by=["days(ts)", "bucket(16, user_id)"],
    )

    def tick(label, fn):
        t0 = time.perf_counter()
        r = fn()
        print(f"{label}: {time.perf_counter() - t0:.2f}s", flush=True)
        return r

    tick(f"write_append_{n}", lambda: t.append(df))
    snap = t._snapshot()
    print(f"files: {len(snap.files)}, rows: {sum(f.rows for f in snap.files)}, "
          f"bytes: {sum(f.bytes for f in snap.files) / 1e6:.0f}MB", flush=True)
    lake = t.read()
    tick("count", lambda: lake.count())
    window = "ts >= '2025-01-05' AND ts < '2025-01-07'"
    tick("read_pruned_scan", lambda: t.scan(window).groupBy("city").count().collect())
    print(f"pruned files for 2-day window: "
          f"{len(t._prune_files(snap.files, window))}/{len(snap.files)}", flush=True)
    print(f"bucket-pruned point lookup: "
          f"{len(t._prune_files(snap.files, 'user_id = 777777'))}/{len(snap.files)}", flush=True)
    tick("read_agg", lambda: lake.groupBy("category").agg(
        F.percentile_approx("amount", 0.95), F.count(F.lit(1))).collect())
    tick("read_lookup", lambda: t.scan("user_id = 777777").collect())
    tick("delete_1row", lambda: t.delete_where("user_id = 777777"))
    tick("update_1row", lambda: t.update({"amount": "amount + 1"}, "user_id = 888888"))

    # Incremental consumption cost must track the CHANGE, not the table:
    # a 100k-row append polled via incremental_read reads only the new
    # files; changelog across a small delete reads only the files whose
    # tombstone state changed (plus the exceptAll netting on them).
    s_before = t._snapshot().snapshot_id
    batch = df.limit(100_000).withColumn("user_id", F.col("user_id") + 20_000_000)
    t.append(batch)
    tick("incremental_read_100k_batch",
         lambda: t.incremental_read(s_before).count())
    s_mid = t._snapshot().snapshot_id
    t.delete_where("user_id = 20000001")
    tick("changelog_after_point_delete",
         lambda: t.changelog(s_mid).count())
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
