"""Scale probe for CDC cow-changelog netting (round 6).

Builds an N-row copy-on-write table (default 2M rows in F files), runs
one targeted CoW UPDATE touching a fraction of rows (which rewrites
only the files containing them), then times one availableNow CDC drain
with ``cow-changelog=true`` at several bucket counts.

What this pins down, honestly:

- netting cost scales with the CHANGED file set, not the table: the
  drain reads (removed + added) files x buckets; untouched files are
  never opened (the partition planner is manifest-only).
- the bucket trade: K buckets = K-way task parallelism at Kx read
  amplification over the changed set. The right K is small — the
  common CDC case is a targeted update whose changed set is a handful
  of files; a FULL-table rewrite should use the batch
  ``LakeTable.changelog()`` (JVM exceptAll), which is also timed here
  for reference.
- correctness at every K: the netted feed carries exactly
  2 x updated_rows records (one -D, one +I each) — asserted.

    python scripts/cow_changelog_probe.py [N_ROWS] [N_FILES] [UPDATE_PCT]
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from iceberg_catalog_bench_spark.catalog.table import LakeTable
from iceberg_catalog_bench_spark.session import get_spark
from iceberg_catalog_bench_spark.streaming.table_source import register_source


def run_layout(spark, d, layout, n_rows, n_files, update_pct):
    t = LakeTable.create(spark, os.path.join(d, f"t-{layout}"), "k bigint, v double")
    base_df = spark.range(n_rows).select(
        F.col("id").alias("k"), (F.col("id") * 0.5).alias("v")
    )
    if layout == "clustered":
        # range-partitioned on k: a k-range update touches ~1 file —
        # the targeted-update case the netting is designed for
        base_df = base_df.repartitionByRange(n_files, "k")
    else:
        # round-robin: every file holds every k-range, so the same
        # update rewrites ALL files — the worst case the docstring
        # routes to batch changelog()
        base_df = base_df.repartition(n_files)
    t.append(base_df)
    files_before = {e.path for e in t._snapshot().files}
    hi = int(n_rows * update_pct / 100)
    base = t._snapshot().snapshot_id
    t0 = time.time()
    t.update({"v": "v + 1.0"}, f"k < {hi}")
    update_s = time.time() - t0
    snap = t._snapshot()
    removed = files_before - {e.path for e in snap.files}
    added = {e.path for e in snap.files} - files_before
    changed_bytes = sum(e.bytes for e in snap.files if e.path in added)
    print(
        f"[{layout}] {n_rows} rows / {len(files_before)} files; "
        f"update k<{hi} ({update_pct}%) rewrote {len(removed)} files "
        f"(+{len(added)} new, {changed_bytes >> 20} MiB changed side) "
        f"in {update_s:.2f}s"
    )

    expect = 2 * hi  # one -D and one +I per updated row

    def drain(buckets: int) -> tuple[float, int]:
        sink = os.path.join(d, f"sink-{layout}-{buckets}")
        ck = os.path.join(d, f"ck-{layout}-{buckets}")
        t0 = time.time()
        q = (
            spark.readStream.format("laketable")
            .option("path", t.path).option("mode", "cdc")
            .option("cow-changelog", "true")
            .option("cdc-cow-buckets", str(buckets))
            .option("starting-snapshot-id", str(base))  # skip base load
            .load()
            .writeStream.format("parquet").option("path", sink)
            .trigger(availableNow=True)
            .option("checkpointLocation", ck).start()
        )
        q.awaitTermination(1200)
        dt = time.time() - t0
        n = spark.read.parquet(sink).count()
        return dt, n

    for buckets in (1, 2, 4):
        dt, n = drain(buckets)
        status = "OK" if n == expect else f"WRONG (want {expect})"
        print(f"[{layout}] cdc drain, {buckets} bucket(s): {dt:.2f}s, {n} records {status}")

    t0 = time.time()
    n = (
        t.changelog(base)
        .filter(F.col("_change_type").isin("insert", "delete"))
        .count()
    )
    print(
        f"[{layout}] batch changelog() (JVM exceptAll) reference: "
        f"{time.time() - t0:.2f}s, {n} records"
    )


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    update_pct = float(sys.argv[3]) if len(sys.argv) > 3 else 5.0
    spark = get_spark(app_name="cow-changelog-probe")
    register_source(spark)
    d = tempfile.mkdtemp(prefix="cow-probe-")
    try:
        for layout in ("clustered", "spread"):
            run_layout(spark, d, layout, n_rows, n_files, update_pct)
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
