"""Throughput probe for the `laketable` Python DataSource (round 5).

Writes an N-row table (default 5M) in K append commits, then times:

1. ``LakeTable.read()`` — the JVM parquet scan (the production batch
   read path);
2. ``spark.read.format("laketable")`` — the Python batch reader
   (Arrow read in Python workers, rows shipped to the JVM);
3. one availableNow drain of ``spark.readStream.format("laketable")``
   into a parquet sink — the path the source actually exists for:
   incremental consumption of commits;
4. a SECOND drain after one more commit — the steady-state cost of an
   incremental poll (one commit's files, not the table).

What this pins down: the Python source pays the Arrow→JVM row-shipping
tax on BULK reads (expect several× slower than the JVM scan — that's
why the docstring tells bulk readers to use LakeTable.read()), but the
incremental poll cost tracks the NEW data only, which is the number
that matters for a commit-feed consumer at 100 TB: polling a table is
O(new files), never O(table).

    python scripts/table_source_probe.py [N_ROWS] [N_COMMITS]
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


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_commits = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark(app_name="table-source-probe")
    register_source(spark)
    d = tempfile.mkdtemp(prefix="lts-probe-")
    try:
        t = LakeTable.create(
            spark, os.path.join(d, "t"),
            "k bigint, v double, s string",
        )
        per = n_rows // n_commits
        for i in range(n_commits):
            df = (
                spark.range(i * per, (i + 1) * per)
                .select(
                    F.col("id").alias("k"),
                    (F.col("id") * 0.5).alias("v"),
                    F.concat(F.lit("row-"), F.col("id")).alias("s"),
                )
            )
            t.append(df)

        t0 = time.perf_counter()
        n_jvm = t.read().count()
        jvm_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        n_py = spark.read.format("laketable").option("path", t.path).load().count()
        py_s = time.perf_counter() - t0

        # Pushdown leg: a selective read through the pushdown-capable
        # reader — manifest stats prune whole files driver-side, the
        # Arrow scan filters rows worker-side, so a point-ish read
        # ships only matching data instead of the whole table.
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
        try:
            lo_k, hi_k = n_rows // 2, n_rows // 2 + 1000
            # aggregate over EVERY column so the unpushed plan must
            # ship whole rows (count() alone is fixed-cost dominated)
            sel = f"k >= {lo_k} AND k < {hi_k}"

            def selective(push: bool):
                r = spark.read.format("laketable").option("path", t.path)
                if push:
                    r = r.option("filter-pushdown", "true")
                return (
                    r.load().filter(sel)
                    .groupBy().agg(
                        F.count(F.lit(1)).alias("n"),
                        F.sum("v").alias("sv"),
                        F.max("s").alias("ms"),
                    ).collect()[0]["n"]
                )

            t0 = time.perf_counter()
            n_push = selective(True)
            push_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            n_nopush = selective(False)
            nopush_s = time.perf_counter() - t0
            assert n_push == n_nopush == 1000
            # the scale-proof metric: files that become tasks at all
            push_parts = (
                spark.read.format("laketable").option("path", t.path)
                .option("filter-pushdown", "true").load().filter(sel)
                .rdd.getNumPartitions()
            )
            nopush_parts = (
                spark.read.format("laketable").option("path", t.path)
                .load().filter(sel).rdd.getNumPartitions()
            )
        finally:
            spark.conf.set("spark.sql.python.filterPushdown.enabled", "false")

        sink, ck = os.path.join(d, "sink"), os.path.join(d, "ck")

        def drain() -> float:
            t0 = time.perf_counter()
            q = (
                spark.readStream.format("laketable").option("path", t.path).load()
                .writeStream.format("parquet").option("path", sink)
                .trigger(availableNow=True)
                .option("checkpointLocation", ck).start()
            )
            q.awaitTermination(600)
            return time.perf_counter() - t0

        full_drain_s = drain()
        t.append(
            spark.range(n_rows, n_rows + per).select(
                F.col("id").alias("k"),
                (F.col("id") * 0.5).alias("v"),
                F.concat(F.lit("row-"), F.col("id")).alias("s"),
            )
        )
        incr_drain_s = drain()
        n_sink = spark.read.parquet(sink).count()
        assert n_jvm == n_py == n_rows and n_sink == n_rows + per

        # Rate-limit leg: a fresh capped stream over the same table.
        # max-files-per-trigger bounds each micro-batch's input — the
        # catch-up-storm control. The number that matters at 100 TB is
        # PEAK per-batch rows (state/memory per micro-batch), traded
        # against the fixed per-batch overhead × batch count.
        cap_sink, cap_ck = os.path.join(d, "cap_sink"), os.path.join(d, "cap_ck")
        t0 = time.perf_counter()
        q = (
            spark.readStream.format("laketable").option("path", t.path)
            .option("max-files-per-trigger", "8").load()
            .writeStream.format("parquet").option("path", cap_sink)
            .trigger(processingTime="0 seconds")
            .option("checkpointLocation", cap_ck).start()
        )
        q.processAllAvailable()
        capped_s = time.perf_counter() - t0
        prog = [p for p in q.recentProgress if p["numInputRows"] > 0]
        q.stop()
        n_cap = spark.read.parquet(cap_sink).count()
        assert n_cap == n_rows + per, (n_cap, n_rows + per)
        cap_batches = len(prog)
        cap_peak = max(p["numInputRows"] for p in prog)
        uncapped_peak = n_rows  # the full-drain single batch above

        # Sink leg: the same table piped into a laketable streaming
        # SINK (writeStream.format("laketable")) — executor-side
        # parquet writes + one snapshot per micro-batch. Times the
        # full source→sink exactly-once pipe at N rows.
        dst = LakeTable.create(
            spark, os.path.join(d, "dst"), "k bigint, v double, s string"
        )
        sink_ck = os.path.join(d, "sink_ck")
        t0 = time.perf_counter()
        q = (
            spark.readStream.format("laketable").option("path", t.path).load()
            .writeStream.format("laketable").option("path", dst.path)
            .trigger(availableNow=True)
            .option("checkpointLocation", sink_ck).start()
        )
        q.awaitTermination(600)
        sink_s = time.perf_counter() - t0
        dst._reload()
        n_dst = dst.read().count()
        assert n_dst == n_rows + per, (n_dst, n_rows + per)

        # CDC leg: a MoR position delete of ~1% of keys, then a cdc
        # drain of ONLY that commit — times the -D path (delete-file
        # filter + pyarrow take on each referenced data file).
        cdc_sink, cdc_ck = os.path.join(d, "cdc_sink"), os.path.join(d, "cdc_ck")
        q = (
            spark.readStream.format("laketable").option("path", t.path)
            .option("mode", "cdc").load()
            .writeStream.format("parquet").option("path", cdc_sink)
            .trigger(availableNow=True)
            .option("checkpointLocation", cdc_ck).start()
        )
        q.awaitTermination(600)  # baseline the checkpoint at the head
        t.delete_where(f"k % 100 = 7 AND k < {n_rows}", mode="merge-on-read")
        t0 = time.perf_counter()
        q = (
            spark.readStream.format("laketable").option("path", t.path)
            .option("mode", "cdc").load()
            .writeStream.format("parquet").option("path", cdc_sink)
            .trigger(availableNow=True)
            .option("checkpointLocation", cdc_ck).start()
        )
        q.awaitTermination(600)
        cdc_drain_s = time.perf_counter() - t0
        import pyspark.sql.functions as SF

        n_deletes = (
            spark.read.parquet(cdc_sink)
            .filter(SF.col("_change_type") == "delete").count()
        )

        print(
            f"rows={n_rows} commits={n_commits}\n"
            f"jvm_batch_read   {jvm_s:6.2f}s  ({n_rows/jvm_s/1e6:.1f}M rows/s)\n"
            f"python_batch     {py_s:6.2f}s  ({n_rows/py_s/1e6:.1f}M rows/s, "
            f"{py_s/jvm_s:.1f}x jvm)\n"
            f"stream_full      {full_drain_s:6.2f}s  (drain {n_rows} rows + sink write)\n"
            f"stream_incr      {incr_drain_s:6.2f}s  (drain {per} rows + sink write, "
            f"{full_drain_s/incr_drain_s:.1f}x less than full)\n"
            f"cdc_pos_deletes  {cdc_drain_s:6.2f}s  ({n_deletes} -D rows re-read "
            f"by position across the table's data files)\n"
            f"stream_capped    {capped_s:6.2f}s  (max-files-per-trigger=8: "
            f"{cap_batches} batches, peak {cap_peak} rows/batch vs "
            f"{uncapped_peak} uncapped — "
            f"{uncapped_peak/cap_peak:.0f}x smaller peak batch)\n"
            f"sink_pipe        {sink_s:6.2f}s  (laketable->laketable "
            f"exactly-once pipe, {n_dst} rows, "
            f"{n_dst/sink_s/1e6:.1f}M rows/s end-to-end)\n"
            f"push_selective   {push_s:6.2f}s  vs {nopush_s:6.2f}s unpushed; "
            f"{push_parts} vs {nopush_parts} file-tasks planned "
            f"({nopush_parts/push_parts:.0f}x pruned — wall clock is "
            f"task-overhead-bound at this SF; the task/shipping ratio "
            f"is what scales)"
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
