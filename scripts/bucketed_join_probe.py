"""Measure the shuffle a bucketed co-located join eliminates, at 10M×10M.

`join_bucketed_colocated`'s driver row pins the PLAN property (zero
Exchange); this probe pins the RESOURCE claim at scale: the same
fact-fact join over two 10M-row tables, run (a) over plain parquet —
both sides shuffle on the join key — and (b) over `bucketBy(64, key)`
tables — bucket i joins bucket i in place. The join-stage shuffle
bytes should drop to ~zero in (b); what remains is the (tiny) final
aggregate exchange. The bucketed layout's one-time write cost is
reported separately — that's the trade: pay the shuffle once at
layout time, then never again on this key.

Usage: python scripts/bucketed_join_probe.py [rows]
Writes nothing outside tempdirs; prints one JSON line.
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

_BUCKETS = 64


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark(app_name="bucketed-join-probe")
    from bench import PhaseMetrics  # bench.py's AppStatusStore meter

    pm = PhaseMetrics(spark)
    d = tempfile.mkdtemp(prefix="bucket-probe-")
    out: dict = {"rows": rows, "buckets": _BUCKETS}
    try:
        # two independent 10M facts sharing the user_id key space
        generate_tx_events(spark, rows).select(
            "user_id", F.col("amount").alias("a_amount")
        ).write.parquet(d + "/plain_a")
        generate_tx_events(spark, rows, seed=99).select(
            "user_id", F.col("amount").alias("b_amount")
        ).write.parquet(d + "/plain_b")
        a = spark.read.parquet(d + "/plain_a")
        b = spark.read.parquet(d + "/plain_b")

        def join_agg(x, y):
            return (
                x.join(y, "user_id")
                .groupBy(F.pmod(F.col("user_id"), F.lit(10)).alias("g"))
                .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("a_amount"), 2))
                .collect()
            )

        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            t0 = time.perf_counter()
            _, m_plain = pm.measure(lambda: join_agg(a, b))
            out["plain_join"] = {**m_plain, "wall_s": round(time.perf_counter() - t0, 2)}

            t0 = time.perf_counter()
            _, m_layout = pm.measure(lambda: [
                a.write.bucketBy(_BUCKETS, "user_id").sortBy("user_id")
                .option("path", d + "/ba").saveAsTable("probe_ba"),
                b.write.bucketBy(_BUCKETS, "user_id").sortBy("user_id")
                .option("path", d + "/bb").saveAsTable("probe_bb"),
            ])
            out["bucketed_layout_write"] = {
                **m_layout, "wall_s": round(time.perf_counter() - t0, 2)
            }

            ba, bb = spark.table("probe_ba"), spark.table("probe_bb")
            t0 = time.perf_counter()
            _, m_bucketed = pm.measure(lambda: join_agg(ba, bb))
            out["bucketed_join"] = {
                **m_bucketed, "wall_s": round(time.perf_counter() - t0, 2)
            }
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            spark.sql("DROP TABLE IF EXISTS probe_ba")
            spark.sql("DROP TABLE IF EXISTS probe_bb")

        out["join_shuffle_eliminated_pct"] = round(
            100.0
            * (1 - out["bucketed_join"]["shuffle_read_mb"]
               / max(out["plain_join"]["shuffle_read_mb"], 0.01)),
            1,
        )
        print(json.dumps(out))
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
