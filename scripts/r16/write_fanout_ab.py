"""A/B the fanout-write repartition width (VERDICT r15 item 1).

The disputed change (catalog/table.py::_write_files, r15): the
fanout write's repartition-by-transform-values now passes
spark.sql.shuffle.partitions explicitly so AQE's byte-based
coalescing can't serialize the 480-file partitionBy writer. r14's
clean bench read write_append_scale at 3.5 s WITHOUT the pin; r15's
steal-soaked records read 5.1-8.5 s WITH it. This probe isolates
exactly the disputed exchange+write (datagen -> transform cols ->
[pinned | AQE-auto] repartition -> partitionBy parquet write),
alternating arms A/B/A/B so host drift hits both sides.

Arms:
  pinned : repartition(shuffle.partitions, cols)   (current code)
  auto   : repartition(cols)                        (pre-r15)
"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def jiffies():
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    return v[0] + v[1] + v[2], v[7]


def steal(a, b):
    t = (b[0] - a[0]) + (b[1] - a[1])
    return round(100.0 * (b[1] - a[1]) / t, 1) if t else 0.0


def main():
    from iceberg_catalog_bench_spark.catalog.transforms import (
        parse_spec, transform_expr)
    from iceberg_catalog_bench_spark.session import get_spark
    from iceberg_catalog_bench_spark.sources.datagen import generate_tx_events

    spark = get_spark(app_name="write-fanout-ab")
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    rows = int(os.environ.get("AB_ROWS", "10000000"))
    spec = parse_spec(["days(ts)", "bucket(16, user_id)"])
    type_of = {"ts": "timestamp", "user_id": "bigint"}

    def staged():
        if os.environ.get("AB_EVENTS"):
            from iceberg_catalog_bench_spark.sources import load_table
            df = load_table(spark, "events",
                            os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
        else:
            df = generate_tx_events(spark, rows)
        pcols = []
        for t in spec:
            name = f"_p_{t.name}_{t.column}"
            df = df.withColumn(
                name, transform_expr(t, type_of.get(t.column)).cast("string"))
            pcols.append(name)
        return df, pcols

    def run(arm: str) -> dict:
        df, pcols = staged()
        if arm == "pinned":
            df = df.repartition(width, *[F.col(c) for c in pcols])
        else:
            df = df.repartition(*[F.col(c) for c in pcols])
        d = tempfile.mkdtemp(prefix=f"fanout-{arm}-")
        j0 = jiffies()
        t0 = time.perf_counter()
        df.write.mode("overwrite").partitionBy(*pcols).parquet(d)
        sec = round(time.perf_counter() - t0, 3)
        n_files = sum(len([f for f in fs if f.endswith(".parquet")])
                      for _, _, fs in os.walk(d))
        shutil.rmtree(d, ignore_errors=True)
        return {"arm": arm, "sec": sec, "steal_pct": steal(j0, jiffies()),
                "files": n_files}

    run("pinned")  # warm-up, discarded
    for _ in range(3):
        for arm in ("pinned", "auto"):
            print(json.dumps(run(arm)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
