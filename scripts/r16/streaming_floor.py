"""Where do streaming_source_drain / streaming_sink_pipe spend their
~3 s? Replicates the bench phases and dumps each micro-batch's
durationMs breakdown from StreamingQueryProgress (guide §1: measure
before touching).
"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def main():
    from iceberg_catalog_bench_spark.catalog import LakeTable
    from iceberg_catalog_bench_spark.session import get_spark
    from iceberg_catalog_bench_spark.sources import load_table
    from iceberg_catalog_bench_spark.streaming.table_source import (
        register_source,
    )

    spark = get_spark(app_name="streaming-floor")
    register_source(spark)
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ssdir = tempfile.mkdtemp(prefix="stream-floor-")
    sst = LakeTable.create(
        spark, os.path.join(ssdir, "t"),
        "event_id bigint, user_id bigint, value double",
    )
    ev_slim = load_table(spark, "events", sf).select(
        "event_id", "user_id", "value")
    for i in range(4):
        sst.append(ev_slim.filter(F.col("user_id") % 4 == i))

    # warm pipe exactly as bench.py does
    warm = LakeTable.create(spark, os.path.join(ssdir, "warm"),
                            "event_id bigint, user_id bigint, value double")
    warm.append(ev_slim.limit(10))
    warm_dst = LakeTable.create(spark, os.path.join(ssdir, "warm_dst"),
                                "event_id bigint, user_id bigint, value double")
    wq = (spark.readStream.format("laketable").option("path", warm.path).load()
          .writeStream.format("laketable").option("path", warm_dst.path)
          .trigger(availableNow=True)
          .option("checkpointLocation", os.path.join(ssdir, "warm_ck")).start())
    wq.awaitTermination(300)

    def drain(fmt, dst, tag, rep):
        ck = os.path.join(ssdir, f"ck-{tag}-{rep}")
        t0 = time.perf_counter()
        w = (spark.readStream.format("laketable").option("path", sst.path)
             .load().writeStream.format(fmt))
        if fmt == "parquet":
            w = w.option("path", dst + f"-{rep}")
        else:
            w = w.option("path", dst)
        q = (w.trigger(availableNow=True)
             .option("checkpointLocation", ck).start())
        q.awaitTermination(600)
        wall = round(time.perf_counter() - t0, 3)
        prog = [json.loads(p.json) for p in q.recentProgress]
        out = {"tag": tag, "rep": rep, "wall": wall,
               "batches": [
                   {"batchId": p.get("batchId"),
                    "rows": p.get("numInputRows"),
                    "durationMs": p.get("durationMs")}
                   for p in prog]}
        print(json.dumps(out), flush=True)

    for rep in range(3):
        drain("parquet", os.path.join(ssdir, "sink"), "source_drain", rep)
    dst = LakeTable.create(spark, os.path.join(ssdir, "dst"),
                           "event_id bigint, user_id bigint, value double")
    for rep in range(3):
        drain("laketable", dst.path, "sink_pipe", rep)
    shutil.rmtree(ssdir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
