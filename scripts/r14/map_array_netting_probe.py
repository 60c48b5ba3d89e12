"""r14 probe: cow-changelog netting cost with MAP and ARRAY columns
vs the same data as flat columns — the price of the canonical entry
rendering (map: lexsort + length-prefixed join; array: in-order join)
plus the raw-passthrough/rowref rebuild, at 1M rows, single CoW
commit touching 1%, cdc-cow-buckets=4. Mirrors the r13 struct probe
(scripts/r13/struct_netting_probe.py)."""
import json, sys, time
sys.path.insert(0, "/root/repo")
import tempfile
from iceberg_catalog_bench_spark.session import get_spark
from iceberg_catalog_bench_spark.catalog.table import LakeTable
from iceberg_catalog_bench_spark.streaming.table_source import register_source
from pyspark.sql import functions as F

spark = get_spark(app_name="map-netting-probe")
register_source(spark)
N = 1_000_000
out = {}

def steal():
    v = [int(x) for x in open('/proc/stat').readline().split()[1:]]
    return v[0] + v[1] + v[2], v[7]

for shape in ("map", "array", "flat", "map2", "array2", "flat2"):
    d = tempfile.mkdtemp(prefix=f"netting-{shape}-")
    if shape.startswith("flat"):
        ddl = "k bigint, a bigint, b bigint"
        df = spark.range(N).select(
            F.col("id").alias("k"),
            (F.col("id") * 7 % 1000).alias("a"),
            (F.col("id") % 50).alias("b"))
        upd = {"a": "a + 1"}
    elif shape.startswith("map"):
        ddl = "k bigint, tags map<string,bigint>"
        df = spark.range(N).select(
            F.col("id").alias("k"),
            F.create_map(
                F.lit("a"), F.col("id") * 7 % 1000,
                F.lit("b"), F.col("id") % 50).alias("tags"))
        upd = {"tags": "map('a', element_at(tags,'a') + 1, "
                       "'b', element_at(tags,'b'))"}
    else:
        ddl = "k bigint, sig array<bigint>"
        df = spark.range(N).select(
            F.col("id").alias("k"),
            F.array(F.col("id") * 7 % 1000, F.col("id") % 50).alias("sig"))
        upd = {"sig": "array(element_at(sig,1) + 1, element_at(sig,2))"}
    t = LakeTable.create(spark, d + "/t", ddl)
    t.append(df.repartition(8))
    t.update(upd, "k % 100 = 0")  # CoW rewrite touching 1% of rows
    b0, s0 = steal()
    t0 = time.perf_counter()
    q = (spark.readStream.format("laketable").option("path", t.path)
         .option("mode", "cdc").option("cow-changelog", "true")
         .option("cdc-cow-buckets", "4").load()
         .writeStream.format("parquet").option("path", d + "/sink")
         .trigger(availableNow=True)
         .option("checkpointLocation", d + "/ck").start())
    q.awaitTermination(600)
    dt = time.perf_counter() - t0
    b1, s1 = steal()
    cnt = (spark.read.parquet(d + "/sink")
           .filter("_commit_snapshot_id = 2").count())
    out[shape] = {"rows_changed": cnt, "net_sec": round(dt, 2),
                  "steal_pct": round(100*(s1-s0)/max(1,(b1-b0)+(s1-s0)),1)}
print(json.dumps(out))
