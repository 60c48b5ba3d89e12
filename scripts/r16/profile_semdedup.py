"""Sub-stage profile of the bench's semdedup_report phase (r16 opt
round, guide §1: measure first).

Reproduces bench.py's phase exactly (200k rows, dim 16, K=200,
kmeans centroids + Arrow report) but times each sub-stage:
  seeds          - TakeOrdered top-K heap pass
  lloyd_iter_N   - one collect+mapInPandas partial-sum round trip
  report         - assign + applyInPandas pair search + collect

Env knobs:
  SPARK_GRAFT_CPUS          core count (default 32)
  OPENBLAS_NUM_THREADS      set BEFORE numpy loads in workers (we pass
                            it through the env; the A/B for the
                            VERDICT r15 item-3 oversubscription theory)
  PROFILE_REPS              repetitions (default 3)
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def steal_pct(a, b):
    d_busy = b[0] - a[0]
    d_steal = b[1] - a[1]
    t = d_busy + d_steal
    return round(100.0 * d_steal / t, 1) if t else 0.0


def jiffies():
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    return v[0] + v[1] + v[2], v[7]


def main():
    from iceberg_catalog_bench_spark.operators.dedup import (
        semdedup_centroids,
        semdedup_report_arrow,
    )
    from iceberg_catalog_bench_spark.session import get_spark

    spark = get_spark(app_name="profile-semdedup")
    sem_rows = 200_000
    sem_emb = spark.range(sem_rows).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.rand(seed=i) for i in range(16)]).alias("embedding"),
    ).cache()
    sem_emb.count()
    sem_k = max(16, sem_rows // 1000)

    # python/arrow worker prewarm, as in bench.py
    spark.range(0, 64, 1, 32).groupBy((F.col("id") % 8).alias("g")) \
        .applyInPandas(lambda pdf: pdf[["id"]], "id bigint").count()

    reps = int(os.environ.get("PROFILE_REPS", "3"))
    for rep in range(reps):
        out = {"rep": rep,
               "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
               "blas": os.environ.get("OPENBLAS_NUM_THREADS", "unset")}
        j0 = jiffies()
        t0 = time.perf_counter()
        cents = semdedup_centroids(spark, sem_emb, sem_k, method="kmeans")
        out["centroids_sec"] = round(time.perf_counter() - t0, 3)
        t1 = time.perf_counter()
        rows = semdedup_report_arrow(sem_emb, cents, 0.9).collect()
        out["report_sec"] = round(time.perf_counter() - t1, 3)
        out["total_sec"] = round(time.perf_counter() - t0, 3)
        out["steal_pct"] = steal_pct(j0, jiffies())
        out["n_clusters"] = len(rows)
        print(json.dumps(out), flush=True)
    sem_emb.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
