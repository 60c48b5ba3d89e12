"""Round-15 probe: the SemDeDup spine restructure (A/B).

r15 removes the two vec_id shuffle-joins (assignment now CARRIES the
unit vectors through the same Arrow pass, ``carry_vec``) and turns the
Lloyd mean into map-side per-centroid partial sums (reduce input
K x partitions rows, independent of corpus size — previously a
join-back + posexplode shuffled n*d values per iteration). This probe
times centroids+report at the bench shape (n=200k, d=16, K=200) on
the CURRENT code; the r14 numbers for the same shape are the A side,
recorded in BASELINE.md round-15 section.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from iceberg_catalog_bench_spark.operators.dedup import (
        semdedup_centroids,
        semdedup_report_arrow,
    )

    n = 200_000
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.rand(seed=i) for i in range(16)]).alias("embedding"),
    ).cache()
    emb.count()
    for tag in ("cold", "warm"):
        t0 = time.perf_counter()
        cents = semdedup_centroids(spark, emb, max(16, n // 1000),
                                   method="kmeans")
        t1 = time.perf_counter()
        rows = semdedup_report_arrow(emb, cents, 0.9).collect()
        t2 = time.perf_counter()
        assert sum(r["n_vectors"] for r in rows) == n
        print(f"{tag}: centroids {t1 - t0:.2f}s  report {t2 - t1:.2f}s"
              f"  total {t2 - t0:.2f}s")


if __name__ == "__main__":
    main()
