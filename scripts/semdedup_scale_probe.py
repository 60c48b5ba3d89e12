"""Probe: SemDeDup at ~1M vectors with production (k-means) centroids.

VERDICT r10 item 5: the driver row runs SemDeDup at oracle scale with
deterministic first-K centroids; this probe measures the SAME report
stages (map-side assignment → one shuffle on cluster id → per-cluster
pair search) behind the production centroid source
(`semdedup_centroids(..., method="kmeans")`) at two corpus sizes with
K scaled to hold the mean cluster size n/K constant (~1000):

* assignment cost is n×K broadcast-crossJoin similarity — it grows
  with K, which is why production IVF-assigns against a centroid tree
  once K outgrows the broadcast budget (the report stages would not
  change);
* pair-search cost is Σ per-cluster (n/K)² ≈ n·(n/K) — holding n/K
  constant keeps the PER-ROW pair cost flat, which is the probe's
  claim to verify.

Usage: python scripts/semdedup_scale_probe.py [n1,n2,...] [impls]
       impls: comma list of sql,arrow (default both) — `arrow` is the
       BLAS twin (matmul assignment + per-cluster matmul pair search);
       `sql` is the oracle-exact interpreted-HOF path the driver row
       uses.

       python scripts/semdedup_scale_probe.py --assign-sweep [n] [Ks]
       times ONLY the assignment leg, flat matmul vs two-level IVF
       (`_semdedup_assign_ivf_arrow`), across a K sweep at fixed n —
       the leg BASELINE.md flags as the one that grows with K — plus
       flat↔IVF agreement (uniform corpus = IVF's worst case).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from iceberg_catalog_bench_spark.operators.dedup import (
    semdedup_centroids, semdedup_report, semdedup_report_arrow,
)
from iceberg_catalog_bench_spark.session import get_spark

DIM = 16
CLUSTER_SIZE = 1000  # target n/K
TAU = 0.9


def _rand_emb(spark, n: int):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.rand(seed=i) for i in range(DIM)]).alias("embedding"),
    ).cache()


def assign_sweep() -> None:
    from iceberg_catalog_bench_spark.operators.dedup import (
        _semdedup_assign_arrow, _semdedup_assign_ivf_arrow,
        semdedup_centroids,
    )

    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    ks = [int(x) for x in (sys.argv[3].split(",") if len(sys.argv) > 3
                           else ["1024", "4096", "16384"])]
    from iceberg_catalog_bench_spark.operators.dedup import _IVF_ASSIGN_MIN_K

    spark = get_spark(app_name="semdedup-assign-sweep")
    emb = _rand_emb(spark, n)
    emb.count()
    for k in ks:
        if k < _IVF_ASSIGN_MIN_K:
            print(f"n={n:>9,} K={k:>6}  SKIPPED: below the IVF gate "
                  f"(K < {_IVF_ASSIGN_MIN_K}) — the 'ivf' column would "
                  f"silently time the flat fallback")
            continue
        cents = semdedup_centroids(spark, emb, k, method="first")
        t0 = time.perf_counter()
        flat = dict(_semdedup_assign_arrow(emb, cents)
                    .toPandas().itertuples(index=False))
        t_flat = time.perf_counter() - t0
        t0 = time.perf_counter()
        ivf = dict(_semdedup_assign_ivf_arrow(emb, cents)
                   .toPandas().itertuples(index=False))
        t_ivf = time.perf_counter() - t0
        agree = sum(flat[i] == ivf[i] for i in flat) / len(flat)
        print(f"n={n:>9,} K={k:>6}  flat {t_flat:6.1f}s  "
              f"ivf {t_ivf:6.1f}s  ({t_flat / t_ivf:4.1f}x)  "
              f"agree={agree:.4f}")
    emb.unpersist()


def main() -> None:
    sizes = [int(x) for x in (sys.argv[1].split(",") if len(sys.argv) > 1
                              else ["250000", "1000000"])]
    impls = (sys.argv[2].split(",") if len(sys.argv) > 2
             else ["sql", "arrow"])
    report_fn = {"sql": semdedup_report, "arrow": semdedup_report_arrow}
    spark = get_spark(app_name="semdedup-scale-probe")
    for n in sizes:
        k = max(8, n // CLUSTER_SIZE)
        emb = spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.array(*[F.rand(seed=i) for i in range(DIM)]).alias("embedding"),
        ).cache()
        emb.count()
        t0 = time.perf_counter()
        cents = semdedup_centroids(spark, emb, k, method="kmeans", iters=1)
        t_train = time.perf_counter() - t0
        for impl in impls:
            t0 = time.perf_counter()
            rows = report_fn[impl](emb, cents, TAU).collect()
            t_report = time.perf_counter() - t0
            covered = sum(r["n_vectors"] for r in rows)
            biggest = max(r["n_vectors"] for r in rows)
            print(f"n={n:>9,} K={k:>5} {impl:>5}  "
                  f"train(1 Lloyd) {t_train:6.1f}s  "
                  f"assign+pairs {t_report:6.1f}s  "
                  f"({t_report / n * 1e6:.1f}µs/row)  clusters={len(rows)} "
                  f"covered={covered} max_cluster={biggest}")
        emb.unpersist()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--assign-sweep":
        assign_sweep()
    else:
        main()
