"""Scale probe for the embedding-cosine dedup banding: measured recall
on a 50k-vector corpus with planted near-duplicates.

`dedup_embedding_cosine` derives a ~4e-7 per-pair miss probability for
its 48-table × 3-bit hyperplane banding; this probe MEASURES it the
way `dedup_scale_probe.py` does for MinHash: plant 1000 near-dup pairs
(cos ≈ 0.93) among 50k random unit vectors, run the banding candidate
generation + exact verification, and report recall, spurious pairs
above threshold, candidate volume, and wall time.

    python scripts/embedding_dedup_probe.py [N_VECS] [N_PLANTED]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pyspark.sql import functions as F

from iceberg_catalog_bench_spark.functions import (
    cosine_similarity,
    lsh_band_buckets_arrow,
)
from iceberg_catalog_bench_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    n_planted = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
    dim = 64
    rng = np.random.default_rng(11)
    base = rng.normal(size=(n, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, base[i].tolist()) for i in range(n)]
    planted = set()
    for j in range(n_planted):
        v = base[j] + rng.normal(scale=0.05, size=dim)  # cos ~ 0.93
        v /= np.linalg.norm(v)
        rows.append((n + j, v.tolist()))
        planted.add((j, n + j))

    spark = get_spark(app_name="embedding-dedup-probe")
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>").cache()
    emb.count()

    # Banding width is the scale knob: at n vectors, bits ~ log2(n /
    # bucket_target) keeps buckets small; the registered query uses
    # 3 bits because the synthetic corpus is ~1k vectors with a 0.43
    # similarity floor — at 50k near-dup scale, 16 bits x 48 tables
    # gives recall ~1 at cos 0.93 with a ~7e-4 candidate fraction.
    bits, tables = 16, 48
    t0 = time.perf_counter()
    banded = emb.withColumn(
        "buckets", lsh_band_buckets_arrow("embedding", tables, bits)
    ).select("vec_id", F.posexplode("buckets").alias("t", "bucket"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    ea = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("e1"))
    eb = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("e2"))
    verified = (
        cand.join(ea, "vec_a").join(eb, "vec_b")
        .withColumn("cos_sim", cosine_similarity("e1", "e2"))
        .filter(F.col("cos_sim") >= 0.85)
        .select("vec_a", "vec_b")
    )
    found = {(r["vec_a"], r["vec_b"]) for r in verified.collect()}
    dt = time.perf_counter() - t0
    n_cand = cand.count()

    hit = planted & found
    spurious = found - planted
    total_pairs = (n + n_planted) * (n + n_planted - 1) // 2
    print(f"vectors: {n + n_planted}, planted near-dup pairs: {n_planted}")
    print(f"recall: {len(hit) / n_planted:.4f} ({len(hit)}/{n_planted} found)")
    print(f"spurious >=0.85 pairs: {len(spurious)}")
    print(f"candidate pairs: {n_cand} ({n_cand / total_pairs:.2e} of "
          f"{total_pairs} possible)")
    print(f"wall: {dt:.1f}s", flush=True)


if __name__ == "__main__":
    main()
