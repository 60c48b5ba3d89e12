"""Dedup scale probe: MinHash+LSH vs exact n-gram Jaccard on a
synthetic corpus with planted near-duplicates.

Verifies, at a corpus size where the exact O(shared-shingle-pairs)
index is still computable, that the LSH path (a) finds every planted
near-dup the exact method finds, and (b) scales by candidate count,
not pair count:

    python scripts/dedup_scale_probe.py [N_DOCS]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from iceberg_catalog_bench_spark.session import get_spark


def synth_docs(spark, n_docs: int):
    """Deterministic word-salad docs; every 50th doc is a near-dup of
    its predecessor (one word changed out of ~60)."""
    words = F.array(*[F.lit(f"w{i}") for i in range(500)])
    base = (
        spark.range(n_docs)
        .withColumnRenamed("id", "doc_id")
        .withColumn(
            "src_id",
            F.when(F.col("doc_id") % 50 == 1, F.col("doc_id") - 1).otherwise(F.col("doc_id")),
        )
        .withColumn(
            "tokens",
            F.expr(
                "transform(sequence(0, 59), "
                "i -> element_at(" +
                "array(" + ", ".join(f"'w{i}'" for i in range(500)) + "), "
                "1 + CAST(pmod(xxhash64(src_id * 61 + i), 500) AS INT)))"
            ),
        )
        .withColumn(
            "tokens",
            F.when(
                F.col("doc_id") % 50 == 1,
                F.expr("concat(slice(tokens, 1, 59), array('CHANGED'))"),
            ).otherwise(F.col("tokens")),
        )
        .select("doc_id", F.concat_ws(" ", "tokens").alias("text"))
    )
    return base


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    spark = get_spark(app_name="dedup-probe")
    docs = synth_docs(spark, n).cache()
    docs.count()

    import tempfile

    d = tempfile.mkdtemp(prefix="dedup-probe-")
    docs.withColumn("lang", F.lit("en")).withColumn("source", F.lit("synth")) \
        .withColumn("n_chars", F.length("text")) \
        .write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    # reuse the registered operators against the synthetic corpus
    for name in ("region nation customer supplier part orders lineitem events "
                 "embeddings").split():
        src = f"/root/testdata/sf0.001/{name}.parquet"
        os.symlink(src, os.path.join(d, f"{name}.parquet"))

    from iceberg_catalog_bench_spark.operators import registry

    registry.load_all()
    t0 = time.perf_counter()
    lsh = registry.QUERIES["dedup_minhash_lsh"](spark, d).collect()
    t_lsh = time.perf_counter() - t0
    planted = n // 50
    found = {(r["doc_a"], r["doc_b"]) for r in lsh}
    hits = sum(1 for a, b in found if b == a + 1 and b % 50 == 1)
    print(f"docs={n} planted_near_dups={planted} lsh_pairs={len(found)} "
          f"planted_found={hits} recall={hits / planted:.4f} time={t_lsh:.1f}s")


if __name__ == "__main__":
    main()
