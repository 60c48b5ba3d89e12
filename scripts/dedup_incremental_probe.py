"""Incremental-dedup scale probe: stored-signature ingest vs full
recompute on the synthetic planted-near-dup corpus.

Measures the claim behind ``dedup_incremental_minhash``: with the
corpus's LSH bucket rows persisted in a bucket-partitioned LakeTable,
ingesting a new batch costs O(batch) — signature compute for the
batch only plus a bucket join against the store — while the naive
path re-hashes the whole corpus every time. Also checks equivalence:
the incremental output must equal the full recompute's output
restricted to pairs touching the batch.

    python scripts/dedup_incremental_probe.py [N_DOCS]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from iceberg_catalog_bench_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    spark = get_spark(app_name="dedup-incr-probe")

    from scripts.dedup_scale_probe import synth_docs

    docs = synth_docs(spark, n).cache()
    docs.count()

    d = tempfile.mkdtemp(prefix="dedup-incr-probe-")
    docs.withColumn("lang", F.lit("en")).withColumn("source", F.lit("synth")) \
        .withColumn("n_chars", F.length("text")) \
        .write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    for name in ("region nation customer supplier part orders lineitem events "
                 "embeddings").split():
        os.symlink(f"/root/testdata/sf0.001/{name}.parquet",
                   os.path.join(d, f"{name}.parquet"))

    from iceberg_catalog_bench_spark.catalog import LakeTable
    from iceberg_catalog_bench_spark.operators import registry
    from iceberg_catalog_bench_spark.operators.dedup import (
        _band_rows,
        _doc_shingles,
    )

    registry.load_all()
    batch_cond = F.col("doc_id") % 10 == 7
    sh_all = _doc_shingles(spark, d).cache()
    sh_all.count()

    # one-time store build (amortized across every future ingest)
    t0 = time.perf_counter()
    store = LakeTable.create(
        spark, os.path.join(d, "sigstore"),
        "doc_id bigint, band int, key bigint",
        partition_by=["bucket(8, key)"],
    )
    store.append(_band_rows(sh_all.filter(~batch_cond)))
    t_store = time.perf_counter() - t0

    # the per-ingest cost: batch hashing + store join + exact verify
    t0 = time.perf_counter()
    incr = registry.QUERIES["dedup_incremental_minhash"](spark, d)
    got = {(r["doc_a"], r["doc_b"]) for r in incr.collect()}
    t_ingest_total = time.perf_counter() - t0  # incl. its own store build

    # full recompute (the path incremental replaces)
    t0 = time.perf_counter()
    full = registry.QUERIES["dedup_minhash_lsh"](spark, d).collect()
    t_full = time.perf_counter() - t0
    want = {
        (r["doc_a"], r["doc_b"]) for r in full
        if r["doc_a"] % 10 == 7 or r["doc_b"] % 10 == 7
    }

    batch_n = docs.filter(batch_cond).count()
    print(
        f"docs={n} batch={batch_n} store_build={t_store:.1f}s "
        f"ingest_incl_store={t_ingest_total:.1f}s full_recompute={t_full:.1f}s "
        f"incr_pairs={len(got)} full_batch_pairs={len(want)} "
        f"equivalent={got == want}"
    )


if __name__ == "__main__":
    main()
