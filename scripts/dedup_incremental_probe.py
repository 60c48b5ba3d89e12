"""Incremental-dedup scale probe: stored-signature ingest vs full
recompute on the synthetic planted-near-dup corpus.

Measures the claim behind ``dedup_incremental_minhash``: with the
corpus's LSH bucket rows persisted in a bucket-partitioned LakeTable,
ingesting a new batch costs O(batch) — signature compute for the
batch only, a bucket join against the store, and candidate-bounded
exact verification — while the naive path re-hashes the whole corpus
every time. The batch is every 50th doc (each one a planted near-dup
of a CORPUS doc), so every planted pair crosses the corpus/batch
boundary and recall is measured end-to-end.

    python scripts/dedup_incremental_probe.py [N_DOCS] [STRIDE]

STRIDE thins the batch: batch = doc_id %% (50*STRIDE) == 1 (still all
planted near-dups of corpus docs), so the corpus can grow while the
batch stays fixed — the regime incremental dedup exists for.
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
    stride = int(sys.argv[2]) if len(sys.argv) > 2 else 1
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
        minhash_ingest,
    )
    from iceberg_catalog_bench_spark.sources import load_table

    registry.load_all()
    # every doc_id % 50 == 1 is a planted near-dup of doc_id-1; the
    # stride keeps each batch doc a planted dup (50*stride % 50 == 0)
    mod = 50 * stride
    batch_cond = F.col("doc_id") % mod == 1
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

    # the per-ingest cost: batch hashing (shingles computed from the
    # BATCH docs only — not a filter over a corpus-wide explode) +
    # store join + candidate-bounded verify
    from iceberg_catalog_bench_spark.operators.dedup import _SHINGLES_EXPR

    t0 = time.perf_counter()
    batch_banded = _band_rows(
        docs.filter(batch_cond)
        .select("doc_id", F.explode(F.expr(_SHINGLES_EXPR)).alias("shingle"))
    )
    got = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_ingest(
            load_table(spark, "documents", d), batch_banded, store.read()
        ).collect()
    }
    t_ingest = time.perf_counter() - t0

    # full recompute (the path incremental replaces)
    t0 = time.perf_counter()
    full = registry.QUERIES["dedup_minhash_lsh"](spark, d).collect()
    t_full = time.perf_counter() - t0
    want = {
        (r["doc_a"], r["doc_b"]) for r in full
        if r["doc_a"] % mod == 1 or r["doc_b"] % mod == 1
    }

    planted = n // mod
    hits = sum(1 for a, b in got if b == a + 1 and b % mod == 1)
    print(
        f"docs={n} batch={n // mod} planted={planted} "
        f"store_build={t_store:.1f}s ingest={t_ingest:.1f}s "
        f"full_recompute={t_full:.1f}s speedup={t_full / t_ingest:.1f}x "
        f"incr_pairs={len(got)} recall={hits / planted:.4f} "
        f"equivalent={got == want}"
    )


if __name__ == "__main__":
    main()
