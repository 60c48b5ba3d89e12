"""Probe: incremental SemDeDup per-ingest cost vs corpus size.

The dedup_semantic_incremental claim under test: one ingest costs
O(batch×K) assignment + a store scan/shuffle/pair term bounded by the
batch's CLUSTER FOOTPRINT (Σ over touched clusters of |store_cid|) —
not by corpus size. Two regimes, both measured:

* ``--footprint`` (the production regime: K in the hundreds of
  thousands, a batch touches a tiny cluster subset): a fixed-size
  batch confined to 16 clusters ingests against corpora of growing
  size with K scaled to hold n/K constant — the pruned store scan
  reads the SAME ~16×(n/K) rows at every corpus size, so ingest time
  must stay flat. This is what the manifest-pruning pin in
  tests/test_round11.py guarantees file-wise.
* default (worst case: batch touches every cluster): the scan term
  degrades to one full store pass — corpus-bound I/O, flat pair
  work. Measured here so the docstring's accounting stays honest
  (19.0s → 43.2s for 200k → 800k corpus at 10k batch, recorded in
  BASELINE.md).

The corpus is assigned ONCE at store build (untimed, like the MinHash
incremental probe's signature store); the timed section is exactly
one ingest.

Usage: python scripts/semdedup_incremental_probe.py [corpus1,corpus2,...] [batch]
       python scripts/semdedup_incremental_probe.py --footprint [corpus1,...] [batch]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from iceberg_catalog_bench_spark.catalog import LakeTable
from iceberg_catalog_bench_spark.functions import dot_product
from iceberg_catalog_bench_spark.operators.dedup import (
    _semdedup_assign_arrow,
    _unit_rows,
    semdedup_centroids,
)
from iceberg_catalog_bench_spark.session import get_spark

DIM = 16
CLUSTER_SIZE = 1000  # target n/K
TAU = 0.9


def main() -> None:
    args = sys.argv[1:]
    footprint = args and args[0] == "--footprint"
    if footprint:
        args = args[1:]
    sizes = [int(x) for x in (args[0].split(",") if args
                              else ["200000", "800000"])]
    batch_n = int(args[1]) if len(args) > 1 else (2_000 if footprint
                                                  else 10_000)
    pool_n = 100_000 if footprint else batch_n
    spark = get_spark(app_name="semdedup-incr-probe")
    for n in sizes:
        k = max(8, n // CLUSTER_SIZE)
        emb = spark.range(n + pool_n).select(
            F.col("id").alias("vec_id"),
            F.array(*[F.rand(seed=i) for i in range(DIM)]).alias("embedding"),
        ).cache()
        emb.count()
        cents = semdedup_centroids(spark, emb, k, method="first")
        unit = _unit_rows(emb, "embedding")
        ass = unit.join(_semdedup_assign_arrow(emb, cents), "vec_id").cache()
        d = tempfile.mkdtemp(prefix="semstore-probe-")
        store = LakeTable.create(
            spark, d + "/sem",
            "vec_id bigint, cid bigint, embedding array<double>",
            partition_by=["cid"],
        )
        store.append(ass.filter(F.col("vec_id") < n)
                     .select("vec_id", "cid", "embedding"))
        batch = ass.filter(F.col("vec_id") >= n).select(
            "vec_id", "cid", "embedding")
        if footprint:
            # the production regime: the arriving batch lands in a
            # FIXED 16-cluster footprint at every corpus size
            batch = batch.filter(F.col("cid") < 16).limit(batch_n)
        batch = batch.cache()
        batch.count()

        t0 = time.perf_counter()
        touched = sorted(r["cid"] for r in
                         batch.select("cid").distinct().collect())
        corpus = store.scan(
            "cid IN (" + ", ".join(str(c) for c in touched) + ")")
        x = corpus.select("cid", F.col("vec_id").alias("m"),
                          F.col("embedding").alias("vm"))
        b = batch.select("cid", F.col("vec_id").alias("b"),
                         F.col("embedding").alias("vb"))
        pairs = x.join(b, "cid").withColumn("s", dot_product("vm", "vb"))
        dropped = (pairs.filter(F.col("s") >= TAU)
                   .select("b").distinct().count())
        t_ingest = time.perf_counter() - t0
        print(f"corpus={n:>9,} K={k:>5} batch={batch_n:,}  "
              f"ingest {t_ingest:6.1f}s  "
              f"({t_ingest / batch_n * 1e6:.0f}µs/batch-row)  "
              f"touched={len(touched)} dropped={dropped}")
        ass.unpersist(); batch.unpersist(); emb.unpersist()
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
