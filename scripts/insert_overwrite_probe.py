"""INSERT OVERWRITE scale probe: dynamic ReplacePartitions cost must
scale with the CHANGED partition set, not with the table.

The hazard being measured: a backfill that re-runs one partition must
not touch — or even enumerate-and-rewrite — the other partitions. The
probe builds tables with an increasing number of untouched partitions,
overwrites exactly ONE, and reports wall time plus the commit summary's
replaced-data-files count. Flat time across table sizes = the claim
holds; time growing with table partitions = the replacement set is
being computed by reads, not manifest values.

    python scripts/insert_overwrite_probe.py [PARTITION_COUNTS...]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [50, 200, 800]

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from iceberg_catalog_bench_spark.catalog import LakeTable

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )

    for n_parts in sizes:
        d = tempfile.mkdtemp(prefix="iow-probe-")
        t = LakeTable.create(
            spark, os.path.join(d, "t"), "k bigint, cat string, v double",
            partition_by=["identity(cat)"],
        )
        base = spark.range(n_parts * 20).select(
            F.col("id").alias("k"),
            F.concat(F.lit("p"), (F.col("id") % n_parts)).alias("cat"),
            (F.col("id") * 1.5).alias("v"),
        )
        t.append(base)
        n_files = len(t._snapshot().files)

        incoming = spark.range(20).select(
            (F.col("id") + 10_000_000).alias("k"),
            F.lit("p0").alias("cat"),
            F.lit(9.9).alias("v"),
        )
        t0 = time.perf_counter()
        snap = t.overwrite_partitions(incoming)
        dt = time.perf_counter() - t0
        print(
            f"partitions={n_parts:5d} table_files={n_files:5d} "
            f"overwrite_one={dt:6.2f}s "
            f"replaced_files={snap.summary['replaced-data-files']} "
            f"replaced_partitions={snap.summary['replaced-partitions']}"
        )


if __name__ == "__main__":
    main()
