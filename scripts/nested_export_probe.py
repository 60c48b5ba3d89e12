"""Probe: nested-type Iceberg export/adopt cost is METADATA-bound.

Round-12 claim to verify (BASELINE.md): exporting an embedding-store
table (array<double> columns — the shape the repo's own dedup/ANN
operators persist) and adopting it back costs manifests, not data:
wall time scales with FILE/SNAPSHOT COUNT, not row count, and the
nested-id allocator adds only a constant per-export file write.

Two sweeps at fixed file count:
  rows ∈ {100k, 400k, 1.6M} × same 8-file layout  → flat export/adopt
  files ∈ {8, 32, 128} at fixed 400k rows         → linear-ish in files

Usage: python scripts/nested_export_probe.py
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
from iceberg_catalog_bench_spark.catalog.iceberg_export import (
    adopt_iceberg_metadata,
    read_via_iceberg_metadata,
    to_iceberg_metadata,
)
from iceberg_catalog_bench_spark.session import get_spark

DIM = 16


def build(spark, path: str, rows: int, files: int) -> LakeTable:
    t = LakeTable.create(
        spark, path,
        "vec_id bigint, embedding array<double>, "
        "meta struct<lang:string,n:int>")
    df = spark.range(rows).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.rand(seed=i) for i in range(DIM)]).alias("embedding"),
        F.struct(F.lit("en").alias("lang"),
                 (F.col("id") % 100).cast("int").alias("n")).alias("meta"),
    ).repartition(files)
    t.append(df)
    t.analyze()  # puffin statistics ride along
    return t


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, time.perf_counter() - t0


def main() -> None:
    spark = get_spark(app_name="nested-export-probe")
    root = tempfile.mkdtemp(prefix="nested-probe-")
    try:
        print(f"{'rows':>9} {'files':>5} {'export_s':>9} {'adopt_s':>8} "
              f"{'walk_count_s':>12}")
        for rows, files in [(100_000, 8), (400_000, 8), (1_600_000, 8),
                            (400_000, 32), (400_000, 128)]:
            d = os.path.join(root, f"t-{rows}-{files}")
            t = build(spark, d, rows, files)
            mp, t_exp = timed(lambda: to_iceberg_metadata(
                t, manifest_format="avro"))
            _, t_adopt = timed(lambda: adopt_iceberg_metadata(
                spark, mp, d + "-adopted"))
            n, t_walk = timed(lambda: read_via_iceberg_metadata(
                spark, mp).count())
            assert n == rows
            print(f"{rows:>9,} {files:>5} {t_exp:>9.3f} {t_adopt:>8.3f} "
                  f"{t_walk:>12.3f}")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
