"""Delete-side compaction cost probe (round 7).

Claim under test: ``compact_delete_files`` costs O(delete bytes), flat
in TABLE size — it rewrites only the (kilobyte) position-delete files,
never a data file — while ``rewrite_position_delete_files`` (the
fold-into-data variant) scales with the bytes of the data files the
deletes touch.

Setup per scale: N base rows across 8 data files, the same ~1k-row
MoR delete spanning two files, then one CoW update rewrites one of the
referenced files so the delete file carries dangling rows. Times the
delete-side compaction at each scale.

    python scripts/delete_compaction_probe.py [scales...]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from iceberg_catalog_bench_spark.catalog import LakeTable
from iceberg_catalog_bench_spark.session import get_spark


def probe(spark, n_rows: int) -> dict:
    d = tempfile.mkdtemp(prefix="delprobe-") + "/t"
    t = LakeTable.create(
        spark, d, "k bigint, v double",
        properties={"write.delete.mode": "merge-on-read"},
    )
    base = (
        spark.range(n_rows)
        .select(F.col("id").alias("k"), (F.col("id") * 1.5).alias("v"))
        # key-ranged files so the CoW update below rewrites ONE file,
        # leaving the others' tombstones live (the dangling-rows case)
        .repartitionByRange(8, "k")
    )
    t.append(base)
    # ~1k tombstones spanning the whole table (every n/1000th key)
    step = max(1, n_rows // 1000)
    t.delete_where(f"k % {step} = 0", mode="merge-on-read")
    # CoW-rewrite the rows around one file's keys: some tombstones dangle
    t.update({"v": "v + 1"}, f"k < {n_rows // 8}", mode="copy-on-write")

    pos = [x for x in t._snapshot().delete_files if x.content == "position"]
    del_bytes = sum(x.bytes for x in pos)
    data_bytes = sum(e.bytes for e in t._snapshot().files)
    t0 = time.perf_counter()
    res = t.compact_delete_files()
    dt = time.perf_counter() - t0
    return {
        "rows": n_rows,
        "data_mb": round(data_bytes / 1e6, 1),
        "delete_kb": round(del_bytes / 1e3, 1),
        "compact_s": round(dt, 3),
        "dangling_removed": res["removed_dangling_rows"],
    }


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [2_000_000, 8_000_000, 32_000_000]
    spark = get_spark(app_name="delete-compaction-probe")
    # warm-up so JVM/codegen startup doesn't land on the first scale
    probe(spark, 100_000)
    for n in scales:
        print(probe(spark, n), flush=True)


if __name__ == "__main__":
    main()
