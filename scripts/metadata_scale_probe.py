"""Metadata-growth probe: serialized metadata size and commit latency
over a long commit history, with the round-7 delta encoding vs the
fully-materialized form it replaced.

The hazard being measured: each snapshot's cumulative file list made
metadata O(retained snapshots × live files) — serialize + fsync on
EVERY commit, so commit latency grew with table age. The delta
encoding stores each snapshot as (base, removed, added) when smaller,
making the write O(live files + total changes).

    python scripts/metadata_scale_probe.py [N_COMMITS] [FILES_PER_COMMIT]
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    files_per = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from iceberg_catalog_bench_spark.catalog import LakeTable
    from iceberg_catalog_bench_spark.catalog.table import (
        _META_DIR,
        _META_FILE,
        expand_meta,
    )
    from iceberg_catalog_bench_spark.session import get_spark

    spark = get_spark(app_name="meta-probe", shuffle_partitions=files_per)
    base = tempfile.mkdtemp(prefix="meta-probe-")
    t = LakeTable.create(spark, os.path.join(base, "t"), "k bigint, v double")
    df = spark.range(files_per * 100).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) AS v"
    ).repartition(files_per).cache()
    df.count()

    first = last = None
    for i in range(n_commits):
        t0 = time.perf_counter()
        t.append(df)
        dt = time.perf_counter() - t0
        if i == 0:
            first = dt
        last = dt

    meta_path = os.path.join(t.path, _META_DIR, _META_FILE)
    delta_bytes = os.path.getsize(meta_path)
    expanded = expand_meta(json.load(open(meta_path)))
    full_bytes = len(json.dumps(expanded).encode())
    print(
        f"commits={n_commits} files_per_commit={files_per} "
        f"live_files={n_commits * files_per} "
        f"meta_delta_bytes={delta_bytes} meta_full_equiv_bytes={full_bytes} "
        f"shrink={full_bytes / delta_bytes:.1f}x "
        f"first_commit={first:.2f}s last_commit={last:.2f}s"
    )


if __name__ == "__main__":
    main()
