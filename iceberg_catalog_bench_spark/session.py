"""SparkSession factory.

The reference configures its Spark sessions per-engine/per-catalog in
``iceberg-tests/config/framework.yaml:29-51`` (shuffle partitions,
Iceberg extensions, REST catalog). We collapse that to a single
factory with scale-aware defaults:

- AQE on (runtime re-planning, skew-join handling, partition
  coalescing) — at 100 TB this replaces hand-tuned
  ``spark.sql.shuffle.partitions`` per query.
- Arrow execution for the Pandas-UDF paths (dedup / similarity /
  multimodal operators).
- ``local[N]`` for tests; on a real cluster callers pass
  ``master=None`` and let spark-submit decide.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "iceberg-catalog-bench-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    ``master=None`` → use ``local[$SPARK_GRAFT_CPUS]`` unless a master
    is already set by the environment (spark-submit / existing session).
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        master = f"local[{DEFAULT_CPUS}]"
    builder = builder.master(master)

    conf = {
        # AQE: runtime shuffle-partition coalescing + skew-join splitting.
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # Static shuffle width as the pre-AQE upper bound; AQE coalesces down.
        "spark.sql.shuffle.partitions": str(shuffle_partitions or DEFAULT_CPUS),
        # Arrow transfer for pandas_udf / mapInPandas / toPandas.
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # Keep timestamps deterministic across the DuckDB oracle boundary.
        "spark.sql.session.timeZone": "UTC",
        # Broadcast threshold: dims (region/nation/supplier/part at bench
        # SFs) should broadcast; AQE also converts post-shuffle.
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        # Join strategy (r15 optimization, guide §3.1/§9): let the
        # planner pick shuffled-hash over sort-merge when its build-side
        # size conditions hold — skips two per-partition sorts. Measured
        # on the SMJ-bearing suite members: tpch_q7 1.05 → 0.49 s,
        # tpcds_qoq 0.68 → 0.47 s, tpch_q18 1.03 → 0.76 s (sf0.1,
        # noop sink, median of 3). Trade-off (ADVICE r15): the static
        # planner picks SHJ from ESTIMATED sizeInBytes — a post-filter
        # misestimate trades sort-merge's graceful spill for a
        # hash-build that cannot spill (executor OOM at scale). The
        # AQE threshold below converts on MEASURED map sizes and AQE
        # skew-split bounds per-partition builds; a deployment that
        # cannot tolerate the OOM class scopes these two flags out via
        # ``extra_conf``. Skew behavior pinned in
        # tests/test_round16_opt.py.
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold":
            str(64 * 1024 * 1024),
        # Python workers host numpy/BLAS for the Arrow operators
        # (SemDeDup assignment, per-cluster V·Vᵀ, ANN scoring). One
        # BLAS thread per worker (r16, VERDICT r15 item 3): Spark
        # already runs one worker per core, so BLAS-internal threads
        # (this box's OpenBLAS defaults to 2, MAX_THREADS=2) only
        # oversubscribe the cores 2× under full task width. Pinned via
        # executorEnv so it reaches the forked Python workers on any
        # deployment, local or cluster.
        "spark.executorEnv.OPENBLAS_NUM_THREADS": "1",
        "spark.executorEnv.OMP_NUM_THREADS": "1",
        "spark.executorEnv.MKL_NUM_THREADS": "1",
        # Input split sizing: 128MB splits match the reference's
        # write.target-file-size-bytes=134217728 (blob-dfs_bench.py:85).
        "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
        # INT64-micros timestamps (Iceberg's mandate): INT96 writes no
        # footer stats, which silently disables timestamp pruning.
        "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        "spark.ui.enabled": "false",
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
