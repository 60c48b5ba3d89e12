"""Benchmark harness — reimplements the reference's phase set
(`/root/reference/blob_dfs/blob-dfs_bench.py:90-161`) on LakeTable +
the driver testdata, plus our headline relational queries.

Phases (reference parity):
- write_append       : bulk append of the events table into a LakeTable
                       partitioned `days(ts), bucket(16, user_id)`
                       (blob-dfs_bench.py:72,104-106)
- read_pruned        : 2-day ts-window GROUP BY count
                       (blob-dfs_bench.py:117-122)
- read_agg           : full-scan approx_percentile + count by group
                       (blob-dfs_bench.py:125-129)
- read_lookup        : 3-key IN-list point lookup (blob-dfs_bench.py:132-136)
- rewrite_data_files / rewrite_manifests / expire_snapshots
                       (blob-dfs_bench.py:140-155)

Protocol: warm-up 1, measure 3, report median (spec
ICEBERG-Interoperability-Test-Spec.md:194). Maintenance runs once.

Round 4 additions:
- per-phase Spark metrics (input bytes, shuffle read/write bytes,
  executor task-time) diffed from the AppStatusStore around each
  phase — the spec's cost-KPI stand-in (spec `:93`). A plan
  regression (lost pushdown, new shuffle) moves these even when
  sub-second wall-time noise hides it.
- a 10M-row scale pair (`write_append_scale` fanout write +
  `scale_read_pruned` 2-day window) so the layout/pruning claims
  probed in BASELINE.md are REGRESSION-TESTED per round; tune or
  disable via SPARK_GRAFT_BENCH_SCALE_ROWS=0.

Output: ONE JSON line
  {"metric": ..., "value": N, "unit": "sec", "queries": {...},
   "metrics": {phase: {input_mb, shuffle_read_mb, shuffle_write_mb,
   task_sec, execs}}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyarrow as pa

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
MEASURE_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

HEADLINE = [
    "pricing_summary",
    "range_pruned_agg",
    "percentile_approx_by_group",
    "inlist_lookup",
    "join_fact_fact",
    "join_multiway_region_revenue",
    "shipping_priority_top10",
    "window_topn_per_group",
    "dedup_exact",
    "dedup_minhash_lsh",
    "knn_brute_force",
    "text_quality_scores",
    "streaming_windowed_agg",
    # round 3: the LLM-curation capstone (decontaminate → dedup → gate
    # → pack per (lang, shard)) as a tracked throughput number
    "pipeline_curate_full",
    # round 3: event analytics — the sequential-semantics window shape
    # (funnel) and the single-exchange partial-agg rollup (OHLC)
    "events_funnel_conversion",
    "events_resample_ohlc",
    # round 4: the decorrelated dual-existential aggregate — tracks
    # the cost of the one-wide-aggregate Q21 rewrite per round
    "tpch_q21_sole_fault_supplier",
    # round 10: BM25 — the retrieval family's standing perf signal for
    # its tokenize-explode-shuffle spine (one corpus pass via
    # ReusedExchange; baseline recorded per the drift protocol)
    "text_bm25_keyword_search",
    # round 16: the r15-staged substring-dedup family (exact
    # duplicate-SPAN detection + the cutting stage — the suffix-array
    # pipeline stage re-expressed as a rolling-window hash join, one
    # corpus-sized exchange each) and the n-gram novelty profile.
    # New phases per the standing rotation contract (VERDICT r15 item
    # 7); baselines recorded fresh in BASELINE.md r16.
    "dedup_substring_spans",
    "dedup_substring_cut",
    "corpus_ngram_novelty",
]


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def median_of(fn, runs: int = MEASURE_RUNS, pre_run=None) -> float:
    """Warm-up once, report the median of ``runs`` timed executions.

    ``pre_run`` (r16, VERDICT r15 item 2 — a MEASUREMENT-BUG fix, not
    an optimization): Spark's CacheManager matches ``.cache()`` calls
    by logical plan across queries, so a phase whose query caches an
    intermediate (dedup_minhash_lsh's shingle index) would materialize
    it during the warm-up and let every TIMED iteration reuse the
    blocks — timing cache reads, not the computation from parquet.
    The bench now clears the SQL plan cache before each timed
    iteration (outside the timer) and once after the last so no cache
    leaks into a later phase either. Every timed run computes from
    the parquet inputs; within-run reuse (the legitimate 4× reuse
    inside one execution) is unaffected. Affected phases re-recorded
    per the BASELINE.md adjudication protocol (r16 entry)."""
    fn()  # warm-up (spec :194)

    def once() -> float:
        if pre_run is not None:
            pre_run()
        return timed(fn)

    vals = [once() for _ in range(runs)]
    if pre_run is not None:
        pre_run()
    return statistics.median(vals)


class PhaseMetrics:
    """Per-phase Spark resource metrics (spec `:93` cost-KPI stand-in):
    cumulative executor totals from the AppStatusStore (never evicted,
    unlike per-stage entries) are snapshotted around each phase; the
    delta is the phase's input bytes, shuffle bytes, and executor
    task-time. Wall-time noise on sub-second phases is ±20-30%, but
    these counters are deterministic for a fixed plan — a lost
    pushdown or an extra exchange moves them every time."""

    def __init__(self, spark) -> None:
        self._store = spark.sparkContext._jsc.sc().statusStore()

    def _totals(self) -> dict[str, int]:
        s = self._store.executorList(False)
        t = {"input": 0, "sread": 0, "swrite": 0, "dur": 0}
        for i in range(s.size()):
            e = s.apply(i)
            t["input"] += e.totalInputBytes()
            t["sread"] += e.totalShuffleRead()
            t["swrite"] += e.totalShuffleWrite()
            t["dur"] += e.totalDuration()
        return t

    @staticmethod
    def _cpu_jiffies() -> tuple[int, int]:
        """(busy, steal) jiffies from /proc/stat — the r13 host-steal
        instrument. This box is a guest VM whose host oversubscribes
        CPU: under a full 32-thread load the hypervisor steals a
        TIME-VARYING share of our cycles (33% measured during the r13
        investigation), which inflates exactly the long all-core
        phases (the composites) while sub-second phases dodge it —
        the r12 'composite inflation' pattern. Recording per-phase
        steal makes the next such episode attributable from the
        BENCH record alone."""
        try:
            with open("/proc/stat") as f:
                v = [int(x) for x in f.readline().split()[1:]]
            busy = v[0] + v[1] + v[2]  # user + nice + system
            steal = v[7] if len(v) > 7 else 0
            return busy, steal
        except (OSError, ValueError, IndexError):
            return 0, 0

    def measure(self, fn, execs: int = 1) -> tuple[object, dict]:
        before = self._totals()
        b_busy, b_steal = self._cpu_jiffies()
        out = fn()
        a_busy, a_steal = self._cpu_jiffies()
        after = self._totals()
        mb = 1024.0 * 1024.0
        d_busy, d_steal = a_busy - b_busy, a_steal - b_steal
        steal_pct = (
            round(100.0 * d_steal / (d_busy + d_steal), 1)
            if d_busy + d_steal > 0 else 0.0
        )
        return out, {
            "input_mb": round((after["input"] - before["input"]) / mb, 2),
            "shuffle_read_mb": round((after["sread"] - before["sread"]) / mb, 2),
            "shuffle_write_mb": round((after["swrite"] - before["swrite"]) / mb, 2),
            "task_sec": round((after["dur"] - before["dur"]) / 1000.0, 2),
            "steal_pct": steal_pct,
            "execs": execs,
        }


def main() -> None:
    from iceberg_catalog_bench_spark.catalog import LakeTable
    from iceberg_catalog_bench_spark.operators import registry
    from iceberg_catalog_bench_spark.session import get_spark
    from iceberg_catalog_bench_spark.sources import load_events_ts_range, load_table

    registry.load_all()
    spark = get_spark(app_name="bench")
    sf = os.path.basename(os.path.normpath(SF_DIR)).replace("sf", "")
    results: dict[str, float] = {}
    metrics: dict[str, dict] = {}
    pm = PhaseMetrics(spark)
    run_busy0, run_steal0 = pm._cpu_jiffies()

    def phase_once(name: str, fn) -> None:
        results[name], metrics[name] = pm.measure(lambda: timed(fn))

    def phase_median(name: str, fn) -> None:
        results[name], metrics[name] = pm.measure(
            lambda: median_of(fn, pre_run=spark.catalog.clearCache),
            execs=MEASURE_RUNS + 1,
        )

    # Calibration phase (VERDICT r6 item 3): a FIXED, I/O-free,
    # JVM-only workload — 50M-row range → one hash exchange → sum —
    # whose plan never changes round to round. Its ratio to the
    # recorded baseline measures the MACHINE (JIT, CPU contention,
    # page cache), not any plan: dividing every other phase's
    # ratio-to-baseline by the calibration ratio lets the 2× gate
    # compare plans across environment drift (round 6 measured a
    # uniform ~1.3× inflation with flat per-phase bytes on two
    # independent runs).
    def _calibration() -> None:
        spark.range(0, 50_000_000, 1, 32).selectExpr(
            "id % 64 AS k", "id"
        ).groupBy("k").agg(F.sum("id")).collect()

    # Python/Arrow worker pre-warm (VERDICT r12 item 6), UNTIMED: one
    # tiny applyInPandas forks the python worker pool and JITs the
    # Arrow serialization path once at bench start, so the first
    # Pandas-UDF-heavy phase doesn't pay worker cold-start inside its
    # timer (the semdedup_report 8.4-14.1s cold spread was mostly
    # this; 3-reading spread after the prewarm is recorded in
    # bench_baseline.json's protocol note).
    spark.range(0, 64, 1, 32).groupBy((F.col("id") % 8).alias("g")) \
        .applyInPandas(lambda pdf: pdf[["id"]], "id bigint").count()
    # r16: the Arrow-native eval paths (mapInArrow / applyInArrow —
    # the SemDeDup stages moved to them this round) JIT their own
    # serializers; prewarm them like the pandas path above (same
    # untimed-generic-prewarm protocol, VERDICT r12 item 6). Measured:
    # the cold semdedup phase drops 8.5 -> 6.0 s with this warm.

    def _arrow_identity(batches):
        yield from batches

    def _arrow_group_identity(t: pa.Table) -> pa.Table:
        return t.select(["id"])

    spark.range(0, 64, 1, 32).mapInArrow(_arrow_identity, "id bigint").count()
    spark.range(0, 64, 1, 32).groupBy((F.col("id") % 8).alias("g")) \
        .applyInArrow(_arrow_group_identity, "id bigint").count()

    phase_median("calibration", _calibration)

    # --- reference phase set on LakeTable ---------------------------------
    scratch = tempfile.mkdtemp(prefix="bench-laketable-")
    table_dir = os.path.join(scratch, "tx_events")
    events = load_table(spark, "events", SF_DIR)

    t = LakeTable.create(
        spark, table_dir,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
        partition_by=["days(ts)", "bucket(16, user_id)"],
        properties={"write.target-file-size-bytes": str(128 * 1024 * 1024)},
    )
    phase_once("write_append", lambda: t.append(events))

    lake = t.read()
    # scan() applies manifest-level file pruning before the Spark scan
    # (448/480 files skipped for this window at 10M rows — BASELINE.md)
    phase_median(
        "read_pruned",
        lambda: t.scan("ts >= '2024-01-05 00:00:00' AND ts < '2024-01-07 00:00:00'")
        .groupBy("event_type").count().collect(),
    )
    phase_median(
        "read_agg",
        lambda: lake.groupBy("event_type").agg(
            F.percentile_approx("value", 0.95), F.count(F.lit(1))
        ).collect(),
    )
    phase_median(
        "read_lookup",
        lambda: lake.filter(F.col("user_id").isin(123, 456, 789)).collect(),
    )
    # Row-level delete, both modes, same shape (single-event point
    # delete): copy-on-write pays a file rewrite, merge-on-read pays a
    # tombstone write — the gap is the whole point of MoR at scale
    # (Iceberg v2 position deletes). The tombstone is folded by the
    # rewrite_data_files phase right after, so compaction is timed
    # WITH delete-aware work.
    phase_once(
        "delete_cow", lambda: t.delete_where("event_id = 777", mode="copy-on-write")
    )
    phase_once(
        "delete_mor", lambda: t.delete_where("event_id = 888", mode="merge-on-read")
    )
    phase_once("rewrite_data_files", lambda: t.rewrite_data_files(min_input_files=2))
    # CDC upsert batch (equality deletes + images, no target read) —
    # measured after compaction so the rewrite phase stays comparable.
    upsert_batch = events.limit(10_000).withColumn(
        "value", F.col("value") + 1.0
    )
    phase_once("upsert_cdc", lambda: t.upsert_by_keys(upsert_batch, on=["event_id"]))
    # Backfill (round 7): dynamic INSERT OVERWRITE of one day —
    # ReplacePartitions matched on manifest partition values, so the
    # phase cost is the ONE day's fanout write + an O(manifest) commit;
    # a regression here means the replacement set started reading data.
    backfill = events.filter(
        (F.col("ts") >= "2024-01-03 00:00:00") & (F.col("ts") < "2024-01-04 00:00:00")
    ).withColumn("value", F.col("value") * 2.0)
    phase_once(
        "overwrite_partition_day", lambda: t.overwrite_partitions(backfill)
    )
    # Advisory scan (round 6): metadata-only — reads manifests, never
    # data — run right after the CDC upsert so outstanding delete
    # files give it real content. Times the raw advisory arithmetic
    # (maintenance_advice_row — the DataFrame wrapper is fixed Spark
    # overhead); sub-0.1s by design, a regression here means the
    # advisory started touching data.
    phase_once("maintenance_advice", lambda: t.maintenance_advice_row())
    phase_once("rewrite_manifests", lambda: t.rewrite_manifests())
    phase_once("expire_snapshots", lambda: t.expire_snapshots(retain_last=2))

    # Foreign-table adoption (round 9): export the bench table's full
    # history as a REAL Avro-manifest Iceberg chain (setup, untimed),
    # then time registration — one metadata pass, zero data bytes
    # (the 100 TB story: adopting a table costs manifests, not data).
    # Milliseconds by design; a regression means adoption started
    # re-parsing manifests per snapshot or opening data files.
    from iceberg_catalog_bench_spark.catalog.iceberg_export import (
        adopt_iceberg_metadata, to_iceberg_metadata)
    adopt_meta = to_iceberg_metadata(t, manifest_format="avro")
    adopt_dirs = iter(range(1_000_000))

    def _adopt() -> None:
        adopt_iceberg_metadata(
            spark, adopt_meta,
            os.path.join(scratch, f"adopted-{next(adopt_dirs)}"))

    phase_median("adopt_foreign_table", _adopt)
    shutil.rmtree(scratch, ignore_errors=True)

    # Streaming-source drain (round 5): one availableNow drain of a
    # 4-commit table through the `laketable` Python DataSource into a
    # parquet sink — the incremental-consumption surface. Times the
    # whole pipeline: snapshot-offset planning (metadata JSON only) +
    # per-file Python Arrow reads + sink write. The 4 setup appends
    # are NOT timed. A projection/partition-planning regression moves
    # this phase even though no registered batch query touches the
    # source code path.
    from iceberg_catalog_bench_spark.streaming.table_source import register_source

    register_source(spark)
    ssdir = tempfile.mkdtemp(prefix="bench-stream-src-")
    sst = LakeTable.create(
        spark, os.path.join(ssdir, "t"),
        "event_id bigint, user_id bigint, value double",
    )
    ev_slim = load_table(spark, "events", SF_DIR).select(
        "event_id", "user_id", "value"
    )
    for i in range(4):
        sst.append(ev_slim.filter(F.col("user_id") % 4 == i))

    # UNTIMED warm-up pipe (round 7): a 10-row laketable→laketable
    # availableNow drain spawns and caches the Python DataSource
    # workers (planning + source read + sink write). Round-7 probe:
    # the cold first drain measured 6.9s of which ~4.9s was
    # interpreter/worker startup; the identical warm drain is 2.0s
    # (addBatch 3.7s→0.5s). A real stream pays startup once per
    # executor lifetime, not per micro-batch, so the timed phases
    # below measure STEADY-STATE throughput — the quantity that
    # scales to a 100 TB feed. bench_baseline.json is recorded under
    # this protocol.
    warm = LakeTable.create(
        spark, os.path.join(ssdir, "warm"),
        "event_id bigint, user_id bigint, value double",
    )
    warm.append(ev_slim.limit(10))
    warm_dst = LakeTable.create(
        spark, os.path.join(ssdir, "warm_dst"),
        "event_id bigint, user_id bigint, value double",
    )
    wq = (
        spark.readStream.format("laketable").option("path", warm.path).load()
        .writeStream.format("laketable").option("path", warm_dst.path)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(ssdir, "warm_ck")).start()
    )
    wq.awaitTermination(300)

    def _source_drain() -> None:
        q = (
            spark.readStream.format("laketable").option("path", sst.path).load()
            .writeStream.format("parquet")
            .option("path", os.path.join(ssdir, "sink"))
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(ssdir, "ck")).start()
        )
        q.awaitTermination(600)

    phase_once("streaming_source_drain", _source_drain)

    # Streaming SINK pipe (round 5): the same 4-commit table pushed
    # through writeStream.format("laketable") into a fresh table —
    # executor-side parquet writes + one snapshot per micro-batch via
    # the checkpointed batch-id guard. The standing regression signal
    # for the sink's write/commit path (the source side is covered by
    # streaming_source_drain above).
    sink_dst = LakeTable.create(
        spark, os.path.join(ssdir, "dst"),
        "event_id bigint, user_id bigint, value double",
    )

    def _sink_pipe() -> None:
        q = (
            spark.readStream.format("laketable").option("path", sst.path).load()
            .writeStream.format("laketable").option("path", sink_dst.path)
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(ssdir, "sink_ck"))
            .start()
        )
        q.awaitTermination(600)

    phase_once("streaming_sink_pipe", _sink_pipe)
    sink_dst._reload()
    assert sink_dst.read().count() == sum(
        s["summary"].get("added_rows", 0)
        for s in LakeTable.load(spark, sst.path)._meta["snapshots"]
    ), "sink pipe lost rows"
    shutil.rmtree(ssdir, ignore_errors=True)

    # Standing synthetic probe (reference blob-dfs_bench.py:48-106 writes
    # a GENERATED table, not a copy): fanout write under days×bucket,
    # then the reads the fanout pays for — a 2-day pruned window and a
    # bucket-pruned point lookup. A pruning/fanout regression (e.g. the
    # INT96-stats or partition-escaping traps) shows up here as a jump
    # in the read phases, directly in BENCH_rN rather than only in
    # BASELINE.md prose. Row count tunable; 0 disables.
    synth_rows = int(os.environ.get("SPARK_GRAFT_BENCH_SYNTH_ROWS", "1000000"))
    if synth_rows > 0:
        from iceberg_catalog_bench_spark.sources.datagen import generate_tx_events

        sdir = tempfile.mkdtemp(prefix="bench-synth-")
        st = LakeTable.create(
            spark, os.path.join(sdir, "tx"),
            "user_id bigint, ts timestamp, amount double, city string, category string",
            partition_by=["days(ts)", "bucket(16, user_id)"],
        )
        phase_once(
            "write_append_synth",
            lambda: st.append(generate_tx_events(spark, synth_rows)),
        )
        phase_median(
            "synth_read_pruned",
            lambda: st.scan(
                "ts >= '2025-01-05 00:00:00' AND ts < '2025-01-07 00:00:00'"
            ).groupBy("category").agg(F.round(F.sum("amount"), 2)).collect(),
        )
        phase_median(
            "synth_point_lookup", lambda: st.scan("user_id = 4242").collect()
        )
        shutil.rmtree(sdir, ignore_errors=True)

    # Murmur3 standing phase (VERDICT r10 item 4): append the events
    # slice into an `ibucket(16, user_id)` table — the spec-true
    # murmur3 write path (null-masked, numpy-vectorized Arrow UDF) —
    # then a point lookup on it. The r10 write probe was a one-off
    # script; this puts the ibucket hot path inside the 2× gate. The
    # pruning claim (1 bucket in 16) is ASSERTED after the phase, not
    # just timed.
    ibdir = tempfile.mkdtemp(prefix="bench-ibucket-")
    ibt = LakeTable.create(
        spark, os.path.join(ibdir, "t"),
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
        partition_by=["ibucket(16, user_id)"],
    )

    def _ibucket_write_lookup() -> None:
        ibt.append(events)
        ibt.scan("user_id = 123").collect()

    phase_once("ibucket_write_lookup", _ibucket_write_lookup)
    from iceberg_catalog_bench_spark.catalog.iceberg_bucket import (
        iceberg_bucket,
    )

    _ibsnap = ibt._snapshot(ibt._meta["current_snapshot_id"])
    _ibkept = ibt._prune_files(_ibsnap.files, "user_id = 123")
    _ibwant = str(iceberg_bucket(123, 16))
    assert _ibkept and len(_ibkept) < len(_ibsnap.files) and all(
        f.partition["_p_ibucket_user_id"] == _ibwant for f in _ibkept
    ), "ibucket point lookup must prune to the key's bucket"
    shutil.rmtree(ibdir, ignore_errors=True)

    # 10M-row scale pair (round 4): the fanout-write + manifest-pruned
    # read whose layout claims were previously only probe-verified in
    # BASELINE.md — promoted to a standing phase so a pruning/fanout
    # regression moves BENCH_rN, not just prose. ~4s at 10M on
    # local[32] (first numbers in BASELINE.md); set
    # SPARK_GRAFT_BENCH_SCALE_ROWS=0 to skip.
    scale_rows = int(os.environ.get("SPARK_GRAFT_BENCH_SCALE_ROWS", "10000000"))
    if scale_rows > 0:
        from iceberg_catalog_bench_spark.sources.datagen import generate_tx_events

        sdir = tempfile.mkdtemp(prefix="bench-scale-")
        st = LakeTable.create(
            spark, os.path.join(sdir, "tx"),
            "user_id bigint, ts timestamp, amount double, city string, category string",
            partition_by=["days(ts)", "bucket(16, user_id)"],
        )
        phase_once(
            "write_append_scale",
            lambda: st.append(generate_tx_events(spark, scale_rows)),
        )
        phase_median(
            "scale_read_pruned",
            lambda: st.scan(
                "ts >= '2025-01-05 00:00:00' AND ts < '2025-01-07 00:00:00'"
            ).groupBy("category").agg(F.round(F.sum("amount"), 2)).collect(),
        )
        shutil.rmtree(sdir, ignore_errors=True)

    # --- headline queries (median of 3, spec protocol) --------------------
    for name in HEADLINE:
        if name == "percentile_approx_by_group":
            # Time the pure GK-sketch plan: the registered query of this
            # name adds EXACT p94/p96 bounds for its driver oracle,
            # which would make this phase measure the full-sort path
            # rather than the single-pass sketch (BASELINE.md
            # comparability).
            from iceberg_catalog_bench_spark.operators.relational import (
                percentile_approx_values,
            )

            phase_median(
                name, lambda: percentile_approx_values(spark, SF_DIR).collect()
            )
            continue
        fn = registry.QUERIES.get(name)
        if fn is None:
            continue
        phase_median(name, lambda fn=fn: fn(spark, SF_DIR).collect())

    # --- TPC-H power run (round 6) ----------------------------------------
    # All 22 TPC-H shapes back-to-back, once, as one composite phase —
    # the classic single-stream metric. Individual shapes that need a
    # tight gate stay separate phases above; this composite catches a
    # regression anywhere in the suite (a lost broadcast or pushdown in
    # any of the 22 moves it) at ~22 plans' worth of wall time.
    TPCH_22 = [
        "pricing_summary", "tpch_q2_min_cost_supplier",
        "shipping_priority_top10", "tpch_q4_order_priority",
        "tpch_q5_local_supplier_volume", "tpch_q6_forecast_revenue",
        "tpch_q7_volume_shipping", "tpch_q8_market_share",
        "tpch_q9_product_type_profit", "tpch_q10_returned_items",
        "tpch_q11_important_stock", "tpch_q12_priority_shipping",
        "tpch_q13_customer_distribution", "tpch_q14_promotion_effect",
        "tpch_q15_top_supplier", "tpch_q16_parts_supplier",
        "tpch_q17_small_qty_revenue", "tpch_q18_large_volume_customer",
        "tpch_q19_discounted_revenue", "tpch_q20_potential_promotion",
        "tpch_q21_sole_fault_supplier", "tpch_q22_global_sales_opportunity",
    ]

    # r16 METHODOLOGY CHANGE (VERDICT r15 item 6, guide §2.6,
    # adjudicated re-record in BASELINE.md): composite members now run
    # through a small thread pool instead of strictly back-to-back.
    # Measured (composite_floor.py): physical planning is only ~2.5%
    # of a composite, but each member leaves most of the 32 cores
    # idle between its stage waves at sf0.1 — Spark's scheduler happily
    # back-fills those gaps with the next member's tasks (actions are
    # sequential only because the driver calls them sequentially).
    # 3 in flight per the guide ("enough to fill the tail, not so many
    # that they fight"); env-tunable, 1 restores the serial protocol.
    # Same-day serial vs pooled on this code (steal-matched A/B):
    # tpch 16.5 -> 6.8 s, tpcds 27.5 -> 8.8 s. Every member still
    # computes from parquet per run — nothing is cached or shared
    # between members beyond Spark's normal scan-level page cache.
    composite_workers = int(
        os.environ.get("SPARK_GRAFT_COMPOSITE_WORKERS", "3"))

    def _run_suite(names: list[str]) -> None:
        if composite_workers <= 1:
            for q in names:
                registry.QUERIES[q](spark, SF_DIR).collect()
            return
        from concurrent.futures import ThreadPoolExecutor

        def one(q: str) -> None:
            registry.QUERIES[q](spark, SF_DIR).collect()

        with ThreadPoolExecutor(max_workers=composite_workers) as pool:
            list(pool.map(one, names))

    phase_once("tpch_power_run", lambda: _run_suite(TPCH_22))

    # --- TPC-DS report run (round 7) --------------------------------------
    # The six TPC-DS report shapes back-to-back — date-dim star joins,
    # grouping-sets rollups, rank-within-parent, the Q88 eight-band
    # single scan. Same rationale as the TPC-H composite: one phase
    # that moves if any DS plan loses a broadcast, a pushdown, or the
    # single-scan collapse.
    # (+ round 9: the Q51 cumulative-crossover and Q67 top-N-over-
    # rollup shapes — window-over-join-of-aggregates and
    # WindowGroupLimit under a grouping-sets Expand; baseline
    # re-recorded for the widened phase per the drift protocol)
    # (+ round 10: the Q73 HAVING-before-reporting-join and Q93
    # net-after-returns shapes; baseline re-recorded again for the
    # widened phase — BASELINE.md documents both re-records)
    # (+ round 11: the Q1/Q30 returns-above-average and Q59 weekly
    # YoY-ratio shapes; baseline re-recorded per the same protocol)
    TPCDS_28 = [
        "tpcds_returned_ratio_by_date", "tpcds_rollup_rolling_sales",
        "tpcds_channel_union", "tpcds_star_join_multi_dim",
        "tpcds_rank_within_parent", "tpcds_multi_band_counts",
        "tpcds_cumulative_channel_crossover", "tpcds_topn_over_rollup",
        "tpcds_frequent_buyer_segments", "tpcds_net_after_returns",
        "tpcds_returns_above_avg_customers", "tpcds_weekly_yoy_ratio",
        # round-11 extended-session widening (12 -> 16, adjudicated
        # re-record in BASELINE.md): Q47/Q57 windows-over-cells, Q4/Q11
        # one-scan channel compare, Q54 histogram-of-aggregate, Q17/Q29
        # disjoint-slice chain
        "tpcds_monthly_deviation_neighbors",
        "tpcds_yoy_growth_channel_compare",
        "tpcds_revenue_band_histogram",
        "tpcds_return_repurchase_chain",
        # round-12 widening (16 -> 18, adjudicated re-record in
        # BASELINE.md): Q14 cross-channel INTERSECT reduced to one
        # fact pass + semi join, Q64 buy/return/rebuy chain on the
        # Q17/Q29 disjoint-slice spine
        "tpcds_cross_channel_items",
        "tpcds_buy_return_rebuy_margin",
        # round-13 widening (18 -> 20, adjudicated re-record in
        # BASELINE.md): Q23 frequent-items/best-customers double
        # broadcast-semi reduction, Q31 QoQ growth by integer
        # cross-multiplication — staged r12, held out of the composite
        # until this round's single adjudicated re-record
        "tpcds_frequent_items_best_customers",
        "tpcds_qoq_growth_nation_channels",
        # round-14 widening (20 -> 24, adjudicated re-record in
        # BASELINE.md): Q51 at item-day grain (one conditional
        # aggregate replacing two scans + FULL OUTER), Q75 YoY brand
        # decline with returns netted in the same aggregate, Q49 dual
        # rank from one conditional pass, Q39 integer-exact cov pairs
        "tpcds_item_day_channel_crossover",
        "tpcds_brand_decline_yoy",
        "tpcds_worst_return_ratios_dual_rank",
        "tpcds_cov_consecutive_months",
        # round-16 widening (24 -> 28, the r15-queued rotation,
        # adjudicated re-record in BASELINE.md — same record as the
        # §2.6 overlap methodology change): Q1-family lapsed-buyer
        # activity profile, Q49-family monthly return pivot, Q16/Q94
        # two-existential shipping, Q78-family cross-channel netted
        # ratio — the four r15-staged shapes, all driver-green
        "tpcds_customer_activity_profile",
        "tpcds_monthly_return_pivot",
        "tpcds_two_existential_shipping",
        "tpcds_cross_channel_netted_ratio",
    ]

    phase_once("tpcds_report_run", lambda: _run_suite(TPCDS_28))

    # (r13 protocol: NEW-PHASE-LAST — the Python-worker-heavy
    # semdedup phase now runs AFTER the composites. The r12 'composite
    # inflation' suspicion that its 200k-row cached corpus + worker
    # fleet perturbed downstream phases was A/B-refuted (BASELINE.md
    # r13: composites stayed 1.2-2.1x normalized with
    # SPARK_GRAFT_BENCH_SEMDEDUP_ROWS=0; the real cause is host CPU
    # steal), but last-position is still the right protocol: a
    # NEW phase's process footprint can never sit upstream of the
    # long-recorded ones.)
    # SemDeDup report under the gate (VERDICT r11 item 4): the
    # production path — k-means centroids (distributed seeded Lloyd)
    # + the Arrow/BLAS twin report (matmul assignment, one shuffle on
    # cluster id, per-cluster V·Vᵀ) — at the r11 probe's shape scaled
    # to bench budget (n=200k, dim 16, K=n/1000; the sf0.1 embeddings
    # table is 2k rows — too small to regress on). Previously a
    # regression in _unit_rows/assignment surfaced only in one-off
    # probes; now it moves BENCH_rN. Totals asserted post-phase.
    sem_rows = int(os.environ.get("SPARK_GRAFT_BENCH_SEMDEDUP_ROWS",
                                  "200000"))
    if sem_rows > 0:
        from iceberg_catalog_bench_spark.operators.dedup import (
            semdedup_centroids,
            semdedup_report_arrow,
        )

        sem_emb = spark.range(sem_rows).select(
            F.col("id").alias("vec_id"),
            F.array(*[F.rand(seed=i) for i in range(16)]).alias("embedding"),
        ).cache()
        sem_emb.count()  # materialize the corpus outside the phase
        sem_k = max(16, sem_rows // 1000)
        sem_out: dict = {}

        def _semdedup_report() -> None:
            cents = semdedup_centroids(spark, sem_emb, sem_k,
                                       method="kmeans")
            rows = semdedup_report_arrow(sem_emb, cents, 0.9).collect()
            sem_out["rows"] = rows

        phase_once("semdedup_report", _semdedup_report)
        _rows = sem_out["rows"]
        assert sum(r["n_vectors"] for r in _rows) == sem_rows \
            and 0 < len(_rows) <= sem_k, \
            "semdedup report must cover every vector in <= K clusters"
        sem_emb.unpersist()


    total = sum(results.values())
    # Record protocol (VERDICT r4 item 2): the driver tail-captures the
    # LAST stdout line and json-parses it — round 4's inline per-phase
    # `metrics` dict grew that line past the capture window and
    # BENCH_r04 landed `parsed: null`. The per-phase metrics therefore
    # go to a sidecar file (and a preceding stdout line for humans);
    # the final line is the compact totals dict only.
    sidecar = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_metrics.json"
    )
    # Normalized ratios (VERDICT r6 item 3): with recorded per-phase
    # baselines (bench_baseline.json, written by the round-7
    # re-baseline run), each phase's ratio-to-baseline is divided by
    # the MEDIAN ratio-to-baseline across all baselined phases —
    # machine drift cancels, so a normalized ratio > 2 means the PLAN
    # regressed. The median is the drift estimator (robust: a few
    # genuine regressions move only their own phases, never the
    # median); the dedicated calibration phase is kept as a pure-JVM
    # CONTROL but deliberately NOT the divisor — measured round 7:
    # CPU-bound synthetic work drifts differently (0.67x) than the
    # overhead-carrying real phases (median 0.84x), and dividing by it
    # overcorrects every phase by the gap.
    # whole-run host CPU steal (r13): the one-glance host-health
    # number on the record's final line; per-phase values in the
    # sidecar
    run_busy1, run_steal1 = pm._cpu_jiffies()
    d_busy, d_steal = run_busy1 - run_busy0, run_steal1 - run_steal0
    run_steal = (round(100.0 * d_steal / (d_busy + d_steal), 1)
                 if d_busy + d_steal > 0 else None)
    calib_ratio = None
    drift = None
    normalized: dict[str, float] = {}
    bl_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json"
    )
    try:
        with open(bl_path) as f:
            baseline = json.load(f).get("queries", {})
        if baseline.get("calibration") and results.get("calibration"):
            calib_ratio = results["calibration"] / baseline["calibration"]
        ratios = {
            k: v / baseline[k] for k, v in results.items() if baseline.get(k)
        }
        if ratios:
            drift = statistics.median(ratios.values())
            normalized = {k: round(r / drift, 3) for k, r in ratios.items()}
    except (OSError, ValueError):
        pass
    try:
        with open(sidecar, "w") as f:
            json.dump(
                {"sf": sf, "metrics": metrics,
                 "calib_ratio": calib_ratio,
                 "drift": drift,
                 "normalized_ratios": normalized},
                f, indent=1, sort_keys=True,
            )
        print(f"per-phase metrics -> {sidecar}")
    except OSError as e:  # never let the sidecar kill the record
        print(f"per-phase metrics sidecar failed: {e}")
    # Steal-aware gate annotation (VERDICT r13 item 7): any phase
    # whose drift-normalized ratio exceeds 1.5 carries its own
    # adjudication data ON the record's final line — phase steal and
    # the byte-counter deltas (flat bytes + high steal = host episode,
    # not a plan regression) — so a hot driver record is
    # self-adjudicating without opening bench_metrics.json.
    # r15: carry the ABSOLUTE seconds (measured + baseline) with every
    # flag — a microsecond-scale phase (e.g. maintenance_advice,
    # 0.002 s baseline) can post a 10×+ norm from pure scheduler
    # jitter, and without the absolute pair a reader can't tell that
    # 26 ms of noise is not a regression. The threshold is unchanged;
    # the flag just self-explains.
    hot = {
        k: {
            "norm": n,
            "sec": round(results[k], 3) if k in results else None,
            "baseline_sec": baseline.get(k),
            "steal_pct": metrics.get(k, {}).get("steal_pct"),
            "input_mb": metrics.get(k, {}).get("input_mb"),
            "shuffle_write_mb": metrics.get(k, {}).get("shuffle_write_mb"),
        }
        for k, n in normalized.items() if n > 1.5
    }
    print(json.dumps({
        "metric": "bench_phase_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in results.items()},
        "sf": sf,
        "cpus": CPUS,
        **({"calib_ratio": round(calib_ratio, 3)} if calib_ratio else {}),
        **({"drift": round(drift, 3)} if drift else {}),
        **({"steal_pct": run_steal} if run_steal is not None else {}),
        **({"hot_phases": hot} if hot else {}),
    }))


if __name__ == "__main__":
    main()
