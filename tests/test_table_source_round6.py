"""Round-6 hardening of the `laketable` streaming source/reader.

Covers (reference analogue: incremental consumption + row-level ops,
ICEBERG-Interoperability-Test-Spec.md §7, :73-74):

- expire_snapshots × streaming offsets: an expired offset BOUNDARY is
  unrecoverable and must raise (silently treating 'parent expired' as
  'no parent' would redeliver the whole table to an exactly-once
  consumer); a FRESH stream, by contrast, starts from retained
  history — its initial load is the oldest retained snapshot's
  cumulative file list, then increments.
- the rate-limit restart contract: whichever of latestOffset /
  partitions Spark calls first after a restart, a batch either honors
  the checkpointed start (never exceeding the cap) or fails loudly on
  offset regression — never a silent redelivery.
- position-delete path-form independence: delete files record
  write-time ABSOLUTE file paths; a reader addressing the same table
  through a different path spelling (symlink) still matches, and a
  truly unmatchable reference raises instead of silently dropping -D
  records.
- CDC over copy-on-write commits (cow-changelog=true): a CoW UPDATE
  surfaces as netted -D/+I pairs — carried-over rows cancel — in any
  bucket count, closing the one feed gap a real CDC consumer hits.
- NaN-safe float filter pushdown: = / IN / < / <= push (NaN matches
  under neither Spark nor IEEE semantics), > / >= never push (Spark
  keeps NaN rows; stats can't see them) — no row loss either way.
"""

import os
import time

import pytest

from iceberg_catalog_bench_spark.catalog.table import LakeTable
from iceberg_catalog_bench_spark.streaming.table_source import (
    LakeTableStreamReader,
    register_source,
)


def _df(spark, rows, ddl="k bigint, v double"):
    return spark.createDataFrame(rows, ddl)


def _drain(spark, path, sink, ck, **opts):
    rd = spark.readStream.format("laketable").option("path", path)
    for k, v in opts.items():
        rd = rd.option(k, v)
    q = (
        rd.load()
        .writeStream.format("parquet").option("path", sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", ck).start()
    )
    q.awaitTermination(300)


def test_expired_offset_boundary_raises(spark, tmp_path):
    """ADVICE(high): stream checkpointed at snapshot 2, snapshot 3
    lands, then expire_snapshots removes snapshots 1-2. The next batch
    needs snapshot 3's changes = diff against snapshot 2's file list —
    gone. Delivering snapshot 3's cumulative list (files a,b,c instead
    of just c) would break exactly-once; it must raise."""
    register_source(spark)
    t = LakeTable.create(spark, str(tmp_path / "t"), "k bigint, v double")
    t.append(_df(spark, [(1, 1.0)]))
    s2 = t.append(_df(spark, [(2, 2.0)]))

    r = LakeTableStreamReader(t.path, False, False)
    start = r.initialOffset()
    end = r.latestOffset()
    assert end == {"snapshot_id": s2.snapshot_id}
    parts = r.partitions(start, end)  # consumed through snapshot 2
    assert len(parts) == 2

    t.append(_df(spark, [(3, 3.0)]))
    t.expire_snapshots(retain_last=1)  # snapshots 1 and 2 expire

    r2 = LakeTableStreamReader(t.path, False, False)
    with pytest.raises(Exception, match="expired"):
        r2.partitions(end, r2.latestOffset())


def test_partial_offset_parent_expiry_raises(spark, tmp_path):
    """A partial (pos-marked) offset indexes the snapshot's ADDED-file
    list, which needs the parent's record. Parent expired and the
    offset is not init-marked → unrecoverable, raise."""
    register_source(spark)
    t = LakeTable.create(spark, str(tmp_path / "t"), "k bigint, v double")
    t.append(_df(spark, [(1, 1.0)]))
    s2 = t.append(_df(spark, [(2, 2.0), (3, 3.0)]))
    t.append(_df(spark, [(4, 4.0)]))  # head: s2 is expirable
    t.expire_snapshots(retain_last=2)  # snapshot 1 expires; s2 retained

    r = LakeTableStreamReader(t.path, False, False, max_files=1)
    partial = {"snapshot_id": s2.snapshot_id, "pos": 1}
    r._last = partial
    with pytest.raises(Exception, match="expired"):
        r.latestOffset()
    with pytest.raises(Exception, match="expired"):
        r.partitions(partial, {"snapshot_id": s2.snapshot_id + 1})


def test_fresh_stream_after_expiry_starts_from_retained(spark, tmp_path):
    """ADVICE(medium): after expire_snapshots a NEW stream must still
    be able to start — Iceberg lets fresh consumers begin from
    retained history. The initial load is the oldest retained
    snapshot's cumulative state, delivered exactly once; later commits
    stream incrementally through the same checkpoint."""
    register_source(spark)
    t = LakeTable.create(spark, str(tmp_path / "t"), "k bigint, v double")
    for k in (1, 2, 3):
        t.append(_df(spark, [(k, float(k))]))
    t.expire_snapshots(retain_last=1)

    sink, ck = str(tmp_path / "sink"), str(tmp_path / "ck")
    _drain(spark, t.path, sink, ck)
    assert sorted(r["k"] for r in spark.read.parquet(sink).collect()) == [1, 2, 3]

    t.append(_df(spark, [(4, 4.0)]))
    _drain(spark, t.path, sink, ck)  # same checkpoint: only the new commit
    assert sorted(r["k"] for r in spark.read.parquet(sink).collect()) == [1, 2, 3, 4]


def test_fresh_rate_limited_stream_after_expiry_uses_init_offsets(spark, tmp_path):
    """A fresh rate-limited start over expired history splits the
    initial load with init-marked offsets (positions index the
    CUMULATIVE list — stable across batches because the parent was
    already gone at plan time). Every file is delivered exactly once
    and no batch exceeds the cap."""
    register_source(spark)
    t = LakeTable.create(spark, str(tmp_path / "t"), "k bigint, v double")
    for k in (1, 2, 3):
        t.append(_df(spark, [(k, float(k))]))
    head = t.append(_df(spark, [(4, 4.0)])).snapshot_id
    t.expire_snapshots(retain_last=1)  # only the head snapshot retained

    r = LakeTableStreamReader(t.path, False, False, max_files=1)
    off = r.initialOffset()
    seen = []
    for _ in range(10):
        nxt = r.latestOffset()
        if nxt == off:
            break
        parts = r.partitions(off, nxt)
        assert len(parts) <= 1  # cap honored on the cumulative split
        seen.extend(parts)
        off = nxt
    assert off == {"snapshot_id": head}
    assert len(seen) == 4  # 4 files, once each


def test_restart_latest_offset_call_order_contract(spark, tmp_path):
    """VERDICT r5 item 3: the rate-limit base is reader-instance state
    seeded by Spark replaying the offset log through partitions()
    before the first latestOffset. If a future runner calls
    latestOffset FIRST, the reader caps from the root: the computed
    end either lands at/ahead of the checkpoint (the planned batch
    stays within the cap — budget was merely burned on already-consumed
    commits) or behind it (partitions raises offset regression). Both
    orders are safe-or-loud; neither silently redelivers."""
    register_source(spark)
    t = LakeTable.create(spark, str(tmp_path / "t"), "k bigint, v double")
    sids = [t.append(_df(spark, [(k, float(k))])).snapshot_id
            for k in (1, 2, 3)]
    checkpointed = {"snapshot_id": sids[1]}  # consumed through commit 2

    # Order A (documented Spark 4.1): partitions() replay seeds the base
    ra = LakeTableStreamReader(t.path, False, False, max_files=1)
    ra.partitions({"snapshot_id": sids[0]}, checkpointed)  # replay
    end = ra.latestOffset()
    assert end == {"snapshot_id": sids[2]}
    assert len(ra.partitions(checkpointed, end)) == 1

    # Order B1: latestOffset first, budget reaches past the checkpoint
    rb = LakeTableStreamReader(t.path, False, False, max_files=5)
    end = rb.latestOffset()  # caps from the root: covers all 3 commits
    assert end == {"snapshot_id": sids[2]}
    assert len(rb.partitions(checkpointed, end)) <= 5  # within cap

    # Order B2: latestOffset first, budget stops BEHIND the checkpoint
    rc = LakeTableStreamReader(t.path, False, False, max_files=1)
    end = rc.latestOffset()
    assert end == {"snapshot_id": sids[0]}  # behind the checkpoint
    with pytest.raises(Exception, match="offset regression"):
        rc.partitions(checkpointed, end)


def test_pos_delete_matches_through_symlinked_path(spark, tmp_path):
    """ADVICE(low): position-delete files record write-time ABSOLUTE
    data-file paths. A reader addressing the table through a symlink
    (different path spelling, same table) must still match the
    tombstones via the table-relative suffix — silently yielding no -D
    records is the failure mode."""
    register_source(spark)
    t = LakeTable.create(
        spark, str(tmp_path / "t"), "k bigint, v double",
        properties={"write.delete.mode": "merge-on-read"},
    )
    t.append(_df(spark, [(1, 1.0), (2, 2.0)]))
    t.delete_where("k = 1")  # MoR: position delete file

    alias = str(tmp_path / "alias")
    os.symlink(str(tmp_path / "t"), alias)
    sink, ck = str(tmp_path / "sink"), str(tmp_path / "ck")
    _drain(spark, alias, sink, ck, mode="cdc")
    rows = sorted(
        (r["k"], r["_change_type"])
        for r in spark.read.parquet(sink).collect()
    )
    assert (1, "delete") in rows, "position delete vanished under symlink"


def test_pos_delete_zero_match_raises(tmp_path):
    """A planned position-delete partition whose recorded paths match
    nothing must raise (the partition exists only because the delete
    file references that data file) — not silently drop the -D rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_catalog_bench_spark.streaming.table_source import (
        _PosDeletePartition,
        _read_pos_delete,
    )

    data = str(tmp_path / "data.parquet")
    pq.write_table(pa.table({"k": [1, 2]}), data)
    dels = str(tmp_path / "dels.parquet")
    pq.write_table(
        pa.table({"file_path": ["/somewhere/else/other.parquet"],
                  "pos": pa.array([0], type=pa.int64())}),
        dels,
    )
    part = _PosDeletePartition(
        [dels], data, [("k", "bigint", "k", None)], 1, data_rel="data.parquet"
    )
    with pytest.raises(ValueError, match="no recorded file_path matched"):
        list(_read_pos_delete(part))


@pytest.mark.parametrize("buckets", ["1", "3"])
def test_cdc_cow_changelog_nets_update(spark, tmp_path, buckets):
    """cow-changelog=true: a copy-on-write UPDATE streams as its net
    -D/+I pairs — carried-over rows cancel, whatever the bucket count.
    VERDICT r5 item 2: the one CDC feed gap a real consumer hits."""
    register_source(spark)
    t = LakeTable.create(spark, str(tmp_path / "t"), "k bigint, v double")
    t.append(_df(spark, [(1, 1.0), (2, 2.0), (3, 3.0)]))
    t.update({"v": "v + 10"}, "k >= 2")  # CoW rewrite: rows 2,3 change

    sink, ck = str(tmp_path / f"sink{buckets}"), str(tmp_path / f"ck{buckets}")
    _drain(spark, t.path, sink, ck, mode="cdc",
           **{"cow-changelog": "true", "cdc-cow-buckets": buckets})
    rows = sorted(
        (r["_change_type"], r["k"], r["v"])
        for r in spark.read.parquet(sink).collect()
    )
    assert rows == sorted([
        ("insert", 1, 1.0), ("insert", 2, 2.0), ("insert", 3, 3.0),
        ("delete", 2, 2.0), ("delete", 3, 3.0),
        ("insert", 2, 12.0), ("insert", 3, 13.0),
    ])


def test_cdc_cow_changelog_delete_nets_and_default_still_raises(spark, tmp_path):
    """A CoW DELETE nets to pure -D records; without cow-changelog the
    same commit still raises (opt-in, not a silent behavior change)."""
    register_source(spark)
    t = LakeTable.create(spark, str(tmp_path / "t"), "k bigint, v double")
    t.append(_df(spark, [(1, 1.0), (2, 2.0), (3, 3.0)]))
    t.delete_where("k = 2")  # CoW rewrite

    sink, ck = str(tmp_path / "sink"), str(tmp_path / "ck")
    _drain(spark, t.path, sink, ck, mode="cdc", **{"cow-changelog": "true"})
    rows = sorted(
        (r["_change_type"], r["k"]) for r in spark.read.parquet(sink).collect()
    )
    assert rows == sorted(
        [("insert", 1), ("insert", 2), ("insert", 3), ("delete", 2)]
    )

    r = LakeTableStreamReader(t.path, False, True)  # cdc, no cow_net
    with pytest.raises(Exception, match="cow-changelog"):
        r.partitions(r.initialOffset(), r.latestOffset())


def test_float_pushdown_keeps_nan_rows(spark, tmp_path):
    """NaN-safe float pushdown: with NaN rows present, every pushed
    predicate returns exactly what the JVM read + Spark filter would —
    = / < / <= prune files, > / >= read everything and let Spark
    apply Spark's NaN-is-greatest ordering."""
    register_source(spark)
    nan = float("nan")
    t = LakeTable.create(spark, str(tmp_path / "t"), "k bigint, v double")
    t.append(_df(spark, [(1, 1.0), (2, 2.0)]))
    t.append(_df(spark, [(3, nan), (4, 40.0)]))

    def via_source(pred):
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
        try:
            return sorted(
                r["k"] for r in
                (spark.read.format("laketable").option("path", t.path)
                 .option("filter-pushdown", "true").load().filter(pred)
                 .collect())
            )
        finally:
            spark.conf.set("spark.sql.python.filterPushdown.enabled", "false")

    def via_jvm(pred):
        return sorted(r["k"] for r in t.read().filter(pred).collect())

    for pred in ("v < 2.5", "v <= 2.0", "v = 40.0", "v > 1.5", "v >= 2.0",
                 "v in (1.0, 40.0)"):
        assert via_source(pred) == via_jvm(pred), pred
    # Spark's NaN ordering: the NaN row matches > / >= — pin it
    assert 3 in via_source("v > 100.0")
    assert 3 in via_source("v >= 100.0")
    assert 3 not in via_source("v < 100.0")


def test_float_pushdown_prunes_files(spark, tmp_path):
    """The safe float ops actually prune: v = 40.0 plans only the file
    whose stats cover 40; > / >= plan every file (NaN could hide)."""
    from pyspark.sql.datasource import EqualTo, GreaterThan, LessThan
    from pyspark.sql.types import StructType

    from iceberg_catalog_bench_spark.streaming.table_source import (
        LakeTableDataSource,
    )

    register_source(spark)
    t = LakeTable.create(spark, str(tmp_path / "t"), "k bigint, v double")
    t.append(_df(spark, [(1, 1.0), (2, 2.0)]).coalesce(1))
    t.append(_df(spark, [(3, 30.0), (4, 40.0)]).coalesce(1))
    ds = LakeTableDataSource(options={"path": t.path, "filter-pushdown": "true"})
    schema = StructType.fromDDL("k bigint, v double")

    def nparts(*filters):
        r = ds.reader(schema)
        r.pushFilters(list(filters))
        return len(r.partitions())

    assert nparts() == 2
    assert nparts(EqualTo(("v",), 40.0)) == 1
    assert nparts(LessThan(("v",), 2.5)) == 1
    assert nparts(GreaterThan(("v",), 10.0)) == 2  # never prunes on >


def test_temporal_pushdown_prunes_files_and_keeps_rows(spark, tmp_path):
    """date/timestamp predicates push PRUNE-ONLY: file stats compare in
    the footer's canonical string form (lexical = chronological), no
    Arrow row filter (Spark re-applies) — results must equal the JVM
    read, and out-of-range files must not be planned."""
    import datetime as dt

    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan
    from pyspark.sql.types import StructType

    from iceberg_catalog_bench_spark.streaming.table_source import (
        LakeTableDataSource,
    )

    register_source(spark)
    t = LakeTable.create(spark, str(tmp_path / "t"), "k bigint, ts timestamp")
    rows1 = [(1, dt.datetime(2024, 1, 1, 8)), (2, dt.datetime(2024, 1, 2, 9))]
    rows2 = [(3, dt.datetime(2024, 3, 1, 8)), (4, dt.datetime(2024, 3, 2, 9))]
    t.append(spark.createDataFrame(rows1, "k bigint, ts timestamp").coalesce(1))
    t.append(spark.createDataFrame(rows2, "k bigint, ts timestamp").coalesce(1))

    ds = LakeTableDataSource(options={"path": t.path, "filter-pushdown": "true"})
    schema = StructType.fromDDL("k bigint, ts timestamp")

    def nparts(*filters):
        r = ds.reader(schema)
        r.pushFilters(list(filters))
        return len(r.partitions())

    assert nparts() == 2
    assert nparts(LessThan(("ts",), dt.datetime(2024, 2, 1))) == 1
    assert nparts(GreaterThanOrEqual(("ts",), dt.datetime(2024, 2, 1))) == 1
    assert nparts(LessThan(("ts",), dt.datetime(2023, 1, 1))) == 0

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        got = sorted(
            r["k"] for r in
            (spark.read.format("laketable").option("path", t.path)
             .option("filter-pushdown", "true").load()
             .filter("ts >= TIMESTAMP '2024-01-02 00:00:00' "
                     "AND ts < TIMESTAMP '2024-03-02 00:00:00'").collect())
        )
    finally:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "false")
    want = sorted(
        r["k"] for r in t.read().filter(
            "ts >= TIMESTAMP '2024-01-02 00:00:00' "
            "AND ts < TIMESTAMP '2024-03-02 00:00:00'").collect()
    )
    assert got == want == [2, 3]


def test_apply_cdc_batch_reduces_replays_and_orders(spark, tmp_path):
    """LakeTable.apply_cdc_batch — the exactly-once replication
    primitive: a batch spanning three source commits reduces to the
    last action per key (upsert pair → insert wins; later delete wins
    over earlier insert), applies as ONE MoR commit, and an exact
    replay of the same batch id is skipped without double-applying."""
    feed_ddl = ("k bigint, v double, _change_type string, "
                "_commit_snapshot_id bigint")
    replica = LakeTable.create(
        spark, str(tmp_path / "r"), "k bigint, v double",
        properties={"write.delete.mode": "merge-on-read"},
    )
    replica.append(_df(spark, [(1, 1.0), (2, 2.0), (3, 3.0)]))
    batch = spark.createDataFrame(
        [
            # commit 11: upsert k=2 (retract + new image)
            (2, None, "delete", 11), (2, 20.0, "insert", 11),
            # commit 12: delete k=1
            (1, 1.0, "delete", 12),
            # commit 12: insert new k=4; commit 13 deletes it again
            (4, 4.0, "insert", 12), (4, 4.0, "delete", 13),
            # commit 13: re-inserts k=1 — later commit wins
            (1, 100.0, "insert", 13),
        ],
        feed_ddl,
    )
    snaps_before = len(replica._meta["snapshots"])
    out = replica.apply_cdc_batch(batch, on=["k"], batch_id=0, query_id="q")
    assert out is not None
    assert len(replica._meta["snapshots"]) == snaps_before + 1  # ONE commit
    state = sorted(tuple(r) for r in replica.read().collect())
    assert state == [(1, 100.0), (2, 20.0), (3, 3.0)]

    # exact replay: skipped, nothing double-applied, no new snapshot
    assert replica.apply_cdc_batch(batch, on=["k"], batch_id=0, query_id="q") is None
    assert len(replica._meta["snapshots"]) == snaps_before + 1
    assert sorted(tuple(r) for r in replica.read().collect()) == state

    # next batch id applies; a fresh query id is a fresh watermark
    b1 = spark.createDataFrame([(5, 5.0, "insert", 14)], feed_ddl)
    assert replica.apply_cdc_batch(b1, on=["k"], batch_id=1, query_id="q") is not None
    assert sorted(r["k"] for r in replica.read().collect()) == [1, 2, 3, 5]


def test_apply_cdc_batch_rejects_non_feed_frames(spark, tmp_path):
    replica = LakeTable.create(spark, str(tmp_path / "r"), "k bigint, v double")
    with pytest.raises(ValueError, match="not a CDC feed batch"):
        replica.apply_cdc_batch(_df(spark, [(1, 1.0)]), on=["k"], batch_id=0)
