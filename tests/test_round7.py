"""Round-7 hardening (ADVICE r6 items).

- instant-timestamp pushdown is gated on UTC: the datasource filter
  API delivers TimestampType literals as naive datetimes in a
  host-dependent zone while footer stats are canonical naive-UTC, so
  on a non-UTC host a pushed instant predicate could wrongly prune a
  file (silent row loss). ``timestamp_ntz``/``date`` are wall-clock on
  both sides and keep pushing everywhere.
- CoW-changelog bucketing hashes VALUE-canonicalized floats, so the
  combined multi-bucket feed always equals the single-bucket feed,
  whatever float-equality semantic pyarrow's group-by uses.
- equality-delete tombstones rebind by FIELD ID across a key-column
  rename (Iceberg semantics: equality-ids, not names) in both export
  readback legs — the Spark chain walker and the compiled DuckDB SQL.
- exported ``timestamptz`` maps to DuckDB ``TIMESTAMP WITH TIME
  ZONE``: CAST to plain TIMESTAMP would re-render the instant through
  DuckDB's session TimeZone on non-UTC hosts.
"""

import datetime as dt

import duckdb
import pytest

from iceberg_catalog_bench_spark.catalog.iceberg_export import (
    duckdb_scan_sql,
    read_via_iceberg_metadata,
    to_iceberg_metadata,
)
from iceberg_catalog_bench_spark.catalog.table import LakeTable


def test_timestamp_pushdown_gated_on_non_utc(spark, tmp_path, monkeypatch):
    """On a non-UTC host, instant-timestamp predicates must NOT push
    (prune could lose rows); timestamp_ntz and date still push."""
    import time as time_mod

    from pyspark.sql.datasource import LessThan
    from pyspark.sql.types import StructType

    from iceberg_catalog_bench_spark.streaming.table_source import (
        LakeTableDataSource,
        register_source,
    )

    register_source(spark)
    t = LakeTable.create(
        spark, str(tmp_path / "t"), "k bigint, ts timestamp, tsn timestamp_ntz"
    )
    rows = [(1, dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 1)),
            (2, dt.datetime(2024, 6, 1), dt.datetime(2024, 6, 1))]
    t.append(spark.createDataFrame(
        rows, "k bigint, ts timestamp, tsn timestamp_ntz").coalesce(1))
    ds = LakeTableDataSource(options={"path": t.path, "filter-pushdown": "true"})
    schema = StructType.fromDDL("k bigint, ts timestamp, tsn timestamp_ntz")

    def pushed(*filters):
        r = ds.reader(schema)
        r.pushFilters(list(filters))
        return r.preds

    lit = dt.datetime(2024, 3, 1)
    # UTC host (CI): instant predicates push
    assert len(pushed(LessThan(("ts",), lit))) == 1
    # simulate a non-UTC system zone: instant predicates are refused,
    # wall-clock ones still push
    monkeypatch.setattr(time_mod, "timezone", -3600)
    monkeypatch.setattr(time_mod, "altzone", -7200)
    assert pushed(LessThan(("ts",), lit)) == []
    assert len(pushed(LessThan(("tsn",), lit))) == 1
    assert len(pushed(LessThan(("k",), 2))) == 1


def test_cow_net_bucketing_matches_single_bucket_on_zero_signs(tmp_path):
    """A 0.0 → -0.0 rewrite nets to the same records whatever the
    bucket count: canonicalized hashing may not split or merge pairs
    differently than the group-by does."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_catalog_bench_spark.streaming.table_source import (
        _CowNetPartition,
        _read_cow_net,
    )

    old = str(tmp_path / "old.parquet")
    new = str(tmp_path / "new.parquet")
    pq.write_table(
        pa.table({"k": pa.array([1, 2], type=pa.int64()),
                  "v": pa.array([0.0, 2.0])}), old)
    pq.write_table(
        pa.table({"k": pa.array([1, 2], type=pa.int64()),
                  "v": pa.array([-0.0, 2.0])}), new)
    proj = [("k", "bigint", "k", None), ("v", "double", "v", None)]
    out_cols = [("k", "bigint"), ("v", "double")]

    def feed(nbuckets):
        recs = []
        for b in range(nbuckets):
            part = _CowNetPartition(
                [(old, proj)], [(new, proj)], out_cols, b, nbuckets, 7)
            for batch in _read_cow_net(part):
                d = batch.to_pydict()
                recs += list(zip(
                    d["_change_type"], d["k"],
                    # compare the SIGN BIT too — that's the point
                    [str(v) for v in d["v"]],
                ))
        return sorted(recs)

    single = feed(1)
    assert feed(4) == single  # pandas hashes the two zeros to buckets 0 and 2
    assert feed(8) == single
    assert [r for r in single if r[1] == 2] == []  # carried row cancels


def test_eq_delete_key_rename_binds_by_field_id(spark, tmp_path):
    """Rename the equality-key column AFTER the delete file was
    written: both readback legs must still apply the tombstone by
    field id (the delete parquet keeps the old column name)."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), "k bigint, v double",
        properties={"write.update.mode": "merge-on-read"},
    )
    t.append(spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0)], "k bigint, v double"))
    t.upsert_by_keys(
        spark.createDataFrame([(2, 20.0)], "k bigint, v double"), on=["k"])
    t.rename_column("k", "id")
    native = sorted(tuple(r) for r in t.read().collect())
    assert native == [(1, 1.0), (2, 20.0), (3, 3.0)]

    meta = to_iceberg_metadata(t)
    walked = sorted(
        tuple(r) for r in read_via_iceberg_metadata(spark, meta).collect())
    assert walked == native
    duck = sorted(tuple(r) for r in duckdb.sql(duckdb_scan_sql(meta)).fetchall())
    assert duck == native


def test_duckdb_scan_keeps_instant_semantics_for_timestamptz(spark, tmp_path):
    """timestamptz columns come back from the DuckDB leg as instants
    (TIMESTAMP WITH TIME ZONE), equal to the native read's UTC values
    — not re-rendered through DuckDB's session TimeZone."""
    t = LakeTable.create(spark, str(tmp_path / "t"), "k bigint, ts timestamp")
    t.append(spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 8, 30)), (2, dt.datetime(2024, 6, 1, 12, 0))],
        "k bigint, ts timestamp"))
    meta = to_iceberg_metadata(t)
    sql = duckdb_scan_sql(meta)
    assert "TIMESTAMP WITH TIME ZONE" in sql
    con = duckdb.connect()
    con.execute("SET TimeZone='America/New_York'")  # hostile session zone
    got = sorted(
        (k, ts.astimezone(dt.timezone.utc).replace(tzinfo=None))
        for k, ts in con.execute(sql).fetchall()
    )
    native = sorted(tuple(r) for r in t.read().collect())
    assert got == native


def _sink_writer(path):
    from pyspark.sql.types import StructType

    from iceberg_catalog_bench_spark.streaming.table_source import (
        LakeTableDataSource,
    )

    ds = LakeTableDataSource(options={"path": path, "sink-query-id": "q7"})
    return ds.streamWriter(StructType.fromDDL("k bigint, v double"), False)


def _task_batches():
    import pyarrow as pa

    yield pa.record_batch(
        {"k": pa.array([10, 11], type=pa.int64()), "v": pa.array([1.5, 2.5])}
    )


def test_sink_mid_stream_add_column_commits_old_shape(spark, tmp_path):
    """VERDICT r6 item 5 (the safe half): a column added mid-stream —
    after the writer captured its shape, before the batch commits —
    does NOT break the sink. The file is stamped with its true writing
    version; reads project the new column's declared default onto it."""
    from iceberg_catalog_bench_spark.streaming.table_source import (
        _write_task_file,
    )

    t = LakeTable.create(spark, str(tmp_path / "t"), "k bigint, v double")
    w = _sink_writer(t.path)
    msg = _write_task_file(t.path, w.columns, _task_batches())
    t.add_column("tag", "string", default="base")  # mid-stream evolution
    w.commit([msg], 0)

    t._reload()
    rows = sorted(tuple(r) for r in t.read().collect())
    assert rows == [(10, 1.5, "base"), (11, 2.5, "base")]


def test_sink_refuses_commit_after_table_replace(spark, tmp_path):
    """VERDICT r6 item 5 (the refuse half): CREATE OR REPLACE
    re-numbers schema history, so a writer captured against the OLD
    table must fail loudly at commit instead of stamping its files
    with a version that now means a different shape."""
    import shutil

    import pytest as _pytest

    from iceberg_catalog_bench_spark.streaming.table_source import (
        _write_task_file,
    )

    t = LakeTable.create(spark, str(tmp_path / "t"), "k bigint, v double")
    w = _sink_writer(t.path)
    msg = _write_task_file(t.path, w.columns, _task_batches())
    shutil.rmtree(t.path)  # CREATE OR REPLACE = drop + fresh create
    LakeTable.create(spark, t.path, "k bigint, label string")
    with _pytest.raises(ValueError, match="replaced under"):
        w.commit([msg], 0)


def test_sink_restart_picks_up_evolved_schema(spark, tmp_path):
    """After a checkpoint restart the sink re-captures the CURRENT
    schema: the evolved 3-column frame streams in, while the old
    2-column frame is now refused."""
    import pytest as _pytest

    from pyspark.sql.types import StructType

    from iceberg_catalog_bench_spark.streaming.table_source import (
        LakeTableDataSource,
    )

    t = LakeTable.create(spark, str(tmp_path / "t"), "k bigint, v double")
    t.add_column("tag", "string", default="base")
    ds = LakeTableDataSource(options={"path": t.path, "sink-query-id": "q7"})
    with _pytest.raises(ValueError, match="does not match table schema"):
        ds.streamWriter(StructType.fromDDL("k bigint, v double"), False)
    w = ds.streamWriter(
        StructType.fromDDL("k bigint, v double, tag string"), False)
    assert [c for c, _t in w.columns] == ["k", "v", "tag"]


# ---- MERGE ... WHEN NOT MATCHED BY SOURCE (Spark 3.4+ extension) ----

def _merge_fixture(spark, tmp_path, props=None):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), "k bigint, v double, tag string",
        properties=props or {},
    )
    t.append(spark.createDataFrame(
        [(1, 1.0, "old"), (2, 2.0, "old"), (3, 3.0, "old"), (4, 4.0, "keep")],
        "k bigint, v double, tag string",
    ))
    src = spark.createDataFrame(
        [(2, 20.0, "src"), (5, 50.0, "src")], "k bigint, v double, tag string")
    return t, src


def test_merge_by_source_delete_cow(spark, tmp_path):
    """Unmatched target rows delete; matched update; unmatched source
    inserts — full Spark-3.4 MERGE semantics in one CoW commit."""
    t, src = _merge_fixture(spark, tmp_path)
    t.merge(src, on=["k"], when_matched_update="*",
            when_not_matched_insert=True,
            when_not_matched_by_source_delete=True)
    rows = sorted(tuple(r) for r in t.read().collect())
    assert rows == [(2, 20.0, "src"), (5, 50.0, "src")]


def test_merge_by_source_delete_condition_cow(spark, tmp_path):
    """A conditional by-source delete touches ONLY qualifying rows
    (and only their files get rewritten)."""
    t, src = _merge_fixture(spark, tmp_path)
    t.merge(src, on=["k"], when_matched_update="*",
            when_not_matched_insert=False,
            when_not_matched_by_source_delete="tag = 'old'")
    rows = sorted(tuple(r) for r in t.read().collect())
    assert rows == [(2, 20.0, "src"), (4, 4.0, "keep")]


def test_merge_by_source_update_cow(spark, tmp_path):
    """By-source UPDATE marks unmatched target rows; delete clause
    runs first (Spark clause order)."""
    t, src = _merge_fixture(spark, tmp_path)
    t.merge(src, on=["k"], when_matched_update="*",
            when_not_matched_insert=True,
            when_not_matched_by_source_delete="tag = 'keep'",
            when_not_matched_by_source_update={"tag": "'stale'"})
    rows = sorted(tuple(r) for r in t.read().collect())
    assert rows == [
        (1, 1.0, "stale"), (2, 20.0, "src"), (3, 3.0, "stale"),
        (5, 50.0, "src"),
    ]


def test_merge_by_source_delete_mor(spark, tmp_path):
    """Merge-on-read: by-source rows position-tombstone (no rewrite of
    untouched files); updated anti rows re-append images."""
    t, src = _merge_fixture(
        spark, tmp_path, props={"write.merge.mode": "merge-on-read"})
    n_files_before = len(t._snapshot().files)
    snap = t.merge(src, on=["k"], when_matched_update="*",
                   when_not_matched_insert=True,
                   when_not_matched_by_source_update={"tag": "'stale'"})
    rows = sorted(tuple(r) for r in t.read().collect())
    assert rows == [
        (1, 1.0, "stale"), (2, 20.0, "src"), (3, 3.0, "stale"),
        (4, 4.0, "stale"), (5, 50.0, "src"),
    ]
    assert snap.summary["mode"] == "merge-on-read"
    assert snap.summary["by_source_rows"] == 3
    # originals still present + tombstoned, not rewritten
    assert {e.path for e in t._snapshot().files} >= {
        e.path for e in t._snapshot().files[:n_files_before]}
    assert t._snapshot().delete_files


def test_merge_by_source_sql(spark, tmp_path):
    """The SQL spelling routes through the frontend."""
    from iceberg_catalog_bench_spark.engine import SqlEngine

    e = SqlEngine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE mt (k bigint, v double)")
    e.execute("INSERT INTO mt VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
    e.execute(
        "MERGE INTO mt AS t USING (VALUES (2, 20.0)) AS s(k, v) "
        "ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET t.v = s.v "
        "WHEN NOT MATCHED BY SOURCE AND t.k = 3 THEN DELETE"
    )
    rows = e.execute("SELECT k, v FROM mt ORDER BY k")[0].rows
    assert [(r["k"], r["v"]) for r in rows] == [(1, 1.0), (2, 20.0)]


def test_merge_matched_delete_condition_sql(spark, tmp_path):
    """WHEN MATCHED AND <cond> THEN DELETE routes the condition; a
    conditional UPDATE (supported as of late round 7) applies only to
    matched rows passing its condition."""
    from iceberg_catalog_bench_spark.engine import SqlEngine

    e = SqlEngine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE md (k bigint, v double)")
    e.execute("INSERT INTO md VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
    e.execute(
        "MERGE INTO md AS t USING (VALUES (2, 0.0), (3, 30.0)) AS s(k, v) "
        "ON t.k = s.k "
        "WHEN MATCHED AND s.v = 0.0 THEN DELETE"
    )
    rows = e.execute("SELECT k, v FROM md ORDER BY k")[0].rows
    assert [(r["k"], r["v"]) for r in rows] == [(1, 1.0), (3, 3.0)]
    e.execute(
        "MERGE INTO md AS t USING (VALUES (1, 9.0), (3, -1.0)) AS s(k, v) "
        "ON t.k = s.k WHEN MATCHED AND s.v > 0 THEN UPDATE SET v = s.v"
    )
    rows = e.execute("SELECT k, v FROM md ORDER BY k")[0].rows
    assert [(r["k"], r["v"]) for r in rows] == [(1, 9.0), (3, 3.0)]


def test_concurrent_streaming_sinks_same_table(spark, tmp_path):
    """Two streaming queries with DISTINCT sink identities write one
    table concurrently: every row lands exactly once (commit conflicts
    re-base, per-query batch watermarks never cross)."""
    from iceberg_catalog_bench_spark.streaming.table_source import (
        register_source,
    )

    register_source(spark)
    srcs = []
    for i in (0, 1):
        t = LakeTable.create(
            spark, str(tmp_path / f"src{i}"), "k bigint, v double")
        for j in range(3):
            t.append(spark.createDataFrame(
                [(i * 1000 + j * 10 + x, float(x)) for x in range(5)],
                "k bigint, v double"))
        srcs.append(t)
    dst = LakeTable.create(spark, str(tmp_path / "dst"), "k bigint, v double")

    qs = []
    for i, src in enumerate(srcs):
        qs.append(
            spark.readStream.format("laketable").option("path", src.path)
            .load()
            .writeStream.format("laketable").option("path", dst.path)
            .option("sink-query-id", f"writer-{i}")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / f"ck{i}")).start()
        )
    for q in qs:
        q.awaitTermination(300)
    dst._reload()
    got = sorted(r["k"] for r in dst.read().collect())
    want = sorted(
        r["k"] for src in srcs for r in src.read().collect())
    assert got == want  # no lost rows, no duplicates
    # each writer's batch watermark advanced independently
    assert dst.last_streaming_batch("writer-0") is not None
    assert dst.last_streaming_batch("writer-1") is not None


def test_capped_available_now_is_paced_and_converges(spark, tmp_path):
    """max-files-per-trigger × Trigger.AvailableNow: the Python
    DataSource API has no admission-control hooks, so each invocation
    is ONE capped batch — a PACED drain. Re-invocations on the same
    checkpoint converge to the head with no loss and no duplicates
    (the documented contract; an uncapped reader drains fully in one
    run)."""
    from iceberg_catalog_bench_spark.streaming.table_source import (
        register_source,
    )

    register_source(spark)
    t = LakeTable.create(spark, str(tmp_path / "src"), "k bigint, v double")
    for j in range(3):
        t.append(spark.createDataFrame(
            [(j * 10 + x, float(x)) for x in range(5)],
            "k bigint, v double").coalesce(1))
    dst = LakeTable.create(spark, str(tmp_path / "dst"), "k bigint, v double")

    def drain():
        q = (
            spark.readStream.format("laketable").option("path", t.path)
            .option("max-files-per-trigger", "1").load()
            .writeStream.format("laketable").option("path", dst.path)
            .option("sink-query-id", "paced")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ck")).start()
        )
        q.awaitTermination(300)
        dst._reload()
        return sorted(r["k"] for r in dst.read().collect())

    counts = [len(drain()) for _ in range(4)]
    assert counts == [5, 10, 15, 15]  # paced, convergent, no dupes
    want = sorted(r["k"] for r in t.read().collect())
    assert drain() == want


def test_merge_by_source_conditional_delete_prunes_files(spark, tmp_path):
    """The by-source probe selects FILES by the delete condition: a
    conditional by-source delete rewrites only files holding
    qualifying anti rows — the other files never rewrite (the 100 TB
    property; an unconditional by-source clause touches the whole
    table by definition)."""
    t = LakeTable.create(spark, str(tmp_path / "t"), "k bigint, tag string")
    t.append(spark.createDataFrame(
        [(1, "old"), (2, "old")], "k bigint, tag string").coalesce(1))
    t.append(spark.createDataFrame(
        [(3, "keep"), (4, "keep")], "k bigint, tag string").coalesce(1))
    src = spark.createDataFrame([(99, "src")], "k bigint, tag string")
    snap = t.merge(src, on=["k"], when_not_matched_insert=False,
                   when_not_matched_by_source_delete="tag = 'old'")
    assert snap.summary["rewritten_files"] == 1  # only the 'old' file
    assert sorted(r["k"] for r in t.read().collect()) == [3, 4]


# ---- Iceberg procedure-surface completion (round 7) ----

def test_add_files_zero_copy_import(spark, tmp_path):
    """CALL system.add_files: external parquet joins an EXISTING
    table metadata-only — manifests point at the ORIGINAL files,
    footer stats prune, schema mismatches refuse."""
    ext = str(tmp_path / "ext")
    spark.createDataFrame(
        [(10, 10.0), (11, 11.0)], "k bigint, v double"
    ).coalesce(1).write.parquet(ext)
    t = LakeTable.create(spark, str(tmp_path / "t"), "k bigint, v double")
    t.append(spark.createDataFrame([(1, 1.0)], "k bigint, v double"))
    snap = t.add_files(ext)
    assert snap.summary["added_rows"] == 2
    assert sorted(r["k"] for r in t.read().collect()) == [1, 10, 11]
    # zero copy: the imported entry is the ORIGINAL absolute path
    ext_entries = [e for e in t._snapshot().files if e.path.startswith(ext)]
    assert len(ext_entries) == 1 and ext_entries[0].stats

    bad = str(tmp_path / "bad")
    spark.createDataFrame([("x", 1.0)], "k string, v double") \
        .coalesce(1).write.parquet(bad)
    with pytest.raises(ValueError, match="schema mismatch"):
        t.add_files(bad)


def test_rollback_to_timestamp_and_set_current(spark, tmp_path):
    import time as _time

    t = LakeTable.create(spark, str(tmp_path / "t"), "k bigint")
    s1 = t.append(spark.createDataFrame([(1,)], "k bigint"))
    _time.sleep(0.05)
    cut_ms = int(_time.time() * 1000)
    _time.sleep(0.05)
    t.append(spark.createDataFrame([(2,)], "k bigint"))
    t.rollback_to_timestamp(cut_ms)
    assert sorted(r["k"] for r in t.read().collect()) == [1]
    # jump forward again by explicit snapshot id
    heads = [s["snapshot_id"] for s in t._meta["snapshots"]]
    t.set_current_snapshot(heads[1])  # the 2-row snapshot
    assert sorted(r["k"] for r in t.read().collect()) == [1, 2]
    anc = [r["snapshot_id"] for r in t.ancestors_of().collect()]
    assert anc[0] == t._snapshot().snapshot_id
    assert s1.snapshot_id in anc


def test_add_files_and_ancestors_sql(spark, tmp_path):
    from iceberg_catalog_bench_spark.engine import SqlEngine

    ext = str(tmp_path / "ext")
    spark.createDataFrame([(5, 5.0)], "k bigint, v double") \
        .coalesce(1).write.parquet(ext)
    e = SqlEngine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE at (k bigint, v double)")
    e.execute("INSERT INTO at VALUES (1, 1.0)")
    r = e.execute(
        f"CALL system.add_files(table => 'at', "
        f"source_table => '`parquet`.`{ext}`')")[0]
    assert r.rows[0]["added_rows_count"] == 1
    assert e.execute("SELECT COUNT(*) AS c FROM at")[0].rows[0]["c"] == 2
    anc = e.execute("CALL system.ancestors_of(table => 'at')")[0].rows
    assert len(anc) == 2  # insert + import commits


def test_show_create_table_tblproperties_partitions(spark, tmp_path):
    """SHOW CREATE TABLE reconstructs live DDL (evolution included);
    SHOW TBLPROPERTIES / SHOW PARTITIONS read metadata."""
    from iceberg_catalog_bench_spark.engine import SqlEngine

    e = SqlEngine(spark, str(tmp_path / "wh"))
    e.execute(
        "CREATE TABLE st (id bigint, cat string, v double) "
        "PARTITIONED BY (cat, bucket(4, id)) "
        "TBLPROPERTIES ('write.delete.mode'='merge-on-read')"
    )
    e.execute("INSERT INTO st VALUES (1, 'a', 1.0), (2, 'b', 2.0)")
    e.execute("ALTER TABLE st ADD COLUMN tag string DEFAULT 'x'")
    ddl = e.execute("SHOW CREATE TABLE st")[0].rows[0]["createtab_stmt"]
    assert "tag string" in ddl  # evolution reflected
    assert "PARTITIONED BY (cat, bucket(4, id))" in ddl
    assert "'write.delete.mode'='merge-on-read'" in ddl
    props = {r["key"]: r["value"]
             for r in e.execute("SHOW TBLPROPERTIES st")[0].rows}
    assert props["write.delete.mode"] == "merge-on-read"
    parts = e.execute("SHOW PARTITIONS st")[0].rows
    assert len(parts) == 2  # one per cat value


# ---- metadata delta encoding (round 7) ----

def test_metadata_delta_encoding_roundtrip(spark, tmp_path):
    """Disk metadata delta-encodes snapshot file lists against
    parents; loads expand them back — time travel, deletes, expiry
    fallback, and pre-delta metadata all keep working."""
    import json as _json
    import os as _os

    from iceberg_catalog_bench_spark.catalog.table import (
        _META_DIR,
        _META_FILE,
        expand_meta,
    )

    t = LakeTable.create(spark, str(tmp_path / "t"), "k bigint, v double")
    snaps = []
    for j in range(5):
        snaps.append(t.append(spark.createDataFrame(
            [(j * 10 + x, float(x)) for x in range(3)],
            "k bigint, v double").coalesce(1)))
    t.delete_where("k = 21")  # CoW rewrite commit

    raw = _json.load(open(_os.path.join(t.path, _META_DIR, _META_FILE)))
    deltas = [s for s in raw["snapshots"] if "files_delta" in s]
    assert len(deltas) >= 4, "append commits must delta-encode"
    # the delta form is strictly smaller than the expanded form
    assert len(_json.dumps(raw)) < len(_json.dumps(expand_meta(
        _json.loads(_json.dumps(raw)))))

    t2 = LakeTable.load(spark, t.path)
    assert t2.read().count() == 14
    assert t2.read(snapshot_id=snaps[2].snapshot_id).count() == 9

    # expiry removes delta bases mid-chain: the re-encode falls back
    # to full lists where needed and everything still loads
    t2.expire_snapshots(retain_last=2)
    t3 = LakeTable.load(spark, t.path)
    assert t3.read().count() == 14

    # pre-delta (fully materialized) metadata still loads: write the
    # expanded form back to disk and reload
    full = _json.dumps(t3._meta, default=str)
    with open(_os.path.join(t.path, _META_DIR, _META_FILE), "w") as fh:
        fh.write(full)
    assert LakeTable.load(spark, t.path).read().count() == 14


def test_snapshot_procedure_zero_copy_clone(spark, tmp_path):
    """CALL system.snapshot: an independent zero-copy fork — shared
    data files read in place, schema history carried (old-version
    files project through defaults), divergent writes stay isolated,
    and a source with outstanding tombstones refuses."""
    src = LakeTable.create(
        spark, str(tmp_path / "src"), "k bigint, v double",
        partition_by=["bucket(4, k)"],
    )
    src.append(spark.createDataFrame(
        [(1, 1.0), (2, 2.0)], "k bigint, v double"))
    src.add_column("tag", "string", default="base")
    src.append(spark.createDataFrame(
        [(3, 3.0, "late")], "k bigint, v double, tag string"))

    clone = LakeTable.snapshot_of(src, str(tmp_path / "clone"))
    assert sorted(tuple(r) for r in clone.read().collect()) == [
        (1, 1.0, "base"), (2, 2.0, "base"), (3, 3.0, "late")]
    # zero copy: clone entries point into the source tree
    assert all(e.path.startswith(src.path) for e in clone._snapshot().files)

    # divergence is isolated both ways
    clone.append(spark.createDataFrame(
        [(4, 4.0, "clone-only")], "k bigint, v double, tag string"))
    src.delete_where("k = 1")
    assert sorted(r["k"] for r in clone.read().collect()) == [1, 2, 3, 4]
    assert sorted(r["k"] for r in src.read().collect()) == [2, 3]

    mor = LakeTable.create(
        spark, str(tmp_path / "mor"), "k bigint",
        properties={"write.delete.mode": "merge-on-read"})
    mor.append(spark.createDataFrame([(1,), (2,)], "k bigint"))
    mor.delete_where("k = 1")
    with pytest.raises(ValueError, match="outstanding"):
        LakeTable.snapshot_of(mor, str(tmp_path / "mor-clone"))


def test_snapshot_procedure_sql(spark, tmp_path):
    from iceberg_catalog_bench_spark.engine import SqlEngine

    e = SqlEngine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE base (k bigint)")
    e.execute("INSERT INTO base VALUES (1), (2)")
    r = e.execute(
        "CALL system.snapshot(source_table => 'base', table => 'fork')")[0]
    assert r.rows[0]["imported_files_count"] >= 1
    assert e.execute("SELECT COUNT(*) AS c FROM fork")[0].rows[0]["c"] == 2
    e.execute("INSERT INTO fork VALUES (3)")
    assert e.execute("SELECT COUNT(*) AS c FROM base")[0].rows[0]["c"] == 2


def test_merge_by_source_only_mor_no_matches(spark, tmp_path):
    """Merge-on-read with ZERO matched rows and only a by-source
    clause: the copy-on-write rewrite branch must NOT fire alongside
    the tombstone path (it would duplicate every surviving row)."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), "k bigint, tag string",
        properties={"write.merge.mode": "merge-on-read"})
    t.append(spark.createDataFrame(
        [(1, "old"), (2, "keep")], "k bigint, tag string"))
    src = spark.createDataFrame([(99, "src")], "k bigint, tag string")
    t.merge(src, on=["k"], when_not_matched_insert=False,
            when_not_matched_by_source_delete="tag = 'old'")
    rows = sorted(tuple(r) for r in t.read().collect())
    assert rows == [(2, "keep")]  # no duplicates, no lost rows


# --- INSERT OVERWRITE / ReplacePartitions --------------------------------


def test_overwrite_partitions_dynamic(spark, tmp_path):
    """Dynamic overwrite replaces exactly the partitions the incoming
    rows land in; other partitions' files carry over by reference."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), "k bigint, cat string, v double",
        partition_by=["identity(cat)"],
    )
    t.append(spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0), (4, "c", 4.0)],
        "k bigint, cat string, v double"))
    before = {f.path for f in t._snapshot().files if f.partition["_p_identity_cat"] == "b"}
    snap = t.overwrite_partitions(spark.createDataFrame(
        [(10, "a", 10.0), (11, "a", 11.0)], "k bigint, cat string, v double"))
    assert snap.summary["replaced-partitions"] == 1
    got = sorted((r.k, r.cat) for r in t.read().collect())
    assert got == [(3, "b"), (4, "c"), (10, "a"), (11, "a")]
    # partition b's file carried over untouched (same path, no rewrite)
    after = {f.path for f in t._snapshot().files if f.partition["_p_identity_cat"] == "b"}
    assert after == before


def test_overwrite_partitions_static_and_truncate(spark, tmp_path):
    """Static PARTITION (col=val) clears and replaces the named
    partition — assigning the literal to incoming rows, and truncating
    the partition when the incoming set is empty."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), "k bigint, cat string, v double",
        partition_by=["identity(cat)"],
    )
    t.append(spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "k bigint, cat string, v double"))
    # rows WITHOUT the partition column: assigned the static literal
    t.overwrite_partitions(
        spark.createDataFrame([(9, 9.0)], "k bigint, v double")
        .selectExpr("k", "CAST(NULL AS STRING) AS cat", "v"),
        static={"cat": "a"},
    )
    got = sorted((r.k, r.cat) for r in t.read().collect())
    assert got == [(2, "b"), (9, "a")]
    # empty incoming set = TRUNCATE of the named partition
    t.overwrite_partitions(
        spark.createDataFrame([], "k bigint, cat string, v double"),
        static={"cat": "b"},
    )
    assert [r.k for r in t.read().collect()] == [9]


def test_overwrite_partitions_unpartitioned_full_replace(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), "k bigint, v double")
    t.append(spark.createDataFrame([(1, 1.0)], "k bigint, v double"))
    t.overwrite_partitions(
        spark.createDataFrame([(2, 2.0)], "k bigint, v double"))
    assert [r.k for r in t.read().collect()] == [2]


def test_overwrite_partitions_refuses_spec_generation_mismatch(spark, tmp_path):
    """Files written before ADD PARTITION FIELD record different
    partition keys — value-matching them is impossible, so the
    overwrite refuses instead of silently keeping stale rows."""
    t = LakeTable.create(spark, str(tmp_path / "t"), "k bigint, cat string")
    t.append(spark.createDataFrame([(1, "a")], "k bigint, cat string"))
    t.add_partition_field("identity(cat)")
    with pytest.raises(ValueError, match="spec generation|partition-spec"):
        t.overwrite_partitions(
            spark.createDataFrame([(2, "a")], "k bigint, cat string"))


def test_overwrite_partitions_static_requires_identity(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), "k bigint, cat string",
        partition_by=["bucket(4, k)"],
    )
    with pytest.raises(ValueError, match="identity"):
        t.overwrite_partitions(
            spark.createDataFrame([(1, "a")], "k bigint, cat string"),
            static={"cat": "a"},
        )


def test_overwrite_partitions_drops_replaced_tombstones(spark, tmp_path):
    """MoR position deletes on a replaced partition's files become
    dangling and are dropped by the commit's carry-over cleanup;
    tombstones on carried partitions keep applying."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), "k bigint, cat string, v double",
        partition_by=["identity(cat)"],
        properties={"write.delete.mode": "merge-on-read"},
    )
    t.append(spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0), (4, "b", 4.0)],
        "k bigint, cat string, v double"))
    t.delete_where("k = 1")   # tombstone in partition a
    t.delete_where("k = 3")   # tombstone in partition b
    assert len(t._snapshot().delete_files) == 2
    snap = t.overwrite_partitions(spark.createDataFrame(
        [(10, "a", 10.0)], "k bigint, cat string, v double"))
    got = sorted((r.k, r.cat) for r in t.read().collect())
    assert got == [(4, "b"), (10, "a")]
    # partition a's tombstone was dropped with its file; b's remains
    remaining = snap.delete_files
    assert len(remaining) == 1


def test_sql_insert_overwrite(spark, tmp_path):
    """SQL spellings: dynamic, static with literal assignment, and
    VALUES sources."""
    from iceberg_catalog_bench_spark.engine.sql_frontend import SqlEngine

    e = SqlEngine(spark, str(tmp_path / "wh"))
    e.execute(
        "CREATE TABLE iot (k BIGINT, cat STRING, v DOUBLE) "
        "PARTITIONED BY (cat)"
    )
    e.execute("INSERT INTO iot VALUES (1, 'a', 1.0), (2, 'b', 2.0)")
    r = e.execute("INSERT OVERWRITE iot VALUES (10, 'a', 10.0)")[0]
    assert r.metadata["replaced_partitions"] == 1
    rows = e.execute("SELECT k, cat FROM iot ORDER BY k")[0].rows
    assert [(x["k"], x["cat"]) for x in rows] == [(2, "b"), (10, "a")]
    e.execute(
        "INSERT OVERWRITE iot PARTITION (cat = 'b') VALUES (20, 20.0)"
    )
    rows = e.execute("SELECT k, cat FROM iot ORDER BY k")[0].rows
    assert [(x["k"], x["cat"]) for x in rows] == [(10, "a"), (20, "b")]


def test_publish_changes_by_wap_id(spark, tmp_path):
    """CALL system.publish_changes publishes the snapshot staged with
    the given wap.id; double publish and unknown ids refuse."""
    from iceberg_catalog_bench_spark.engine import SqlEngine

    t = LakeTable.create(spark, str(tmp_path / "t"), "k bigint, v double")
    t.append(spark.createDataFrame([(1, 1.0)], "k bigint, v double"))
    t.create_branch("audit")
    t.append(spark.createDataFrame([(2, 2.0)], "k bigint, v double"),
             branch="audit", wap_id="etl-7")
    # main advanced meanwhile — fast_forward would refuse; publish by id
    t.append(spark.createDataFrame([(3, 3.0)], "k bigint, v double"))
    snap = t.publish_changes("etl-7")
    assert snap.summary["published-wap-id"] == "etl-7"
    assert sorted(r.k for r in t.read().collect()) == [1, 2, 3]
    with pytest.raises(ValueError, match="already published"):
        t.publish_changes("etl-7")
    with pytest.raises(KeyError, match="no staged snapshot"):
        t.publish_changes("nope")

    # the SQL CALL spelling
    e = SqlEngine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE wt (k BIGINT)")
    e.execute("INSERT INTO wt VALUES (1)")
    e.execute("ALTER TABLE wt CREATE BRANCH audit")
    wt = e.table("wt")
    wt.append(spark.createDataFrame([(5,)], "k bigint"),
              branch="audit", wap_id="w1")
    r = e.execute("CALL system.publish_changes(table => 'wt', wap_id => 'w1')")[0]
    assert r.rows[0]["wap_id"] == "w1"
    assert sorted(x["k"] for x in e.execute("SELECT k FROM wt")[0].rows) == [1, 5]


def test_rewrite_data_files_where_scopes_compaction(spark, tmp_path):
    """rewrite_data_files(where=...) compacts only files that may
    match — the other partitions' fragments stay in place."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), "k bigint, cat string",
        partition_by=["identity(cat)"],
    )
    for i in range(3):  # 3 small files per partition value
        t.append(spark.createDataFrame(
            [(i, "a"), (i, "b")], "k bigint, cat string"))
    before = t._snapshot().files
    assert len(before) == 6
    res = t.rewrite_data_files(where="cat = 'a'")
    assert res["rewritten_data_files_count"] == 3
    after = t._snapshot().files
    a = [f for f in after if f.partition["_p_identity_cat"] == "a"]
    b = {f.path for f in after if f.partition["_p_identity_cat"] == "b"}
    assert len(a) == 1
    assert b == {f.path for f in before if f.partition["_p_identity_cat"] == "b"}
    assert sorted((r.k, r.cat) for r in t.read().collect()) == sorted(
        (i, c) for i in range(3) for c in ("a", "b"))

    # SQL spelling with where =>
    from iceberg_catalog_bench_spark.engine import SqlEngine
    e = SqlEngine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE rw (k BIGINT, cat STRING) PARTITIONED BY (cat)")
    e.execute("INSERT INTO rw VALUES (1, 'x'), (2, 'y')")
    e.execute("INSERT INTO rw VALUES (3, 'x'), (4, 'y')")
    r = e.execute(
        "CALL system.rewrite_data_files(table => 'rw', where => 'cat = ''x''')"
    )[0]
    assert r.rows[0]["rewritten_data_files_count"] == 2


def test_overwrite_partitions_static_null_refuses(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), "k bigint, cat string",
        partition_by=["identity(cat)"],
    )
    with pytest.raises(ValueError, match="non-null"):
        t.overwrite_partitions(
            spark.createDataFrame([(1, "a")], "k bigint, cat string"),
            static={"cat": None},
        )


def test_overwrite_partitions_dynamic_replaces_null_partition(spark, tmp_path):
    """Rows whose partition source is NULL land in the hive null
    partition; a dynamic overwrite carrying nulls replaces it."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), "k bigint, cat string",
        partition_by=["identity(cat)"],
    )
    t.append(spark.createDataFrame(
        [(1, None), (2, "a")], "k bigint, cat string"))
    t.overwrite_partitions(spark.createDataFrame(
        [(10, None)], "k bigint, cat string"))
    got = sorted(((r.k, r.cat) for r in t.read().collect()),
                 key=lambda x: x[0])
    assert got == [(2, "a"), (10, None)]


def test_overwrite_partitions_on_branch_wap(spark, tmp_path):
    """The WAP backfill: a dynamic overwrite staged on the audit
    branch replaces the partition on the BRANCH head only — main is
    untouched until fast_forward publishes it."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), "k bigint, cat string",
        partition_by=["identity(cat)"],
    )
    t.append(spark.createDataFrame(
        [(1, "a"), (2, "b")], "k bigint, cat string"))
    t.create_branch("audit")
    t.overwrite_partitions(
        spark.createDataFrame([(10, "a")], "k bigint, cat string"),
        branch="audit",
    )
    # main still sees the old partition a
    assert sorted(r.k for r in t.read().collect()) == [1, 2]
    t.fast_forward("audit")
    assert sorted(r.k for r in t.read().collect()) == [2, 10]
    with pytest.raises(KeyError, match="no branch"):
        t.overwrite_partitions(
            spark.createDataFrame([(1, "a")], "k bigint, cat string"),
            branch="nope",
        )


def test_explain_statement(spark, tmp_path):
    from iceberg_catalog_bench_spark.engine import SqlEngine

    e = SqlEngine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE ex (k BIGINT, v DOUBLE)")
    e.execute("INSERT INTO ex VALUES (1, 1.0)")
    r = e.execute("EXPLAIN SELECT k, SUM(v) AS s FROM ex GROUP BY k")[0]
    assert "Physical Plan" in r.rows[0]["plan"]
    r = e.execute("EXPLAIN FORMATTED SELECT * FROM ex WHERE k = 1")[0]
    assert r.metadata["mode"] == "formatted"
    assert "PushedFilters" in r.rows[0]["plan"] or "Filter" in r.rows[0]["plan"]


def test_rewrite_sort_linear_layout(spark, tmp_path):
    """strategy=>'sort' with a plain column order: leading-column
    footer ranges become disjoint, so a point predicate prunes to ~one
    file; values and row counts are preserved."""
    from iceberg_catalog_bench_spark.engine import SqlEngine

    t = LakeTable.create(spark, str(tmp_path / "t"), "k bigint, v double")
    import random
    rng = random.Random(7)
    rows = [(rng.randrange(10_000), float(i)) for i in range(4_000)]
    t.append(spark.createDataFrame(rows, "k bigint, v double").repartition(8))
    res = t.rewrite_sort(["k"], target_files=8)
    assert res["added_data_files_count"] >= 4
    snap = t._snapshot()
    spans = sorted((f.stats["k"][0], f.stats["k"][1]) for f in snap.files)
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, "leading-column ranges must be disjoint"
    assert t.read().count() == 4_000
    kept = t._prune_files(snap.files, f"k = {rows[0][0]}")
    assert len(kept) <= 2  # point predicate prunes to the covering file(s)

    # SQL spelling: plain sort_order (non-zorder)
    e = SqlEngine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE rs (k BIGINT, v DOUBLE)")
    e.execute("INSERT INTO rs VALUES (3, 1.0), (1, 2.0), (2, 3.0)")
    r = e.execute(
        "CALL system.rewrite_data_files(table => 'rs', strategy => 'sort', "
        "sort_order => 'k DESC', target_files => 1)"
    )[0]
    assert r.rows[0]["added_data_files_count"] == 1
    assert [x["k"] for x in e.execute("SELECT k FROM rs ORDER BY k")[0].rows] == [1, 2, 3]

    with pytest.raises(ValueError, match="unknown sort column"):
        t.rewrite_sort(["nope"])


def test_sql_update_delete_on_branch(spark, tmp_path):
    """UPDATE t.branch_x / DELETE FROM t.branch_x stage on the branch;
    main is untouched until fast_forward."""
    from iceberg_catalog_bench_spark.engine import SqlEngine

    e = SqlEngine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE bd (k BIGINT, v DOUBLE)")
    e.execute("INSERT INTO bd VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
    e.execute("ALTER TABLE bd CREATE BRANCH fix")
    e.execute("UPDATE bd.branch_fix SET v = v + 10 WHERE k = 1")
    e.execute("DELETE FROM bd.branch_fix WHERE k = 3")
    rows = e.execute("SELECT k, v FROM bd ORDER BY k")[0].rows
    assert [(r["k"], r["v"]) for r in rows] == [(1, 1.0), (2, 2.0), (3, 3.0)]
    e.execute("CALL system.fast_forward(table => 'bd', branch => 'fix')")
    rows = e.execute("SELECT k, v FROM bd ORDER BY k")[0].rows
    assert [(r["k"], r["v"]) for r in rows] == [(1, 11.0), (2, 2.0)]


def test_sql_insert_overwrite_on_branch(spark, tmp_path):
    from iceberg_catalog_bench_spark.engine import SqlEngine

    e = SqlEngine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE ob (k BIGINT, cat STRING) PARTITIONED BY (cat)")
    e.execute("INSERT INTO ob VALUES (1, 'a'), (2, 'b')")
    e.execute("ALTER TABLE ob CREATE BRANCH audit")
    e.execute("INSERT OVERWRITE ob.branch_audit VALUES (10, 'a')")
    rows = e.execute("SELECT k FROM ob ORDER BY k")[0].rows
    assert [r["k"] for r in rows] == [1, 2]  # main untouched
    e.execute("CALL system.fast_forward(table => 'ob', branch => 'audit')")
    rows = e.execute("SELECT k FROM ob ORDER BY k")[0].rows
    assert [r["k"] for r in rows] == [2, 10]


def test_merge_on_branch_wap(spark, tmp_path):
    """MERGE staged on a branch (Python API + the t.branch_x SQL
    spelling): branch head gets the merged state, main is untouched
    until fast_forward; CoW and MoR modes both stage correctly."""
    from iceberg_catalog_bench_spark.engine import SqlEngine

    t = LakeTable.create(spark, str(tmp_path / "t"), "k bigint, v double")
    t.append(spark.createDataFrame(
        [(1, 1.0), (2, 2.0)], "k bigint, v double"))
    t.create_branch("audit")
    t.merge(
        spark.createDataFrame([(2, 20.0), (3, 30.0)], "k bigint, v double"),
        on=["k"], when_matched_update="*", when_not_matched_insert=True,
        branch="audit",
    )
    assert sorted((r.k, r.v) for r in t.read().collect()) == [(1, 1.0), (2, 2.0)]
    t.fast_forward("audit")
    assert sorted((r.k, r.v) for r in t.read().collect()) == [
        (1, 1.0), (2, 20.0), (3, 30.0)]

    e = SqlEngine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE mb (k BIGINT, v DOUBLE)")
    e.execute("INSERT INTO mb VALUES (1, 1.0), (2, 2.0)")
    e.execute("ALTER TABLE mb CREATE BRANCH fix")
    e.execute(
        "MERGE INTO mb.branch_fix AS t USING (VALUES (1, 100.0)) AS s(k, v) "
        "ON t.k = s.k WHEN MATCHED THEN UPDATE SET t.v = s.v"
    )
    rows = e.execute("SELECT v FROM mb WHERE k = 1")[0].rows
    assert rows[0]["v"] == 1.0
    e.execute("CALL system.fast_forward(table => 'mb', branch => 'fix')")
    rows = e.execute("SELECT v FROM mb WHERE k = 1")[0].rows
    assert rows[0]["v"] == 100.0


def test_identifier_fields_lifecycle_and_rename(spark, tmp_path):
    """SET IDENTIFIER FIELDS stores FIELD IDS: a later column rename
    keeps the declaration bound to the same data; upsert_by_keys and
    apply_cdc_batch default their key to it; DROP IDENTIFIER FIELDS
    restores the explicit-on requirement; drop_column refuses to drop
    a declared identifier."""
    import pytest

    t = LakeTable.create(spark, str(tmp_path / "t"), "k bigint, v double")
    t.append(spark.createDataFrame([(1, 1.0), (2, 2.0)], "k bigint, v double"))

    with pytest.raises(KeyError, match="nope"):
        t.set_identifier_fields(["nope"])
    t.set_identifier_fields(["k"])
    assert t.identifier_fields == ["k"]

    # upsert without on= keys on the declared identity
    t.upsert_by_keys(spark.createDataFrame([(2, 20.0), (3, 30.0)],
                                           "k bigint, v double"))
    assert sorted((r.k, r.v) for r in t.read().collect()) == [
        (1, 1.0), (2, 20.0), (3, 30.0)]

    # rename: the declaration follows the field id to the new name
    t.rename_column("k", "pk")
    assert t.identifier_fields == ["pk"]
    t.upsert_by_keys(spark.createDataFrame([(3, 33.0)], "pk bigint, v double"))
    assert sorted((r.pk, r.v) for r in t.read().collect()) == [
        (1, 1.0), (2, 20.0), (3, 33.0)]

    # the identifier column cannot be dropped while declared
    with pytest.raises(ValueError, match="identifier field"):
        t.drop_column("pk")

    t.drop_identifier_fields()
    assert t.identifier_fields == []
    with pytest.raises(ValueError, match="SET IDENTIFIER FIELDS"):
        t.upsert_by_keys(spark.createDataFrame([(4, 4.0)], "pk bigint, v double"))


def test_sql_set_identifier_fields(spark, tmp_path):
    from iceberg_catalog_bench_spark.engine import SqlEngine

    e = SqlEngine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE idt (k BIGINT, v DOUBLE)")
    e.execute("INSERT INTO idt VALUES (1, 1.0)")
    res = e.execute("ALTER TABLE idt SET IDENTIFIER FIELDS k")[0]
    assert res.metadata["fields"] == ["k"]
    assert e.table("idt").identifier_fields == ["k"]
    ddl = e.execute("SHOW CREATE TABLE idt")[0].rows[0]["createtab_stmt"]
    assert "IDENTIFIER FIELDS (k)" in ddl
    e.execute("ALTER TABLE idt DROP IDENTIFIER FIELDS")
    assert e.table("idt").identifier_fields == []
    ddl = e.execute("SHOW CREATE TABLE idt")[0].rows[0]["createtab_stmt"]
    assert "IDENTIFIER FIELDS" not in ddl


def test_apply_cdc_batch_defaults_to_identifier_fields(spark, tmp_path):
    from pyspark.sql import functions as F

    t = LakeTable.create(
        spark, str(tmp_path / "t"), "k bigint, v double",
        properties={"write.delete.mode": "merge-on-read"},
    )
    t.append(spark.createDataFrame([(1, 1.0)], "k bigint, v double"))
    t.set_identifier_fields(["k"])
    batch = spark.createDataFrame(
        [(1, 10.0, "insert", 5), (2, 2.0, "insert", 5)],
        "k bigint, v double, _change_type string, _commit_snapshot_id bigint",
    )
    assert t.apply_cdc_batch(batch, batch_id=0, query_id="q") is not None
    assert sorted((r.k, r.v) for r in t.read().collect()) == [(1, 10.0), (2, 2.0)]


def test_iceberg_export_carries_identifier_field_ids(spark, tmp_path):
    import json as _json
    import os as _os

    from iceberg_catalog_bench_spark.catalog.iceberg_export import (
        to_iceberg_metadata,
    )

    t = LakeTable.create(spark, str(tmp_path / "t"), "k bigint, v double")
    t.append(spark.createDataFrame([(1, 1.0)], "k bigint, v double"))
    t.set_identifier_fields(["k"])
    out = to_iceberg_metadata(t)
    meta_path = out if isinstance(out, str) else out[0]
    if _os.path.isdir(meta_path):
        cands = sorted(p for p in _os.listdir(meta_path) if p.endswith(".metadata.json"))
        meta_path = _os.path.join(meta_path, cands[-1])
    md = _json.load(open(meta_path))
    cur = md["current-schema-id"]
    schema = next(s for s in md["schemas"] if s["schema-id"] == cur)
    kid = next(f["id"] for f in schema["fields"] if f["name"] == "k")
    assert schema["identifier-field-ids"] == [kid]


def _backdate(t, sid, ms):
    def mutate():
        for s in t._meta["snapshots"]:
            if s["snapshot_id"] == sid:
                s["timestamp_ms"] = ms
    t._locked_meta_mutation(mutate)


def test_ref_retention_max_age_drops_stale_refs(spark, tmp_path):
    """A tag/branch created with RETAIN ages out at expire_snapshots:
    the ref is dropped, its snapshot loses protection and expires, and
    its files are deleted — abandoned refs stop pinning data forever.
    A retention-less ref never ages."""
    import pytest

    t = LakeTable.create(spark, str(tmp_path / "t"), "k bigint")
    s1 = t.append(spark.createDataFrame([(1,)], "k bigint"))
    t.create_tag("ephemeral", max_ref_age_ms=60_000)
    t.create_tag("forever")  # no retention: must survive any expiry
    t.create_branch("stale_audit", max_ref_age_ms=60_000)
    s2 = t.append(spark.createDataFrame([(2,)], "k bigint"))
    t.append(spark.createDataFrame([(3,)], "k bigint"))

    # both refs point at s1; backdate it past the 60s budget
    _backdate(t, s1.snapshot_id, 1_000)
    res = t.expire_snapshots(retain_last=1)
    assert res["expired_snapshots_count"] >= 1
    assert "ephemeral" not in t._meta.get("refs", {})
    assert "stale_audit" not in t._meta.get("branches", {})
    # the retention-less tag still protects s1 from expiry
    assert "forever" in t._meta.get("refs", {})
    assert sorted(r.k for r in t.read_tag("forever").collect()) == [1]
    with pytest.raises(KeyError):
        t.read_tag("ephemeral")
    assert sorted(r.k for r in t.read().collect()) == [1, 2, 3]
    del s2


def test_branch_min_snapshots_to_keep_retains_ancestry(spark, tmp_path):
    """WITH SNAPSHOT RETENTION k SNAPSHOTS: expire keeps k snapshots of
    the BRANCH's parent chain (not just the head), so branch-side time
    travel survives maintenance; a plain branch keeps only its head."""
    t = LakeTable.create(spark, str(tmp_path / "t"), "k bigint")
    t.append(spark.createDataFrame([(0,)], "k bigint"))
    t.create_branch("keepy", min_snapshots_to_keep=3)
    t.create_branch("plain")
    hist = []
    for i in range(1, 4):
        hist.append(t.append(
            spark.createDataFrame([(i,)], "k bigint"), branch="keepy"))
        t.append(spark.createDataFrame([(100 + i,)], "k bigint"), branch="plain")
    t.expire_snapshots(retain_last=1)
    ids = {s["snapshot_id"] for s in t._meta["snapshots"]}
    # keepy's head + 2 ancestors survive
    assert {h.snapshot_id for h in hist} <= ids
    # plain kept only its head (the middle commits expired)
    plain_head = t._meta["branches"]["plain"]
    assert plain_head in ids
    kept_plain = [s for s in t._meta["snapshots"]
                  if s["snapshot_id"] == plain_head]
    assert len(kept_plain) == 1
    # branch time travel to a retained ancestor still reads
    assert sorted(
        r.k for r in t.read(snapshot_id=hist[0].snapshot_id).collect()
    ) == [0, 1]


def test_sql_create_branch_tag_retention_clauses(spark, tmp_path):
    from iceberg_catalog_bench_spark.engine import SqlEngine

    e = SqlEngine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE rt (k BIGINT)")
    e.execute("INSERT INTO rt VALUES (1)")
    e.execute("ALTER TABLE rt CREATE TAG snap1 RETAIN 7 DAYS")
    e.execute("ALTER TABLE rt CREATE BRANCH audit RETAIN 2 HOURS "
              "WITH SNAPSHOT RETENTION 5 SNAPSHOTS")
    ret = e.table("rt")._meta["ref_retention"]
    assert ret["snap1"] == {"max-ref-age-ms": 7 * 86_400_000}
    assert ret["audit"] == {"max-ref-age-ms": 2 * 3_600_000,
                            "min-snapshots-to-keep": 5}
    # plain spellings still parse
    e.execute("ALTER TABLE rt CREATE TAG plain_tag")
    e.execute("ALTER TABLE rt CREATE BRANCH plain_branch")
    e.execute("ALTER TABLE rt DROP BRANCH audit")
    assert "audit" not in e.table("rt")._meta["ref_retention"]


def test_entries_and_all_files_metadata_tables(spark, tmp_path):
    """`t.entries` splits ADDED (status 1) from EXISTING (status 0)
    per snapshot; `t.all_files` lists every file ANY retained snapshot
    references — including ones the current head no longer holds (the
    expire-candidate view)."""
    from iceberg_catalog_bench_spark.engine import SqlEngine

    e = SqlEngine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE mt (k BIGINT, v DOUBLE)")
    e.execute("INSERT INTO mt VALUES (1, 1.0)")
    e.execute("INSERT INTO mt VALUES (2, 2.0)")
    t = e.table("mt")
    s2 = t._snapshot()

    ent = {(r["status"], r["file_path"])
           for r in e.execute("SELECT * FROM mt.entries")[0].rows}
    added = {p for st, p in ent if st == 1}
    existing = {p for st, p in ent if st == 0}
    assert len(added) == 1 and len(existing) == 1  # second commit adds 1 file

    # CoW update rewrites the k=1 file: head drops it, all_files keeps it
    t.update({"v": "v + 10"}, "k = 1")
    head_paths = {f.path for f in t._snapshot().files}
    all_rows = e.execute("SELECT * FROM mt.all_files")[0].rows
    all_paths = {r["file_path"] for r in all_rows}
    assert head_paths < all_paths  # strictly more than the live set
    # the rewritten-away file is still visible with its last snapshot
    gone = all_paths - head_paths
    assert all(
        r["last_snapshot_id"] <= s2.snapshot_id
        for r in all_rows if r["file_path"] in gone
    )
    # entries of the update snapshot: the rewritten file is ADDED,
    # the untouched k=2 file is EXISTING
    ent2 = [(r["status"], r["file_path"]) for r in
            e.execute("SELECT * FROM mt.entries")[0].rows]
    assert sorted(st for st, _ in ent2) == [0, 1]


def test_compact_delete_files_drops_dangling(spark, tmp_path):
    """Delete-side-ONLY compaction (compact_delete_files — data files
    untouched, unlike rewrite_position_delete_files which folds into
    data): a position-delete file referencing one live and one
    rewritten-away data file keeps riding with dead rows (commit
    carry-over only drops it when ALL targets leave); the procedure
    consolidates to one fresh set, prunes the dangling rows, and reads
    are unchanged. Prior snapshots still time-travel (the old delete
    parquet is not unlinked)."""
    from iceberg_catalog_bench_spark.engine import SqlEngine

    e = SqlEngine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE pd (k BIGINT, v DOUBLE) "
              "TBLPROPERTIES ('write.delete.mode'='merge-on-read')")
    t = e.table("pd")
    t.append(spark.createDataFrame([(1, 1.0), (2, 2.0), (3, 3.0)],
                                   "k bigint, v double").coalesce(1))
    t.append(spark.createDataFrame([(4, 4.0), (5, 5.0), (6, 6.0)],
                                   "k bigint, v double").coalesce(1))
    # one delete file spanning BOTH data files, one spanning only B
    t.delete_where("k IN (1, 4)", mode="merge-on-read")
    t.delete_where("k = 5", mode="merge-on-read")
    pre_travel = t._snapshot().snapshot_id
    # CoW-update k=2: rewrites data file A; the A+B delete file stays
    # (B still live) but its k=1 tombstone row is now dangling
    t.update({"v": "v + 10"}, "k = 2", mode="copy-on-write")
    before = sorted(tuple(r) for r in t.read().collect())
    n_pos = [d for d in t._snapshot().delete_files if d.content == "position"]
    rows_before = sum(d.rows for d in n_pos)
    assert len(n_pos) >= 2

    res = e.execute(
        "CALL system.compact_delete_files(table => 'pd')"
    )[0].rows[0]
    assert res["rewritten_delete_files_count"] == len(n_pos)
    assert res["removed_dangling_rows"] >= 1

    t._reload()
    after_dels = [d for d in t._snapshot().delete_files
                  if d.content == "position"]
    assert sum(d.rows for d in after_dels) == rows_before - res["removed_dangling_rows"]
    assert sorted(tuple(r) for r in t.read().collect()) == before
    # time travel to the pre-compaction snapshot still applies the
    # ORIGINAL delete files
    old = sorted(r.k for r in t.read(snapshot_id=pre_travel).collect())
    assert old == [2, 3, 6]


def test_ref_create_replace_exists_semantics(spark, tmp_path):
    """Iceberg ref exists-semantics: CREATE errors on an existing
    name (IF NOT EXISTS no-ops), CREATE OR REPLACE always repoints,
    REPLACE requires existence — the WAP reset that throws away a bad
    audit run by repointing the branch at main."""
    import pytest

    from iceberg_catalog_bench_spark.engine import SqlEngine

    e = SqlEngine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE rr (k BIGINT)")
    e.execute("INSERT INTO rr VALUES (1)")
    e.execute("ALTER TABLE rr CREATE BRANCH audit")
    e.execute("ALTER TABLE rr CREATE TAG v1")
    t = e.table("rr")
    v1 = t._meta["refs"]["v1"]

    with pytest.raises(ValueError, match="exists"):
        e.execute("ALTER TABLE rr CREATE BRANCH audit")
    with pytest.raises(ValueError, match="exists"):
        e.execute("ALTER TABLE rr CREATE TAG v1")
    e.execute("ALTER TABLE rr CREATE BRANCH IF NOT EXISTS audit")  # no-op

    # stage a bad run on the branch, then REPLACE resets it to main
    t.append(spark.createDataFrame([(99,)], "k bigint"), branch="audit")
    assert sorted(r.k for r in t.read_branch("audit").collect()) == [1, 99]
    e.execute("ALTER TABLE rr REPLACE BRANCH audit")
    t._reload()
    assert sorted(r.k for r in t.read_branch("audit").collect()) == [1]

    # REPLACE TAG repoints; REPLACE of a missing ref errors
    e.execute("INSERT INTO rr VALUES (2)")
    e.execute("ALTER TABLE rr REPLACE TAG v1")
    t._reload()
    assert t._meta["refs"]["v1"] != v1
    with pytest.raises(KeyError):
        e.execute("ALTER TABLE rr REPLACE BRANCH nope")
    # CREATE OR REPLACE works for both present and absent names
    e.execute("ALTER TABLE rr CREATE OR REPLACE TAG v1")
    e.execute("ALTER TABLE rr CREATE OR REPLACE TAG v2")
    assert {"v1", "v2"} <= set(t._reload() or t._meta["refs"])


def test_replace_ref_resets_unstated_retention(spark, tmp_path):
    """REPLACE / CREATE OR REPLACE is a full ref re-definition: a
    retention clause not restated reverts to the default (no silent
    carry-over of a stale RETAIN policy)."""
    from iceberg_catalog_bench_spark.engine import SqlEngine

    e = SqlEngine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE rd (k BIGINT)")
    e.execute("INSERT INTO rd VALUES (1)")
    e.execute("ALTER TABLE rd CREATE BRANCH b RETAIN 5 DAYS "
              "WITH SNAPSHOT RETENTION 2 SNAPSHOTS")
    t = e.table("rd")
    assert "b" in t._meta["ref_retention"]
    e.execute("ALTER TABLE rd CREATE OR REPLACE BRANCH b")
    t._reload()
    assert "b" not in t._meta.get("ref_retention", {})
    # restating keeps it
    e.execute("ALTER TABLE rd REPLACE BRANCH b RETAIN 1 DAYS")
    t._reload()
    assert t._meta["ref_retention"]["b"] == {"max-ref-age-ms": 86_400_000}


def test_replace_partition_field_atomic(spark, tmp_path):
    """REPLACE PARTITION FIELD old WITH new: one spec generation swaps
    the field in place (days(ts) → identity(cat) here); files written
    under each generation keep pruning under the values they carry,
    and the swap records exactly ONE new spec generation (a drop+add
    pair would record two)."""
    import pytest

    from iceberg_catalog_bench_spark.engine import SqlEngine

    e = SqlEngine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE pf (k BIGINT, cat STRING, grp BIGINT) "
              "PARTITIONED BY (bucket(4, k))")
    e.execute("INSERT INTO pf VALUES (1, 'a', 10), (2, 'b', 20)")
    t = e.table("pf")
    gens_before = len(t._meta.get("partition_spec_history", []))

    e.execute("ALTER TABLE pf REPLACE PARTITION FIELD bucket(4, k) WITH cat")
    t._reload()
    spec = [(x["transform"], x.get("column"))
            for x in t._meta["partition_spec"]]
    assert spec == [("identity", "cat")]
    assert len(t._meta["partition_spec_history"]) == gens_before + 1

    # new writes cluster by the new spec; old files still read
    e.execute("INSERT INTO pf VALUES (3, 'c', 30)")
    rows = e.execute("SELECT k FROM pf ORDER BY k")[0].rows
    assert [r["k"] for r in rows] == [1, 2, 3]

    # replacing a missing field errors; replacing WITH a present one errors
    with pytest.raises(KeyError):
        e.execute("ALTER TABLE pf REPLACE PARTITION FIELD bucket(4, k) WITH grp")
    t.add_partition_field("bucket(2, grp)")
    with pytest.raises(ValueError, match="already present"):
        e.execute("ALTER TABLE pf REPLACE PARTITION FIELD cat WITH bucket(2, grp)")


def test_merge_conditional_insert(spark, tmp_path):
    """WHEN NOT MATCHED AND <cond> THEN INSERT: the condition scopes
    over source columns (bare or source-alias-qualified); unmatched
    source rows failing it are dropped, matched-row handling is
    unaffected, and target-column references are refused loudly."""
    import pytest

    from iceberg_catalog_bench_spark.engine import SqlEngine

    e = SqlEngine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE ci (k BIGINT, v DOUBLE)")
    e.execute("INSERT INTO ci VALUES (1, 1.0), (2, 2.0)")
    e.execute("CREATE TABLE ci_src (k BIGINT, v DOUBLE)")
    e.execute("INSERT INTO ci_src VALUES (2, 20.0), (3, 30.0), (4, 4.0)")

    e.execute(
        "MERGE INTO ci t USING ci_src s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET v = s.v "
        "WHEN NOT MATCHED AND s.v > 10 THEN INSERT VALUES (s.k, s.v)"
    )
    rows = e.execute("SELECT k, v FROM ci ORDER BY k")[0].rows
    # k=3 (v=30) inserted, k=4 (v=4) filtered out, k=2 updated
    assert [(r["k"], r["v"]) for r in rows] == [(1, 1.0), (2, 20.0), (3, 30.0)]

    with pytest.raises(ValueError, match="target columns"):
        e.execute(
            "MERGE INTO ci t USING ci_src s ON t.k = s.k "
            "WHEN NOT MATCHED AND t.v > 0 THEN INSERT VALUES (s.k, s.v)"
        )

    # Python API: condition over bare source column names
    t = e.table("ci")
    t.merge(
        spark.createDataFrame([(5, 50.0), (6, 6.0)], "k bigint, v double"),
        on=["k"], when_not_matched_insert="v >= 10",
    )
    assert sorted(r.k for r in t.read().collect()) == [1, 2, 3, 5]


def test_merge_conditional_matched_update(spark, tmp_path):
    """WHEN MATCHED AND <cond> THEN UPDATE: only matched rows passing
    the condition update (target cols bare, source cols via alias);
    failing matched rows stay unchanged. CoW and MoR agree."""
    from iceberg_catalog_bench_spark.engine import SqlEngine

    for mode_props in ("", " TBLPROPERTIES ('write.merge.mode'='merge-on-read')"):
        e = SqlEngine(spark, str(tmp_path / f"wh{bool(mode_props)}"))
        e.execute(f"CREATE TABLE cu (k BIGINT, v DOUBLE){mode_props}")
        e.execute("INSERT INTO cu VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
        e.execute(
            "MERGE INTO cu t USING "
            "(SELECT * FROM (VALUES (1, 100.0), (2, 0.5), (9, 9.0)) "
            "AS v(k, v)) AS s ON t.k = s.k "
            "WHEN MATCHED AND s.v > t.v THEN UPDATE SET v = s.v "
            "WHEN NOT MATCHED THEN INSERT VALUES (s.k, s.v)"
        )
        rows = e.execute("SELECT k, v FROM cu ORDER BY k")[0].rows
        # k=1 updated (100 > 1), k=2 kept (0.5 < 2), k=9 inserted
        assert [(r["k"], r["v"]) for r in rows] == [
            (1, 100.0), (2, 2.0), (3, 3.0), (9, 9.0)], mode_props or "cow"


def test_merge_duplicate_clause_refused(spark, tmp_path):
    """Two WHEN MATCHED UPDATE clauses would need Spark's
    first-match-wins ordering; the engine refuses loudly instead of
    silently keeping only the last clause."""
    import pytest

    from iceberg_catalog_bench_spark.engine import SqlEngine

    e = SqlEngine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE dc (k BIGINT, v DOUBLE)")
    e.execute("INSERT INTO dc VALUES (1, 1.0)")
    with pytest.raises(ValueError, match="duplicate MERGE clause"):
        e.execute(
            "MERGE INTO dc t USING (VALUES (1, 2.0)) AS s(k, v) "
            "ON t.k = s.k "
            "WHEN MATCHED AND s.v > 1 THEN UPDATE SET v = s.v "
            "WHEN MATCHED THEN UPDATE SET v = 0.0"
        )
    # distinct kinds still compose (update + delete + insert)
    e.execute(
        "MERGE INTO dc t USING (VALUES (1, 2.0), (2, 0.0)) AS s(k, v) "
        "ON t.k = s.k "
        "WHEN MATCHED AND s.v = 0.0 THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET v = s.v "
        "WHEN NOT MATCHED THEN INSERT VALUES (s.k, s.v)"
    )
    rows = e.execute("SELECT k, v FROM dc ORDER BY k")[0].rows
    assert [(r["k"], r["v"]) for r in rows] == [(1, 2.0), (2, 0.0)]


def test_sql2011_temporal_spellings(spark, tmp_path):
    """FOR SYSTEM_VERSION AS OF / FOR SYSTEM_TIME AS OF — the
    SQL:2011 temporal spellings Spark accepts alongside Iceberg's
    VERSION/TIMESTAMP AS OF — resolve to the same snapshots."""
    from iceberg_catalog_bench_spark.engine import SqlEngine

    e = SqlEngine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE tt (k BIGINT)")
    e.execute("INSERT INTO tt VALUES (1)")
    t = e.table("tt")
    v1 = t._snapshot().snapshot_id
    e.execute("INSERT INTO tt VALUES (2)")

    rows = e.execute(
        f"SELECT k FROM tt FOR SYSTEM_VERSION AS OF {v1} ORDER BY k")[0].rows
    assert [r["k"] for r in rows] == [1]
    # tag form through the standard spelling
    e.execute("ALTER TABLE tt CREATE TAG first AS OF VERSION " + str(v1))
    rows = e.execute(
        "SELECT k FROM tt FOR SYSTEM_VERSION AS OF 'first' ORDER BY k")[0].rows
    assert [r["k"] for r in rows] == [1]
    import datetime as dt

    ts = dt.datetime.utcfromtimestamp(
        t._snapshot(v1).timestamp_ms / 1000).isoformat()
    rows = e.execute(
        f"SELECT k FROM tt FOR SYSTEM_TIME AS OF '{ts}' ORDER BY k")[0].rows
    assert [r["k"] for r in rows] == [1]


# -- review fixes (late round 7) ------------------------------------------


def test_delete_by_keys_keeps_caller_key_shape(spark, tmp_path):
    """Declared identifier fields must NOT narrow delete_by_keys'
    default key columns: the caller's keys DataFrame says exactly
    which columns must match (dropping one would silently widen the
    delete across, e.g., every region)."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), "id bigint, region string, v double",
        properties={"write.delete.mode": "merge-on-read"},
    )
    t.append(spark.createDataFrame(
        [(1, "eu", 1.0), (1, "us", 2.0), (2, "eu", 3.0)],
        "id bigint, region string, v double"))
    t.set_identifier_fields(["id"])
    t.delete_by_keys(spark.createDataFrame(
        [(1, "eu")], "id bigint, region string"))
    # only (1, eu) deleted — (1, us) survives despite sharing the id
    assert sorted((r.id, r.region) for r in t.read().collect()) == [
        (1, "us"), (2, "eu")]


def test_merge_matched_insert_and_update_order_refused(spark, tmp_path):
    """WHEN MATCHED THEN INSERT is invalid SQL (refuse, never
    reinterpret); WHEN MATCHED UPDATE written before WHEN MATCHED
    DELETE would invert first-match-wins (engine deletes first), so it
    refuses too."""
    import pytest

    from iceberg_catalog_bench_spark.engine import SqlEngine

    e = SqlEngine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE mo (k BIGINT, v DOUBLE)")
    e.execute("INSERT INTO mo VALUES (1, 1.0)")
    with pytest.raises(ValueError, match="INSERT requires WHEN NOT MATCHED"):
        e.execute(
            "MERGE INTO mo t USING (VALUES (1, 2.0)) AS s(k, v) "
            "ON t.k = s.k WHEN MATCHED THEN INSERT VALUES (s.k, s.v)"
        )
    with pytest.raises(ValueError, match="DELETE clause first"):
        e.execute(
            "MERGE INTO mo t USING (VALUES (1, 2.0)) AS s(k, v) "
            "ON t.k = s.k "
            "WHEN MATCHED AND s.v > 10 THEN UPDATE SET v = s.v "
            "WHEN MATCHED THEN DELETE"
        )


def test_merge_conditional_insert_sees_source_only_columns(spark, tmp_path):
    """The NOT MATCHED insert condition may reference source columns
    outside the target schema (the CDC op-flag shape): filtering runs
    before the projection to target columns."""
    t = LakeTable.create(spark, str(tmp_path / "t"), "k bigint, v double")
    t.append(spark.createDataFrame([(1, 1.0)], "k bigint, v double"))
    src = spark.createDataFrame(
        [(2, 2.0, "I"), (3, 3.0, "D"), (1, 10.0, "U")],
        "k bigint, v double, op string")
    t.merge(src, on=["k"], when_matched_update="*",
            when_not_matched_insert="op = 'I'")
    assert sorted((r.k, r.v) for r in t.read().collect()) == [
        (1, 10.0), (2, 2.0)]


def test_aged_ref_drops_even_under_retain_floor(spark, tmp_path):
    """max-ref-age aging runs BEFORE the retain_last short-circuit: a
    stale tag drops even when no snapshot is expirable yet."""
    t = LakeTable.create(spark, str(tmp_path / "t"), "k bigint")
    s1 = t.append(spark.createDataFrame([(1,)], "k bigint"))
    t.create_tag("ephemeral", max_ref_age_ms=60_000)
    _backdate(t, s1.snapshot_id, 1_000)
    # one snapshot, retain_last=2: nothing CAN expire — ref still ages
    t.expire_snapshots(retain_last=2)
    assert "ephemeral" not in t._meta.get("refs", {})


def test_entries_status_exact_after_parent_expiry(spark, tmp_path):
    """entries() derives ADDED from the file's sequence number, so the
    status split stays exact after the parent snapshot is expired."""
    t = LakeTable.create(spark, str(tmp_path / "t"), "k bigint")
    t.append(spark.createDataFrame([(1,)], "k bigint"))
    t.create_tag("keep2")  # protect s2 via ref so only s1 expires
    t.append(spark.createDataFrame([(2,)], "k bigint"))
    t.expire_snapshots(retain_last=1)
    statuses = sorted(r.status for r in t.entries().collect())
    assert statuses == [0, 1]  # carried file stays EXISTING


def test_rest_commit_malformed_update_atomic_400(spark=None, tmp_path=None):
    """A whitelisted-kind update missing a required field fails the
    VALIDATION pass (400) with no table mutated — never a mid-apply
    crash after an earlier table committed. The spec's 'action'
    discriminator spelling is accepted alongside 'type'."""
    from iceberg_catalog_bench_spark.catalog.rest import (
        RestCatalogClient,
        RestCatalogServer,
    )

    srv = RestCatalogServer().start()
    try:
        c = RestCatalogClient(srv.url)
        c.authenticate()
        c.create_namespace("vns")
        c.create_table("vns", "a", {"type": "struct", "fields": []})
        c.create_table("vns", "b", {"type": "struct", "fields": []})
        code, body = c.commit_transaction([
            {"identifier": {"namespace": ["vns"], "name": "a"},
             "requirements": [],
             "updates": [{"type": "set-properties", "updates": {"x": "1"}}]},
            {"identifier": {"namespace": ["vns"], "name": "b"},
             "requirements": [],
             "updates": [{"type": "add-snapshot"}]},  # missing 'snapshot'
        ])
        assert code == 400
        _c, a = c.load_table("vns", "a")
        assert "x" not in a["metadata"].get("properties", {})  # atomic
        # spec spelling: action discriminator + 'type' as ref kind
        code, body = c.commit_table(
            "vns", "a",
            requirements=[{"type": "assert-ref-snapshot-id",
                           "ref": "main", "snapshot-id": None}],
            updates=[{"action": "add-snapshot",
                      "snapshot": {"snapshot-id": 7, "sequence-number": 1}},
                     {"action": "set-snapshot-ref", "ref-name": "main",
                      "type": "branch", "snapshot-id": 7}],
        )
        assert code == 200
        assert body["metadata"]["current-snapshot-id"] == 7
        assert body["metadata"]["refs"]["main"]["type"] == "branch"
    finally:
        srv.stop()


def test_merge_conditional_insert_literal_not_rewritten(spark, tmp_path):
    """A string literal that happens to spell a source column name is
    NOT rewritten by the insert-condition column mapping."""
    t = LakeTable.create(spark, str(tmp_path / "t"), "k bigint, v double")
    t.append(spark.createDataFrame([(1, 1.0)], "k bigint, v double"))
    src = spark.createDataFrame(
        [(2, 2.0, "op"), (3, 3.0, "x")], "k bigint, v double, op string")
    # literal 'op' must survive; column op must rewrite
    t.merge(src, on=["k"], when_not_matched_insert="op = 'op'")
    assert sorted(r.k for r in t.read().collect()) == [1, 2]


def test_describe_extended(spark, tmp_path):
    """DESCRIBE EXTENDED lists columns plus the detailed-information
    section (location, partition spec, identifier fields, properties,
    current snapshot); plain DESCRIBE keeps its column-only shape."""
    from iceberg_catalog_bench_spark.engine import SqlEngine

    e = SqlEngine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE de (k BIGINT, cat STRING) PARTITIONED BY (cat) "
              "TBLPROPERTIES ('write.delete.mode'='merge-on-read')")
    e.execute("INSERT INTO de VALUES (1, 'a')")
    e.execute("ALTER TABLE de SET IDENTIFIER FIELDS k")
    rows = e.execute("DESCRIBE EXTENDED de")[0].rows
    names = [r["col_name"] for r in rows]
    assert names[:2] == ["k", "cat"]
    info = {r["col_name"]: r["data_type"] for r in rows[3:]}
    assert info["Partition Spec"] == "cat"
    assert info["Identifier Fields"] == "k"
    assert "write.delete.mode=merge-on-read" in info["Table Properties"]
    assert int(info["Current Snapshot"]) > 0
    # plain DESCRIBE unchanged
    plain = e.execute("DESCRIBE de")[0].rows
    assert [r["col_name"] for r in plain] == ["k", "cat"]


def test_show_tblproperties_single_key(spark, tmp_path):
    """SHOW TBLPROPERTIES t ('key') returns just that property; a
    missing key errors loudly (Spark behavior), and the listing form
    is unchanged."""
    import pytest

    from iceberg_catalog_bench_spark.engine import SqlEngine

    e = SqlEngine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE sp (k BIGINT) "
              "TBLPROPERTIES ('write.delete.mode'='merge-on-read', 'owner'='etl')")
    rows = e.execute("SHOW TBLPROPERTIES sp ('owner')")[0].rows
    assert rows == [{"key": "owner", "value": "etl"}]
    with pytest.raises(KeyError):
        e.execute("SHOW TBLPROPERTIES sp ('nope')")
    assert len(e.execute("SHOW TBLPROPERTIES sp")[0].rows) == 2
