"""CRUD / MERGE / time-travel / schema-evolution queries over LakeTable.

Each query materializes a LakeTable from a deterministic slice of the
shared testdata, applies the reference's DML sequence (SURVEY.md §2.2,
§2.4), and returns the final state as a DataFrame. The oracle
reproduces the same final state with pure SQL over the base tables —
CASE expressions stand in for UPDATE, anti-predicates for DELETE,
key-set algebra for MERGE. That makes every row-level operator
verifiable end-to-end against DuckDB.

Reference citations:
- UPDATE:  `iceberg-tests/sql/spark/open_catalog/update_sales_events.sql:3-5`
- DELETE:  `delete_sales_events.sql:3-4`
- MERGE:   `sql/snowflake/open_catalog/merge_sales_events.sql:4-23`
- travel:  `time_travel_validate.sql:6-12`
- evolve:  `sql/databricks/unity_catalog/schema_evolution_sales_events.sql:3-10`
- snapshots metadata: `bulk_insert_sales_events.sql:14-17`
"""

from __future__ import annotations

import atexit
import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import LakeTable
from ..sources import load_table
from .registry import register


def _tmp_table_dir() -> str:
    """Scratch dir for a query's LakeTable. Kept for the process
    lifetime (the returned DataFrame may lazily re-read the files if
    its cache is evicted); removed at interpreter exit."""
    d = tempfile.mkdtemp(prefix="laketable-")
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d + "/t"


@register(
    "crud_update_delete",
    oracle=(
        "SELECT event_id, event_type, "
        "ROUND(CASE WHEN event_type = 'error' THEN value * 1.1 ELSE value END, 4) "
        "AS value_out FROM events "
        "WHERE user_id < 50 AND event_type <> 'signup'"
    ),
)
def crud_update_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE ... SET expr WHERE pred, then DELETE ... WHERE pred
    (reference M3+M4), copy-on-write, verified against a CASE/filter
    reconstruction of the same final state."""
    src = load_table(spark, "events", sf_dir).filter(F.col("user_id") < 50)
    d = _tmp_table_dir()
    t = LakeTable.create(
        spark, d,
        "event_id bigint, user_id bigint, event_type string, value double",
        partition_by=["bucket(8, event_id)"],
    )
    t.append(src.select("event_id", "user_id", "event_type", "value"))
    t.update({"value": "value * 1.1"}, "event_type = 'error'")
    t.delete_where("event_type = 'signup'")
    # returned lazily: the scratch table's files live until interpreter
    # exit (atexit cleanup), so the driver's collect() reads them directly
    # without a second evaluation through a cache
    return t.read().select(
        "event_id", "event_type", F.round("value", 4).alias("value_out")
    )


@register(
    "merge_upsert",
    oracle=(
        "SELECT o_orderkey, "
        "ROUND(CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice + 1000 "
        "ELSE o_totalprice END, 2) AS price_out FROM orders "
        "WHERE o_orderkey % 4 <> 0 OR o_orderkey % 2 = 0"
    ),
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO target USING source ON key (reference M5): matched →
    UPDATE SET from source, not-matched → INSERT. Target = orders with
    orderkey % 4 != 0; source = even orderkeys with price+1000. The
    oracle reconstructs the merged state via key-set algebra."""
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_totalprice")
    target = orders.filter(F.col("o_orderkey") % 4 != 0)
    source = orders.filter(F.col("o_orderkey") % 2 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1000
    )
    d = _tmp_table_dir()
    t = LakeTable.create(
        spark, d, "o_orderkey bigint, o_totalprice double",
        partition_by=["bucket(8, o_orderkey)"],
    )
    t.append(target)
    t.merge(source, on=["o_orderkey"], when_matched_update="*",
            when_not_matched_insert=True)
    return t.read().select(
        "o_orderkey", F.round("o_totalprice", 2).alias("price_out")
    )


@register(
    "merge_schema_evolution",
    oracle=(
        # post-evolution state: every supplier row; rows the source
        # touched (acctbal >= 5000 or key % 100 == 0) carry the NEW
        # column, everyone else reads its null default
        "SELECT s_suppkey, ROUND(s_acctbal, 2) AS acctbal, "
        "CASE WHEN s_acctbal >= 5000 OR s_suppkey % 100 = 0 "
        "THEN CASE WHEN s_acctbal >= 5000 THEN 'premium' ELSE 'sampled' "
        "END END AS tier "
        "FROM supplier"
    ),
)
def merge_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE WITH SCHEMA EVOLUTION (the Spark 4 / Iceberg clause, an
    M5 extension): the source carries a column the target never had
    (``tier``); the clause ADDS it (metadata-only, null default — no
    file rewritten) and UPDATE SET * / INSERT * carry it through. Rows
    the merge never touched read the column's null default through the
    schema-history projection — the same field-id machinery D6-D8
    evolution uses."""
    sup = load_table(spark, "supplier", sf_dir).select(
        "s_suppkey", "s_acctbal")
    d = _tmp_table_dir()
    t = LakeTable.create(spark, d, "s_suppkey bigint, s_acctbal double")
    t.append(sup)
    source = (
        sup.filter((F.col("s_acctbal") >= 5000)
                   | (F.col("s_suppkey") % 100 == 0))
        .withColumn("tier", F.when(F.col("s_acctbal") >= 5000,
                                   "premium").otherwise("sampled"))
    )
    t.merge(source, on=["s_suppkey"], when_matched_update="*",
            when_not_matched_insert=True, schema_evolution=True)
    return t.read().select(
        "s_suppkey", F.round("s_acctbal", 2).alias("acctbal"), "tier")


@register(
    "merge_not_matched_by_source",
    oracle=(
        # survivors: every source key (matched-updated or inserted),
        # plus target-only keys the by-source delete spared
        "SELECT o_orderkey, "
        "ROUND(CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice + 1000 "
        "ELSE o_totalprice END, 2) AS price_out FROM orders "
        "WHERE o_orderkey % 2 = 0 "
        "OR (o_orderkey % 4 <> 0 AND o_orderkey % 3 <> 0)"
    ),
)
def merge_not_matched_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Spark-3.4 MERGE semantics in one commit (beyond the
    reference's M5): matched → UPDATE, not-matched → INSERT, and NOT
    MATCHED BY SOURCE → conditional DELETE of target rows the source
    no longer carries — the snapshot-replication shape (make target
    equal source for covered keys, garbage-collect the rest). Target =
    orderkey % 4 != 0; source = even keys at price+1000; by-source
    delete condition = orderkey % 3 = 0. The oracle reconstructs the
    final state via key-set algebra."""
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_totalprice")
    target = orders.filter(F.col("o_orderkey") % 4 != 0)
    source = orders.filter(F.col("o_orderkey") % 2 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1000
    )
    d = _tmp_table_dir()
    t = LakeTable.create(
        spark, d, "o_orderkey bigint, o_totalprice double",
        partition_by=["bucket(8, o_orderkey)"],
    )
    t.append(target)
    t.merge(source, on=["o_orderkey"], when_matched_update="*",
            when_not_matched_insert=True,
            when_not_matched_by_source_delete="o_orderkey % 3 = 0")
    return t.read().select(
        "o_orderkey", F.round("o_totalprice", 2).alias("price_out")
    )


@register(
    "time_travel_checksum",
    oracle=(
        "SELECT 'baseline' AS snap_label, COUNT(*) AS row_count, "
        "ROUND(SUM(value), 2) AS sum_value FROM events WHERE user_id < 30 "
        "UNION ALL "
        "SELECT 'current' AS snap_label, COUNT(*) AS row_count, "
        "ROUND(SUM(value), 2) AS sum_value FROM events "
        "WHERE user_id < 60 AND NOT (user_id < 30 AND event_type = 'click')"
    ),
)
def time_travel_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-pinned COUNT + SUM checksums (reference T2/T6 +
    validators V1/V3): store the baseline snapshot id, mutate, then
    read VERSION AS OF baseline and compare against the live state —
    the exact shape of `time_travel_validate.sql:6-12` with
    `state.baseline_snapshot` threading (framework.yaml:317-319)."""
    ev = load_table(spark, "events", sf_dir).select("event_id", "user_id", "event_type", "value")
    d = _tmp_table_dir()
    t = LakeTable.create(
        spark, d, "event_id bigint, user_id bigint, event_type string, value double",
        partition_by=["bucket(4, user_id)"],
    )
    t.append(ev.filter(F.col("user_id") < 30))
    baseline_snapshot = t._snapshot().snapshot_id  # store_rows_as: baseline_snapshot
    t.append(ev.filter((F.col("user_id") >= 30) & (F.col("user_id") < 60)))
    t.delete_where("user_id < 30 AND event_type = 'click'")

    def _checks(df: DataFrame, label: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("row_count"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        ).select(F.lit(label).alias("snap_label"), "row_count", "sum_value")

    return _checks(t.read(snapshot_id=baseline_snapshot), "baseline").unionAll(
        _checks(t.read(), "current")
    )


@register(
    "schema_evolution_read",
    oracle=(
        "SELECT p_partkey, p_name AS part_name, 'general' AS category, "
        "ROUND(p_retailprice, 2) AS price FROM part WHERE p_size <= 25 "
        "UNION ALL "
        "SELECT p_partkey, p_name AS part_name, 'oversize' AS category, "
        "ROUND(p_retailprice, 2) AS price FROM part WHERE p_size > 25"
    ),
)
def schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADD COLUMN ... DEFAULT + RENAME COLUMN + post-evolution append
    (reference D6/D7 + M2): rows written before the evolution read back
    with the default; renamed columns stay readable via field-id
    mapping — no file rewrite."""
    part = load_table(spark, "part", sf_dir)
    d = _tmp_table_dir()
    t = LakeTable.create(spark, d, "p_partkey bigint, p_name string, p_retailprice double")
    t.append(part.filter(F.col("p_size") <= 25).select("p_partkey", "p_name", "p_retailprice"))
    t.add_column("category", "string", default="general")
    t.rename_column("p_name", "part_name")
    t.append(
        part.filter(F.col("p_size") > 25).select(
            "p_partkey",
            F.col("p_name").alias("part_name"),
            "p_retailprice",
            F.lit("oversize").alias("category"),
        )
    )
    return t.read().select(
        "p_partkey", "part_name", "category",
        F.round("p_retailprice", 2).alias("price"),
    )


@register(
    "snapshot_lineage",
    oracle=(
        "SELECT 1 AS snapshot_id, 'append' AS operation, "
        "(SELECT COUNT(*) FROM supplier) AS total_rows "
        "UNION ALL SELECT 2, 'append', "
        "(SELECT COUNT(*) * 2 FROM supplier) "
        "UNION ALL SELECT 3, 'delete', "
        "(SELECT COUNT(*) * 2 FROM supplier) "
        "- (SELECT COUNT(*) * 2 FROM supplier WHERE s_acctbal < 0)"
    ),
)
def snapshot_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`.snapshots` metadata table (reference T1): snapshot_id,
    operation, and row-count lineage across append → append → delete.
    Mirrors `SELECT snapshot_id, committed_at FROM t.snapshots ORDER BY
    committed_at DESC LIMIT 1` (bulk_insert_sales_events.sql:14-17)."""
    sup = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name", "s_acctbal")
    d = _tmp_table_dir()
    t = LakeTable.create(spark, d, "s_suppkey bigint, s_name string, s_acctbal double")
    t.append(sup)
    t.append(sup.withColumn("s_suppkey", F.col("s_suppkey") + 1_000_000))
    t.delete_where("s_acctbal < 0")
    return t.snapshots().select("snapshot_id", "operation", "total_rows")


@register(
    "harness_crud_plan",
    oracle=(
        "SELECT 'passed' AS status, CAST(12 AS BIGINT) AS steps_passed, "
        "CAST(9 AS BIGINT) AS row_count, CAST(38 AS BIGINT) AS sum_qty, "
        "CAST(487.94 AS DOUBLE) AS revenue"
    ),
)
def harness_crud_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end SQL-driven plan run: the reference's spark_open_crud
    + interop_small lifecycle (bootstrap → create → insert 8 → read →
    update → delete → evolve schema → append → merge → time travel →
    maintenance → checksums), executed by the SqlEngine/PlanRunner
    from Jinja-SQL scripts with statement-indexed validations. The
    oracle pins the final state: 12 steps passed, 9 rows, SUM(qty)=38,
    SUM(price*qty)=487.94 — every value derives from the golden 8-row
    fixture (FIXTURES.md §1) and its mutations."""
    import os as _os

    from ..engine import PlanRunner, SqlEngine

    warehouse = tempfile.mkdtemp(prefix="lake-warehouse-")
    atexit.register(shutil.rmtree, warehouse, ignore_errors=True)
    engine = SqlEngine(spark, warehouse)
    cfg = _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
                        "plans", "crud_plan.yaml")
    runner = PlanRunner.from_yaml(engine, cfg)
    report = runner.run_plan("sales_events_crud", namespace="bench_ns")
    steps_passed = sum(1 for st in report.steps if st.status == "passed")
    checks = (runner.state.get("final_checksums") or [{}])[0]
    return spark.createDataFrame(
        [(
            report.status,
            steps_passed,
            int(checks.get("row_count", -1)),
            int(checks.get("sum_qty", -1)),
            float(checks.get("revenue", -1.0)),
        )],
        "status string, steps_passed bigint, row_count bigint, sum_qty bigint, revenue double",
    )


@register(
    "ddl_lifecycle",
    oracle=(
        "SELECT 'passed' AS status, CAST(6 AS BIGINT) AS steps_passed, "
        "CAST(4 AS BIGINT) AS described_cols, "
        "CAST(3 AS BIGINT) AS rows_at_travel_ts, "
        "CAST(0 AS BIGINT) AS tables_after_teardown, "
        # -- r8-widened surface (VERDICT r7 item 3): DESCRIBE EXTENDED
        # detail rows, SHOW TBLPROPERTIES single-key + missing-key
        # error, REPLACE TAG/BRANCH + RETAIN round-trip via t.refs --
        "CAST(1 AS BIGINT) AS ext_detail_ok, "
        "'days(ts)' AS ext_partition_spec, "
        "'item_id' AS ext_identifier_fields, "
        "'4' AS prop_value, "
        "CAST(1 AS BIGINT) AS missing_prop_errors, "
        "CAST(3888000000 AS BIGINT) AS tag_retain_ms, "
        "CAST(604800000 AS BIGINT) AS branch_retain_ms, "
        "CAST(2 AS BIGINT) AS branch_min_keep, "
        "CAST(1 AS BIGINT) AS tag_at_first_snapshot, "
        "CAST(2 AS BIGINT) AS refs_count"
    ),
)
def ddl_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog-lifecycle plan covering the §2.1 statements the CRUD
    plan doesn't: CREATE SCHEMA (D2) / USE (D12) / IDENTIFIER (D14) /
    CREATE OR REPLACE TABLE (D5) / DESCRIBE (D9) / SHOW NAMESPACES,
    TABLES, VIEWS (D13) / REFRESH (P5) / TIMESTAMP AS OF (T3) /
    DROP TABLE IF EXISTS (D10) / DROP SCHEMA (D11), validated with
    compare_rows_with_state (V5) across the refresh and pinned
    catalog-state counts. Reference: sql/snowflake/snowflake.sql:57-216
    and the SHOW/USE cells of jupyternotebook/openspark.ipynb.

    Widened (r8) with the round-7 SQL-surface debuts, all driven
    through the frontend and pinned by the oracle:

    - DESCRIBE EXTENDED detail rows — Location matches the live table
      path, Current Snapshot matches live metadata, Partition Spec and
      Identifier Fields render their declared transforms
      (schema_evolution_sales_events.sql:12 shape).
    - SHOW TBLPROPERTIES t ('key') single-key lookup, and the loud
      error on a missing key (Spark parity).
    - REPLACE TAG/BRANCH ... AS OF VERSION ... RETAIN n DAYS
      [WITH SNAPSHOT RETENTION k SNAPSHOTS] round-trip, surfaced via
      the `t.refs` metadata table (snowflake.sql:359-378 shape).
    """
    import os as _os

    from ..engine import PlanRunner, SqlEngine

    warehouse = tempfile.mkdtemp(prefix="lake-ddl-warehouse-")
    atexit.register(shutil.rmtree, warehouse, ignore_errors=True)
    engine = SqlEngine(spark, warehouse)
    cfg = _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
                        "plans", "crud_plan.yaml")
    runner = PlanRunner.from_yaml(engine, cfg)
    report = runner.run_plan("ddl_lifecycle", namespace="ddl_ns")
    steps_passed = sum(1 for st in report.steps if st.status == "passed")

    # --- r8 widening: DESCRIBE EXTENDED / TBLPROPERTIES / ref DDL ---
    engine.execute([
        "CREATE NAMESPACE IF NOT EXISTS ddl_ext",
        "CREATE TABLE ddl_ext.sensors (item_id BIGINT, name STRING, "
        "ts TIMESTAMP) USING iceberg PARTITIONED BY (days(ts)) "
        "TBLPROPERTIES ('write.format.default'='parquet', "
        "'commit.retry.num-retries'='4')",
        "ALTER TABLE ddl_ext.sensors SET IDENTIFIER FIELDS item_id",
        "INSERT INTO ddl_ext.sensors VALUES "
        "(1, 'alpha', TIMESTAMP '2024-01-01 00:00:00'), "
        "(2, 'beta',  TIMESTAMP '2024-01-02 00:00:00')",
        "INSERT INTO ddl_ext.sensors VALUES "
        "(3, 'gamma', TIMESTAMP '2024-01-03 00:00:00')",
    ])
    t = engine.table("ddl_ext.sensors")
    sids = [r.snapshot_id for r in
            t.snapshots().select("snapshot_id").collect()]
    first_sid, head_sid = min(sids), max(sids)

    desc = engine.execute("DESCRIBE EXTENDED ddl_ext.sensors")[-1].rows
    detail = {r["col_name"]: r["data_type"] for r in desc
              if r["col_name"] and r["col_name"].strip()}
    ext_detail_ok = int(
        detail.get("Location") == t.path
        and detail.get("Current Snapshot") == str(head_sid)
    )
    ext_partition_spec = detail.get("Partition Spec", "")
    ext_identifier_fields = detail.get("Identifier Fields", "")

    prop = engine.execute(
        "SHOW TBLPROPERTIES ddl_ext.sensors ('commit.retry.num-retries')"
    )[-1].rows
    prop_value = prop[0]["value"] if prop else ""
    try:
        engine.execute("SHOW TBLPROPERTIES ddl_ext.sensors ('no.such.key')")
        missing_prop_errors = 0
    except KeyError:
        missing_prop_errors = 1

    engine.execute([
        "ALTER TABLE ddl_ext.sensors CREATE TAG audit_v1 RETAIN 30 DAYS",
        f"ALTER TABLE ddl_ext.sensors REPLACE TAG audit_v1 "
        f"AS OF VERSION {first_sid} RETAIN 45 DAYS",
        f"ALTER TABLE ddl_ext.sensors CREATE BRANCH audit "
        f"AS OF VERSION {head_sid} RETAIN 14 DAYS",
        f"ALTER TABLE ddl_ext.sensors REPLACE BRANCH audit "
        f"AS OF VERSION {first_sid} RETAIN 7 DAYS "
        f"WITH SNAPSHOT RETENTION 2 SNAPSHOTS",
    ])
    refs = {r["name"]: r for r in
            (row.asDict() for row in engine.table("ddl_ext.sensors")
             .refs().collect())}
    tag_ref = refs.get("audit_v1", {})
    br_ref = refs.get("audit", {})
    tag_retain_ms = int(tag_ref.get("max_reference_age_in_ms") or -1)
    branch_retain_ms = int(br_ref.get("max_reference_age_in_ms") or -1)
    branch_min_keep = int(br_ref.get("min_snapshots_to_keep") or -1)
    tag_at_first_snapshot = int(
        tag_ref.get("snapshot_id") == first_sid
        and br_ref.get("snapshot_id") == first_sid
    )

    return spark.createDataFrame(
        [(
            report.status,
            steps_passed,
            int(runner.state.get("described_cols", -1)),
            int(runner.state.get("rows_at_travel_ts", -1)),
            int(runner.state.get("tables_after_teardown", -1)),
            ext_detail_ok,
            ext_partition_spec,
            ext_identifier_fields,
            prop_value,
            missing_prop_errors,
            tag_retain_ms,
            branch_retain_ms,
            branch_min_keep,
            tag_at_first_snapshot,
            len(refs),
        )],
        "status string, steps_passed bigint, described_cols bigint, "
        "rows_at_travel_ts bigint, tables_after_teardown bigint, "
        "ext_detail_ok bigint, ext_partition_spec string, "
        "ext_identifier_fields string, prop_value string, "
        "missing_prop_errors bigint, tag_retain_ms bigint, "
        "branch_retain_ms bigint, branch_min_keep bigint, "
        "tag_at_first_snapshot bigint, refs_count bigint",
    )


@register(
    "incremental_read_changes",
    oracle=(
        "SELECT event_id, user_id, ROUND(value, 4) AS value_out FROM events "
        "WHERE user_id >= 30 AND user_id < 60"
    ),
)
def incremental_read_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (append-diff) scan between two snapshots — Iceberg's
    ``start-snapshot-id``/``end-snapshot-id`` incremental read, the CDC
    feed downstream consumers poll. Three appends land; the incremental
    read over (snap1, snap2] must return exactly the middle batch —
    neither the base data nor the later append. Manifest-level file
    diffing: the engine never rescans the base data to compute the
    delta, so an incremental poll costs O(new files) at any table size."""
    ev = load_table(spark, "events", sf_dir).select("event_id", "user_id", "value")
    d = _tmp_table_dir()
    t = LakeTable.create(
        spark, d, "event_id bigint, user_id bigint, value double",
        partition_by=["bucket(4, user_id)"],
    )
    t.append(ev.filter(F.col("user_id") < 30))
    s1 = t._snapshot().snapshot_id
    t.append(ev.filter((F.col("user_id") >= 30) & (F.col("user_id") < 60)))
    s2 = t._snapshot().snapshot_id
    t.append(ev.filter((F.col("user_id") >= 60) & (F.col("user_id") < 70)))
    return t.incremental_read(s1, s2).select(
        "event_id", "user_id", F.round("value", 4).alias("value_out")
    )


@register(
    "tag_and_rollback",
    oracle=(
        "SELECT 'tagged' AS phase, COUNT(*) AS row_count FROM supplier "
        "WHERE s_acctbal >= 0 "
        "UNION ALL "
        "SELECT 'after_rollback' AS phase, COUNT(*) AS row_count FROM supplier "
        "WHERE s_acctbal >= 0"
    ),
)
def tag_and_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named snapshot refs (Iceberg v2 tags) + rollback_to_snapshot:
    tag the curated state, append bad data, then roll back to the tag —
    the operational undo path. Both the tag read and the post-rollback
    live read must equal the curated state; rollback is a metadata-only
    commit (no data files rewritten), so undo cost is O(1) in table
    size."""
    sup = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_acctbal")
    d = _tmp_table_dir()
    t = LakeTable.create(spark, d, "s_suppkey bigint, s_acctbal double")
    t.append(sup.filter(F.col("s_acctbal") >= 0))
    tagged_snap = t._snapshot().snapshot_id
    t.create_tag("curated")
    t.append(sup.filter(F.col("s_acctbal") < 0))  # the bad batch
    t.rollback_to_snapshot(tagged_snap)

    def _count(df: DataFrame, label: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("row_count")).select(
            F.lit(label).alias("phase"), "row_count"
        )

    return _count(t.read_tag("curated"), "tagged").unionAll(
        _count(t.read(), "after_rollback")
    )


@register(
    "iceberg_metadata_roundtrip",
    oracle=(
        "SELECT COUNT(*) AS row_count, "
        "ROUND(SUM(p_retailprice), 2) AS price_sum, "
        "CAST(SUM(CASE WHEN p_size <= 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_general, "
        "CAST(SUM(CASE WHEN p_size > 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_oversize, "
        "COUNT(*) AS ext_row_count, "
        "ROUND(SUM(p_retailprice), 2) AS ext_price_sum "
        "FROM part WHERE p_partkey % 10 <> 0"
    ),
)
def iceberg_metadata_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine interoperability, driver-checked: build a table
    WITH schema evolution (add-default + rename) AND merge-on-read
    position deletes, export its metadata in the Iceberg v2 layout
    (metadata.json → manifest list → manifests), then read it back
    through TWO independent legs: (1) the repo's own chain walker
    (``read_via_iceberg_metadata`` — never consults LakeTable
    metadata), and (2) a SECOND ENGINE — the chain compiled to one
    DuckDB SQL statement (``duckdb_scan_sql``) whose projection,
    defaults, and (file, pos) tombstone anti-join DuckDB executes
    itself over its own ``filename``/``file_row_number`` virtual
    columns. Both checksums must equal plain SQL over the source rows
    (``ext_*`` pins the DuckDB leg), proving the exported chain
    describes the same table to a reader sharing no code with the
    repo's scan paths — the reference's cross-engine readback
    acceptance (ICEBERG-Interoperability-Test-Spec.md:10-14)."""
    import duckdb

    from ..catalog.iceberg_export import (
        duckdb_scan_sql,
        read_via_iceberg_metadata,
        to_iceberg_metadata,
    )

    part = load_table(spark, "part", sf_dir)
    d = _tmp_table_dir()
    t = LakeTable.create(
        spark, d, "p_partkey bigint, p_name string, p_retailprice double",
        properties={"write.delete.mode": "merge-on-read"},
    )
    t.append(part.filter(F.col("p_size") <= 25).select("p_partkey", "p_name", "p_retailprice"))
    t.add_column("category", "string", default="general")
    t.rename_column("p_name", "part_name")
    t.append(
        part.filter(F.col("p_size") > 25).select(
            "p_partkey",
            F.col("p_name").alias("part_name"),
            "p_retailprice",
            F.lit("oversize").alias("category"),
        )
    )
    t.delete_where("p_partkey % 10 = 0")  # MoR: position-delete files
    meta_path = to_iceberg_metadata(t)
    ext_count, ext_sum = duckdb.sql(
        "SELECT COUNT(*), ROUND(SUM(p_retailprice), 2) FROM ("
        + duckdb_scan_sql(meta_path) + ")"
    ).fetchone()
    exported = read_via_iceberg_metadata(spark, meta_path)
    return exported.agg(
        F.count(F.lit(1)).alias("row_count"),
        F.round(F.sum("p_retailprice"), 2).alias("price_sum"),
        F.sum((F.col("category") == "general").cast("bigint")).alias("n_general"),
        F.sum((F.col("category") == "oversize").cast("bigint")).alias("n_oversize"),
        F.lit(int(ext_count)).cast("bigint").alias("ext_row_count"),
        F.lit(float(ext_sum)).cast("double").alias("ext_price_sum"),
    )


@register(
    "iceberg_nested_roundtrip",
    oracle=(
        "WITH kept AS ("
        "  SELECT vec_id, embedding, label FROM embeddings "
        "  WHERE vec_id % 7 <> 0"
        ") "
        "SELECT COUNT(*) AS row_count, "
        "CAST(SUM(CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 10000) "
        "  AS BIGINT)) AS BIGINT) AS e1_floor_sum, "
        "CAST(SUM(len(embedding)) AS BIGINT) AS dim_sum, "
        "CAST(SUM(CASE WHEN vec_id % 2 = 1 THEN label ELSE 0 END) "
        "  AS BIGINT) AS aux_sum, "
        "CAST(SUM(label) AS BIGINT) AS meta_n_sum, "
        "CAST(SUM(label * 3 + 1) AS BIGINT) AS tag_a_sum, "
        "COUNT(*) AS ext_row_count, "
        "CAST(SUM(CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 10000) "
        "  AS BIGINT)) AS BIGINT) AS ext_e1_floor_sum, "
        "CAST(SUM(label * 3 + 1) AS BIGINT) AS ext_tag_a_sum, "
        "COUNT(*) AS adopted_row_count, "
        "CAST(SUM(label * 3 + 1) AS BIGINT) AS adopted_tag_a_sum "
        "FROM kept"
    ),
)
def iceberg_nested_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NESTED TYPES across the Iceberg export/adopt boundary — the one
    interop-spec line no prior round implemented (reference
    ``ICEBERG-Interoperability-Test-Spec.md:44``: nested structs and
    arrays as cross-engine coverage), and the exact table shape this
    repo's own dedup/ANN operators persist (an ``array<double>``
    embedding store).

    The table carries a list column (``embedding array<double>``), a
    struct column (``meta struct<lang:string,n:int>``), a map column
    (``tags map<string,int>``, its value DECORRELATED from the struct
    field and summed through ALL THREE read legs — walker, DuckDB
    map-extract, adopted read), schema
    evolution ACROSS a nested type (``aux array<int>`` added after the
    first append — old files read it back as a typed null), and
    merge-on-read position deletes. Its metadata exports in the
    Iceberg v2 layout with spec-compliant nested schema JSON
    (element-id / struct field ids allocated table-wide, persisted so
    re-exports are id-stable), then reads back through THREE
    independent legs: (1) the repo's external-reader walk
    (``read_via_iceberg_metadata``), (2) a second engine — the chain
    compiled to one DuckDB statement (``duckdb_scan_sql``) whose
    nested casts (``DOUBLE[]``, ``STRUCT(...)``) DuckDB executes
    itself, and (3) zero-copy adoption (``adopt_iceberg_metadata``),
    which also re-exports with the SAME nested ids. Float contract:
    the checksum is ``SUM(FLOOR(first_element * 1e4))`` — exact
    integer arithmetic on both engines, no rounding-tie exposure."""
    import duckdb

    from ..catalog.iceberg_export import (
        adopt_iceberg_metadata,
        duckdb_scan_sql,
        read_via_iceberg_metadata,
        to_iceberg_metadata,
    )

    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
        .alias("embedding"),
        "label",
    )
    d = _tmp_table_dir()
    t = LakeTable.create(
        spark, os.path.join(d, "nested"),
        "vec_id bigint, embedding array<double>, "
        "meta struct<lang:string,n:int>, tags map<string,int>",
        properties={"write.delete.mode": "merge-on-read"},
    )
    with_meta = emb.select(
        "vec_id", "embedding",
        F.struct(F.lit("en").alias("lang"),
                 F.col("label").cast("int").alias("n")).alias("meta"),
        # value DECORRELATED from meta.n (label*3+1 ≠ label): a
        # leaf-id mix-up resolving tags to meta.n must FAIL the gate
        F.create_map(F.lit("a"), (F.col("label") * 3 + 1).cast("int"))
        .alias("tags"),
        "label",
    )
    t.append(with_meta.filter(F.col("vec_id") % 2 == 0)
             .select("vec_id", "embedding", "meta", "tags"))
    t.add_column("aux", "array<int>")  # nested evolution: typed-null fill
    t.append(with_meta.filter(F.col("vec_id") % 2 == 1).select(
        "vec_id", "embedding", "meta", "tags",
        F.array(F.col("label").cast("int")).alias("aux")))
    t.delete_where("vec_id % 7 = 0")  # MoR tombstones over nested data
    meta_path = to_iceberg_metadata(t, manifest_format="avro")

    ext_count, ext_e1, ext_tag = duckdb.sql(
        "SELECT COUNT(*), CAST(SUM(CAST(FLOOR(embedding[1] * 10000) AS "
        "BIGINT)) AS BIGINT), CAST(SUM(tags['a'][1]) AS BIGINT) "
        "FROM (" + duckdb_scan_sql(meta_path) + ")"
    ).fetchone()
    adopted = adopt_iceberg_metadata(
        spark, meta_path, os.path.join(d, "adopted"))
    adopted_count, adopted_tag = adopted.read().agg(
        F.count(F.lit(1)),
        F.sum(F.element_at("tags", "a")).cast("bigint")).collect()[0]

    exported = read_via_iceberg_metadata(spark, meta_path)
    return exported.agg(
        F.count(F.lit(1)).alias("row_count"),
        F.sum(F.floor(F.element_at("embedding", 1) * 10000))
        .cast("bigint").alias("e1_floor_sum"),
        F.sum(F.size("embedding")).cast("bigint").alias("dim_sum"),
        F.sum(F.coalesce(F.element_at("aux", 1), F.lit(0)))
        .cast("bigint").alias("aux_sum"),
        F.sum(F.col("meta.n")).cast("bigint").alias("meta_n_sum"),
        F.sum(F.element_at("tags", "a")).cast("bigint").alias("tag_a_sum"),
        F.lit(int(ext_count)).cast("bigint").alias("ext_row_count"),
        F.lit(int(ext_e1)).cast("bigint").alias("ext_e1_floor_sum"),
        F.lit(int(ext_tag)).cast("bigint").alias("ext_tag_a_sum"),
        F.lit(int(adopted_count)).cast("bigint").alias("adopted_row_count"),
        F.lit(int(adopted_tag)).cast("bigint").alias("adopted_tag_a_sum"),
    )


@register(
    "iceberg_register_adopted",
    oracle=(
        "WITH base AS ("
        "  SELECT s_suppkey, s_name AS supplier_name, s_acctbal, "
        "         CASE WHEN s_suppkey % 2 = 0 THEN 'std' ELSE 'odd' END AS tier "
        "  FROM supplier WHERE s_acctbal >= 0 "
        "  UNION ALL "
        "  SELECT s_suppkey + 1000000, s_name, s_acctbal, 'new' FROM supplier"
        ") "
        "SELECT COUNT(*) AS row_count, "
        "ROUND(SUM(s_acctbal), 2) AS acctbal_sum, "
        "CAST(SUM(CASE WHEN tier = 'std' THEN 1 ELSE 0 END) AS BIGINT) AS n_std, "
        "CAST(SUM(CASE WHEN tier = 'odd' THEN 1 ELSE 0 END) AS BIGINT) AS n_odd, "
        "CAST(SUM(CASE WHEN tier = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new, "
        "(SELECT COUNT(*) FROM supplier) AS rows_at_adopted_travel "
        "FROM base"
    ),
)
def iceberg_register_adopted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-Iceberg INGEST, driver-checked (the import direction of
    the reference's interop loop — one engine reads what another
    wrote, ICEBERG-Interoperability-Test-Spec.md:4-14): a foreign
    Iceberg v2 chain is authored HERE by a different engine — DuckDB
    writes the data and equality-delete parquet, this function writes
    the metadata.json and REAL Avro OCF manifest lists + manifests
    (spec field names, Java's ``sequence_number`` spelling, no
    ``schema-id`` extension, the delete file carrying ONLY
    equality-ids so key names resolve through the writing schema, the
    way real chains force) — then adopted zero-copy via
    ``LakeTable.from_iceberg_metadata`` and DRIVEN ON: the adopted
    table serves time travel across the foreign lineage, applies the
    foreign equality delete with the strictly-smaller-sequence rule,
    reads foreign schema history by field id (rename + initial
    default), and accepts continued DML (an append whose snapshot id
    continues ``max(foreign id)+1``, immune to the foreign
    retraction). The oracle reproduces the whole story as plain SQL
    over the source table."""
    import duckdb

    from ..catalog.iceberg_export import adopt_iceberg_metadata

    root = _tmp_table_dir()
    data = os.path.join(root, "data")
    metad = os.path.join(root, "metadata")
    os.makedirs(data)
    os.makedirs(metad)
    src = os.path.join(sf_dir, "supplier.parquet")
    f1, f2, eq = (os.path.join(data, n) for n in
                  ("f1.parquet", "f2.parquet", "eq.parquet"))
    con = duckdb.connect()
    n1 = con.execute(
        f"COPY (SELECT s_suppkey, s_name, s_acctbal FROM read_parquet('{src}') "
        f"WHERE s_suppkey % 2 = 0 ORDER BY s_suppkey) TO '{f1}' (FORMAT PARQUET)"
    ).fetchone()[0]
    n2 = con.execute(
        f"COPY (SELECT s_suppkey, s_name AS supplier_name, s_acctbal, "
        f"'odd' AS tier FROM read_parquet('{src}') "
        f"WHERE s_suppkey % 2 = 1 ORDER BY s_suppkey) TO '{f2}' (FORMAT PARQUET)"
    ).fetchone()[0]
    nd = con.execute(
        f"COPY (SELECT s_suppkey FROM read_parquet('{src}') "
        f"WHERE s_acctbal < 0 ORDER BY s_suppkey) TO '{eq}' (FORMAT PARQUET)"
    ).fetchone()[0]
    con.close()

    def _schema(sid: int, name2: str, with_tier: bool) -> dict:
        fields = [
            {"id": 1, "name": "s_suppkey", "required": False, "type": "long"},
            {"id": 2, "name": name2, "required": False, "type": "string"},
            {"id": 3, "name": "s_acctbal", "required": False, "type": "double"},
        ]
        if with_tier:
            fields.append({"id": 4, "name": "tier", "required": False,
                           "type": "string", "initial-default": "std"})
        return {"type": "struct", "schema-id": sid, "fields": fields}

    def _entry(path: str, rows: int, snap_id: int, seq: int,
               content: int = 0, **extra) -> dict:
        return {"status": 1, "snapshot-id": snap_id, "data-file": {
            "content": content, "file-path": path, "file-format": "PARQUET",
            "partition": {}, "data-sequence-number": seq,
            "record-count": rows,
            "file-size-in-bytes": os.path.getsize(path), **extra}}

    # the chain's manifests are REAL Avro OCF (spec field names,
    # underscore spellings, Java's `sequence_number` for the v2 entry
    # sequence) — what an actual foreign engine writes; the delete
    # file carries ONLY equality-ids (no name extension), forcing the
    # write-schema name resolution real chains require
    from ..catalog.avro_ocf import write_ocf

    _AVRO_ENTRY = {
        "type": "record", "name": "manifest_entry", "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"], "field-id": 1},
            {"name": "sequence_number", "type": ["null", "long"],
             "field-id": 3},
            {"name": "data_file", "type": {
                "type": "record", "name": "r2", "fields": [
                    {"name": "content", "type": "int", "field-id": 134},
                    {"name": "file_path", "type": "string",
                     "field-id": 100},
                    {"name": "file_format", "type": "string",
                     "field-id": 101},
                    {"name": "partition", "type": {
                        "type": "record", "name": "r102", "fields": []},
                     "field-id": 102},
                    {"name": "record_count", "type": "long",
                     "field-id": 103},
                    {"name": "file_size_in_bytes", "type": "long",
                     "field-id": 104},
                    {"name": "equality_ids",
                     "type": ["null", {"type": "array", "items": "int"}],
                     "field-id": 135},
                ]}, "field-id": 2},
        ],
    }
    _AVRO_MLIST = {
        "type": "record", "name": "manifest_file", "fields": [
            {"name": "manifest_path", "type": "string", "field-id": 500},
            {"name": "manifest_length", "type": "long", "field-id": 501},
            {"name": "partition_spec_id", "type": "int", "field-id": 502},
            {"name": "content", "type": "int", "field-id": 517},
            {"name": "sequence_number", "type": "long", "field-id": 515},
            {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        ],
    }

    def _manifest(name: str, entries: list) -> str:
        p = os.path.join(metad, name)
        write_ocf(p, _AVRO_ENTRY, [{
            "status": e["status"],
            "snapshot_id": e["snapshot-id"],
            "sequence_number": e["data-file"]["data-sequence-number"],
            "data_file": {
                "content": e["data-file"]["content"],
                "file_path": e["data-file"]["file-path"],
                "file_format": "PARQUET",
                "partition": {},
                "record_count": e["data-file"]["record-count"],
                "file_size_in_bytes": e["data-file"]["file-size-in-bytes"],
                "equality_ids": e["data-file"].get("equality-ids"),
            }} for e in entries],
            metadata={"format-version": "2"})
        return p

    def _mlist(name: str, pairs: list, seq: int) -> str:
        p = os.path.join(metad, name)
        write_ocf(p, _AVRO_MLIST, [{
            "manifest_path": mp, "manifest_length": os.path.getsize(mp),
            "partition_spec_id": 0, "content": c,
            "sequence_number": seq, "added_snapshot_id": 100 + seq}
            for mp, c in pairs],
            metadata={"format-version": "2"})
        return p

    e1 = _entry(f1, n1, 101, 1)
    e2 = _entry(f2, n2, 102, 2)
    ed = _entry(eq, nd, 103, 3, content=2, **{"equality-ids": [1]})
    m1 = _manifest("m-101.avro", [e1])
    m2 = _manifest("m-102.avro", [e1, e2])
    md3 = _manifest("m-103-del.avro", [ed])
    snaps = [
        {"snapshot-id": 101, "sequence-number": 1,
         "timestamp-ms": 1_700_000_001_000, "schema-id": 0,
         "manifest-list": _mlist("sl-101.avro", [(m1, 0)], 1),
         "summary": {"operation": "append"}},
        {"snapshot-id": 102, "parent-snapshot-id": 101, "sequence-number": 2,
         "timestamp-ms": 1_700_000_002_000, "schema-id": 1,
         "manifest-list": _mlist("sl-102.avro", [(m2, 0)], 2),
         "summary": {"operation": "append"}},
        {"snapshot-id": 103, "parent-snapshot-id": 102, "sequence-number": 3,
         "timestamp-ms": 1_700_000_003_000, "schema-id": 1,
         "manifest-list": _mlist("sl-103.avro", [(m2, 0), (md3, 1)], 3),
         "summary": {"operation": "delete"}},
    ]
    mp = os.path.join(metad, "v3.metadata.json")
    with open(mp, "w") as fh:
        json.dump({
            "format-version": 2, "location": root, "last-column-id": 4,
            "current-schema-id": 1,
            "schemas": [_schema(0, "s_name", False),
                        _schema(1, "supplier_name", True)],
            "default-spec-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": []}],
            "last-partition-id": 999, "default-sort-order-id": 0,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "properties": {}, "current-snapshot-id": 103,
            "snapshots": snaps,
            "refs": {"pre_delete": {"snapshot-id": 102, "type": "tag"}},
        }, fh)

    t = adopt_iceberg_metadata(spark, mp, os.path.join(root, "adopted"))
    travel_rows = t.read_tag("pre_delete").count()
    sup = load_table(spark, "supplier", sf_dir)
    t.append(sup.select(
        (F.col("s_suppkey") + 1_000_000).alias("s_suppkey"),
        F.col("s_name").alias("supplier_name"),
        "s_acctbal",
        F.lit("new").alias("tier"),
    ))
    return t.read().agg(
        F.count(F.lit(1)).alias("row_count"),
        F.round(F.sum("s_acctbal"), 2).alias("acctbal_sum"),
        F.sum((F.col("tier") == "std").cast("bigint")).alias("n_std"),
        F.sum((F.col("tier") == "odd").cast("bigint")).alias("n_odd"),
        F.sum((F.col("tier") == "new").cast("bigint")).alias("n_new"),
        F.lit(int(travel_rows)).cast("bigint").alias("rows_at_adopted_travel"),
    )


@register(
    "adopted_bucket_pruning",
    oracle=(
        # the point-lookup row must come back exact, and the pruning
        # accounting is deterministic by construction: the chain is
        # authored with one file per murmur3 bucket (16) and a point
        # lookup keeps exactly the key's bucket
        "SELECT c_name, ROUND(c_acctbal, 2) AS acctbal, "
        "CAST(16 AS BIGINT) AS files_total, "
        "CAST(1 AS BIGINT) AS files_kept "
        "FROM customer WHERE c_custkey = 42"
    ),
)
def adopted_bucket_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flagship partitioning shape, adopted and
    PRUNED: its tables bucket their tenant/user keys
    (ICEBERG-Interoperability-Test-Spec.md:50 ``bucket(tenant_id,16)``;
    blob_dfs/blob-dfs_bench.py:72 ``bucket(16, user_id)``). A foreign
    engine (DuckDB) writes the customer table as 16 parquet files —
    one per Iceberg-spec murmur3 bucket of ``c_custkey`` (table spec
    Appendix B) — and the chain declares ``bucket[16]`` with the true
    murmur3 partition ordinals. Adoption converts those values to the
    hash-identical native ``ibucket`` transform, so the point lookup
    scans ONE file out of 16; ``files_kept`` pins the skip. At 100 TB
    this is the difference between reading ~6 TB and reading one
    bucket's files — pruning is metadata-only, zero I/O."""
    import duckdb

    from ..catalog.iceberg_bucket import iceberg_bucket
    from ..catalog.iceberg_export import adopt_iceberg_metadata

    root = _tmp_table_dir()
    data = os.path.join(root, "data")
    metad = os.path.join(root, "metadata")
    os.makedirs(data)
    os.makedirs(metad)
    src = os.path.join(sf_dir, "customer.parquet")
    con = duckdb.connect()
    keys = [r[0] for r in con.execute(
        f"SELECT c_custkey FROM read_parquet('{src}')").fetchall()]
    import pandas as _pd

    bucket_map = _pd.DataFrame(
        {"c_custkey": keys,
         "b": [iceberg_bucket(int(k), 16) for k in keys]})
    con.register("bucket_map", bucket_map)
    entries = []
    for b in range(16):
        p = os.path.join(data, f"b{b}.parquet")
        n = con.execute(
            f"COPY (SELECT c.c_custkey, c.c_name, c.c_acctbal "
            f"FROM read_parquet('{src}') c JOIN bucket_map m USING "
            f"(c_custkey) WHERE m.b = {b} ORDER BY c.c_custkey) "
            f"TO '{p}' (FORMAT PARQUET)").fetchone()[0]
        entries.append({"status": 1, "snapshot-id": 201, "data-file": {
            "content": 0, "file-path": p, "file-format": "PARQUET",
            "partition": {"c_custkey_bucket": b},
            "data-sequence-number": 1, "record-count": n,
            "file-size-in-bytes": os.path.getsize(p)}})
    con.close()
    man = os.path.join(metad, "m1.json")
    with open(man, "w") as fh:
        json.dump({"partition-spec-id": 0, "entries": entries}, fh)
    ml = os.path.join(metad, "sl1.json")
    with open(ml, "w") as fh:
        json.dump({"manifests": [{
            "manifest-path": man, "manifest-length": os.path.getsize(man),
            "partition-spec-id": 0, "content": 0, "sequence-number": 1,
            "added-snapshot-id": 201}]}, fh)
    mp = os.path.join(metad, "v1.metadata.json")
    with open(mp, "w") as fh:
        json.dump({
            "format-version": 2, "location": root, "last-column-id": 3,
            "current-schema-id": 0,
            "schemas": [{"type": "struct", "schema-id": 0, "fields": [
                {"id": 1, "name": "c_custkey", "required": False,
                 "type": "long"},
                {"id": 2, "name": "c_name", "required": False,
                 "type": "string"},
                {"id": 3, "name": "c_acctbal", "required": False,
                 "type": "double"}]}],
            "default-spec-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": [
                {"field-id": 1000, "source-id": 1,
                 "name": "c_custkey_bucket", "transform": "bucket[16]"}]}],
            "last-partition-id": 1000, "default-sort-order-id": 0,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "properties": {}, "current-snapshot-id": 201,
            "snapshots": [{"snapshot-id": 201, "sequence-number": 1,
                           "timestamp-ms": 1_700_000_001_000,
                           "schema-id": 0, "manifest-list": ml,
                           "summary": {"operation": "append"}}],
        }, fh)

    t = adopt_iceberg_metadata(spark, mp, os.path.join(root, "adopted"))
    snap = t._snapshot(t._meta["current_snapshot_id"])
    kept = t._prune_files(snap.files, "c_custkey = 42")
    return t.read().where("c_custkey = 42").select(
        "c_name",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.lit(len(snap.files)).cast("bigint").alias("files_total"),
        F.lit(len(kept)).cast("bigint").alias("files_kept"),
    )


@register(
    "rest_catalog_conformance",
    oracle=(
        # Pinned transcript shape: 43 ordered calls, 6 intentional
        # expected-failure probes (conflict / stale-version /
        # disabled-feature / non-empty-drop / 2× revoked-privilege
        # 403), zero FAILs — the reference tester's PASS/EXP/FAIL
        # classification over a superset of its 29-call sequence,
        # plus the spec §9 revoke-read/write-then-restore cycle.
        "SELECT CAST(43 AS BIGINT) AS total_calls, "
        "CAST(37 AS BIGINT) AS passed, "
        "CAST(6 AS BIGINT) AS expected_failures, "
        "CAST(0 AS BIGINT) AS failures"
    ),
)
def rest_catalog_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REST catalog conformance (reference §2.8 + management plane) as
    a driver row: boot the in-process Polaris-style server, run the
    ordered 43-call suite (OAuth → config → management read surface →
    optimistic-concurrency catalog update/revert → namespace/table/view
    lifecycle → cleanup → privilege revoke/restore cycle with 403
    error-surface probes), and report the PASS/EXP/FAIL tally."""
    from ..catalog.rest import RestCatalogServer, run_conformance

    server = RestCatalogServer().start()
    try:
        results = run_conformance(server.url, ns="driver_conf_ns")
    finally:
        server.stop()
    tally = (
        len(results),
        sum(1 for r in results if r.outcome == "PASS"),
        sum(1 for r in results if r.outcome == "EXP"),
        sum(1 for r in results if r.outcome == "FAIL"),
    )
    return spark.createDataFrame(
        [tally],
        "total_calls bigint, passed bigint, expected_failures bigint, failures bigint",
    )


@register(
    "maintenance_compaction",
    oracle=(
        # The lifecycle is deterministic: 4 modulo-slice appends of the
        # 25-row nation table → 4 files; bin-pack compaction of 4 tiny
        # files → 1; expire+GC leaves 0 orphans. Row counts must ride
        # through unchanged — the data-integrity half comes from the
        # nation scalar subquery, the file-layout half from the pinned
        # literals.
        "SELECT (SELECT COUNT(*) FROM nation) AS rows_before, "
        "(SELECT COUNT(*) FROM nation) AS rows_after, "
        "4 AS files_before, 1 AS files_after, "
        "4 AS rewritten, 0 AS orphans_removed"
    ),
)
def maintenance_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rewrite_data_files + expire_snapshots + remove_orphan_files
    (reference P1/P3/P4, blob-dfs_bench.py:140-155): many small appends
    → compact → expire → verify data survives and file count drops.
    Returns the verification row (counts before/after)."""
    nat = load_table(spark, "nation", sf_dir)
    d = _tmp_table_dir()
    t = LakeTable.create(spark, d, "n_nationkey int, n_name string, n_regionkey int")
    for i in range(4):
        t.append(nat.filter(F.col("n_nationkey") % 4 == i))
    files_before = len(t._snapshot().files)
    rows_before = t.read().count()
    res = t.rewrite_data_files(min_input_files=2)
    t.expire_snapshots(retain_last=1)
    orphans = t.remove_orphan_files()
    files_after = len(t._snapshot().files)
    rows_after = t.read().count()
    return spark.createDataFrame(
        [(rows_before, rows_after, files_before, files_after,
          res["rewritten_data_files_count"], orphans["orphan_file_count"])],
        "rows_before bigint, rows_after bigint, files_before int, "
        "files_after int, rewritten int, orphans_removed int",
    ).filter(F.col("rows_before") == F.col("rows_after"))


@register(
    "branch_wap_publish",
    oracle=(
        # Isolation + both publish paths are pinned: while a batch is
        # staged on a branch, main holds ONLY the base slice; after
        # fast_forward it holds both; after the DIVERGED-main cherry-
        # pick it holds all four slices, and both refusal guards fired.
        "SELECT (SELECT COUNT(*) FROM events WHERE user_id < 20) AS main_rows_staged, "
        "(SELECT COUNT(*) FROM events WHERE user_id < 40) AS main_rows_published, "
        "(SELECT COUNT(*) FROM events WHERE user_id < 80) AS rows_after_cherrypick, "
        "TRUE AS ff_refused_on_divergence, TRUE AS double_publish_blocked, "
        "CAST((SELECT ROUND(SUM(value), 2) FROM events WHERE user_id < 80) "
        "AS DOUBLE) AS sum_value_final"
    ),
)
def branch_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish via branches (Iceberg WAP / `toBranch`),
    BOTH publish paths: base rows land on main, a batch is STAGED on
    an audit branch (main readers cannot see it), audited via
    read_branch, then published atomically with fast_forward. A second
    staged batch (stamped with a ``wap.id``) then faces the real-world
    wrinkle: main advanced while the audit ran, fast_forward correctly
    refuses the non-descendant head, and ``cherrypick_snapshot``
    re-applies the staged append's net change onto the new head —
    after which a second cherry-pick of the same staged snapshot is
    blocked by the published-wap-id guard. The returned row carries
    main's row count at every stage plus both refusal verdicts, so
    the oracle verifies the isolation window and the guards, not just
    the end state."""
    ev = load_table(spark, "events", sf_dir).select("event_id", "user_id", "value")
    d = _tmp_table_dir()
    t = LakeTable.create(
        spark, d, "event_id bigint, user_id bigint, value double",
        partition_by=["bucket(8, event_id)"],
    )
    t.append(ev.filter(F.col("user_id") < 20))
    t.create_branch("audit")
    t.append(
        ev.filter((F.col("user_id") >= 20) & (F.col("user_id") < 40)),
        branch="audit",
    )
    main_rows_staged = t.read().count()  # must exclude the staged batch
    t.fast_forward("audit")
    main_rows_published = t.read().count()
    # -- diverged-main publish: stage, advance main, cherry-pick --
    t.create_branch("audit2")
    staged = t.append(
        ev.filter((F.col("user_id") >= 40) & (F.col("user_id") < 60)),
        branch="audit2", wap_id="wap-batch-2",
    )
    t.append(ev.filter((F.col("user_id") >= 60) & (F.col("user_id") < 80)))
    ff_refused = False
    try:
        t.fast_forward("audit2")
    except ValueError:
        ff_refused = True  # main head is no longer an ancestor
    t.cherrypick_snapshot(staged.snapshot_id)
    double_blocked = False
    try:
        t.cherrypick_snapshot(staged.snapshot_id)
    except ValueError:
        double_blocked = True  # published-wap-id guard
    return t.read().agg(
        F.lit(main_rows_staged).cast("bigint").alias("main_rows_staged"),
        F.lit(main_rows_published).cast("bigint").alias("main_rows_published"),
        F.count(F.lit(1)).alias("rows_after_cherrypick"),
        F.lit(ff_refused).alias("ff_refused_on_divergence"),
        F.lit(double_blocked).alias("double_publish_blocked"),
        F.round(F.sum("value"), 2).cast("double").alias("sum_value_final"),
    )


@register(
    "partitions_metadata",
    oracle=(
        # One partition per event_type; per-partition row counts must
        # equal the source's group counts, with exactly one file each
        # (fanout write: one file per partition value).
        "SELECT event_type, COUNT(*) AS record_count, 1 AS file_count "
        "FROM events WHERE user_id < 50 GROUP BY event_type"
    ),
)
def partitions_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`t.partitions` metadata table: per-partition file/row totals
    aggregated from manifest stats only — the small-file / skew
    diagnostic every maintenance job starts from. No data files are
    read; the oracle recomputes the totals from the source rows."""
    d = _tmp_table_dir()
    t = LakeTable.create(
        spark, d, "event_id bigint, event_type string, value double",
        partition_by=["event_type"],
    )
    t.append(
        load_table(spark, "events", sf_dir)
        .filter(F.col("user_id") < 50)
        .select("event_id", "event_type", "value")
    )
    return t.partitions().select(
        F.get_json_object("partition", "$._p_identity_event_type").alias("event_type"),
        "record_count",
        F.col("file_count").cast("int").alias("file_count"),
    )


@register(
    "maintenance_zorder",
    oracle=(
        # Deterministic: rows ride through the rewrite; the layout is
        # pinned (16 z-range files) and a point predicate on EITHER
        # z column must exclude at least half the files by stats.
        "SELECT (SELECT COUNT(*) FROM events) AS rows_after, "
        "16 AS files_after, TRUE AS pruned_event_dim, TRUE AS pruned_user_dim"
    ),
)
def maintenance_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rewrite_data_files(strategy='sort', sort_order='zorder(...)'):
    multi-dimensional clustering. After the rewrite each file covers a
    compact (event_id, user_id) rectangle, so manifest stats prune
    point lookups on BOTH columns — a linearly-sorted layout serves
    only its leading column. The returned row carries the measured
    per-dimension pruning verdicts; the oracle pins them TRUE."""
    d = _tmp_table_dir()
    t = LakeTable.create(
        spark, d, "event_id bigint, user_id bigint, value double"
    )
    t.append(
        load_table(spark, "events", sf_dir).select("event_id", "user_id", "value")
    )
    t.rewrite_zorder(["event_id", "user_id"], target_files=16)
    snap = t._snapshot()

    def covering(col: str, val: int) -> int:
        return sum(
            1 for e in snap.files
            if col in e.stats and e.stats[col][0] <= val <= e.stats[col][1]
        )

    n_files = len(snap.files)
    return t.read().agg(
        F.count(F.lit(1)).alias("rows_after"),
        F.lit(n_files).cast("int").alias("files_after"),
        F.lit(covering("event_id", 100) <= n_files // 2).alias("pruned_event_dim"),
        F.lit(covering("user_id", 50) <= n_files // 2).alias("pruned_user_dim"),
    )


@register(
    "maintenance_hilbert_cluster",
    oracle=(
        # Deterministic: rows ride through the rewrite; the layout is
        # pinned (16 hilbert-range files) and a point predicate on
        # EITHER curve column must exclude at least half the files.
        "SELECT (SELECT COUNT(*) FROM events) AS rows_after, "
        "16 AS files_after, TRUE AS pruned_event_dim, TRUE AS pruned_user_dim"
    ),
)
def maintenance_hilbert_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rewrite_data_files(strategy='sort', sort_order='hilbert(...)'):
    multi-dimensional clustering on the HILBERT curve — the
    adjacent-step curve, so every file's index range is one compact
    blob (the Z-curve's diagonal jumps split ranges across distant
    rectangles: measured ~9-12% fewer files touched per range query at
    non-quadrant-aligned file counts, BASELINE.md). Same contract as
    maintenance_zorder: stats prune point lookups on BOTH curve
    columns; the oracle pins the verdicts TRUE. Exercised through the
    SQL CALL so the frontend wiring is driver-checked too."""
    from ..engine import SqlEngine

    d = _tmp_table_dir()
    eng = SqlEngine(spark, d)
    eng.execute("CREATE TABLE hclust (event_id BIGINT, user_id BIGINT, "
                "value DOUBLE)")
    t = eng.table("hclust")
    t.append(
        load_table(spark, "events", sf_dir).select("event_id", "user_id", "value")
    )
    eng.execute(
        "CALL system.rewrite_data_files(table => 'hclust', "
        "strategy => 'sort', sort_order => 'hilbert(event_id, user_id)', "
        "target_files => 16)"
    )
    t = eng.table("hclust")
    snap = t._snapshot()

    def covering(col: str, val: int) -> int:
        return sum(
            1 for e in snap.files
            if col in e.stats and e.stats[col][0] <= val <= e.stats[col][1]
        )

    n_files = len(snap.files)
    return t.read().agg(
        F.count(F.lit(1)).alias("rows_after"),
        F.lit(n_files).cast("int").alias("files_after"),
        F.lit(covering("event_id", 100) <= n_files // 2).alias("pruned_event_dim"),
        F.lit(covering("user_id", 50) <= n_files // 2).alias("pruned_user_dim"),
    )


@register(
    "cdc_changelog",
    oracle=(
        # Net changes from the baseline snapshot: every pre-update
        # 'error' row leaves (delete) and re-enters with the doubled
        # value (insert); 'signup' rows only leave. Rows carried
        # through the copy-on-write rewrites unchanged must NOT appear.
        "SELECT event_id, ROUND(value * 2, 4) AS value_out, "
        "'insert' AS change_type FROM events "
        "WHERE user_id < 40 AND event_type = 'error' "
        "UNION ALL "
        "SELECT event_id, ROUND(value, 4) AS value_out, "
        "'delete' AS change_type FROM events "
        "WHERE user_id < 40 AND event_type IN ('error', 'signup')"
    ),
)
def cdc_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog view between snapshots (Iceberg
    ``create_changelog_view``): UPDATE surfaces as delete+insert pairs,
    DELETE as deletes, and rows the CoW rewrite merely carried over
    cancel out. Only files added/removed between the snapshots are
    read (manifest diff), then ``exceptAll`` nets the carried-over
    rows — O(changed files) at any table size."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )
    d = _tmp_table_dir()
    t = LakeTable.create(
        spark, d,
        "event_id bigint, user_id bigint, event_type string, value double",
        partition_by=["bucket(8, event_id)"],
    )
    t.append(ev.filter(F.col("user_id") < 40))
    baseline = t._snapshot().snapshot_id
    t.update({"value": "value * 2"}, "event_type = 'error'")
    t.delete_where("event_type = 'signup'")
    return t.changelog(baseline).select(
        "event_id",
        F.round("value", 4).alias("value_out"),
        F.col("_change_type").alias("change_type"),
    )


@register(
    "mor_delete_update_read",
    oracle=(
        # Final state after MoR DELETE (user_id >= 30 gone) and MoR
        # UPDATE (+100 on user_id < 10), then compaction folding the
        # tombstones: counts and checksum must match plain SQL over the
        # base rows; the three pinned flags assert the merge-on-read
        # file mechanics (originals untouched, tombstones present, then
        # folded to zero by rewrite_data_files).
        "SELECT COUNT(*) AS cnt, "
        "CAST(ROUND(SUM(CASE WHEN user_id < 10 THEN value + 100 ELSE value END), 2) "
        "AS DOUBLE) AS sum_value, "
        "1 AS originals_untouched, 1 AS had_tombstones, "
        "0 AS tombstones_after_compaction "
        "FROM events WHERE user_id < 30"
    ),
)
def mor_delete_update_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read row-level ops (Iceberg v2 position deletes, spec
    `:73-74`; ``write.delete.mode`` / ``write.update.mode`` =
    merge-on-read): DELETE writes (file, pos) tombstones instead of
    rewriting data files, UPDATE tombstones + appends the new row
    images, readers apply tombstones as a broadcast anti-join, and
    ``rewrite_data_files`` folds the tombstones back into clean files.
    At 100 TB this is the difference between a 1-row delete costing one
    tombstone row and costing a 128 MB file rewrite."""
    ev = load_table(spark, "events", sf_dir).select("event_id", "user_id", "value")
    d = _tmp_table_dir()
    t = LakeTable.create(
        spark, d, "event_id bigint, user_id bigint, value double",
        partition_by=["bucket(8, event_id)"],
        properties={"write.delete.mode": "merge-on-read",
                    "write.update.mode": "merge-on-read"},
    )
    t.append(ev.filter(F.col("user_id") < 40))
    files_before = {e.path for e in t._snapshot().files}
    t.delete_where("user_id >= 30")
    t.update({"value": "value + 100"}, "user_id < 10")
    originals_untouched = int(files_before <= {e.path for e in t._snapshot().files})
    had_tombstones = int(len(t._snapshot().delete_files) > 0)
    t.rewrite_data_files(min_input_files=2)
    tombstones_after = len(t._snapshot().delete_files)
    return t.read().agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("value"), 2).cast("double").alias("sum_value"),
        F.lit(originals_untouched).cast("int").alias("originals_untouched"),
        F.lit(had_tombstones).cast("int").alias("had_tombstones"),
        F.lit(tombstones_after).cast("int").alias("tombstones_after_compaction"),
    )


@register(
    "delete_files_advisory",
    oracle=(
        # The advisory math is fully determined by the construction:
        # one base append (seq 1) + 5 equality-delete commits, each
        # applying to every base file → read_amplification_est =
        # 1 + 5·(total/total) = 6.0 exactly, independent of parquet
        # byte sizes. The 6th delete crosses the opt-in
        # auto-compact-after-files=6 threshold, the post-commit hook
        # folds every tombstone, and the advisory returns to 1.0/'ok'.
        # cnt/sum_price prove the fold preserved the data.
        "SELECT CAST(5 AS BIGINT) AS delete_files_outstanding, "
        "'compact' AS advice_before, "
        "CAST(6.0 AS DOUBLE) AS read_amp_before, "
        "CAST(0 AS BIGINT) AS delete_files_after, "
        "'ok' AS advice_after, "
        "CAST(1.0 AS DOUBLE) AS read_amp_after, "
        "COUNT(*) AS cnt, "
        "CAST(ROUND(SUM(o_totalprice), 2) AS DOUBLE) AS sum_price "
        "FROM orders WHERE o_orderkey % 4 = 1 AND o_orderkey % 50 > 5"
    ),
)
def delete_files_advisory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality-delete compaction advisory + opt-in auto-compaction
    (VERDICT r4 item 4; reference analogue: maintenance acceptance,
    spec `:85,:104`). BASELINE.md measures a 4.9× read tax at 5
    outstanding equality delete files; ``maintenance_advice()`` makes
    that operational from manifests alone — outstanding delete-file
    counts, the estimated read amplification (1 + one extra pass over
    the files each delete applies to), and a 'compact' verdict past the
    ``write.delete.compact-advice-after-files`` threshold — and
    ``write.delete.auto-compact-after-files=N`` triggers the targeted
    MoR debt compactor post-commit once N files are outstanding. At
    100 TB this is the knob that keeps CDC read latency bounded without
    a human watching `.delete_files`."""
    od = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_totalprice")
    d = _tmp_table_dir()
    t = LakeTable.create(
        spark, d, "o_orderkey bigint, o_totalprice double",
        partition_by=["bucket(8, o_orderkey)"],
        properties={"write.delete.auto-compact-after-files": "6"},
    )
    t.append(od.filter(F.col("o_orderkey") % 4 == 1))
    for i in range(5):
        t.delete_by_keys(od.filter(F.col("o_orderkey") % 50 == i).select("o_orderkey"))
    before = t.maintenance_advice().collect()[0]
    # 6th delete crosses the threshold → post-commit fold fires
    t.delete_by_keys(od.filter(F.col("o_orderkey") % 50 == 5).select("o_orderkey"))
    after = t.maintenance_advice().collect()[0]
    return t.read().agg(
        F.lit(before["delete_file_count"]).cast("bigint").alias("delete_files_outstanding"),
        F.lit(before["advice"]).alias("advice_before"),
        F.lit(before["read_amplification_est"]).cast("double").alias("read_amp_before"),
        F.lit(after["delete_file_count"]).cast("bigint").alias("delete_files_after"),
        F.lit(after["advice"]).alias("advice_after"),
        F.lit(after["read_amplification_est"]).cast("double").alias("read_amp_after"),
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("o_totalprice"), 2).cast("double").alias("sum_price"),
    )


@register(
    "cdc_equality_upsert",
    oracle=(
        # Last-writer-wins state after an equality-delete retraction and
        # a CDC upsert batch, expressed as pure SQL over the base rows:
        # retracted keys (o_orderkey % 100 = 7) vanish, upserted keys
        # (o_orderkey % 10 = 1) carry the doubled price.
        "SELECT COUNT(*) AS cnt, "
        "CAST(ROUND(SUM(CASE WHEN o_orderkey % 10 = 1 "
        "THEN o_totalprice * 2 ELSE o_totalprice END), 2) AS DOUBLE) AS sum_price "
        "FROM orders WHERE o_orderkey % 5 <> 0 AND o_orderkey % 100 <> 7"
    ),
)
def cdc_equality_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality-delete files + CDC upsert (Iceberg v2 content=2, the
    Flink-CDC write path): ``upsert_by_keys`` commits the new row
    images AND an equality-delete of their keys in one snapshot —
    without ever reading the target — and ``delete_by_keys`` retracts
    keys blind. The sequence-number guard makes the new images survive
    their own retraction. At 100 TB an upsert batch costs O(batch)
    writes, zero table scans; readers fold the key tombstones in as a
    broadcast anti-join."""
    od = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_totalprice")
    d = _tmp_table_dir()
    t = LakeTable.create(
        spark, d, "o_orderkey bigint, o_totalprice double",
        partition_by=["bucket(8, o_orderkey)"],
    )
    t.append(od.filter(F.col("o_orderkey") % 5 != 0))
    # CDC upsert batch: doubled price for keys ending in 1
    t.upsert_by_keys(
        od.filter(F.col("o_orderkey") % 10 == 1)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2),
        on=["o_orderkey"],
    )
    # blind retraction of a key slice (includes keys never present)
    t.delete_by_keys(
        od.filter(F.col("o_orderkey") % 100 == 7).select("o_orderkey")
    )
    return t.read().agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("o_totalprice"), 2).cast("double").alias("sum_price"),
    )


@register(
    "mv_incremental_maintenance",
    oracle=(
        # Full recompute of the final base state in pure SQL: the three
        # change batches are deterministic orders slices — init + insert
        # = o_orderkey % 5 <= 3, delete removes % 11 = 0, and the
        # update multiplied 'F'-status % 7 = 0 rows by 1.1. The QUERY
        # side never recomputes: it returns the delta-maintained MV, so
        # a wrong delta (or a missed change) mismatches here. Revenue
        # is exact integer CENTS: a double running sum accumulates ±fp
        # error across deltas and lands a cent off the full recompute
        # (measured at sf0.01) — the classic reason incremental engines
        # maintain aggregates in decimals, not floats.
        "SELECT o_orderstatus, COUNT(*) AS n_orders, "
        "CAST(SUM(CAST(ROUND(CASE WHEN o_orderstatus = 'F' AND o_orderkey % 7 = 0 "
        "THEN o_totalprice * 1.1 ELSE o_totalprice END * 100) AS BIGINT)) AS BIGINT) "
        "AS revenue_cents "
        "FROM orders WHERE o_orderkey % 5 <= 3 AND o_orderkey % 11 <> 0 "
        "GROUP BY o_orderstatus"
    ),
)
def mv_incremental_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance from the snapshot
    changelog: a revenue-per-status MV (itself a LakeTable) is kept
    current across an append, a copy-on-write UPDATE, and a DELETE by
    applying ONLY the per-batch net changes — ``changelog()``'s
    insert/delete rows aggregated into per-key deltas and upserted into
    the MV. The returned DataFrame is the maintained MV; the oracle
    recomputes the final aggregate from scratch, so the row goes red if
    any delta is wrong, missed, or double-applied.

    At 100 TB this is the continuous-aggregate refresh shape: each
    refresh reads O(changed files) (the changelog diffs file states,
    not the table), shuffles one delta row per touched key, and
    upserts O(keys) rows — never rescanning the base table. The same
    loop driven by streaming_cdc_upsert_laketable's sink makes it a
    near-real-time rollup."""
    od = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    base = LakeTable.create(
        spark, _tmp_table_dir(),
        "o_orderkey bigint, o_orderstatus string, o_totalprice double",
        partition_by=["bucket(8, o_orderkey)"],
    )
    s0 = base.append(od.filter(F.col("o_orderkey") % 5 < 3))

    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    mv = LakeTable.create(
        spark, _tmp_table_dir(),
        "o_orderstatus string, n_orders bigint, revenue_cents bigint",
    )
    mv.append(
        base.read().groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents).alias("revenue_cents"),
        )
    )

    def refresh(from_id: int, to_id: int) -> None:
        sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(F.lit(-1))
        delta = (
            base.changelog(from_id, to_id)
            .groupBy("o_orderstatus")
            .agg(
                F.sum(sign).alias("dn"),
                F.sum(sign * cents).alias("dr"),
            )
        )
        merged = (
            mv.read().join(delta, "o_orderstatus", "full_outer")
            .filter(F.col("dn").isNotNull())
            .select(
                "o_orderstatus",
                (F.coalesce(F.col("n_orders"), F.lit(0)) + F.col("dn"))
                .cast("bigint").alias("n_orders"),
                (F.coalesce(F.col("revenue_cents"), F.lit(0)) + F.col("dr"))
                .cast("bigint").alias("revenue_cents"),
            )
        )
        # A group whose maintained count reaches 0 must LEAVE the MV —
        # a full recompute would omit it entirely, so keeping an
        # n_orders=0 row would diverge the moment a change batch
        # drains a group. Split the delta: surviving groups upsert,
        # emptied groups retract via equality delete (both O(delta)).
        mv.upsert_by_keys(merged.filter(F.col("n_orders") > 0), on=["o_orderstatus"])
        dead = merged.filter(F.col("n_orders") <= 0).select("o_orderstatus")
        if dead.limit(1).count() > 0:
            mv.delete_by_keys(dead)

    s1 = base.append(od.filter(F.col("o_orderkey") % 5 == 3))
    refresh(s0.snapshot_id, s1.snapshot_id)
    s2 = base.update(
        {"o_totalprice": "o_totalprice * 1.1"},
        "o_orderstatus = 'F' AND o_orderkey % 7 = 0",
    )
    refresh(s1.snapshot_id, s2.snapshot_id)
    s3 = base.delete_where("o_orderkey % 11 = 0")
    refresh(s2.snapshot_id, s3.snapshot_id)

    return mv.read().select("o_orderstatus", "n_orders", "revenue_cents")


@register(
    "mv_join_incremental_maintenance",
    oracle=(
        # Full recompute of the final two-table state in pure SQL.
        # Orders final = %4 <= 2 slices minus the %9 deletions;
        # customers final = %3 <> 0 seed with the %7 nation moves
        # applied. Revenue in integer cents (the fp-drift lesson).
        "WITH c AS (SELECT c_custkey, CASE WHEN c_custkey % 7 = 0 "
        "THEN (c_nationkey + 1) % 25 ELSE c_nationkey END AS nk "
        "FROM customer WHERE c_custkey % 3 <> 0) "
        "SELECT CAST(c.nk AS BIGINT) AS nation_key, "
        "CAST(COUNT(*) AS BIGINT) AS n_orders, "
        "CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
        "AS revenue_cents "
        "FROM orders o JOIN c ON o.o_custkey = c.c_custkey "
        "WHERE o.o_orderkey % 4 <= 2 AND o.o_orderkey % 9 <> 0 "
        "GROUP BY nation_key"
    ),
)
def mv_join_incremental_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN materialized view from TWO
    tables' changelogs — revenue per nation over orders ⋈ customer,
    kept current across an orders append, a customer UPDATE that moves
    customers between nations, and an orders DELETE. The incremental
    identity per sequential batch (only one side changes at a time) is
    Δ(A ⋈ B) = ΔA ⋈ B when A changed, and A ⋈ ΔB when B changed, with
    signed rows (insert = +1, delete = −1) so updates — delete+insert
    pairs in the changelog — transfer an order's revenue from the old
    nation to the new one in a single signed aggregate.

    At 100 TB this is the shape that keeps a join MV fresh without
    rejoining the tables: an orders batch joins O(batch) broadcast
    rows against the customer table; a customer change joins the
    orders table against O(changed customers) broadcast keys, with the
    orders scan pruned by its bucket(o_custkey) layout (the delta keys
    hash to a bounded set of buckets). Neither direction rescans both
    tables, and the MV upsert is O(touched nations). The returned
    DataFrame is the MAINTAINED MV — a wrong, missed, or
    double-applied delta fails the full-recompute oracle's hash."""
    od = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cu = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")

    orders = LakeTable.create(
        spark, _tmp_table_dir(),
        "o_orderkey bigint, o_custkey bigint, o_totalprice double",
        partition_by=["bucket(8, o_custkey)"],
    )
    cust = LakeTable.create(
        spark, _tmp_table_dir(),
        "c_custkey bigint, c_nationkey int",
    )
    o0 = orders.append(od.filter(F.col("o_orderkey") % 4 < 2))
    cust.append(cu.filter(F.col("c_custkey") % 3 != 0))

    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    mv = LakeTable.create(
        spark, _tmp_table_dir(),
        "nation_key bigint, n_orders bigint, revenue_cents bigint",
    )
    mv.append(
        orders.read().join(cust.read(), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_nationkey").cast("bigint").alias("nation_key"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents).alias("revenue_cents"),
        )
    )

    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(F.lit(-1))

    def apply_delta(delta: DataFrame) -> None:
        """Upsert per-nation deltas; retract groups drained to zero."""
        merged = (
            mv.read().join(delta, "nation_key", "full_outer")
            .filter(F.col("dn").isNotNull())
            .select(
                "nation_key",
                (F.coalesce(F.col("n_orders"), F.lit(0)) + F.col("dn"))
                .cast("bigint").alias("n_orders"),
                (F.coalesce(F.col("revenue_cents"), F.lit(0)) + F.col("dr"))
                .cast("bigint").alias("revenue_cents"),
            )
        )
        mv.upsert_by_keys(merged.filter(F.col("n_orders") > 0), on=["nation_key"])
        dead = merged.filter(F.col("n_orders") <= 0).select("nation_key")
        if dead.limit(1).count() > 0:
            mv.delete_by_keys(dead)

    def refresh_from_orders(from_id: int, to_id: int) -> None:
        """ΔA ⋈ B: the signed orders batch (small) broadcasts into the
        customer table to resolve each changed order's nation."""
        d = (
            orders.changelog(from_id, to_id)
            .select("o_custkey", sign.alias("s"), cents.alias("cts"))
        )
        delta = (
            F.broadcast(d)
            .join(cust.read(), F.col("o_custkey") == F.col("c_custkey"))
            .groupBy(F.col("c_nationkey").cast("bigint").alias("nation_key"))
            .agg(
                F.sum("s").alias("dn"),
                F.sum(F.col("s") * F.col("cts")).alias("dr"),
            )
        )
        apply_delta(delta)

    def refresh_from_customers(from_id: int, to_id: int) -> None:
        """A ⋈ ΔB: the signed customer batch (old row −, new row +)
        broadcasts into the orders table; each affected order transfers
        its revenue from the old nation to the new in one aggregate."""
        d = (
            cust.changelog(from_id, to_id)
            .select("c_custkey", "c_nationkey", sign.alias("s"))
        )
        delta = (
            orders.read()
            .join(F.broadcast(d), F.col("o_custkey") == F.col("c_custkey"))
            .groupBy(F.col("c_nationkey").cast("bigint").alias("nation_key"))
            .agg(
                F.sum("s").alias("dn"),
                F.sum(F.col("s") * cents).alias("dr"),
            )
        )
        apply_delta(delta)

    o1 = orders.append(od.filter(F.col("o_orderkey") % 4 == 2))
    refresh_from_orders(o0.snapshot_id, o1.snapshot_id)

    c0 = cust._snapshot().snapshot_id
    c1 = cust.update(
        {"c_nationkey": "(c_nationkey + 1) % 25"}, "c_custkey % 7 = 0"
    )
    refresh_from_customers(c0, c1.snapshot_id)

    o2 = orders.delete_where("o_orderkey % 9 = 0")
    refresh_from_orders(o1.snapshot_id, o2.snapshot_id)

    return mv.read().select("nation_key", "n_orders", "revenue_cents")


@register(
    "partition_evolution_read",
    oracle=(
        # Both partition-spec generations must come back in one read:
        # the per-type counts/sums cover gen A (days+bucket files) and
        # gen B (days+truncate files) together; the verdict columns are
        # pinned TRUE (computed from the actual manifest plan).
        "SELECT event_type, COUNT(*) AS n_events, "
        "ROUND(SUM(ROUND(value, 2)), 2) AS sum_value, "
        "TRUE AS gens_disjoint, TRUE AS pruned_day_both_gens, "
        "TRUE AS pruned_type_new_gen "
        "FROM events WHERE user_id < 80 AND ts < TIMESTAMP '2024-01-13' "
        "GROUP BY event_type"
    ),
)
def partition_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-spec evolution, the spec's §9 requirement
    (`ICEBERG-Interoperability-Test-Spec.md:78-79`: add a truncate
    field, remove a bucket field, verify engines still read the table).

    Iceberg semantics, LakeTable shape: evolution is METADATA-ONLY —
    no data rewrite. Gen-A files keep their ``days(ts), bucket(2,
    user_id)`` partition values; after ``DROP PARTITION FIELD bucket``
    + ``ADD PARTITION FIELD truncate(4, event_type)``, gen-B files
    carry ``days(ts), truncate(event_type)``. Reads union both
    generations; manifest pruning applies per-file under whichever
    keys the file actually has (a file that predates a spec field is
    kept, never wrongly pruned — `_prune_files` treats a missing key
    as match-all).

    The returned verdicts exercise the REAL planner:
    - ``gens_disjoint``: every file carries days(ts); bucket and
      truncate keys never co-occur; both generations non-empty.
    - ``pruned_day_both_gens``: a 3-day ts-range plan keeps files from
      BOTH generations (shared days field) and drops most files.
    - ``pruned_type_new_gen``: an event_type equality plan keeps every
      gen-A file (no truncate key — pruning it would lose rows) while
      keeping only the matching truncate value in gen B.

    At 100 TB this is the operation that lets a table re-partition for
    a new query pattern without rewriting history: old partitions
    prune under the old spec, new partitions under the new, and
    `rewrite_data_files` migrates stragglers lazily if wanted.
    """
    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    src = (
        load_table(spark, "events", sf_dir)
        .filter((F.col("user_id") < 80) & (F.col("ts") < "2024-01-13"))
        .select(*cols)
    )
    d = _tmp_table_dir()
    t = LakeTable.create(
        spark, d,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double",
        partition_by=["days(ts)", "bucket(2, user_id)"],
    )
    t.append(src.filter(F.col("event_id") % 2 == 0))
    t.drop_partition_field("bucket(2, user_id)")
    t.add_partition_field("truncate(4, event_type)")
    t.append(src.filter(F.col("event_id") % 2 == 1))

    files = t._snapshot().files
    gen_a = [e for e in files if "_p_bucket_user_id" in e.partition]
    gen_b = [e for e in files if "_p_truncate_event_type" in e.partition]
    gens_disjoint = (
        bool(gen_a) and bool(gen_b)
        and len(gen_a) + len(gen_b) == len(files)
        and all("_p_days_ts" in e.partition for e in files)
    )
    day_plan = t._prune_files(
        files, "ts >= '2024-01-03 00:00:00' and ts < '2024-01-06 00:00:00'"
    )
    day_paths = {e.path for e in day_plan}
    pruned_day_both_gens = (
        len(day_plan) < len(files)
        and any(e.path in day_paths for e in gen_a)
        and any(e.path in day_paths for e in gen_b)
    )
    type_plan = {e.path for e in t._prune_files(files, "event_type = 'error'")}
    pruned_type_new_gen = (
        len(type_plan) < len(files)
        # correctness side: gen-A files lack the truncate key and MUST
        # all survive the plan, else pre-evolution rows would be lost
        and all(e.path in type_plan for e in gen_a)
        and all(
            e.partition["_p_truncate_event_type"] == "erro"
            for e in gen_b if e.path in type_plan
        )
    )
    return (
        t.read()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.round("value", 2)), 2).alias("sum_value"),
        )
        .withColumn("gens_disjoint", F.lit(gens_disjoint))
        .withColumn("pruned_day_both_gens", F.lit(pruned_day_both_gens))
        .withColumn("pruned_type_new_gen", F.lit(pruned_type_new_gen))
    )


@register(
    "iceberg_puffin_stats_roundtrip",
    oracle=(
        # Exact legs: per-column null counts + row count of the same
        # slice; the approximate leg (NDV) is pinned as a TRUE flag —
        # the Puffin theta sketch's estimate equals the ANALYZE NDV by
        # construction (retained/theta identity), so adoption must
        # recover it EXACTLY, not within tolerance.
        "WITH sv AS (SELECT s_suppkey, s_name, "
        "CASE WHEN s_suppkey % 5 = 0 THEN NULL ELSE s_acctbal END "
        "AS s_acctbal FROM supplier) "
        "SELECT col, null_count, "
        "(SELECT COUNT(*) FROM sv) AS row_count, "
        "TRUE AS ndv_roundtrip_ok FROM ("
        "SELECT 's_acctbal' AS col, "
        "COUNT(CASE WHEN s_acctbal IS NULL THEN 1 END) AS null_count "
        "FROM sv "
        "UNION ALL SELECT 's_name', "
        "COUNT(CASE WHEN s_name IS NULL THEN 1 END) FROM sv "
        "UNION ALL SELECT 's_suppkey', "
        "COUNT(CASE WHEN s_suppkey IS NULL THEN 1 END) FROM sv) "
        "ORDER BY col"
    ),
)
def iceberg_puffin_stats_roundtrip(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Puffin statistics across the export/adopt boundary (VERDICT
    r11 item 5, driver-checked): ANALYZE computes NDV + null counts,
    the Iceberg export writes them as a spec-shaped Puffin file
    (apache-datasketches-theta-v1 blobs referenced from
    metadata.json ``statistics``), and ADOPTION parses the sketches
    back — so a conforming reader recovers what the table already
    knew instead of re-deriving it with a scan. The returned rows
    carry the EXACT profile parts (null counts, row count —
    hash-compared against DuckDB) plus the roundtrip verdict: the
    adopted NDV must equal the native NDV EXACTLY (the synthesized
    compact theta sketch's estimate is the NDV by the
    retained/theta identity — tested to double precision in
    tests/test_puffin.py), and the chain must be validator-clean."""
    from ..catalog.iceberg_export import (
        adopt_iceberg_metadata,
        to_iceberg_metadata,
        validate_iceberg_metadata,
    )

    src = load_table(spark, "supplier", sf_dir).select(
        "s_suppkey", "s_name",
        F.when(F.col("s_suppkey") % 5 == 0, F.lit(None))
        .otherwise(F.col("s_acctbal")).alias("s_acctbal"),
    )
    d = _tmp_table_dir()
    t = LakeTable.create(
        spark, os.path.join(d, "t"),
        "s_suppkey bigint, s_name string, s_acctbal double")
    t.append(src)
    native = t.analyze()
    meta_path = to_iceberg_metadata(t, manifest_format="avro")
    assert validate_iceberg_metadata(meta_path) == []
    adopted = adopt_iceberg_metadata(
        spark, meta_path, os.path.join(d, "adopted")).column_stats()
    assert adopted is not None \
        and adopted["row_count"] == native["row_count"]
    rows = [
        (
            col,
            int(cs["null_count"]),
            int(native["row_count"]),
            adopted["columns"][col]["ndv"] == cs["ndv"]
            and adopted["columns"][col]["null_count"] == cs["null_count"],
        )
        for col, cs in sorted(native["columns"].items())
    ]
    return spark.createDataFrame(
        rows,
        "col string, null_count bigint, row_count bigint, "
        "ndv_roundtrip_ok boolean",
    ).orderBy("col")


@register(
    "analyze_table_stats",
    oracle=(
        # Exact per-column profile of the same slice (nulls injected at
        # event_id % 10 = 0): null counts and row counts must match
        # EXACTLY (they are not approximated); the HLL NDV must land
        # within 5% of the exact distinct count (rsd ≈ 1.6%, so 5% is
        # a >3-sigma bound) — pinned TRUE.
        "WITH ev AS (SELECT event_id, user_id, event_type, "
        "CASE WHEN event_id % 10 = 0 THEN NULL ELSE value END AS value "
        "FROM events WHERE user_id < 100) "
        "SELECT col, null_count, "
        "(SELECT COUNT(*) FROM ev) AS row_count, TRUE AS ndv_ok FROM ("
        "SELECT 'event_id' AS col, COUNT(CASE WHEN event_id IS NULL THEN 1 END) AS null_count FROM ev "
        "UNION ALL SELECT 'user_id', COUNT(CASE WHEN user_id IS NULL THEN 1 END) FROM ev "
        "UNION ALL SELECT 'event_type', COUNT(CASE WHEN event_type IS NULL THEN 1 END) FROM ev "
        "UNION ALL SELECT 'value', COUNT(CASE WHEN value IS NULL THEN 1 END) FROM ev)"
    ),
)
def analyze_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE → Puffin-role column statistics: NDV sketches +
    null counts per column, stored in table metadata stamped with the
    snapshot id. The returned rows carry the EXACT parts of the
    profile (null counts, row count — hash-compared against DuckDB)
    plus a bounded-error verdict for the approximate part (HLL NDV
    within 5% of the exact distinct count, computed in-plan). The
    stats must also round-trip through metadata: the returned rows
    read from ``column_stats()`` after a reload, not from the analyze
    call's own return value."""
    src = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("user_id") < 100)
        .select(
            "event_id", "user_id", "event_type",
            F.when(F.col("event_id") % 10 == 0, F.lit(None))
            .otherwise(F.col("value")).alias("value"),
        )
    )
    d = _tmp_table_dir()
    t = LakeTable.create(
        spark, d,
        "event_id bigint, user_id bigint, event_type string, value double",
    )
    t.append(src)
    t.analyze()

    # round-trip: a FRESH handle must see the persisted stats
    t2 = LakeTable.load(spark, d)
    stats = t2.column_stats()
    assert stats is not None and stats["snapshot_id"] == t2._snapshot().snapshot_id

    exact = {
        r["col"]: r["nd"]
        for r in src.groupBy().agg(
            *[
                F.countDistinct(c).alias(c)
                for c in ("event_id", "user_id", "event_type", "value")
            ]
        ).selectExpr(
            "stack(4, 'event_id', event_id, 'user_id', user_id, "
            "'event_type', event_type, 'value', value) AS (col, nd)"
        ).collect()
    }
    rows = [
        (
            c,
            stats["columns"][c]["null_count"],
            stats["row_count"],
            abs(stats["columns"][c]["ndv"] - exact[c]) <= 0.05 * exact[c],
        )
        for c in ("event_id", "user_id", "event_type", "value")
    ]
    return spark.createDataFrame(
        rows, "col string, null_count bigint, row_count bigint, ndv_ok boolean"
    )


@register(
    "migrate_parquet_inplace",
    oracle=(
        "SELECT event_type, COUNT(*) AS n_events, "
        "ROUND(SUM(ROUND(value, 2)), 2) AS sum_value, "
        "TRUE AS zero_copy, TRUE AS stats_collected "
        "FROM events WHERE user_id < 80 GROUP BY event_type"
    ),
)
def migrate_parquet_inplace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg's ``migrate`` + ``add_files`` on-ramp: an existing
    plain-parquet directory becomes a catalog table WITHOUT copying a
    byte, then a SECOND historical drop joins the live table through
    ``add_files`` — the manifests point at the original files
    (absolute paths) with footer stats collected at import, so
    pruning works from commit one. Verdicts (pinned TRUE):
    ``zero_copy`` — every imported manifest entry resolves into the
    legacy directory, and the legacy files' byte sizes are unchanged;
    ``stats_collected`` — every entry carries event_id min/max. The
    returned aggregate reads THROUGH the migrated table, so a
    mis-imported file breaks the hash. At 100 TB this is a metadata
    pass (threaded footer reads) instead of a petabyte rewrite;
    `rewrite_data_files` folds stragglers into table-owned layout
    lazily (proven in `test_migrate_parquet_inplace`)."""
    import os as _os

    src = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("user_id") < 60)
        .select("event_id", "event_type", "value")
    )
    base = _tmp_table_dir()  # parent scratch for legacy + table
    legacy = base + "-legacy"
    src.repartition(4).write.parquet(legacy)
    sizes_before = {
        p: _os.path.getsize(_os.path.join(legacy, p))
        for p in _os.listdir(legacy) if p.endswith(".parquet")
    }

    t = LakeTable.migrate_parquet(spark, legacy, base)

    # round 7: a SECOND historical drop joins the EXISTING table via
    # add_files (Iceberg's sibling procedure) — same zero-copy bar
    legacy2 = base + "-legacy2"
    (
        load_table(spark, "events", sf_dir)
        .filter((F.col("user_id") >= 60) & (F.col("user_id") < 80))
        .select("event_id", "event_type", "value")
        .repartition(2).write.parquet(legacy2)
    )
    t.add_files(legacy2)

    files = t._snapshot().files
    roots = (_os.path.abspath(legacy), _os.path.abspath(legacy2))
    zero_copy = (
        all(e.path.startswith(roots) for e in files)
        and all(
            _os.path.getsize(_os.path.join(legacy, p)) == sz
            for p, sz in sizes_before.items()
        )
        and len(files) > len(sizes_before)
    )
    stats_collected = all("event_id" in e.stats for e in files)
    return (
        t.read()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.round("value", 2)), 2).alias("sum_value"),
        )
        .withColumn("zero_copy", F.lit(zero_copy))
        .withColumn("stats_collected", F.lit(stats_collected))
    )


@register(
    "insert_overwrite_backfill",
    oracle=(
        # Final state after the corrected rerun of one partition:
        # the 1-URGENT partition's prices were re-derived (+100),
        # every other partition carried over byte-identical.
        "SELECT o_orderkey, o_orderpriority, "
        "ROUND(CASE WHEN o_orderpriority = '1-URGENT' "
        "THEN o_totalprice + 100 ELSE o_totalprice END, 2) AS price_out "
        "FROM orders"
    ),
)
def insert_overwrite_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSERT OVERWRITE (dynamic) — Iceberg's ReplacePartitions, the
    backfill shape: a partition's pipeline is re-run with corrected
    logic and its output replaces exactly that partition; every other
    partition is untouched (carried by reference, no rewrite). Here the
    '1-URGENT' identity partition of an orders copy is re-derived with
    +100 prices; the oracle reconstructs the final state with a CASE.
    At 100 TB the commit is O(changed partitions): the replacement set
    is matched on partition VALUES in the manifest, so untouched files
    are never opened, and the summary's replaced-data-files count is
    test-pinned to the one partition's files."""
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    d = _tmp_table_dir()
    t = LakeTable.create(
        spark, d,
        "o_orderkey bigint, o_orderpriority string, o_totalprice double",
        partition_by=["identity(o_orderpriority)"],
    )
    t.append(orders)
    corrected = orders.filter(F.col("o_orderpriority") == "1-URGENT").withColumn(
        "o_totalprice", F.col("o_totalprice") + 100
    )
    t.overwrite_partitions(corrected)
    return t.read().select(
        "o_orderkey", "o_orderpriority",
        F.round("o_totalprice", 2).alias("price_out"),
    )


@register(
    "iceberg_validate_preflight",
    oracle=(
        # deterministic findings contract (the rest_catalog_conformance
        # pinned-transcript pattern): a clean chain yields zero
        # findings; the five-way sabotage yields exactly these codes;
        # repair fixes the fixable three and the re-validation keeps
        # only the unrepairable error + the invalid-spec warning
        # (r11: decimal/binary truncate are PORTABLE — the truncate
        # sabotage is now over a double source, which the Iceberg spec
        # does not define truncate on at all)
        "SELECT 'clean' AS phase, CAST(0 AS BIGINT) AS n_errors, "
        "CAST(0 AS BIGINT) AS n_warnings, CAST(0 AS BIGINT) AS n_infos, "
        "'' AS codes "
        "UNION ALL SELECT 'repair', 0, 0, 0, "
        "'dangling-ref,manifest-length-drift,missing-data-file' "
        "UNION ALL SELECT 'repaired', 1, 1, 0, "
        "'invalid-transform-source,unresolvable-equality-id' "
        "UNION ALL SELECT 'sabotaged', 3, 2, 0, "
        "'dangling-ref,invalid-transform-source,manifest-length-drift,"
        "missing-data-file,unresolvable-equality-id' "
        "ORDER BY phase"
    ),
)
def iceberg_validate_preflight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adoption preflight, driver-checked: author a foreign chain (the
    same shape ``iceberg_register_adopted`` adopts — DuckDB parquet,
    Avro manifests would behave identically), validate it CLEAN, then
    sabotage it five distinct ways (dangling ref, vanished data file,
    alien equality-id, manifest-length drift, truncate-over-double
    spec — a transform the Iceberg spec does not define) and pin the
    exact finding codes and severity counts
    (``validate_iceberg_metadata`` — the reference is a validation
    harness; this is the validation surface pointed at Iceberg
    metadata itself)."""
    import duckdb as _duck

    from ..catalog.iceberg_export import validate_iceberg_metadata

    root = _tmp_table_dir()
    data = os.path.join(root, "data")
    metad = os.path.join(root, "metadata")
    os.makedirs(data)
    os.makedirs(metad)
    src = os.path.join(sf_dir, "region.parquet")
    f1 = os.path.join(data, "f1.parquet")
    f2 = os.path.join(data, "f2.parquet")
    eq = os.path.join(data, "eq.parquet")
    con = _duck.connect()
    con.execute(f"COPY (SELECT r_regionkey AS k, r_name AS v "
                f"FROM read_parquet('{src}')) TO '{f1}' (FORMAT PARQUET)")
    con.execute(f"COPY (SELECT r_regionkey + 10 AS k, r_name AS v "
                f"FROM read_parquet('{src}')) TO '{f2}' (FORMAT PARQUET)")
    con.execute(f"COPY (SELECT CAST(0 AS BIGINT) AS k) TO '{eq}' "
                "(FORMAT PARQUET)")
    con.close()

    def entry(path, snap, seq, content=0, **extra):
        return {"status": 1, "snapshot-id": snap, "data-file": {
            "content": content, "file-path": path, "file-format": "PARQUET",
            "partition": {}, "data-sequence-number": seq,
            "record-count": 5,
            "file-size-in-bytes": os.path.getsize(path), **extra}}

    def manifest(name, entries):
        p = os.path.join(metad, name)
        with open(p, "w") as fh:
            json.dump({"partition-spec-id": 0, "entries": entries}, fh)
        return p

    m1 = manifest("m1.json", [entry(f1, 1, 1)])
    m2 = manifest("m2.json", [entry(f1, 1, 1), entry(f2, 2, 2)])
    d2 = manifest("d2.json", [entry(eq, 2, 2, content=2,
                                    **{"equality-ids": [1]})])

    def mlist(name, pairs):
        p = os.path.join(metad, name)
        with open(p, "w") as fh:
            json.dump({"manifests": [
                {"manifest-path": mp, "manifest-length": os.path.getsize(mp),
                 "content": c, "partition-spec-id": 0}
                for mp, c in pairs]}, fh)
        return p

    schema = {"type": "struct", "schema-id": 0, "fields": [
        {"id": 1, "name": "k", "required": False, "type": "long"},
        {"id": 2, "name": "v", "required": False, "type": "string"},
        {"id": 3, "name": "w", "required": False, "type": "decimal(9, 2)"},
        {"id": 4, "name": "x", "required": False, "type": "double"}]}
    md = {
        "format-version": 2, "location": root, "last-column-id": 4,
        "current-schema-id": 0, "schemas": [schema],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999, "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {}, "current-snapshot-id": 2,
        "snapshots": [
            {"snapshot-id": 1, "sequence-number": 1,
             "timestamp-ms": 1_700_000_001_000, "schema-id": 0,
             "manifest-list": mlist("sl1.json", [(m1, 0)]),
             "summary": {"operation": "append"}},
            {"snapshot-id": 2, "parent-snapshot-id": 1,
             "sequence-number": 2, "timestamp-ms": 1_700_000_002_000,
             "schema-id": 0,
             "manifest-list": mlist("sl2.json", [(m2, 0), (d2, 1)]),
             "summary": {"operation": "overwrite"}}],
        "refs": {},
    }
    mp = os.path.join(metad, "v2.metadata.json")
    with open(mp, "w") as fh:
        json.dump(md, fh)
    clean = validate_iceberg_metadata(mp)

    # five-way sabotage, same as the pytest pin
    md["refs"] = {"ghost": {"snapshot-id": 999, "type": "tag"}}
    # double source: truncate is undefined on it per the Iceberg spec
    # (decimal/binary truncate are value-exact native itruncate since
    # r11; string/int/long since r10) — flags invalid-transform-source
    md["partition-specs"][0]["fields"].append(
        {"field-id": 1000, "source-id": 4, "name": "x_trunc",
         "transform": "truncate[8]"})
    with open(mp, "w") as fh:
        json.dump(md, fh)
    os.remove(f2)
    doc = json.load(open(d2))
    # same byte width as the original id so THIS file's declared
    # manifest-length stays true — only m1 drifts
    doc["entries"][0]["data-file"]["equality-ids"] = [7]
    with open(d2, "w") as fh:
        json.dump(doc, fh)
    with open(m1, "a") as fh:
        fh.write(" ")
    bad = validate_iceberg_metadata(mp)

    # ... and REPAIR the fixable (VERDICT r9 item 4): quarantine the
    # vanished file's entries, re-resolve drifted manifest lengths,
    # drop the ghost ref — then re-validate: only the unrepairable
    # (alien equality id) and the invalid-spec warning remain
    from ..catalog.iceberg_export import repair_iceberg_metadata

    acts = repair_iceberg_metadata(mp)
    repaired = validate_iceberg_metadata(mp)

    def row(phase, findings):
        sev = [f["severity"] for f in findings]
        return (phase, sev.count("error"), sev.count("warning"),
                sev.count("info"),
                ",".join(sorted({f["code"] for f in findings})))

    act_row = ("repair", 0, 0, 0,
               ",".join(sorted({a["code"] for a in acts
                                if a["action"] == "applied"})))
    return spark.createDataFrame(
        [row("clean", clean), act_row, row("repaired", repaired),
         row("sabotaged", bad)],
        "phase string, n_errors bigint, n_warnings bigint, "
        "n_infos bigint, codes string",
    ).orderBy("phase")
