"""SQL frontend + plan runner tests: the reference's statement corpus
executed end-to-end, plus validator semantics."""

import pytest

from iceberg_catalog_bench_spark.engine import (
    PlanRunner,
    SqlEngine,
    StatementResult,
    Validation,
    ValidationError,
    apply_validations,
    derive_rowcount,
    split_statements,
)


@pytest.fixture()
def engine(spark, tmp_path):
    return SqlEngine(spark, str(tmp_path / "warehouse"))


def test_split_statements():
    script = "SELECT 1; -- comment; with semicolon\nSELECT 'a;b';\nSELECT 2"
    stmts = split_statements(script)
    assert stmts == ["SELECT 1;".rstrip(";").strip() or "SELECT 1", "SELECT 'a;b'", "SELECT 2"] or len(stmts) == 3
    assert stmts[1] == "SELECT 'a;b'"


def test_ddl_dml_roundtrip(engine):
    engine.execute("CREATE NAMESPACE IF NOT EXISTS ns1")
    engine.execute(
        "CREATE TABLE ns1.t (id bigint, v double) USING iceberg PARTITIONED BY (bucket(4, id))"
    )
    engine.execute("INSERT INTO ns1.t VALUES (1, 1.5), (2, 2.5), (3, 3.5)")
    res = engine.execute("SELECT COUNT(*) AS row_count FROM ns1.t")[0]
    assert res.rows[0]["row_count"] == 3
    engine.execute("UPDATE ns1.t SET v = v * 2 WHERE id = 1")
    res = engine.execute("SELECT v FROM ns1.t WHERE id = 1")[0]
    assert res.rows[0]["v"] == 3.0
    engine.execute("DELETE FROM ns1.t WHERE id = 3")
    res = engine.execute("SELECT COUNT(*) AS c FROM ns1.t")[0]
    assert res.rows[0]["c"] == 2
    # SHOW surfaces (D13)
    tables = engine.execute("SHOW TABLES")[0]
    assert {r["tableName"] for r in tables.rows} == {"ns1.t"}
    engine.execute("DROP TABLE ns1.t")
    assert not engine.table_exists("ns1.t")


def test_merge_statement(engine):
    engine.execute("CREATE NAMESPACE IF NOT EXISTS ns2")
    engine.execute("CREATE TABLE ns2.m (id bigint, qty int)")
    engine.execute("INSERT INTO ns2.m VALUES (1, 10), (2, 20)")
    engine.execute(
        "MERGE INTO ns2.m AS t USING (VALUES (2, 99), (3, 30)) AS s (id, qty) "
        "ON t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET t.qty = s.qty "
        "WHEN NOT MATCHED THEN INSERT (id, qty) VALUES (s.id, s.qty)"
    )
    rows = engine.execute("SELECT id, qty FROM ns2.m ORDER BY id")[0].rows
    assert [(r["id"], r["qty"]) for r in rows] == [(1, 10), (2, 99), (3, 30)]


def test_time_travel_sql(engine):
    engine.execute("CREATE TABLE tt (id bigint)")
    engine.execute("INSERT INTO tt VALUES (1), (2)")
    engine.execute("INSERT INTO tt VALUES (3)")
    cur = engine.execute("SELECT COUNT(*) AS c FROM tt")[0].rows[0]["c"]
    old = engine.execute("SELECT COUNT(*) AS c FROM tt VERSION AS OF 1")[0].rows[0]["c"]
    snaps = engine.execute("SELECT snapshot_id FROM tt.snapshots")[0]
    assert (cur, old) == (3, 2)
    assert len(snaps.rows) == 2


def test_call_procedures(engine):
    engine.execute("CREATE TABLE mt (id bigint)")
    engine.execute("INSERT INTO mt VALUES (1)")
    engine.execute("INSERT INTO mt VALUES (2)")
    res = engine.execute(
        "CALL system.rewrite_data_files(table => 'mt', options => map('min-input-files','2'))"
    )[0]
    assert res.rows[0]["rewritten_data_files_count"] >= 2


def test_validator_semantics():
    results = [StatementResult("SELECT", rows=[{"row_count": 7}], rowcount=1)]
    state: dict = {}
    outcomes = apply_validations(
        [
            Validation("rowcount_equals", expected=7),
            Validation("store_rowcount_as", name="base"),
            Validation("store_rows_as", name="rows"),
        ],
        results,
        state,
    )
    assert len(outcomes) == 3 and state["base"] == 7
    with pytest.raises(ValidationError):
        apply_validations([Validation("rowcount_equals", expected=8)], results, state)
    # derivation heuristic: single-column first cell
    assert derive_rowcount(StatementResult("s", rows=[{"sum_qty": 39}])) == 39
    # fallback: captured row list length
    assert derive_rowcount(StatementResult("s", rows=[{"a": 1, "b": 2}] * 5)) == 5


def test_full_crud_plan(spark, tmp_path):
    import os

    engine = SqlEngine(spark, str(tmp_path / "wh"))
    cfg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "iceberg_catalog_bench_spark", "plans", "crud_plan.yaml",
    )
    runner = PlanRunner.from_yaml(engine, cfg)
    report = runner.run_plan("sales_events_crud", namespace="plan_ns")
    for st in report.steps:
        assert st.status == "passed", f"{st.name}: {st.error}"
    assert report.status == "passed"
    assert len(report.steps) == 12
    checks = runner.state["final_checksums"][0]
    assert checks["row_count"] == 9
    assert checks["sum_qty"] == 38
    assert float(checks["revenue"]) == pytest.approx(487.94)


def test_view_lifecycle(engine):
    """Reference §2.8 view surface: create / query / replace / show /
    drop, with SQL-representation bodies over lake tables."""
    engine.execute("CREATE TABLE vt (id bigint, v double)")
    engine.execute("INSERT INTO vt VALUES (1, 10.0), (2, 20.0), (3, 30.0)")
    engine.execute("CREATE VIEW big_v AS SELECT id, v FROM vt WHERE v >= 20")
    rows = engine.execute("SELECT COUNT(*) AS c FROM big_v")[0].rows
    assert rows[0]["c"] == 2
    engine.execute("CREATE OR REPLACE VIEW big_v AS SELECT id, v FROM vt WHERE v >= 30")
    rows = engine.execute("SELECT COUNT(*) AS c FROM big_v")[0].rows
    assert rows[0]["c"] == 1
    shown = engine.execute("SHOW VIEWS")[0].rows
    assert {r["viewName"] for r in shown} == {"big_v"}
    engine.execute("DROP VIEW big_v")
    assert engine._views() == {}


def test_ctas_and_insert_select(engine):
    """CTAS + INSERT INTO ... SELECT — derived-table lifecycle."""
    engine.execute("CREATE TABLE src (id bigint, v double)")
    engine.execute("INSERT INTO src VALUES (1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0)")
    engine.execute("CREATE TABLE evens AS SELECT id, v * 10 AS v10 FROM src WHERE id % 2 = 0")
    rows = engine.execute("SELECT id, v10 FROM evens ORDER BY id")[0].rows
    assert [(r["id"], r["v10"]) for r in rows] == [(2, 20.0), (4, 40.0)]
    engine.execute("INSERT INTO evens SELECT id, v * 10 AS v10 FROM src WHERE id = 1")
    assert engine.execute("SELECT COUNT(*) AS c FROM evens")[0].rows[0]["c"] == 3


def test_unsupported_statements_raise_clearly(engine):
    """Unparseable statements fail loudly with the statement echoed —
    never silently skipped (step isolation happens in the runner)."""
    engine.execute("CREATE TABLE errt (id bigint)")
    for bad in (
        "GRANT SELECT ON errt TO someone",
        "ALTER TABLE errt SET SOMETHING weird",
        "MERGE INTO errt USING x ON bad syntax",
    ):
        with pytest.raises(Exception) as ei:
            engine.execute(bad)
        assert bad.split()[0].lower() in str(ei.value).lower() or "unsupported" in str(ei.value).lower()


def test_drop_column_via_sql(engine):
    engine.execute("CREATE NAMESPACE IF NOT EXISTS nsd")
    engine.execute("CREATE TABLE nsd.d (id bigint, v double, junk string)")
    engine.execute("INSERT INTO nsd.d VALUES (1, 1.5, 'x'), (2, 2.5, 'y')")
    engine.execute("ALTER TABLE nsd.d DROP COLUMN junk")
    res = engine.execute("DESCRIBE TABLE nsd.d")[0]
    assert [r["col_name"] for r in res.rows] == ["id", "v"]
    rows = engine.execute("SELECT * FROM nsd.d ORDER BY id")[0].rows
    assert rows == [{"id": 1, "v": 1.5}, {"id": 2, "v": 2.5}]


def test_ddl_lifecycle_plan_green(spark):
    """The ddl_lifecycle plan (D2/D5/D9-D14/P5/T3 + V5) must pass all
    six steps with the pinned catalog-state counts — this is the
    driver row covering the otherwise pytest-only §2.1 statements."""
    from iceberg_catalog_bench_spark.operators import registry

    registry.load_all()
    row = registry.QUERIES["ddl_lifecycle"](spark, "/root/testdata/sf0.001").collect()[0]
    assert row["status"] == "passed"
    assert row["steps_passed"] == 6
    assert row["described_cols"] == 4
    assert row["rows_at_travel_ts"] == 3
    assert row["tables_after_teardown"] == 0
    # r8 widening: DESCRIBE EXTENDED detail rows, single-key
    # TBLPROPERTIES (+ missing-key error), REPLACE TAG/BRANCH + RETAIN
    # round-tripped through t.refs
    assert row["ext_detail_ok"] == 1
    assert row["ext_partition_spec"] == "days(ts)"
    assert row["ext_identifier_fields"] == "item_id"
    assert row["prop_value"] == "4"
    assert row["missing_prop_errors"] == 1
    assert row["tag_retain_ms"] == 45 * 86_400_000
    assert row["branch_retain_ms"] == 7 * 86_400_000
    assert row["branch_min_keep"] == 2
    assert row["tag_at_first_snapshot"] == 1
    assert row["refs_count"] == 2


def test_snowflake_at_offset_relative_travel(engine):
    """AT(OFFSET => -n) — Snowflake's seconds-relative time travel
    (reference snowflake.sql:358) — must resolve to the snapshot
    current n seconds ago; AT(TIMESTAMP => CAST(...)) is the absolute
    spelling (snowflake.sql:356)."""
    import time

    import datetime as dt

    engine.execute("CREATE NAMESPACE IF NOT EXISTS rel")
    engine.execute("CREATE TABLE rel.t (id bigint)")
    engine.execute("INSERT INTO rel.t VALUES (1), (2)")
    time.sleep(1.5)
    engine.execute("INSERT INTO rel.t VALUES (3)")
    now_rows = engine.execute("SELECT COUNT(*) AS c FROM rel.t AT(OFFSET => -0)")[0].rows
    assert now_rows[0]["c"] == 3
    # aim between the two commits: the offset resolves relative to NOW
    # at statement execution, so derive it from the recorded commit times
    snaps = engine.execute("SELECT committed_at FROM rel.t.snapshots ORDER BY committed_at")[0].rows
    t1, t2 = snaps[0]["committed_at"], snaps[-1]["committed_at"]
    mid = t1 + (t2 - t1) / 2
    off = (mid - dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)).total_seconds()
    old_rows = engine.execute(f"SELECT COUNT(*) AS c FROM rel.t AT(OFFSET => {off:.3f})")[0].rows
    assert old_rows[0]["c"] == 2
    # arithmetic offsets parse like the reference's -60*1800 form
    assert engine.execute("SELECT COUNT(*) AS c FROM rel.t AT(OFFSET => -0*1800)")[0].rows[0]["c"] == 3
    ts = snaps[-1]["committed_at"]
    abs_rows = engine.execute(
        f"SELECT COUNT(*) AS c FROM rel.t AT(TIMESTAMP => CAST('{ts}' AS TIMESTAMP_LTZ))"
    )[0].rows
    assert abs_rows[0]["c"] == 3


def test_snowflake_iceberg_table_dialect(engine):
    """The Snowflake dialect surface of the reference corpus
    (snowflake.sql): CREATE [OR REPLACE] ICEBERG TABLE with lowercase
    `partition by` and TARGET_FILE_SIZE (:96-118), catalog-linked
    tables via CATALOG_NAMESPACE/CATALOG_TABLE_NAME (:131-136), ALTER
    ICEBERG TABLE ADD COLUMN ... COMMENT (:392), double-quoted
    identifiers (:223), and the INFORMATION_SCHEMA Iceberg table
    functions (:363-378)."""
    engine.execute("CREATE SCHEMA IF NOT EXISTS sfd")
    engine.execute(
        "CREATE ICEBERG TABLE sfd.linked (\n"
        "  first_name STRING,\n  last_name STRING,\n"
        "  amount INT,\n  create_date DATE\n) TARGET_FILE_SIZE = '64MB'"
    )
    engine.execute("INSERT INTO sfd.linked VALUES ('kun', 'xue', 100, '2025-05-06')")
    assert engine.table("sfd.linked")._meta["properties"]["target_file_size"] == "64MB"

    engine.execute(
        "CREATE ICEBERG TABLE sfd.linked_part (\n"
        "  first_name STRING,\n  last_name STRING,\n"
        "  amount INT,\n  create_date DATE\n)\n"
        "partition by (first_name)\nTARGET_FILE_SIZE = '64MB'"
    )
    assert engine.table("sfd.linked_part").partition_spec

    # catalog-linked name: reads AND writes flow to the target table
    engine.execute(
        "CREATE OR REPLACE ICEBERG TABLE external_managed_table\n"
        "  EXTERNAL_VOLUME = 'opensnowflake'\n  CATALOG = 'opensnowflake'\n"
        "  CATALOG_NAMESPACE = 'sfd'\n  CATALOG_TABLE_NAME = 'linked'"
    )
    engine.execute(
        "INSERT INTO external_managed_table VALUES ('kiki', 'liu', 500, '2025-12-05')"
    )
    assert engine.execute("SELECT COUNT(*) AS c FROM sfd.linked")[0].rows[0]["c"] == 2
    assert engine.execute(
        "SELECT COUNT(*) AS c FROM external_managed_table"
    )[0].rows[0]["c"] == 2

    engine.execute("ALTER ICEBERG TABLE sfd.linked ADD COLUMN mail STRING comment 'e-mail'")
    engine.execute(
        "INSERT INTO sfd.linked VALUES ('kiki2', 'liu', 500, '2025-12-05', 'k@mail.com')"
    )
    assert engine.execute('SELECT COUNT(*) AS c FROM sfd."linked"')[0].rows[0]["c"] == 3

    files_now = engine.execute(
        "SELECT COUNT(*) AS c FROM TABLE(INFORMATION_SCHEMA.ICEBERG_TABLE_FILES("
        "TABLE_NAME => 'sfd.linked'))"
    )[0].rows[0]["c"]
    assert files_now >= 2
    snaps = engine.execute(
        "SELECT committed_at FROM sfd.linked.snapshots ORDER BY committed_at"
    )[0].rows
    ts = snaps[0]["committed_at"]
    files_then = engine.execute(
        "SELECT COUNT(*) AS c FROM TABLE(INFORMATION_SCHEMA.ICEBERG_TABLE_FILES("
        f"TABLE_NAME => 'sfd.linked', AT => CAST('{ts}' AS TIMESTAMP_LTZ)))"
    )[0].rows[0]["c"]
    assert 1 <= files_then < files_now
    hist = engine.execute(
        "SELECT * FROM TABLE(INFORMATION_SCHEMA.ICEBERG_TABLE_SNAPSHOT_REFRESH_HISTORY("
        "TABLE_NAME => 'sfd.linked'))"
    )[0].rows
    assert len(hist) == 3


def test_merge_using_select_subquery(engine):
    """The Snowflake-dialect MERGE source — USING (SELECT * FROM
    (VALUES ...) AS v(cols)) AS src with ::TIMESTAMP/::DATE casts —
    verbatim from sql/snowflake/open_catalog/merge_sales_events.sql."""
    engine.execute("CREATE TABLE ms (event_id bigint, qty int, price double, channel string)")
    engine.execute(
        "INSERT INTO ms VALUES (2, 5, 5.00, 'web'), (4, 8, 7.50, 'web')"
    )
    engine.execute(
        "MERGE INTO ms AS tgt\n"
        "USING (\n"
        "  SELECT * FROM (\n"
        "    VALUES\n"
        "      (2, 6, 5.50, 'app'),\n"
        "      (9, 7, 15.00, 'store')\n"
        "  ) AS updates(event_id, qty, price, channel)\n"
        ") AS src\n"
        "ON tgt.event_id = src.event_id\n"
        "WHEN MATCHED THEN UPDATE SET\n"
        "  qty = src.qty,\n  price = src.price,\n  channel = src.channel\n"
        "WHEN NOT MATCHED THEN INSERT (event_id, qty, price, channel)\n"
        "VALUES (src.event_id, src.qty, src.price, src.channel)"
    )
    rows = engine.execute("SELECT event_id, qty, channel FROM ms ORDER BY event_id")[0].rows
    assert [(r["event_id"], r["qty"], r["channel"]) for r in rows] == [
        (2, 6, "app"), (4, 8, "web"), (9, 7, "store"),
    ]
    # :: casts pass through to Spark (the reference uses them in VALUES)
    r = engine.execute("SELECT '2024-01-01'::DATE AS d")[0].rows[0]
    import datetime
    assert r["d"] == datetime.date(2024, 1, 1)


def test_catalog_linked_database_flow(engine):
    """The reference's catalog-linked demo flow (snowflake.sql:42-107)
    against OUR in-process REST catalog: CREATE EXTERNAL VOLUME +
    CATALOG INTEGRATION (CATALOG_URI → rest.py server) + CREATE
    DATABASE ... LINKED_CATALOG, then USE context + CREATE ICEBERG
    TABLE / INSERT / SELECT through the link — and the table is
    visible to any other engine via the REST API."""
    from iceberg_catalog_bench_spark.catalog.rest import (
        RestCatalogClient,
        RestCatalogServer,
    )

    server = RestCatalogServer().start()
    try:
        engine.execute(
            "CREATE EXTERNAL VOLUME opensnowflake STORAGE_LOCATIONS = "
            "((NAME = 'local', STORAGE_PROVIDER = 'FILE'))"
        )
        assert engine.execute("SHOW EXTERNAL VOLUMES")[0].rows == [{"name": "opensnowflake"}]
        assert engine.execute("DESC EXTERNAL VOLUME opensnowflake")[0].rowcount == 1

        engine.execute(
            "CREATE OR REPLACE CATALOG INTEGRATION opensnowflake "
            "CATALOG_SOURCE=POLARIS TABLE_FORMAT=ICEBERG "
            f"REST_CONFIG = (CATALOG_URI = '{server.url}', CATALOG_NAME = 'open_catalog') "
            "ENABLED=TRUE"
        )
        assert engine.execute("SHOW CATALOG INTEGRATIONS")[0].rows == [{"name": "opensnowflake"}]

        engine.execute(
            "CREATE DATABASE catalog_linked_db LINKED_CATALOG = "
            "(CATALOG = 'opensnowflake', ALLOWED_NAMESPACES = ('cataloglinkedschema'))"
        )
        engine.execute("USE DATABASE catalog_linked_db")
        engine.execute("CREATE SCHEMA cataloglinkedschema")
        engine.execute("USE SCHEMA catalog_linked_db.cataloglinkedschema")
        engine.execute(
            "CREATE ICEBERG TABLE catalog_linked_table (\n"
            "  first_name STRING, last_name STRING, amount INT, create_date DATE\n"
            ") TARGET_FILE_SIZE = '64MB'"
        )
        engine.execute(
            "INSERT INTO catalog_linked_table VALUES ('kun', 'xue', 100, '2025-05-06')"
        )
        rows = engine.execute("SELECT first_name, amount FROM catalog_linked_table")[0].rows
        assert rows == [{"first_name": "kun", "amount": 100}]

        # the linked write registered the table in the REST catalog
        cli = RestCatalogClient(server.url)
        cli.authenticate()
        code, body = cli.list_tables("cataloglinkedschema")
        assert code == 200
        assert [i["name"] for i in body["identifiers"]] == ["catalog_linked_table"]
        code, body = cli.load_table("cataloglinkedschema", "catalog_linked_table")
        assert code == 200 and body["location"].startswith("file://")

        # database parameters (snowflake.sql:10-12)
        engine.execute("ALTER DATABASE catalog_linked_db SET CATALOG = 'SNOWFLAKE'")
        params = engine.execute("SHOW PARAMETERS IN DATABASE catalog_linked_db")[0].rows
        assert params == [{"key": "catalog", "value": "SNOWFLAKE"}]

        # snapshot sets refuse, matching the reference's own error
        # (snowflake.sql:380-388)
        with pytest.raises(ValueError, match="not supported"):
            engine.execute("ALTER SNAPSHOT SET t1_snapshots ADD SNAPSHOT")

        engine.execute("DROP TABLE catalog_linked_table")
        code, body = cli.list_tables("cataloglinkedschema")
        assert body["identifiers"] == []
        engine.execute("DROP CATALOG INTEGRATION opensnowflake")
        assert engine.execute("SHOW CATALOG INTEGRATIONS")[0].rows == []
    finally:
        server.stop()


def test_double_quotes_inside_string_literals_survive(engine):
    """Identifier-quote normalization must not touch double quotes
    INSIDE single-quoted string literals."""
    engine.execute("CREATE TABLE qt (id bigint, msg string)")
    engine.execute("INSERT INTO qt VALUES (1, 'say \"hi\" there')")
    rows = engine.execute('SELECT msg FROM "qt" WHERE id = 1')[0].rows
    assert rows == [{"msg": 'say "hi" there'}]


def test_tblproperties_bloom_filter_reaches_writes(spark, tmp_path):
    """The Iceberg bloom-filter table property set via SQL
    TBLPROPERTIES must reach the parquet writer on INSERT (footer
    bloom offset present, checked via parquet-mr)."""
    import os

    from iceberg_catalog_bench_spark.engine import SqlEngine

    e = SqlEngine(spark, str(tmp_path / "wh"))
    e.execute("CREATE NAMESPACE IF NOT EXISTS nsb")
    e.execute(
        "CREATE TABLE nsb.t (user_id BIGINT, v DOUBLE) TBLPROPERTIES "
        "('write.parquet.bloom-filter-enabled.column.user_id'='true')"
    )
    e.execute(
        "INSERT INTO nsb.t VALUES "
        + ", ".join(f"({i}, {i}.5)" for i in range(200))
    )
    t = e.table("nsb.t")
    entry = t._snapshot().files[0]
    jvm = spark._jvm
    inf = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        jvm.org.apache.hadoop.fs.Path(os.path.join(t.path, entry.path)),
        spark._jsc.hadoopConfiguration(),
    )
    rdr = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(inf)
    try:
        cols = {
            c.getPath().toDotString(): c.getBloomFilterOffset()
            for c in rdr.getFooter().getBlocks().get(0).getColumns()
        }
    finally:
        rdr.close()
    assert cols["user_id"] > 0
    assert cols["v"] == -1


def test_analyze_table_via_sql(engine):
    """ANALYZE TABLE ... COMPUTE STATISTICS routes to LakeTable.analyze
    and persists Puffin-role column stats stamped with the snapshot."""
    engine.execute("CREATE NAMESPACE nstat")
    engine.execute("CREATE TABLE nstat.s (id BIGINT, v DOUBLE) USING iceberg")
    engine.execute("INSERT INTO nstat.s VALUES (1, 1.5), (2, 2.5), (3, NULL)")
    (r,) = engine.execute("ANALYZE TABLE nstat.s COMPUTE STATISTICS FOR COLUMNS id, v")
    stats = r.metadata["stats"]
    assert stats["row_count"] == 3
    assert stats["columns"]["id"] == {"ndv": 3, "null_count": 0}
    assert stats["columns"]["v"]["null_count"] == 1
    t = engine.table("nstat.s")
    assert t.column_stats()["snapshot_id"] == t._snapshot().snapshot_id
    # FOR ALL COLUMNS and bare forms parse too
    engine.execute("ANALYZE TABLE nstat.s COMPUTE STATISTICS FOR ALL COLUMNS")
    engine.execute("ANALYZE TABLE nstat.s COMPUTE STATISTICS")
    engine.execute("DROP TABLE nstat.s")
    engine.execute("DROP NAMESPACE nstat")


def test_migrate_via_sql(engine, spark, tmp_path):
    """CALL system.migrate registers an existing parquet dir as a new
    table without rewriting; the migrated table is queryable."""
    from pyspark.sql import functions as F

    src_dir = str(tmp_path / "legacy")
    spark.range(100).select("id", (F.col("id") % 5).alias("g")).write.parquet(src_dir)
    engine.execute("CREATE NAMESPACE nmig")
    (r,) = engine.execute(
        f"CALL system.migrate(table => 'nmig.adopted', source => '{src_dir}')"
    )
    assert r.metadata["imported_rows"] == 100
    assert r.metadata["imported_files"] >= 1
    t = engine.table("nmig.adopted")
    assert t.read().count() == 100
