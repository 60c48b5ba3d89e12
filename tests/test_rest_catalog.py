"""REST catalog conformance (reference §2.8): the tester's call
sequence against the in-process server, all PASS/EXP as classified."""

import pytest

from iceberg_catalog_bench_spark.catalog.rest import (
    RestCatalogClient,
    RestCatalogServer,
    run_conformance,
)


@pytest.fixture(scope="module")
def server():
    s = RestCatalogServer().start()
    yield s
    s.stop()


def test_conformance_suite_all_pass(server):
    results = run_conformance(server.url, ns="suite_ns")
    failures = [r for r in results if r.outcome == "FAIL"]
    assert not failures, failures
    # expected-failure calls classify EXP, not PASS (tester :137-141)
    exp = {r.name for r in results if r.outcome == "EXP"}
    assert exp == {
        "create_namespace_conflict",
        "update_catalog_stale_version",
        "applicable_policies_disabled",
        "drop_namespace_not_empty",
        # spec §9 revoke probes: denied calls must surface 403, not fail
        "write_denied_after_revoke",
        "read_denied_after_revoke",
    }
    # ≥ the reference tester's 29-call transcript
    # (opencatalog_api_tester.py:272-460, opencatalog/README.md:157-201)
    # + the 11-call privilege revoke/restore cycle (spec §9)
    assert len(results) == 43


def test_catalog_update_optimistic_concurrency(server):
    """entityVersion must gate catalog PUTs: a stale version is a 409
    carrying the current version; a fresh one applies and bumps it."""
    c = RestCatalogClient(server.url)
    c.authenticate()
    _, cat = c.describe_catalog("open_catalog")
    v = cat["entityVersion"]
    props = dict(cat["properties"], extra="1")
    status, updated = c.update_catalog("open_catalog", v, properties=props)
    assert status == 200 and updated["entityVersion"] == v + 1
    status, conflict = c.update_catalog("open_catalog", v, properties=props)
    assert status == 409 and conflict["currentEntityVersion"] == v + 1
    # revert to leave shared server state clean for other tests
    status, reverted = c.update_catalog(
        "open_catalog", v + 1, properties={k: x for k, x in cat["properties"].items()}
    )
    assert status == 200 and reverted["properties"] == cat["properties"]


def test_unauthenticated_requests_rejected(server):
    c = RestCatalogClient(server.url)  # no token
    status, _ = c.list_namespaces()
    assert status == 401


def test_auto_location_expansion(server):
    """location "__AUTO__" expands server-side (opencatalog/README.md:95)."""
    c = RestCatalogClient(server.url)
    c.authenticate()
    c.create_namespace("loc_ns")
    _, body = c.create_table(
        "loc_ns", "t_auto",
        {"type": "struct", "fields": [{"id": 1, "name": "id", "type": "long", "required": True}]},
    )
    assert "__AUTO__" not in body.get("metadata-location", "__AUTO__")
    _, loaded = c.load_table("loc_ns", "t_auto")
    assert loaded["location"].startswith("file:///warehouse/loc_ns/")
    c.drop_table("loc_ns", "t_auto")
    c.drop_namespace("loc_ns")


def test_privilege_revoke_restore_cycle(server):
    """Spec §9 permissions: revoking TABLE_WRITE_DATA must 403 writes
    (with the Iceberg NotAuthorizedException envelope) while reads
    keep working; revoking TABLE_READ_DATA must 403 reads; restoring
    both must fully recover, with catalog state intact throughout."""
    from iceberg_catalog_bench_spark.catalog.rest import RestCatalogClient

    c = RestCatalogClient(server.url)
    assert c.authenticate() == 200
    assert c.create_namespace("perm_ns")[0] == 200

    status, _ = c.revoke_grant("open_catalog", "catalog_admin", "TABLE_WRITE_DATA")
    assert status == 204
    status, body = c.create_namespace("perm_ns2")
    assert status == 403
    assert body["error"]["type"] == "NotAuthorizedException"
    assert "TABLE_WRITE_DATA" in body["error"]["message"]
    assert c.drop_namespace("perm_ns")[0] == 403  # deletes are writes too
    assert c.describe_namespace("perm_ns")[0] == 200  # reads unaffected

    status, _ = c.revoke_grant("open_catalog", "catalog_admin", "TABLE_READ_DATA")
    assert status == 204
    status, body = c.describe_namespace("perm_ns")
    assert status == 403 and "TABLE_READ_DATA" in body["error"]["message"]
    assert c.namespace_exists("perm_ns")[0] == 403

    # the management plane stays reachable — that's the restore path
    assert c.list_grants("open_catalog", "catalog_admin")[0] == 200
    assert c.add_grant("open_catalog", "catalog_admin", "TABLE_READ_DATA")[0] == 201
    assert c.add_grant("open_catalog", "catalog_admin", "TABLE_WRITE_DATA")[0] == 201

    # full recovery, nothing lost while revoked
    assert c.describe_namespace("perm_ns")[0] == 200
    assert c.drop_namespace("perm_ns")[0] == 204
    status, body = c.list_grants("open_catalog", "catalog_admin")
    assert status == 200
    assert {g["privilege"] for g in body["grants"]} == {
        "TABLE_READ_DATA", "TABLE_WRITE_DATA"
    }


def test_grant_validation_errors(server):
    """Unknown privileges are 400; unknown roles are 404."""
    from iceberg_catalog_bench_spark.catalog.rest import RestCatalogClient

    c = RestCatalogClient(server.url)
    assert c.authenticate() == 200
    assert c.add_grant("open_catalog", "catalog_admin", "MAKE_COFFEE")[0] == 400
    assert c.add_grant("open_catalog", "nope", "TABLE_READ_DATA")[0] == 404
    assert c.revoke_grant("no_catalog", "catalog_admin", "TABLE_READ_DATA")[0] == 404


def test_per_catalog_privilege_enforcement():
    """Per-catalog privilege resolution (ADVICE r4): the data plane
    accepts the Iceberg REST catalog prefix (/v1/{prefix}/...), and
    enforcement resolves THAT catalog's roles — a second catalog with a
    read-only role 403s writes through its prefix while open_catalog's
    unprefixed writes keep working, and revoking open_catalog's grants
    does not gate the other catalog's data plane."""
    s = RestCatalogServer().start()
    try:
        # a second catalog with a read-only role, wired directly into
        # server state (the management API has no create-catalog route;
        # this models a pre-provisioned tenant)
        st = s.state
        st.catalogs["tenant_b"] = {"name": "tenant_b", "type": "INTERNAL",
                                   "entityVersion": 1, "properties": {},
                                   "storageConfigInfo": {"storageType": "FILE"}}
        st.catalog_roles["tenant_b"] = ["b_reader"]
        st.grants["b_reader"] = {"TABLE_READ_DATA"}

        c = RestCatalogClient(s.url)
        assert c.authenticate() == 200
        assert c.create_namespace("main_ns")[0] == 200  # open_catalog write ok

        # tenant_b prefix: reads pass, writes 403 (role lacks WRITE)
        assert c._request("GET", "/v1/tenant_b/namespaces")[0] == 200
        status, body = c._request(
            "POST", "/v1/tenant_b/namespaces", {"namespace": ["b_ns"]}
        )
        assert status == 403
        assert "TABLE_WRITE_DATA" in body["error"]["message"]

        # unknown catalog prefix -> zero privileges -> 403, not a fallthrough
        assert c._request("GET", "/v1/ghost/namespaces")[0] == 403

        # revoking open_catalog's READ must NOT gate tenant_b's reads
        assert c.revoke_grant("open_catalog", "catalog_admin", "TABLE_READ_DATA")[0] == 204
        assert c._request("GET", "/v1/namespaces")[0] == 403
        assert c._request("GET", "/v1/tenant_b/namespaces")[0] == 200
        assert c.add_grant("open_catalog", "catalog_admin", "TABLE_READ_DATA")[0] == 201
        assert c._request("GET", "/v1/namespaces")[0] == 200
    finally:
        s.stop()


def _mk(client, ns, name):
    client.create_namespace(ns)
    client.create_table(ns, name, {"type": "struct", "fields": []})


def test_rest_commit_table_optimistic(server):
    """Iceberg REST commit protocol (CommitTableRequest): a fresh
    table commits with assert-ref-snapshot-id = None; a second commit
    presenting the STALE snapshot id gets 409 CommitFailedException
    and mutates nothing."""
    c = RestCatalogClient(server.url)
    c.authenticate()
    _mk(c, "commit_ns", "t1")

    snap = {"snapshot-id": 101, "sequence-number": 1,
            "summary": {"operation": "append"}}
    code, body = c.commit_table(
        "commit_ns", "t1",
        requirements=[{"type": "assert-ref-snapshot-id",
                       "ref": "main", "snapshot-id": None}],
        updates=[{"type": "add-snapshot", "snapshot": snap},
                 {"type": "set-snapshot-ref", "ref-name": "main",
                  "snapshot-id": 101, "ref-type": "branch"}],
    )
    assert code == 200
    assert body["metadata"]["current-snapshot-id"] == 101

    # stale committer: still believes main is unborn
    code, body = c.commit_table(
        "commit_ns", "t1",
        requirements=[{"type": "assert-ref-snapshot-id",
                       "ref": "main", "snapshot-id": None}],
        updates=[{"type": "set-snapshot-ref", "ref-name": "main",
                  "snapshot-id": 999, "ref-type": "branch"}],
    )
    assert code == 409
    assert body["error"]["type"] == "CommitFailedException"
    _code, loaded = c.load_table("commit_ns", "t1")
    assert loaded["metadata"]["current-snapshot-id"] == 101

    # retry from refreshed state succeeds (the optimistic retry loop)
    code, body = c.commit_table(
        "commit_ns", "t1",
        requirements=[{"type": "assert-ref-snapshot-id",
                       "ref": "main", "snapshot-id": 101}],
        updates=[{"type": "add-snapshot",
                  "snapshot": {"snapshot-id": 102, "sequence-number": 2,
                               "summary": {"operation": "append"}}},
                 {"type": "set-snapshot-ref", "ref-name": "main",
                  "snapshot-id": 102, "ref-type": "branch"}],
    )
    assert code == 200
    assert body["metadata"]["current-snapshot-id"] == 102
    assert [s["snapshot-id"] for s in body["metadata"]["snapshots"]] == [101, 102]


def test_rest_transaction_commit_atomic(server):
    """Multi-table transaction (/v1/transactions/commit): when the
    SECOND table's requirement is stale, the FIRST table's update must
    not apply either — all requirements validate before any update."""
    c = RestCatalogClient(server.url)
    c.authenticate()
    _mk(c, "txn_ns", "a")
    _mk(c, "txn_ns", "b")

    def change(name, expect, newid):
        return {
            "identifier": {"namespace": ["txn_ns"], "name": name},
            "requirements": [{"type": "assert-ref-snapshot-id",
                              "ref": "main", "snapshot-id": expect}],
            "updates": [
                {"type": "add-snapshot",
                 "snapshot": {"snapshot-id": newid, "sequence-number": 1,
                              "summary": {"operation": "append"}}},
                {"type": "set-snapshot-ref", "ref-name": "main",
                 "snapshot-id": newid, "ref-type": "branch"}],
        }

    # both fresh: atomic success
    code, _ = c.commit_transaction([change("a", None, 11), change("b", None, 21)])
    assert code == 204
    assert c.load_table("txn_ns", "a")[1]["metadata"]["current-snapshot-id"] == 11
    assert c.load_table("txn_ns", "b")[1]["metadata"]["current-snapshot-id"] == 21

    # b's expectation is stale -> whole transaction refused, a untouched
    code, body = c.commit_transaction([change("a", 11, 12), change("b", None, 22)])
    assert code == 409
    assert body["error"]["type"] == "CommitFailedException"
    assert c.load_table("txn_ns", "a")[1]["metadata"]["current-snapshot-id"] == 11
    assert c.load_table("txn_ns", "b")[1]["metadata"]["current-snapshot-id"] == 21

    # properties ride along and unsupported update types refuse pre-apply
    code, _ = c.commit_transaction([{
        "identifier": {"namespace": ["txn_ns"], "name": "a"},
        "requirements": [],
        "updates": [{"type": "set-properties",
                     "updates": {"owner": "etl"}}],
    }])
    assert code == 204
    assert c.load_table("txn_ns", "a")[1]["metadata"]["properties"]["owner"] == "etl"
    code, body = c.commit_transaction([{
        "identifier": {"namespace": ["txn_ns"], "name": "a"},
        "requirements": [],
        "updates": [{"type": "no-such-update"}],
    }])
    assert code == 400


def test_rest_commit_racers_exactly_one_wins(server):
    """Two threads race the same CAS commit: exactly one 200, one 409 —
    the commit lock's validate+apply atomicity under real concurrency."""
    import threading

    c = RestCatalogClient(server.url)
    c.authenticate()
    _mk(c, "race_ns", "t")
    results = []

    def racer(sid):
        rc = RestCatalogClient(server.url)
        rc.authenticate()
        results.append(rc.commit_table(
            "race_ns", "t",
            requirements=[{"type": "assert-ref-snapshot-id",
                           "ref": "main", "snapshot-id": None}],
            updates=[{"type": "set-snapshot-ref", "ref-name": "main",
                      "snapshot-id": sid, "ref-type": "branch"}],
        )[0])

    ts = [threading.Thread(target=racer, args=(s,)) for s in (1, 2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert sorted(results) == [200, 409]


def test_register_table_endpoint(server, spark, tmp_path):
    """Iceberg REST RegisterTable (POST /v1/namespaces/{ns}/register):
    the catalog-level spelling of foreign-table adoption — name +
    metadata-location in, LoadTableResult out; the chain is actually
    walked (a bogus location 400s, a duplicate 409s), and the
    registered entry serves loadTable with the chain's real head."""
    from iceberg_catalog_bench_spark.catalog.iceberg_export import (
        to_iceberg_metadata)
    from iceberg_catalog_bench_spark.catalog.table import LakeTable

    t = LakeTable.create(spark, str(tmp_path / "src"), "k bigint, v double")
    t.append(spark.createDataFrame([(1, 1.0), (2, 2.0)],
                                   "k bigint, v double"))
    s2 = t.append(spark.createDataFrame([(3, 3.0)], "k bigint, v double"))
    mp = to_iceberg_metadata(t, manifest_format="avro")

    c = RestCatalogClient(server.url)
    c.authenticate()
    c.create_namespace("reg_ns")
    status, body = c.register_table("reg_ns", "adopted", mp)
    assert status == 200, body
    assert body["metadata-location"].endswith(".metadata.json")
    assert body["metadata"]["current-snapshot-id"] == s2.snapshot_id
    assert len(body["metadata"]["snapshots"]) == 2
    # the chain's real sequence numbers, not snapshot-id fallbacks or a
    # constant-0 last-sequence-number (ADVICE r9)
    seqs = sorted(sn["sequence-number"]
                  for sn in body["metadata"]["snapshots"])
    assert seqs == [1, 2]
    assert body["metadata"]["last-sequence-number"] == 2

    # the registered table is a first-class catalog entry
    status, listing = c.list_tables("reg_ns")
    assert status == 200
    assert {"namespace": ["reg_ns"], "name": "adopted"} in listing["identifiers"]
    status, loaded = c.load_table("reg_ns", "adopted")
    assert status == 200
    assert loaded["metadata"]["current-snapshot-id"] == s2.snapshot_id
    assert [f["name"] for f in loaded["schema"]["fields"]] == ["k", "v"]
    # location is the metadata's own table root, not the _meta/iceberg
    # parent the directory heuristic would yield (ADVICE r9)
    assert loaded["location"] == t.path

    # duplicate name → 409; unreadable chain → 400; bad namespace → 404
    assert c.register_table("reg_ns", "adopted", mp)[0] == 409
    status, err = c.register_table("reg_ns", "bogus", "/nonexistent/v1.metadata.json")
    assert status == 400 and "cannot register" in err["error"]
    assert c.register_table("nope_ns", "x", mp)[0] == 404


def test_register_table_serves_spec_schema_spellings(server, spark, tmp_path):
    """RegisterTable must serve the chain's OWN Iceberg schema JSON —
    spec type spellings ('long', not the native 'bigint') and nested
    types with their element ids — not a native-DDL reconstruction
    (review r12: the old response leaked Spark DDL spellings, and
    would have mangled array/struct columns entirely)."""
    from iceberg_catalog_bench_spark.catalog.iceberg_export import (
        to_iceberg_metadata)
    from iceberg_catalog_bench_spark.catalog.table import LakeTable
    from pyspark.sql import functions as F

    t = LakeTable.create(spark, str(tmp_path / "src"),
                         "k bigint, emb array<double>")
    t.append(spark.range(3).select(
        F.col("id").alias("k"), F.array(F.col("id") * 1.0).alias("emb")))
    mp = to_iceberg_metadata(t, manifest_format="avro")

    c = RestCatalogClient(server.url)
    c.authenticate()
    c.create_namespace("reg_nested")
    status, body = c.register_table("reg_nested", "adopted", mp)
    assert status == 200, body
    status, loaded = c.load_table("reg_nested", "adopted")
    assert status == 200, loaded
    fields = {f["name"]: f for f in loaded["schema"]["fields"]}
    assert fields["k"]["type"] == "long"  # spec spelling, not 'bigint'
    emb = fields["emb"]["type"]
    assert emb["type"] == "list" and emb["element"] == "double"
    assert isinstance(emb["element-id"], int)
