"""Round 12: nested types (list/struct/map) across the Iceberg
export/adopt boundary (VERDICT r11 item 1 — the one interop-spec line
previously unimplemented, ICEBERG-Interoperability-Test-Spec.md:44).

The driver row ``iceberg_nested_roundtrip`` gates the end-to-end
story (export → external walk → DuckDB scan → adopt) against the
DuckDB oracle; this module pins the metadata mechanics: spec-shaped
nested schema JSON, table-wide element/field-id allocation with
persistence across re-exports, the ADD-COLUMN collision rule, foreign
nested-id preservation through adoption, and validator coverage."""

import json
import os

import pytest
from pyspark.sql import functions as F

from iceberg_catalog_bench_spark.catalog import LakeTable
from iceberg_catalog_bench_spark.catalog.iceberg_export import (
    _iceberg_type_full,
    _spark_ddl_type,
    adopt_iceberg_metadata,
    duckdb_scan_sql,
    nested_ids_of_schema,
    read_via_iceberg_metadata,
    to_iceberg_metadata,
    validate_iceberg_metadata,
)

DDL = ("vec_id bigint, embedding array<double>, "
       "meta struct<lang:string,n:int>, tags map<string,int>")


def _mk(spark, path, n=20):
    t = LakeTable.create(spark, path, DDL)
    t.append(spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(F.col("id") * 0.5, F.lit(1.25)).alias("embedding"),
        F.struct(F.lit("en").alias("lang"),
                 F.col("id").cast("int").alias("n")).alias("meta"),
        F.create_map(F.lit("a"), F.col("id").cast("int")).alias("tags"),
    ))
    return t


def test_nested_schema_json_shape(spark, tmp_path):
    """Exported schema JSON is the spec's: list carries element-id,
    struct fields carry their own ids, map carries key-id/value-id —
    all unique table-wide and covered by last-column-id."""
    t = _mk(spark, str(tmp_path / "t"))
    md = json.load(open(to_iceberg_metadata(t)))
    fields = {f["name"]: f for f in md["schemas"][0]["fields"]}
    emb = fields["embedding"]["type"]
    assert emb["type"] == "list" and emb["element"] == "double"
    st = fields["meta"]["type"]
    assert st["type"] == "struct"
    assert [f["name"] for f in st["fields"]] == ["lang", "n"]
    mp = fields["tags"]["type"]
    assert mp["type"] == "map" and mp["key"] == "string"
    ids = [emb["element-id"], mp["key-id"], mp["value-id"]] + [
        f["id"] for f in st["fields"]]
    top = [f["id"] for f in md["schemas"][0]["fields"]]
    assert len(set(ids + top)) == len(ids + top)  # table-wide unique
    assert md["last-column-id"] == max(ids + top)
    assert validate_iceberg_metadata(
        os.path.join(t.path, "_meta", "iceberg")) == []


def test_nested_ids_stable_across_reexports(spark, tmp_path):
    """Re-exporting after more data (and after a RENAME, which keeps
    the top-level field id) emits the SAME nested ids — persisted in
    nested-field-ids.json."""
    t = _mk(spark, str(tmp_path / "t"))
    md1 = json.load(open(to_iceberg_metadata(t)))
    t.append(t.read().limit(1))
    t.rename_column("embedding", "vecs")
    md2 = json.load(open(to_iceberg_metadata(t)))
    ids1 = nested_ids_of_schema(md1["schemas"])
    ids2 = nested_ids_of_schema(md2["schemas"])
    assert ids1 == ids2  # keys are (field-id, path): rename-immune


def test_add_column_collision_reallocates(spark, tmp_path):
    """Native ADD COLUMN after an export may take a top-level id an
    exported nested id already used (native metadata doesn't know
    about export-side allocation). The next export REALLOCATES the
    colliding nested ids — each metadata.json stays self-consistent
    (validator-clean), which is the spec invariant that matters."""
    t = LakeTable.create(spark, str(tmp_path / "t"),
                         "k bigint, emb array<double>")
    t.append(spark.range(3).select(
        F.col("id").alias("k"), F.array(F.lit(1.0)).alias("emb")))
    md1 = json.load(open(to_iceberg_metadata(t)))
    e1 = md1["schemas"][0]["fields"][1]["type"]["element-id"]
    assert e1 == 3  # allocated right above the 2 top-level ids
    t.add_column("extra", "string")  # native takes id 3
    md2 = json.load(open(to_iceberg_metadata(t)))
    cur = next(s for s in md2["schemas"]
               if s["schema-id"] == md2["current-schema-id"])
    extra_id = next(f["id"] for f in cur["fields"] if f["name"] == "extra")
    assert extra_id == 3
    e2 = next(f for f in cur["fields"]
              if f["name"] == "emb")["type"]["element-id"]
    assert e2 != 3  # reallocated clear of the collision
    assert validate_iceberg_metadata(
        os.path.join(t.path, "_meta", "iceberg")) == []


def test_adopt_preserves_foreign_nested_ids(spark, tmp_path):
    """adopt → re-export is nested-id-faithful: the foreign chain's
    element/field ids seed the adopted table's allocator, so a reader
    that already resolved against the foreign ids keeps resolving."""
    t = _mk(spark, str(tmp_path / "src"))
    mp = to_iceberg_metadata(t, manifest_format="avro")
    md = json.load(open(mp))
    t2 = adopt_iceberg_metadata(spark, mp, str(tmp_path / "dst"))
    assert t2.read().count() == 20
    mp2 = to_iceberg_metadata(t2, manifest_format="avro")
    md2 = json.load(open(mp2))
    assert nested_ids_of_schema(md["schemas"]) == \
        nested_ids_of_schema(md2["schemas"])
    # DDL round-trips exactly
    assert [(f.name, f.type) for f in t2._fields()] == \
        [(f.name, f.type) for f in t._fields()]


def test_duckdb_and_walker_agree_on_map(spark, tmp_path):
    """The map column crosses both external legs: DuckDB casts to
    MAP(VARCHAR, INTEGER) and aggregates map values; the walker
    returns Spark maps."""
    import duckdb

    t = _mk(spark, str(tmp_path / "t"))
    mp = to_iceberg_metadata(t, manifest_format="avro")
    duck = duckdb.sql(
        "SELECT COUNT(*), SUM(tags['a'][1]), SUM(meta.n) FROM ("
        + duckdb_scan_sql(mp) + ")").fetchone()
    ext = read_via_iceberg_metadata(spark, mp).agg(
        F.count(F.lit(1)), F.sum(F.element_at("tags", "a")),
        F.sum("meta.n")).collect()[0]
    assert (int(duck[0]), int(duck[1]), int(duck[2])) == \
        (ext[0], ext[1], ext[2]) == (20, 190, 190)


def test_validator_flags_nested_id_collision():
    """A schema whose nested element-id collides with a column id is
    invalid metadata — the validator reports duplicate-field-id."""
    schema = {"schema-id": 0, "fields": [
        {"id": 1, "name": "k", "required": False, "type": "long"},
        {"id": 2, "name": "emb", "required": False,
         "type": {"type": "list", "element-id": 1, "element": "double",
                  "element-required": False}},
    ]}
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "v1.metadata.json")
        with open(p, "w") as fh:
            json.dump({"format-version": 2, "schemas": [schema],
                       "current-schema-id": 0, "partition-specs": [],
                       "snapshots": []}, fh)
        findings = validate_iceberg_metadata(p)
    assert any(f["code"] == "duplicate-field-id" and "nested" in f["detail"]
               for f in findings)


def test_type_converters_inverse():
    """_iceberg_type_full ∘ _spark_ddl_type is identity on the DDL
    side for arbitrarily nested shapes (ids allocated from a counter)."""
    ddls = [
        "array<array<decimal(18,2)>>",
        "struct<a:array<double>,b:struct<c:string,d:map<string,bigint>>>",
        "map<string,array<int>>",
    ]
    for ddl in ddls:
        n = iter(range(100, 200))
        ice = _iceberg_type_full(ddl, lambda _p: next(n))
        assert _spark_ddl_type(ice) == ddl


def test_sync_refreshes_nested_id_seeds(spark, tmp_path):
    """A foreign schema evolution that ADDS a nested column after
    adoption must re-export with the foreign chain's ids: sync
    refreshes the allocator seeds AUTHORITATIVELY (fast-forward
    semantics — the foreign writer's own reallocations win over
    adopt-time seeds; here `aux` takes top-level id 5, forcing the
    foreign exporter to reallocate embedding's element id, and the
    synced table must follow it)."""
    from iceberg_catalog_bench_spark.catalog.iceberg_export import (
        sync_iceberg_metadata,
    )

    src = _mk(spark, str(tmp_path / "src"))
    mp1 = to_iceberg_metadata(src, manifest_format="avro")
    t2 = adopt_iceberg_metadata(spark, mp1, str(tmp_path / "dst"))
    # foreign side evolves: a NEW nested column + more data
    src.add_column("aux", "array<int>")
    src.append(src.read().limit(1))
    mp2 = to_iceberg_metadata(src, manifest_format="avro")
    assert sync_iceberg_metadata(t2, mp2) == 1
    md_src = json.load(open(mp2))
    md_back = json.load(open(to_iceberg_metadata(t2,
                                                 manifest_format="avro")))
    assert nested_ids_of_schema(md_src["schemas"]) == \
        nested_ids_of_schema(md_back["schemas"])


def test_validator_reports_malformed_nested_type(tmp_path):
    """Review r12: a list type missing its element-id used to escape
    the validator as a raw KeyError; it is a finding now."""
    schema = {"schema-id": 0, "fields": [
        {"id": 1, "name": "k", "required": False, "type": "long"},
        {"id": 2, "name": "emb", "required": False,
         "type": {"type": "list", "element": "double"}},  # no element-id
    ]}
    p = os.path.join(str(tmp_path), "v1.metadata.json")
    with open(p, "w") as fh:
        json.dump({"format-version": 2, "schemas": [schema],
                   "current-schema-id": 0, "partition-specs": [],
                   "snapshots": []}, fh)
    findings = validate_iceberg_metadata(p)
    assert any(f["code"] == "invalid-nested-type" for f in findings)


def test_struct_leaf_bounds_roundtrip_and_prune(spark, tmp_path):
    """Struct-leaf statistics (r12 extension): native file stats record
    struct leaves under the dotted path ('meta.n'), the prune grammar
    admits dotted predicates (manifest-level file skips, zero data
    read), the Avro export encodes them as LEAF-FIELD-ID bounds, and
    the adopted chain prunes identically."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"),
        "vec_id bigint, embedding array<double>, "
        "meta struct<lang:string,n:int>")
    for lo in (0, 100, 200):
        t.append(spark.range(lo, lo + 100).select(
            F.col("id").alias("vec_id"),
            F.array(F.lit(1.0)).alias("embedding"),
            F.struct(F.lit("en").alias("lang"),
                     F.col("id").cast("int").alias("n")).alias("meta")))
    snap = t._snapshot()
    assert "meta.n" in snap.files[0].stats
    assert "meta.lang" in snap.files[0].stats
    # list leaves never record (element stats aggregate over members)
    assert not any(".list." in k or k == "element"
                   for f in snap.files for k in f.stats)
    kept = t._prune_files(snap.files, "meta.n >= 250")
    assert 0 < len(kept) < len(snap.files)
    assert t.scan("meta.n >= 250").count() == 50

    mp = to_iceberg_metadata(t, manifest_format="avro")
    assert validate_iceberg_metadata(mp) == []
    t2 = adopt_iceberg_metadata(spark, mp, str(tmp_path / "t2"))
    s2 = t2._snapshot()
    assert "meta.n" in s2.files[0].stats  # leaf-id bounds rebound
    assert len(t2._prune_files(s2.files, "meta.n >= 250")) == len(kept)
    assert t2.scan("meta.n >= 250").count() == 50


def test_export_crash_debris_never_resolves(spark, tmp_path):
    """Chain writes are atomic (uuid tmp + rename): the debris a crash
    mid-export leaves (*.tmp-<uuid>) must never resolve as the current
    version, the previous export stays readable, and
    remove_orphan_files COLLECTS the debris past the grace period."""
    t = _mk(spark, str(tmp_path / "t"), n=5)
    mp1 = to_iceberg_metadata(t, manifest_format="avro")
    ice_dir = os.path.dirname(mp1)
    # simulate crashes mid-write of the NEXT version + a manifest
    debris = [os.path.join(ice_dir, "v99.metadata.json.tmp-deadbeef"),
              os.path.join(ice_dir, "manifest-9-abc.avro.tmp-cafe01")]
    for d in debris:
        with open(d, "w") as fh:
            fh.write('{"format-version": 2, "truncat')
    from iceberg_catalog_bench_spark.catalog.iceberg_export import (
        _resolve_metadata_path,
    )
    assert _resolve_metadata_path(ice_dir) == mp1  # debris invisible
    assert validate_iceberg_metadata(ice_dir) == []
    assert read_via_iceberg_metadata(spark, mp1).count() == 5
    import time as _time

    t.remove_orphan_files(older_than_ms=int(_time.time() * 1000) + 1000)
    assert not any(os.path.exists(d) for d in debris)  # debris swept
    # the live chain survives the sweep
    assert read_via_iceberg_metadata(spark, mp1).count() == 5


def test_reexport_after_evolution_preserves_old_chain(spark, tmp_path):
    """Content-addressed manifest names (review r12): a re-export
    whose content changed writes NEW files — the older metadata.json
    keeps resolving its own manifests byte-intact (no
    manifest-length drift, no torn mid-overwrite reads), exactly
    Iceberg's immutable-file design. Same content keeps the same
    name (idempotent re-export)."""
    t = _mk(spark, str(tmp_path / "t"), n=10)
    mp1 = to_iceberg_metadata(t, manifest_format="avro")
    # idempotent: unchanged table re-exports the SAME manifest files
    snap_before = {f: os.path.getsize(os.path.join(os.path.dirname(mp1), f))
                   for f in os.listdir(os.path.dirname(mp1))}
    to_iceberg_metadata(t, manifest_format="avro")
    snap_after = {f: os.path.getsize(os.path.join(os.path.dirname(mp1), f))
                  for f in os.listdir(os.path.dirname(mp1))}
    assert snap_before == snap_after
    # evolution changes manifest content -> NEW names; old chain intact
    t.add_column("extra", "string", default="x")
    t.append(t.read().limit(2))
    mp2 = to_iceberg_metadata(t, manifest_format="avro")
    assert mp2 != mp1
    assert validate_iceberg_metadata(mp1) == []  # no length drift
    assert read_via_iceberg_metadata(spark, mp1).count() == 10
    assert read_via_iceberg_metadata(spark, mp2).count() == 12


def test_atomic_write_concurrent_writers_never_tear(tmp_path):
    """_fsutil.atomic_write under concurrency: each writer owns a
    private uuid tmp, so the published file is always ONE writer's
    whole content — never an interleaved mixture (the fixed-tmp-name
    hazard review r12 flagged)."""
    import threading

    from iceberg_catalog_bench_spark.catalog._fsutil import atomic_write

    path = str(tmp_path / "contended.json")
    payloads = [("A" * 65536) + "end", ("B" * 65536) + "end"]

    def spin(payload):
        for _ in range(30):
            atomic_write(path, payload, fsync=False)

    ts = [threading.Thread(target=spin, args=(pl,)) for pl in payloads]
    for th in ts:
        th.start()
    for th in ts:
        th.join()
    got = open(path).read()
    assert got in payloads  # whole, never mixed
