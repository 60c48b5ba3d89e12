"""Round 13: ``struct``/``map`` columns through the PYTHON laketable
source/sink (VERDICT r12 item 3).

The curation shape this repo itself builds (``meta struct<lang,n>`` +
``tags map<string,int>``) now flows through the Arrow batch/stream
reader, the streaming writer, widening casts and BY-NAME nested struct
alignment — with filter pushdown still structurally excluded for
nested columns. Cow-changelog netting: struct columns net via
leaf-flatten + validity bit (r13); map and array columns with
entries of any struct/map/array composition net via a RECURSIVE
canonical entry rendering + raw-passthrough rebuild (r14); only
binary-inside-container and float/binary/nested map keys still
refuse at planning time."""

import pytest
from pyspark.sql import functions as F

from iceberg_catalog_bench_spark.catalog.table import LakeTable
from iceberg_catalog_bench_spark.streaming.table_source import (
    _arrow_type,
    register_source,
)


def test_arrow_type_struct_map_mapping():
    import pyarrow as pa

    assert _arrow_type("struct<lang:string,n:int>") == pa.struct(
        [("lang", pa.string()), ("n", pa.int32())]
    )
    assert _arrow_type("map<string,bigint>") == pa.map_(
        pa.string(), pa.int64()
    )
    # case of FIELD NAMES is preserved; type keywords case-fold; deep
    # composition recurses (struct in array in struct, map values)
    t = _arrow_type(
        "STRUCT<Outer:ARRAY<struct<Inner:DOUBLE>>,m:map<string,array<int>>>"
    )
    assert t == pa.struct([
        ("Outer", pa.list_(pa.struct([("Inner", pa.float64())]))),
        ("m", pa.map_(pa.string(), pa.list_(pa.int32()))),
    ])
    with pytest.raises(NotImplementedError):
        _arrow_type("interval")


def _pipe(spark, src_path: str, dst_path: str, ck: str) -> None:
    q = (
        spark.readStream.format("laketable").option("path", src_path)
        .load()
        .writeStream.format("laketable").option("path", dst_path)
        .trigger(availableNow=True)
        .option("checkpointLocation", ck).start()
    )
    q.awaitTermination(300)


DDL = ("doc_id bigint, meta struct<lang:string,n:bigint>, "
       "tags map<string,bigint>, sig array<bigint>")


def _curation_df(spark, lo: int, hi: int):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.struct(
            F.concat(F.lit("l"), (F.col("id") % 3).cast("string"))
            .alias("lang"),
            (F.col("id") * 7 % 100).alias("n"),
        ).alias("meta"),
        F.create_map(
            F.lit("chars"), F.col("id") * 11 % 1000,
            F.lit("words"), F.col("id") % 50,
        ).alias("tags"),
        F.array(F.col("id") % 13, F.col("id") % 17).alias("sig"),
    )


def test_stream_pipe_struct_map_exactly_once(spark, tmp_path):
    """laketable→laketable pipe of the full curation shape
    (struct + map + array): values survive the Arrow read, the
    executor-side parquet write and the snapshot commit bit-exact;
    a second availableNow run delivers only the new commit."""
    register_source(spark)
    src = LakeTable.create(spark, str(tmp_path / "src"), DDL)
    dst = LakeTable.create(spark, str(tmp_path / "dst"), DDL)
    src.append(_curation_df(spark, 0, 500))
    ck = str(tmp_path / "ck")

    _pipe(spark, src.path, dst.path, ck)
    dst._reload()
    assert dst.read().count() == 500
    src.append(_curation_df(spark, 500, 700))
    _pipe(spark, src.path, dst.path, ck)
    dst._reload()
    assert dst.read().count() == 700  # exactly-once: no replay

    def canon(df):
        return {
            r["doc_id"]: (
                (r["meta"]["lang"], r["meta"]["n"]),
                tuple(sorted(r["tags"].items())),
                tuple(r["sig"]),
            )
            for r in df.collect()
        }

    assert canon(dst.read()) == canon(_curation_df(spark, 0, 700))


def test_batch_read_struct_evolution_and_widening(spark, tmp_path):
    """Nested evolution in the PYTHON batch reader: files written
    before ``meta`` existed read a typed null struct; a struct leaf
    widened int→bigint casts; a field ADDED inside the struct
    null-fills by-name (the _align_nested path a plain Arrow cast
    cannot express)."""
    register_source(spark)
    t = LakeTable.create(spark, str(tmp_path / "t"), "k bigint")
    t.append(spark.createDataFrame([(1,)], "k bigint"))
    t.add_column("meta", "struct<lang:string,n:int>")
    t.append(spark.createDataFrame(
        [(2, ("en", 5))], "k bigint, meta struct<lang:string,n:int>"))
    t.alter_column_type("meta", "struct<lang:string,n:bigint,src:string>")
    t.append(spark.createDataFrame(
        [(3, ("fr", 9, "web"))],
        "k bigint, meta struct<lang:string,n:bigint,src:string>"))
    rows = {r["k"]: r["meta"] for r in (
        spark.read.format("laketable").option("path", t.path).load()
        .collect())}
    assert rows[1] is None
    assert (rows[2]["lang"], rows[2]["n"], rows[2]["src"]) == ("en", 5, None)
    assert (rows[3]["lang"], rows[3]["n"], rows[3]["src"]) == ("fr", 9, "web")


def test_cow_changelog_nets_struct_columns(spark, tmp_path):
    """CDC cow-changelog netting over a STRUCT column: an UPDATE's
    CoW rewrite nets to exactly its -D/+I pair (carried-over rows
    cancel), with struct values keyed by leaf-flatten + validity bit —
    a NULL struct stays distinct from a struct of NULLs."""
    register_source(spark)
    t = LakeTable.create(
        spark, str(tmp_path / "t"),
        "k bigint, meta struct<lang:string,n:bigint>")
    t.append(spark.createDataFrame(
        [(1, ("en", 5)), (2, ("fr", 7)), (3, None), (4, (None, None))],
        "k bigint, meta struct<lang:string,n:bigint>"))
    t.update({"meta": "named_struct('lang', 'de', 'n', 9L)"}, "k = 2")
    sink, ck = str(tmp_path / "sink"), str(tmp_path / "ck")
    q = (
        spark.readStream.format("laketable").option("path", t.path)
        .option("mode", "cdc").option("cow-changelog", "true").load()
        .writeStream.format("parquet").option("path", sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", ck).start()
    )
    q.awaitTermination(300)
    by_snap: dict = {}
    for r in spark.read.parquet(sink).collect():
        by_snap.setdefault(r["_commit_snapshot_id"], []).append(
            (r["_change_type"], r["k"],
             None if r["meta"] is None else (r["meta"]["lang"],
                                             r["meta"]["n"])))
    # snapshot 1 is the initial load (4 inserts, struct values intact —
    # including the null struct and the struct-of-nulls, distinct)
    assert sorted(by_snap[1]) == [
        ("insert", 1, ("en", 5)), ("insert", 2, ("fr", 7)),
        ("insert", 3, None), ("insert", 4, (None, None)),
    ]
    # snapshot 2 (the CoW UPDATE): rows 1, 3 (null struct) and 4
    # (struct of nulls) carried over and CANCELLED; only the updated
    # row surfaces as its -D/+I pair
    assert sorted(by_snap[2]) == [
        ("delete", 2, ("fr", 7)), ("insert", 2, ("de", 9)),
    ]


def test_cow_changelog_map_netting_multi_bucket(spark, tmp_path):
    """MAP keys through CoW-changelog netting (r14, VERDICT r13 item
    5): the ``tags map<string,bigint>`` curation shape nets through a
    copy-on-write rewrite — carried-over map rows (including a NULL
    map and an EMPTY map, which must stay distinct) cancel across 4
    hash buckets; only the updated row surfaces as -D/+I with its map
    value bit-exact."""
    register_source(spark)
    ddl = "k bigint, tags map<string,bigint>"
    t = LakeTable.create(spark, str(tmp_path / "t"), ddl)
    t.append(spark.createDataFrame(
        [(1, {"a": 1, "b": 2}), (2, {"words": 7}), (3, None), (4, {})],
        ddl))
    t.update({"k": "k + 10"}, "k = 1")  # CoW rewrite commit
    sink, ck = str(tmp_path / "sink"), str(tmp_path / "ck")
    q = (
        spark.readStream.format("laketable").option("path", t.path)
        .option("mode", "cdc").option("cow-changelog", "true")
        .option("cdc-cow-buckets", "4").load()
        .writeStream.format("parquet").option("path", sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", ck).start()
    )
    q.awaitTermination(300)
    rows = sorted(
        (r["_commit_snapshot_id"], r["_change_type"], r["k"],
         None if r["tags"] is None else tuple(sorted(r["tags"].items())))
        for r in spark.read.parquet(sink).collect()
    )
    assert rows == [
        (1, "insert", 1, (("a", 1), ("b", 2))),
        (1, "insert", 2, (("words", 7),)),
        (1, "insert", 3, None),
        (1, "insert", 4, ()),
        (2, "delete", 1, (("a", 1), ("b", 2))),
        (2, "insert", 11, (("a", 1), ("b", 2))),
    ]


def test_cow_changelog_nets_map_inside_struct(spark, tmp_path):
    """r14 follow-through: a map INSIDE a struct nets too — the struct
    flatten lands the child map at its dotted prefix, where the same
    canonical rendering + raw passthrough apply; the rebuild takes the
    raw child (with flatten-propagated parent nulls) at that prefix.
    The NULL-struct row pins the parent-null path end-to-end."""
    register_source(spark)
    ddl = "k bigint, meta struct<lang:string,tags:map<string,bigint>>"
    t = LakeTable.create(spark, str(tmp_path / "t"), ddl)
    t.append(spark.createDataFrame(
        [(1, ("en", {"a": 1})), (2, ("fr", {"b": 2, "c": 3})), (3, None)],
        ddl))
    t.update({"k": "k + 10"}, "k = 1")
    sink, ck = str(tmp_path / "sink"), str(tmp_path / "ck")
    q = (
        spark.readStream.format("laketable").option("path", t.path)
        .option("mode", "cdc").option("cow-changelog", "true")
        .option("cdc-cow-buckets", "4").load()
        .writeStream.format("parquet").option("path", sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", ck).start()
    )
    q.awaitTermination(300)

    def render(r):
        m = r["meta"]
        return (r["_commit_snapshot_id"], r["_change_type"], r["k"],
                None if m is None else (
                    m["lang"],
                    None if m["tags"] is None
                    else tuple(sorted(m["tags"].items()))))

    rows = sorted(render(r) for r in spark.read.parquet(sink).collect())
    assert rows == [
        (1, "insert", 1, ("en", (("a", 1),))),
        (1, "insert", 2, ("fr", (("b", 2), ("c", 3)))),
        (1, "insert", 3, None),
        (2, "delete", 1, ("en", (("a", 1),))),
        (2, "insert", 11, ("en", (("a", 1),))),
    ]


def test_cdc_stream_struct_map_through_upsert(spark, tmp_path):
    """CDC mode over a MoR table with struct+map columns: +I images
    carry the nested values; an equality-delete retraction null-fills
    them (typed nulls through _project)."""
    register_source(spark)
    t = LakeTable.create(
        spark, str(tmp_path / "t"),
        "k bigint, meta struct<lang:string,n:bigint>, tags map<string,bigint>",
        properties={"write.delete.mode": "merge-on-read",
                    "write.update.mode": "merge-on-read"},
    )
    ddl = "k bigint, meta struct<lang:string,n:bigint>, tags map<string,bigint>"
    t.append(spark.createDataFrame(
        [(1, ("en", 5), {"a": 1}), (2, ("fr", 7), {"b": 2})], ddl))
    t.upsert_by_keys(
        spark.createDataFrame([(2, ("de", 9), {"c": 3})], ddl), on=["k"])
    sink, ck = str(tmp_path / "sink"), str(tmp_path / "ck")
    q = (
        spark.readStream.format("laketable").option("path", t.path)
        .option("mode", "cdc").load()
        .writeStream.format("parquet").option("path", sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", ck).start()
    )
    q.awaitTermination(300)
    rows = sorted(
        ((r["_commit_snapshot_id"], r["_change_type"], r["k"],
          None if r["meta"] is None else (r["meta"]["lang"], r["meta"]["n"]),
          None if r["tags"] is None else tuple(sorted(r["tags"].items()))))
        for r in spark.read.parquet(sink).collect()
    )
    assert rows == [
        (1, "insert", 1, ("en", 5), (("a", 1),)),
        (1, "insert", 2, ("fr", 7), (("b", 2),)),
        (2, "delete", 2, None, None),
        (2, "insert", 2, ("de", 9), (("c", 3),)),
    ]


def test_struct_leaf_stats_prune_python_batch_reader(spark, tmp_path):
    """Struct-leaf footer stats ("meta.n" dotted paths) recorded by the
    python WRITER land in the manifest, so the JVM scan path prunes
    dotted predicates over python-streamed files identically to
    JVM-written ones."""
    register_source(spark)
    src = LakeTable.create(spark, str(tmp_path / "src"), DDL)
    dst = LakeTable.create(spark, str(tmp_path / "dst"), DDL)
    src.append(_curation_df(spark, 0, 100))
    _pipe(spark, src.path, dst.path, str(tmp_path / "ck"))
    dst._reload()
    entries = dst._snapshot().files
    assert entries and all("meta.n" in (e.stats or {}) for e in entries)


def test_arrow_type_decimal_inside_struct_and_map():
    """Review-caught: the nested-DDL tokenizer must not split on the
    comma inside decimal(p,s)."""
    import pyarrow as pa

    assert _arrow_type("struct<a:decimal(10,2),b:int>") == pa.struct(
        [("a", pa.decimal128(10, 2)), ("b", pa.int32())]
    )
    assert _arrow_type("map<string,decimal(20,4)>") == pa.map_(
        pa.string(), pa.decimal128(20, 4)
    )


def test_cow_changelog_struct_netting_multi_bucket_null_leaf(spark, tmp_path):
    """Review-caught dtype hazard: with cdc-cow-buckets > 1, a file
    holding a null in an integer struct leaf converts that pandas
    column to float64 while a null-free file keeps int64 (and a
    null-bearing BOOLEAN column flips to object dtype) — without
    dtype canonicalization the SAME carried-over row hashes to
    different buckets per file and surfaces as a spurious -D/+I pair.
    The delete of the null-struct/null-flag row makes the NEW file
    null-free while the old file still carries the nulls."""
    register_source(spark)
    t = LakeTable.create(
        spark, str(tmp_path / "t"),
        "k bigint, meta struct<lang:string,n:bigint>, flag boolean")
    t.append(spark.createDataFrame(
        [(1, ("en", 5), True), (2, ("fr", 7), False), (3, None, None)],
        "k bigint, meta struct<lang:string,n:bigint>, flag boolean"))
    t.delete_where("k = 3", mode="copy-on-write")
    sink, ck = str(tmp_path / "sink"), str(tmp_path / "ck")
    q = (
        spark.readStream.format("laketable").option("path", t.path)
        .option("mode", "cdc").option("cow-changelog", "true")
        .option("cdc-cow-buckets", "4").load()
        .writeStream.format("parquet").option("path", sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", ck).start()
    )
    q.awaitTermination(300)
    snap2 = sorted(
        (r["_change_type"], r["k"])
        for r in spark.read.parquet(sink).collect()
        if r["_commit_snapshot_id"] == 2
    )
    # rows 1 and 2 carried over and must cancel ACROSS buckets; only
    # the deleted null-struct row surfaces
    assert snap2 == [("delete", 3)]


def test_struct_leaf_predicate_prunes_files(spark, tmp_path):
    """Struct-leaf predicate pushdown (r13): Spark delivers nested
    column paths to the Python source, the writers record dotted
    footer stats ("meta.n"), and the planner prunes whole files on
    them — PRUNE-ONLY (never an Arrow row filter), int/string leaves
    only, with the same adopted semantics as the JVM scan path."""
    from pyspark.sql.datasource import EqualTo, GreaterThan
    from pyspark.sql.types import StructType

    from iceberg_catalog_bench_spark.streaming.table_source import (
        LakeTableDataSource,
    )

    register_source(spark)
    t = LakeTable.create(spark, str(tmp_path / "t"), "k bigint")
    t.append(spark.range(0, 5).toDF("k").repartition(1))
    t.add_column("meta", "struct<lang:string,n:bigint,w:double>")
    ddl = "k bigint, meta struct<lang:string,n:bigint,w:double>"
    for lo, lang in ((100, "en"), (200, "fr"), (300, "de")):
        t.append(spark.createDataFrame(
            [(lo + i, (lang, lo + i, 0.5)) for i in range(5)], ddl
        ).repartition(1))

    ds = LakeTableDataSource(
        options={"path": t.path, "filter-pushdown": "true"}
    )
    schema = StructType.fromDDL(ddl)

    def plan(*filters):
        r = ds.reader(schema)
        r.pushFilters(list(filters))
        return r.partitions()

    assert len(plan()) == 4
    # int leaf range: only the n>=300 file (+ never the pre-struct
    # file: its NULL default can't satisfy a comparison)
    assert len(plan(GreaterThan(("meta", "n"), 299))) == 1
    # string leaf equality: one lang per file
    assert len(plan(EqualTo(("meta", "lang"), "fr"))) == 1
    # FLOAT leaf: not admitted (stats comparison is not exact) — no
    # pruning, all four files planned
    assert len(plan(EqualTo(("meta", "w"), 0.5))) == 4
    # prune-only: the struct-leaf predicate must never become an
    # Arrow row filter
    r = ds.reader(schema)
    r.pushFilters([GreaterThan(("meta", "n"), 299)])
    (part,) = r.partitions()
    assert part.filters is None

    # end-to-end under the conf gate: same answer, pruning engaged
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        df = (spark.read.format("laketable").option("path", t.path)
              .option("filter-pushdown", "true").load()
              .filter("meta.n > 299 AND meta.lang = 'de'"))
        assert sorted(r["k"] for r in df.collect()) == [300, 301, 302,
                                                        303, 304]
    finally:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "false")


def test_nested_leaf_ddl_resolver_units():
    from iceberg_catalog_bench_spark.streaming.table_source import (
        _nested_leaf_ddl,
    )

    t = "struct<lang:string,n:bigint,inner:struct<d:decimal(10,2)>>"
    assert _nested_leaf_ddl(t, ("n",)) == "bigint"
    assert _nested_leaf_ddl(t, ("LANG",)) == "string"  # case-insensitive
    assert _nested_leaf_ddl(t, ("inner", "d")) == "decimal(10,2)"
    assert _nested_leaf_ddl(t, ("missing",)) is None
    assert _nested_leaf_ddl(t, ("n", "deeper")) is None  # past a leaf
    assert _nested_leaf_ddl("map<string,int>", ("k",)) is None  # not struct
    assert _nested_leaf_ddl("array<struct<a:int>>", ("a",)) is None


def test_struct_leaf_prune_nonnull_default(spark, tmp_path):
    """A struct column added WITH a non-null default: pre-struct files
    are kept or pruned by evaluating the predicate against the
    default's LEAF value."""
    from pyspark.sql.datasource import EqualTo
    from pyspark.sql.types import StructType

    from iceberg_catalog_bench_spark.streaming.table_source import (
        LakeTableDataSource,
    )

    register_source(spark)
    t = LakeTable.create(spark, str(tmp_path / "t"), "k bigint")
    t.append(spark.range(0, 3).toDF("k").repartition(1))
    t.add_column("meta", "struct<lang:string,n:bigint>",
                 default={"lang": "xx", "n": 0})
    ddl = "k bigint, meta struct<lang:string,n:bigint>"
    t.append(spark.createDataFrame([(10, ("en", 5))], ddl).repartition(1))
    ds = LakeTableDataSource(
        options={"path": t.path, "filter-pushdown": "true"}
    )
    schema = StructType.fromDDL(ddl)

    def plan(*filters):
        r = ds.reader(schema)
        r.pushFilters(list(filters))
        return r.partitions()

    # default lang='xx' matches the pre-struct file; 'en' only the new
    assert len(plan(EqualTo(("meta", "lang"), "xx"))) == 1
    assert len(plan(EqualTo(("meta", "lang"), "en"))) == 1
    assert len(plan()) == 2
