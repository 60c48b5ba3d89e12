"""Round 15 pins: map KEYS of any renderable type net through the
CoW changelog — entries sort by the recursively-RENDERED key bytes
(injective, float-folding, raw-bytes for binary) instead of the raw
key, which r14 required to be Arrow-sortable and utf8-castable."""

import pyarrow as pa
from pyspark.sql import functions as F

from iceberg_catalog_bench_spark.catalog.table import LakeTable
from iceberg_catalog_bench_spark.streaming.table_source import (
    _canon_map_cols,
    _net_unkeyable_reason,
    register_source,
)


def _canon(rows, typ):
    valid, joined = _canon_map_cols(pa.array(rows, type=typ))
    return valid.to_pylist(), joined.to_pylist()


def test_canon_float_keys_fold_and_order_insensitive():
    t = pa.map_(pa.float64(), pa.int64())
    _, j = _canon([
        [(1.5, 1), (2.5, 2)],
        [(2.5, 2), (1.5, 1)],          # reorder -> identical render
        [(-0.0, 7)], [(0.0, 7)],       # -0.0 folds into +0.0
        [(float("nan"), 3)], [(float("nan"), 3)],  # canonical NaN key
        [(10.0, 1)], [(9.0, 1)],       # the rendered-bytes sort need
                                       # not be numeric — only
                                       # deterministic and injective
    ], t)
    assert j[0] == j[1]
    assert j[2] == j[3]
    assert j[4] == j[5]
    assert j[6] != j[7]
    assert j[4] != j[6]                # NaN key is its own key


def test_canon_binary_keys_raw_bytes():
    t = pa.map_(pa.binary(), pa.int64())
    _, j = _canon([
        [(b"\x00\xff", 1), (b"a", 2)],   # invalid utf8 + NUL bytes
        [(b"a", 2), (b"\x00\xff", 1)],
        [(b"\x00", 1)], [(b"\x00\x00", 1)],  # length-prefix splits them
    ], t)
    assert j[0] == j[1]
    assert j[2] != j[3]


def test_canon_struct_and_array_keys():
    ts = pa.map_(pa.struct([("a", pa.int64()), ("b", pa.string())]),
                 pa.int64())
    _, j = _canon([
        [({"a": 1, "b": "x"}, 1), ({"a": 2, "b": "y"}, 2)],
        [({"a": 2, "b": "y"}, 2), ({"a": 1, "b": "x"}, 1)],
        [({"a": 1, "b": "xy"}, 1)],
    ], ts)
    assert j[0] == j[1]
    assert j[2] != j[0]
    tl = pa.map_(pa.list_(pa.int64()), pa.string())
    _, j = _canon([
        [([1, 2], "u"), ([3], "w")],
        [([3], "w"), ([1, 2], "u")],
        [([1], "u"), ([2, 3], "w")],   # same flat ints, different split
    ], tl)
    assert j[0] == j[1]
    assert j[2] != j[0]


def test_unkeyable_gate_lifts_exotic_keys():
    for t in ("map<double,int>", "map<binary,int>",
              "map<array<int>,int>", "map<struct<a:int>,bigint>",
              "array<map<float,string>>",
              "struct<m:map<double,array<binary>>>"):
        assert _net_unkeyable_reason(t) is None, t
    assert _net_unkeyable_reason("map<int>")  # malformed still refuses


def test_cow_changelog_nets_float_and_binary_keyed_maps(
        spark, tmp_path):
    """e2e r15: map<double,bigint> (NaN key included) and
    map<binary,string> columns through the CoW-changelog netting —
    rows rewritten unchanged cancel, the one updated row surfaces
    with bit-exact map values, and the batch changelog agrees."""
    register_source(spark)
    ddl = "k bigint, fm map<double,bigint>, bm map<binary,string>"
    t = LakeTable.create(spark, str(tmp_path / "t"), ddl)
    nan = float("nan")
    t.append(spark.createDataFrame(
        [(1, {1.5: 10, nan: 42}, {b"\x00\xff": "a"}),
         (2, {2.5: 20}, {b"k": "b", b"\x00": "c"}),
         (3, None, None)],
        ddl))
    t.update({"fm": "map_from_entries(transform(map_entries(fm), "
                    "e -> named_struct('key', e.key, "
                    "'value', e.value + CAST(1 AS BIGINT))))"},
             "k = 1")
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
    feed = spark.read.parquet(sink)
    kinds = sorted(
        (r["_commit_snapshot_id"], r["_change_type"], r["k"])
        for r in feed.collect()
    )
    assert kinds == [
        (1, "insert", 1), (1, "insert", 2), (1, "insert", 3),
        (2, "delete", 1), (2, "insert", 1),
    ]
    upd = feed.filter("_commit_snapshot_id = 2 AND "
                      "_change_type = 'insert'").collect()[0]
    assert upd["fm"][1.5] == 11
    nan_vals = [v for kk, v in upd["fm"].items() if kk != kk]
    assert nan_vals == [43]
    assert upd["bm"][b"\x00\xff"] == "a"   # binary-keyed map rebuilt raw
    ch = t.changelog(1, t._snapshot().snapshot_id)
    assert sorted((r["_change_type"], r["k"]) for r in ch.collect()) \
        == [("delete", 1), ("insert", 1)]


def test_batch_changelog_nets_map_columns(spark, tmp_path):
    """ADVICE r14: the streaming netting refused map<double,int> (float
    map key — lifted later in r15) and pointed at LakeTable.changelog()
    — which used a bare
    exceptAll that Spark rejects for map columns. It now nets on the
    lossless key-sorted entry-array encoding: carried-over rows cancel
    (including entry-order twins), updates surface as delete+insert,
    and NULL vs empty maps stay distinct."""
    ddl = "k bigint, m map<double,int>"
    t = LakeTable.create(spark, str(tmp_path / "t"), ddl)
    t.append(spark.createDataFrame(
        [(1, {1.5: 1, 2.5: 2}), (2, {2.5: 2, 1.5: 1}),  # entry-order twins
         (3, None), (4, {})], ddl))
    base = t._snapshot().snapshot_id
    t.update({"k": "k + 10"}, "k = 1")  # CoW rewrite commit
    rows = sorted(
        (r["_change_type"], r["k"],
         None if r["m"] is None else tuple(sorted(r["m"].items())))
        for r in t.changelog(base).collect()
    )
    # k=2 (same logical map, different entry order), the NULL map and
    # the EMPTY map all cancel; only the update surfaces, maps intact
    assert rows == [
        ("delete", 1, ((1.5, 1), (2.5, 2))),
        ("insert", 11, ((1.5, 1), (2.5, 2))),
    ]


def test_batch_changelog_nets_nested_map_in_struct(spark, tmp_path):
    """Map nested under a struct (and a map-valued map) round-trips
    through the entry-array encoding: NULL struct stays distinct from
    struct-of-NULL-map, and the decoded output carries the original
    map types."""
    ddl = "k bigint, s struct<tags:map<string,int>>"
    t = LakeTable.create(spark, str(tmp_path / "t"), ddl)
    t.append(spark.createDataFrame(
        [(1, {"tags": {"a": 1}}), (2, None), (3, {"tags": None})], ddl))
    base = t._snapshot().snapshot_id
    t.update({"k": "k + 10"}, "k = 1")
    ch = t.changelog(base)
    assert dict(ch.dtypes)["s"] == "struct<tags:map<string,int>>"
    rows = sorted(
        (r["_change_type"], r["k"],
         None if r["s"] is None
         else (None if r["s"]["tags"] is None
               else tuple(sorted(r["s"]["tags"].items()))))
        for r in ch.collect()
    )
    assert rows == [
        ("delete", 1, (("a", 1),)),
        ("insert", 11, (("a", 1),)),
    ]


def test_interval_day_second_through_python_source(spark, tmp_path):
    """r15: ANSI DAY-TO-SECOND intervals through every python leg —
    Spark ships DayTimeIntervalType through Arrow as duration[us] and
    stores INT64 micros in parquet, so the source reads either
    writer's files with one int64→duration cast. The JVM re-read of
    python-sink-written files must go through the EXPLICIT per-version
    schema (schema inference types the unannotated INT64 as bigint,
    and CAST(bigint AS interval) reinterprets micros as SECONDS — the
    1e6 corruption this test pins)."""
    from pyspark.sql import functions as F  # noqa: F401

    register_source(spark)
    ddl = "k bigint, iv interval day to second"
    t = LakeTable.create(spark, str(tmp_path / "t"), ddl)
    src = spark.sql(
        "SELECT id AS k, make_dt_interval(CAST(id AS INT), 2, 3, 4.5) "
        "AS iv FROM range(5)")
    t.append(src)
    want = [tuple(r) for r in src.orderBy("k").collect()]
    got = (spark.read.format("laketable").option("path", t.path).load()
           .orderBy("k").collect())
    assert [tuple(r) for r in got] == want
    # python sink writes duration[us] parquet; JVM re-read stays exact
    dst = LakeTable.create(spark, str(tmp_path / "dst"), ddl)
    q = (
        spark.readStream.format("laketable").option("path", t.path)
        .load()
        .writeStream.format("laketable").option("path", dst.path)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck")).start()
    )
    q.awaitTermination(300)
    dst._reload()
    assert [tuple(r) for r in dst.read().orderBy("k").collect()] == want
    # CoW netting keys on the interval column (Arrow hash group-by
    # over duration); carried-over rows cancel
    t.update({"k": "k + 100"}, "k = 2")
    sink, ck2 = str(tmp_path / "sink"), str(tmp_path / "ck2")
    q = (
        spark.readStream.format("laketable").option("path", t.path)
        .option("mode", "cdc").option("cow-changelog", "true")
        .option("cdc-cow-buckets", "4").load()
        .writeStream.format("parquet").option("path", sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", ck2).start()
    )
    q.awaitTermination(300)
    rows = sorted(
        (r["_commit_snapshot_id"], r["_change_type"], r["k"])
        for r in spark.read.parquet(sink).collect()
    )
    assert rows == [
        (1, "insert", 0), (1, "insert", 1), (1, "insert", 2),
        (1, "insert", 3), (1, "insert", 4),
        (2, "delete", 2), (2, "insert", 102),
    ]


def test_interval_year_month_still_refused(spark, tmp_path):
    """YEAR TO MONTH cannot ship through ANY python data source
    (Spark's Arrow conversion rejects YearMonthIntervalType), so the
    DDL gate refuses it loudly at planning time."""
    import pytest as _pytest

    from iceberg_catalog_bench_spark.streaming.table_source import (
        _arrow_type,
    )

    with _pytest.raises(NotImplementedError, match="does not support"):
        _arrow_type("interval year to month")
    import pyarrow as pa

    assert _arrow_type("interval day to second") == pa.duration("us")


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False

if _HYP:
    # r15 key-type properties: entries sort by the RENDERED key, so
    # equal maps must render equal for float keys (-0.0 folds),
    # binary keys (raw bytes incl. the rendering's own separators)
    # and struct keys — and unequal maps must never collide.
    _BKEYS = st.binary(max_size=4) | st.sampled_from(
        [b":", b";", b"~", b"1:", b"\x00", b"\xff\xfe"])
    _FKEYS = st.one_of(
        st.floats(allow_nan=False, allow_infinity=True, width=64),
        st.sampled_from([-0.0, 0.0, 1.5, -1.5]))
    _VALS = st.one_of(st.none(), st.integers(-2**31, 2**31))

    def _map_rt(rows, typ, knorm=lambda k: k):
        """rendered_i == rendered_j iff entry SETS equal (keys folded
        by ``knorm``) and validity equal."""
        from iceberg_catalog_bench_spark.streaming.table_source import (
            _canon_map_cols,
        )

        arr = pa.array(rows, type=typ)
        valid, joined = _canon_map_cols(arr)
        rendered = list(zip(valid.to_pylist(), joined.to_pylist()))
        logical = [
            None if r is None else tuple(sorted(
                (repr(knorm(k)), repr(v)) for k, v in r))
            for r in rows
        ]
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                same = (logical[i] == logical[j])
                assert (rendered[i] == rendered[j]) == same, (
                    rows[i], rows[j], rendered[i], rendered[j])

    @settings(max_examples=60, deadline=None)
    @given(st.lists(
        st.one_of(st.none(), st.dictionaries(_FKEYS, _VALS, max_size=4)
                  .map(lambda d: list(d.items()))),
        min_size=2, max_size=8))
    def test_prop_float_keyed_map_render_iff_logical(rows):
        _map_rt(rows, pa.map_(pa.float64(), pa.int64()),
                knorm=lambda k: k + 0.0)  # folds -0.0 into +0.0

    @settings(max_examples=60, deadline=None)
    @given(st.lists(
        st.one_of(st.none(), st.dictionaries(_BKEYS, _VALS, max_size=4)
                  .map(lambda d: list(d.items()))),
        min_size=2, max_size=8))
    def test_prop_binary_keyed_map_render_iff_logical(rows):
        _map_rt(rows, pa.map_(pa.binary(), pa.int64()))

    @settings(max_examples=60, deadline=None)
    @given(st.lists(
        st.one_of(st.none(), st.dictionaries(
            st.tuples(st.integers(-9, 9), st.text(
                alphabet=":;~ab", max_size=3)),
            _VALS, max_size=3)
            .map(lambda d: [({"a": k[0], "b": k[1]}, v)
                            for k, v in d.items()])),
        min_size=2, max_size=8))
    def test_prop_struct_keyed_map_render_iff_logical(rows):
        _map_rt(
            rows,
            pa.map_(pa.struct([("a", pa.int64()), ("b", pa.string())]),
                    pa.int64()),
            knorm=lambda k: (k["a"], k["b"]))


def test_interval_unit_ranges_admitted(spark, tmp_path):
    """r15 widening: every DAY-TIME unit range ships as duration[us]
    — the declared DDL in the table metadata fixes the Spark-side
    type, so ranges never alias on disk. e2e: an HOUR TO MINUTE
    column through the python batch read."""
    import pyarrow as pa

    from iceberg_catalog_bench_spark.streaming.table_source import (
        _arrow_type,
    )

    for t in ("interval hour to minute", "interval day",
              "interval second", "INTERVAL MINUTE TO SECOND"):
        assert _arrow_type(t) == pa.duration("us"), t
    register_source(spark)
    ddl = "k bigint, hm interval hour to minute"
    t = LakeTable.create(spark, str(tmp_path / "t"), ddl)
    src = spark.sql(
        "SELECT id AS k, CAST(make_dt_interval(0, CAST(id AS INT), 30, 0)"
        " AS interval hour to minute) AS hm FROM range(3)")
    t.append(src)
    got = (spark.read.format("laketable").option("path", t.path).load()
           .orderBy("k").collect())
    assert [tuple(r) for r in got] \
        == [tuple(r) for r in src.orderBy("k").collect()]
    assert dict(spark.read.format("laketable").option("path", t.path)
                .load().dtypes)["hm"] == "interval hour to minute"


def test_interval_inside_container_nets(spark, tmp_path):
    """Composition check: array<interval day to second> flows through
    the python batch read AND the CoW-changelog netting with no
    special-casing — duration leaves ride the canonical rendering's
    default cast (micros digits, deterministic and injective)."""
    register_source(spark)
    ddl = "k bigint, ivs array<interval day to second>"
    t = LakeTable.create(spark, str(tmp_path / "t"), ddl)
    src = spark.sql(
        "SELECT id AS k, array(make_dt_interval(CAST(id AS INT), 0, 0, "
        "1.5), NULL) AS ivs FROM range(4)")
    t.append(src)
    got = (spark.read.format("laketable").option("path", t.path).load()
           .orderBy("k").collect())
    assert [tuple(r) for r in got] \
        == [tuple(r) for r in src.orderBy("k").collect()]
    t.update({"k": "k + 100"}, "k = 2")
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
        (r["_commit_snapshot_id"], r["_change_type"], r["k"])
        for r in spark.read.parquet(sink).collect()
    )
    assert rows == [
        (1, "insert", 0), (1, "insert", 1), (1, "insert", 2),
        (1, "insert", 3), (2, "delete", 2), (2, "insert", 102),
    ]


def test_substring_span_semantics_crafted_corpus(spark, tmp_path):
    """Hand-computed fixture for the substring-dedup pair (the DuckDB
    oracle mirrors the algorithm, so parity alone cannot catch a
    shared misdesign): doc 1 and doc 2 are identical 10-token texts
    (3 windows each, all duplicated); doc 3 shares exactly doc 1's
    first 8 tokens then diverges; doc 4 is clean; doc 5 is 7 tokens
    (below L, invisible)."""
    import pandas as pd

    from iceberg_catalog_bench_spark.operators.registry import (
        QUERIES,
        load_all,
    )

    load_all()
    base = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"
    rows = [
        (1, base), (2, base),
        (3, "t0 t1 t2 t3 t4 t5 t6 t7 x8 x9"),
        (4, "u0 u1 u2 u3 u4 u5 u6 u7 u8 u9"),
        (5, "v0 v1 v2 v3 v4 v5 v6"),
    ]
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
        str(tmp_path / "documents.parquet"))
    spans = {r["doc_id"]: (r["n_tokens"], r["dup_occurrences"],
                           r["covered_tokens"])
             for r in QUERIES["dedup_substring_spans"](
                 spark, str(tmp_path)).collect()}
    # docs 1/2: all 3 windows duplicated, full 10-token coverage;
    # doc 3: only its first window (shared with 1/2) -> 8 covered
    assert spans == {1: (10, 3, 10), 2: (10, 3, 10), 3: (10, 1, 8)}
    cuts = {r["doc_id"]: (r["cut_tokens"], r["kept_tokens"])
            for r in QUERIES["dedup_substring_cut"](
                spark, str(tmp_path)).collect()}
    # first occurrences live in doc 1 (lowest doc_id) -> doc 1 keeps
    # everything and is ABSENT from the cut report; doc 2 cuts all 10;
    # doc 3's shared first window is a later occurrence -> cuts 8
    assert cuts == {2: (10, 0), 3: (8, 2)}
