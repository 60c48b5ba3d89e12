"""Round-11 regression pins — the four ADVICE r10 findings.

(The decimal boundary + tz-aware datetime hash fixes are pinned in
tests/test_iceberg_bucket.py next to the spec vectors.)
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_catalog_bench_spark.catalog.iceberg_export import (
    to_iceberg_metadata,
)
from iceberg_catalog_bench_spark.catalog.table import LakeTable
from iceberg_catalog_bench_spark.engine import SqlEngine


def test_merge_set_star_by_source_rejected(spark, tmp_path):
    """ADVICE r10: UPDATE SET * under WHEN NOT MATCHED BY SOURCE has no
    source row to expand from — it must refuse loudly, not no-op."""
    engine = SqlEngine(spark, str(tmp_path / "wh"))
    engine.execute("CREATE TABLE bst (k BIGINT, a STRING)")
    engine.execute("INSERT INTO bst VALUES (1, 'a1'), (2, 'a2')")
    with pytest.raises(ValueError, match="NOT MATCHED BY SOURCE"):
        engine.execute(
            "MERGE INTO bst USING (VALUES (1, 'x')) AS s(k, a) "
            "ON bst.k = s.k "
            "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET *")
    # table untouched by the refused merge
    rows = engine.execute("SELECT * FROM bst ORDER BY k")[-1].rows
    assert [tuple(r.values()) for r in rows] == [(1, "a1"), (2, "a2")]


def test_schema_evolution_not_applied_when_merge_refused(spark, tmp_path):
    """ADVICE r10: merge(schema_evolution=True) must not leave the
    target schema half-evolved when the merge itself is rejected —
    neither on the empty-table check nor on the duplicate-key check."""
    # empty table: merge refuses before any evolution
    t = LakeTable.create(spark, str(tmp_path / "empty"), "k bigint, a string")
    src = spark.createDataFrame([(1, "a", "b")], "k bigint, a string, b string")
    with pytest.raises(ValueError, match="empty table"):
        t.merge(src, on=["k"], when_matched_update="*",
                schema_evolution=True)
    assert [f.name for f in t._fields()] == ["k", "a"]
    assert t._meta["current_schema_version"] == 0

    # duplicate source keys matching a target row: refused AFTER the
    # probe, still no evolution
    t2 = LakeTable.create(spark, str(tmp_path / "dup"), "k bigint, a string")
    t2.append(spark.createDataFrame([(1, "a1")], "k bigint, a string"))
    dup_src = spark.createDataFrame(
        [(1, "x", "b1"), (1, "y", "b2")], "k bigint, a string, b string")
    with pytest.raises(ValueError, match="duplicate"):
        t2.merge(dup_src, on=["k"], when_matched_update="*",
                 schema_evolution=True)
    assert [f.name for f in t2._fields()] == ["k", "a"]
    assert t2._meta["current_schema_version"] == 0


def test_export_disambiguates_void_colliding_partition_fields(spark, tmp_path):
    """ADVICE r10: legacy bucket and non-string truncate both export as
    'void', so field-ids must key on the NATIVE transform (not the
    exported spelling), and two bucket flavors of one column must not
    emit duplicate partition field names."""
    t = LakeTable.create(
        spark, str(tmp_path / "src"),
        "k bigint, v string",
        partition_by=["bucket(8, k)", "truncate(4, k)", "ibucket(4, k)"],
    )
    t.append(spark.createDataFrame([(i, f"v{i}") for i in range(8)],
                                   "k bigint, v string"))
    mp = to_iceberg_metadata(t)
    md = json.load(open(mp))
    spec = md["partition-specs"][md["default-spec-id"]]["fields"]
    assert len(spec) == 3
    ids = [f["field-id"] for f in spec]
    names = [f["name"] for f in spec]
    assert len(set(ids)) == 3, ids          # was: void spellings collided
    assert len(set(names)) == 3, names      # was: k_bucket twice
    by_tr = {f["transform"]: f for f in spec}
    # legacy bucket + numeric truncate degrade to void; ibucket is real
    assert sorted(f["transform"] for f in spec) == \
        ["bucket[4]", "void", "void"]
    assert by_tr["bucket[4]"]["name"].startswith("k_bucket")
