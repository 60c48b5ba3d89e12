"""Unit semantics of the strict oracle value compare (no Spark):
exact float equality by default (the driver hashes exact values),
NaN==NaN, -0.0==0.0, tolerant mode only via env opt-in."""

import importlib
import math


def _fresh(monkeypatch, tolerant: bool):
    if tolerant:
        monkeypatch.setenv("SPARK_GRAFT_ORACLE_TOLERANT", "1")
    else:
        monkeypatch.delenv("SPARK_GRAFT_ORACLE_TOLERANT", raising=False)
    from iceberg_catalog_bench_spark.engine import oracle

    return importlib.reload(oracle)


def test_strict_rejects_ulp_differences(monkeypatch):
    o = _fresh(monkeypatch, tolerant=False)
    assert o._values_equal(1.25, 1.25)
    assert not o._values_equal(1.25, 1.25 + 1e-12)
    assert o._values_equal(float("nan"), float("nan"))
    assert o._values_equal(-0.0, 0.0)
    assert o._values_equal(None, None)
    assert o._values_equal("a", "a") and not o._values_equal("a", "b")
    assert o._values_equal(3, 3.0)  # int/float same value


def test_tolerant_mode_is_opt_in(monkeypatch):
    o = _fresh(monkeypatch, tolerant=True)
    assert o._values_equal(1.25, 1.25 + 1e-12)
    # restore strict for the rest of the session
    _fresh(monkeypatch, tolerant=False)


def test_type_kind_gate_catches_int_vs_float(monkeypatch):
    """The r13 Q75 class: identical values, Spark int64 vs oracle
    float/HUGEINT — the driver's type-sensitive hash goes red, so the
    local gate must too (VERDICT r13 item 2a). The gate compares ENGINE
    types (Spark schema vs DuckDB Arrow schema), so it stays conclusive
    for null-bearing columns where pandas dtypes widen (ADVICE r14)."""
    import pyarrow as pa
    from pyspark.sql import types as T

    o = _fresh(monkeypatch, tolerant=False)
    spark_int = T.StructType([T.StructField("qty", T.LongType())])
    errs = o._type_kind_errors(spark_int, pa.schema([("qty", pa.float64())]))
    assert errs and "qty" in errs[0]

    # the HUGEINT leak signature itself: DuckDB SUM(BIGINT) → Arrow
    # decimal128(38,0) — red against a Spark integer even with nulls
    errs = o._type_kind_errors(
        spark_int, pa.schema([("qty", pa.decimal128(38, 0))])
    )
    assert errs and "qty" in errs[0]

    # same-kind passes; int width/signedness is not a hash risk
    assert not o._type_kind_errors(spark_int, pa.schema([("qty", pa.int32())]))
    assert not o._type_kind_errors(spark_int, pa.schema([("QTY", pa.uint64())]))

    # Spark float vs DuckDB DECIMAL renders float64 in fetchdf — the
    # one tolerated cross-kind pairing
    spark_f = T.StructType([T.StructField("r", T.DoubleType())])
    assert not o._type_kind_errors(spark_f, pa.schema([("r", pa.decimal128(10, 4))]))
    # ... but the reverse (Spark decimal vs oracle float) is flagged
    spark_d = T.StructType([T.StructField("r", T.DecimalType(10, 4))])
    assert o._type_kind_errors(spark_d, pa.schema([("r", pa.float64())]))

    # non-numeric columns and column-set mismatches are out of scope
    spark_s = T.StructType([T.StructField("s", T.StringType())])
    assert not o._type_kind_errors(spark_s, pa.schema([("s", pa.int64())]))
    assert not o._type_kind_errors(spark_int, pa.schema([("other", pa.float64())]))
