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


def test_dtype_kind_gate_catches_int_vs_float(monkeypatch):
    """The r13 Q75 class: identical values, int64 vs float64 dtypes —
    the driver's type-sensitive hash goes red, so the local gate must
    too (VERDICT r13 item 2a)."""
    import pandas as pd

    o = _fresh(monkeypatch, tolerant=False)
    sdf = pd.DataFrame({"qty": pd.Series([34105, 7], dtype="int64")})
    odf = pd.DataFrame({"qty": pd.Series([34105.0, 7.0], dtype="float64")})
    errs = o._dtype_kind_errors(sdf, odf)
    assert errs and "qty" in errs[0]

    # same-kind frames pass; signed-vs-unsigned int is not a hash risk
    assert not o._dtype_kind_errors(odf, odf.copy())
    u = pd.DataFrame({"qty": pd.Series([34105, 7], dtype="uint64")})
    assert not o._dtype_kind_errors(sdf, u)

    # nulls widen int->float on one side legitimately: inconclusive
    sn = pd.DataFrame({"qty": pd.Series([34105, None], dtype="float64")})
    si = pd.DataFrame({"qty": pd.Series([34105, 2], dtype="int64")})
    assert not o._dtype_kind_errors(si, sn)
