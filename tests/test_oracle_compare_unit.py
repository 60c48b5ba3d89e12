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
