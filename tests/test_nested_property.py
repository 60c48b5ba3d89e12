"""Property-based pins (hypothesis) for the round-12 codecs: the
nested DDL↔Iceberg type converters and the Puffin theta-sketch
synthesis. Pure-Python — no Spark session needed."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_catalog_bench_spark.catalog.iceberg_export import (
    _iceberg_type_full,
    _spark_ddl_type,
    nested_ids_of_schema,
)
from iceberg_catalog_bench_spark.catalog.puffin import (
    theta_estimate,
    theta_sketch_bytes,
)

_PRIMS = st.sampled_from([
    "bigint", "int", "string", "double", "float", "boolean",
    "date", "timestamp", "binary", "decimal(18,2)", "decimal(9,0)",
])

_NAMES = st.from_regex(re.compile(r"[a-z][a-z0-9_]{0,7}"), fullmatch=True)


def _types(depth: int):
    if depth == 0:
        return _PRIMS
    inner = _types(depth - 1)
    return st.one_of(
        _PRIMS,
        inner.map(lambda t: f"array<{t}>"),
        st.tuples(inner, inner).map(lambda kv: f"map<{kv[0]},{kv[1]}>"),
        st.lists(
            st.tuples(_NAMES, inner), min_size=1, max_size=3,
            unique_by=lambda kv: kv[0],
        ).map(lambda fs: "struct<" + ",".join(
            f"{n}:{t}" for n, t in fs) + ">"),
    )


@settings(max_examples=200, deadline=None)
@given(_types(3))
def test_ddl_iceberg_ddl_identity(ddl):
    """_spark_ddl_type ∘ _iceberg_type_full is the identity on DDL for
    arbitrary nested type trees, and every allocated nested id is
    unique and discoverable by nested_ids_of_schema."""
    counter = iter(range(1000, 100000))
    ice = _iceberg_type_full(ddl, lambda _p: next(counter))
    assert _spark_ddl_type(ice) == ddl
    schema = {"schema-id": 0, "fields": [
        {"id": 1, "name": "c", "required": False, "type": ice}]}
    ids = list(nested_ids_of_schema([schema]).values())
    assert len(ids) == len(set(ids))
    # strict mode agrees with the default on well-formed trees
    assert nested_ids_of_schema([schema], strict=True) == \
        nested_ids_of_schema([schema])


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=0, max_value=140_000_000_000))
def test_theta_roundtrip_exact_below_granularity_bound(ndv):
    """Synthesized theta sketches round-trip the NDV EXACTLY for every
    value below the 63-bit granularity bound (~1.4e11) — the range
    every realistic ANALYZE NDV lives in."""
    assert round(theta_estimate(theta_sketch_bytes(ndv))) == ndv


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=140_000_000_000, max_value=10**16))
def test_theta_roundtrip_bounded_above(ndv):
    """Above the bound, the error never exceeds theta's granularity
    ndv²/(R·2^63) — the quantity adoption's ndv-property
    reconciliation is sized to."""
    est = theta_estimate(theta_sketch_bytes(ndv))
    bound = max(1, ndv * ndv // (4096 * 2 ** 63))
    assert abs(round(est) - ndv) <= bound
