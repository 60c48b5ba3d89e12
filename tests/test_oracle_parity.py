"""Mirror of the driver's correctness gate: every registered query with
an oracle must match DuckDB at sf0.01 (rowcount + columns + values)."""

import pytest

from iceberg_catalog_bench_spark.engine.oracle import compare
from iceberg_catalog_bench_spark.operators import registry

registry.load_all()

ORACLE_NAMES = sorted(registry.ORACLES)
ROWS_ONLY_NAMES = sorted(set(registry.QUERIES) - set(registry.ORACLES))


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(name, spark, oracle_sf_dir):
    result = compare(name, spark, oracle_sf_dir)
    assert result.ok, f"{name}: {result.errors[:6]}"


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_queries_run(name, spark, oracle_sf_dir):
    df = registry.QUERIES[name](spark, oracle_sf_dir)
    assert df.count() >= 0


def test_no_oracle_leaks_hugeint(oracle_sf_dir):
    """Static oracle-output-type sweep (VERDICT r13 item 2b).

    DuckDB widens SUM(BIGINT) to HUGEINT; ``fetchdf()`` renders HUGEINT
    as float64, so an un-cast HUGEINT output column hashes red against
    Spark's int64 under the driver's type-sensitive hash even when every
    value is identical — the exact r13 ``tpcds_brand_decline_yoy``
    failure. Binding each oracle (``con.sql(...).types`` plans without
    executing) and asserting no HUGEINT/UHUGEINT output column makes the
    whole class unreachable for ~5s of test time."""
    from iceberg_catalog_bench_spark.engine.oracle import _duck_con

    con = _duck_con(oracle_sf_dir)
    offenders = []
    for name in ORACLE_NAMES:
        try:
            rel = con.sql(registry.ORACLES[name])
        except Exception:
            continue  # runtime-only oracles surface in the parity sweep
        for col, typ in zip(rel.columns, rel.types):
            if "HUGEINT" in str(typ).upper():
                offenders.append(f"{name}.{col}: {typ}")
    assert not offenders, (
        "oracle output columns typed HUGEINT/UHUGEINT (fetchdf renders "
        "these float64 -> driver hash mismatch; CAST ... AS BIGINT): "
        f"{offenders}"
    )
