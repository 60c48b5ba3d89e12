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
