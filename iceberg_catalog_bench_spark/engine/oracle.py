"""Local DuckDB-oracle parity checker.

Mirrors the driver's correctness gate (CORRECTNESS_r{N}.json): run a
registered Spark query and its oracle SQL on the same parquet tables,
then compare row count, column names, and order-insensitive values.
Used by tests/ while iterating so oracle mismatches surface before
the driver runs.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from ..sources import TABLES


@dataclass
class ParityResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    errors: list[str] = field(default_factory=list)


def _duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # Canonical row order: sort by stringified row for order-insensitive compare.
    if len(df) > 0:
        key = df.astype(str).apply(lambda r: "\x00".join(r.values), axis=1)
        df = df.loc[key.sort_values().index].reset_index(drop=True)
    return df


# The driver's gate hashes EXACT values — a locally-green query with a
# last-ulp float difference would still go red in CORRECTNESS_r{N}.
# So the local compare is exact by default (bit-level float equality
# after NaN / -0.0 canonicalization); set SPARK_GRAFT_ORACLE_TOLERANT=1
# to fall back to isclose() while debugging a genuine float divergence
# (the fix is always rounding discipline in the query + oracle, never
# loosening this gate).
_TOLERANT = os.environ.get("SPARK_GRAFT_ORACLE_TOLERANT", "") == "1"


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(af) and math.isnan(bf):
            return True
        if _TOLERANT:
            return math.isclose(af, bf, rel_tol=1e-9, abs_tol=1e-9)
        if af == 0.0 and bf == 0.0:  # -0.0 == 0.0 → same canonical value
            return True
        return af == bf
    return str(a) == str(b)


def _spark_kind(dt) -> str | None:
    """Numeric/bool kind of a Spark SQL type: i / f / b / d."""
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "i"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "f"
    if isinstance(dt, T.BooleanType):
        return "b"
    if isinstance(dt, T.DecimalType):
        return "d"
    return None


def _arrow_kind(dt) -> str | None:
    import pyarrow.types as pat

    if pat.is_integer(dt):
        return "i"
    if pat.is_floating(dt):
        return "f"
    if pat.is_boolean(dt):
        return "b"
    if pat.is_decimal(dt):
        return "d"
    return None


def _type_kind_errors(spark_schema, oracle_arrow_schema) -> list[str]:
    """The driver's hash is TYPE-sensitive: an int64 34105 on the Spark
    side vs a float64 34105.0 on the oracle side (DuckDB HUGEINT →
    fetchdf float64) hashes red even though every value compares equal
    under the float coercion in ``_values_equal`` — the exact r13
    ``tpcds_brand_decline_yoy`` failure. Mirror that strictness at the
    ENGINE type level (Spark schema vs DuckDB's Arrow result schema),
    not pandas dtypes: pandas widens a null-bearing int64 to float64 on
    either side, so a pandas-kind gate had to skip null-bearing columns
    and an int-vs-float leak there went undetected (ADVICE r14). Engine
    types are null-immune — DuckDB's HUGEINT surfaces as Arrow
    decimal128(38,0) with or without nulls.

    The one tolerated mismatch is Spark float vs DuckDB DECIMAL:
    ``fetchdf`` renders DECIMAL as float64, so the frames the driver
    hashes agree (the adjudicated ROUND(...,4) tolerance class)."""
    errs: list[str] = []
    duck = {f.name.lower(): f.type for f in oracle_arrow_schema}
    for f in spark_schema.fields:
        ot = duck.get(f.name.lower())
        if ot is None:
            continue  # column-set mismatch reported separately
        sk, ok = _spark_kind(f.dataType), _arrow_kind(ot)
        if sk is None or ok is None or sk == ok:
            continue
        if sk == "f" and ok == "d":
            continue
        errs.append(
            f"type kind differs for col {f.name}: spark={f.dataType.simpleString()} "
            f"oracle(arrow)={ot} (driver hash is type-sensitive; "
            f"CAST the oracle or align the Spark type)"
        )
    return errs


def compare(name: str, spark: SparkSession, sf_dir: str) -> ParityResult:
    from ..operators import registry

    fn = registry.QUERIES[name]
    sdf_frame = fn(spark, sf_dir)
    spark_schema = sdf_frame.schema
    sdf = sdf_frame.toPandas()
    errors: list[str] = []

    oracle = registry.ORACLES.get(name)
    if oracle is None:
        # rows-only check, like the driver's weaker path
        return ParityResult(name, True, len(sdf), -1, [])

    con = _duck_con(sf_dir)
    # Arrow schema for the null-immune type-kind gate (fetchdf's pandas
    # dtypes widen under nulls); values still compare on the fetchdf
    # frame — the rendering the driver hashes.
    oracle_arrow_schema = con.execute(oracle).fetch_arrow_table().schema
    odf = con.execute(oracle).fetchdf()

    if sorted(map(str.lower, sdf.columns)) != sorted(map(str.lower, odf.columns)):
        errors.append(f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
    if len(sdf) != len(odf):
        errors.append(f"rowcount differs: spark={len(sdf)} oracle={len(odf)}")

    if not errors:
        sdf.columns = [c.lower() for c in sdf.columns]
        odf.columns = [c.lower() for c in odf.columns]
        errors.extend(_type_kind_errors(spark_schema, oracle_arrow_schema))
        if errors:
            return ParityResult(name, False, len(sdf), len(odf), errors)
        a, b = _normalize(sdf), _normalize(odf)
        for i in range(len(a)):
            for c in a.columns:
                if not _values_equal(a.at[i, c], b.at[i, c]):
                    errors.append(f"row {i} col {c}: spark={a.at[i, c]!r} oracle={b.at[i, c]!r}")
                    if len(errors) > 5:
                        break
            if len(errors) > 5:
                break
    return ParityResult(name, not errors, len(sdf), len(odf) if oracle else -1, errors)
