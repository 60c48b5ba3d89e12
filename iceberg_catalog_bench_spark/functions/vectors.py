"""Vector column functions (array<float|double>) as JVM higher-order
expressions — zip_with/aggregate stay inside whole-stage codegen, so
similarity math never leaves the JVM or drops to per-row Python.
Accumulation is sequential per element, making results deterministic
and reproducible against the DuckDB oracle at fixed rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: str, b: str) -> Column:
    """<a, b> in double precision (elements cast up from float)."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"0D, (acc, v) -> acc + v)"
    )


def l2_norm(a: str) -> Column:
    return F.sqrt(
        F.expr(f"aggregate({a}, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))")
    )


def cosine_similarity(a: str, b: str) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
