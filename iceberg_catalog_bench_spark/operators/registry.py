"""Query registry.

Every implemented operator from SURVEY.md §2 registers here as a
named query ``(spark, sf_dir) -> DataFrame`` plus (when expressible)
an equivalent ANSI-SQL oracle string that DuckDB runs on the same
parquet tables. The driver's correctness gate compares the two.

Column names are part of the contract: alias every computed column
identically in the Spark code and the oracle SQL — the driver sorts
columns by name before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` → driver does a rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registrations run.

    Registration order is the driver's execution order, and the driver
    may stop at a query-count or time cap mid-suite (round 1 truncated
    at 50 of 73). Priority order (never-driver-verified first, then by
    how loudly round 1's verdict asked for their rows): CRUD/MoR/CDC,
    the reworked ANN + dedup operators (verdict items 2-3), temporal
    joins, multimodal, streaming, datagen, text/corpus, then the broad
    relational suites (green in round 1) last.
    """
    from . import crud  # noqa: F401  — UPDATE/DELETE/MERGE/travel/evolution
    from . import similarity  # noqa: F401
    from . import dedup  # noqa: F401
    from . import temporal  # noqa: F401
    from . import multimodal  # noqa: F401
    from ..streaming import events  # noqa: F401
    from ..sources import datagen  # noqa: F401
    from . import text  # noqa: F401
    from . import corpus  # noqa: F401
    from . import relational  # noqa: F401
    from . import relational_ext  # noqa: F401
