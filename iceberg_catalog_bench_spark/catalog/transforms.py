"""Iceberg-style partition transforms as Spark column expressions.

The reference partitions tables with Iceberg transforms — ``days(ts)``,
``bucket(16, user_id)``, ``truncate(sku, 8)``, identity — declared at
``ICEBERG-Interoperability-Test-Spec.md:50`` and applied at
``blob_dfs/blob-dfs_bench.py:72`` and
``iceberg-tests/config/framework.yaml:133-134``.

In LakeTable a partition spec drives *write clustering*
(``df.repartition(exprs)``) so rows with the same transform value land
in the same files; read-side pruning then uses per-file min/max stats.
This is the same effect Iceberg achieves with its partition manifest —
declarative transforms, physical clustering, metadata pruning — without
a catalog jar.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

SUPPORTED = ("identity", "days", "hours", "months", "years", "bucket", "truncate")


@dataclass(frozen=True)
class Transform:
    """One partition-spec entry: ``name(column[, param])``."""

    name: str
    column: str
    param: int | None = None  # bucket count or truncate width

    def to_json(self) -> dict:
        d = {"transform": self.name, "column": self.column}
        if self.param is not None:
            d["param"] = self.param
        return d

    @staticmethod
    def from_json(d: dict) -> "Transform":
        return Transform(d["transform"], d["column"], d.get("param"))


def transform_expr(t: Transform) -> Column:
    """Spark expression computing the transform value for clustering."""
    c = F.col(t.column)
    if t.name == "identity":
        return c
    if t.name == "days":
        return F.to_date(c)
    if t.name == "hours":
        return F.date_trunc("hour", c)
    if t.name == "months":
        return F.date_trunc("month", c)
    if t.name == "years":
        return F.date_trunc("year", c)
    if t.name == "bucket":
        if not t.param:
            raise ValueError("bucket transform needs a bucket count")
        # xxhash64 ≈ Iceberg's bucket hash role: stable, uniform. pmod keeps
        # the result non-negative.
        return F.pmod(F.xxhash64(c), F.lit(t.param))
    if t.name == "truncate":
        if not t.param:
            raise ValueError("truncate transform needs a width")
        return F.substring(c.cast("string"), 1, t.param)
    raise ValueError(f"unsupported transform {t.name!r}; supported: {SUPPORTED}")


def parse_spec(spec: list[str | dict | Transform]) -> list[Transform]:
    """Parse a partition spec from strings like ``days(ts)``,
    ``bucket(16, user_id)``, ``truncate(8, sku)``, or bare column names."""
    out: list[Transform] = []
    for item in spec:
        if isinstance(item, Transform):
            out.append(item)
        elif isinstance(item, dict):
            out.append(Transform.from_json(item))
        else:
            s = item.strip()
            if "(" not in s:
                out.append(Transform("identity", s))
                continue
            name, _, rest = s.partition("(")
            args = [a.strip() for a in rest.rstrip(")").split(",")]
            name = name.strip().lower()
            if name in ("bucket", "truncate"):
                out.append(Transform(name, args[1], int(args[0])))
            else:
                out.append(Transform(name, args[0]))
    return out
