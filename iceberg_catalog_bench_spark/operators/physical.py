"""Physical-layout operators: bucketed co-located joins.

The reference spec's performance section is explicit that layout, not
just plan shape, decides join cost at scale
(`ICEBERG-Interoperability-Test-Spec.md:93-99`: partition-pruned scans,
point lookups by key). Iceberg's answer is the ``bucket(N, col)``
transform + storage-partitioned joins; Spark's native answer is
``bucketBy`` tables, where two tables bucketed the same way on the
join key sort-merge-join with ZERO exchanges — at 100 TB the shuffle
of a fact-fact join is usually the single largest cost in the plan,
and bucketing removes it entirely from every subsequent join on that
key (amortized across the table's read life, not paid per query).
"""

from __future__ import annotations

import atexit
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register

_BUCKETS = 8


def _bucketed(spark: SparkSession, df: DataFrame, key: str) -> str:
    """Write ``df`` as an external bucketed table (in-memory catalog,
    files under a tmp dir kept until interpreter exit) and return its
    table name. ``sortBy`` on the bucket key means the later
    sort-merge join needs no per-task sort either."""
    d = tempfile.mkdtemp(prefix="bucketed-")
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    name = f"b_{uuid.uuid4().hex[:10]}"
    (
        df.write.bucketBy(_BUCKETS, key)
        .sortBy(key)
        .option("path", d + "/t")
        .saveAsTable(name)
    )
    return name


@register(
    "join_bucketed_colocated",
    oracle=(
        "SELECT o_orderstatus, COUNT(*) AS n_items, "
        "ROUND(SUM(l_extendedprice), 2) AS revenue, "
        "TRUE AS join_shuffle_free "
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey "
        "GROUP BY o_orderstatus"
    ),
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join with both sides bucketed by the join key: the
    sort-merge join runs bucket-to-bucket with no Exchange on either
    side (Spark reads each bucket pair co-located in one task).

    The ``join_shuffle_free`` verdict is measured, not asserted: the
    join-only plan is compiled with broadcast disabled (so AQE cannot
    hide a shuffle behind a BroadcastExchange at toy scale — at 100 TB
    neither fact side broadcasts) and the executed plan string must
    contain no Exchange of any kind. If bucketing metadata stops
    flowing (e.g. a writer change drops the bucket spec), the verdict
    flips FALSE and the driver row goes red.

    The returned aggregate re-joins under normal session settings —
    values identical either way; only the layout experiment pins the
    physical property. Reference analogue: the spec's bucketed
    partition dimension `bucket(tenant_id, 16)` (spec:50) exists
    precisely so tenant-keyed joins and lookups co-locate.
    """
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderstatus"
    )
    lineitem = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_extendedprice"
    )
    t_o = _bucketed(spark, orders, "o_orderkey")
    t_l = _bucketed(spark, lineitem, "l_orderkey")
    bo, bl = spark.table(t_o), spark.table(t_l)

    joined = bo.join(bl, bo["o_orderkey"] == bl["l_orderkey"])

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = (
            joined._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    shuffle_free = "Exchange" not in plan and "SortMergeJoin" in plan

    return (
        joined.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
        .withColumn("join_shuffle_free", F.lit(shuffle_free))
    )
