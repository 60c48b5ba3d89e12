"""Relational query corpus (SURVEY.md §2.3 Q1-Q13 + additive joins/windows/set-ops).

Each query maps a reference operator onto the driver's TPC-H-ish
testdata. Reference citations are per-function. All computed columns
are aliased identically in Spark and oracle SQL; double aggregates
are rounded in BOTH engines to absorb summation-order float jitter.

Scale notes (100 TB design stance):
- Aggregations are expressed declaratively → Catalyst plans partial
  (map-side) aggregation before the shuffle; no driver-side loops.
- Dimension joins (region/nation/supplier/customer at bench SF) are
  hinted broadcast; the fact-fact join (lineitem ⋈ orders) is left to
  sort-merge + AQE skew handling.
- Filters are plain column predicates → pushed to the parquet scan
  (verify with .explain: PushedFilters), partition-pruning-ready.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_events_ts_range, load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


# ---------------------------------------------------------------------------
# Q1/Q2-family: scans, projections, counts
# ---------------------------------------------------------------------------


@register(
    "full_scan_projection",
    oracle="SELECT event_id, user_id, event_type, value FROM events",
)
def full_scan_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit-projection full scan.

    Reference Q1: ``iceberg-tests/sql/spark/open_catalog/read_sales_events.sql:6-8``
    (8-col explicit projection). Catalyst prunes the parquet scan to
    exactly these columns (check ReadSchema in .explain).
    """
    return _t(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "value")


@register("count_star", oracle="SELECT COUNT(*) AS row_count FROM lineitem")
def count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(*) parity check — reference Q2 (`read_sales_events.sql:3-4`)."""
    return _t(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("row_count"))


@register(
    "sum_checksum",
    oracle="SELECT ROUND(SUM(l_quantity), 2) AS sum_qty FROM lineitem",
)
def sum_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUM(col) checksum — reference Q3 (`time_travel_validate.sql:10-12`)."""
    return _t(spark, sf_dir, "lineitem").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )


@register(
    "revenue_checksum",
    oracle=(
        "SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue "
        "FROM lineitem"
    ),
)
def revenue_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUM(arithmetic expr) checksum — reference Q4
    (`sql/databricks/unity_catalog/read_checksums.sql:3-7`, SUM(price*qty))."""
    return _t(spark, sf_dir, "lineitem").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )


@register(
    "ordered_read",
    oracle="SELECT o_orderkey, o_custkey, o_totalprice FROM orders ORDER BY o_orderkey",
)
def ordered_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic total sort — reference Q5 (`read_sales_events.sql:8`
    ORDER BY event_id). Spark plans a range-partitioned global sort."""
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


@register(
    "latest_event_top1",
    oracle=(
        "SELECT event_id, ts, event_type FROM events "
        "ORDER BY ts DESC, event_id DESC LIMIT 1"
    ),
)
def latest_event_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY DESC + LIMIT 1 — reference Q6, latest-snapshot lookup
    (`bulk_insert_sales_events.sql:14-17`). Spark compiles to
    TakeOrderedAndProject (no full sort, no full shuffle); event_id
    tie-break keeps it deterministic."""
    return (
        _t(spark, sf_dir, "events")
        .select("event_id", "ts", "event_type")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(1)
    )


@register(
    "point_lookup",
    oracle="SELECT event_id, user_id, event_type, value FROM events WHERE event_id = 421",
)
def point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality-predicate point read — reference Q7
    (`update_sales_events.sql:10-12`, WHERE event_id = 1). The filter
    pushes into the parquet scan (PushedFilters: [EqualTo(event_id,421)])."""
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") == 421)
        .select("event_id", "user_id", "event_type", "value")
    )


@register(
    "inlist_lookup",
    oracle=(
        "SELECT event_id, user_id, value FROM events "
        "WHERE user_id IN (1, 7, 13) ORDER BY event_id"
    ),
)
def inlist_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list high-selectivity lookup — reference Q8
    (`blob_dfs/blob-dfs_bench.py:132-136`, user_id IN (...)). Pushes as
    an In() filter; at 100 TB this is the bloom-filter/point-index path."""
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id").isin(1, 7, 13))
        .select("event_id", "user_id", "value")
        .orderBy("event_id")
    )


@register(
    "range_pruned_agg",
    oracle=(
        "SELECT event_type, COUNT(*) AS cnt FROM events "
        "WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' "
        "AND ts < TIMESTAMP '2024-01-07 00:00:00' "
        "GROUP BY event_type"
    ),
)
def range_pruned_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp-range filter + GROUP BY count — reference Q9+Q10
    (`blob-dfs_bench.py:117-122`: 2-day window over days(ts) partitions,
    GROUP BY city). On a days()-partitioned table this prunes to 2
    partitions; here the range predicate pushes to the parquet scan as
    int64-nanos comparisons (see load_events_ts_range) so row groups
    outside the window are skipped via min/max stats."""
    ev = load_events_ts_range(
        spark, sf_dir, "2024-01-05 00:00:00", "2024-01-07 00:00:00"
    )
    return (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "groupby_count",
    oracle=(
        "SELECT o_orderpriority, COUNT(*) AS cnt FROM orders GROUP BY o_orderpriority"
    ),
)
def groupby_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + COUNT — reference Q10 (`blob-dfs_bench.py:117-122`).
    Hash aggregate with map-side partial combine before the shuffle."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "percentile_by_group",
    oracle=(
        "SELECT event_type, ROUND(quantile_cont(value, 0.95), 6) AS p95_value, "
        "COUNT(*) AS cnt FROM events GROUP BY event_type"
    ),
)
def percentile_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group p95 + count — reference Q11 (`blob-dfs_bench.py:125-129`,
    approx_percentile(amount, 0.95) by category). The oracle-checked
    variant uses EXACT interpolated percentile (Spark `percentile` ==
    DuckDB `quantile_cont`); `percentile_approx_by_group` below is the
    sketch-based scale path (rows-only check — GK vs t-digest sketches
    differ across engines by design)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95_value"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


@register(
    "percentile_approx_by_group",
    oracle=(
        "SELECT event_type, COUNT(*) AS cnt, "
        "TRUE AS approx_within_bounds FROM events GROUP BY event_type"
    ),
)
def percentile_approx_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile — the actual operator the reference benchmark
    runs (`blob-dfs_bench.py:127`). GK-sketch, single-pass, mergeable —
    this is the one to run at 100 TB (exact percentile needs a full
    sort per group).

    Bounded-error oracle: the sketch value itself differs across
    engines by design, so the query returns a VERDICT — whether the
    approx p95 lands between the exact p94 and p96 (computed in the
    same aggregate; the GK rank-error guarantee at default accuracy is
    1e-4, far inside that band). The oracle pins the verdict TRUE for
    every group: a sketch drifting out of bounds turns the driver row
    red instead of being unverifiable."""
    approx = F.percentile_approx("value", 0.95)
    lo = F.expr("percentile(value, 0.94)")
    hi = F.expr("percentile(value, 0.96)")
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            ((approx >= lo) & (approx <= hi)).alias("approx_within_bounds"),
        )
        .select("event_type", "cnt", "approx_within_bounds")
    )


def percentile_approx_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PURE GK-sketch plan — approx p95 + count, no exact
    percentile anywhere (unregistered: the sketch value isn't
    oracle-comparable across engines). This is what callers use to get
    the approx value, and what bench.py times for the
    `percentile_approx_by_group` headline: the registered verdict query
    above computes exact p94/p96 bounds for its oracle, which would
    make the timing measure the full-sort path instead of the
    single-pass sketch the reference benchmarks."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.round(F.percentile_approx("value", 0.95), 6).alias("p95_approx"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


@register(
    "reagg_total",
    oracle=(
        "SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM ("
        "SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type)"
    ),
)
def reagg_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation re-aggregation — reference Q12
    (`blob-dfs_bench.py:112`: .agg(F.sum("cnt")) over a query result).
    Pure DataFrame composition; Catalyst collapses it into one plan."""
    grouped = (
        _t(spark, sf_dir, "events").groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
    )
    return grouped.agg(F.sum("cnt").alias("total"))


@register(
    "limit_preview",
    oracle=(
        "SELECT p_partkey, p_name, p_retailprice FROM part ORDER BY p_partkey LIMIT 10"
    ),
)
def limit_preview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT preview — reference Q13 (`snowflake.sql:229` limit 10).
    Ordered for determinism; Spark plans TakeOrderedAndProject."""
    return (
        _t(spark, sf_dir, "part")
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy("p_partkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Flagship: TPC-H-style pricing summary (the headline bench query)
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    oracle=(
        "SELECT l_returnflag, l_linestatus, "
        "ROUND(SUM(l_quantity), 2) AS sum_qty, "
        "ROUND(SUM(l_extendedprice), 2) AS sum_base_price, "
        "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, "
        "ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge, "
        "ROUND(AVG(l_quantity), 6) AS avg_qty, "
        "ROUND(AVG(l_extendedprice), 6) AS avg_price, "
        "ROUND(AVG(l_discount), 6) AS avg_disc, "
        "COUNT(*) AS count_order "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' "
        "GROUP BY l_returnflag, l_linestatus "
        "ORDER BY l_returnflag, l_linestatus"
    ),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary — the flagship query.

    Composes the reference's scan+filter+agg+sort surface (Q1-Q5, Q10)
    into one statement. One shuffle (on the 6-value group key), partial
    aggregation map-side, filter pushed to the scan. At 100 TB this is
    scan-bound — exactly what you want."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Additive (beyond the reference surface — SURVEY.md §2.9): joins,
# windows, set ops. Required for a complete engine.
# ---------------------------------------------------------------------------


@register(
    "join_broadcast_dim",
    oracle=(
        "SELECT c.c_mktsegment, ROUND(SUM(o.o_totalprice), 2) AS segment_revenue, "
        "COUNT(*) AS order_cnt FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
        "GROUP BY c.c_mktsegment"
    ),
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ broadcast-dimension join. customer is small relative to
    orders at every SF → explicit broadcast hint eliminates the
    fact-side shuffle entirely (BroadcastHashJoin). At 100 TB the dim
    still fits in executor memory; only the aggregate shuffles."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("segment_revenue"),
            F.count(F.lit(1)).alias("order_cnt"),
        )
    )


@register(
    "join_fact_fact",
    oracle=(
        "SELECT o.o_orderpriority, ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) "
        "AS revenue, COUNT(*) AS line_cnt FROM lineitem l "
        "JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "WHERE o.o_orderstatus = 'O' GROUP BY o.o_orderpriority"
    ),
)
def join_fact_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ fact join (lineitem ⋈ orders on orderkey). Both sides
    shuffle on the join key → sort-merge join; AQE splits skewed keys.
    The o_orderstatus filter is pushed below the join (reduces the
    shuffled build side before the exchange)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("line_cnt"),
        )
    )


@register(
    "join_multiway_region_revenue",
    oracle=(
        "SELECT r.r_name AS region_name, n.n_name AS nation_name, "
        "ROUND(SUM(o.o_totalprice), 2) AS revenue "
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "JOIN region r ON n.n_regionkey = r.r_regionkey "
        "GROUP BY r.r_name, n.n_name"
    ),
)
def join_multiway_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style multiway star join: fact ⋈ 3 broadcast dims.
    All three dimension joins broadcast → the fact table is scanned
    once with zero join shuffles; only the final aggregate exchanges."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )


@register(
    "window_topn_per_group",
    oracle=(
        "SELECT o_custkey, o_orderkey, o_totalprice, rn FROM ("
        "SELECT o_custkey, o_orderkey, o_totalprice, "
        "ROW_NUMBER() OVER (PARTITION BY o_custkey "
        "ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) "
        "WHERE rn <= 3"
    ),
)
def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group via ROW_NUMBER window. Spark 3.5+/4.x inserts a
    WindowGroupLimit (rank-limit pushdown) so each partition keeps only
    3 rows before the final window sort — the scalable top-N idiom."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_running_sum",
    oracle=(
        "SELECT user_id, event_id, "
        "ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value "
        "FROM events WHERE user_id < 20"
    ),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) sum per user ordered by time — the sessionized
    rolling-metric idiom. ROWS frame (not RANGE) for determinism; event_id
    tie-break fixes the accumulation order across engines."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id") < 20)
        .select(
            "user_id",
            "event_id",
            F.round(F.sum("value").over(w), 4).alias("running_value"),
        )
    )


@register(
    "set_ops_customers",
    oracle=(
        "SELECT c_custkey, 'with_orders' AS bucket FROM ("
        "SELECT c_custkey FROM customer INTERSECT SELECT o_custkey FROM orders) "
        "UNION ALL "
        "SELECT c_custkey, 'without_orders' AS bucket FROM ("
        "SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders)"
    ),
)
def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL in one query — the set-op surface.
    Spark compiles INTERSECT/EXCEPT to left-semi/anti hash joins."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    with_orders = c.intersect(o).select("c_custkey", F.lit("with_orders").alias("bucket"))
    without = c.exceptAll(o.distinct()).select(
        "c_custkey", F.lit("without_orders").alias("bucket")
    )
    return with_orders.unionAll(without)


@register(
    "semi_anti_join",
    oracle=(
        "SELECT 'has_error' AS bucket, COUNT(*) AS user_cnt FROM ("
        "SELECT DISTINCT user_id FROM events e WHERE EXISTS ("
        "SELECT 1 FROM events x WHERE x.user_id = e.user_id AND x.event_type = 'error')) "
        "UNION ALL "
        "SELECT 'no_error' AS bucket, COUNT(*) AS user_cnt FROM ("
        "SELECT DISTINCT user_id FROM events e WHERE NOT EXISTS ("
        "SELECT 1 FROM events x WHERE x.user_id = e.user_id AND x.event_type = 'error'))"
    ),
)
def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi and left-anti joins (EXISTS / NOT EXISTS): users who
    ever hit an error event vs never. Both compile to hash semi-joins."""
    ev = _t(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    err_users = ev.filter(F.col("event_type") == "error").select("user_id").distinct()
    has_err = (
        users.join(err_users, "user_id", "left_semi")
        .agg(F.count(F.lit(1)).alias("user_cnt"))
        .select(F.lit("has_error").alias("bucket"), "user_cnt")
    )
    no_err = (
        users.join(err_users, "user_id", "left_anti")
        .agg(F.count(F.lit(1)).alias("user_cnt"))
        .select(F.lit("no_error").alias("bucket"), "user_cnt")
    )
    return has_err.unionAll(no_err)


@register(
    "distinct_pairs",
    oracle=(
        "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"
    ),
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over a composite key — partial-aggregate dedup before
    the shuffle (HashAggregate keys=[l_returnflag, l_linestatus])."""
    return _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@register(
    "shipping_priority_top10",
    oracle=(
        "SELECT l.l_orderkey, "
        "ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue, "
        "o.o_orderdate FROM customer c "
        "JOIN orders o ON c.c_custkey = o.o_custkey "
        "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
        "WHERE c.c_mktsegment = 'BUILDING' "
        "GROUP BY l.l_orderkey, o.o_orderdate "
        "ORDER BY revenue DESC, l_orderkey LIMIT 10"
    ),
)
def shipping_priority_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style shipping priority: selective dim filter →
    broadcast semi-reduction of orders → fact join → agg → global
    top-10 (TakeOrderedAndProject, no full result sort)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )
