"""TPC-DS-shaped queries — the decision-support shapes the reference's
spec planned but never implemented (`ICEBERG-Interoperability-Test-
Spec.md:43` names a TPC-DS subset as future scope).

TPC-DS differs from TPC-H in two signature patterns, both exercised
here against the TPC-H-ish fixture tables:

- **date-dimension join**: facts join a generated calendar dimension
  and filter/aggregate on its ATTRIBUTES (year, quarter, weekday) —
  not on raw fact timestamps. The dimension is generated, broadcast,
  and kilobyte-sized at any fact scale.
- **grouping sets + window over the aggregate**: multi-grain rollups
  whose cells then feed an ordered analytic (here a 3-month moving
  average) — the report-table shape. The window input is |groups|
  rows, never raw facts.

Scale notes (100 TB facts): both queries shuffle raw volume exactly
once (the partial aggregate); the calendar join is a broadcast hash
join with the dimension generated driver-free via ``sequence()``;
revenue is kept in integer cents through every delta so the moving
average is bit-identical across engines (the measured fp-drift
lesson from mv_incremental_maintenance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register


@register(
    "tpcds_returned_ratio_by_date",
    oracle=(
        # Calendar dimension generated in SQL; weekday-only cells.
        # DuckDB dow: 0=Sun..6=Sat (Spark dayofweek is 1=Sun..7=Sat).
        "WITH date_dim AS (SELECT d AS d_date, "
        "CAST(EXTRACT(year FROM d) AS BIGINT) AS d_year, "
        "CAST(EXTRACT(quarter FROM d) AS BIGINT) AS d_qoy "
        "FROM (SELECT unnest(generate_series(DATE '1995-01-01', "
        "DATE '2001-12-31', INTERVAL 1 DAY))::DATE AS d) "
        "WHERE EXTRACT(dow FROM d) NOT IN (0, 6)) "
        "SELECT d_year, d_qoy, "
        "CAST(COUNT(*) AS BIGINT) AS n_items, "
        "CAST(ROUND(SUM(CASE WHEN l_returnflag = 'R' "
        "THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2) AS DOUBLE) "
        "AS returned_amt, "
        "CAST(ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE) "
        "AS total_amt, "
        "ROUND(SUM(CASE WHEN l_returnflag = 'R' "
        "THEN l_extendedprice * (1 - l_discount) ELSE 0 END) "
        "/ SUM(l_extendedprice * (1 - l_discount)), 4) AS return_ratio "
        "FROM lineitem JOIN date_dim ON CAST(l_shipdate AS DATE) = d_date "
        "GROUP BY d_year, d_qoy"
    ),
)
def tpcds_returned_ratio_by_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-to-sold revenue ratio by (year, quarter), weekday
    shipments only — the TPC-DS catalog-returns shape (e.g. Q40/Q77's
    returns-vs-sales ratios driven through date_dim attributes).

    Plan shape: the calendar dimension is GENERATED (``sequence()``
    exploded from literals — zero scans), filtered to weekdays, and
    broadcast; lineitem partial-aggregates per (year, quarter) after
    the broadcast hash join, so the only wide exchange carries ≤
    |years|×4 partial rows per task. At 100 TB the dimension is still
    ~2.5k rows — the join never shuffles the fact side, and the
    weekday predicate lives on the dimension, where TPC-DS puts it."""
    dd = (
        spark.range(1)
        .select(
            F.explode(
                F.expr(
                    "sequence(DATE'1995-01-01', DATE'2001-12-31', interval 1 day)"
                )
            ).alias("d_date")
        )
        .filter(~F.dayofweek("d_date").isin(1, 7))  # 1=Sun, 7=Sat
        .select(
            "d_date",
            F.year("d_date").cast("bigint").alias("d_year"),
            F.quarter("d_date").cast("bigint").alias("d_qoy"),
        )
    )
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_shipdate", "l_returnflag", "l_extendedprice", "l_discount"
    )
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ret = F.when(F.col("l_returnflag") == "R", net).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(dd), F.to_date("l_shipdate") == F.col("d_date"))
        .groupBy("d_year", "d_qoy")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(ret), 2).cast("double").alias("returned_amt"),
            F.round(F.sum(net), 2).cast("double").alias("total_amt"),
            F.round(F.sum(ret) / F.sum(net), 4).alias("return_ratio"),
        )
    )


@register(
    "tpcds_rollup_rolling_sales",
    oracle=(
        # Two grains in one pass — (nation, month) and (month) — then
        # a 3-month moving average per scope over the aggregate rows.
        # Revenue stays in integer cents until the final display
        # division, so the window math is exact on both engines.
        "WITH monthly AS (SELECT n_name, "
        "date_trunc('month', CAST(o_orderdate AS TIMESTAMP)) AS sales_month, "
        "SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_cents, "
        "COUNT(*) AS n_orders "
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "GROUP BY GROUPING SETS ((n_name, sales_month), (sales_month))) "
        "SELECT COALESCE(n_name, 'ALL') AS scope, sales_month, "
        "CAST(n_orders AS BIGINT) AS n_orders, "
        "ROUND(rev_cents / 100.0, 2) AS revenue, "
        # integer window-sum // window-count: floor-to-cent average,
        # immune to the half-even/half-up ROUND divergence on .5 cents
        "ROUND((SUM(rev_cents) OVER (PARTITION BY COALESCE(n_name, 'ALL') "
        "ORDER BY sales_month ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) "
        "// COUNT(*) OVER (PARTITION BY COALESCE(n_name, 'ALL') "
        "ORDER BY sales_month ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) "
        "/ 100.0, 2) AS revenue_3mo "
        "FROM monthly"
    ),
)
def tpcds_rollup_rolling_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue by nation at two grains (per-nation and
    all-nations) with a 3-month moving average per scope — the TPC-DS
    store-sales report shape (grouping sets feeding an ordered window,
    cf. Q36's rollup + rank-within-parent).

    Plan shape: orders ⋈ customer is a custkey-keyed hash join (the
    customer "dimension" scales with the fact table — 1.5B rows at
    100 TB — so it is NOT broadcast; AQE may still pick broadcast at
    small SF), nation IS broadcast (25 rows at any scale), then ONE
    shuffled aggregate expands both grouping sets (Expand +
    HashAggregate — one scan feeds every grain); the moving-average
    window sorts |nations+1| × |months| aggregate rows, thousands at
    any fact scale. Revenue is summed as integer cents so the window
    average divides identical integers on both engines."""
    od = load_table(spark, "orders", sf_dir).select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    cu = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    na = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .createOrReplaceTempView("_tpcds_sales")
    )
    return spark.sql(
        "WITH monthly AS (SELECT n_name, "
        "date_trunc('month', o_orderdate) AS sales_month, "
        "SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_cents, "
        "COUNT(*) AS n_orders "
        "FROM _tpcds_sales "
        "GROUP BY GROUPING SETS ((n_name, date_trunc('month', o_orderdate)), "
        "(date_trunc('month', o_orderdate)))) "
        "SELECT COALESCE(n_name, 'ALL') AS scope, sales_month, "
        "n_orders, "
        # 100e0 not 100.0: Spark types the latter DECIMAL, which would
        # leak a decimal column where the oracle has DOUBLE
        "ROUND(rev_cents / 100e0, 2) AS revenue, "
        # integer window-sum DIV window-count: floor-to-cent average,
        # immune to the half-even/half-up ROUND divergence on .5 cents
        "ROUND((SUM(rev_cents) OVER (PARTITION BY COALESCE(n_name, 'ALL') "
        "ORDER BY sales_month ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) "
        "DIV COUNT(*) OVER (PARTITION BY COALESCE(n_name, 'ALL') "
        "ORDER BY sales_month ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) "
        "/ 100e0, 2) AS revenue_3mo "
        "FROM monthly"
    )


@register(
    "tpcds_channel_union",
    oracle=(
        # Two channels aggregated INDEPENDENTLY per (year) against the
        # same generated calendar, unioned as cells, then ROLLUP over
        # (channel, year) — revenue in integer cents end-to-end so
        # every grain re-sums exactly.
        "WITH date_dim AS (SELECT d AS d_date, "
        "CAST(EXTRACT(year FROM d) AS BIGINT) AS d_year "
        "FROM (SELECT unnest(generate_series(DATE '1995-01-01', "
        "DATE '1997-12-31', INTERVAL 1 DAY))::DATE AS d)), "
        "store AS (SELECT 'store' AS channel, d_year, "
        "COUNT(*) AS n, SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents "
        "FROM orders JOIN date_dim ON CAST(o_orderdate AS DATE) = d_date "
        "GROUP BY d_year), "
        "catalog AS (SELECT 'catalog' AS channel, d_year, "
        "COUNT(*) AS n, "
        "SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) "
        "AS cents "
        "FROM lineitem JOIN date_dim ON CAST(l_shipdate AS DATE) = d_date "
        "GROUP BY d_year), "
        "cells AS (SELECT * FROM store UNION ALL SELECT * FROM catalog) "
        "SELECT COALESCE(channel, 'ALL') AS channel, "
        "COALESCE(d_year, 0) AS d_year, "
        "CAST(SUM(n) AS BIGINT) AS n_sales, "
        "ROUND(SUM(cents) / 100.0, 2) AS revenue "
        "FROM cells GROUP BY ROLLUP (channel, d_year)"
    ),
)
def tpcds_channel_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-channel UNION report — the TPC-DS cross-channel template
    (Q5/Q77's store/catalog/web union): each sales "channel" (orders
    as the store channel, lineitem net revenue as the catalog channel)
    aggregates INDEPENDENTLY against one shared generated calendar
    dimension, the per-channel cells union, and a ROLLUP over
    (channel, year) produces per-channel-year, per-channel, and
    grand-total grains.

    Plan shape — the scale-critical property is that the UNION happens
    AFTER each channel's aggregate: each fact table is scanned once,
    broadcast-joins the kilobyte calendar, and partial-aggregates down
    to ≤ |years| rows before its single wide exchange — so the union
    carries a handful of cells, never raw facts, and the rollup's
    Expand runs over |channels|×|years| rows. The naive TPC-DS
    rendering (union the raw channels, then aggregate) would shuffle
    the combined 100 TB fact volume through one exchange; this shape
    shuffles each channel's partial rows only. Revenue stays integer
    cents through every grain (the fp-drift lesson from
    mv_incremental_maintenance)."""
    dd = (
        spark.range(1)
        .select(
            F.explode(
                F.expr(
                    "sequence(DATE'1995-01-01', DATE'1997-12-31', interval 1 day)"
                )
            ).alias("d_date")
        )
        .select("d_date", F.year("d_date").cast("bigint").alias("d_year"))
    )
    od = load_table(spark, "orders", sf_dir).select("o_orderdate", "o_totalprice")
    store = (
        od.join(F.broadcast(dd), F.to_date("o_orderdate") == F.col("d_date"))
        .groupBy("d_year")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents"),
        )
        .select(F.lit("store").alias("channel"), "d_year", "n", "cents")
    )
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_shipdate", "l_extendedprice", "l_discount"
    )
    net_cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    catalog = (
        li.join(F.broadcast(dd), F.to_date("l_shipdate") == F.col("d_date"))
        .groupBy("d_year")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(net_cents).alias("cents"))
        .select(F.lit("catalog").alias("channel"), "d_year", "n", "cents")
    )
    cells = store.unionByName(catalog)
    return (
        cells.rollup("channel", "d_year")
        .agg(
            F.sum("n").cast("bigint").alias("n_sales"),
            # 100e0 keeps the division DOUBLE (100.0 would type DECIMAL)
            F.round(F.sum("cents") / F.lit(100e0), 2).alias("revenue"),
        )
        .select(
            F.coalesce("channel", F.lit("ALL")).alias("channel"),
            F.coalesce("d_year", F.lit(0)).cast("bigint").alias("d_year"),
            "n_sales",
            "revenue",
        )
    )


@register(
    "tpcds_star_join_multi_dim",
    oracle=(
        # Every predicate lives on a DIMENSION (part type, supplier
        # region, calendar year+weekday) — the fact carries none. The
        # TPC-DS Q7/Q42 star shape over the TPC-H-ish fixtures.
        "WITH date_dim AS (SELECT d AS d_date, "
        "CAST(EXTRACT(quarter FROM d) AS BIGINT) AS d_qoy "
        "FROM (SELECT unnest(generate_series(DATE '1997-01-01', "
        "DATE '1997-12-31', INTERVAL 1 DAY))::DATE AS d) "
        "WHERE EXTRACT(dow FROM d) NOT IN (0, 6)), "
        "euro_s AS (SELECT s_suppkey FROM supplier "
        "JOIN nation ON s_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE') "
        "SELECT d_qoy, p_brand, "
        "CAST(COUNT(*) AS BIGINT) AS n_items, "
        "CAST(SUM(l_quantity) AS BIGINT) AS sum_qty, "
        "ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) "
        "AS BIGINT)) / 100.0, 2) AS revenue "
        "FROM lineitem "
        "JOIN date_dim ON CAST(l_shipdate AS DATE) = d_date "
        "JOIN part ON l_partkey = p_partkey "
        "JOIN euro_s ON l_suppkey = s_suppkey "
        "WHERE p_type = 'STANDARD' "
        "GROUP BY d_qoy, p_brand ORDER BY d_qoy, p_brand"
    ),
)
def tpcds_star_join_multi_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimension star join, TPC-DS Q7/Q42 shape: 1997-weekday
    sales of STANDARD parts through EUROPE suppliers, per (quarter,
    brand). The signature property TPC-H lacks: EVERY predicate lives
    on a dimension — year+weekday on the generated calendar, type on
    part, region on the supplier snowflake — and the fact is pruned
    purely through broadcast hash/semi joins.

    Plan shape at 100 TB: three broadcasts (calendar ~260 rows, the
    filtered part dim, the region-filtered supplier keys as a
    LEFT SEMI — it contributes no columns), all applied BEFORE the
    single wide exchange, which carries only (quarter, brand) partial
    rows. No fact-side filter, no SortMergeJoin, one shuffle.
    Revenue sums integer cents so every engine re-adds exactly."""
    dd = (
        spark.range(1)
        .select(
            F.explode(
                F.expr(
                    "sequence(DATE'1997-01-01', DATE'1997-12-31', interval 1 day)"
                )
            ).alias("d_date")
        )
        .filter(~F.dayofweek("d_date").isin(1, 7))
        .select("d_date", F.quarter("d_date").cast("bigint").alias("d_qoy"))
    )
    p = (
        load_table(spark, "part", sf_dir)
        .filter(F.col("p_type") == "STANDARD")
        .select("p_partkey", "p_brand")
    )
    euro_s = (
        load_table(spark, "supplier", sf_dir)
        .join(
            F.broadcast(
                load_table(spark, "nation", sf_dir).join(
                    F.broadcast(
                        load_table(spark, "region", sf_dir).filter(
                            F.col("r_name") == "EUROPE"
                        )
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_shipdate", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount",
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    return (
        li.join(F.broadcast(dd), F.to_date("l_shipdate") == F.col("d_date"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(euro_s), F.col("l_suppkey") == F.col("s_suppkey"),
              "left_semi")
        .groupBy("d_qoy", "p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("l_quantity").cast("bigint").alias("sum_qty"),
            F.round(F.sum(cents) / F.lit(100e0), 2).alias("revenue"),
        )
        .orderBy("d_qoy", "p_brand")
    )


@register(
    "tpcds_rank_within_parent",
    oracle=(
        # TPC-DS Q36's lochierarchy + rank-within-parent over a ROLLUP:
        # revenue per (region, nation) at three grains, each cell
        # ranked against its SIBLINGS under the same parent.
        "WITH cells AS (SELECT "
        "CASE WHEN GROUPING(r_name) = 0 THEN r_name END AS r_name, "
        "CASE WHEN GROUPING(n_name) = 0 THEN n_name END AS n_name, "
        "SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents, "
        "CAST(GROUPING(r_name) + GROUPING(n_name) AS BIGINT) AS lochierarchy "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "GROUP BY ROLLUP (r_name, n_name)) "
        "SELECT COALESCE(r_name, 'ALL') AS r_name, "
        "COALESCE(n_name, 'ALL') AS n_name, "
        "ROUND(cents / 100.0, 2) AS revenue, lochierarchy, "
        "CAST(RANK() OVER (PARTITION BY lochierarchy, "
        "CASE WHEN lochierarchy = 0 THEN r_name END "
        "ORDER BY cents DESC) AS BIGINT) AS rank_within_parent "
        "FROM cells "
        "ORDER BY lochierarchy DESC, r_name, rank_within_parent, n_name"
    ),
)
def tpcds_rank_within_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q36: rollup revenue over the (region, nation) hierarchy,
    then RANK each cell against its siblings under the same parent —
    the ``lochierarchy`` pattern (``GROUPING(a)+GROUPING(b)`` selects
    the grain; the window partitions on (grain, parent)).

    Plan shape: customer is fact-sized so orders ⋈ customer stays a
    key-hash join (AQE may broadcast at small SF); nation and region
    broadcast; ONE Expand + shuffled aggregate produces all three
    grains, and the rank window sorts |regions|+|nations|+1 aggregate
    ROWS — never facts. Revenue in integer cents; ranks compare
    integers, so ties are engine-independent."""
    od = load_table(spark, "orders", sf_dir).select("o_custkey", "o_totalprice")
    cu = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    na = load_table(spark, "nation", sf_dir).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    re = load_table(spark, "region", sf_dir).select("r_regionkey", "r_name")
    (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .createOrReplaceTempView("_tpcds_rwp")
    )
    return spark.sql(
        "WITH cells AS (SELECT "
        "CASE WHEN GROUPING(r_name) = 0 THEN r_name END AS r_name, "
        "CASE WHEN GROUPING(n_name) = 0 THEN n_name END AS n_name, "
        "SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents, "
        "CAST(GROUPING(r_name) + GROUPING(n_name) AS BIGINT) AS lochierarchy "
        "FROM _tpcds_rwp GROUP BY ROLLUP (r_name, n_name)) "
        "SELECT COALESCE(r_name, 'ALL') AS r_name, "
        "COALESCE(n_name, 'ALL') AS n_name, "
        # 100e0 keeps the division DOUBLE (100.0 would type DECIMAL)
        "ROUND(cents / 100e0, 2) AS revenue, lochierarchy, "
        "CAST(RANK() OVER (PARTITION BY lochierarchy, "
        "CASE WHEN lochierarchy = 0 THEN r_name END "
        "ORDER BY cents DESC) AS BIGINT) AS rank_within_parent "
        "FROM cells "
        "ORDER BY lochierarchy DESC, r_name, rank_within_parent, n_name"
    )


def _q88_band_preds() -> list[tuple[int, int]]:
    """Eight disjoint l_quantity bands, [1..6], [7..12], … [43..48]."""
    return [(1 + 6 * i, 6 + 6 * i) for i in range(8)]


# The OR-triple every band shares (Q88 applies one household predicate
# to all eight time bands; here: a discount OR tax OR returnflag mix).
_Q88_COMMON = (
    "(l_discount BETWEEN 0.00 AND 0.03 "
    "OR l_tax BETWEEN 0.04 AND 0.06 "
    "OR l_returnflag = 'A')"
)


@register(
    "tpcds_multi_band_counts",
    oracle=(
        # The LITERAL TPC-DS Q88 spelling: eight independent scalar
        # subqueries — eight fact scans — cross-joined into one row.
        # The Spark side computes the same row from ONE scan; the
        # oracle proves the single-scan rewrite is answer-equal to
        # the eight-scan spelling.
        "SELECT * FROM "
        + ", ".join(
            f"(SELECT CAST(COUNT(*) AS BIGINT) AS band{i + 1}_cnt "
            f"FROM lineitem WHERE l_quantity BETWEEN {lo} AND {hi} "
            f"AND {_Q88_COMMON})"
            for i, (lo, hi) in enumerate(_q88_band_preds())
        )
    ),
)
def tpcds_multi_band_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q88: eight band counts the benchmark spells as eight
    scalar subqueries (s1..s8 cross-joined — eight full fact scans),
    collapsed into ONE scan with conditional aggregation.

    Plan shape: a single lineitem FileScan with the union quantity
    range (1..48) pushed to the parquet reader, one partial+final
    aggregate carrying eight SUM(CASE) counters — 8 longs per task.
    At 100 TB the literal spelling reads the fact eight times; this
    plan reads it once and shuffles 8 integers. The oracle runs the
    literal eight-subquery form, so the rewrite's answer equality is
    part of the correctness gate, not an assumption."""
    bands = _q88_band_preds()
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_quantity", "l_discount", "l_tax", "l_returnflag"
    )
    common = (
        F.col("l_discount").between(0.00, 0.03)
        | F.col("l_tax").between(0.04, 0.06)
        | (F.col("l_returnflag") == "A")
    )
    pruned = li.filter(
        F.col("l_quantity").between(bands[0][0], bands[-1][1]) & common
    )
    return pruned.agg(
        *[
            F.sum(
                F.when(F.col("l_quantity").between(lo, hi), 1).otherwise(0)
            )
            .cast("bigint")
            .alias(f"band{i + 1}_cnt")
            for i, (lo, hi) in enumerate(bands)
        ]
    )


@register(
    "tpcds_cumulative_channel_crossover",
    oracle=(
        # Q51: per-channel cumulative series, FULL OUTER joined on the
        # (group, month) spine, running-MAX carried over the joined
        # (null-holed) series, crossover rows reported. Integer cents
        # end-to-end.
        "WITH base AS (SELECT l_returnflag AS rf, "
        "CAST(EXTRACT(year FROM l_shipdate) * 12 "
        "+ EXTRACT(month FROM l_shipdate) AS BIGINT) AS m, "
        "l_orderkey, "
        "CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) AS cents "
        "FROM lineitem), "
        "webc AS (SELECT rf, m, SUM(web_cents) OVER "
        "(PARTITION BY rf ORDER BY m ROWS UNBOUNDED PRECEDING) AS web_cume "
        "FROM (SELECT rf, m, SUM(cents) AS web_cents FROM base "
        "WHERE l_orderkey % 2 = 0 GROUP BY rf, m)), "
        "storec AS (SELECT rf, m, SUM(store_cents) OVER "
        "(PARTITION BY rf ORDER BY m ROWS UNBOUNDED PRECEDING) AS store_cume "
        "FROM (SELECT rf, m, SUM(cents) AS store_cents FROM base "
        "WHERE l_orderkey % 2 = 1 GROUP BY rf, m)), "
        "x AS (SELECT COALESCE(w.rf, s.rf) AS rf, COALESCE(w.m, s.m) AS m, "
        "w.web_cume, s.store_cume "
        "FROM webc w FULL OUTER JOIN storec s ON w.rf = s.rf AND w.m = s.m), "
        "y AS (SELECT rf, m, "
        "MAX(web_cume) OVER (PARTITION BY rf ORDER BY m "
        "ROWS UNBOUNDED PRECEDING) AS web_run, "
        "MAX(store_cume) OVER (PARTITION BY rf ORDER BY m "
        "ROWS UNBOUNDED PRECEDING) AS store_run FROM x) "
        "SELECT rf, m, ROUND(web_run / 100.0, 2) AS web_cumulative, "
        "ROUND(store_run / 100.0, 2) AS store_cumulative "
        "FROM y WHERE web_run > store_run"
    ),
)
def tpcds_cumulative_channel_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q51 shape — WINDOW OVER A JOIN OF AGGREGATES: two sales
    channels (even vs odd order keys — the fixture's stand-in for web
    vs store; near-equal halves, so the series genuinely cross, unlike
    a line-number split where line 1 exists in every order and one
    channel dominates forever) each aggregate to a
    per-(returnflag, month) cumulative series, the two series FULL
    OUTER join on their (group, month) spine (either channel may skip
    a month), a running MAX carries each channel's last-seen
    cumulative across the other channel's null holes, and the report
    keeps the crossover rows where the web series has overtaken the
    store series.

    Plan shape (r13 rewrite — ONE fact pass): a single CONDITIONAL
    aggregate builds both channels' (rf, month) cells in one scan —
    ``SUM(CASE WHEN <channel> THEN cents END)`` with NO else, so a
    month where a channel sold nothing holds NULL, not 0 — and one
    running window SUM per channel reproduces the oracle's FULL OUTER
    spine + running-MAX carry EXACTLY: window SUM skips NULLs (the
    carried cumulative over a channel's silent months) and is NULL
    until the channel's first sale, which is precisely when the
    oracle's running MAX over the null-holed joined series is NULL.
    The r9 rendering paid two channel-filtered fact scans + a
    full-outer join; this one halves the fact I/O and drops the join
    while returning the identical result (the oracle SQL is
    unchanged — the equivalence IS the pinned claim). The windows run
    over ≤ |rf×month| cells, never raw facts; integer cents
    end-to-end so every cumulative re-sums exactly (the
    mv_incremental_maintenance fp-drift lesson)."""
    from pyspark.sql import Window as W

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_returnflag", "l_shipdate", "l_orderkey",
        "l_extendedprice", "l_discount",
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    cells = (
        li.select(
            F.col("l_returnflag").alias("rf"),
            (F.year("l_shipdate") * 12 + F.month("l_shipdate"))
            .cast("bigint").alias("m"),
            F.when(F.col("l_orderkey") % 2 == 0, cents).alias("web_c"),
            F.when(F.col("l_orderkey") % 2 == 1, cents).alias("store_c"),
        )
        .groupBy("rf", "m")
        .agg(F.sum("web_c").alias("web_cents"),
             F.sum("store_c").alias("store_cents"))
    )
    cume = W.partitionBy("rf").orderBy("m").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        cells.select(
            "rf", "m",
            F.sum("web_cents").over(cume).alias("web_run"),
            F.sum("store_cents").over(cume).alias("store_run"),
        )
        .filter(F.col("web_run") > F.col("store_run"))
        .select(
            "rf", "m",
            F.round(F.col("web_run") / F.lit(100e0), 2).alias("web_cumulative"),
            F.round(F.col("store_run") / F.lit(100e0), 2).alias("store_cumulative"),
        )
    )


@register(
    "tpcds_topn_over_rollup",
    oracle=(
        # Q67: rank WITHIN each returnflag over ALL its rollup grains
        # (month / year / flag-total cells compete in one ranking),
        # top-5 kept; grand-total rows rank in their own 'ALL' bucket.
        # Integer cents end-to-end; rank ties are engine-identical.
        "WITH cells AS ("
        "SELECT l_returnflag AS rf, "
        "CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS y, "
        "CAST(EXTRACT(month FROM l_shipdate) AS BIGINT) AS m, "
        "SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) "
        "AS cents "
        "FROM lineitem GROUP BY ROLLUP (l_returnflag, y, m)), "
        "ranked AS (SELECT COALESCE(rf, 'ALL') AS rf, "
        "COALESCE(y, 0) AS y, COALESCE(m, 0) AS m, cents, "
        "RANK() OVER (PARTITION BY COALESCE(rf, 'ALL') "
        "ORDER BY cents DESC) AS rk FROM cells) "
        "SELECT rf, y, m, ROUND(cents / 100.0, 2) AS sales, rk "
        "FROM ranked WHERE rk <= 5"
    ),
)
def tpcds_topn_over_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q67 shape — TOP-N OVER A GROUPING-SETS ROLLUP: one pass
    aggregates every grain of (returnflag, year, month) via ROLLUP,
    then a rank window WITHIN each returnflag lets its month cells,
    year cells and flag-total compete in one ranking; the report keeps
    the top 5 per flag (the "which grains dominate" drill-down shape).

    Plan shape — AGGREGATE-BEFORE-WINDOW with rank-limit pushdown: the
    fact shuffles once into the rollup's Expand+aggregate, so the rank
    window sees |grains| cells, never raw rows, and Spark's
    WindowGroupLimit keeps only each partition's running top-5 on the
    map side of the window sort — at 100 TB the window input is
    hundreds of rows and the limit bounds even that. Integer cents
    end-to-end; RANK ties resolve identically on both engines."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_returnflag", "l_shipdate", "l_extendedprice", "l_discount"
    )
    from pyspark.sql import Window as W

    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    cells = (
        li.select(
            F.col("l_returnflag").alias("rf"),
            F.year("l_shipdate").cast("bigint").alias("y"),
            F.month("l_shipdate").cast("bigint").alias("m"),
            cents.alias("c"),
        )
        .rollup("rf", "y", "m")
        .agg(F.sum("c").alias("cents"))
        .select(
            F.coalesce("rf", F.lit("ALL")).alias("rf"),
            F.coalesce("y", F.lit(0)).cast("bigint").alias("y"),
            F.coalesce("m", F.lit(0)).cast("bigint").alias("m"),
            "cents",
        )
    )
    ranked = cells.withColumn(
        "rk", F.rank().over(W.partitionBy("rf").orderBy(F.col("cents").desc()))
    )
    return ranked.filter(F.col("rk") <= 5).select(
        "rf", "y", "m",
        F.round(F.col("cents") / F.lit(100e0), 2).alias("sales"),
        F.col("rk").cast("bigint").alias("rk"),
    )


@register(
    "tpcds_frequent_buyer_segments",
    oracle=(
        # Q34/Q73: HAVING on the grouped fact FIRST, dim join for
        # reporting AFTER — the aggregate+filter reduce orders to a
        # small per-customer summary before any customer attribute is
        # touched. Integer cents; deterministic top-100 report.
        "WITH freq AS ("
        "  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders, "
        "         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) "
        "              AS BIGINT) AS spend_cents "
        "  FROM orders GROUP BY o_custkey "
        "  HAVING COUNT(*) BETWEEN 12 AND 40"
        ") "
        "SELECT c.c_name, c.c_mktsegment, f.n_orders, "
        "ROUND(f.spend_cents / 100.0, 2) AS total_spend "
        "FROM freq f JOIN customer c ON c.c_custkey = f.o_custkey "
        "ORDER BY f.n_orders DESC, f.spend_cents DESC, c.c_name "
        "LIMIT 100"
    ),
)
def tpcds_frequent_buyer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q34/Q73 shape — HAVING ON THE GROUPED FACT, THEN the dim
    join for reporting: customers are grouped and band-filtered on
    their order COUNT (12–40, the fixture's stand-in for Q73's ticket
    band) entirely on the fact side; only the survivors join customer
    for name/segment reporting, ordered by frequency.

    Plan shape — the scale-critical property is the same
    AGGREGATE-BEFORE-JOIN as Q51's: the orders scan partial-aggregates
    to one row per customer and the HAVING band cuts that BEFORE the
    reporting join, so the join input is the qualified-customer set,
    never raw orders (the naive rendering joins 100 TB of orders to
    customers first and aggregates the joined width). The report is a
    TakeOrdered top-100 (per-partition heaps), and spend stays in
    integer cents so ties break identically across engines
    (plan-pinned in test_plan_hygiene.py)."""
    orders = load_table(spark, "orders", sf_dir).select(
        "o_custkey", "o_totalprice")
    freq = (
        orders.groupBy("o_custkey")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint").alias("spend_cents"),
        )
        .filter(F.col("n_orders").between(12, 40))
    )
    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_name", "c_mktsegment")
    return (
        freq.join(cust, freq["o_custkey"] == cust["c_custkey"])
        .orderBy(F.desc("n_orders"), F.desc("spend_cents"), "c_name")
        .limit(100)
        .select(
            "c_name", "c_mktsegment", "n_orders",
            F.round(F.col("spend_cents") / F.lit(100e0), 2)
            .alias("total_spend"),
        )
    )


@register(
    "tpcds_net_after_returns",
    oracle=(
        # Q93: sales LEFT JOIN returns on the line key, net value via
        # COALESCE, then the per-entity sum and an ASC report. The
        # returns side is the flagged slice of the fact (partial
        # return: half the revenue, half the quantity), so the
        # arithmetic is non-trivial and the join genuinely outer.
        "WITH sales AS ("
        "  SELECT l_orderkey, l_linenumber, l_suppkey, l_quantity, "
        "         CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) "
        "              AS BIGINT) AS sale_cents "
        "  FROM lineitem"
        "), returns AS ("
        "  SELECT l_orderkey, l_linenumber, "
        "         CAST(FLOOR(l_quantity / 2) AS BIGINT) AS ret_qty, "
        "         CAST(ROUND(l_extendedprice * (1 - l_discount) * 50) "
        "              AS BIGINT) AS ret_cents "
        "  FROM lineitem WHERE l_returnflag = 'R'"
        ") "
        "SELECT s_name, CAST(COUNT(*) AS BIGINT) AS n_lines, "
        "CAST(SUM(CAST(s.l_quantity AS BIGINT) "
        "         - COALESCE(r.ret_qty, 0)) AS BIGINT) AS net_qty, "
        "ROUND(SUM(s.sale_cents - COALESCE(r.ret_cents, 0)) / 100.0, 2) "
        "AS net_paid "
        "FROM sales s "
        "LEFT JOIN returns r ON s.l_orderkey = r.l_orderkey "
        "AND s.l_linenumber = r.l_linenumber "
        "JOIN supplier ON s_suppkey = s.l_suppkey "
        "GROUP BY s_name "
        "ORDER BY net_paid ASC, s_name LIMIT 100"
    ),
)
def tpcds_net_after_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q93 shape — NET REVENUE AFTER RETURNS via a left join +
    COALESCE: every sale line left-joins its (possible) return on the
    line key, nets quantity and paid amount with COALESCE(…, 0), sums
    per supplier, and reports the bottom-100 ascending (Q93's "who is
    hurt most by returns" ordering). Returns are the R-flagged slice
    with a PARTIAL return (half quantity, half revenue — one rounding,
    no per-unit division) so the outer arithmetic is non-trivial.

    Plan shape at 100 TB: the returns side carries its flag filter IN
    THE SCAN (PushedFilters — it reads ~25% of the fact, and only 4 of
    its columns), the sales↔returns join shuffles both sides ONCE on
    the line key (the one unavoidable fact-fact exchange — Q93's
    defining cost), the per-supplier aggregate partial-combines before
    its exchange, and the supplier name join is a broadcast. The
    report is a TakeOrdered top-100. Pinned in test_plan_hygiene.py:
    returns-scan filter pushdown + aggregate below the broadcast
    reporting join."""
    li = load_table(spark, "lineitem", sf_dir)
    sale_cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    ret_cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 50
    ).cast("bigint")
    sales = li.select(
        "l_orderkey", "l_linenumber", "l_suppkey",
        F.col("l_quantity").cast("bigint").alias("qty"),
        sale_cents.alias("sale_cents"),
    )
    returns = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_linenumber",
        F.floor(F.col("l_quantity") / 2).cast("bigint").alias("ret_qty"),
        ret_cents.alias("ret_cents"),
    )
    net = (
        sales.join(returns, ["l_orderkey", "l_linenumber"], "left")
        .groupBy("l_suppkey")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum(F.col("qty") - F.coalesce("ret_qty", F.lit(0)))
            .cast("bigint").alias("net_qty"),
            F.sum(F.col("sale_cents") - F.coalesce("ret_cents", F.lit(0)))
            .alias("net_cents"),
        )
    )
    sup = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_name")
    return (
        net.join(F.broadcast(sup), net["l_suppkey"] == sup["s_suppkey"])
        .select(
            "s_name", "n_lines", "net_qty",
            F.round(F.col("net_cents") / F.lit(100e0), 2).alias("net_paid"),
        )
        .orderBy(F.asc("net_paid"), "s_name")
        .limit(100)
    )


@register(
    "tpcds_returns_above_avg_customers",
    oracle=(
        # Q1/Q30: customers whose return total exceeds 1.2× their
        # nation's average — the correlated aggregate decorrelated to
        # a join against a per-group average. Integer cents keep the
        # per-customer totals exact; the 1.2× comparison and the
        # averages are then identical doubles in both engines.
        "WITH ctr AS ("
        "  SELECT o_custkey, "
        "         CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) "
        "              * 100) AS BIGINT)) AS BIGINT) AS ret_cents "
        "  FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "  WHERE l_returnflag = 'R' GROUP BY o_custkey"
        "), ctrn AS ("
        "  SELECT ctr.ret_cents, c.c_nationkey, c.c_name "
        "  FROM ctr JOIN customer c ON c.c_custkey = ctr.o_custkey"
        "), avgs AS ("
        "  SELECT c_nationkey, AVG(ret_cents) AS avg_cents "
        "  FROM ctrn GROUP BY c_nationkey"
        ") "
        "SELECT n.n_name AS nation, t.c_name, "
        "ROUND(t.ret_cents / 100.0, 2) AS returns_amt, "
        "ROUND(a.avg_cents / 100.0, 2) AS nation_avg "
        "FROM ctrn t JOIN avgs a ON a.c_nationkey = t.c_nationkey "
        "JOIN nation n ON n.n_nationkey = t.c_nationkey "
        "WHERE t.ret_cents > 1.2 * a.avg_cents "
        "ORDER BY nation, returns_amt DESC, t.c_name LIMIT 100"
    ),
)
def tpcds_returns_above_avg_customers(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    """TPC-DS Q1/Q30 shape — PER-ENTITY TOTAL vs PER-GROUP AVERAGE:
    the classic correlated subquery ("customers whose returns exceed
    1.2× the average returns of their state") DECORRELATED into a
    per-group aggregate joined back below the reporting projection.

    Plan shape at 100 TB: the R-flag filter reaches the lineitem scan;
    returns join orders ONCE on the order key (the one fact-fact
    exchange) and partial-aggregate to one row per customer; customer
    attributes come from a broadcast dim join; the nation averages are
    |nations| rows computed FROM the per-customer aggregate (never
    from raw facts) and broadcast back — the naive rendering re-scans
    the fact per outer row. Report is a TakeOrdered top-100.
    Plan-pinned: per-customer aggregate below the reporting join, the
    average side fed by the aggregate, broadcast joins for dims."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    ctr = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", cents.alias("cents"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum("cents").cast("bigint").alias("ret_cents"))
    )
    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_name", "c_nationkey")
    ctrn = ctr.join(F.broadcast(cust),
                    ctr["o_custkey"] == cust["c_custkey"]).select(
        "ret_cents", "c_nationkey", "c_name")
    avgs = ctrn.groupBy("c_nationkey").agg(
        F.avg("ret_cents").alias("avg_cents"))
    nation = load_table(spark, "nation", sf_dir).select(
        "n_nationkey", "n_name")
    return (
        ctrn.join(F.broadcast(avgs.withColumnRenamed("c_nationkey", "ak")),
                  F.col("c_nationkey") == F.col("ak"))
        .filter(F.col("ret_cents") > 1.2 * F.col("avg_cents"))
        .join(F.broadcast(nation),
              F.col("n_nationkey") == F.col("c_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            "c_name",
            F.round(F.col("ret_cents") / F.lit(100e0), 2)
            .alias("returns_amt"),
            F.round(F.col("avg_cents") / F.lit(100e0), 2)
            .alias("nation_avg"),
        )
        .orderBy("nation", F.desc("returns_amt"), "c_name")
        .limit(100)
    )


@register(
    "tpcds_weekly_yoy_ratio",
    oracle=(
        # Q59: week-over-week (year-over-year) sales ratio via a
        # SELF-JOIN ON THE WEEK INDEX — of aggregate cells, never raw
        # facts. Weeks count from Monday 1992-01-06; the YoY partner
        # is week+52. Integer cents; the ratio is then the same
        # double in both engines.
        "WITH wk AS ("
        "  SELECT o_orderpriority AS prio, "
        "         CAST(FLOOR((CAST(o_orderdate AS DATE) "
        "              - DATE '1992-01-06') / 7) AS BIGINT) AS week_seq, "
        "         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) "
        "              AS BIGINT) AS cents "
        "  FROM orders WHERE o_orderdate >= DATE '1992-01-06' "
        "  GROUP BY prio, week_seq"
        ") "
        "SELECT cur.prio, cur.week_seq, "
        "ROUND(prev.cents / 100.0, 2) AS sales_prev_year, "
        "ROUND(cur.cents / 100.0, 2) AS sales_cur, "
        "ROUND(CAST(cur.cents AS DOUBLE) / prev.cents, 4) AS yoy_ratio "
        "FROM wk cur JOIN wk prev ON prev.prio = cur.prio "
        "AND prev.week_seq = cur.week_seq - 52 "
        "ORDER BY cur.prio, cur.week_seq"
    ),
)
def tpcds_weekly_yoy_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q59 shape — WEEK-OVER-WEEK (year-over-year) sales ratio
    via a self-join on the week index: weekly sales per order
    priority, each (prio, week) cell joined to its (prio, week−52)
    partner, reporting last-year/this-year side by side with the
    ratio.

    Plan shape at 100 TB: raw orders shuffle ONCE into the weekly
    aggregate; the self-join joins CELLS (|prios| × |weeks| rows —
    kilobytes at any fact scale), and both join inputs are the SAME
    grouped exchange, so Spark reuses it (ReusedExchange, plan-pinned)
    rather than scanning the fact twice. The naive rendering
    self-joins raw facts on week arithmetic — a second full-fact
    exchange. Week index = whole weeks since Monday 1992-01-06, exact
    integer arithmetic in both engines."""
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderpriority", "o_orderdate", "o_totalprice")
    wk = (
        orders.filter(F.col("o_orderdate") >= F.lit("1992-01-06").cast("date"))
        .groupBy(
            F.col("o_orderpriority").alias("prio"),
            F.floor(
                F.datediff(F.col("o_orderdate"),
                           F.lit("1992-01-06").cast("date")) / 7
            ).cast("bigint").alias("week_seq"),
        )
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
             .cast("bigint").alias("cents"))
    )
    cur = wk.alias("cur")
    prev = wk.alias("prev")
    return (
        cur.join(
            prev,
            (F.col("prev.prio") == F.col("cur.prio"))
            & (F.col("prev.week_seq") == F.col("cur.week_seq") - 52),
        )
        .select(
            F.col("cur.prio").alias("prio"),
            F.col("cur.week_seq").alias("week_seq"),
            F.round(F.col("prev.cents") / F.lit(100e0), 2)
            .alias("sales_prev_year"),
            F.round(F.col("cur.cents") / F.lit(100e0), 2).alias("sales_cur"),
            F.round(F.col("cur.cents").cast("double") / F.col("prev.cents"),
                    4).alias("yoy_ratio"),
        )
        .orderBy("prio", "week_seq")
    )


@register(
    "tpcds_monthly_deviation_neighbors",
    oracle=(
        # Q47/Q57: months whose revenue deviates >10% from their
        # nation's yearly average, reported with the NEIGHBOR months
        # (lag/lead) — both windows run over the aggregate cell table,
        # and the neighbors are computed BEFORE the year filter so
        # December sees January of the next year. Integer cents; the
        # yearly average is the same double in both engines.
        "WITH cell AS ("
        "  SELECT c.c_nationkey, "
        "         CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr, "
        "         CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mon, "
        "         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) "
        "              AS BIGINT) AS cents "
        "  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey "
        "  GROUP BY 1, 2, 3"
        "), w AS ("
        "  SELECT c_nationkey, yr, mon, cents, "
        "         AVG(cents) OVER (PARTITION BY c_nationkey, yr) AS yr_avg, "
        "         LAG(cents) OVER (PARTITION BY c_nationkey "
        "                          ORDER BY yr, mon) AS prev_cents, "
        "         LEAD(cents) OVER (PARTITION BY c_nationkey "
        "                           ORDER BY yr, mon) AS next_cents "
        "  FROM cell"
        ") "
        "SELECT n.n_name AS nation, w.yr, w.mon, "
        "ROUND(w.cents / 100.0, 2) AS revenue, "
        "ROUND(w.yr_avg / 100.0, 2) AS yearly_avg, "
        "ROUND(w.prev_cents / 100.0, 2) AS prev_month, "
        "ROUND(w.next_cents / 100.0, 2) AS next_month "
        "FROM w JOIN nation n ON n.n_nationkey = w.c_nationkey "
        "WHERE w.yr = 1995 AND w.yr_avg > 0 "
        "AND ABS(w.cents - w.yr_avg) > 0.1 * w.yr_avg "
        "ORDER BY nation, yr, mon"
    ),
)
def tpcds_monthly_deviation_neighbors(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    """TPC-DS Q47/Q57 shape — MONTHLY DEVIATION FROM THE YEARLY
    AVERAGE, WITH NEIGHBOR MONTHS: per-(nation, month) revenue cells,
    a window average per (nation, year), lag/lead windows for the
    adjacent months, then the report keeps months deviating more than
    10% from their year's average.

    Plan shape at 100 TB: raw orders shuffle ONCE into the
    (nation, year, month) aggregate — every window (the yearly
    average, lag, lead) runs over that CELL table (|nations|×|months|
    rows, kilobytes at any fact scale), never over raw facts; the
    naive rendering windows the fact table and pays a full-fact sort
    per window frame. Customer is a broadcast dim join BELOW the
    aggregate; nation names join the filtered report rows. Neighbors
    are computed before the year filter (December's lead is next
    January), matching TPC-DS's v1_monthly ordering contract.
    Integer cents end-to-end; the 10% deviation band compares
    identical doubles in both engines."""
    orders = load_table(spark, "orders", sf_dir).select(
        "o_custkey", "o_orderdate", "o_totalprice")
    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_nationkey")
    cell = (
        orders.join(F.broadcast(cust),
                    F.col("c_custkey") == F.col("o_custkey"))
        .groupBy(
            "c_nationkey",
            F.year("o_orderdate").cast("bigint").alias("yr"),
            F.month("o_orderdate").cast("bigint").alias("mon"),
        )
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
             .cast("bigint").alias("cents"))
    )
    from pyspark.sql import Window

    by_year = Window.partitionBy("c_nationkey", "yr")
    by_seq = Window.partitionBy("c_nationkey").orderBy("yr", "mon")
    w = cell.select(
        "c_nationkey", "yr", "mon", "cents",
        F.avg("cents").over(by_year).alias("yr_avg"),
        F.lag("cents").over(by_seq).alias("prev_cents"),
        F.lead("cents").over(by_seq).alias("next_cents"),
    )
    nation = load_table(spark, "nation", sf_dir).select(
        "n_nationkey", "n_name")
    return (
        w.filter((F.col("yr") == 1995) & (F.col("yr_avg") > 0)
                 & (F.abs(F.col("cents") - F.col("yr_avg"))
                    > 0.1 * F.col("yr_avg")))
        .join(F.broadcast(nation),
              F.col("n_nationkey") == F.col("c_nationkey"))
        .select(
            F.col("n_name").alias("nation"), "yr", "mon",
            F.round(F.col("cents") / F.lit(100e0), 2).alias("revenue"),
            F.round(F.col("yr_avg") / F.lit(100e0), 2).alias("yearly_avg"),
            F.round(F.col("prev_cents") / F.lit(100e0), 2)
            .alias("prev_month"),
            F.round(F.col("next_cents") / F.lit(100e0), 2)
            .alias("next_month"),
        )
        .orderBy("nation", "yr", "mon")
    )


@register(
    "tpcds_yoy_growth_channel_compare",
    oracle=(
        # Q4/Q11: customers whose year-over-year growth in the URGENT
        # channel beats their growth in the STANDARD channel — TPC-DS
        # spells this as four CTE scans of the facts; conditional
        # aggregation computes all four cells in ONE scan. Integer
        # cents; the growth ratios divide identical integers, so the
        # comparison is the same double in both engines.
        "WITH cells AS ("
        "  SELECT o_custkey, "
        "  CAST(SUM(CASE WHEN EXTRACT(YEAR FROM o_orderdate) = 1996 "
        "       AND o_orderpriority IN ('1-URGENT', '2-HIGH') "
        "       THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) ELSE 0 END) "
        "       AS BIGINT) AS urgent_y1, "
        "  CAST(SUM(CASE WHEN EXTRACT(YEAR FROM o_orderdate) = 1997 "
        "       AND o_orderpriority IN ('1-URGENT', '2-HIGH') "
        "       THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) ELSE 0 END) "
        "       AS BIGINT) AS urgent_y2, "
        "  CAST(SUM(CASE WHEN EXTRACT(YEAR FROM o_orderdate) = 1996 "
        "       AND o_orderpriority NOT IN ('1-URGENT', '2-HIGH') "
        "       THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) ELSE 0 END) "
        "       AS BIGINT) AS std_y1, "
        "  CAST(SUM(CASE WHEN EXTRACT(YEAR FROM o_orderdate) = 1997 "
        "       AND o_orderpriority NOT IN ('1-URGENT', '2-HIGH') "
        "       THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) ELSE 0 END) "
        "       AS BIGINT) AS std_y2 "
        "  FROM orders "
        "  WHERE EXTRACT(YEAR FROM o_orderdate) IN (1996, 1997) "
        "  GROUP BY o_custkey"
        ") "
        "SELECT c.c_name, "
        "ROUND(CAST(urgent_y2 AS DOUBLE) / urgent_y1, 4) AS urgent_growth, "
        "ROUND(CAST(std_y2 AS DOUBLE) / std_y1, 4) AS std_growth "
        "FROM cells JOIN customer c ON c.c_custkey = cells.o_custkey "
        "WHERE urgent_y1 > 0 AND urgent_y2 > 0 "
        "AND std_y1 > 0 AND std_y2 > 0 "
        "AND CAST(urgent_y2 AS DOUBLE) / urgent_y1 "
        "    > CAST(std_y2 AS DOUBLE) / std_y1 "
        "ORDER BY urgent_growth DESC, c.c_name LIMIT 100"
    ),
)
def tpcds_yoy_growth_channel_compare(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """TPC-DS Q4/Q11 shape — YEAR-OVER-YEAR GROWTH COMPARED ACROSS
    CHANNELS: customers whose 1996→1997 growth in the urgent-priority
    channel exceeds their growth in the standard channel (TPC-DS
    store-vs-web, adapted to the order-priority split), both years'
    totals required non-zero in both channels.

    Plan shape at 100 TB: TPC-DS's reference SQL scans the fact FOUR
    times (one CTE per channel×year) and joins the four aggregates;
    conditional aggregation computes all four cells in ONE scan and
    ONE shuffle on the customer key — the year filter still reaches
    the fact scan, customer names broadcast-join the surviving rows,
    and the report is a TakeOrdered top-100. At TPC-DS's 4-CTE
    rendering the fact volume crosses the wire four times; here it
    crosses once."""
    orders = load_table(spark, "orders", sf_dir).select(
        "o_custkey", "o_orderdate", "o_orderpriority", "o_totalprice")
    yr = F.year("o_orderdate")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")

    def cell(cond):
        return F.sum(F.when(cond, cents).otherwise(F.lit(0))) \
            .cast("bigint")

    # year(ts) is opaque to parquet pruning — carry the equivalent
    # range predicate so row groups outside [1996, 1998) never decode
    # (PushedFilters, plan-pinned); the isin() keeps the semantics
    # literal and costs nothing on the surviving rows
    cells = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            & yr.isin(1996, 1997))
        .groupBy("o_custkey")
        .agg(
            cell((yr == 1996) & urgent).alias("urgent_y1"),
            cell((yr == 1997) & urgent).alias("urgent_y2"),
            cell((yr == 1996) & ~urgent).alias("std_y1"),
            cell((yr == 1997) & ~urgent).alias("std_y2"),
        )
    )
    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_name")
    ug = F.col("urgent_y2").cast("double") / F.col("urgent_y1")
    sg = F.col("std_y2").cast("double") / F.col("std_y1")
    return (
        cells.filter((F.col("urgent_y1") > 0) & (F.col("urgent_y2") > 0)
                     & (F.col("std_y1") > 0) & (F.col("std_y2") > 0))
        .filter(ug > sg)
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            F.round(ug, 4).alias("urgent_growth"),
            F.round(sg, 4).alias("std_growth"),
        )
        .orderBy(F.desc("urgent_growth"), "c_name")
        .limit(100)
    )


@register(
    "tpcds_revenue_band_histogram",
    oracle=(
        # Q54: customers segmented into revenue bands — COUNT of an
        # AGGREGATE: the histogram input is the per-customer total,
        # never raw facts. Integer cents + integer band division keep
        # every band edge exact in both engines.
        "WITH per_cust AS ("
        "  SELECT o_custkey, "
        "         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) "
        "              AS BIGINT) AS cents "
        "  FROM orders "
        "  WHERE o_orderdate >= DATE '1996-01-01' "
        "  AND o_orderdate < DATE '1996-07-01' "
        "  GROUP BY o_custkey"
        ") "
        # integer floor-average (SUM // COUNT), the
        # tpcds_rollup_rolling_sales idiom — immune to the
        # half-even/half-up ROUND divergence on .5 cents
        "SELECT CAST(cents // 5000000 AS BIGINT) AS band, "
        "CAST(COUNT(*) AS BIGINT) AS n_customers, "
        "ROUND((SUM(cents) // COUNT(*)) / 100.0, 2) AS avg_revenue "
        "FROM per_cust GROUP BY band ORDER BY band"
    ),
)
def tpcds_revenue_band_histogram(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """TPC-DS Q54 shape — REVENUE SEGMENTATION HISTOGRAM, an aggregate
    OF an aggregate: total H1-1996 revenue per customer, customers
    counted into $50k bands.

    Plan shape at 100 TB: the fact shuffles ONCE into the per-customer
    aggregate (partial map-side combine); the histogram is a second
    aggregate over |customers| rows keyed by ~dozens of bands — its
    exchange carries band-count partials, kilobytes. The naive
    rendering windows or re-joins raw facts per band. The date filter
    is a native range on the scan (PushedFilters). Integer cents and
    integer band division (cents // 5_000_000) make every band edge
    exact in both engines — no float revenue ever decides a band."""
    orders = load_table(spark, "orders", sf_dir).select(
        "o_custkey", "o_orderdate", "o_totalprice")
    per_cust = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp")))
        .groupBy("o_custkey")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
             .cast("bigint").alias("cents"))
    )
    return (
        per_cust
        .groupBy(F.floor(F.col("cents") / 5_000_000).cast("bigint")
                 .alias("band"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            # exact integer DIV (the rolling_sales idiom), never a
            # floored double quotient
            F.round(F.expr("sum(cents) DIV count(1)") / F.lit(100e0), 2)
            .alias("avg_revenue"),
        )
        .orderBy("band")
    )


@register(
    "tpcds_cross_channel_items",
    oracle=(
        # Q14 shape: the cross-channel item INTERSECT collapses to ONE
        # fact pass (HAVING COUNT(DISTINCT channel) = 3); the report
        # leg semi-joins that part-sized set, with a HAVING threshold
        # against the cells' own average (Q14's avg-sales scalar).
        "WITH li AS ("
        "  SELECT l_partkey AS pk, "
        "    CASE CAST(l_linenumber % 3 AS INT) WHEN 0 THEN 'store' "
        "      WHEN 1 THEN 'catalog' ELSE 'web' END AS channel, "
        "    l_shipdate, "
        "    CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) "
        "      AS BIGINT) AS cents "
        "  FROM lineitem"
        "), cross_items AS ("
        "  SELECT pk FROM li GROUP BY pk "
        "  HAVING COUNT(DISTINCT channel) = 3"
        "), cells AS ("
        "  SELECT channel, p_brand AS brand, COUNT(*) AS n_sales, "
        "         SUM(cents) AS cents "
        "  FROM li JOIN part ON p_partkey = pk "
        "  WHERE l_shipdate >= TIMESTAMP '1997-01-01' "
        "    AND l_shipdate < TIMESTAMP '1998-01-01' "
        "    AND pk IN (SELECT pk FROM cross_items) "
        "  GROUP BY channel, brand"
        "), thresholded AS ("
        "  SELECT channel, brand, n_sales, cents, "
        "         AVG(cents) OVER () AS avg_cents FROM cells"
        ") "
        "SELECT channel, brand, CAST(n_sales AS BIGINT) AS n_sales, "
        "ROUND(cents / 100.0, 2) AS revenue "
        "FROM thresholded WHERE cents > avg_cents "
        "ORDER BY channel, brand"
    ),
)
def tpcds_cross_channel_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q14 shape — cross-channel item INTERSECT feeding a
    thresholded report: items that sold in ALL THREE channels (the
    store∩catalog∩web item set), then 1997 revenue per (channel,
    brand) over just those items, keeping only cells above the
    average cell revenue (Q14's avg-sales scalar subquery).

    Plan shape at 100 TB: Q14's three INTERSECT subqueries collapse
    to ONE fact pass that aggregates to per-part channel counts
    (HAVING COUNT(DISTINCT channel) = 3) — the semi-join chain is
    REDUCED to a part-cardinality set before any fact join. The
    report leg is a second scan with the 1997 range PUSHED to
    parquet (it decodes one year, not seven), semi-joined against
    the broadcast cross-item set, aggregated to |channels|×|brands|
    cells; the threshold is an UNPARTITIONED WINDOW average over that
    ~90-row cells relation (one single-partition pass — a scalar-agg
    join would duplicate the cells subtree and re-scan the fact,
    plan-pinned below). Money stays integer cents until the display
    division (the channel_union idiom)."""
    li = load_table(spark, "lineitem", sf_dir).select(
        F.col("l_partkey").alias("pk"),
        F.when(F.col("l_linenumber") % 3 == 0, "store")
        .when(F.col("l_linenumber") % 3 == 1, "catalog")
        .otherwise("web").alias("channel"),
        "l_shipdate",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("bigint").alias("cents"),
    )
    cross_items = (
        li.groupBy("pk")
        .agg(F.countDistinct("channel").alias("nch"))
        .filter(F.col("nch") == 3)
        .select("pk")
    )
    part = load_table(spark, "part", sf_dir).select(
        "p_partkey", F.col("p_brand").alias("brand"))
    cells = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(cross_items), "pk", "left_semi")
        .join(F.broadcast(part), F.col("p_partkey") == F.col("pk"))
        .groupBy("channel", "brand")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sales"),
             F.sum("cents").alias("cents"))
    )
    # threshold via an unpartitioned window over the CELLS relation
    # (|channels|×|brands| rows): one single-partition pass on ~90
    # rows. A scalar-agg join would duplicate the cells subtree in the
    # physical plan — re-scanning the fact twice (plan-verified).
    from pyspark.sql import Window

    w = Window.partitionBy()
    return (
        cells.withColumn("avg_cents", F.avg("cents").over(w))
        .filter(F.col("cents") > F.col("avg_cents"))
        .select(
            "channel", "brand", "n_sales",
            # 100e0 keeps the division DOUBLE (100.0 would type DECIMAL)
            F.round(F.col("cents") / F.lit(100e0), 2).alias("revenue"),
        )
        .orderBy("channel", "brand")
    )


@register(
    "tpcds_buy_return_rebuy_margin",
    oracle=(
        # Q64 shape on the Q17/Q29 disjoint-slice spine: per-year
        # purchase cells chain through the first return year; money
        # stays integer cents end-to-end (no rounding divergence
        # surface at all).
        "WITH s AS ("
        "  SELECT o_custkey AS ck, l_partkey AS pk, "
        "    CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr, "
        "    l_returnflag AS rf, "
        "    CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) "
        "      AS BIGINT) AS cents "
        "  FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
        "), nonr AS ("
        "  SELECT ck, pk, yr, SUM(cents) AS cents FROM s "
        "  WHERE rf <> 'R' GROUP BY ck, pk, yr"
        "), ret AS ("
        "  SELECT ck, pk, MIN(yr) AS ry FROM s "
        "  WHERE rf = 'R' GROUP BY ck, pk"
        "), j AS ("
        "  SELECT nonr.*, ret.ry FROM nonr "
        "  JOIN ret ON nonr.ck = ret.ck AND nonr.pk = ret.pk"
        "), chains AS ("
        "  SELECT ck, pk, "
        "    MIN(CASE WHEN yr <= ry THEN yr END) AS fb_yr, "
        "    arg_min(CASE WHEN yr <= ry THEN cents END, "
        "            CASE WHEN yr <= ry THEN yr END) AS fb_cents, "
        "    MIN(CASE WHEN yr > ry THEN yr END) AS rb_yr, "
        "    arg_min(CASE WHEN yr > ry THEN cents END, "
        "            CASE WHEN yr > ry THEN yr END) AS rb_cents "
        "  FROM j GROUP BY ck, pk "
        "  HAVING fb_yr IS NOT NULL AND rb_yr IS NOT NULL"
        ") "
        "SELECT fb_yr AS first_buy_year, rb_yr AS rebuy_year, "
        "CAST(COUNT(*) AS BIGINT) AS n_chains, "
        "CAST(SUM(fb_cents) AS BIGINT) AS fb_cents_sum, "
        "CAST(SUM(rb_cents) AS BIGINT) AS rb_cents_sum, "
        "CAST(SUM(rb_cents - fb_cents) AS BIGINT) AS delta_cents_sum "
        "FROM chains GROUP BY fb_yr, rb_yr ORDER BY fb_yr, rb_yr"
    ),
)
def tpcds_buy_return_rebuy_margin(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """TPC-DS Q64 shape — multi-year buy → return → re-buy chains
    with the spend comparison between the two purchase years: for
    each (customer, part) that was returned, the EARLIEST purchase
    year at or before the first return year (MIN(yr) over yr ≤ ry —
    a purchase in the return year itself qualifies) vs the first
    purchase year strictly after it, reported per (first_buy_year,
    rebuy_year) with chained-spend sums.

    Plan shape at 100 TB — the Q17/Q29 disjoint-slice spine reused:
    the joined fact is repartitioned on (ck, pk) (r15 optimization,
    guide §2.4; Catalyst pushes each branch's returnflag filter below
    the repartition, so the R / non-R slices still scan disjoint,
    predicate-pushed — each slice crosses the network exactly once,
    the fact once in total). hashpartitioning(ck, pk) then satisfies
    the non-return branch's (ck, pk, yr) cell aggregate, the return
    branch's (ck, pk) first-return aggregate, the nonr⋈ret join AND
    the chain aggregate — every downstream step is co-located
    (measured 1.4 → 0.94 s at sf0.1; the pre-r15 shape paid separate
    (ck, pk, yr) / (ck, pk) / join exchanges).
    ``min_by``/``arg_min`` are deterministic here because the year is
    unique per (ck, pk) group after the cell aggregate. The report is
    |year-pair| rows; money stays integer cents end-to-end, so the
    oracle comparison has NO floating surface at all."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_partkey", "l_returnflag",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("bigint").alias("cents"),
    )
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_orderdate")
    s = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        F.col("o_custkey").alias("ck"), F.col("l_partkey").alias("pk"),
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.col("l_returnflag").alias("rf"), "cents").repartition("ck", "pk")
    nonr = (
        s.filter(F.col("rf") != "R")
        .groupBy("ck", "pk", "yr").agg(F.sum("cents").alias("cents"))
    )
    ret = (
        s.filter(F.col("rf") == "R")
        .groupBy("ck", "pk").agg(F.min("yr").alias("ry"))
    )
    j = nonr.join(ret, ["ck", "pk"])
    # fb and rb as ONE conditional aggregate over j (min/min_by skip
    # null ordering keys, like DuckDB's arg_min): separate fb/rb
    # groupBys would consume j twice and duplicate the whole fact
    # spine in the physical plan — two extra scans (plan-verified);
    # this shape also deletes the fb⋈rb join outright.
    pre = F.when(F.col("yr") <= F.col("ry"), F.col("yr"))
    post = F.when(F.col("yr") > F.col("ry"), F.col("yr"))
    chains = (
        j.groupBy("ck", "pk")
        .agg(
            F.min(pre).alias("fb_yr"),
            F.min_by(F.when(F.col("yr") <= F.col("ry"), F.col("cents")),
                     pre).alias("fb_cents"),
            F.min(post).alias("rb_yr"),
            F.min_by(F.when(F.col("yr") > F.col("ry"), F.col("cents")),
                     post).alias("rb_cents"),
        )
        .filter(F.col("fb_yr").isNotNull() & F.col("rb_yr").isNotNull())
    )
    return (
        chains.groupBy(
            F.col("fb_yr").alias("first_buy_year"),
            F.col("rb_yr").alias("rebuy_year"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chains"),
            F.sum("fb_cents").cast("bigint").alias("fb_cents_sum"),
            F.sum("rb_cents").cast("bigint").alias("rb_cents_sum"),
            F.sum(F.col("rb_cents") - F.col("fb_cents")).cast("bigint")
            .alias("delta_cents_sum"),
        )
        .orderBy("first_buy_year", "rebuy_year")
    )


@register(
    "tpcds_frequent_items_best_customers",
    oracle=(
        # Q23 shape: TWO independent semi-reductions (frequent items,
        # best customers) gate one fact aggregate. Both sets are
        # COUNT-thresholded (exact integers — no percentile-cutoff
        # float surface), and money is integer cents.
        # each gate reduces from ONE source table (lineitem alone /
        # orders alone), so neither duplicates the fact-fact join —
        # lineitem and orders are each scanned exactly twice
        # (gate + final pass), plan-pinned
        "WITH frequent_items AS ("
        "  SELECT pk FROM ("
        "    SELECT l_partkey AS pk, "
        "           CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS sy, "
        "           COUNT(DISTINCT l_orderkey) AS n "
        "    FROM lineitem GROUP BY pk, sy) "
        "  GROUP BY pk HAVING MAX(n) >= 9"
        "), best_customers AS ("
        "  SELECT o_custkey AS ck FROM orders GROUP BY ck "
        "  HAVING COUNT(*) >= 12"
        ") "
        "SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr, "
        "CAST(COUNT(*) AS BIGINT) AS n_sales, "
        "CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) "
        "  AS BIGINT)) AS BIGINT) AS cents "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "WHERE l_partkey IN (SELECT pk FROM frequent_items) "
        "  AND o_custkey IN (SELECT ck FROM best_customers) "
        "GROUP BY yr ORDER BY yr"
    ),
)
def tpcds_frequent_items_best_customers(spark: SparkSession,
                                        sf_dir: str) -> DataFrame:
    """TPC-DS Q23 shape — DOUBLE SEMI-REDUCTION: revenue from
    FREQUENT ITEMS (≥9 distinct orders within some ship-year — a
    selective gate: ~20% of parts pass at the shipped SFs, measured)
    sold to BEST CUSTOMERS (≥12 orders overall), per order-year.

    Plan shape at 100 TB: Q23's two expensive subqueries each reduce
    ONE SOURCE TABLE to a key set — items from lineitem alone (by
    ship-year), customers from orders alone — so neither gate
    duplicates the fact-fact join; lineitem and orders are each
    scanned exactly TWICE (gate + final pass, plan-pinned), and the
    final pass is the one join, semi-gated by both broadcast sets.
    (A shared gated-join CTE reads nicer but physically triples every
    fact scan — the Q14/Q64 subtree-duplication trap.) Both
    thresholds are exact COUNTS rather than Q23's top-percentile
    spend cutoff — a percentile threshold would put a float boundary
    between the two engines, while count gates are exact at any
    scale. Money stays integer cents end-to-end."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_partkey", "l_shipdate",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("bigint").alias("cents"))
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey",
        F.year("o_orderdate").cast("bigint").alias("yr"))
    # r15 optimization (guide §2.4): the item gate repartitions on pk
    # once — hashpartitioning(pk) satisfies the (pk, sy) distinct
    # aggregate, the (pk, sy) rollup AND the per-pk max, collapsing
    # the gate's three chained exchanges to one (measured 1.36 →
    # 0.95 s for the whole query at sf0.1, rows identical).
    frequent_items = (
        li.select(F.col("l_partkey").alias("pk"),
                  F.year("l_shipdate").alias("sy"), "l_orderkey")
        .repartition("pk")
        .groupBy("pk", "sy")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .groupBy("pk").agg(F.max("n").alias("mx"))
        .filter(F.col("mx") >= 9).select("pk")
    )
    best_customers = (
        orders.groupBy(F.col("o_custkey").alias("ck"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 12).select("ck")
    )
    return (
        li.join(F.broadcast(frequent_items),
                F.col("l_partkey") == F.col("pk"), "left_semi")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(best_customers),
              F.col("o_custkey") == F.col("ck"), "left_semi")
        .groupBy("yr")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sales"),
             F.sum("cents").cast("bigint").alias("cents"))
        .orderBy("yr")
    )


@register(
    "tpcds_qoq_growth_nation_channels",
    oracle=(
        # Q31 shape: two channels' quarterly cells per nation, joined
        # at cell volume; growth comparisons via integer
        # CROSS-MULTIPLICATION (w2·s1 > s2·w1) — no float division
        # anywhere, so the oracle has zero rounding surface.
        "WITH store AS ("
        "  SELECT n_name AS nation, "
        "    SUM(CASE WHEN EXTRACT(quarter FROM o_orderdate) = 1 "
        "      THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) END) AS s1, "
        "    SUM(CASE WHEN EXTRACT(quarter FROM o_orderdate) = 2 "
        "      THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) END) AS s2, "
        "    SUM(CASE WHEN EXTRACT(quarter FROM o_orderdate) = 3 "
        "      THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) END) AS s3 "
        "  FROM orders "
        "  JOIN customer ON c_custkey = o_custkey "
        "  JOIN nation ON n_nationkey = c_nationkey "
        "  WHERE o_orderdate >= TIMESTAMP '1997-01-01' "
        "    AND o_orderdate < TIMESTAMP '1997-10-01' "
        "  GROUP BY n_name"
        "), supply AS ("
        "  SELECT n_name AS nation, "
        "    SUM(CASE WHEN EXTRACT(quarter FROM l_shipdate) = 1 "
        "      THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) "
        "      AS BIGINT) END) AS w1, "
        "    SUM(CASE WHEN EXTRACT(quarter FROM l_shipdate) = 2 "
        "      THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) "
        "      AS BIGINT) END) AS w2, "
        "    SUM(CASE WHEN EXTRACT(quarter FROM l_shipdate) = 3 "
        "      THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) "
        "      AS BIGINT) END) AS w3 "
        "  FROM lineitem "
        "  JOIN supplier ON s_suppkey = l_suppkey "
        "  JOIN nation ON n_nationkey = s_nationkey "
        "  WHERE l_shipdate >= TIMESTAMP '1997-01-01' "
        "    AND l_shipdate < TIMESTAMP '1997-10-01' "
        "  GROUP BY n_name"
        ") "
        "SELECT store.nation AS nation, "
        "CAST(s1 AS BIGINT) AS store_q1_cents, "
        "CAST(s2 AS BIGINT) AS store_q2_cents, "
        "CAST(s3 AS BIGINT) AS store_q3_cents, "
        "CAST(w1 AS BIGINT) AS supply_q1_cents, "
        "CAST(w2 AS BIGINT) AS supply_q2_cents, "
        "CAST(w3 AS BIGINT) AS supply_q3_cents "
        "FROM store JOIN supply ON store.nation = supply.nation "
        "WHERE s1 > 0 AND s2 > 0 AND w1 > 0 AND w2 > 0 "
        "  AND CAST(w2 AS HUGEINT) * s1 > CAST(s2 AS HUGEINT) * w1 "
        "  AND CAST(w3 AS HUGEINT) * s2 > CAST(s3 AS HUGEINT) * w2 "
        "ORDER BY nation"
    ),
)
def tpcds_qoq_growth_nation_channels(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """TPC-DS Q31 shape — quarter-over-quarter growth compared across
    two channels per geography: nations where the supply channel
    (lineitem revenue by supplier nation) out-grew the store channel
    (order totals by customer nation) in BOTH 1997 Q1→Q2 and Q2→Q3.

    Plan shape at 100 TB: Q31's six period subqueries collapse to TWO
    conditional-aggregation scans (one per channel — the Q4/Q11
    one-scan-per-source idiom), each with the 9-month range PUSHED to
    parquet and the dims broadcast; the six-way self-join of period
    cells becomes one |nations|-row join of the two channel cell
    tables. Growth comparisons are 128-BIT integer
    CROSS-MULTIPLICATIONS over cent sums (w2·s1 > s2·w1 in Spark
    decimal(38,0) / DuckDB HUGEINT — bigint products would wrap past
    2^63 at large scale while DuckDB widens) — ratio semantics
    without a single float division, exact at any magnitude the cent
    sums themselves can reach."""
    cents_o = F.round(F.col("o_totalprice") * 100).cast("bigint")
    q_o = F.quarter("o_orderdate")
    orders = load_table(spark, "orders", sf_dir).select(
        "o_custkey", "o_orderdate", "o_totalprice").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp")))
    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_nationkey")
    nation = load_table(spark, "nation", sf_dir).select(
        "n_nationkey", "n_name")
    store = (
        orders
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation),
              F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(*[F.sum(F.when(q_o == i, cents_o)).alias(f"s{i}")
               for i in (1, 2, 3)])
    )
    cents_l = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    q_l = F.quarter("l_shipdate")
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp")))
    supp = load_table(spark, "supplier", sf_dir).select(
        "s_suppkey", "s_nationkey")
    supply = (
        li
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation),
              F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(*[F.sum(F.when(q_l == i, cents_l)).alias(f"w{i}")
               for i in (1, 2, 3)])
    )
    # cross-multiplication in 128-bit integer space (Spark
    # decimal(19,0)×decimal(19,0) → decimal(38,0); DuckDB HUGEINT):
    # bigint products of two cent SUMS overflow 2^63 well below the
    # 100 TB scale the shape targets, and Spark (ANSI off) would WRAP
    # while DuckDB widens — review r12
    d = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    return (
        store.join(supply, "nation")
        .filter(
            (F.col("s1") > 0) & (F.col("s2") > 0)
            & (F.col("w1") > 0) & (F.col("w2") > 0)
            & (d("w2") * d("s1") > d("s2") * d("w1"))
            & (d("w3") * d("s2") > d("s3") * d("w2"))
        )
        .select(
            "nation",
            F.col("s1").alias("store_q1_cents"),
            F.col("s2").alias("store_q2_cents"),
            F.col("s3").alias("store_q3_cents"),
            F.col("w1").alias("supply_q1_cents"),
            F.col("w2").alias("supply_q2_cents"),
            F.col("w3").alias("supply_q3_cents"),
        )
        .orderBy("nation")
    )


@register(
    "tpcds_return_repurchase_chain",
    oracle=(
        # Q17/Q29: sold -> returned -> repurchased chains. Three fact
        # derivatives join on the SAME (customer, part) compound key;
        # dispersion stats are rounded per the stats_aggregates
        # precedent (whole-valued quantities, drift << 1e-4).
        "WITH s AS ("
        "  SELECT o_custkey AS ck, l_partkey AS pk, l_quantity AS q, "
        "         o_orderdate AS d, l_returnflag AS rf "
        "  FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
        "), ret AS ("
        "  SELECT ck, pk, MIN(d) AS first_ret FROM s "
        "  WHERE rf = 'R' GROUP BY ck, pk"
        "), rep AS ("
        "  SELECT s.ck, s.pk, COUNT(*) AS n_rebuy, SUM(s.q) AS qty "
        "  FROM s JOIN ret ON s.ck = ret.ck AND s.pk = ret.pk "
        "  WHERE s.d > ret.first_ret AND s.rf <> 'R' "
        "  GROUP BY s.ck, s.pk"
        ") "
        "SELECT n.n_name AS nation, "
        "CAST(COUNT(*) AS BIGINT) AS n_chains, "
        "ROUND(AVG(rep.n_rebuy), 4) AS avg_rebuys, "
        "ROUND(AVG(rep.qty), 4) AS avg_qty, "
        "ROUND(COALESCE(stddev_samp(rep.qty), 0.0), 4) AS qty_stddev "
        "FROM rep "
        "JOIN customer c ON c.c_custkey = rep.ck "
        "JOIN nation n ON n.n_nationkey = c.c_nationkey "
        "GROUP BY nation ORDER BY nation"
    ),
)
def tpcds_return_repurchase_chain(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """TPC-DS Q17/Q29 shape — SOLD → RETURNED → REPURCHASED chain with
    dispersion stats: customers who returned a part and later bought
    the same part again, reported per nation with count / mean /
    sample-stddev of the repurchase quantities.

    Plan shape at 100 TB (r16, guide §2.4 — the r15 repartition edit
    claimed an exchange collapse the plan dumps contradicted: Catalyst
    pushed the branch filters below the repartition, leaving the two
    branches' subtrees distinct, so the fact still crossed the wire
    twice and the chain join paid a SortMergeJoin): the per-(ck, pk)
    FIRST RETURN DATE is now a window MIN over the same partition the
    chain aggregate needs — ``min(CASE rf='R' THEN d) OVER
    (PARTITION BY ck, pk)`` — so the sold→returned→repurchased chain
    is ONE fact pass, ONE hashpartitioning(ck, pk) exchange (window,
    filter, and per-chain aggregate all co-located on it), and ZERO
    chain joins. Rows with no R mate get a NULL first_ret and the
    ``d > first_ret`` filter drops them — exactly the inner chain
    join's semantics (plan: 2 fact scans + SMJ + 8 Exchange → 1 fact
    scan + 6 Exchange, no SMJ; wall time a WASH at sf0.1 where both
    dims broadcast and scans are page-cached — ABAB noop medians
    1.28-1.83 old vs 1.41-1.61 new, rows identical — the win is the
    scale shape: the returnflag slices were low-cardinality row-group
    residents, so the "disjoint" scans each read every page — 2× scan
    I/O — and at 100 TB orders outgrows broadcast, doubling the
    orderkey join too).
    Customer/nation are broadcast dims; the report is |nations| rows.
    Quantities are whole-valued, so the rounded mean/stddev are the
    stats_aggregates tolerance class."""
    from pyspark.sql import Window as W

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_partkey", "l_quantity", "l_returnflag")
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_orderdate")
    s = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        F.col("o_custkey").alias("ck"), F.col("l_partkey").alias("pk"),
        F.col("l_quantity").alias("q"), F.col("o_orderdate").alias("d"),
        F.col("l_returnflag").alias("rf"))
    chain = W.partitionBy("ck", "pk")
    rep = (
        s.withColumn(
            "first_ret",
            F.min(F.when(F.col("rf") == "R", F.col("d"))).over(chain))
        .filter((F.col("rf") != "R") & (F.col("d") > F.col("first_ret")))
        .groupBy("ck", "pk")
        .agg(F.count(F.lit(1)).alias("n_rebuy"), F.sum("q").alias("qty"))
    )
    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_nationkey")
    nation = load_table(spark, "nation", sf_dir).select(
        "n_nationkey", "n_name")
    return (
        rep.join(F.broadcast(cust), F.col("c_custkey") == F.col("ck"))
        .join(F.broadcast(nation),
              F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chains"),
            F.round(F.avg("n_rebuy"), 4).alias("avg_rebuys"),
            F.round(F.avg("qty"), 4).alias("avg_qty"),
            F.round(F.coalesce(F.stddev_samp("qty"), F.lit(0.0)), 4)
            .alias("qty_stddev"),
        )
        .orderBy("nation")
    )


@register(
    "tpcds_item_day_channel_crossover",
    oracle=(
        # Q51 at ITEM-DAY grain: one conditional aggregate builds both
        # channels' (item, day) cells in a single fact pass (no null
        # holes — a missing channel-day contributes 0, so the running
        # SUM is the carried cumulative), running totals window per
        # item, crossover rows where web overtook store, deterministic
        # top-100 by (item, day). Integer cents end-to-end.
        "WITH cells AS ("
        "  SELECT l_partkey AS item, strftime(l_shipdate, '%Y-%m-%d') AS d, "
        "    SUM(CASE WHEN l_orderkey % 2 = 0 THEN "
        "      CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) "
        "      ELSE 0 END) AS web_cents, "
        "    SUM(CASE WHEN l_orderkey % 2 = 1 THEN "
        "      CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) "
        "      ELSE 0 END) AS store_cents "
        "  FROM lineitem GROUP BY item, d"
        "), run AS ("
        "  SELECT item, d, "
        "    SUM(web_cents) OVER (PARTITION BY item ORDER BY d "
        "      ROWS UNBOUNDED PRECEDING) AS web_run, "
        "    SUM(store_cents) OVER (PARTITION BY item ORDER BY d "
        "      ROWS UNBOUNDED PRECEDING) AS store_run "
        "  FROM cells"
        ") "
        "SELECT item, d, ROUND(web_run / 100.0, 2) AS web_cumulative, "
        "ROUND(store_run / 100.0, 2) AS store_cumulative "
        "FROM run WHERE web_run > store_run "
        "ORDER BY item, d LIMIT 100"
    ),
)
def tpcds_item_day_channel_crossover(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """TPC-DS Q51 at the spec's own ITEM-DAY grain (VERDICT r12 item
    5) — web vs store RUNNING totals compared per (item, day), report
    rows where the web series has overtaken the store series,
    deterministic top-100.

    Plan shape — improves on the coarse-grain Q51 twin
    (`tpcds_cumulative_channel_crossover`, two channel-filtered fact
    scans): ONE conditional aggregate builds both channels' cells in a
    SINGLE fact pass, so the fact is scanned once and shuffled once
    (to (item, day) cells). With conditional 0-fill there are no null
    holes, so the plain running SUM IS the carried cumulative (cents
    are non-negative) — no FULL OUTER spine join, no running-MAX
    repair pass. The windows partition BY ITEM: at 100 TB that is
    millions of independent partitions, never a single-partition
    window; the TakeOrdered(100) collapses the report to a constant.
    r15 optimization (guide §2.4): the fact is repartitioned on ITEM
    once — hashpartitioning(item) satisfies both the (item, day)
    aggregate's clustering and the item window's, so the cell build
    and the running totals share ONE exchange instead of two
    (measured 1.6 → 1.1 s at sf0.1, rows identical).
    Reference scope: `ICEBERG-Interoperability-Test-Spec.md:43`."""
    from pyspark.sql import Window as W

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_shipdate", "l_orderkey",
        "l_extendedprice", "l_discount",
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    cells = (
        li.select(
            F.col("l_partkey").alias("item"),
            # day rendered as a STRING on both engines (DuckDB date
            # round-trips as a pandas Timestamp otherwise); lexical
            # order of yyyy-MM-dd IS chronological, so the window
            # ORDER BY and the top-100 ORDER BY agree
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("d"),
            F.when(F.col("l_orderkey") % 2 == 0, cents)
            .otherwise(F.lit(0)).alias("web_c"),
            F.when(F.col("l_orderkey") % 2 == 1, cents)
            .otherwise(F.lit(0)).alias("store_c"),
        )
        .repartition("item")
        .groupBy("item", "d")
        .agg(F.sum("web_c").alias("web_cents"),
             F.sum("store_c").alias("store_cents"))
    )
    cume = W.partitionBy("item").orderBy("d").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        cells.select(
            "item", "d",
            F.sum("web_cents").over(cume).alias("web_run"),
            F.sum("store_cents").over(cume).alias("store_run"),
        )
        .filter(F.col("web_run") > F.col("store_run"))
        .orderBy("item", "d")
        .limit(100)
        .select(
            "item", "d",
            F.round(F.col("web_run") / F.lit(100e0), 2)
            .alias("web_cumulative"),
            F.round(F.col("store_run") / F.lit(100e0), 2)
            .alias("store_cumulative"),
        )
    )


@register(
    "tpcds_brand_decline_yoy",
    oracle=(
        # Q75: per-brand year-over-year sales with RETURNS NETTED
        # (an R-flag row subtracts its quantity/revenue), consecutive
        # years compared per brand via LAG over the brand-year cells,
        # decline = net quantity fell below 90% of the prior year —
        # decided by INTEGER CROSS-MULTIPLICATION (10*curr < 9*prev;
        # the r12 Q31 precedent: ratio semantics, zero float division).
        "WITH cells AS ("
        "  SELECT p_brand AS brand, "
        "    CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS yr, "
        "    SUM(CASE WHEN l_returnflag = 'R' THEN "
        "      -CAST(ROUND(l_quantity) AS BIGINT) "
        "      ELSE CAST(ROUND(l_quantity) AS BIGINT) END) AS net_qty, "
        "    SUM(CASE WHEN l_returnflag = 'R' THEN "
        "      -CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) "
        "      ELSE CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) "
        "      END) AS net_cents "
        "  FROM lineitem JOIN part ON l_partkey = p_partkey "
        "  GROUP BY brand, yr"
        "), pairs AS ("
        "  SELECT brand, yr, net_qty, net_cents, "
        "    LAG(net_qty) OVER (PARTITION BY brand ORDER BY yr) AS prev_qty, "
        "    LAG(net_cents) OVER (PARTITION BY brand ORDER BY yr) AS prev_cents, "
        "    LAG(yr) OVER (PARTITION BY brand ORDER BY yr) AS prev_yr "
        "  FROM cells"
        ") "
        # CAST both quantity projections: DuckDB widens SUM(BIGINT) to
        # HUGEINT, which fetchdf() renders as float64 — the driver's
        # type-sensitive hash then sees 34105.0 vs Spark's int64 34105
        # (the exact r13 red row; qty_diff below already carried the
        # cast, which is why it alone matched).
        "SELECT brand, prev_yr, yr, "
        "  CAST(prev_qty AS BIGINT) AS prev_qty, "
        "  CAST(net_qty AS BIGINT) AS curr_qty, "
        "  CAST(net_qty - prev_qty AS BIGINT) AS qty_diff, "
        "  ROUND((net_cents - prev_cents) / 100.0, 2) AS revenue_diff "
        "FROM pairs "
        "WHERE prev_yr = yr - 1 AND prev_qty > 0 "
        "  AND 10 * net_qty < 9 * prev_qty "
        "ORDER BY qty_diff, brand, yr"
    ),
)
def tpcds_brand_decline_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q75 shape (VERDICT r12 item 5) — YEAR-OVER-YEAR BRAND
    DECLINE WITH RETURNS NETTED: per (brand, year), net sales quantity
    and revenue where a returned row (R flag) SUBTRACTS its quantity
    and revenue inside the same conditional aggregate (one fact pass —
    Q75's sales-minus-returns netting without a second scan or an
    except/join against a returns table); consecutive-year pairs via
    LAG over the brand-year cells; report brands whose net quantity
    fell below 90% of the prior year, with the ratio decided in exact
    integer cross-multiplication (10*curr < 9*prev — the Q31
    precedent, immune to float division and to bigint overflow at
    these magnitudes).

    Plan shape: ONE lineitem scan (returns netted conditionally, never
    a second slice), one BROADCAST join with the kilobyte part
    dimension, one shuffle to |brand × year| cells; the LAG window
    partitions by brand over ≤ |brands| × 7 rows. Scale-safe at 100
    TB: everything after the first exchange is cell-sized.
    Reference scope: `ICEBERG-Interoperability-Test-Spec.md:43`."""
    from pyspark.sql import Window as W

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_shipdate", "l_returnflag",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    part = load_table(spark, "part", sf_dir).select("p_partkey", "p_brand")
    sign = F.when(F.col("l_returnflag") == "R", F.lit(-1)).otherwise(F.lit(1))
    qty = F.round(F.col("l_quantity")).cast("bigint")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    cells = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.year("l_shipdate").cast("bigint").alias("yr"),
        )
        .agg(
            F.sum(sign * qty).alias("net_qty"),
            F.sum(sign * cents).alias("net_cents"),
        )
    )
    lagw = W.partitionBy("brand").orderBy("yr")
    pairs = cells.select(
        "brand", "yr", "net_qty", "net_cents",
        F.lag("net_qty").over(lagw).alias("prev_qty"),
        F.lag("net_cents").over(lagw).alias("prev_cents"),
        F.lag("yr").over(lagw).alias("prev_yr"),
    )
    return (
        pairs.filter(
            (F.col("prev_yr") == F.col("yr") - 1)
            & (F.col("prev_qty") > 0)
            & (10 * F.col("net_qty") < 9 * F.col("prev_qty"))
        )
        .select(
            "brand", "prev_yr", "yr", "prev_qty",
            F.col("net_qty").alias("curr_qty"),
            (F.col("net_qty") - F.col("prev_qty")).cast("bigint")
            .alias("qty_diff"),
            F.round((F.col("net_cents") - F.col("prev_cents"))
                    / F.lit(100e0), 2).alias("revenue_diff"),
        )
        .orderBy("qty_diff", "brand", "yr")
    )


@register(
    "tpcds_worst_return_ratios_dual_rank",
    oracle=(
        # Q49: per channel, the items with the WORST return ratios,
        # ranked BOTH by quantity ratio and by amount ratio, kept when
        # either rank <= 10. One conditional aggregate builds return
        # and sold sums per (channel, item) in a single fact pass;
        # the ranks order by exact-integer ratio comparisons rendered
        # as double division of bigint cents/qty (identical operands
        # -> identical IEEE result in both engines), ties broken by
        # item for determinism.
        "WITH cells AS ("
        "  SELECT CASE WHEN l_orderkey % 2 = 0 THEN 'web' ELSE 'store' END "
        "    AS channel, l_partkey AS item, "
        "    SUM(CASE WHEN l_returnflag = 'R' THEN "
        "      CAST(ROUND(l_quantity) AS BIGINT) ELSE 0 END) AS ret_qty, "
        "    SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS qty, "
        "    SUM(CASE WHEN l_returnflag = 'R' THEN "
        "      CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) "
        "      ELSE 0 END) AS ret_cents, "
        "    SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) "
        "      AS BIGINT)) AS cents "
        "  FROM lineitem GROUP BY channel, item HAVING SUM(l_quantity) > 0"
        "), ranked AS ("
        "  SELECT channel, item, "
        "    ROUND(CAST(ret_qty AS DOUBLE) / qty, 6) AS qty_ratio, "
        "    ROUND(CAST(ret_cents AS DOUBLE) / cents, 6) AS amt_ratio, "
        "    RANK() OVER (PARTITION BY channel "
        "      ORDER BY CAST(ret_qty AS DOUBLE) / qty DESC, item) AS qty_rank, "
        "    RANK() OVER (PARTITION BY channel "
        "      ORDER BY CAST(ret_cents AS DOUBLE) / cents DESC, item) AS amt_rank "
        "  FROM cells"
        ") "
        "SELECT channel, item, qty_ratio, amt_ratio, "
        "  CAST(qty_rank AS BIGINT) AS qty_rank, "
        "  CAST(amt_rank AS BIGINT) AS amt_rank "
        "FROM ranked WHERE qty_rank <= 10 OR amt_rank <= 10 "
        "ORDER BY channel, qty_rank, amt_rank, item"
    ),
)
def tpcds_worst_return_ratios_dual_rank(spark: SparkSession,
                                        sf_dir: str) -> DataFrame:
    """TPC-DS Q49 shape (staged r14) — WORST RETURN RATIOS, DUAL
    RANKING: per channel (even/odd order keys — the fixture's web vs
    store), each item's return-to-sold ratio by quantity AND by
    amount, ranked independently, reported when either rank makes the
    bottom-10. Q49's signature is the union-of-channels each carrying
    two window ranks over the same aggregate.

    Plan shape: ONE conditional aggregate builds ret/sold sums for
    both channels in a single fact pass (Q49's per-channel UNION ALL
    subqueries each re-scan their fact; the channel is just a GROUP BY
    key here), then two RANK windows run over |channel × item| cells
    partitioned by channel. Ratio ORDER BY uses double division of
    exact integer sums — identical operands give identical IEEE
    doubles in both engines, with item tie-breaks for full
    determinism. Scale: one fact exchange, cell-sized windows.
    Reference scope: `ICEBERG-Interoperability-Test-Spec.md:43`."""
    from pyspark.sql import Window as W

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_partkey", "l_returnflag",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    qty = F.round(F.col("l_quantity")).cast("bigint")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    is_ret = F.col("l_returnflag") == "R"
    cells = (
        li.groupBy(
            F.when(F.col("l_orderkey") % 2 == 0, F.lit("web"))
            .otherwise(F.lit("store")).alias("channel"),
            F.col("l_partkey").alias("item"),
        )
        .agg(
            F.sum(F.when(is_ret, qty).otherwise(F.lit(0))).alias("ret_qty"),
            F.sum(qty).alias("qty"),
            F.sum(F.when(is_ret, cents).otherwise(F.lit(0)))
            .alias("ret_cents"),
            # per-row exact cents then integer SUM — the repo's
            # established idiom; rounding a float TOTAL to cents is
            # order-dependent (partial-agg order can land a half-cent
            # on either side between engines, review-caught)
            F.sum(cents).alias("cents"),
        )
        .filter(F.col("qty") > 0)
    )
    qty_ratio = F.col("ret_qty").cast("double") / F.col("qty")
    amt_ratio = F.col("ret_cents").cast("double") / F.col("cents")
    wq = W.partitionBy("channel").orderBy(qty_ratio.desc(), F.col("item"))
    wa = W.partitionBy("channel").orderBy(amt_ratio.desc(), F.col("item"))
    return (
        cells.select(
            "channel", "item",
            F.round(qty_ratio, 6).alias("qty_ratio"),
            F.round(amt_ratio, 6).alias("amt_ratio"),
            F.rank().over(wq).cast("bigint").alias("qty_rank"),
            F.rank().over(wa).cast("bigint").alias("amt_rank"),
        )
        .filter((F.col("qty_rank") <= 10) | (F.col("amt_rank") <= 10))
        .orderBy("channel", "qty_rank", "amt_rank", "item")
    )


@register(
    "tpcds_cov_consecutive_months",
    oracle=(
        # Q39: per (item, month) demand mean/deviation; flag months
        # whose coefficient of variation clears a threshold and pair
        # each flagged month with its flagged SUCCESSOR month. The
        # cov > 0.65 filter is decided in EXACT INTEGER arithmetic on
        # the raw sums (the r12/r13 cross-multiplication discipline
        # extended to second moments): var_samp > t^2 * mean^2
        # <=> 400*n*(n*S2 - S1^2) > 169*(n-1)*S1^2 for t = 0.65,
        # with S1 = sum(q), S2 = sum(q^2) as bigints — no float ever
        # decides a row's membership; floats only render the report.
        "WITH cells AS ("
        "  SELECT l_partkey AS item, "
        "    CAST(EXTRACT(year FROM l_shipdate) * 12 "
        "      + EXTRACT(month FROM l_shipdate) AS BIGINT) AS m, "
        "    COUNT(*) AS n, "
        "    SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS s1, "
        "    SUM(CAST(ROUND(l_quantity) AS BIGINT) "
        "      * CAST(ROUND(l_quantity) AS BIGINT)) AS s2 "
        "  FROM lineitem GROUP BY item, m HAVING COUNT(*) >= 2"
        "), flagged AS ("
        "  SELECT item, m, "
        "    ROUND(SQRT(CAST(n * s2 - s1 * s1 AS DOUBLE) "
        "      / (n * (n - 1))) * n / s1, 4) AS cov "
        "  FROM cells "
        "  WHERE 400 * n * (n * s2 - s1 * s1) > 169 * (n - 1) * s1 * s1"
        "), pairs AS ("
        "  SELECT item, m, cov, "
        "    LAG(m) OVER (PARTITION BY item ORDER BY m) AS prev_m, "
        "    LAG(cov) OVER (PARTITION BY item ORDER BY m) AS prev_cov "
        "  FROM flagged"
        ") "
        "SELECT item, prev_m AS m1, m AS m2, prev_cov AS cov1, cov AS cov2 "
        "FROM pairs WHERE prev_m = m - 1 "
        "ORDER BY item, m1"
    ),
)
def tpcds_cov_consecutive_months(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """TPC-DS Q39 shape (staged r14) — DEMAND-VARIABILITY PAIRS: per
    (item, month), the coefficient of variation of line quantities;
    months clearing cov > 0.65 pair with their immediately-following
    flagged month (Q39's two-self-join rendered as one LAG window over
    the flagged cells).

    The membership filter is EXACT: var_samp and mean² reduce to the
    integer sums S1=Σq, S2=Σq² and the threshold comparison
    cross-multiplies to ``400·n·(n·S2−S1²) > 169·(n−1)·S1²`` — the
    r12 Q31 / r13 Q75 integer-ratio discipline extended to second
    moments, so no float rounding ever decides which rows exist
    (SQRT/division only RENDER the cov values, over identical integer
    operands in both engines → identical IEEE doubles). The
    comparison itself runs in decimal(38,0) on the Spark side and
    HUGEINT on DuckDB's (its SUM(BIGINT) widens automatically): the
    cubic products pass 2^63 at ~25k rows per (item, month) cell, and
    Spark's bigint would WRAP silently there.

    Plan shape: one fact pass aggregates to |item × month| cells; the
    flag filter is cell-local; the LAG window partitions by item.
    r15 optimization (guide §2.4): the fact is repartitioned on ITEM
    once — hashpartitioning(item) satisfies both the (item, month)
    aggregate's clustering and the LAG window's, so the cell build and
    the pairing share ONE exchange instead of two. The (item, month)
    cell space is high-cardinality relative to a scan split, so the
    map-side combine this forgoes is ~1 on a fact not clustered by
    item — the exchange still carries ~|fact| narrow rows either way,
    and one full exchange disappears.
    At 100 TB: one fact exchange, everything downstream cell-sized.
    Reference scope: `ICEBERG-Interoperability-Test-Spec.md:43`."""
    from pyspark.sql import Window as W

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_shipdate", "l_quantity",
    )
    q = F.round(F.col("l_quantity")).cast("bigint")
    cells = (
        li.select(
            F.col("l_partkey").alias("item"),
            (F.year("l_shipdate") * 12 + F.month("l_shipdate"))
            .cast("bigint").alias("m"),
            q.alias("q"),
        )
        .repartition("item")
        .groupBy("item", "m")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("q").alias("s1"),
            F.sum(F.col("q") * F.col("q")).alias("s2"),
        )
        .filter(F.col("n") >= 2)
    )
    # the membership comparison runs in decimal(38,0) — Spark's
    # bigint arithmetic WRAPS silently (non-ANSI) while DuckDB's
    # SUM(BIGINT) is HUGEINT; the cubic-in-n products exceed 2^63
    # once a cell holds ~25k rows, well inside the operator's 100 TB
    # contract (review-caught). decimal(38,0) is exact to 1e38 ≈
    # n ~ 1e10 rows per cell on both engines.
    n_d = F.col("n").cast("decimal(38,0)")
    s1_d = F.col("s1").cast("decimal(38,0)")
    s2_d = F.col("s2").cast("decimal(38,0)")
    # The RENDER shares the decimal operands with the membership filter
    # (ADVICE r13): n·S2−S1² in bigint wraps silently past ~6e7 rows
    # per cell while the filter (decimal) and DuckDB (HUGEINT) stay
    # exact — the rendered cov would diverge at scale even though row
    # membership matched. Same for the n·(n−1) denominator (~3e9 rows).
    var_num = (n_d * s2_d - s1_d * s1_d).cast("double")
    var_den = (n_d * (n_d - F.lit(1))).cast("double")
    flagged = cells.filter(
        F.lit(400).cast("decimal(38,0)") * n_d * (n_d * s2_d - s1_d * s1_d)
        > F.lit(169).cast("decimal(38,0)") * (n_d - 1) * s1_d * s1_d
    ).select(
        "item", "m",
        F.round(
            F.sqrt(var_num / var_den) * F.col("n") / F.col("s1"), 4
        ).alias("cov"),
    )
    lagw = W.partitionBy("item").orderBy("m")
    pairs = flagged.select(
        "item", "m", "cov",
        F.lag("m").over(lagw).alias("prev_m"),
        F.lag("cov").over(lagw).alias("prev_cov"),
    )
    return (
        pairs.filter(F.col("prev_m") == F.col("m") - 1)
        .select(
            "item",
            F.col("prev_m").alias("m1"), F.col("m").alias("m2"),
            F.col("prev_cov").alias("cov1"), F.col("cov").alias("cov2"),
        )
        .orderBy("item", "m1")
    )


@register(
    "tpcds_ticket_size_repeat_buyers",
    oracle=(
        # Q34/Q73: oversized-ticket buckets — per ORDER, the line-item
        # count (the "ticket size"); tickets inside the 8-13 band feed
        # a per-customer ticket count; repeat buyers (>= 2 oversized
        # tickets) report with their biggest ticket. One conditional
        # fact pass + HAVING on the cell, never the spec's self-join.
        "WITH cells AS ("
        "  SELECT l_orderkey, COUNT(*) AS items FROM lineitem "
        "  GROUP BY l_orderkey HAVING COUNT(*) BETWEEN 8 AND 13"
        "), buyers AS ("
        "  SELECT o_custkey, COUNT(*) AS tickets, MAX(items) AS biggest "
        "  FROM cells JOIN orders ON o_orderkey = l_orderkey "
        "  GROUP BY o_custkey HAVING COUNT(*) >= 2"
        ") "
        "SELECT c_name, tickets, biggest "
        "FROM buyers JOIN customer ON c_custkey = o_custkey "
        "ORDER BY tickets DESC, c_name LIMIT 100"
    ),
)
def tpcds_ticket_size_repeat_buyers(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """TPC-DS Q34/Q73 shape (staged r15) — TICKET-SIZE BUCKETS AND
    REPEAT BUYERS: the line-item count per order is the "ticket size";
    orders in the oversized band (8-13 items — Q34's 15-20 dov band on
    this fixture's 1-13 distribution) feed a per-customer ticket
    count, and customers holding >= 2 such tickets report with their
    biggest ticket. Q34/Q73 spell the bucket as a correlated
    self-join; here it is ONE aggregate + HAVING on the cell.

    Plan shape at 100 TB: one lineitem pass partial-aggregates
    (map-side combinable COUNT) to |orders| ticket cells, the band
    HAVING keeps a few percent of them, and the orderkey join with
    orders is KEY-CO-LOCATED (both sides cluster on orderkey in any
    sane layout; Q73's own ss_ticket_number join is the same shuffle)
    — never a broadcast claim on a linearly-growing set. The final
    buyers⋈customer join shuffles on the customer key exactly as
    TPC-DS does; the report is a TakeOrdered top-100.
    Reference scope: `ICEBERG-Interoperability-Test-Spec.md:43`."""
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey")
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey")
    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_name")
    cells = (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("items"))
        .filter(F.col("items").between(8, 13))
    )
    buyers = (
        cells.join(orders, cells.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("tickets"),
             F.max("items").alias("biggest"))
        .filter(F.col("tickets") >= 2)
    )
    return (
        buyers.join(cust, buyers.o_custkey == cust.c_custkey)
        .select("c_name", "tickets", "biggest")
        .orderBy(F.desc("tickets"), "c_name")
        .limit(100)
    )


@register(
    "tpcds_customer_value_yoy_lag",
    oracle=(
        # Q11 on the Q75 LAG spine: per (customer, year), both
        # channels' value cells from ONE conditional aggregate;
        # consecutive-year pairs via LAG; growth comparison decided by
        # INTEGER CROSS-MULTIPLICATION in overflow-safe width
        # (HUGEINT here, decimal(38,0) on the Spark side — the
        # Q31/Q39 discipline: no float division ever decides
        # membership; the rendered ratios divide identical integers).
        "WITH cells AS ("
        "  SELECT o_custkey, "
        "    CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr, "
        "    CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') "
        "      THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) ELSE 0 END) "
        "      AS BIGINT) AS u, "
        "    CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') "
        "      THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) ELSE 0 END) "
        "      AS BIGINT) AS s "
        "  FROM orders GROUP BY o_custkey, yr"
        "), pairs AS ("
        "  SELECT o_custkey, yr, u, s, "
        "    LAG(u) OVER (PARTITION BY o_custkey ORDER BY yr) AS pu, "
        "    LAG(s) OVER (PARTITION BY o_custkey ORDER BY yr) AS ps, "
        "    LAG(yr) OVER (PARTITION BY o_custkey ORDER BY yr) AS pyr "
        "  FROM cells"
        ") "
        "SELECT o_custkey AS custkey, yr, "
        "  ROUND(CAST(u AS DOUBLE) / pu, 4) AS urgent_growth, "
        "  ROUND(CAST(s AS DOUBLE) / ps, 4) AS std_growth "
        "FROM pairs "
        "WHERE pyr = yr - 1 AND pu > 0 AND ps > 0 AND u > 0 AND s > 0 "
        "  AND CAST(u AS HUGEINT) * ps > CAST(s AS HUGEINT) * pu "
        "ORDER BY urgent_growth DESC, custkey, yr LIMIT 100"
    ),
)
def tpcds_customer_value_yoy_lag(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """TPC-DS Q11 shape (staged r15) — YEAR-OVER-YEAR CUSTOMER VALUE
    across two channels on the Q75 LAG SPINE: unlike the fixed-pair
    `tpcds_yoy_growth_channel_compare` (Q4/Q11 with two pinned
    years), every consecutive-year pair per customer qualifies via
    LAG over the (customer, year) cells, and the growth comparison
    u/pu > s/ps is decided by integer cross-multiplication
    u·ps > s·pu in decimal(38,0) — cents-per-customer-year can reach
    ~1e13 at 100 TB, and the cross product passes 2^63 well before
    that (the Q39 review lesson); DuckDB's HUGEINT is the oracle-side
    twin. The RENDERED growth ratios divide identical int64 pairs in
    both engines → identical IEEE doubles.

    Plan shape at 100 TB: Q11's reference SQL scans the fact once per
    channel×year CTE; here ONE orders pass partial-aggregates both
    channels' cells (conditional SUMs, map-side combinable) to
    |customer × 7 years| rows, the LAG window partitions by customer
    over <= 7 rows each, and the report is a TakeOrdered top-100.
    Reference scope: `ICEBERG-Interoperability-Test-Spec.md:43`."""
    from pyspark.sql import Window as W

    orders = load_table(spark, "orders", sf_dir).select(
        "o_custkey", "o_orderdate", "o_orderpriority", "o_totalprice")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    cells = orders.groupBy(
        "o_custkey",
        F.year("o_orderdate").cast("bigint").alias("yr"),
    ).agg(
        F.sum(F.when(urgent, cents).otherwise(F.lit(0))).alias("u"),
        F.sum(F.when(~urgent, cents).otherwise(F.lit(0))).alias("s"),
    )
    w = W.partitionBy("o_custkey").orderBy("yr")
    pairs = cells.select(
        "o_custkey", "yr", "u", "s",
        F.lag("u").over(w).alias("pu"),
        F.lag("s").over(w).alias("ps"),
        F.lag("yr").over(w).alias("pyr"),
    )

    def dec(c):
        return F.col(c).cast("decimal(38,0)")

    return (
        pairs.filter(
            (F.col("pyr") == F.col("yr") - 1)
            & (F.col("pu") > 0) & (F.col("ps") > 0)
            & (F.col("u") > 0) & (F.col("s") > 0)
            & (dec("u") * dec("ps") > dec("s") * dec("pu"))
        )
        .select(
            F.col("o_custkey").alias("custkey"), "yr",
            F.round(F.col("u") / F.col("pu"), 4).alias("urgent_growth"),
            F.round(F.col("s") / F.col("ps"), 4).alias("std_growth"),
        )
        .orderBy(F.desc("urgent_growth"), "custkey", "yr")
        .limit(100)
    )


@register(
    "tpcds_customer_activity_profile",
    oracle=(
        # Q10/Q35/Q69: demographic profile of customers selected by an
        # EXISTS on one activity slice AND a NOT EXISTS on another —
        # here, customers who ever placed an urgent-priority order but
        # have NO order at all on/after 2000-07-01 (lapsed urgent
        # buyers), profiled per (nation, market segment).
        # balances sum as exact integer cents and divide identical
        # integers (the Q31/Q39 discipline): SUM(double) in a
        # different reduction order lands on ROUND boundaries
        "SELECT n_name, c_mktsegment, "
        "CAST(COUNT(*) AS BIGINT) AS n_cust, "
        "CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE) "
        "  / (100.0 * COUNT(*)) AS avg_bal, "
        "MIN(c_acctbal) AS min_bal, "
        "MAX(c_acctbal) AS max_bal "
        "FROM customer JOIN nation ON n_nationkey = c_nationkey "
        "WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey "
        "  AND o_orderpriority IN ('1-URGENT','2-HIGH') "
        "  AND o_orderdate < TIMESTAMP '2000-07-01 00:00:00') "
        "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey "
        "  AND o_orderdate >= TIMESTAMP '2000-07-01 00:00:00') "
        "GROUP BY n_name, c_mktsegment "
        "ORDER BY n_name, c_mktsegment"
    ),
)
def tpcds_customer_activity_profile(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """TPC-DS Q10/Q35/Q69 shape (staged r16) — CUSTOMER ACTIVITY
    PROFILE BY EXISTS + NOT EXISTS: the signature TPC-DS demographic
    report selects customers by existential activity tests on fact
    slices (bought in channel A, never in channel B) and aggregates
    their attributes per demographic cell. On this fixture: customers
    who ever placed an urgent-priority order (EXISTS) and have no
    order at all on/after 2000-07-01 (NOT EXISTS — lapsed buyers),
    profiled per (nation, market segment) with count and
    account-balance stats. This is the
    one TPC-DS signature the suite had not modeled: a LEFT SEMI and a
    LEFT ANTI join feeding the same aggregate.

    Plan shape at 100 TB: each activity slice filter-pushes into the
    orders scan, partial-aggregates to DISTINCT custkeys map-side
    (the explicit distinct() keeps the semi/anti shuffle at
    |active customers|, not |order rows|), and both joins shuffle on
    the customer key — co-located with each other and with any sane
    customer-table layout, so AQE plans at most one exchange per
    side. The nation dimension broadcasts; the final aggregate is
    |nation × segment| cells. Q10's own plan is identical with
    date_dim in place of the year predicates.
    Reference scope: `ICEBERG-Interoperability-Test-Spec.md:43`."""
    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    nation = load_table(spark, "nation", sf_dir).select(
        "n_nationkey", "n_name")
    orders = load_table(spark, "orders", sf_dir).select(
        "o_custkey", "o_orderdate", "o_orderpriority")
    cutoff = F.lit("2000-07-01 00:00:00").cast("timestamp")
    urgent_before = (
        orders.filter(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & (F.col("o_orderdate") < cutoff)
        ).select("o_custkey").distinct()
    )
    any_after = (
        orders.filter(F.col("o_orderdate") >= cutoff)
        .select("o_custkey").distinct()
    )
    return (
        cust.join(urgent_before, cust.c_custkey == urgent_before.o_custkey,
                  "left_semi")
        .join(any_after, cust.c_custkey == any_after.o_custkey,
              "left_anti")
        .join(F.broadcast(nation),
              cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            (F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint"))
             .cast("double")
             / (F.count(F.lit(1)) * F.lit(100.0))).alias("avg_bal"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
        .orderBy("n_name", "c_mktsegment")
    )


@register(
    "tpcds_monthly_return_pivot",
    oracle=(
        # Q66: the wide month-pivot report — per (supplier nation,
        # ship year), twelve monthly revenue columns from ONE fact
        # pass of conditional sums, split into kept vs returned
        # streams (the fixture's twin of Q66's two ship-mode
        # families), plus the year totals.
        # revenue sums as exact integer cents rendered by /100.0 —
        # identical integers divide to identical doubles in both
        # engines (SUM(double) order-dependence lands on ROUND
        # boundaries across 2450 cells)
        "SELECT n_name, "
        "CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS yr, "
        + ", ".join(
            f"CAST(SUM(CASE WHEN EXTRACT(month FROM l_shipdate) = {m} "
            f"AND l_returnflag <> 'R' THEN CAST(ROUND(l_extendedprice "
            f"* (1 - l_discount) * 100) AS BIGINT) ELSE 0 END) "
            f"AS DOUBLE) / 100.0 AS kept_m{m:02d}"
            for m in range(1, 13)
        ) + ", "
        "CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN "
        "CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) "
        "ELSE 0 END) AS DOUBLE) / 100.0 AS kept_total, "
        "CAST(SUM(CASE WHEN l_returnflag = 'R' THEN "
        "CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT) "
        "ELSE 0 END) AS DOUBLE) / 100.0 AS returned_total "
        "FROM lineitem "
        "JOIN supplier ON s_suppkey = l_suppkey "
        "JOIN nation ON n_nationkey = s_nationkey "
        "GROUP BY n_name, yr "
        "ORDER BY n_name, yr"
    ),
)
def tpcds_monthly_return_pivot(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """TPC-DS Q66 shape (staged r16) — THE WIDE MONTH-PIVOT REPORT:
    per (supplier nation, ship year), twelve monthly revenue columns
    materialize from ONE fact pass of conditional sums — Q66's
    signature 'jan_sales … dec_sales' pivot — split into kept vs
    returned streams (this fixture's twin of Q66's two ship-mode
    families) plus year totals. The spec spells the pivot as a UNION
    ALL of two scans; here both streams and all twelve months come
    out of a single aggregate.

    Plan shape at 100 TB: the 14 conditional sums are all map-side
    combinable, so the one shuffle carries |nation × year| × 14
    cells — a few hundred rows of state per partial regardless of
    fact volume (Q66's warehouse grain is the same trick). The
    supplier join shuffles on suppkey once (or broadcasts at small
    dimension scale — AQE decides); nation broadcasts. No window, no
    second fact pass.
    Reference scope: `ICEBERG-Interoperability-Test-Spec.md:43`."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_suppkey", "l_shipdate", "l_returnflag",
        "l_extendedprice", "l_discount")
    sup = load_table(spark, "supplier", sf_dir).select(
        "s_suppkey", "s_nationkey")
    nation = load_table(spark, "nation", sf_dir).select(
        "n_nationkey", "n_name")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    kept = F.col("l_returnflag") != "R"
    zero = F.lit(0).cast("bigint")
    monthly = [
        (F.sum(F.when((F.month("l_shipdate") == m) & kept, cents)
               .otherwise(zero)).cast("double") / 100.0)
        .alias(f"kept_m{m:02d}")
        for m in range(1, 13)
    ]
    return (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .groupBy(
            "n_name",
            F.year("l_shipdate").cast("bigint").alias("yr"),
        )
        .agg(
            *monthly,
            (F.sum(F.when(kept, cents).otherwise(zero))
             .cast("double") / 100.0).alias("kept_total"),
            (F.sum(F.when(~kept, cents).otherwise(zero))
             .cast("double") / 100.0).alias("returned_total"),
        )
        .orderBy("n_name", "yr")
    )


@register(
    "tpcds_two_existential_shipping",
    oracle=(
        # Q94/Q95 on the Q21 spine: orders qualified by TWO
        # existential tests — EXISTS a second line from a DIFFERENT
        # supplier, NOT EXISTS any returned line — reported per
        # priority. The oracle spells the literal EXISTS/NOT EXISTS;
        # the Spark plan collapses both into ONE lineitem aggregate.
        "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders, "
        "CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) "
        "  / 100.0 AS total_price "
        "FROM orders "
        "WHERE EXISTS (SELECT 1 FROM lineitem a, lineitem b "
        "  WHERE a.l_orderkey = o_orderkey AND b.l_orderkey = o_orderkey "
        "  AND a.l_suppkey <> b.l_suppkey) "
        "AND NOT EXISTS (SELECT 1 FROM lineitem "
        "  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R') "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"
    ),
)
def tpcds_two_existential_shipping(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """TPC-DS Q94/Q95 shape (staged r16) — THE DOUBLE-EXISTENTIAL
    ORDER FILTER: an order qualifies when a second line item shipped
    from a DIFFERENT supplier EXISTS (multi-warehouse fulfilment,
    Q94's wh1<>wh2 self-join) and NO returned line EXISTS (Q94's
    NOT EXISTS on web_returns); qualifying orders report count and
    total value per priority. The spec spells a lineitem self-join
    plus an anti-join; both existentials collapse into ONE lineitem
    aggregate — COUNT(DISTINCT supplier) >= 2 covers the positive
    test and MAX(returned)=0 the negative, per order key.

    Plan shape at 100 TB: one lineitem pass partial-aggregates to
    |orders| qualification cells (both tests map-side combinable —
    the distinct-supplier count partial-aggregates per orderkey), the
    HAVING keeps qualified keys, and the orders join is KEY-CO-LOCATED
    on orderkey (Q95's own plan joins web_sales to itself and to
    web_returns on ws_order_number the same way). The report is
    |priorities| rows. No self-join of the fact ever materializes.
    Reference scope: `ICEBERG-Interoperability-Test-Spec.md:43`."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_suppkey", "l_returnflag")
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderpriority", "o_totalprice")
    quals = (
        li.groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.max((F.col("l_returnflag") == "R").cast("int"))
            .alias("any_ret"),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("any_ret") == 0))
        .select("l_orderkey")
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    return (
        orders.join(quals, orders.o_orderkey == quals.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(cents).cast("double") / 100.0).alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "tpcds_cross_channel_netted_ratio",
    oracle=(
        # Q78 on the Q75 spine: per (part, year), urgent-vs-standard
        # channel revenue EXCLUDING returned lines (the "netted"
        # sales Q78 keeps after its returns anti-join); parts selling
        # on both channels rank by the urgent/standard ratio. Cents
        # stay integer; the rendered ratio divides identical BIGINTs.
        "WITH net AS ("
        "  SELECT l_partkey, "
        "    CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr, "
        "    CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') "
        "      THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) "
        "      AS BIGINT) ELSE 0 END) AS BIGINT) AS u, "
        "    CAST(SUM(CASE WHEN o_orderpriority NOT IN "
        "      ('1-URGENT','2-HIGH') "
        "      THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) "
        "      AS BIGINT) ELSE 0 END) AS BIGINT) AS s "
        "  FROM lineitem JOIN orders ON o_orderkey = l_orderkey "
        "  WHERE l_returnflag <> 'R' "
        "  GROUP BY l_partkey, yr"
        ") "
        "SELECT l_partkey AS partkey, yr, "
        "  CAST(u AS DOUBLE) / 100.0 AS urgent_rev, "
        "  CAST(s AS DOUBLE) / 100.0 AS std_rev, "
        "  CAST(u AS DOUBLE) / s AS channel_ratio "
        "FROM net WHERE u > 0 AND s > 0 "
        "ORDER BY channel_ratio DESC, partkey, yr LIMIT 100"
    ),
)
def tpcds_cross_channel_netted_ratio(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """TPC-DS Q78 shape (staged r16) — CROSS-CHANNEL RATIO OVER
    NETTED SALES: Q78 removes sold-and-returned rows (a returns
    anti-join per channel), aggregates what remains per (item, year)
    per channel, and ranks items selling on both channels by the
    channel ratio. On this fixture the returned-line filter
    (l_returnflag <> 'R') is Q78's netting, urgent-vs-standard
    priority is the channel split (the Q75/Q11 convention), and the
    ratio renders by dividing identical integer-cent BIGINTs.

    Plan shape at 100 TB: the returns filter pushes into the lineitem
    scan (a predicate, not Q78's anti-join — the fixture marks
    returns in-row, which is exactly how a netted fact table lands
    after CDC), the orders join shuffles on orderkey once, both
    channels' cells come from ONE conditional aggregate (map-side
    combinable) at |parts × years| grain, and the report is a
    TakeOrdered top-100. One fact pass; Q78's three per-channel CTE
    scans collapse to one.
    Reference scope: `ICEBERG-Interoperability-Test-Spec.md:43`."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_partkey", "l_extendedprice", "l_discount",
        "l_returnflag")
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderdate", "o_orderpriority")
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    zero = F.lit(0).cast("bigint")
    net = (
        li.filter(F.col("l_returnflag") != "R")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            "l_partkey",
            F.year("o_orderdate").cast("bigint").alias("yr"),
        )
        .agg(
            F.sum(F.when(urgent, cents).otherwise(zero)).alias("u"),
            F.sum(F.when(~urgent, cents).otherwise(zero)).alias("s"),
        )
    )
    return (
        net.filter((F.col("u") > 0) & (F.col("s") > 0))
        .select(
            F.col("l_partkey").alias("partkey"), "yr",
            (F.col("u").cast("double") / 100.0).alias("urgent_rev"),
            (F.col("s").cast("double") / 100.0).alias("std_rev"),
            (F.col("u").cast("double") / F.col("s"))
            .alias("channel_ratio"),
        )
        .orderBy(F.desc("channel_ratio"), "partkey", "yr")
        .limit(100)
    )


@register(
    "tpcds_customer_channel_setops",
    oracle=(
        # Q38/Q87: the set-operation signature over per-channel
        # DISTINCT customer sets — INTERSECT of all three channels
        # (Q38) and the EXCEPT chain leaving single-channel customers
        # (Q87), spelled LITERALLY here; the Spark plan computes both
        # from ONE aggregate (channel bitmask per customer).
        "WITH ch AS (SELECT o_custkey, "
        "  CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'a' "
        "       WHEN o_orderpriority = '3-MEDIUM' THEN 'b' "
        "       ELSE 'c' END AS channel FROM orders) "
        "SELECT "
        "CAST((SELECT COUNT(*) FROM ("
        "  SELECT DISTINCT o_custkey FROM ch WHERE channel = 'a' "
        "  INTERSECT SELECT DISTINCT o_custkey FROM ch WHERE channel = 'b' "
        "  INTERSECT SELECT DISTINCT o_custkey FROM ch WHERE channel = 'c')"
        ") AS BIGINT) AS in_all_three, "
        "CAST((SELECT COUNT(*) FROM ("
        "  SELECT DISTINCT o_custkey FROM ch WHERE channel = 'a' "
        "  EXCEPT SELECT DISTINCT o_custkey FROM ch WHERE channel = 'b' "
        "  EXCEPT SELECT DISTINCT o_custkey FROM ch WHERE channel = 'c')"
        ") AS BIGINT) AS only_urgent"
    ),
)
def tpcds_customer_channel_setops(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """TPC-DS Q38/Q87 shape (staged r16) — THE SET-OPERATION
    SIGNATURE: Q38 counts customers active in ALL THREE channels
    (two INTERSECTs of distinct customer-date sets), Q87 counts
    customers in the first channel and NEITHER other (two EXCEPTs).
    The oracle spells the literal INTERSECT / EXCEPT chains; the
    Spark side computes BOTH answers from ONE aggregate — per
    customer, a channel BITMASK via conditional MAXes — so the six
    distinct-set scans and four set operations of the reference SQL
    collapse to a single fact pass.

    Plan shape at 100 TB: one orders scan partial-aggregates three
    boolean MAXes per customer (map-side combinable — each partial
    carries |customers-in-partition| rows), one shuffle on custkey,
    then a second map-side-combinable aggregate folds the masks into
    the two counts (2 rows cross the second exchange per partition).
    Spark's own INTERSECT/EXCEPT would plan three aggregates + two
    joins over the same scan read three times.
    Reference scope: `ICEBERG-Interoperability-Test-Spec.md:43`."""
    orders = load_table(spark, "orders", sf_dir).select(
        "o_custkey", "o_orderpriority")
    a = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    b = F.col("o_orderpriority") == "3-MEDIUM"
    masks = orders.groupBy("o_custkey").agg(
        F.max(a.cast("int")).alias("in_a"),
        F.max(b.cast("int")).alias("in_b"),
        F.max((~a & ~b).cast("int")).alias("in_c"),
    )
    all3 = (F.col("in_a") == 1) & (F.col("in_b") == 1) \
        & (F.col("in_c") == 1)
    only_a = (F.col("in_a") == 1) & (F.col("in_b") == 0) \
        & (F.col("in_c") == 0)
    return masks.agg(
        F.sum(all3.cast("long")).alias("in_all_three"),
        F.sum(only_a.cast("long")).alias("only_urgent"),
    )
