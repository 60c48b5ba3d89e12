"""TPC-H completion — the 11 query shapes rounds 1-5 had not yet
covered (Q2, Q4, Q7, Q9, Q11, Q12, Q13, Q14, Q15, Q16, Q20), closing
the full 22-query suite together with the existing
pricing_summary (Q1), shipping_priority_top10 (Q3), Q5, Q6, Q8, Q10,
Q17, Q18, Q19, Q21, Q22.

Adaptation note (consistent with the Q21/Q22 precedent): the driver
corpus is TPC-H-ish, not TPC-H — there is no partsupp table, no
receipt/commit dates, no comment columns, and p_type/p_name carry a
small synthetic vocabulary. Queries that reference the missing
surface are adapted to preserve the PLAN SHAPE the original
exercises (correlated min, exists/not-exists decorrelation,
left-join histogram, scalar-threshold having, distinct-count
anti-join, correlated volume fraction) with lineitem serving as the
part↔supplier bridge where partsupp would. Every adaptation is
spelled out in the query's docstring and pinned by its DuckDB oracle.

Scale shape, shared across the module: dimension tables (region,
nation, supplier, part) broadcast; the only wide shuffles are the
fact-fact joins (lineitem ⋈ orders) and fact aggregations on their
natural keys; scan-level filters (year windows, flags) land in
PushedFilters before any shuffle. Float-keyed comparisons across
engines go through ROUND(x, 2) + integer tiebreaks so ranking is
cross-engine deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


def _year_filter(col: str, year: int):
    return (F.col(col) >= f"{year}-01-01") & (F.col(col) < f"{year + 1}-01-01")


@register(
    "tpch_q2_min_cost_supplier",
    oracle=(
        # Correlated-min over the lineitem-derived "supply cost": the
        # cheapest EUROPE supplier per STANDARD part, cost = that
        # supplier's average unit price for the part, rounded to cents
        # with s_suppkey as the deterministic tiebreak.
        "WITH supply AS ("
        " SELECT l_partkey, l_suppkey, "
        "  ROUND(SUM(l_extendedprice) / SUM(l_quantity), 2) AS unit_cost "
        " FROM lineitem GROUP BY l_partkey, l_suppkey), "
        "euro AS ("
        " SELECT s_suppkey, s_name, s_acctbal, n_name FROM supplier "
        " JOIN nation ON s_nationkey = n_nationkey "
        " JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'), "
        "ranked AS ("
        " SELECT p.p_partkey, e.s_name, e.s_acctbal, e.n_name, sp.unit_cost, "
        "  ROW_NUMBER() OVER (PARTITION BY p.p_partkey "
        "   ORDER BY sp.unit_cost, sp.l_suppkey) AS rn "
        " FROM part p JOIN supply sp ON p.p_partkey = sp.l_partkey "
        " JOIN euro e ON sp.l_suppkey = e.s_suppkey "
        " WHERE p.p_type = 'STANDARD' AND p.p_size <= 10) "
        "SELECT ROUND(s_acctbal, 2) AS s_acctbal, s_name, n_name, "
        "p_partkey, unit_cost "
        "FROM ranked WHERE rn = 1 "
        "ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100"
    ),
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (adapted) — minimum-cost supplier. The original's
    correlated ``ps_supplycost = (SELECT MIN ...)`` runs over
    partsupp; this corpus has none, so the supply relation derives
    from lineitem history (a supplier's unit cost for a part = its
    average selling price there — the same correlated-min plan over a
    bridge the optimizer must pre-aggregate). Rewritten as a window
    rank instead of a correlated scalar: one hash aggregation builds
    the supply table, dims broadcast onto it, and ROW_NUMBER over
    (part → cost, suppkey) picks each part's cheapest European
    supplier without a self-join — the decorrelation Spark's optimizer
    cannot do for a correlated MIN with an outer equality on a
    computed column. Costs are rounded to cents before ranking so the
    winner is cross-engine deterministic."""
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 10)
    ).select("p_partkey")
    # The supply aggregate is part-keyed, so the part predicate prunes
    # lineitem BEFORE the wide (partkey, suppkey) shuffle — a
    # broadcast semi-join cuts the exchange by the part selectivity
    # with no change to per-(part, supplier) unit costs.
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
    )
    supply = li.groupBy("l_partkey", "l_suppkey").agg(
        F.round(F.sum("l_extendedprice") / F.sum("l_quantity"), 2).alias("unit_cost")
    )
    euro = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").join(
                    F.broadcast(
                        _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ranked = (
        supply.withColumnRenamed("l_partkey", "p_partkey")
        .join(F.broadcast(euro), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("p_partkey").orderBy("unit_cost", "l_suppkey")
            ),
        )
        .filter(F.col("rn") == 1)
    )
    return ranked.select(
        F.round("s_acctbal", 2).alias("s_acctbal"), "s_name", "n_name",
        "p_partkey", "unit_cost",
    ).orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey").limit(100)


@register(
    "tpch_q4_order_priority",
    oracle=(
        # EXISTS formulation; the Spark side runs the decorrelated
        # left-semi rewrite. Adapted: no commit/receipt dates in this
        # corpus, so the "late line" marker is l_returnflag = 'R'
        # (the Q21 precedent).
        "SELECT o_orderpriority, COUNT(*) AS order_count FROM orders "
        "WHERE o_orderdate >= TIMESTAMP '1997-07-01' "
        "AND o_orderdate < TIMESTAMP '1997-10-01' "
        "AND EXISTS (SELECT 1 FROM lineitem "
        " WHERE l_orderkey = o_orderkey AND l_returnflag = 'R') "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"
    ),
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 — order-priority checking: one quarter's orders having
    at least one problem line, counted by priority. The EXISTS
    decorrelates to a LEFT SEMI join; the quarter filter prunes orders
    at the scan and the returnflag filter prunes lineitem before the
    semi-join shuffles, so the join input is the problem lines only
    (~1/3 of the fact), and the final GROUP BY runs on the five-row
    priority domain (map-side partial aggregation collapses it)."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-07-01") & (F.col("o_orderdate") < "1997-10-01")
    ).select("o_orderkey", "o_orderpriority")
    problem = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey")
    return (
        o.join(problem, o.o_orderkey == problem.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "tpch_q7_volume_shipping",
    oracle=(
        "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
        "CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year, "
        "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue "
        "FROM supplier, lineitem, orders, customer, nation n1, nation n2 "
        "WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey "
        "AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey "
        "AND c_nationkey = n2.n_nationkey "
        "AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') "
        " OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) "
        "AND l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1998-01-01' "
        "GROUP BY supp_nation, cust_nation, l_year "
        "ORDER BY supp_nation, cust_nation, l_year"
    ),
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 — volume shipping between two nations, both directions,
    by ship year. The disjunctive nation-pair predicate cannot land on
    a single scan, but each HALF of it can: supplier pre-filters to
    the two nations (broadcast), customer likewise, and the pair
    filter runs after the broadcast joins on two tiny columns — the
    fact tables shuffle once each (lineitem ⋈ orders), already cut by
    the two-year ship window at the scan."""
    two = ["NATION_1", "NATION_2"]
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name").isin(two))
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    c = _t(spark, sf_dir, "customer").join(
        F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "tpch_q9_product_type_profit",
    oracle=(
        # Adapted: no partsupp.ps_supplycost — the cost model is 60% of
        # the part's retail price per unit, preserving the original's
        # profit expression shape (revenue minus quantity-scaled cost).
        "SELECT n_name AS nation_name, "
        "CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year, "
        "ROUND(SUM(l_extendedprice * (1 - l_discount) "
        " - 0.6 * p_retailprice * l_quantity), 2) AS sum_profit "
        "FROM lineitem JOIN orders ON o_orderkey = l_orderkey "
        "JOIN part ON p_partkey = l_partkey "
        "JOIN supplier ON s_suppkey = l_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "WHERE p_name LIKE '%widget%' "
        "GROUP BY nation_name, o_year ORDER BY nation_name, o_year DESC"
    ),
)
def tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 — product-type profit by nation and year. Adapted cost
    model (no partsupp): unit cost = 60% of p_retailprice, keeping the
    profit expression's revenue-minus-scaled-cost shape. The part-name
    LIKE filter reduces the part dim BEFORE it broadcasts, and that
    broadcast join prunes lineitem to matching parts ahead of the one
    wide shuffle (lineitem ⋈ orders); supplier→nation broadcasts; the
    group-by runs on (25 nations × years)."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%")).select(
        "p_partkey", "p_retailprice"
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    sn = _t(spark, sf_dir, "supplier").join(
        F.broadcast(_t(spark, sf_dir, "nation")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("nation_name"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation_name", F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
                ),
                2,
            ).alias("sum_profit")
        )
        .orderBy("nation_name", F.desc("o_year"))
    )


@register(
    "tpch_q11_important_stock",
    oracle=(
        # Adapted: part "value" = lineitem revenue through EUROPE
        # suppliers (no partsupp); the HAVING threshold is the
        # original's scalar-subquery fraction of the total.
        "WITH v AS ("
        " SELECT l_partkey, SUM(l_extendedprice) AS val FROM lineitem "
        " JOIN supplier ON s_suppkey = l_suppkey "
        " JOIN nation ON s_nationkey = n_nationkey "
        " JOIN region ON n_regionkey = r_regionkey "
        " WHERE r_name = 'EUROPE' GROUP BY l_partkey) "
        "SELECT l_partkey AS p_partkey, ROUND(val, 2) AS part_value "
        "FROM v WHERE ROUND(val, 2) > "
        "(SELECT ROUND(SUM(val) * 0.001, 2) FROM v) "
        "ORDER BY part_value DESC, p_partkey LIMIT 100"
    ),
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 — important stock identification: parts whose value
    through one region's suppliers exceeds a fraction of the total.
    Adapted value metric (no partsupp): lineitem revenue via EUROPE
    suppliers. The scalar threshold subquery re-aggregates the SAME
    grouped relation, so the plan computes `v` once, derives the
    global total as a 1-row re-aggregation, and broadcasts it back as
    a cross-join scalar — two passes over a grouped (not raw) fact,
    never two fact scans."""
    euro_s = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").join(
                    F.broadcast(
                        _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    v = (
        _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(F.broadcast(euro_s), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum("l_extendedprice").alias("val"))
    )
    total = v.agg(F.round(F.sum("val") * 0.001, 2).alias("threshold"))
    return (
        v.crossJoin(F.broadcast(total))
        .filter(F.round(F.col("val"), 2) > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round("val", 2).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "p_partkey")
        .limit(100)
    )


@register(
    "tpch_q12_priority_shipping",
    oracle=(
        # Adapted: no l_shipmode — the grouping dimension is
        # l_linestatus; high/low split by order priority, one ship year.
        "SELECT l_linestatus, "
        "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
        " THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
        "CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') "
        " THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count "
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey "
        "WHERE l_shipdate >= TIMESTAMP '1997-01-01' "
        "AND l_shipdate < TIMESTAMP '1998-01-01' "
        "GROUP BY l_linestatus ORDER BY l_linestatus"
    ),
)
def tpch_q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 — shipping-priority split (adapted: l_linestatus
    stands in for the missing l_shipmode). One fact-fact join cut by
    the ship-year scan filter, then conditional aggregation over the
    two-row status domain — the map-side partial aggregation collapses
    everything before the exchange."""
    li = _t(spark, sf_dir, "lineitem").filter(_year_filter("l_shipdate", 1997)).select(
        "l_orderkey", "l_linestatus"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(high.cast("bigint")).alias("high_line_count"),
            F.sum((~high).cast("bigint")).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "tpch_q13_customer_distribution",
    oracle=(
        # Adapted exclusion: no o_comment — '4-NOT SPECIFIED' orders
        # are the "special requests" analog.
        "SELECT c_count, COUNT(*) AS custdist FROM ("
        " SELECT c_custkey, COUNT(o_orderkey) AS c_count "
        " FROM customer LEFT OUTER JOIN orders "
        " ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED' "
        " GROUP BY c_custkey) "
        "GROUP BY c_count ORDER BY custdist DESC, c_count DESC"
    ),
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 — customer order-count distribution: LEFT OUTER join
    so zero-order customers land in the c_count=0 bucket (the bucket
    an inner join silently loses), then a two-level aggregation. The
    join predicate's non-key half (the priority exclusion) prunes
    orders at the scan; the first aggregation shuffles on c_custkey,
    the histogram re-aggregation runs on the tiny count domain."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    ).select("o_orderkey", "o_custkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "tpch_q14_promotion_effect",
    oracle=(
        "SELECT ROUND(100.00 * SUM(CASE WHEN p_type = 'PROMO' "
        " THEN l_extendedprice * (1 - l_discount) ELSE 0 END) "
        " / SUM(l_extendedprice * (1 - l_discount)), 2) AS promo_revenue_pct "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "WHERE l_shipdate >= TIMESTAMP '1997-09-01' "
        "AND l_shipdate < TIMESTAMP '1997-10-01'"
    ),
)
def tpch_q14_promotion_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 — promotion effect: promo revenue share for one ship
    month (p_type = 'PROMO' is this corpus's literal promo type — no
    LIKE needed). The month filter prunes lineitem at the scan to
    ~1/80 of the fact, part broadcasts, and both conditional sums ride
    one aggregation — a single-row result with no wide shuffle at
    all."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    ).select("l_partkey", "l_extendedprice", "l_discount")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                2,
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "tpch_q15_top_supplier",
    oracle=(
        "WITH revenue AS ("
        " SELECT l_suppkey AS supplier_no, "
        "  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue "
        " FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01' "
        " AND l_shipdate < TIMESTAMP '1997-04-01' GROUP BY l_suppkey) "
        "SELECT s_suppkey, s_name, total_revenue FROM supplier "
        "JOIN revenue ON s_suppkey = supplier_no "
        "WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue) "
        "ORDER BY s_suppkey"
    ),
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 — top supplier: the supplier(s) whose one-quarter
    revenue equals the maximum (the original's view + scalar-MAX
    subquery). The revenue view is computed ONCE (a grouped
    aggregation over the quarter-pruned fact); the MAX re-aggregates
    that small grouped relation to one row and broadcasts back as an
    equality filter. Revenues are rounded to cents BEFORE the max
    comparison so the equality is cross-engine stable (float sums
    differ in the last ulp between engines; cents don't)."""
    rev = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    top = rev.agg(F.max("total_revenue").alias("max_revenue"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q16_parts_supplier",
    oracle=(
        # Adapted: lineitem is the part↔supplier bridge (no partsupp);
        # the "complaints" exclusion is s_acctbal < 0.
        "SELECT p_brand, p_type, p_size, "
        "COUNT(DISTINCT l_suppkey) AS supplier_cnt "
        "FROM lineitem JOIN part ON p_partkey = l_partkey "
        "WHERE p_brand <> 'Brand#1' AND p_size IN (1, 7, 14, 23, 36, 45, 19, 3) "
        "AND l_suppkey NOT IN "
        " (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) "
        "GROUP BY p_brand, p_type, p_size "
        "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 100"
    ),
)
def tpch_q16_parts_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 — parts/supplier relationship: distinct suppliers per
    (brand, type, size) bucket, excluding flagged suppliers. Adapted:
    lineitem bridges part↔supplier and negative account balance marks
    the excluded suppliers. The NOT IN decorrelates to a LEFT ANTI
    broadcast join (safe here: s_suppkey is non-null, sidestepping NOT
    IN's three-valued-logic trap); part pre-filters on brand+size
    before broadcasting; COUNT(DISTINCT) shuffles once on the grouped
    keys with the distinct expand riding the same exchange."""
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 7, 14, 23, 36, 45, 19, 3)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(100)
    )


@register(
    "tpch_q20_potential_promotion",
    oracle=(
        # Adapted: "availqty > half of sold" becomes "this supplier
        # shipped > 30% of the part's total 1997 volume" — the same
        # correlated-fraction shape over the lineitem bridge.
        "WITH sp AS ("
        " SELECT l_suppkey, l_partkey, SUM(l_quantity) AS qty FROM lineitem "
        " WHERE l_shipdate >= TIMESTAMP '1997-01-01' "
        " AND l_shipdate < TIMESTAMP '1998-01-01' "
        " GROUP BY l_suppkey, l_partkey), "
        "pt AS (SELECT l_partkey, SUM(qty) AS total_qty FROM sp GROUP BY l_partkey) "
        "SELECT DISTINCT s_name FROM supplier "
        "JOIN sp ON s_suppkey = sp.l_suppkey "
        "JOIN pt ON sp.l_partkey = pt.l_partkey "
        "JOIN part ON part.p_partkey = sp.l_partkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "WHERE p_name LIKE 'small%' AND n_name = 'NATION_3' "
        "AND sp.qty > 0.3 * pt.total_qty "
        "ORDER BY s_name"
    ),
)
def tpch_q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 — potential part promotion: suppliers of one nation
    who dominate a 'small%' part's yearly volume. The original's
    nested IN-chain over partsupp becomes the same correlated-fraction
    test over the lineitem bridge: per-(supplier, part) quantity vs a
    0.3 share of the part's total. The plan aggregates the
    year-pruned fact ONCE, re-aggregates that grouped relation
    per-part (grouped→grouped, no second fact scan), joins the two on
    l_partkey, and broadcasts the filtered part + nation-filtered
    supplier dims; DISTINCT collapses multi-part winners. Quantities
    are integral doubles, so the share comparison is exact in both
    engines."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select(
        "p_partkey"
    )
    # Both aggregates are part-keyed, so the 'small%' predicate prunes
    # the year-filtered fact BEFORE the first wide shuffle; per-part
    # totals over surviving parts are unchanged.
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(_year_filter("l_shipdate", 1997))
        .select("l_suppkey", "l_partkey", "l_quantity")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
    )
    sp = li.groupBy("l_suppkey", "l_partkey").agg(F.sum("l_quantity").alias("qty"))
    pt = sp.groupBy("l_partkey").agg(F.sum("qty").alias("total_qty")).withColumnRenamed(
        "l_partkey", "pt_partkey"
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        sp.join(pt, F.col("l_partkey") == F.col("pt_partkey"))
        .filter(F.col("qty") > 0.3 * F.col("total_qty"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name")
        .distinct()
        .orderBy("s_name")
    )
