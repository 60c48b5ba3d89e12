"""Extended relational corpus: outer joins, correlated subqueries,
HAVING, conditional aggregation, grouping sets, and the window-function
family beyond top-N. All additive beyond the reference surface
(SURVEY.md §2.9) — a user switching engines expects the full ANSI
relational vocabulary, and each entry here is oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


@register(
    "left_outer_join_orders",
    oracle=(
        "SELECT c.c_custkey, c.c_mktsegment, "
        "CAST(COUNT(o.o_orderkey) AS BIGINT) AS order_cnt, "
        "ROUND(COALESCE(SUM(o.o_totalprice), 0), 2) AS total_spend "
        "FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey "
        "GROUP BY c.c_custkey, c.c_mktsegment"
    ),
)
def left_outer_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER fact join preserving customers with zero orders —
    COUNT(col) (null-skipping) vs COUNT(*) semantics are part of what
    the oracle pins down."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("order_cnt"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0)), 2).alias("total_spend"),
        )
    )


@register(
    "full_outer_join_sets",
    oracle=(
        "SELECT COALESCE(a.k, b.k) AS k, a.cnt_even, b.cnt_five FROM "
        "(SELECT o_orderkey % 7 AS k, COUNT(*) AS cnt_even FROM orders "
        "WHERE o_orderkey % 2 = 0 GROUP BY o_orderkey % 7) a "
        "FULL OUTER JOIN "
        "(SELECT o_orderkey % 11 AS k, COUNT(*) AS cnt_five FROM orders "
        "WHERE o_orderkey % 5 = 0 GROUP BY o_orderkey % 11) b "
        "ON a.k = b.k"
    ),
)
def full_outer_join_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregates with non-overlapping key
    domains (mod-7 vs mod-11 buckets) — exercises null-filling on both
    sides."""
    o = _t(spark, sf_dir, "orders")
    a = (
        o.filter(F.col("o_orderkey") % 2 == 0)
        .groupBy((F.col("o_orderkey") % 7).alias("k"))
        .agg(F.count(F.lit(1)).alias("cnt_even"))
    )
    b = (
        o.filter(F.col("o_orderkey") % 5 == 0)
        .groupBy((F.col("o_orderkey") % 11).alias("k"))
        .agg(F.count(F.lit(1)).alias("cnt_five"))
    )
    return a.join(b, a.k == b.k, "full_outer").select(
        F.coalesce(a.k, b.k).alias("k"), "cnt_even", "cnt_five"
    )


@register(
    "having_filter",
    oracle=(
        "SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS order_cnt "
        "FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15"
    ),
)
def having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ... HAVING — post-aggregation predicate."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("order_cnt"))
        .filter(F.col("order_cnt") >= 15)
    )


@register(
    "conditional_aggregation",
    oracle=(
        "SELECT l_returnflag, "
        "ROUND(SUM(CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0 END), 2) "
        "AS discounted_revenue, "
        "ROUND(100.0 * SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) / COUNT(*), 4) "
        "AS discounted_pct FROM lineitem GROUP BY l_returnflag"
    ),
)
def conditional_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style CASE-WHEN inside aggregates (promo-revenue
    share shape)."""
    li = _t(spark, sf_dir, "lineitem")
    disc = F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice")).otherwise(0)
    flag = F.when(F.col("l_discount") > 0.05, 1).otherwise(0)
    return li.groupBy("l_returnflag").agg(
        F.round(F.sum(disc), 2).alias("discounted_revenue"),
        F.round(100.0 * F.sum(flag) / F.count(F.lit(1)), 4).alias("discounted_pct"),
    )


@register(
    "correlated_exists_subquery",
    oracle=(
        "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_cnt "
        "FROM orders o WHERE EXISTS (SELECT 1 FROM lineitem l "
        "WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45) "
        "GROUP BY o_orderpriority"
    ),
)
def correlated_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS decorrelated to a left-semi
    join (what Catalyst does with the SQL form; expressed directly
    here so the physical plan is the one you'd want)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_cnt"))
    )


@register(
    "scalar_subquery_above_avg",
    oracle=(
        "SELECT CAST(COUNT(*) AS BIGINT) AS above_avg_parts FROM part "
        "WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part)"
    ),
)
def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (global average) as a cross-joined 1-row
    aggregate — the broadcast-scalar pattern."""
    p = _t(spark, sf_dir, "part")
    avg = p.agg(F.avg("p_retailprice").alias("avg_price"))
    return (
        p.crossJoin(F.broadcast(avg))
        .filter(F.col("p_retailprice") > F.col("avg_price"))
        .agg(F.count(F.lit(1)).alias("above_avg_parts"))
    )


@register(
    "window_lag_delta",
    oracle=(
        "SELECT user_id, event_id, "
        "ROUND(value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 4) "
        "AS delta_value, "
        "CAST(RANK() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS BIGINT) "
        "AS value_rank "
        "FROM events WHERE user_id < 15"
    ),
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG deltas + RANK in one window pass — change-detection shape."""
    w_time = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_rank = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id") < 15)
        .select(
            "user_id",
            "event_id",
            F.round(F.col("value") - F.lag("value").over(w_time), 4).alias("delta_value"),
            F.rank().over(w_rank).cast("bigint").alias("value_rank"),
        )
    )


@register(
    "window_moving_average",
    oracle=(
        "SELECT user_id, event_id, "
        "ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg "
        "FROM events WHERE user_id < 15"
    ),
)
def window_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average (ROWS frame) — the smoothing idiom."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id") < 15)
        .select(
            "user_id", "event_id",
            F.round(F.avg("value").over(w), 4).alias("moving_avg"),
        )
    )


@register(
    "rollup_aggregation",
    oracle=(
        "SELECT l_returnflag, l_linestatus, "
        "ROUND(SUM(l_quantity), 2) AS sum_qty, CAST(COUNT(*) AS BIGINT) AS cnt "
        "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"
    ),
)
def rollup_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy (detail → per-flag subtotal → grand total) in
    one pass — Spark expands grouping sets map-side, one shuffle."""
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


@register(
    "pivot_event_types",
    oracle=(
        "SELECT user_id, "
        "CAST(COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 END), 0) AS BIGINT) AS click, "
        "CAST(COALESCE(SUM(CASE WHEN event_type = 'view' THEN 1 END), 0) AS BIGINT) AS view, "
        "CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS BIGINT) AS purchase "
        "FROM events WHERE user_id < 25 GROUP BY user_id"
    ),
)
def pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (long → wide): per-user counts by event type. Explicit
    value list keeps it one pass with no distinct-values pre-query."""
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id") < 25)
        .groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["click", "view", "purchase"])
    )


@register(
    "unpivot_part_metrics",
    oracle=(
        "SELECT p_partkey, metric, ROUND(val, 2) AS val FROM ("
        "SELECT p_partkey, 'retail' AS metric, p_retailprice AS val FROM part "
        "UNION ALL SELECT p_partkey, 'size', CAST(p_size AS DOUBLE) FROM part)"
    ),
)
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide → long) via the stack() generator — one pass, no
    union of scans."""
    return (
        _t(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.expr("stack(2, 'retail', p_retailprice, 'size', CAST(p_size AS DOUBLE))")
            .alias("metric", "v"),
        )
        .select("p_partkey", "metric", F.round("v", 2).alias("val"))
    )


@register(
    "string_functions_suite",
    oracle=(
        "SELECT p_partkey, UPPER(p_brand) AS brand_upper, "
        "SUBSTRING(p_name, 1, 5) AS name_prefix, "
        "CAST(LENGTH(p_name) AS INT) AS name_len, "
        "REPLACE(p_type, ' ', '_') AS type_snake, "
        "CONCAT(p_brand, ':', p_type) AS brand_type "
        "FROM part"
    ),
)
def string_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Core string vocabulary (upper/substr/length/replace/concat) —
    all JVM built-ins, checked bit-for-bit against the oracle."""
    return _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.length("p_name").cast("int").alias("name_len"),
        F.regexp_replace("p_type", " ", "_").alias("type_snake"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
    )


@register(
    "date_functions_suite",
    oracle=(
        "SELECT o_orderkey, "
        "CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year, "
        "CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month, "
        "strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start, "
        "strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date "
        "FROM orders WHERE o_orderkey <= 400"
    ),
)
def date_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal vocabulary: extract/trunc/interval arithmetic."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 400)
    # dates travel as ISO strings: Spark DateType and DuckDB DATE render
    # differently through pandas, so the contract is the formatted value
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.date_add(F.col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").alias("due_date"),
    )


@register(
    "json_extraction",
    oracle=(
        "SELECT event_id, CAST(json_extract(props, '$.k') AS INT) AS prop_k "
        "FROM events WHERE user_id < 10"
    ),
)
def json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the events.props column (semi-
    structured payloads are routine in event pipelines)."""
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id") < 10)
        .select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
        )
    )


@register(
    "stats_aggregates",
    oracle=(
        "SELECT l_returnflag, "
        "ROUND(stddev_samp(l_extendedprice), 4) AS price_stddev, "
        "ROUND(var_samp(l_quantity), 4) AS qty_var, "
        "ROUND(corr(l_extendedprice, l_quantity), 6) AS price_qty_corr, "
        "ROUND(covar_samp(l_extendedprice, l_discount), 4) AS price_disc_covar, "
        "ROUND(MIN(l_extendedprice), 2) AS min_price, "
        "ROUND(MAX(l_extendedprice), 2) AS max_price "
        "FROM lineitem GROUP BY l_returnflag"
    ),
)
def stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate vocabulary: sample stddev/variance,
    correlation, covariance, min/max — single-pass distributed moments
    (partial aggregation map-side, exact merge)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
        F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("price_qty_corr"),
        F.round(F.covar_samp("l_extendedprice", "l_discount"), 4).alias("price_disc_covar"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


@register(
    "array_functions_suite",
    oracle=(
        "SELECT vec_id, len(embedding) AS dim, "
        "ROUND(list_aggregate(CAST(embedding AS DOUBLE[]), 'sum'), 4) AS vec_sum, "
        "ROUND(list_aggregate(CAST(embedding AS DOUBLE[]), 'max'), 4) AS vec_max, "
        "ROUND(CAST(embedding[1] AS DOUBLE), 4) AS first_dim "
        "FROM embeddings WHERE vec_id < 50"
    ),
)
def array_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-column vocabulary over embeddings: size, element access,
    and higher-order aggregate/max — all JVM built-ins (no UDF), the
    primitives the similarity operators compose."""
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(
            F.expr("aggregate(embedding, 0D, (acc, v) -> acc + CAST(v AS DOUBLE))"), 4
        ).alias("vec_sum"),
        F.round(
            F.expr("aggregate(embedding, CAST(-1e300 AS DOUBLE), (acc, v) -> greatest(acc, CAST(v AS DOUBLE)))"),
            4,
        ).alias("vec_max"),
        F.round(F.expr("CAST(embedding[0] AS DOUBLE)"), 4).alias("first_dim"),
    )


@register(
    "cube_aggregation",
    oracle=(
        "SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS cnt "
        "FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"
    ),
)
def cube_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all 4 combinations) in one pass."""
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "join_skew_salted",
    oracle=(
        "SELECT e.event_type, "
        "CAST(COUNT(*) AS BIGINT) AS event_cnt, "
        "ROUND(SUM(e.value * w.weight), 2) AS weighted_value "
        "FROM events e JOIN (VALUES "
        "('click', 1.0), ('view', 0.5), ('purchase', 5.0), "
        "('signup', 3.0), ('error', 0.0)) AS w(event_type, weight) "
        "ON e.event_type = w.event_type GROUP BY e.event_type"
    ),
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated join via key salting. event_type has 5 values
    over the whole fact table — the worst-case skew for a shuffle
    join (5 reducers own everything). The salting idiom: replicate
    the small side SALT times, scatter the fact side across salts
    with a deterministic hash, join on (key, salt) → every reducer
    gets 1/SALT of each hot key. Results are salt-invariant, so the
    oracle is the plain join. (With a dim this small you'd broadcast
    — AQE's skew-join handles the mid-size case — but salting is the
    tool when BOTH sides are too big to broadcast and one key
    dominates; broadcast is disabled here to force the salted path.)
    """
    SALT = 8
    weights = spark.createDataFrame(
        [("click", 1.0), ("view", 0.5), ("purchase", 5.0), ("signup", 3.0), ("error", 0.0)],
        "event_type string, weight double",
    )
    salted_dim = weights.crossJoin(
        spark.range(SALT).select(F.col("id").cast("int").alias("salt"))
    ).hint("shuffle_hash")
    ev = _t(spark, sf_dir, "events").withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(SALT)).cast("int")
    )
    return (
        ev.join(salted_dim, ["event_type", "salt"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("event_cnt"),
            F.round(F.sum(F.col("value") * F.col("weight")), 2).alias("weighted_value"),
        )
    )


@register(
    "distinct_users_exact",
    oracle=(
        "SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users "
        "FROM events GROUP BY event_type"
    ),
)
def distinct_users_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) per group — expands to a two-phase
    aggregate (dedup shuffle then count). The correctness baseline for
    the HLL variant below."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("distinct_users"))
    )


@register(
    "distinct_users_approx",
    oracle=(
        "SELECT event_type, COUNT(DISTINCT user_id) AS distinct_exact, "
        "TRUE AS approx_within_3rsd FROM events GROUP BY event_type"
    ),
)
def distinct_users_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): single-pass, mergeable,
    fixed-size sketch — at 100 TB this replaces the exact two-phase
    dedup (whose shuffle carries every distinct key).

    Bounded-error oracle: HLL sketch values differ across engines, so
    the query returns the EXACT distinct count (which the oracle can
    reproduce) plus a verdict that the sketch (default rsd 5%) landed
    within 3 standard deviations (±15%) of it, computed in the same
    aggregate. The oracle pins the verdict TRUE — sketch drift turns
    the row red instead of being unverifiable."""
    approx = F.approx_count_distinct("user_id")
    exact = F.countDistinct("user_id")
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            exact.alias("distinct_exact"),
            (
                F.abs(approx.cast("double") - exact.cast("double"))
                <= 0.15 * exact.cast("double")
            ).alias("approx_within_3rsd"),
        )
        .select("event_type", "distinct_exact", "approx_within_3rsd")
    )


@register(
    "grouping_sets_revenue",
    oracle=(
        "SELECT o_orderstatus, o_orderpriority, "
        "CAST(ROUND(SUM(o_totalprice), 2) AS DOUBLE) AS revenue, "
        "CAST(COUNT(*) AS BIGINT) AS n_orders "
        "FROM orders GROUP BY GROUPING SETS "
        "((o_orderstatus, o_orderpriority), (o_orderstatus), ())"
    ),
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond ROLLUP/CUBE — arbitrary set
    lists): revenue at (status, priority), (status), and grand-total
    grains in ONE pass. Spark expands the sets over a single shuffled
    aggregate (Expand + HashAggregate) — one scan feeds every grain,
    where naive SQL would union three scans."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("_gs_orders")
    return spark.sql(
        "SELECT o_orderstatus, o_orderpriority, "
        "CAST(ROUND(SUM(o_totalprice), 2) AS DOUBLE) AS revenue, "
        "COUNT(*) AS n_orders "
        "FROM _gs_orders GROUP BY GROUPING SETS "
        "((o_orderstatus, o_orderpriority), (o_orderstatus), ())"
    )


@register(
    "regexp_functions_suite",
    oracle=(
        "SELECT doc_id, "
        "COALESCE(regexp_extract(text, '([a-z]+)[0-9]+', 1), '') AS first_alnum_stem, "
        "CAST(len(regexp_extract_all(text, '\\b[a-z]{5,}\\b')) AS BIGINT) AS long_words, "
        "regexp_replace(text[1:40], '[aeiou]', '_', 'g') AS devoweled_prefix, "
        "regexp_matches(text, 'table|index') AS mentions_storage "
        "FROM documents"
    ),
)
def regexp_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp surface: extract (group ref), extract_all (count),
    replace (global), and match-test in one projection — all JVM
    expressions inside whole-stage codegen (regex compiles once per
    task, streams through the scan with zero shuffles)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_extract("text", r"([a-z]+)[0-9]+", 1).alias("first_alnum_stem"),
        F.size(F.regexp_extract_all("text", F.lit(r"\b[a-z]{5,}\b"), 0)).cast("bigint").alias("long_words"),
        F.regexp_replace(F.substring("text", 1, 40), "[aeiou]", "_").alias("devoweled_prefix"),
        F.col("text").rlike("table|index").alias("mentions_storage"),
    )


@register(
    "tpch_q5_local_supplier_volume",
    oracle=(
        "SELECT n.n_name AS nation_name, "
        "ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue "
        "FROM lineitem l "
        "JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
        "JOIN nation n ON s.s_nationkey = n.n_nationkey "
        "JOIN region r ON n.n_regionkey = r.r_regionkey "
        "WHERE r.r_name = 'ASIA' AND c.c_nationkey = s.s_nationkey "
        "AND o.o_orderdate >= TIMESTAMP '1997-01-01' "
        "AND o.o_orderdate < TIMESTAMP '1998-01-01' "
        "GROUP BY n.n_name"
    ),
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 proper — local-supplier volume: revenue by nation where
    the customer and the line's supplier share a nation, restricted to
    one region and one order year. Unlike the star-shaped
    `join_multiway_region_revenue`, this is the 6-table plan with a
    fact-fact join (lineitem ⋈ orders) AND a cross-dimension equality
    (c_nationkey = s_nationkey) that join reordering must keep cheap.

    Plan shape: region ⋈ nation pre-reduces to the ~5 Asian nations and
    prunes SUPPLIER before any fact touches it (dim-first reduction);
    supplier and nation broadcast; the only wide shuffles are
    lineitem ⋈ orders and orders ⋈ customer on their natural keys. The
    year filter lands on the orders scan (PushedFilters), cutting the
    fact-fact shuffle ~7× before it happens."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    ).select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    asia_nations = (
        _t(spark, sf_dir, "nation")
        .join(
            F.broadcast(_t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@register(
    "tpch_q10_returned_items",
    oracle=(
        "SELECT c.c_custkey, c.c_name, n.n_name AS nation_name, "
        "ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue "
        "FROM lineitem l "
        "JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN nation n ON c.c_nationkey = n.n_nationkey "
        "WHERE l.l_returnflag = 'R' "
        "AND o.o_orderdate >= TIMESTAMP '1997-07-01' "
        "AND o.o_orderdate < TIMESTAMP '1997-10-01' "
        "GROUP BY c.c_custkey, c.c_name, nation_name "
        "ORDER BY revenue DESC, c.c_custkey LIMIT 20"
    ),
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 — returned-item reporting: the 20 customers who lost
    the most revenue to returns in one quarter. Fact-fact join +
    selective scan filters + grouped top-k.

    Plan shape: the returnflag filter prunes lineitem at the scan
    (~2/3 dropped) and the quarter filter prunes orders before the
    fact-fact shuffle; nation broadcasts; the final top-20 is a
    TakeOrderedAndProject over the grouped aggregate, ordered by the
    ROUNDED revenue with c_custkey as tiebreak so ranking is
    cross-engine deterministic."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-07-01") & (F.col("o_orderdate") < "1997-10-01")
    ).select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation_name"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "sketch_hll_union_rollup",
    oracle=(
        # The scalars the sketch must reproduce are exact SQL; the
        # bound flags are pinned TRUE — at these cardinalities the
        # lgK=12 HLL is in sparse mode and the 5% gate has ~1.6%-error
        # headroom, so a red row means the sketch pipeline broke.
        "SELECT CAST(COUNT(DISTINCT date_trunc('day', CAST(ts AS TIMESTAMP))) "
        "AS BIGINT) AS n_days, TRUE AS daily_within_bounds, "
        "CAST((SELECT COUNT(DISTINCT user_id) FROM events) AS BIGINT) "
        "AS merged_exact_users, TRUE AS merged_within_bounds FROM events"
    ),
)
def sketch_hll_union_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup (the Apache DataSketches pattern Spark
    4 ships natively): per-day distinct-user HLL sketches are built
    ONCE, then the month total comes from ``hll_union_agg`` over the
    30 daily sketches — never re-reading raw events. The in-plan
    verdict checks every daily estimate AND the merged estimate
    against exact distinct counts within the lgK=12 error budget.

    This is THE cube/rollup trick at 100 TB: materialize kilobyte
    sketches per (day, dim) cell and answer any coarser distinct-count
    rollup by unioning cells — turning a full-data re-aggregation into
    a metadata-sized merge. (`distinct_users_approx` gates the same
    estimator per-group; this gates MERGEABILITY.)"""
    ev = load_table(spark, "events", sf_dir).select(
        F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
    )
    daily = ev.groupBy("day").agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    per_day = daily.select(
        "day", "exact_users",
        F.expr("hll_sketch_estimate(sk)").alias("est_users"),
    )
    daily_ok = per_day.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.min(
            (F.abs(F.col("est_users") - F.col("exact_users"))
             <= F.col("exact_users") * 0.05)
        ).alias("daily_within_bounds"),
    )
    merged = daily.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("merged_est")
    )
    merged_exact = ev.agg(F.countDistinct("user_id").alias("merged_exact_users"))
    return (
        daily_ok.crossJoin(merged).crossJoin(merged_exact)
        .select(
            "n_days",
            "daily_within_bounds",
            "merged_exact_users",
            (
                F.abs(F.col("merged_est") - F.col("merged_exact_users"))
                <= F.col("merged_exact_users") * 0.05
            ).alias("merged_within_bounds"),
        )
    )


@register(
    "tpch_q8_market_share",
    oracle=(
        # share-of-total per year: NATION_12 suppliers' slice of all
        # PROMO-part revenue sold to ASIA customers. Integer cents for
        # the numerator/denominator sums keep the ratio cross-engine
        # exact (the mv_incremental_maintenance lesson).
        "WITH rev AS (SELECT EXTRACT(year FROM o.o_orderdate) AS o_year, "
        "CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT) AS cents, "
        "sn.n_name AS supp_nation "
        "FROM lineitem l "
        "JOIN orders o ON l.l_orderkey = o.o_orderkey "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN nation cn ON c.c_nationkey = cn.n_nationkey "
        "JOIN region r ON cn.n_regionkey = r.r_regionkey "
        "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
        "JOIN nation sn ON s.s_nationkey = sn.n_nationkey "
        "JOIN part p ON l.l_partkey = p.p_partkey "
        "WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO') "
        "SELECT CAST(o_year AS INT) AS o_year, "
        "ROUND(SUM(CASE WHEN supp_nation = 'NATION_12' THEN cents ELSE 0 END) "
        "* 1.0 / SUM(cents), 6) AS mkt_share "
        "FROM rev GROUP BY o_year"
    ),
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 — national market share: NATION_12's fraction of
    PROMO-part revenue sold into ASIA, per order year. The 8-table
    join with a conditional-share aggregate (CASE inside SUM over the
    same rows — one pass, not two queries diffed).

    Plan shape: all five dimensions (customer-nation-region chain,
    supplier-nation, filtered part) broadcast; lineitem ⋈ orders is
    the only fact-fact shuffle, pre-pruned by the PROMO part semi-join
    (~1/6 of lineitem survives before the shuffle). Revenue sums in
    integer cents so numerator/denominator — and therefore the rounded
    ratio — are bit-identical across engines."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_partkey", "l_extendedprice", "l_discount"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    asia_cust = c.join(
        F.broadcast(
            n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select("n_nationkey")
        ),
        c.c_nationkey == F.col("n_nationkey"),
    ).select("c_custkey")
    supp_nat = s.join(
        F.broadcast(n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))),
        s.s_nationkey == F.col("sk"),
    ).select("s_suppkey", "supp_nation")
    cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("bigint")
    rev = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(asia_cust), o.o_custkey == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(supp_nat), li.l_suppkey == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            cents.alias("cents"),
            "supp_nation",
        )
    )
    return rev.groupBy(F.col("o_year").cast("int").alias("o_year")).agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_12", F.col("cents")).otherwise(F.lit(0)))
            / F.sum("cents"),
            6,
        ).alias("mkt_share")
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle=(
        "SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue, "
        "CAST(COUNT(*) AS BIGINT) AS qualifying_lines FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1997-01-01' "
        "AND l_shipdate < TIMESTAMP '1998-01-01' "
        "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
    ),
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 — forecast revenue change: a pure filter-aggregate
    whose entire predicate set (date range, discount band, quantity
    cap) must reach the parquet scan as PushedFilters; the plan is one
    scan + one partial/final agg, zero joins, zero wide shuffles —
    the query that measures scan + pushdown efficiency and nothing
    else."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("qualifying_lines"),
        )
    )


@register(
    "tpch_q18_large_volume_customer",
    oracle=(
        "WITH big AS (SELECT l_orderkey FROM lineitem GROUP BY l_orderkey "
        "HAVING SUM(l_quantity) > 150) "
        "SELECT c.c_custkey, c.c_name, o.o_orderkey, "
        "ROUND(o.o_totalprice, 2) AS o_totalprice, "
        "ROUND(SUM(l.l_quantity), 2) AS total_qty "
        "FROM orders o JOIN big ON o.o_orderkey = big.l_orderkey "
        "JOIN customer c ON o.o_custkey = c.c_custkey "
        "JOIN lineitem l ON o.o_orderkey = l.l_orderkey "
        "GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice "
        "ORDER BY o_totalprice DESC, o.o_orderkey LIMIT 25"
    ),
)
def tpch_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 — large-volume customers: orders whose total line
    quantity exceeds a threshold, top 25 by order value. The
    semi-join-on-aggregate shape: the HAVING aggregate reduces
    lineitem to qualifying orderkeys FIRST, and that (tiny) key set
    semi-joins orders before any wide join runs — the aggregate acts
    as its own join filter. Both lineitem passes shuffle on
    l_orderkey, so AQE reuses one exchange; top-25 is
    TakeOrderedAndProject on (rounded totalprice, orderkey)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 150)
        .select("l_orderkey")
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(c, o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"), "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(25)
    )


@register(
    "tpch_q21_sole_fault_supplier",
    oracle=(
        # EXISTS / NOT EXISTS formulation — the textbook Q21 shape
        # (adapted: this corpus has no receipt/commit dates, so the
        # "fault" marker is l_returnflag = 'R'). The Spark side runs
        # the decorrelated rewrite; DuckDB proves them equivalent.
        "SELECT s_name, n_name, COUNT(*) AS numwait "
        "FROM supplier, lineitem l1, orders, nation "
        "WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey "
        "AND o_orderstatus = 'F' AND l1.l_returnflag = 'R' "
        "AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey "
        "AND l2.l_suppkey <> l1.l_suppkey) "
        "AND NOT EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey = l1.l_orderkey "
        "AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R') "
        "AND s_nationkey = n_nationkey "
        "GROUP BY s_name, n_name ORDER BY numwait DESC, s_name LIMIT 100"
    ),
)
def tpch_q21_sole_fault_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — suppliers solely at fault in multi-supplier
    orders (fault = returned line, this corpus's stand-in for
    receipt-past-commit). The reference semantics is a correlated
    EXISTS plus a correlated NOT EXISTS over the same fact table —
    naively two extra lineitem self-joins, each shuffling the fact.

    Spark-first decorrelation: both existentials per order come from
    per-(order, supplier) flags — ``n_supps = count(*)`` over the
    (orderkey, suppkey) groups (EXISTS other supplier ⟺ ≥ 2) and
    ``n_fault = count(groups with a fault line)`` (NOT EXISTS other
    fault supplier ⟺ == 1, since the probe line itself is a fault).
    The r15 optimization round replaced the double countDistinct —
    whose physical plan is an Expand (2x row multiplication) plus a
    wide 4-key distinct exchange plus an orderkey exchange — with ONE
    repartition on l_orderkey followed by two co-located aggregates:
    hashpartitioning(l_orderkey) satisfies the clustering requirement
    of both the (orderkey, suppkey) group and the orderkey rollup, so
    the fact crosses the network once, un-doubled (measured 1.36 →
    0.49 s on the stats subplan at sf0.1; 2 Exchange + 1 Expand → 1
    Exchange). Supplier and nation broadcast. Final top-100 is
    TakeOrderedAndProject on (numwait DESC, s_name) — a total order,
    so LIMIT is deterministic."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    per_supp = (
        li.repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("has_r"))
    )
    stats = per_supp.groupBy("l_orderkey").agg(
        F.count("l_suppkey").alias("n_supps"),
        F.count(F.when(F.col("has_r") == 1, F.col("l_suppkey"))).alias("n_fault"),
    )
    f_orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(stats, "l_orderkey")
        .filter((F.col("n_supps") >= 2) & (F.col("n_fault") == 1))
        .join(f_orders, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name", "n_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


@register(
    "window_time_range_agg",
    oracle=(
        "SELECT o_orderkey, o_custkey, "
        "COUNT(*) OVER w AS orders_30d, "
        "ROUND(SUM(o_totalprice) OVER w, 2) AS revenue_30d "
        "FROM orders WHERE o_custkey < 200 "
        "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate "
        "RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)"
    ),
)
def window_time_range_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame — trailing 30-DAY per-customer order
    count and revenue at every order. The frame is bounded by VALUE
    (event time), not row count: a customer with 50 orders in the
    window aggregates 50 rows, one with 2 aggregates 2 — the shape
    ROWS frames (`window_moving_average`) cannot express, and the one
    every "activity in the last N days" metric needs.

    Spark has no INTERVAL range frame, so the standard idiom applies:
    order by epoch seconds and give `rangeBetween` the interval in
    seconds (−30·86400, 0] — value-based, tie rows (same customer,
    same date) are peers and aggregate together, exactly DuckDB's
    `RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW`.

    Scale shape: one hash exchange on o_custkey + per-partition sort;
    frames are computed by a running accumulator over the sorted
    partition (no per-row rescan). Human customers bound the partition
    size; the bot-key cap idiom (`_without_bot_users`) applies if the
    key were open-ended."""
    w = (
        Window.partitionBy("o_custkey")
        # NTZ → (UTC session) timestamp → epoch seconds; the file
        # stores TIMESTAMP_NTZ which has no direct long cast
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-30 * 86400, 0)
    )
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 200)
        .select(
            "o_orderkey", "o_custkey",
            F.count(F.lit(1)).over(w).alias("orders_30d"),
            F.round(F.sum("o_totalprice").over(w), 2).alias("revenue_30d"),
        )
    )


@register(
    "tpch_q17_small_qty_revenue",
    oracle=(
        # Textbook correlated-scalar-subquery rendering; the Spark side
        # runs the decorrelated rewrite and DuckDB proves equivalence.
        "SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly, "
        "CAST(COUNT(*) AS BIGINT) AS small_qty_lines "
        "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey "
        "WHERE p.p_brand = 'Brand#12' "
        "AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) "
        "FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)"
    ),
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 — small-quantity-order revenue: lineitems of one
    brand whose quantity is under 20% of that part's average quantity
    (lost revenue if such orders moved to bulk). Reference semantics
    is a correlated scalar subquery re-aggregating lineitem PER OUTER
    ROW.

    Spark-first decorrelation: the brand filter hits `part` first
    (tiny → broadcast), the brand's lineitems are pruned by that
    broadcast join BEFORE any aggregate, and the per-part average is
    one map-combined aggregate over the pruned fact whose output is
    |parts in brand| rows — rebroadcast to the pruned fact for the
    threshold filter. The fact never hash-shuffles: every join is a
    broadcast, and the threshold agg's exchange carries partial-avg
    cells (≤ |brand parts| per map task), not rows. The fact IS
    scanned twice (threshold branch + probe branch — the standard
    Spark Q17 plan; the subtrees project different columns so AQE
    can't reuse one exchange), which beats the alternative
    window-over-partition single-scan at scale: the window would
    hash-shuffle every surviving fact row and lose map-side combine.
    Correlation on l_partkey is legal to decorrelate because the
    subquery's only free variable is the equality-correlated key. At
    100 TB the naive plan re-aggregates lineitem per probe row; this
    plan's cost is two narrow scans + three broadcasts."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    brand = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#12")
        .select("p_partkey")
    )
    li_b = li.join(F.broadcast(brand), li.l_partkey == brand.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    thresh = li_b.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("qty_cap")
    ).withColumnRenamed("l_partkey", "t_partkey")
    return (
        li_b.join(F.broadcast(thresh), li_b.l_partkey == thresh.t_partkey)
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("small_qty_lines"),
        )
    )


@register(
    "tpch_q22_global_sales_opportunity",
    oracle=(
        # Phone country codes don't exist in this corpus; c_nationkey
        # plays the cntrycode role (same shape: a computed group key, a
        # scalar-subquery threshold, and NOT EXISTS against orders).
        "SELECT c.c_nationkey AS cntrycode, "
        "CAST(COUNT(*) AS BIGINT) AS numcust, "
        "ROUND(SUM(c.c_acctbal), 2) AS totacctbal "
        "FROM customer c "
        "WHERE c.c_nationkey IN (1, 3, 5, 7, 9, 11, 13) "
        "AND c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2 "
        "WHERE c2.c_acctbal > 0.0 "
        "AND c2.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)) "
        "AND NOT EXISTS (SELECT 1 FROM orders o "
        "WHERE o.o_custkey = c.c_custkey "
        "AND o.o_orderdate >= TIMESTAMP '2001-01-01') "
        "GROUP BY c.c_nationkey ORDER BY cntrycode"
    ),
)
def tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 — global sales opportunity: well-funded customers
    (balance above the positive-balance average of their cohort) in
    target countries with no RECENT order (nothing since 2001-01-01 —
    this corpus's every customer has ancient orders, so the dormancy
    cutoff plays Q22's "no orders in 7 years" role), grouped by
    country. Two classic decorrelations in one query: an uncorrelated
    scalar subquery (the average) and an anti-join (NOT EXISTS).

    Spark-first: the scalar average is computed once on the filtered
    customer slice and attached via a 1-row broadcast crossJoin (no
    driver collect in the plan-build path — the scalar stays a
    DataFrame). The NOT EXISTS compiles to a left_anti join against
    the DISTINCT o_custkey projection; customer is the small side
    here but at scale both sides hash-partition on custkey — the
    anti-join's build input is keys-only (one bigint column), the
    cheapest possible shuffle payload. Grouping is on the 7-value
    nationkey — bounded cells, map-side partials collapse
    everything."""
    target = F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13)
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(target)
        .select("c_custkey", "c_nationkey", "c_acctbal")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    buyers = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2001-01-01")
        .select("o_custkey")
        .distinct()
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(buyers, cust.c_custkey == buyers.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@register(
    "tpch_q19_discounted_revenue",
    oracle=(
        "SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue, "
        "CAST(COUNT(*) AS BIGINT) AS qualifying_lines "
        "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey "
        "WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15 "
        "AND l.l_quantity BETWEEN 1 AND 11) "
        "OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25 "
        "AND l.l_quantity BETWEEN 10 AND 20) "
        "OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35 "
        "AND l.l_quantity BETWEEN 20 AND 30)"
    ),
)
def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 — discounted revenue: a DISJUNCTION of three
    (brand, size-band, quantity-band) conjunctions spanning BOTH join
    sides. The shape is the optimizer's disjunctive-predicate test:
    a naive plan evaluates the OR only after the join, scanning and
    joining every lineitem; the right plan factors each side's
    common bounds OUT of the disjunction so they prune BEFORE the
    join. Catalyst does this when the predicate is written as-is
    (CNF common-factor extraction): the lineitem scan gets the
    quantity envelope [1, 30] and the part scan gets the brand IN
    (...) + size envelope as PushedFilters, the join shrinks to the
    candidate slices, and the full three-arm OR re-applies on the
    joined rows. Plan-tested: both envelopes at the scans, broadcast
    part side, no SortMergeJoin. At 100 TB the factored envelopes are
    the difference between scanning 3 quantity bands and the whole
    fact."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & (F.col("p_size") >= 1) & (F.col("p_size") <= smax)
        & (F.col("l_quantity") >= qlo) & (F.col("l_quantity") <= qhi)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(
            arm("Brand#12", 15, 1, 11)
            | arm("Brand#23", 25, 10, 20)
            | arm("Brand#34", 35, 20, 30)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("qualifying_lines"),
        )
    )
