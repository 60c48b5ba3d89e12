"""Event-analytics operators — funnel conversion, cohort retention,
and time-bucket (OHLC) resampling over the events stream.

These are the product-analytics shapes (Amplitude/Mixpanel-style
funnels, weekly retention triangles, time-series downsampling) a
warehouse team runs daily on event tables; the reference's event
fixtures (`blob-dfs_bench.py` events generator, sales_events plan)
stop at windowed aggregates, so these extend the same table with the
sequential/temporal semantics Spark expresses via windows.

Scale notes (100 TB events):
- Funnel and retention both reduce to ONE shuffle keyed by user_id
  (plus a tiny final agg). Per-user event counts are bounded for
  HUMAN users, so partitions stay balanced; there is no per-stage
  self-join (the naive funnel formulation joins events to events
  k-1 times — quadratic in the worst key).
- The human-user assumption is enforced, not hoped for: the
  user-keyed window operators pre-filter users above ``_BOT_CAP``
  events via :func:`_without_bot_users`. A bot key with 10⁸ events
  would otherwise become one straggler sort task; the count that
  detects it is map-side combinable, so the hot key collapses to one
  row per map partition and never reaches a sort.
- OHLC resampling is a pure two-level groupBy with map-side partial
  aggregation; ties at equal timestamps are pre-reduced by event_id
  so open/close are deterministic on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table
from .registry import register

# Users with more events than this are machines, not people (the
# sf0.1 per-user max is ~100; 1e5 is ~3 events/min for a month) and
# are excluded from per-user sequence analytics BEFORE any window
# sort. Oracles mirror the same HAVING filter.
_BOT_CAP = 100_000

_BOT_FILTER_SQL = (
    "user_id NOT IN (SELECT user_id FROM events "
    f"GROUP BY user_id HAVING COUNT(*) > {_BOT_CAP})"
)


def _without_bot_users(ev: DataFrame) -> DataFrame:
    """Drop users with > ``_BOT_CAP`` events ahead of any user-keyed
    window. Shape: per-user counts partial-aggregate map-side (a 10⁸-
    event bot collapses to one row per map partition — no skewed sort
    ever happens), the over-cap user list is a few rows broadcast into
    a left-anti hash join, and AQE sees an ordinary filtered scan."""
    bots = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > _BOT_CAP)
        .select("user_id")
    )
    return ev.join(F.broadcast(bots), "user_id", "left_anti")


@register(
    "events_funnel_conversion",
    oracle=(
        # Stage k's first-touch must be strictly after stage k-1's
        # first-touch for the same user (classic ordered funnel).
        # Users above the bot cap are excluded, mirroring
        # _without_bot_users (no-op at test SFs: max/user ≈ 100).
        "WITH ev AS (SELECT user_id, event_type, event_id, "
        f"CAST(ts AS TIMESTAMP) AS ts FROM events WHERE {_BOT_FILTER_SQL}), "
        "s AS (SELECT user_id, MIN(ts) AS st "
        "FROM ev WHERE event_type = 'signup' GROUP BY user_id), "
        "v AS (SELECT e.user_id, MIN(e.ts) AS vt "
        "FROM ev e JOIN s ON e.user_id = s.user_id "
        "WHERE e.event_type = 'view' AND e.ts > s.st "
        "GROUP BY e.user_id), "
        "p AS (SELECT e.user_id FROM ev e JOIN v ON e.user_id = v.user_id "
        "WHERE e.event_type = 'purchase' AND e.ts > v.vt "
        "GROUP BY e.user_id) "
        "SELECT (SELECT COUNT(*) FROM s) AS users_signup, "
        "(SELECT COUNT(*) FROM v) AS users_viewed, "
        "(SELECT COUNT(*) FROM p) AS users_purchased, "
        "ROUND((SELECT COUNT(*) FROM v) * 1.0 / (SELECT COUNT(*) FROM s), 4) "
        "AS view_rate, "
        "ROUND((SELECT COUNT(*) FROM p) * 1.0 / (SELECT COUNT(*) FROM v), 4) "
        "AS purchase_rate"
    ),
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel signup → view → purchase: users whose first view
    is strictly after their first signup, and first purchase strictly
    after that view.

    Plan shape: one shuffle on user_id, one time sort, two window
    passes over the SAME partitioning (Spark reuses the sort — no
    second exchange). The running ``min(signup ts)`` at a view row
    equals the user's global first signup whenever any signup precedes
    the view, so the strict ``ts > first_signup`` window predicate is
    exactly the oracle's join condition; same argument one stage down
    for purchases. The naive alternative (events self-joined per
    stage) is quadratic on hot users — this shape is linear, with
    over-cap bot users anti-joined out before the window sort."""
    ev = _without_bot_users(
        load_table(spark, "events", sf_dir).select(
            "user_id", "ts", "event_id", "event_type"
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = ev.withColumn(
        "sig_ts", F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w)
    ).withColumn(
        "is_view_after",
        (F.col("event_type") == "view") & (F.col("ts") > F.col("sig_ts")),
    )
    staged = staged.withColumn(
        "fv_ts", F.min(F.when(F.col("is_view_after"), F.col("ts"))).over(w)
    ).withColumn(
        "is_purchase_after",
        (F.col("event_type") == "purchase") & (F.col("ts") > F.col("fv_ts")),
    )
    agg = staged.agg(
        F.countDistinct(
            F.when(F.col("event_type") == "signup", F.col("user_id"))
        ).alias("users_signup"),
        F.countDistinct(F.when(F.col("is_view_after"), F.col("user_id"))).alias(
            "users_viewed"
        ),
        F.countDistinct(F.when(F.col("is_purchase_after"), F.col("user_id"))).alias(
            "users_purchased"
        ),
    )
    return agg.select(
        "users_signup",
        "users_viewed",
        "users_purchased",
        F.round(F.col("users_viewed") / F.col("users_signup"), 4).alias("view_rate"),
        F.round(F.col("users_purchased") / F.col("users_viewed"), 4).alias(
            "purchase_rate"
        ),
    )


@register(
    "retention_cohort_weekly",
    oracle=(
        # Cohort = ISO week (Monday-truncated) of the user's first
        # event; a cell counts users from that cohort active in week
        # cohort+offset. Both engines truncate weeks to Monday 00:00.
        "WITH a AS (SELECT DISTINCT user_id, "
        "date_trunc('week', CAST(ts AS TIMESTAMP)) AS aw FROM events), "
        "f AS (SELECT user_id, MIN(aw) AS cw FROM a GROUP BY user_id) "
        "SELECT f.cw AS cohort_week, "
        "CAST((epoch(a.aw) - epoch(f.cw)) / 604800 AS INT) AS week_offset, "
        "COUNT(*) AS users "
        "FROM a JOIN f ON a.user_id = f.user_id "
        "GROUP BY cohort_week, week_offset"
    ),
)
def retention_cohort_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: users grouped by the week of their
    first event, counted in each subsequent week they were active.

    Plan shape: distinct (user, week) — the only shuffle that scales
    with raw volume; the cohort min and the activity join both key on
    user_id, so they reuse one hash partitioning; the final cell agg
    is over |users| × |weeks| rows, tiny. Week truncation is monotone
    in ts, so min(activity week) IS the first-event week — no second
    pass over raw events."""
    a = (
        load_table(spark, "events", sf_dir)
        .select("user_id", F.date_trunc("week", F.col("ts")).alias("aw"))
        .distinct()
    )
    f = a.groupBy("user_id").agg(F.min("aw").alias("cw"))
    return (
        a.join(f, "user_id")
        .select(
            F.col("cw").alias("cohort_week"),
            (
                (F.unix_timestamp("aw") - F.unix_timestamp("cw")) / 604800
            ).cast("int").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("users"))
    )


@register(
    "events_resample_ohlc",
    oracle=(
        # Equal-timestamp ties are pre-reduced to the min/max event_id
        # image so open/close are deterministic (same device as the
        # as-of join oracle in temporal.py).
        "WITH r AS (SELECT event_type, "
        "date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bh, "
        "CAST(ts AS TIMESTAMP) AS ts, "
        "arg_min(value, event_id) AS o_val, arg_max(value, event_id) AS c_val, "
        "SUM(value) AS sv, COUNT(*) AS cnt, MAX(value) AS hi, MIN(value) AS lo "
        "FROM events GROUP BY event_type, bh, ts) "
        "SELECT event_type, bh AS bucket_hour, "
        "ROUND(arg_min(o_val, ts), 4) AS open, ROUND(MAX(hi), 4) AS high, "
        "ROUND(MIN(lo), 4) AS low, ROUND(arg_max(c_val, ts), 4) AS close, "
        "CAST(SUM(cnt) AS BIGINT) AS volume, ROUND(SUM(sv), 2) AS total "
        "FROM r GROUP BY event_type, bucket_hour"
    ),
)
def events_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC resample per event type: open/high/low/close of
    ``value`` plus volume — the time-series downsampling every metrics
    store (and every hypertable continuous aggregate) performs.

    Plan shape: ONE groupBy on (event_type, hour) with full map-side
    partial aggregation — min_by/max_by ordered by the (ts, event_id)
    struct pick open/close JVM-side and combine associatively, so the
    shuffle carries one partial row per (type, hour) per map task, not
    the raw events. (The oracle is two-level only because DuckDB's
    arg_min can't order by a struct.) No window, no sort of the full
    bucket. At 100 TB this is the rollup you'd run per ingest batch
    and store keyed by (type, hour) for pruned reads."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_type", "ts", "event_id", "value"
    )
    tie = F.struct("ts", "event_id")
    return (
        ev.groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("bucket_hour"))
        .agg(
            F.round(F.min_by("value", tie), 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.max_by("value", tie), 4).alias("close"),
            F.count(F.lit(1)).cast("bigint").alias("volume"),
            F.round(F.sum("value"), 2).alias("total"),
        )
    )


@register(
    "customer_rfm_segments",
    oracle=(
        # Quartile thresholds via linear-interpolated quantiles —
        # Spark's percentile() and DuckDB's quantile_cont share the
        # pos = p*(n-1) definition, and a customer can only EQUAL a
        # threshold when the threshold IS a data point (fraction 0),
        # where both formulas are exact — so <= bucketing is
        # cross-engine deterministic.
        "WITH cust AS (SELECT o_custkey, "
        "date_diff('day', MAX(CAST(o_orderdate AS TIMESTAMP)), "
        "(SELECT MAX(CAST(o_orderdate AS TIMESTAMP)) FROM orders)) AS rec, "
        "COUNT(*) AS freq, SUM(o_totalprice) AS mon FROM orders GROUP BY o_custkey), "
        "th AS (SELECT quantile_cont(rec, [0.25, 0.5, 0.75]) AS rq, "
        "quantile_cont(freq, [0.25, 0.5, 0.75]) AS fq, "
        "quantile_cont(mon, [0.25, 0.5, 0.75]) AS mq FROM cust) "
        "SELECT "
        "CASE WHEN rec <= rq[1] THEN 1 WHEN rec <= rq[2] THEN 2 "
        "WHEN rec <= rq[3] THEN 3 ELSE 4 END AS r_score, "
        "CASE WHEN freq <= fq[1] THEN 1 WHEN freq <= fq[2] THEN 2 "
        "WHEN freq <= fq[3] THEN 3 ELSE 4 END AS f_score, "
        "CASE WHEN mon <= mq[1] THEN 1 WHEN mon <= mq[2] THEN 2 "
        "WHEN mon <= mq[3] THEN 3 ELSE 4 END AS m_score, "
        "COUNT(*) AS n_customers "
        "FROM cust, th GROUP BY r_score, f_score, m_score"
    ),
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: recency / frequency / monetary quartile scores
    per customer, reported as segment-cell counts — the marketing-
    analytics staple.

    Plan shape: one customer-keyed aggregate, then quartile thresholds
    as a 1-row broadcast (percentile() is an exact single-pass
    aggregate here; at petabyte cardinalities swap in
    percentile_approx and re-pin the oracle to its GK bounds) and a
    map-side CASE bucketing — crucially NOT the ntile() formulation,
    whose global sort serializes the whole customer set through one
    window task at scale."""
    o = load_table(spark, "orders", sf_dir).select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("freq"),
        F.sum("o_totalprice").alias("mon"),
    )
    # reference date as a broadcast scalar — NOT a global window, which
    # would funnel every customer through one partition
    ref = per_cust.agg(F.max("last_order").alias("ref"))
    cust = per_cust.crossJoin(F.broadcast(ref)).withColumn(
        "rec", F.datediff("ref", "last_order")
    )
    th = cust.agg(
        F.expr("percentile(rec, array(0.25, 0.5, 0.75))").alias("rq"),
        F.expr("percentile(freq, array(0.25, 0.5, 0.75))").alias("fq"),
        F.expr("percentile(mon, array(0.25, 0.5, 0.75))").alias("mq"),
    )

    def score(col: str, q: str):
        return (
            F.when(F.col(col) <= F.col(q)[0], 1)
            .when(F.col(col) <= F.col(q)[1], 2)
            .when(F.col(col) <= F.col(q)[2], 3)
            .otherwise(4)
        )

    return (
        cust.crossJoin(F.broadcast(th))
        .select(
            score("rec", "rq").alias("r_score"),
            score("freq", "fq").alias("f_score"),
            score("mon", "mq").alias("m_score"),
        )
        .groupBy("r_score", "f_score", "m_score")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "events_anomaly_zscore",
    oracle=(
        "WITH hourly AS (SELECT event_type, "
        "date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bh, COUNT(*) AS cnt "
        "FROM events GROUP BY event_type, bh), "
        "w AS (SELECT event_type, bh, cnt, "
        "AVG(cnt) OVER win AS mu, STDDEV_SAMP(cnt) OVER win AS sd, "
        "COUNT(*) OVER win AS n_window FROM hourly "
        "WINDOW win AS (PARTITION BY event_type ORDER BY bh "
        "ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)) "
        "SELECT event_type, bh AS bucket_hour, cnt, "
        "ROUND((cnt - mu) / NULLIF(sd, 0), 4) AS z, "
        "(ABS((cnt - mu) / NULLIF(sd, 0)) > 3) AS is_anomaly "
        "FROM w WHERE n_window = 24"
    ),
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-style anomaly detection in batch: each (event_type,
    hour) count is z-scored against its own trailing 24-hour window;
    |z| > 3 flags the anomaly. The monitoring rollup every metrics
    pipeline runs.

    Plan shape: the raw stream reduces to (type, hour) granularity
    FIRST (partial-agg groupBy — the only shuffle that sees raw
    volume); the trailing window then runs over ~hours×types rows, so
    the per-partition window sort is over series cells, never events.
    At 100 TB the hourly rollup is what you'd persist (see
    events_resample_ohlc) and this becomes a map-only pass over it."""
    hourly = (
        load_table(spark, "events", sf_dir)
        .groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("bucket_hour"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    win = (
        Window.partitionBy("event_type")
        .orderBy("bucket_hour")
        .rowsBetween(-24, -1)
    )
    z = (F.col("cnt") - F.avg("cnt").over(win)) / F.nullif(
        F.stddev_samp("cnt").over(win), F.lit(0.0)
    )
    return (
        hourly.withColumn("n_window", F.count(F.lit(1)).over(win))
        .withColumn("z_raw", z)
        .filter(F.col("n_window") == 24)
        .select(
            "event_type",
            "bucket_hour",
            "cnt",
            F.round("z_raw", 4).alias("z"),
            (F.abs(F.col("z_raw")) > 3).alias("is_anomaly"),
        )
    )


@register(
    "basket_part_affinity",
    oracle=(
        "WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), "
        "pc AS (SELECT l_partkey, COUNT(*) AS pcnt FROM b GROUP BY l_partkey), "
        "n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM b), "
        "pairs AS (SELECT a.l_partkey AS p1, c.l_partkey AS p2, "
        "COUNT(*) AS pair_cnt FROM b a JOIN b c ON a.l_orderkey = c.l_orderkey "
        "AND a.l_partkey < c.l_partkey GROUP BY p1, p2) "
        "SELECT p1, p2, pair_cnt, "
        "ROUND(pair_cnt * n.n_orders * 1.0 / (x.pcnt * y.pcnt), 4) AS lift "
        "FROM pairs JOIN pc x ON pairs.p1 = x.l_partkey "
        "JOIN pc y ON pairs.p2 = y.l_partkey CROSS JOIN n "
        "ORDER BY pair_cnt DESC, p1, p2 LIMIT 20"
    ),
)
def basket_part_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: the 20 part pairs most often co-ordered,
    with lift = P(p1,p2) / (P(p1)·P(p2)) — the retail co-occurrence
    classic.

    Plan shape: the within-order self-join is keyed on l_orderkey, so
    the candidate blow-up is bounded by lines-per-order² (single
    digits squared), NOT parts² — the same bounded-bucket discipline
    as the n-gram dedup join. Part-frequency sides broadcast; top-20
    is TakeOrderedAndProject on (count, p1, p2), cross-engine
    deterministic."""
    b = (
        load_table(spark, "lineitem", sf_dir)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    pc = b.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("pcnt"))
    n = b.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    left = b.select(F.col("l_orderkey"), F.col("l_partkey").alias("p1"))
    right = b.select(F.col("l_orderkey"), F.col("l_partkey").alias("p2"))
    pairs = (
        left.join(right, "l_orderkey")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
    )
    return (
        pairs.join(F.broadcast(pc.withColumnRenamed("pcnt", "c1")),
                   pairs.p1 == F.col("l_partkey")).drop("l_partkey")
        .join(F.broadcast(pc.withColumnRenamed("pcnt", "c2")),
              F.col("p2") == F.col("l_partkey")).drop("l_partkey")
        .crossJoin(F.broadcast(n))
        .select(
            "p1", "p2", "pair_cnt",
            F.round(
                F.col("pair_cnt") * F.col("n_orders") / (F.col("c1") * F.col("c2")), 4
            ).alias("lift"),
        )
        .orderBy(F.desc("pair_cnt"), "p1", "p2")
        .limit(20)
    )


@register(
    "events_transition_matrix",
    oracle=(
        # Bot-cap filter mirrors _without_bot_users (no-op at test SFs).
        "WITH ev AS (SELECT user_id, event_type, event_id, "
        f"CAST(ts AS TIMESTAMP) AS ts FROM events WHERE {_BOT_FILTER_SQL}), "
        "s AS (SELECT user_id, event_type, "
        "LAG(event_type) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS prev_type FROM ev) "
        "SELECT prev_type, event_type, COUNT(*) AS cnt, "
        "ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (PARTITION BY prev_type), 4) "
        "AS prob FROM s WHERE prev_type IS NOT NULL "
        "GROUP BY prev_type, event_type"
    ),
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over the per-user event
    stream: P(next event type | previous) — the clickstream model
    behind next-action prediction and funnel diagnosis.

    Plan shape: one user-keyed window sort for lag(), then the count
    aggregate reduces to |types|² cells; the row-normalizing window
    runs over those 25 cells. Same single-wide-shuffle discipline as
    the funnel — raw volume is sorted once, never self-joined, and
    over-cap bot users are anti-joined out before the sort."""
    s = _without_bot_users(
        load_table(spark, "events", sf_dir).select("user_id", "event_type", "ts", "event_id")
    ).select(
        "user_id",
        "event_type",
        F.lag("event_type").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("prev_type"),
    )
    cells = (
        s.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return cells.select(
        "prev_type",
        "event_type",
        "cnt",
        F.round(
            F.col("cnt") / F.sum("cnt").over(Window.partitionBy("prev_type")), 4
        ).alias("prob"),
    )


@register(
    "events_gapfill_locf",
    oracle=(
        # grid = every (type, hour) cell over the data's hour span;
        # empty cells zero-fill the count and carry the last observed
        # hourly average forward (LOCF) — TimescaleDB's
        # time_bucket_gapfill + locf() semantics.
        "WITH b AS (SELECT date_trunc('hour', MIN(CAST(ts AS TIMESTAMP))) AS lo, "
        "date_trunc('hour', MAX(CAST(ts AS TIMESTAMP))) AS hi FROM events), "
        "hours AS (SELECT unnest(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) "
        "AS bh FROM b), "
        "grid AS (SELECT t.event_type, h.bh FROM hours h, "
        "(SELECT DISTINCT event_type FROM events) t), "
        "r AS (SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bh, "
        "COUNT(*) AS cnt, ROUND(AVG(value), 4) AS avg_value "
        "FROM events GROUP BY event_type, bh) "
        "SELECT g.event_type, g.bh AS bucket_hour, "
        "CAST(COALESCE(r.cnt, 0) AS BIGINT) AS cnt, "
        "(r.cnt IS NULL) AS is_gap, "
        "LAST_VALUE(r.avg_value IGNORE NULLS) OVER (PARTITION BY g.event_type "
        "ORDER BY g.bh ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
        "AS locf_avg_value "
        "FROM grid g LEFT JOIN r ON g.event_type = r.event_type AND g.bh = r.bh"
    ),
)
def events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly rollup with last-observation-carried-forward —
    TimescaleDB's ``time_bucket_gapfill`` + ``locf()``, the hypertable
    continuous-aggregate shape the north-star brief names as a custom
    operator Spark lacks. Empty (type, hour) cells appear explicitly
    with cnt = 0 and the previous hour's average carried forward.

    Plan shape: the dense grid is generated, not scanned —
    ``sequence()`` explodes |hours| rows from a 1-row min/max
    aggregate, cross-joined with the distinct types (both broadcast);
    raw volume only touches the rollup's partial agg. The LOCF window
    partitions by type over series cells. Grid size is |types|×|hours|
    — at 100 TB that's still thousands of cells per type, never event
    rows."""
    ev = load_table(spark, "events", sf_dir).select("event_type", "ts", "value")
    r = (
        ev.groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("bh"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("bh")
    )
    grid = ev.select("event_type").distinct().crossJoin(F.broadcast(hours))
    w = (
        Window.partitionBy("event_type")
        .orderBy("bh")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(r, ["event_type", "bh"], "left")
        .select(
            "event_type",
            F.col("bh").alias("bucket_hour"),
            F.coalesce(F.col("cnt"), F.lit(0)).cast("bigint").alias("cnt"),
            F.col("cnt").isNull().alias("is_gap"),
            F.last("avg_value", ignorenulls=True).over(w).alias("locf_avg_value"),
        )
    )


@register(
    "attribution_last_touch",
    oracle=(
        # DuckDB native ASOF LEFT JOIN is the oracle; equal-ts touches
        # pre-reduce to max event_id (temporal.py device) and a touch
        # at the purchase's exact ts is eligible ("at-or-before").
        "WITH t AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, "
        "arg_max(event_type, event_id) AS ch FROM events "
        "WHERE user_id < 50 AND event_type <> 'purchase' GROUP BY user_id, ts), "
        "p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events "
        "WHERE user_id < 50 AND event_type = 'purchase') "
        "SELECT COALESCE(CASE WHEN p.ts - t.ts <= INTERVAL 7 DAY "
        "THEN t.ch END, 'direct') AS channel, "
        "COUNT(*) AS attributed_purchases, "
        "ROUND(SUM(p.value), 2) AS attributed_revenue "
        "FROM p ASOF LEFT JOIN t ON p.user_id = t.user_id AND t.ts <= p.ts "
        "GROUP BY channel"
    ),
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: every purchase credits the
    user's most recent non-purchase event within a 7-day lookback
    ('direct' if none) — revenue and counts per channel.

    Plan shape: the same union + last-non-null-window device as
    `join_asof_last_purchase` — one shuffle on user_id, one time sort,
    no range join, no per-key explosion; the lookback bound is a
    map-side filter AFTER the as-of match, so expired touches fall to
    'direct' without a second pass. user_id < 50 bounds the checked
    slice like the other temporal oracles."""
    ev = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("user_id") < 50)
        .select("user_id", "ts", "event_id", "event_type", "value")
    )
    touches = (
        ev.filter(F.col("event_type") != "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max_by("event_type", "event_id").alias("t_channel"))
        .withColumn("t_ts", F.col("ts"))
        .withColumn("isp", F.lit(0))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    ).withColumn("isp", F.lit(1))
    merged = purchases.unionByName(touches, allowMissingColumns=True)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "isp")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    attributed = (
        merged.withColumn("lt_channel", F.last("t_channel", ignorenulls=True).over(w))
        .withColumn("lt_ts", F.last("t_ts", ignorenulls=True).over(w))
        .filter(F.col("isp") == 1)
        .withColumn(
            "channel",
            F.coalesce(
                F.when(
                    F.unix_micros("ts") - F.unix_micros("lt_ts")
                    <= F.lit(7 * 86400 * 1_000_000),
                    F.col("lt_channel"),
                ),
                F.lit("direct"),
            ),
        )
    )
    return attributed.groupBy("channel").agg(
        F.count(F.lit(1)).alias("attributed_purchases"),
        F.round(F.sum("value"), 2).alias("attributed_revenue"),
    )
