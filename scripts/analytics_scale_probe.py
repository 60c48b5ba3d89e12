"""Scale probe for the event-analytics operators (round 3).

Generates an events table N× the sf0.1 fixture (same schema:
event_id/ts/user_id/event_type/value/props), writes it as
``events.parquet`` in a scratch dir, and runs the REGISTERED
analytics queries against that dir — so the measured plans are exactly
the production plans, not reimplementations.

    python scripts/analytics_scale_probe.py [N_ROWS]

What it demonstrates at 10M rows (1000× the sf0.01 fixture):
- `events_funnel_conversion` — one user-keyed window sort + Expand
  distinct; cost tracks rows, not users² (no per-stage self-join).
- `events_resample_ohlc` — single exchange carrying one partial row
  per (type, hour) per map task.
- `events_anomaly_zscore` — raw volume only touches the rollup's
  partial agg; the window runs over series cells.
- `retention_cohort_weekly` — distinct (user, week) is the only
  raw-volume shuffle.

Round 4 adds HOT-KEY injection: one bot user with BOT_N (default 1M)
events rides along in the fixture. The registered funnel/transition
queries anti-join it out via the `_BOT_CAP` pre-filter (their window
input per user stays bounded); a deliberately uncapped lag-window
twin is timed alongside to show the straggler-sort cost the cap
removes. Invocation:

    python scripts/analytics_scale_probe.py [N_ROWS] [BOT_N]
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from iceberg_catalog_bench_spark.operators import registry
from iceberg_catalog_bench_spark.session import get_spark

QUERIES = [
    "events_funnel_conversion",
    "events_resample_ohlc",
    "events_anomaly_zscore",
    "retention_cohort_weekly",
    "events_transition_matrix",
    "events_gapfill_locf",
]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    bot_n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    registry.load_all()
    spark = get_spark(app_name="analytics-scale-probe")
    d = tempfile.mkdtemp(prefix="analytics-probe-")
    try:
        # deterministic synthetic stream: 30 days, n/100 users, 5 types
        (
            spark.range(n)
            .select(
                F.col("id").alias("event_id"),
                F.timestamp_micros(
                    F.lit(1704067200_000000)  # 2024-01-01 UTC
                    + F.pmod(F.xxhash64("id", F.lit(1)), F.lit(30 * 86400_000000))
                ).alias("ts"),
                F.pmod(F.xxhash64("id", F.lit(2)), F.lit(n // 100)).alias("user_id"),
                F.element_at(
                    F.array(*[F.lit(t) for t in
                              ("signup", "view", "purchase", "click", "error")]),
                    (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(5)) + 1).cast("int"),
                ).alias("event_type"),
                (F.pmod(F.xxhash64("id", F.lit(4)), F.lit(100000)) / 100.0).alias("value"),
                F.lit("{}").alias("props"),
            )
            # hot key: ONE bot user emitting bot_n events (well above
            # _BOT_CAP) — the skew the registered queries must shrug off
            .unionByName(
                spark.range(bot_n).select(
                    (F.col("id") + n).alias("event_id"),
                    F.timestamp_micros(
                        F.lit(1704067200_000000)
                        + F.pmod(F.xxhash64("id", F.lit(9)), F.lit(30 * 86400_000000))
                    ).alias("ts"),
                    F.lit(999_999_999).alias("user_id"),
                    F.element_at(
                        F.array(*[F.lit(t) for t in
                                  ("signup", "view", "purchase", "click", "error")]),
                        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(5)) + 1).cast("int"),
                    ).alias("event_type"),
                    (F.pmod(F.xxhash64("id", F.lit(4)), F.lit(100000)) / 100.0)
                    .alias("value"),
                    F.lit("{}").alias("props"),
                )
            )
            .write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        )
        out = {"rows": n, "bot_rows": bot_n}
        for name in QUERIES:
            t0 = time.perf_counter()
            cnt = registry.QUERIES[name](spark, d).count()
            out[name] = {"sec": round(time.perf_counter() - t0, 2), "out_rows": cnt}
            print(name, out[name], flush=True)

        # contrast: the SAME lag-window transition count WITHOUT the
        # bot cap — the bot's bot_n rows land in one sort task
        from iceberg_catalog_bench_spark.sources import load_table
        from pyspark.sql.window import Window

        ev = load_table(spark, "events", d).select("user_id", "event_type", "ts", "event_id")
        t0 = time.perf_counter()
        uncapped = (
            ev.select(
                "event_type",
                F.lag("event_type").over(
                    Window.partitionBy("user_id").orderBy("ts", "event_id")
                ).alias("prev_type"),
            )
            .filter(F.col("prev_type").isNotNull())
            .groupBy("prev_type", "event_type").count().count()
        )
        out["transition_uncapped_contrast"] = {
            "sec": round(time.perf_counter() - t0, 2), "out_rows": uncapped,
        }
        print("transition_uncapped_contrast", out["transition_uncapped_contrast"], flush=True)
        print(json.dumps(out))
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
