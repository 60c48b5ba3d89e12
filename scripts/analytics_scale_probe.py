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
            .write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        )
        out = {"rows": n}
        for name in QUERIES:
            t0 = time.perf_counter()
            cnt = registry.QUERIES[name](spark, d).count()
            out[name] = {"sec": round(time.perf_counter() - t0, 2), "out_rows": cnt}
            print(name, out[name], flush=True)
        print(json.dumps(out))
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
