"""A/B the composite runner: serial vs small-thread-pool overlap
(guide §2.6 — actions are sequential only because the driver calls
them sequentially; a 2-3-deep pool back-fills the tail of each
member's last stage with the next member's tasks).
"""
import json
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, "/root/repo")

from scripts.r16.composite_floor import TPCDS_24, TPCH_22


def jiffies():
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    return v[0] + v[1] + v[2], v[7]


def main():
    from iceberg_catalog_bench_spark.operators import registry
    from iceberg_catalog_bench_spark.session import get_spark

    registry.load_all()
    spark = get_spark(app_name="composite-overlap-ab")
    sf = "/root/testdata/sf0.1"
    suites = {"tpch": TPCH_22, "tpcds": TPCDS_24}

    def serial(names):
        for q in names:
            registry.QUERIES[q](spark, sf).collect()

    def pooled(names, workers):
        def one(q):
            registry.QUERIES[q](spark, sf).collect()
        with ThreadPoolExecutor(max_workers=workers) as pool:
            list(pool.map(one, names))

    for suite, names in suites.items():
        serial(names)  # warm
        for arm, fn in [("serial", lambda: serial(names)),
                        ("pool3", lambda: pooled(names, 3)),
                        ("pool4", lambda: pooled(names, 4)),
                        ("serial2", lambda: serial(names)),
                        ("pool3b", lambda: pooled(names, 3))]:
            j0 = jiffies()
            t0 = time.perf_counter()
            fn()
            sec = round(time.perf_counter() - t0, 2)
            j1 = jiffies()
            t = (j1[0] - j0[0]) + (j1[1] - j0[1])
            print(json.dumps({
                "suite": suite, "arm": arm, "sec": sec,
                "steal_pct": round(100.0 * (j1[1] - j0[1]) / t, 1) if t else 0,
            }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
