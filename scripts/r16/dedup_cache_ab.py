"""Quantify the dedup_minhash_lsh timed-region cache-reuse fix
(VERDICT r15 item 2): median-of-3 with the old semantics (cache
persists across iterations) vs the fixed semantics (plan cache
cleared before every timed iteration). Also reports
pipeline_curate_full under both, since it shares shingle subtrees.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def jiffies():
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    return v[0] + v[1] + v[2], v[7]


def steal(a, b):
    t = (b[0] - a[0]) + (b[1] - a[1])
    return round(100.0 * (b[1] - a[1]) / t, 1) if t else 0.0


def main():
    import statistics

    from iceberg_catalog_bench_spark.operators import registry
    from iceberg_catalog_bench_spark.session import get_spark

    registry.load_all()
    spark = get_spark(app_name="dedup-cache-ab")
    sf = "/root/testdata/sf0.1"

    def run_phase(name, clear):
        fn = registry.QUERIES[name]
        spark.catalog.clearCache()
        fn(spark, sf).collect()  # warm-up
        vals = []
        for _ in range(3):
            if clear:
                spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf).collect()
            vals.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
        return round(statistics.median(vals), 3)

    for name in ("dedup_minhash_lsh", "pipeline_curate_full",
                 "text_bm25_keyword_search"):
        j0 = jiffies()
        old = run_phase(name, clear=False)
        new = run_phase(name, clear=True)
        print(json.dumps({"query": name, "cached_reuse_sec": old,
                          "fresh_each_iter_sec": new,
                          "steal_pct": steal(j0, jiffies())}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
