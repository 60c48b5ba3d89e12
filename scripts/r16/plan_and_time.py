"""Capture .explain('formatted') to plans/r16/<query>_<tag>.txt and
noop-time registered queries (guide §1.4: noop sink, median of N).

Usage:
  python scripts/r16/plan_and_time.py <tag> <query> [<query> ...]
Env: PROFILE_RUNS (default 3), SPARK_GRAFT_CPUS, SKIP_TIME=1
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def jiffies():
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    return v[0] + v[1] + v[2], v[7]


def main():
    from iceberg_catalog_bench_spark.operators import registry
    from iceberg_catalog_bench_spark.session import get_spark

    tag = sys.argv[1]
    names = sys.argv[2:]
    registry.load_all()
    spark = get_spark(app_name=f"plan-{tag}")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("PROFILE_RUNS", "3"))
    for name in names:
        df = registry.QUERIES[name](spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        out = f"/root/repo/plans/r16/{name}_{tag}.txt"
        with open(out, "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange (")
        rec = {"query": name, "tag": tag, "exchanges": n_ex,
               "smj": plan.count("SortMergeJoin ("),
               "shj": plan.count("ShuffledHashJoin ("),
               "bhj": plan.count("BroadcastHashJoin (")}
        if not os.environ.get("SKIP_TIME"):
            spark.sparkContext.setJobDescription(f"{tag}:{name}")
            fn = registry.QUERIES[name]
            fn(spark, sf).write.format("noop").mode("overwrite").save()
            vals = []
            j0 = jiffies()
            for _ in range(runs):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(spark, sf).write.format("noop").mode("overwrite").save()
                vals.append(time.perf_counter() - t0)
            j1 = jiffies()
            t = (j1[0] - j0[0]) + (j1[1] - j0[1])
            rec["noop_median"] = round(statistics.median(vals), 3)
            rec["noop_all"] = [round(v, 3) for v in vals]
            rec["steal_pct"] = round(100.0 * (j1[1] - j0[1]) / t, 1) if t else 0
        print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
