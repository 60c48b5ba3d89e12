"""Dev harness: run every registered query at a given SF dir, in
registration order (= driver order), timing each. Mirrors the driver's
correctness pass minus the DuckDB oracle, so we can see where the
per-query cost sits and keep the whole suite inside a driver budget.

Usage: python scripts/run_all_queries.py [sf_dir] [--limit N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_catalog_bench_spark.operators import registry
from iceberg_catalog_bench_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else "/root/testdata/sf0.01"
    limit = None
    if "--limit" in sys.argv:
        limit = int(sys.argv[sys.argv.index("--limit") + 1])

    registry.load_all()
    spark = get_spark()
    timings: dict[str, float] = {}
    names = list(registry.QUERIES)
    if limit:
        names = names[:limit]
    t_all = time.perf_counter()
    for name in names:
        t0 = time.perf_counter()
        try:
            df = registry.QUERIES[name](spark, sf_dir)
            n = len(df.collect())
            err = None
        except Exception as e:  # noqa: BLE001
            n, err = -1, f"{type(e).__name__}: {e}"
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        flag = " ORACLE" if name in registry.ORACLES else ""
        print(f"{dt:7.2f}s  {n:8d} rows  {name}{flag}" + (f"  ERR {err}" if err else ""), flush=True)
    total = time.perf_counter() - t_all
    print(f"\nTOTAL {total:.1f}s over {len(names)} queries")
    print(json.dumps(dict(sorted(timings.items(), key=lambda kv: -kv[1])[:15]), indent=1))


if __name__ == "__main__":
    main()
