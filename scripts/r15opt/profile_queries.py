"""Per-query profiling for the optimization round (guide §1).

Times every registered query named on the command line (or the two
composite suites with --suite tpch/tpcds/headline) individually with
the noop sink, median of 3 after one warm-up, and captures
``.explain("formatted")`` to plans/r15/<query>_<tag>.txt.

Usage:
  python scripts/r15opt/profile_queries.py --suite tpcds --tag before
  python scripts/r15opt/profile_queries.py pricing_summary --tag after
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TPCH_22 = [
    "pricing_summary", "tpch_q2_min_cost_supplier",
    "shipping_priority_top10", "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume", "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping", "tpch_q8_market_share",
    "tpch_q9_product_type_profit", "tpch_q10_returned_items",
    "tpch_q11_important_stock", "tpch_q12_priority_shipping",
    "tpch_q13_customer_distribution", "tpch_q14_promotion_effect",
    "tpch_q15_top_supplier", "tpch_q16_parts_supplier",
    "tpch_q17_small_qty_revenue", "tpch_q18_large_volume_customer",
    "tpch_q19_discounted_revenue", "tpch_q20_potential_promotion",
    "tpch_q21_sole_fault_supplier", "tpch_q22_global_sales_opportunity",
]

TPCDS_24 = [
    "tpcds_returned_ratio_by_date", "tpcds_rollup_rolling_sales",
    "tpcds_channel_union", "tpcds_star_join_multi_dim",
    "tpcds_rank_within_parent", "tpcds_multi_band_counts",
    "tpcds_cumulative_channel_crossover", "tpcds_topn_over_rollup",
    "tpcds_frequent_buyer_segments", "tpcds_net_after_returns",
    "tpcds_returns_above_avg_customers", "tpcds_weekly_yoy_ratio",
    "tpcds_monthly_deviation_neighbors", "tpcds_yoy_growth_channel_compare",
    "tpcds_revenue_band_histogram", "tpcds_return_repurchase_chain",
    "tpcds_cross_channel_items", "tpcds_buy_return_rebuy_margin",
    "tpcds_frequent_items_best_customers", "tpcds_qoq_growth_nation_channels",
    "tpcds_item_day_channel_crossover", "tpcds_brand_decline_yoy",
    "tpcds_worst_return_ratios_dual_rank", "tpcds_cov_consecutive_months",
]

HEADLINE = [
    "pricing_summary", "range_pruned_agg", "percentile_approx_by_group",
    "inlist_lookup", "join_fact_fact", "join_multiway_region_revenue",
    "shipping_priority_top10", "window_topn_per_group", "dedup_exact",
    "dedup_minhash_lsh", "knn_brute_force", "text_quality_scores",
    "streaming_windowed_agg", "pipeline_curate_full",
    "events_funnel_conversion", "events_resample_ohlc",
    "tpch_q21_sole_fault_supplier", "text_bm25_keyword_search",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--suite", choices=["tpch", "tpcds", "headline"])
    ap.add_argument("--tag", default="before")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", action="store_true",
                    help="write explain(formatted) to plans/r15/")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    names = list(args.queries)
    if args.suite == "tpch":
        names += TPCH_22
    elif args.suite == "tpcds":
        names += TPCDS_24
    elif args.suite == "headline":
        names += HEADLINE

    from iceberg_catalog_bench_spark.operators import registry
    from iceberg_catalog_bench_spark.session import get_spark

    registry.load_all()
    spark = get_spark(app_name="profile-r15opt")
    # same python/arrow worker pre-warm as bench.py so the first
    # pandas-UDF query doesn't carry worker cold-start
    from pyspark.sql import functions as F
    spark.range(0, 64, 1, 32).groupBy((F.col("id") % 8).alias("g")) \
        .applyInPandas(lambda pdf: pdf[["id"]], "id bigint").count()

    plans_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "..", "plans", "r15")
    results: dict[str, float] = {}
    for name in names:
        fn = registry.QUERIES[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")

        def run() -> None:
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

        run()  # warm-up
        results[name] = round(statistics.median(
            _timed(run) for _ in range(args.runs)), 3)
        if args.plans:
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(plan)
        print(f"{name:45s} {results[name]:7.3f}s", flush=True)

    total = round(sum(results.values()), 3)
    print(json.dumps({"tag": args.tag, "total": total, "queries": results}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"tag": args.tag, "total": total, "queries": results}, f,
                      indent=1, sort_keys=True)


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
