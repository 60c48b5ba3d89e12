"""Split each composite member's cost into DataFrame build, physical
planning, and execution (VERDICT r15 item 6: if planning is >30% of a
composite, overlap independent members or pre-resolve shared scans).
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

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


def main():
    from iceberg_catalog_bench_spark.operators import registry
    from iceberg_catalog_bench_spark.session import get_spark

    registry.load_all()
    spark = get_spark(app_name="composite-floor")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    which = sys.argv[1] if len(sys.argv) > 1 else "tpcds"
    names = TPCDS_24 if which == "tpcds" else TPCH_22
    # warm the whole suite once (JIT, code cache, workers)
    for n in names:
        registry.QUERIES[n](spark, sf).collect()
    tot = {"build": 0.0, "plan": 0.0, "exec": 0.0}
    rows = []
    for n in names:
        t0 = time.perf_counter()
        df = registry.QUERIES[n](spark, sf)
        t1 = time.perf_counter()
        df._jdf.queryExecution().executedPlan()  # analyze+optimize+plan
        t2 = time.perf_counter()
        df.collect()
        t3 = time.perf_counter()
        rows.append({"q": n, "build": round(t1 - t0, 3),
                     "plan": round(t2 - t1, 3), "exec": round(t3 - t2, 3)})
        tot["build"] += t1 - t0
        tot["plan"] += t2 - t1
        tot["exec"] += t3 - t2
    for r in sorted(rows, key=lambda r: -(r["build"] + r["plan"] + r["exec"])):
        print(json.dumps(r), flush=True)
    print(json.dumps({"suite": which,
                      **{k: round(v, 2) for k, v in tot.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
