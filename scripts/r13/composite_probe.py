"""r13 probe: the two composite phases in a FRESH process, shapes
timed individually, composite repeated 3x — discriminates
accumulated-process-state inflation (bench-order artifact) from a
genuine per-shape regression."""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
from iceberg_catalog_bench_spark.operators import registry
from iceberg_catalog_bench_spark.session import get_spark
from pyspark.sql import functions as F

registry.load_all()
spark = get_spark(app_name="composite-probe")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

t0 = time.perf_counter()
spark.range(0, 50_000_000, 1, 32).selectExpr("id % 64 AS k", "id") \
    .groupBy("k").agg(F.sum("id")).collect()
calib = round(time.perf_counter() - t0, 3)

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
TPCDS_18 = [
    "tpcds_returned_ratio_by_date", "tpcds_rollup_rolling_sales",
    "tpcds_channel_union", "tpcds_star_join_multi_dim",
    "tpcds_rank_within_parent", "tpcds_multi_band_counts",
    "tpcds_cumulative_channel_crossover", "tpcds_topn_over_rollup",
    "tpcds_frequent_buyer_segments", "tpcds_net_after_returns",
    "tpcds_returns_above_avg_customers", "tpcds_weekly_yoy_ratio",
    "tpcds_monthly_deviation_neighbors",
    "tpcds_yoy_growth_channel_compare",
    "tpcds_revenue_band_histogram",
    "tpcds_return_repurchase_chain",
    "tpcds_cross_channel_items",
    "tpcds_buy_return_rebuy_margin",
]

out = {"calibration": calib, "rounds": []}
for rnd in range(3):
    shapes = {}
    for name, lst in (("tpch", TPCH_22), ("tpcds", TPCDS_18)):
        tot = 0.0
        for q in lst:
            t0 = time.perf_counter()
            registry.QUERIES[q](spark, SF_DIR).collect()
            dt = time.perf_counter() - t0
            shapes[q] = round(dt, 3)
            tot += dt
        shapes[f"__{name}_total"] = round(tot, 3)
    out["rounds"].append(shapes)
print(json.dumps(out))
with open("/root/repo/scripts/r13/composite_probe.json", "w") as f:
    json.dump(out, f, indent=1)
