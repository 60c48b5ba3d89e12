"""Generator determinism: same seed → identical data, including the
rand() amounts (G4 — per-partition seeded determinism)."""

from pyspark.sql import functions as F

from iceberg_catalog_bench_spark.sources.datagen import generate_tx_events


def test_seeded_determinism(spark):
    a = generate_tx_events(spark, 5000, seed=42)
    b = generate_tx_events(spark, 5000, seed=42)
    checksum = lambda df: df.agg(
        F.round(F.sum("amount"), 6).alias("s"), F.count(F.lit(1)).alias("c")
    ).collect()[0]
    ca, cb = checksum(a), checksum(b)
    assert ca["s"] == cb["s"] and ca["c"] == cb["c"] == 5000


def test_dimension_lookup_bounds(spark):
    df = generate_tx_events(spark, 1000)
    row = df.agg(
        F.countDistinct("city").alias("cities"),
        F.countDistinct("category").alias("cats"),
        F.min("ts").alias("lo"),
        F.max("ts").alias("hi"),
        F.min("amount").alias("amin"),
        F.max("amount").alias("amax"),
    ).collect()[0]
    assert row["cities"] == 8 and row["cats"] == 5
    assert str(row["lo"]).startswith("2025-01-01")
    assert 0.0 <= row["amin"] <= row["amax"] < 1000.0
