"""Synthetic data generation — the reference benchmark's dataflow
(G1-G7, ``blob_dfs/blob-dfs_bench.py:48-65``), reimplemented as a
parameterized generator.

The tx_events shape (FIXTURES.md §2): a ``spark.range`` id spine
drives every column — 30-day timestamp window via modulo, seeded
``rand`` amounts, array-literal dimension lookups for city/category.
Fully distributed (no driver-side data), deterministic per seed, and
scales to the reference's 100M-row default by changing one number:
``spark.range`` parallelizes the spine, and every derived column is
a map-side expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.registry import register

EPOCH_BASE = 1735689600  # 2025-01-01 00:00:00 UTC (blob-dfs_bench.py:53)
THIRTY_DAYS_S = 2_592_000
CITIES = ["Paris", "Seoul", "Tokyo", "Lyon", "Lille", "Marseille", "Nantes", "Bordeaux"]
CATEGORIES = ["A", "B", "C", "D", "E"]


def generate_tx_events(spark: SparkSession, n_rows: int, seed: int = 42) -> DataFrame:
    """The reference generator, column for column:

    - G1 id spine        : spark.range(n)               (blob-dfs_bench.py:51)
    - G2 rename + modulo : id → user_id; offset = id % 30d (:51,:55)
    - G3 epoch→timestamp : to_timestamp(from_unixtime(base + offset)) (:54-58)
    - G4 seeded random   : rand(seed) * 1000 amounts    (:60)
    - G5 array dim lookup: cities[id % 8], categories[id % 5] (:61-64)
    - G6 projection      : 5-column select              (:65)
    """
    cities = F.array(*[F.lit(c) for c in CITIES])
    cats = F.array(*[F.lit(c) for c in CATEGORIES])
    df = spark.range(n_rows).withColumnRenamed("id", "user_id")
    offset = (F.col("user_id") % THIRTY_DAYS_S).cast("long")
    return df.select(
        "user_id",
        F.to_timestamp(F.from_unixtime(F.lit(EPOCH_BASE) + offset)).alias("ts"),
        (F.rand(seed=seed) * 1000.0).cast("double").alias("amount"),
        cities[(F.col("user_id") % len(CITIES)).cast("int")].alias("city"),
        cats[(F.col("user_id") % len(CATEGORIES)).cast("int")].alias("category"),
    )


@register(
    "datagen_tx_events_dims",
    oracle=(
        "SELECT i AS user_id, "
        f"to_timestamp({EPOCH_BASE} + (i % {THIRTY_DAYS_S}))::TIMESTAMP AS ts, "
        "['Paris','Seoul','Tokyo','Lyon','Lille','Marseille','Nantes','Bordeaux']"
        "[(i % 8) + 1] AS city, "
        "['A','B','C','D','E'][(i % 5) + 1] AS category "
        "FROM generate_series(0, 9999) AS t(i)"
    ),
)
def datagen_tx_events_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic columns of the generator (10k rows), oracle-checked
    against a DuckDB generate_series reconstruction. The seeded-rand
    amount column is excluded here (RNGs differ across engines by
    design); its determinism across OUR runs is covered by tests."""
    return generate_tx_events(spark, 10_000).select("user_id", "ts", "city", "category")
