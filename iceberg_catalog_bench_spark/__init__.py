"""iceberg_catalog_bench_spark — a PySpark-native analytics engine.

A from-scratch reimplementation of the query and data-processing
capabilities of the reference ``nolimitkun/iceberg-catalog-bench``
(an Iceberg cross-engine interoperability benchmark/harness), built
Spark-first:

- ``session``   — SparkSession factory tuned for local testing and
  cluster-scale defaults (AQE, shuffle partitions, Arrow).
- ``catalog``   — a snapshot-versioned parquet table format
  ("LakeTable") providing Iceberg-v2-like semantics (partition
  transforms, copy-on-write UPDATE/DELETE/MERGE, time travel,
  metadata tables, maintenance procedures) on plain parquet,
  since no Iceberg runtime jar ships in this environment.
- ``engine``    — the plan runner + validators (the reference's
  YAML-plan test harness, collapsed to one Spark dialect).
- ``operators`` — the query corpus (scans/aggregates/sorts/joins)
  plus LLM-data-pipeline operators (dedup, similarity search,
  text analysis, multimodal plumbing).
- ``streaming`` — Structured Streaming equivalents for the events
  table (windowed aggregation, watermarks).
"""

__version__ = "0.1.0"
