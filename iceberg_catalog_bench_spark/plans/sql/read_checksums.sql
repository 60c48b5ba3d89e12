-- reference: iceberg-tests/sql/databricks/unity_catalog/read_checksums.sql:3-7 (Q4)
SELECT COUNT(*) AS row_count, SUM(qty) AS sum_qty, SUM(price * qty) AS revenue
FROM {{ namespace }}.sales_events;
