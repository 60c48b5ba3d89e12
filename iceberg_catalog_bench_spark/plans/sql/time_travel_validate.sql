-- reference: iceberg-tests/sql/spark/open_catalog/time_travel_validate.sql:3-12 (T2/T6)
SELECT COUNT(*) AS row_count
FROM {{ namespace }}.sales_events VERSION AS OF {{ state.baseline_snapshot[0].snapshot_id }};

SELECT SUM(qty) AS sum_qty
FROM {{ namespace }}.sales_events VERSION AS OF {{ state.baseline_snapshot[0].snapshot_id }};
