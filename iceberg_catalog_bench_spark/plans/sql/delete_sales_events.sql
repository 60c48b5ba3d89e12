-- reference: iceberg-tests/sql/spark/open_catalog/delete_sales_events.sql:3-11 (M4)
DELETE FROM {{ namespace }}.sales_events WHERE event_id = 8;

SELECT COUNT(*) AS row_count FROM {{ namespace }}.sales_events;
