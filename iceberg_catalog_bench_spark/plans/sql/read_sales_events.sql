-- reference: iceberg-tests/sql/spark/open_catalog/read_sales_events.sql:3-8 (Q1/Q2/Q5)
SELECT COUNT(*) AS row_count FROM {{ namespace }}.sales_events;

SELECT event_id, tenant_id, event_ts, sku, qty, price, country, ds
FROM {{ namespace }}.sales_events
ORDER BY event_id;
