-- reference: iceberg-tests/sql/spark/open_catalog/update_sales_events.sql:3-12 (M3/Q7)
UPDATE {{ namespace }}.sales_events SET price = price * 1.1 WHERE event_id = 1;

SELECT event_id, price FROM {{ namespace }}.sales_events WHERE event_id = 1;
