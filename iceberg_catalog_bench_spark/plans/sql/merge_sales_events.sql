-- reference: iceberg-tests/sql/snowflake/open_catalog/merge_sales_events.sql:4-26 (M5/Q3)
MERGE INTO {{ namespace }}.sales_events AS t
USING (VALUES
  (2, 11, TIMESTAMP '2024-01-01 00:05:00', 'sku-0002', 6, 5.50, 'US', DATE '2024-01-01', 'app'),
  (9, 14, TIMESTAMP '2024-01-06 08:10:00', 'sku-0006', 7, 15.00, 'DE', DATE '2024-01-06', 'store')
) AS s (event_id, tenant_id, event_ts, product_sku, qty, price, country, ds, channel)
ON t.event_id = s.event_id
WHEN MATCHED THEN UPDATE SET t.qty = s.qty, t.price = s.price, t.channel = s.channel
WHEN NOT MATCHED THEN INSERT (event_id, tenant_id, event_ts, product_sku, qty, price, country, ds, channel)
VALUES (s.event_id, s.tenant_id, s.event_ts, s.product_sku, s.qty, s.price, s.country, s.ds, s.channel);

DELETE FROM {{ namespace }}.sales_events WHERE event_id = 4;

SELECT COUNT(*) AS row_count FROM {{ namespace }}.sales_events;

SELECT SUM(qty) AS sum_qty FROM {{ namespace }}.sales_events;
