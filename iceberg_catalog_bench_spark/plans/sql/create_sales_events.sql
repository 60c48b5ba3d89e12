-- reference: iceberg-tests/sql/spark/open_catalog/create_sales_events.sql:1-24 (D3/D4)
CREATE TABLE IF NOT EXISTS {{ namespace }}.sales_events (
  event_id bigint,
  tenant_id int,
  event_ts timestamp,
  sku string,
  qty int,
  price decimal(18,2),
  country string,
  ds date
)
USING iceberg
PARTITIONED BY (days(event_ts))
TBLPROPERTIES ('write.distribution-mode' = 'hash', 'format-version' = '2', 'commit.manifest.min-count-to-merge' = '100');

ALTER TABLE {{ namespace }}.sales_events WRITE ORDERED BY event_ts, tenant_id;
