-- reference: iceberg-tests/sql/databricks/unity_catalog/schema_evolution_sales_events.sql:3-12 (D6/D7/D9)
ALTER TABLE {{ namespace }}.sales_events ADD COLUMN channel string DEFAULT 'web';

ALTER TABLE {{ namespace }}.sales_events RENAME COLUMN sku TO product_sku;

DESCRIBE TABLE {{ namespace }}.sales_events;
