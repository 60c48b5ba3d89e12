-- reference: sql/snowflake/unity_catalog/create_sales_events.sql:4 (D14 IDENTIFIER),
--            iceberg-tests/sql/spark/open_catalog/create_sales_events.sql:1-19 (D3)
CREATE TABLE IF NOT EXISTS {{ namespace }}.items (
  item_id BIGINT,
  name STRING,
  price DOUBLE
) USING iceberg;

INSERT INTO IDENTIFIER('{{ namespace }}.items') VALUES
  (1, 'alpha', 19.99),
  (2, 'beta', 5.00),
  (3, 'gamma', 10.00);

SELECT snapshot_id, committed_at FROM {{ namespace }}.items.snapshots
ORDER BY committed_at DESC LIMIT 1;

SELECT item_id, name, price FROM {{ namespace }}.items ORDER BY item_id;
