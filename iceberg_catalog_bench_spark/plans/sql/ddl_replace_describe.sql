-- reference: sql/snowflake/snowflake.sql:80-96 (D5 CREATE OR REPLACE),
--            schema_evolution_sales_events.sql:12 (D9 DESCRIBE)
CREATE OR REPLACE TABLE {{ namespace }}.items (
  item_id BIGINT,
  name STRING,
  price DOUBLE,
  qty INT
) USING iceberg;

INSERT INTO {{ namespace }}.items VALUES
  (10, 'xray', 5.00, 2),
  (11, 'yankee', 6.00, 3),
  (12, 'zulu', 7.00, 4);

SELECT snapshot_id, committed_at FROM {{ namespace }}.items.snapshots
ORDER BY committed_at DESC LIMIT 1;

INSERT INTO {{ namespace }}.items VALUES (13, 'whiskey', 8.00, 5);

DESCRIBE TABLE {{ namespace }}.items;
