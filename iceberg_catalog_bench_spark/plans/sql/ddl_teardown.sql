-- reference: sql/snowflake/snowflake.sql:210-216 (D10/D11 teardown)
DROP VIEW IF EXISTS items_recent;

DROP TABLE IF EXISTS {{ namespace }}.items;

DROP TABLE IF EXISTS {{ namespace }}.never_existed;

SHOW TABLES IN {{ namespace }};

DROP SCHEMA {{ namespace }};

SHOW NAMESPACES;
