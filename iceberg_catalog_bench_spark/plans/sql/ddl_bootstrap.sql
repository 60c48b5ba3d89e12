-- reference: iceberg-tests/sql/spark/open_catalog/bootstrap_namespace.sql:1 (D1/D2),
--            sql/snowflake/snowflake.sql:57-63 (USE), jupyternotebook/openspark.ipynb SHOW cells (D12/D13)
CREATE SCHEMA IF NOT EXISTS {{ namespace }};

USE {{ namespace }};

SHOW NAMESPACES;
