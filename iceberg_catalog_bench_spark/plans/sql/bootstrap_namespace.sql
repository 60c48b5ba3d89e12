-- reference: iceberg-tests/sql/spark/open_catalog/bootstrap_namespace.sql:1 (D1)
CREATE NAMESPACE IF NOT EXISTS {{ namespace }};
