-- reference: sql/snowflake/snowflake.sql:390 (P5 REFRESH),
--            snowflake.sql:355-361 (T3 TIMESTAMP AS OF)
ALTER ICEBERG TABLE {{ namespace }}.items REFRESH;

SELECT item_id, name FROM {{ namespace }}.items WHERE qty >= 3 ORDER BY item_id;

SELECT COUNT(*) AS row_count FROM {{ namespace }}.items
TIMESTAMP AS OF '{{ state.post_replace_snapshot[0].committed_at }}';
