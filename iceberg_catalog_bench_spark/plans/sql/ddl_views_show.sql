-- reference: opencatalog/samples/view_create_template.json (SQL-representation view),
--            jupyternotebook/openspark.ipynb SHOW TABLES/VIEWS cells (D13)
CREATE OR REPLACE VIEW items_recent AS
  SELECT item_id, name FROM {{ namespace }}.items WHERE qty >= 3;

SHOW VIEWS;

SHOW TABLES IN {{ namespace }};

SHOW NAMESPACES;

SELECT item_id, name FROM items_recent ORDER BY item_id;
