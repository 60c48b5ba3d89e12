-- reference: blob_dfs/blob-dfs_bench.py:140-155 (P1/P2/P3)
CALL system.rewrite_data_files(table => '{{ namespace }}.sales_events', options => map('min-input-files','2','max-file-size-bytes','536870912'));

CALL system.rewrite_manifests(table => '{{ namespace }}.sales_events');

CALL system.expire_snapshots(table => '{{ namespace }}.sales_events', retain_last => 2);
