"""Round-15 probe: cost of the rendered-key entry sort.

r15 sorts map entries by the recursively-RENDERED key bytes (which is
what admits float/binary/struct/array map KEYS); this probe measures
the rendering over 1M map entries for the r14-benchmarked string-key
shape (regression guard) and the newly-admitted float-key shape.
Records land in BASELINE.md round-15 section.
"""
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, "/root/repo")

from iceberg_catalog_bench_spark.streaming.table_source import (  # noqa: E402
    _canon_map_cols,
)


def main() -> None:
    rng = np.random.default_rng(7)
    n, e = 250_000, 4  # 1M entries over 250k rows
    offs = pa.array(np.arange(0, n * e + 1, e, dtype=np.int32))
    vals = pa.array(rng.integers(0, 1000, n * e))
    shapes = {
        "string-keyed": pa.array(
            [f"k{int(x)}" for x in rng.integers(0, 50, n * e)]),
        "float-keyed": pa.array(rng.random(n * e)),
        "binary-keyed": pa.array(
            [b"\x00" + bytes([int(x)]) for x in
             rng.integers(0, 250, n * e)]),
    }
    for name, keys in shapes.items():
        m = pa.MapArray.from_arrays(offs, keys, vals)
        _canon_map_cols(m)  # warm
        t0 = time.perf_counter()
        _canon_map_cols(m)
        t1 = time.perf_counter()
        print(f"{name:14s} {t1 - t0:.3f}s / {n} rows / {n * e} entries")


if __name__ == "__main__":
    main()
