"""Hilbert-curve clustering — curve math + rewrite_hilbert layout.

The curve index is pinned by PROPERTIES (bijectivity + unit-step
adjacency over full grids), not a reference implementation — together
these characterize a Hilbert-family curve, which is exactly the
locality guarantee rewrite_hilbert sells.
"""

import itertools
import os
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_catalog_bench_spark.catalog.hilbert import hilbert_index
from iceberg_catalog_bench_spark.catalog.table import LakeTable


@pytest.mark.parametrize("k,bits", [(2, 4), (2, 8), (3, 4), (4, 3)])
def test_hilbert_curve_properties(k, bits):
    side = 1 << bits
    coords = np.array(list(itertools.product(range(side), repeat=k)),
                      dtype=np.uint64)
    h = hilbert_index(coords, bits)
    # bijective: every cell exactly once
    assert sorted(h.tolist()) == list(range(side ** k))
    # adjacent: consecutive curve positions are grid neighbors — the
    # property the Z-curve lacks (its diagonal jumps) and the reason
    # hilbert ranges cover single compact blobs
    pts = coords[np.argsort(h)].astype(np.int64)
    steps = np.abs(np.diff(pts, axis=0)).sum(axis=1)
    assert (steps == 1).all()


def test_hilbert_index_rejects_overflow():
    with pytest.raises(ValueError, match="exceeds"):
        hilbert_index(np.zeros((1, 5), dtype=np.uint64), 16)


def test_rewrite_hilbert_prunes_both_dimensions(spark, tmp_path):
    """After rewriting a 64x64 grid into 16 hilbert-range files, a
    point predicate on EITHER column must exclude most files by footer
    stats (the rewrite_zorder contract, met at least as well)."""
    t = LakeTable.create(spark, str(tmp_path / "h"),
                         "a bigint, b bigint, v double")
    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("a"),
        (F.col("id") / 64).cast("bigint").alias("b"),
        F.col("id").cast("double").alias("v"),
    )
    t.append(grid)
    res = t.rewrite_hilbert(["a", "b"], target_files=16)
    assert res["added_data_files_count"] == 16
    snap = t._snapshot()

    def files_covering(col, val):
        return sum(1 for e in snap.files
                   if e.stats[col][0] <= val <= e.stats[col][1])

    assert files_covering("a", 10) <= 8
    assert files_covering("b", 10) <= 8
    # data rides through unchanged (and _h never lands in the files)
    assert t.read().columns == ["a", "b", "v"]
    assert t.read().count() == 64 * 64
    assert t.read().agg(F.sum("v")).first()[0] == sum(range(64 * 64))
    assert {r["a"] for r in t.scan("a = 10").select("a").collect()} == {10}
    # partitioned tables refuse (layout pinned to the spec)
    tp = LakeTable.create(spark, str(tmp_path / "hp"),
                          "a bigint, v double", partition_by=["bucket(4, a)"])
    tp.append(spark.createDataFrame([(1, 1.0)], "a bigint, v double"))
    with pytest.raises(ValueError, match="unpartitioned"):
        tp.rewrite_hilbert(["a"])


def test_rewrite_hilbert_via_call(spark, tmp_path):
    from iceberg_catalog_bench_spark.engine import SqlEngine

    e = SqlEngine(spark, str(tmp_path / "wh"))
    e.execute("CREATE TABLE ht (a bigint, b bigint)")
    e.execute("INSERT INTO ht SELECT id % 32 AS a, "
              "CAST(id / 32 AS BIGINT) AS b FROM RANGE(1024)")
    res = e.execute(
        "CALL system.rewrite_data_files(table => 'ht', strategy => 'sort', "
        "sort_order => 'hilbert(a, b)', target_files => 8)")[0]
    assert res.rows[0]["added_data_files_count"] == 8
    assert e.execute("SELECT COUNT(*) AS c FROM ht")[0].rows[0]["c"] == 1024


def test_hilbert_ranges_beat_zorder_locality():
    """The sales pitch, measured honestly: at POWER-OF-4 file counts
    both curves split the grid into the same quadrants (equal by
    construction — asserted), but at non-aligned counts hilbert's
    adjacent-step ranges stay compact while z ranges straddle diagonal
    jumps: ≥5% fewer files touched per square range query at 100
    files (measured 0.89×; 0.89–0.93× at 500–2000 files)."""
    side, bits = 128, 7
    coords = np.array(list(itertools.product(range(side), repeat=2)),
                      dtype=np.uint64)
    h = hilbert_index(coords, bits)
    z = np.zeros(len(coords), dtype=np.uint64)
    for i in range(bits):
        z |= ((coords[:, 0] >> np.uint64(i)) & np.uint64(1)) \
            << np.uint64(2 * i)
        z |= ((coords[:, 1] >> np.uint64(i)) & np.uint64(1)) \
            << np.uint64(2 * i + 1)

    def avg_files(curve, n_files):
        fid = (np.argsort(np.argsort(curve)) * n_files) // len(curve)
        grid = np.zeros((side, side), dtype=np.int64)
        grid[coords[:, 0].astype(int), coords[:, 1].astype(int)] = fid
        rng = np.random.default_rng(0)
        touched = []
        for q in (10, 20, 33):
            for _ in range(400):
                x = rng.integers(0, side - q)
                y = rng.integers(0, side - q)
                touched.append(len(np.unique(grid[x:x + q, y:y + q])))
        return float(np.mean(touched))

    # power-of-4 count: same quadrant split, no advantage to claim
    assert avg_files(h, 64) == pytest.approx(avg_files(z, 64))
    # non-aligned count: hilbert strictly better
    zf, hf = avg_files(z, 100), avg_files(h, 100)
    assert hf < 0.95 * zf, (hf, zf)


def test_hilbert_index_properties_random(spark=None):
    """Hypothesis sweep: on RANDOM coordinate sets (not just full
    grids) the index stays in range and is injective — distinct cells
    never collide, at any (k, bits) within the uint64 budget."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        st.integers(min_value=2, max_value=5),
        # bits up to 32 so (k=2, bits=32) — the exact 64-bit index
        # boundary where overflow bugs would live — is generated; the
        # guard skips only the genuinely over-budget draws
        st.integers(min_value=2, max_value=32),
        st.integers(min_value=0, max_value=2**32 - 1),
    )
    def check(k, bits, seed):
        if k * bits > 64:
            return
        side = 1 << bits
        n = min(200, side ** k)
        rng = np.random.default_rng(seed)
        # draw coordinates directly (side**k can be 2^64, past int64 —
        # rng.choice over the flat population would overflow), then
        # dedup rows so the injectivity assert sees distinct cells
        pts = rng.integers(0, side, size=(4 * n, k), dtype=np.uint64)
        pts = np.unique(pts, axis=0)[:n]
        h = hilbert_index(pts, bits)
        assert (h < (1 << (k * bits))).all() if k * bits < 64 else True
        assert len(set(h.tolist())) == len(pts), "distinct cells collided"

    check()
