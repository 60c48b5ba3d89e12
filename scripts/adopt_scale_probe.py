"""Probe: foreign-Iceberg adoption cost must be O(metadata), not
O(data) — adopting a table should never read a data byte, so wall
time scales with manifest ENTRIES while data volume is irrelevant.

Builds foreign chains with a growing file count (each "data file" is
registered in the manifest with fabricated sizes — adoption must not
care whether the bytes exist, proving it never opens them), adopts
each, and prints wall time per scale.

Usage: python scripts/adopt_scale_probe.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_catalog_bench_spark.catalog.iceberg_export import (
    adopt_iceberg_metadata,
)
from iceberg_catalog_bench_spark.session import get_spark


def build_chain(root: str, n_files: int, n_snapshots: int) -> str:
    """Author a metadata-only foreign chain: n_snapshots snapshots,
    the last one listing n_files data files (fabricated paths/sizes —
    adoption must never open them)."""
    meta = os.path.join(root, "metadata")
    os.makedirs(meta, exist_ok=True)
    schema = {"type": "struct", "schema-id": 0, "fields": [
        {"id": 1, "name": "k", "required": False, "type": "long"},
        {"id": 2, "name": "v", "required": False, "type": "double"},
    ]}
    per_snap = max(1, n_files // n_snapshots)
    snaps = []
    entries: list[dict] = []
    for s in range(n_snapshots):
        sid = 100 + s
        for i in range(per_snap):
            fidx = s * per_snap + i
            entries.append({"status": 1, "snapshot-id": sid, "data-file": {
                "content": 0,
                "file-path": os.path.join(root, f"data/f{fidx}.parquet"),
                "file-format": "PARQUET", "partition": {},
                "data-sequence-number": s + 1,
                "record-count": 1000, "file-size-in-bytes": 4 << 20,
                "lower-bounds": {"1": fidx * 1000},
                "upper-bounds": {"1": fidx * 1000 + 999},
            }})
        mpath = os.path.join(meta, f"m-{sid}.json")
        with open(mpath, "w") as fh:
            json.dump({"partition-spec-id": 0, "entries": list(entries)}, fh)
        mlpath = os.path.join(meta, f"sl-{sid}.json")
        with open(mlpath, "w") as fh:
            json.dump({"manifests": [{
                "manifest-path": mpath,
                "manifest-length": os.path.getsize(mpath),
                "content": 0, "partition-spec-id": 0}]}, fh)
        snaps.append({
            "snapshot-id": sid,
            **({"parent-snapshot-id": sid - 1} if s else {}),
            "sequence-number": s + 1,
            "timestamp-ms": 1_700_000_000_000 + s,
            "manifest-list": mlpath, "schema-id": 0,
            "summary": {"operation": "append"}})
    mp = os.path.join(meta, "v1.metadata.json")
    with open(mp, "w") as fh:
        json.dump({
            "format-version": 2, "location": root, "last-column-id": 2,
            "current-schema-id": 0, "schemas": [schema],
            "default-spec-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": []}],
            "last-partition-id": 999, "default-sort-order-id": 0,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "properties": {}, "current-snapshot-id": 100 + n_snapshots - 1,
            "snapshots": snaps, "refs": {},
        }, fh)
    return mp


def build_shared_manifest_chain(root: str, n_files: int,
                                n_snapshots: int) -> str:
    """The REAL long-history shape: one big manifest written once,
    then every later snapshot's manifest list re-references it
    unchanged (plus a 1-file manifest of its own). Without the
    path-memo in ``_parse_iceberg_v2`` adoption re-parses the big
    manifest once PER SNAPSHOT — O(snapshots × files); with it, once
    total — O(files + snapshots)."""
    meta = os.path.join(root, "metadata")
    os.makedirs(meta, exist_ok=True)
    schema = {"type": "struct", "schema-id": 0, "fields": [
        {"id": 1, "name": "k", "required": False, "type": "long"},
        {"id": 2, "name": "v", "required": False, "type": "double"},
    ]}

    def entry(sid: int, seq: int, fidx: int) -> dict:
        return {"status": 1, "snapshot-id": sid, "data-file": {
            "content": 0,
            "file-path": os.path.join(root, f"data/f{fidx}.parquet"),
            "file-format": "PARQUET", "partition": {},
            "data-sequence-number": seq,
            "record-count": 1000, "file-size-in-bytes": 4 << 20,
            "lower-bounds": {"1": fidx * 1000},
            "upper-bounds": {"1": fidx * 1000 + 999},
        }}

    big = os.path.join(meta, "m-big.json")
    with open(big, "w") as fh:
        json.dump({"partition-spec-id": 0,
                   "entries": [entry(100, 1, i) for i in range(n_files)]},
                  fh)
    big_ref = {"manifest-path": big,
               "manifest-length": os.path.getsize(big),
               "content": 0, "partition-spec-id": 0,
               "sequence-number": 1}
    snaps = []
    for s in range(n_snapshots):
        sid = 100 + s
        refs = [big_ref]
        if s:  # each later snapshot adds ONE file in its own manifest
            own = os.path.join(meta, f"m-{sid}.json")
            with open(own, "w") as fh:
                json.dump({"partition-spec-id": 0,
                           "entries": [entry(sid, s + 1, n_files + s)]}, fh)
            refs = refs + [{"manifest-path": own,
                            "manifest-length": os.path.getsize(own),
                            "content": 0, "partition-spec-id": 0,
                            "sequence-number": s + 1}]
            # later snapshots also re-reference every predecessor's
            # 1-file manifest (cumulative live set)
            refs = [big_ref] + [
                {"manifest-path": os.path.join(meta, f"m-{100 + j}.json"),
                 "manifest-length": 1, "content": 0,
                 "partition-spec-id": 0, "sequence-number": j + 1}
                for j in range(1, s + 1)]
        mlpath = os.path.join(meta, f"sl-{sid}.json")
        with open(mlpath, "w") as fh:
            json.dump({"manifests": refs}, fh)
        snaps.append({
            "snapshot-id": sid,
            **({"parent-snapshot-id": sid - 1} if s else {}),
            "sequence-number": s + 1,
            "timestamp-ms": 1_700_000_000_000 + s,
            "manifest-list": mlpath, "schema-id": 0,
            "summary": {"operation": "append"}})
    mp = os.path.join(meta, "v1.metadata.json")
    with open(mp, "w") as fh:
        json.dump({
            "format-version": 2, "location": root, "last-column-id": 2,
            "current-schema-id": 0, "schemas": [schema],
            "default-spec-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": []}],
            "last-partition-id": 999, "default-sort-order-id": 0,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "properties": {}, "current-snapshot-id": 100 + n_snapshots - 1,
            "snapshots": snaps, "refs": {},
        }, fh)
    return mp


def main() -> None:
    """The honest unit is manifest ENTRIES PARSED: each snapshot's
    manifest lists its full cumulative file set (Iceberg semantics),
    so a chain with S snapshots over N final files carries ~N·(S+1)/2
    total entries. Adoption must be linear in THAT — and independent
    of data bytes (the probe's data files don't even exist)."""
    spark = get_spark()
    print(f"{'files':>8} {'snaps':>6} {'entries':>9} {'adopt_s':>8} "
          f"{'entries/s':>10}")
    for n_files, n_snaps in [(1_000, 10), (10_000, 20), (100_000, 40)]:
        root = tempfile.mkdtemp(prefix="adopt-probe-")
        try:
            mp = build_chain(root, n_files, n_snaps)
            per = n_files // n_snaps
            entries = per * n_snaps * (n_snaps + 1) // 2
            t0 = time.perf_counter()
            t = adopt_iceberg_metadata(spark, mp, os.path.join(root, "adopted"))
            dt = time.perf_counter() - t0
            snap = t._snapshot()
            assert len(snap.files) == n_files, len(snap.files)
            print(f"{n_files:>8} {n_snaps:>6} {entries:>9} {dt:>8.2f} "
                  f"{entries / dt:>10.0f}")
        finally:
            shutil.rmtree(root, ignore_errors=True)

    # Axis 2 (VERDICT r8 item 3): snapshot count grows, files fixed,
    # every snapshot re-references the SAME big manifest. The memo in
    # _parse_iceberg_v2 makes this near-flat; without it the time
    # would grow linearly with snapshot count.
    print(f"\n{'files':>8} {'snaps':>6} {'uniq_entries':>13} "
          f"{'adopt_s':>8}")
    for n_snaps in (10, 40, 160):
        n_files = 20_000
        root = tempfile.mkdtemp(prefix="adopt-probe-snap-")
        try:
            mp = build_shared_manifest_chain(root, n_files, n_snaps)
            t0 = time.perf_counter()
            t = adopt_iceberg_metadata(
                spark, mp, os.path.join(root, "adopted"))
            dt = time.perf_counter() - t0
            snap = t._snapshot()
            assert len(snap.files) == n_files + n_snaps - 1
            print(f"{n_files:>8} {n_snaps:>6} {n_files + n_snaps - 1:>13} "
                  f"{dt:>8.2f}")
        finally:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
