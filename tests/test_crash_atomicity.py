"""Failure injection mid-commit (reference spec
`ICEBERG-Interoperability-Test-Spec.md:107-111`): SIGKILL a writer
inside the metadata-write window and assert the table survives —

- the table loads at the prior snapshot (no partial snapshot visible),
- a subsequent commit succeeds (the dead writer's commit lock is
  broken by pid-liveness / lease staleness, not waited on forever),
- ``remove_orphan_files`` collects the half-written debris (the
  orphan data file and the never-renamed metadata temp).

The victim is a real OS process (spawn — nothing shared with the test
but the filesystem), killed while it holds the commit lock and has a
partially-written metadata temp file on disk: exactly the state a
machine crash leaves behind with write-temp + rename metadata commits.
"""

import multiprocessing as mp
import os
import time

from iceberg_catalog_bench_spark.catalog.table import FileEntry, LakeTable

_READY = "victim-inside-write-meta"


def _victim(table_path: str, out_dir: str) -> None:
    """Commit for real, but die (be killed) inside ``_write_meta``:
    after the temp file is partially written, before the rename."""
    from iceberg_catalog_bench_spark.catalog import table as tmod

    t = tmod.LakeTable.load(None, table_path)

    # crash debris 1: a data file written ahead of the commit that will
    # never be referenced by any snapshot
    with open(os.path.join(table_path, "data", "crash-orphan.parquet"), "wb") as fh:
        fh.write(b"PAR1 partial write")

    def dying_write_meta(self) -> None:
        # crash debris 2: the half-written metadata temp (the real
        # _write_meta dies between json.dump and os.replace)
        tmp = os.path.join(
            self.path, tmod._META_DIR, f"{tmod._META_FILE}.tmp-crash"
        )
        with open(tmp, "w") as fh:
            fh.write('{"partial":')
        with open(os.path.join(out_dir, _READY), "w") as fh:
            fh.write(str(os.getpid()))
        time.sleep(120)  # parent SIGKILLs here; rename never happens

    tmod.LakeTable._write_meta = dying_write_meta
    fe = tmod.FileEntry(
        path="data/crash-victim.parquet", rows=1, bytes=10,
        schema_version=0, seq=None,
    )
    snap = t._snapshot()
    t._commit("append", list(snap.files) + [fe], {"writer": "victim"})


def test_sigkill_mid_commit_keeps_table_consistent(spark, tmp_path):
    table_path = str(tmp_path / "t")
    LakeTable.create(spark, table_path, "id bigint")

    # snapshot 1, committed normally (Spark-free metadata commit)
    t = LakeTable.load(None, table_path)
    fe = FileEntry(path="data/base.parquet", rows=5, bytes=50,
                   schema_version=0, seq=None)
    s1 = t._commit("append", [fe], {})

    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir)
    ctx = mp.get_context("spawn")
    proc = ctx.Process(target=_victim, args=(table_path, out_dir))
    proc.start()
    ready = os.path.join(out_dir, _READY)
    deadline = time.time() + 60
    while not os.path.exists(ready) and time.time() < deadline:
        time.sleep(0.02)
    assert os.path.exists(ready), "victim never reached _write_meta"
    proc.kill()  # SIGKILL — no cleanup handlers run
    proc.join(10)
    assert proc.exitcode is not None and proc.exitcode != 0

    # the dead writer's lock and temp file are really on disk
    assert os.path.exists(os.path.join(table_path, "_meta", "commit.lock"))
    assert any(
        "metadata.json.tmp-" in fn
        for fn in os.listdir(os.path.join(table_path, "_meta"))
    )

    # 1) no partial snapshot visible: the table loads at snapshot 1
    t2 = LakeTable.load(None, table_path)
    assert t2._meta["current_snapshot_id"] == s1.snapshot_id
    assert len(t2._meta["snapshots"]) == 1
    assert {e.path for e in t2._snapshot().files} == {"data/base.parquet"}

    # 2) a subsequent commit succeeds — the stale lock is broken by
    # pid-liveness (owner is gone), well inside the lease timeout
    fe2 = FileEntry(path="data/after.parquet", rows=1, bytes=10,
                    schema_version=0, seq=None)
    start = time.time()
    s2 = t2._commit("append", list(t2._snapshot().files) + [fe2], {})
    assert time.time() - start < 10, "stale lock waited for the full lease"
    assert s2.parent_id == s1.snapshot_id
    assert not os.path.exists(os.path.join(table_path, "_meta", "commit.lock"))

    # 3) crash debris is collectable: the orphan data file and the
    # metadata temp both go; referenced files stay referenced
    res = t2.remove_orphan_files(older_than_ms=int(time.time() * 1000) + 60_000)
    assert res["orphan_file_count"] >= 2
    assert not os.path.exists(
        os.path.join(table_path, "data", "crash-orphan.parquet")
    )
    assert not any(
        "metadata.json.tmp-" in fn
        for fn in os.listdir(os.path.join(table_path, "_meta"))
    )
    t3 = LakeTable.load(None, table_path)
    assert t3._meta["current_snapshot_id"] == s2.snapshot_id
