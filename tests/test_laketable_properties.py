"""Property-based LakeTable testing: random DML sequences must agree
with a driver-side pandas reference model (hypothesis generates the
op sequences; the model is the executable spec)."""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iceberg_catalog_bench_spark.catalog import LakeTable

# op = ("append", [ids...]) | ("delete_mod", k) | ("update_add", k)
_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.lists(st.integers(0, 99), min_size=1, max_size=8)),
        st.tuples(st.just("delete_mod"), st.integers(2, 5)),
        st.tuples(st.just("update_add"), st.integers(2, 5)),
    ),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ops=_OPS)
def test_dml_sequence_matches_pandas_model(spark, tmp_path_factory, ops):
    d = str(tmp_path_factory.mktemp("prop") / "t")
    t = LakeTable.create(spark, d, "id bigint, v bigint", partition_by=["bucket(4, id)"])
    model = pd.DataFrame({"id": pd.Series(dtype="int64"), "v": pd.Series(dtype="int64")})
    next_uid = [0]

    for op, arg in ops:
        if op == "append":
            rows = [(next_uid[0] + i, int(x)) for i, x in enumerate(arg)]
            next_uid[0] += len(arg)
            t.append(spark.createDataFrame(rows, "id bigint, v bigint"))
            model = pd.concat(
                [model, pd.DataFrame(rows, columns=["id", "v"])], ignore_index=True
            )
        elif op == "delete_mod":
            if model.empty:
                continue
            t.delete_where(f"v % {arg} = 0")
            model = model[model["v"] % arg != 0]
        elif op == "update_add":
            if model.empty:
                continue
            t.update({"v": f"v + {arg}"}, f"v % {arg} = 1")
            model = model.copy()
            mask = model["v"] % arg == 1
            model.loc[mask, "v"] = model.loc[mask, "v"] + arg

    got = (
        t.read().toPandas().sort_values(["id", "v"]).reset_index(drop=True)
    )
    want = model.sort_values(["id", "v"]).reset_index(drop=True).astype({"id": "int64", "v": "int64"})
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_conflict_then_reload_retry_succeeds(spark, tmp_path):
    """Spec :83 — concurrent writers, no lost commits: a conflicted
    writer reloads the new table state and retries; both mutations
    land."""
    from iceberg_catalog_bench_spark.catalog.table import CommitConflict

    d = str(tmp_path / "t")
    t = LakeTable.create(spark, d, "id bigint, v bigint")
    t.append(spark.createDataFrame([(i, i) for i in range(10)], "id bigint, v bigint"))

    writer_a = LakeTable.load(spark, d)
    writer_b = LakeTable.load(spark, d)
    writer_a.delete_where("id = 1")
    with pytest.raises(CommitConflict):
        writer_b.delete_where("id = 2")
    writer_b._reload()  # optimistic retry: refresh then redo
    writer_b.delete_where("id = 2")
    remaining = {r["id"] for r in LakeTable.load(spark, d).read().collect()}
    assert remaining == set(range(10)) - {1, 2}


def test_concurrent_appends_no_lost_commits(spark, tmp_path):
    """Spec :83 — concurrent appenders: every commit must land
    (fast-append auto-retry re-bases new files onto the advanced
    snapshot under the commit lock)."""
    import threading

    d = str(tmp_path / "t")
    LakeTable.create(spark, d, "id bigint, writer int")
    N_WRITERS, N_APPENDS = 4, 3
    errors = []

    def writer(w):
        try:
            handle = LakeTable.load(spark, d)
            for i in range(N_APPENDS):
                handle.append(
                    spark.createDataFrame([(w * 100 + i, w)], "id bigint, writer int")
                )
                handle._reload()
        except Exception as e:  # noqa: BLE001
            errors.append(f"writer {w}: {e}")

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(N_WRITERS)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    final = LakeTable.load(spark, d)
    assert final.read().count() == N_WRITERS * N_APPENDS
    assert final._snapshot().snapshot_id == N_WRITERS * N_APPENDS


# op space mixing both row-op modes + CDC ops + compaction: the model
# is mode-blind (semantics must be identical), so any divergence in the
# tombstone/sequence machinery shows up as a frame mismatch.
_MOR_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.lists(st.integers(0, 99), min_size=1, max_size=8)),
        st.tuples(st.just("delete_mod"), st.tuples(st.integers(2, 5), st.booleans())),
        st.tuples(st.just("update_add"), st.tuples(st.integers(2, 5), st.booleans())),
        st.tuples(st.just("upsert"), st.lists(st.integers(0, 30), min_size=1, max_size=5)),
        st.tuples(st.just("delete_keys"), st.lists(st.integers(0, 30), min_size=1, max_size=5)),
        st.tuples(st.just("compact"), st.booleans()),
    ),
    min_size=1,
    max_size=7,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ops=_MOR_OPS)
def test_mor_dml_sequence_matches_pandas_model(spark, tmp_path_factory, ops):
    d = str(tmp_path_factory.mktemp("morprop") / "t")
    t = LakeTable.create(spark, d, "id bigint, v bigint", partition_by=["bucket(4, id)"])
    model = pd.DataFrame({"id": pd.Series(dtype="int64"), "v": pd.Series(dtype="int64")})
    next_uid = [0]

    for op, arg in ops:
        if op == "append":
            rows = [(next_uid[0] + i, int(x)) for i, x in enumerate(arg)]
            next_uid[0] += len(arg)
            t.append(spark.createDataFrame(rows, "id bigint, v bigint"))
            model = pd.concat(
                [model, pd.DataFrame(rows, columns=["id", "v"])], ignore_index=True
            )
        elif op == "delete_mod":
            k, use_mor = arg
            if model.empty:
                continue
            t.delete_where(f"v % {k} = 0",
                           mode="merge-on-read" if use_mor else "copy-on-write")
            model = model[model["v"] % k != 0]
        elif op == "update_add":
            k, use_mor = arg
            if model.empty:
                continue
            t.update({"v": f"v + {k}"}, f"v % {k} = 1",
                     mode="merge-on-read" if use_mor else "copy-on-write")
            model = model.copy()
            mask = model["v"] % k == 1
            model.loc[mask, "v"] = model.loc[mask, "v"] + k
        elif op == "upsert":
            rows = [(int(i), int(i) * 1000) for i in sorted(set(arg))]
            t.upsert_by_keys(spark.createDataFrame(rows, "id bigint, v bigint"), on=["id"])
            model = model[~model["id"].isin({i for i, _ in rows})]
            model = pd.concat(
                [model, pd.DataFrame(rows, columns=["id", "v"])], ignore_index=True
            )
        elif op == "delete_keys":
            if t._snapshot() is None:
                continue
            keys = sorted(set(arg))
            t.delete_by_keys(
                spark.createDataFrame([(int(i),) for i in keys], "id bigint")
            )
            model = model[~model["id"].isin(set(keys))]
        elif op == "compact":
            if arg:
                t.rewrite_position_delete_files()
            else:
                t.rewrite_data_files(min_input_files=2)

    got = t.read().toPandas().sort_values(["id", "v"]).reset_index(drop=True)
    want = (
        model.sort_values(["id", "v"]).reset_index(drop=True)
        .astype({"id": "int64", "v": "int64"})
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# op = ("append", [(k, v)...]) | ("del_keys", [k...]) | ("upsert", [(k, v)...])
#    | ("rename", ) — rename flips the key column name back and forth
_EQ_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"),
                  st.lists(st.tuples(st.integers(0, 19), st.integers(0, 99)),
                           min_size=1, max_size=5)),
        st.tuples(st.just("del_keys"),
                  st.lists(st.integers(0, 19), min_size=1, max_size=4, unique=True)),
        st.tuples(st.just("upsert"),
                  st.lists(st.tuples(st.integers(0, 19), st.integers(0, 99)),
                           min_size=1, max_size=4,
                           unique_by=lambda kv: kv[0])),
        st.tuples(st.just("rename"), st.just(None)),
    ),
    min_size=2,
    max_size=6,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ops=_EQ_OPS)
def test_equality_deletes_survive_renames_model(spark, tmp_path_factory, ops):
    """Random interleavings of appends, equality deletes, CDC upserts,
    and KEY-COLUMN RENAMES must agree with a dict model — the field-id
    binding (rename rewrites pending tombstones' key names, frozen
    physical file columns) can't lose or resurrect rows, and the final
    read must bind whatever the key is currently called."""
    d = str(tmp_path_factory.mktemp("eqprop") / "t")
    t = LakeTable.create(spark, d, "k bigint, v bigint",
                         partition_by=["bucket(4, k)"])
    names = ["k", "kk"]
    cur = 0  # index into names
    # model: multiset of rows per key — append can stack duplicates
    model: dict[int, list[int]] = {}

    wrote = False
    for op, arg in ops:
        key = names[cur]
        if op == "append":
            t.append(spark.createDataFrame(arg, f"{key} bigint, v bigint"))
            wrote = True
            for k, v in arg:
                model.setdefault(k, []).append(v)
        elif op == "del_keys":
            if not wrote:
                continue  # the API refuses deletes before any snapshot
            t.delete_by_keys(spark.createDataFrame([(k,) for k in arg], f"{key} bigint"))
            for k in arg:
                model.pop(k, None)
        elif op == "upsert":
            t.upsert_by_keys(
                spark.createDataFrame(arg, f"{key} bigint, v bigint"), on=[key]
            )
            wrote = True
            for k, v in arg:
                model[k] = [v]
        else:  # rename
            t.rename_column(names[cur], names[1 - cur])
            cur = 1 - cur

    key = names[cur]
    got: dict[int, list[int]] = {}
    for r in t.read().collect():
        got.setdefault(r[key], []).append(r["v"])
    want = {k: sorted(vs) for k, vs in model.items()}
    assert {k: sorted(vs) for k, vs in got.items()} == want


# op = ("append", [vals]) | ("evolve", spec_idx) | ("read_where", k)
_PE_FIELDS = ["bucket(2, id)", "truncate(1, c)", "c"]  # bare name = identity
_PE_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.lists(st.integers(0, 99), min_size=1, max_size=6)),
        st.tuples(st.just("evolve"), st.integers(0, 2)),
        st.tuples(st.just("read_where"), st.integers(0, 3)),
    ),
    min_size=2,
    max_size=6,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ops=_PE_OPS)
def test_partition_evolution_sequence_matches_model(spark, tmp_path_factory, ops):
    """Random interleavings of appends and partition-spec evolution
    (toggle bucket/truncate/identity fields on and off between
    generations) must never change READ results: the full read and
    every pruned read (`read(where=...)` — the path that consults
    per-file partition values across mixed-spec generations) must
    equal the pandas model. Files written under any historical spec
    must survive pruning under any later spec."""
    d = str(tmp_path_factory.mktemp("pevo") / "t")
    t = LakeTable.create(spark, d, "id bigint, v bigint, c string")
    model = pd.DataFrame({
        "id": pd.Series(dtype="int64"),
        "v": pd.Series(dtype="int64"),
        "c": pd.Series(dtype="object"),
    })
    next_uid = [0]

    def check(where: str | None, expect: pd.DataFrame) -> None:
        got = (
            t.scan(where) if where else t.read()
        ).toPandas().sort_values(["id"]).reset_index(drop=True)
        want = expect.sort_values(["id"]).reset_index(drop=True).astype(
            {"id": "int64", "v": "int64"}
        )
        pd.testing.assert_frame_equal(
            got[["id", "v", "c"]], want[["id", "v", "c"]], check_dtype=False
        )

    for op, arg in ops:
        if op == "append":
            rows = [(next_uid[0] + i, int(x), f"s{x % 3}") for i, x in enumerate(arg)]
            next_uid[0] += len(arg)
            t.append(spark.createDataFrame(rows, "id bigint, v bigint, c string"))
            model = pd.concat(
                [model, pd.DataFrame(rows, columns=["id", "v", "c"])],
                ignore_index=True,
            )
        elif op == "evolve":
            field = _PE_FIELDS[arg]
            try:
                t.add_partition_field(field)
            except ValueError:
                t.drop_partition_field(field)  # present → toggle off
        elif op == "read_where":
            check(f"c = 's{arg % 3}'", model[model["c"] == f"s{arg % 3}"])
            check(f"v = {arg * 7}", model[model["v"] == arg * 7])

    check(None, model)


# op sequences for the delta-encoding roundtrip property: every op
# commits (encode_meta serializes), every step reloads from disk
# (expand_meta parses) — random interleavings of the ops that mutate
# the snapshot graph in different ways (linear appends, CoW rewrites,
# rollbacks that re-point far back, expiry that drops delta bases,
# branch commits that fork the parent chain).
_DELTA_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.lists(st.integers(0, 99), min_size=1, max_size=5)),
        st.tuples(st.just("delete_mod"), st.integers(2, 5)),
        st.tuples(st.just("rollback"), st.integers(0, 9)),
        st.tuples(st.just("expire"), st.integers(1, 3)),
        st.tuples(st.just("branch_publish"), st.lists(st.integers(0, 99), min_size=1, max_size=4)),
    ),
    min_size=2,
    max_size=7,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ops=_DELTA_OPS)
def test_delta_encoded_metadata_roundtrips_random_histories(
    spark, tmp_path_factory, ops
):
    """The disk metadata's snapshot-list delta encoding must be
    invisible: after ANY commit sequence, a fresh load (expand_meta
    over the freshly encoded document) reproduces the model's current
    state, and time travel to every retained recorded snapshot
    reproduces the state recorded when it was the head."""
    d = str(tmp_path_factory.mktemp("delta") / "t")
    t = LakeTable.create(spark, d, "id bigint, v bigint",
                         partition_by=["bucket(4, id)"])
    model = pd.DataFrame({"id": pd.Series(dtype="int64"),
                          "v": pd.Series(dtype="int64")})
    next_uid = [0]
    history: list[tuple[int, pd.DataFrame]] = []  # (snapshot_id, state)

    def _mk(vals):
        rows = [(next_uid[0] + i, int(x)) for i, x in enumerate(vals)]
        next_uid[0] += len(vals)
        return rows

    for i, (op, arg) in enumerate(ops):
        if op == "append":
            rows = _mk(arg)
            snap = t.append(spark.createDataFrame(rows, "id bigint, v bigint"))
            model = pd.concat(
                [model, pd.DataFrame(rows, columns=["id", "v"])],
                ignore_index=True)
            history.append((snap.snapshot_id, model.copy()))
        elif op == "delete_mod":
            if model.empty:
                continue
            snap = t.delete_where(f"v % {arg} = 0")
            model = model[model["v"] % arg != 0]
            history.append((snap.snapshot_id, model.copy()))
        elif op == "rollback":
            if not history:
                continue
            sid, state = history[arg % len(history)]
            try:
                snap = t.rollback_to_snapshot(sid)
            except KeyError:
                continue  # target expired
            model = state.copy()
            history.append((snap.snapshot_id, model.copy()))
        elif op == "expire":
            t.expire_snapshots(retain_last=arg)
            retained = {s["snapshot_id"] for s in t._meta["snapshots"]}
            history = [(sid, m) for sid, m in history if sid in retained]
        elif op == "branch_publish":
            if t._meta.get("current_snapshot_id") is None:
                continue
            name = f"b{i}"
            t.create_branch(name)
            rows = _mk(arg)
            t.append(spark.createDataFrame(rows, "id bigint, v bigint"),
                     branch=name, wap_id=f"w{i}")
            sid = t.fast_forward(name)
            model = pd.concat(
                [model, pd.DataFrame(rows, columns=["id", "v"])],
                ignore_index=True)
            history.append((sid, model.copy()))

        # encode → disk → expand roundtrip after EVERY op
        t = LakeTable.load(spark, d)
        got = t.read().toPandas().sort_values(["id", "v"]).reset_index(drop=True)
        want = (model.sort_values(["id", "v"]).reset_index(drop=True)
                .astype({"id": "int64", "v": "int64"}))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # time travel to every retained recorded head reproduces its state
    retained = {s["snapshot_id"] for s in t._meta["snapshots"]}
    for sid, state in history:
        if sid not in retained:
            continue
        got = (t.read(snapshot_id=sid).toPandas()
               .sort_values(["id", "v"]).reset_index(drop=True))
        want = (state.sort_values(["id", "v"]).reset_index(drop=True)
                .astype({"id": "int64", "v": "int64"}))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


# append / CoW delete / dynamic partition overwrite over an IDENTITY
# spec (the model can mirror identity replacement exactly; bucket
# transforms would need the engine's hash driver-side)
_IOW_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.lists(st.integers(0, 99), min_size=1, max_size=6)),
        st.tuples(st.just("delete_mod"), st.integers(2, 5)),
        st.tuples(st.just("overwrite_dyn"), st.lists(st.integers(0, 99), min_size=1, max_size=6)),
    ),
    min_size=2,
    max_size=6,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ops=_IOW_OPS)
def test_dynamic_overwrite_sequence_matches_model(spark, tmp_path_factory, ops):
    """Random interleavings of append / CoW delete / dynamic INSERT
    OVERWRITE must agree with the pandas model: an overwrite drops
    exactly the rows of the partitions the incoming batch lands in,
    then adds the batch."""
    d = str(tmp_path_factory.mktemp("iow") / "t")
    t = LakeTable.create(spark, d, "id bigint, v bigint, cat string",
                         partition_by=["identity(cat)"])
    model = pd.DataFrame({"id": pd.Series(dtype="int64"),
                          "v": pd.Series(dtype="int64"),
                          "cat": pd.Series(dtype="object")})
    next_uid = [0]

    def _rows(vals):
        rows = [(next_uid[0] + i, int(x), f"c{int(x) % 3}")
                for i, x in enumerate(vals)]
        next_uid[0] += len(vals)
        return rows

    for op, arg in ops:
        if op == "append":
            rows = _rows(arg)
            t.append(spark.createDataFrame(rows, "id bigint, v bigint, cat string"))
            model = pd.concat(
                [model, pd.DataFrame(rows, columns=["id", "v", "cat"])],
                ignore_index=True)
        elif op == "delete_mod":
            if model.empty:
                continue
            t.delete_where(f"v % {arg} = 0")
            model = model[model["v"] % arg != 0]
        elif op == "overwrite_dyn":
            rows = _rows(arg)
            t.overwrite_partitions(spark.createDataFrame(
                rows, "id bigint, v bigint, cat string"))
            touched = {r[2] for r in rows}
            model = pd.concat(
                [model[~model["cat"].isin(touched)],
                 pd.DataFrame(rows, columns=["id", "v", "cat"])],
                ignore_index=True)

    got = t.read().toPandas().sort_values(["id"]).reset_index(drop=True)
    want = (model.sort_values(["id"]).reset_index(drop=True)
            .astype({"id": "int64", "v": "int64"}))
    pd.testing.assert_frame_equal(
        got[["id", "v", "cat"]], want[["id", "v", "cat"]], check_dtype=False)


# -- branch (WAP) sequences vs a two-ref pandas model ---------------------

# op = ("append_main"|"append_branch", [v...]) | ("update_branch", k)
#    | ("delete_branch", k) | ("update_main", k) | ("publish", 0)
_BR_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append_main"), st.lists(st.integers(0, 99), min_size=1, max_size=5)),
        st.tuples(st.just("append_branch"), st.lists(st.integers(0, 99), min_size=1, max_size=5)),
        st.tuples(st.just("update_branch"), st.integers(2, 5)),
        st.tuples(st.just("delete_branch"), st.integers(2, 5)),
        st.tuples(st.just("update_main"), st.integers(2, 5)),
        st.tuples(st.just("publish"), st.just(0)),
    ),
    min_size=1,
    max_size=7,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ops=_BR_OPS)
def test_branch_dml_sequence_matches_two_ref_model(spark, tmp_path_factory, ops):
    """Random interleavings of main DML, branch-staged DML, and
    fast_forward publishes must agree with a two-ref pandas model —
    including WHEN the publish is allowed: fast_forward succeeds iff
    main has not advanced since the branch last equalled it (ancestry),
    exactly the flag the model tracks. Branch reads never see main
    commits made after the fork; main reads never see staged commits."""
    d = str(tmp_path_factory.mktemp("brprop") / "t")
    t = LakeTable.create(spark, d, "id bigint, v bigint")
    t.append(spark.createDataFrame([(0, 7), (1, 12)], "id bigint, v bigint"))
    t.create_branch("b")

    cols = ["id", "v"]
    main = pd.DataFrame([(0, 7), (1, 12)], columns=cols)
    branch = main.copy()
    diverged = False  # has main advanced past the branch fork point?
    next_uid = [2]

    def _rows(vals):
        rows = [(next_uid[0] + i, int(x)) for i, x in enumerate(vals)]
        next_uid[0] += len(vals)
        return rows

    for op, arg in ops:
        if op == "append_main":
            rows = _rows(arg)
            t.append(spark.createDataFrame(rows, "id bigint, v bigint"))
            main = pd.concat([main, pd.DataFrame(rows, columns=cols)], ignore_index=True)
            diverged = True
        elif op == "append_branch":
            rows = _rows(arg)
            t.append(spark.createDataFrame(rows, "id bigint, v bigint"), branch="b")
            branch = pd.concat([branch, pd.DataFrame(rows, columns=cols)], ignore_index=True)
        elif op == "update_branch":
            if branch.empty:
                continue
            t.update({"v": f"v + {arg}"}, f"v % {arg} = 1", branch="b")
            branch = branch.copy()
            mask = branch["v"] % arg == 1
            branch.loc[mask, "v"] = branch.loc[mask, "v"] + arg
        elif op == "delete_branch":
            if branch.empty:
                continue
            t.delete_where(f"v % {arg} = 0", branch="b")
            branch = branch[branch["v"] % arg != 0]
        elif op == "update_main":
            if main.empty:
                continue
            t.update({"v": f"v + {arg}"}, f"v % {arg} = 1")
            main = main.copy()
            mask = main["v"] % arg == 1
            main.loc[mask, "v"] = main.loc[mask, "v"] + arg
            diverged = True
        elif op == "publish":
            if diverged:
                with pytest.raises(ValueError, match="not an ancestor"):
                    t.fast_forward("b")
            else:
                t.fast_forward("b")
                main = branch.copy()

    def _canon(df):
        return (
            df.sort_values(cols).reset_index(drop=True).astype(
                {"id": "int64", "v": "int64"})
        )

    got_main = _canon(t.read().toPandas())
    got_branch = _canon(t.read_branch("b").toPandas())
    pd.testing.assert_frame_equal(got_main, _canon(main), check_dtype=False)
    pd.testing.assert_frame_equal(got_branch, _canon(branch), check_dtype=False)


# -- conditional MERGE sequences vs a pandas model ------------------------

# op = (source rows as {k: v}, update threshold t, insert modulus m):
# MERGE ... WHEN MATCHED AND src_v > v + t THEN UPDATE SET v = src_v
#           WHEN NOT MATCHED AND v % m = 0 THEN INSERT
_MERGE_OPS = st.lists(
    st.tuples(
        st.dictionaries(st.integers(0, 30), st.integers(0, 99),
                        min_size=1, max_size=6),
        st.integers(0, 5),
        st.integers(2, 4),
    ),
    min_size=1,
    max_size=5,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ops=_MERGE_OPS)
def test_conditional_merge_sequence_matches_pandas_model(
    spark, tmp_path_factory, ops
):
    """Random conditional-MERGE sequences (condition-gated matched
    UPDATE + condition-gated NOT MATCHED INSERT) must agree with a
    pandas model: matched rows failing the update condition stay,
    unmatched source rows failing the insert condition are dropped."""
    d = str(tmp_path_factory.mktemp("mprop") / "t")
    t = LakeTable.create(spark, d, "id bigint, v bigint")
    t.append(spark.createDataFrame([(0, 10), (1, 3)], "id bigint, v bigint"))
    model = {0: 10, 1: 3}

    for src_rows, thresh, mod in ops:
        src = spark.createDataFrame(
            sorted(src_rows.items()), "id bigint, v bigint")
        t.merge(
            src, on=["id"],
            when_matched_update={"v": "src_v"},
            when_matched_update_condition=f"src_v > v + {thresh}",
            when_not_matched_insert=f"v % {mod} = 0",
        )
        for k, v in src_rows.items():
            if k in model:
                if v > model[k] + thresh:
                    model[k] = v
            elif v % mod == 0:
                model[k] = v

    got = sorted((r.id, r.v) for r in t.read().collect())
    assert got == sorted(model.items())
