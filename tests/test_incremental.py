"""Incremental aggregate maintenance: delta-maintained rollups over the
snapshot table's CDC feed must equal full re-aggregation at every version."""

from __future__ import annotations

from pyspark.sql import functions as F

from arches_rascoll_etl_spark.lake.parquet_snapshot import SnapshotTable
from arches_rascoll_etl_spark.operators import incremental as INC
from arches_rascoll_etl_spark.synth import ChangeLogConfig, batch_events

CFG = ChangeLogConfig(
    n_events=4_000, n_repos=6, paths_per_repo=60, n_batches=4,
    schema_add_batch=2, delete_pct=10,
)
GROUP, SUMS = ["lang"], ["commit_seq"]


def _agg_rows(df):
    return {
        tuple(r[c] for c in GROUP): (r["n_rows"], *[r[f"sum_{c}"] for c in SUMS])
        for r in df.collect()
    }


def test_read_changes_include_old_images(spark, tmp_table_dir):
    tbl = SnapshotTable(spark, tmp_table_dir, n_buckets=8)
    for b in range(2):
        tbl.merge(batch_events(spark, CFG, b), batch_id=f"b{b}")
    ch = tbl.read_changes(0, 1, include_old=True)
    rows = ch.collect()
    assert len(rows) > 0
    for r in rows:
        if r["change_op"] == "I":
            assert r["old"] is None and r["new"] is not None
        elif r["change_op"] == "D":
            assert r["old"] is not None and r["new"] is None
        else:
            assert r["old"] is not None and r["new"] is not None
            assert r["new"]["commit_seq"] != r["old"]["commit_seq"]


def test_incremental_rollup_equals_batch_at_every_version(spark, tmp_table_dir):
    tbl = SnapshotTable(spark, tmp_table_dir, n_buckets=8)
    for b in range(CFG.n_batches):
        tbl.merge(batch_events(spark, CFG, b), batch_id=f"b{b}")

    agg = INC.maintain_aggregate(tbl, None, None, 0, GROUP, SUMS)
    assert _agg_rows(agg) == _agg_rows(
        INC.aggregate_snapshot(tbl.read(version=0), GROUP, SUMS)
    )
    for v in range(1, CFG.n_batches):
        agg = INC.maintain_aggregate(tbl, agg, v - 1, v, GROUP, SUMS)
        want = INC.aggregate_snapshot(tbl.read(version=v), GROUP, SUMS)
        assert _agg_rows(agg) == _agg_rows(want), f"diverged at version {v}"


def test_incremental_rollup_group_migration_and_retraction(spark, tmp_table_dir):
    """An update that MOVES a row between groups must retract from the old
    group and apply to the new one; deleting a group's last row must drop
    the group entirely."""
    schema = (
        "repo string, path string, commit_seq long, commit string, op string,"
        " lang string, content string, size long"
    )
    tbl = SnapshotTable(spark, tmp_table_dir, n_buckets=4)
    tbl.merge(
        spark.createDataFrame(
            [
                ("r", "a", 1, "c1", "U", "py", "x", 10),
                ("r", "b", 1, "c1", "U", "py", "y", 20),
                ("r", "c", 1, "c1", "U", "go", "z", 5),
            ],
            schema,
        ),
        batch_id="b0",
    )
    prev = INC.aggregate_snapshot(tbl.read(version=0), ["lang"], ["size"])
    # a migrates py -> rs; c (only go row) deleted
    tbl.merge(
        spark.createDataFrame(
            [
                ("r", "a", 2, "c2", "U", "rs", "x2", 11),
                ("r", "c", 2, "c2", "D", "go", "", 0),
            ],
            schema,
        ),
        batch_id="b1",
    )
    nxt = INC.maintain_aggregate(tbl, prev, 0, 1, ["lang"], ["size"])
    got = {r["lang"]: (r["n_rows"], r["sum_size"]) for r in nxt.collect()}
    assert got == {"py": (1, 20), "rs": (1, 11)}  # go dropped, a migrated
    want = INC.aggregate_snapshot(tbl.read(version=1), ["lang"], ["size"])
    assert got == {r["lang"]: (r["n_rows"], r["sum_size"]) for r in want.collect()}


def _minmax_rows(df, group, cols):
    return {
        tuple(r[c] for c in group): (
            r["n_rows"],
            *[r[f"min_{c}"] for c in cols],
            *[r[f"max_{c}"] for c in cols],
        )
        for r in df.collect()
    }


def test_minmax_maintenance_equals_batch_at_every_version(spark, tmp_table_dir):
    """Affected-group re-agg MIN/MAX must equal the batch aggregate at
    every snapshot, including under the CDC feed's deletes."""
    tbl = SnapshotTable(spark, tmp_table_dir, n_buckets=8)
    for b in range(CFG.n_batches):
        tbl.merge(batch_events(spark, CFG, b), batch_id=f"b{b}")
    group, cols = ["lang"], ["commit_seq", "event_id"]
    agg = INC.maintain_minmax(tbl, None, None, 0, group, cols)
    assert _minmax_rows(agg, group, cols) == _minmax_rows(
        INC.minmax_snapshot(tbl.read(version=0), group, cols), group, cols
    )
    for v in range(1, CFG.n_batches):
        agg = INC.maintain_minmax(tbl, agg, v - 1, v, group, cols)
        want = INC.minmax_snapshot(tbl.read(version=v), group, cols)
        assert _minmax_rows(agg, group, cols) == _minmax_rows(want, group, cols), (
            f"diverged at version {v}"
        )


def test_minmax_delete_of_current_max_finds_runner_up(spark, tmp_table_dir):
    """The exact case that makes MIN/MAX non-invertible: delete the row
    holding the group max — the maintained rollup must surface the
    runner-up, which no signed delta could know. Also: group migration of
    a max row and deletion of a group's last row."""
    schema = (
        "repo string, path string, commit_seq long, commit string, op string,"
        " lang string, content string, size long"
    )
    tbl = SnapshotTable(spark, tmp_table_dir, n_buckets=4)
    tbl.merge(
        spark.createDataFrame(
            [
                ("r", "a", 1, "c1", "U", "py", "x", 50),   # py max
                ("r", "b", 1, "c1", "U", "py", "y", 20),   # py runner-up
                ("r", "c", 1, "c1", "U", "go", "z", 5),    # only go row
                ("r", "d", 1, "c1", "U", "rs", "w", 7),
            ],
            schema,
        ),
        batch_id="b0",
    )
    prev = INC.minmax_snapshot(tbl.read(version=0), ["lang"], ["size"])
    tbl.merge(
        spark.createDataFrame(
            [
                ("r", "a", 2, "c2", "D", "py", "", 0),      # delete py max
                ("r", "c", 2, "c2", "D", "go", "", 0),      # delete go's last row
                ("r", "d", 2, "c2", "U", "py", "w2", 100),  # rs max migrates to py
            ],
            schema,
        ),
        batch_id="b1",
    )
    nxt = INC.maintain_minmax(tbl, prev, 0, 1, ["lang"], ["size"])
    got = {r["lang"]: (r["n_rows"], r["min_size"], r["max_size"]) for r in nxt.collect()}
    # py: b(20) + migrated d(100); go gone; rs gone (its only row migrated)
    assert got == {"py": (2, 20, 100)}
    want = INC.minmax_snapshot(tbl.read(version=1), ["lang"], ["size"])
    assert got == {
        r["lang"]: (r["n_rows"], r["min_size"], r["max_size"]) for r in want.collect()
    }


def test_maintenance_grouped_on_key_column(spark, tmp_table_dir):
    """Regression (r4): group columns that are TABLE KEY columns live
    top-level in the change stream, not inside the old/new payload structs
    — both the SUM delta fold and the MIN/MAX affected-group re-agg must
    resolve them there instead of failing with FIELD_NOT_FOUND."""
    tbl = SnapshotTable(spark, tmp_table_dir, n_buckets=8)
    for b in range(2):
        tbl.merge(batch_events(spark, CFG, b), batch_id=f"b{b}")
    group, sums = ["repo"], ["commit_seq"]

    prev = INC.aggregate_snapshot(tbl.read(version=0), group, sums)
    nxt = INC.maintain_aggregate(tbl, prev, 0, 1, group, sums)
    want = INC.aggregate_snapshot(tbl.read(version=1), group, sums)
    key = lambda df: {  # noqa: E731
        r["repo"]: (r["n_rows"], r["sum_commit_seq"]) for r in df.collect()
    }
    assert key(nxt) == key(want)

    mprev = INC.minmax_snapshot(tbl.read(version=0), group, ["commit_seq"])
    mnxt = INC.maintain_minmax(tbl, mprev, 0, 1, group, ["commit_seq"])
    mwant = INC.minmax_snapshot(tbl.read(version=1), group, ["commit_seq"])
    mkey = lambda df: {  # noqa: E731
        r["repo"]: (r["n_rows"], r["min_commit_seq"], r["max_commit_seq"])
        for r in df.collect()
    }
    assert mkey(mnxt) == mkey(mwant)


FACT_SCHEMA = "fid long, dkey long, amount long, commit_seq long, op string"
DIM_SCHEMA = "dkey long, label string, commit_seq long, op string"


def _mk_join_tables(spark, tmp_path):
    ft = SnapshotTable(
        spark, str(tmp_path / "facts"), key_cols=("fid",),
        order_cols=("commit_seq",), n_buckets=4,
    )
    dt = SnapshotTable(
        spark, str(tmp_path / "dims"), key_cols=("dkey",),
        order_cols=("commit_seq",), n_buckets=4,
    )
    ft.merge(
        spark.createDataFrame(
            [(f, (f % 4) + 1, 10 * f, 1, "U") for f in range(1, 9)], FACT_SCHEMA
        ),
        batch_id="f0",
    )
    dt.merge(
        spark.createDataFrame(
            [(d, f"d{d}", 1, "U") for d in range(1, 6)], DIM_SCHEMA
        ),
        batch_id="d0",
    )
    return ft, dt


def _view_rows(df):
    return {tuple(r) for r in df.select("fid", "dkey", "amount", "label").collect()}


def _want(ft, dt, fv, dv):
    return _view_rows(
        INC.join_snapshot(ft.read(version=fv), dt.read(version=dv), ["dkey"], ["dkey"])
    )


def test_maintain_join_both_sides_move(spark, tmp_path):
    ft, dt = _mk_join_tables(spark, tmp_path)
    view0 = INC.maintain_join(ft, dt, None, None, 0, None, 0, fk_cols=["dkey"])
    assert _view_rows(view0) == _want(ft, dt, 0, 0)

    # fact batch: value update (f1), fk migration f2: d3->d4, delete f3,
    # insert f9 (existing dim), f10 -> brand-new dim d6, f11 -> missing dim
    ft.merge(
        spark.createDataFrame(
            [
                (1, 2, 999, 2, "U"),
                (2, 4, 20, 2, "U"),
                (3, 4, 0, 2, "D"),
                (9, 5, 90, 2, "U"),
                (10, 6, 100, 2, "U"),
                (11, 99, 110, 2, "U"),
            ],
            FACT_SCHEMA,
        ),
        batch_id="f1",
    )
    # dim batch: label update d2, delete d4 (drops f2's migrated row, f4, f8),
    # insert d6 (picks up f10)
    dt.merge(
        spark.createDataFrame(
            [(2, "d2-v2", 2, "U"), (4, "x", 2, "D"), (6, "d6", 2, "U")],
            DIM_SCHEMA,
        ),
        batch_id="d1",
    )
    view1 = INC.maintain_join(ft, dt, view0, 0, 1, 0, 1, fk_cols=["dkey"])
    assert _view_rows(view1) == _want(ft, dt, 1, 1)
    # schema parity with the batch join (column order included)
    assert view1.columns == INC.join_snapshot(
        ft.read(version=1), dt.read(version=1), ["dkey"], ["dkey"]
    ).columns


def test_maintain_join_one_sided_moves(spark, tmp_path):
    ft, dt = _mk_join_tables(spark, tmp_path)
    view = INC.maintain_join(ft, dt, None, None, 0, None, 0, fk_cols=["dkey"])

    # only the dim side moves: the fact change stream is empty
    dt.merge(
        spark.createDataFrame([(1, "d1-v2", 2, "U"), (3, "y", 2, "D")], DIM_SCHEMA),
        batch_id="d1",
    )
    view = INC.maintain_join(ft, dt, view, 0, 0, 0, 1, fk_cols=["dkey"])
    assert _view_rows(view) == _want(ft, dt, 0, 1)

    # only the fact side moves
    ft.merge(
        spark.createDataFrame([(5, 2, 555, 2, "U"), (6, 2, 0, 2, "D")], FACT_SCHEMA),
        batch_id="f1",
    )
    view = INC.maintain_join(ft, dt, view, 0, 1, 1, 1, fk_cols=["dkey"])
    assert _view_rows(view) == _want(ft, dt, 1, 1)
