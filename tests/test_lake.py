"""SnapshotTable: COW merge, idempotent commits, schema evolution, time travel."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from arches_rascoll_etl_spark import oracle
from arches_rascoll_etl_spark.lake.parquet_snapshot import SnapshotTable, _merge_schemas
from arches_rascoll_etl_spark.synth import ChangeLogConfig, batch_events, change_log

CFG = ChangeLogConfig(n_events=3_000, n_repos=8, paths_per_repo=80, n_batches=6, schema_add_batch=3)


def _mk(spark, path, **kw):
    return SnapshotTable(spark, path, n_buckets=8, **kw)


def _state_set(df):
    return {
        tuple(r)
        for r in df.select("repo", "path", "commit", "lang", F.sha2("content", 256)).collect()
    }


def test_merge_replay_matches_oracle(spark, tmp_table_dir):
    tbl = _mk(spark, tmp_table_dir)
    for b in range(CFG.n_batches):
        tbl.merge(batch_events(spark, CFG, b), batch_id=f"b{b}")
    events = [r.asDict() for r in change_log(spark, CFG).collect()]
    assert _state_set(tbl.read()) == oracle.final_rows(events)


def test_merge_idempotent_reapply(spark, tmp_table_dir):
    tbl = _mk(spark, tmp_table_dir)
    for b in range(3):
        st = tbl.merge(batch_events(spark, CFG, b), batch_id=f"b{b}")
        assert st.applied
    v = tbl.current_version()
    before = _state_set(tbl.read())
    st = tbl.merge(batch_events(spark, CFG, 1), batch_id="b1")  # re-apply
    assert not st.applied and st.skipped_reason == "already-committed"
    assert tbl.current_version() == v
    assert _state_set(tbl.read()) == before


def test_out_of_order_batch_cannot_regress(spark, tmp_table_dir):
    """Applying an older batch after a newer one must not clobber newer rows."""
    tbl = _mk(spark, tmp_table_dir)
    tbl.merge(batch_events(spark, CFG, 5), batch_id="b5")
    after_new = _state_set(tbl.read())
    tbl.merge(batch_events(spark, CFG, 0), batch_id="b0")
    final = _state_set(tbl.read())
    # every key present in b5's state must still carry its b5 (or later) commit
    keys_new = {(t[0], t[1]): t for t in after_new}
    keys_final = {(t[0], t[1]): t for t in final}
    for k, t in keys_new.items():
        assert keys_final[k] == t


def test_schema_evolution_mid_stream(spark, tmp_table_dir):
    tbl = _mk(spark, tmp_table_dir)
    tbl.merge(batch_events(spark, CFG, 0), batch_id="b0")  # no author/size_bytes
    assert "author" not in tbl.read().columns
    tbl.merge(batch_events(spark, CFG, 4), batch_id="b4")  # evolved cols appear
    cur = tbl.read()
    assert {"author", "size_bytes"} <= set(cur.columns)
    # old rows read as null for new cols; new rows populated
    assert cur.where(F.col("author").isNotNull()).count() > 0
    assert cur.where(F.col("author").isNull()).count() > 0


def test_schema_widening():
    from pyspark.sql import types as T

    old = T.StructType([T.StructField("a", T.IntegerType()), T.StructField("b", T.StringType())])
    new = T.StructType([T.StructField("a", T.LongType()), T.StructField("c", T.DoubleType())])
    merged = _merge_schemas(old, new)
    assert [f.name for f in merged.fields] == ["a", "b", "c"]
    assert merged["a"].dataType.typeName() == "long"


def test_time_travel_and_snapshots(spark, tmp_table_dir):
    tbl = _mk(spark, tmp_table_dir)
    tbl.merge(batch_events(spark, CFG, 0), batch_id="b0")
    v0_state = _state_set(tbl.read())
    tbl.merge(batch_events(spark, CFG, 1), batch_id="b1")
    assert tbl.current_version() == 1
    assert _state_set(tbl.read(version=0)) == v0_state
    snaps = tbl.snapshots()
    assert [s["summary"]["batch-id"] for s in snaps] == ["b0", "b1"]


def test_cow_only_rewrites_affected_buckets(spark, tmp_table_dir):
    tbl = _mk(spark, tmp_table_dir)
    tbl.merge(batch_events(spark, CFG, 0), batch_id="b0")
    m0 = tbl._load_manifest(0)
    # a single-key batch touches exactly one bucket; others keep their files
    one = spark.createDataFrame(
        [("org/solo", "a.py", 999_999, "c", "U", "x")],
        "repo string, path string, commit_seq long, commit string, op string, content string",
    )
    tbl.merge(one, batch_id="solo")
    m1 = tbl._load_manifest(1)
    changed = [b for b in m0["files"] if m0["files"][b] != m1["files"].get(b)]
    assert len(changed) <= 1
    untouched = [b for b in m0["files"] if b not in changed]
    for b in untouched:
        assert m1["files"][b] == m0["files"][b]


def test_tombstones_survive_out_of_order_then_compact(spark, tmp_table_dir):
    """A delete must beat a lower-seq event arriving in a LATER batch, and
    compact() must expire tombstones without changing the live state."""
    tbl = _mk(spark, tmp_table_dir)
    schema = (
        "repo string, path string, commit_seq long, commit string, op string,"
        " lang string, content string"
    )
    tbl.merge(
        spark.createDataFrame([("r", "f.py", 10, "c10", "D", "py", "")], schema),
        batch_id="late",
    )
    # straggler insert at seq 5 arrives after the delete at seq 10
    tbl.merge(
        spark.createDataFrame([("r", "f.py", 5, "c05", "I", "py", "old")], schema),
        batch_id="early",
    )
    assert tbl.read().where("repo = 'r' and path = 'f.py'").count() == 0
    assert tbl._read_stored().where("op = 'D'").count() == 1

    # watermark below the tombstone's seq: nothing expires
    v = tbl.current_version()
    assert tbl.compact(tombstone_watermark=9) == v
    assert tbl._read_stored().where("op = 'D'").count() == 1

    live_before = _state_set(tbl.read())
    new_v = tbl.compact(tombstone_watermark=10)
    assert new_v == v + 1
    assert tbl._read_stored().where("op = 'D'").count() == 0
    assert _state_set(tbl.read()) == live_before


def test_crash_before_commit_link_preserves_snapshot(spark, tmp_table_dir):
    """A commit that crashed before linking its canonical manifest name
    must be invisible (attempt files are never resolved by readers)."""
    import os

    tbl = _mk(spark, tmp_table_dir)
    tbl.merge(batch_events(spark, CFG, 0), batch_id="b0")
    state = _state_set(tbl.read())
    # simulate: next commit wrote its attempt file but crashed before link
    orphan = dict(tbl._load_manifest(0), version=1, parent_version=0,
                  summary={"operation": "merge", "batch-id": "ghost"})
    with open(os.path.join(tmp_table_dir, "manifests", "attempt-deadbeef.json"), "w") as f:
        json.dump(orphan, f)
    tbl2 = _mk(spark, tmp_table_dir)
    assert tbl2.current_version() == 0
    assert _state_set(tbl2.read()) == state
    assert "ghost" not in tbl2.committed_batch_ids()
    # recovery: the next real merge claims version 1 and commits atomically
    st = tbl2.merge(batch_events(spark, CFG, 1), batch_id="b1")
    assert st.applied and tbl2.current_version() == 1
    assert tbl2._load_manifest(1)["summary"]["batch-id"] == "b1"


def test_read_changes_incremental_cdc(spark, tmp_table_dir):
    """read_changes(v0, v2) must equal the brute-force diff of the two
    snapshots' live states (I/U/D net changes)."""
    tbl = _mk(spark, tmp_table_dir)
    for b in range(3):
        tbl.merge(batch_events(spark, CFG, b), batch_id=f"b{b}")

    def live(v):
        return {
            (r["repo"], r["path"]): (r["commit_seq"], r["commit"])
            for r in tbl.read(version=v).select("repo", "path", "commit_seq", "commit").collect()
        }

    s0, s2 = live(0), live(2)
    want = {}
    for k in s2.keys() - s0.keys():
        want[k] = ("I", s2[k])
    for k in s0.keys() - s2.keys():
        want[k] = ("D", s0[k])
    for k in s0.keys() & s2.keys():
        if s0[k] != s2[k]:
            want[k] = ("U", s2[k])

    got = {
        (r["repo"], r["path"]): (r["change_op"], (r["commit_seq"], r["commit"]))
        for r in tbl.read_changes(0, 2).collect()
    }
    assert got == want
    assert len(got) > 0
    # identity diff is empty
    assert tbl.read_changes(2, 2).count() == 0


def test_read_keys_bucket_pruned_lookup(spark, tmp_table_dir):
    """Point lookup reads only the buckets its keys hash into and returns
    exactly the full-scan-filtered rows."""
    tbl = _mk(spark, tmp_table_dir)
    for b in range(2):
        tbl.merge(batch_events(spark, CFG, b), batch_id=f"b{b}")
    sample = [(r["repo"], r["path"]) for r in tbl.read().limit(3).collect()]
    got = {tuple(r) for r in tbl.read_keys(sample)
           .select("repo", "path", "commit", "lang", F.sha2("content", 256)).collect()}
    full = tbl.read()
    want = {
        tuple(r)
        for r in full.join(
            spark.createDataFrame(sample, "repo string, path string"),
            ["repo", "path"], "left_semi",
        ).select("repo", "path", "commit", "lang", F.sha2("content", 256)).collect()
    }
    assert got == want and len(got) == len(sample)
    # pruning is real: the keys' buckets are a strict subset of all buckets
    m = tbl._load_manifest(tbl.current_version())
    key_df = spark.createDataFrame(sample, "repo string, path string")
    wanted = {
        str(r[0])
        for r in key_df.select(tbl._bucket_col(key_df).alias("b")).distinct().collect()
    }
    assert 0 < len(wanted) <= len(sample) < len(m["files"])


def test_empty_batch_merge_is_recorded_noop(spark, tmp_table_dir):
    """A batch with zero events must not disturb state but must still be
    recorded (its batch-id is committed, so resume skips it)."""
    tbl = _mk(spark, tmp_table_dir)
    b0 = batch_events(spark, CFG, 0)
    tbl.merge(b0, batch_id="b0")
    before = _state_set(tbl.read())
    st = tbl.merge(b0.where(F.lit(False)), batch_id="empty-range")
    assert st.applied and st.rows_in == 0 and st.deletes == 0
    assert _state_set(tbl.read()) == before
    assert "empty-range" in tbl.committed_batch_ids()
    st2 = tbl.merge(b0.where(F.lit(False)), batch_id="empty-range")
    assert not st2.applied and st2.skipped_reason == "already-committed"


def test_expire_snapshots_retention(spark, tmp_table_dir):
    """GC old snapshots: live state intact, expired time travel raises,
    only files exclusive to expired snapshots deleted."""
    import os

    import pytest

    tbl = _mk(spark, tmp_table_dir)
    for b in range(3):
        tbl.merge(batch_events(spark, CFG, b), batch_id=f"b{b}")
    live = _state_set(tbl.read())
    res = tbl.expire_snapshots(keep_last=2)
    assert res["removed_snapshots"] == 1
    assert tbl.current_version() == 2
    assert _state_set(tbl.read()) == live
    assert _state_set(tbl.read(version=1)) is not None  # within retention
    with pytest.raises(FileNotFoundError):
        tbl.read(version=0)
    assert [s["version"] for s in tbl.snapshots()] == [1, 2]
    # every file referenced by retained manifests still exists
    for v in (1, 2):
        m = tbl._load_manifest(v)
        for fl in m["files"].values():
            for f in fl:
                assert os.path.exists(os.path.join(tmp_table_dir, f))


def test_concurrent_commit_conflict_detected(spark, tmp_table_dir):
    """Two writers racing for the same version: exactly one wins; the loser
    gets CommitConflictError and the winner's manifest is untouched."""
    import pytest

    from arches_rascoll_etl_spark.lake.parquet_snapshot import CommitConflictError

    tbl = _mk(spark, tmp_table_dir)
    tbl.merge(batch_events(spark, CFG, 0), batch_id="b0")
    winner = dict(tbl._load_manifest(0), version=1, parent_version=0,
                  summary={"operation": "merge", "batch-id": "winner"})
    tbl._commit(winner)
    loser = dict(tbl._load_manifest(0), version=1, parent_version=0,
                 summary={"operation": "merge", "batch-id": "loser"})
    with pytest.raises(CommitConflictError):
        tbl._commit(loser)
    assert tbl.current_version() == 1
    assert tbl._load_manifest(1)["summary"]["batch-id"] == "winner"
    # no attempt-file litter from either path
    import os
    assert not [e for e in os.listdir(os.path.join(tmp_table_dir, "manifests"))
                if e.startswith("attempt-")]


def test_key_dtype_drift_does_not_drop_rows(spark, tmp_table_dir):
    """ADVICE regression: a batch sending a NARROWER key dtype (int where
    the table stores long) must bucket identically to the stored rows —
    murmur3 is dtype-sensitive, so affected buckets must be computed on
    schema-cast keys. Before the fix, the raw-dtype hash selected the wrong
    bucket set and the manifest update silently dropped other keys."""
    long_schema = (
        "repo string, path string, k long, commit_seq long, commit string,"
        " op string, content string"
    )
    int_schema = (
        "repo string, path string, k int, commit_seq long, commit string,"
        " op string, content string"
    )
    tbl = SnapshotTable(spark, tmp_table_dir, key_cols=["repo", "k"], n_buckets=8)
    base = [(f"r{i}", f"p{i}", i, 1, "c1", "U", f"v{i}") for i in range(40)]
    tbl.merge(spark.createDataFrame(base, long_schema), batch_id="b0")
    assert tbl.read().count() == 40
    # update 3 keys via a batch whose key column k is INT
    upd = [(f"r{i}", f"p{i}", i, 2, "c2", "U", f"new{i}") for i in (0, 7, 21)]
    tbl.merge(spark.createDataFrame(upd, int_schema), batch_id="b1")
    cur = tbl.read()
    assert cur.count() == 40  # nothing dropped
    got = {r["k"]: r["content"] for r in cur.collect()}
    for i in range(40):
        assert got[i] == (f"new{i}" if i in (0, 7, 21) else f"v{i}")
    # stored key dtype is unchanged (no widening happened)
    assert dict(tbl.read().dtypes)["k"] == "bigint"


def test_key_column_widening_rejected(spark, tmp_table_dir):
    """Widening a KEY column would re-bucket future writes while old
    buckets keep the old layout — _merge_schemas must refuse."""
    import pytest

    int_schema = "repo string, k int, commit_seq long, commit string, op string, content string"
    long_schema = "repo string, k long, commit_seq long, commit string, op string, content string"
    tbl = SnapshotTable(spark, tmp_table_dir, key_cols=["repo", "k"], n_buckets=8)
    tbl.merge(spark.createDataFrame([("r", 1, 1, "c", "U", "x")], int_schema), batch_id="b0")
    with pytest.raises(ValueError, match="key column"):
        tbl.merge(spark.createDataFrame([("r", 2, 2, "c", "U", "y")], long_schema), batch_id="b1")
    # non-key widening still allowed: value column int->long in a fresh table
    from pyspark.sql import types as T
    old = T.StructType([T.StructField("repo", T.StringType()), T.StructField("n", T.IntegerType())])
    new = T.StructType([T.StructField("repo", T.StringType()), T.StructField("n", T.LongType())])
    assert _merge_schemas(old, new, key_cols=["repo"])["n"].dataType.typeName() == "long"


def test_manifest_records_bucket_fn_and_refuses_mismatch(spark, tmp_table_dir):
    """Manifests carry a bucket-function id + format version; a table
    written under a different bucket function is refused on open paths."""
    import pytest

    from arches_rascoll_etl_spark.lake.parquet_snapshot import (
        BUCKET_FN_ID, FORMAT_VERSION, IncompatibleTableError,
    )

    tbl = _mk(spark, tmp_table_dir)
    tbl.merge(batch_events(spark, CFG, 0), batch_id="b0")
    m = tbl._load_manifest(0)
    assert m["bucket_fn"] == BUCKET_FN_ID
    assert m["format-version"] == FORMAT_VERSION

    # simulate a table written by a build with a different bucket function
    m_bad = dict(m, bucket_fn="xxhash64-concat-v0")
    with open(tbl._manifest_path(0), "w") as f:
        json.dump(m_bad, f)
    tbl2 = _mk(spark, tmp_table_dir)
    with pytest.raises(IncompatibleTableError, match="bucket function"):
        tbl2.read()
    with pytest.raises(IncompatibleTableError):
        tbl2.merge(batch_events(spark, CFG, 1), batch_id="b1")


def test_reopen_adopts_manifest_bucket_count(spark, tmp_table_dir):
    """n_buckets is a table property: reopening with a different
    constructor default must adopt the manifest's value, not split the
    table across two layouts."""
    tbl = SnapshotTable(spark, tmp_table_dir, n_buckets=8)
    tbl.merge(batch_events(spark, CFG, 0), batch_id="b0")
    before = _state_set(tbl.read())
    tbl2 = SnapshotTable(spark, tmp_table_dir, n_buckets=64)  # wrong default
    assert _state_set(tbl2.read()) == before
    assert tbl2.n_buckets == 8  # adopted
    tbl2.merge(batch_events(spark, CFG, 1), batch_id="b1")
    assert tbl2._load_manifest(1)["n_buckets"] == 8


def test_expire_snapshots_guards(spark, tmp_table_dir):
    """keep_last=0 must raise (it would delete the whole table), and a
    table whose only commits were empty batches must expire cleanly."""
    import pytest

    tbl = _mk(spark, tmp_table_dir)
    tbl.merge(batch_events(spark, CFG, 0), batch_id="b0")
    with pytest.raises(ValueError, match="keep_last"):
        tbl.expire_snapshots(keep_last=0)
    assert tbl.read().count() > 0

    # empty-batches-only table: no data dir; expire must not crash
    import shutil
    empty_dir = tmp_table_dir + "_empty"
    tbl2 = _mk(spark, empty_dir)
    e = batch_events(spark, CFG, 0).where(F.lit(False))
    tbl2.merge(e, batch_id="e0")
    tbl2.merge(e, batch_id="e1")
    tbl2.merge(e, batch_id="e2")
    shutil.rmtree(os.path.join(empty_dir, "data"))  # as if never created
    res = tbl2.expire_snapshots(keep_last=2)
    assert res["removed_snapshots"] == 1


def test_merge_at_512_buckets_rewrites_only_touched(spark, tmp_table_dir):
    """Production-ish bucket count: a narrow batch rewrites only the
    buckets its keys hash into; every other bucket's file list is
    byte-identical in the new manifest."""
    cfg = ChangeLogConfig(
        n_events=20_000, n_repos=20, paths_per_repo=500,
        hot_fraction=0.1, n_batches=2, schema_add_batch=0,
    )
    tbl = SnapshotTable(spark, tmp_table_dir, n_buckets=512)
    tbl.merge(batch_events(spark, cfg, 0), batch_id="b0")
    m0 = tbl._load_manifest(tbl.current_version())
    assert len(m0["files"]) > 200  # base load populated most buckets

    keys = [(r["repo"], r["path"]) for r in tbl.read().limit(5).collect()]
    kdf = spark.createDataFrame(keys, "repo string, path string")
    narrow = batch_events(spark, cfg, 1).join(F.broadcast(kdf), ["repo", "path"], "left_semi")
    st = tbl.merge(narrow, batch_id="narrow")
    assert 0 < len(st.affected_buckets) <= len(keys)
    m1 = tbl._load_manifest(tbl.current_version())
    touched = {str(b) for b in st.affected_buckets}
    for b, fl in m0["files"].items():
        if b not in touched:
            assert m1["files"][b] == fl
    # and the state is still exactly base ⊕ narrow under LWW
    assert tbl.read().count() > 0


def test_rebucket_layout_migration(spark, tmp_table_dir):
    """rebucket() rewrites the table under a new bucket count in one
    snapshot: state identical, tombstones carried, manifest adopts the new
    count, subsequent merges prune under the new layout, and time travel
    to the pre-rebucket snapshot still reads under its own layout."""
    tbl = _mk(spark, tmp_table_dir)  # n_buckets=8
    for b in range(3):
        tbl.merge(batch_events(spark, CFG, b), batch_id=f"b{b}")
    before = _state_set(tbl.read())
    v_old = tbl.current_version()
    stored_before = tbl._read_stored(v_old).count()  # incl. tombstones

    v_new = tbl.rebucket(64)
    assert v_new == v_old + 1 and tbl.n_buckets == 64
    m = tbl._load_manifest(v_new)
    assert m["n_buckets"] == 64 and m["summary"]["operation"] == "rebucket"
    assert len(m["files"]) > 8  # actually spread over the new layout
    assert _state_set(tbl.read()) == before
    assert tbl._read_stored(v_new).count() == stored_before  # tombstones kept

    # a fresh handle with a stale constructor default adopts 64
    tbl2 = SnapshotTable(spark, tmp_table_dir, n_buckets=8)
    st = tbl2.merge(batch_events(spark, CFG, 3), batch_id="b3")
    assert tbl2.n_buckets == 64
    assert max(st.affected_buckets) < 64 and st.total_buckets == 64

    # time travel to the pre-rebucket snapshot still works
    assert _state_set(tbl2.read(version=v_old)) == before


def test_read_keys_pushes_in_filters_to_scan(spark, tmp_table_dir):
    """Small key lists push per-column In filters into the parquet scan
    (row-group skipping inside bucket files); result unchanged."""
    import io
    from contextlib import redirect_stdout

    tbl = _mk(spark, tmp_table_dir)
    tbl.merge(batch_events(spark, CFG, 0), batch_id="b0")
    sample = [(r["repo"], r["path"]) for r in tbl.read().limit(2).collect()]
    out = tbl.read_keys(sample)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain(mode="formatted")
    plan = buf.getvalue()
    # single-value In collapses to EqualTo; both forms are pushed scans
    assert "PushedFilters" in plan
    assert "In(path" in plan or "EqualTo(path" in plan
    assert "In(repo" in plan or "EqualTo(repo" in plan
    assert out.count() == len(sample)


def test_remove_orphans(spark, tmp_table_dir):
    """Crash debris (uncommitted data files, attempt manifests) is swept;
    live data, its checksum siblings, and committed manifests are not."""
    import time as _time

    tbl = _mk(spark, tmp_table_dir)
    tbl.merge(batch_events(spark, CFG, 0), batch_id="b0")
    before = _state_set(tbl.read())

    # plant debris: a fake orphan data file + an attempt manifest
    orphan_dir = os.path.join(tmp_table_dir, "data", "deadbeef", "_bucket=0")
    os.makedirs(orphan_dir)
    orphan = os.path.join(orphan_dir, "part-00000-orphan.parquet")
    open(orphan, "wb").write(b"not parquet")
    attempt = os.path.join(tmp_table_dir, "manifests", "attempt-cafe.json")
    open(attempt, "w").write("{}")
    old = _time.time() - 7200
    os.utime(orphan, (old, old))
    os.utime(attempt, (old, old))

    # grace period: young debris is never swept (in-flight commits)
    res0 = tbl.remove_orphans(older_than_s=10**6)
    assert res0 == {"data_files": 0, "attempt_manifests": 0,
                "bloom_sidecars": 0, "staged_manifests": 0}

    # sub-floor grace is refused without force (ADVICE r2: a slow in-flight
    # merge may legitimately spend >1h between first data file and commit)
    with pytest.raises(ValueError, match="safety floor"):
        tbl.remove_orphans(older_than_s=3600)

    res = tbl.remove_orphans(older_than_s=3600, force=True)
    assert res["data_files"] == 1 and res["attempt_manifests"] == 1
    assert not os.path.exists(orphan) and not os.path.exists(attempt)

    # live files (even hour-old ones) survive and the table still reads
    for root, _, fns in os.walk(os.path.join(tmp_table_dir, "data")):
        for fn in fns:
            p = os.path.join(root, fn)
            os.utime(p, (old, old))
    res2 = tbl.remove_orphans(older_than_s=3600, force=True)
    assert res2["data_files"] == 0
    assert _state_set(tbl.read()) == before


def _set_committed_at(table_dir, version, epoch):
    """Rewrite a manifest's committed_at in place (test fixture only)."""
    import json as _json
    import os as _os

    p = _os.path.join(table_dir, "manifests", f"v{version:06d}.json")
    with open(p) as f:
        m = _json.load(f)
    if epoch is None:
        m.pop("committed_at", None)  # simulate a pre-committed_at manifest
    else:
        m["committed_at"] = epoch
    with open(p, "w") as f:
        _json.dump(m, f)
    return p


def test_read_as_of_timestamp(spark, tmp_table_dir):
    import os as _os

    t = SnapshotTable(
        spark, tmp_table_dir, key_cols=("k",), order_cols=("s",), n_buckets=2
    )
    for b in range(3):
        t.merge(
            spark.createDataFrame([(1, f"v{b}", b, "U")], "k long, v string, s long, op string"),
            batch_id=f"b{b}",
        )
        # pin the persisted commit instant, then smash the file mtime to a
        # bogus value — resolution must follow committed_at, not mtime
        p = _set_committed_at(tmp_table_dir, b, 1000.0 + 100 * b)
        _os.utime(p, (5.0, 5.0))
    # fresh handle: out-of-band manifest edits model another writer/DR —
    # a live handle may serve instants from its own-commit cache
    t = SnapshotTable(
        spark, tmp_table_dir, key_cols=("k",), order_cols=("s",), n_buckets=2
    )
    assert t.version_as_of(1000.0) == 0       # exact instant is inclusive
    assert t.version_as_of(1150.0) == 1
    assert t.version_as_of(9e9) == 2
    assert t.read(as_of_ts=1150.0).collect()[0]["v"] == "v1"
    try:
        t.version_as_of(999.0)
        raise AssertionError("expected FileNotFoundError")
    except FileNotFoundError:
        pass
    try:
        t.read(version=1, as_of_ts=1150.0)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_as_of_survives_mtime_rewrite_and_falls_back_for_legacy(
    spark, tmp_table_dir
):
    """The DR/rsync scenario that motivated persisting committed_at: after
    an out-of-band copy rewrites every mtime to 'now', AS-OF resolution is
    unchanged because the instants live inside the manifests. Manifests
    written before the field existed (committed_at stripped) fall back to
    mtime, clamped monotone with the version order."""
    import os as _os
    import time as _time

    t = SnapshotTable(
        spark, tmp_table_dir, key_cols=("k",), order_cols=("s",), n_buckets=2
    )
    for b in range(3):
        t.merge(
            spark.createDataFrame([(1, f"v{b}", b, "U")], "k long, v string, s long, op string"),
            batch_id=f"b{b}",
        )
    # commits carry real (current-epoch) committed_at stamps, ascending
    insts = []
    import json as _json

    for b in range(3):
        with open(
            _os.path.join(tmp_table_dir, "manifests", f"v{b:06d}.json")
        ) as f:
            insts.append(_json.load(f)["committed_at"])
    assert insts == sorted(insts)
    assert all(abs(i - _time.time()) < 3600 for i in insts)
    before = t.version_as_of(insts[1])
    # simulate restore: every mtime becomes 'now'
    now = _time.time()
    for b in range(3):
        _os.utime(
            _os.path.join(tmp_table_dir, "manifests", f"v{b:06d}.json"),
            (now, now),
        )
    assert t.version_as_of(insts[1]) == before == 1
    # legacy manifests (no committed_at): resolution falls back to mtime.
    # Fresh handle per out-of-band edit — a restore implies a new process,
    # and a live handle legitimately caches instants it read or committed.
    for b in range(3):
        p = _set_committed_at(tmp_table_dir, b, None)
        _os.utime(p, (1000.0 + 100 * b,) * 2)
    t = SnapshotTable(
        spark, tmp_table_dir, key_cols=("k",), order_cols=("s",), n_buckets=2
    )
    assert t.version_as_of(1150.0) == 1
    # non-monotone mtimes (cross-host writer interleave) are clamped: a
    # later version never resolves EARLIER than its parent — v2's bogus
    # 900 instant is lifted to v1's 1100, so it never outranks v1 below
    # 1100 but resolves normally at/after it
    _os.utime(
        _os.path.join(tmp_table_dir, "manifests", "v000002.json"),
        (900.0, 900.0),
    )
    t = SnapshotTable(
        spark, tmp_table_dir, key_cols=("k",), order_cols=("s",), n_buckets=2
    )
    assert t.version_as_of(1050.0) == 0   # v2's raw 900 must NOT win here
    assert t.version_as_of(1100.0) == 2   # v2 clamped to v1's instant


def test_remove_orphans_dry_run_reports_without_deleting(spark, tmp_table_dir):
    import os as _os

    t = SnapshotTable(
        spark, tmp_table_dir, key_cols=("k",), order_cols=("s",), n_buckets=2
    )
    t.merge(
        spark.createDataFrame([(1, 1, "U")], "k long, s long, op string"),
        batch_id="b0",
    )
    # plant an aged orphan data file and an aged attempt manifest
    v0 = _os.path.join(tmp_table_dir, "data", "orphan", "_bucket=0")
    _os.makedirs(v0)
    orphan = _os.path.join(v0, "part-junk.parquet")
    open(orphan, "wb").write(b"x")
    att = _os.path.join(tmp_table_dir, "manifests", "attempt-junk.json")
    open(att, "w").write("{}")
    for p in (orphan, att):
        _os.utime(p, (1.0, 1.0))
    rep = t.remove_orphans(older_than_s=60.0, force=True, dry_run=True)
    assert rep["data_files"] == 1 and rep["attempt_manifests"] == 1
    assert _os.path.exists(orphan) and _os.path.exists(att)  # nothing deleted
    rep2 = t.remove_orphans(older_than_s=60.0, force=True)
    assert rep2["data_files"] == 1
    assert not _os.path.exists(orphan) and not _os.path.exists(att)
