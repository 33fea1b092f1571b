"""Snapshot rollback (Iceberg ``rollback_to_snapshot`` analogue).

Rollback re-publishes an earlier snapshot as a NEW head (roll-forward:
history is append-only, the head never moves backwards on disk) with
``parent_version`` = the rollback target, so the abandoned snapshots drop
off the ancestor chain. The tests pin the three contracts that matter to
a CDC replay driver:

* state: ``read()`` after rollback equals the target snapshot exactly;
* exactly-once: batch ids applied on the abandoned branch become
  re-appliable (their effects were undone), including through a STALE
  ``committed_batch_ids`` cache populated before the rollback;
* CDC: ``read_changes(abandoned_head, rollback_version)`` emits the
  retraction stream that unwinds the rolled-back merges downstream.

Reference parity note: arches-rascoll-etl has no undo story at all — a bad
load is repaired by re-running the loader over corrected CSVs
(import_business_data in the reference's load scripts); rollback is the
lake-native replacement.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from arches_rascoll_etl_spark.lake.parquet_snapshot import SnapshotTable
from arches_rascoll_etl_spark.synth import ChangeLogConfig, batch_events

CFG = ChangeLogConfig(n_events=2_000, n_repos=6, paths_per_repo=60, n_batches=4)


def _mk(spark, path, **kw):
    return SnapshotTable(spark, path, n_buckets=4, **kw)


def _state(df):
    return {
        tuple(r)
        for r in df.select("repo", "path", "commit", F.sha2("content", 256)).collect()
    }


def test_rollback_restores_state_and_reopens_batch_ids(spark, tmp_table_dir):
    tbl = _mk(spark, os.path.join(tmp_table_dir, "rb1"))
    for b in range(3):
        tbl.merge(batch_events(spark, CFG, b), batch_id=f"b{b}")
    s1 = _state(tbl.read(version=1))
    s2 = _state(tbl.read(version=2))
    # populate the bid cache BEFORE the rollback: the cache head (v2) is
    # about to leave the ancestor chain and must not keep b2 "committed"
    assert tbl.committed_batch_ids() == {"b0", "b1", "b2"}

    v = tbl.rollback(1)
    assert v == 3
    assert tbl.current_version() == 3
    assert _state(tbl.read()) == s1
    # b2's effects were undone — its id must be re-appliable
    assert tbl.committed_batch_ids() == {"b0", "b1"}

    # ... including via a FRESH handle whose cache never saw the branch
    tbl2 = _mk(spark, os.path.join(tmp_table_dir, "rb1"))
    assert tbl2.committed_batch_ids() == {"b0", "b1"}

    # re-applying the undone batch converges back to the v2 state
    tbl.merge(batch_events(spark, CFG, 2), batch_id="b2")
    assert _state(tbl.read()) == s2
    assert tbl.committed_batch_ids() == {"b0", "b1", "b2"}


def test_rollback_via_tag_and_head_guard(spark, tmp_table_dir):
    tbl = _mk(spark, os.path.join(tmp_table_dir, "rb2"))
    for b in range(2):
        tbl.merge(batch_events(spark, CFG, b), batch_id=f"b{b}")
    tbl.tag("good", version=0)
    s0 = _state(tbl.read(version=0))

    assert tbl.rollback("good") == 2
    assert _state(tbl.read()) == s0

    # rolling back to the current head is a no-op request → error
    with pytest.raises(ValueError):
        tbl.rollback(2)
    # unknown snapshot / tag → error, head unchanged
    with pytest.raises(FileNotFoundError):
        tbl.rollback(99)
    assert tbl.current_version() == 2


def test_rollback_emits_retraction_change_stream(spark, tmp_table_dir):
    tbl = _mk(spark, os.path.join(tmp_table_dir, "rb3"))
    for b in range(3):
        tbl.merge(batch_events(spark, CFG, b), batch_id=f"b{b}")
    v_rb = tbl.rollback(1)

    # the change stream from the abandoned head to the rollback snapshot is
    # exactly the inverse of the stream that built the branch
    fwd = {
        (r["change_op"], r["repo"], r["path"])
        for r in tbl.read_changes(1, 2).collect()
    }
    back = {
        (r["change_op"], r["repo"], r["path"])
        for r in tbl.read_changes(2, v_rb).collect()
    }
    inverse = {"I": "D", "D": "I", "U": "U"}
    assert back == {(inverse[op], repo, path) for op, repo, path in fwd}
    # and the net stream across the whole detour is empty
    assert tbl.read_changes(1, v_rb).count() == 0


def test_orphan_sweep_spares_abandoned_branch(spark, tmp_table_dir):
    """remove_orphans must treat a rollback-abandoned snapshot's files as
    LIVE while its manifest is still on disk — sweeping them would corrupt
    time travel (and a roll-forward undo) to a readable manifest."""
    tbl = _mk(spark, os.path.join(tmp_table_dir, "rb5"))
    for b in range(3):
        tbl.merge(batch_events(spark, CFG, b), batch_id=f"b{b}")
    s2 = _state(tbl.read(version=2))
    tbl.rollback(1)

    res = tbl.remove_orphans(older_than_s=0.0, force=True)
    assert res["data_files"] == 0
    assert _state(tbl.read(version=2)) == s2  # abandoned branch intact


def test_expiry_ages_out_abandoned_branch(spark, tmp_table_dir):
    """Abandoned snapshots age out of retention like chain snapshots:
    newer than the retention cut → kept (still time-travelable); older →
    expired with their exclusive files, never a kept snapshot's files."""
    tbl = _mk(spark, os.path.join(tmp_table_dir, "rb6"))
    for b in range(3):
        tbl.merge(batch_events(spark, CFG, b), batch_id=f"b{b}")
    s2 = _state(tbl.read(version=2))
    tbl.rollback(1)  # v3; chain v3 -> v1 -> v0, abandoned v2

    # keep_last=2 keeps v3+v1 (cut=1); v2 >= cut stays readable, v0 expires
    res = tbl.expire_snapshots(keep_last=2)
    assert res["removed_snapshots"] == 1
    assert _state(tbl.read(version=2)) == s2
    with pytest.raises(FileNotFoundError):
        tbl.read(version=0).collect()

    # two more commits push the cut past the abandoned branch
    tbl.merge(batch_events(spark, CFG, 2), batch_id="b2")  # v4
    tbl.merge(batch_events(spark, CFG, 3), batch_id="b3")  # v5
    head = _state(tbl.read())
    res = tbl.expire_snapshots(keep_last=2)  # keeps v5+v4; expires v3,v1,v2
    assert res["removed_snapshots"] == 3
    with pytest.raises(FileNotFoundError):
        tbl.read(version=2).collect()
    # no over-deletion: every file the head references still exists
    m = tbl._load_manifest(tbl.current_version())
    for fl in m["files"].values():
        for f in fl:
            assert os.path.exists(os.path.join(tbl.path, f)), f
    assert _state(tbl.read()) == head


def test_rollback_preserves_point_lookup_pruning(spark, tmp_table_dir):
    tbl = _mk(
        spark,
        os.path.join(tmp_table_dir, "rb4"),
        stats_cols=["commit_seq"],
        key_bloom_fpp=0.01,
    )
    for b in range(3):
        tbl.merge(batch_events(spark, CFG, b), batch_id=f"b{b}")
    tbl.rollback(1)

    # stats/blooms rode along verbatim: point lookups on the restored head
    # return exactly the v1 rows for those keys
    keys = [
        (r["repo"], r["path"])
        for r in tbl.read(version=1).select("repo", "path").distinct().limit(5).collect()
    ]
    got = _state(tbl.read_keys(keys))
    want = {t for t in _state(tbl.read(version=1)) if (t[0], t[1]) in set(keys)}
    assert got == want

    # a merge AFTER the rollback continues the chain normally
    tbl.merge(batch_events(spark, CFG, 3), batch_id="b3")
    assert tbl.current_version() == 4
    assert "b3" in tbl.committed_batch_ids()


def test_rollback_commit_instant_is_fresh_not_copied(spark, tmp_table_dir):
    """rollback() commits a COPY of the target manifest; its commit
    instant must be stamped at ROLLBACK time, not inherited from the
    target's original commit — otherwise AS OF an instant between the
    abandoned head and the rollback resolves to the re-published state
    and silently erases the window where the bad head was live."""
    import json as _json
    import time as _time

    t = _mk(spark, tmp_table_dir)
    for b in range(3):
        t.merge(batch_events(spark, CFG, b), batch_id=f"b{b}")

    def _inst(v):
        with open(
            os.path.join(tmp_table_dir, "manifests", f"v{v:06d}.json")
        ) as f:
            return _json.load(f)["committed_at"]

    t0_inst = _inst(0)
    _time.sleep(0.05)
    rb_version = t.rollback(0)
    assert rb_version == 3
    # fresh stamp: strictly after the copied target's instant and ~now
    assert _inst(3) > t0_inst
    assert abs(_inst(3) - _time.time()) < 60
    # AS OF just before the rollback still resolves the abandoned head
    assert t.version_as_of(_inst(3) - 0.02) == 2
    assert t.version_as_of(_inst(3)) == 3
