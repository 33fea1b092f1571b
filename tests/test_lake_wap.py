"""Named refs (tags) + write-audit-publish staging on SnapshotTable.

Tags are immutable named snapshot refs that PIN their snapshot against
retention GC (Iceberg tag semantics). WAP staging runs a merge's full
compute + data write but parks the manifest under ``staged-<wap_id>``;
the head moves only on publish (one atomic os.link — no data rewrite),
and a conflicting commit in between makes publish fail rather than
publish a stale LWW state.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from arches_rascoll_etl_spark import oracle
from arches_rascoll_etl_spark.lake.parquet_snapshot import (
    CommitConflictError,
    SnapshotTable,
)
from arches_rascoll_etl_spark.synth import ChangeLogConfig, batch_events

CFG = ChangeLogConfig(n_events=2_000, n_repos=6, paths_per_repo=60, n_batches=4)


def _mk(spark, path, **kw):
    return SnapshotTable(spark, path, n_buckets=4, **kw)


def _state(df):
    return {
        tuple(r)
        for r in df.select("repo", "path", "commit", F.sha2("content", 256)).collect()
    }


def test_tag_read_and_pin_against_expiry(spark, tmp_table_dir):
    tbl = _mk(spark, os.path.join(tmp_table_dir, "t1"))
    for b in range(CFG.n_batches):
        tbl.merge(batch_events(spark, CFG, b), batch_id=f"b{b}")
    tbl.tag("after-b1", version=1)
    s1 = _state(tbl.read(version=1))
    assert _state(tbl.read("after-b1")) == s1
    assert tbl.tags() == {"after-b1": 1}

    # retention would normally drop v0..v1; the tag pins v1 (manifest AND
    # data files), v0 still expires
    res = tbl.expire_snapshots(keep_last=2)
    assert res["removed_snapshots"] == 1  # only v0
    assert _state(tbl.read("after-b1")) == s1
    with pytest.raises(FileNotFoundError):
        tbl.read(version=0).collect()

    # delete the tag: the next expiry drops v1 too
    tbl.delete_tag("after-b1")
    res = tbl.expire_snapshots(keep_last=2)
    assert res["removed_snapshots"] == 1
    with pytest.raises(FileNotFoundError):
        tbl.read(version=1).collect()


def test_tag_is_immutable_and_validated(spark, tmp_table_dir):
    tbl = _mk(spark, os.path.join(tmp_table_dir, "t2"))
    tbl.merge(batch_events(spark, CFG, 0), batch_id="b0")
    tbl.tag("prod")
    with pytest.raises(CommitConflictError):
        tbl.tag("prod")  # never silently moves
    with pytest.raises(ValueError):
        tbl.tag("../escape")
    with pytest.raises(FileNotFoundError):
        tbl.read("no-such-tag").collect()
    with pytest.raises(FileNotFoundError):
        tbl.tag("ghost", version=99)


def test_wap_stage_audit_publish(spark, tmp_table_dir):
    tbl = _mk(spark, os.path.join(tmp_table_dir, "t3"))
    tbl.merge(batch_events(spark, CFG, 0), batch_id="b0")
    head = tbl.current_version()
    before = _state(tbl.read())

    st = tbl.merge(batch_events(spark, CFG, 1), batch_id="b1", stage_as="wap1")
    assert st.staged_as == "wap1" and not st.applied
    assert st.skipped_reason == "staged"
    # head unmoved, batch id NOT committed, published state unchanged
    assert tbl.current_version() == head
    assert "b1" not in tbl.committed_batch_ids()
    assert _state(tbl.read()) == before
    assert tbl.staged() == ["wap1"]

    # audit sees exactly what publish would make current
    audit = _state(tbl.read_staged("wap1"))
    v = tbl.publish_staged("wap1")
    assert v == head + 1 and tbl.current_version() == v
    assert _state(tbl.read()) == audit
    assert "b1" in tbl.committed_batch_ids()
    assert tbl.staged() == []

    # published state == the state a direct (unstaged) replay produces
    direct = _mk(spark, os.path.join(tmp_table_dir, "t3d"))
    for b in range(2):
        direct.merge(batch_events(spark, CFG, b), batch_id=f"b{b}")
    assert _state(tbl.read()) == _state(direct.read())


def test_wap_discard_and_remerge(spark, tmp_table_dir):
    tbl = _mk(spark, os.path.join(tmp_table_dir, "t4"))
    tbl.merge(batch_events(spark, CFG, 0), batch_id="b0")
    before = _state(tbl.read())
    tbl.merge(batch_events(spark, CFG, 1), batch_id="b1", stage_as="bad")
    tbl.discard_staged("bad")
    assert tbl.staged() == [] and _state(tbl.read()) == before
    with pytest.raises(FileNotFoundError):
        tbl.read_staged("bad")
    # discarded batch can be re-merged directly (id was never committed)
    st = tbl.merge(batch_events(spark, CFG, 1), batch_id="b1")
    assert st.applied


def test_wap_publish_conflicts_after_intervening_commit(spark, tmp_table_dir):
    tbl = _mk(spark, os.path.join(tmp_table_dir, "t5"))
    tbl.merge(batch_events(spark, CFG, 0), batch_id="b0")
    tbl.merge(batch_events(spark, CFG, 1), batch_id="b1", stage_as="wap1")
    # another writer lands a commit first
    tbl.merge(batch_events(spark, CFG, 2), batch_id="b2")
    with pytest.raises(CommitConflictError):
        tbl.publish_staged("wap1")
    # staged snapshot remains for inspection until discarded
    assert tbl.staged() == ["wap1"]
    tbl.discard_staged("wap1")
    # re-staging the same id after discard works
    tbl.merge(batch_events(spark, CFG, 1), batch_id="b1", stage_as="wap1")
    tbl.publish_staged("wap1")
    assert "b1" in tbl.committed_batch_ids()


def test_wap_duplicate_stage_id_refused(spark, tmp_table_dir):
    tbl = _mk(spark, os.path.join(tmp_table_dir, "t6"))
    tbl.merge(batch_events(spark, CFG, 0), batch_id="b0", stage_as="w")
    with pytest.raises(CommitConflictError):
        tbl.merge(batch_events(spark, CFG, 1), batch_id="b1", stage_as="w")


def test_wap_orphan_lifecycle(spark, tmp_table_dir):
    """Within grace a staged snapshot's files are LIVE (publish may land);
    past grace the staged manifest is swept and its unique files fall out
    as ordinary orphans in the same pass."""
    tbl = _mk(spark, os.path.join(tmp_table_dir, "t7"))
    tbl.merge(batch_events(spark, CFG, 0), batch_id="b0")
    tbl.merge(batch_events(spark, CFG, 1), batch_id="b1", stage_as="wap1")
    # fresh staged snapshot: nothing sweepable
    res = tbl.remove_orphans(older_than_s=3600.0, force=True)
    assert res["staged_manifests"] == 0 and res["data_files"] == 0
    assert _state(tbl.read_staged("wap1"))  # still auditable

    # age everything out: staged manifest swept, its unique files too,
    # but every file of the committed head survives
    sp = tbl._staged_path("wap1")
    os.utime(sp, (1.0, 1.0))
    root = tbl.path
    for dirpath, _, fns in os.walk(os.path.join(root, "data")):
        for fn in fns:
            os.utime(os.path.join(dirpath, fn), (1.0, 1.0))
    res = tbl.remove_orphans(older_than_s=0.5, force=True)
    assert res["staged_manifests"] == 1 and res["data_files"] > 0
    events = [r.asDict() for r in batch_events(spark, CFG, 0).collect()]
    # head (batch 0 only) still reads completely and correctly
    got = _state(tbl.read())
    want = {
        (repo, path, commit, sha)
        for repo, path, commit, lang, sha in oracle.final_rows(events)
    }
    assert got == want


def test_staged_empty_batch(spark, tmp_table_dir):
    """An empty staged batch publishes a batch-id-only snapshot."""
    tbl = _mk(spark, os.path.join(tmp_table_dir, "t8"))
    tbl.merge(batch_events(spark, CFG, 0), batch_id="b0")
    empty = batch_events(spark, CFG, 1).limit(0)
    st = tbl.merge(empty, batch_id="noop", stage_as="w0")
    assert st.staged_as == "w0" and st.rows_in == 0
    assert "noop" not in tbl.committed_batch_ids()
    before = _state(tbl.read())
    tbl.publish_staged("w0")
    assert "noop" in tbl.committed_batch_ids()
    assert _state(tbl.read()) == before
