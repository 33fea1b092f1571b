"""Replay driver: exactly-once, kill/resume on both sides of the commit boundary."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from arches_rascoll_etl_spark import oracle
from arches_rascoll_etl_spark.lake.parquet_snapshot import SnapshotTable
from arches_rascoll_etl_spark.streaming.checkpoint import Checkpoint
from arches_rascoll_etl_spark.streaming.metrics import LineageLog
from arches_rascoll_etl_spark.streaming.pipeline import InjectedFailure, replay
from arches_rascoll_etl_spark.synth import ChangeLogConfig, batch_events, change_log

CFG = ChangeLogConfig(n_events=3_000, n_repos=8, paths_per_repo=80, n_batches=6, schema_add_batch=3)


def _setup(spark, tmp_path):
    tbl = SnapshotTable(spark, str(tmp_path / "tbl"), n_buckets=8)
    ckpt = Checkpoint(str(tmp_path / "ckpt" / "manifest.json"))
    lin = LineageLog(str(tmp_path / "ckpt" / "lineage.jsonl"))
    provider = lambda b: batch_events(spark, CFG, b)  # noqa: E731
    return tbl, ckpt, lin, provider


def _state_set(df):
    return {
        tuple(r)
        for r in df.select("repo", "path", "commit", "lang", F.sha2("content", 256)).collect()
    }


def _oracle(spark):
    return oracle.final_rows([r.asDict() for r in change_log(spark, CFG).collect()])


def test_full_replay_matches_oracle_and_lineage(spark, tmp_path):
    tbl, ckpt, lin, provider = _setup(spark, tmp_path)
    res = replay(tbl, ckpt, provider, range(CFG.n_batches), lineage=lin)
    assert len(res.applied) == CFG.n_batches
    assert res.events == CFG.n_events
    assert _state_set(tbl.read()) == _oracle(spark)
    recs = lin.records()
    assert len(recs) == CFG.n_batches
    for r in recs:
        assert r["merge"]["applied"]
        assert sum(p["rows"] for p in r["partitions"]) == r["merge"]["rows_in"]
        assert r["events_per_sec"] > 0


@pytest.mark.parametrize("mode", ["before_merge", "before_checkpoint"])
def test_kill_resume(spark, tmp_path, mode):
    tbl, ckpt, lin, provider = _setup(spark, tmp_path)
    kw = {f"fail_{mode}": 3}
    with pytest.raises(InjectedFailure):
        replay(tbl, ckpt, provider, range(CFG.n_batches), lineage=lin, **kw)
    # resume from checkpoint: final state identical, no batch applied twice
    res = replay(tbl, ckpt, provider, range(CFG.n_batches), lineage=lin)
    assert _state_set(tbl.read()) == _oracle(spark)
    snaps = tbl.snapshots()
    bids = [s["summary"].get("batch-id") for s in snaps]
    assert len(bids) == len(set(bids)) == CFG.n_batches  # each batch exactly one snapshot
    if mode == "before_checkpoint":
        # batch 3 was lake-committed pre-crash; resume must skip via lake idempotence
        assert "3" in res.skipped or "3" not in res.applied


def test_double_replay_is_noop(spark, tmp_path):
    tbl, ckpt, _, provider = _setup(spark, tmp_path)
    replay(tbl, ckpt, provider, range(CFG.n_batches))
    v = tbl.current_version()
    res2 = replay(tbl, ckpt, provider, range(CFG.n_batches))
    assert res2.applied == [] and len(res2.skipped) == CFG.n_batches
    assert tbl.current_version() == v


def test_stats_prefetch_equivalence(spark, tmp_path):
    """prefetch_stats overlaps batch b+1's key-stats job with batch b's
    apply; the table, snapshot summaries, and per-batch MergeStats must be
    byte-identical to the serial path (incl. across the schema-evolution
    batch — key dtypes are immutable, so precomputed stats stay valid)."""
    tbl_a = SnapshotTable(spark, str(tmp_path / "tbl_a"), n_buckets=8)
    tbl_b = SnapshotTable(spark, str(tmp_path / "tbl_b"), n_buckets=8)
    ck_a = Checkpoint(str(tmp_path / "ck_a.json"))
    ck_b = Checkpoint(str(tmp_path / "ck_b.json"))
    provider = lambda b: batch_events(spark, CFG, b)  # noqa: E731
    res_a = replay(tbl_a, ck_a, provider, range(CFG.n_batches), prefetch_stats=True)
    res_b = replay(tbl_b, ck_b, provider, range(CFG.n_batches), prefetch_stats=False)
    assert res_a.applied == res_b.applied and res_a.events == res_b.events
    assert _state_set(tbl_a.read()) == _state_set(tbl_b.read()) == _oracle(spark)
    for sa, sb in zip(res_a.stats, res_b.stats):
        assert sa.rows_in == sb.rows_in
        assert sa.affected_buckets == sb.affected_buckets
        assert (sa.deletes, sa.upserts) == (sb.deletes, sb.upserts)


def test_key_stats_contract(spark, tmp_path):
    """key_stats: None before the table exists (the creating merge decides
    key dtypes); afterwards equals merge job 1 — including when the batch
    arrives with a NARROWER key dtype than stored (cast before hashing)."""
    tbl = SnapshotTable(spark, str(tmp_path / "tbl"), n_buckets=8)
    b0 = batch_events(spark, CFG, 0)
    assert tbl.key_stats(b0) is None
    tbl.merge(b0, batch_id="0")
    b1 = batch_events(spark, CFG, 1)
    rows = tbl.key_stats(b1)
    affected = sorted(int(r["_bucket"]) for r in rows)
    assert sum(r["n_events"] for r in rows) == b1.count()
    stats = tbl.merge(b1, batch_id="1", precomputed_stats=rows)
    assert stats.applied and stats.affected_buckets == affected
