"""LWW merge vs the pure-Python oracle, across all three formulations."""

from __future__ import annotations

from pyspark.sql import functions as F

from arches_rascoll_etl_spark import oracle
from arches_rascoll_etl_spark.operators import lww
from arches_rascoll_etl_spark.synth import ChangeLogConfig, change_log

CFG = ChangeLogConfig(n_events=4_000, n_repos=10, paths_per_repo=120, n_batches=8)


def _oracle_final(spark):
    events = [r.asDict() for r in change_log(spark, CFG).collect()]
    return oracle.final_rows(events)


def _spark_final(df):
    out = df.select(
        "repo", "path", "commit", "lang", F.sha2("content", 256).alias("content_sha"),
    )
    return {tuple(r) for r in out.collect()}


def test_lww_latest_matches_oracle(spark):
    df = lww.final_state(change_log(spark, CFG))
    assert _spark_final(df) == _oracle_final(spark)


def test_lww_window_matches_latest(spark):
    log = change_log(spark, CFG)
    a = lww.lww_latest(log, ["repo", "path"], ["commit_seq", "commit"])
    b = lww.lww_window(log, ["repo", "path"], ["commit_seq", "commit"])
    cols = sorted(a.columns)
    assert {tuple(r) for r in a.select(cols).collect()} == {tuple(r) for r in b.select(cols).collect()}


def test_lww_salted_matches_latest(spark):
    log = change_log(spark, CFG)
    a = lww.lww_latest(log, ["repo", "path"], ["commit_seq", "commit"])
    b = lww.lww_latest_salted(log, ["repo", "path"], ["commit_seq", "commit"], salt_buckets=16)
    cols = sorted(a.columns)
    assert {tuple(r) for r in a.select(cols).collect()} == {tuple(r) for r in b.select(cols).collect()}


def test_delete_then_reinsert_within_batch_resolved_by_seq(spark):
    rows = [
        ("r", "p", 1, "c1", "I", "v1"),
        ("r", "p", 3, "c3", "U", "v3"),  # re-insert after delete: seq wins
        ("r", "p", 2, "c2", "D", None),
        ("r", "q", 1, "c1", "I", "v1"),
        ("r", "q", 2, "c2", "D", None),  # delete wins for q
    ]
    df = spark.createDataFrame(rows, "repo string, path string, commit_seq long, commit string, op string, content string")
    out = lww.final_state(df).select("repo", "path", "content").collect()
    assert {(r.repo, r.path, r.content) for r in out} == {("r", "p", "v3")}


def test_synth_determinism(spark):
    chk = F.expr("bit_xor(xxhash64(concat_ws('|', repo, path, commit, content, op)))")
    a = change_log(spark, CFG).agg(chk).first()[0]
    b = change_log(spark, CFG).agg(chk).first()[0]
    assert a == b


def test_synth_skew_present(spark):
    counts = change_log(spark, CFG).groupBy("repo").count().orderBy(F.desc("count")).limit(1).collect()
    assert counts[0]["repo"] == "org/repo_00000"
    assert counts[0]["count"] > CFG.n_events * 0.4
