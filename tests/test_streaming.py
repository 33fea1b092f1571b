"""Structured Streaming adapter: foreachBatch merge, exactly-once via availableNow."""

from __future__ import annotations

from pyspark.sql import functions as F

from arches_rascoll_etl_spark import oracle
from arches_rascoll_etl_spark.lake.parquet_snapshot import SnapshotTable
from arches_rascoll_etl_spark.streaming.checkpoint import Checkpoint
from arches_rascoll_etl_spark.streaming.pipeline import stream_into_table
from arches_rascoll_etl_spark.synth import ChangeLogConfig, change_log

CFG = ChangeLogConfig(n_events=2_000, n_repos=6, paths_per_repo=60, n_batches=4)


def test_stateful_streaming_lww_matches_oracle(spark, tmp_path):
    """applyInPandasWithState LWW: max emitted winner per key == oracle.

    Every micro-batch emits the then-current winner for updated keys, so
    the greatest (commit_seq, commit) row emitted per key over the whole
    stream must equal the batch-LWW winner."""
    from arches_rascoll_etl_spark.streaming.stateful import streaming_lww

    src = str(tmp_path / "src")
    log = change_log(spark, CFG)
    log.write.partitionBy("batch_id").parquet(src)

    stream = (
        spark.readStream.schema(log.drop("batch_id").schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(src + "/batch_id=*")
    )
    winners = streaming_lww(stream, keys=("repo", "path"), order_cols=("commit_seq", "commit"))
    q = (
        winners.writeStream.format("memory")
        .queryName("lww_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    emitted = spark.sql("SELECT * FROM lww_sink").collect()
    best: dict = {}
    for r in emitted:
        k = (r["repo"], r["path"])
        o = (r["commit_seq"], r["commit"])
        if k not in best or o > (best[k]["commit_seq"], best[k]["commit"]):
            best[k] = r
    got = {
        (k[0], k[1], r["commit"], r["lang"]): r["op"]
        for k, r in best.items()
    }
    events = [r.asDict() for r in log.collect()]
    want = {}
    for e in sorted(events, key=lambda e: (e["commit_seq"], e["commit"])):
        want[(e["repo"], e["path"])] = e
    want_set = {(k[0], k[1], e["commit"], e["lang"]): e["op"] for k, e in want.items()}
    assert got == want_set


def test_stream_replay_matches_oracle(spark, tmp_path):
    src = str(tmp_path / "src")
    log = change_log(spark, CFG)
    log.write.partitionBy("batch_id").parquet(src)

    stream = (
        spark.readStream.schema(log.drop("batch_id").schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(src + "/batch_id=*")
    )
    tbl = SnapshotTable(spark, str(tmp_path / "tbl"), n_buckets=8)
    ckpt = Checkpoint(str(tmp_path / "ckpt" / "manifest.json"))
    q = stream_into_table(stream, tbl, ckpt, str(tmp_path / "spark_ckpt"))
    q.awaitTermination(120)

    got = {
        tuple(r)
        for r in tbl.read()
        .select("repo", "path", "commit", "lang", F.sha2("content", 256))
        .collect()
    }
    events = [r.asDict() for r in log.collect()]
    assert got == oracle.final_rows(events)
    assert len(ckpt.applied_batch_ids()) >= 1

    # restart the same availableNow stream: no new data -> no new snapshots
    v = tbl.current_version()
    q2 = stream_into_table(
        spark.readStream.schema(log.drop("batch_id").schema).parquet(src + "/batch_id=*"),
        tbl,
        ckpt,
        str(tmp_path / "spark_ckpt"),
    )
    q2.awaitTermination(60)
    assert tbl.current_version() == v
