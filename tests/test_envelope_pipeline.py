"""End-to-end connector path: envelope JSON → parse → quarantine → lake.

Composes the three independently-tested pieces the way a production
ingest would run them, including the north-star's "new columns appearing
mid-stream": batch 1 arrives under an evolved record schema (added
``lang``) and the lake merge evolves the stored schema; corrupted
messages in both batches land in the dead-letter table with the raw
message preserved.
"""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from arches_rascoll_etl_spark.lake.parquet_snapshot import SnapshotTable
from arches_rascoll_etl_spark.operators.quarantine import REASON_COL
from arches_rascoll_etl_spark.sources.cdc_envelope import (
    RAW_COL,
    parse_cdc_envelope,
    to_cdc_envelope,
)
from arches_rascoll_etl_spark.streaming.checkpoint import Checkpoint
from arches_rascoll_etl_spark.streaming.pipeline import replay
from arches_rascoll_etl_spark.synth import ChangeLogConfig, change_log

V1 = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)
V2 = T.StructType(V1.fields + [T.StructField("lang", T.StringType())])


def test_envelope_to_lake_with_mid_stream_evolution(spark, tmp_path):
    log = change_log(spark, ChangeLogConfig(n_events=2000, n_batches=2))
    log.localCheckpoint(eager=True)

    def envelopes(b):
        batch = log.where(F.col("batch_id") == b)
        cols = ["repo", "path", "content"] + (["lang"] if b == 1 else [])
        env = to_cdc_envelope(
            batch.select(*cols, "op", "commit_seq", "event_id"),
            cols, seq_col="commit_seq", extra_cols=["event_id"],
        )
        # corruption keeps a unique suffix so each dead-letter row is a
        # distinct quarantine key (the raw message IS the key below)
        return env.select(
            F.when(
                F.col("event_id") % 41 == 0,
                F.concat(F.substring("value", 1, 10),
                         F.col("event_id").cast("string")),
            ).otherwise(F.col("value")).alias("value")
        )

    def provider(b):
        return parse_cdc_envelope(envelopes(b), V2 if b == 1 else V1)

    main = SnapshotTable(
        spark, str(tmp_path / "main"),
        key_cols=["repo", "path"], order_cols=["commit_seq"], n_buckets=8,
    )
    quar = SnapshotTable(
        spark, str(tmp_path / "quarantine"),
        key_cols=[RAW_COL], order_cols=["commit_seq"], n_buckets=4,
    )
    res = replay(main, Checkpoint(str(tmp_path / "ckpt")), provider, range(2),
                 quarantine_table=quar)
    assert len(res.applied) == 2

    # stored schema evolved: batch-1 rows carry lang, batch-0 rows NULL
    final = main.read()
    assert "lang" in final.columns
    assert final.where(F.col("lang").isNotNull()).count() > 0

    # final state matches an LWW replay of the uncorrupted typed events
    from arches_rascoll_etl_spark.operators.lww import final_state

    clean = log.where(F.col("event_id") % 41 != 0).withColumn(
        "lang", F.when(F.col("batch_id") == 1, F.col("lang"))
    )
    want = final_state(
        clean.select("repo", "path", "content", "lang", "op", "commit_seq"),
        ["repo", "path"], ["commit_seq"],
    ).drop("op")
    got = final.select("repo", "path", "content", "lang", "commit_seq")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0

    # dead-letter: every corrupted message, reason null_key, raw preserved
    n_bad = log.where(F.col("event_id") % 41 == 0).count()
    qdf = quar.read()
    assert qdf.count() == n_bad and n_bad > 0
    assert qdf.where(F.col(REASON_COL) != "null_key").count() == 0
    assert qdf.where(~F.col(RAW_COL).startswith('{"payload"')).count() == 0
