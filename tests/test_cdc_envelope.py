"""CDC envelope adapter: round-trip fidelity + quarantine of bad messages."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from arches_rascoll_etl_spark.operators.quarantine import (
    REASON_COL,
    split_quarantine,
)
from arches_rascoll_etl_spark.sources.cdc_envelope import (
    RAW_COL,
    parse_cdc_envelope,
    to_cdc_envelope,
)
from arches_rascoll_etl_spark.synth import ChangeLogConfig, change_log

RECORD = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)
RECORD_COLS = ["repo", "path", "content"]


def test_envelope_round_trip(spark):
    log = change_log(spark, ChangeLogConfig(n_events=2000)).select(
        *RECORD_COLS, "op", "commit_seq"
    )
    env = to_cdc_envelope(log, RECORD_COLS, seq_col="commit_seq")
    back = parse_cdc_envelope(env, RECORD, keep_raw=False)
    want = log.select(*RECORD_COLS, "op", F.col("commit_seq").cast("long"))
    got = back.select(*RECORD_COLS, "op", "commit_seq")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # delete images came from `before`: no delete row lost its key
    assert back.where((F.col("op") == "D") & F.col("repo").isNull()).count() == 0


def test_op_mapping_covers_snapshot_reads(spark):
    env = spark.createDataFrame(
        [
            ('{"payload":{"op":"r","after":{"repo":"r1","path":"p","content":"x"},'
             '"source":{"ts_ms":1,"seq":5}}}',),
            ('{"payload":{"op":"z","after":{"repo":"r2","path":"p","content":"x"},'
             '"source":{"ts_ms":1,"seq":6}}}',),
        ],
        "value string",
    )
    out = parse_cdc_envelope(env, RECORD).collect()
    by_repo = {r["repo"]: r for r in out}
    assert by_repo["r1"]["op"] == "I"  # snapshot read -> insert
    assert by_repo["r2"]["op"] is None  # unknown op surfaces as NULL (bad_op later)


def test_unparseable_messages_flow_to_quarantine_with_raw(spark):
    log = change_log(spark, ChangeLogConfig(n_events=1000)).select(
        *RECORD_COLS, "op", "commit_seq", "event_id"
    )
    env = to_cdc_envelope(log, RECORD_COLS, seq_col="commit_seq",
                          extra_cols=["event_id"])
    corrupted = env.select(
        F.when(F.col("event_id") % 37 == 0, F.substring("value", 1, 10))
        .otherwise(F.col("value"))
        .alias("value")
    )
    typed = parse_cdc_envelope(corrupted, RECORD)
    valid, quar = split_quarantine(
        typed, ["repo", "path"], ["commit_seq"], "op"
    )
    n_bad = log.where(F.col("event_id") % 37 == 0).count()
    assert quar.count() == n_bad and n_bad > 0
    # all diverted as null_key (whole image NULL), raw message preserved
    assert quar.where(F.col(REASON_COL) != "null_key").count() == 0
    assert quar.where(F.col(RAW_COL).isNull()).count() == 0
    assert valid.count() == log.count() - n_bad
