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


def test_parse_maxwell_semantics(spark):
    from arches_rascoll_etl_spark.sources.cdc_envelope import parse_maxwell

    record = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
    )
    msgs = [
        # insert
        '{"database":"d","table":"t","type":"insert","ts":100,"xid":7,'
        '"data":{"k":1,"v":"a"}}',
        # update: old carries only changed cols and must be IGNORED
        '{"database":"d","table":"t","type":"update","ts":101,"xid":8,'
        '"data":{"k":1,"v":"b"},"old":{"v":"a"}}',
        # delete: full image rides in data (not "before")
        '{"database":"d","table":"t","type":"delete","ts":102,"xid":9,'
        '"data":{"k":1,"v":"b"}}',
        # bootstrap snapshot row -> I
        '{"database":"d","table":"t","type":"bootstrap-insert","ts":50,'
        '"xid":0,"data":{"k":2,"v":"x"}}',
        # unknown type -> NULL op, image still parsed
        '{"database":"d","table":"t","type":"truncate","ts":103,"xid":1,'
        '"data":{"k":3,"v":"y"}}',
        # garbage -> all-NULL typed row, raw preserved
        'not json at all',
    ]
    df = spark.createDataFrame([(m,) for m in msgs], "value string")
    out = parse_maxwell(df, record).collect()
    assert [r["op"] for r in out] == ["I", "U", "D", "I", None, None]
    assert [r["v"] for r in out] == ["a", "b", "b", "x", "y", None]
    # (ts, xid) total order is preserved by the synthesized commit_seq
    seqs = [r["commit_seq"] for r in out[:4]]
    assert seqs == sorted(seqs[:3]) + [50 * (1 << 20) + 0]
    # the restart-safe two-column order (commit_ts, commit_xid) is emitted
    # alongside the packed seq — this is the recommended order_cols pair
    pairs = [(r["commit_ts"], r["commit_xid"]) for r in out[:4]]
    assert pairs == [(100, 7), (101, 8), (102, 9), (50, 0)]
    assert out[5]["raw_value"] == "not json at all"
    assert out[5]["k"] is None and out[5]["commit_seq"] is None
    assert out[5]["commit_ts"] is None


def test_parse_maxwell_restart_inversion_pair_order(spark):
    """MySQL restart: xid resets from a huge server-lifetime value to ~0.
    The packed commit_seq inverts (documented hazard); ordering on the
    (commit_ts, commit_xid) PAIR keeps the post-restart row winning."""
    from arches_rascoll_etl_spark.sources.cdc_envelope import parse_maxwell

    record = T.StructType([T.StructField("k", T.LongType())])
    old_xid = 5_000_000_000  # server-lifetime counter, >> 2^20
    msgs = [
        '{"type":"update","ts":1000,"xid":%d,"data":{"k":1}}' % old_xid,
        # restart: 2s later, xid reset to 3 — this row is NEWER
        '{"type":"update","ts":1002,"xid":3,"data":{"k":1}}',
    ]
    df = spark.createDataFrame([(m,) for m in msgs], "value string")
    out = parse_maxwell(df, record, keep_raw=False).collect()
    pre, post = out[0], out[1]
    # packed seq is inverted across the restart (ts advanced only 2s,
    # far less than old_xid / 2^20 ≈ 4768s)
    assert pre["commit_seq"] > post["commit_seq"]
    # the pair order is NOT inverted
    assert (pre["commit_ts"], pre["commit_xid"]) < (
        post["commit_ts"], post["commit_xid"]
    )


def test_detect_schema_drift_nested_path_and_clean_stream(spark):
    from arches_rascoll_etl_spark.sources.cdc_envelope import detect_schema_drift

    msgs = [
        '{"payload":{"after":{"k":1,"v":"a"}}}',
        '{"payload":{"after":{"k":2,"v":"b","new_col":9}}}',
        '{"payload":{"after":{"k":3,"v":"c","new_col":8,"other":null}}}',
        'garbage',                       # unparseable -> no keys, no report
        '{"payload":{"op":"d"}}',        # no after object -> no keys
    ]
    df = spark.createDataFrame([(m,) for m in msgs], "value string")
    got = {
        r["field"]: (r["n_messages"], r["first_seen_example"])
        for r in detect_schema_drift(
            df, ["k", "v"], json_path="$.payload.after"
        ).collect()
    }
    assert set(got) == {"new_col", "other"}
    assert got["new_col"][0] == 2 and got["other"][0] == 1
    assert "new_col" in got["new_col"][1]
    # a clean stream reports nothing
    clean = spark.createDataFrame([(msgs[0],)], "value string")
    assert detect_schema_drift(clean, ["k", "v"], json_path="$.payload.after").count() == 0
