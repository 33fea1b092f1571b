"""Dead-letter quarantine: classification, replay diversion, exactly-once.

Malformed events (NULL key, NULL ordering, unknown op) must never reach
the main table's LWW state, must land in the quarantine table with the
right reason, and must stay exactly-once across kill/resume — including
the dangerous window between lake commit and checkpoint write.
"""

import uuid

import pytest
from pyspark.sql import functions as F

from arches_rascoll_etl_spark.lake.parquet_snapshot import SnapshotTable
from arches_rascoll_etl_spark.operators.quarantine import (
    REASON_COL,
    SRC_BATCH_COL,
    split_quarantine,
)
from arches_rascoll_etl_spark.streaming.checkpoint import Checkpoint
from arches_rascoll_etl_spark.streaming.pipeline import InjectedFailure, replay
from arches_rascoll_etl_spark.synth import ChangeLogConfig, change_log


def _corrupt(df):
    """Deterministically corrupt a change log: one reason per residue class.

    Priority must hold where classes overlap (97*101 etc.): null_key wins.
    """
    return (
        df.withColumn(
            "repo", F.when(F.col("event_id") % 97 == 0, None).otherwise(F.col("repo"))
        )
        .withColumn(
            "commit_seq",
            F.when(F.col("event_id") % 101 == 0, None).otherwise(F.col("commit_seq")),
        )
        .withColumn(
            "op", F.when(F.col("event_id") % 103 == 0, F.lit("X")).otherwise(F.col("op"))
        )
    )


@pytest.fixture(scope="module")
def corrupt_log(spark):
    df = _corrupt(change_log(spark, ChangeLogConfig(n_events=4000, n_batches=4)))
    df.localCheckpoint(eager=True)
    return df


def test_split_reasons_and_priority(spark, corrupt_log):
    valid, quar = split_quarantine(
        corrupt_log, ["repo", "path"], ["commit_seq", "commit"], "op"
    )
    rows = {r[REASON_COL]: r["n"] for r in quar.groupBy(REASON_COL).agg(
        F.count("*").alias("n")).collect()}
    base = corrupt_log
    n_key = base.where(F.col("event_id") % 97 == 0).count()
    n_ord = base.where(
        (F.col("event_id") % 101 == 0) & (F.col("event_id") % 97 != 0)
    ).count()
    n_op = base.where(
        (F.col("event_id") % 103 == 0)
        & (F.col("event_id") % 97 != 0)
        & (F.col("event_id") % 101 != 0)
    ).count()
    assert rows.get("null_key", 0) == n_key and n_key > 0
    assert rows.get("null_order", 0) == n_ord and n_ord > 0
    assert rows.get("bad_op", 0) == n_op and n_op > 0
    assert valid.count() + quar.count() == base.count()
    # the valid half carries no corruption and no reason column
    assert REASON_COL not in valid.columns
    assert valid.where(F.col("repo").isNull() | F.col("commit_seq").isNull()
                       | ~F.col("op").isin("I", "U", "D")).count() == 0


def _tables(spark, tmp_path):
    main = SnapshotTable(spark, str(tmp_path / "main"), n_buckets=8)
    quar = SnapshotTable(
        spark,
        str(tmp_path / "quarantine"),
        key_cols=["event_id"],
        order_cols=["event_id"],
        n_buckets=4,
    )
    return main, quar


def _provider(corrupt_log):
    return lambda b: corrupt_log.where(F.col("batch_id") == b)


def test_replay_diverts_and_is_idempotent(spark, tmp_path, corrupt_log):
    main, quar = _tables(spark, tmp_path)
    ckpt = Checkpoint(str(tmp_path / "ckpt"))
    res = replay(main, ckpt, _provider(corrupt_log), range(4), quarantine_table=quar)
    assert len(res.applied) == 4

    # main table state == replaying the pre-filtered valid half alone
    clean_main = SnapshotTable(spark, str(tmp_path / "clean"), n_buckets=8)
    valid, _ = split_quarantine(
        corrupt_log, ["repo", "path"], ["commit_seq", "commit"], "op"
    )
    replay(
        clean_main,
        Checkpoint(str(tmp_path / "ckpt_clean")),
        lambda b: valid.where(F.col("batch_id") == b),
        range(4),
    )
    assert main.read().exceptAll(clean_main.read()).count() == 0
    assert clean_main.read().exceptAll(main.read()).count() == 0

    # quarantine holds exactly the diverted rows, tagged with batch + reason
    qdf = quar.read()
    _, expected_quar = split_quarantine(
        corrupt_log, ["repo", "path"], ["commit_seq", "commit"], "op"
    )
    assert qdf.count() == expected_quar.count()
    assert set(r[REASON_COL] for r in qdf.select(REASON_COL).distinct().collect()) == {
        "null_key", "null_order", "bad_op"
    }
    assert qdf.where(F.col(SRC_BATCH_COL).isNull()).count() == 0
    # the source op survives under src_op; the table's own op is an insert
    assert qdf.where(F.col("src_op") == "X").count() > 0
    # replaying again applies nothing and duplicates nothing
    res2 = replay(main, ckpt, _provider(corrupt_log), range(4), quarantine_table=quar)
    assert res2.applied == [] and len(res2.skipped) == 4
    assert quar.read().count() == qdf.count()


def test_quarantine_exactly_once_across_kill_resume(spark, tmp_path, corrupt_log):
    main, quar = _tables(spark, tmp_path)
    ckpt = Checkpoint(str(tmp_path / "ckpt"))
    # crash in the dangerous window: main merge of batch 2 committed,
    # checkpoint not yet written — quarantine of batch 2 already landed
    with pytest.raises(InjectedFailure):
        replay(
            main, ckpt, _provider(corrupt_log), range(4),
            quarantine_table=quar, fail_before_checkpoint=2,
        )
    res = replay(main, ckpt, _provider(corrupt_log), range(4), quarantine_table=quar)
    assert "2" in res.skipped or "2" in res.applied  # resumed either way
    _, expected_quar = split_quarantine(
        corrupt_log, ["repo", "path"], ["commit_seq", "commit"], "op"
    )
    # no duplicates: lake batch-id idempotence covered the replayed q-2 merge
    assert quar.read().count() == expected_quar.count()
    assert quar.read().groupBy("event_id").count().where(F.col("count") > 1).count() == 0


def test_healthy_stream_records_empty_quarantine_batches(spark, tmp_path):
    clean = change_log(spark, ChangeLogConfig(n_events=1000, n_batches=2))
    main, quar = _tables(spark, tmp_path)
    ckpt = Checkpoint(str(tmp_path / "ckpt"))
    replay(main, ckpt, lambda b: clean.where(F.col("batch_id") == b), range(2),
           quarantine_table=quar)
    assert quar.read().count() == 0
    # empty batches still recorded for idempotence
    assert {"q-0", "q-1"} <= quar.committed_batch_ids()


def test_split_constraints_strict_null_and_priority(spark):
    from arches_rascoll_etl_spark.operators.quarantine import (
        REASON_COL,
        split_constraints,
    )

    df = spark.createDataFrame(
        [
            (1, 10, "ok"),       # valid
            (2, -1, "ok"),       # violates first constraint
            (3, None, "ok"),     # NULL verdict -> strict violation
            (4, 5, "toolongxx"), # violates second constraint
            (5, -1, "toolongxx"),# violates both -> FIRST constraint wins
        ],
        "id long, v long, t string",
    )
    valid, bad = split_constraints(
        df, {"v_nonneg": "v >= 0", "t_len": "length(t) <= 6"}
    )
    assert [r["id"] for r in valid.orderBy("id").collect()] == [1]
    got = {r["id"]: r[REASON_COL] for r in bad.collect()}
    assert got == {2: "v_nonneg", 3: "v_nonneg", 4: "t_len", 5: "v_nonneg"}
    # valid half keeps the input schema (no reason column)
    assert valid.columns == df.columns
