"""SCD Type-2 history materialization from a change log (operators/scd.py)."""

from __future__ import annotations

from arches_rascoll_etl_spark.operators.scd import scd2_history


def _hist(spark, rows):
    df = spark.createDataFrame(rows, "k string, seq long, op string, v string")
    out = scd2_history(df, keys=("k",), order_col="seq")
    return sorted(
        (r["k"], r["valid_from_seq"], r["valid_to_seq"], r["is_current"], r["v"])
        for r in out.collect()
    )


def test_scd2_upsert_chain(spark):
    rows = [("a", 1, "U", "v1"), ("a", 3, "U", "v2"), ("a", 7, "U", "v3")]
    assert _hist(spark, rows) == [
        ("a", 1, 3, False, "v1"),
        ("a", 3, 7, False, "v2"),
        ("a", 7, None, True, "v3"),
    ]


def test_scd2_delete_closes_without_emitting(spark):
    rows = [("a", 1, "U", "v1"), ("a", 4, "D", None), ("a", 9, "U", "v2")]
    # the delete terminates v1's interval at seq 4 and emits no row; the
    # re-insert at 9 opens a fresh current interval
    assert _hist(spark, rows) == [
        ("a", 1, 4, False, "v1"),
        ("a", 9, None, True, "v2"),
    ]


def test_scd2_deleted_key_has_no_current_row(spark):
    rows = [("a", 1, "U", "v1"), ("a", 2, "D", None),
            ("b", 5, "U", "w1")]
    assert _hist(spark, rows) == [
        ("a", 1, 2, False, "v1"),
        ("b", 5, None, True, "w1"),
    ]


def test_scd2_keys_are_independent(spark):
    rows = [("a", 10, "U", "v1"), ("b", 1, "U", "w1"), ("a", 11, "U", "v2")]
    assert _hist(spark, rows) == [
        ("a", 10, 11, False, "v1"),
        ("a", 11, None, True, "v2"),
        ("b", 1, None, True, "w1"),
    ]


def test_maintain_scd2_equals_full_recompute_at_every_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from arches_rascoll_etl_spark.lake.parquet_snapshot import SnapshotTable
    from arches_rascoll_etl_spark.operators.scd import maintain_scd2
    from arches_rascoll_etl_spark.synth import ChangeLogConfig, batch_events

    cfg = ChangeLogConfig(
        n_events=3_000, n_repos=5, paths_per_repo=40, n_batches=3, delete_pct=12
    )
    keys, order = ("repo", "path"), "commit_seq"
    hist = SnapshotTable(
        spark, str(tmp_path / "hist"),
        key_cols=(*keys, "valid_from_seq"), order_cols=("_scd_seq",),
        n_buckets=8,
    )
    applied = None
    for b in range(cfg.n_batches):
        batch = batch_events(spark, cfg, b).drop("batch_id")
        maintain_scd2(hist, batch, keys, order, batch_seq=b, batch_id=f"b{b}")
        applied = batch if applied is None else applied.unionByName(batch)
        want = scd2_history(applied, keys, order)
        cols = sorted(want.columns)
        got = hist.read().select(*cols)
        w, g = (
            {tuple(r) for r in want.select(*cols).collect()},
            {tuple(r) for r in got.collect()},
        )
        assert w == g, f"diverged at batch {b}: only_want={list(w-g)[:3]} only_got={list(g-w)[:3]}"


def test_maintain_scd2_delete_leading_batch_closes_open_row(spark, tmp_path):
    from pyspark.sql import functions as F  # noqa: F401

    from arches_rascoll_etl_spark.lake.parquet_snapshot import SnapshotTable
    from arches_rascoll_etl_spark.operators.scd import maintain_scd2

    hist = SnapshotTable(
        spark, str(tmp_path / "hist"),
        key_cols=("k", "valid_from_seq"), order_cols=("_scd_seq",), n_buckets=2,
    )
    schema = "k string, v string, commit_seq long, op string"
    maintain_scd2(
        hist, spark.createDataFrame([("a", "v1", 1, "U")], schema),
        ("k",), "commit_seq", batch_seq=0, batch_id="b0",
    )
    # next batch: delete at 5, reinsert at 9
    maintain_scd2(
        hist, spark.createDataFrame([("a", None, 5, "D"), ("a", "v2", 9, "U")], schema),
        ("k",), "commit_seq", batch_seq=1, batch_id="b1",
    )
    rows = {r["valid_from_seq"]: (r["valid_to_seq"], r["is_current"])
            for r in hist.read().collect()}
    assert rows == {1: (5, False), 9: (None, True)}


def test_maintain_scd2_is_idempotent_per_batch_id(spark, tmp_path):
    """Re-running a maintenance call after a crash (same batch_id) is a
    no-op: the lake's exactly-once batch-id guard skips the merge even
    though the recomputed batch rows would now differ (they are derived
    from the already-updated live state)."""
    from arches_rascoll_etl_spark.lake.parquet_snapshot import SnapshotTable
    from arches_rascoll_etl_spark.operators.scd import maintain_scd2

    hist = SnapshotTable(
        spark, str(tmp_path / "hist"),
        key_cols=("k", "valid_from_seq"), order_cols=("_scd_seq",), n_buckets=2,
    )
    schema = "k string, v string, commit_seq long, op string"
    b0 = spark.createDataFrame([("a", "v1", 1, "U")], schema)
    b1 = spark.createDataFrame([("a", "v2", 5, "U")], schema)
    maintain_scd2(hist, b0, ("k",), "commit_seq", 0, "b0")
    maintain_scd2(hist, b1, ("k",), "commit_seq", 1, "b1")
    before = {tuple(r) for r in hist.read().collect()}
    v_before = hist.current_version()
    maintain_scd2(hist, b1, ("k",), "commit_seq", 1, "b1")  # crash-rerun
    assert {tuple(r) for r in hist.read().collect()} == before
    assert hist.current_version() == v_before
