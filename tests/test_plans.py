"""Physical-plan regression tests: the plans we designed for, not just the
results. Catches silent regressions in broadcast selection, filter/column
pushdown, and the merge path's exchange count."""

from __future__ import annotations

from pyspark.sql import functions as F

from arches_rascoll_etl_spark import queries as Q
from arches_rascoll_etl_spark.lake.parquet_snapshot import _BUCKET, SnapshotTable
from arches_rascoll_etl_spark.operators.lww import lww_latest
from arches_rascoll_etl_spark.synth import ChangeLogConfig, batch_events

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_dim_joins_broadcast(spark):
    plan = _plan(Q.all_queries()["q02_revenue_by_nation"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_filter_pushdown_reaches_scan(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").where(
        F.col("event_type") == "purchase"
    ).select("event_id", "user_id")
    plan = _plan(ev)
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,purchase)]" in plan


def test_column_pruning_reaches_scan(spark):
    df = spark.read.parquet(f"{SF}/orders.parquet").select("o_orderkey", "o_totalprice")
    plan = _plan(df)
    assert "ReadSchema: struct<o_orderkey:" in plan
    # untouched wide columns must not be read
    assert "o_comment" not in plan.split("ReadSchema:")[1]


def test_merge_apply_stage_has_two_exchanges_total(spark, tmp_path):
    """Batch collapse = 1 exchange; the whole apply stage (union target →
    LWW → bucketed write) = 1 more. The bucket id equals Spark's
    HashPartitioning expression, so the LWW groupBy and the write both reuse
    the explicit repartition — a regression here doubles shuffle volume."""
    cfg = ChangeLogConfig(n_events=800, n_repos=4, paths_per_repo=20, n_batches=2)
    tbl = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=8)
    tbl.merge(batch_events(spark, cfg, 0), batch_id="b0")

    winners = lww_latest(
        batch_events(spark, cfg, 1), tbl.key_cols, tbl.order_cols
    )
    target = tbl._read_stored().withColumn("op", F.coalesce("op", F.lit("U")))
    unioned = winners.unionByName(target, allowMissingColumns=True).repartition(
        tbl.n_buckets, "repo", "path"
    )
    merged = lww_latest(unioned, tbl.key_cols, tbl.order_cols)
    stored = merged.withColumn(_BUCKET, tbl._bucket_col(merged))
    plan = _plan(stored)
    assert plan.count("Exchange") == 2, plan
