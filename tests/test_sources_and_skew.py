"""Source connectors (CSV/JSON round-trip, offset pruning) + skew handling."""

from __future__ import annotations

from pyspark.sql import functions as F

from arches_rascoll_etl_spark.operators.lww import lww_latest, lww_latest_salted
from arches_rascoll_etl_spark.sources.readers import (
    read_changelog,
    read_csv_with_json_cols,
    write_csv_with_json_cols,
)
from arches_rascoll_etl_spark.synth import ChangeLogConfig, change_log


def test_csv_json_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", {"en": {"value": "x", "direction": "ltr"}}, [1, 2, 3])],
        "pk string, name map<string,struct<value:string,direction:string>>, nums array<int>",
    )
    path = str(tmp_path / "snap")
    nested = write_csv_with_json_cols(df, path)
    assert set(nested) == {"name", "nums"}
    back = read_csv_with_json_cols(
        spark,
        path,
        {"name": "map<string,struct<value:string,direction:string>>", "nums": "array<int>"},
    )
    r = back.first()
    assert r.pk == "a" and r.nums == [1, 2, 3]
    assert r.name["en"].value == "x" and r.name["en"].direction == "ltr"


def test_from_json_null_on_error(spark, tmp_path):
    import csv

    p = tmp_path / "bad.csv"
    with open(p, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["pk", "nums"])
        w.writerow(["a", "[1,2]"])
        w.writerow(["b", "not-json"])
    back = read_csv_with_json_cols(spark, str(p), {"nums": "array<int>"})
    rows = {r.pk: r.nums for r in back.collect()}
    assert rows["a"] == [1, 2] and rows["b"] is None  # skip-on-error semantics


def test_changelog_offset_pruning(spark, tmp_path):
    cfg = ChangeLogConfig(n_events=2_000, n_batches=5)
    path = str(tmp_path / "log")
    change_log(spark, cfg).write.partitionBy("batch_id").parquet(path)
    df = read_changelog(spark, path, batch_lo=1, batch_hi=2)
    assert set(r.batch_id for r in df.select("batch_id").distinct().collect()) == {1, 2}
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "batch_id" in plan.split("PartitionFilters")[1][:200]


def test_skewed_hot_key_lww(spark):
    """90%-hot-key log: salted two-phase spreads phase 1 across buckets and
    agrees with the plain formulation."""
    cfg = ChangeLogConfig(n_events=20_000, n_repos=10, paths_per_repo=50, hot_fraction=0.9)
    log = change_log(spark, cfg)
    a = lww_latest(log, ["repo", "path"], ["commit_seq", "commit"])
    b = lww_latest_salted(log, ["repo", "path"], ["commit_seq", "commit"], salt_buckets=16)
    chk = lambda df: {tuple(r) for r in df.select("repo", "path", "commit").collect()}  # noqa: E731
    assert chk(a) == chk(b)
    # phase-1 spread: the hot repo's events hash across many salt buckets
    salted = log.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("commit_seq").cast("string")), F.lit(16))
    )
    spread = (
        salted.where(F.col("repo") == "org/repo_00000")
        .groupBy("_salt")
        .count()
    )
    rows = spread.collect()
    assert len(rows) == 16
    counts = [r["count"] for r in rows]
    assert max(counts) < 2.0 * (sum(counts) / len(counts))  # no straggler bucket
