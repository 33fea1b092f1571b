"""operators.parallelism — the .rdd-free narrow-input gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from arches_rascoll_etl_spark.operators.parallelism import (
    estimated_scan_partitions,
    is_narrow_input,
    parse_byte_size,
)

SF = "/root/testdata/sf0.001"


def test_parse_byte_size_units():
    assert parse_byte_size("134217728b") == 134217728
    assert parse_byte_size("128MB") == 128 * 1024 * 1024
    assert parse_byte_size("128m") == 128 * 1024 * 1024
    assert parse_byte_size("1g") == 1024**3
    assert parse_byte_size("134217728") == 134217728
    assert parse_byte_size(4096) == 4096
    assert parse_byte_size(None) == 128 * 1024 * 1024


def test_non_file_plans_are_unknown_never_narrow(spark):
    """Local relations and checkpointed frames have no input files — width
    unknown. The gate must answer NOT narrow: parallelize already spreads
    a local relation, and a wide cached corpus must never be collapsed to
    defaultParallelism by a well-meaning spread."""
    df = spark.createDataFrame([(i,) for i in range(100)], "k long")
    assert estimated_scan_partitions(df) is None
    assert not is_narrow_input(df, 8)
    ck = spark.range(1000).repartition(20).localCheckpoint(eager=True)
    assert estimated_scan_partitions(ck) is None
    assert not is_narrow_input(ck, 8)
    # behavioral contract at the consumer: _spread leaves the wide
    # checkpointed frame's partitioning alone (no Exchange added)
    from arches_rascoll_etl_spark.operators.similarity import _spread

    plan = _spread(ck)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_file_scan_estimate_small_file(spark):
    # one small parquet file -> one estimated partition -> narrow on 8 cores
    df = spark.read.parquet(f"{SF}/nation.parquet")
    est = estimated_scan_partitions(df)
    assert 1 <= est < 8
    assert is_narrow_input(df, 8)


def test_file_scan_estimate_splits_large_files(spark, tmp_path):
    # force a tiny maxPartitionBytes so the same file reads as many splits
    df = spark.read.parquet(f"{SF}/lineitem.parquet")
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
        wide_est = estimated_scan_partitions(df)
        assert not is_narrow_input(df, min(8, wide_est))
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert wide_est > estimated_scan_partitions(df)


def test_spread_still_parallelizes_narrow_corpus(spark):
    # behavioral contract of the gate's consumers: dedup._spread on a
    # single-file corpus yields a repartitioned (multi-partition) frame
    from arches_rascoll_etl_spark.operators.dedup import _spread

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").alias("_id"), F.col("text").alias("_t")
    )
    spread = _spread(docs, "_id")
    # the repartition node is in the plan (no .rdd probe needed to verify)
    plan = spread._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan
    assert spread.count() == docs.count()
