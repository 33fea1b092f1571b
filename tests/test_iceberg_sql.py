"""IcebergTable's MERGE INTO generation — string-level tests (no Iceberg
jar in the sandbox; the SQL builder is pure, so its LWW semantics are
checked here and the statement is run through Spark's SQL parser)."""

from __future__ import annotations

import pytest

from arches_rascoll_etl_spark.lake.table import IcebergTable, merge_sql


def test_merge_sql_lww_shape():
    sql = merge_sql("lake.code_files", ["repo", "path"], ["commit_seq", "commit"])
    assert "MERGE INTO lake.code_files t USING _merge_src s" in sql
    assert "ON t.repo = s.repo AND t.path = s.path" in sql
    # strictly-newer is LEXICOGRAPHIC over the order columns, not a plain
    # OR of per-column comparisons (a higher commit hash must not beat a
    # higher commit_seq)
    assert (
        "s.commit_seq > t.commit_seq OR (s.commit_seq = t.commit_seq AND s.commit > t.commit)"
        in sql
    )
    assert "WHEN MATCHED AND s.op = 'D' AND" in sql
    assert "THEN DELETE" in sql and "THEN UPDATE SET *" in sql
    assert "WHEN NOT MATCHED AND s.op != 'D' THEN INSERT *" in sql


def test_merge_sql_single_order_col():
    sql = merge_sql("t1", ["k"], ["seq"], source_view="src", op_col="change_op")
    assert "USING src s ON t.k = s.k" in sql
    assert "(s.seq > t.seq)" in sql
    assert "s.change_op = 'D'" in sql


def test_merge_sql_parses_in_spark(spark):
    """Spark's SQL parser accepts the generated statement (syntax-level
    check — analysis needs an Iceberg catalog, which the sandbox lacks)."""
    sql = merge_sql("cat.db.tbl", ["repo", "path"], ["commit_seq", "commit"])
    spark._jsparkSession.sessionState().sqlParser().parsePlan(sql)


def test_iceberg_table_raises_without_runtime(spark):
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        IcebergTable(spark, "cat.db.tbl")


def test_rollback_sql_shape_and_parse(spark):
    from arches_rascoll_etl_spark.lake.table import rollback_sql

    sql = rollback_sql("cat.db.tbl", 42)
    assert sql == (
        "CALL cat.system.rollback_to_snapshot(table => 'db.tbl', snapshot_id => 42)"
    )
    # Spark's parser accepts CALL statements (analysis needs a real catalog)
    spark._jsparkSession.sessionState().sqlParser().parsePlan(sql)
    with pytest.raises(ValueError, match="catalog-qualified"):
        rollback_sql("unqualified_table", 1)


def test_recluster_sql_shapes():
    from arches_rascoll_etl_spark.lake.table import recluster_sql

    s = recluster_sql("cat.db.t", ["a", "b"])
    assert s == ("CALL cat.system.rewrite_data_files(table => 'db.t', "
                 "strategy => 'sort', sort_order => 'zorder(a, b)')")
    s2 = recluster_sql("cat.db.t", ["a"], strategy="sort",
                       target_file_size_bytes=128 * 1024 * 1024)
    assert "sort_order => 'a'" in s2 and "'134217728'" in s2
    for bad in (lambda: recluster_sql("t", ["a"]),
                lambda: recluster_sql("cat.db.t", []),
                lambda: recluster_sql("cat.db.t", ["a"], strategy="hilbert")):
        try:
            bad()
            raise AssertionError("expected ValueError")
        except ValueError:
            pass


# ---------------------------------------------------------------------------
# Golden statements: BYTE-EXACT expected SQL for every builder the Iceberg
# drop-in compiles to. The sandbox has no Iceberg jar, so these statements
# have never met a real catalog — pinning them byte-for-byte is the guard
# against silent drift until a runtime can validate them (VERDICT r4 #6).
# Any intentional change to a builder must update the golden text here, in
# the same diff, where a reviewer can audit it.
# ---------------------------------------------------------------------------

GOLDEN_MERGE_TWO_ORDER_COLS = (
    "MERGE INTO cat.db.code_files t USING _merge_src s "
    "ON t.repo = s.repo AND t.path = s.path\n"
    "WHEN MATCHED AND s.op = 'D' AND (s.commit_seq > t.commit_seq OR "
    "(s.commit_seq = t.commit_seq AND s.commit > t.commit)) THEN DELETE\n"
    "WHEN MATCHED AND (s.commit_seq > t.commit_seq OR "
    "(s.commit_seq = t.commit_seq AND s.commit > t.commit)) "
    "THEN UPDATE SET *\n"
    "WHEN NOT MATCHED AND s.op != 'D' THEN INSERT *"
)

GOLDEN_MERGE_SINGLE_ORDER_COL = (
    "MERGE INTO t1 t USING src s ON t.k = s.k\n"
    "WHEN MATCHED AND s.change_op = 'D' AND (s.seq > t.seq) THEN DELETE\n"
    "WHEN MATCHED AND (s.seq > t.seq) THEN UPDATE SET *\n"
    "WHEN NOT MATCHED AND s.change_op != 'D' THEN INSERT *"
)

GOLDEN_CREATE_TABLE = (
    "CREATE TABLE IF NOT EXISTS cat.db.code_files (\n"
    "  repo STRING,\n"
    "  path STRING,\n"
    "  commit STRING,\n"
    "  lang STRING,\n"
    "  content STRING,\n"
    "  commit_seq BIGINT\n"
    ")\n"
    "USING iceberg\n"
    "PARTITIONED BY (bucket(512, repo), bucket(512, path))"
)

GOLDEN_ROLLBACK = (
    "CALL cat.system.rollback_to_snapshot("
    "table => 'db.tbl', snapshot_id => 42)"
)

GOLDEN_RECLUSTER_ZORDER = (
    "CALL cat.system.rewrite_data_files(table => 'db.t', "
    "strategy => 'sort', sort_order => 'zorder(a, b)')"
)

GOLDEN_RECLUSTER_SORT_SIZED = (
    "CALL cat.system.rewrite_data_files(table => 'db.t', "
    "strategy => 'sort', sort_order => 'a', "
    "options => map('target-file-size-bytes', '134217728'))"
)


def _code_files_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("repo", T.StringType()),
            T.StructField("path", T.StringType()),
            T.StructField("commit", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("content", T.StringType()),
            T.StructField("commit_seq", T.LongType()),
        ]
    )


def test_golden_merge_sql_byte_exact():
    assert (
        merge_sql("cat.db.code_files", ["repo", "path"], ["commit_seq", "commit"])
        == GOLDEN_MERGE_TWO_ORDER_COLS
    )
    assert (
        merge_sql("t1", ["k"], ["seq"], source_view="src", op_col="change_op")
        == GOLDEN_MERGE_SINGLE_ORDER_COL
    )


def test_golden_create_table_byte_exact():
    from arches_rascoll_etl_spark.lake.catalog import (
        create_schema_sql,
        iceberg_create_table_sql,
    )

    assert (
        iceberg_create_table_sql(
            "cat.db.code_files", _code_files_schema(), ["repo", "path"], 512
        )
        == GOLDEN_CREATE_TABLE
    )
    assert create_schema_sql("staging") == "CREATE SCHEMA IF NOT EXISTS staging"


def test_golden_call_statements_byte_exact():
    from arches_rascoll_etl_spark.lake.table import recluster_sql, rollback_sql

    assert rollback_sql("cat.db.tbl", 42) == GOLDEN_ROLLBACK
    assert recluster_sql("cat.db.t", ["a", "b"]) == GOLDEN_RECLUSTER_ZORDER
    assert (
        recluster_sql(
            "cat.db.t", ["a"], strategy="sort",
            target_file_size_bytes=128 * 1024 * 1024,
        )
        == GOLDEN_RECLUSTER_SORT_SIZED
    )


def test_golden_promotion_sequence_byte_exact(spark, tmp_path):
    """promote_sql compiles a SnapshotTable to the exact (DDL, DML)
    statement pair — order matters (DDL first), and both statements must
    match the goldens that the individual-builder tests pin."""
    from arches_rascoll_etl_spark.lake.catalog import promote_sql
    from arches_rascoll_etl_spark.lake.parquet_snapshot import SnapshotTable

    tbl = SnapshotTable(
        spark, str(tmp_path / "t"), key_cols=("repo", "path"),
        order_cols=("commit_seq", "commit"), n_buckets=512,
    )
    df = spark.createDataFrame(
        [("r", "p", "c", "py", "x", 1, "U")],
        "repo string, path string, commit string, lang string, "
        "content string, commit_seq long, op string",
    )
    tbl.merge(df, batch_id="b0")
    stmts = promote_sql(tbl, "cat.db.code_files")
    assert stmts == [GOLDEN_CREATE_TABLE, GOLDEN_MERGE_TWO_ORDER_COLS]
