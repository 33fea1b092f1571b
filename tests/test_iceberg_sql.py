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
