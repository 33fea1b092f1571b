"""Anti-entropy table diff: bucket-digest short-circuit + symmetric diff."""

from __future__ import annotations

from pyspark.sql import functions as F

from arches_rascoll_etl_spark.lake.diff import bucket_summaries, table_diff
from arches_rascoll_etl_spark.lake.parquet_snapshot import SnapshotTable

SCHEMA = "k long, v string, n long, seq long, op string"


def _mk(spark, path, rows):
    t = SnapshotTable(
        spark, path, key_cols=("k",), order_cols=("seq",), n_buckets=8
    )
    t.merge(spark.createDataFrame(rows, SCHEMA), batch_id="b0")
    return t


def _rows(n=200):
    return [(k, f"v{k}", k * 2, 1, "U") for k in range(n)]


def test_equal_tables_diff_empty_and_digests_match(spark, tmp_path):
    a = _mk(spark, str(tmp_path / "a"), _rows())
    b = _mk(spark, str(tmp_path / "b"), _rows())
    sa = {r["bucket"]: (r["n_rows"], r["digest"]) for r in bucket_summaries(a).collect()}
    sb = {r["bucket"]: (r["n_rows"], r["digest"]) for r in bucket_summaries(b).collect()}
    assert sa == sb and len(sa) > 1
    assert table_diff(a, b).count() == 0


def test_diff_reports_all_three_ops(spark, tmp_path):
    rows = _rows()
    a = _mk(spark, str(tmp_path / "a"), rows)
    # right: k=3 modified, k=7 missing, k=999 extra
    brows = [r for r in rows if r[0] != 7] + [(999, "new", 0, 1, "U")]
    brows = [(k, "CHANGED" if k == 3 else v, n, s, o) for (k, v, n, s, o) in brows]
    b = _mk(spark, str(tmp_path / "b"), brows)
    got = {r["k"]: r for r in table_diff(a, b).collect()}
    assert set(got) == {3, 7, 999}
    assert got[3]["diff_op"] == "N"
    assert got[3]["left"]["v"] == "v3" and got[3]["right"]["v"] == "CHANGED"
    assert got[7]["diff_op"] == "L" and got[7]["right"] is None
    assert got[999]["diff_op"] == "R" and got[999]["left"] is None
    # the digest pass localized the damage: only a few buckets dirty
    sa = {r["bucket"]: (r["n_rows"], r["digest"]) for r in bucket_summaries(a).collect()}
    sb = {r["bucket"]: (r["n_rows"], r["digest"]) for r in bucket_summaries(b).collect()}
    dirty = [x for x in set(sa) | set(sb) if sa.get(x) != sb.get(x)]
    assert len(dirty) <= 3


def test_diff_rejects_mismatched_layout(spark, tmp_path):
    a = _mk(spark, str(tmp_path / "a"), _rows(20))
    c = SnapshotTable(
        spark, str(tmp_path / "c"), key_cols=("k",), order_cols=("seq",), n_buckets=4
    )
    c.merge(spark.createDataFrame(_rows(20), SCHEMA), batch_id="b0")
    try:
        table_diff(a, c)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "n_buckets" in str(e)


def test_diff_is_version_aware(spark, tmp_path):
    a = _mk(spark, str(tmp_path / "a"), _rows(50))
    a.merge(
        spark.createDataFrame([(1, "v1-new", 2, 2, "U")], SCHEMA), batch_id="b1"
    )
    # same table, two snapshots: the diff is exactly the change
    got = table_diff(a, a, version_left=0, version_right=1).collect()
    assert len(got) == 1 and got[0]["k"] == 1 and got[0]["diff_op"] == "N"
