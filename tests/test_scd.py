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
