"""Tests for functions/profiling.profile_table and
operators/dedup.decontaminate_prefiltered."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from arches_rascoll_etl_spark.functions.profiling import profile_table
from arches_rascoll_etl_spark.operators import dedup


def _docs(spark):
    rows = [
        Row(doc_id=1, lang="en", n=10, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=2, lang="en", n=None, text="the quick brown fox jumps over a sleeping cat"),
        Row(doc_id=3, lang=None, n=7, text="completely unrelated words here nothing shared"),
        Row(doc_id=4, lang="de", n=7, text="the quick brown fox jumps over the lazy dog indeed"),
    ]
    return spark.createDataFrame(rows)


def test_profile_table_exact_values(spark):
    out = {
        r["col_name"]: r
        for r in profile_table(_docs(spark), ["doc_id", "lang", "n"]).collect()
    }
    assert set(out) == {"doc_id", "lang", "n"}
    for r in out.values():
        assert r["n_rows"] == 4
    assert out["doc_id"]["n_nulls"] == 0
    assert out["doc_id"]["n_distinct"] == 4
    assert out["doc_id"]["min_value"] == "1"
    assert out["doc_id"]["max_value"] == "4"
    assert out["lang"]["n_nulls"] == 1
    assert out["lang"]["n_distinct"] == 2  # COUNT(DISTINCT) ignores NULL
    assert out["lang"]["min_value"] == "de"
    assert out["lang"]["max_value"] == "en"
    assert out["n"]["n_nulls"] == 1
    assert out["n"]["n_distinct"] == 2
    assert out["n"]["min_value"] == "7"
    assert out["n"]["max_value"] == "10"


def test_profile_table_approx_path(spark):
    # tiny cardinalities are exact even under HLL++; the point is the
    # exact=False plan runs and agrees here (and carries no Expand)
    exact = profile_table(_docs(spark), ["doc_id", "lang"], exact=True)
    approx = profile_table(_docs(spark), ["doc_id", "lang"], exact=False)
    assert sorted(map(tuple, exact.collect())) == sorted(map(tuple, approx.collect()))
    assert "Expand" in exact._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in approx._jdf.queryExecution().executedPlan().toString()


def test_decontaminate_prefiltered_matches_plain(spark):
    d = _docs(spark)
    train = d.where(F.col("doc_id") != 2)
    ev = d.where(F.col("doc_id") == 2)
    plain = dedup.decontaminate(train, ev, "doc_id", "text", k_words=3)
    pre = dedup.decontaminate_prefiltered(train, ev, "doc_id", "text", k_words=3)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, pre.collect()))
    # docs 1 and 4 share "the quick brown" etc. with doc 2; doc 3 shares none
    hit_ids = {r["train_id"] for r in pre.collect()}
    assert 1 in hit_ids and 4 in hit_ids and 3 not in hit_ids


def test_prefilter_semi_join_is_broadcast(spark):
    d = _docs(spark)
    pre = dedup.decontaminate_prefiltered(
        d.where(F.col("doc_id") != 2), d.where(F.col("doc_id") == 2),
        "doc_id", "text", k_words=3,
    )
    plan = pre._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_skew_report_values_and_plan(spark):
    from arches_rascoll_etl_spark.functions.profiling import skew_report

    rows = [("hot", i) for i in range(70)] + [("warm", i) for i in range(20)] \
        + [(f"cold{i}", i) for i in range(10)]
    df = spark.createDataFrame(rows, "k string, x long")
    out = skew_report(df, ["k"], top_n=2).collect()
    assert [(r["k"], r["n_rows"]) for r in out] == [("hot", 70), ("warm", 20)]
    assert abs(out[0]["share"] - 0.70) < 1e-12
    plan = out  # already computed; now assert the plan shape
    p = skew_report(df, ["k"], top_n=2)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in p, p
