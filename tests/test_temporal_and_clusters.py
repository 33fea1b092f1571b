"""asof_join / sessionize / tumbling windows / connected components."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from arches_rascoll_etl_spark.operators import dedup, temporal


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


def test_asof_join_backward_inclusive_with_ties(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(10)), (2, "u", _ts(5)), (3, "u", _ts(0)), (4, "w", _ts(30))],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u", _ts(5), 100, 1.0),   # exact tie with left event 2 → inclusive
            ("u", _ts(5), 101, 2.0),   # same ts, higher tie id → wins the tie
            ("u", _ts(9), 102, 3.0),   # most recent before left event 1
            ("v", _ts(1), 103, 9.0),   # other key: never matches
        ],
        "user_id string, ts timestamp, event_id long, value double",
    )
    out = temporal.asof_join(
        left, right, on=["user_id"], ts_col="ts",
        right_cols=["value"], tie_cols=["event_id"],
    )
    got = {r["event_id"]: r["r_value"] for r in out.collect()}
    assert got == {1: 3.0, 2: 2.0, 3: None, 4: None}


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(10))], "event_id long, user_id string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u", _ts(0), 5.0)], "user_id string, ts timestamp, value double"
    )
    within = temporal.asof_join(
        left, right, on=["user_id"], right_cols=["value"], tolerance_us=11 * 60 * 1_000_000
    )
    beyond = temporal.asof_join(
        left, right, on=["user_id"], right_cols=["value"], tolerance_us=9 * 60 * 1_000_000
    )
    assert within.collect()[0]["r_value"] == 5.0
    assert beyond.collect()[0]["r_value"] is None


def test_sessionize_gap_boundaries(spark):
    rows = [
        ("u", _ts(0), 1), ("u", _ts(10), 2), ("u", _ts(50), 3),  # 40-min gap → new
        ("u", _ts(55), 4),
        ("v", _ts(0), 5),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, event_id long")
    out = temporal.sessionize(df, ["user_id"], "ts", gap_minutes=30, tie_cols=["event_id"])
    got = {r["event_id"]: r["session_n"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}


def test_tumbling_window_epoch_aligned(spark):
    df = spark.createDataFrame(
        [(_ts(0), 1.0), (_ts(9, 59), 2.0), (_ts(10), 4.0)], "ts timestamp, v double"
    )
    out = temporal.tumbling_window_agg(
        df, "ts", "10 minutes", [], F.sum("v").alias("total")
    ).collect()
    got = {r["w_start_us"]: r["total"] for r in out}
    base = int(dt.datetime(2024, 1, 1).replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    assert got == {base: 3.0, base + 600_000_000: 4.0}


def test_duplicate_clusters_chain_component(spark):
    """Path graph 3-1-2-0 must collapse to ONE label (the old pointer-only
    propagation stalled with two)."""
    pairs = spark.createDataFrame([(3, 1), (1, 2), (2, 0)], "id_a long, id_b long")
    got = {r["id"]: r["label"] for r in dedup.duplicate_clusters(pairs).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0}


def test_duplicate_clusters_multiple_components(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 20)], "id_a long, id_b long"
    )
    got = {r["id"]: r["label"] for r in dedup.duplicate_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_point_in_time_join_interval_semantics(spark):
    # key "a": v1 valid [10, 20), v2 valid [20, 40), deleted at 40 (gap),
    # v3 valid [50, inf). key "b": single open version [5, inf).
    hist = spark.createDataFrame(
        [
            ("a", "v1", 10, 20),
            ("a", "v2", 20, 40),
            ("a", "v3", 50, None),
            ("b", "w1", 5, None),
        ],
        "k string, content string, valid_from_seq long, valid_to_seq long",
    )
    facts = spark.createDataFrame(
        [
            (1, "a", 9),    # before first version -> NULL
            (2, "a", 10),   # inclusive lower bound -> v1
            (3, "a", 19),   # last seq of v1 -> v1
            (4, "a", 20),   # exclusive upper / inclusive next -> v2
            (5, "a", 45),   # delete-opened gap -> NULL
            (6, "a", 50),   # reinsert -> v3
            (7, "a", 999),  # open interval -> v3
            (8, "b", 4),    # before first -> NULL
            (9, "b", 1000), # open interval -> w1
            (10, "c", 7),   # key with no history -> NULL
        ],
        "fact_id long, k string, at_seq long",
    )
    out = temporal.point_in_time_join(
        facts, hist, on=["k"], seq_col="at_seq", right_cols=["content"]
    )
    got = {r["fact_id"]: r["r_content"] for r in out.collect()}
    assert got == {
        1: None, 2: "v1", 3: "v1", 4: "v2", 5: None,
        6: "v3", 7: "v3", 8: None, 9: "w1", 10: None,
    }
    # every fact row survives exactly once (left-join cardinality)
    assert out.count() == facts.count()


def test_dedup_corpus_representatives(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}", float(i % 5)) for i in range(1, 9)],
        "doc_id long, body string, q double",
    )
    # clusters: {1,2,3} and {6,7}; 4,5,8 unclustered
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (6, 6), (7, 6)], "id long, label long"
    )
    keep = dedup.dedup_corpus(docs, "doc_id", labels)
    assert sorted(r["doc_id"] for r in keep.collect()) == [1, 4, 5, 6, 8]
    # score-based: highest q wins (q = doc_id%5 -> cluster1 winner id=3 (q=3),
    # cluster6 winner id=7 (q=2))
    keep_s = dedup.dedup_corpus(docs, "doc_id", labels, score_col="q")
    assert sorted(r["doc_id"] for r in keep_s.collect()) == [3, 4, 5, 7, 8]
    # tie on score breaks to the highest id
    tied = docs.withColumn("q", F.lit(1.0))
    keep_t = dedup.dedup_corpus(tied, "doc_id", labels, score_col="q")
    assert sorted(r["doc_id"] for r in keep_t.collect()) == [3, 4, 5, 7, 8]


def test_sliding_window_membership(spark):
    # width 10m, slide 5m: an event at minute 7 belongs to windows
    # starting at minutes 0 and 5; one at minute 12 to minutes 5 and 10
    df = spark.createDataFrame(
        [(1, _ts(7)), (2, _ts(12))], "event_id long, ts timestamp"
    )
    out = temporal.sliding_window_agg(
        df, "ts", "10 minutes", "5 minutes", [], F.count("*").alias("n")
    )
    base = int(_ts(0).replace(tzinfo=__import__("datetime").timezone.utc).timestamp()) * 1_000_000
    got = {r["w_start_us"]: r["n"] for r in out.collect()}
    m = 60 * 1_000_000
    assert got == {base: 1, base + 5 * m: 2, base + 10 * m: 1}
