"""Dataset-curation operators: hash splits, sequence packing, PII redaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from arches_rascoll_etl_spark.functions import curation as CU


def test_hash_split_deterministic_and_proportional(spark):
    ids = spark.range(0, 20_000).withColumnRenamed("id", "doc_id")
    out = ids.select(
        "doc_id",
        CU.hash_split_bucket("doc_id").alias("b"),
        CU.hash_split("doc_id").alias("split"),
    )
    rows = {r["doc_id"]: (r["b"], r["split"]) for r in out.collect()}
    # re-evaluation (fresh plan) assigns identical splits — content-addressed
    again = {r["doc_id"]: (r["b"], r["split"]) for r in out.collect()}
    assert rows == again
    assert all(0 <= b < 100 for b, _ in rows.values())
    frac = {s: sum(1 for _, sp in rows.values() if sp == s) / len(rows)
            for s in ("train", "val", "test")}
    assert abs(frac["train"] - 0.90) < 0.02
    assert abs(frac["val"] - 0.05) < 0.01
    assert abs(frac["test"] - 0.05) < 0.01


def test_hash_split_stable_under_repartition(spark):
    """The property rand()-based splits lack: partition layout is irrelevant."""
    ids = spark.range(0, 2_000).withColumnRenamed("id", "doc_id")
    a = {(r["doc_id"], r["s"]) for r in
         ids.select("doc_id", CU.hash_split("doc_id").alias("s")).collect()}
    b = {(r["doc_id"], r["s"]) for r in
         ids.repartition(17).select("doc_id", CU.hash_split("doc_id").alias("s")).collect()}
    assert a == b


def test_pack_sequences_greedy_bins(spark):
    # token counts: 'a b c' = 3 tokens etc.; budget 5 within one shard
    rows = [
        (0, "s", "a b c"),        # cum_before 0 -> bin 0
        (1, "s", "d e"),          # cum_before 3 -> bin 0
        (2, "s", "f g h i j k"),  # cum_before 5 -> bin 1 (6 tokens, overflows)
        (3, "s", "l"),            # cum_before 11 -> bin 2
        (4, "t", "m n"),          # other shard restarts at bin 0
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {r["doc_id"]: (r["shard"], r["n_tokens"], r["seq_bin"])
           for r in CU.pack_sequences(df, "doc_id", "text", budget=5,
                                      shard_col="lang").collect()}
    assert out[0] == ("s", 3, 0)
    assert out[1] == ("s", 2, 0)
    assert out[2] == ("s", 6, 1)   # oversized doc gets its own bin
    assert out[3] == ("s", 1, 2)   # and the bin index advances past it
    assert out[4] == ("t", 2, 0)


def test_redact_pii(spark):
    df = spark.createDataFrame(
        [(0, "mail a.b+c@x-corp.io and id 12345678 but keep 12345 and v1.2")],
        "i long, t string",
    )
    r = df.select(CU.redact_pii("t").alias("r"), *CU.pii_counts("t").values()).first()
    assert r["r"] == "mail <EMAIL> and id <NUM> but keep 12345 and v1.2"
    assert r["n_emails"] == 1 and r["n_digit_runs"] == 1
    # digits inside an address are not double-counted as digit runs
    df2 = spark.createDataFrame([(0, "x 99887766@host.example.com y")], "i long, t string")
    r2 = df2.select(*CU.pii_counts("t").values()).first()
    assert r2["n_emails"] == 1 and r2["n_digit_runs"] == 0


def test_stratified_sample_rates_and_determinism(spark):
    n = 30_000
    docs = (
        spark.range(0, n)
        .withColumnRenamed("id", "doc_id")
        .withColumn(
            "lang",
            F.when(F.col("doc_id") % 3 == 0, "en")
            .when(F.col("doc_id") % 3 == 1, "zh")
            .otherwise("am"),
        )
    )
    out = CU.stratified_sample(docs, "doc_id", "lang", {"en": 0.25, "zh": 0.5})
    kept = {(r["doc_id"], r["lang"]) for r in out.collect()}
    per_lang = {lg: sum(1 for _, x in kept if x == lg) for lg in ("en", "zh", "am")}
    # each stratum has n/3 rows; kept fraction tracks its rate
    assert abs(per_lang["en"] / (n / 3) - 0.25) < 0.02
    assert abs(per_lang["zh"] / (n / 3) - 0.50) < 0.02
    assert per_lang["am"] == n / 3  # default_rate=1.0 keeps everything
    # content-addressed: identical decisions under a different layout
    again = {
        (r["doc_id"], r["lang"])
        for r in CU.stratified_sample(
            docs.repartition(13), "doc_id", "lang", {"en": 0.25, "zh": 0.5}
        ).collect()
    }
    assert kept == again
    # rates are nested: lowering a stratum's rate keeps a subset (thresholds
    # on the same content hash), so corpora shrink monotonically — no churn
    sub = CU.stratified_sample(docs, "doc_id", "lang", {"en": 0.1, "zh": 0.5})
    assert {(r["doc_id"], r["lang"]) for r in sub.where("lang='en'").collect()} <= {
        (d, x) for d, x in kept if x == "en"
    }


def test_deterministic_shuffle_is_layout_independent_permutation(spark):
    from arches_rascoll_etl_spark.functions.curation import deterministic_shuffle

    df = spark.range(500).select(F.col("id").alias("k"))
    a = deterministic_shuffle(df, "k", seed="s", n_partitions=3)
    b = deterministic_shuffle(df.repartition(7), "k", seed="s", n_partitions=11)
    pa = {r["k"]: r["shuffle_pos"] for r in a.collect()}
    pb = {r["k"]: r["shuffle_pos"] for r in b.collect()}
    # same permutation regardless of input layout or partition count
    assert pa == pb
    assert sorted(pa.values()) == list(range(500))
    # a different seed is a different permutation
    c = deterministic_shuffle(df, "k", seed="other", n_partitions=3)
    pc = {r["k"]: r["shuffle_pos"] for r in c.collect()}
    assert pc != pa and sorted(pc.values()) == list(range(500))


def test_deterministic_shuffle_persisted_path_same_result(spark):
    from arches_rascoll_etl_spark.functions.curation import deterministic_shuffle

    df = spark.range(300).select(F.col("id").alias("k"))
    a = deterministic_shuffle(df, "k", seed="s", n_partitions=3)
    b = deterministic_shuffle(df, "k", seed="s", n_partitions=3, persist="disk")
    assert {(r["k"], r["shuffle_pos"]) for r in a.collect()} == \
        {(r["k"], r["shuffle_pos"]) for r in b.collect()}
