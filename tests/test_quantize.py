"""Int8 embedding quantization: code bounds, cosine error, top-k recall."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from arches_rascoll_etl_spark.operators import similarity as S


def _vecs(spark, n=300, dim=32, seed=7):
    rng = np.random.RandomState(seed)
    m = rng.normal(size=(n, dim)).astype(np.float64)
    rows = [(int(i), [float(x) for x in m[i]]) for i in range(n)]
    return m, spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_quantize_codes_bounded_and_exact(spark):
    m, df = _vecs(spark)
    q = S.quantize_int8(df, "vec_id", "embedding").collect()
    for r in q:
        assert all(-127 <= c <= 127 for c in r["codes"])
        v = m[r["vec_id"]]
        assert abs(r["scale"] - np.abs(v).max() / 127.0) < 1e-12
        # dequantization error bounded by scale/2 per component
        deq = np.array(r["codes"]) * r["scale"]
        assert np.abs(deq - v).max() <= r["scale"] / 2 + 1e-12


def test_quantize_zero_vector(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0]), (1, [1.0, -2.0, 0.5])],
        "vec_id long, embedding array<double>",
    )
    rows = {r["vec_id"]: r for r in
            S.quantize_int8(df, "vec_id", "embedding").collect()}
    assert rows[0]["scale"] == 0.0 and rows[0]["codes"] == [0, 0, 0]
    assert rows[1]["codes"][1] == -127


def test_quantized_cosine_error_and_topk_recall(spark):
    m, df = _vecs(spark, n=200, dim=32)
    q = S.quantize_int8(df, "vec_id", "embedding")
    a = q.select(F.col("vec_id").alias("id_a"), F.col("codes").alias("ca"),
                 F.col("scale").alias("sa"))
    b = q.select(F.col("vec_id").alias("id_b"), F.col("codes").alias("cb"),
                 F.col("scale").alias("sb"))
    pairs = (
        a.join(b, F.col("id_a") == 0)
        .where(F.col("id_b") != 0)
        .select("id_b", S.cosine_int8(
            F.col("ca"), F.col("sa"), F.col("cb"), F.col("sb")).alias("qcos"))
        .collect()
    )
    v0 = m[0] / np.linalg.norm(m[0])
    exact = {i: float(m[i] @ v0 / np.linalg.norm(m[i])) for i in range(1, 200)}
    err = max(abs(r["qcos"] - exact[r["id_b"]]) for r in pairs)
    assert err < 0.02  # int8 at dim 32 loses <2e-2 cosine
    top_q = {r["id_b"] for r in sorted(pairs, key=lambda r: -r["qcos"])[:10]}
    top_e = set(sorted(exact, key=lambda i: -exact[i])[:10])
    assert len(top_q & top_e) >= 8
