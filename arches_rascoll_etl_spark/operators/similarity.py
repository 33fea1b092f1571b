"""Similarity search over embedding columns (array<float>).

* ``cosine_topk_bruteforce`` — exact top-k: broadcast the (small) query set
  against the corpus; dot products via ``zip_with`` + ``aggregate`` (JVM
  higher-order functions — no Python, no UDF). The corpus side streams:
  cost O(|corpus|·|queries|·dim) flops, one broadcast, zero shuffles of the
  corpus, a final top-k window per query. This is the correct baseline at
  any scale where |queries| is broadcastable.
* ``hyperplane_lsh_topk`` — the scale path: random-hyperplane signature
  buckets (signs of dot products with deterministic pseudo-random planes);
  candidates = same-bucket rows, then exact re-rank within bucket. Recall
  traded via n_planes/n_tables. Buckets shuffle once on the signature.
* ``embedding_neardup_pairs`` — near-duplicate pairs by cosine ≥ threshold,
  blocked by LSH signature (self-join on bucket, never O(n²)).

Planes are derived deterministically from a seed via numpy RandomState and
shipped as array literals (dims are small), so replay is byte-stable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.window import Window

from arches_rascoll_etl_spark.operators.materialize import materialize


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _spread(df: DataFrame) -> DataFrame:
    """Rebalance a narrow corpus across the session's default parallelism
    before compute-dense per-row work (O(dim) dot products per row pair).
    Only repartitions when the scan would produce fewer partitions than
    cores — a no-op at scale (see operators.dedup._spread). The width
    check reads file metadata (operators.parallelism), not ``.rdd``,
    which would force a plan→RDD conversion per call."""
    from arches_rascoll_etl_spark.operators.parallelism import is_narrow_input

    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n) if is_narrow_input(df, n) else df


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: (x * x).cast("double")), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return (dot(a, b) / (l2_norm(a) * l2_norm(b))).cast("double")


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k of corpus rows per query row.

    queries must be broadcast-small (the typical ANN-batch shape); the
    corpus is scanned once, no corpus shuffle before the per-query top-k."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    c = _spread(corpus.select(F.col(id_col).alias("match_id"), F.col(vec_col).alias("_cv")))
    scored = c.join(F.broadcast(q), F.col("match_id") != F.col("query_id")).select(
        "query_id",
        "match_id",
        cosine(F.col("_qv"), F.col("_cv")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "match_id", "cos_sim", "rank")
    )


def _planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rs = np.random.RandomState(seed)
    return rs.normal(size=(n_planes, dim)).astype(float)


def lsh_signature(vec_col: Column | str, dim: int, n_planes: int = 8, seed: int = 42) -> Column:
    """Hyperplane sign bits packed into a long — computed as Column exprs
    over plane literals (constant-folded dot products, JVM-side)."""
    planes = _planes(dim, n_planes, seed)
    sig = F.lit(0).cast("long")
    v = _c(vec_col)
    for p in planes:
        plane_lit = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(dot(v, plane_lit) >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        sig = sig * 2 + bit
    return sig


def hyperplane_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 5,
    n_planes: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket, exact
    re-rank within. One shuffle (join on signature)."""
    sig = lambda df: df.withColumn("_sig", lsh_signature(vec_col, dim, n_planes, seed))  # noqa: E731
    q = sig(queries).select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"), "_sig")
    c = sig(_spread(corpus)).select(F.col(id_col).alias("match_id"), F.col(vec_col).alias("_cv"), "_sig")
    scored = c.join(F.broadcast(q), on="_sig").where(F.col("match_id") != F.col("query_id")).select(
        "query_id", "match_id", cosine(F.col("_qv"), F.col("_cv")).alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "match_id", "cos_sim", "rank")
    )


def _kmeans_centroids(
    sample: "np.ndarray", n_centroids: int, n_iter: int, seed: int
) -> "np.ndarray":
    """Deterministic Lloyd k-means on a driver-side sample (the coarse
    quantizer is tiny — centroids × dim floats — the corpus never leaves
    executors)."""
    rs = np.random.RandomState(seed)
    idx = rs.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)
    cents = sample[np.sort(idx)].copy()
    for _ in range(n_iter):
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cents)):
            m = sample[assign == c]
            if len(m):
                cents[c] = m.mean(axis=0)
    return cents


def ivf_assign_udf(centroids: "np.ndarray"):
    """Arrow-batched nearest-centroid assignment (no per-row Python)."""
    C = centroids.astype(np.float64)
    Cn2 = (C * C).sum(axis=1)

    @pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        V = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        # argmin ||v-c||^2 = argmin (||c||^2 - 2 v·c), vectorized batch matmul
        d = Cn2[None, :] - 2.0 * (V @ C.T)
        return pd.Series(d.argmin(axis=1).astype("int32"))

    return assign


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    n_iter: int = 3,
    sample_every: int = 7,
    sample_cap: int = 1024,
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k: coarse k-means quantizer → corpus bucketed by
    nearest centroid (inverted file) → each query probes its ``n_probe``
    nearest cells → exact cosine re-rank within probed cells.

    ``n_probe == n_centroids`` degrades to exact brute force (tested).
    Scale story: the quantizer is a driver-side numpy k-means over a
    deterministic sample; assignment is one Arrow-batched pass over the
    corpus (inverted lists are just a bucket column — at 100 TB they'd be
    the table's partition/bucket layout, computed once at ingest); the probe
    join shuffles only candidates in probed cells, never O(n²)."""
    sample_rows = (
        corpus.where(F.pmod(F.col(id_col), F.lit(sample_every)) == 0)
        .orderBy(id_col)
        .limit(sample_cap)
        .select(vec_col)
        .collect()
    )
    sample = np.stack([np.asarray(r[0], dtype=np.float64) for r in sample_rows])
    cents = _kmeans_centroids(sample, n_centroids, n_iter, seed)
    assign = ivf_assign_udf(cents)

    c = _spread(corpus).select(
        F.col(id_col).alias("match_id"),
        F.col(vec_col).alias("_cv"),
        assign(F.col(vec_col)).alias("_cell"),
    )
    # queries probe their n_probe nearest cells (tiny, driver-side per-row ok
    # via the same vectorized udf applied n_probe times → rank by distance)
    C = cents.astype(np.float64)
    Cn2 = (C * C).sum(axis=1)

    @pandas_udf("array<int>")
    def probe_cells(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        V = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        d = Cn2[None, :] - 2.0 * (V @ C.T)
        order = np.argsort(d, axis=1)[:, :n_probe]
        return pd.Series([row.astype("int32").tolist() for row in order])

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.explode(probe_cells(F.col(vec_col))).alias("_cell"),
    )
    scored = c.join(F.broadcast(q), on="_cell").where(
        F.col("match_id") != F.col("query_id")
    ).select("query_id", "match_id", cosine(F.col("_qv"), F.col("_cv")).alias("cos_sim"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("match_id"))
    return (
        scored.groupBy("query_id", "match_id").agg(F.max("cos_sim").alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "match_id", "cos_sim", "rank")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.9,
    n_planes: int = 4,
    seed: int = 42,
    n_tables: int = 1,
    persist: str = "local_checkpoint",
) -> DataFrame:
    """cosine ≥ threshold pairs, LSH-blocked self-join then exact verify.

    Scale knobs, independent: ``n_planes`` controls bucket SIZE (2^planes
    buckets — more planes → smaller buckets → the self-join stays
    sub-quadratic as the corpus grows; plane count must grow ~log2(n)),
    ``n_tables`` controls RECALL (standard multi-table LSH banding: T
    independent plane sets, a pair is a candidate if it collides in ANY
    table — recall 1-(1-p^planes)^T instead of p^planes). Candidates are
    deduped across tables BEFORE the exact cosine verify, so each pair
    pays the O(dim) verification once; the shuffles are one self-equi-join
    per table on that table's signature, never O(n²)."""
    if n_tables <= 1:
        # materialized once — the self-join would otherwise evaluate the
        # plane dot products twice (see dedup.lsh_candidate_pairs);
        # `persist` selects the mechanism (operators.materialize)
        base = materialize(
            _spread(df).select(
                F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"),
                lsh_signature(vec_col, dim, n_planes, seed).alias("_sig"),
            ),
            persist,
        )
        a, b = base.alias("a"), base.alias("b")
        return (
            a.join(b, on="_sig")
            .where(F.col("a._id") < F.col("b._id"))
            .select(
                F.col("a._id").alias("id_a"),
                F.col("b._id").alias("id_b"),
                cosine(F.col("a._v"), F.col("b._v")).alias("cos_sim"),
            )
            .where(F.col("cos_sim") >= threshold)
        )

    base = materialize(
        _spread(df).select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("_v"),
            *[
                lsh_signature(vec_col, dim, n_planes, seed + t).alias(f"_sig{t}")
                for t in range(n_tables)
            ],
        ),
        persist,
    )  # consumed 2·T+2 times below
    cand = None
    for t in range(n_tables):
        a = base.select("_id", f"_sig{t}").alias("a")
        b = base.select("_id", f"_sig{t}").alias("b")
        p = (
            a.join(b, on=f"_sig{t}")
            .where(F.col("a._id") < F.col("b._id"))
            .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        )
        cand = p if cand is None else cand.unionByName(p)
    cand = cand.distinct()
    va = base.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"))
    vb = base.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", cosine(F.col("_va"), F.col("_vb")).alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
    )


# ------------------------------------------------------------ quantization

def quantize_int8(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``codes[i] = round(v[i] /
    scale)`` with ``scale = max(|v|) / 127`` — codes in [-127, 127], the
    all-zero vector quantizes to all-zero codes with scale 0.

    The storage/shuffle lever for 100-TB embedding corpora: 4× smaller
    than float32, so 4× fewer scan bytes and 4× smaller ANN shuffles;
    ``cosine_int8`` re-ranks on dequantized dot products with ~1e-2
    cosine error at dim 32 (error + top-k recall in tests/test_quantize.py).
    Pure Column higher-order functions (transform/array_max) — no UDF,
    whole-stage codegen, map-only."""
    v = _c(vec_col).cast("array<double>")
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = amax / F.lit(127.0)
    codes = F.when(
        amax == F.lit(0.0), F.transform(v, lambda x: F.lit(0))
    ).otherwise(F.transform(v, lambda x: F.round(x / scale).cast("int")))
    return df.select(
        _c(id_col), scale.alias("scale"), codes.alias("codes")
    )


def cosine_int8(codes_a: Column, scale_a: Column,
                codes_b: Column, scale_b: Column) -> Column:
    """Cosine over int8-quantized vectors: dequantized dot / dequantized
    norms. The integer dot dominates (dim multiply-adds on ints); scales
    factor out of the quotient, so this equals plain cosine over the
    dequantized vectors — scale_a/scale_b are accepted for symmetry with
    asymmetric schemes but cancel algebraically here."""
    num = dot(codes_a, codes_b) * scale_a * scale_b
    den = (l2_norm(codes_a) * scale_a) * (l2_norm(codes_b) * scale_b)
    return (num / den).cast("double")
