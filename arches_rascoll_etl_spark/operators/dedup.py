"""Deduplication operators for training-data pipelines.

Spark-first formulations, each with an explicit scale story:

* exact_dedup        — hash groupBy on a content digest; map-side combine,
                       one shuffle, skew-free (digests are uniform).
* shingles           — character k-grams as a Column expression (no UDF).
* minhash_signature  — K independent min-hashes; each hash is
                       min(md5(i || shingle)) so the oracle (DuckDB) can
                       reproduce it byte-for-byte. Computed with
                       explode-free higher-order functions (transform +
                       array_min) — stays in codegen.
* lsh_candidate_pairs— banding: equal band-signature → candidate pair.
                       The only shuffle is groupBy(band_key); no O(n²)
                       cross join ever materializes. At 100 TB this is the
                       standard minhash-LSH near-dup sweep.
* ngram_jaccard_pairs— exact Jaccard via shingle explode + self-join
                       (bounded by a blocking key to stay sub-quadratic);
                       used to verify LSH candidates at small scale.
* simhash_udf        — 64-bit simhash over shingle hashes, Arrow-batched
                       numpy (bit-parallel, no per-char Python loops).
* embedding_neardup  — cosine ≥ threshold pairs via LSH-style blocking on
                       coarse hyperplane signs (see similarity.py).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep one representative row id per distinct content digest (min id —
    deterministic). Returns (digest, keep_id, n_dups)."""
    return (
        df.select(F.md5(_c(text_col)).alias("digest"), _c(id_col).alias("_id"))
        .groupBy("digest")
        .agg(F.min("_id").alias("keep_id"), F.count("*").alias("n_dups"))
    )


def shingles(col: Column | str, k: int = 5) -> Column:
    """Distinct character k-shingles as array<string> — pure Column expr:
    transform over an index sequence + substring, then array_distinct."""
    c = _c(col)
    n = F.greatest(F.length(c) - (k - 1), F.lit(1))
    idx = F.sequence(F.lit(1), n)
    return F.array_distinct(F.transform(idx, lambda i: c.substr(i, F.lit(k))))


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct word k-grams (n-gram units for Jaccard)."""
    words = F.split(F.trim(_c(col)), r"\s+")
    n = F.greatest(F.size(words) - (k - 1), F.lit(1))
    idx = F.sequence(F.lit(1), n)
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, k)))
    )


def minhash_signature(col: Column | str, k_shingles: int = 5, n_hashes: int = 16) -> Column:
    """array<string> of n_hashes min-hash values.

    Hash family i = md5(i:shingle); min over the shingle set under md5's
    ordering is a uniform random permutation per i. String mins keep the
    whole computation reproducible in ANSI SQL (DuckDB oracle)."""
    sh = shingles(col, k_shingles)

    def _hash_i(i: int):
        prefix = f"{i}:"
        # single-param lambda: F.transform must see (element) only — a
        # two-param lambda would be called as (element, index)
        return lambda s: F.md5(F.concat(F.lit(prefix), s))

    mins = [F.array_min(F.transform(sh, _hash_i(i))) for i in range(n_hashes)]
    return F.array(*mins)


def minhash_table(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k_shingles: int = 5,
    n_hashes: int = 16,
) -> DataFrame:
    """(id, mh0..mh{n-1}) via explode + hash-agg of mins.

    Scale path: the higher-order-function formulation
    (``minhash_signature``) evaluates its lambdas interpreted, per element;
    this one keeps every expression (substring + md5) inside whole-stage
    codegen and gets map-side partial aggregation (per-partition per-doc
    mins) before the shuffle. Duplicate shingles need no dedup — min() is
    multiset-invariant — so no array_distinct, no per-doc array
    materialization: explode an index sequence and substring per row."""
    n = F.greatest(F.length(_c(text_col)) - (k_shingles - 1), F.lit(1))
    base = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.sequence(F.lit(1), n)).alias("_i"),
        _c(text_col).alias("_t"),
    ).select("_id", F.col("_t").substr(F.col("_i"), F.lit(k_shingles)).alias("_sh"))
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("_sh")))).alias(f"mh{i}")
        for i in range(n_hashes)
    ]
    return base.groupBy("_id").agg(*aggs)


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k_shingles: int = 5,
    n_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """MinHash+LSH near-duplicate candidates: (id_a, id_b, band) pairs that
    collide in ≥1 band. rows_per_band = n_hashes/bands. One shuffle on the
    band key; hot bands (boilerplate-heavy corpora) are handled by AQE skew
    split since the join is a self-equi-join on band_key."""
    rows_per_band = n_hashes // bands
    sig = minhash_table(df, id_col, text_col, k_shingles, n_hashes)
    banded = sig.select(
        "_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.concat_ws("\x1f", *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]).alias("band_sig"),
                )
                for b in range(bands)
            ])
        ).alias("bk"),
    ).select("_id", "bk.band", "bk.band_sig")
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(b, on=["band", "band_sig"])
        .where(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str | None = None,
    k_words: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact word-n-gram Jaccard pairs ≥ threshold.

    Sub-quadratic: explode shingles → self-join on shingle (+ optional
    blocking column) → intersection counts; union derived from per-doc
    distinct counts. Only docs sharing ≥1 shingle ever pair up."""
    base = df.select(
        _c(id_col).alias("_id"),
        *( [_c(block_col).alias("_blk")] if block_col else [] ),
        F.explode(word_shingles(text_col, k_words)).alias("sh"),
    )
    sizes = base.groupBy("_id").agg(F.count("*").alias("n_sh"))
    join_keys = ["sh"] + (["_blk"] if block_col else [])
    a, b = base.alias("a"), base.alias("b")
    inter = (
        a.join(b, on=join_keys)
        .where(F.col("a._id") < F.col("b._id"))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a").join(sb, "id_b")
        .withColumn("jaccard", (F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))).cast("double"))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


@pandas_udf(LongType())
def simhash64_udf(s: pd.Series) -> pd.Series:
    """64-bit SimHash over word tokens, Arrow-batched.

    Per string: hash each token to 64 bits (blake2b, deterministic), sum
    ±1 per bit position, sign → fingerprint. numpy bit-unpacking keeps the
    inner loop vectorized (no per-bit Python)."""
    import hashlib

    def one(v: str | None):
        if v is None:
            return None
        toks = v.split()
        if not toks:
            return 0
        hs = np.frombuffer(
            b"".join(hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest() for t in toks),
            dtype=">u8",
        )
        bits = np.unpackbits(hs.view(np.uint8).reshape(-1, 8), axis=1)  # (n,64)
        votes = bits.sum(axis=0).astype(np.int64) * 2 - len(toks)
        fp = 0
        for bit in (votes > 0).astype(np.uint8):
            fp = (fp << 1) | int(bit)
        return fp - (1 << 64) if fp >= (1 << 63) else fp  # to signed long

    return s.map(one).astype("Int64")


def simhash_neardup_pairs(df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup candidates: block on 16-bit chunks (a pair within
    hamming ≤3 of 64 bits must agree on ≥1 of 4 chunks), verify hamming via
    bit_count(xor). Shuffle = groupBy(chunk value), never O(n²)."""
    sh = df.select(_c(id_col).alias("_id"), simhash64_udf(_c(text_col)).alias("sim"))
    chunks = sh.select(
        "_id", "sim",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("chunk_i"), F.shiftrightunsigned("sim", 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("chunk_v"))
            for i in range(4)
        ])).alias("c"),
    ).select("_id", "sim", "c.chunk_i", "c.chunk_v")
    a, b = chunks.alias("a"), chunks.alias("b")
    return (
        a.join(b, on=["chunk_i", "chunk_v"])
        .where(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"),
            F.bit_count(F.col("a.sim").bitwiseXOR(F.col("b.sim"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def duplicate_clusters(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """Connected components over candidate pairs → (id, label) with label =
    min id of the component.

    Min-label propagation over the EDGE set each round (neighbor mins),
    plus a pointer-jumping step (label ← label's label) for logarithmic
    convergence on chains. Propagating over labels alone is NOT enough — a
    path component a-b-c-d stalls with two labels — so edges stay in the
    loop. Driver loop, executor data: each round = one edge join + min-agg;
    converges in O(log diameter) rounds, checked via isEmpty on the diff."""
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .persist()
    )
    labels = edges.groupBy(F.col("src").alias("id")).agg(
        F.least(F.min("dst"), F.first("src")).alias("label")
    ).persist()
    try:
        for _ in range(max_iter):
            neighbor_min = (
                edges.join(labels.withColumnRenamed("id", "dst"), "dst")
                .groupBy(F.col("src").alias("id"))
                .agg(F.min("label").alias("nmin"))
            )
            parents = labels.select(F.col("id").alias("label"), F.col("label").alias("pmin"))
            prop = (
                labels.join(neighbor_min, "id", "left")
                .join(parents, "label", "left")
                .select(
                    "id",
                    F.least(
                        "label", F.coalesce("nmin", "label"), F.coalesce("pmin", "label")
                    ).alias("label"),
                )
                .persist()
            )
            changed = not prop.exceptAll(labels).isEmpty()
            labels.unpersist()
            labels = prop
            if not changed:
                break
        return labels
    finally:
        edges.unpersist()
