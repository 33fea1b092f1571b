"""Deduplication operators for training-data pipelines.

Spark-first formulations, each with an explicit scale story:

* exact_dedup        — hash groupBy on a content digest; map-side combine,
                       one shuffle, skew-free (digests are uniform).
* shingles           — character k-grams as a Column expression (no UDF).
* minhash_signature  — K independent min-hashes via ONE md5 per shingle
                       plus K affine permutations ((a_i*h + b_i) mod p,
                       p = 2^31-1): the classic universal-hash family. One
                       digest amortized over all K hashes (the old
                       md5-per-hash formulation cost K digests per shingle
                       — the dominant bench cost); integer math keeps the
                       DuckDB oracle byte-exact. Computed with explode-free
                       higher-order functions (transform + array_min).
* lsh_candidate_pairs— banding: equal band-signature → candidate pair.
                       The only shuffle is groupBy(band_key); no O(n²)
                       cross join ever materializes. At 100 TB this is the
                       standard minhash-LSH near-dup sweep.
* ngram_jaccard_pairs— exact Jaccard via shingle explode + self-join
                       (bounded by a blocking key to stay sub-quadratic);
                       used to verify LSH candidates at small scale.
* simhash_table      — 64-bit simhash over word tokens as a pure
                       DataFrame expression: explode tokens → md5 → SWAR
                       bit-count sums (16 masked-shift aggregates carrying
                       four 16-bit lane counters each — not 64 per-bit
                       sums; one hash-agg, map-side combine) → sign bits
                       packed into a signed long. No Python at all (the
                       old pandas-UDF version hashed tokens in an
                       interpreted loop), and md5 + integer bit math make
                       the DuckDB oracle exact.
* embedding_neardup  — cosine ≥ threshold pairs via LSH-style blocking on
                       coarse hyperplane signs (see similarity.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from arches_rascoll_etl_spark.operators.materialize import materialize


# simhash SWAR vote lanes are 16 bits wide, but the accumulator is a SIGNED
# long: once the TOP lane (bits 48-63) exceeds 0x7FFF the packed sum passes
# 2^63-1 and Spark's ANSI mode raises ARITHMETIC_OVERFLOW (without ANSI it
# would silently wrap into the sign bit). 32767 tokens keeps the worst-case
# packed sum at 0x7FFF7FFF7FFF7FFF < Long.MAX (see simhash_table).
_SWAR_MAX_TOKENS = 32767


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _spread(df: DataFrame, *keys: str) -> DataFrame:
    """Rebalance a narrow input across the session's default parallelism
    BEFORE compute-dense per-row work (shingle/token explode + hashing).

    A small parquet file is one scan partition, which would serialize the
    heavy exploded stage onto one core (observed: 32-core session, 1 task).
    Only repartitions when the input has fewer partitions than cores — at
    100 TB the scan already has thousands of partitions and this is a
    no-op, so no shuffle is added at scale.

    When ``keys`` are given they must be the downstream aggregation keys:
    the spread then hash-partitions on them, so Catalyst sees the groupBy's
    required distribution already satisfied and the post-explode
    partial-agg → exchange → final-agg pair collapses into one final agg in
    the SAME stage as the heavy work (measured ~25-30% off simhash wall at
    sf0.1, one Exchange of 5k narrow rows instead of two). Keys only make
    sense under this small-input gate — at scale the spread is a no-op and
    the map-side partial aggregation (which shuffles per-doc partial rows,
    far smaller than raw text) is the right plan.

    The narrow-input check reads driver-side file metadata
    (operators.parallelism), NOT ``df.rdd.getNumPartitions()`` — the
    ``.rdd`` probe forces a full plan→RDD conversion per call."""
    from arches_rascoll_etl_spark.operators.parallelism import is_narrow_input

    n = df.sparkSession.sparkContext.defaultParallelism
    if not is_narrow_input(df, n):
        return df
    return df.repartition(n, *[F.col(k) for k in keys]) if keys else df.repartition(n)


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


# Universal-hash family for minhash: h(s) = first 32 bits of md5(s), then
# permutation i = (A[i] * (h mod P) + B[i]) mod P with P = 2^31-1 (Mersenne).
# Products stay < 2^62, so the whole family is exact signed-64-bit integer
# math in both Spark and DuckDB (the oracle embeds the same literals).
# A/B are fixed LCG-style constants — deterministic, no runtime randomness.
MINHASH_P = 2147483647
MINHASH_A = [((1103515245 * (i + 1) + 12345) % MINHASH_P) or 1 for i in range(64)]
MINHASH_B = [(22695477 * (i + 1) + 1) % MINHASH_P for i in range(64)]


def _md5_h32(col: Column) -> Column:
    """First 32 bits of md5(col) as a long in [0, 2^32), reduced mod P.
    One digest per value — the K permutations are derived arithmetically."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % F.lit(MINHASH_P)


def _affine(h: Column, i: int) -> Column:
    return (F.lit(MINHASH_A[i]) * h + F.lit(MINHASH_B[i])) % F.lit(MINHASH_P)


def minhash_signature(col: Column | str, k_shingles: int = 5, n_hashes: int = 16) -> Column:
    """array<long> of n_hashes min-hash values (one md5 per shingle + K
    affine permutations — see module docstring)."""
    sh = shingles(col, k_shingles)
    hs = F.transform(sh, lambda s: _md5_h32(s))
    mins = [F.array_min(F.transform(hs, lambda h, i=i: _affine(h, i))) for i in range(n_hashes)]
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
    this one keeps every expression (substring + md5 + affine permutation)
    inside whole-stage codegen and gets map-side partial aggregation
    (per-partition per-doc mins) before the shuffle. ONE md5 per shingle —
    the K hash values are affine permutations of it ((A[i]*h+B[i]) mod
    2^31-1), so digest cost no longer multiplies with K (the old
    md5-per-hash version spent 29% of the whole bench on digests).
    Duplicate shingles need no dedup — min() is multiset-invariant — so no
    array_distinct, no per-doc array materialization: explode an index
    sequence and substring per row."""
    narrow = _spread(df.select(F.col(id_col).alias("_id"), _c(text_col).alias("_t")), "_id")
    n = F.greatest(F.length("_t") - (k_shingles - 1), F.lit(1))
    base = narrow.select(
        "_id",
        F.explode(F.sequence(F.lit(1), n)).alias("_i"),
        "_t",
    ).select("_id", F.col("_t").substr(F.col("_i"), F.lit(k_shingles)).alias("_sh"))
    h = base.select("_id", _md5_h32(F.col("_sh")).alias("_h"))
    aggs = [F.min(_affine(F.col("_h"), i)).alias(f"mh{i}") for i in range(n_hashes)]
    return h.groupBy("_id").agg(*aggs)


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k_shingles: int = 5,
    n_hashes: int = 16,
    bands: int = 4,
    persist: str = "local_checkpoint",
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
    # materialize the signature table once: Catalyst's exchange reuse does
    # not fire across the self-join's aliased subtrees, so without this the
    # full shingle+md5 pipeline runs TWICE (halves q28's wall time). The
    # banded table is tiny (n_docs × bands rows). `persist` picks the
    # mechanism: local_checkpoint (sandbox default) vs lineage-keeping
    # disk/memory_and_disk for executor-loss resilience — see
    # operators.materialize for the trade-offs.
    banded = materialize(banded, persist)
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(b, on=["band", "band_sig"])
        .where(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    return pairs


def _ngram_overlap(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str | None,
    k_words: int,
    max_doc_freq: int | None,
) -> DataFrame:
    """Shared shingle-overlap core for Jaccard / containment pair scoring:
    (id_a, id_b, n_inter, n_a, n_b) for every pair sharing ≥1 surviving
    shingle, with id_a < id_b.

    Sub-quadratic: explode distinct shingles → self-join on shingle
    (+ optional blocking column) → intersection counts; per-doc distinct
    counts ride alongside. ``max_doc_freq`` drops shingles appearing in
    more than that many documents before the self-join — the standard
    guard against boilerplate shingles joining n² rows."""
    base = _spread(
        df.select(
            _c(id_col).alias("_id"),
            *([_c(block_col).alias("_blk")] if block_col else []),
            _c(text_col).alias("_t"),
        )
    ).select(
        "_id",
        *(["_blk"] if block_col else []),
        F.explode(word_shingles("_t", k_words)).alias("sh"),
    )
    sizes = base.groupBy("_id").agg(F.count("*").alias("n_sh"))
    join_keys = ["sh"] + (["_blk"] if block_col else [])
    if max_doc_freq is not None:
        # shingle doc-frequency cap: one extra hash-agg on the same keys,
        # then a semi-join that Catalyst plans alongside the main join
        rare = (
            base.groupBy(*join_keys)
            .agg(F.count("*").alias("_df"))
            .where(F.col("_df") <= max_doc_freq)
            .select(*join_keys)
        )
        base = base.join(rare, on=join_keys, how="left_semi")
    a, b = base.alias("a"), base.alias("b")
    inter = (
        a.join(b, on=join_keys)
        .where(F.col("a._id") < F.col("b._id"))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return inter.join(sa, "id_a").join(sb, "id_b")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str | None = None,
    k_words: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = 1000,
) -> DataFrame:
    """Exact word-n-gram Jaccard pairs ≥ threshold (id_a, id_b, jaccard).

    Jaccard = |A∩B| / |A∪B| over distinct word k-grams; union derived from
    the per-doc distinct counts, so no second join. With ``max_doc_freq``
    (ON by default) Jaccard becomes a lower bound for pairs whose overlap
    was ONLY boilerplate (their union counts still include capped
    shingles); genuinely near-duplicate pairs share plenty of rare
    shingles and are unaffected. Pass ``None`` to disable (exact, unsafe
    at scale)."""
    return (
        _ngram_overlap(df, id_col, text_col, block_col, k_words, max_doc_freq)
        .withColumn("jaccard", (F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))).cast("double"))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str | None = None,
    k_words: int = 3,
    threshold: float = 0.8,
    max_doc_freq: int | None = 1000,
) -> DataFrame:
    """Word-n-gram containment pairs ≥ threshold (id_a, id_b, containment).

    Containment = |A∩B| / min(|A|, |B|) — the subset/superset duplicate
    detector Jaccard structurally misses: a 100-gram doc fully quoted
    inside a 10,000-gram doc has Jaccard ≈ 0.01 but containment = 1.0.
    This is the standard second pass of a corpus dedup pipeline (catches
    quote inclusions, file moves with appended headers, README sections
    pasted into larger docs). Reference parity: the reference dedups only
    on full-record equality (resource_utils.py); containment generalizes
    that to partial-inclusion at n-gram granularity.

    Same sub-quadratic shingle self-join core as ngram_jaccard_pairs
    (one explode, one doc-frequency cap semi-join, one pair agg); the
    scoring expression is the only difference, so both scale identically.
    Caveat under ``max_doc_freq``: if the SMALLER doc's shingles are
    mostly boilerplate, its intersection is undercounted while min(|A|,
    |B|) is not, so reported containment is a lower bound — same
    direction of error as Jaccard's."""
    return (
        _ngram_overlap(df, id_col, text_col, block_col, k_words, max_doc_freq)
        .withColumn("containment", (F.col("n_inter") / F.least("n_a", "n_b")).cast("double"))
        .where(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment")
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    k_words: int = 8,
    min_hits: int = 1,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Test-set contamination report: training docs sharing ≥ ``min_hits``
    distinct word ``k_words``-grams with ANY eval/benchmark doc.

    Returns (train_id, n_gram_hits, n_eval_docs): how many distinct train
    k-grams appear somewhere in the eval corpus, and how many distinct
    eval docs are implicated. Downstream policy (drop the doc, mask the
    span, keep + tag) is the caller's; this op only measures.

    Scale shape: the eval side of the join is the gram inventory of the
    BENCHMARK suite — thousands of docs, not the 100-TB train corpus — so
    with ``broadcast_eval`` (default) it ships to every executor and the
    train side never shuffles: one explode fused into the train scan, one
    broadcast-hash join, one partial-agg'd groupBy on train_id. Set it
    False for an eval corpus too big to pin in executor memory (falls
    back to a shuffle hash join on the gram key).

    Reference parity: the reference has no decontamination (it loads
    curated museum records); this is part of the training-data surface
    the brief adds on top (SURVEY §2.10)."""
    tg = train.select(
        _c(id_col).alias("train_id"),
        F.explode(word_shingles(_c(text_col), k_words)).alias("gram"),
    )
    eg = eval_df.select(
        _c(id_col).alias("eval_id"),
        F.explode(word_shingles(_c(text_col), k_words)).alias("gram"),
    )
    if broadcast_eval:
        eg = F.broadcast(eg)
    return (
        tg.join(eg, "gram")
        .groupBy("train_id")
        .agg(
            F.countDistinct("gram").alias("n_gram_hits"),
            F.countDistinct("eval_id").alias("n_eval_docs"),
        )
        .where(F.col("n_gram_hits") >= min_hits)
    )


def decontaminate_prefiltered(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    k_words: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """:func:`decontaminate` with a broadcast runtime prefilter — same
    exact result, built for the regime where even the eval gram table is
    an expensive broadcast.

    Phase 1 ships only DISTINCT 8-byte ``xxhash64(gram)`` longs of the
    eval suite (an order of magnitude smaller than the gram strings an
    ``k_words``-word shingle carries) and left-semi-joins the train gram
    stream against them — the same shape Catalyst's own runtime-filter
    injection uses, expressed explicitly so the filter survives plan
    changes. At 100 TB virtually every train gram dies here, inside the
    scan stage, before any aggregation state exists.

    Phase 2 re-joins the tiny survivor set against the real gram strings,
    so an xxhash64 collision can never fabricate a hit — the output is
    bit-identical to the single-phase operator (and to the SQL oracle),
    never approximate. The verify join is broadcast too: survivors are
    rare and the eval side is the benchmark suite, not the corpus."""
    tg = train.select(
        _c(id_col).alias("train_id"),
        F.explode(word_shingles(_c(text_col), k_words)).alias("gram"),
    )
    eg = eval_df.select(
        _c(id_col).alias("eval_id"),
        F.explode(word_shingles(_c(text_col), k_words)).alias("gram"),
    )
    gram_hashes = eg.select(F.xxhash64("gram").alias("_gh")).distinct()
    survivors = (
        tg.withColumn("_gh", F.xxhash64("gram"))
        .join(F.broadcast(gram_hashes), "_gh", "left_semi")
        .drop("_gh")
    )
    return (
        survivors.join(F.broadcast(eg), "gram")
        .groupBy("train_id")
        .agg(
            F.countDistinct("gram").alias("n_gram_hits"),
            F.countDistinct("eval_id").alias("n_eval_docs"),
        )
        .where(F.col("n_gram_hits") >= min_hits)
    )


def simhash_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(_id, simhash): 64-bit SimHash over word tokens as pure Column
    expressions — no Python anywhere.

    Token hash = first 64 bits of md5(token). Votes: per-bit counts
    accumulated SWAR-style — each of 16 aggregates sums a masked shift of
    the hash, carrying four bit positions in 16-bit lanes (one hash-agg
    with map-side combine — a boilerplate-heavy corpus partially
    aggregates before the shuffle; per-token expression work is 16 terms,
    not 64). Fingerprint = two's-complement packing of the vote signs
    (bit 0 is the sign bit, weight -2^63), decided once per doc after the
    aggregation. Tokenless docs get simhash 0 via a zero-weight sentinel
    token, so no post-join is needed and every input row appears exactly
    once in the output. md5 + integer bit math keep the DuckDB oracle
    byte-exact (the previous pandas-UDF used blake2b, which no SQL engine
    exposes, and hashed tokens in an interpreted per-token loop)."""
    narrow = _spread(df.select(_c(id_col).alias("_id"), _c(text_col).alias("_t")), "_id")
    tok_arr = F.filter(F.split(F.trim(F.col("_t")), r"\s+"), lambda t: F.length(t) > 0)
    # Hard-enforce the SWAR lane cap (signed-long accumulator ⇒ ≤32767
    # votes/doc, see _SWAR_MAX_TOKENS): beyond it the packed sum overflows
    # the long (ANSI error) or a lane's carry bleeds into the adjacent bit
    # position's count (silent corruption). Truncating to the first 32767
    # whitespace tokens keeps the fingerprint valid (simhash over a
    # 32k-token prefix is still a faithful near-dup signal; real corpora
    # sit far below the cap).
    tok_arr = F.slice(tok_arr, 1, _SWAR_MAX_TOKENS)
    toks = narrow.select(
        "_id",
        # zero-weight sentinel: keeps empty docs in the aggregation
        F.explode(F.concat(F.array(F.lit("")), tok_arr)).alias("_tok"),
    )
    weighted = toks.select(
        "_id",
        (F.length("_tok") > 0).cast("long").alias("_w"),
        F.md5("_tok").alias("_m"),
    )
    # top 64 md5 bits as ONE long (two 32-bit conv calls — conv of 16 hex
    # chars would overflow signed parsing), zeroed for the sentinel row so
    # it contributes no bit votes
    h64 = (
        F.shiftleft(F.conv(F.substring("_m", 1, 8), 16, 10).cast("long"), 32)
        .bitwiseOR(F.conv(F.substring("_m", 9, 8), 16, 10).cast("long"))
        * F.col("_w")
    )
    packed = weighted.select("_id", F.col("_w"), h64.alias("_h"))
    # SWAR bit-count aggregation: 16 masked-shift sums instead of 64
    # per-bit sums. Sum g accumulates, in four 16-bit lanes, the counts of
    # bits g, g+16, g+32, g+48 of _h — the per-TOKEN work drops from 64
    # shift/AND/±1 terms to 16 shift/AND terms; the 64 sign decisions move
    # to the post-aggregation side (once per doc). The signed-long
    # accumulator caps docs at 32767 tokens — enforced above via
    # F.slice(tok_arr, 1, _SWAR_MAX_TOKENS).
    # NOTE both wide expressions below are built as SQL STRINGS and handed
    # to the JVM in ONE F.expr call each. Building them as Column trees
    # costs one py4j round-trip PER OPERATOR (~450 for the fingerprint —
    # measured ~0.9 s of pure driver-side Python before any data moved,
    # most of q33's wall at sf0.1); the JVM parses the same tree from text
    # in microseconds.
    lane_mask = 0x0001000100010001
    aggs = [F.sum(F.col("_w")).alias("_n")] + [
        F.expr(f"sum(shiftrightunsigned(_h, {g}) & {lane_mask}) AS _s{g}")
        for g in range(16)
    ]
    votes = packed.groupBy("_id").agg(*aggs)
    # Fingerprint decision, SWAR again: bit at combined position p = g+16k
    # (lane k of sum g) is set ⟺ 2*count > n ⟺ count ≥ floor(n/2)+1 =: t
    # (the odd/even cases collapse because counts are integers). Compare
    # several lanes of a sum AT ONCE with the classic packed-compare
    # trick: both operands fit 15 bits (count ≤ 32767 via the token cap,
    # t ≤ 16384), so with a per-lane guard bit set,
    #   r = (s | 0x8000…8000) - t*0x0001…0001
    # never borrows across lanes and leaves each lane's ≥-decision in its
    # bit 15. ANSI wrinkle: lane 3's guard would be bit 63 — the long's
    # SIGN bit — and the subtraction then signed-underflows (ANSI mode
    # raises instead of wrapping). So lanes 0–2 use the packed compare on
    # the low 48 bits (masked word ≤ 2^48, t*ones3 ≤ 2^44 ⇒ the signed
    # subtraction can't overflow), and lane 3 compares its extracted
    # 15-bit count alone with the same |0x8000 guard in a plain int range.
    # shiftrightunsigned(r,15) & ones3 isolates the three low decisions at
    # positions 0/16/32, lane 3's lands at 48, and "<< g" places them on
    # g, g+16, g+32, g+48 — the 64-bit fingerprint assembles from 16
    # twelve-op terms instead of 64 eight-op ones (r3's per-bit form; same
    # semantics, ~3× less expression for Janino to compile — the compile
    # dominated q33's cold wall). g=15's lane-3 shift parks on the long's
    # sign bit, giving the two's-complement packing the oracle expects.
    low48 = 0x0000FFFFFFFFFFFF
    guard3 = 0x0000800080008000
    ones3 = 0x0000000100010001
    with_b = votes.withColumns(
        {
            "_t": F.expr("(_n div 2) + 1"),
            "_bl": F.expr(f"((_n div 2) + 1) * {ones3}"),
        }
    )
    terms = [
        "(shiftleft("
        f"(shiftrightunsigned(((_s{g} & {low48}) | {guard3}) - _bl, 15) & {ones3})"
        f" | shiftleft(shiftrightunsigned((shiftrightunsigned(_s{g}, 48) | 32768) - _t, 15) & 1, 48)"
        f", {g}))"
        for g in range(16)
    ]
    fp_sql = "(" + " | ".join(terms) + ") AS simhash"
    return with_b.select("_id", F.expr(fp_sql))


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    persist: str = "local_checkpoint",
) -> DataFrame:
    """SimHash near-dup candidates: block on 16-bit chunks (a pair within
    hamming ≤3 of 64 bits must agree on ≥1 of 4 chunks), verify hamming via
    bit_count(xor). Shuffle = groupBy(chunk value), never O(n²)."""
    # materialized once — the chunk self-join would otherwise run the full
    # tokenize+md5+vote pipeline twice (see lsh_candidate_pairs); `persist`
    # selects the mechanism (operators.materialize)
    sh = materialize(
        simhash_table(df, id_col, text_col).withColumnRenamed("simhash", "sim"),
        persist,
    )
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
    loop. Driver loop, executor data: each round is exactly ONE driver
    action — a changed-row count on the persisted new frame (which both
    materializes it for the next round's joins and decides convergence) —
    instead of a shuffle-heavy exceptAll set-difference. Converges in
    O(log diameter) rounds."""
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .persist()
    )
    labels = edges.groupBy(F.col("src").alias("id")).agg(
        F.least(F.min("dst"), F.first("src")).alias("label")
    ).persist()
    cached = labels  # the persisted handle backing `labels`
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
                    F.col("label").alias("_old"),
                    F.least(
                        "label", F.coalesce("nmin", "label"), F.coalesce("pmin", "label")
                    ).alias("label"),
                )
                .persist()
            )
            # one action: materializes prop AND decides convergence
            changed = prop.where(F.col("label") != F.col("_old")).count() > 0
            cached.unpersist()
            cached = prop
            labels = prop.drop("_old")
            if not changed:
                break
        return labels
    finally:
        edges.unpersist()


def dedup_corpus(
    docs: DataFrame,
    id_col: str,
    labels: DataFrame,
    score_col: str | None = None,
) -> DataFrame:
    """Close the near-dup loop: given the corpus and the duplicate-cluster
    labels (``duplicate_clusters`` output: one ``(id, label)`` row per doc
    that appeared in ANY candidate pair), return the corpus with every
    cluster collapsed to ONE representative. Docs in no cluster pass
    through untouched (they never enter the labels frame).

    Representative rule: without ``score_col``, the min-id member — which
    is exactly the cluster label, so the drop set is a pure filter on the
    labels frame (zero extra joins). With ``score_col`` (a quality signal
    from e.g. functions/textstats.quality_score), the highest-scoring
    member wins (ties break to the highest id): one small agg over the
    labels⋈scores join picks winners per cluster.

    Scale: the drop set is O(clustered docs) — a tiny fraction of the
    corpus by construction — so the final anti-join broadcasts under AQE;
    the corpus itself is never shuffled."""
    if score_col is None:
        drop = labels.where(F.col("id") != F.col("label")).select(
            F.col("id").alias(id_col)
        )
        return docs.join(drop, on=id_col, how="left_anti")
    scored = labels.join(
        docs.select(F.col(id_col).alias("id"), F.col(score_col).alias("_s")),
        on="id",
    )
    reps = scored.groupBy("label").agg(
        F.max(F.struct(F.col("_s"), F.col("id"))).alias("_m")
    ).select(F.col("label"), F.col("_m.id").alias("_rep"))
    drop = (
        labels.join(reps, on="label")
        .where(F.col("id") != F.col("_rep"))
        .select(F.col("id").alias(id_col))
    )
    return docs.join(drop, on=id_col, how="left_anti")
