"""Dataset-curation operators for training-data pipelines: deterministic
hash splits, token-budget sequence packing, PII redaction.

All pure Column expressions (whole-stage codegen, no Python), each with an
explicit scale story:

* ``hash_split``     — content-addressed train/val/test assignment from
                       md5(id). No ``rand()``: the split of a row depends
                       only on the row, so it is stable across runs,
                       engines, retries, and cluster sizes — re-ingesting a
                       shard cannot migrate documents between splits (the
                       property a 100 TB curation pipeline actually needs;
                       ``sample()``/``rand(seed)`` are partition-layout
                       dependent). One narrow projection, zero shuffles.
* ``pack_sequences`` — greedy token-budget binning: documents stream in a
                       deterministic order within a shard and a document
                       starts a new bin when the running token total
                       crosses the budget. One window aggregation per
                       shard; shards (e.g. lang, or pmod(hash(id), S))
                       bound the per-task state, so no global sort ever
                       happens — at 100 TB each shard's window is an
                       independent task after one shuffle.
* ``redact_pii``     — email / long-digit-run redaction via regexp_replace
                       (Spark replaces globally; the DuckDB oracle adds the
                       'g' flag). Regex kept to syntax common to Java and
                       RE2 (no backrefs, no lookaround) so oracles and
                       RE2-based engines agree byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import textstats as TS


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


#: first 4 hex digits of md5 → 16 bits of uniform hash; plenty for
#: percentage-granularity splits and cheap to reproduce in any SQL engine
_SPLIT_HEX_DIGITS = 4

# PII patterns — the subset of regex syntax Java and RE2 share
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
DIGIT_RUN_RE = r"[0-9]{6,}"


def hash_split_bucket(id_col: Column | str, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets) from the first 16 bits of
    md5(cast(id as string)). Uniform, content-addressed, engine-portable."""
    h16 = F.conv(
        F.substring(F.md5(_c(id_col).cast("string")), 1, _SPLIT_HEX_DIGITS), 16, 10
    ).cast("long")
    return (h16 % F.lit(n_buckets)).alias("split_bucket")


def hash_split(
    id_col: Column | str, train_pct: int = 90, val_pct: int = 5
) -> Column:
    """'train' | 'val' | 'test' by hash bucket — stable percentage split."""
    b = hash_split_bucket(id_col)
    return (
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget: int,
    shard_col: str,
) -> DataFrame:
    """Assign each document to a training-sequence bin of ~``budget``
    tokens: documents are consumed in ``id_col`` order within each shard,
    and ``seq_bin`` = how many full budgets precede the document's first
    token. Returns (shard, id, n_tokens, seq_bin).

    Semantics are concatenated-stream chunking: a document is assigned to
    the bin containing its FIRST token (bin = floor(tokens_before/budget)),
    so a document may share its bin with predecessors and may straddle into
    later bins — downstream chunking splits stragglers. The formulation is
    one ordered-window running sum per shard: exact, deterministic, and
    expressible in any SQL engine for oracle checking.
    """
    n = TS.bpe_ish_token_count(_c(text_col))
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(n).over(w)
    return df.select(
        F.col(shard_col).alias("shard"),
        F.col(id_col).alias(id_col),
        n.alias("n_tokens"),
        F.floor((cum - n) / F.lit(budget)).cast("long").alias("seq_bin"),
    )


def redact_pii(col: Column | str) -> Column:
    """Replace emails with <EMAIL>, then 6+-digit runs with <NUM> (order
    matters: emails may contain digit runs)."""
    c = F.regexp_replace(_c(col), EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(c, DIGIT_RUN_RE, "<NUM>")


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Match counts per PII class (pre-redaction audit metric)."""
    return {
        "n_emails": F.size(
            F.regexp_extract_all(_c(col), F.lit(f"({EMAIL_RE})"), 1)
        ).cast("long").alias("n_emails"),
        "n_digit_runs": F.size(
            F.regexp_extract_all(redact_pii_emails_only(col), F.lit(f"({DIGIT_RUN_RE})"), 1)
        ).cast("long").alias("n_digit_runs"),
    }


def redact_pii_emails_only(col: Column | str) -> Column:
    """Email-only redaction (used so digit-run counts don't double-count
    digits inside addresses)."""
    return F.regexp_replace(_c(col), EMAIL_RE, "<EMAIL>")


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    resolution: int = 10_000,
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff its
    content-addressed bucket (first 16 bits of md5(id), mod ``resolution``)
    falls below ``rate[stratum] * resolution``.

    The corpus-balancing primitive of a training-data pipeline (e.g. keep
    25% of English but all of the low-resource languages). Like
    ``hash_split``, the keep/drop decision depends only on the row — stable
    across runs, engines, retries, and partition layouts, where
    ``df.sample()``/``rand(seed)`` are partition-layout dependent and
    re-ingesting a shard would resample it differently. Pure Column filter:
    no shuffle, no UDF, whole-stage codegen; at 100 TB this is a map-only
    pass fused into the scan.

    Uses 32 hash bits (8 hex digits), not ``hash_split``'s 16: 2^16 mod
    10000 = 5536, so a 16-bit bucket would over-keep low buckets by ~7/6 —
    a +3.4pp bias at rate 0.5. With 32 bits the modulo bias is ~2e-6.
    """
    thr: Column = F.lit(int(round(default_rate * resolution)))
    when_chain = None
    for stratum, rate in sorted(rates.items()):
        cond = _c(stratum_col) == F.lit(stratum)
        t = F.lit(int(round(rate * resolution)))
        when_chain = F.when(cond, t) if when_chain is None else when_chain.when(cond, t)
    if when_chain is not None:
        thr = when_chain.otherwise(thr)
    bucket = F.conv(
        F.substring(F.md5(_c(id_col).cast("string")), 1, 2 * _SPLIT_HEX_DIGITS), 16, 10
    ).cast("long") % F.lit(resolution)
    return df.where(bucket < thr)


def deterministic_shuffle(
    df: DataFrame,
    key_cols,
    seed: str = "",
    n_partitions: int | None = None,
    persist: str = "local_checkpoint",
) -> DataFrame:
    """Globally-shuffled, REPRODUCIBLE training order without a global
    sort: adds ``shuffle_pos`` (0-based, a permutation of row positions)
    ordered by ``md5(keys ⊕ seed)`` with the keys as tiebreak.

    Training pipelines need corpus order that is (a) statistically
    shuffled, (b) identical across runs/engines/cluster sizes, and
    (c) cheap at 100 TB. ``orderBy(rand(seed))`` fails (b) — Spark's rand
    is partition-layout dependent — and a global ``row_number`` window
    fails (c) (one-task sort). This is content-addressed instead (same
    md5-derived determinism as ``hash_split``), and the global rank is
    assembled scalably:

    1. ``repartitionByRange`` on the hash → ordered, non-overlapping
       partitions (one shuffle; boundary placement does NOT affect the
       result, only balance);
    2. per-partition ``row_number`` windows keyed by the range-partition
       id — every window is one partition's rows, so the sort is local;
    3. global position = local rank + exclusive prefix-sum of partition
       counts (a ``n_partitions``-row aggregate, broadcast back).

    New keys inserted later change positions (it is a permutation, not an
    append log) — shuffle once per corpus freeze, downstream shards read
    ``shuffle_pos`` ranges.

    The partition-count branch consumes the same range exchange as the
    rank branch — and correctness, not just cost, depends on both branches
    seeing the SAME range partitioning: ``repartitionByRange`` samples its
    boundaries, so a stage retry or AQE re-plan that re-executes the
    partitioner could hand the two branches different layouts, making the
    broadcast offsets inconsistent with the local ranks (duplicate/skipped
    positions). ``persist`` therefore defaults to ``local_checkpoint``
    (operators.materialize modes: ``local_checkpoint`` / ``disk`` /
    ``memory_and_disk`` / ``none``), pinning the ranged table before either
    branch reads it; prefer ``disk`` on long 100-TB runs where executor
    loss is expected (lineage kept), and pass ``none`` only when you have
    verified exchange reuse serves both branches in your deployment."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    h = F.md5(
        F.concat_ws(
            "\x1f", *[_c(c).cast("string") for c in keys], F.lit(str(seed))
        )
    )
    spark = df.sparkSession
    n = n_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = (
        df.withColumn("_ds_h", h)
        .repartitionByRange(n, F.col("_ds_h"), *[F.col(c) for c in keys])
        .withColumn("_ds_pid", F.spark_partition_id())
    )
    if persist != "none":
        from ..operators.materialize import materialize

        ranged = materialize(ranged, persist)
    w = Window.partitionBy("_ds_pid").orderBy(
        F.col("_ds_h").asc(), *[F.col(c).asc() for c in keys]
    )
    local = ranged.withColumn("_ds_rank", F.row_number().over(w))
    counts = ranged.groupBy("_ds_pid").agg(F.count(F.lit(1)).alias("_ds_n"))
    woff = (
        Window.orderBy("_ds_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "_ds_pid",
        F.coalesce(F.sum("_ds_n").over(woff), F.lit(0)).alias("_ds_off"),
    )
    return (
        local.join(F.broadcast(offsets), on="_ds_pid")
        .withColumn(
            "shuffle_pos", (F.col("_ds_off") + F.col("_ds_rank") - 1).cast("long")
        )
        .drop("_ds_h", "_ds_pid", "_ds_rank", "_ds_off")
    )
