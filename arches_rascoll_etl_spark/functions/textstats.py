"""Text analysis for large-scale training-data pipelines.

All hot-path functions are JVM Column expressions (codegen, no Python);
the one genuinely iterative op (rolling hash) is an Arrow-batched pandas
UDF. Every SQL-expressible function has an exact DuckDB oracle in
``__spark_entry__.oracle_sql`` — integer/string math only, so hashes match
bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

# tiny per-language stopword marker sets for the n-gram/stopword language
# heuristic; scored by whole-word hits per language
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "las", "una", "por"],
    "de": ["der", "die", "und", "das", "ein"],
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def token_count(col: Column | str) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    t = F.trim(_c(col))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("long")


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-ish subword proxy: count of word/number/punctuation units via a
    tokenizer regex (letters runs, digit runs, single punctuation)."""
    units = F.regexp_extract_all(_c(col), F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"), 1)
    return F.size(units).cast("long")


def word_hits(col: Column | str, word: str) -> Column:
    """Whole-word occurrence count — split-based so an ANSI oracle can
    reproduce it exactly: len(split(' '||s||' ', ' w ')) - 1."""
    padded = F.concat(F.lit(" "), _c(col), F.lit(" "))
    return (F.size(F.split(padded, f" {word} ")) - 1).cast("long")


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Marker-word hit totals per language."""
    out = {}
    for lang, words in LANG_MARKERS.items():
        score = None
        for w in words:
            h = word_hits(col, w)
            score = h if score is None else (score + h)
        out[lang] = score.alias(f"score_{lang}")
    return out


def lang_guess(col: Column | str) -> Column:
    """argmax language by marker hits, 'und' when all zero. Deterministic
    tie-break: language list order (en, fr, es, de)."""
    scores = lang_scores(col)
    best_lang = F.lit("und")
    best_score = F.lit(0).cast("long")
    for lang, s in scores.items():  # forward order; strictly-greater replaces
        is_better = s > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, s).otherwise(best_score)
    return best_lang


def punct_count(col: Column | str) -> Column:
    return (F.length(_c(col)) - F.length(F.regexp_replace(_c(col), r"[.,;:!?]", ""))).cast("long")


def quality_features(col: Column | str) -> dict[str, Column]:
    """Quality-scoring features: length, tokens, punctuation ratio,
    stopword ratio (doubles with exact integer numerators)."""
    n_chars = F.length(_c(col)).cast("long")
    n_tokens = token_count(col)
    n_punct = punct_count(col)
    stop_hits = None
    for w in _STOPWORDS:
        h = word_hits(col, w)
        stop_hits = h if stop_hits is None else stop_hits + h
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_punct": n_punct,
        "n_stopwords": stop_hits.cast("long"),
        "punct_ratio": (n_punct / F.greatest(n_chars, F.lit(1))).cast("double"),
        "stopword_ratio": (stop_hits / F.greatest(n_tokens, F.lit(1))).cast("double"),
    }


def quality_flag(col: Column | str, min_tokens: int = 20, max_stopword_ratio: float = 0.6) -> Column:
    """Boolean keep/drop quality gate."""
    f = quality_features(col)
    return (f["n_tokens"] >= min_tokens) & (f["stopword_ratio"] <= max_stopword_ratio)


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of whitespace-normalized, lowercased text.
    Canonical near-identity for formatting-insensitive exact dedup."""
    norm = F.lower(F.trim(F.regexp_replace(_c(col), r"\s+", " ")))
    return F.md5(norm)


def _rolling_hash_batch(texts: list) -> list:
    """Batch rolling hash h = fold(h*257 + byte) mod 2^61-1.

    Vectorized ACROSS the batch: strings are padded into one
    (n_rows × max_len) byte matrix and the Horner recurrence iterates once
    per character POSITION, with numpy uint64 ops over every row at each
    step — the interpreter loop is O(max_len), not O(total_bytes). The
    modular multiply-by-257 uses the Mersenne identity 2^61 ≡ 1 (mod M):
    (h<<8) mod M = (h>>53) + ((h & (2^53-1))<<8), so nothing overflows
    uint64. Per-row Python is O(1) (utf-8 encode only)."""
    MOD = np.uint64((1 << 61) - 1)
    S53 = np.uint64(53)
    S8 = np.uint64(8)
    LOW53 = np.uint64((1 << 53) - 1)

    bs = [None if v is None else str(v).encode("utf-8") for v in texts]
    n = len(bs)
    lens = np.array([0 if b is None else len(b) for b in bs], dtype=np.int64)
    maxlen = int(lens.max(initial=0))
    mat = np.zeros((n, max(maxlen, 1)), dtype=np.uint64)
    for i, b in enumerate(bs):
        if b:
            mat[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    h = np.zeros(n, dtype=np.uint64)
    for j in range(maxlen):
        h256 = ((h >> S53) + ((h & LOW53) << S8)) % MOD  # (h*256) mod M
        h = np.where(j < lens, (h256 + h + mat[:, j]) % MOD, h)
    return [None if b is None else int(v) for b, v in zip(bs, h)]


@pandas_udf(LongType())
def rolling_hash_udf(s: pd.Series) -> pd.Series:
    """Polynomial rolling hash (base 257, mod 2^61-1) over the raw bytes —
    the per-character recurrence isn't expressible as a Column tree, so it
    runs as an Arrow-batched UDF; see ``_rolling_hash_batch`` for the
    across-the-batch vectorization."""
    return pd.Series(_rolling_hash_batch(list(s)), dtype="Int64")


def _nonempty_words(col: Column | str) -> Column:
    """Lowercased whitespace tokens with empties dropped (uniformly handles
    blank text and leading whitespace)."""
    return F.filter(
        F.split(F.lower(_c(col)), r"\s+"), lambda s: F.length(s) > 0
    )


def _nonempty_lines(col: Column | str) -> Column:
    """Trimmed newline-split lines with empties dropped."""
    return F.filter(
        F.transform(F.split(_c(col), "\n"), lambda s: F.trim(s)),
        lambda s: F.length(s) > 0,
    )


def _dup_frac(arr: Column) -> Column:
    """1 - |distinct|/|all| — 0.0 for the empty array."""
    n = F.size(arr)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        (F.lit(1.0) - F.size(F.array_distinct(arr)) / n).cast("double")
    )


def repetition_stats(col: Column | str) -> dict[str, Column]:
    """Gopher-style within-document repetition signals: duplicate-line,
    duplicate-word and duplicate-bigram fractions (1 - distinct/total).
    High values mark boilerplate/spam for corpus filtering.

    Pure Column higher-order functions — map-only, whole-stage codegen,
    O(doc length) work per row plus one array_distinct sort per signal;
    at 100 TB this fuses into the scan like the other quality features.
    """
    words = _nonempty_words(col)
    lines = _nonempty_lines(col)
    bigrams = F.when(
        F.size(words) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(words, i), F.element_at(words, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return {
        "n_lines": F.size(lines).cast("long").alias("n_lines"),
        "n_words": F.size(words).cast("long").alias("n_words"),
        "dup_line_frac": _dup_frac(lines).alias("dup_line_frac"),
        "dup_word_frac": _dup_frac(words).alias("dup_word_frac"),
        "dup_bigram_frac": _dup_frac(bigrams).alias("dup_bigram_frac"),
    }


def top_ngrams(
    df, text_col: str, k_words: int = 2, top_n: int = 20
):
    """Corpus heavy hitters: the ``top_n`` word ``k_words``-grams by
    DOCUMENT frequency (each doc votes once per distinct gram), with the
    gram string as a deterministic tiebreak. Returns (gram, doc_freq).

    This is the discovery side of boilerplate handling: the grams this
    surfaces become ngram_jaccard_pairs' ``max_doc_freq`` casualties and
    PII/license-header strip lists. Shape at scale: explode fused into the
    scan → one map-side-combined hash agg on the gram → TakeOrderedAndProject
    (per-partition top-n, then a top-n merge on the driver — never a global
    sort; verified in tests/test_text_ops.py)."""
    from ..operators.dedup import word_shingles

    return (
        df.select(F.explode(word_shingles(_c(text_col), k_words)).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), F.asc("gram"))
        .limit(top_n)
    )


def strip_repeated_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_doc_freq: int = 2,
    out_col: str = "text_clean",
) -> DataFrame:
    """Cross-document boilerplate removal at line granularity (the
    RefinedWeb/Gopher-style pass that doc-level dedup cannot express):
    a line appearing in MORE than ``max_doc_freq`` distinct documents —
    navigation chrome, license banners, repeated headers — is stripped
    from every document; each document is reassembled from its surviving
    lines in original order. Documents with no surviving lines drop out.

    Scale shape: posexplode (one narrow pass) → doc-frequency hash agg on
    the line (COUNT(DISTINCT doc) planned as two-level agg with map-side
    partial; the hot boilerplate lines this hunts are exactly the keys
    that partially collapse before the shuffle) → join survivors back →
    per-doc reassembly via collect_list + array_sort on (pos, line)
    structs (one shuffle on the doc id, no window). At 100 TB, shuffle
    the 8-byte ``xxhash64(line)`` instead of the line text for the
    doc-frequency pass and join back on the hash — kept literal here so
    the DuckDB oracle can mirror the join key exactly."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_line"),
    )
    docfreq = lines.groupBy("_line").agg(
        F.count_distinct(F.col(id_col)).alias("_dfreq")
    )
    kept = lines.join(docfreq, on="_line").where(
        F.col("_dfreq") <= max_doc_freq
    )
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("_pos"), F.col("_line")))
    )
    return kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n", F.transform(ordered, lambda x: x["_line"])
        ).alias(out_col)
    )
