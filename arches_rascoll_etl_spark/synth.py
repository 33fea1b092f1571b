"""Deterministic synthetic CDC change-log generator.

Generates the BASELINE.json ``input_hint`` table shape —
``(repo, path, commit, lang, content)`` plus a CDC envelope
``(op, commit_seq, ts, batch_id)`` — entirely with Spark column expressions
over ``spark.range``: no driver-side loops, no wall-clock, no uuid4, so the
same config always produces byte-identical data at any scale (10^4 rows in
pytest, 10^10 conceptually on a cluster — the generator is embarrassingly
parallel).

Skew: a configurable fraction of all events lands on a single "hot" repo
(repo_00000) to exercise salting/AQE-skew handling.

Schema evolution: the columns ``author`` and ``size_bytes`` only exist from
``schema_add_batch`` onward — ``batch_events`` drops them for earlier
batches, modeling new graph fields appearing mid-stream (the reference's
accumulated ``col_data_types``, arches_rascoll/ref_collection.py:91,105).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["py", "js", "java", "go", "rs", "md"]

EVOLVED_COLS = ["author", "size_bytes"]


@dataclass(frozen=True)
class ChangeLogConfig:
    n_events: int = 10_000
    n_repos: int = 20
    paths_per_repo: int = 200
    hot_fraction: float = 0.5  # share of events on the hot repo (skew)
    delete_pct: int = 5  # percent of events that are deletes
    n_batches: int = 10
    schema_add_batch: int = 5  # author/size_bytes appear from this batch on
    seed: int = 42


def _h(col, salt: str, seed: int):
    """Deterministic 64-bit hash of a column + salt; basis for all 'random' draws."""
    return F.xxhash64(F.concat(F.lit(f"{salt}:{seed}:"), col.cast("string")))


def change_log(spark: SparkSession, cfg: ChangeLogConfig = ChangeLogConfig()) -> DataFrame:
    """Full change log as one DataFrame (evolution columns null before the
    schema-add batch). Partitioned by Spark's range partitioning; at scale,
    callers re-partition by batch/offset range."""
    df = spark.range(cfg.n_events).withColumnRenamed("id", "event_id")
    seed = cfg.seed

    h_repo = _h(F.col("event_id"), "repo", seed)
    h_path = _h(F.col("event_id"), "path", seed)
    h_op = _h(F.col("event_id"), "op", seed)

    # skew: hot_fraction of events -> repo 0; rest uniform over the others
    u = (F.pmod(h_repo, F.lit(10_000)) / F.lit(10_000.0))
    repo_idx = F.when(u < F.lit(cfg.hot_fraction), F.lit(0)).otherwise(
        F.lit(1) + F.pmod(_h(F.col("event_id"), "repo2", seed), F.lit(max(cfg.n_repos - 1, 1)))
    )
    path_idx = F.pmod(h_path, F.lit(cfg.paths_per_repo))
    lang_idx = F.pmod(path_idx, F.lit(len(LANGS)))
    lang = F.element_at(F.array(*[F.lit(x) for x in LANGS]), (lang_idx + 1).cast("int"))

    df = (
        df.withColumn("commit_seq", F.col("event_id").cast("long"))
        .withColumn("batch_id", (F.col("event_id") * cfg.n_batches / cfg.n_events).cast("long"))
        .withColumn("repo", F.format_string("org/repo_%05d", repo_idx.cast("int")))
        .withColumn(
            "path",
            F.format_string(
                "src/pkg_%02d/mod_%04d.%s",
                F.pmod(path_idx, F.lit(17)).cast("int"),
                path_idx.cast("int"),
                lang,
            ),
        )
        .withColumn("lang", lang)
        .withColumn(
            "op",
            F.when(F.pmod(h_op, F.lit(100)) < cfg.delete_pct, F.lit("D"))
            .when(F.pmod(h_op, F.lit(100)) < cfg.delete_pct + 20, F.lit("I"))
            .otherwise(F.lit("U")),
        )
    )
    # content: deterministic pseudo-code derived from (repo, path, commit_seq)
    body_n = (F.pmod(_h(F.col("event_id"), "len", seed), F.lit(5)) + 1).cast("int")
    df = df.withColumn(
        "content",
        F.concat(
            F.format_string("// %s:%s @ seq=%d\n", F.col("repo"), F.col("path"), F.col("commit_seq")),
            F.repeat(
                F.format_string(
                    "def fn_%d(x):\n    return x * %d\n",
                    F.pmod(F.col("commit_seq"), F.lit(97)).cast("int"),
                    F.pmod(F.col("commit_seq"), F.lit(13)).cast("int"),
                ),
                body_n,
            ),
        ),
    )
    df = (
        df.withColumn(
            "commit",
            F.sha1(F.concat_ws("|", F.lit(str(seed)), F.col("repo"), F.col("path"), F.col("commit_seq"))),
        )
        .withColumn("ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("commit_seq")))
        # evolution columns: only populated from schema_add_batch on
        .withColumn(
            "author",
            F.when(
                F.col("batch_id") >= cfg.schema_add_batch,
                F.format_string("dev_%03d", F.pmod(_h(F.col("event_id"), "author", seed), F.lit(250)).cast("int")),
            ),
        )
        .withColumn(
            "size_bytes",
            F.when(F.col("batch_id") >= cfg.schema_add_batch, F.length("content").cast("long")),
        )
    )
    return df.select(
        "event_id", "batch_id", "commit_seq", "op", "repo", "path", "commit", "lang",
        "content", "ts", "author", "size_bytes",
    )


def batch_events(spark: SparkSession, cfg: ChangeLogConfig, batch_id: int) -> DataFrame:
    """One micro-batch of the change log. Batches before ``schema_add_batch``
    genuinely lack the evolved columns (schema evolution mid-stream)."""
    df = change_log(spark, cfg).where(F.col("batch_id") == batch_id)
    if batch_id < cfg.schema_add_batch:
        df = df.drop(*EVOLVED_COLS)
    return df
