"""Incremental aggregate maintenance over the lake's CDC feed.

The classic materialized-rollup pattern: instead of re-aggregating a
100 TB table after every merge, convert the snapshot-to-snapshot change
stream (``SnapshotTable.read_changes(..., include_old=True)``) into
per-group DELTAS and add them to the previous aggregate state. Cost is
O(changed rows) + O(touched groups), never O(table) — the property that
makes continuously-maintained rollups viable at scale. (The reference has
no analogue; this generalizes its "recompute the staging table each run"
into incremental view maintenance.)

Two maintenance strategies, chosen by the aggregate's algebra:

* COUNT/SUM (and derived AVG) are self-invertible: an update retracts the
  old image's contribution and applies the new image's — pure delta fold,
  O(changed rows), the live table is never read (``agg_delta`` /
  ``apply_agg_delta``).
* MIN/MAX are NOT invertible under deletes (retracting the current max
  needs the runner-up, which no delta carries), so ``maintain_minmax``
  re-aggregates only the groups TOUCHED by the change stream from the
  live table and stitches them onto the untouched groups' prior state —
  O(changed rows) + O(rows in affected groups), never O(table).

Null handling matches Spark SUM/COUNT semantics (null measure values are
skipped, rows still counted). Null GROUP KEYS are a caller concern: SQL
join equality won't merge them — coalesce nulls to a sentinel before
grouping if your group columns can be null.

Shapes:
* ``aggregate_snapshot(df, group_cols, sum_cols)`` — the batch aggregate
  the incremental path must stay equal to (one hash agg).
* ``agg_delta(changes, group_cols, sum_cols)`` — change stream → per-group
  (row_delta, sum deltas). An update whose group column changed retracts
  from the old group and applies to the new one (the old/new images are
  exploded into ±1-signed contributions — handles group migration for
  free).
* ``apply_agg_delta(prev, delta, group_cols, sum_cols)`` — full-outer join
  on the group key, add deltas, drop groups whose row count reaches zero.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_snapshot(
    df: DataFrame, group_cols: Sequence[str], sum_cols: Sequence[str]
) -> DataFrame:
    """Reference batch aggregate: (group_cols..., n_rows, sum_<c>...)."""
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.sum(F.col(c)).alias(f"sum_{c}") for c in sum_cols],
    )


def _image_col(changes: DataFrame, side: str, name: str):
    """Resolve column ``name`` of a change-stream image: payload columns
    live inside the ``old``/``new`` structs, but the table's KEY columns
    are top-level in ``read_changes`` output (keys can't differ between
    the images — a key change is a delete+insert pair). Grouping or
    summing on a key column must therefore read the top-level column."""
    payload = {f.name for f in changes.schema[side].dataType.fields}
    return F.col(side)[name] if name in payload else F.col(name)


def agg_delta(
    changes: DataFrame, group_cols: Sequence[str], sum_cols: Sequence[str]
) -> DataFrame:
    """Per-group deltas from a both-images change stream
    (``change_op, keys..., old struct, new struct``).

    Each change row contributes up to two signed rows: (-1, old image) and
    (+1, new image); exploding then hash-aggregating handles inserts,
    deletes, value updates, and group-migrating updates uniformly, with
    map-side combine on the (sign × value) partial sums."""
    contribs = changes.select(
        F.explode(
            F.array(
                F.when(
                    F.col("old").isNotNull(),
                    F.struct(
                        F.lit(-1).alias("_sign"),
                        *[_image_col(changes, "old", c).alias(c) for c in group_cols],
                        *[_image_col(changes, "old", c).alias(f"_v_{c}") for c in sum_cols],
                    ),
                ),
                F.when(
                    F.col("new").isNotNull(),
                    F.struct(
                        F.lit(1).alias("_sign"),
                        *[_image_col(changes, "new", c).alias(c) for c in group_cols],
                        *[_image_col(changes, "new", c).alias(f"_v_{c}") for c in sum_cols],
                    ),
                ),
            )
        ).alias("_c")
    ).where(F.col("_c").isNotNull()).select("_c.*")
    return contribs.groupBy(*group_cols).agg(
        F.sum("_sign").alias("d_rows"),
        *[F.sum(F.col("_sign") * F.col(f"_v_{c}")).alias(f"d_sum_{c}") for c in sum_cols],
    )


def apply_agg_delta(
    prev: DataFrame,
    delta: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
) -> DataFrame:
    """prev aggregate ⊕ delta → next aggregate. Groups with zero remaining
    rows are dropped (their sums are exactly retracted by construction)."""
    joined = prev.alias("p").join(delta.alias("d"), on=list(group_cols), how="full_outer")
    out = joined.select(
        *group_cols,
        (F.coalesce("p.n_rows", F.lit(0)) + F.coalesce("d.d_rows", F.lit(0))).alias("n_rows"),
        *[
            (
                F.coalesce(f"p.sum_{c}", F.lit(0)) + F.coalesce(f"d.d_sum_{c}", F.lit(0))
            ).alias(f"sum_{c}")
            for c in sum_cols
        ],
    )
    return out.where(F.col("n_rows") > 0)


def maintain_aggregate(
    table,
    prev: DataFrame | None,
    from_version: int | None,
    to_version: int | None,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
) -> DataFrame:
    """Maintain a rollup over a :class:`SnapshotTable`: given the aggregate
    as of ``from_version`` (``prev``; None bootstraps from scratch), return
    the aggregate as of ``to_version`` using only the change stream between
    the two snapshots."""
    if prev is None or from_version is None:
        return aggregate_snapshot(table.read(version=to_version), group_cols, sum_cols)
    changes = table.read_changes(from_version, to_version, include_old=True)
    return apply_agg_delta(
        prev, agg_delta(changes, group_cols, sum_cols), group_cols, sum_cols
    )


# ---------------------------------------------------------------- MIN/MAX


def minmax_snapshot(
    df: DataFrame, group_cols: Sequence[str], minmax_cols: Sequence[str]
) -> DataFrame:
    """Reference batch aggregate the maintained MIN/MAX path must stay
    equal to: (group_cols..., n_rows, min_<c>..., max_<c>...)."""
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.min(F.col(c)).alias(f"min_{c}") for c in minmax_cols],
        *[F.max(F.col(c)).alias(f"max_{c}") for c in minmax_cols],
    )


def affected_groups(changes: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Distinct group keys touched by a both-images change stream. Both
    images contribute: a group-migrating update touches TWO groups (the
    one it left and the one it joined), a delete touches the old image's
    group, an insert the new image's."""
    imgs = changes.select(
        F.explode(
            F.array(
                F.when(
                    F.col("old").isNotNull(),
                    F.struct(*[_image_col(changes, "old", c).alias(c) for c in group_cols]),
                ),
                F.when(
                    F.col("new").isNotNull(),
                    F.struct(*[_image_col(changes, "new", c).alias(c) for c in group_cols]),
                ),
            )
        ).alias("_g")
    ).where(F.col("_g").isNotNull()).select("_g.*")
    return imgs.distinct()


def maintain_minmax(
    table,
    prev: DataFrame | None,
    from_version: int | None,
    to_version: int | None,
    group_cols: Sequence[str],
    minmax_cols: Sequence[str],
) -> DataFrame:
    """Maintain a MIN/MAX rollup over a :class:`SnapshotTable` by
    affected-group re-aggregation.

    MIN/MAX are not delta-foldable: deleting (or updating away) the
    current max leaves the group's new max unknowable from the change
    alone — you would need the runner-up, which no signed delta carries.
    So instead of the SUM path's pure fold, the groups TOUCHED by the
    change stream are re-aggregated from the live table at ``to_version``
    (left-semi join live⋉touched → one hash agg) and unioned with the
    untouched groups' prior state (prev anti-join touched). A touched
    group whose rows all vanished yields no re-agg row and thus drops out.

    Scale: cost is O(changed rows) to derive the touched-group set plus
    O(rows in affected groups) for the re-agg — never O(table). The
    touched set in a CDC batch is small relative to the table, so AQE
    size-checks it into a broadcast semi-join at runtime (deliberately no
    forced hint: a pathological batch touching every group degrades to a
    shuffle join instead of OOMing executors). When ``group_cols`` equals
    the table's bucket key, the semi-join additionally prunes at the scan
    via the same manifest bucketing ``read_keys`` uses."""
    if prev is None or from_version is None:
        return minmax_snapshot(table.read(version=to_version), group_cols, minmax_cols)
    changes = table.read_changes(from_version, to_version, include_old=True)
    touched = affected_groups(changes, group_cols)
    live = table.read(version=to_version)
    re_agg = minmax_snapshot(
        live.join(touched, on=list(group_cols), how="left_semi"),
        group_cols,
        minmax_cols,
    )
    kept = prev.join(touched, on=list(group_cols), how="left_anti")
    return kept.unionByName(re_agg)
