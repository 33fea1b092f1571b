"""Incremental materialized-view maintenance over the lake's CDC feed:
delta-folded rollups, affected-group MIN/MAX, and fact⋈dim join views.

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


# ------------------------------------------------------------- JOIN VIEWS


def join_snapshot(
    facts: DataFrame,
    dims: DataFrame,
    fk_cols: Sequence[str],
    dim_key_cols: Sequence[str],
) -> DataFrame:
    """Reference batch join the maintained view must stay equal to: inner
    equi-join of facts to dims on fact ``fk_cols`` == dim ``dim_key_cols``,
    keeping all fact columns plus the dim's non-key payload columns (a dim
    payload column whose name collides with a fact column comes back as
    ``dim_<name>``). Inner semantics: a fact whose dim row is absent (or
    deleted) is not in the view."""
    cond = None
    for fk, dk in zip(fk_cols, dim_key_cols):
        c = facts[fk] == dims[dk]
        cond = c if cond is None else cond & c
    payload = [c for c in dims.columns if c not in dim_key_cols]
    taken = set(facts.columns)
    return facts.join(dims, cond, "inner").select(
        *[facts[c] for c in facts.columns],
        *[dims[c].alias(c if c not in taken else f"dim_{c}") for c in payload],
    )


def _touched_keys(changes: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Distinct table keys present in a change stream. Keys are top-level
    in read_changes output (a key change is a delete+insert pair), so no
    image explode is needed — unlike affected_groups, which must consider
    both images of migrating payload columns."""
    return changes.select(*key_cols).distinct()


def maintain_join(
    fact_table,
    dim_table,
    prev: DataFrame | None,
    fact_from: int | None,
    fact_to: int | None,
    dim_from: int | None,
    dim_to: int | None,
    fk_cols: Sequence[str],
) -> DataFrame:
    """Maintain a materialized fact⋈dim inner-join view across snapshot
    moves of BOTH sides, reading only the two change streams plus the
    affected rows — never re-joining the full tables.

    ``prev`` is the view as of ``(fact_from, dim_from)``; the result is the
    view as of ``(fact_to, dim_to)``, equal to ``join_snapshot`` over the
    live tables at those versions. ``fk_cols`` are the fact-side foreign-key
    columns aligned positionally with ``dim_table.key_cols``.

    Algebra (KF = fact keys touched by the fact change stream, KD = dim
    keys touched by the dim change stream):

    * kept   = prev  ⊳ KF (on fact keys)  ⊳ KD (on fk cols) — rows whose
      fact AND dim are both untouched are carried verbatim;
    * aff    = live-facts ⋉ KF  ∪  (live-facts ⋉ KD on fk) ⊳ KF — every
      fact row whose own key changed, plus unchanged facts referencing a
      changed dim;
    * result = kept ∪ (aff ⋈ live-dims).

    Deletes fall out structurally: a deleted fact is in KF but not in the
    live table (nothing re-joins); a deleted dim's facts re-join against a
    live-dim side that no longer has the row (inner join drops them).
    A foreign-key-migrating fact update is in KF, so its prev row is
    retracted and the new fk joins fresh.

    Scale: cost is O(|changes|) to build KF/KD, one pass over ``prev`` for
    the anti-joins (AQE size-checks the small key sets into broadcast
    joins — deliberately no forced hint, a full-table batch degrades to
    shuffle instead of OOMing), bucket-diffed change reads on both lakes,
    and a join of only the affected facts against the dim table. The
    affected-side dim join is the one place a hot dim key concentrates;
    it inherits the same AQE skew-split the batch join would use."""
    live_facts = fact_table.read(version=fact_to)
    live_dims = dim_table.read(version=dim_to)
    fk_cols = list(fk_cols)
    fkeys = list(fact_table.key_cols)
    dkeys = list(dim_table.key_cols)
    if prev is None or fact_from is None or dim_from is None:
        return join_snapshot(live_facts, live_dims, fk_cols, dkeys)

    kf = _touched_keys(
        fact_table.read_changes(fact_from, fact_to, include_old=True), fkeys
    )
    kd = _touched_keys(
        dim_table.read_changes(dim_from, dim_to, include_old=True), dkeys
    )
    kd_as_fk = kd.select(
        *[F.col(dk).alias(fk) for fk, dk in zip(fk_cols, dkeys)]
    )

    kept = (
        prev.join(kf, on=fkeys, how="left_anti")
        .join(kd_as_fk, on=fk_cols, how="left_anti")
        .select(*prev.columns)  # USING-joins reorder; keep the view schema
    )
    # affected facts in ONE pass over the live table: membership flags via
    # two (broadcast) left joins against the distinct key sets, then one
    # filter — not two semi-join scans unioned
    aff = (
        live_facts.join(
            kf.withColumn("_in_kf", F.lit(True)), on=fkeys, how="left"
        )
        .join(
            kd_as_fk.withColumn("_in_kd", F.lit(True)), on=fk_cols, how="left"
        )
        .where(F.col("_in_kf").isNotNull() | F.col("_in_kd").isNotNull())
        .select(*live_facts.columns)
    )
    return kept.unionByName(join_snapshot(aff, live_dims, fk_cols, dkeys))
