"""Exact one-pass column profiling.

A 100-TB ingest pipeline's first question about a new table is always the
same: how many rows, which columns are null-riddled, what are the
cardinalities and value ranges. The reference answers it ad hoc with
pandas ``describe``-style row loops over loaded frames (e.g. the mapping
sanity checks around arches_rascoll_etl/ref_collection.py's per-field
validation); here it is ONE distributed aggregation.

Scale shape: a single ``df.agg`` carrying every column's aggregates — one
scan, map-side partial aggregation, one 1-row exchange. The only wide cost
is exact ``count_distinct`` over multiple columns, which Catalyst plans
with an Expand (the input is replicated once per distinct aggregate before
the partial agg). ``exact=False`` swaps in ``approx_count_distinct``
(HyperLogLog++), collapsing the Expand — the right default at 100 TB when
±2 % cardinality error is acceptable, but not oracle-exact, so the checked
query keeps ``exact=True``.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    cols: Iterable[str] | None = None,
    exact: bool = True,
) -> DataFrame:
    """Per-column profile: (col_name, n_rows, n_nulls, n_distinct,
    min_value, max_value), one output row per profiled column.

    ``n_distinct`` counts non-null values (SQL COUNT(DISTINCT) semantics);
    min/max are cast to string so heterogeneous columns share one schema —
    profile numeric/string columns, not floats or timestamps, when the
    string rendering must match another engine byte-for-byte. With
    ``exact=False`` cardinalities come from HyperLogLog++ (approximate,
    no Expand in the plan — the 100-TB default)."""
    names = list(cols) if cols is not None else list(df.columns)
    if not names:
        raise ValueError("profile_table needs at least one column")
    nd = (
        (lambda c: F.countDistinct(F.col(c)))
        if exact
        else (lambda c: F.approx_count_distinct(F.col(c)))
    )
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(names):
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_nn_{i}"),
            nd(c).alias(f"_nd_{i}"),
            F.min(F.col(c)).cast("string").alias(f"_mn_{i}"),
            F.max(F.col(c)).cast("string").alias(f"_mx_{i}"),
        ]
    row = df.agg(*aggs)
    # unpivot the 1-row wide frame with stack: trivially cheap (1 row),
    # keeps the whole profile a single job
    parts = ", ".join(
        f"'{c}', _nn_{i}, _nd_{i}, _mn_{i}, _mx_{i}" for i, c in enumerate(names)
    )
    return row.select(
        F.col("_n").alias("n_rows"),
        F.expr(
            f"stack({len(names)}, {parts}) AS "
            "(col_name, n_nulls, n_distinct, min_value, max_value)"
        ),
    ).select("col_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value")


def skew_report(
    df: DataFrame,
    key_cols: Iterable[str],
    top_n: int = 20,
) -> DataFrame:
    """Heavy-hitter key report: the ``top_n`` hottest key tuples with
    absolute counts and share of all rows — the measurement that decides
    whether a merge/join key needs salting (operators/lww.py
    lww_latest_salted) or AQE skew-split, BEFORE a hot key turns one task
    into the straggler that holds a 1000-executor stage hostage.

    Scale shape: one hash aggregation on the keys (map-side combined — a
    hot key partially collapses on every input partition before the
    shuffle, so the report itself never suffers the skew it measures),
    then a per-partition top-n + driver merge (``TakeOrderedAndProject``,
    never a global sort) against a 1-row total broadcast. The denominator
    is summed from the per-key counts frame — the INPUT is read exactly
    once; only the tiny counts relation is read twice. Output order is
    (n_rows DESC, keys ASC) — a total order, so the cut is deterministic
    on every engine."""
    keys = list(key_cols)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("_total"))
    top = counts.orderBy(
        F.col("n_rows").desc(), *[F.col(k).asc() for k in keys]
    ).limit(top_n)
    return top.crossJoin(F.broadcast(total)).select(
        *keys,
        "n_rows",
        (F.col("n_rows") / F.col("_total")).alias("share"),
    )
