"""Property-based: random insert/update/delete batches on BOTH sides of a
fact⋈dim view; incremental maintenance must equal the batch re-join."""

from __future__ import annotations

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from arches_rascoll_etl_spark.lake.parquet_snapshot import SnapshotTable
from arches_rascoll_etl_spark.operators import incremental as INC

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from arches_rascoll_etl_spark.session import get_spark

        _spark = get_spark(app_name="prop-join", cores=4, shuffle_partitions=4)
        _spark.sparkContext.setLogLevel("ERROR")
    return _spark


fact_ev = st.fixed_dictionaries(
    {
        "fid": st.integers(min_value=1, max_value=8),
        "dkey": st.integers(min_value=1, max_value=5),  # 5 = dangling fk
        "amt": st.integers(min_value=0, max_value=99),
        "op": st.sampled_from(["U", "U", "U", "D"]),
    }
)
dim_ev = st.fixed_dictionaries(
    {
        "dkey": st.integers(min_value=1, max_value=4),
        "label": st.sampled_from(["x", "y", "z"]),
        "op": st.sampled_from(["U", "U", "D"]),
    }
)


def _last_wins(evs, key):
    seen = {}
    for e in evs:
        seen[e[key]] = e  # later entries overwrite: one event per key/batch
    return list(seen.values())


FACT_SCHEMA = "fid long, dkey long, amt long, commit_seq long, op string"
DIM_SCHEMA = "dkey long, label string, commit_seq long, op string"


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(fact_ev, min_size=1, max_size=12),
    st.lists(fact_ev, min_size=0, max_size=12),
    st.lists(dim_ev, min_size=1, max_size=8),
    st.lists(dim_ev, min_size=0, max_size=8),
)
def test_maintained_join_view_equals_batch_join(f0, f1, d0, d1):
    spark = _get_spark()
    tmp = tempfile.mkdtemp(prefix="prop_join_")
    try:
        ft = SnapshotTable(
            spark, tmp + "/f", key_cols=("fid",), order_cols=("commit_seq",),
            n_buckets=4,
        )
        dt = SnapshotTable(
            spark, tmp + "/d", key_cols=("dkey",), order_cols=("commit_seq",),
            n_buckets=4,
        )
        mk = lambda evs, seq, schema, key: spark.createDataFrame(
            [
                {**e, "commit_seq": seq}
                for e in _last_wins(evs, key)
            ],
            schema,
        )
        ft.merge(mk(f0, 1, FACT_SCHEMA, "fid"), batch_id="f0")
        dt.merge(mk(d0, 1, DIM_SCHEMA, "dkey"), batch_id="d0")
        view = INC.maintain_join(ft, dt, None, None, 0, None, 0, fk_cols=["dkey"])
        fv = dv = 0
        if f1:
            ft.merge(mk(f1, 2, FACT_SCHEMA, "fid"), batch_id="f1")
            fv = 1
        if d1:
            dt.merge(mk(d1, 2, DIM_SCHEMA, "dkey"), batch_id="d1")
            dv = 1
        view = INC.maintain_join(ft, dt, view, 0, fv, 0, dv, fk_cols=["dkey"])
        want = INC.join_snapshot(
            ft.read(version=fv), dt.read(version=dv), ["dkey"], ["dkey"]
        )
        cols = ["fid", "dkey", "amt", "label"]
        got = {tuple(r) for r in view.select(*cols).collect()}
        exp = {tuple(r) for r in want.select(*cols).collect()}
        assert got == exp, (sorted(got - exp)[:4], sorted(exp - got)[:4])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
