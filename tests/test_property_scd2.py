"""Property-based: random ordered change logs cut into batches; the
incrementally-maintained SCD2 lake table must equal the full-log recompute."""

from __future__ import annotations

import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from arches_rascoll_etl_spark.lake.parquet_snapshot import SnapshotTable
from arches_rascoll_etl_spark.operators.scd import maintain_scd2, scd2_history

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from arches_rascoll_etl_spark.session import get_spark

        _spark = get_spark(app_name="prop-scd2", cores=4, shuffle_partitions=4)
        _spark.sparkContext.setLogLevel("ERROR")
    return _spark


ev = st.fixed_dictionaries(
    {
        "k": st.sampled_from(["a", "b", "c"]),
        "v": st.sampled_from(["p", "q", "r"]),
        "op": st.sampled_from(["U", "U", "U", "D"]),
    }
)

SCHEMA = "k string, v string, commit_seq long, op string"


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(ev, min_size=1, max_size=24),
    st.integers(min_value=1, max_value=23),  # cut point (clamped below)
)
def test_incremental_scd2_equals_recompute(events, cut):
    spark = _get_spark()
    log = [{**e, "commit_seq": i} for i, e in enumerate(events)]
    cut = min(cut, len(log))
    batches = [log[:cut], log[cut:]]
    tmp = tempfile.mkdtemp(prefix="prop_scd2_")
    try:
        hist = SnapshotTable(
            spark, tmp + "/h", key_cols=("k", "valid_from_seq"),
            order_cols=("_scd_seq",), n_buckets=2,
        )
        for b, batch in enumerate(batches):
            if not batch:
                continue
            maintain_scd2(
                hist, spark.createDataFrame(batch, SCHEMA),
                ("k",), "commit_seq", batch_seq=b, batch_id=f"b{b}",
            )
        full = scd2_history(spark.createDataFrame(log, SCHEMA), ("k",), "commit_seq")
        cols = sorted(full.columns)
        got = {tuple(r) for r in hist.read().select(*cols).collect()}
        exp = {tuple(r) for r in full.select(*cols).collect()}
        assert got == exp, (sorted(got - exp)[:4], sorted(exp - got)[:4])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
