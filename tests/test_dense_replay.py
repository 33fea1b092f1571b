"""CPU-roofline replay knob (replay_bench --sha-rounds).

The scaling experiment's validity rests on two properties of chained_sha:
exactness (it is the documented sha256 fold, checked against hashlib) and
shuffle-invariance (output width does not depend on rounds). Walls are NOT
asserted — wall-clock scaling is measured by the grant-bracketed harness
(tools/hunt_standalone.py), never by pytest on a noisy host.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from arches_rascoll_etl_spark.replay_bench import chained_sha


def _expect(content: str, rounds: int) -> str:
    if rounds <= 1:
        return hashlib.sha256(content.encode()).hexdigest()
    depth = min(rounds, 8)
    base, rem = divmod(rounds, depth)

    def blob(i: int) -> str:
        return content * (base + (1 if i < rem else 0))

    h = hashlib.sha256(blob(0).encode()).hexdigest()
    for i in range(1, depth):
        h = hashlib.sha256((h + blob(i)).encode()).hexdigest()
    return h


def test_chained_sha_matches_hashlib_fold(spark):
    rows = [("def f():\n    return 1\n",), ("",), ("x" * 500,)]
    df = spark.createDataFrame(rows, ["content"])
    out = df.select(
        "content",
        chained_sha(F.col("content"), 1).alias("r1"),
        chained_sha(F.col("content"), 4).alias("r4"),
        # depth-capped path: 100 content-multiples over an 8-deep fold —
        # a 100-deep nest overflowed the Catalyst analyzer stack
        chained_sha(F.col("content"), 100).alias("r100"),
    ).collect()
    for row in out:
        assert row.r1 == _expect(row.content, 1)
        assert row.r4 == _expect(row.content, 4)
        assert row.r100 == _expect(row.content, 100)
        # round-invariant width: one 64-char hex column at any rounds
        assert len(row.r1) == len(row.r4) == len(row.r100) == 64


def test_history_filter_splits_dense_and_standard():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from standalone_cluster import valid_from_history

    std = valid_from_history()
    dense = valid_from_history(dense=True)
    both = valid_from_history(dense=None)
    assert len(both) == len(std) + len(dense)
    assert all(w.get("sha_rounds", 1) == 1 for w in std)
    assert all(w.get("sha_rounds", 1) > 1 for w in dense)
