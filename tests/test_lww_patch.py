"""Column-level patch LWW vs a pure-Python oracle, incl. delete fencing."""

import random

from pyspark.sql import functions as F

from arches_rascoll_etl_spark.operators.lww import lww_patch


def _oracle(events):
    """events: list of (key, ord, op, a, b) — replay in order."""
    state: dict = {}
    for key, o, op, a, b in sorted(events, key=lambda e: e[1]):
        if op == "D":
            state.pop(key, None)
            continue
        row = state.setdefault(key, {"a": None, "b": None})
        if a is not None:
            row["a"] = a
        if b is not None:
            row["b"] = b
    return {k: (v["a"], v["b"]) for k, v in state.items()}


def test_lww_patch_matches_replay_oracle(spark):
    rng = random.Random(7)
    events = []
    for o in range(3000):
        key = rng.randrange(40)
        op = rng.choice(["I", "U", "U", "U", "D"])
        a = rng.choice([None, f"a{rng.randrange(5)}"])
        b = rng.choice([None, rng.randrange(100)])
        events.append((key, o, op, a, b))
    df = spark.createDataFrame(
        events, "key long, ord long, op string, a string, b long"
    )
    got = {
        r["key"]: (r["a"], r["b"])
        for r in lww_patch(df, ["key"], ["ord"], ["a", "b"]).collect()
    }
    assert got == _oracle(events)


def test_lww_patch_delete_fences_older_sets(spark):
    # set a=x at ord 1, delete at ord 2, upsert (a NULL) at ord 3:
    # the row exists but a must NOT resurrect to x
    df = spark.createDataFrame(
        [(1, 1, "I", "x"), (1, 2, "D", None), (1, 3, "U", None)],
        "key long, ord long, op string, a string",
    )
    rows = lww_patch(df, ["key"], ["ord"], ["a"]).collect()
    assert len(rows) == 1 and rows[0]["a"] is None


def test_lww_patch_single_aggregation_plan(spark):
    df = spark.createDataFrame(
        [(1, 1, "I", "x")], "key long, ord long, op string, a string"
    )
    plan = lww_patch(df, ["key"], ["ord"], ["a"])._jdf.queryExecution().executedPlan().toString()
    # one shuffle, map-side partial aggregation present
    assert plan.count("Exchange") == 1
    assert "partial_max" in plan
