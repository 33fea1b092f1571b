"""Deterministic identity functions: JVM sha256 vs Python, uuid5 minting."""

from __future__ import annotations

import hashlib
import uuid

from pyspark.sql import functions as F

from arches_rascoll_etl_spark.functions.hashing import (
    ENGINE_NAMESPACE,
    content_key,
    deterministic_uuid,
    sha256_hex,
    sha256_udf,
)


def test_jvm_sha256_matches_python(spark):
    df = spark.createDataFrame([("hello",), ("",), ("naïve ünïcode ✓",)], "s string")
    rows = df.select("s", sha256_hex("s").alias("jvm"), sha256_udf("s").alias("py")).collect()
    for r in rows:
        expect = hashlib.sha256(r.s.encode("utf-8")).hexdigest()
        assert r.jvm == expect == r.py


def test_uuid5_deterministic_and_rfc4122(spark):
    df = spark.createDataFrame([("r1", "p1"), ("r1", "p2")], "repo string, path string")
    out = df.select("repo", "path", deterministic_uuid("repo", "path").alias("u")).collect()
    for r in out:
        assert r.u == str(uuid.uuid5(ENGINE_NAMESPACE, f"{r.repo}|{r.path}"))
        parsed = uuid.UUID(r.u)
        assert parsed.version == 5
    # stable across invocations
    again = df.select(deterministic_uuid("repo", "path").alias("u")).collect()
    assert [r.u for r in out] == [r.u for r in again]


def test_content_key_null_safe(spark):
    df = spark.createDataFrame([("a", None)], "x string, y string")
    r = df.select(content_key("x", "y").alias("k")).first()
    # concat_ws skips nulls -> key of just "a"
    assert r.k == hashlib.sha256(b"a").hexdigest()
