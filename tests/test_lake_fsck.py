"""fsck: report-only integrity audit of manifests vs the filesystem."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from arches_rascoll_etl_spark.lake.parquet_snapshot import SnapshotTable


def _mk(spark, path):
    t = SnapshotTable(
        spark, path, key_cols=("k",), order_cols=("s",), n_buckets=4,
        stats_cols=("a",), key_bloom_fpp=0.01,
    )
    for b in range(2):
        t.merge(
            spark.range(200).select(
                F.col("id").alias("k"), (F.col("id") * (b + 1)).alias("a"),
                F.lit(b).alias("s"), F.lit("U").alias("op"),
            ),
            batch_id=f"b{b}",
        )
    return t


def test_fsck_clean_table_is_ok(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    rep = t.fsck(deep=True)
    assert rep["ok"], rep
    assert rep["checked_manifests"] == 2 and rep["checked_files"] > 0
    assert rep["unreadable_files"] == []


def test_fsck_detects_missing_and_corrupt_files(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    m = json.load(open(os.path.join(t.path, "manifests", "v000001.json")))
    files = sorted(f for fl in m["files"].values() for f in fl)
    os.remove(os.path.join(t.path, files[0]))          # vanished file
    with open(os.path.join(t.path, files[1]), "r+b") as fh:  # corrupt footer
        fh.seek(-4, os.SEEK_END)
        fh.write(b"XXXX")
    rep = t.fsck(deep=True)
    assert not rep["ok"]
    assert any(e["file"] == files[0] for e in rep["missing_files"])
    assert any(e["file"] == files[1] for e in rep["unreadable_files"])


def test_fsck_detects_broken_parent_chain(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    mp = os.path.join(t.path, "manifests", "v000001.json")
    m = json.load(open(mp))
    m["parent_version"] = 7
    json.dump(m, open(mp, "w"))
    rep = t.fsck()
    assert not rep["ok"]
    assert rep["broken_parents"] == [{"version": 1, "parent": 7}]
