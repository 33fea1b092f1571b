"""Manifest-level file skipping (Iceberg data-file metrics analogue):
per-file [min, max] column stats recorded at commit from parquet footers,
read_range() pruning files from the manifest alone.

Soundness bar: read_range must equal read().where(between) row-for-row in
EVERY configuration — stats present, absent, carried by a stats-less
writer, or suspended by MOR deltas — because stats only decide which
files open; the predicate is always re-applied."""

from __future__ import annotations

from pyspark.sql import functions as F

from arches_rascoll_etl_spark.lake.parquet_snapshot import SnapshotTable


def _events(spark, lo, hi, seq, lang="py"):
    # key = f<value>, so distinct value bands are distinct key sets (each
    # test says explicitly when it wants overlapping keys instead)
    rows = [
        (f"r{v % 4}", f"f{v}", f"c{seq}-{v}", lang, f"content {v}", seq, "U", float(v))
        for v in range(lo, hi)
    ]
    return spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string, "
        "content string, commit_seq long, op string, size double",
    )


def _mk(spark, path, **kw):
    return SnapshotTable(spark, path, n_buckets=4, **kw)


def _expected(tbl, lo, hi):
    return {
        tuple(r)
        for r in tbl.read().where(F.col("size").between(lo, hi)).collect()
    }


def test_read_range_prunes_files_and_matches_full_scan(spark, tmp_table_dir):
    tbl = _mk(spark, tmp_table_dir, stats_cols=["size"])
    tbl.merge(_events(spark, 0, 40, seq=1), batch_id="b1")       # size 0..39
    # narrow merge: ONE key → one rewritten bucket; the other buckets keep
    # their v1 files whose stats top out at 39 — those must prune away
    tbl.merge(_events(spark, 1000, 1001, seq=2), batch_id="b2")
    m = tbl._load_manifest(tbl.current_version())
    all_files = [f for fl in m["files"].values() for f in fl]
    assert all(f in m.get("file_stats", {}) for f in all_files)
    got = tbl.read_range("size", 1000.0, 2000.0)
    assert {tuple(r) for r in got.collect()} == _expected(tbl, 1000.0, 2000.0)
    assert any(r.path == "f1000" for r in got.collect())
    # the proof of pruning: the range scan OPENED strictly fewer files
    opened = {p.split("/data/")[-1] for p in got.inputFiles()}
    full = {p.split("/data/")[-1] for p in tbl.read().inputFiles()}
    assert opened < full
    # every opened file's recorded range intersects the predicate
    stats = m["file_stats"]
    for f in opened:
        mn, mx = stats["data/" + f]["size"]
        assert mx >= 1000.0 and mn <= 2000.0


def test_read_range_without_stats_reads_everything_but_is_correct(spark, tmp_table_dir):
    tbl = _mk(spark, tmp_table_dir)  # no stats_cols
    tbl.merge(_events(spark, 0, 30, seq=1), batch_id="b1")
    got = tbl.read_range("size", 10.0, 15.0)
    assert {tuple(r) for r in got.collect()} == _expected(tbl, 10.0, 15.0)
    assert set(got.inputFiles()) == set(tbl.read().inputFiles())


def test_stats_survive_a_stats_less_writer(spark, tmp_table_dir):
    tbl = _mk(spark, tmp_table_dir, stats_cols=["size"])
    tbl.merge(_events(spark, 0, 40, seq=1), batch_id="b1")
    v1_stats = tbl._load_manifest(tbl.current_version())["file_stats"]
    assert v1_stats
    # a second writer opens the table without stats_cols and commits a
    # single-key (single-bucket) merge — the untouched buckets' files and
    # their stats must ride through the stats-less commit unchanged
    plain = _mk(spark, tmp_table_dir)
    plain.merge(_events(spark, 1000, 1001, seq=2), batch_id="b2")
    m2 = plain._load_manifest(plain.current_version())
    surviving = [
        f for fl in m2["files"].values() for f in fl if f in v1_stats
    ]
    assert surviving, "expected some v1 files to survive the narrow merge"
    for f in surviving:
        assert m2["file_stats"][f] == v1_stats[f]


def test_mor_deltas_suspend_pruning_not_correctness(spark, tmp_table_dir):
    tbl = _mk(spark, tmp_table_dir, stats_cols=["size"], merge_mode="mor")
    tbl.merge(_events(spark, 0, 40, seq=1), batch_id="b1")
    # delta moves one key INTO range and one OUT of range
    upd = spark.createDataFrame(
        [
            ("r0", "f0", "c2-0", "py", "content 0", 2, "U", 5000.0),   # 0 -> in range
            ("r1", "f1", "c2-1", "py", "content 1", 2, "U", 1.0),      # 1 -> out of range
        ],
        "repo string, path string, commit string, lang string, "
        "content string, commit_seq long, op string, size double",
    )
    tbl.merge(upd, batch_id="b2")
    got = {tuple(r) for r in tbl.read_range("size", 4000.0, 6000.0).collect()}
    assert got == _expected(tbl, 4000.0, 6000.0)
    assert any(r[1] == "f0" for r in got)
    assert not any(r[1] == "f1" for r in got)
    # compaction folds the deltas and restores manifest pruning
    tbl.compact()
    got2 = tbl.read_range("size", 4000.0, 6000.0)
    assert {tuple(r) for r in got2.collect()} == got
    assert set(got2.inputFiles()) < set(tbl.read().inputFiles())
