"""Per-file key Bloom filters (lake/bloom.py): point-lookup file skipping.

The filter's contract: NEVER a false negative (a key present in a file
always survives pruning — results stay exact), false positives only cost
extra file opens. Tests pin (a) exactness of read_keys under bloom
pruning, (b) that pruning actually skips files a bloom-less table would
open (the point of the feature), (c) carry-forward across commits by a
bloom-less writer (skipping metadata must survive other writers, same
rule as file_stats), (d) build/probe hash parity on every inserted key."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from arches_rascoll_etl_spark.lake import bloom
from arches_rascoll_etl_spark.lake.parquet_snapshot import SnapshotTable
from arches_rascoll_etl_spark.synth import ChangeLogConfig, batch_events, change_log
from arches_rascoll_etl_spark import oracle

CFG = ChangeLogConfig(n_events=2_000, n_repos=6, paths_per_repo=60, n_batches=5)


def _mk(spark, path, **kw):
    return SnapshotTable(spark, path, n_buckets=4, **kw)


def _replay(tbl, spark, mode=None):
    for b in range(CFG.n_batches):
        tbl.merge(batch_events(spark, CFG, b), batch_id=f"b{b}",
                  **({"mode": mode} if mode else {}))


def _candidate_files(tbl, keys):
    """Files read_keys would open WITHOUT bloom pruning: all base+delta
    files of the keys' buckets."""
    m = tbl._load_manifest(tbl.current_version())
    kdf = tbl.spark.createDataFrame(list(keys), ["repo", "path"])
    wanted = {
        str(r[0])
        for r in kdf.select(tbl._bucket_col(kdf).alias("b")).distinct().collect()
    }
    deltas = tbl._delta_map(m)
    n = sum(len(fl) for b, fl in m["files"].items() if b in wanted)
    return n + sum(len(deltas.get(b, [])) for b in wanted)


def test_bloom_lookup_exact_and_prunes(spark, tmp_table_dir):
    """MOR replay with blooms on: every live key's lookup is exact, and the
    lookup of a key opens strictly fewer files than the bucket's full
    base+delta file list (file-level skipping is real)."""
    tbl = _mk(spark, os.path.join(tmp_table_dir, "b1"),
              merge_mode="mor", key_bloom_fpp=0.01)
    _replay(tbl, spark)
    events = [r.asDict() for r in change_log(spark, CFG).collect()]
    expected = oracle.final_rows(events)
    live = {(repo, path): (commit, lang, sha) for repo, path, commit, lang, sha in expected}

    some = sorted(live)[:5]
    got = tbl.read_keys(some).select(
        "repo", "path", "commit", "lang", F.sha2("content", 256)
    ).collect()
    assert {(r[0], r[1]): (r[2], r[3], r[4]) for r in got} == {k: live[k] for k in some}
    # pruning bite: a MOR table with 5 batches carries several files per
    # bucket; the bloom must have dropped at least one
    assert tbl._last_lookup_files_scanned < _candidate_files(tbl, some)

    # absent key: exact-empty, and (modulo 1% FPP across a handful of
    # files) everything pruned from the manifest alone
    assert tbl.read_keys([("no-such-repo", "no/such/path")]).count() == 0
    assert tbl._last_lookup_files_scanned <= 1


def test_bloom_no_false_negatives(spark, tmp_table_dir):
    """Probe EVERY key ever written against the blooms of the files that
    contain it — the build and probe hash paths must agree bit-for-bit."""
    tbl = _mk(spark, os.path.join(tmp_table_dir, "b2"), key_bloom_fpp=0.05)
    _replay(tbl, spark)
    m = tbl._load_manifest(tbl.current_version())
    # every data file of the current snapshot has a bloom (via sidecar)
    all_files = [f for fl in m["files"].values() for f in fl]
    blooms = tbl._blooms_for(m, all_files)
    assert set(all_files) <= set(blooms)
    for rel in all_files:
        df = spark.read.parquet(os.path.join(tbl.path, rel))
        keys = [(r["repo"], r["path"]) for r in df.select("repo", "path").distinct().collect()]
        hashes = bloom.probe_hashes(
            spark, keys, df.select("repo", "path").schema)
        for h in hashes:
            assert bloom.maybe_contains_any(blooms[rel], [h]), rel


def test_blooms_survive_bloomless_writer(spark, tmp_table_dir):
    """A second handle WITHOUT key_bloom_fpp merging into the table must
    carry forward existing blooms for surviving files (not strip them),
    and simply record none for its own new files."""
    path = os.path.join(tmp_table_dir, "b3")
    with_bloom = _mk(spark, path, key_bloom_fpp=0.01)
    with_bloom.merge(batch_events(spark, CFG, 0), batch_id="b0")
    m0 = with_bloom._load_manifest(with_bloom.current_version())
    v0_files = [f for fl in m0["files"].values() for f in fl]
    v0_blooms = with_bloom._blooms_for(m0, v0_files)
    assert v0_blooms

    plain = _mk(spark, path)  # no blooms on this handle
    # narrow batch (single key) so most buckets — and their blooms — survive
    one = batch_events(spark, CFG, 1).limit(1)
    plain.merge(one, batch_id="b1")
    m1 = plain._load_manifest(plain.current_version())
    surviving = {f for fl in m1["files"].values() for f in fl} & set(v0_blooms)
    assert surviving, "expected at least one untouched bucket's file to survive"
    got = plain._blooms_for(m1, sorted(surviving))
    for f in surviving:
        assert got[f] == v0_blooms[f]


def test_bloom_build_deterministic(spark, tmp_table_dir):
    """Same file ⇒ same filter bytes (bit-OR assembly is order-independent,
    hashes are JVM-deterministic): rebuild over the committed files and
    compare to what the manifest recorded."""
    tbl = _mk(spark, os.path.join(tmp_table_dir, "b4"), key_bloom_fpp=0.01)
    tbl.merge(batch_events(spark, CFG, 0), batch_id="b0")
    m = tbl._load_manifest(tbl.current_version())
    rels = {f: os.path.join(tbl.path, f) for fl in m["files"].values() for f in fl}
    rebuilt = bloom.build_file_blooms(spark, rels, ["repo", "path"], 0.01)
    assert rebuilt == tbl._blooms_for(m, sorted(rels))
    # manifest carries only string sidecar refs and round-trips raw JSON
    assert set(m["bloom_refs"]) == set(rels)
    assert all(isinstance(v, str) for v in m["bloom_refs"].values())
    json.dumps(m["bloom_refs"])


def test_bloom_sidecar_lifecycle(spark, tmp_table_dir):
    """Sidecar GC: (a) expire_snapshots deletes sidecars referenced only
    by expired manifests and keeps shared ones alive; (b) remove_orphans
    sweeps an unreferenced (CAS-losing) sidecar but never a live one;
    (c) a lookup after GC still answers exactly."""
    tbl = _mk(spark, os.path.join(tmp_table_dir, "b5"),
              merge_mode="mor", key_bloom_fpp=0.01)
    _replay(tbl, spark)
    man_dir = os.path.join(tbl.path, "manifests")
    n_sidecars = len([f for f in os.listdir(man_dir) if f.startswith("blooms-")])
    assert n_sidecars == CFG.n_batches  # one per non-empty commit

    # fabricate a CAS-loser's debris: a sidecar no manifest references
    orphan = os.path.join(man_dir, "blooms-deadbeefcafe.json")
    with open(orphan, "w") as f:
        json.dump({"data/x/p.parquet": {"m": 64, "k": 1, "fpp": 0.01, "b64": ""}}, f)
    os.utime(orphan, (1.0, 1.0))
    res = tbl.remove_orphans(older_than_s=0.0, force=True)
    assert res["bloom_sidecars"] == 1
    assert not os.path.exists(orphan)
    # live sidecars untouched
    assert len([f for f in os.listdir(man_dir) if f.startswith("blooms-")]) == n_sidecars

    res = tbl.expire_snapshots(keep_last=1)
    assert res["removed_snapshots"] == CFG.n_batches - 1
    # the newest manifest still references every base file's bloom, so
    # sidecars shared with retained snapshots survive; only truly
    # unreferenced ones went
    m = tbl._load_manifest(tbl.current_version())
    alive = {f for f in os.listdir(man_dir) if f.startswith("blooms-")}
    assert set(m["bloom_refs"].values()) <= alive

    # post-GC lookup is still exact (fresh handle: no warm caches)
    events = [r.asDict() for r in change_log(spark, CFG).collect()]
    expected = oracle.final_rows(events)
    live = {(repo, path): commit for repo, path, commit, lang, sha in expected}
    some = sorted(live)[:3]
    tbl2 = _mk(spark, tbl.path, merge_mode="mor", key_bloom_fpp=0.01)
    got = tbl2.read_keys(some).select("repo", "path", "commit").collect()
    assert {(r[0], r[1]): r[2] for r in got} == {k: live[k] for k in some}
