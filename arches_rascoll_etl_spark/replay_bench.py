"""CDC replay throughput bench — one parallelism level per process.

Replays a pre-generated change-log parquet (partitioned by batch_id) into a
fresh SnapshotTable and reports events/sec. Run at two parallelism levels
(local[N] vs local[4N]) on the *same input files* to evidence the
north-rule scaling criterion (sandbox stand-in for N vs 4N executors).

Usage: python -m arches_rascoll_etl_spark.replay_bench \
         --cores 8 --events /path/events_parquet --workdir /tmp/x --out r.json
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time


def chained_sha(content_col, rounds: int):
    """sha256 fold hashing ``rounds`` content-multiples in total: round 0
    hashes repeat(content, n0), each later round hashes
    (prev_hex_digest || repeat(content, n_i)), with the n_i summing to
    ``rounds``. CPU grows linearly in ``rounds`` while the output stays one
    64-char hex column, so downstream shuffle bytes are round-invariant —
    the property the CPU-roofline scaling experiment depends on.

    The fold depth is capped at 8 and the byte volume carried by
    ``repeat`` instead: a rounds-deep sha2(concat(...)) nest overflows the
    Catalyst analyzer's stack around depth ~100 (measured in this sandbox;
    tree-recursive analysis), and even below that would stop fitting
    whole-stage codegen's method-size budget. Depth 8 × repeat keeps the
    expression tree tiny at any rounds."""
    from pyspark.sql import functions as F

    if rounds <= 1:
        return F.sha2(content_col, 256)
    depth = min(rounds, 8)
    base, rem = divmod(rounds, depth)

    def blob(i: int):
        n = base + (1 if i < rem else 0)
        return F.repeat(content_col, n) if n != 1 else content_col

    sha = F.sha2(blob(0), 256)
    for i in range(1, depth):
        sha = F.sha2(F.concat(sha, blob(i)), 256)
    return sha


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--events", required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-batches", type=int, default=4)
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument(
        "--sha-rounds", type=int, default=1,
        help="chained sha256 rounds over content in the normalize stage. "
             "1 = the production plan. >1 raises the map stage's arithmetic "
             "intensity WITHOUT changing a single shuffled byte (the fold "
             "stays one 64-char column), moving the job's roofline from "
             "DRAM bandwidth to CPU — the scaling-ceiling experiment: on "
             "this one box DRAM does not multiply with cores, but on a real "
             "N->4N cluster both do, so efficiency vs the CPU ceiling at "
             "high rounds bounds what the PLAN (not the box) allows.")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from .lake.parquet_snapshot import SnapshotTable
    from .session import get_spark
    from .streaming.checkpoint import Checkpoint
    from .streaming.pipeline import replay

    spark = get_spark(
        app_name=f"replay-bench-{args.cores}",
        cores=args.cores,
        shuffle_partitions=max(args.cores * 2, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")

    events = spark.read.parquet(args.events)
    n_events = events.count()

    shutil.rmtree(args.workdir, ignore_errors=True)
    tbl = SnapshotTable(spark, os.path.join(args.workdir, "tbl"), n_buckets=args.n_buckets)
    ckpt = Checkpoint(os.path.join(args.workdir, "ckpt.json"))

    def provider(b: int):
        # partition pruning on batch_id=<b> subdirectory
        df = events.where(F.col("batch_id") == b)
        # normalize stage: content sha + deterministic row id (vectorized);
        # sha_rounds>1 = CPU-roofline experiment (see chained_sha)
        return df.withColumn(
            "content_sha", chained_sha(F.col("content"), args.sha_rounds)
        ).withColumn(
            "row_key", F.sha2(F.concat_ws("|", "repo", "path"), 256)
        )

    # Steady-state warm-up, untimed: run a full (tiny) merge for BOTH plan
    # shapes — pre- and post-schema-evolution — into a throwaway table.
    # A continuously-running ingest compiles each plan shape ONCE per
    # schema change, not once per batch; 10^10-event steady-state
    # throughput therefore excludes whole-stage-codegen compilation, the
    # parquet writer's first-use init, and the first Py4J plan round-trip,
    # exactly as the headline queries are warmed before timing. 512 rows
    # spread over all buckets exercises the wide-batch path (exchange ==
    # bucket layout) the real batches take.
    warm = SnapshotTable(
        spark, os.path.join(args.workdir, "warm_tbl"), n_buckets=args.n_buckets
    )
    for b in (0, args.n_batches - 1):
        warm.merge(provider(b).limit(512), batch_id=f"warm-{b}")
    shutil.rmtree(os.path.join(args.workdir, "warm_tbl"), ignore_errors=True)

    t0 = time.time()
    res = replay(tbl, ckpt, provider, range(args.n_batches), collect_partition_lineage=False)
    wall = time.time() - t0

    out = {
        "cores": args.cores,
        "events": n_events,
        "sha_rounds": args.sha_rounds,
        "batches": args.n_batches,
        "wall_sec": round(wall, 3),
        "events_per_sec": round(n_events / wall, 1),
        "final_rows": tbl.read().count(),
        "snapshots": len(tbl.snapshots()),
        # per-batch phase profile (stats job / fused apply / manifest
        # commit) — pins which phase stops scaling with cores
        "batch_phase_ms": [s.phase_ms for s in res.stats],
    }
    with open(args.out, "w") as f:
        json.dump(out, f)
    spark.stop()


if __name__ == "__main__":
    main()
