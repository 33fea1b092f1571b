"""spark-submit --py-files deployment smoke: the north-rule run shape.

Packages the engine as a zip and replays a small change log through
tools/submit_replay.sh in a separate spark-submit JVM, asserting the
replay result JSON. Slowest test in the suite (cold JVM) but it proves the
engine runs exactly as it would on a multi-executor cluster — code shipped
via --py-files, master taken from the submit conf."""

from __future__ import annotations

import json
import os
import subprocess
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def test_spark_submit_py_files_replay(spark, tmp_path):
    from arches_rascoll_etl_spark.synth import ChangeLogConfig, change_log

    events_dir = str(tmp_path / "events")
    cfg = ChangeLogConfig(n_events=2_000, n_repos=5, paths_per_repo=40, n_batches=2)
    change_log(spark, cfg).write.partitionBy("batch_id").parquet(events_dir)

    out = tmp_path / "result.json"
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    proc = subprocess.run(
        [
            str(ROOT / "tools" / "submit_replay.sh"),
            "--events", events_dir,
            "--workdir", str(tmp_path / "wh"),
            "--out", str(out),
            "--n-batches", "2",
            "--n-buckets", "8",
        ],
        cwd=str(ROOT),
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    res = json.loads(out.read_text())
    assert res["events"] == 2_000
    assert res["final_rows"] > 0
    assert res["snapshots"] == 2
    assert res["events_per_sec"] > 0
