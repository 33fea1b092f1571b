"""Standalone-cluster deployment smoke: master + worker in separate JVMs,
engine shipped via spark-submit --py-files, replay result asserted.

Complements tests/test_submit.py (local[k] submit): here the executor is a
REAL separate JVM registered with a standalone master — the closest this
sandbox gets to the north rule's multi-executor cluster. One worker only,
to bound suite wall time; the 1-vs-4-worker scaling pair runs in bench.py
(tools/standalone_cluster.py `run_standalone_scaling`)."""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT / "tools"))


def test_standalone_cluster_replay(spark, tmp_path):
    from standalone_cluster import StandaloneCluster, _zip_engine

    from arches_rascoll_etl_spark.synth import ChangeLogConfig, change_log

    events_dir = str(tmp_path / "events")
    cfg = ChangeLogConfig(n_events=2_000, n_repos=5, paths_per_repo=40, n_batches=2)
    change_log(spark, cfg).write.partitionBy("batch_id").parquet(events_dir)

    zip_path = _zip_engine()
    out = str(tmp_path / "result.json")
    try:
        with StandaloneCluster(1, 2, str(tmp_path / "cluster")) as c:
            res = c.submit_replay(
                zip_path, events_dir, str(tmp_path / "tbl"), out,
                total_cores=2, timeout_s=420,
            )
    finally:
        os.unlink(zip_path)

    assert res["events"] == 2_000
    assert res["final_rows"] > 0
    assert res["events_per_sec"] > 0
    # the run really went through the standalone master: an executor was
    # launched by the worker JVM (its work-dir holds the app's stderr)
    workdirs = list((tmp_path / "cluster" / "worker0").rglob("stderr"))
    assert workdirs, "no executor launched under the worker's work-dir"
    assert json.load(open(out))["events"] == 2_000


def test_strict_window_tier_classification():
    """Strict tier is host-telemetry-only: live-grant agreement + low steal;
    missing telemetry (pre-monitor rows) can never strict-qualify."""
    from standalone_cluster import is_strict

    base = {
        "valid": True, "cores_per_worker": 2,
        "executors_lo": 1, "executors_hi": 4,
        "live_grant_drift": 1.02,
        "steal_cores_lo": 0.05, "steal_cores_hi": 0.1,
    }
    assert is_strict(base)
    # hypervisor preempted the hi level: steal over 5% of its 8 cores
    assert not is_strict({**base, "steal_cores_hi": 0.88})
    # grant moved between the levels
    assert not is_strict({**base, "live_grant_drift": 1.11})
    # loose-invalid can never be strict
    assert not is_strict({**base, "valid": False})
    # rows recorded before the live monitor / CPU account landed
    assert not is_strict({**base, "live_grant_drift": None})
    assert not is_strict({k: v for k, v in base.items()
                          if k != "steal_cores_hi"})
