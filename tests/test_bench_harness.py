"""Bench-harness unit tests (no Spark): grant-probe drift math and pair
validity rules.

The scaling evidence is only as honest as the harness that gates it;
round 2/3 postmortems showed two failure modes worth pinning with tests:
a sha-only probe blind to the host's fresh-page-write degradation, and a
sanity band that accepted a 0.25x "speedup" pair as valid.
"""

from __future__ import annotations

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def test_probe_drift_takes_worst_axis():
    from bench import _probe_drift

    # sha stable, memtouch collapsed 100x between probes -> drift must
    # reflect the collapsed axis, not average it away
    p0 = {"sha": 100_000.0, "memtouch": 4e9}
    p1 = {"sha": 101_000.0, "memtouch": 4e7}
    assert _probe_drift([p0, p1]) > 50
    # both axes stable -> drift ~1
    assert _probe_drift([p0, {"sha": 99_000.0, "memtouch": 3.9e9}]) < 1.1
    # single probe or missing components -> no spurious drift
    assert _probe_drift([p0]) == 1.0
    assert _probe_drift([{"sha": 1.0}, {"sha": 1.0}]) == 1.0


def test_burn_touch_measures_fresh_pages():
    from bench import _burn_touch

    touched = _burn_touch(0.2)
    assert touched > 0
    assert touched % 4096 == 0


def test_pair_validity_band_rejects_sub_unity():
    """The validity predicate used by run_cdc_scaling / standalone pairs:
    speedup <= 1 on 4x cores is never valid evidence (r2 recorded a 0.25x
    'valid' pair under the old band)."""
    ratio = 4.0

    def sane(speedup: float) -> bool:
        return 1.0 < speedup < ratio * 1.1

    assert not sane(0.25)
    assert not sane(0.95)
    assert not sane(1.0)
    assert sane(1.5)
    assert sane(3.9)
    assert not sane(4.5)  # physically impossible on 4x cores


def test_compact_final_line_is_small_and_complete():
    """r2/r3 postmortem: the driver parses only a bounded TAIL of stdout;
    the final cumulative JSON line overflowed it two rounds running
    (`parsed: null`). The compact line must carry the graded fields and
    stay far under any plausible tail buffer even with bulky phase results
    attached."""
    import json

    from bench import _compact_final

    full = {
        "metric": "headline_total_plus_cdc_scaling",
        "value": 12.345,
        "unit": "sec",
        "queries": {f"q{i:02d}_name_{i}": round(0.1 * i, 3) for i in range(1, 14)},
        "sf": "0.1",
        "partial": False,
        "grant_probe_vs_median": 1.01,
        "headline_grant_probe_vs_median": 0.97,
        "cdc_scaling": {
            "events": 8_000_000, "cores_lo": 4, "cores_hi": 16,
            "lo_events_per_sec": 140_000.0, "hi_events_per_sec": 420_000.0,
            "speedup_lo_to_hi": 3.0, "scaling_efficiency_raw": 0.75,
            "valid_pairs": 3, "window_valid": True,
            "runs": [{"cores": 4, "wall_sec": 50.0}] * 40,     # bulky
            "pairs": [{"speedup": 3.0}] * 20,                   # bulky
            "best": {"history": list(range(500))},              # bulky
        },
        "standalone_scaling": {
            "cores_per_worker": 4, "executors_lo": 1, "executors_hi": 4,
            "events": 2_000_000, "lo_events_per_sec": 90_000.0,
            "hi_events_per_sec": 260_000.0, "speedup_lo_to_hi": 2.9,
            "scaling_efficiency_raw": 0.727, "grant_drift": 1.1, "valid": True,
            "runs": [{"w": 1}] * 50,                            # bulky
        },
        "bucket_scaling": {"n_buckets": 512, "narrow_over_wide_wall": 0.1,
                           "raw": list(range(300))},            # bulky
    }
    line = json.dumps(_compact_final(full))
    assert len(line) < 2048, len(line)
    back = json.loads(line)
    assert back["value"] == 12.345 and len(back["queries"]) == 13
    assert back["cdc_scaling"]["speedup_lo_to_hi"] == 3.0
    assert "runs" not in back["cdc_scaling"] and "pairs" not in back["cdc_scaling"]
    assert back["standalone_scaling"]["scaling_efficiency_raw"] == 0.727
    assert "runs" not in back["standalone_scaling"]
    assert back["headline_grant_probe_vs_median"] == 0.97


def test_median_interpolates_even_counts():
    from bench import _median

    assert _median([1.0]) == 1.0
    assert _median([1.0, 2.0]) == 1.5
    assert _median([0.35, 0.47, 0.82, 1.0]) == 0.645  # upper-middle bug case
    assert _median([3.0, 1.0, 2.0]) == 2.0
    import math
    assert math.isnan(_median([]))


def test_cpu_account_measures_a_burn():
    """CpuAccount reads VM-scoped /proc/stat deltas: a ~1-core burn for
    ~0.6 s must account ≈0.6 busy cpu-sec (box-idle assumption bounds the
    upper side loosely — CI noise tolerated)."""
    import time

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    from standalone_cluster import CpuAccount

    with CpuAccount() as acct:
        t0 = time.perf_counter()
        x = 0
        while time.perf_counter() - t0 < 0.6:
            x += 1
    assert 0.3 <= acct.busy_cpu_sec <= 8.0
    assert acct.wall >= 0.6


def test_modal_config_selects_by_count_not_score():
    """The headline cohort narrows to the most-populous (rounds, events)
    config — outcome-blind: a minority config with better scores must not
    be chosen, and its windows must be excluded from the returned pool."""
    from bench import _modal_config

    main = [{"sha_rounds": 4000, "events": 150000, "eff_vs_cpu_ceiling": e}
            for e in (0.7, 0.75, 0.8)]
    shiny_minority = [{"sha_rounds": 8000, "events": 75000,
                       "eff_vs_cpu_ceiling": 0.99}]
    pool = _modal_config(main + shiny_minority)
    assert len(pool) == 3
    assert all(w["sha_rounds"] == 4000 for w in pool)
    assert _modal_config([]) == []


def test_sweep_patterns_spare_local_pyspark_jvms():
    """The stale-cluster sweep must never match a LOCAL pyspark session's
    JVM command line (pytest / oracle self-checks) — only standalone-master
    cluster processes. pgrep -f is a substring match, so substring checks
    here mirror exactly what the sweep kills."""
    sys.path.insert(0, str(ROOT / "tools"))
    from standalone_cluster import _SWEEP_PATTERNS

    local_pyspark = (
        "/usr/lib/jvm/java-17/bin/java -cp /opt/spark/jars/* "
        "org.apache.spark.deploy.SparkSubmit --conf spark.master=local[8] pyspark-shell"
    )
    cluster_submit = (
        "java -cp /opt/spark/jars/* org.apache.spark.deploy.SparkSubmit "
        "--master spark://127.0.0.1:58213 --conf spark.cores.max=2 "
        "tools/replay_submit_main.py --cores 2"
    )
    master = "java org.apache.spark.deploy.master.Master --host 127.0.0.1"
    assert not any(p in local_pyspark for p in _SWEEP_PATTERNS)
    assert any(p in cluster_submit for p in _SWEEP_PATTERNS)
    assert any(p in master for p in _SWEEP_PATTERNS)
