"""Opportunistic hunter for VALID standalone-cluster scaling windows.

Same burst-dodging loop as tools/hunt_scaling.py, but each attempt is a
real 1-executor vs 4-executor standalone pair (tools/standalone_cluster.py)
instead of a local[k] pair. ``--sha-rounds > 1`` hunts CPU-roofline windows
(compute-dense map stage, identical shuffle bytes) whose efficiency is
judged against the same-window CPU ceiling — the plan-attributable scaling
number the north rule wants when the box's DRAM cannot multiply with cores.

Every completed pair (valid or not) is appended to
BENCH/standalone_history.jsonl by append_history, so bench.py's next report
surfaces the windows even if its own phase hits a burst.

Usage:
    python tools/hunt_standalone.py [--events N] [--sha-rounds R]
        [--target-valid 2] [--deadline-min 90] [--memtouch-floor 1e9]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    # default matches the MAIN scaling cohort (150k events / fold / 4000
    # rounds / 2 cores-per-worker): a bare launch contributes to the cohort
    # the report reads. 8M events at 4000 fold rounds CANNOT finish inside
    # the 900 s replay timeout on the 2-core side — a mis-launch burns the
    # whole deadline producing nothing (observed 2026-08-19: 4×
    # "lo: TimeoutExpired", zero windows).
    ap.add_argument("--events", type=int, default=150_000)
    ap.add_argument("--sha-rounds", type=int, default=4000)
    ap.add_argument("--sha-mode", choices=("repeat", "fold"), default="fold")
    ap.add_argument("--target-valid", type=int, default=1)
    ap.add_argument("--deadline-min", type=float, default=90.0)
    ap.add_argument("--cores-per-worker", type=int, default=2)
    ap.add_argument("--memtouch-floor", type=float, default=1e9)
    # pre-attempt grant floor vs the historical probe median (worst axis):
    # sub-0.8 cohort windows passed the bare memtouch floor, so gate harder
    # before committing ~6 min of box time to a pair
    ap.add_argument("--rel-floor", type=float, default=0.85)
    # mid-pair health gate budget (see run_standalone_scaling docstring):
    # the dominant spoiler is theft arriving at hi launch, ~150 s after the
    # pre-attempt probe
    ap.add_argument("--midpair-gate-s", type=float, default=240.0)
    ap.add_argument("--log", default=os.path.join(ROOT, "BENCH", "hunt_log.jsonl"))
    args = ap.parse_args()

    from bench import _grant_probe, _grant_rel, _history_medians, gen_cdc_input
    from standalone_cluster import append_history, run_standalone_scaling

    work = os.environ.get("SPARK_GRAFT_HUNT_DIR", "/dev/shm/graft_hunt")
    events_path = os.path.join(work, f"events_{args.events}")
    os.makedirs(work, exist_ok=True)
    if not os.path.isdir(os.path.join(events_path, "batch_id=0")):
        print(f"[hunt-sa] generating {args.events} events → {events_path}", flush=True)
        gen_cdc_input(events_path, args.events)

    def log(rec: dict) -> None:
        rec["ts"] = round(time.time(), 1)
        rec["mode"] = "standalone_hunt"
        with open(args.log, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print("[hunt-sa]", json.dumps(rec), flush=True)

    deadline = time.time() + args.deadline_min * 60
    med = _history_medians()
    n_valid = 0
    attempt = 0
    while time.time() < deadline and n_valid < args.target_valid:
        p = _grant_probe()
        rel = _grant_rel(p, med)
        if p["memtouch"] < args.memtouch_floor or (
                rel is not None and rel < args.rel_floor):
            log({"event": "skip_unhealthy",
                 "memtouch": round(p["memtouch"] / 1e6, 1),
                 "rel_vs_median": round(rel, 3) if rel is not None else None})
            time.sleep(50)
            continue
        attempt += 1
        tmp = tempfile.mkdtemp(prefix="hunt_sa_", dir=work)
        try:
            res = run_standalone_scaling(
                events_path, tmp, cores_per_worker=args.cores_per_worker,
                sha_rounds=args.sha_rounds,
                sha_mode=args.sha_mode,
                midpair_gate_s=args.midpair_gate_s)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        append_history(res)
        ok = bool(res.get("valid"))
        n_valid += int(ok)
        log({
            "event": "sa_pair", "attempt": attempt, "valid": ok,
            "sha_rounds": args.sha_rounds,
            "sha_mode": args.sha_mode,
            "speedup": res.get("speedup_lo_to_hi"),
            "eff_vs_cpu_ceiling": res.get("eff_vs_cpu_ceiling"),
            "cpu_ceiling": res.get("cpu_ceiling"),
            "drift": res.get("grant_drift"),
            "steal_hi": res.get("steal_cores_hi"),
            "midpair_waited_s": res.get("midpair_waited_s"),
            "failed": res.get("failed"),
        })
    log({"event": "done", "valid_windows": n_valid, "attempts": attempt})


if __name__ == "__main__":
    main()
