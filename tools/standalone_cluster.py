"""Spark STANDALONE-cluster scaling evidence for the north rule.

local[k] runs executors as threads in one JVM — no serialization between
executors, no scheduler RPC, shared codegen caches — so its N→4N ratio can
flatter or understate a real cluster. This harness launches a real
standalone master plus separate worker JVMs on this box and runs the SAME
CDC replay via ``spark-submit --master spark://… --py-files engine.zip``,
the exact deployment shape the north rule prescribes:

* lo level: 1 worker × C cores → 1 executor  (N executors)
* hi level: 4 workers × C cores → 4 executors (4N executors)

Each executor is its own JVM with its own shuffle client, so the hi level
pays real inter-executor shuffle serialization. Both levels read identical
input files; runs are bracketed by host-grant probes exactly like the
local[k] pairs in bench.py (same validity rule).

Usage:
    python tools/standalone_cluster.py --events <parquet_dir> \
        --workdir <dir> --out <result.json> [--cores-per-worker 4]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import socket
import subprocess
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
SPARK_CLASS = os.path.join(SPARK_HOME, "bin", "spark-class")
SPARK_SUBMIT = os.path.join(SPARK_HOME, "bin", "spark-submit")


# pgrep -f substring patterns for orphaned cluster processes. The
# SparkSubmit pattern MUST be anchored to a standalone-master submission
# ("--master spark://"): a plain-"SparkSubmit" match also hits every
# concurrent LOCAL pyspark JVM on the box (pytest sessions, oracle
# self-checks — they launch as `SparkSubmit ... pyspark-shell`), and the
# un-anchored sweep was observed SIGKILLing a green test run mid-collect.
_SWEEP_PATTERNS = (
    "org.apache.spark.deploy.master.Master",
    "org.apache.spark.deploy.worker.Worker",
    "org.apache.spark.deploy.SparkSubmit --master spark://",
    "replay_submit_main.py",
)


def sweep_stale_clusters() -> int:
    """Kill orphaned master/worker/replay-submit processes from a previous
    run whose parent died without __exit__ (crashed session, external
    kill -9 of a hunt). A stale cluster with an in-flight replay silently
    burns CPU for hours and depresses every subsequent measurement on the
    box — round 4 found one that had contaminated a whole bench window.
    Returns the number of processes killed."""
    import signal

    pats = _SWEEP_PATTERNS
    killed = 0
    me = os.getpid()

    def _is_descendant_of_me(pid: int) -> bool:
        # never kill our own tree: a live pyspark session in THIS process
        # (or the hunt wrapper that called us) also shows as SparkSubmit
        for _ in range(64):
            if pid in (0, 1):
                return False
            if pid == me:
                return True
            try:
                with open(f"/proc/{pid}/stat") as f:
                    pid = int(f.read().rsplit(")", 1)[1].split()[1])
            except (OSError, ValueError, IndexError):
                return False
        return False

    for pat in pats:
        try:
            out = subprocess.run(
                ["pgrep", "-f", pat], capture_output=True, text=True
            ).stdout
        except OSError:
            return killed
        for pid_s in out.split():
            pid = int(pid_s)
            if pid == me or _is_descendant_of_me(pid):
                continue
            try:
                os.kill(pid, signal.SIGKILL)
                killed += 1
            except (ProcessLookupError, PermissionError):
                pass
    if killed:
        time.sleep(2)  # let the scheduler reclaim the cores before probing
    return killed


class LiveGrantMonitor:
    """Continuous host-grant signal DURING a run, on the axis that defines
    the CPU ceiling (sha256 throughput of one thread, ~1/32 of the box).

    The bracket probes around a pair bound slow grant *drift*, but a
    hypervisor burst in the middle of one 60–100 s run is invisible to
    them — round 4 measured valid-bracket fold windows spanning
    eff-vs-ceiling 0.35…1.0, i.e. the bracket rule alone lets through
    pairs whose lo and hi runs executed on effectively different machines.
    One monitor thread hashes a 64 KiB L1/L2-resident buffer in ~50 ms
    slices for the whole run; the per-run mean rate is the run's own
    grant. Pair validity then also requires lo/hi live-grant agreement."""

    def __init__(self):
        import threading

        self._rates: list[float] = []
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._loop, daemon=True)

    def _loop(self):
        import hashlib

        buf = b"\x5a" * 65536
        while not self._stop.is_set():
            t0 = time.perf_counter()
            n = 0
            while time.perf_counter() - t0 < 0.05:
                hashlib.sha256(buf).digest()
                n += 1
            self._rates.append(n / (time.perf_counter() - t0))
            time.sleep(0.45)  # ~10% duty cycle of one vCPU: signal, not load

    def __enter__(self):
        self._t.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._t.join(timeout=2)

    def mean_rate(self) -> float | None:
        return round(sum(self._rates) / len(self._rates), 1) if self._rates else None


class CpuAccount:
    """Exact CPU *delivered* to this box during a run, from /proc/stat
    deltas (VM-scoped here: 32 CPUs, an idle box reads ~0.0 busy cores and
    a 4-process burn reads ~3.9 — verified before adoption).

    The bracket probes and the live-grant monitor estimate what the host
    COULD grant; this measures what it actually DID grant while the run
    executed. With the box otherwise idle, busy jiffies during a replay are
    the replay's own CPU, so

        eff_vs_delivered_cpu = speedup / (busy_cores_hi / busy_cores_lo)

    is a per-window, self-normalizing scaling efficiency: it answers the
    north rule's own question — when the level received k× the CPU, did
    throughput rise ≥0.8·k× — without any separate probe whose timing can
    miss a mid-run hypervisor burst. Steal cores are recorded alongside so
    a window where the hypervisor withheld cycles is visible as such.
    Caveat (kept honest in reporting): a serial stage lowers busy_cores_hi
    and flatters this ratio, so BASELINE.md also reports the absolute
    busy-core numbers and utilization of the configured cores."""

    _FIELDS = ("user", "nice", "system", "idle", "iowait", "irq",
               "softirq", "steal")

    @staticmethod
    def _snap() -> dict:
        with open("/proc/stat") as f:
            v = list(map(int, f.readline().split()[1:9]))
        d = dict(zip(CpuAccount._FIELDS, v))
        d["busy"] = (d["user"] + d["nice"] + d["system"]
                     + d["irq"] + d["softirq"])
        return d

    def __enter__(self):
        self._hz = os.sysconf("SC_CLK_TCK")
        self._t0 = time.time()
        self._s0 = self._snap()
        return self

    def __exit__(self, *exc):
        # raw CPU-seconds over the accounted window; callers normalize by
        # the replay's own measured wall (JVM startup inside the window is
        # near-zero busy jiffies, so attributing its seconds to the replay
        # barely moves the figure and applies equally to both levels)
        self.wall = max(time.time() - self._t0, 1e-6)
        s1 = self._snap()
        self.busy_cpu_sec = round((s1["busy"] - self._s0["busy"]) / self._hz, 1)
        self.steal_cpu_sec = round((s1["steal"] - self._s0["steal"]) / self._hz, 1)
        self.iowait_cpu_sec = round((s1["iowait"] - self._s0["iowait"]) / self._hz, 1)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _wait_port(port: int, timeout_s: float = 60.0) -> None:
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=1):
                return
        except OSError:
            time.sleep(0.5)
    raise TimeoutError(f"port {port} never opened")


def _zip_engine() -> str:
    zpath = tempfile.mktemp(prefix="engine_", suffix=".zip")
    subprocess.run(
        ["zip", "-qr", zpath, "arches_rascoll_etl_spark", "-x", "*__pycache__*"],
        cwd=ROOT, check=True,
    )
    return zpath


class StandaloneCluster:
    """Context manager: one master + ``n_workers`` worker JVMs, all killed
    (process-group) on exit."""

    def __init__(self, n_workers: int, cores_per_worker: int, work_root: str,
                 worker_mem: str = "8g", pin_cpus: bool = False):
        self.n_workers = n_workers
        self.cores = cores_per_worker
        self.work_root = work_root
        self.worker_mem = worker_mem
        # CPU pinning (taskset; affinity inherited by the executor JVM the
        # worker forks and by its python UDF workers): worker i owns the
        # DISJOINT slice [i*C, (i+1)*C), so the hi level's 4 executors sit
        # on 4x the physical cores of the lo level's 1 — the box-partition
        # experiment: without pinning the OS may timeshare all executor
        # threads over the same hot cores and the "4x" level adds no
        # capacity the scheduler actually grants. DRAM bandwidth remains
        # shared (no resctrl/MBA in this sandbox) — the residual ceiling
        # the roofline cohort quantifies.
        # Guard the premise: worker slices + the driver's 4-cpu slice must
        # all fit DISJOINTLY in the host — otherwise slices overlap (the
        # "owns its cores outright" claim silently becomes false) or name
        # CPUs past the host count (worker dies at launch, 90s registration
        # timeout). Refuse rather than measure a lie.
        if pin_cpus:
            n_host = os.cpu_count() or 0
            need = n_workers * cores_per_worker + 4  # workers + driver slice
            if need > n_host:
                raise ValueError(
                    f"pin_cpus needs {need} disjoint cpus ({n_workers} workers"
                    f" x {cores_per_worker} + 4 driver) but the host has"
                    f" {n_host}; run unpinned or shrink the cluster"
                )
        self.pin_cpus = pin_cpus
        self.port = _free_port()
        self.master_url = f"spark://127.0.0.1:{self.port}"
        self._procs: list[subprocess.Popen] = []

    def _spawn(self, args: list[str], log: str) -> subprocess.Popen:
        env = dict(os.environ, SPARK_HOME=SPARK_HOME,
                   SPARK_LOG_DIR=self.work_root,
                   SPARK_NO_DAEMONIZE="1")
        with open(log, "w") as f:
            return subprocess.Popen(
                args, stdout=f, stderr=subprocess.STDOUT,
                start_new_session=True, env=env,
            )

    def __enter__(self):
        os.makedirs(self.work_root, exist_ok=True)
        self._procs.append(self._spawn(
            [SPARK_CLASS, "org.apache.spark.deploy.master.Master",
             "--host", "127.0.0.1", "--port", str(self.port),
             "--webui-port", "0"],
            os.path.join(self.work_root, "master.log"),
        ))
        _wait_port(self.port)
        for i in range(self.n_workers):
            wd = os.path.join(self.work_root, f"worker{i}")
            os.makedirs(wd, exist_ok=True)
            argv = [SPARK_CLASS, "org.apache.spark.deploy.worker.Worker",
                    self.master_url, "--cores", str(self.cores),
                    "--memory", self.worker_mem, "--webui-port", "0",
                    "--work-dir", wd]
            if self.pin_cpus:
                lo_c = i * self.cores
                argv = ["taskset", "-c",
                        f"{lo_c}-{lo_c + self.cores - 1}"] + argv
            self._procs.append(self._spawn(
                argv,
                os.path.join(self.work_root, f"worker{i}.log"),
            ))
        self._wait_workers_registered()
        return self

    def _wait_workers_registered(self, timeout_s: float = 90.0) -> None:
        """Block until the master has registered every worker (worker JVM
        startup takes a few seconds; submitting earlier would run the app
        with fewer executors than the level claims)."""
        log = os.path.join(self.work_root, "master.log")
        t0 = time.time()
        while time.time() - t0 < timeout_s:
            try:
                with open(log) as f:
                    if f.read().count("Registering worker") >= self.n_workers:
                        return
            except FileNotFoundError:
                pass
            time.sleep(0.5)
        raise TimeoutError(
            f"only some of {self.n_workers} workers registered in {timeout_s}s"
        )

    def __exit__(self, *exc):
        import signal

        for p in reversed(self._procs):
            try:
                os.killpg(os.getpgid(p.pid), signal.SIGTERM)
            except (ProcessLookupError, PermissionError):
                pass
        deadline = time.time() + 10
        for p in self._procs:
            try:
                p.wait(timeout=max(0.1, deadline - time.time()))
            except subprocess.TimeoutExpired:
                try:
                    os.killpg(os.getpgid(p.pid), signal.SIGKILL)
                except (ProcessLookupError, PermissionError):
                    pass

    def submit_replay(self, zip_path: str, events: str, workdir: str,
                      out: str, total_cores: int, timeout_s: float = 900.0,
                      sha_rounds: int = 1, sha_mode: str = "repeat") -> dict:
        env = dict(os.environ,
                   PYSPARK_PYTHON=sys.executable,
                   PYSPARK_DRIVER_PYTHON=sys.executable)
        # JVM ergonomics size GC/JIT thread pools from the HOST's core
        # count, not the executor's grant: a 2-core executor on a 32-core
        # box spins 32 ParallelGCThreads, and the sha-dense replay's
        # ~3 GB/s allocation rate (one hex digest per round) keeps them
        # hot — measured 3.3 cores of non-task CPU across the 4-executor
        # level vs 0.5 at 1 executor (stage-metrics decomposition, round
        # 4). On a packed production cluster those threads CONTEND with
        # neighbor executors' task threads; capping them to the executor's
        # own core grant is the standard multi-tenant setting and makes
        # the delivered-CPU scaling account reflect task work, not
        # ergonomics noise.
        exec_jvm = (f"-XX:ParallelGCThreads={max(self.cores, 2)}"
                    " -XX:ConcGCThreads=1"
                    f" -XX:CICompilerCount={max(self.cores, 2)}")
        submit_prefix: list[str] = []
        if self.pin_cpus:
            # driver on its own slice at the top of the box, disjoint from
            # every executor slice, so driver-side Py4J/scheduling work
            # can't ride (or steal) the cores whose scaling is measured
            n_host = os.cpu_count() or 32
            submit_prefix = ["taskset", "-c", f"{n_host - 4}-{n_host - 1}"]
        subprocess.run(
            submit_prefix + [SPARK_SUBMIT,
             "--master", self.master_url,
             "--py-files", zip_path,
             "--conf", "spark.executor.memory=6g",
             "--conf", "spark.driver.memory=8g",
             "--conf", f"spark.executor.extraJavaOptions={exec_jvm}",
             # driver JVM: same ergonomics fix (scheduling + Py4J, not
             # data-plane — 4 GC threads suffice and stop burning idle
             # cores the CPU account attributes to the run)
             "--conf", ("spark.driver.extraJavaOptions="
                        "-XX:ParallelGCThreads=4 -XX:ConcGCThreads=1"),
             "--conf", f"spark.cores.max={total_cores}",
             "--conf", "spark.ui.enabled=false",
             os.path.join(ROOT, "tools", "replay_submit_main.py"),
             "--cores", str(total_cores),
             "--events", events,
             "--workdir", workdir,
             "--sha-rounds", str(sha_rounds),
             "--sha-mode", sha_mode,
             "--out", out],
            cwd=ROOT, check=True, timeout=timeout_s, env=env,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        with open(out) as f:
            return json.load(f)


def run_standalone_scaling(events: str, workdir: str,
                           cores_per_worker: int = 4,
                           run_timeout_s: float = 900.0,
                           sha_rounds: int = 1, sha_mode: str = "repeat",
                           midpair_gate_s: float = 0.0,
                           gate_rel_floor: float = 0.8,
                           gate_memtouch_floor: float = 2e8,
                           pin_cpus: bool | None = None) -> dict:
    """One validated lo/hi pair on a real standalone cluster:
    1 executor × C cores vs 4 executors × C cores, grant-probe-bracketed
    (same validity rule as bench.py's local[k] pairs).

    ``sha_rounds > 1`` is the CPU-roofline experiment: the map stage's
    arithmetic intensity rises linearly in rounds while shuffled bytes stay
    identical, so the pair's binding ceiling moves from single-box DRAM
    bandwidth (which does NOT multiply with cores on one box) to CPU (which
    nearly does). Each pair also measures the host's CPU and bandwidth
    ceilings at the SAME core ratio in the same window, so the result
    carries efficiency-vs-applicable-ceiling, not just raw efficiency.

    ``midpair_gate_s > 0`` arms the mid-pair health gate: after the lo level
    (and its bracketing probe), wait up to that many seconds for the host
    grant to return to health before launching hi. Cohort telemetry shows
    the dominant spoiler is CPU theft arriving DURING the hi run
    (steal_cores_hi median 0.40 on sub-0.8 windows vs 0.075 on ≥0.8 ones) —
    the pre-attempt probe is ~150 s stale by hi launch. The gate conditions
    ONLY on host-health probes taken while nothing is running, never on the
    pair's own measured rates, so it cannot select on outcome; windows it
    dodges were never measured. It also aborts early (failed record, no
    valid/invalid row) when the lo-bracket probes ALREADY exceed
    ``_PAIR_DRIFT_MAX`` — such a pair is unconditionally invalid under the
    pre-registered drift rule, so running hi only burns the box."""
    sys.path.insert(0, ROOT)
    from bench import (_PAIR_DRIFT_MAX, _grant_probe, _grant_rel,  # noqa: E402
                       _history_medians, _probe_drift,
                       calibrate_host_scaling)

    swept = sweep_stale_clusters()
    if swept:
        print(f"[standalone] swept {swept} stale cluster process(es)", flush=True)
    if pin_cpus is None:
        pin_cpus = os.environ.get("SPARK_GRAFT_PIN_CPUS", "0") == "1"
    zip_path = _zip_engine()
    result: dict = {
        "mode": "standalone",
        "cores_per_worker": cores_per_worker,
        "executors_lo": 1,
        "executors_hi": 4,
        "sha_rounds": sha_rounds,
        "sha_mode": sha_mode,
        "pin_cpus": pin_cpus,
    }
    try:
        grants = [_grant_probe()]
        levels = {}
        for label, n_workers in (("lo", 1), ("hi", 4)):
            if label == "hi" and midpair_gate_s > 0:
                if _probe_drift(grants) > _PAIR_DRIFT_MAX:
                    result["failed"] = "midpair: lo-bracket drift already > max"
                    return result
                med = _history_medians()

                def _healthy(p: dict) -> bool:
                    if p["memtouch"] < gate_memtouch_floor:
                        return False
                    rel = _grant_rel(p, med)
                    if rel is not None and rel < gate_rel_floor:
                        return False
                    # also vs this attempt's own pre-lo probe: history-free
                    # fallback, and catches a box that was above-median at
                    # attempt start and has since lost a big slice
                    return all(
                        p[k] >= 0.75 * grants[0][k]
                        for k in ("sha", "memtouch") if grants[0].get(k)
                    )

                probe, waited = grants[-1], 0.0
                while not _healthy(probe) and waited < midpair_gate_s:
                    time.sleep(25)
                    waited += 25
                    probe = _grant_probe()
                if waited:
                    result["midpair_waited_s"] = waited
                    # the post-wait probe is the effective pre-hi bracket;
                    # the post-lo probe STAYS in the drift list, so grant
                    # movement across the lo run itself still invalidates
                    grants.append(probe)
                    if not _healthy(probe):
                        result["failed"] = "hi: midpair gate timeout"
                        return result
            croot = os.path.join(workdir, f"cluster_{label}")
            tbl_dir = os.path.join(workdir, f"tbl_{label}")
            out_json = os.path.join(workdir, f"replay_{label}.json")
            try:
                with StandaloneCluster(n_workers, cores_per_worker, croot,
                                       pin_cpus=pin_cpus) as c:
                    with LiveGrantMonitor() as mon, CpuAccount() as cpu:
                        levels[label] = c.submit_replay(
                            zip_path, events, tbl_dir, out_json,
                            total_cores=n_workers * cores_per_worker,
                            timeout_s=run_timeout_s,
                            sha_rounds=sha_rounds,
                            sha_mode=sha_mode,
                        )
                    levels[label]["live_grant"] = mon.mean_rate()
                    if "busy_cores" not in levels[label]:
                        # replay built from an older zip: fall back to the
                        # submit-window account (includes JVM startup — use
                        # the in-replay figures whenever present)
                        wall = max(levels[label].get("wall_sec") or cpu.wall, 1e-6)
                        levels[label]["busy_cores"] = round(cpu.busy_cpu_sec / wall, 2)
                        levels[label]["steal_cores"] = round(cpu.steal_cpu_sec / wall, 2)
                        levels[label]["events_per_cpu_sec"] = round(
                            levels[label]["events"] / max(cpu.busy_cpu_sec, 1e-6), 1)
            except (subprocess.TimeoutExpired, subprocess.CalledProcessError,
                    TimeoutError) as e:
                result["failed"] = f"{label}: {type(e).__name__}"
                return result
            finally:
                shutil.rmtree(tbl_dir, ignore_errors=True)
            grants.append(_grant_probe())
        lo, hi = levels["lo"], levels["hi"]
        drift = _probe_drift(grants)
        lg_lo, lg_hi = lo.get("live_grant"), hi.get("live_grant")
        live_drift = (
            round(max(lg_lo, lg_hi) / min(lg_lo, lg_hi), 2)
            if lg_lo and lg_hi else None
        )
        speedup = hi["events_per_sec"] / lo["events_per_sec"]
        # same-window ceilings at the pair's own core ratio (4 vs 16):
        # raw efficiency divides by the ideal 4x; eff-vs-ceiling divides by
        # what THIS box could hand 4x the cores in THIS window. One
        # 2-second calibration snapshot was ±20% noisy against a 90-s pair
        # (observed "ceilings" 3.4…4.7 for the same 4x core ratio), so take
        # the per-metric MEDIAN of 3 calibrations, and cap the CPU ceiling
        # at the core ratio — a super-linear multiprocess-sha "ceiling" is
        # by definition a burst that depressed the calibration's lo leg.
        total_lo = cores_per_worker
        ratio = 4.0
        cals = [
            calibrate_host_scaling(n_lo=total_lo, n_hi=4 * total_lo,
                                   seconds=2.0)
            for _ in range(3)
        ]
        def _med3(key: str) -> float:
            return sorted(c[key] for c in cals)[1]
        cpu_ceil_raw = _med3("cpu_ceiling_speedup")
        cpu_ceil = min(cpu_ceil_raw, ratio)
        bw_ceil = _med3("bandwidth_ceiling_speedup")
        result.update({
            "cpu_ceiling": cpu_ceil,
            "cpu_ceiling_raw": cpu_ceil_raw,
            "bandwidth_ceiling": bw_ceil,
            "eff_vs_cpu_ceiling": round(speedup / cpu_ceil, 3),
            "eff_vs_bw_ceiling": round(speedup / bw_ceil, 3),
        })
        # CPU actually DELIVERED to each run (see CpuAccount): the
        # self-normalizing north-rule ratio, immune to probe-timing misses
        bc_lo, bc_hi = lo.get("busy_cores"), hi.get("busy_cores")
        if bc_lo and bc_hi:
            delivered_ratio = bc_hi / bc_lo
            result.update({
                "busy_cores_lo": bc_lo,
                "busy_cores_hi": bc_hi,
                "steal_cores_lo": lo.get("steal_cores"),
                "steal_cores_hi": hi.get("steal_cores"),
                "delivered_cpu_ratio": round(delivered_ratio, 3),
                # == events-per-cpu-sec hi/lo: per-event CPU-cost inflation
                # at 4x the executors. Pair with utilization: ≥0.8 here AND
                # hi actually consuming ~its configured cores ⇒ ≥0.8·k wall
                # scaling whenever the host delivers k — the north rule,
                # evidenced per-window without any separate probe.
                "eff_vs_delivered_cpu": round(speedup / delivered_ratio, 3),
                "cpu_utilization_hi": round(bc_hi / (4 * cores_per_worker), 3),
                "events_per_cpu_sec_lo": lo.get("events_per_cpu_sec"),
                "events_per_cpu_sec_hi": hi.get("events_per_cpu_sec"),
            })
        result.update({
            "events": lo["events"],
            "lo_events_per_sec": lo["events_per_sec"],
            "hi_events_per_sec": hi["events_per_sec"],
            "lo_wall_sec": lo["wall_sec"],
            "hi_wall_sec": hi["wall_sec"],
            "speedup_lo_to_hi": round(speedup, 3),
            "scaling_efficiency_raw": round(speedup / 4, 3),
            "grant_drift": round(drift, 2),
            "live_grant_lo": lg_lo,
            "live_grant_hi": lg_hi,
            "live_grant_drift": live_drift,
            # same validity band as bench.py (bracket drift + sane speedup)
            # PLUS live-grant agreement: the in-run monitor must show the lo
            # and hi runs executed under comparable host grants — bracket
            # probes alone admit pairs split by a mid-run hypervisor burst
            "valid": bool(
                drift <= _PAIR_DRIFT_MAX
                and 1.0 < speedup < 4.4
                and (live_drift is None or live_drift <= 1.3)
            ),
        })
        result["strict_valid"] = is_strict(result)
        return result
    finally:
        os.unlink(zip_path)


def append_history(res: dict) -> None:
    """Persist every completed standalone pair (valid or not) to
    BENCH/standalone_history.jsonl; bench.py surfaces the most recent
    VALID one in BENCH/BASELINE.md even when the reporting run's own
    window hit a host-collapse burst."""
    if res.get("failed"):
        return
    path = os.path.join(ROOT, "BENCH", "standalone_history.jsonl")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "a") as f:
        f.write(json.dumps({"ts": round(time.time(), 1), **res}) + "\n")


#: strict-tier window-quality gates — host-telemetry-only, pre-registered,
#: applied uniformly to every recorded window (old rows are classified
#: retroactively from their stored fields, so the tier cannot cherry-pick
#: by time or by outcome). Physical rationale:
#:   * live-grant drift ≤ 1.10 — a scaling pair is only meaningful when
#:     BOTH levels executed under the same host grant; the loose 1.3 band
#:     admits up to ±30% efficiency error, larger than the effect measured.
#:   * steal ≤ 5% of the level's configured cores — nonzero steal means
#:     the hypervisor visibly preempted the run mid-window (e.g. one
#:     recorded window: steal 11% of the hi level's cores, utilization
#:     0.892, per-event CPU +43% — a measurement of the neighbor, not the
#:     plan).
#: Windows missing the telemetry (recorded before the live monitor /
#: CpuAccount landed) cannot be strict-qualified and stay loose-tier-only.
_STRICT_LIVE_DRIFT_MAX = 1.10
_STRICT_STEAL_FRAC_MAX = 0.05


def is_strict(rec: dict) -> bool:
    """Strict-tier classification of one pair record (see above)."""
    if not rec.get("valid"):
        return False
    ld = rec.get("live_grant_drift")
    s_lo, s_hi = rec.get("steal_cores_lo"), rec.get("steal_cores_hi")
    cpw = rec.get("cores_per_worker")
    if ld is None or s_lo is None or s_hi is None or not cpw:
        return False
    return bool(
        ld <= _STRICT_LIVE_DRIFT_MAX
        and s_lo <= _STRICT_STEAL_FRAC_MAX * cpw * rec.get("executors_lo", 1)
        and s_hi <= _STRICT_STEAL_FRAC_MAX * cpw * rec.get("executors_hi", 4)
    )


def last_valid_from_history() -> dict | None:
    valid = valid_from_history()
    return valid[-1] if valid else None


def valid_from_history(dense: bool | None = False,
                       strict: bool = False) -> list[dict]:
    """Valid windows from BENCH/standalone_history.jsonl.

    ``dense=False`` (default): the production plan only (sha_rounds == 1) —
    what every pre-existing caller means. ``dense=True``: CPU-roofline
    windows only (sha_rounds > 1). ``dense=None``: all. ``strict=True``
    additionally applies the strict window-quality tier (``is_strict``),
    recomputed from each row's stored host telemetry so pre-existing rows
    classify by the same rule."""
    path = os.path.join(ROOT, "BENCH", "standalone_history.jsonl")
    if not os.path.exists(path):
        return []
    out = []
    with open(path) as f:
        for line in f:
            if line.strip():
                rec = json.loads(line)
                is_dense = rec.get("sha_rounds", 1) > 1
                if (rec.get("valid") and (dense is None or is_dense == dense)
                        and (not strict or is_strict(rec))):
                    out.append(rec)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--cores-per-worker", type=int, default=4)
    ap.add_argument("--sha-rounds", type=int, default=1)
    ap.add_argument("--sha-mode", choices=("repeat", "fold"), default="repeat")
    args = ap.parse_args()
    res = run_standalone_scaling(args.events, args.workdir,
                                 args.cores_per_worker,
                                 sha_rounds=args.sha_rounds,
                                 sha_mode=args.sha_mode)
    append_history(res)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
