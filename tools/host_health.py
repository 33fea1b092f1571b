"""Host-health probe: three micro-benchmarks that separate the failure
modes this sandbox host actually exhibits.

Observed (round 3): the hypervisor can degrade memory-WRITE paths
(page-fault / fresh-page touch ~100x slow) while leaving SHA-NI hashing
at full speed — so a sha256-only grant probe reads "healthy" on a host
where Spark (allocation-heavy JVM) runs 15x slow. The composite probe
measures:

* ``sha_mbps``     — sha256 over a resident 64 KiB buffer (SHA-NI / pure
                     core arithmetic; blind to memory pathology)
* ``memtouch_mbps``— write one byte per 4 KiB page of a FRESHLY mmapped
                     region (page-allocation path; the component that
                     collapsed)
* ``pyloop_mips``  — interpreted Python loop iterations/sec (branchy
                     scalar IPC, closest proxy for JVM interpreter/JIT-
                     warmup code)

Healthy reference points measured on this box (2.7 GHz Xeon, idle,
before degradation): sha ~1200 MB/s/proc, memtouch ~2000+ MB/s,
pyloop ~30+ M iters/s. Run as a module: appends one JSON line to
BENCH/host_health.jsonl.
"""

from __future__ import annotations

import json
import mmap
import os
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sha_probe(seconds: float = 1.0) -> float:
    """MB/s of sha256 over a resident buffer (single process)."""
    import hashlib

    data = b"x" * 65536
    t0 = time.time()
    n = 0
    while time.time() - t0 < seconds:
        hashlib.sha256(data).digest()
        n += 1
    return n * 65536 / (time.time() - t0) / 1e6


def memtouch_probe(mb: int = 64) -> float:
    """MB/s of first-touch writes to a fresh anonymous mmap (one byte per
    4 KiB page). This is the path the hypervisor degrades: balloon/KSM/
    lazy-EPT faults make fresh-page writes orders of magnitude slow while
    reads of resident memory stay fast."""
    size = mb * 1024 * 1024
    m = mmap.mmap(-1, size)
    t0 = time.time()
    step = 4096
    for off in range(0, size, step):
        m[off] = 1
    dt = time.time() - t0
    m.close()
    return size / dt / 1e6


def pyloop_probe(iters: int = 2_000_000) -> float:
    """Million interpreted loop iterations per second."""
    t0 = time.time()
    x = 0
    for i in range(iters):
        x += i
    dt = time.time() - t0
    return iters / dt / 1e6


def probe() -> dict:
    return {
        "ts": round(time.time(), 1),
        "sha_mbps": round(sha_probe(), 1),
        "memtouch_mbps": round(memtouch_probe(), 1),
        "pyloop_mips": round(pyloop_probe(), 2),
    }


def main() -> None:
    out = os.path.join(ROOT, "BENCH", "host_health.jsonl")
    rec = probe()
    with open(out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
