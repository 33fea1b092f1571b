"""Scan-width estimation WITHOUT forcing an RDD plan conversion.

``df.rdd.getNumPartitions()`` answers "how many partitions would this plan
produce" exactly, but at a hidden cost: accessing ``.rdd`` converts the
whole logical plan to an RDD of Rows (a full analysis + physical planning
pass, plus a deserializer stage grafted onto the plan) EVERY time it is
consulted. The narrow-corpus ``_spread`` gates in operators.dedup /
operators.similarity only need a one-sided answer — "is this input clearly
narrower than the session's parallelism?" — so this module estimates the
scan's partition count from driver-side metadata instead:

* file-backed plans: ``df.inputFiles()`` (pure catalog metadata — no job)
  plus per-file sizes, split at ``spark.sql.files.maxPartitionBytes``
  exactly as FilePartition packing would (an upper-ish bound: packing can
  only merge small files into FEWER partitions, never split beyond
  size/maxPartitionBytes + 1 per file);
* non-file plans (local relations from ``createDataFrame`` /
  ``spark.range``, cached or checkpointed frames — ``inputFiles()`` is
  empty): width is UNKNOWN, and the gate answers "not narrow", i.e. the
  caller does NOT repartition. That preserves the old ``.rdd`` probe's
  behavior on both sub-cases: ``parallelize`` already spreads a local
  relation across ~defaultParallelism partitions (the old gate no-op'd),
  and a large cached/checkpointed corpus with hundreds of partitions must
  never be collapsed to ``n`` by a well-meaning spread (the old gate
  no-op'd there too). The case the gate exists for — one small parquet
  file scanning as one task — is always file-backed.

At real scale a table's file count alone exceeds any session parallelism,
so the gate stays a no-op there — same behavior as the ``.rdd`` probe,
minus the per-call planning tax.
"""

from __future__ import annotations

import math
import os
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame

_DEFAULT_MAX_PARTITION_BYTES = 128 * 1024 * 1024

_SIZE_SUFFIXES = {
    "b": 1,
    "k": 1024, "kb": 1024,
    "m": 1024**2, "mb": 1024**2,
    "g": 1024**3, "gb": 1024**3,
    "t": 1024**4, "tb": 1024**4,
}


def parse_byte_size(v: str | int | None) -> int:
    """Spark size-conf string → bytes ("128MB", "134217728b", 134217728)."""
    if v is None:
        return _DEFAULT_MAX_PARTITION_BYTES
    if isinstance(v, int):
        return v
    s = str(v).strip().lower()
    for suf in sorted(_SIZE_SUFFIXES, key=len, reverse=True):
        if s.endswith(suf):
            num = s[: -len(suf)].strip()
            if num:
                return int(float(num) * _SIZE_SUFFIXES[suf])
    return int(float(s))


def _local_path(uri: str) -> str | None:
    """Filesystem path for a local file URI (or bare path); None if remote."""
    parsed = urlparse(uri)
    if parsed.scheme in ("", "file"):
        return unquote(parsed.path) or uri
    return None


def estimated_scan_partitions(df: DataFrame) -> int | None:
    """Estimated partition count of ``df``'s scan, from file metadata only.

    None for non-file-backed plans (local relations, cached/checkpointed
    frames) — width unknown, caller must not assume narrow. Remote files
    whose size can't be stat'ed count as one partition each, which
    under-counts splits of huge remote files — acceptable for the
    one-sided narrow-input gate this feeds (file COUNT at scale already
    clears any session parallelism)."""
    try:
        files = df.inputFiles()
    except Exception:  # non-file plans on some backends raise
        return None
    if not files:
        return None
    max_bytes = parse_byte_size(
        df.sparkSession.conf.get(
            "spark.sql.files.maxPartitionBytes",
            str(_DEFAULT_MAX_PARTITION_BYTES),
        )
    )
    total = 0
    for uri in files:
        p = _local_path(uri)
        sz = None
        if p is not None:
            try:
                sz = os.path.getsize(p)
            except OSError:
                sz = None
        total += 1 if sz is None else max(1, math.ceil(sz / max_bytes))
    return total


def is_narrow_input(df: DataFrame, parallelism: int) -> bool:
    """True when the scan is KNOWN to produce fewer partitions than
    ``parallelism`` — the condition under which the compute-dense dedup /
    similarity entry points repartition before their heavy per-row work.
    Unknown width (non-file plans) answers False: never add a shuffle —
    and never collapse an already-wide frame — on a guess."""
    est = estimated_scan_partitions(df)
    return est is not None and est < parallelism
