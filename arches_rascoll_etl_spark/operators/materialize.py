"""Materialization knob for intermediates consumed more than once
(LSH/SimHash signature tables feeding self-joins).

Catalyst's exchange reuse does not fire across a self-join's aliased
subtrees, so without explicit materialization the full signature pipeline
(shingle → md5 → permute / tokenize → vote / plane dot products) runs once
PER CONSUMER. The right mechanism differs by deployment:

- ``local_checkpoint`` (sandbox default): ``df.localCheckpoint(eager=True)``
  — blocks stored on executors, lineage truncated, freed by the
  ContextCleaner. Fastest, but an executor death loses blocks with no
  lineage to recompute from → the job fails and must rerun. Fine on
  local[k] / short-lived jobs.
- ``disk``: ``persist(StorageLevel.DISK_ONLY)`` + an eager count. Lineage
  is KEPT, so a lost executor's blocks are recomputed transparently — the
  reliability choice for long multi-hour 100-TB runs where some executor
  loss is expected. Caller should unpersist when done (or let the
  ContextCleaner collect it).
- ``memory_and_disk``: ``persist(StorageLevel.MEMORY_AND_DISK)`` + eager
  count — same reliability as ``disk``, faster re-reads when it fits.
- ``none``: no materialization — the signature pipeline recomputes per
  consumer. Correct, ~2× the signature cost; useful to bound executor
  storage on pathologically wide corpora.

At true 100-TB scale the better pattern is to persist the signature table
as a real lake table between stages; these modes are the in-session
equivalents.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

MODES = ("local_checkpoint", "disk", "memory_and_disk", "none")

_LEVELS = {
    "disk": StorageLevel.DISK_ONLY,
    "memory_and_disk": StorageLevel.MEMORY_AND_DISK,
}


def materialize(df: DataFrame, mode: str = "local_checkpoint") -> DataFrame:
    """Materialize ``df`` once so N downstream consumers share one
    computation. See module docstring for the mode trade-offs."""
    if mode == "local_checkpoint":
        return df.localCheckpoint(eager=True)
    if mode in _LEVELS:
        df = df.persist(_LEVELS[mode])
        df.count()  # eager: pay the pipeline once, now
        return df
    if mode == "none":
        return df
    raise ValueError(f"unknown materialization mode {mode!r}; one of {MODES}")
