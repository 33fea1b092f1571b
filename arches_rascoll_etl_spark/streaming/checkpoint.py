"""Checkpoint manifest — resumable exactly-once batch application.

Generalizes the reference's crude checkpoint (reload previously staged CSVs
instead of recomputing, arches_rascoll/ref_collection.py:227-234) into an
atomic JSON manifest of applied batch ids + snapshot versions. Written via
temp-file + ``os.replace`` *after* the lake commit, so the failure window is:

* crash before lake commit      → nothing happened; batch re-runs.
* crash after lake commit, before checkpoint → checkpoint is behind, but the
  lake's own committed ``batch-id`` summary makes the re-merge a no-op
  (two-level idempotence; covered by kill/resume tests).
"""

from __future__ import annotations

import json
import os
from typing import Any


class Checkpoint:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def load(self) -> dict[str, Any]:
        if not os.path.exists(self.path):
            return {"applied": [], "last_snapshot": None, "batches": {}}
        with open(self.path) as f:
            return json.load(f)

    def applied_batch_ids(self) -> set[str]:
        return set(self.load()["applied"])

    def record(self, batch_id: str, snapshot_version: int | None, stats: dict | None = None) -> None:
        state = self.load()
        bid = str(batch_id)
        if bid not in state["applied"]:
            state["applied"].append(bid)
        state["last_snapshot"] = snapshot_version
        state["batches"][bid] = stats or {}
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self.path)
