"""Pure-Python reference oracle for CDC replay.

Mirrors the reference's duplicate-pk semantics — last-writer-wins dict
overwrite in input order (arches_rascoll/ref_collection.py:95-97,142) —
generalized to (repo, path) keys ordered by commit_seq with commit as the
tiebreak, plus delete tombstones. Used only in tests at small scale; the
engine itself never touches this path.
"""

from __future__ import annotations

import hashlib
from typing import Any, Iterable


def sha256_hex(text: str | None) -> str | None:
    if text is None:
        return None
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


def replay_lww(events: Iterable[dict[str, Any]]) -> dict[tuple[str, str], dict[str, Any]]:
    """Replay a change log into final state: dict keyed by (repo, path).

    Events may arrive in any order; ordering is by (commit_seq, commit).
    A winning op == 'D' removes the key. Late columns (schema evolution)
    simply appear in later event dicts; the final row carries whatever
    columns its winning event had.
    """
    ordered = sorted(events, key=lambda e: (e["commit_seq"], e["commit"]))
    state: dict[tuple[str, str], dict[str, Any]] = {}
    for e in ordered:
        key = (e["repo"], e["path"])
        if e["op"] == "D":
            state.pop(key, None)
        else:
            state[key] = dict(e)
    return state


def final_rows(
    events: Iterable[dict[str, Any]],
    cols: tuple[str, ...] = ("repo", "path", "commit", "lang"),
    hash_content: bool = True,
) -> set[tuple]:
    """Final state as an order-insensitive set of tuples for equality
    checks, with content reduced to sha256 (the per-row invariant)."""
    state = replay_lww(events)
    out = set()
    for row in state.values():
        t = tuple(row.get(c) for c in cols)
        if hash_content:
            t = t + (sha256_hex(row.get("content")),)
        out.add(t)
    return out
