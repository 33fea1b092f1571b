"""Deterministic identity & content hashing — vectorized, no per-row Python.

Replaces the reference's nondeterministic ``GenUUID.uuid4()`` minting
(arches_rascoll/ref_collection.py:138,167; places.py:63; groups.py:61;
persons.py:28; prov_acts.py:53) with deterministic identities so replay,
retry, and kill/resume produce byte-identical state (the per-row
content-sha256 invariant from BASELINE.json).

Two tiers:
* JVM-native (preferred, whole-stage codegen): ``sha256_hex`` / ``content_key``
  via ``F.sha2`` — zero Python in the hot path.
* Arrow-vectorized pandas UDF: ``uuid5_udf`` for canonical RFC-4122 v5 UUIDs
  when a true UUID string is required (tile/resource ids). Batched via
  Arrow; ~100× a row-wise Python UDF.
"""

from __future__ import annotations

import hashlib
import uuid

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# engine namespace for UUIDv5 minting (a fixed, public namespace — any
# constant works; determinism is what matters)
ENGINE_NAMESPACE = uuid.UUID("6ba7b810-9dad-11d1-80b4-00c04fd430c8")  # RFC 4122 NAMESPACE_DNS


def sha256_hex(col: Column | str) -> Column:
    """sha256 hex digest of a string column — JVM-side, codegen'd."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(c.cast("string"), 256)


def content_key(*cols: Column | str, sep: str = "|") -> Column:
    """Deterministic 64-hex identity for a row from its natural key parts."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.sha2(F.concat_ws(sep, *[c.cast("string") for c in cs]), 256)


@pandas_udf(StringType())
def uuid5_udf(s: pd.Series) -> pd.Series:
    """RFC-4122 v5 UUID of each input string (Arrow-batched).

    Deterministic replacement for the reference's uuid4 sites; same input →
    same UUID forever, so re-minting on retry is idempotent.
    """
    ns = ENGINE_NAMESPACE
    return s.map(lambda v: str(uuid.uuid5(ns, v)) if v is not None else None)


@pandas_udf(StringType())
def sha256_udf(s: pd.Series) -> pd.Series:
    """Pure-Python sha256 (Arrow-batched). Exists to cross-check the
    JVM ``F.sha2`` path in tests; production code uses ``sha256_hex``."""
    return s.map(lambda v: hashlib.sha256(v.encode("utf-8")).hexdigest() if v is not None else None)


def deterministic_uuid(*cols: Column | str, sep: str = "|") -> Column:
    """Mint a v5 UUID from the concatenation of key columns (vectorized)."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return uuid5_udf(F.concat_ws(sep, *[c.cast("string") for c in cs]))


def sha_uuid(*cols: Column | str, sep: str = "|") -> Column:
    """Deterministic uuid-SHAPED id from key parts: sha256 hex grouped
    8-4-4-4-12. Unlike ``uuid5_udf`` this is a pure JVM expression
    (whole-stage codegen, no Python) and reproducible in ANSI SQL
    (sha256 + substr), so driver oracles can mint the identical ids.
    Not RFC-4122 (no version/variant bits) — use ``uuid5_udf`` where
    canonical v5 semantics matter."""
    h = content_key(*cols, sep=sep)
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )
