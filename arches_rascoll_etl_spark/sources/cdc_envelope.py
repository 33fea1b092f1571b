"""Debezium-style CDC envelope adapter: JSON change messages → typed events.

The reference ingests pre-staged CSV/JSON files (ref_collection.py:53-71
reloads JSON-encoded columns); a general binlog/WAL tail usually arrives
as connector envelopes instead — one JSON message per change carrying
``op`` (``c``/``r`` snapshot-read/``u``/``d``), ``before``/``after`` row
images, and source metadata (commit sequence / LSN) that defines the
total order. This adapter turns a frame of such messages into the typed
change-event shape the rest of the engine consumes (op ∈ I/U/D, one row
image, an ordering column), entirely with JVM-side expressions:

* ``from_json`` against a schema built from the caller's record schema —
  one pass, whole-stage codegen, no Python;
* op mapping ``c``/``r`` → I, ``u`` → U, ``d`` → D; anything else
  surfaces as NULL and is caught downstream as ``bad_op``;
* image selection: ``before`` for deletes (the engine's tombstones carry
  the last-known row), ``after`` otherwise;
* unparseable messages (``from_json`` → NULL) keep every typed column
  NULL, so the quarantine classifier (operators/quarantine.py) diverts
  them as ``null_key`` with the ORIGINAL message preserved in
  ``raw_value`` — the dead-letter row keeps its evidence.

At scale this composes with the quarantine merge: parse → split →
LWW-merge is still a single shuffle on the key columns; the parse and
classification predicates live in the scan stage.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: original message column kept on the output for dead-letter evidence
RAW_COL = "raw_value"

_OP_MAP = {"c": "I", "r": "I", "u": "U", "d": "D"}


def envelope_schema(record_schema: T.StructType,
                    seq_field: str = "seq") -> T.StructType:
    """Schema of one envelope message for ``record_schema`` rows."""
    return T.StructType(
        [
            T.StructField(
                "payload",
                T.StructType(
                    [
                        T.StructField("op", T.StringType()),
                        T.StructField("before", record_schema),
                        T.StructField("after", record_schema),
                        T.StructField(
                            "source",
                            T.StructType(
                                [
                                    T.StructField("ts_ms", T.LongType()),
                                    T.StructField(seq_field, T.LongType()),
                                ]
                            ),
                        ),
                    ]
                ),
            )
        ]
    )


def _map_op(op: Column) -> Column:
    expr = F.lit(None).cast("string")
    # build WHEN chain in reverse so the first pair ends up outermost
    for src, dst in reversed(list(_OP_MAP.items())):
        expr = F.when(op == src, F.lit(dst)).otherwise(expr)
    return expr


def parse_cdc_envelope(
    df: DataFrame,
    record_schema: T.StructType,
    value_col: str = "value",
    seq_field: str = "seq",
    keep_raw: bool = True,
) -> DataFrame:
    """Typed change events from a frame of envelope JSON strings.

    Output columns: the record columns (from ``after``, or ``before`` for
    deletes), ``op`` (I/U/D; NULL for unknown/missing), ``commit_seq``
    and ``ts_ms`` from source metadata, and — when ``keep_raw`` —
    ``raw_value`` holding the original message for quarantined rows.
    Unparseable messages yield all-NULL typed columns (``from_json``
    returns NULL on malformed input) and are meant to flow into
    ``operators.quarantine.split_quarantine`` downstream.
    """
    schema = envelope_schema(record_schema, seq_field)
    p = F.from_json(F.col(value_col), schema)["payload"]
    op = _map_op(p["op"])
    image = F.when(op == "D", p["before"]).otherwise(p["after"])
    cols = [image[f.name].alias(f.name) for f in record_schema.fields]
    cols += [
        op.alias("op"),
        p["source"][seq_field].alias("commit_seq"),
        p["source"]["ts_ms"].alias("ts_ms"),
    ]
    if keep_raw:
        cols.append(F.col(value_col).alias(RAW_COL))
    return df.select(*cols)


def to_cdc_envelope(
    df: DataFrame,
    record_cols: Mapping[str, str] | list[str],
    op_col: str = "op",
    seq_col: str = "commit_seq",
    ts_col: str | None = None,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Inverse adapter (tests + round-trips): typed events → a frame of
    envelope JSON strings (column ``value``), deletes carrying ``before``
    only. ``extra_cols`` ride alongside unserialized — the message-key
    position of a Kafka-shaped record."""
    names = list(record_cols)
    record = F.struct(*[F.col(c).alias(c) for c in names])
    is_del = F.col(op_col) == "D"
    inv = {v: k for k, v in _OP_MAP.items() if k != "r"}  # I→c, U→u, D→d
    op_expr = F.lit(None).cast("string")
    for dst, src in inv.items():
        op_expr = F.when(F.col(op_col) == dst, F.lit(src)).otherwise(op_expr)
    payload = F.struct(
        op_expr.alias("op"),
        F.when(is_del, record).alias("before"),
        F.when(~is_del, record).alias("after"),
        F.struct(
            (F.col(ts_col) if ts_col else F.lit(None).cast("long")).alias("ts_ms"),
            F.col(seq_col).cast("long").alias("seq"),
        ).alias("source"),
    )
    out = [F.to_json(F.struct(payload.alias("payload"))).alias("value")]
    out += [F.col(c) for c in (extra_cols or [])]
    return df.select(*out)


# ------------------------------------------------------------- Maxwell

_MAXWELL_OP_MAP = {
    "insert": "I", "bootstrap-insert": "I", "update": "U", "delete": "D",
}


def maxwell_schema(record_schema: T.StructType) -> T.StructType:
    """Schema of one Maxwell's-daemon message for ``record_schema`` rows
    (the OTHER widely-deployed MySQL binlog-tail format next to Debezium):
    flat envelope ``{database, table, type, ts, xid, data, old}`` — the
    full row image rides in ``data`` (deletes included), ``old`` carries
    only the CHANGED columns' previous values."""
    return T.StructType(
        [
            T.StructField("database", T.StringType()),
            T.StructField("table", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("ts", T.LongType()),
            T.StructField("xid", T.LongType()),
            T.StructField("data", record_schema),
            T.StructField("old", record_schema),
        ]
    )


def parse_maxwell(
    df: DataFrame,
    record_schema: T.StructType,
    value_col: str = "value",
    keep_raw: bool = True,
) -> DataFrame:
    """Typed change events from Maxwell JSON messages — a SUPERSET of
    :func:`parse_cdc_envelope`'s output shape: the shared columns (record
    columns, ``op`` I/U/D, ``commit_seq``, ``ts_ms``, optional
    ``raw_value``) match by name, plus two Maxwell-only ordering columns
    (``commit_ts``, ``commit_xid`` — see below). The two connector formats
    feed the same quarantine → LWW-merge pipeline; union them with
    ``unionByName(allowMissingColumns=True)`` (positional union or strict
    schema equality across connectors will not line up).

    Maxwell differences handled here: the row image is always ``data``
    (including deletes — Maxwell ships the full deleted row, where
    Debezium uses ``before``); ``bootstrap-insert`` (Maxwell's initial
    snapshot) maps to I like Debezium's ``r``; the total order is
    ``(ts, xid)``. Maxwell has no LSN field, so the output carries the
    pair as TWO ordering columns — ``commit_ts`` then ``commit_xid`` —
    and downstream LWW merges should use ``order_cols=("commit_ts",
    "commit_xid")``. A packed single ``commit_seq = ts * 2^20 + xid`` is
    ALSO emitted for callers wanting one column, with a documented
    hazard: MySQL's Xid is a server-lifetime monotone counter (routinely
    in the billions, far past 2^20) that RESETS on server restart, so
    the packed value inverts across a restart until ts advances past the
    old counter (~old_xid/2^20 seconds — hours on a busy server) and can
    keep pre-restart rows over newer post-restart updates; the two-column
    order only inverts within the restart second itself. Prefer the
    pair. Unparseable messages yield all-NULL typed columns for the
    downstream quarantine, evidence preserved in ``raw_value``."""
    parsed = F.from_json(F.col(value_col), maxwell_schema(record_schema))
    op = F.lit(None).cast("string")
    for src, dst in reversed(list(_MAXWELL_OP_MAP.items())):
        op = F.when(parsed["type"] == src, F.lit(dst)).otherwise(op)
    image = parsed["data"]
    cols = [image[f.name].alias(f.name) for f in record_schema.fields]
    cols += [
        op.alias("op"),
        parsed["ts"].alias("commit_ts"),
        F.coalesce(parsed["xid"], F.lit(0)).alias("commit_xid"),
        (parsed["ts"] * F.lit(1 << 20) + F.coalesce(parsed["xid"], F.lit(0)))
        .alias("commit_seq"),
        (parsed["ts"] * F.lit(1000)).alias("ts_ms"),
    ]
    if keep_raw:
        cols.append(F.col(value_col).alias(RAW_COL))
    return df.select(*cols)


def detect_schema_drift(
    df: DataFrame,
    known_fields,
    value_col: str = "value",
    json_path: str | None = None,
) -> DataFrame:
    """Schema-drift report over raw envelope JSON: which UNKNOWN fields are
    arriving, in how many messages, and a first example message per field.

    The lake applies additive schema evolution mechanically
    (``_merge_schemas``, q53); the operational question comes one step
    EARLIER — "the connector started shipping fields my record schema
    doesn't know; what are they and since when?" — because ``from_json``
    silently DROPS fields absent from the caller's schema. This inspects
    the raw messages instead: ``json_object_keys`` on the message (or on
    the object at ``json_path``, e.g. ``$.payload.after`` for Debezium
    envelopes), exploded, filtered to keys outside ``known_fields``,
    counted per field. All JVM-side (json_object_keys / get_json_object /
    explode / hash-agg, map-side combined); unparseable messages yield no
    keys and are the quarantine path's business, not this report's.

    Returns ``(field, n_messages, first_seen_example)`` — feed the fields
    into the record schema + lake evolution, or alert on them."""
    raw = F.col(value_col)
    obj = raw if json_path is None else F.get_json_object(raw, json_path)
    keys = F.json_object_keys(obj)
    known = [str(k) for k in known_fields]
    exploded = df.select(
        F.explode(keys).alias("field"), raw.alias("_msg")
    ).where(~F.col("field").isin(*known))
    return exploded.groupBy("field").agg(
        F.count(F.lit(1)).alias("n_messages"),
        F.min("_msg").alias("first_seen_example"),
    )
