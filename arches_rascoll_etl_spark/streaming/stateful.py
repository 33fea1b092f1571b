"""Stateful streaming LWW — the engine's core merge as a native streaming
operator.

``stream_into_table`` (pipeline.py) gives exactly-once lake application via
foreachBatch; this module is the other streaming shape: a continuously
maintained per-key winner via ``applyInPandasWithState`` (the public API for
custom stateful operators). Each micro-batch updates per-key state with the
greatest ``(order_cols...)`` event and emits the new winner (update
semantics) — downstream consumers see a change stream of current winners.

State is the winning row itself (one row per key — bounded by key count,
not event count). The in-batch pre-collapse happens in pandas (vectorized
sort_values/tail, no per-row Python), so state updates touch one candidate
row per key per batch.

Scale notes: state is partitioned by the grouping keys across executors
(same shuffle as the batch LWW); RocksDB state store handles key counts
beyond executor memory (config: spark.sql.streaming.stateStore.providerClass).
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def streaming_lww(
    stream_df: DataFrame,
    keys: Sequence[str] = ("repo", "path"),
    order_cols: Sequence[str] = ("commit_seq", "commit"),
) -> DataFrame:
    """Per-key LWW winners over a stream. Emits the current winner for every
    key updated in a micro-batch (update output mode)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    keys = list(keys)
    order_cols = list(order_cols)
    schema = stream_df.schema
    payload_fields = [f for f in schema.fields if f.name not in keys]
    payload_names = [f.name for f in payload_fields]
    state_schema = T.StructType(payload_fields)
    out_schema = T.StructType(
        [schema[k] for k in keys] + payload_fields
    )

    def _py(v):
        return v.item() if hasattr(v, "item") else v

    def _ord(row: dict[str, Any]) -> tuple:
        return tuple(row[c] for c in order_cols)

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        # in-batch collapse, vectorized: greatest (order_cols) row per batch
        best = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            cand = pdf.sort_values(order_cols, kind="mergesort").iloc[-1]
            row = {c: _py(cand[c]) for c in payload_names}
            if best is None or _ord(row) > _ord(best):
                best = row
        if best is None:
            return
        if state.exists:
            prev = dict(zip(payload_names, state.get))
            if _ord(prev) >= _ord(best):
                return  # stale events only: no state change, emit nothing
        state.update(tuple(best[c] for c in payload_names))
        out = {k: [v] for k, v in zip(keys, key)}
        out.update({c: [best[c]] for c in payload_names})
        yield pd.DataFrame(out)

    return stream_df.groupBy(*keys).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
