"""Streaming windowed aggregation with watermark-bounded late data.

The streaming twin of ``operators.temporal.tumbling_window_agg``: the same
epoch-aligned tumbling windows, maintained continuously over a stream with
a watermark that (a) bounds the aggregation state Spark must retain (only
windows newer than watermark stay open — at 10^10 events/day the state
would otherwise grow without bound) and (b) defines the late-data
contract: events older than the watermark are dropped rather than
reopening closed windows. In append mode a window emits exactly once,
when the watermark passes its end — the exactly-once-per-window feed a
downstream rollup table wants.

Semantics note (Spark >= 3.4): late DATA is filtered with the watermark
of the PREVIOUS micro-batch while state EVICTION uses the current one, so
an event landing in the same micro-batch that advances the watermark past
its window is still admitted; only events a full batch behind are dropped
(observable as numRowsDroppedByWatermark in the streaming progress).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def streaming_tumbling_agg(
    stream_df: DataFrame,
    ts_col: str,
    window_duration: str,
    watermark_delay: str,
    group_cols: Sequence[str] = (),
    *aggs: Column,
) -> DataFrame:
    """Watermarked tumbling-window aggregation over a stream.

    ``aggs`` default to ``count(*) AS n``. Output carries ``w_start_us`` /
    ``w_end_us`` (epoch micros — the same stable window identity the batch
    twin emits) plus the group columns and aggregates."""
    if not aggs:
        aggs = (F.count(F.lit(1)).alias("n"),)
    win = F.window(F.col(ts_col), window_duration)
    out = (
        stream_df.withWatermark(ts_col, watermark_delay)
        .groupBy(win.alias("_w"), *[F.col(c) for c in group_cols])
        .agg(*aggs)
    )
    return out.select(
        F.unix_micros(F.col("_w.start")).alias("w_start_us"),
        F.unix_micros(F.col("_w.end")).alias("w_end_us"),
        *group_cols,
        *[c for c in out.columns if c != "_w" and c not in group_cols],
    )


def streaming_dedup(
    stream_df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    watermark_delay: str,
) -> DataFrame:
    """At-least-once → effectively-once event feed: drop re-deliveries of
    the same change event (same ``key_cols`` identity — for a CDC log that
    is the full (repo, path, commit) event identity, NOT just the row key)
    arriving within the watermark horizon.

    Built on ``dropDuplicatesWithinWatermark``: dedup state is evicted once
    the watermark passes an event's timestamp, so state is bounded by
    horizon × event rate — a plain streaming ``dropDuplicates`` would pin
    every identity ever seen (unbounded at 10^10 events). Re-deliveries
    straggling in LATER than the horizon are not this operator's problem
    by design: they reach the sink, where the idempotent batch-id commit
    and the LWW merge (same identity ⇒ same winner) absorb them — the
    standard two-layer contract: cheap in-horizon dedup here, exactness at
    the sink."""
    return stream_df.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def streaming_session_agg(
    stream_df: DataFrame,
    ts_col: str,
    gap_duration: str,
    watermark_delay: str,
    group_cols: Sequence[str] = (),
    *aggs: Column,
) -> DataFrame:
    """Watermarked SESSION-window aggregation over a stream (the streaming
    twin of ``operators.temporal.sessionize``): per key, events closer
    than ``gap_duration`` fuse into one session; a session closes — and in
    append mode emits exactly once — when the watermark passes its end.

    Built on Spark's native ``session_window`` (dynamic merging windows
    maintained in the state store), NOT a custom applyInPandasWithState
    loop: state per open session, merged server-side on arrival, evicted
    at watermark — bounded by (open sessions × keys), which is what keeps
    per-key session state viable at 10^10 events/day. Output carries
    ``s_start_us`` / ``s_end_us`` (epoch micros; end = last event + gap,
    Spark's session identity) plus group columns and aggregates
    (default ``count(*) AS n``)."""
    if not aggs:
        aggs = (F.count(F.lit(1)).alias("n"),)
    win = F.session_window(F.col(ts_col), gap_duration)
    out = (
        stream_df.withWatermark(ts_col, watermark_delay)
        .groupBy(win.alias("_w"), *[F.col(c) for c in group_cols])
        .agg(*aggs)
    )
    return out.select(
        F.unix_micros(F.col("_w.start")).alias("s_start_us"),
        F.unix_micros(F.col("_w.end")).alias("s_end_us"),
        *group_cols,
        *[c for c in out.columns if c != "_w" and c not in group_cols],
    )
