"""Watermarked session windows (SURVEY.md T8).

Reference: fights group kill events by ≤15 s adjacency with a 30 s merge
horizon (`utils.py:538-626`) — computed after the fact over the full
timeline. The streaming variant groups live events into sessions as they
arrive: `session_window` keeps per-key session state, the watermark
bounds how late an event may extend a session (the reference's 'repair'
pass is the batch backfill for anything later).

The exact subset-merge semantics stay in `operators.fights.subset_merge`
(batch over closed sessions); this module owns the real-time
approximation the survey maps to `session_window` (§2.9 T8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_sessions(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    gap: str = "15 seconds",
    watermark_delay: str = "30 seconds",
    value_col: str | None = None,
) -> DataFrame:
    """Per (key, session): event count, span, and optional value sum.

    Streaming: state is evicted once the watermark passes session end —
    bounded memory at any scale. Batch: identical plan minus watermark,
    used by tests to cross-check the streaming result.
    """
    src = events
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark_delay)
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value")
        )
    return (
        src.groupBy(F.session_window(ts_col, gap), *key_cols)
        .agg(*aggs)
        .select(
            *key_cols,
            F.unix_millis(F.col("session_window.start")).alias("session_start_ms"),
            F.unix_millis(F.col("session_window.end")).alias("session_end_ms"),
            "n_events",
            *(["sum_value"] if value_col is not None else []),
        )
    )
