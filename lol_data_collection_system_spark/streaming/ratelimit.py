"""Sliding-window rate accounting (SURVEY.md T5/A15).

Reference: every API request is INSERTed into a MySQL table guarded by
LOCK TABLES; each permit check rescans the last N seconds per (region,
method) and compares to the quota
(`mysql_requesthistory_checking.py:46-139`). The lock serializes every
concurrent gatherer — the throughput ceiling of the whole system.

Streaming redesign: requests arrive on a stream; a sliding event-time
window (`window(ts, timeframe, slide)`) maintains per-key counts
incrementally with watermarked state eviction — no locks, no rescans,
parallel across keys. Quota comparison is a broadcast join against the
limits dim; `over_quota` rows feed whatever throttle/alert sink the
caller attaches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sliding_quota_counts(
    requests: DataFrame,
    quotas: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    window_seconds: int = 10,
    slide_seconds: int = 5,
    watermark_delay: str = "30 seconds",
) -> DataFrame:
    """Per (key, sliding window): request count joined to its quota.

    Works identically on a streaming or batch `requests` frame (the
    watermark is applied only when streaming). `quotas` must carry
    key_cols + `max_requests` and is broadcast (tiny dim).
    """
    src = requests
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark_delay)
    counted = src.groupBy(
        F.window(ts_col, f"{window_seconds} seconds", f"{slide_seconds} seconds"),
        *key_cols,
    ).agg(F.count(F.lit(1)).alias("n_requests"))
    return counted.join(F.broadcast(quotas), key_cols, "left").select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *key_cols,
        "n_requests",
        "max_requests",
        (F.col("n_requests") > F.col("max_requests")).alias("over_quota"),
    )
