"""Streaming exact deduplication — the online half of the corpus dedup
family (`operators/dedup.exact_dup_groups` is the batch half).

Reference analog: the collector's per-row get-or-create guards
(`utils.py` add-if-absent upserts) are a row-at-a-time dedup against the
database; the stream-native form keeps the seen-set as watermarked
operator state instead of a DB round-trip per row.

Scale posture: state is keyed by the 16-byte content fingerprint, so the
store holds one small row per distinct document seen within the
watermark horizon; eviction is watermark-driven (without a horizon the
seen-set grows unboundedly — exact forever-dedup at 100 TB belongs to
the batch pass, this operator dedups the live window). Works identically
on batch frames (no watermark, plain dropDuplicates) so tests can
cross-check stream vs batch output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.text import fingerprint


def dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Keep the first arrival of each distinct (normalized) content
    fingerprint within the watermark horizon; later copies are dropped.

    Streaming frames use `dropDuplicatesWithinWatermark` — state for a
    fingerprint is evictable once the watermark passes its first-seen
    event time, which bounds the store while still catching every
    duplicate whose arrival skew is within `watermark_delay`. Batch
    frames take the plain `dropDuplicates` path (same keep-first-by-
    fingerprint semantics, no horizon).
    """
    fp = docs.withColumn("fp", fingerprint(F.col(text_col)))
    if fp.isStreaming:
        return fp.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(["fp"])
    return fp.dropDuplicates(["fp"])
