"""Two-phase upsert + exactly-once claim semantics (SURVEY.md T3/T4).

Reference: a match row is written in two phases — pre-game tier columns,
then post-game result/timeline JSON (`active_data_gathering.py:67-124`);
concurrent gatherers race on the unique (match_id, region) key and the
loser aborts via IntegrityError (`:36-41`). Locks + constraint errors do
the coordination.

Streaming redesign: `foreachBatch` + deterministic latest-wins MERGE into
a keyed parquet store. Idempotency replaces locking — replays and
duplicates collapse to the same final state, so exactly-once *effect* is
achieved over at-least-once delivery. Phase-2 rows COALESCE per column
over phase-1 rows (fill, not overwrite-with-null) — the reference's
"repair"/backfill semantics (T6) fall out of the same merge.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def latest_wins_merge(
    current: DataFrame | None,
    updates: DataFrame,
    key_cols: list[str],
    seq_col: str,
) -> DataFrame:
    """Pure-DataFrame MERGE: union current + updates, keep per key the
    row with max seq, column-wise COALESCE from newest to oldest so later
    phases fill nulls without erasing earlier phases' columns.

    Ties on seq (two updates claiming the same phase) break on a stable
    hash of the full row payload — without it, `first(ignorenulls)` /
    `row_number` would pick whichever row the shuffle happened to order
    first, and a replay could legitimately produce a different store
    state, breaking the documented idempotent-MERGE contract."""
    u = updates
    if current is not None:
        u = current.unionByName(updates, allowMissingColumns=True)
    value_cols = [c for c in u.columns if c not in key_cols]
    tiebreak = F.xxhash64(*[F.col(c).cast("string") for c in value_cols])
    w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).desc(), tiebreak.asc())
    filled = u.select(
        *key_cols,
        *[
            F.first(c, ignorenulls=True).over(
                w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
            ).alias(c)
            for c in value_cols
        ],
        F.row_number().over(w).alias("_rn"),
    )
    return filled.filter(F.col("_rn") == 1).drop("_rn")


def latest_wins_upsert_sink(
    store_path: str, key_cols: list[str], seq_col: str
):
    """foreachBatch sink: MERGE each micro-batch into a parquet store.

    Deterministic + idempotent: re-running a batch yields the same store
    state (the reference's IntegrityError race resolution becomes a
    pure function of the data). For a production lakehouse this is
    `MERGE INTO` on Delta/Iceberg; plain parquet keeps the container
    dependency-free while preserving identical semantics.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        current = None
        if os.path.exists(store_path):
            current = spark.read.parquet(store_path)
        merged = latest_wins_merge(current, batch_df, key_cols, seq_col)
        # localCheckpoint materializes before the overwrite truncates the
        # input — the classic read-then-overwrite-same-path hazard.
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(store_path)

    return write_batch


def two_phase_upsert(
    stream: DataFrame,
    store_path: str,
    key_cols: list[str],
    seq_col: str,
    checkpoint_dir: str,
):
    """Wire a (possibly two-phase) update stream into the upsert store.
    Returns the StreamingQuery; callers trigger availableNow for batch
    catch-up or processingTime for continuous ingestion."""
    return (
        stream.writeStream.foreachBatch(
            latest_wins_upsert_sink(store_path, key_cols, seq_col)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
