"""Effective-gold timeline (SURVEY.md §2 J6/A14; reference
`utils.py:485-513`).

Per (match, participant), fold item events into a running
`effective_gold_spent`: +worth on ITEM_PURCHASED, −worth on
ITEM_DESTROYED / ITEM_SOLD, and −before+after on ITEM_UNDO. Item worth
comes from the per-version items dim with the reference's special cases:
item 0 → 0 and item 1018 → 2200 (`utils.py:485-491` — "rest in peace
banner of command").

Spark shape: broadcast item-dim lookups folded into `when` exprs, a
signed-delta column, and one cumulative-sum window — the declarative twin
of the reference's imperative fold. Gold-at-event-time for fights is the
as-of join of the fight timeline onto this running sum.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .joins import asof_join

ITEM_EVENT_TYPES = ("ITEM_PURCHASED", "ITEM_DESTROYED", "ITEM_SOLD", "ITEM_UNDO")


def _worth(item_col: Column, dim_worth: Column) -> Column:
    """Reference special cases, then the dim lookup (null-safe → 0 for
    unknown items, matching the guarded-default idiom)."""
    return (
        F.when(item_col.isNull() | (item_col == 0), F.lit(0))
        .when(item_col == 1018, F.lit(2200))
        .otherwise(F.coalesce(dim_worth, F.lit(0)))
    )


def effective_gold_timeline(
    events: DataFrame,
    items_dim: DataFrame,
    version_col: str = "semver",
) -> DataFrame:
    """events: timeline rows with (match_id, participant_id, ts_ms, type,
    item_id, before_id, after_id, `version_col`); items_dim:
    (semver, item_id, gold_total). Returns the input item events +
    `effective_gold` running totals.

    Three broadcast lookups (item, undo-before, undo-after) — the dim is
    tiny — then one window. The shuffle key (match, participant) is the
    natural partition of the fold.
    """
    item_events = events.filter(F.col("type").isin(*ITEM_EVENT_TYPES))

    def lookup(col_name: str, alias: str) -> DataFrame:
        return F.broadcast(
            items_dim.select(
                F.col("semver").alias(version_col),
                F.col("item_id").alias(col_name),
                F.col("gold_total").alias(alias),
            )
        )

    j = (
        item_events.join(lookup("item_id", "_w_item"), [version_col, "item_id"], "left")
        .join(lookup("before_id", "_w_before"), [version_col, "before_id"], "left")
        .join(lookup("after_id", "_w_after"), [version_col, "after_id"], "left")
    )
    w_item = _worth(F.col("item_id"), F.col("_w_item"))
    w_before = _worth(F.col("before_id"), F.col("_w_before"))
    w_after = _worth(F.col("after_id"), F.col("_w_after"))
    signed = (
        F.when(F.col("type") == "ITEM_PURCHASED", w_item)
        .when(F.col("type") == "ITEM_DESTROYED", -w_item)
        .when(F.col("type") == "ITEM_SOLD", -w_item)
        .when(F.col("type") == "ITEM_UNDO", -w_before + w_after)
        .otherwise(F.lit(0))
    )
    w = (
        Window.partitionBy("match_id", "participant_id")
        .orderBy(F.col("ts_ms").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        j.withColumn("gold_delta", signed)
        .withColumn("effective_gold", F.sum("gold_delta").over(w))
        .drop("_w_item", "_w_before", "_w_after")
    )


def gold_at_events(
    gold_timeline: DataFrame, target_events: DataFrame
) -> DataFrame:
    """Attach the running effective_gold to arbitrary (match,
    participant, ts) rows — the reference records the fold's current
    value on each kill/death (`utils.py:517-537`). As-of join (latest
    item event at-or-before the target ts); rows before any item event
    get 0."""
    left = target_events
    right = gold_timeline.select(
        "match_id", "participant_id", "ts_ms", "effective_gold"
    )
    out = asof_join(
        left,
        right,
        ["match_id", "participant_id"],
        "ts_ms",
        ["effective_gold"],
        suffix="_asof",
    )
    return out.withColumn(
        "effective_gold", F.coalesce(F.col("effective_gold_asof"), F.lit(0))
    ).drop("effective_gold_asof")
