"""Repair/backfill pipeline (SURVEY.md §2.9 T6, §2.1 S2, §2.2 P2/P5;
reference `periodical_data_repair.py:39-107,332-497`).

The reference runs a hand-written SQL incompleteness report (CASE WHEN
col IS NULL projections), then walks the report row-by-row refetching
missing documents over the network and saving each one. Here the whole
repair is three declarative stages over the match store:

  1. `incompleteness_report` — null-presence flags per match (P2/P5);
  2. the repair *worklist* — report rows filtered to repairable gaps;
  3. `repair_matches` — cache-or-fetch hydration of the worklist
     (`sources.rest.hydrate_missing`-style, but keyed on the gap) and an
     idempotent latest-wins MERGE back into the store
     (`streaming.upsert.latest_wins_merge`) — late data as a batch
     MERGE, the T6 semantics.

Re-running repair is a no-op once gaps are filled (idempotent MERGE) —
the reference relies on IntegrityError races for the same property.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.rest import RestSource, parallel_fetch
from ..streaming.upsert import latest_wins_merge


def incompleteness_report(matches: DataFrame) -> DataFrame:
    """P2/P5: one row per match with *_missing booleans — the repair
    report of `periodical_data_repair.py:39-107` (computed-boolean
    projection + the duration/tier guards), as a single select the scan
    prunes to the referenced columns."""
    return matches.select(
        "match_id",
        "region_id",
        F.col("match_result_json").isNull().alias("result_missing"),
        F.col("match_timeline_json").isNull().alias("timeline_missing"),
        F.col("game_version_id").isNull().alias("version_missing"),
        (
            F.col("regional_tier_avg").isNotNull()
            & (F.coalesce(F.col("game_duration"), F.lit(0)) >= 300)
        ).alias("repair_eligible"),
    )


def repair_worklist(matches: DataFrame, url_for: str = "result") -> DataFrame:
    """Matches eligible for repair with at least one missing document."""
    report = incompleteness_report(matches)
    gaps = report.filter(
        F.col("repair_eligible")
        & (F.col("result_missing") | F.col("timeline_missing"))
    )
    return gaps.select(
        "match_id",
        "region_id",
        "result_missing",
        "timeline_missing",
        F.concat_ws(
            "/", F.lit("match"), F.col("region_id"), F.col("match_id")
        ).alias("url"),
    )


def repair_matches(
    matches: DataFrame,
    make_source: Callable[[], RestSource],
) -> DataFrame:
    """Full T6 pass: report → worklist → parallel fetch → latest-wins
    MERGE. Returns the repaired store (caller persists it)."""
    work = repair_worklist(matches)
    fetched = parallel_fetch(work.select("match_id", "region_id", "url"), make_source)
    updates = (
        fetched.join(
            work.select("match_id", "region_id", "url"), "url"
        )
        .filter(F.col("status") == "ok")
        .select(
            "match_id",
            "region_id",
            F.get_json_object("body", "$.result").alias("match_result_json"),
            F.get_json_object("body", "$.timeline").alias("match_timeline_json"),
            F.lit(2).alias("_phase"),
        )
    )
    current = matches.withColumn("_phase", F.lit(1))
    for c in current.columns:
        if c not in updates.columns:
            updates = updates.withColumn(c, F.lit(None).cast(current.schema[c].dataType))
    merged = latest_wins_merge(
        current, updates.select(*current.columns), ["match_id", "region_id"], "_phase"
    )
    return merged.drop("_phase")
