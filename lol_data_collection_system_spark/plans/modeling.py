"""Normalized match documents (SURVEY.md §2.1 S11, §3.3 step 3;
reference `match_modeling.py:270-316`).

The reference assembles a nested "normalized match" JSON per live match —
two teams (`is_topside` = teamId 200), each with player objects carrying
champion, real lane, summoner spells, runes, and the stat history — then
prints/dumps it. Here the document is built declaratively for EVERY
match in one job: nested `struct`/`collect_list` assembly, `to_json` out
(S11). The inverse (`from_json` with the same schema) round-trips, so the
document store stays queryable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalized_match_documents(
    participants: DataFrame,
    lane_map: DataFrame,
    history: DataFrame | None = None,
) -> DataFrame:
    """One row per match: (match_id, doc_json).

    participants: exploded participant rows (sources.documents);
    lane_map: champion_lane_mapping output; history (optional): per
    (account_id) stat-history rows to embed as `stat_history`.
    """
    p = participants.join(
        lane_map.select("match_id", "champion_id", F.col("lane").alias("reallane")),
        ["match_id", "champion_id"],
    )
    if history is not None:
        hist_struct = F.struct(
            *[F.col(c) for c in history.columns if c != "account_id"]
        )
        p = p.join(
            history.select("account_id", hist_struct.alias("stat_history")),
            "account_id",
            "left",
        )
    else:
        p = p.withColumn("stat_history", F.lit(None).cast("string"))

    player = F.struct(
        (F.col("team_id") == 200).alias("is_topside"),
        F.col("champion_id").alias("champion"),
        F.col("reallane").alias("role"),
        F.array(F.col("spell1_id"), F.col("spell2_id")).alias("summonerspells"),
        F.array(
            *[F.col("stats")[f"perk{i}"] for i in range(6)]
        ).alias("runes"),
        F.col("stat_history").alias("stat_history"),
    )
    per_team = (
        p.select("match_id", (F.col("team_id") == 200).alias("is_topside"),
                 player.alias("player"))
        .groupBy("match_id", "is_topside")
        .agg(F.sort_array(F.collect_list("player")).alias("players"))
    )
    teams = per_team.groupBy("match_id").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("is_topside"), F.col("players")))
        ).alias("teams")
    )
    return teams.select(
        "match_id",
        F.to_json(F.struct(F.col("match_id").alias("gameId"), F.col("teams"))).alias(
            "doc_json"
        ),
    )
