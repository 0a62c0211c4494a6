"""Match/timeline document decoding (SURVEY.md §2.1 S6, §2.2 P11/U1).

The reference stores match documents as TEXT and re-parses them with
`json.loads` at every use (`utils.py:866,874`); extraction is ~70 guarded
lambdas with missing-key defaults (`utils.py:763-845`). Here: one
`from_json` with the declared schema — parsed once, pruned by Catalyst —
and the guarded extraction as plain `coalesce(...)` column expressions
(JVM-side, codegen'd; U1's preferred surface).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import schemas


def decode_match_documents(matches: DataFrame) -> DataFrame:
    """match_result_json / match_timeline_json TEXT → typed nested columns.

    Keeps the relational spine columns; adds `result` and `timeline`
    structs. Downstream selects prune to the nested fields they touch —
    nested-schema pruning reaches the JSON parser, so a query that needs
    only `result.gameDuration` never materializes participants.
    """
    return matches.withColumns(
        {
            "result": F.from_json("match_result_json", schemas.MATCH_RESULT),
            "timeline": F.from_json("match_timeline_json", schemas.MATCH_TIMELINE),
        }
    )


def decode_with_quarantine(
    docs: DataFrame,
    json_col: str,
    schema,
    out_col: str = "parsed",
) -> tuple[DataFrame, DataFrame]:
    """Split a JSON text column into (decoded, quarantine): rows whose
    document parses against `schema` vs rows that don't (malformed JSON,
    or a document whose shape contradicts the schema everywhere).

    At 100 TB a bad-record rate of 10⁻⁶ is still thousands of rows; the
    reference's per-row `json.loads` + try/except silently drops them
    (`utils.py:866` catches and skips). Here the quarantine is a first-
    class frame a pipeline sinks next to the good data for replay after
    a parser fix — no row is silently lost, and both frames come from
    ONE pass (a shared `from_json` projection; Spark evaluates it once
    per row, the filter just routes).

    PERMISSIVE `from_json` yields an all-null STRUCT (not null) for
    malformed text, so mere null-checking can't detect corruption — the
    canonical detector is `columnNameOfCorruptRecord`: the parser stores
    the raw text there iff the document failed. Null input quarantines
    too (the reference treats missing documents as absent)."""
    from pyspark.sql import types as T

    corrupt = "_corrupt_record"
    aug = T.StructType(
        list(schema.fields) + [T.StructField(corrupt, T.StringType())]
    )
    parsed = docs.withColumn(
        out_col,
        F.from_json(
            F.col(json_col),
            aug,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt},
        ),
    )
    is_bad = F.col(json_col).isNull() | F.col(out_col)[corrupt].isNotNull()
    ok = parsed.filter(~is_bad).withColumn(
        out_col, F.col(out_col).dropFields(corrupt)
    )
    bad = parsed.filter(is_bad).drop(out_col)
    return ok, bad


def explode_participants(decoded: DataFrame) -> DataFrame:
    """participants ⋈ participantIdentities on participantId (J3) —
    exploded to one row per (match, participant) with the identity joined
    in-document via `filter` on the identities array (no shuffle: the
    pairing never leaves the row)."""
    p = decoded.select(
        "match_id",
        "region_id",
        F.col("result.gameDuration").alias("game_duration"),
        F.col("result.gameVersion").alias("game_version"),
        F.explode("result.participants").alias("p"),
        F.col("result.participantIdentities").alias("ids"),
    )
    ident = F.element_at(
        F.filter(
            F.col("ids"),
            lambda i: i["participantId"] == F.col("p.participantId"),
        ),
        1,
    )
    return p.select(
        "match_id",
        "region_id",
        "game_duration",
        "game_version",
        F.col("p.participantId").alias("participant_id"),
        F.col("p.teamId").alias("team_id"),
        F.col("p.championId").alias("champion_id"),
        F.col("p.spell1Id").alias("spell1_id"),
        F.col("p.spell2Id").alias("spell2_id"),
        F.col("p.stats").alias("stats"),
        F.col("p.timeline").alias("tl"),
        ident["player"]["accountId"].alias("account_id"),
        ident["player"]["summonerName"].alias("summoner_name"),
    )


def explode_timeline_events(decoded: DataFrame) -> DataFrame:
    """frames[*].events[*] → one row per event (S6 + the event stream of
    §1.1), keyed by match. Event timestamps are ms since match start."""
    ev = decoded.select(
        "match_id",
        "region_id",
        F.explode("timeline.frames").alias("frame"),
    ).select(
        "match_id",
        "region_id",
        F.explode("frame.events").alias("e"),
    )
    return ev.select(
        "match_id",
        "region_id",
        F.col("e.type").alias("type"),
        F.col("e.timestamp").alias("ts_ms"),
        F.col("e.participantId").alias("participant_id"),
        F.col("e.itemId").alias("item_id"),
        F.col("e.beforeId").alias("before_id"),
        F.col("e.afterId").alias("after_id"),
        F.col("e.killerId").alias("killer_id"),
        F.col("e.victimId").alias("victim_id"),
        F.col("e.assistingParticipantIds").alias("assists"),
        F.col("e.position.x").alias("pos_x"),
        F.col("e.position.y").alias("pos_y"),
    )


def explode_participant_frames(
    decoded: DataFrame, first_minute: int = 1, last_minute: int = 6
) -> DataFrame:
    """frames[1..6].participantFrames — the minutely position snapshots
    role inference reads (`utils.py:441-448`). The string-keyed map is
    exploded; a missing position defaults to (-120, -120)
    (`utils.py:446-447`)."""
    framed = decoded.select(
        "match_id",
        "region_id",
        F.posexplode("timeline.frames").alias("minute", "frame"),
    ).filter(F.col("minute").between(first_minute, last_minute))
    pf = framed.select(
        "match_id",
        "region_id",
        "minute",
        F.explode("frame.participantFrames").alias("pid_str", "pf"),
    )
    return pf.select(
        "match_id",
        "region_id",
        "minute",
        F.col("pf.participantId").alias("participant_id"),
        F.coalesce(F.col("pf.position.x"), F.lit(-120)).alias("pos_x"),
        F.coalesce(F.col("pf.position.y"), F.lit(-120)).alias("pos_y"),
    )


# ---------------------------------------------------------------------------
# Guarded stat extraction — the 12 rules of get_stats_history
# (`utils.py:766-788` subset used by the history pipeline; the same
# pattern extends to the full ~70-rule table of `utils.py:763-845`)
# ---------------------------------------------------------------------------
def _delta(tl: Column, family: str, bucket: str) -> Column:
    # reference default: 0 when the family or bucket is absent
    return F.coalesce(F.element_at(tl[family], bucket), F.lit(0.0))


def history_stat_columns(stats: Column, tl: Column) -> dict[str, Column]:
    """The exact per-game stats averaged by `get_stats_history`
    (`utils.py:766-788`): gold, per-10-min gold buckets, damage, xp-diff
    buckets, champ level — missing delta keys default to 0."""
    out: dict[str, Column] = {
        "gold_earned": stats["goldEarned"].cast("double"),
        "gold_spent": stats["goldSpent"].cast("double"),
        "damage_to_champions_total": stats["totalDamageDealtToChampions"].cast(
            "double"
        ),
        "champion_level": stats["champLevel"].cast("double"),
    }
    for b_label, b_key in [
        ("0_to_10", "0-10"),
        ("10_to_20", "10-20"),
        ("20_to_30", "20-30"),
        ("30_to_40", "30-40"),
    ]:
        out[f"gold_per_min_{b_label}"] = _delta(tl, "goldPerMinDeltas", b_key)
        out[f"xp_gained_diff_per_min_{b_label}"] = _delta(
            tl, "xpDiffPerMinDeltas", b_key
        )
    return out


HISTORY_STAT_NAMES = [
    "gold_earned",
    "gold_spent",
    "gold_per_min_0_to_10",
    "gold_per_min_10_to_20",
    "gold_per_min_20_to_30",
    "gold_per_min_30_to_40",
    "damage_to_champions_total",
    "xp_gained_diff_per_min_0_to_10",
    "xp_gained_diff_per_min_10_to_20",
    "xp_gained_diff_per_min_20_to_30",
    "xp_gained_diff_per_min_30_to_40",
    "champion_level",
]
