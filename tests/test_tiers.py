"""Tier ordinal averaging (A5/U5) vs the reference semantics
(`enumerations.py:26-32`): UNRANKED exclusion, banker's rounding, and
the all-UNRANKED → "UNRANKED" case, including the two-level
(team → match) mean of `utils.py:89-94`."""

from __future__ import annotations

from lol_data_collection_system_spark.operators.tiers import (
    TIERS,
    tier_average,
    two_level_tier_average,
)


def _python_reference_average(tiers: list[str]) -> str:
    ranked = [t for t in tiers if t != "UNRANKED"]
    nums = [TIERS.index(t) for t in ranked]
    if not nums:
        return "UNRANKED"
    return TIERS[round(sum(nums) / len(nums))]


def test_tier_average_matches_reference(spark):
    groups = {
        "g_mixed": ["GOLD V", "GOLD III", "UNRANKED", "SILVER I"],
        "g_bankers_low": ["BRONZE V", "BRONZE IV"],   # mean 0.5 → bankers 0
        "g_bankers_high": ["BRONZE III", "BRONZE II"],  # mean 2.5 → bankers 2
        "g_unranked": ["UNRANKED", "UNRANKED"],
        "g_single": ["CHALLENGER I"],
    }
    rows = [(g, t) for g, ts in groups.items() for t in ts]
    df = spark.createDataFrame(rows, ["grp", "tier"])
    got = {r.grp: r.avg_tier for r in tier_average(df, ["grp"]).collect()}
    want = {g: _python_reference_average(ts) for g, ts in groups.items()}
    assert got == want
    assert got["g_bankers_low"] == "BRONZE V"      # round(0.5) == 0
    assert got["g_bankers_high"] == "BRONZE III"   # round(2.5) == 2
    assert got["g_unranked"] == "UNRANKED"


def test_two_level_tier_average(spark):
    # match 1: team A avg GOLD V (10), team B avg SILVER V (5) → match
    # avg of [10, 5] = 7.5 → bankers 8 → SILVER II
    rows = [
        (1, "A", "GOLD IV"), (1, "A", "GOLD I"),      # 11,14 → 12.5 → 12 GOLD III
        (1, "B", "SILVER V"), (1, "B", "SILVER V"),   # 5 SILVER V
    ]
    df = spark.createDataFrame(rows, ["match_id", "team", "tier"])
    inner = {
        (r.match_id, r.team): r.avg_tier
        for r in tier_average(df, ["match_id", "team"]).collect()
    }
    assert inner == {(1, "A"): "GOLD III", (1, "B"): "SILVER V"}
    outer = {
        r.match_id: r.avg_tier
        for r in two_level_tier_average(df, ["match_id"], ["team"]).collect()
    }
    # [12, 5] → 8.5 → bankers 8 → SILVER II
    assert outer == {1: TIERS[8]}
