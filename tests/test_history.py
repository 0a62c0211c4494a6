"""Golden end-to-end test (SURVEY.md §5 item 2): the full history
pipeline — JSON decode → participant/timeline explode → lane inference →
fight parse → means/streaks/profile — vs the pure-Python oracle of the
reference semantics in lol_fixture.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lol_data_collection_system_spark import schemas
from lol_data_collection_system_spark.plans import history as history_plan
from lol_data_collection_system_spark.plans import lanes as lanes_plan
from lol_data_collection_system_spark.sources import documents as doc_src

from lol_fixture import (
    T0,
    historical_match_rows,
    oracle_history,
    scenario,
)

MAX_GAMES = 6


@pytest.fixture(scope="module")
def pipeline_result(spark):
    anchors, matchlist, docs, timelines = scenario()
    anchors_df = spark.createDataFrame(
        anchors, ["account_id", "reallane", "match_time_ms"]
    )
    ml_df = spark.createDataFrame(
        [tuple(m[f.name] for f in schemas.MATCHLIST_ENTRY.fields) for m in matchlist],
        schemas.MATCHLIST_ENTRY,
    )
    hm_df = spark.createDataFrame(
        historical_match_rows(docs, timelines), schemas.HISTORICAL_MATCH
    )
    decoded = doc_src.decode_match_documents(hm_df)
    participants = doc_src.explode_participants(decoded)
    pframes = doc_src.explode_participant_frames(decoded)
    lane_map = lanes_plan.champion_lane_mapping(participants, pframes)
    kills = (
        doc_src.explode_timeline_events(decoded)
        .filter(F.col("type") == "CHAMPION_KILL")
        .select(
            "match_id",
            "ts_ms",
            F.col("killer_id").cast("long").alias("killer"),
            F.col("victim_id").cast("long").alias("victim"),
            F.col("assists").cast("array<long>").alias("assists"),
        )
    )
    matches_dim = decoded.select("match_id", "game_duration")
    result = history_plan.stats_history(
        anchors_df,
        ml_df,
        matches_dim,
        participants,
        lane_map,
        kills,
        max_weeks=3,
        max_games=MAX_GAMES,
    )
    rows = {r.account_id: r.asDict() for r in result.collect()}
    expected = {
        acct: oracle_history(acct, lane, t, matchlist, docs, timelines,
                             max_weeks=3, max_games=MAX_GAMES)
        for acct, lane, t in anchors
    }
    return rows, expected


def test_all_accounts_present(pipeline_result):
    rows, expected = pipeline_result
    assert set(rows) == set(expected) == {1001, 1002, 1003}


@pytest.mark.parametrize("acct", [1001, 1002, 1003])
def test_history_matches_oracle(pipeline_result, acct):
    rows, expected = pipeline_result
    got, want = rows[acct], expected[acct]
    for key, want_val in want.items():
        assert key in got, f"{acct}: missing field {key}"
        got_val = got[key]
        if want_val is None:
            assert got_val is None, f"{acct}.{key}: {got_val} != None"
        elif isinstance(want_val, float):
            assert got_val == pytest.approx(want_val, rel=1e-9), (
                f"{acct}.{key}: {got_val} != {want_val}"
            )
        else:
            assert got_val == want_val, f"{acct}.{key}: {got_val} != {want_val}"


def test_lane_mapping_forced_slots(spark):
    """Role inference lands every slot profile on its designed lane."""
    anchors, matchlist, docs, timelines = scenario()
    hm_df = spark.createDataFrame(
        historical_match_rows(docs, timelines), schemas.HISTORICAL_MATCH
    )
    decoded = doc_src.decode_match_documents(hm_df)
    participants = doc_src.explode_participants(decoded)
    pframes = doc_src.explode_participant_frames(decoded)
    lane_map = lanes_plan.champion_lane_mapping(participants, pframes)
    got = {
        (r.match_id, r.participant_id): r.lane
        for r in lane_map.filter(F.col("match_id") == 1).collect()
    }
    assert got == {
        (1, 1): "JUNGLE", (1, 2): "SUPPORT", (1, 3): "TOP",
        (1, 4): "BOTTOM", (1, 5): "MID",
        (1, 6): "JUNGLE", (1, 7): "SUPPORT", (1, 8): "TOP",
        (1, 9): "BOTTOM", (1, 10): "MID",
    }


def test_cap_and_remake_quirks(pipeline_result):
    """num_games counts every in-window matchlist entry minus processed
    remakes; the cap processes one extra entry per prior remake."""
    rows, _ = pipeline_result
    a = rows[1001]
    assert a["num_games"] == 9          # 10 entries − 1 processed remake
    assert a["num_games_in_current_lane"] == 4  # g1,g2,g5,g7 are MID
    assert a["previous_game_won"] == 1  # g1 won
    # walk wins over processed non-remakes: W W L L L L → last run len 4
    assert a["consecutive_wins"] == 0
    assert a["consecutive_losses"] == 3
    assert a["lane_priority"] == "primary"


def test_availability_matches_oracle(spark):
    from lol_fixture import champion_of, oracle_availability

    anchors, matchlist, docs, timelines = scenario()
    # current loadouts: champion from g1's MID slot; non-smite spells;
    # runes of the (odd pid, odd match) variant
    avail_anchors = [
        (1001, "MID", champion_of(1, 5), [4, 12],
         [9100 + 7 + 31 + i for i in range(6)], T0),
        (1003, "BOTTOM", 1, [4, 12], [1, 2, 3, 4, 5, 6], T0),
    ]
    anchors_df = spark.createDataFrame(
        avail_anchors,
        "account_id long, reallane string, current_champion long, "
        "spells_set array<int>, runes_set array<long>, match_time_ms long",
    )
    ml_df = spark.createDataFrame(
        [tuple(m[f.name] for f in schemas.MATCHLIST_ENTRY.fields) for m in matchlist],
        schemas.MATCHLIST_ENTRY,
    )
    hm_df = spark.createDataFrame(
        historical_match_rows(docs, timelines), schemas.HISTORICAL_MATCH
    )
    decoded = doc_src.decode_match_documents(hm_df)
    participants = doc_src.explode_participants(decoded)
    pframes = doc_src.explode_participant_frames(decoded)
    lane_map = lanes_plan.champion_lane_mapping(participants, pframes)
    got = {
        r.account_id: r.asDict()
        for r in history_plan.stats_availability(
            anchors_df, ml_df, decoded.select("match_id", "game_duration"),
            participants, lane_map,
        ).collect()
    }
    for acct, lane, champ, spells, runes, t in avail_anchors:
        want = oracle_availability(
            acct, champ, lane, spells, runes, t, matchlist, docs, timelines
        )
        for k, v in want.items():
            assert got[acct][k] == v, f"{acct}.{k}: {got[acct][k]} != {v}"
    assert got[1001]["num_matches"] == 10
    assert got[1001]["num_matches_as_champion"] == 1
    assert got[1001]["num_matches_with_runes"] == 4


def test_normalized_match_documents_roundtrip(spark):
    """S11: nested document assembly + to_json, verified by re-parsing."""
    import json as _json

    from lol_data_collection_system_spark.plans import modeling

    _, _, docs, timelines = scenario()
    hm_df = spark.createDataFrame(
        historical_match_rows(docs, timelines), schemas.HISTORICAL_MATCH
    )
    decoded = doc_src.decode_match_documents(hm_df)
    participants = doc_src.explode_participants(decoded)
    pframes = doc_src.explode_participant_frames(decoded)
    lane_map = lanes_plan.champion_lane_mapping(participants, pframes)
    out = {
        r.match_id: _json.loads(r.doc_json)
        for r in modeling.normalized_match_documents(participants, lane_map)
        .filter(F.col("match_id") == 1)
        .collect()
    }
    doc = out[1]
    assert doc["gameId"] == 1
    assert len(doc["teams"]) == 2
    sides = {t["is_topside"] for t in doc["teams"]}
    assert sides == {True, False}
    for team in doc["teams"]:
        assert len(team["players"]) == 5
        roles = sorted(pl["role"] for pl in team["players"])
        assert roles == ["BOTTOM", "JUNGLE", "MID", "SUPPORT", "TOP"]
        for pl in team["players"]:
            assert len(pl["summonerspells"]) == 2
            assert len(pl["runes"]) == 6
    # topside team = teamId 200 → champions 6..10 of match 1
    top = next(t for t in doc["teams"] if t["is_topside"])
    assert sorted(pl["champion"] for pl in top["players"]) == [106, 107, 108, 109, 110]


def test_two_anchors_per_account_do_not_interleave(spark):
    """A second anchor for the same account (earlier cutoff) must produce
    its own independent history row — walk ranks, counters, and means
    keyed by (account_id, anchor_ts), not mixed across anchors."""
    anchors, matchlist, docs, timelines = scenario()
    acct, lane, t_new = anchors[0]
    t_old = t_new - 7 * 24 * 60 * 60 * 1000  # one week earlier cutoff
    two = [(acct, lane, t_new), (acct, lane, t_old)]

    anchors_df = spark.createDataFrame(
        two, ["account_id", "reallane", "match_time_ms"]
    )
    ml_df = spark.createDataFrame(
        [tuple(m[f.name] for f in schemas.MATCHLIST_ENTRY.fields) for m in matchlist],
        schemas.MATCHLIST_ENTRY,
    )
    hm_df = spark.createDataFrame(
        historical_match_rows(docs, timelines), schemas.HISTORICAL_MATCH
    )
    decoded = doc_src.decode_match_documents(hm_df)
    participants = doc_src.explode_participants(decoded)
    pframes = doc_src.explode_participant_frames(decoded)
    lane_map = lanes_plan.champion_lane_mapping(participants, pframes)
    kills = (
        doc_src.explode_timeline_events(decoded)
        .filter(F.col("type") == "CHAMPION_KILL")
        .select(
            "match_id",
            "ts_ms",
            F.col("killer_id").cast("long").alias("killer"),
            F.col("victim_id").cast("long").alias("victim"),
            F.col("assists").cast("array<long>").alias("assists"),
        )
    )
    matches_dim = decoded.select("match_id", "game_duration")
    result = history_plan.stats_history(
        anchors_df, ml_df, matches_dim, participants, lane_map, kills,
        max_weeks=3, max_games=MAX_GAMES,
    )
    rows = {r.match_time_ms: r.asDict() for r in result.collect()}
    assert set(rows) == {t_new, t_old}, "one history row per anchor"
    for t in (t_new, t_old):
        want = oracle_history(acct, lane, t, matchlist, docs, timelines,
                              max_weeks=3, max_games=MAX_GAMES)
        got = rows[t]
        for key, want_val in want.items():
            got_val = got[key]
            if want_val is None:
                assert got_val is None, f"anchor {t} field {key}"
            elif isinstance(want_val, float):
                assert got_val == pytest.approx(want_val, rel=1e-9), (
                    f"anchor {t} field {key}: {got_val} != {want_val}"
                )
            else:
                assert got_val == want_val, (
                    f"anchor {t} field {key}: {got_val} != {want_val}"
                )
