"""Recurrent-delta pipeline vs an inline Python oracle of the reference
fold (find_recurrent_delta_across_n_games.py:96-203), including the
idx ≥ k quirk and the global on-champion cap."""

from __future__ import annotations

import pytest

from lol_data_collection_system_spark.plans.deltas import recurrent_deltas

T0 = 1_700_000_000_000
HOUR = 3_600_000


def _fixture(spark):
    anchors = spark.createDataFrame(
        [(1, 3, 77, T0)],
        ["account_id", "anchor_pid", "anchor_champion", "match_time_ms"],
    )
    # walk order = newest first: g1..g6; g4 is another champion
    ml_rows = []
    lanes = {1: ("MID", "SOLO"), 2: ("MID", "SOLO"), 3: ("TOP", "SOLO"),
             4: ("MID", "SOLO"), 5: ("MID", "SOLO"), 6: ("MID", "SOLO")}
    for g in range(1, 7):
        champ = 99 if g == 4 else 77
        ml_rows.append(
            (1, 1, g, "EUW1", champ, lanes[g][0], lanes[g][1], T0 - 1000 - g * HOUR)
        )
    matchlist = spark.createDataFrame(
        ml_rows,
        "account_id long, region_id long, game_id long, platform_id string, "
        "champion_id long, lane string, role string, game_creation_ms long",
    )
    kda = {1: (1, 2, 3), 2: (4, 0, 2), 3: (9, 9, 9), 5: (2, 2, 2), 6: (6, 1, 0)}
    p_rows = [
        (g, 3, {"kills": k, "deaths": d, "assists": a})
        for g, (k, d, a) in kda.items()
    ]
    participants = spark.createDataFrame(
        p_rows,
        "match_id long, participant_id int, "
        "stats struct<kills:int,deaths:int,assists:int>",
    )
    return anchors, matchlist, participants, kda


def _oracle(kda, order, lanes, ks=(2, 3, 4)):
    per_lane: dict[str, list[tuple]] = {}
    out = {}
    for g in order:
        lr = "_".join(lanes[g])
        per_lane.setdefault(lr, []).append(g)
        idx = len(per_lane[lr]) - 1
        row = {}
        for k in ks:
            if idx - k >= 0:
                window = per_lane[lr][idx - k + 1 : idx + 1]
                for si, stat in enumerate(("kills", "deaths", "assists")):
                    row[f"delta{k}_{stat}"] = (
                        sum(kda[gg][si] for gg in window) / k
                    )
        out[g] = (lr, idx, row)
    return out


def test_recurrent_deltas_match_oracle(spark):
    anchors, matchlist, participants, kda = _fixture(spark)
    got = {
        r.game_id: r
        for r in recurrent_deltas(anchors, matchlist, participants).collect()
    }
    lanes = {1: ("MID", "SOLO"), 2: ("MID", "SOLO"), 3: ("TOP", "SOLO"),
             5: ("MID", "SOLO"), 6: ("MID", "SOLO")}
    want = _oracle(kda, [1, 2, 3, 5, 6], lanes)
    assert set(got) == set(want)
    for g, (lr, idx, deltas) in want.items():
        r = got[g]
        assert r.lane_role == lr and r.idx == idx, g
        for k in (2, 3, 4):
            for stat in ("kills", "deaths", "assists"):
                name = f"delta{k}_{stat}"
                if name in deltas:
                    assert getattr(r, name) == pytest.approx(deltas[name]), (g, name)
                else:
                    assert getattr(r, name) is None, (g, name)
    # the quirk: MID list [g1,g2,g5,g6] — delta2 null at idx 1, set at idx 2
    assert got[2].delta2_kills is None
    assert got[5].delta2_kills == pytest.approx((kda[5][0] + kda[2][0]) / 2)


def test_on_champion_cap(spark):
    anchors, matchlist, participants, _ = _fixture(spark)
    got = recurrent_deltas(anchors, matchlist, participants, max_parsed=4)
    assert sorted(r.game_id for r in got.collect()) == [1, 2, 3, 5]  # g6 cut
