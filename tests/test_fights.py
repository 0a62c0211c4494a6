"""Exact-semantics tests for the fight pipeline's order-dependent stage.

The +30 s subset-merge (`operators.fights.subset_merge`) has no SQL oracle
by design (non-associative fold, reference `utils.py:586-626`). This is
its correctness gate: an independent pure-Python implementation of the
reference semantics (perspectives → ±15 s enrichment → forward merge) run
over the same synthetic kills, compared row-for-row with the Spark result.
"""

from __future__ import annotations

import duckdb
import os

import pytest
from pyspark.sql import functions as F

from lol_data_collection_system_spark.operators import fights as fight_ops
from lol_data_collection_system_spark.plans import domain_queries as dq

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def python_reference_pipeline(kills: list[dict]) -> list[tuple]:
    """Independent port of the reference semantics over generic kill rows.

    kills: [{match_id, ts_ms, killer, victim}] (no assists in the synthetic
    mapping). Returns sorted tuples
    (match_id, actor, perspective, ts_ms, allies_s, enemies_s, victims_s).
    """
    by_match: dict[int, list[dict]] = {}
    for k in kills:
        by_match.setdefault(k["match_id"], []).append(k)

    out: list[tuple] = []
    for match_id, mkills in by_match.items():
        # perspectives per actor, mirroring utils.py:517-538
        per_actor: dict[tuple, list[dict]] = {}
        for k in mkills:
            contributors = [k["killer"]]
            for actor in contributors:
                per_actor.setdefault((actor, "kill"), []).append(
                    {
                        "ts_ms": k["ts_ms"],
                        "allies": list(contributors),
                        "enemies": [k["victim"]],
                        "victims": [k["victim"]],
                    }
                )
            per_actor.setdefault((k["victim"], "death"), []).append(
                {
                    "ts_ms": k["ts_ms"],
                    "allies": [k["victim"]],
                    "enemies": list(contributors),
                    "victims": [k["victim"]],
                }
            )
        # ±15 s enrichment, mirroring utils.py:538-577
        for (actor, persp), evs in per_actor.items():
            for e in evs:
                own = e["allies"] if persp == "kill" else e["enemies"]
                grow = e["enemies"] if persp == "kill" else e["allies"]
                for adj in mkills:
                    if not (e["ts_ms"] - 15000 <= adj["ts_ms"] <= e["ts_ms"] + 15000):
                        continue
                    contributors = [adj["killer"]]
                    if any(o in contributors for o in own):
                        if adj["victim"] not in grow:
                            grow.append(adj["victim"])
                        if adj["victim"] not in e["victims"]:
                            e["victims"].append(adj["victim"])
                    elif adj["victim"] in own:
                        for c in contributors:
                            if c not in grow:
                                grow.append(c)
                        if adj["victim"] not in e["victims"]:
                            e["victims"].append(adj["victim"])
        # +30 s forward subset-merge over the participant's kills AND
        # deaths jointly (sorted(kills+deaths), utils.py:582 — stable
        # sort keeps kills before deaths at equal ts)
        by_actor: dict[int, list[dict]] = {}
        for (actor, persp), evs in per_actor.items():
            for e in evs:
                by_actor.setdefault(actor, []).append({**e, "perspective": persp})
        for actor, evs in by_actor.items():
            evs.sort(key=lambda e: (e["ts_ms"], 0 if e["perspective"] == "kill" else 1))
            kept = fight_ops.merge_fight_group(evs, 30_000)
            for e in kept:
                out.append(
                    (
                        match_id,
                        actor,
                        e["perspective"],
                        e["ts_ms"],
                        ",".join(str(v) for v in sorted(set(e["allies"]))),
                        ",".join(str(v) for v in sorted(set(e["enemies"]))),
                        ",".join(str(v) for v in sorted(set(e["victims"]))),
                    )
                )
    return sorted(out)


def _synthetic_kill_rows() -> list[dict]:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
    )
    rows = con.execute(dq._KILLS_SQL).fetchall()
    return [
        {"match_id": r[0], "ts_ms": r[1], "killer": r[2], "victim": r[3]}
        for r in rows
    ]


def test_fight_merge_matches_python_reference(spark):
    spark_rows = sorted(
        tuple(r)
        for r in dq.q_fight_merge(spark, SF_DIR).collect()
    )
    expected = python_reference_pipeline(_synthetic_kill_rows())
    assert len(spark_rows) == len(expected), (
        f"row count {len(spark_rows)} vs python oracle {len(expected)}"
    )
    assert spark_rows == expected


def test_merge_invariants_no_victim_in_two_surviving_fights():
    """Property from SURVEY.md §5: after the merge, within one group no
    victim appears in two surviving fights that are within the horizon."""
    events = [
        {"ts_ms": 0, "allies": [1], "enemies": [2], "victims": [2]},
        {"ts_ms": 10_000, "allies": [1], "enemies": [2, 3], "victims": [2, 3]},
        {"ts_ms": 20_000, "allies": [1], "enemies": [2], "victims": [2]},
    ]
    kept = fight_ops.merge_fight_group(events, 30_000)
    # event 1 absorbs event 0 (superset ahead) and event 2 (subset ahead)
    assert len(kept) == 1
    assert sorted(kept[0]["victims"]) == [2, 3]
    assert sorted(kept[0]["allies"]) == [1]


def test_merge_partial_overlap_subtracts():
    events = [
        {"ts_ms": 0, "allies": [1], "enemies": [2, 3], "victims": [2, 3]},
        {"ts_ms": 5_000, "allies": [4], "enemies": [3, 5], "victims": [3, 5]},
    ]
    kept = fight_ops.merge_fight_group(events, 30_000)
    # partial overlap: victim 3 removed from the later fight, both survive
    assert len(kept) == 2
    assert kept[1]["victims"] == [5]


def test_merge_beyond_horizon_untouched():
    events = [
        {"ts_ms": 0, "allies": [1], "enemies": [2], "victims": [2]},
        {"ts_ms": 31_000, "allies": [1], "enemies": [2], "victims": [2]},
    ]
    kept = fight_ops.merge_fight_group(events, 30_000)
    assert len(kept) == 2
