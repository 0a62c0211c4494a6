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
from lol_data_collection_system_spark.plans import fight_oracle
from lol_data_collection_system_spark.plans.fight_oracle import (
    python_reference_pipeline,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


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


def test_fight_merge_fixture_oracle(spark):
    """The driver-visible value oracle: the materialized Python-port
    fixture, dispatched on the events row count, must equal the Spark
    pipeline's output at this sf."""
    path = fight_oracle.ensure_fight_merge_fixture()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")
    oracle_rows = sorted(
        tuple(r) for r in con.execute(fight_oracle.ORACLE_FIGHT_MERGE).fetchall()
    )
    assert len(oracle_rows) > 0, f"fixture {path} has no rows for {SF_DIR}"
    spark_rows = sorted(tuple(r) for r in dq.q_fight_merge(spark, SF_DIR).collect())
    assert spark_rows == oracle_rows


def test_fight_merge_fixture_regenerates_when_stale(tmp_path, monkeypatch):
    """Fingerprint miss (meta absent) must trigger regeneration rather
    than serving a stale fixture."""
    monkeypatch.setattr(fight_oracle, "FIXTURE_DIR", tmp_path)
    monkeypatch.setattr(
        fight_oracle, "FIXTURE_PATH", tmp_path / "fight_merge_oracle.parquet"
    )
    monkeypatch.setattr(
        fight_oracle, "_META_PATH", tmp_path / "fight_merge_oracle.meta.json"
    )
    path = fight_oracle.ensure_fight_merge_fixture((SF_DIR,))
    assert os.path.exists(path)
    first_mtime = os.path.getmtime(path)
    # fresh fingerprint → no rewrite
    fight_oracle.ensure_fight_merge_fixture((SF_DIR,))
    assert os.path.getmtime(path) == first_mtime
    # dropped meta → regenerate
    os.remove(tmp_path / "fight_merge_oracle.meta.json")
    fight_oracle.ensure_fight_merge_fixture((SF_DIR,))
    assert os.path.getmtime(path) >= first_mtime
    assert (tmp_path / "fight_merge_oracle.meta.json").exists()


def test_enrichment_both_branches_one_event(spark):
    """Reference per-ally if/elif (utils.py:543-557): a killerId=0-style
    execution event can fire BOTH branches via different allies — ally 0
    is a contributor (side scored → victim joins) while ally 1 is the
    victim (side died → contributors join). Both additions must land."""
    from pyspark.sql import types as T

    persp_schema = T.StructType(
        [
            T.StructField("match_id", T.LongType()),
            T.StructField("actor", T.LongType()),
            T.StructField("perspective", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("allies", T.ArrayType(T.LongType())),
            T.StructField("enemies", T.ArrayType(T.LongType())),
            T.StructField("victims", T.ArrayType(T.LongType())),
        ]
    )
    kills_schema = T.StructType(
        [
            T.StructField("match_id", T.LongType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("killer", T.LongType()),
            T.StructField("victim", T.LongType()),
            T.StructField("assists", T.ArrayType(T.LongType())),
        ]
    )
    persp = spark.createDataFrame(
        [(1, 1, "kill", 0, [1, 0], [9], [9])], persp_schema
    )
    adj = spark.createDataFrame([(1, 1000, 0, 1, [])], kills_schema)
    out = fight_ops.enrich_adjacent_sets(persp, adj, 15_000).collect()
    assert len(out) == 1
    row = out[0]
    # branch 1: victim 1 joined enemies; branch 2: contributor 0 joined too
    assert sorted(row.enemies) == [0, 1, 9]
    assert sorted(row.victims) == [1, 9]

    # corner: the ally that is both victim AND contributor fires ONLY
    # branch 1 (the elif skips branch 2 for it) — contributors of a
    # self-referencing event must not join
    adj2 = spark.createDataFrame([(1, 1000, 1, 1, [5])], kills_schema)
    row2 = fight_ops.enrich_adjacent_sets(persp, adj2, 15_000).collect()[0]
    # side scored (killer 1 in own) -> victim 1 joins enemies; side_died
    # suppressed (victim 1 IS a contributor) -> 5 must NOT join
    assert sorted(row2.enemies) == [1, 9]
    assert sorted(row2.victims) == [1, 9]
