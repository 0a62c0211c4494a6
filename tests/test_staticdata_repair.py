"""Static-data dims (S5) and the repair pipeline (T6) end-to-end."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from lol_data_collection_system_spark import schemas
from lol_data_collection_system_spark.plans import repair as repair_plan
from lol_data_collection_system_spark.sources import staticdata
from lol_data_collection_system_spark.sources.rest import (
    RateLimit,
    Response,
    RestSource,
    SlidingWindowLimiter,
)

ITEMS_JSON = json.dumps(
    {"data": {"1001": {"gold": {"total": 350}}, "3004": {"gold": {"total": 1100}}}}
)
CHAMPS_JSON = json.dumps(
    {
        "data": {
            "Annie": {"name": "Annie", "key": "1"},
            "Olaf": {"name": "Olaf", "key": "2"},
        }
    }
)


def test_items_and_champions_dims(spark):
    docs = spark.createDataFrame(
        [("8.11", ITEMS_JSON)], ["semver", "body"]
    )
    items = {
        (r.semver, r.item_id): r.gold_total
        for r in staticdata.items_dim(docs).collect()
    }
    assert items == {("8.11", 1001): 350, ("8.11", 3004): 1100}

    champs = spark.createDataFrame([("8.11", CHAMPS_JSON)], ["semver", "body"])
    got = {
        r.champion_id: r.name for r in staticdata.champions_dim(champs).collect()
    }
    assert got == {1: "Annie", 2: "Olaf"}


def test_novel_versions(spark):
    fresh = spark.createDataFrame([("8.11",), ("8.12",)], ["semver"])
    known = spark.createDataFrame([("8.11",)], ["semver"])
    out = [r.semver for r in staticdata.novel_versions(fresh, known).collect()]
    assert out == ["8.12"]


def _repair_transport(url):
    # "match/<region>/<match_id>" → both documents in one payload
    body = json.dumps(
        {"result": json.dumps({"gameId": int(url.rsplit("/", 1)[1])}),
         "timeline": json.dumps({"frames": []})}
    )
    return Response(200, body)


def _repair_source():
    return RestSource(
        _repair_transport, SlidingWindowLimiter([RateLimit(1000, 10.0)])
    )


def test_repair_pipeline_fills_gaps_idempotently(spark):
    rows = [
        # complete match — untouched
        (1, 1, 10, "GOLD II", 1800, '{"gameId": 1}', '{"frames": []}'),
        # missing both docs, eligible
        (2, 1, None, "SILVER I", 1800, None, None),
        # missing docs but a remake → NOT eligible
        (3, 1, None, "GOLD I", 200, None, None),
        # missing docs but no tier → NOT eligible
        (4, 1, None, None, 1800, None, None),
    ]
    matches = spark.createDataFrame(rows, schemas.HISTORICAL_MATCH)

    report = {
        r.match_id: (r.result_missing, r.repair_eligible)
        for r in repair_plan.incompleteness_report(matches).collect()
    }
    assert report[1] == (False, True)
    assert report[2] == (True, True)
    assert report[3][1] is False
    assert report[4][1] is False

    work = [r.match_id for r in repair_plan.repair_worklist(matches).collect()]
    assert work == [2]

    repaired = repair_plan.repair_matches(matches, _repair_source)
    got = {r.match_id: r for r in repaired.collect()}
    assert len(got) == 4
    assert json.loads(got[2].match_result_json) == {"gameId": 2}
    assert got[2].regional_tier_avg == "SILVER I"  # phase-1 column kept
    assert got[1].match_result_json == '{"gameId": 1}'  # untouched
    assert got[3].match_result_json is None  # ineligible rows untouched

    # idempotent: repairing the repaired store changes nothing
    again = repair_plan.repair_matches(repaired, _repair_source)
    a = sorted(map(tuple, repaired.collect()))
    b = sorted(map(tuple, again.collect()))
    assert a == b
