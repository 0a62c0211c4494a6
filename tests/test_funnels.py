"""Funnel / retention semantics on crafted event fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lol_data_collection_system_spark.operators import funnels


def _events(spark, rows):
    return spark.createDataFrame(rows, ["ts_s", "user_id", "event_type"]).select(
        F.col("ts_s").cast("timestamp").alias("ts"), "user_id", "event_type"
    )


def test_funnel_order_and_window_semantics(spark):
    ev = _events(
        spark,
        [
            # u1 completes in order, inside the windows
            ("2024-01-01 00:00:00", 1, "view"),
            ("2024-01-01 01:00:00", 1, "click"),
            ("2024-01-01 02:00:00", 1, "purchase"),
            # u2 clicks BEFORE viewing — strict order: click not counted
            ("2024-01-01 00:30:00", 2, "click"),
            ("2024-01-01 01:00:00", 2, "view"),
            # u3 views, clicks a day+ later — outside the 1 h budget
            ("2024-01-01 00:00:00", 3, "view"),
            ("2024-01-01 02:00:01", 3, "click"),
            # u4 never enters the funnel
            ("2024-01-01 00:00:00", 4, "purchase"),
        ],
    )
    out = {
        r["step"]: r
        for r in funnels.funnel(
            ev, ["view", "click", "purchase"], within_seconds=7200
        ).collect()
    }
    assert out[1]["n_users"] == 3  # u1, u2, u3 all viewed
    assert out[2]["n_users"] == 1  # only u1's click is in-order+in-window
    assert out[3]["n_users"] == 1
    assert out[1]["conversion"] == 1.0
    assert out[3]["conversion"] == pytest.approx(1 / 3, abs=1e-6)


def test_funnel_first_occurrence_defines_the_clock(spark):
    """The FIRST qualifying step-k event starts step k+1's window — a
    later repeat cannot re-arm an expired funnel."""
    ev = _events(
        spark,
        [
            ("2024-01-01 00:00:00", 1, "view"),
            ("2024-01-01 05:00:00", 1, "view"),  # repeat, ignored
            ("2024-01-01 05:30:00", 1, "click"),  # 5.5 h after FIRST view
        ],
    )
    out = {
        r["step"]: r["n_users"]
        for r in funnels.funnel(ev, ["view", "click"], within_seconds=3600).collect()
    }
    assert out == {1: 1, 2: 0}


def test_funnel_requires_two_steps(spark):
    ev = _events(spark, [("2024-01-01 00:00:00", 1, "view")])
    with pytest.raises(ValueError, match="at least 2"):
        funnels.funnel(ev, ["view"], within_seconds=60)


def test_retention_triangle(spark):
    ev = _events(
        spark,
        [
            # cohort day 1: u1 active weeks 0 and 1; u2 only week 0
            ("2024-01-01 10:00:00", 1, "view"),
            ("2024-01-09 10:00:00", 1, "view"),
            ("2024-01-01 12:00:00", 2, "view"),
            # cohort day 2: u3
            ("2024-01-02 00:00:00", 3, "view"),
        ],
    )
    out = {
        (r["cohort_day_ms"], r["week_offset"]): (r["n_users"], r["retention"])
        for r in funnels.cohort_retention(ev).collect()
    }
    cohorts = sorted({c for c, _ in out})
    assert len(cohorts) == 2
    c1, c2 = cohorts
    assert out[(c1, 0)] == (2, 1.0)
    assert out[(c1, 1)] == (1, 0.5)
    assert out[(c2, 0)] == (1, 1.0)
    # week-0 retention is 1.0 for every cohort by construction
    assert all(v[1] == 1.0 for (c, w), v in out.items() if w == 0)


def test_pair_affinity_lift_semantics(spark):
    """Perfectly coupled types have lift = n/ca (>1); a type occurring
    with everything has lift 1 against an independent partner."""
    rows = []
    # users 1-4: A and B always together (coupled)
    for u in (1, 2, 3, 4):
        rows += [("2024-01-01 00:00:00", u, "A"), ("2024-01-01 00:01:00", u, "B")]
    # users 5-8: C alone
    for u in (5, 6, 7, 8):
        rows.append(("2024-01-01 00:00:00", u, "C"))
    ev = _events(spark, rows)
    out = {
        (r["type_a"], r["type_b"]): r
        for r in funnels.pair_affinity(ev).collect()
    }
    ab = out[("A", "B")]
    assert ab["n_users_both"] == 4
    assert ab["support"] == 0.5          # 4 of 8 users
    assert ab["confidence_a_to_b"] == 1.0
    assert ab["lift"] == 2.0             # 0.5 / (0.5 * 0.5)
    assert ("A", "C") not in out         # never co-occur -> no row


def test_pair_affinity_repeat_events_dont_inflate(spark):
    """Counts are over distinct (user, type) sets — a user clicking
    1000 times is still one basket member."""
    rows = [("2024-01-01 00:00:00", 1, "A")] * 5 + [
        ("2024-01-01 00:01:00", 1, "B")
    ] * 7
    ev = _events(spark, rows)
    out = funnels.pair_affinity(ev).collect()
    assert len(out) == 1
    assert out[0]["n_users_both"] == 1


def test_conversion_latency_measures_first_to_final(spark):
    """Latency = step-1 first event -> final completing event, with the
    same strict-order within-window semantics as funnel(); incomplete
    users emit nothing."""
    import datetime as dt

    from lol_data_collection_system_spark.operators.funnels import (
        conversion_latency,
    )

    t0 = dt.datetime(2024, 8, 1)

    def at(mins):
        return t0 + dt.timedelta(minutes=mins)

    rows = [
        # user 1 converts: view@0, click@10, purchase@25 -> 1500 s
        (1, "view", at(0)), (1, "click", at(10)), (1, "purchase", at(25)),
        # user 2 stalls at click
        (2, "view", at(0)), (2, "click", at(5)),
        # user 3: purchase BEFORE click -> not a conversion
        (3, "view", at(0)), (3, "purchase", at(1)), (3, "click", at(2)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    got = {
        r.user_id: r.latency_s
        for r in conversion_latency(
            df, ["view", "click", "purchase"], 86_400
        ).collect()
    }
    assert got == {1: 1500.0}


def test_km_survival_matches_hand_computed(spark):
    """Textbook KM fixture: events at t=1 (2/5) and t=3 (1/2), censor
    at t=2 and t=3 -> S(1)=0.6, S(3)=0.6*(1-1/2)=0.3; censored-only
    times emit no row but shrink the risk set."""
    from lol_data_collection_system_spark.operators.funnels import (
        km_survival,
    )

    rows = [
        (1, True), (1, True),    # two events at t=1
        (2, False),              # censored at t=2
        (3, True), (3, False),   # one event + one censor at t=3
    ]
    df = spark.createDataFrame(rows, "t bigint, observed boolean")
    got = {r.t: r for r in km_survival(df).collect()}
    assert set(got) == {1, 3}
    assert got[1].n_at_risk == 5 and got[1].n_events == 2
    assert got[1].survival == 0.6
    assert got[3].n_at_risk == 2 and got[3].n_events == 1
    assert got[3].survival == 0.3
