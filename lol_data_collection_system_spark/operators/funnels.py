"""Event-sequence analytics: conversion funnels and cohort retention.

The reference's monitor answers "how many matches reached each gathering
stage" with per-stage Django counts (monitor/views/gathering.py:25-71);
these are the general forms every event-analytics engine ships:

- `funnel`: how many users performed step₁ → step₂ → … in ORDER, each
  within a time budget of the previous step (strict-order,
  first-occurrence semantics — the standard product-analytics funnel).
- `cohort_retention`: users bucketed by first-seen day, activity
  counted per week offset (the retention triangle).

Scale shape: both are chains of user-keyed hash joins/aggregates — the
canonical funnel plan. Step k's frame only contains users who survived
step k-1, so the join inputs SHRINK down the funnel; nothing is
corpus-wide after the first per-user min. Time arithmetic is integer
microseconds end-to-end (`unix_micros` / `epoch_us`), so both engines
compare identical integers — no interval/timezone semantics in play.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MILLIS_PER_WEEK = 7 * 86_400_000


def funnel(
    events: DataFrame,
    steps: list[str],
    within_seconds: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(step, event_type, n_users, conversion) — one row per funnel
    step; `conversion` is vs step 1 (round 6). A user reaches step k
    iff their FIRST qualifying step-k event is strictly after their
    step-(k-1) time and within `within_seconds` of it."""
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    within_us = int(within_seconds) * 1_000_000
    ev = events.select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_e"),
        F.unix_micros(F.col(ts_col)).alias("_t"),
    )
    reached = (
        ev.filter(F.col("_e") == steps[0]).groupBy("_u").agg(F.min("_t").alias("_prev"))
    )
    frames = [reached]
    for step in steps[1:]:
        nxt = (
            ev.filter(F.col("_e") == step)
            .join(frames[-1], "_u")
            .filter(
                (F.col("_t") > F.col("_prev"))
                & (F.col("_t") <= F.col("_prev") + F.lit(within_us))
            )
            .groupBy("_u")
            .agg(F.min("_t").alias("_prev"))
        )
        frames.append(nxt)
    counts = None
    for k, (step, fr) in enumerate(zip(steps, frames), 1):
        row = fr.agg(
            F.lit(k).cast("bigint").alias("step"),
            F.lit(step).alias("event_type"),
            F.count(F.lit(1)).alias("n_users"),
        )
        counts = row if counts is None else counts.unionByName(row)
    base = frames[0].agg(F.count(F.lit(1)).alias("_n1"))
    return counts.crossJoin(F.broadcast(base)).select(
        "step",
        "event_type",
        "n_users",
        # empty funnel entry (no step-1 users) → conversion 0.0, not a
        # divide-by-zero (ANSI mode errors on x/0)
        F.when(
            F.col("_n1") > 0,
            F.round(
                F.col("n_users").cast("double") / F.col("_n1"), 6
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("conversion"),
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort_day_ms, week_offset, n_users, retention) — the retention
    triangle: users bucketed by first-seen DAY, distinct actives per
    WEEK offset, `retention` vs the cohort's size (week 0 row is 1.0 by
    construction). Two user-keyed aggregates + one matrix aggregate —
    never row²."""
    ev = events.select(
        F.col(user_col).alias("_u"),
        F.unix_millis(F.date_trunc("day", F.col(ts_col))).alias("_d"),
    )
    cohort = ev.groupBy("_u").agg(F.min("_d").alias("_c"))
    joined = ev.join(cohort, "_u").select(
        "_u",
        "_c",
        # explicit floor: Spark casts double→bigint by truncation but
        # DuckDB rounds, so the floor must happen before any cast
        F.floor((F.col("_d") - F.col("_c")) / F.lit(MILLIS_PER_WEEK))
        .cast("bigint")
        .alias("_w"),
    )
    cell = joined.groupBy("_c", "_w").agg(
        F.count_distinct(F.col("_u")).alias("n_users")
    )
    size = cohort.groupBy("_c").agg(F.count(F.lit(1)).alias("_sz"))
    return cell.join(size, "_c").select(
        F.col("_c").alias("cohort_day_ms"),
        F.col("_w").alias("week_offset"),
        "n_users",
        F.round(F.col("n_users").cast("double") / F.col("_sz"), 6).alias(
            "retention"
        ),
    )


def pair_affinity(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Association mining over event types: for every unordered type
    pair, (type_a, type_b, n_users_both, support, confidence_a_to_b,
    lift) — the market-basket statistics ("users who X also Y") on the
    per-user distinct-type sets.

    lift > 1 means the pair co-occurs more than independent types
    would; confidence is directional P(b|a) for the canonical a < b
    ordering (swap the columns for the other direction — the inputs
    are symmetric).

    Plan: one distinct (user, type) projection; the pair space is a
    self-join on user with type_a < type_b — per-user work is
    |types|², and the type vocabulary is small by definition (event
    taxonomies, not free text), so this never approaches user². All
    counts are exact integers; the three ratios are single double
    divisions, identical across engines.
    """
    sets = events.select(
        F.col(user_col).alias("_u"), F.col(type_col).alias("_e")
    ).distinct()
    n_users = sets.select("_u").distinct().agg(
        F.count(F.lit(1)).alias("_n")
    )
    singles = sets.groupBy("_e").agg(F.count(F.lit(1)).alias("_c"))
    a = sets.select("_u", F.col("_e").alias("type_a"))
    b = sets.select("_u", F.col("_e").alias("type_b"))
    pairs = (
        a.join(b, "_u")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_users_both"))
    )
    sa = singles.select(
        F.col("_e").alias("type_a"), F.col("_c").alias("_ca")
    )
    sb = singles.select(
        F.col("_e").alias("type_b"), F.col("_c").alias("_cb")
    )
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .crossJoin(F.broadcast(n_users))
        .select(
            "type_a",
            "type_b",
            "n_users_both",
            F.round(
                F.col("n_users_both").cast("double") / F.col("_n"), 6
            ).alias("support"),
            F.round(
                F.col("n_users_both").cast("double") / F.col("_ca"), 6
            ).alias("confidence_a_to_b"),
            F.round(
                (F.col("n_users_both").cast("double") * F.col("_n"))
                / (F.col("_ca") * F.col("_cb")),
                6,
            ).alias("lift"),
        )
    )


def conversion_latency(
    events: DataFrame,
    steps: list[str],
    within_seconds: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per converted user: seconds from their step-1 time to their
    final-step time — the time-to-convert distribution behind funnel
    SLAs ('how long does view→purchase actually take?'). Same
    strict-order first-occurrence fold as `funnel` (each step joins the
    survivors of the previous one — inputs shrink down the funnel),
    carrying the step-1 timestamp through. Integer-microsecond
    arithmetic; one final division to seconds (round 6).

    Returns (user, latency_s) for users who complete ALL steps.
    """
    if len(steps) < 2:
        raise ValueError("conversion_latency needs at least 2 steps")
    within_us = int(within_seconds) * 1_000_000
    ev = events.select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_e"),
        F.unix_micros(F.col(ts_col)).alias("_t"),
    )
    cur = (
        ev.filter(F.col("_e") == steps[0])
        .groupBy("_u")
        .agg(F.min("_t").alias("_prev"))
        .withColumn("_t0", F.col("_prev"))
    )
    for step in steps[1:]:
        cur = (
            ev.filter(F.col("_e") == step)
            .join(cur, "_u")
            .filter(
                (F.col("_t") > F.col("_prev"))
                & (F.col("_t") <= F.col("_prev") + F.lit(within_us))
            )
            .groupBy("_u", "_t0")
            .agg(F.min("_t").alias("_prev"))
        )
    return cur.select(
        F.col("_u").alias(user_col),
        F.round((F.col("_prev") - F.col("_t0")) / F.lit(1_000_000.0), 6).alias(
            "latency_s"
        ),
    )


def km_survival(
    durations: DataFrame,
    duration_col: str = "t",
    event_col: str = "observed",
) -> DataFrame:
    """Kaplan–Meier survival estimator over right-censored durations —
    'how long until the second order / the churn / the repair', with
    single-event subjects censored at the observation horizon. Input:
    one row per subject with an integer duration and an observed flag
    (True = the event happened at t, False = censored at t). Output:
    one row per distinct EVENT time:
    ``(t, n_at_risk, n_events, survival)`` with S(t) = Π(1 − dᵢ/nᵢ).

    Scale + determinism shape: everything runs on the DURATION-DAY
    frame (bounded by the observation span, not by subjects) — d_t and
    leave_t per day from one subject-level aggregate, the risk set as a
    REVERSE cumulative sum, and the survival product as an ordered
    list fold (`aggregate` over a cumulative `collect_list` window):
    both engines multiply the identical factor sequence in the same
    order, so the doubles agree bit-for-bit with no logarithm rounding
    anywhere.
    """
    per_t = durations.groupBy(F.col(duration_col).alias("t")).agg(
        F.sum(F.col(event_col).cast("bigint")).alias("d"),
        F.count(F.lit(1)).alias("leave"),
    )
    w_rev = (
        Window.orderBy(F.col("t").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    with_risk = per_t.withColumn("n_at_risk", F.sum("leave").over(w_rev))
    factor = F.lit(1.0) - F.col("d").cast("double") / F.col(
        "n_at_risk"
    ).cast("double")
    w_fwd = (
        Window.orderBy(F.col("t").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    surv = F.aggregate(
        F.collect_list(factor).over(w_fwd),
        F.lit(1.0),
        lambda acc, x: acc * x,
    )
    return (
        with_risk.withColumn("survival", F.round(surv, 6))
        .filter(F.col("d") > 0)
        .select("t", "n_at_risk", F.col("d").alias("n_events"), "survival")
    )
