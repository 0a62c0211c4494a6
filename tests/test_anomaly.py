"""EWMA rate-anomaly operator tests (operators/windows.ewma_anomaly_topk)."""

from __future__ import annotations

import datetime as dt

import pytest

from lol_data_collection_system_spark.operators.windows import (
    ewma_anomaly_topk,
)

H0 = dt.datetime(2024, 1, 1, 0, 30)


def _events(spark, spec):
    """spec: list of (type, hour_offset, n_events)."""
    rows = []
    for typ, h, n in spec:
        for i in range(n):
            rows.append((typ, H0 + dt.timedelta(hours=h, seconds=i)))
    return spark.createDataFrame(rows, ["event_type", "ts"])


def test_spike_ranks_first_with_exact_ewma(spark):
    """Flat rate 2/hour then a 50-burst: decayed_prev is exactly
    2*(2^4+...+1)/(2^5-1) = 2.0 and the ratio 25.0 — the integer Horner
    numerator hand-checked."""
    df = _events(spark, [("a", h, 2) for h in range(5)] + [("a", 5, 50)])
    top = ewma_anomaly_topk(df, "event_type", "ts", k=3).collect()
    assert top[0].event_type == "a" and top[0].cnt == 50
    assert top[0].decayed_prev == pytest.approx(2.0)
    assert top[0].ratio == pytest.approx(25.0)


def test_silent_hours_decay_through_densified_grid(spark):
    """3 events, then 4 silent hours, then 1 event: the EWMA must have
    decayed to 3/31 (zeros fill the grid), making a single event a
    10.3x anomaly. Without densification the decayed rate would still
    be 3 and the ratio 1/3."""
    df = _events(
        spark,
        [("a", h, 2) for h in range(6)]  # anchor type spans the grid
        + [("b", 0, 3), ("b", 5, 1)],
    )
    rows = {
        (r.event_type, r.cnt): r
        for r in ewma_anomaly_topk(df, "event_type", "ts", k=20).collect()
    }
    b = rows[("b", 1)]
    assert b.decayed_prev == pytest.approx(round(3 / 31, 6))
    assert b.ratio == pytest.approx(round(1 / (3 / 31), 6))


def test_first_bucket_and_empty_history_are_excluded(spark):
    df = _events(spark, [("a", 0, 5), ("a", 1, 5)])
    got = ewma_anomaly_topk(df, "event_type", "ts", k=10).collect()
    # only the second bucket has history; the first (num=0) is dropped
    assert len(got) == 1
    assert got[0].decayed_prev == pytest.approx(5.0)
    assert got[0].ratio == pytest.approx(1.0)


def test_window_truncation_drops_old_history(spark):
    """window=2: only the two previous buckets feed the EWMA —
    weights 2 and 1 over [h1, h0]."""
    df = _events(spark, [("a", 0, 6), ("a", 1, 3), ("a", 2, 9)])
    got = ewma_anomaly_topk(df, "event_type", "ts", k=10, window=2).collect()
    by_cnt = {r.cnt: r for r in got}
    # at h2: prev=[6,3] -> num = 3*2 + 6 = 12, den = 3 -> 4.0
    assert by_cnt[9].decayed_prev == pytest.approx(4.0)
    assert by_cnt[9].ratio == pytest.approx(2.25)


def test_linreg_matches_numpy_and_handles_degenerates(spark):
    import numpy as np
    import pyspark.sql.functions as F

    from lol_data_collection_system_spark.operators.aggregates import (
        linreg_by_group,
    )

    pts = {
        "up": [(0.0, 1.0), (1.0, 3.0), (2.0, 5.25), (3.0, 6.75)],
        "flat_y": [(0.0, 2.0), (1.0, 2.0), (2.0, 2.0)],
        "flat_x": [(4.0, 1.0), (4.0, 2.0), (4.0, 3.0)],
    }
    rows = [(g, x, y) for g, xy in pts.items() for x, y in xy]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    got = {
        r.g: r
        for r in linreg_by_group(df, ["g"], F.col("x"), F.col("y")).collect()
    }

    xs, ys = zip(*pts["up"])
    slope, intercept = np.polyfit(xs, ys, 1)
    r = np.corrcoef(xs, ys)[0, 1]
    assert got["up"].slope == pytest.approx(round(float(slope), 6), abs=2e-6)
    assert got["up"].intercept == pytest.approx(
        round(float(intercept), 6), abs=2e-6
    )
    assert got["up"].r2 == pytest.approx(round(float(r * r), 6), abs=2e-6)

    assert got["flat_y"].slope == 0.0          # zero y-variance: flat fit
    assert got["flat_y"].r2 is None            # 0/0 correlation
    assert got["flat_x"].slope is None         # zero x-variance: no fit
    assert got["flat_x"].intercept is None


def test_linreg_is_partition_invariant(spark):
    import pyspark.sql.functions as F

    from lol_data_collection_system_spark.operators.aggregates import (
        linreg_by_group,
    )

    rows = [("a", float(i % 17), float((i * 7) % 23) / 3.0) for i in range(500)]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    one = linreg_by_group(
        df.coalesce(1), ["g"], F.col("x"), F.col("y")
    ).collect()[0]
    many = linreg_by_group(
        df.repartition(13), ["g"], F.col("x"), F.col("y")
    ).collect()[0]
    assert (one.slope, one.intercept, one.r2) == (
        many.slope,
        many.intercept,
        many.r2,
    )


def test_rolling_percentile_matches_numpy(spark):
    import numpy as np
    import pyspark.sql.functions as F

    from lol_data_collection_system_spark.operators.windows import (
        rolling_percentile,
    )

    vals = [5.0, 1.0, 9.0, 3.0, 7.0, 2.0, 8.0]
    df = spark.createDataFrame(
        [("a", i, v) for i, v in enumerate(vals)], ["g", "i", "v"]
    )
    got = {
        r.i: r.p
        for r in rolling_percentile(
            df, ["g"], [F.col("i")], F.col("v"), window=3, p=0.95, alias="p"
        ).collect()
    }
    for i in range(len(vals)):
        frame = vals[max(0, i - 2) : i + 1]
        want = float(np.percentile(frame, 95))  # linear interpolation
        assert got[i] == pytest.approx(round(want, 6), abs=1e-9), i


def test_rolling_percentile_single_row_frame(spark):
    import pyspark.sql.functions as F

    from lol_data_collection_system_spark.operators.windows import (
        rolling_percentile,
    )

    df = spark.createDataFrame([("a", 0, 4.5)], ["g", "i", "v"])
    got = rolling_percentile(
        df, ["g"], [F.col("i")], F.col("v"), window=5, p=0.5, alias="p"
    ).collect()[0]
    assert got.p == 4.5


def test_gap_fill_interpolates_between_known_points(spark):
    import datetime as dt

    import pyspark.sql.functions as F  # noqa: F401

    from lol_data_collection_system_spark.operators.windows import (
        gap_fill_interpolate,
    )

    h0 = dt.datetime(2024, 6, 1)
    rows = [
        ("a", h0, 10.0),
        ("a", h0 + dt.timedelta(hours=3), 16.0),  # gap at h1, h2
        ("b", h0 + dt.timedelta(hours=1), 5.0),   # leading/trailing gaps
    ]
    df = spark.createDataFrame(rows, ["g", "b", "v"])
    got = {
        (r.g, r.bucket_ms): (r.v, r.filled)
        for r in gap_fill_interpolate(df, ["g"], "b", "v").collect()
    }
    ms0 = int(h0.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
    H = 3_600_000
    assert got[("a", ms0)] == (10.0, False)
    assert got[("a", ms0 + H)] == (12.0, True)      # 10 + 6*(1/3)
    assert got[("a", ms0 + 2 * H)] == (14.0, True)  # 10 + 6*(2/3)
    assert got[("a", ms0 + 3 * H)] == (16.0, False)
    # 'b': single known point -> edges stay NULL and are NOT "filled"
    # (nothing was interpolated), known row passes
    assert got[("b", ms0)] == (None, False)          # leading edge
    assert got[("b", ms0 + H)] == (5.0, False)
    assert got[("b", ms0 + 2 * H)] == (None, False)  # trailing edge
    assert got[("b", ms0 + 3 * H)] == (None, False)


def test_correlation_matrix_matches_numpy(spark):
    import numpy as np

    from lol_data_collection_system_spark.operators.aggregates import (
        correlation_matrix,
    )

    rng = [(float(i % 7), float((i * 3) % 5), 2.0) for i in range(40)]
    df = spark.createDataFrame(rng, ["a", "b", "c"])
    got = {
        (r.col_a, r.col_b): r.corr
        for r in correlation_matrix(df, ["a", "b", "c"]).collect()
    }
    xs = np.array([r[0] for r in rng])
    ys = np.array([r[1] for r in rng])
    want = float(np.corrcoef(xs, ys)[0, 1])
    assert got[("a", "b")] == pytest.approx(round(want, 6), abs=2e-6)
    # constant column -> NULL correlation on both its pairs
    assert got[("a", "c")] is None and got[("b", "c")] is None
