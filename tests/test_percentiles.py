"""Focused tests for the r11 optimization internals: the parallel
exact-percentile operator (bit-identity vs Spark's `Percentile`
aggregate) and the pair-probe partition widener (row identity +
only-ever-widens contract)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from lol_data_collection_system_spark.operators.aggregates import exact_percentiles
from lol_data_collection_system_spark.operators.similarity import widen_partitions


def _spark_percentile(spark, values, ps):
    df = spark.createDataFrame([(float(v),) for v in values], "v double")
    expr = "percentile(v, array(" + ", ".join(repr(p) for p in ps) + "))"
    return df.select(F.expr(expr).alias("cuts")).collect()[0]["cuts"]


def _ours(spark, values, ps):
    df = spark.createDataFrame([(float(v),) for v in values], "v double")
    return exact_percentiles(df, "v", ps).collect()[0]["cuts"]


def test_exact_percentiles_matches_builtin_random(spark):
    rng = random.Random(11)
    values = [rng.uniform(-1e4, 1e4) for _ in range(997)]
    ps = [0.01, 0.125, 0.25, 0.5, 0.75, 0.875, 0.99]
    want = _spark_percentile(spark, values, ps)
    got = _ours(spark, values, ps)
    assert got == want  # bit-identical doubles, no tolerance


def test_exact_percentiles_with_heavy_duplicates(spark):
    rng = random.Random(7)
    # few distinct values -> positions fall inside runs of equal keys
    values = [float(rng.randint(0, 5)) for _ in range(500)]
    ps = [0.0, 0.1, 0.5, 0.9, 1.0]
    assert _ours(spark, values, ps) == _spark_percentile(spark, values, ps)


def test_exact_percentiles_integer_positions_and_edges(spark):
    # N=5 with p=0.25 -> pos=1.0 exactly (floor==ceil branch)
    values = [10.0, 20.0, 30.0, 40.0, 50.0]
    ps = [0.0, 0.25, 0.5, 0.75, 1.0]
    assert _ours(spark, values, ps) == _spark_percentile(spark, values, ps)


def test_exact_percentiles_ignores_nulls(spark):
    df = spark.createDataFrame(
        [(1.0,), (None,), (2.0,), (3.0,), (None,)], "v double"
    )
    got = exact_percentiles(df, "v", [0.5]).collect()[0]["cuts"]
    assert got == [2.0]


def test_widen_partitions_widens_and_preserves_rows(spark):
    df = spark.createDataFrame(
        [(i, f"d{i}") for i in range(100)], "id int, s string"
    ).coalesce(1)
    out = widen_partitions(df, "id")
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert sorted(r.id for r in out.collect()) == list(range(100))


def test_widen_partitions_noop_when_already_wide(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(target + 2)
    out = widen_partitions(df)
    # already at/above parallelism: the frame is returned untouched
    assert out is df
