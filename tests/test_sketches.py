"""Sketch ops: approximate results must stay within the documented error
bound of their exact twins (the honest gate for algorithm-specific
sketches — see operators/sketches.py docstring), and the aggregation
must be partial/mergeable (plan check)."""

from __future__ import annotations

import os

from lol_data_collection_system_spark.operators.sketches import (
    approx_distinct_tokens,
    length_quantiles,
)
from lol_data_collection_system_spark.sources import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_approx_vocab_within_rsd(spark):
    docs = load_table(spark, SF_DIR, "documents")
    approx = {
        r["source"]: r["vocab_size"]
        for r in approx_distinct_tokens(docs).collect()
    }
    exact = {
        r["source"]: r["vocab_size"]
        for r in approx_distinct_tokens(docs, exact=True).collect()
    }
    assert set(approx) == set(exact)
    for src, ex in exact.items():
        # 1.6% rsd → 5 sigma ≈ 8%; generous but fails on real breakage
        assert abs(approx[src] - ex) <= max(0.08 * ex, 2), (src, approx[src], ex)


def test_quantiles_close_to_exact(spark):
    docs = load_table(spark, SF_DIR, "documents")
    approx = {r["source"]: r for r in length_quantiles(docs).collect()}
    exact = {r["source"]: r for r in length_quantiles(docs, exact=True).collect()}
    for src, ex in exact.items():
        for col in ("p25", "p50", "p75", "p95"):
            # GK with accuracy=10k on ≤1k rows per group is near-exact
            assert abs(approx[src][col] - ex[col]) <= max(0.05 * ex[col], 1.0)


def test_sketch_aggregation_is_partial(spark):
    """The HLL aggregate must partial-combine map-side: two HashAggregate
    levels with the sketch function, no token stream through a single
    reducer."""
    docs = load_table(spark, SF_DIR, "documents")
    df = approx_distinct_tokens(docs)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = df._jdf.queryExecution().explainString(jmode)
    assert plan.count("HashAggregate") >= 2
    assert "approx_count_distinct" in plan
