"""Distributed PCA: numpy ground-truth twin, plan shape, edge cases.

The operator defines its output operationally (fixed power rounds on a
quantized covariance), so correctness is pinned two ways: the DuckDB
oracle replays the identical rounds (tests/test_oracle_parity.py covers
the declared queries), and THIS file checks the rounds actually land on
the eigendecomposition numpy computes from the same data.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lol_data_collection_system_spark.operators import pca as pca_ops
from lol_data_collection_system_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"
DIM = 64


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings").persist()


@pytest.fixture(scope="module")
def fit(emb):
    return pca_ops.fit_pca(emb, dim=DIM, n_components=2)


def _numpy_cov(emb) -> np.ndarray:
    x = np.array(emb.select("embedding").toPandas()["embedding"].tolist())
    return np.cov(x, rowvar=False, bias=True)


def test_components_match_numpy_eigh(emb, fit):
    c = _numpy_cov(emb)
    w, v = np.linalg.eigh(c)
    # eigh returns ascending; top-2 are the last two columns
    for k, (ours, lam) in enumerate(
        zip(fit["components"], fit["eigenvalues"])
    ):
        ref_vec = v[:, -(k + 1)]
        ref_lam = w[-(k + 1)]
        cos = abs(float(np.dot(ours, ref_vec)) / np.linalg.norm(ours))
        assert cos > 0.999, f"pc{k + 1} diverges from eigh: cos={cos}"
        assert abs(lam - ref_lam) / ref_lam < 1e-3


def test_components_orthogonal_and_ordered(fit):
    v1, v2 = fit["components"]
    assert abs(pca_ops._fold_dot(v1, v2)) < 1e-3
    assert fit["eigenvalues"][0] >= fit["eigenvalues"][1] > 0
    for v in (v1, v2):
        assert abs(math.sqrt(pca_ops._fold_dot(v, v)) - 1.0) < 1e-6


def test_explained_ratio_bounds(fit):
    assert 0.0 < fit["eigenvalues"][0] / fit["trace"] <= 1.0
    assert fit["eigenvalues"][0] + fit["eigenvalues"][1] <= fit["trace"] * (
        1.0 + 1e-9
    )


def test_score_variance_equals_eigenvalue(emb, fit):
    """Var(pc1 scores) == λ1 (the defining property of PCA)."""
    scores = pca_ops.pca_scores(emb, fit, round_to=9)
    row = scores.agg(
        F.var_pop("pc1").alias("v1"), F.var_pop("pc2").alias("v2"),
        F.avg("pc1").alias("m1"),
    ).collect()[0]
    assert abs(row["v1"] - fit["eigenvalues"][0]) / fit["eigenvalues"][0] < 1e-3
    assert abs(row["v2"] - fit["eigenvalues"][1]) / fit["eigenvalues"][1] < 1e-3
    # centered projection → zero mean
    assert abs(row["m1"]) < 1e-6


def test_scores_plan_is_exchange_free(emb, fit):
    """Scoring must stay a map-only codegen projection: the fitted
    vectors ride as literals, so the plan has ZERO shuffles and no
    Python boundary."""
    plan = (
        pca_ops.pca_scores(emb, fit)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_degenerate_constant_input(spark):
    rows = [(i, [1.5] * DIM) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    fit = pca_ops.fit_pca(df, dim=DIM, n_components=1, squarings=2, rounds=3)
    assert fit["eigenvalues"] == [0.0]
    assert fit["components"][0] == [0.0] * DIM
    out = pca_ops.pca_scores(df, fit).collect()
    assert all(r["pc1"] == 0.0 for r in out)


def test_empty_input_raises(spark):
    df = spark.createDataFrame([], "vec_id int, embedding array<float>")
    with pytest.raises(ValueError, match="empty"):
        pca_ops.fit_pca(df, dim=DIM, n_components=1)


def test_incremental_moments_exactly_equal_full_fit(spark, emb):
    """combine_moments(moments(A), moments(B)) must reproduce
    fit_pca(A ∪ B) BIT-FOR-BIT — decimal sums of grid-snapped products
    are exactly associative, so the incremental path is not an
    approximation. This is the property that lets a corpus PCA absorb
    a delta without rescanning the corpus."""
    a = emb.filter("vec_id % 2 = 0")
    b = emb.filter("vec_id % 2 = 1")
    merged = pca_ops.combine_moments(
        pca_ops.moment_frames(a, "embedding", DIM),
        pca_ops.moment_frames(b, "embedding", DIM),
    )
    inc = pca_ops.fit_from_moments(*merged, dim=DIM, n_components=2)
    full = pca_ops.fit_pca(emb, dim=DIM, n_components=2)
    assert inc["means"] == full["means"]
    assert inc["components"] == full["components"]
    assert inc["eigenvalues"] == full["eigenvalues"]
    assert inc["n"] == full["n"]
