"""Distributed logistic-regression training + AUC eval
(`operators/classifier.py`): partition-invariance of the trained
weights (the exact-decimal-gradient property), AUC vs a brute-force
pairwise twin, confusion-count exactness, and learning on a separable
fixture."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lol_data_collection_system_spark.operators import classifier as clf


def _fixture(spark, n=60, parts=3):
    # deterministic rational features; label correlated with f1
    rows = [
        (
            i,
            (i * 7 % 13) / 13.0,
            (i * 5 % 11) / 11.0,
            1 if (i * 7 % 13) / 13.0 > 0.5 else 0,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "id long, f1 double, f2 double, label int"
    ).repartition(parts)


def test_train_partition_invariant(spark):
    """Decimal gradient sums make the trained weights bit-identical no
    matter how the rows are partitioned — the property that lets the
    driver run the same query on any cluster layout."""
    df = _fixture(spark)
    w1 = clf.logreg_train(df.repartition(1), ["f1", "f2"], iters=3)
    w7 = clf.logreg_train(df.repartition(7), ["f1", "f2"], iters=3)
    assert w1 == w7  # bit-exact, not approx


def test_train_learns_separable_signal(spark):
    """label == (f1 > 0.5): the f1 weight must come out positive and
    dominate f2, and training must beat the 0.5-everywhere start."""
    df = _fixture(spark)
    w = clf.logreg_train(df, ["f1", "f2"], iters=8, lr=1.0)
    assert w[1] > 0
    assert abs(w[1]) > abs(w[2])
    scored = clf.logreg_score(df, w, ["f1", "f2"])
    auc = scored.transform(
        lambda d: clf.binary_eval(d, "label", "score")
    ).collect()[0]["auc"]
    assert auc > 0.9


def test_auc_matches_bruteforce(spark):
    """binary_eval's grouped rank-sum AUC == the O(n²) pairwise
    definition (ties count half), on a fixture WITH tied scores."""
    rows = [
        (1, 0.9),
        (1, 0.7),
        (0, 0.7),  # tie across classes
        (1, 0.4),
        (0, 0.3),
        (0, 0.3),  # tie within class
        (0, 0.1),
        (1, 0.1),  # tie across classes
    ]
    df = spark.createDataFrame(rows, "label int, score double")
    got = clf.binary_eval(df, "label", "score").collect()[0]
    pos = [s for y, s in rows if y == 1]
    neg = [s for y, s in rows if y == 0]
    wins = sum(
        1.0 if p > q else (0.5 if p == q else 0.0)
        for p in pos
        for q in neg
    )
    expect = wins / (len(pos) * len(neg))
    assert got["auc"] == pytest.approx(expect, abs=1e-6)
    assert got["n_pos"] == len(pos) and got["n_neg"] == len(neg)


def test_confusion_counts(spark):
    rows = [(1, 0.8), (1, 0.2), (0, 0.6), (0, 0.4)]
    df = spark.createDataFrame(rows, "label int, score double")
    got = clf.binary_eval(df, "label", "score", threshold=0.5).collect()[0]
    assert (got["tp"], got["fp"], got["fn"], got["tn"]) == (1, 1, 1, 1)


def test_rational_sigmoid_bounds(spark):
    df = spark.createDataFrame(
        [(float(z),) for z in (-1e9, -3.0, -0.5, 0.0, 0.5, 3.0, 1e9)],
        "z double",
    )
    vals = [
        r["p"]
        for r in df.select(
            clf.rational_sigmoid(F.col("z")).alias("p")
        ).collect()
    ]
    assert all(0.0 < p < 1.0 for p in vals)
    assert vals == sorted(vals)  # monotone
    assert vals[3] == 0.5
