"""Distributed binary-classifier training + evaluation — the quality-
classifier loop a pretraining data pipeline runs over its corpus
(fastText/CCNet-style "does this look like good text" models): train a
linear model ON the cluster, score every document, and evaluate with
AUC + a threshold confusion matrix.

Training is full-batch gradient descent in the shape Spark ML itself
uses (mirrors e.g. spark.ml's LogisticRegression driver loop): the
driver holds the (d+1)-float coefficient vector and each iteration is
ONE map-side-combined aggregation job over the feature frame — the only
driver traffic is d+1 gradient sums per round (a bounded scalar collect,
same class as the packing offsets / waterfilling tables). No per-row
Python, no cached lineage growth: each round's expressions fold the
current weights in as literals, so the frame is scanned `iters` times
and nothing else.

Cross-engine determinism (the property every oracle-gated op here
needs):

- The link function is the RATIONAL logistic surrogate
  ``p = 0.5 * (1 + z / (1 + |z|))`` — add/mul/div/abs only, which IEEE
  754 defines exactly, so Spark, DuckDB, and the Python driver all
  produce bit-identical doubles. ``exp()`` would be library-dependent
  in the last ulp and amplify across iterations.
- Gradient sums go through DECIMAL(38,10) (order-independent exact
  addition — double sums depend on partition order), the same device as
  the k-means / z-score oracles.
- Features must themselves be engine-exact: integer counts and single
  double divisions of integers (see `plans/classifier_queries.py` for
  the paired SQL definitions).

The reference's analogue is the trained match-outcome model
(`proto_data_analysis.py:698-724` fit / `:826-831` predict_proba); this
module is the corpus-side generalization with the training step itself
distributed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Decimal type for order-independent gradient accumulation. 28 integer
#: digits: per-row gradient terms are bounded by max(|f|) * 1 ≈ O(10),
#: so even 10^12 rows stay far inside range.
_GRAD_DECIMAL = "decimal(38,10)"


def margin(weights: list[float], feature_cols: list[str]) -> Column:
    """w0 + w1*f1 + ... (left-associated — the SQL oracle mirrors the
    exact association order, which matters for bit-equality)."""
    z = F.lit(float(weights[0]))
    for w, c in zip(weights[1:], feature_cols):
        z = z + F.lit(float(w)) * F.col(c)
    return z


def rational_sigmoid(z: Column) -> Column:
    """0.5 * (1 + z / (1 + |z|)) — monotone squash onto (0, 1) using
    only IEEE-exact ops, so every engine computes identical bits."""
    return F.lit(0.5) * (F.lit(1.0) + z / (F.lit(1.0) + F.abs(z)))


def logreg_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str = "label",
    iters: int = 4,
    lr: float = 0.5,
) -> list[float]:
    """Fixed-iteration full-batch gradient descent; returns the trained
    weight vector [intercept, w1, ..., wd] as Python floats.

    One aggregation job per iteration (n rides along in the same agg, so
    there is no separate count job); weights start at zero. The update is
    ``w_j -= lr * (grad_j / n)`` with grad_j an exact decimal sum of the
    per-row terms ``(p - y) * f_j``.

    Rows with a NULL label or NULL feature are dropped up front:
    otherwise ``sum`` would silently skip them from the gradient while
    ``count`` still included them in n, shrinking every update by the
    null fraction — training on a biased average.
    """
    df = df.na.drop(subset=[*feature_cols, label_col])
    weights = [0.0] * (len(feature_cols) + 1)
    for _ in range(iters):
        resid = rational_sigmoid(margin(weights, feature_cols)) - F.col(
            label_col
        ).cast("double")
        aggs = [
            F.count(F.lit(1)).alias("n"),
            F.sum(resid.cast(_GRAD_DECIMAL)).alias("g0"),
        ]
        for j, c in enumerate(feature_cols):
            aggs.append(
                F.sum((resid * F.col(c)).cast(_GRAD_DECIMAL)).alias(
                    f"g{j + 1}"
                )
            )
        row = df.agg(*aggs).collect()[0]  # bounded: 1 row, d+2 cols
        n = row["n"]
        weights = [
            w - lr * (float(row[f"g{j}"]) / n)
            for j, w in enumerate(weights)
        ]
    return weights


def logreg_score(
    df: DataFrame,
    weights: list[float],
    feature_cols: list[str],
    score_col: str = "score",
) -> DataFrame:
    """Adds the surrogate-sigmoid score column — a pure projection
    (weights fold in as literals; no join, no shuffle)."""
    return df.withColumn(
        score_col, rational_sigmoid(margin(weights, feature_cols))
    )


def binary_eval(
    scored: DataFrame,
    label_col: str = "label",
    score_col: str = "score",
    threshold: float = 0.5,
) -> DataFrame:
    """One-row frame: n_pos, n_neg, tp, fp, fn, tn, auc.

    AUC is the exact Mann-Whitney statistic with average-rank tie
    handling, computed over the score-GROUPED frame: group scores first
    (pos/neg counts per distinct score — integers), then one ordered
    cumulative window over that much smaller frame. The doubled pair
    count ``U2 = Σ (2·pos·neg_below + pos·neg_same)`` stays in exact
    integer arithmetic; the only float is the final ratio
    ``auc = U2 / (2·P·N)``. The unpartitioned window runs over distinct
    scores only (bounded by score cardinality, not corpus size) — at
    100 TB this is an eval metric over an already-aggregated frame, not
    a data-path operator.

    Rows with a NULL label or NULL score are excluded — an unscored row
    has no rank, and NULL ordering differs between engines, so letting
    them into the window would shift neg_below engine-dependently.
    """
    scored = scored.na.drop(subset=[label_col, score_col])
    y = F.col(label_col).cast("bigint")
    by_score = scored.groupBy(score_col).agg(
        F.sum(y).alias("pos"),
        F.sum(F.lit(1) - y).alias("neg"),
    )
    w = Window.orderBy(score_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = by_score.withColumn(
        "neg_below", F.coalesce(F.sum("neg").over(w), F.lit(0))
    )
    u = ranked.agg(
        F.sum(
            F.lit(2) * F.col("pos") * F.col("neg_below")
            + F.col("pos") * F.col("neg")
        ).alias("u2"),
        F.sum("pos").alias("n_pos"),
        F.sum("neg").alias("n_neg"),
    )
    pred = (F.col(score_col) >= F.lit(threshold)).cast("bigint")
    conf = scored.agg(
        F.sum(y * pred).alias("tp"),
        F.sum((F.lit(1) - y) * pred).alias("fp"),
        F.sum(y * (F.lit(1) - pred)).alias("fn"),
        F.sum((F.lit(1) - y) * (F.lit(1) - pred)).alias("tn"),
    )
    return u.crossJoin(F.broadcast(conf)).select(
        "n_pos",
        "n_neg",
        "tp",
        "fp",
        "fn",
        "tn",
        # try_divide: single-class input has no rankable pairs — AUC is
        # undefined (NULL), not an ANSI divide-by-zero error
        F.round(
            F.try_divide(
                F.col("u2").cast("double"),
                F.lit(2.0) * F.col("n_pos") * F.col("n_neg"),
            ),
            6,
        ).alias("auc"),
    )
