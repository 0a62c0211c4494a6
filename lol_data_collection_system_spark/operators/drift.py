"""Distribution-drift monitoring: PSI (population stability index).

The production question: *has this source's data drifted away from the
corpus it was curated against?* A mixture re-weighted last month, a
crawler that silently changed extraction, a source that started
emitting truncated docs — all show up as a shift in per-source value
distributions long before they show up in model metrics. PSI is the
standard monitoring statistic for exactly this
(Σ_b (p_b − q_b)·ln(p_b/q_b) over histogram buckets; rule-of-thumb
thresholds 0.1 "watch" / 0.25 "act").

Plan shape: ONE pass builds all per-(group, bucket) counts (map-side
combined hash-agg — the shuffle carries groups×buckets cells, not
rows); the corpus baseline aggregates from the same cells; the PSI
fold is over ≤ n_buckets broadcast-joined cells per group. Nothing is
row-count-sized after the first aggregation, so the 100 TB cost is the
scan.

Determinism contract (cross-engine): bucket ids are integer floor
arithmetic on fixed [lo, hi) constants; probabilities are additively
smoothed count ratios (exact int inputs → identical doubles); each
bucket's contribution is rounded to 9 dp and decimal-summed
(order-free), and the final PSI rounds to 6 dp — the same
rounded-transcendental discipline as `text.token_entropy` /
`retrieval.unigram_lm_scores`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucket_of(
    value: Column, lo: float, hi: float, n_buckets: int
) -> Column:
    """Fixed-width bucket id in [0, n_buckets); values outside [lo, hi)
    clamp into the edge buckets (drifted mass must still land SOMEWHERE
    countable — dropping it would hide exactly the drift this measures)."""
    width = (hi - lo) / n_buckets
    raw = F.floor((value.cast("double") - F.lit(lo)) / F.lit(width))
    return F.least(
        F.lit(n_buckets - 1), F.greatest(F.lit(0), raw.cast("int"))
    )


def psi_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float,
    hi: float,
    n_buckets: int = 10,
    smooth: float = 0.5,
) -> DataFrame:
    """(group, n_rows, psi) — each group's value distribution vs the
    WHOLE frame's distribution over a shared fixed grid.

    Additive `smooth` on every bucket (p_b = (c_b + s)/(N + s·B)) keeps
    empty buckets finite without dropping them — a bucket the baseline
    never hits but a drifted group fills is the loudest signal there
    is, and epsilon-free PSI would return ±inf on it.
    """
    b = bucket_of(F.col(value_col), lo, hi, n_buckets).alias("_b")
    cells = (
        df.select(F.col(group_col), b)
        .groupBy(group_col, "_b")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    # dense (group × bucket) grid so empty buckets still contribute
    groups = cells.groupBy(group_col).agg(F.sum("_c").alias("_n"))
    grid = groups.crossJoin(
        F.broadcast(
            cells.sparkSession.range(n_buckets).select(
                F.col("id").cast("int").alias("_b")
            )
        )
    )
    dense = grid.join(cells, [group_col, "_b"], "left").select(
        group_col,
        "_b",
        "_n",
        F.coalesce(F.col("_c"), F.lit(0)).alias("_c"),
    )
    base = dense.groupBy("_b").agg(F.sum("_c").alias("_bc"))
    # corpus total as a 1-row broadcast (no second scan of the data)
    tot = base.agg(F.sum("_bc").alias("_tot"))
    sb = float(smooth) * n_buckets
    joined = (
        dense.join(F.broadcast(base), "_b")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col(group_col),
            F.col("_n"),
            (
                (F.col("_c") + F.lit(float(smooth)))
                / (F.col("_n") + F.lit(sb))
            ).alias("_p"),
            (
                (F.col("_bc") + F.lit(float(smooth)))
                / (F.col("_tot").cast("double") + F.lit(sb))
            ).alias("_q"),
        )
    )
    contrib = joined.select(
        F.col(group_col),
        F.col("_n"),
        F.round(
            (F.col("_p") - F.col("_q")) * F.log(F.col("_p") / F.col("_q")), 9
        )
        .cast("decimal(28,9)")
        .alias("_t"),
    )
    return contrib.groupBy(group_col).agg(
        F.max("_n").cast("bigint").alias("n_rows"),
        F.round(F.sum("_t").cast("double"), 6).alias("psi"),
    )
