"""Tier ordinal averaging (SURVEY.md §2 A5/U5/P16; reference
`enumerations.py:1-32`, applied two-level at `utils.py:89-94`).

The reference maps tier text → ordinal 0..26, drops UNRANKED, means,
**banker's-rounds** (Python 3 `round`), and maps back. Spark mapping:
broadcast ordinal dim join → `avg` → `bround` (HALF_EVEN — `F.round`
would be HALF_UP and diverge on *.5 means) → join back. Groups whose
every member is UNRANKED average to "UNRANKED" (`enumerations.py:29-30`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: enumerations.py:4-12 — index IS the ordinal
TIERS = [
    "BRONZE V", "BRONZE IV", "BRONZE III", "BRONZE II", "BRONZE I",
    "SILVER V", "SILVER IV", "SILVER III", "SILVER II", "SILVER I",
    "GOLD V", "GOLD IV", "GOLD III", "GOLD II", "GOLD I",
    "PLATINUM V", "PLATINUM IV", "PLATINUM III", "PLATINUM II", "PLATINUM I",
    "DIAMOND V", "DIAMOND IV", "DIAMOND III", "DIAMOND II", "DIAMOND I",
    "MASTER I",
    "CHALLENGER I",
]


def tier_ordinal_dim(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        list(enumerate(TIERS)), ["ordinal", "tier"]
    )


def tier_average(
    df: DataFrame, group_cols: list[str], tier_col: str = "tier"
) -> DataFrame:
    """Per group: the reference's ordinal-mean tier.

    UNRANKED rows are excluded from the mean but keep the group alive —
    a group with only UNRANKED members yields "UNRANKED". One broadcast
    join in, avg+bround, one broadcast join out; no custom UDAF needed
    (the survey's U5 note).
    """
    spark = df.sparkSession
    dim = F.broadcast(
        tier_ordinal_dim(spark).select("ordinal", F.col("tier").alias("_dim_tier"))
    )
    joined = df.join(dim, F.col(tier_col) == F.col("_dim_tier"), "left")
    agg = joined.groupBy(*group_cols).agg(
        F.bround(F.avg("ordinal")).cast("int").alias("avg_ordinal"),
        F.count("ordinal").alias("n_ranked"),
    )
    out_dim = F.broadcast(
        tier_ordinal_dim(spark).select(
            F.col("ordinal").alias("avg_ordinal"),
            F.col("tier").alias("avg_tier"),
        )
    )
    return (
        agg.join(out_dim, "avg_ordinal", "left")
        .select(
            *group_cols,
            F.when(F.col("n_ranked") == 0, F.lit("UNRANKED"))
            .otherwise(F.col("avg_tier"))
            .alias("avg_tier"),
        )
    )


def two_level_tier_average(
    df: DataFrame,
    outer_cols: list[str],
    inner_cols: list[str],
    tier_col: str = "tier",
) -> DataFrame:
    """Mean-of-means: average per inner group (team), then average the
    team tiers per outer group (match) — `utils.py:89-94` averages each
    team's participant tiers, then the two team averages."""
    inner = tier_average(df, outer_cols + inner_cols, tier_col)
    return tier_average(
        inner.select(*outer_cols, F.col("avg_tier").alias(tier_col)),
        outer_cols,
        tier_col,
    )
