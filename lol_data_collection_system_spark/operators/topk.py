"""Sorts / limits / top-k (SURVEY.md §2.6, O1-O5)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame, group_cols: list[str], order_by: list[Column], k: int
) -> DataFrame:
    """Top-k rows per group via ranking window.

    Reference: ``max_games_lookback`` caps each player's history walk at
    40/50 games (``utils.py:354,861``). Spark pushes rank<=k into a
    per-partition top-k (WindowGroupLimit) — no full sort of each group.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return df.withColumn("rank_in_group", F.row_number().over(w)).filter(
        F.col("rank_in_group") <= k
    )


def paginate(df: DataFrame, order_by: list[Column], offset: int, limit: int) -> DataFrame:
    """Deterministic ORDER BY + OFFSET + LIMIT pagination.

    Reference: ``itertools.islice(queryset, start_idx, stop_idx)``
    (``find_recurrent_delta_across_n_games.py:89-94``). Spark ≥3.4 has a
    native offset operator; ordering must be total for stable pages.
    """
    return df.orderBy(*order_by).offset(offset).limit(limit)
