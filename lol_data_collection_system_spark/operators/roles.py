"""Sequential-elimination role assignment (SURVEY.md §2 A9/U3).

Reference: `create_champion_lane_mapping` (`utils.py:419-480`) assigns
JUNGLE → SUPPORT → TOP → BOTTOM → MID per team by repeated argmax/argmin
over the *remaining* candidates — each pick removes its winner from the
pool, so later picks depend on earlier ones. That sequential dependence
is what makes this a grouped `applyInPandas` rather than five independent
window-rank queries: a plain `row_number()` per metric could hand two
roles to the same candidate.

Scale: one Arrow batch per group (a team = 5 rows in the reference;
bounded in general), shuffled once on the group key; the Python fold per
group is O(roles × candidates).
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


@dataclass(frozen=True)
class RoleRule:
    """One elimination step: assign `role` to the remaining candidate with
    the max (or min) `metric`. `prefilter` optionally narrows candidates
    first, falling back to all remaining if none qualify — mirroring the
    reference's smite-carrier fallback (`utils.py:452-455`)."""

    role: str
    metric: str
    ascending: bool = False
    prefilter: str | None = None  # pandas query string


def assign_roles(
    df: DataFrame,
    group_cols: list[str],
    rules: list[RoleRule],
    id_col: str,
    remainder_role: str | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per group, run the elimination sequence and return
    (group_cols..., id_col, role).

    Ties break on `tiebreak_col` ascending (defaults to `id_col`) —
    Python's `max` keeps the first of equals, so an explicit stable sort
    reproduces deterministic picks. If `remainder_role` is set, the last
    unassigned candidate gets it (the reference's "midlaner remains",
    `utils.py:473`).
    """
    tb = tiebreak_col or id_col
    out_fields = [df.schema[c] for c in group_cols]
    out_fields.append(df.schema[id_col])
    out_fields.append(T.StructField("role", T.StringType()))
    schema = T.StructType(out_fields)

    def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
        remaining = pdf.sort_values(tb, kind="mergesort")
        picks: list[tuple[object, str]] = []
        for rule in rules:
            if remaining.empty:
                break
            pool = remaining
            if rule.prefilter:
                narrowed = remaining.query(rule.prefilter)
                if not narrowed.empty:
                    pool = narrowed
            ordered = pool.sort_values(
                rule.metric, ascending=rule.ascending, kind="mergesort"
            )
            winner = ordered.iloc[0]
            picks.append((winner[id_col], rule.role))
            remaining = remaining[remaining[id_col] != winner[id_col]]
        if remainder_role is not None and len(remaining) == 1:
            picks.append((remaining.iloc[0][id_col], remainder_role))
        head = pdf.iloc[0]
        return pd.DataFrame(
            {
                **{c: [head[c]] * len(picks) for c in group_cols},
                id_col: [p[0] for p in picks],
                "role": [p[1] for p in picks],
            }
        )

    return df.groupBy(*group_cols).applyInPandas(run_group, schema)
