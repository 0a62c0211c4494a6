"""Custom stateful streaming (SURVEY.md T2): per-key state with
processing-time timeouts via ``applyInPandasWithState``.

Reference: the active gatherer polls each tracked target every 6 minutes
and rotates it out after 30 minutes without a result
(`active_data_gathering.py:271-296`) — per-target mutable state plus a
timeout, hand-rolled in a driver loop. Here the same semantics are a
grouped stateful operator: state holds the per-target observation count
and last-seen time; a processing-time timeout emits the final "rotated"
row and drops the state. State lives in the state store (checkpointed,
partitioned by key) — per-target tracking scales horizontally instead of
living in one process's loop.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TRACKER_OUTPUT = T.StructType(
    [
        T.StructField("target", T.StringType()),
        T.StructField("n_observations", T.LongType()),
        T.StructField("status", T.StringType()),  # active | rotated
    ]
)

TRACKER_STATE = T.StructType([T.StructField("n_observations", T.LongType())])


def track_targets(
    events: DataFrame,
    target_col: str = "target",
    timeout_ms: int = 30 * 60 * 1000,
) -> DataFrame:
    """Per target: running observation count; after `timeout_ms` without
    new events the target is emitted once as `rotated` and its state is
    freed (the reference's 30-minute rotation)."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (target,) = key
        if state.hasTimedOut:
            (n,) = state.get
            state.remove()
            yield pd.DataFrame(
                {"target": [target], "n_observations": [n], "status": ["rotated"]}
            )
            return
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {"target": [target], "n_observations": [n], "status": ["active"]}
        )

    return (
        events.groupBy(target_col)
        .applyInPandasWithState(
            update,
            TRACKER_OUTPUT,
            TRACKER_STATE,
            "update",
            GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
