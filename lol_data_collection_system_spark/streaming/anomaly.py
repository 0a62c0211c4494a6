"""Streaming EWMA rate-anomaly scoring — the live twin of
`operators/windows.ewma_scores` (T2-style custom stateful operator).

Per group, `applyInPandasWithState` holds exactly the state the batch
recurrence needs: the next bucket still open, its accumulated count, and
the trailing closed-bucket counts (≤ `window` of them). A bucket closes
when a strictly later bucket arrives for the group; closing emits the
scored row using the SAME integer Horner numerator as the batch plan
(BIGINT fold, one double division), then pushes the count into the
trailing history. Gap buckets between the closed bucket and the next
observed one are synthesized as zeros — the batch op's densified grid,
reproduced incrementally — and scored/emitted too.

Semantics vs batch (documented, pinned by the stream==batch test):

- The stream scores each group's buckets from that group's FIRST
  observed bucket; the batch grid spans the GLOBAL min..max. Groups
  born late have no synthetic leading zeros on the stream side.
- The newest (still-open) bucket per group is never emitted — it closes
  when a later one arrives. The batch side scores it immediately.
- Rows arriving for an already-closed bucket are dropped (the watermark
  analog; state retention is the closure policy here).

State is O(window) longs per group — the state store scales with
|groups|, never with row volume.
"""

from __future__ import annotations

import bisect
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EWMA_OUTPUT = T.StructType(
    [
        T.StructField("g", T.StringType()),
        T.StructField("bucket_ms", T.LongType()),
        T.StructField("cnt", T.LongType()),
        T.StructField("decayed_prev", T.DoubleType()),
        T.StructField("ratio", T.DoubleType()),
    ]
)

#: (next open bucket index, its accumulated count, trailing closed
#: counts oldest→newest, beyond-horizon candidate base bucket, count of
#: consecutive whole-batch rejections agreeing on that candidate)
EWMA_STATE = T.StructType(
    [
        T.StructField("pending_bucket", T.LongType()),
        T.StructField("pending_count", T.LongType()),
        T.StructField("trailing", T.ArrayType(T.LongType())),
        T.StructField("future_bucket", T.LongType()),
        T.StructField("future_agree", T.LongType()),
    ]
)

_BUCKET_MS = {"hour": 3_600_000, "minute": 60_000, "day": 86_400_000}


def _score(cnt: int, trailing: list[int]) -> tuple[float, float] | None:
    """The batch recurrence on one bucket: Horner over newest-first
    trailing counts (integer-exact), None when there is no history."""
    num = 0
    for x in reversed(trailing):  # newest first -> largest weight
        num = num * 2 + x
    if num <= 0:
        return None
    den = (1 << len(trailing)) - 1
    decayed = num / den
    return round(decayed, 6), round(cnt / decayed, 6)


def ewma_stream(
    events: DataFrame,
    group_col: str,
    ts_col: str,
    window: int = 24,
    bucket: str = "hour",
    horizon_buckets: int | None = None,
    adopt_after_batches: int = 2,
) -> DataFrame:
    """Streaming per-bucket EWMA anomaly scores (see module docstring
    for the exact batch-parity contract).

    The gap-densification between the pending bucket and the newest
    observed one is bulk-skipped once the trailing history saturates to
    all-zeros (zero-count buckets with all-zero history emit nothing and
    leave the history all-zero, so the skip is emission-exact): the
    per-batch state update is O(observed buckets x window), never
    O(gap length), so a months-idle minute-granularity group costs the
    same as an active one.

    `horizon_buckets` (optional) guards against corrupt far-future
    timestamps: a bucket more than that many buckets ahead of the
    current base is rejected instead of adopted as the new pending
    bucket (adoption would permanently classify all later real-time
    buckets as late). The guard is RECOVERABLE — a group legitimately
    idle longer than the horizon is not stuck forever:

    - A batch with ANY in-horizon bucket keeps those and drops only the
      far-future outliers (live traffic is the consensus; scattered
      corrupt timestamps never outvote it).
    - When a WHOLE batch lands beyond the horizon, its min bucket is
      recorded as a candidate base; once `adopt_after_batches`
      consecutive all-rejected batches agree on a candidate (each new
      min within `horizon_buckets` of the recorded one), the group is
      deemed legitimately moved on and the batch is admitted re-anchored
      on that candidate (buckets beyond candidate+horizon still drop).
      A lone corrupt timestamp cannot adopt: the next real-time batch is
      in-horizon again and resets the candidate. Batches rejected before
      adoption are dropped by policy (the corrupt-input analog of late
      rows). `horizon_buckets=None` keeps the adopt-anything semantics.
    """
    bucket_ms = _BUCKET_MS[bucket]

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (g,) = key
        if state.exists:
            pending_b, pending_c, trailing, future_b, future_n = state.get
            trailing = list(trailing)
            future_n = future_n or 0
        else:
            pending_b, pending_c, trailing = None, 0, []
            future_b, future_n = None, 0

        # per-bucket counts in this batch
        batch: dict[int, int] = {}
        for pdf in pdfs:
            idx = (
                pdf[ts_col].astype("int64") // 1_000_000 // bucket_ms
            )
            for b, c in idx.value_counts().items():
                batch[int(b)] = batch.get(int(b), 0) + int(c)
        def empty_out():
            return pd.DataFrame(
                {
                    "g": pd.Series([], dtype=object),
                    "bucket_ms": pd.Series([], dtype="int64"),
                    "cnt": pd.Series([], dtype="int64"),
                    "decayed_prev": pd.Series([], dtype=float),
                    "ratio": pd.Series([], dtype=float),
                }
            )

        if not batch:
            state.update((pending_b, pending_c, trailing, future_b, future_n))
            yield empty_out()
            return

        if horizon_buckets is not None:
            base = pending_b if pending_b is not None else min(batch)
            in_h = {
                b: c for b, c in batch.items() if b - base <= horizon_buckets
            }
            if in_h:
                # live in-horizon traffic is the consensus: far-future
                # buckets in the same batch are corrupt outliers —
                # rejected, never adopted as the new pending bucket
                # (which would drop all later real-time buckets as late)
                batch = in_h
                future_b, future_n = None, 0
            else:
                # the WHOLE batch is beyond the horizon: either one
                # corrupt burst or a group legitimately idle longer than
                # the horizon. Track batch-consensus: adopt only after
                # `adopt_after_batches` consecutive all-rejected batches
                # agree (within horizon) on the same candidate base.
                cand = min(batch)
                if future_b is not None and abs(cand - future_b) <= horizon_buckets:
                    future_n += 1
                else:
                    future_b, future_n = cand, 1
                if future_n >= adopt_after_batches:
                    # legitimately moved on — re-anchor on the candidate
                    # (in-batch far-future outliers still drop); the
                    # normal close loop below bulk-skips the silent gap
                    batch = {
                        b: c
                        for b, c in batch.items()
                        if b - cand <= horizon_buckets
                    }
                    future_b, future_n = None, 0
                else:
                    state.update(
                        (pending_b, pending_c, trailing, future_b, future_n)
                    )
                    yield empty_out()
                    return
        if pending_b is None:
            pending_b = min(batch)

        out_rows = []
        last = max(max(batch), pending_b)
        # Close every bucket strictly before the newest observed one,
        # synthesizing zero counts for the silent gaps (the densified
        # grid, incrementally). A zero-count bucket over an all-zero
        # history emits nothing and leaves the history all-zero, so a
        # long silent gap is bulk-skipped instead of iterated: cost is
        # O(observed buckets x window), never O(gap length).
        observed = sorted(b for b in batch if pending_b <= b < last)
        b = pending_b
        while b < last:
            cnt = pending_c + batch.get(b, 0) if b == pending_b else batch.get(b, 0)
            scored = _score(cnt, trailing)
            if scored is not None:
                out_rows.append((g, b * bucket_ms, cnt, *scored))
            trailing.append(cnt)
            if len(trailing) > window:
                trailing = trailing[-window:]
            b += 1
            if not any(trailing):
                # history saturated to all zeros: jump to the next
                # observed bucket (every skipped close appends another
                # zero — only the history LENGTH advances)
                nxt_i = bisect.bisect_left(observed, b)
                nxt = observed[nxt_i] if nxt_i < len(observed) else last
                if nxt > b:
                    trailing = [0] * min(window, len(trailing) + (nxt - b))
                    b = nxt
        pending_c = (pending_c if pending_b == last else 0) + batch.get(
            last, 0
        )
        pending_b = last
        # anything in `batch` below pending_b was behind the closure
        # line: late rows for already-closed buckets — dropped by policy.
        state.update((pending_b, pending_c, trailing, future_b, future_n))
        yield pd.DataFrame(
            out_rows,
            columns=["g", "bucket_ms", "cnt", "decayed_prev", "ratio"],
        )

    grouped = events.select(
        F.col(group_col).cast("string").alias("g"), F.col(ts_col).alias(ts_col)
    ).groupBy("g")
    return grouped.applyInPandasWithState(
        update,
        EWMA_OUTPUT,
        EWMA_STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    ).withColumnRenamed("g", group_col)


TRANSITION_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.StringType()),
        T.StructField("prev_type", T.StringType()),
        T.StructField("next_type", T.StringType()),
        T.StructField("ms", T.LongType()),
    ]
)

#: (last event's epoch ms, last event id, last event type)
TRANSITION_STATE = T.StructType(
    [
        T.StructField("last_ms", T.LongType()),
        T.StructField("last_id", T.LongType()),
        T.StructField("last_type", T.StringType()),
    ]
)


def transition_stream(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Streaming twin of the batch Markov transition pairs
    (`q_event_transition_matrix`'s lag stage): per user the state is
    ONE row — the last event seen — and each arriving event emits its
    (prev_type, next_type) pair. Rows inside a batch are folded in the
    batch op's exact (ms, event_id) total order, and the carried state
    makes cross-batch adjacency identical to the batch lag window, so
    aggregated pair counts match the batch matrix exactly (pinned by
    test_streaming). Late rows older than the carried state are
    dropped by policy (the watermark analog).

    State is O(1) per user — the smallest possible stateful-streaming
    footprint; the downstream matrix aggregation is a stateless
    windowed count over the emitted pairs.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.exists:
            last_ms, last_id, last_type = state.get
        else:
            last_ms, last_id, last_type = None, None, None
        rows = []
        batch = []
        for pdf in pdfs:
            ms = pdf[ts_col].astype("int64") // 1_000_000
            for m, i, t in zip(
                ms.tolist(), pdf[id_col].tolist(), pdf[type_col].tolist()
            ):
                batch.append((int(m), int(i), str(t)))
        for m, i, t in sorted(batch):
            if last_type is not None:
                if (m, i) <= (last_ms, last_id):
                    # late arrival at or behind the carried state — an
                    # exact duplicate of the last event (normal under
                    # at-least-once delivery) must NOT re-emit a
                    # spurious self-transition the batch lag window
                    # never produces
                    continue
                rows.append((user, last_type, t, m))
            last_ms, last_id, last_type = m, i, t
        if last_type is not None:
            state.update((last_ms, last_id, last_type))
        yield pd.DataFrame(
            rows, columns=["user_id", "prev_type", "next_type", "ms"]
        )

    grouped = events.select(
        F.col(user_col).cast("string").alias("user_id"),
        F.col(ts_col),
        F.col(id_col),
        F.col(type_col),
    ).groupBy("user_id")
    return grouped.applyInPandasWithState(
        update,
        TRANSITION_OUTPUT,
        TRANSITION_STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    )
