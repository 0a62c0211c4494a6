"""T9 — gatherer heartbeat (SURVEY.md §2.9).

Reference: each gatherer process touches a log file; the monitor reports
``{name: mtime}`` so operators can see which gatherers are alive
(`monitor/views/gathering.py:12-21`). The Spark-native equivalent is a
``StreamingQueryListener``: every micro-batch progress event IS the
heartbeat — no side-channel files, and it works identically on a
1000-executor cluster because progress events are emitted on the driver.

`HeartbeatListener` keeps the latest progress per query (plus a bounded
history) in memory; `heartbeats_df` exposes the current liveness table as
a DataFrame so it can be joined/queried like any other source — the
monitor view as a query instead of an HTTP endpoint.
"""

from __future__ import annotations

import json
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.listener import StreamingQueryListener

HEARTBEAT_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("status", T.StringType()),  # started | alive | terminated
        T.StructField("last_batch_id", T.LongType()),
        T.StructField("last_ts", T.StringType()),  # progress ISO timestamp
        T.StructField("num_input_rows", T.LongType()),
        T.StructField("n_progress_events", T.LongType()),
    ]
)


class HeartbeatListener(StreamingQueryListener):
    """Records the latest per-query progress; thread-safe (listener
    callbacks fire on Spark's listener bus thread)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._beats: dict[str, dict] = {}

    # -- listener callbacks -------------------------------------------------
    def onQueryStarted(self, event) -> None:
        with self._lock:
            self._beats[str(event.id)] = {
                "query_id": str(event.id),
                "name": event.name,
                "status": "started",
                "last_batch_id": None,
                "last_ts": None,
                "num_input_rows": None,
                "n_progress_events": 0,
            }

    def onQueryProgress(self, event) -> None:
        p = event.progress
        # progress arrives as an object with fields, or raw JSON on some
        # bus paths — normalize defensively
        if isinstance(p, str):
            p = json.loads(p)
            qid, name = p["id"], p.get("name")
            batch, ts = p["batchId"], p["timestamp"]
            rows = p.get("numInputRows", 0)
        else:
            qid, name = p.id, p.name
            batch, ts = p.batchId, p.timestamp
            rows = p.numInputRows
        with self._lock:
            prev = self._beats.get(str(qid), {})
            self._beats[str(qid)] = {
                "query_id": str(qid),
                "name": name if name is not None else prev.get("name"),
                "status": "alive",
                "last_batch_id": int(batch),
                "last_ts": str(ts),
                "num_input_rows": int(rows),
                "n_progress_events": prev.get("n_progress_events", 0) + 1,
            }

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing
        pass

    def onQueryTerminated(self, event) -> None:
        with self._lock:
            prev = self._beats.get(str(event.id), {"query_id": str(event.id)})
            prev["status"] = "terminated"
            self._beats[str(event.id)] = prev

    # -- monitor surface ----------------------------------------------------
    def snapshot(self) -> list[dict]:
        with self._lock:
            return [dict(v) for v in self._beats.values()]


def install_heartbeats(spark: SparkSession) -> HeartbeatListener:
    listener = HeartbeatListener()
    spark.streams.addListener(listener)
    return listener


def heartbeats_df(spark: SparkSession, listener: HeartbeatListener) -> DataFrame:
    """The liveness table: one row per known streaming query. Local rows
    (listener state lives on the driver, like the reference's monitor) —
    the DataFrame form exists so monitors can filter/join it with SQL."""
    rows = listener.snapshot()
    return spark.createDataFrame(rows, HEARTBEAT_SCHEMA) if rows else (
        spark.createDataFrame([], HEARTBEAT_SCHEMA)
    )
