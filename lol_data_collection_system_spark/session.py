"""SparkSession factory.

The reference has no execution engine of its own (single-threaded Python +
PostgreSQL); here every knob is chosen for a Catalyst/Tungsten engine that
must scale: AQE on (runtime re-planning, skew-join splitting, partition
coalescing), Arrow on (vectorized pandas UDF exchange), shuffle partitions
sized to the machine rather than the 200 default.

At cluster scale the same builder is used — only ``master`` and the shuffle
partition count change (rule of thumb: 2-3x total executor cores, or rely on
AQE coalescing from a higher initial number).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    """Target parallelism: env override, else machine cores."""
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return max(1, int(env))
    return os.cpu_count() or 8


def get_spark(
    app_name: str = "lol-dcs-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    Defaults are local-mode for tests/bench; on a real cluster pass
    ``master=None`` with spark-submit providing the master and let
    ``shuffle_partitions`` scale with the executor count.
    """
    cores = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cores}]")
        # Runtime re-planning: coalesce tiny shuffle partitions, split skewed
        # ones, convert sort-merge joins to broadcast when a side turns out
        # small. Essential at 100 TB where static planning guesses wrong.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Shuffle width: sized to the machine locally; AQE coalesces down.
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cores))
        # Arrow for every pandas_udf / applyInPandas boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Dims (region/nation/part/...) are tiny → broadcast aggressively.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Session-local timezone pinned so epoch<->timestamp conversions are
        # stable against the DuckDB oracle (naive timestamps).
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
