"""File source/sink round-trips (S8-S11) and partition pruning on the
match-store layout (§4 item 5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lol_data_collection_system_spark.sources import io as io_src


def test_ratelimit_csv_roundtrip(spark, tmp_path):
    rows = [
        (1700000000.5, "euw", "match", 10, 42, 500),
        (1700000001.5, "na", "", 600, 7, 100),  # app-level row
    ]
    df = spark.createDataFrame(rows, io_src.RATELIMIT_LOG)
    path = str(tmp_path / "logs")
    io_src.write_ratelimit_log(df, path)
    io_src.write_ratelimit_log(df, path)  # append second file → union
    back = io_src.read_ratelimit_logs(spark, path)
    assert back.count() == 4
    assert back.schema == io_src.RATELIMIT_LOG
    # '' method round-trips as null under default CSV options — normalize
    app_rows = back.filter(F.col("method").isNull() | (F.col("method") == ""))
    assert app_rows.count() == 2


def test_match_store_partition_pruning(spark, tmp_path):
    rows = [
        (i, i % 3, f"8.{i % 4}.1.{i}", 1800 + i) for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, ["match_id", "region_id", "game_version", "game_duration"]
    )
    path = str(tmp_path / "store")
    io_src.write_match_store(df, path)

    back = io_src.read_match_store(spark, path)
    pruned = back.filter(
        (F.col("region_id") == 1) & (F.col("major_minor") == "8.2")
    )
    want = [r for r in rows if r[1] == 1 and r[2].startswith("8.2.")]
    assert pruned.count() == len(want)
    # pruning is visible in the plan: the partition filters move into
    # PartitionFilters, not post-scan Filter
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = pruned._jdf.queryExecution().explainString(jmode)
    assert "PartitionFilters" in plan
    assert "region_id" in plan.split("PartitionFilters")[1].split("\n")[0]
