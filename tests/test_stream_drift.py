"""Streaming PSI monitor: stream == batch, baseline semantics, alerts."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from lol_data_collection_system_spark.streaming import (
    baseline_probs,
    psi_stream,
)

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("source", T.StringType()),
        T.StructField("v", T.LongType()),
    ]
)

KW = dict(lo=0.0, hi=100.0, n_buckets=10)


def _baseline(spark, vals):
    corpus = spark.createDataFrame([(v,) for v in vals], "v long")
    return baseline_probs(corpus, "v", **KW)


def _write(spark, src, name, rows):
    spark.createDataFrame(rows, ["ts_s", "source", "v"]).select(
        F.col("ts_s").cast("timestamp").alias("ts"), "source", "v"
    ).coalesce(1).write.mode("overwrite").json(str(src / name))


def test_stream_equals_batch(spark, tmp_path):
    base = _baseline(spark, [5, 15, 25, 35, 45] * 10)
    src = tmp_path / "psi_src"
    out = tmp_path / "psi_out"
    ckpt = tmp_path / "psi_ckpt"
    src.mkdir()
    _write(
        spark,
        src,
        "f1",
        [
            ("2024-01-01 00:00:10", "a", 5),
            ("2024-01-01 00:00:20", "a", 15),
            ("2024-01-01 00:01:30", "b", 95),
            ("2024-01-01 00:01:40", "b", 85),
        ],
    )
    # flush row pushes the watermark past the first windows
    _write(spark, src, "f2", [("2024-01-01 02:00:00", "z", 50)])

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src) + "/*")
    )
    q = (
        psi_stream(stream, base, "source", "v", window_duration="1 minute", **KW)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got_stream = {
        (r["window_start"], r["source"]): (r["n_rows"], r["psi"])
        for r in spark.read.parquet(str(out)).collect()
    }

    batch = spark.read.schema(SCHEMA).json(str(src) + "/*")
    got_batch = {
        (r["window_start"], r["source"]): (r["n_rows"], r["psi"])
        for r in psi_stream(
            batch, base, "source", "v", window_duration="1 minute", **KW
        ).collect()
    }
    # every emitted stream window matches the batch computation exactly
    assert got_stream
    for k, v in got_stream.items():
        assert got_batch[k] == v, (k, v, got_batch[k])
    # the flush row's window is pending in the stream, present in batch
    assert set(got_batch) - set(got_stream)


def test_in_distribution_low_drifted_high(spark):
    base_vals = [5, 15, 25, 35, 45] * 10
    base = _baseline(spark, base_vals)
    rows = [("2024-01-01 00:00:%02d" % (i % 60), "good", v) for i, v in enumerate(base_vals)]
    rows += [("2024-01-01 00:00:%02d" % (i % 60), "bad", 95) for i in range(20)]
    batch = spark.createDataFrame(rows, ["ts_s", "source", "v"]).select(
        F.col("ts_s").cast("timestamp").alias("ts"), "source", "v"
    )
    out = {
        r["source"]: r["psi"]
        for r in psi_stream(
            batch, base, "source", "v", window_duration="10 minutes", **KW
        ).collect()
    }
    assert out["good"] < 0.05
    assert out["bad"] > 0.25


def test_baseline_length_guard(spark):
    import pytest

    batch = spark.createDataFrame([], SCHEMA)
    with pytest.raises(ValueError, match="buckets"):
        psi_stream(batch, [0.5, 0.5], "source", "v", **KW)


# ---------------------------------------------------------------------------
# Tokenizer-fertility drift (chars-per-piece vs a static merge table)
# ---------------------------------------------------------------------------
DOC_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("source", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)

FKW = dict(lo=0.0, hi=4.0, n_buckets=8)


def _merge_table(spark):
    from lol_data_collection_system_spark.operators.bpe import bpe_merges

    corpus = spark.createDataFrame(
        [("the cat sat on the mat the cat",)], "text string"
    )
    return bpe_merges(corpus, n_merges=4), 4, corpus


def test_fertility_stream_equals_batch(spark, tmp_path):
    """The windowed fertility PSI must be identical on the streaming and
    batch executions of the same plan, with the merge table riding as a
    static side (stream-static broadcast joins)."""
    from lol_data_collection_system_spark.streaming.drift import (
        baseline_probs,
        fertility_psi_stream,
        fertility_values,
    )

    merges, nm, corpus = _merge_table(spark)
    base_vals = fertility_values(
        corpus.selectExpr(
            "CAST('2024-01-01' AS TIMESTAMP) AS ts",
            "'c' AS source", "text",
        ),
        merges, nm,
    )
    base = baseline_probs(base_vals, "fertility", smooth=0.5, **FKW)

    src = tmp_path / "fert_src"
    out = tmp_path / "fert_out"
    ckpt = tmp_path / "fert_ckpt"
    src.mkdir()
    rows1 = [
        ("2024-01-01 00:00:10", "a", "the cat sat on the mat"),
        ("2024-01-01 00:00:40", "a", "the mat the cat"),
        ("2024-01-01 00:01:20", "b", "zqxv wjkp bbbb qqqq zzzz"),
    ]
    rows2 = [("2024-01-01 02:00:00", "z", "flush row text")]
    for name, rows in [("f1", rows1), ("f2", rows2)]:
        spark.createDataFrame(rows, ["ts_s", "source", "text"]).select(
            F.col("ts_s").cast("timestamp").alias("ts"), "source", "text"
        ).coalesce(1).write.mode("overwrite").json(str(src / name))

    kw = dict(window_duration="1 minute", **FKW)
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src) + "/*")
    )
    q = (
        fertility_psi_stream(stream, merges, nm, base, **kw)
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got_stream = {
        (r["window_start"], r["source"]): (r["n_rows"], r["psi"])
        for r in spark.read.parquet(str(out)).collect()
    }
    batch = spark.read.schema(DOC_SCHEMA).json(str(src) + "/*")
    got_batch = {
        (r["window_start"], r["source"]): (r["n_rows"], r["psi"])
        for r in fertility_psi_stream(batch, merges, nm, base, **kw).collect()
    }
    assert got_stream
    for k, v in got_stream.items():
        assert got_batch[k] == v, (k, v, got_batch[k])
    assert set(got_batch) - set(got_stream)  # flush window pending


def test_fertility_drift_detects_unmergeable_text(spark):
    """In-distribution text scores low; text the merge table cannot
    compress (fertility pinned at 1 char/piece) scores high."""
    from lol_data_collection_system_spark.streaming.drift import (
        baseline_probs,
        fertility_psi_stream,
        fertility_values,
    )

    merges, nm, corpus = _merge_table(spark)
    ts_corpus = corpus.selectExpr(
        "CAST('2024-01-01' AS TIMESTAMP) AS ts", "'c' AS source", "text"
    )
    base = baseline_probs(
        fertility_values(ts_corpus, merges, nm), "fertility", smooth=0.5,
        **FKW,
    )
    rows = [
        ("2024-01-01 00:00:10", "good", "the cat sat on the mat the cat"),
        ("2024-01-01 00:00:20", "bad", "zq xv wj kp qn vz xj qk wz jv"),
    ]
    batch = spark.createDataFrame(rows, ["ts_s", "source", "text"]).select(
        F.col("ts_s").cast("timestamp").alias("ts"), "source", "text"
    )
    out = {
        r["source"]: r["psi"]
        for r in fertility_psi_stream(
            batch, merges, nm, base, window_duration="10 minutes", **FKW
        ).collect()
    }
    assert out["good"] < 0.1
    assert out["bad"] > 0.25
