"""Streaming ANN serving: score a STREAM of incoming query vectors
against stored index artifacts, emitting per-query top-k matches.

The online half of the stored-serving story (SURVEY §2.11): the corpus
index (IVF assignment + centroids) is trained once and persisted; the
ingest path then answers every arriving vector — retrieval serving,
"find my near-neighbors before admitting this document", embedding
joins — without ever retraining or rescanning the corpus beyond the
probed cells.

Design: per-query top-k needs a rank window, which Structured
Streaming's append mode cannot run incrementally — but the scoring is
STATELESS per query (each query's answer depends only on the static
index), so the exact batch semantics drop out of `foreachBatch`
applying the BATCH operator (`similarity.ivf_serve_topk`) to each
micro-batch. stream == batch is structural, not approximate: the union
of per-batch results equals the batch operator on the union of inputs,
row for row (pinned by pytest). State is zero; the sink partitions by
batch id and dynamically OVERWRITES only that partition, so a replayed
batch (crash between write and checkpoint commit) rewrites its own
deterministic rows in place instead of appending duplicates — pinned
by the sink-replay pytest.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.similarity import ivf_index_append, ivf_serve_topk

__all__ = [
    "ann_serve_sink",
    "ann_serve_stream",
    "ivf_ingest_sink",
    "ivf_ingest_stream",
    "read_ivf_index",
]


def ann_serve_sink(
    out_dir: str,
    emb: DataFrame,
    index: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
):
    """foreachBatch body: batch-exact ANN serving of each micro-batch of
    query vectors, appended to `out_dir` as parquet. Kept separate from
    the wiring so tests (and backfills) can call it on a static frame."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        out = ivf_serve_topk(
            batch_df,
            emb,
            index,
            centroids,
            k=k,
            id_col=id_col,
            vec_col=vec_col,
            query_id_col=query_id_col,
        )
        # replay-idempotent: a re-delivered batch overwrites ITS OWN
        # partition (deterministic rows), never appends a second copy
        (
            out.withColumn("_batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_dir)
        )

    return sink


def ann_serve_stream(
    queries_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    emb: DataFrame,
    index: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
):
    """Wire a query-vector stream into stored-index ANN serving; returns
    the StreamingQuery (availableNow — swap the trigger for continuous
    serving)."""
    return (
        queries_stream.writeStream.foreachBatch(
            ann_serve_sink(
                out_dir,
                emb,
                index,
                centroids,
                k=k,
                id_col=id_col,
                vec_col=vec_col,
                query_id_col=query_id_col,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_ivf_index(spark: SparkSession, store_root: str) -> DataFrame:
    """The committed (id, cid) assignment of a versioned IVF index
    store — what `ivf_serve_topk` takes as ``index``. Raises before the
    first commit (an unbuilt index must not silently serve empty)."""
    from ..sources.versioned import current_version

    cur = current_version(store_root)
    if cur is None:
        raise FileNotFoundError(
            f"no committed IVF index at {store_root}: run the ingest "
            f"stream (or ivf_index_append + commit) first"
        )
    vdir, _meta = cur
    return spark.read.parquet(os.path.join(vdir, "index"))


def ivf_ingest_sink(
    store_root: str,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """foreachBatch body: fold each micro-batch of NEW vectors into the
    versioned (id, cid) index store via `ivf_index_append` — continuous
    ingest into the serving index with zero retraining. Idempotency is
    CONTENT-keyed, deliberately not batch-id-keyed: the append's id
    anti-join makes a replayed (or fresh-checkpoint re-delivered) batch
    fold to the identical index — a batch-id watermark would instead
    silently SKIP genuinely new vectors after a checkpoint reset, since
    fresh checkpoints restart batch ids at 0 (the scd2 sink keys on
    data-derived version stamps for the same reason). The replay cost
    is one redundant (identical) version commit; `commit_version`'s
    compare-and-swap still raises on a concurrent writer instead of
    losing its fold."""
    from ..sources.versioned import commit_version, current_version

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cur = current_version(store_root)
        if cur is None:
            prev_dir = None
            base = spark.createDataFrame(
                [], f"{id_col} bigint, cid bigint"
            )
        else:
            prev_dir, _meta = cur
            base = spark.read.parquet(os.path.join(prev_dir, "index"))
        merged = ivf_index_append(
            base, batch_df, centroids, id_col=id_col, vec_col=vec_col
        )

        def writer(vdir: str) -> None:
            merged.write.parquet(os.path.join(vdir, "index"))

        commit_version(
            store_root,
            writer,
            {"last_batch_id": int(batch_id)},
            expect_current=prev_dir,
        )

    return sink


def ivf_ingest_stream(
    vec_stream: DataFrame,
    store_root: str,
    checkpoint_dir: str,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Wire a new-vector stream into the versioned IVF index store;
    returns the StreamingQuery (availableNow — swap the trigger for
    continuous ingestion). Pair with `read_ivf_index` +
    `ivf_serve_topk` on the query side."""
    return (
        vec_stream.writeStream.foreachBatch(
            ivf_ingest_sink(store_root, centroids, id_col, vec_col)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
