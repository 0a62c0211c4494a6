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

from pyspark.sql import DataFrame

from ..operators.similarity import ivf_serve_topk

__all__ = ["ann_serve_sink", "ann_serve_stream"]


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
