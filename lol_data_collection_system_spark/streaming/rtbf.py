"""Streaming right-to-be-forgotten: a DELETION-REQUEST stream folded
into the stored index families (round 10 — the streaming half of
VERDICT r9 #1's store-level deletion).

The batch primitives do the work (`dedup.delete_from_corpus_index`,
`streaming/serve.delete_from_ivf_store` — O(delete-set) tombstone
commits; `versioned.compact_version` — the physical purge), so the
streaming layer is a thin foreachBatch loop with the same replay story
the ingest sinks have: idempotency is CONTENT-keyed (already-tombstoned
ids commit nothing), never batch-id-keyed, so crashed/replayed/
fresh-checkpoint-re-delivered request batches are all no-ops.

Near-duplicate expansion happens INSIDE the loop when a component
labeling is supplied — a deletion request must take the requested
document's near-copies with it, or the content survives verbatim under
other ids (the duplication loophole `delete_propagation` closes).

Reference analogue: the reference has no deletion story at all (its
stores only grow); this is net-new governance surface a crawl-scale
pipeline legally needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["deletion_sink", "deletion_stream"]


def deletion_sink(
    corpus_index_path: str | None = None,
    ivf_store_path: str | None = None,
    labels: DataFrame | None = None,
    id_col: str = "doc_id",
    purge_files: int | None = None,
):
    """foreachBatch body: each micro-batch of requested ids expands one
    hop through the near-dup components (when ``labels`` — any
    (id, component_id) map — is given) and tombstones into the stored
    corpus index and/or the versioned IVF store.

    ``purge_files``: when set, `compact_version` runs after each fold
    with this threshold — pending tombstones FORCE compaction, so every
    request batch purges physically before the sink returns (the
    low-latency deletion-SLA mode). Leave None to let the ingest sinks'
    own ``compact_files`` watchers amortize the purge into the next
    compaction they were paying anyway (the throughput mode; reads
    anti-join pending tombstones either way, so deleted content stops
    serving at the tombstone commit, not at the purge)."""
    from ..operators.dedup import delete_from_corpus_index
    from ..operators.validation import delete_propagation
    from ..sources.versioned import compact_version
    from .serve import delete_from_ivf_store

    if corpus_index_path is None and ivf_store_path is None:
        raise ValueError(
            "deletion_sink: no target store — pass corpus_index_path "
            "and/or ivf_store_path"
        )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        ids = batch_df.select(F.col(id_col)).distinct()
        if labels is not None:
            ids = (
                delete_propagation(labels, ids, id_col=id_col)
                .filter(F.col("status") != "kept")
                .select(F.col(id_col))
            )
        # pinned once: both store folds must see the same expansion
        ids = ids.localCheckpoint(eager=True)
        if corpus_index_path is not None:
            delete_from_corpus_index(spark, corpus_index_path, ids)
        if ivf_store_path is not None:
            delete_from_ivf_store(spark, ivf_store_path, ids)
        if purge_files is not None:
            for p in (corpus_index_path, ivf_store_path):
                if p is not None:
                    compact_version(spark, p, purge_files)

    return sink


def deletion_stream(
    requests_stream: DataFrame,
    checkpoint_dir: str,
    corpus_index_path: str | None = None,
    ivf_store_path: str | None = None,
    labels: DataFrame | None = None,
    id_col: str = "doc_id",
    purge_files: int | None = None,
):
    """Wire a deletion-request stream into the stored index families;
    returns the StreamingQuery (availableNow — swap the trigger for a
    continuously-draining deletion queue)."""
    return (
        requests_stream.writeStream.foreachBatch(
            deletion_sink(
                corpus_index_path,
                ivf_store_path,
                labels,
                id_col,
                purge_files,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
