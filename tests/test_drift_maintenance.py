"""Drift audits wired to maintenance ACTIONS (VERDICT r9 #2/#3): the
IVF ingest sink consumes a cell-skew threshold and retrains when
frozen-centroid routing piles vectors into few cells; the corpus ingest
sink consumes a df-cap and rebuilds when a batch flips a cap decision.
In both cases the drifted ingest's rebuilt store equals a from-scratch
retrain/build, and undrifted ingest never triggers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lol_data_collection_system_spark.operators.dedup import (
    read_corpus_index,
    write_corpus_index,
)
from lol_data_collection_system_spark.operators.similarity import (
    ivf_cell_profile,
    kmeans_assign,
    kmeans_centroids,
)
from lol_data_collection_system_spark.sources.versioned import (
    current_version,
)
from lol_data_collection_system_spark.streaming.dedup import (
    corpus_ingest_sink,
)
from lol_data_collection_system_spark.streaming.serve import (
    ivf_ingest_sink,
    read_ivf_centroids,
    read_ivf_index,
)

VSCHEMA = "vec_id long, embedding array<double>"
DSCHEMA = "doc_id long, text string"


def test_ivf_ingest_skew_triggers_retrain(spark, tmp_path):
    """A drifted ingest (every new vector lands in one cell) crosses the
    load-factor threshold and the sink retrains: the committed store
    equals a from-scratch k-means over the full corpus, the NEW
    centroids are stored and route later batches."""
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cid int, cvec array<double>"
    )
    all_rows: list = []
    calls: list = []

    def retrain(sp):
        calls.append(len(all_rows))
        vecs = sp.createDataFrame(all_rows, VSCHEMA)
        return (
            kmeans_assign(vecs, k=2, iters=2),
            kmeans_centroids(vecs, k=2, iters=2),
        )

    store = str(tmp_path / "ivf")
    sink = ivf_ingest_sink(
        store, cents, compact_files=None, skew_ratio=1.5, retrain=retrain
    )

    balanced = [
        (1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0]), (4, [0.1, 0.9]),
    ]
    all_rows.extend(balanced)
    sink(spark.createDataFrame(balanced, VSCHEMA), 0)
    assert calls == []  # load factor 1.0: no trigger

    drifted = [(10 + i, [1.0, 0.01 * i]) for i in range(6)]
    all_rows.extend(drifted)
    sink(spark.createDataFrame(drifted, VSCHEMA), 1)
    # hot cell holds 8/10 -> load factor 1.6 > 1.5: retrain fired once
    assert calls == [10]

    want_idx = sorted(
        tuple(r)
        for r in kmeans_assign(
            spark.createDataFrame(all_rows, VSCHEMA), k=2, iters=2
        ).collect()
    )
    got_idx = sorted(
        tuple(r) for r in read_ivf_index(spark, store).collect()
    )
    assert got_idx == want_idx  # rebuilt store == from-scratch retrain
    want_cents = sorted(
        (r["cid"], tuple(r["cvec"]))
        for r in kmeans_centroids(
            spark.createDataFrame(all_rows, VSCHEMA), k=2, iters=2
        ).collect()
    )
    got_cents = sorted(
        (r["cid"], tuple(r["cvec"]))
        for r in read_ivf_centroids(spark, store).collect()
    )
    assert got_cents == want_cents

    # later batches route against the STORED (retrained) centroids
    from lol_data_collection_system_spark.operators.similarity import (
        ivf_index_delta,
    )

    late = [(99, [0.2, 0.8])]
    all_rows.extend(late)
    sink(spark.createDataFrame(late, VSCHEMA), 2)
    empty = spark.createDataFrame([], "vec_id long, cid bigint")
    want_late = {
        (r["vec_id"], r["cid"])
        for r in ivf_index_delta(
            empty,
            spark.createDataFrame(late, VSCHEMA),
            read_ivf_centroids(spark, store),
        ).collect()
    }
    got_late = {
        (r["vec_id"], r["cid"])
        for r in read_ivf_index(spark, store)
        .filter(F.col("vec_id") == 99)
        .collect()
    }
    assert got_late == want_late

    # the profile operator reads the same occupancy the sink acts on:
    # shares sum to 1 and load_factor is share scaled by n_cells
    prof = ivf_cell_profile(
        read_ivf_index(spark, store), n_cells=2
    ).collect()
    assert abs(sum(r["share"] for r in prof) - 1.0) < 1e-5
    for r in prof:
        assert abs(r["load_factor"] - 2 * r["share"]) < 1e-5
    assert sum(r["n_vectors"] for r in prof) == len(all_rows)


def test_ivf_ingest_undrifted_never_retrains(spark, tmp_path):
    """Balanced ingest under the same threshold: no retrain, store is
    exactly the pure O(delta) appends routed by the ORIGINAL centroids."""
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cid int, cvec array<double>"
    )
    calls: list = []

    def retrain(sp):  # pragma: no cover - must never run
        calls.append(1)
        raise AssertionError("retrain fired on undrifted ingest")

    store = str(tmp_path / "ivf_ok")
    sink = ivf_ingest_sink(
        store, cents, compact_files=None, skew_ratio=1.5, retrain=retrain
    )
    b0 = [(1, [1.0, 0.0]), (2, [0.0, 1.0])]
    b1 = [(3, [0.9, 0.1]), (4, [0.1, 0.9])]
    sink(spark.createDataFrame(b0, VSCHEMA), 0)
    sink(spark.createDataFrame(b1, VSCHEMA), 1)
    assert calls == []
    assert read_ivf_centroids(spark, store) is None
    got = sorted(
        (r["vec_id"], r["cid"])
        for r in read_ivf_index(spark, store).collect()
    )
    assert got == [(1, 0), (2, 1), (3, 0), (4, 1)]
    # counters carried in meta, folded O(delta) per batch
    _vdir, meta = current_version(store)
    assert meta["cell_counts"] == {"0": 2, "1": 2}

    with pytest.raises(ValueError, match="come together"):
        ivf_ingest_sink(store, cents, skew_ratio=1.5)


def test_corpus_ingest_capped_rebuild_on_cap_flip(spark, tmp_path):
    """A df-capped ingest loop survives cap-crossing drift: the refusal
    triggers an inline rebuild equal to a from-scratch capped build over
    the logical corpus; undrifted batches keep the O(delta) append."""
    ingested: list = []
    rebuilds: list = []

    def rebuild_docs(sp):
        rebuilds.append(len(ingested))
        return sp.createDataFrame(ingested, DSCHEMA)

    path = str(tmp_path / "cidx")
    out = str(tmp_path / "statuses")
    sink = corpus_ingest_sink(
        path, out, k=3, n_hashes=16, band_size=2, threshold=0.5,
        compact_files=None, max_doc_freq=2, rebuild_docs=rebuild_docs,
    )

    b0 = [
        (1, "shared phrase among peers plus alpha beta gamma"),
        (2, "shared phrase among peers plus delta epsilon zeta"),
    ]
    sink(spark.createDataFrame(b0, DSCHEMA), 0)
    ingested.extend(b0)
    assert rebuilds == []  # df hit the cap but flipped nothing

    # one more holder of the shared phrase flips its cap decision
    b1 = [(3, "shared phrase among peers plus eta theta iota")]
    sink(spark.createDataFrame(b1, DSCHEMA), 1)
    ingested.extend(b1)
    assert rebuilds == [2]  # refusal -> rebuild, exactly once

    scratch = str(tmp_path / "scratch")
    write_corpus_index(
        spark.createDataFrame(ingested, DSCHEMA), scratch,
        "doc_id", "text", 3, 2,
    )

    def snap(p):
        idx = read_corpus_index(spark, p)
        fp_df, sh_df, hot_df = idx
        return (
            sorted(tuple(r) for r in fp_df.collect()),
            sorted(tuple(r) for r in sh_df.collect()),
            sorted(r["shingle"] for r in hot_df.collect()),
        )

    assert snap(path) == snap(scratch)  # rebuild == from-scratch build
    assert snap(path)[2]  # the shared phrase's shingles went hot

    # undrifted follow-up: plain append, no second rebuild
    b2 = [(4, "wholly different follow up content with new words")]
    sink(spark.createDataFrame(b2, DSCHEMA), 2)
    ingested.extend(b2)
    assert rebuilds == [2]
    stored_ids = {
        r["doc_id"] for r in read_corpus_index(spark, path)[1]
        .select("doc_id").distinct().collect()
    }
    assert 4 in stored_ids

    # statuses were written for every batch, including the drifted one
    statuses = {
        (r["doc_id"], r["status"])
        for r in spark.read.parquet(out).collect()
    }
    assert {(1, "novel"), (2, "novel"), (4, "novel")} <= statuses

    with pytest.raises(ValueError, match="come together"):
        corpus_ingest_sink(path, out, max_doc_freq=2)


def test_capped_rebuild_preserves_stored_band_and_set_tiers(
    spark, tmp_path
):
    """A sink attached to an externally-built index (bands + sets
    stored) must not silently drop those subdirs when its drift rebuild
    fires — serve-time consumers rely on the stored tier."""
    base = spark.createDataFrame(
        [
            (1, "shared phrase among peers plus alpha beta gamma"),
            (2, "shared phrase among peers plus delta epsilon zeta"),
        ],
        DSCHEMA,
    )
    path = str(tmp_path / "ext_idx")
    write_corpus_index(
        base, path, "doc_id", "text", 3, 2, bands=(16, 2), sets=True
    )
    ingested = [tuple(r) for r in base.collect()]

    def rebuild_docs(sp):
        return sp.createDataFrame(ingested, DSCHEMA)

    out = str(tmp_path / "ext_statuses")
    sink = corpus_ingest_sink(
        path, out, k=3, n_hashes=16, band_size=2, threshold=0.5,
        compact_files=None, max_doc_freq=2, rebuild_docs=rebuild_docs,
    )
    # one more holder of the shared phrase -> cap flip -> rebuild
    sink(
        spark.createDataFrame(
            [(3, "shared phrase among peers plus eta theta iota")],
            DSCHEMA,
        ),
        0,
    )
    idx = read_corpus_index(spark, path)
    assert idx.meta["bands"] == [16, 2] and idx.meta["has_sets"]
    assert idx.bands is not None and idx.bands.take(1)
    assert idx.sets is not None and idx.sets.take(1)


def test_ivf_skew_retrain_carries_in_flight_batch(spark, tmp_path):
    """A retrain provider whose corpus store LAGS the stream (its source
    misses the batch that fired the trigger) must not lose that batch's
    vectors (ADVICE r10): the sink routes the just-committed delta
    against the NEW centroids and unions it into the rebuild version —
    the advanced checkpoint means no replay would restore them."""
    from lol_data_collection_system_spark.operators.similarity import (
        ivf_index_delta,
    )

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cid int, cvec array<double>"
    )
    balanced = [
        (1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0]), (4, [0.1, 0.9]),
    ]
    drifted = [(10 + i, [1.0, 0.01 * i]) for i in range(6)]

    # LAGGING provider: reads only the pre-drift corpus snapshot
    def retrain(sp):
        vecs = sp.createDataFrame(balanced, VSCHEMA)
        return (
            kmeans_assign(vecs, k=2, iters=2),
            kmeans_centroids(vecs, k=2, iters=2),
        )

    store = str(tmp_path / "ivf_lag")
    sink = ivf_ingest_sink(
        store, cents, compact_files=None, skew_ratio=1.5, retrain=retrain
    )
    sink(spark.createDataFrame(balanced, VSCHEMA), 0)
    sink(spark.createDataFrame(drifted, VSCHEMA), 1)  # fires the retrain

    got = {
        (r["vec_id"], r["cid"])
        for r in read_ivf_index(spark, store).collect()
    }
    got_ids = {v for v, _ in got}
    # every drifted-batch vector survives the rebuild...
    assert got_ids == {1, 2, 3, 4} | {10 + i for i in range(6)}
    # ...and the carried rows are routed by the RETRAINED centroids
    retrained_base = kmeans_assign(
        spark.createDataFrame(balanced, VSCHEMA), k=2, iters=2
    )
    want = {
        (r["vec_id"], r["cid"])
        for r in retrained_base.unionByName(
            ivf_index_delta(
                retrained_base,
                spark.createDataFrame(drifted, VSCHEMA),
                kmeans_centroids(
                    spark.createDataFrame(balanced, VSCHEMA), k=2, iters=2
                ),
            )
        ).collect()
    }
    assert got == want
    # counters reflect the carried rows too (the next trigger decision
    # sees the physical index)
    _, meta = current_version(store)
    assert sum(meta["cell_counts"].values()) == 10
