"""Right-to-be-forgotten against the STORED index families (VERDICT
r9 #1): O(delete-set) tombstone versions that serve identically to a
from-source rebuild, replayed delete batches as no-ops, and the
physical purge at `compact_version` time — for BOTH the corpus dedup
index and the versioned IVF serving store, including near-duplicate
component expansion from `delete_propagation` (the loophole where
deleted content survives verbatim under other ids)."""

from __future__ import annotations

import pathlib

from pyspark.sql import functions as F

from lol_data_collection_system_spark.operators.dedup import (
    append_corpus_index,
    delete_from_corpus_index,
    incremental_dedup,
    read_corpus_index,
    write_corpus_index,
)
from lol_data_collection_system_spark.operators.graph import dedup_clusters
from lol_data_collection_system_spark.operators.similarity import (
    ivf_serve_topk,
)
from lol_data_collection_system_spark.operators.validation import (
    delete_propagation,
)
from lol_data_collection_system_spark.sources.versioned import (
    compact_version,
    current_version,
)
from lol_data_collection_system_spark.streaming.serve import (
    delete_from_ivf_store,
    ivf_ingest_sink,
    read_ivf_index,
)

KW = dict(
    k=3, n_hashes=16, band_size=2, threshold=0.5, max_doc_freq=None
)


def _classify(spark, delta, path):
    idx = read_corpus_index(spark, path)
    out = incremental_dedup(
        None, delta, "doc_id", "text", corpus_index=idx, **KW
    )
    return {
        r["doc_id"]: (r["status"], r["match_id"]) for r in out.collect()
    }


def test_corpus_index_delete_serves_like_purged_rebuild(spark, tmp_path):
    """Tombstoned index == index rebuilt over the purged corpus, for
    every classification tier; the delete-set expands through near-dup
    components (`delete_propagation`); replays are no-ops; the purge is
    physical and re-admission works after it."""
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            # 2 and 3 are near-duplicates of each other: deleting 2
            # must expand to 3 or the content survives under id 3
            (2, "red orange yellow green blue indigo violet shades"),
            (3, "red orange yellow green blue indigo violet tones"),
            (5, "one two three four five six seven eight nine ten"),
            (6, "entirely separate corpus content about versioning"),
        ],
        "doc_id long, text string",
    )
    delta = spark.createDataFrame(
        [
            # exact copy of DELETED doc 2: must classify novel post-del
            (10, "red orange yellow green blue indigo violet shades"),
            # near rewrite of DELETED doc 3: novel post-delete
            (11, "red orange yellow green blue indigo violet hues"),
            # exact copy of surviving doc 5
            (12, "one two three four five six seven eight nine ten"),
            # near rewrite of surviving doc 1
            (13, "alpha beta gamma delta epsilon zeta eta iota"),
            (14, "wholly unrelated new text with nothing shared"),
        ],
        "doc_id long, text string",
    )
    p = str(tmp_path / "idx")
    write_corpus_index(
        corpus, p, "doc_id", "text", KW["k"], KW["max_doc_freq"],
        bands=(KW["n_hashes"], KW["band_size"]), sets=True,
    )

    # pre-delete: the copies of 2/3 classify as dups
    pre = _classify(spark, delta, p)
    assert pre[10][0] == "exact_dup" and pre[11][0] == "near_dup"

    # delete doc 2, expanded through its near-dup component {2, 3}
    labels = dedup_clusters(
        corpus, spark.createDataFrame([(2, 3)], "id_a long, id_b long")
    )
    prop = delete_propagation(
        labels, spark.createDataFrame([(2,)], "doc_id long")
    )
    dels = prop.filter(F.col("status") != "kept").select("doc_id")
    assert {r["doc_id"] for r in dels.collect()} == {2, 3}
    assert delete_from_corpus_index(spark, p, dels) is True

    got = _classify(spark, delta, p)
    rebuilt_p = str(tmp_path / "rebuilt")
    write_corpus_index(
        corpus.filter(~F.col("doc_id").isin(2, 3)), rebuilt_p,
        "doc_id", "text", KW["k"], KW["max_doc_freq"],
        bands=(KW["n_hashes"], KW["band_size"]), sets=True,
    )
    want = _classify(spark, delta, rebuilt_p)
    assert got == want
    assert got[10][0] == "novel" and got[11][0] == "novel"  # RTBF holds
    assert got[12] == ("exact_dup", 5) and got[13] == ("near_dup", 1)

    # replayed delete batch: no-op, no new version
    vdir_before = current_version(p)[0]
    assert delete_from_corpus_index(spark, p, dels) is False
    assert current_version(p)[0] == vdir_before

    # physical purge at compaction time: forced by pending tombstones
    assert compact_version(spark, p, max_files=10_000) is True
    vdir, meta = current_version(p)
    assert not meta["has_tombstones"]
    assert not (pathlib.Path(vdir) / "tombstones").exists()
    stored_ids = {
        r["doc_id"]
        for r in spark.read.parquet(str(pathlib.Path(vdir) / "shingles"))
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert stored_ids == {1, 5, 6}  # 2 and 3 physically gone
    assert _classify(spark, delta, p) == want  # serve unchanged by purge

    # post-purge, the id space is reusable: re-ingesting doc 2 works
    append_corpus_index(
        spark, p,
        spark.createDataFrame(
            [(2, "red orange yellow green blue indigo violet shades")],
            "doc_id long, text string",
        ),
    )
    re_added = _classify(spark, delta, p)
    assert re_added[10] == ("exact_dup", 2)


def test_capped_index_delete_keeps_df_side_table_exact(spark, tmp_path):
    """The delete commit folds NEGATIVE per-shingle df rows, so the
    bounded-drift append gate tracks the LOGICAL corpus: an append the
    cap refuses before a delete is admitted after it — and the admitted
    index equals the rebuild over the logical corpus."""
    import pytest as _pytest

    # four docs share the phrase -> its shingles sit exactly AT cap 4
    corpus = spark.createDataFrame(
        [
            (i, f"shared phrase among peers here plus filler{i} word{i}")
            for i in range(1, 5)
        ],
        "doc_id long, text string",
    )
    p = str(tmp_path / "capped")
    write_corpus_index(
        corpus, p, "doc_id", "text", 3, 4, bands=(16, 4), sets=True
    )
    one_more = spark.createDataFrame(
        [(9, "shared phrase among peers here plus extra tail words")],
        "doc_id long, text string",
    )
    # at df=4 the shared shingles are AT the cap: one more holder flips
    with _pytest.raises(ValueError, match="over the cap"):
        append_corpus_index(spark, p, one_more)

    assert delete_from_corpus_index(
        spark, p, spark.createDataFrame([(1,)], "doc_id long")
    ) is True
    # logical df dropped to 3: the same append now fits under the cap
    append_corpus_index(spark, p, one_more)

    vdir, _meta = current_version(p)
    folded = {
        r["shingle"]: r["s"]
        for r in spark.read.parquet(str(pathlib.Path(vdir) / "df"))
        .groupBy("shingle")
        .agg(F.sum("df").alias("s"))
        .collect()
        if r["s"] != 0
    }
    truth = {
        r["shingle"]: r["c"]
        for r in read_corpus_index(spark, p)[1]
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert folded == truth  # side table == logical corpus, post-delete

    # compaction (here: the tombstone purge) physically FOLDS the df
    # side table — one row per live shingle, zero-sum rows gone, totals
    # preserved (fold_sums meta, r10)
    from lol_data_collection_system_spark.sources.versioned import (
        compact_version,
    )

    assert compact_version(spark, p, max_files=10_000) is True
    vdir2, _ = current_version(p)
    df_rows = spark.read.parquet(str(pathlib.Path(vdir2) / "df")).collect()
    assert len(df_rows) == len({r["shingle"] for r in df_rows})  # 1/key
    assert all(r["df"] != 0 for r in df_rows)
    assert {r["shingle"]: r["df"] for r in df_rows} == truth
    # and the store still serves: a further append gates correctly
    append_corpus_index(
        spark, p,
        spark.createDataFrame(
            [(20, "fresh unrelated follow up content entirely new")],
            "doc_id long, text string",
        ),
    )


def _mk_store(spark, tmp_path, name, rows, centroids):
    store = str(tmp_path / name)
    batch = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    ivf_ingest_sink(store, centroids)(batch, 0)
    return store


def test_ivf_store_delete_serve_and_purge(spark, tmp_path):
    """IVF serving store deletion: tombstoned vectors stop serving at
    once and results equal a store rebuilt without them; replays no-op;
    a deleted id cannot re-enter before the purge; compaction makes the
    purge physical; post-purge re-ingest serves again."""
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.9, 0.1]),
        (3, [0.8, 0.2]),
        (4, [0.0, 1.0]),
        (5, [0.1, 0.9]),
    ]
    centroids = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "cid int, cvec array<double>",
    )
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    queries = spark.createDataFrame(
        [(100, [1.0, 0.05])], "query_id long, embedding array<double>"
    )

    store = _mk_store(spark, tmp_path, "ivf", rows, centroids)

    def serve(s):
        return sorted(
            (r["query_id"], r["rank"], r["vec_id"])
            for r in ivf_serve_topk(
                queries, emb, read_ivf_index(spark, s), centroids, k=2
            ).collect()
        )

    pre = serve(store)
    assert (100, 1, 1) in pre  # vec 1 is the top hit before deletion

    dels = spark.createDataFrame([(1,), (2,)], "vec_id long")
    assert delete_from_ivf_store(spark, store, dels) is True
    got = serve(store)
    rebuilt = _mk_store(
        spark, tmp_path, "ivf_rebuilt",
        [r for r in rows if r[0] not in (1, 2)], centroids,
    )
    assert got == serve(rebuilt)
    assert all(v not in (1, 2) for (_q, _r, v) in got)

    # replay: no-op
    vdir_before = current_version(store)[0]
    assert delete_from_ivf_store(spark, store, dels) is False
    assert current_version(store)[0] == vdir_before

    # a deleted id cannot silently re-enter before the purge
    ivf_ingest_sink(store, centroids)(
        spark.createDataFrame(
            [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
        ),
        1,
    )
    assert serve(store) == got

    # compaction = the physical purge
    assert compact_version(spark, store, max_files=10_000) is True
    vdir, meta = current_version(store)
    assert not meta["has_tombstones"]
    assert not (pathlib.Path(vdir) / "tombstones").exists()
    stored = {
        r["vec_id"]
        for r in spark.read.parquet(
            str(pathlib.Path(vdir) / "index")
        ).collect()
    }
    assert stored == {3, 4, 5}
    assert serve(store) == got

    # post-purge the id is re-ingestable and serves again
    ivf_ingest_sink(store, centroids)(
        spark.createDataFrame(
            [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
        ),
        2,
    )
    assert (100, 1, 1) in serve(store)


def test_streaming_deletion_queue_folds_both_stores(spark, tmp_path):
    """The streaming RTBF loop: a file-source stream of deletion
    requests (two micro-batches) expands through near-dup components
    and tombstones BOTH stored index families; the final state equals
    batch deletes of the union; a fresh-checkpoint replay is a no-op;
    purge_files makes the purge physical within the run."""
    from lol_data_collection_system_spark.streaming.rtbf import (
        deletion_stream,
    )

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "red orange yellow green blue indigo violet shades"),
            (3, "red orange yellow green blue indigo violet tones"),
            (5, "one two three four five six seven eight nine ten"),
            (6, "entirely separate corpus content about versioning"),
        ],
        "doc_id long, text string",
    )
    cpath = str(tmp_path / "cidx")
    write_corpus_index(
        corpus, cpath, "doc_id", "text", KW["k"], KW["max_doc_freq"],
        bands=(KW["n_hashes"], KW["band_size"]), sets=True,
    )
    rows = [
        (1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.85, 0.15]),
        (5, [0.0, 1.0]), (6, [0.1, 0.9]),
    ]
    centroids = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cid int, cvec array<double>"
    )
    vpath = _mk_store(spark, tmp_path, "vstore", rows, centroids)
    labels = dedup_clusters(
        corpus, spark.createDataFrame([(2, 3)], "id_a long, id_b long")
    )

    src = tmp_path / "del_requests"
    src.mkdir()
    spark.createDataFrame([(2,)], "doc_id long").coalesce(1).write.json(
        str(src / "b1")
    )
    spark.createDataFrame([(6,)], "doc_id long").coalesce(1).write.json(
        str(src / "b2")
    )

    def run(ckpt):
        stream = (
            spark.readStream.schema("doc_id long")
            .option("maxFilesPerTrigger", 1)
            .json(str(src) + "/*")
        )
        q = deletion_stream(
            stream, str(tmp_path / ckpt),
            corpus_index_path=cpath, ivf_store_path=vpath,
            labels=labels, purge_files=10_000,
        )
        q.awaitTermination(120)

    run("ck1")
    # 2 expands to {2, 3}; 6 is a singleton: logical survivors {1, 5}
    alive_docs = {
        r["doc_id"] for r in read_corpus_index(spark, cpath)[1]
        .select("doc_id").distinct().collect()
    }
    assert alive_docs == {1, 5}
    alive_vecs = {
        r["vec_id"] for r in read_ivf_index(spark, vpath).collect()
    }
    assert alive_vecs == {1, 5}
    # purge_files: the purge already happened physically
    for p in (cpath, vpath):
        vdir, meta = current_version(p)
        assert not meta["has_tombstones"]
        assert not (pathlib.Path(vdir) / "tombstones").exists()

    # fresh-checkpoint replay of the same request files: a no-op
    before = (current_version(cpath)[0], current_version(vpath)[0])
    run("ck2")
    assert (current_version(cpath)[0], current_version(vpath)[0]) == before


def test_delete_commit_is_o_delete_set_and_serve_plan_broadcasts(
    spark, tmp_path
):
    """The O(delete-set) claim as measurable evidence: a delete commit
    HARDLINKS every index part-file forward (st_nlink >= 2 — zero data
    copied) and writes only tombstone rows as fresh bytes; the
    tombstone filter in the serve-path read is a broadcast anti-join,
    never a shuffle."""
    import os

    rows = [(i, [1.0 - i * 0.01, i * 0.01]) for i in range(200)]
    centroids = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cid int, cvec array<double>"
    )
    store = _mk_store(spark, tmp_path, "big", rows, centroids)
    dels = spark.createDataFrame([(1,), (2,), (3,)], "vec_id long")
    assert delete_from_ivf_store(spark, store, dels) is True
    vdir, _meta = current_version(store)

    fresh_bytes = linked = 0
    for sub in pathlib.Path(vdir).iterdir():
        if not sub.is_dir():
            continue
        for f in sub.iterdir():
            if not f.is_file() or f.name.startswith(("_", ".")):
                continue
            st = os.stat(f)
            if st.st_nlink >= 2:
                linked += 1
            else:
                fresh_bytes += st.st_size
                assert sub.name == "tombstones", (
                    f"fresh non-tombstone file {f}"
                )
    assert linked >= 1  # every index part-file carried by hardlink
    assert 0 < fresh_bytes < 16_384  # the 3-row delete-set only

    idx = read_ivf_index(spark, store)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = idx._jdf.queryExecution().explainString(jmode)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert plan.count("Exchange") == plan.count("BroadcastExchange")
    # no shuffle exchange anywhere in the tombstone-filtered read


def test_deletion_sink_live_labels_provider_tracks_late_ingest(
    spark, tmp_path
):
    """``labels`` as a CALLABLE (spark -> DataFrame) re-resolves per
    request batch (ADVICE r10): a document ingested AFTER the deletion
    stream starts, near-dup to a LATER deletion request, expands and
    tombstones — a static labels frame is a start-time snapshot under
    which that late copy would survive (asserted here too)."""
    from lol_data_collection_system_spark.streaming.rtbf import (
        deletion_sink,
    )

    corpus = spark.createDataFrame(
        [
            (0, "one two three four five six seven eight nine ten"),
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "red orange yellow green blue indigo violet shades"),
        ],
        "doc_id long, text string",
    )
    cpath = str(tmp_path / "cidx_live")
    write_corpus_index(
        corpus, cpath, "doc_id", "text", KW["k"], KW["max_doc_freq"],
        bands=(KW["n_hashes"], KW["band_size"]), sets=True,
    )
    labels_path = str(tmp_path / "labels_live")
    no_pairs = spark.createDataFrame([], "id_a long, id_b long")
    dedup_clusters(corpus, no_pairs).write.mode("overwrite").parquet(
        labels_path
    )

    sink = deletion_sink(
        corpus_index_path=cpath,
        labels=lambda s: s.read.parquet(labels_path),
    )
    snapshot_labels = spark.read.parquet(labels_path).localCheckpoint(
        eager=True
    )  # what a static-frame sink would keep using
    static_sink = deletion_sink(
        corpus_index_path=cpath, labels=snapshot_labels
    )
    sink(spark.createDataFrame([(0,)], "doc_id long"), 0)

    # AFTER stream start: doc 3 (near-dup of 2) ingests and the live
    # component map is republished to the labels store
    late = spark.createDataFrame(
        [(3, "red orange yellow green blue indigo violet tones")],
        "doc_id long, text string",
    )
    append_corpus_index(spark, cpath, late)
    dedup_clusters(
        corpus.unionByName(late),
        spark.createDataFrame([(2, 3)], "id_a long, id_b long"),
    ).write.mode("overwrite").parquet(labels_path)

    # a static-snapshot expansion of {2} misses the late doc 3
    static_expanded = {
        r["doc_id"]
        for r in delete_propagation(
            snapshot_labels,
            spark.createDataFrame([(2,)], "doc_id long"),
            id_col="doc_id",
        )
        .filter(F.col("status") != "kept")
        .collect()
    }
    assert 3 not in static_expanded

    # the live-provider sink takes doc 3 with the request for doc 2
    sink(spark.createDataFrame([(2,)], "doc_id long"), 1)
    alive = {
        r["doc_id"]
        for r in read_corpus_index(spark, cpath)[1]
        .select("doc_id").distinct().collect()
    }
    assert alive == {1}
    del static_sink  # constructed to prove the API still accepts frames


def test_deletion_sink_warns_on_unexpanded_corpus_delete(spark, tmp_path):
    """Deleting from a corpus index without component expansion warns
    loudly (ADVICE r10): the store keeps one representative per
    fingerprint, so unexpanded deletes can re-admit surviving copies."""
    import warnings

    from lol_data_collection_system_spark.streaming.rtbf import (
        deletion_sink,
    )

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        deletion_sink(corpus_index_path=str(tmp_path / "x"))
    assert any("component" in str(w.message) for w in rec)

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        deletion_sink(ivf_store_path=str(tmp_path / "y"))
    assert not rec  # vector stores have no representative semantics
