"""Content-defined chunking: the boundary-stability property that
justifies CDC over fixed-size chunking, plus dup-count semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lol_data_collection_system_spark.operators import dedup as dedup_ops

MOD = 4  # small mod → short chunks → many boundaries on tiny fixtures


def _chunks_of(spark, docs, **kw):
    """(doc_id -> set of chunk keys) via the operator's internal
    chunking, recovered from a 1-doc-per-text corpus."""
    df = spark.createDataFrame(docs, "doc_id long, text string")
    stats = dedup_ops.cdc_chunk_stats(df, mod=MOD, **kw)
    return {r["doc_id"]: r for r in stats.collect()}


def test_identical_docs_fully_dup(spark):
    out = _chunks_of(
        spark,
        [(1, "aa bb cc dd ee ff gg hh"), (2, "aa bb cc dd ee ff gg hh")],
    )
    for r in out.values():
        assert r["n_dup_chunks"] == r["n_chunks"]
        assert r["dup_ratio"] == 1.0


def test_disjoint_docs_no_dup(spark):
    out = _chunks_of(
        spark, [(1, "aa bb cc dd ee ff"), (2, "zz yy xx ww vv uu")]
    )
    for r in out.values():
        assert r["n_dup_chunks"] == 0
        assert r["dup_ratio"] == 0.0


def test_insertion_preserves_distant_chunks(spark):
    """The CDC property: editing the middle of a long doc must leave
    most chunks identical to the original's, so the copy is still
    detected as mostly-dup. Fixed-size chunking would shift every
    boundary after the edit and report ~0 overlap."""
    base = " ".join(f"tok{i}" for i in range(400))
    words = base.split()
    edited = " ".join(words[:200] + ["INSERTED"] + words[200:])
    out = _chunks_of(spark, [(1, base), (2, edited)])
    # both docs must report most chunks duplicated in the other
    for r in out.values():
        assert r["n_chunks"] > 10  # sanity: chunking actually happened
        assert r["dup_ratio"] > 0.8, dict(r.asDict())


def test_chunk_count_tracks_cut_density(spark):
    """Expected chunk length is `mod` tokens — on 400 tokens the count
    must be within a loose band of 400/mod (hash-uniformity sanity)."""
    text = " ".join(f"w{i}" for i in range(400))
    out = _chunks_of(spark, [(1, text)])
    n = out[1]["n_chunks"]
    assert 400 // MOD // 3 <= n <= 400 // MOD * 3


def test_within_doc_repeat_is_not_cross_doc_dup(spark):
    """A chunk repeated INSIDE one doc only counts as dup if some other
    doc also has it — the metric is cross-doc by definition."""
    rep = "aa bb cc dd " * 10
    out = _chunks_of(spark, [(1, rep.strip())])
    assert out[1]["n_dup_chunks"] == 0
