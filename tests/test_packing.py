"""Sequence packing invariants: chunks tile the token stream exactly,
per-doc spans partition each document, and the two-phase distributed
prefix sum gives identical offsets for ANY partition count (the property
that makes it a safe replacement for a single-partition global window)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lol_data_collection_system_spark.operators.packing import pack_sequences


def _docs(spark, n=40, tokens_per_doc=None):
    rows = []
    for i in range(n):
        k = tokens_per_doc or (3 + (i * 7) % 25)
        rows.append((i, " ".join(f"t{i}_{j}" for j in range(k))))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_chunks_tile_exactly(spark):
    docs = _docs(spark)
    out = pack_sequences(docs, seq_len=64).collect()
    total = docs.select(
        F.sum(F.size(F.split(F.trim("text"), r"\s+")))
    ).collect()[0][0]
    per_chunk = {}
    for r in out:
        assert 0 <= r.tok_start < r.tok_end
        per_chunk[r.chunk_id] = per_chunk.get(r.chunk_id, 0) + (
            r.tok_end - r.tok_start
        )
    n_chunks = max(per_chunk) + 1
    assert set(per_chunk) == set(range(n_chunks))  # no chunk gaps
    for cid in range(n_chunks - 1):
        assert per_chunk[cid] == 64  # every full window exactly filled
    assert per_chunk[n_chunks - 1] == total - 64 * (n_chunks - 1)


def test_doc_spans_partition_each_doc(spark):
    docs = _docs(spark, n=25)
    out = pack_sequences(docs, seq_len=32).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_id, r.tok_start, r.tok_end))
    n_tok = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n")
        ).collect()
    }
    for doc, spans in by_doc.items():
        spans.sort()
        # consecutive chunks, spans abut, cover [0, n_tok)
        assert spans[0][1] == 0
        assert spans[-1][2] == n_tok[doc]
        for (c1, _, e1), (c2, s2, _) in zip(spans, spans[1:]):
            assert c2 == c1 + 1 and s2 == e1
    assert set(by_doc) == set(range(25))


def test_partition_count_invariance(spark):
    docs = _docs(spark, n=60)
    ref = sorted(map(tuple, pack_sequences(docs, seq_len=50).collect()))
    for n_parts in (1, 3, 13):
        got = sorted(
            map(
                tuple,
                pack_sequences(
                    docs, seq_len=50, num_partitions=n_parts
                ).collect(),
            )
        )
        assert got == ref, f"offsets changed with num_partitions={n_parts}"


def test_empty_docs_skipped(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, "d e")], ["doc_id", "text"]
    )
    out = pack_sequences(docs, seq_len=4).collect()
    assert 2 not in {r.doc_id for r in out}
    assert sum(r.tok_end - r.tok_start for r in out) == 5
