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


def test_write_training_shards_layout_and_order(spark, tmp_path):
    import glob
    import hashlib

    from lol_data_collection_system_spark.operators.packing import (
        pack_order,
        write_training_shards,
    )

    docs = spark.createDataFrame(
        [(i, f"doc body {i}") for i in range(100)], "doc_id long, text string"
    )
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, n_shards=4, salt="epoch0")

    # every row in its md5-assigned shard directory
    back = spark.read.parquet(path)
    assert back.count() == 100
    for r in back.select("doc_id", "shard_id").collect():
        expect = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:15], 16) % 4
        assert r.shard_id == expect

    # intra-shard file order == seeded pack_order (read files directly;
    # parquet preserves row order within a file)
    expected_order = {
        r.doc_id: r.o
        for r in docs.select(
            "doc_id", pack_order(F.col("doc_id"), "epoch0").alias("o")
        ).collect()
    }
    for d in glob.glob(f"{path}/shard_id=*"):
        files = sorted(glob.glob(f"{d}/*.parquet"))
        for fp in files:
            ids = [r.doc_id for r in spark.read.parquet(fp).collect()]
            orders = [expected_order[i] for i in ids]
            assert orders == sorted(orders)

    # same salt → byte-stable contents; new salt → different permutation
    write_training_shards(docs, str(tmp_path / "s2"), n_shards=4, salt="epoch1")
    d0 = [r.doc_id for r in spark.read.parquet(f"{path}/shard_id=0").collect()]
    d1 = [
        r.doc_id
        for r in spark.read.parquet(str(tmp_path / "s2") + "/shard_id=0").collect()
    ]
    assert set(d0) == set(d1)  # assignment is salt-independent
    assert d0 != d1  # order reshuffled by the new salt


def test_write_training_shards_curriculum_order(spark, tmp_path):
    import glob

    from lol_data_collection_system_spark.operators.packing import (
        write_training_shards,
    )

    docs = spark.createDataFrame(
        [(i, f"body {i}", float(i % 7)) for i in range(60)],
        "doc_id long, text string, quality double",
    )
    path = str(tmp_path / "cur")
    write_training_shards(docs, path, n_shards=2, curriculum_col="quality")
    quality = {i: float(i % 7) for i in range(60)}
    for d in glob.glob(f"{path}/shard_id=*"):
        for fp in sorted(glob.glob(f"{d}/*.parquet")):
            qs = [quality[r.doc_id] for r in spark.read.parquet(fp).collect()]
            assert qs == sorted(qs)  # easy-to-hard within each shard


def test_write_training_shards_rejects_reserved_columns(spark, tmp_path):
    """`shard_id` is a plausible upstream name (manifest tooling) — the
    writer must refuse to clobber it rather than silently dropping the
    user's column from the export; same for the internal `_order`."""
    import pytest

    from lol_data_collection_system_spark.operators.packing import (
        write_training_shards,
    )

    base = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    for col in ("shard_id", "_order"):
        bad = base.withColumn(col, base.doc_id)
        with pytest.raises(ValueError, match=col):
            write_training_shards(bad, str(tmp_path / "x"), n_shards=2)


def test_pack_sequences_order_expr_overrides_hash_order(spark):
    """Curriculum hook: with order_expr the token stream follows the
    caller's schedule (here: score descending), not the salt hash."""
    import pyspark.sql.functions as F

    from lol_data_collection_system_spark.operators.packing import (
        pack_sequences,
    )

    rows = [
        (1, "a b c", 0.2),
        (2, "d e f g", 0.9),   # best doc -> must open chunk 0
        (3, "h i", 0.5),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "score"])
    out = pack_sequences(
        docs, "doc_id", "text", seq_len=4, order_expr=-F.col("score")
    ).collect()
    chunk0 = sorted(
        [r for r in out if r.chunk_id == 0], key=lambda r: r.tok_start
    )
    # stream order: doc2 (4 toks) fills chunk 0; doc3 then doc1 follow
    assert [r.doc_id for r in chunk0] == [2]
    chunk1 = sorted(
        [r for r in out if r.chunk_id == 1], key=lambda r: (r.doc_id,)
    )
    assert {r.doc_id for r in chunk1} == {1, 3}
