"""BPE merge training + application (operators/bpe.py) on the classic
hand-checkable corpus."""

from __future__ import annotations

from lol_data_collection_system_spark.operators import bpe


def test_bpe_learns_expected_merges(spark):
    # vocab: low x3, lower x1, lowest x1
    df = spark.createDataFrame(
        [(1, "low low low"), (2, "lower lowest")], "doc_id long, text string"
    )
    rows = {
        r["merge_rank"]: r
        for r in bpe.bpe_merges(df, "text", n_merges=4).collect()
    }
    # round 1: "l o" and "o w" both occur 5x — tie-break pair asc
    assert (rows[1]["pair"], rows[1]["merged"], rows[1]["pair_count"]) == ("l o", "lo", 5)
    # round 2: "lo w" now 5x, everything else <= 2
    assert (rows[2]["pair"], rows[2]["merged"], rows[2]["pair_count"]) == ("lo w", "low", 5)
    # round 3: remaining pairs all count 1 from lower/lowest ("low e" 2x)
    assert (rows[3]["pair"], rows[3]["pair_count"]) == ("low e", 2)
    assert rows[4]["pair_count"] == 1


def test_bpe_overlapping_pairs_merge_leftmost(spark):
    # "aaaa" x2: pairs "a a" count 6 (3 per word); the wrapped-symbol
    # replace merges the run greedily left-to-right -> (aa)(aa) per word
    df = spark.createDataFrame([(1, "aaaa aaaa")], "doc_id long, text string")
    rows = {
        r["merge_rank"]: r for r in bpe.bpe_merges(df, "text", n_merges=2).collect()
    }
    assert (rows[1]["pair"], rows[1]["pair_count"]) == ("a a", 6)
    assert (rows[2]["pair"], rows[2]["merged"], rows[2]["pair_count"]) == (
        "aa aa", "aaaa", 2,
    )


def test_apply_bpe_piece_counts(spark):
    df = spark.createDataFrame(
        [(1, "low low low"), (2, "lower lowest")], "doc_id long, text string"
    )
    merges = bpe.bpe_merges(df, "text", n_merges=2)  # learns lo, low
    out = {r["doc_id"]: r for r in bpe.apply_bpe(df, merges, 2).collect()}
    # doc 1: 3 words, each "low" -> 1 piece
    assert (out[1]["n_words"], out[1]["n_pieces"]) == (3, 3)
    # doc 2: "lower" -> low|e|r (3), "lowest" -> low|e|s|t (4)
    assert (out[2]["n_words"], out[2]["n_pieces"]) == (2, 7)


def test_apply_bpe_survives_empty_merge_rank(spark):
    # merge table with a missing rank must be a no-op for that round,
    # not annihilate the corpus (left join on TRUE, not a crossJoin)
    df = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    merges = bpe.bpe_merges(df, "text", n_merges=1)  # only rank 1 exists
    out = bpe.apply_bpe(df, merges, 3).collect()  # ranks 2-3 empty
    assert out[0]["n_words"] == 2 and out[0]["n_pieces"] == 2
