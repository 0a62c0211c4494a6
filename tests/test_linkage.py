"""Fuzzy record-linkage operator tests (operators/linkage.py)."""

from __future__ import annotations

import pytest

from lol_data_collection_system_spark.operators.linkage import (
    fuzzy_link_names,
    normalize_name,
    qgrams,
)


def _link(spark, dirty, clean, **kw):
    d = spark.createDataFrame([(s,) for s in dirty], ["name"])
    c = spark.createDataFrame([(s,) for s in clean], ["name"])
    return fuzzy_link_names(d, c, "name", "name", **kw).collect()


def test_links_typos_with_correct_distance(spark):
    rows = _link(
        spark,
        dirty=["acme corp", "acme cor", "widgetco"],
        clean=["acme corp", "widget co"],
        max_dist=2,
    )
    got = {(r.dirty_name, r.clean_name): r.edit_dist for r in rows}
    assert got[("acme corp", "acme corp")] == 0
    assert got[("acme cor", "acme corp")] == 1
    assert got[("widgetco", "widget co")] == 1


def test_dedupes_and_counts_records_per_string(spark):
    rows = _link(
        spark,
        dirty=["Acme  Corp", "acme corp ", "acme cor"],
        clean=["acme corp", "acme corp"],
        max_dist=1,
    )
    by_pair = {(r.dirty_name, r.clean_name): r for r in rows}
    exact = by_pair[("acme corp", "acme corp")]
    # both dirty spellings normalize to the same string -> one pair,
    # n_dirty counts the records behind it; master had 2 records
    assert exact.n_dirty == 2 and exact.n_clean == 2
    near = by_pair[("acme cor", "acme corp")]
    assert near.n_dirty == 1 and near.edit_dist == 1


def test_beyond_max_dist_is_dropped_even_if_blocked_together(spark):
    rows = _link(
        spark,
        dirty=["acme corporation"],
        clean=["acme corp"],
        max_dist=2,  # true distance is 7: shares grams, fails verify
    )
    assert rows == []


def test_gram_cap_drops_stopgram_only_pairs(spark):
    # 'xx ' family grams are shared by every master row (df=3); with the
    # cap at 2 the only blocking grams left are the rare suffix grams,
    # so 'xx a' can still find 'xx ab' but 'zz q' loses its only link
    # path ('zz ' appears... ) — construct: dirty shares ONLY capped
    # grams with master.
    dirty = ["the x"]
    clean = ["the a", "the b", "the c"]
    uncapped = _link(spark, dirty, clean, max_dist=2)
    capped = _link(spark, dirty, clean, max_dist=2, max_gram_freq=2)
    assert len(uncapped) == 3  # 'the ' grams block it to every master row
    assert capped == []  # every shared gram exceeds the cap -> no candidates


def test_short_strings_block_on_whole_string(spark):
    rows = _link(spark, dirty=["ab"], clean=["ab"], q=3, max_dist=0)
    assert len(rows) == 1 and rows[0].edit_dist == 0


def test_qgrams_and_normalize_shapes(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame([("  Red   Bolt ",)], ["s"])
    out = df.select(
        qgrams(normalize_name(F.col("s")), 3).alias("g"),
        normalize_name(F.col("s")).alias("n"),
    ).collect()[0]
    assert out.n == "red bolt"
    assert out.g == ["red", "ed ", "d b", " bo", "bol", "olt"]


def test_golden_records_column_level_survivorship(spark):
    """Each column independently survives from the highest-priority
    feed that has it non-null; all-null columns stay NULL."""
    import pyspark.sql.functions as F

    from lol_data_collection_system_spark.operators.aggregates import (
        golden_records,
    )

    feed = spark.createDataFrame(
        [
            # key 1: balance only in pri-1, segment only in pri-2
            (1, 10.0, None, 1),
            (1, None, "B", 2),
            # key 2: both feeds have balance -> higher priority wins
            (2, 20.0, "A", 1),
            (2, 25.0, None, 2),
            # key 3: nothing anywhere
            (3, None, None, 1),
        ],
        "k bigint, bal double, seg string, pri int",
    )
    got = {
        r.k: (r.bal, r.seg, r.n_feed_rows)
        for r in golden_records(
            feed, ["k"], ["bal", "seg"], F.col("pri")
        ).collect()
    }
    assert got[1] == (10.0, "B", 2)   # stitched across feeds
    assert got[2] == (25.0, "A", 2)   # priority beats completeness
    assert got[3] == (None, None, 1)
