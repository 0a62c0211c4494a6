"""Effective-gold fold (utils.py:485-513 semantics): purchase/sell/
destroy/undo signs, the item-0 and banner-1018 special cases, and
gold-at-kill-time via the as-of join."""

from __future__ import annotations

from pyspark.sql import functions as F

from lol_data_collection_system_spark.operators import gold as gold_ops

ITEMS = [("8.11", 1001, 350), ("8.11", 2003, 500), ("8.11", 3004, 1100)]


def _events(spark):
    rows = [
        # (match, pid, ts, type, item, before, after)
        (1, 1, 1000, "ITEM_PURCHASED", 1001, None, None),   # +350
        (1, 1, 2000, "ITEM_PURCHASED", 2003, None, None),   # +500 → 850
        (1, 1, 3000, "ITEM_SOLD", 1001, None, None),        # −350 → 500
        (1, 1, 4000, "ITEM_UNDO", None, 2003, 3004),        # −500+1100 → 1100
        (1, 1, 5000, "ITEM_PURCHASED", 1018, None, None),   # +2200 → 3300 (banner)
        (1, 1, 6000, "ITEM_DESTROYED", 9999, None, None),   # unknown → −0 → 3300
        (1, 1, 7000, "ITEM_PURCHASED", 0, None, None),      # item 0 → +0 → 3300
        (1, 2, 1500, "ITEM_PURCHASED", 3004, None, None),   # other participant
        (1, 1, 2500, "CHAMPION_KILL", None, None, None),    # ignored by the fold
    ]
    return spark.createDataFrame(
        rows,
        "match_id long, participant_id int, ts_ms long, type string, "
        "item_id long, before_id long, after_id long",
    ).withColumn("semver", F.lit("8.11"))


def test_effective_gold_fold(spark):
    items = spark.createDataFrame(ITEMS, ["semver", "item_id", "gold_total"])
    tl = gold_ops.effective_gold_timeline(_events(spark), items)
    got = {
        (r.participant_id, r.ts_ms): r.effective_gold
        for r in tl.filter(F.col("match_id") == 1).collect()
    }
    assert got[(1, 1000)] == 350
    assert got[(1, 2000)] == 850
    assert got[(1, 3000)] == 500
    assert got[(1, 4000)] == 1100   # undo swaps 2003 → 3004
    assert got[(1, 5000)] == 3300   # banner special case, not in dim
    assert got[(1, 6000)] == 3300   # unknown item worth 0
    assert got[(1, 7000)] == 3300   # item 0 worth 0
    assert got[(2, 1500)] == 1100   # independent per participant


def test_gold_at_kill_time(spark):
    items = spark.createDataFrame(ITEMS, ["semver", "item_id", "gold_total"])
    tl = gold_ops.effective_gold_timeline(_events(spark), items)
    kills = spark.createDataFrame(
        [(1, 1, 2500), (1, 1, 4500), (1, 2, 1000)],
        "match_id long, participant_id int, ts_ms long",
    )
    got = {
        (r.participant_id, r.ts_ms): r.effective_gold
        for r in gold_ops.gold_at_events(tl, kills).collect()
    }
    assert got[(1, 2500)] == 850    # after the 2nd purchase, before the sale
    assert got[(1, 4500)] == 1100   # after the undo
    assert got[(2, 1000)] == 0      # before any item event
