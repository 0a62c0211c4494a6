"""S15 materialized summary cache: build-once, TTL expiry, and source
fingerprint invalidation (the reference's memcached hourly summary,
`monitor/views/ratelimit.py:52-55`, with the extra guarantee that a
summary never outlives a change to its inputs)."""

from __future__ import annotations

import os
import time

from lol_data_collection_system_spark.sources import materialize_summary


def test_materialize_summary_caches_and_invalidates(spark, tmp_path):
    src = tmp_path / "src.txt"
    src.write_text("v1")
    path = str(tmp_path / "summary.parquet")
    builds = {"n": 0}

    def build():
        builds["n"] += 1
        return spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])

    out1 = materialize_summary(spark, path, build, sources=[str(src)])
    assert sorted(map(tuple, out1.collect())) == [(1, "a"), (2, "b")]
    assert builds["n"] == 1

    # fresh → served from the materialization, no rebuild
    out2 = materialize_summary(spark, path, build, sources=[str(src)])
    assert sorted(map(tuple, out2.collect())) == [(1, "a"), (2, "b")]
    assert builds["n"] == 1

    # source content change (size+mtime fingerprint) → rebuild
    time.sleep(0.01)
    src.write_text("v2 longer")
    materialize_summary(spark, path, build, sources=[str(src)])
    assert builds["n"] == 2

    # expired TTL → rebuild even with unchanged sources
    materialize_summary(spark, path, build, sources=[str(src)], ttl_s=0.0)
    assert builds["n"] == 3


def test_materialize_summary_no_sources_ttl_only(spark, tmp_path):
    path = str(tmp_path / "s2.parquet")
    builds = {"n": 0}

    def build():
        builds["n"] += 1
        return spark.range(3)

    materialize_summary(spark, path, build, ttl_s=3600)
    materialize_summary(spark, path, build, ttl_s=3600)
    assert builds["n"] == 1
    assert os.path.exists(path)


def test_synthetic_kills_materializes(spark, tmp_path, monkeypatch):
    """The fight pipeline's kills summary goes through the S15 cache."""
    from lol_data_collection_system_spark.plans import domain_queries as dq

    monkeypatch.setattr(dq, "SUMMARY_CACHE_DIR", str(tmp_path))
    dq._KILLS_CACHE.clear()
    try:
        sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
        kills = dq.synthetic_kills(spark, sf)
        n = kills.count()
        assert n > 0
        sf_name = os.path.basename(sf.rstrip("/"))
        assert os.path.exists(str(tmp_path / f"kills_{sf_name}.parquet"))
        # memoized handle: same object second time
        assert dq.synthetic_kills(spark, sf) is kills
    finally:
        for df in dq._KILLS_CACHE.values():
            df.unpersist()
        dq._KILLS_CACHE.clear()


def test_listing_fingerprint_is_mtime_free_and_o_file_count(tmp_path):
    """The serve-path staleness fingerprint (VERDICT r7 #1): relative
    names + sizes + count, never a content read. Directory form: a
    touch (mtime-only change) is invisible — parquet rewrites always
    change the part listing. Single-FILE form keeps mtime (r8 review:
    a plain file CAN be rewritten in place at the same size, so
    name+size alone would miss it; a spurious rebuild on touch is the
    safe direction)."""
    import os
    import time

    from lol_data_collection_system_spark.sources.cache import (
        listing_fingerprint,
    )

    d = tmp_path / "tbl.parquet"
    d.mkdir()
    (d / "part-0").write_bytes(b"aaaa")
    (d / "part-1").write_bytes(b"bb")
    fp0 = listing_fingerprint(str(d))
    assert fp0["n_files"] == 2 and fp0["entries"]["part-1"] == 2
    # mtime churn does not invalidate a DIRECTORY listing
    past = time.time() - 9999
    os.utime(d / "part-0", (past, past))
    assert listing_fingerprint(str(d)) == fp0
    # a new part file does; so does a size change
    (d / "part-2").write_bytes(b"c")
    assert listing_fingerprint(str(d)) != fp0
    (d / "part-2").unlink()
    (d / "part-1").write_bytes(b"bbb")
    assert listing_fingerprint(str(d)) != fp0
    # single-file form: name+size AND mtime (touch -> rebuild, safely)
    f = tmp_path / "one.parquet"
    f.write_bytes(b"xyz")
    fp1 = listing_fingerprint(str(f))
    assert fp1["n_files"] == 1 and fp1["entries"] == {"one.parquet": 3}
    os.utime(f, (past, past))
    assert listing_fingerprint(str(f)) != fp1
    assert listing_fingerprint(str(tmp_path / "nope")) == {"missing": True}


def test_materialize_summary_listing_mode(spark, tmp_path):
    """fingerprint='listing' over a DIRECTORY source: an mtime touch
    must NOT rebuild (stat mode would); a part-listing change must."""
    import os
    import time

    from lol_data_collection_system_spark.sources.cache import (
        materialize_summary,
    )

    src = tmp_path / "src_tbl"
    src.mkdir()
    (src / "part-0").write_bytes(b"12345")
    path = str(tmp_path / "sum.parquet")
    builds = {"n": 0}

    def build():
        builds["n"] += 1
        return spark.range(2)

    kw = dict(sources=[str(src)], ttl_s=None, fingerprint="listing")
    materialize_summary(spark, path, build, **kw)
    past = time.time() - 5000
    os.utime(src / "part-0", (past, past))
    materialize_summary(spark, path, build, **kw)
    assert builds["n"] == 1  # touch is invisible for directory sources
    (src / "part-1").write_bytes(b"6")  # the listing changed
    materialize_summary(spark, path, build, **kw)
    assert builds["n"] == 2


def test_materialize_summary_incremental_refresh_equals_recompute(
    spark, tmp_path
):
    """VERDICT r9 stretch #8: a stale cache with a `refresh` hook folds
    ONLY the appended delta into the old summary via the rollup-merge
    mechanism, and the refreshed materialization equals a full
    recompute; a REWRITE (not an append) declines to the full build."""
    from pyspark.sql import functions as F

    from lol_data_collection_system_spark.sources.cache import (
        materialize_summary,
    )
    from lol_data_collection_system_spark.streaming.rollup import (
        hourly_partial,
    )

    src = tmp_path / "events_tbl"
    rows0 = [
        (1, "click", "2024-01-01 10:05:00", 10.0),
        (2, "click", "2024-01-01 10:15:00", 20.0),
        (3, "view", "2024-01-01 11:05:00", 5.0),
    ]
    rows1 = [
        (4, "click", "2024-01-01 10:45:00", 7.0),
        (5, "buy", "2024-01-01 12:01:00", 99.0),
    ]

    def ev_frame(rows):
        return spark.createDataFrame(
            rows, ["event_id", "event_type", "ts_s", "value"]
        ).select(
            "event_id", "event_type",
            F.col("ts_s").cast("timestamp").alias("ts"), "value",
        )

    ev_frame(rows0).coalesce(1).write.mode("overwrite").parquet(str(src))

    path = str(tmp_path / "hourly_states.parquet")
    builds = {"n": 0}
    refreshed_reads: list = []

    def build():
        builds["n"] += 1
        return hourly_partial(spark.read.parquet(str(src)))

    def refresh(old_df, old_fps, new_fps):
        old_entries = old_fps[str(src)]["entries"]
        new_entries = new_fps[str(src)]["entries"]
        if not set(old_entries) <= set(new_entries) or any(
            old_entries[f] != new_entries[f] for f in old_entries
        ):
            return None  # rewritten, not appended: decline to full build
        fresh = sorted(set(new_entries) - set(old_entries))
        refreshed_reads.append(fresh)
        delta = hourly_partial(
            spark.read.parquet(*[str(src / f) for f in fresh])
        )
        # algebraic merge, HOURLY_MERGE semantics: union + re-agg
        return old_df.unionByName(delta).groupBy(
            "hour_ms", "event_type"
        ).agg(
            F.sum("n_events").alias("n_events"),
            F.sum("_sum_value").alias("_sum_value"),
            F.max("_max_value").alias("_max_value"),
            F.min("_first_event").alias("_first_event"),
        )

    kw = dict(
        sources=[str(src)], ttl_s=None, fingerprint="listing",
        refresh=refresh,
    )
    materialize_summary(spark, path, build, **kw)
    assert builds["n"] == 1 and refreshed_reads == []

    # append a delta part file (new names: the listing diff IS the delta)
    ev_frame(rows1).coalesce(1).write.mode("append").parquet(str(src))
    got = {
        (r["hour_ms"], r["event_type"]): (
            r["n_events"], float(r["_sum_value"]), r["_first_event"]
        )
        for r in materialize_summary(spark, path, build, **kw).collect()
    }
    assert builds["n"] == 1  # the cache miss cost the DELTA, not a build
    assert len(refreshed_reads) == 1 and refreshed_reads[0]
    want = {
        (r["hour_ms"], r["event_type"]): (
            r["n_events"], float(r["_sum_value"]), r["_first_event"]
        )
        for r in hourly_partial(spark.read.parquet(str(src))).collect()
    }
    assert got == want  # refreshed summary == full recompute

    # a rewrite (old part files replaced) declines to the full build
    ev_frame(rows0 + rows1).coalesce(1).write.mode("overwrite").parquet(
        str(src)
    )
    got2 = {
        (r["hour_ms"], r["event_type"]): r["n_events"]
        for r in materialize_summary(spark, path, build, **kw).collect()
    }
    assert builds["n"] == 2  # declined -> full rebuild
    assert got2 == {k: v[0] for k, v in want.items()}
