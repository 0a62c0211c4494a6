"""S13 database snapshot/export: manifest-last commit, TTL re-dump gate,
size/status check, and stale-refusing load (the reference's threaded
pg_dump + download endpoints, `monitor/views/snapshot.py:38-80`)."""

from __future__ import annotations

import json

import pytest

from lol_data_collection_system_spark.sources import (
    create_snapshot,
    load_snapshot,
    snapshot_status,
)


def _tables(spark):
    return {
        "dim": spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]),
        "fact": spark.range(10).withColumnRenamed("id", "n"),
    }


def test_snapshot_roundtrip_and_freshness_gate(spark, tmp_path):
    path = str(tmp_path / "snap")
    out = create_snapshot(spark, _tables(spark), path)
    assert out["status"] == "created"
    assert out["tables"] == {"dim": 2, "fact": 10}

    # fresh → "exists", no re-dump (reference 201 path)
    assert create_snapshot(spark, _tables(spark), path)["status"] == "exists"

    st = snapshot_status(path)
    assert st["exists"] and st["fresh"] and st["bytes"] > 0
    assert st["tables"] == {"dim": 2, "fact": 10}

    loaded = load_snapshot(spark, path)
    assert sorted(map(tuple, loaded["dim"].collect())) == [(1, "a"), (2, "b")]
    assert loaded["fact"].count() == 10

    # expired gate → a new dump replaces the old
    assert create_snapshot(spark, _tables(spark), path, ttl_s=0.0)[
        "status"
    ] == "created"


def test_snapshot_refuses_missing_and_stale(spark, tmp_path):
    path = str(tmp_path / "nosnap")
    with pytest.raises(FileNotFoundError):
        load_snapshot(spark, path)
    assert snapshot_status(path) == {
        "exists": False,
        "fresh": False,
        "bytes": 0,
        "tables": {},
    }

    create_snapshot(spark, _tables(spark), path)
    with pytest.raises(ValueError):
        load_snapshot(spark, path, ttl_s=0.0)


def test_snapshot_half_written_is_invisible(spark, tmp_path):
    """The manifest is the commit marker: table files without a manifest
    read as 'missing', never as torn data."""
    root = tmp_path / "torn"
    _tables(spark)["dim"].write.parquet(str(root / "dim"))
    assert not snapshot_status(str(root))["exists"]
    with pytest.raises(FileNotFoundError):
        load_snapshot(spark, str(root))


def test_snapshot_nonblocking_thread(spark, tmp_path):
    path = str(tmp_path / "async_snap")
    out = create_snapshot(spark, _tables(spark), path, blocking=False)
    assert out["status"] == "dumping"
    out["thread"].join(timeout=120)
    assert not out["thread"].is_alive()
    st = snapshot_status(path)
    assert st["exists"] and st["tables"] == {"dim": 2, "fact": 10}


def test_snapshot_manifest_shape(spark, tmp_path):
    path = tmp_path / "mshape"
    create_snapshot(spark, _tables(spark), str(path))
    manifest = json.loads((path / "_MANIFEST.json").read_text())
    assert set(manifest) == {"created_at", "tables"}
