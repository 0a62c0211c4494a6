"""S13 — database snapshot / export (SURVEY.md §2.1).

Reference: `monitor/views/snapshot.py:38-53` spawns a threaded `pg_dump`
of the whole database behind a 10-minute freshness gate (a second request
within the window gets "already exists"), `:59-67` reports the dump's
size, and `:70-80` serves the file — refusing stale dumps.

The Spark-native equivalent of "dump the whole DB" is a consistent
multi-table parquet export:

- Every table is written under one snapshot root; the manifest
  (`_MANIFEST.json`, with per-table row counts and the creation time) is
  written LAST, so a snapshot is visible only once complete — the
  manifest is the commit marker, and readers of a half-written snapshot
  see "missing", never torn data. The swap itself is write-to-temp +
  `os.rename`, same protocol as the S15 summary cache.
- The freshness gate, size check, and stale-refusal mirror the three
  reference endpoints: `create_snapshot` returns ``"exists"`` instead of
  re-dumping within the TTL, `snapshot_status` is the size check, and
  `load_snapshot` raises on missing/stale like the 404 paths.
- `blocking=False` mirrors the reference's threaded dump: Spark job
  submission is thread-safe, so the export proceeds on a daemon thread
  while the caller returns immediately.

At cluster scale this is the right shape: each table export is a
distributed parquet write (partitioned by the table's own layout, no
driver collection), the manifest is metadata-only, and the snapshot is
readable by any session — unlike a pg_dump file, it needs no restore
step and keeps scan pruning/pushdown.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import time
import uuid
from collections.abc import Mapping
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

#: The reference's 10-minute re-dump gate (`snapshot.py:30`).
SNAPSHOT_TTL_S = 600.0

_MANIFEST = "_MANIFEST.json"


def _read_manifest(root: Path) -> dict | None:
    mp = root / _MANIFEST
    if not mp.exists():
        return None
    try:
        return json.loads(mp.read_text())
    except (json.JSONDecodeError, OSError):
        return None


def _is_fresh(manifest: dict | None, ttl_s: float | None) -> bool:
    if manifest is None:
        return False
    if ttl_s is None:
        return True
    return time.time() - manifest.get("created_at", 0) <= ttl_s


def create_snapshot(
    spark: SparkSession,
    tables: Mapping[str, DataFrame],
    path: str,
    ttl_s: float | None = SNAPSHOT_TTL_S,
    blocking: bool = True,
) -> dict:
    """Export `tables` as one consistent snapshot at `path`.

    Returns a status dict mirroring the reference's HTTP codes:
    ``{"status": "exists", ...}`` when a manifest younger than `ttl_s`
    is already present (the 201 path), else ``{"status": "created",
    "tables": {name: rows}}`` after the export commits (200). With
    ``blocking=False`` the export runs on a daemon thread and the call
    returns ``{"status": "dumping", "thread": t}`` immediately
    (`t.join()` to wait) — the reference's threaded pg_dump.
    """
    root = Path(path)
    if _is_fresh(_read_manifest(root), ttl_s):
        return {"status": "exists", "path": str(root)}

    if not blocking:
        t = threading.Thread(
            target=create_snapshot,
            args=(spark, dict(tables), path, ttl_s, True),
            daemon=True,
        )
        t.start()
        return {"status": "dumping", "thread": t}

    tmp = root.parent / f".{root.name}.tmp-{uuid.uuid4().hex[:8]}"
    root.parent.mkdir(parents=True, exist_ok=True)
    counts: dict[str, int] = {}
    for name, df in tables.items():
        df.write.mode("overwrite").parquet(str(tmp / name))
        counts[name] = spark.read.parquet(str(tmp / name)).count()
    manifest = {"created_at": time.time(), "tables": counts}
    (tmp / _MANIFEST).write_text(json.dumps(manifest))
    if root.exists():
        shutil.rmtree(root, ignore_errors=True)
    try:
        os.rename(tmp, root)
    except OSError:
        # concurrent writer won the rename — use theirs
        shutil.rmtree(tmp, ignore_errors=True)
        return {"status": "exists", "path": str(root)}
    return {"status": "created", "path": str(root), "tables": counts}


def snapshot_status(path: str, ttl_s: float | None = SNAPSHOT_TTL_S) -> dict:
    """The size-check endpoint (`snapshot.py:59-67`): ``{"exists": bool,
    "fresh": bool, "bytes": int, "tables": {name: rows}}``."""
    root = Path(path)
    manifest = _read_manifest(root)
    if manifest is None:
        return {"exists": False, "fresh": False, "bytes": 0, "tables": {}}
    total = sum(
        f.stat().st_size for f in root.rglob("*") if f.is_file()
    )
    return {
        "exists": True,
        "fresh": _is_fresh(manifest, ttl_s),
        "bytes": total,
        "tables": manifest.get("tables", {}),
    }


def load_snapshot(
    spark: SparkSession, path: str, ttl_s: float | None = None
) -> dict[str, DataFrame]:
    """Open every table of a committed snapshot (`snapshot.py:70-80`).

    Raises ``FileNotFoundError`` when no committed snapshot exists and
    ``ValueError`` when one exists but is older than `ttl_s` — the
    reference's two 404 responses. Default ``ttl_s=None`` accepts any
    committed snapshot (an export, unlike the reference's tmp dump, is
    durable output)."""
    root = Path(path)
    manifest = _read_manifest(root)
    if manifest is None:
        raise FileNotFoundError(
            f"no committed snapshot at {path} (missing {_MANIFEST})"
        )
    if not _is_fresh(manifest, ttl_s):
        raise ValueError(f"snapshot at {path} is older than ttl_s={ttl_s}")
    return {
        name: spark.read.parquet(str(root / name))
        for name in manifest.get("tables", {})
    }
