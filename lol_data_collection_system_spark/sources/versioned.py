"""Crash-safe versioned store commits (pointer-file protocol).

The naive swap (`rmtree(old)` then `os.rename(tmp, root)`) has a crash
window in which NEITHER the old store nor the new one exists — a
replayed streaming batch then sees "no store" and silently
reinitializes from itself, discarding all accumulated state (the
round-7 review's top finding against the SCD2/rollup sinks).

Protocol here: every commit writes a COMPLETE new version directory
``{root}/v-<uuid>/`` (parquet + ``_meta.json``, meta written last
inside the version), then atomically repoints ``{root}/_CURRENT`` via
``os.replace`` — POSIX-atomic for a small file, so at every instant the
pointer names a fully-written version. Old versions are deleted only
AFTER the pointer moves; a crash at any step leaves the previous
version committed and readable. Failures surface — nothing is
swallowed, so a batch whose commit failed never reaches the streaming
checkpoint as "applied".

Single-writer per store is assumed (one streaming query owns its sink
store); concurrent READERS are safe at any point. A reader holding a
DataFrame over a superseded version directory races its deletion —
callers that hand out long-lived handles should read promptly or copy.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from collections.abc import Callable
from pathlib import Path

_POINTER = "_CURRENT"
_META = "_meta.json"


def commit_version(
    root: str, writer: Callable[[str], None], meta: dict
) -> None:
    """Write one new complete version under `root` and atomically make
    it current. `writer(version_dir)` must produce the version's full
    contents (e.g. parquet writes); `meta` lands as its ``_meta.json``
    commit marker before the pointer swap."""
    rootp = Path(root)
    rootp.mkdir(parents=True, exist_ok=True)
    vname = f"v-{uuid.uuid4().hex[:12]}"
    vdir = rootp / vname
    writer(str(vdir))
    (vdir / _META).write_text(json.dumps(meta))
    tmp_ptr = rootp / f".{_POINTER}.tmp-{uuid.uuid4().hex[:8]}"
    tmp_ptr.write_text(vname)
    os.replace(tmp_ptr, rootp / _POINTER)  # the atomic commit point
    for d in rootp.glob("v-*"):
        if d.name != vname:
            shutil.rmtree(d, ignore_errors=True)


def current_version(root: str) -> tuple[str, dict] | None:
    """(version_dir, meta) of the committed version, or None before the
    first commit. A pointer naming a vanished/incomplete version (only
    possible under an out-of-protocol deletion) raises rather than
    returning torn state."""
    rootp = Path(root)
    ptr = rootp / _POINTER
    if not ptr.exists():
        return None
    vdir = rootp / ptr.read_text().strip()
    meta_p = vdir / _META
    if not meta_p.exists():
        raise FileNotFoundError(
            f"store pointer at {root} names {vdir.name} but its commit "
            f"marker is missing — out-of-protocol modification"
        )
    return str(vdir), json.loads(meta_p.read_text())
