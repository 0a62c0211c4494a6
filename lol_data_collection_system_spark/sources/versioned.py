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
store). Concurrent readers are safe for at least ONE full commit cycle:
each commit retains the immediately-superseded version and deletes only
older generations, so a reader that resolved the pointer just before a
swap still finds its version on disk through the next commit. Readers
holding handles across MULTIPLE commits should copy or re-resolve.
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
    ptr = rootp / _POINTER
    prev = ptr.read_text().strip() if ptr.exists() else None
    vname = f"v-{uuid.uuid4().hex[:12]}"
    vdir = rootp / vname
    writer(str(vdir))
    (vdir / _META).write_text(json.dumps(meta))
    tmp_ptr = rootp / f".{_POINTER}.tmp-{uuid.uuid4().hex[:8]}"
    tmp_ptr.write_text(vname)
    os.replace(tmp_ptr, ptr)  # the atomic commit point
    # keep the immediately-superseded version for in-flight readers
    # (one-commit-cycle grace); delete only older generations
    for d in rootp.glob("v-*"):
        if d.name not in (vname, prev):
            shutil.rmtree(d, ignore_errors=True)


def current_version(root: str) -> tuple[str, dict] | None:
    """(version_dir, meta) of the committed version, or None before the
    first commit. If the pointer moved between our read of it and the
    meta check (a commit raced us), the pointer is re-resolved once;
    only a STILL-missing version after the retry raises."""
    rootp = Path(root)
    for _attempt in range(2):
        ptr = rootp / _POINTER
        if not ptr.exists():
            return None
        vdir = rootp / ptr.read_text().strip()
        meta_p = vdir / _META
        if meta_p.exists():
            return str(vdir), json.loads(meta_p.read_text())
    raise FileNotFoundError(
        f"store pointer at {root} names {vdir.name} but its commit "
        f"marker is missing after retry — out-of-protocol modification"
    )
