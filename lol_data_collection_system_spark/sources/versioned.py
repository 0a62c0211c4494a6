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

Single-writer per store is the intended topology (one streaming query
owns its sink store) — and since round 8 it is ENFORCED, not assumed:
every commit runs under an exclusive ``flock`` on ``{root}/.commit.lock``
(serializing the read-check-swap-cleanup critical section), and callers
that derived their new version FROM the store's current state pass
``expect_current`` — the version they read — so a commit that raced in
between raises ``ConcurrentCommitError`` instead of silently
overwriting the other writer's fold (the lost-update anatomy: sinks A
and B both read v1, A commits v2, B's commit — derived from v1 — would
bury A's). An identity token was considered and rejected: SCD2's
legitimate flows include fresh-checkpoint re-runs and ad-hoc replays
(both sequential), which a per-query token would falsely refuse; the
compare-and-swap catches exactly the concurrent case and nothing else.

Concurrent readers are safe for at least ONE full commit cycle:
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
_LOCK = ".commit.lock"

#: sentinel: "no expectation — last writer wins" (build-from-scratch
#: writers like `write_corpus_index`, whose new version is not derived
#: from the store's current state, so no update can be lost)
_ANY = object()


class ConcurrentCommitError(RuntimeError):
    """Another commit landed between this writer's read of the store
    and its commit — the new version was derived from stale state and
    folding it in would silently bury the interloper's commit."""


def commit_version(
    root: str,
    writer: Callable[[str], None],
    meta: dict,
    expect_current: "str | None | object" = _ANY,
) -> None:
    """Write one new complete version under `root` and atomically make
    it current. `writer(version_dir)` must produce the version's full
    contents (e.g. parquet writes); `meta` lands as its ``_meta.json``
    commit marker before the pointer swap.

    ``expect_current``: the version this commit was DERIVED from — the
    ``current_version(root)[0]`` the caller read before computing its
    merge (None = "the store did not exist yet"; full path or bare
    version name both accepted). If another commit moved the pointer in
    between, `ConcurrentCommitError` raises BEFORE any bytes are
    written: one interleaved writer wins, the other fails loudly, no
    version is ever silently lost. Omit it only for build-from-scratch
    writers whose output does not depend on the store's prior state.
    The whole critical section (check → write → swap → cleanup) runs
    under an exclusive lock on ``{root}/.commit.lock``, so even
    same-derivation committers serialize instead of racing the
    pointer swap or each other's cleanup."""
    import fcntl

    rootp = Path(root)
    rootp.mkdir(parents=True, exist_ok=True)
    with open(rootp / _LOCK, "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        ptr = rootp / _POINTER
        prev = ptr.read_text().strip() if ptr.exists() else None
        if expect_current is not _ANY:
            want = (
                Path(expect_current).name
                if expect_current is not None
                else None
            )
            if prev != want:
                raise ConcurrentCommitError(
                    f"store at {root} is at version {prev!r} but this "
                    f"commit was derived from {want!r}: a concurrent "
                    f"commit landed in between — re-read the store and "
                    f"re-derive (one streaming query must own a store)"
                )
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
