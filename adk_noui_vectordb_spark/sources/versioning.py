"""Versioned on-disk index roots with atomic pointer commits.

Shared by every build-once/serve-many index in the repo (the lexical
inverted index, the RP-LSH band table, the trained-IVF assignment —
operators/invindex.py and operators/ann.py): an index whose update
rewrites SEVERAL parquet components (postings + termstats + stats;
bands + vecs; assign + vecs) must never let a reader observe them out
of sync. POSIX offers no multi-directory transaction, so the commit is
made single-file:

    root/
      v_000000/<components...>     immutable once published
      v_000001/<components...>
      _CURRENT                     name of the live version (one line)

A writer materializes the ENTIRE next version under a tmp dir —
partitions it does not change enter as HARDLINKS of the current
version's files (per-partition metadata cost, zero data copied: the
local-filesystem analog of Iceberg manifest reuse; on an object store
these links become manifest entries) — renames it to its version name,
and then commits with ONE atomic ``os.replace`` of the ``_CURRENT``
pointer file. A crash at any earlier point leaves ``_CURRENT`` on the
old, internally consistent version; orphaned dirs are swept by the
next committer. Readers resolve ``_CURRENT`` once per query and touch
only immutable paths after that, so they need no locking; retention
keeps the current and previous versions so a reader mid-query on the
just-replaced version keeps valid file handles.

Single-writer discipline: concurrent committers need an external lock
or a real table format (Delta/Iceberg); the reference's indexing agent
is likewise one process (indexing_agent.py).
"""

from __future__ import annotations

import os
import shutil


def current_name(root: str) -> "str | None":
    p = os.path.join(root, "_CURRENT")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        name = f.read().strip()
    return name or None


def current_dir(root: str) -> "str | None":
    name = current_name(root)
    return None if name is None else os.path.join(root, name)


def next_version_name(root: str) -> str:
    cur = current_name(root)
    return "v_%06d" % (0 if cur is None else int(cur.split("_")[1]) + 1)


def point_current(root: str, name: str) -> None:
    """THE commit point: one atomic rename of the pointer file."""
    tmp = os.path.join(root, "_CURRENT.__tmp__")
    with open(tmp, "w") as f:
        f.write(name + "\n")
    os.replace(tmp, os.path.join(root, "_CURRENT"))


def publish_version(root: str, tmp: str, name: str) -> None:
    """Rename the fully-written tmp dir to its version name, then swing
    ``_CURRENT``. Split into two steps so crash-injection tests can fail
    between them. A directory already holding the target name is an
    ORPHAN from a crash in exactly that window (``_CURRENT`` never
    pointed at it — version names only move forward) — swept here,
    which is what makes a failed commit recoverable by re-run."""
    target = os.path.join(root, name)
    if os.path.exists(target):
        shutil.rmtree(target)
    os.rename(tmp, target)
    point_current(root, name)


def gc_versions(root: str, keep: int = 2) -> None:
    """Delete versions older than the previous one, plus stale tmp dirs
    from crashed writers (they never held the ``_CURRENT`` name)."""
    cur = current_name(root)
    if cur is None:
        return
    versions = sorted(d for d in os.listdir(root) if d.startswith("v_"))
    live = set(versions[versions.index(cur) + 1 - keep : versions.index(cur) + 1])
    for d in os.listdir(root):
        full = os.path.join(root, d)
        if d.startswith("v_") and d not in live and d < cur:
            shutil.rmtree(full, ignore_errors=True)
        elif d.startswith(".__tmp_") and os.path.isdir(full):
            shutil.rmtree(full, ignore_errors=True)


def link_partitions(src: str, dst: str, skip: frozenset = frozenset()) -> None:
    """Hardlink-copy a partitioned component's partition DIRECTORIES
    from the previous version into ``dst``, skipping the partitions the
    new version rewrites. ``skip`` holds partition paths RELATIVE to the
    component root (``"tbucket=3"``, or ``"band=0/band_key=5"`` for
    two-level layouts). Top-level plain files (_SUCCESS markers) are NOT
    linked — Spark recreates them, and a linked inode must never be
    written through. Data files inside a partition are immutable (append
    jobs write fresh uniquely-named part files), so sharing inodes is
    safe."""
    os.makedirs(dst, exist_ok=True)
    for name in os.listdir(src):
        sp = os.path.join(src, name)
        if not os.path.isdir(sp) or name in skip:
            continue
        _link_level(sp, os.path.join(dst, name), name, skip)


def _link_level(src: str, dst: str, rel: str, skip: frozenset) -> None:
    os.makedirs(dst, exist_ok=True)
    for name in os.listdir(src):
        sp = os.path.join(src, name)
        sub = f"{rel}/{name}"
        if sub in skip:
            continue
        if os.path.isdir(sp):
            _link_level(sp, os.path.join(dst, name), sub, skip)
        else:
            os.link(sp, os.path.join(dst, name))
