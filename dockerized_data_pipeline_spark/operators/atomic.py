"""Crash-safe table publication: versioned directories plus an atomic
current-pointer flip.

The reference commits each batch with a single Postgres transaction
(scripts/fetch_stock_data.py:117); a file-based engine needs an equivalent
"readers always see a complete table" guarantee. A naive
rename(target, backup); rename(staging, target) has a crash window where
NO table exists at target_path. Here instead:

  * every table version lives in a hidden sibling directory
    ``.{name}.v-{uuid}`` (dot-prefixed so Spark/Hadoop listings and
    partition discovery ignore it);
  * ``target_path`` itself is a symlink to the current version, flipped
    atomically with ``os.replace`` of a freshly-created symlink -- POSIX
    rename over a symlink is atomic, so readers resolve either the old or
    the new version, never neither and never a partial write;
  * a version is complete iff Spark's ``_SUCCESS`` marker exists (written
    last by the output committer);
  * ``recover_table`` repairs the one remaining non-atomic case (a crash
    while upgrading a legacy real-directory table into the versioned
    protocol) by re-pointing the symlink at the newest complete version.

Single-writer assumption: concurrent publishers to the same target_path
are not coordinated (no lock file); run one maintenance/merge job per
table, as with any file-based table format without a transaction log.
"""

from __future__ import annotations

import glob
import os
import shutil
import uuid
from collections.abc import Callable

_SUCCESS = "_SUCCESS"


def _version_glob(target_path: str) -> str:
    parent, base = os.path.split(os.path.abspath(target_path))
    return os.path.join(glob.escape(parent), "." + glob.escape(base) + ".v-*")


def _new_version_path(target_path: str) -> str:
    """Version dir names embed a zero-padded creation nanosecond stamp so
    history ORDERS BY NAME: directory mtimes tie under coarse-granularity
    filesystems (and get bumped by the legacy-upgrade _SUCCESS touch),
    which would make n-back reads and retention GC pick arbitrarily."""
    import time

    parent, base = os.path.split(os.path.abspath(target_path))
    return os.path.join(
        parent, f".{base}.v-{time.time_ns():020d}-{uuid.uuid4().hex[:6]}"
    )


def _version_order_key(version_dir: str):
    """Newest-first sort key: the embedded creation stamp when present
    (lexicographic thanks to zero padding), directory mtime for legacy
    uuid-only names."""
    stamp = os.path.basename(version_dir).rsplit(".v-", 1)[-1]
    head = stamp.split("-", 1)[0]
    if head.isdigit() and len(head) == 20:
        return (1, stamp)
    return (0, f"{os.path.getmtime(version_dir):030.6f}-{stamp}")


def _is_complete(version_dir: str) -> bool:
    return os.path.isdir(version_dir) and os.path.exists(
        os.path.join(version_dir, _SUCCESS)
    )


def _flip(target_path: str, version_dir: str) -> None:
    """Atomically point target_path at version_dir (relative symlink, so
    the table tree stays relocatable)."""
    tmp = f"{target_path}.flip-{uuid.uuid4().hex[:8]}"
    os.symlink(os.path.basename(version_dir), tmp)
    os.replace(tmp, target_path)


def publish_table(
    target_path: str,
    write_fn: Callable[[str], None],
    keep_versions: int = 1,
) -> str:
    """Publish a new version of the table at ``target_path``.

    ``write_fn(version_dir)`` must write a complete table to the given
    directory (e.g. ``df.write.parquet(version_dir)`` -- Spark writes the
    ``_SUCCESS`` completeness marker last). Readers of ``target_path``
    see the previous complete version until the atomic flip, then the new
    one. Flip temp files and versions beyond the ``keep_versions`` most
    recent are garbage-collected after a successful flip; with the
    default of 1 only the new current version survives, while a larger
    value retains history for :func:`read_table_version` time travel
    (snapshot pinning: a training run records which corpus version it
    read, and the version stays readable until retention rolls it off).
    Returns the new version directory.
    """
    new_version = _new_version_path(target_path)
    write_fn(new_version)
    if not _is_complete(new_version):
        # the writer did not produce a _SUCCESS marker; add one so the
        # version is recoverable (non-Spark writers).
        open(os.path.join(new_version, _SUCCESS), "a").close()

    if os.path.exists(target_path) and not os.path.islink(target_path):
        # Legacy real-directory table: demote it to a version dir first.
        # The window between this rename and the flip below is the one
        # non-atomic step of the upgrade; recover_table() repairs it.
        prev = _new_version_path(target_path)
        os.rename(target_path, prev)
        open(os.path.join(prev, _SUCCESS), "a").close()
    _flip(target_path, new_version)

    # GC: keep the newest keep_versions versions (current included),
    # newest-first by mtime; drop the rest plus incomplete debris
    # (single writer).
    keep = set(list_versions(target_path)[: max(keep_versions, 1)])
    for d in glob.glob(_version_glob(target_path)):
        if os.path.abspath(d) not in keep:
            shutil.rmtree(d, ignore_errors=True)
    for leftover in glob.glob(glob.escape(target_path) + ".flip-*"):
        try:
            os.unlink(leftover)
        except OSError:
            pass
    return new_version


def list_versions(target_path: str) -> list[str]:
    """Complete version directories of ``target_path``, newest first.
    The current version (the symlink's target) is always index 0; the
    rest order by directory mtime. Incomplete versions (no ``_SUCCESS``)
    are excluded -- they are crash debris, never readable history."""
    complete = [
        os.path.abspath(d)
        for d in glob.glob(_version_glob(target_path))
        if _is_complete(d)
    ]
    current = (
        os.path.abspath(os.path.realpath(target_path))
        if os.path.exists(target_path)
        else None
    )
    ordered = sorted(complete, key=_version_order_key, reverse=True)
    if current in ordered:
        ordered.remove(current)
        ordered.insert(0, current)
    return ordered


def read_table_version(spark, target_path: str, n_back: int = 0):
    """Time-travel read: the table as of ``n_back`` publishes ago
    (0 = current). Versions are immutable once published, so the returned
    DataFrame is a stable snapshot even while new versions land -- the
    reproducibility anchor for "re-run the job against the exact corpus
    snapshot a model trained on". Raises IndexError past the retention
    horizon (``publish_table(..., keep_versions=N)`` bounds history)."""
    versions = list_versions(target_path)
    if n_back >= len(versions):
        raise IndexError(
            f"read_table_version: only {len(versions)} version(s) retained "
            f"at {target_path}, requested n_back={n_back}"
        )
    return spark.read.parquet(versions[n_back])


def recover_table(target_path: str) -> str | None:
    """Repair ``target_path`` after a crash: if it is missing or a
    dangling symlink but complete version directories exist, point it at
    the newest complete version. Returns the version dir now current, the
    resolved path if already healthy, or None if nothing recoverable.
    """
    if os.path.exists(target_path):  # follows symlinks: healthy
        return os.path.realpath(target_path)
    if os.path.islink(target_path):  # dangling pointer
        os.unlink(target_path)
    complete = [d for d in glob.glob(_version_glob(target_path)) if _is_complete(d)]
    if not complete:
        return None
    best = max(complete, key=_version_order_key)
    _flip(target_path, best)
    return best
