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

Concurrency: ``publish_table`` is the uncoordinated last-write-wins
path (single maintenance/merge job per table). For concurrent writers,
``publish_table_cas`` adds optimistic concurrency -- a compare-and-swap
on the current version at flip time, serialized by a short-lived commit
lock (held only around the pointer check + flip + GC, never around data
writes) -- and ``publish_table_transaction`` wraps it in the standard
read-base / compute / CAS / retry-on-conflict loop, the same protocol a
Delta/Iceberg transaction log gives read-modify-write committers.
"""

from __future__ import annotations

import contextlib
import glob
import os
import shutil
import time
import uuid
from collections.abc import Callable

_SUCCESS = "_SUCCESS"
# touched at flip time: distinguishes versions that were EVER current
# (published history, GC'd by keep_versions) from staging dirs that never
# made it live (protected by the GC grace window while in flight;
# collected as crash debris once old). Dot-prefixed: ignored by
# Spark/Hadoop listings like _SUCCESS.
_PUBLISHED = "._ddp_published"
# present while a version dir is a writer-owned stage (written with
# _SUCCESS at the end of the data write, removed at commit): GC must
# neither adopt nor collect such a dir until it is ancient -- an audit
# or CAS attempt may still be in flight long past the grace window.
_STAGING = "._ddp_staging"


class PublishConflict(RuntimeError):
    """Another writer published between this writer's base read and its
    commit attempt: the computed version would silently drop that
    writer's changes, so the commit is refused."""


# sentinel: commit unconditionally (no CAS check) -- last-write-wins
_ANY = object()


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
    the table tree stays relocatable). Marks the version as published
    FIRST, so a version is never current without the marker."""
    open(os.path.join(version_dir, _PUBLISHED), "a").close()
    tmp = f"{target_path}.flip-{uuid.uuid4().hex[:8]}"
    os.symlink(os.path.basename(version_dir), tmp)
    os.replace(tmp, target_path)


def current_version(target_path: str) -> str | None:
    """The version directory ``target_path`` currently resolves to, or
    None if the table does not exist yet. For a legacy real-directory
    table this is the directory itself (its pre-versioned identity)."""
    if not os.path.exists(target_path):
        return None
    return os.path.abspath(os.path.realpath(target_path))


@contextlib.contextmanager
def _commit_lock(target_path: str, wait: float = 10.0, stale_after: float = 60.0):
    """Short-lived mutual exclusion around the check+flip critical
    section (O_CREAT|O_EXCL lock file). The critical section does ONLY
    metadata work -- pointer check, renames, symlink flip, and PLANNING
    the GC (directory deletions execute after release) -- so it runs in
    milliseconds regardless of table size; ``stale_after`` only matters
    if a process dies inside it.

    Stale locks are broken ATOMICALLY: the breaker renames the lock to a
    tombstone (exactly one concurrent breaker wins the rename; losers
    retry the create), so a lock released-and-reacquired between the age
    check and the break is never deleted out from under its new holder.
    Release is rename-first: the holder atomically takes the lock file
    out of the namespace BEFORE inspecting it, so it can never unlink a
    newer holder's live lock; if the displaced file turns out not to be
    its own (the holder overslept past ``stale_after`` and was broken),
    it is restored when no fresher lock has appeared. Residual risk: a
    process paused longer than ``stale_after`` INSIDE the critical
    section can overlap a successor (that is what stale-breaking means);
    keep the critical section metadata-only so that pause cannot arise
    from work, only from machine-level stalls."""
    lock_path = f"{os.path.abspath(target_path)}.lock"
    token = uuid.uuid4().hex
    deadline = time.monotonic() + wait
    while True:
        try:
            fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, f"{os.getpid()} {token} {time.time()}\n".encode())
            os.close(fd)
            break
        except FileExistsError:
            try:
                age = time.time() - os.path.getmtime(lock_path)
            except OSError:
                continue  # released between the open and the stat: retry now
            if age > stale_after:
                with contextlib.suppress(OSError):
                    os.rename(
                        lock_path, f"{lock_path}.broken-{uuid.uuid4().hex[:8]}"
                    )
                continue
            if time.monotonic() > deadline:
                raise TimeoutError(
                    f"commit lock {lock_path} held for {age:.1f}s; another "
                    "publisher is mid-commit (or died inside the critical "
                    f"section -- broken automatically after {stale_after}s)"
                )
            time.sleep(0.02)
    try:
        yield
    finally:
        private = f"{lock_path}.rel-{token[:8]}"
        try:
            os.rename(lock_path, private)  # atomic: never a blind unlink
        except OSError:
            pass  # already broken away: nothing of ours to release
        else:
            try:
                with open(private) as f:
                    mine = token in f.read()
            except OSError:
                mine = False
            if mine:
                with contextlib.suppress(OSError):
                    os.unlink(private)
            elif not os.path.exists(lock_path):
                # we displaced a newer holder's lock (we overslept and
                # were stale-broken): restore it
                with contextlib.suppress(OSError):
                    os.rename(private, lock_path)
            else:
                with contextlib.suppress(OSError):
                    os.unlink(private)


def _version_age_seconds(version_dir: str, now: float) -> float:
    """Age since the dir's creation stamp (name-embedded time_ns when
    present, else mtime)."""
    stamp = os.path.basename(version_dir).rsplit(".v-", 1)[-1].split("-", 1)[0]
    if stamp.isdigit() and len(stamp) == 20:
        return now - int(stamp) / 1e9
    return now - os.path.getmtime(version_dir)


def _finish_stage(version_dir: str) -> None:
    """Complete a freshly-written stage: ensure the _SUCCESS marker
    (non-Spark writers) and mark the dir writer-owned so no concurrent
    GC adopts or collects it while its commit/audit is still pending."""
    if not _is_complete(version_dir):
        open(os.path.join(version_dir, _SUCCESS), "a").close()
    open(os.path.join(version_dir, _STAGING), "a").close()


def _gc_plan(
    target_path: str,
    keep_versions: int,
    floor_key,
    grace_seconds: float,
    stale_staging_seconds: float = 86_400.0,
) -> list[str]:
    """Plan retention: return the version dirs to delete (the caller
    deletes them OUTSIDE the commit lock -- rmtree of a large table is
    O(table) and must not extend the critical section past the stale
    lock-break horizon).

    Never planned for deletion: anything at least as new as ``floor_key``
    (a concurrent writer's staging dir carries a newer creation stamp
    than the version just published), and any unpublished dir younger
    than ``grace_seconds`` (a concurrent writer's IN-FLIGHT staging --
    e.g. a WAP stage mid-audit -- whose stamp may still predate the
    floor). A dir carrying the writer-owned staging marker is left alone
    until ``stale_staging_seconds`` (its audit/CAS may legitimately run
    far past the grace window -- adopting it would serve never-audited
    data as history); past that horizon it is a crashed writer's debris.
    A COMPLETE un-marked dir past the grace window is ADOPTED as
    published history instead of deleted: that is pre-marker-era
    retained history (the upgrade path -- deleting it would break the
    keep_versions retention contract the table was written under).
    Only INCOMPLETE un-marked dirs past the grace window -- crashed
    partial writes -- are debris."""
    keep = set(list_versions(target_path)[: max(keep_versions, 1)])
    now = time.time()
    doomed: list[str] = []
    for d in glob.glob(_version_glob(target_path)):
        ad = os.path.abspath(d)
        if ad in keep:
            continue
        try:
            if _version_order_key(d) >= floor_key:
                continue  # in-flight or newer: never GC debris-from-the-future
            if not os.path.exists(os.path.join(d, _PUBLISHED)):
                age = _version_age_seconds(d, now)
                if os.path.exists(os.path.join(d, _STAGING)):
                    if age < stale_staging_seconds:
                        continue  # writer-owned stage: audit/CAS pending
                elif age < grace_seconds:
                    continue  # possibly another writer's live staging
                elif _is_complete(d):
                    open(os.path.join(d, _PUBLISHED), "a").close()  # adopt
                    continue
        except OSError:
            continue  # vanished mid-scan (another writer's GC)
        doomed.append(ad)
    return doomed


def _commit(
    target_path: str,
    version_dir: str,
    expected_base,
    keep_versions: int,
    gc_grace_seconds: float,
) -> str:
    """The shared commit sequence behind every publish path: under the
    commit lock -- optional CAS check, legacy-directory demotion, atomic
    flip, GC planning -- then the planned deletions outside the lock.
    ``expected_base`` is a version dir / None for a CAS commit, or the
    :data:`_ANY` sentinel for an unconditional (last-write-wins) one.
    Raises :class:`PublishConflict` WITHOUT touching ``version_dir``
    (the caller owns its staging dir)."""
    with _commit_lock(target_path):
        if expected_base is not _ANY:
            cur = current_version(target_path)
            expected = (
                os.path.abspath(os.path.realpath(expected_base))
                if expected_base is not None
                else None
            )
            if cur != expected:
                raise PublishConflict(
                    f"{target_path}: current version is "
                    f"{os.path.basename(cur) if cur else None}, writer "
                    "expected "
                    f"{os.path.basename(expected) if expected else None}"
                )
        if os.path.exists(target_path) and not os.path.islink(target_path):
            # Legacy real-directory table: demote it to a version dir
            # first. The window between this rename and the flip below is
            # the one non-atomic step of the upgrade; recover_table()
            # repairs it.
            prev = _new_version_path(target_path)
            os.rename(target_path, prev)
            open(os.path.join(prev, _SUCCESS), "a").close()
            open(os.path.join(prev, _PUBLISHED), "a").close()
        _flip(target_path, version_dir)
        with contextlib.suppress(OSError):
            os.unlink(os.path.join(version_dir, _STAGING))
        doomed = _gc_plan(
            target_path, keep_versions, _version_order_key(version_dir),
            gc_grace_seconds,
        )
        # flip-temp and tombstone sweeps stay UNDER the lock: they are a
        # handful of unlinks (metadata-cheap), and a concurrent committer
        # creates its own .flip-* inside its critical section -- sweeping
        # outside the lock could unlink that in-flight temp between its
        # symlink and replace, crashing the other publish mid-commit
        for leftover in glob.glob(glob.escape(target_path) + ".flip-*"):
            with contextlib.suppress(OSError):
                os.unlink(leftover)
        for tomb in glob.glob(glob.escape(target_path) + ".lock.broken-*"):
            with contextlib.suppress(OSError):
                os.unlink(tomb)
        for stray in glob.glob(glob.escape(target_path) + ".lock.rel-*"):
            with contextlib.suppress(OSError):
                os.unlink(stray)
    for d in doomed:
        shutil.rmtree(d, ignore_errors=True)
    return version_dir


def publish_table(
    target_path: str,
    write_fn: Callable[[str], None],
    keep_versions: int = 1,
    gc_grace_seconds: float = 300.0,
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

    ``gc_grace_seconds`` protects concurrent writers' in-flight staging
    dirs from this publish's GC -- raise it above the longest staging
    write you expect on this table (a 10-minute parquet job needs more
    than the 300s default, or a faster co-writer may collect its
    half-written stage).
    """
    new_version = _new_version_path(target_path)
    write_fn(new_version)
    _finish_stage(new_version)
    return _commit(target_path, new_version, _ANY, keep_versions, gc_grace_seconds)


def publish_table_cas(
    target_path: str,
    write_fn: Callable[[str], None],
    expected_base: str | None,
    keep_versions: int = 1,
    gc_grace_seconds: float = 300.0,
) -> str:
    """:func:`publish_table` with optimistic concurrency: the flip
    happens only if the table still points at ``expected_base`` (the
    version this writer derived its data from; None = "table must not
    exist yet"). Otherwise the staged version is discarded and
    :class:`PublishConflict` raises -- no writer's publish is ever
    silently last-write-won. The check+flip runs under the commit lock,
    so two conflicting committers serialize and exactly one wins."""
    new_version = _new_version_path(target_path)
    write_fn(new_version)
    _finish_stage(new_version)
    try:
        return _commit(
            target_path, new_version, expected_base, keep_versions,
            gc_grace_seconds,
        )
    except PublishConflict:
        shutil.rmtree(new_version, ignore_errors=True)
        raise


def publish_table_transaction(
    target_path: str,
    compute_fn: Callable[[str | None, str], None],
    keep_versions: int = 1,
    max_retries: int = 5,
    gc_grace_seconds: float = 300.0,
) -> str:
    """Read-modify-write with conflict retry: ``compute_fn(base_dir,
    version_dir)`` derives the new table from the CURRENT version
    (``base_dir`` is an immutable version directory, or None on first
    publish) and writes it to ``version_dir``; the commit then CASes on
    that base. On conflict the loop re-reads the fresh base and
    recomputes -- the losing writer's work is redone on top of the
    winner's, so no update is lost (the file-table analog of a
    Delta/Iceberg commit-retry loop).

    Retries also cover the race where the concurrent winner's GC removes
    this writer's base files mid-compute (possible when ``keep_versions``
    is small): a compute failure is re-raised only if the base is STILL
    current -- if the base moved, the failure is treated as the conflict
    it is. Raises :class:`PublishConflict` after ``max_retries`` losses.
    """
    last: PublishConflict | None = None
    for _ in range(max_retries + 1):
        base = current_version(target_path)
        try:
            return publish_table_cas(
                target_path,
                lambda d: compute_fn(base, d),
                expected_base=base,
                keep_versions=keep_versions,
                gc_grace_seconds=gc_grace_seconds,
            )
        except PublishConflict as exc:
            last = exc
            continue
        except Exception as exc:
            if current_version(target_path) != base:
                # CHAIN the compute failure: if it was a deterministic bug
                # rather than base-GC fallout, the final error must still
                # carry it instead of masking it as pure contention
                conflict = PublishConflict(
                    f"{target_path}: base {base} moved mid-compute; the "
                    f"compute failed with {type(exc).__name__}: {exc}"
                )
                conflict.__cause__ = exc
                last = conflict
                continue
            raise
    raise PublishConflict(
        f"{target_path}: lost {max_retries + 1} consecutive commit races"
    ) from last


def list_versions(target_path: str) -> list[str]:
    """Complete PUBLISHED version directories of ``target_path``, newest
    first. The current version (the symlink's target) is ALWAYS index 0
    when the table exists -- even if it predates the published-marker
    scheme (pre-upgrade tables stay fully readable; the marker is added
    at the next flip or GC adoption). Incomplete versions (no
    ``_SUCCESS``) are excluded -- crash debris -- and so are
    never-published staging dirs (no published marker): a concurrent
    writer's in-flight stage or a WAP stage mid-audit is not readable
    history and must not shift time-travel indices."""
    complete = [
        os.path.abspath(d)
        for d in glob.glob(_version_glob(target_path))
        if _is_complete(d) and os.path.exists(os.path.join(d, _PUBLISHED))
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
    elif current is not None and _is_complete(current):
        # live but unmarked (pre-upgrade table, or a crash in the tiny
        # window between marker write and flip): current is current
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
    complete = [
        d
        for d in glob.glob(_version_glob(target_path))
        if _is_complete(d)
        and not os.path.exists(os.path.join(d, _STAGING))
    ]
    if not complete:
        return None
    # prefer versions that were actually live over never-published staging
    # (e.g. a WAP stage whose audit never ran must not be promoted when a
    # previously-current version exists)
    published = [
        d for d in complete if os.path.exists(os.path.join(d, _PUBLISHED))
    ]
    best = max(published or complete, key=_version_order_key)
    _flip(target_path, best)
    return best
