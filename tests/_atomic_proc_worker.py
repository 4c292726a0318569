"""Subprocess worker for tests/test_atomic_multiprocess.py.

Runs the versioned-table publish protocol (operators/atomic.py) from a
REAL separate OS process -- its own interpreter, its own file
descriptors, no shared Python state -- so the cross-process claims of
the rename-based commit protocol (CAS serialization, stale-lock break,
SIGKILL-survivability) are exercised across an actual process boundary
rather than threads in one interpreter.

Not a pytest file (no ``test_`` prefix): invoked as
``python _atomic_proc_worker.py <mode> <args...>``.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dockerized_data_pipeline_spark.operators import atomic  # noqa: E402


def _read(base_dir):
    """Token set of a version dir (data payload = one empty file per
    token; markers like _SUCCESS / ._ddp_* are skipped)."""
    if base_dir is None or not os.path.isdir(base_dir):
        return set()
    return {n for n in os.listdir(base_dir) if not n.startswith(("_", "."))}


def _writer(tokens):
    def write(version_dir):
        os.makedirs(version_dir, exist_ok=True)
        for t in sorted(tokens):
            open(os.path.join(version_dir, t), "w").close()

    return write


def race(target: str, tag: str, k: str, go_file: str) -> None:
    """Barrier on ``go_file``, then run ``k`` read-modify-write
    transactions, each adding one unique token -- the classic
    increment-under-contention workload. Any lost update shows up as a
    missing token in the parent's final listing."""
    while not os.path.exists(go_file):
        time.sleep(0.002)
    for i in range(int(k)):

        def compute(base_dir, version_dir, i=i):
            _writer(_read(base_dir) | {f"{tag}_{i}"})(version_dir)

        atomic.publish_table_transaction(
            target, compute, keep_versions=500, max_retries=200
        )
    print("OK", flush=True)


def hang_in_flip(target: str, sentinel: str) -> None:
    """Enter the commit critical section (lock held, CAS check passed),
    touch ``sentinel``, then stall before the pointer flip. The parent
    SIGKILLs this process here -- simulating a writer dying INSIDE the
    commit -- leaving a held lock file and a writer-owned staged dir."""
    real_flip = atomic._flip

    def stalling_flip(target_path, version_dir):
        open(sentinel, "w").close()
        time.sleep(600)  # parent SIGKILLs us here
        real_flip(target_path, version_dir)

    atomic._flip = stalling_flip
    base = atomic.current_version(target)
    atomic.publish_table_cas(
        target, _writer(_read(base) | {"victim"}), expected_base=base
    )


def publish_once(target: str, token: str) -> None:
    """One full transaction adding ``token`` -- used as the survivor
    writer that must break a dead process's stale commit lock."""

    def compute(base_dir, version_dir):
        _writer(_read(base_dir) | {token})(version_dir)

    atomic.publish_table_transaction(target, compute, keep_versions=10)
    print("OK", flush=True)


if __name__ == "__main__":
    mode, *rest = sys.argv[1:]
    {
        "race": race,
        "hang_in_flip": hang_in_flip,
        "publish_once": publish_once,
    }[mode](*rest)
