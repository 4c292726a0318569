"""Write-Audit-Publish: stage a new table version, audit it (quality
expectations + reconciliation against the current version), and flip it
live only if every audit passes -- the publish discipline behind every
trustworthy batch pipeline. The reference publishes by upserting straight
into the serving table (scripts/fetch_stock_data.py:104-115, no audit
step); this composes the engine's existing pieces instead:

  - staging write  : atomic.publish_table's version dir (never the live path)
  - audits         : callables over the staged DataFrame -- row-count
                     floors, PK uniqueness (quality.duplicate_key_count),
                     change-volume caps vs current (tablediff.diff_summary)
  - publish        : atomic pointer flip, old version GC'd
  - reject         : staged dir removed, live table untouched

Audits see exactly the bytes that would go live (they read the staged
files back, not the input DataFrame), so a nondeterministic upstream
cannot sneak different data past the audit.
"""

from __future__ import annotations

import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .atomic import (
    PublishConflict,
    _commit,
    _finish_stage,
    _new_version_path,
    current_version,
)

AuditFn = Callable[[DataFrame], str | None]
"""Returns None when the audit passes, else a human-readable failure."""


class AuditError(RuntimeError):
    def __init__(self, failures: list[str]):
        super().__init__("; ".join(failures))
        self.failures = failures


def expect_min_rows(n: int) -> AuditFn:
    def audit(staged: DataFrame) -> str | None:
        got = staged.count()
        return None if got >= n else f"expected >= {n} rows, staged {got}"

    return audit


def expect_unique_key(key_cols: list[str]) -> AuditFn:
    def audit(staged: DataFrame) -> str | None:
        from .quality import duplicate_key_count

        dups = duplicate_key_count(staged, key_cols)
        return None if dups == 0 else f"{dups} duplicate keys on {key_cols}"

    return audit


def expect_no_nulls(cols: list[str]) -> AuditFn:
    def audit(staged: DataFrame) -> str | None:
        from functools import reduce

        from pyspark.sql import functions as F

        any_null = reduce(lambda a, b: a | b, [F.col(c).isNull() for c in cols])
        n = staged.filter(any_null).count()
        return None if n == 0 else f"{n} rows with NULL in {cols}"

    return audit


def expect_max_change(
    current: DataFrame | None, key_cols: list[str], max_changed_ppm: int
) -> AuditFn:
    """Change-volume circuit breaker: reject a publish that would change or
    remove more than ``max_changed_ppm`` of the current version's keys --
    the audit that catches a truncated upstream before it goes live.
    ``current`` None (first publish) always passes."""

    def audit(staged: DataFrame) -> str | None:
        if current is None:
            return None
        from pyspark.sql import functions as F

        from .tablediff import diff_summary

        counts = {
            r.change_type: r.n
            for r in diff_summary(current, staged, key_cols).collect()
        }
        n_current = current.count()
        if n_current == 0:
            return None
        disturbed = counts.get("changed", 0) + counts.get("removed", 0)
        ppm = disturbed * 1_000_000 // n_current
        if ppm > max_changed_ppm:
            return (
                f"change volume {ppm} ppm exceeds {max_changed_ppm} ppm "
                f"(changed={counts.get('changed', 0)}, removed={counts.get('removed', 0)})"
            )
        return None

    return audit


def write_audit_publish(
    spark: SparkSession,
    df: DataFrame,
    target_path: str,
    audits: list[AuditFn],
    write_fn: Callable[[DataFrame, str], None] | None = None,
    keep_versions: int = 1,
    gc_grace_seconds: float = 300.0,
) -> str:
    """Stage ``df`` as a new version of ``target_path``, run every audit
    against the staged files, then atomically publish. Raises AuditError
    (staging removed, live table untouched) if any audit fails. Returns
    the published version dir.

    Publication is CAS-guarded: the flip requires the table to still be
    the version that was current when staging began, since the audits
    (e.g. ``expect_max_change``) judged the staged data AGAINST that
    version -- a concurrent publish would invalidate their verdict.
    Raises :class:`~.atomic.PublishConflict` in that case (staging
    removed; re-run the WAP cycle against the new current)."""
    write_fn = write_fn or (lambda d, path: d.write.parquet(path))
    base = current_version(target_path)
    staged_dir = _new_version_path(target_path)
    write_fn(df, staged_dir)
    # _finish_stage writes _SUCCESS (if the writer didn't) AND the
    # ._ddp_staging writer-owned marker: while the audits run, a concurrent
    # publisher's _gc_plan must neither collect this dir nor adopt it as
    # published history, and recover_table must never promote a
    # never-audited stage. _commit clears the marker at flip; the
    # AuditError / PublishConflict paths rmtree the whole dir.
    _finish_stage(staged_dir)

    staged = spark.read.parquet(staged_dir)
    failures = [msg for msg in (a(staged) for a in audits) if msg is not None]
    if failures:
        shutil.rmtree(staged_dir, ignore_errors=True)
        raise AuditError(failures)

    try:
        return _commit(
            target_path, staged_dir, expected_base=base,
            keep_versions=keep_versions, gc_grace_seconds=gc_grace_seconds,
        )
    except PublishConflict as exc:
        shutil.rmtree(staged_dir, ignore_errors=True)
        raise PublishConflict(
            f"{target_path}: table moved while auditing; the audit verdict "
            "no longer applies -- re-run the WAP cycle against the new "
            f"current ({exc})"
        ) from exc
