"""Transactional MERGE variants of the keyed upsert / keyed delete
(VERDICT r4 item 10, SURVEY §2.4's own recommendation).

The plain-Parquet emulation (operators/upsert.upsert_replace +
whole-table rewrite) is CORRECT but rewrites every partition it
touches; at 100 TB the scale-safe form is a transactional ``MERGE
INTO`` / ``DELETE FROM`` on a table format (Delta Lake / Iceberg):
only the files containing matched keys are rewritten, the commit is
atomic, and concurrent readers never observe a half-written table.

This module is the capability seam: ``delta_available()`` probes for
the delta-spark package at runtime; ``merge_upsert`` /
``merge_delete`` route to Delta's MERGE when present and to the
engine's existing rewrite emulation otherwise — SAME table state
either way (pytest asserts path parity where both run). Nothing else
in the engine imports delta directly, so the container without the
package loses only the transactional fast path, never correctness.

Reference parity: the SQLite ``INSERT OR REPLACE`` family
(/root/reference/database_integration.py:121-174) — row-replace on
key clash, delete-by-predicate — with the conflict target being the
table key, exactly what MERGE's ON clause expresses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def delta_available() -> bool:
    """True iff the delta-spark bindings are importable. (The session
    must ALSO have been built with the Delta SQL extension +
    catalog configs for the fast path to work — probed lazily in
    merge_upsert, since a bare import cannot see session confs.)"""
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def _has_delta_log(spark: SparkSession, path: str) -> bool:
    """Filesystem probe for a ``_delta_log`` directory — works with
    or without the Delta bindings (Hadoop FS, so object stores count)."""
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(f"{path}/_delta_log")
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def _is_delta_table(spark: SparkSession, path: str) -> bool:
    """True → use the Delta fast path. False → the table is PLAIN
    parquet and the rewrite emulation is safe.

    SAFETY RAIL: a path that carries a ``_delta_log`` but cannot be
    handled as Delta in THIS session (bindings missing, extension
    unconfigured) raises instead of falling back — the parquet
    emulation would read files tombstoned by earlier commits
    (resurrecting deleted rows) and its overwrite would corrupt the
    log. Falling back is only ever sound on a log-less path.
    """
    looks_delta = _has_delta_log(spark, path)
    if not delta_available():
        if looks_delta:
            raise RuntimeError(
                f"{path} is a Delta table but delta-spark is not "
                "installed; refusing the plain-parquet rewrite (it "
                "would resurrect tombstoned rows and corrupt the log)"
            )
        return False
    from delta.tables import DeltaTable

    try:
        is_delta = bool(DeltaTable.isDeltaTable(spark, path))
    except Exception as exc:  # extension not loaded in this session
        if looks_delta:
            raise RuntimeError(
                f"{path} carries a _delta_log but this session cannot "
                "load it as Delta (is the SQL extension configured?); "
                "refusing the plain-parquet rewrite"
            ) from exc
        return False
    if looks_delta and not is_delta:
        raise RuntimeError(
            f"{path} carries a _delta_log but DeltaTable does not "
            "recognize it; refusing the plain-parquet rewrite"
        )
    return is_delta


def recover_swap_orphan(spark: SparkSession, path: str) -> bool:
    """Crash-window recovery (ADVICE r6): a crash between
    ``_swap_rewrite``'s two renames leaves the target missing with the
    only copy at ``<path>.__merge_old__``. Rename it back and return
    True. Callers that treat a missing table as empty (e.g. the CDC
    snapshot reader) MUST run this first — otherwise they serve a view
    missing every previously-swapped row, and a later rewrite makes
    the loss permanent. A no-op (False) when the target exists or no
    orphan is present."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path
    fs = hpath(path).getFileSystem(hconf)
    base = path.rstrip("/")
    old = base + ".__merge_old__"
    if fs.exists(hpath(base)) or not fs.exists(hpath(old)):
        return False
    if not fs.rename(hpath(old), hpath(base)):
        raise RuntimeError(
            f"recovery failed: could not rename {old} back to {base}"
        )
    return True


def _swap_rewrite(spark: SparkSession, path: str, df: DataFrame) -> None:
    """Crash-safe full-table rewrite for the non-Delta fallback
    (ADVICE r5): the previous form localCheckpoint-ed the merged plan
    (non-reliable executor storage) and then ``overwrite``-deleted the
    target before writing — a crash mid-write lost the table. Here the
    heavy write goes to a TEMP SIBLING directory while the original
    stays untouched; the exposure window shrinks to two metadata-only
    directory renames. If a crash lands between the renames the data
    survives at ``<path>.__merge_old__`` (and a leftover tmp/old dir
    from a crashed run is cleaned on the next call).

    localCheckpoint is gone entirely: the plan lazily reads ``path``,
    which still exists while the write targets the sibling, so there
    is no self-overwrite to defend against.
    """
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()

    def hpath(p: str):
        return jvm.org.apache.hadoop.fs.Path(p)

    fs = hpath(path).getFileSystem(hconf)
    base = path.rstrip("/")
    tmp, old = base + ".__merge_tmp__", base + ".__merge_old__"
    # never delete __merge_old__ while it may be the sole surviving
    # copy: restore it first when the target vanished mid-swap
    # (ADVICE r6 — the old unconditional delete destroyed the data,
    # or silently discarded it when a caller had recreated the
    # target from partial state in between)
    recover_swap_orphan(spark, base)
    for leftover in (tmp, old):
        if fs.exists(hpath(leftover)):
            fs.delete(hpath(leftover), True)
    df.write.mode("overwrite").parquet(tmp)
    if not fs.rename(hpath(base), hpath(old)):
        raise RuntimeError(f"swap failed: could not rename {base} aside")
    if not fs.rename(hpath(tmp), hpath(base)):
        # put the original back so the table is never left missing
        fs.rename(hpath(old), hpath(base))
        raise RuntimeError(f"swap failed: could not move {tmp} into place")
    fs.delete(hpath(old), True)


def merge_upsert(
    spark: SparkSession,
    path: str,
    delta_df: DataFrame,
    keys: list[str],
    order_cols: list[str],
) -> None:
    """U1 at table grain: upsert ``delta_df`` into the table at
    ``path``. Delta path: one transactional ``MERGE INTO`` —
    whenMatchedUpdateAll / whenNotMatchedInsertAll, touching only
    files holding matched keys. Fallback: read → upsert_replace →
    full overwrite (correct, partition-rewrite cost).

    ``delta_df`` is first collapsed to one row per key
    (latest-wins on ``order_cols``) on BOTH paths — MERGE requires a
    unique source key, and the emulation's upsert_replace resolves
    within-batch clashes the same way.
    """
    from ..operators.upsert import keep_latest, upsert_replace

    # a prior merge may have crashed between the swap renames; the
    # read below would otherwise fail (or a caller-recreated target
    # would shadow the orphaned data) — restore before reading
    recover_swap_orphan(spark, path)
    src = keep_latest(delta_df, keys, order_cols)
    if _is_delta_table(spark, path):
        from delta.tables import DeltaTable

        cond = " AND ".join(f"t.{k} <=> s.{k}" for k in keys)
        (
            DeltaTable.forPath(spark, path)
            .alias("t")
            .merge(src.alias("s"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
        return
    base = spark.read.parquet(path)
    merged = upsert_replace(base, src, keys, order_cols)
    _swap_rewrite(spark, path, merged)


def merge_delete(spark: SparkSession, path: str, cond: Column | str) -> None:
    """U5 at table grain: delete rows matching ``cond`` from the
    table at ``path``. Delta path: transactional ``DELETE FROM``
    (file-level skipping via stats, atomic commit). Fallback:
    keep-the-complement rewrite (operators/upsert.delete_where
    semantics — NULL conditions keep the row, matching SQL DELETE).
    """
    recover_swap_orphan(spark, path)  # crashed-swap orphan, as above
    cond_col = F.expr(cond) if isinstance(cond, str) else cond
    if _is_delta_table(spark, path):
        from delta.tables import DeltaTable

        DeltaTable.forPath(spark, path).delete(cond_col)
        return
    from ..operators.upsert import delete_where

    kept = delete_where(spark.read.parquet(path), cond_col)
    _swap_rewrite(spark, path, kept)
