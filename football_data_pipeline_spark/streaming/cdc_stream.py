"""Streaming CDC materialized view — the streaming twin of
operators/cdc.apply_changes, log-structured (LSM-style) so a
micro-batch never rewrites the snapshot:

- WRITE path (``cdc_log_batch_writer``, a foreachBatch body): each
  micro-batch of changes is collapsed to its per-key winners (the
  same one-aggregate max-struct collapse the batch operator uses —
  operators/cdc.collapse_log) and written to its OWN
  ``log/batch_id=N`` partition directory with mode=overwrite, the
  engine's exactly-once convention (streaming/pipeline.py): a
  crash-restart re-running batch N overwrites exactly its partition
  and nothing else. Write cost is bounded by the batch, never by the
  snapshot.
- READ path (``read_cdc_snapshot``): union the optional base (as
  seq=BASE_SEQ pseudo-changes that lose to ANY real change) with
  every committed log partition, collapse once, drop 'D' winners.
  Out-of-order delivery ACROSS batches is handled by construction —
  a late low-seq change loses the global collapse, so state never
  regresses (the property the batch operator cannot give a naive
  per-batch applier).
- COMPACTION: when the log grows long, materialize
  ``read_cdc_snapshot`` output (with ``keep_seq=True``) as the new
  base and drop consumed partitions — the same fold-history-forward
  move as sinks.compact_partitions; the reader's semantics are
  unchanged because base rows re-enter the collapse at their
  recorded __seq, not BASE_SEQ.

At 100 TB: the log partitions are per-batch winner sets (small), the
snapshot collapse is one hash aggregate keyed on the CDC key — the
reader is the same shape as the batch apply's winner side, and the
expensive join against a huge base happens only at compaction or in
a table format's MERGE (sources/delta_merge.py seam), not per batch.

Real seqs must be >= 0 (BASE_SEQ = -1 sits strictly below them);
enforced by a plan-embedded check in the writer.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from ..operators.cdc import collapse_log

#: base rows enter the collapse below every real change
BASE_SEQ = -1


def cdc_log_batch_writer(
    root: str,
    key: str,
    seq_col: str,
    op_col: str,
    payload_cols: list[str],
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body: collapse this micro-batch's changes per key
    and persist them to ``{root}/log/batch_id=N`` (idempotent
    partition overwrite). Negative sequence numbers are rejected
    in-plan (they would collide with the base sentinel)."""

    def write_batch(changes: DataFrame, batch_id: int) -> None:
        # the guard REPLACES the seq value (a dropped side column's
        # raise_error would be pruned as dead code)
        guarded = changes.withColumn(
            seq_col,
            F.when(F.col(seq_col) >= 0, F.col(seq_col)).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("cdc seq must be >= 0, got "),
                        F.col(seq_col).cast("string"),
                    )
                ).cast("long")
            ),
        )
        winners = collapse_log(guarded, key, seq_col, op_col, payload_cols)
        winners.write.mode("overwrite").parquet(
            f"{root}/log/batch_id={batch_id}"
        )

    return write_batch


def read_cdc_snapshot(
    spark: SparkSession,
    root: str,
    key: str,
    payload_cols: list[str],
    base: DataFrame | None = None,
    keep_seq: bool = False,
) -> DataFrame:
    """Current snapshot from the committed log (+ optional base):
    (key, payload...) of the latest surviving state per key —
    identical semantics to operators/cdc.apply_changes, robust to
    out-of-order and duplicate delivery across batches. With
    ``keep_seq=True`` the winning __seq is kept (the compaction
    form: re-basing preserves monotonicity)."""
    try:
        log = (
            spark.read.option("basePath", f"{root}/log")
            .parquet(f"{root}/log")
            .drop("batch_id")
        )
    except AnalysisException:
        log = None
    parts = []
    if log is not None:
        parts.append(log.select(key, "__seq", "__op", *payload_cols))
    if base is not None:
        base_cols = set(base.columns)
        base_seq = (
            F.col("__seq") if "__seq" in base_cols else F.lit(BASE_SEQ)
        ).cast("long")
        parts.append(
            base.select(
                key,
                base_seq.alias("__seq"),
                F.lit("U").alias("__op"),
                *payload_cols,
            )
        )
    if not parts:
        raise ValueError("read_cdc_snapshot: no log yet and no base given")
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    snap = collapse_log(union, key, "__seq", "__op", payload_cols).filter(
        F.col("__op") != "D"
    )
    keep = [key, *payload_cols] + (["__seq"] if keep_seq else [])
    return snap.select(*keep)
