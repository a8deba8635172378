"""Sinks: snapshot/report JSON writers, partitioned silver tables,
retention rewrite (SURVEY.md §2.1 S3/S5/S6/S7).

The reference writes per-collection JSON snapshot files
(yml:330-339), small JSON reports (weekly report, dashboard data,
health, API usage, mapping stats — yml:777,928,568,996,1077), and
runs a daily retention DELETE + VACUUM (yml:661-680). Here:

- silver tables are Parquet partitioned by the snapshot DATE —
  the Spark replacement for the reference's ``idx_odds_collected``
  B-tree (SURVEY.md §4.1): time-range predicates become partition
  pruning, and within-partition row groups carry (fixture_id,
  market_type) min/max stats for skipping;
- snapshot/report sinks are plain JSON writes (reports coalesce to
  one file — they are dim-sized by construction; snapshots keep
  their natural parallelism);
- retention is a filter-and-overwrite of expired date partitions —
  on plain Parquet the portable equivalent of ``DELETE WHERE ts <
  cutoff`` + VACUUM. With dynamic partition overwrite only the
  affected partitions rewrite; surviving data is never touched.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: partition column added to silver facts (string yyyy-MM-dd, the
#: Hive-friendly form of to_date(collected_at))
PARTITION_COL = "snapshot_date"


def with_snapshot_date(df: DataFrame, ts_col: str = "collected_at") -> DataFrame:
    return df.withColumn(PARTITION_COL, F.date_format(F.col(ts_col), "yyyy-MM-dd"))


def write_silver(
    df: DataFrame, path: str, ts_col: str = "collected_at", mode: str = "append"
) -> None:
    """S4/S7 write side: date-partitioned Parquet fact table.
    ``mode="overwrite"`` supports idempotent batchId-keyed writes
    (streaming/pipeline.py) — the caller scopes ``path`` to the unit
    being replaced."""
    with_snapshot_date(df, ts_col).write.mode(mode).partitionBy(PARTITION_COL).parquet(path)


def read_silver(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_snapshot_json(df: DataFrame, path: str) -> None:
    """S3: collection-snapshot JSON files (one dir per snapshot)."""
    df.write.mode("overwrite").json(path)


def write_report_json(df: DataFrame, path: str) -> None:
    """S5: small JSON report — reports are aggregate-sized, so a
    single output file is deliberate (downstream is a dashboard, not
    an engine)."""
    df.coalesce(1).write.mode("overwrite").json(path)


def apply_retention(
    spark: SparkSession, path: str, cutoff: Column, ts_col: str = "collected_at"
) -> None:
    """S7: drop rows older than ``cutoff`` from a date-partitioned
    silver table by rewriting ONLY the partitions that still contain
    surviving rows older than... — more precisely: with
    ``partitionOverwriteMode=dynamic``, writing the surviving subset
    in overwrite mode replaces exactly the partitions present in the
    subset; fully-expired partitions keep their files but are
    excluded by the partition predicate pushed from any time-bounded
    read. For a hard file drop, compact with ``compact_partitions``.

    The portable plain-Parquet analogue of Delta ``DELETE FROM t
    WHERE ts < cutoff`` + ``VACUUM`` (yml:661-680).
    """
    df = spark.read.parquet(path)
    survivors = df.filter(F.col(ts_col) >= cutoff)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        survivors.write.mode("overwrite").partitionBy(PARTITION_COL).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def compact_partitions(spark: SparkSession, path: str, keep_predicate: Column, tmp_path: str) -> None:
    """Full compaction (VACUUM analogue): rewrite the table keeping
    only rows matching ``keep_predicate``. Two-phase copy: the
    filtered copy lands in ``tmp_path`` first, then overwrites the
    live path. NOT atomic — a crash during the second write leaves
    the live path partial, but the full surviving dataset remains in
    ``tmp_path`` for recovery (re-run the final write). A
    transactional table format (Delta/Iceberg) is the real fix at
    scale; on plain Parquet an atomic swap needs a filesystem rename,
    which object stores don't provide."""
    spark.read.parquet(path).filter(keep_predicate).write.mode("overwrite").partitionBy(
        PARTITION_COL
    ).parquet(tmp_path)
    final = spark.read.parquet(tmp_path)
    final.write.mode("overwrite").partitionBy(PARTITION_COL).parquet(path)


def write_training_shards(
    docs: DataFrame,
    path: str,
    epoch: int = 0,
    max_records_per_file: int = 100_000,
) -> None:
    """Materialize a training epoch as ordered shard files — the
    production write path whose queryable twin is
    ``operators/ordering.epoch_order`` (same md5 shard membership and
    shuffle keys; that module's docstring explains the determinism
    contract).

    Plan shape: ONE hash exchange (`repartition` on the shard id)
    followed by ``sortWithinPartitions`` on the shuffle key: no
    window, no rank, no global sort. Hash partitioning guarantees
    ALL rows of a shard land in one task — the property the ordering
    needs (a shard split across tasks would interleave two sorted
    runs) — but NOT a 1:1 task↔shard mapping: hash collisions leave
    some tasks empty and give others 2+ shards (with N_SHARDS values
    into N_SHARDS partitions a perfect spread is ~0.2% likely).
    ``partitionBy("shard")`` splits a multi-shard task into per-shard
    directories, so correctness is unaffected; for write BALANCE at
    scale, set shard count ≳ 3-4× cores so collisions average out —
    shard count scales with the corpus anyway. ``maxRecordsPerFile``
    splits each shard into bounded files WITHOUT breaking order
    (Spark rolls to the next file sequentially within the task): the
    small-files fix and the ordering guarantee in one write, and a
    training loader replaying (shard, file, row) order sees the
    exact epoch_order permutation.
    """
    from ..operators.ordering import N_SHARDS  # shared geometry

    keyed = docs.select(
        "*",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % N_SHARDS
        ).alias("shard"),
        F.md5(
            F.concat(
                F.lit(f"ep{epoch}:"),
                F.col("doc_id").cast("string"),
            )
        ).alias("shuffle_key"),
    )
    # sort key starts with the partition column: FileFormatWriter
    # requires output ordered by partition columns and ADDS ITS OWN
    # (order-destroying) sort when they are not a prefix of the
    # existing ordering — with the prefix in place it reuses ours
    (
        keyed.repartition(N_SHARDS, "shard")
        .sortWithinPartitions("shard", "shuffle_key", "doc_id")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("shard")
        .parquet(path)
    )
