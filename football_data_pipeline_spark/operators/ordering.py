"""Deterministic training-order assignment — the reproducible
per-epoch shuffle a training-data pipeline bakes into its shard
layout (data ordering is part of a training run's seed; re-runs and
resumes must see the identical sequence).

For each epoch e, every document gets a shuffle key
md5("ep{e}:" || doc_id): a different, pseudo-random but fully
deterministic permutation per epoch, reproducible on any engine or
cluster size with no RNG state to ship. Documents are dealt into
N_SHARDS shards by a disjoint md5 (shard membership stays stable
ACROSS epochs — what changes per epoch is only the within-shard
order, mirroring how real loaders shuffle shard-locally), and the
within-shard position is the rank of the shuffle key.

Reference parity: none — LLM-data-pipeline extension (SURVEY.md §2).

Scale shape: one hash exchange keyed (epoch, shard) and a
within-partition sort — each partition holds ~N/N_SHARDS rows, and
N_SHARDS is chosen ∝ corpus size so partitions stay memory-sized (at
100 TB: thousands of shards, each a few GB). No global sort ever
happens; this is the queryable twin of the production write path
(`repartition(epoch, shard).sortWithinPartitions(key)` straight into
per-shard files, zero window needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query

N_SHARDS = 8
EPOCHS = 2  # epochs materialized by the driver query


def _ordering_oracle() -> str:
    return f"""
    WITH ep AS (SELECT unnest(range(0, {EPOCHS})) AS epoch),
    keyed AS (
      SELECT d.doc_id, ep.epoch,
             CAST('0x' || substr(md5('shard:' || d.doc_id), 1, 8) AS BIGINT)
               % {N_SHARDS} AS shard,
             md5('ep' || ep.epoch || ':' || d.doc_id) AS shuffle_key
      FROM documents d CROSS JOIN ep
    )
    SELECT epoch, shard, doc_id, shuffle_key,
           row_number() OVER (PARTITION BY epoch, shard
                              ORDER BY shuffle_key, doc_id) AS pos
    FROM keyed
    """


def epoch_order(docs: DataFrame, epochs: int = EPOCHS) -> DataFrame:
    """(epoch, shard, doc_id, shuffle_key, pos): the deterministic
    read order for each training epoch, shard-local (see module
    docstring for why the window partitioning IS the scale story)."""
    keyed = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(epochs - 1))).alias("epoch"),
    ).select(
        "doc_id",
        "epoch",
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
                F.lit("ep"),
                F.col("epoch").cast("string"),
                F.lit(":"),
                F.col("doc_id").cast("string"),
            )
        ).alias("shuffle_key"),
    )
    w = Window.partitionBy("epoch", "shard").orderBy("shuffle_key", "doc_id")
    return keyed.select(
        "epoch",
        "shard",
        "doc_id",
        "shuffle_key",
        F.row_number().over(w).cast("long").alias("pos"),
    )


@query("q_epoch_order", oracle=_ordering_oracle())
def q_epoch_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry for :func:`epoch_order` over the documents table
    (see the module docstring for semantics and the 100 TB shape)."""
    return epoch_order(load(spark, sf_dir, "documents"))
