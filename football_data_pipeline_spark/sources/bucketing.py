"""Bucketed silver tables — shuffle-free co-located joins at scale.

The reference's B-tree indexes (/root/reference/database_schema.sql:
172-179) map to two Spark physical-layout tools (SURVEY.md §4.1):
date partitioning (partition pruning; sinks.py) and BUCKETING —
pre-hashing a table into a fixed number of buckets on its join/agg
key so that every later equi-join or aggregation on that key reads
co-located buckets and skips the exchange entirely.

When it matters: the odds_history ⋈ fixtures join and the
latest-per-fixture window both key on fixture_id. At 100 TB those are
the two dominant shuffles of the read path; bucketing both tables by
fixture_id with the same bucket count makes the join zero-shuffle and
lets the window reuse the clustered layout. The trade: a fixed bucket
count chosen at write time (pick for target-SF task sizing, e.g.
2048 at 100 TB → ~50 GB of raw odds per bucket before compression),
and writes must go through the session catalog (``saveAsTable``) so
the bucket metadata survives for readers.

``tests/test_bucketing.py`` asserts the property that matters: the
executed join plan of two co-bucketed tables contains NO Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally within-bucket
    sorted) Parquet table. ``sort_cols`` mirrors the reference's
    compound indexes (e.g. odds (fixture_id, market_type,
    collected_at)): rows inside each bucket are clustered so
    row-group min/max stats make point/range probes cheap."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — required (vs. read.parquet) so Spark applies
    the bucket spec and can elide exchanges."""
    return spark.table(table)
