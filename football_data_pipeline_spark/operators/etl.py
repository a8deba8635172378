"""Driver-checkable ETL queries over the testdata tables.

The JSON-document flatteners (flatten.py) are exercised by golden
tests on reference-shaped docs; these two queries expose the same
machinery on the driver's synthetic tables so the oracle gate covers
it too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.stable import oracle_davg, rnd
from ..registry import query
from .upsert import keep_latest


@query(
    "q_json_extract",
    oracle=f"""
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           {oracle_davg("CAST(json_extract_string(props, '$.k') AS BIGINT)")} AS avg_k,
           CAST(sum(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_high
    FROM events
    GROUP BY event_type
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N6: JSON-as-TEXT column parsed in-engine, then aggregated.

    The reference round-trips JSON through TEXT columns
    (``alternatives``, /root/reference/enhanced_mapping.py:94,628,713)
    and navigates payload dicts defensively. ``get_json_object`` is
    the codegen'd equivalent — no UDF, pushdown-friendly.
    """
    events = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(k).alias("sum_k"),
        rnd(F.sum(k.cast("decimal(28,4)")).cast("double") / F.count(k)).alias("avg_k"),
        F.sum(F.when(k > 50, 1).otherwise(0)).alias("n_high"),
    )


@query(
    "q_upsert_latest",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type, value, ts,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id, event_type,
           floor(value * 100 + 0.5) / 100 AS current_value,
           ts AS updated_at
    FROM ranked WHERE rn = 1
    """,
)
def q_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 as a query: the table state after replaying a changelog with
    INSERT OR REPLACE semantics == latest row per key.

    This is exactly ``keep_latest`` from the upsert library
    (/root/reference/database_integration.py:127-130 semantics),
    proving the merge kernel against the SQL oracle.
    """
    events = load(spark, sf_dir, "events")
    latest = keep_latest(events, ["user_id", "event_type"], ["ts", "event_id"])
    return latest.select(
        "user_id",
        "event_type",
        rnd(F.col("value")).alias("current_value"),
        F.col("ts").alias("updated_at"),
    )
