"""Skew-mitigation operators: salted two-stage aggregation and the
salted replicate-join — the hand-salting half of the engine's skew
strategy (q_skew_report in profiling.py is the DIAGNOSIS half; AQE's
skewedJoin handles sort-merge-join partition splits automatically,
and these cover what AQE cannot touch).

When hand salting is the right tool (and when it isn't):

- ``salted distinct``: Spark plans COUNT(DISTINCT x) BY key as an
  expand + two-phase aggregate keyed (key, x) — a hot key funnels
  its entire distinct-set through one reducer in the FINAL phase.
  Salting splits phase one into (key, salt) cells so no single task
  owns a hot key's whole value set; the exact-distinct union happens
  over per-cell DISTINCT SETS, which are duplicate-free and
  bounded by value cardinality, not row count. AQE cannot re-plan
  this: aggregation skew is not join skew.
- ``salted join``: a fact⋈dim equi join where one fact key dominates
  AND the dim side is too big to broadcast. The dim side replicates
  SALT_N ways (explode over a literal sequence — generator-side, no
  shuffle of the original rows beyond the join's own exchange), the
  fact side computes a DETERMINISTIC salt from a secondary column,
  and the join key becomes (key, salt): a hot key's rows spread over
  SALT_N reducers instead of one. Results are row-identical to the
  plain join (each fact row meets exactly ONE dim replica). Don't
  reach for this when the dim broadcasts (broadcast beats salting)
  or when AQE's skew split already applies (plain SMJ) — both
  documented escape hatches come first.

Reference tie-in: the hot key in the reference's own data is the
popular-league fixture lookup (top leagues take most rows —
/root/reference/streamlit_dashboard.py's league filters); `orders ⋈
customer` over o_custkey is the testdata stand-in with a measured
skew profile (q_skew_report).

10× probe (sf0.1 orders/customer replicated 10×, custkeys offset so
distinct-values AND rows both grow 10×, medians of 3): salted
distinct 0.52 → 1.23 s, salted join + rollup 0.43 → 2.12 s —
sub-linear wall-clock for 10× input on both paths (fixed Spark
per-stage overhead dominates at 1×).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query

#: salt fan-out. Sized to the cluster's reducer waves, not the data:
#: a hot key spreads over SALT_N tasks; SALT_N ≈ 2-4× the per-stage
#: task slots a single key should be allowed to occupy. 8 keeps the
#: sf0.1 plans readable; a 1000-executor cluster would run 64-256.
SALT_N = 8


def hash_bucket(col: Column, n: int) -> Column:
    """THE engine's deterministic hash-mod primitive (long in
    [0, n)): every salt/bucket/cell derivation routes through this
    one expression so the stable-hash discipline (xxhash64, never
    rand() — task retries and speculative duplicates must agree)
    lives in exactly one place. Shared by fact_salt here,
    sketches.bucket_of, and weighted_topk's phase-1 cells."""
    return F.pmod(F.xxhash64(col), F.lit(n)).cast("long")


def fact_salt(secondary: Column, n: int = SALT_N) -> Column:
    """Deterministic salt in [0, n) from a SECONDARY column (not the
    join key — salting the key with itself spreads nothing); see
    hash_bucket for the retry-safety argument."""
    return hash_bucket(secondary, n).cast("int")


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    fact_salt_col: Column,
    n: int = SALT_N,
) -> DataFrame:
    """fact ⋈ dim on ``key`` with the dim side replicated ``n`` ways
    and the fact side salted by ``fact_salt_col`` — row-identical to
    ``facts.join(dim, key)`` with the hot key's work spread over
    ``n`` reducers. Column order/set matches the plain join's."""
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n - 1), F.lit(1)))
    )
    return (
        facts.withColumn("__salt", fact_salt_col)
        .join(salted_dim, [key, "__salt"])
        .drop("__salt")
    )


def salted_distinct_count(
    df: DataFrame,
    group_col: str,
    distinct_col: str,
    salt_from: Column | None = None,
    n: int = SALT_N,
) -> DataFrame:
    """(group_col, n_distinct): exact per-group COUNT(DISTINCT) in
    two salted stages — stage 1 dedups (group, salt, value) cells,
    stage 2 counts the union. Values are deduped WITHIN their salt
    cell and the salt is derived from the VALUE itself, so one value
    lands in exactly one cell and the final count is exact — the
    classic skew-proof distinct (each stage's reducer keying includes
    the salt or the value, never the bare hot group)."""
    salt = (
        fact_salt(F.col(distinct_col), n) if salt_from is None else salt_from
    )
    # salt is resolved against df (pre-rename) so both the default and a
    # caller-supplied salt_from may reference the original column names
    cells = (
        df.select(
            group_col,
            F.col(distinct_col).alias("__v"),
            salt.alias("__salt"),
        )
        .groupBy(group_col, "__salt")
        .agg(F.countDistinct("__v").alias("__n"))
    )
    return cells.groupBy(group_col).agg(
        F.sum("__n").cast("long").alias("n_distinct")
    )


@query(
    "q_salted_distinct",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_salted_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-priority distinct-customer counts computed through
    the SALTED two-stage plan, oracle-checked against the plain
    COUNT(DISTINCT): the skew-mitigation path must be value-identical
    to the naive one, or it isn't a mitigation — it's a bug.
    Exactness: a value lands in exactly one (group, salt) cell
    (salt = hash(value) mod n), so the per-cell distinct counts sum
    to the true distinct count — no estimate anywhere.

    Scale shape: two hash aggregates; stage 1's key space is
    (groups × SALT_N) with map-side partial combine, stage 2 is
    groups-sized. No single reducer ever keys a bare hot group with
    its full value set.
    """
    orders = load(spark, sf_dir, "orders")
    return salted_distinct_count(orders, "o_orderpriority", "o_custkey")


@query(
    "q_salted_join",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_orderkey AS BIGINT)) AS BIGINT)
               AS sum_okey
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ customer through the SALTED replicate-join, rolled up
    per market segment and oracle-checked against the PLAIN join: the
    mitigation must be row-identical to the naive plan or it silently
    corrupts results. The salt comes from o_orderkey (a secondary
    column, never the join key), so each fact row meets exactly one of
    the SALT_N dim replicas.

    Scale shape: the dim side replicates SALT_N× (generator-side
    explode — no extra shuffle of the original dim rows beyond the
    join's own exchange) and a hot custkey's fact rows spread over
    SALT_N reducers instead of one. The post-join rollup is a plain
    two-phase hash aggregate on the 5-value segment key. At 100 TB
    this is the fact⋈dim form for when the dim outgrows broadcast AND
    one key dominates; broadcast and AQE skew-split remain the
    documented first resorts (module docstring).
    """
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    joined = salted_join(
        orders, customer, "o_custkey", fact_salt(F.col("o_orderkey"))
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_orderkey").cast("long")).alias("sum_okey"),
    )
