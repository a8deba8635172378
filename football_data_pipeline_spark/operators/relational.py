"""Core relational operators (SURVEY.md §2.3, §2.5, §2.6, §2.8).

Re-expresses the reference's SQL-string read surface as declarative
DataFrame plans:
- J1 star join with a double-role dim join — the reference joins
  ``teams`` twice (home/away aliases) plus ``leagues``
  (/root/reference/streamlit_dashboard.py:201-211,294-304,
  database_integration.py:380-388, discord_integration.py:46-56);
- J2 left join keeping empty dims
  (/root/reference/streamlit_dashboard.py:176-184);
- J4 OR-condition join rewritten as a union of equi-joins
  (/root/reference/streamlit_dashboard.py:58-63);
- J6/J7 semi/anti joins (/root/reference/streamlit_dashboard.py:302,
  .github/workflows/football-data-pipeline.yml:248-251);
- A1-A7 aggregate families (scalar, distinct, grouped, conditional,
  top-k, date-truncated trend);
- O5 role-union (/root/reference/streamlit_dashboard.py:501-509).

Scale strategy: fixed-cardinality dims (``region`` 5 rows, ``nation``
25 rows — like the reference's ``leagues``) are explicitly broadcast,
so the fact side never shuffles for those joins at any scale.
Linearly-scaling dims (customer/supplier/part) are left to Catalyst +
AQE, which broadcasts them while they fit and falls back to shuffle
joins beyond — the right default for a 1000-executor cluster.
Aggregations are plain hash aggregates (partial map-side combine +
final), and every top-k is ORDER BY + LIMIT → TakeOrderedAndProject,
never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.stable import davg, dsum, oracle_davg, oracle_dsum, oracle_rnd, rnd
from ..registry import query


@query(
    "q_star_join",
    oracle=f"""
    SELECT cn.n_name AS cust_nation,
           sn.n_name AS supp_nation,
           count(*) AS n_items,
           {oracle_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    GROUP BY cn.n_name, sn.n_name
    """,
)
def q_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: multi-way star join with ``nation`` joined in two roles.

    The double-role join mirrors the reference joining ``teams`` as
    both home and away aliases in one query
    (/root/reference/streamlit_dashboard.py:201-211). ``nation`` is
    fixed-cardinality → broadcast in both roles; facts flow through
    without a dim shuffle, and the only shuffle is the final groupBy
    on the (cust_nation, supp_nation) pair.
    """
    lineitem = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    cust_nation = F.broadcast(nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")))
    supp_nation = F.broadcast(nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")))
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(cust_nation, customer.c_nationkey == F.col("cn_key"))
        .join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .join(supp_nation, supplier.s_nationkey == F.col("sn_key"))
        .groupBy("cust_nation", "supp_nation")
        .agg(
            F.count("*").alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


@query(
    "q_left_join_count",
    oracle=f"""
    SELECT r.r_name AS region_name,
           n.n_name AS nation_name,
           count(c.c_custkey) AS n_customers,
           coalesce({oracle_dsum('c.c_acctbal')}, 0.0) AS total_acctbal
    FROM nation n
    JOIN region r ON n.n_regionkey = r.r_regionkey
    LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY r.r_name, n.n_name
    """,
)
def q_left_join_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2/A3: dims LEFT JOIN facts so empty dims keep a 0-count row.

    Mirrors the league-distribution report that keeps leagues with no
    games (/root/reference/streamlit_dashboard.py:176-184,
    yml:891-900). COUNT(col) (not COUNT(*)) so unmatched rows count 0.
    """
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    customer = load(spark, sf_dir, "customer")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(customer, customer.c_nationkey == nation.n_nationkey, "left")
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.coalesce(dsum("c_acctbal"), F.lit(0.0)).alias("total_acctbal"),
        )
    )


@query(
    "q_group_multi",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           {oracle_dsum('o_totalprice')} AS total_price,
           {oracle_davg('o_totalprice')} AS avg_price,
           min(o_orderdate) AS first_order,
           max(o_orderdate) AS last_order
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    """,
)
def q_group_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: multi-column GROUP BY with a fan of aggregates.

    Mirrors the data-summary report grouping
    (/root/reference/streamlit_dashboard.py:47-54). Partial + final
    hash aggregation; one shuffle on the grouping key.
    """
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
        davg("o_totalprice").alias("avg_price"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
    )


@query(
    "q_topk_group",
    oracle="""
    SELECT event_type, count(*) AS n_events
    FROM events
    GROUP BY event_type
    ORDER BY n_events DESC, event_type ASC
    LIMIT 3
    """,
)
def q_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: GROUP BY + COUNT + ORDER BY DESC + LIMIT k (top-k report).

    Mirrors top-bookmakers/top-leagues reports (yml:732-752,
    /root/reference/enhanced_mapping.py:701-708). Deterministic
    tie-break on the group key so the oracle agrees. Physical plan:
    hash agg → TakeOrderedAndProject (no global sort).
    """
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(F.count("*").alias("n_events"))
        .orderBy(F.desc("n_events"), F.asc("event_type"))
        .limit(3)
    )


@query(
    "q_conditional_agg",
    oracle=f"""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
           {oracle_davg("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS avg_finished_price,
           floor((sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) * 100.0 / count(*)) * 100 + 0.5) / 100 AS finished_rate
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/A5: SUM(CASE WHEN...) / AVG(CASE WHEN...) + post-agg ratio.

    Mirrors the mapping-statistics report — success counts, success
    rate, average confidence of successes
    (/root/reference/enhanced_mapping.py:267-288,667-698).
    """
    orders = load(spark, sf_dir, "orders")
    finished = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    return orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(finished).alias("n_finished"),
        davg(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))).alias(
            "avg_finished_price"
        ),
        rnd(F.sum(finished) * 100.0 / F.count("*")).alias("finished_rate"),
    )


@query(
    "q_scalar_agg",
    oracle=f"""
    SELECT count(*) AS n_lineitems,
           {oracle_dsum('l_quantity')} AS total_qty,
           {oracle_davg('l_extendedprice')} AS avg_price,
           min(l_shipdate) AS first_ship,
           max(l_shipdate) AS last_ship
    FROM lineitem
    """,
)
def q_scalar_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: whole-table scalar aggregates (COUNT/SUM/AVG/MIN/MAX).

    Mirrors the dashboard header metrics and freshness check
    (/root/reference/streamlit_dashboard.py:128-144,
    validate_data.py:20-45).
    """
    lineitem = load(spark, sf_dir, "lineitem")
    return lineitem.agg(
        F.count("*").alias("n_lineitems"),
        dsum("l_quantity").alias("total_qty"),
        davg("l_extendedprice").alias("avg_price"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


@query(
    "q_count_distinct",
    oracle="""
    SELECT count(DISTINCT l_orderkey) AS n_orders,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_suppliers
    FROM lineitem
    """,
)
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: exact COUNT(DISTINCT ...) — matches the oracle exactly.

    Mirrors distinct-league / distinct-fixture counts
    (/root/reference/streamlit_dashboard.py:132, yml:726-729). At
    100 TB prefer ``approx_count_distinct`` (documented variant) —
    exact distinct is a full shuffle per column; Spark expands
    multi-distinct via expand + two-phase agg, which is fine here.
    """
    lineitem = load(spark, sf_dir, "lineitem")
    return lineitem.agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
    )


@query(
    "q_date_trunc_trend",
    oracle=f"""
    SELECT strftime(ts, '%Y-%m-%d') AS event_date,
           event_type,
           count(*) AS n_events,
           {oracle_dsum('value')} AS total_value
    FROM events
    GROUP BY strftime(ts, '%Y-%m-%d'), event_type
    """,
)
def q_date_trunc_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: date-truncated time-series aggregation.

    Mirrors ``GROUP BY DATE(collected_at), collection_phase``
    (/root/reference/streamlit_dashboard.py:154-162, yml:756-763).
    At scale this is the query that motivates partitioning the fact
    table by ``to_date(ts)`` — the groupBy then needs no shuffle of
    raw rows beyond partial aggregates.
    """
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(
            # string-typed day bucket: engines disagree on how a derived
            # DATE round-trips (date object vs midnight datetime), a
            # yyyy-MM-dd string is unambiguous on both sides
            F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
            F.col("event_type"),
        ).agg(
            F.count("*").alias("n_events"),
            dsum("value").alias("total_value"),
        )
    )


@query(
    "q_semi_join",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: EXISTS → left-semi join (customers that have orders).

    Mirrors ``EXISTS (SELECT 1 FROM odds_history WHERE fixture_id =
    f.id)`` (/root/reference/streamlit_dashboard.py:302). Semi join
    never duplicates the left side and only ships the join key of the
    right side — the cheapest possible containment check at scale.
    """
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@query(
    "q_anti_join",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: NOT EXISTS → left-anti join (customers with no orders).

    Mirrors the job-merge step that keeps only new job ids
    (yml:248-251): ``new.join(existing, "id", "left_anti")``. The
    right side is pre-filtered (customers with no URGENT order) so the
    result is non-empty at every SF — and the filter is pushed into
    the orders scan before the anti-join ships any keys.
    """
    customer = load(spark, sf_dir, "customer")
    urgent = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        customer.join(urgent, customer.c_custkey == urgent.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@query(
    "q_or_join",
    oracle=f"""
    SELECT s.s_name AS supp_name,
           count(*) AS n_matches,
           {oracle_dsum('l.l_quantity')} AS total_qty
    FROM lineitem l
    JOIN supplier s
      ON (l.l_suppkey = s.s_suppkey OR l.l_partkey = s.s_suppkey)
    GROUP BY s.s_name
    """,
)
def q_or_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: OR-condition join rewritten as a union of equi-joins.

    The reference joins ``teams t ON (t.id = f.home_team_id OR t.id =
    f.away_team_id)`` (/root/reference/streamlit_dashboard.py:58-63).
    A literal OR join forces BroadcastNestedLoopJoin (quadratic at
    scale); the idiomatic rewrite is two broadcast equi-joins
    UNION ALL'd, with the second branch excluding rows already matched
    by the first so multiplicity matches the OR exactly.
    """
    lineitem = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    branch1 = lineitem.join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
    branch2 = lineitem.join(
        supplier,
        (lineitem.l_partkey == supplier.s_suppkey) & (lineitem.l_suppkey != supplier.s_suppkey),
    )
    return (
        branch1.unionByName(branch2)
        .groupBy(F.col("s_name").alias("supp_name"))
        .agg(
            F.count("*").alias("n_matches"),
            dsum("l_quantity").alias("total_qty"),
        )
    )


@query(
    "q_union_roles",
    oracle=f"""
    SELECT n.n_name AS nation_name, 'customer' AS role,
           count(*) AS n_accounts, {oracle_dsum('c.c_acctbal')} AS total_balance
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    UNION ALL
    SELECT n.n_name AS nation_name, 'supplier' AS role,
           count(*) AS n_accounts, {oracle_dsum('s.s_acctbal')} AS total_balance
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q_union_roles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5: an entity seen through two FK roles, as a role-tagged union.

    The reference reads a team's games via home-role and away-role
    queries and concatenates (/root/reference/streamlit_dashboard.py:
    501-509) — cleaner than the OR join when downstream wants the role
    label. unionByName keeps the branches schema-safe.
    """
    nation = F.broadcast(load(spark, sf_dir, "nation"))
    customer = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    cust = (
        customer.join(nation, customer.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(F.count("*").alias("n_accounts"), dsum("c_acctbal").alias("total_balance"))
        .withColumn("role", F.lit("customer"))
    )
    supp = (
        supplier.join(nation, supplier.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(F.count("*").alias("n_accounts"), dsum("s_acctbal").alias("total_balance"))
        .withColumn("role", F.lit("supplier"))
    )
    cols = ["nation_name", "role", "n_accounts", "total_balance"]
    return cust.select(cols).unionByName(supp.select(cols))


@query(
    "q_team_search",
    oracle="""
    SELECT c.c_custkey AS user_id, c.c_name AS user_name,
           o.o_orderkey AS order_id,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_name LIKE '%042%' AND o.o_orderdate > DATE '1995-06-01'
    ORDER BY o.o_orderdate, o.o_orderkey
    LIMIT 10
    """,
)
def q_team_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: LIKE '%name%' substring lookup, then next-events top-k.

    Mirrors the bot's team search — ``ht.name LIKE '%x%' OR at.name
    LIKE '%x%'`` over upcoming fixtures, ORDER BY kickoff LIMIT 1
    (/root/reference/discord_integration.py:141-151). customer ≈
    teams, orders ≈ fixtures. The contains() filter runs on the
    broadcast dim BEFORE the join (a handful of matching keys probe
    the fact side), the date predicate pushes to the orders scan, and
    ORDER BY + LIMIT compiles to TakeOrderedAndProject — no global
    sort at any scale. Tie-break on o_orderkey makes the top-k
    deterministic (the reference's LIMIT 1 pick is engine-dependent
    on kickoff ties).
    """
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").filter(F.col("c_name").contains("042"))
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("o_orderdate") > F.lit("1995-06-01").cast("date"))
        .orderBy("o_orderdate", "o_orderkey")
        .limit(10)
        .select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_name").alias("user_name"),
            F.col("o_orderkey").alias("order_id"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
    )


@query(
    "q_cube_report",
    oracle=f"""
    SELECT coalesce(o_orderpriority, 'ALL') AS priority,
           coalesce(o_orderstatus, 'ALL') AS status,
           CAST(count(*) AS BIGINT) AS n_orders,
           {oracle_dsum('o_totalprice')} AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
)
def q_cube_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: CUBE rollup — the (priority × status) report with all
    four aggregation grains (both dims, each dim alone, grand total)
    in ONE pass, the OLAP-dashboard shape the reference emulates by
    issuing a separate SQL query per grain
    (/root/reference/streamlit_dashboard.py league/status breakdown
    tabs). Spark expands the cube map-side into grouping-set tuples
    and one hash aggregate covers every grain — at 100 TB that is one
    fact scan instead of four.

    Rolled-up dimensions are labeled 'ALL' via coalesce: both source
    columns are non-nullable in this schema (asserted by the
    validation gate q_validate_counts), so the label cannot collide
    with a real NULL group, and the output is engine-portable without
    relying on grouping_id() bit conventions, which differ across
    engines.
    """
    orders = load(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("sum_price"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n_orders",
            "sum_price",
        )
    )
