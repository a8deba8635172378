"""Sketch-backed scale operators: two-pass EXACT heavy hitters,
bloom-filter semi-join pruning, and estimator audits for the two
approximate aggregates a 100 TB profiler actually runs
(approx_count_distinct, percentile_approx).

Why these exist at 100 TB:

- ``heavy hitters``: a plain ``GROUP BY key HAVING count >= T`` over
  a column with billions of distinct values (URLs, n-grams, user
  ids) carries full-cardinality hash-aggregate state through the
  shuffle just to discard almost all of it. The two-pass form bounds
  pass-1 state at ``width`` buckets (count-min with one row of
  counters): a key with count >= T must live in a bucket whose total
  is >= T (counts are non-negative — the superset guarantee), so
  pass 2 re-counts ONLY rows whose bucket survived. Result is
  EXACT — identical to the naive HAVING — because pass 2 counts real
  keys, not sketch cells; the sketch can only over-select (false
  positive buckets), never drop a qualifying key.
- ``bloom semi-join pruning``: the hand-built form of Spark's
  runtime row-level filtering (spark.sql.optimizer.runtime.
  bloomFilter.*) for when the optimizer won't inject it (non-equi
  shapes, streaming micro-batches, a key set built mid-pipeline).
  When the key side is too big to broadcast as a set (100M keys ≈
  GBs) its bloom bitmap still ships to every task as a literal
  (2^20 bits = 128 KiB — the same shape as Spark's runtime-filter
  scalar-subquery result), the fact side prunes AT THE SCAN with
  five hash probes per row, and only surviving rows pay the shuffle
  of the exact semi-join that kills the false positives. Exact by
  construction: bloom filters have no false negatives, and the
  verify join removes the false positives.
- ``audits``: approx_count_distinct (HyperLogLog++) and
  percentile_approx (Greenwald-Khanna) are the profiling aggregates
  this engine recommends at 100 TB (profiling.py sizes everything
  else off them) — "measure, don't guess" applies to the estimators
  themselves, so each gets a q_*_audit that checks the estimate
  against the exact answer computed in the same job and returns
  within-bound flags (the estimate itself stays OUT of the hashed
  output: HLL merge is register-max and order-free, but GK compaction
  is merge-order-sensitive, so only the guarantee — not the wobble —
  is contract).

Reference tie-in: the reference profiles hot teams/leagues by full
GROUP BY over SQLite (/root/reference/database_integration.py
get_teams / get_odds_movements aggregates); these are the forms
those diagnostics take when the fact table stops fitting one node.

10× probe (sf0.1 orders/customer replicated 10×, custkeys offset so
distinct keys AND rows both grow 10×; medians of 3):
q_heavy_hitters 0.60 -> 0.70 s (output 214 -> 2140 keys),
q_bloom_semi 0.81 -> 0.86 s, q_hll_audit 0.27 -> 0.29 s,
q_quantile_audit 0.42 -> 0.42 s - near-flat for 10x input on all
four paths; audit flags re-checked all-true at 10x (13k distinct
per group, HLL++ dense mode).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.stable import dsum, oracle_dsum
from ..registry import query
from .skew import hash_bucket

#: pass-1 bucket width for heavy hitters. Sizing rule: the prune
#: only bites while the expected bucket load N/width stays well
#: under the threshold T — width ≳ 10·N/T keeps cold buckets cold.
#: 2^17 covers sf0.1 at T=18; a 100 TB run sizes up to 2^24 (the
#: bucket-count table is still only 16M rows — nothing vs the keys).
HH_WIDTH = 1 << 17

#: q_heavy_hitters' HAVING floor (rows per key). 18 selects the
#: genuinely hot custkeys at every test SF (1 key at sf0.001, 24 at
#: sf0.01) — the keys q_skew_report would flag for salting.
HH_THRESHOLD = 18

#: bloom geometry: m = 2^13 bits (128 longs) / k = 5 hashes holds a
#: few hundred keys under 1% false positives; both scale knobs are
#: arguments (a 100M-key set wants m = 2^30, still a 128 MiB
#: broadcast where the raw key set would be several GiB).
BLOOM_BITS = 1 << 13
BLOOM_HASHES = 5
# Hard ceiling for the literal-inlined bitmap form (see
# bloom_semi_join's docstring for the sizing argument).
BLOOM_LITERAL_BITS_CAP = 1 << 23


def bucket_of(key: Column, width: int = HH_WIDTH) -> Column:
    """Deterministic count-min bucket in [0, width) — the shared
    stable-hash primitive (skew.hash_bucket)."""
    return hash_bucket(key, width)


# Broadcasting the surviving-bucket set is only safe while its worst
# case (<= width rows of one BIGINT) stays broadcast-sized; past this
# width the hint comes off and AQE picks the strategy (ADVICE r5).
HH_BROADCAST_WIDTH_CAP = 1 << 21


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold: int,
    width: int = HH_WIDTH,
    broadcast_buckets: bool | None = None,
) -> DataFrame:
    """(key_value, n_rows) for every key with count >= threshold —
    EXACTLY ``GROUP BY key HAVING count(*) >= threshold`` — via a
    bounded-state candidate pass.

    Pass 1 aggregates on hash buckets (state <= width counters, with
    map-side partial combine), keeps buckets whose TOTAL >= threshold
    (a superset of qualifying keys' buckets), and broadcasts that
    bucket set (<= width rows). Pass 2 semi-joins rows to candidate
    buckets — a broadcast hash join at the scan, no shuffle — and
    runs the exact per-key count over the survivors only. NULL keys
    are excluded (HAVING over GROUP BY NULL is engine-ambiguous and
    no hot-key mitigation applies to them).

    The surviving-bucket set is bounded by ``width`` rows, so the
    broadcast hint is only applied while that worst case stays
    broadcast-sized (``width <= HH_BROADCAST_WIDTH_CAP``, 2^21 rows
    ~= 16 MB of BIGINTs). At the documented 100 TB sizing (width
    2^24) a low threshold or adversarial key spread could push the
    candidate set toward width rows — multi-hundred-MB as a
    broadcast — so past the cap the hint comes off and the semi-join
    shuffles (or AQE re-plans it) instead (ADVICE r5). Override with
    ``broadcast_buckets`` when the caller knows the data better.
    """
    keyed = df.filter(F.col(key_col).isNotNull()).select(
        F.col(key_col).alias("key_value"),
        bucket_of(F.col(key_col), width).alias("__bucket"),
    )
    hot_buckets = (
        keyed.groupBy("__bucket")
        .agg(F.count(F.lit(1)).alias("__bn"))
        .filter(F.col("__bn") >= threshold)
        .select("__bucket")
    )
    if broadcast_buckets is None:
        broadcast_buckets = width <= HH_BROADCAST_WIDTH_CAP
    if broadcast_buckets:
        hot_buckets = F.broadcast(hot_buckets)
    survivors = keyed.join(hot_buckets, "__bucket", "left_semi")
    return (
        survivors.groupBy("key_value")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") >= threshold)
    )


def _bloom_positions(key: Column, num_bits: int, k: int) -> list[Column]:
    """k deterministic bit positions in [0, num_bits) — seed-salted
    xxhash64, the same stable-hash family the engine salts and
    buckets with everywhere."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits)).cast("long")
        for i in range(k)
    ]


def bloom_bitmap(
    keys: DataFrame,
    key_col: str,
    num_bits: int = BLOOM_BITS,
    k: int = BLOOM_HASHES,
) -> DataFrame:
    """One-row frame with ``bmap: map<long, long>`` — the bloom
    filter of ``keys[key_col]`` as word-index -> 64-bit word. Built
    with one bit_or aggregate over exploded (word, mask) pairs; only
    NON-ZERO words are materialized, so a sparse filter stays small.
    NULL keys are dropped (they match nothing in an equi-join)."""
    pos = (
        keys.filter(F.col(key_col).isNotNull())
        .select(
            F.explode(
                F.array(*_bloom_positions(F.col(key_col), num_bits, k))
            ).alias("__pos")
        )
    )
    words = pos.groupBy(
        F.expr("CAST(__pos DIV 64 AS BIGINT)").alias("__word")
    ).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__pos % 64 AS INT))")
        ).alias("__bits")
    )
    return words.agg(
        F.map_from_arrays(
            F.collect_list("__word"), F.collect_list("__bits")
        ).alias("bmap")
    )


def bloom_semi_join(
    facts: DataFrame,
    keys: DataFrame,
    key_col: str,
    num_bits: int = BLOOM_BITS,
    k: int = BLOOM_HASHES,
) -> DataFrame:
    """``facts LEFT SEMI JOIN keys ON key_col`` with a bloom prune in
    front: the fact scan tests k bits against the inlined literal
    bitmap and only surviving rows reach the exact semi-join.
    Row-identical to the plain semi-join (no false negatives; the
    verify join kills false positives) — with the fact-side shuffle
    shrunk to the candidate rows.

    Geometry ceiling (ADVICE r5): the literal form embeds
    ``num_bits/64`` BIGINTs in the expression tree, so it is gated at
    ``BLOOM_LITERAL_BITS_CAP`` (2^23 bits = 128 Ki words ~= 1 MB of
    plan literal — comfortably serializable; 2^30 would be a 16
    M-element literal that chokes plan serialization/codegen long
    before execution). A 2^23-bit / k=5 filter holds ~1.2 M keys at
    ~1% false-positive rate — and false positives only cost verify-
    join traffic, so an over-full filter degrades smoothly toward the
    plain semi-join rather than breaking. Key sets needing more bits
    than the cap should skip the bloom prune (the exact semi-join
    with AQE is the scale path there, as Spark's own
    InjectRuntimeFilter does when its bloom would exceed
    ``spark.sql.optimizer.runtime.bloomFilter.maxNumBits``)."""
    if num_bits > BLOOM_LITERAL_BITS_CAP:
        raise ValueError(
            f"num_bits={num_bits} exceeds the literal-bitmap ceiling "
            f"({BLOOM_LITERAL_BITS_CAP}); use the plain semi-join for "
            "key sets this large (see docstring)"
        )
    # Materialize the bitmap to the driver and inline it as a LITERAL
    # array — the engine-side twin of Spark's own InjectRuntimeFilter,
    # whose bloom is a scalar subquery result applied as a literal in
    # the fact filter. The collect is bounded by construction at
    # num_bits/8 bytes (128 KiB at 2^20 bits) regardless of key count.
    # Why a literal instead of a broadcast cross-join: a predicate of
    # fact columns + literals PUSHES BELOW the verify semi-join into
    # the fact scan (plain predicate pushdown), while a predicate
    # referencing a cross-joined bitmap column pins ABOVE it — and
    # Catalyst then hoists the semi-join under the cross-join
    # (PushLeftSemiLeftAntiThroughJoin, observed at sf0.01), running
    # the verify join on the UNPRUNED fact and making the bloom dead
    # code. The literal form yields scan -> bloom filter -> semi-join,
    # which is the only order that shrinks the shuffle at 100 TB.
    rows = bloom_bitmap(keys, key_col, num_bits, k).collect()
    sparse = rows[0].bmap if rows else {}
    # ceil-sized: positions address word num_bits//64 when num_bits
    # is not a multiple of 64 (the top partial word)
    dense = [0] * ((num_bits + 63) // 64)
    for w, bits in (sparse or {}).items():
        dense[int(w)] = bits
    with_probes = facts.withColumn(
        "__barr", F.lit(dense).cast("array<bigint>")
    )
    for i, p in enumerate(_bloom_positions(F.col(key_col), num_bits, k)):
        with_probes = with_probes.withColumn(f"__p{i}", p)
    member = None
    for i in range(k):
        hit = F.expr(
            f"element_at(__barr, CAST(__p{i} DIV 64 AS INT) + 1)"
            f" & shiftleft(CAST(1 AS BIGINT), CAST(__p{i} % 64 AS INT)) != 0"
        )
        member = hit if member is None else member & hit
    pruned = with_probes.filter(member).drop(
        "__barr", *[f"__p{i}" for i in range(k)]
    )
    return pruned.join(
        keys.select(key_col).distinct(), key_col, "left_semi"
    )


@query(
    "q_heavy_hitters",
    oracle=f"""
    SELECT o_custkey AS key_value,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= {HH_THRESHOLD}
    """,
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with >= 18 orders through the two-pass bounded-state
    plan, oracle-checked against the plain GROUP BY ... HAVING: the
    sketch pass may only PRUNE work, never change the answer. The
    scale story is pass-1 state: <= HH_WIDTH bucket counters instead
    of one hash-aggregate cell per distinct key — the difference
    between 16M counters and billions when the key is a URL or
    n-gram column at 100 TB.
    """
    orders = load(spark, sf_dir, "orders")
    return heavy_hitters(orders, "o_custkey", HH_THRESHOLD)


@query(
    "q_bloom_semi",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           {oracle_dsum('o_totalprice')} AS sum_price
    FROM orders
    WHERE o_custkey IN (
      SELECT c_custkey FROM customer WHERE c_acctbal > 9000
    )
    GROUP BY o_orderpriority
    """,
)
def q_bloom_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders from high-balance customers (c_acctbal > 9000), found
    through the bloom-pruned semi-join and rolled up per priority —
    oracle-checked against the plain IN-subquery form: pruning must
    be row-invisible. At this SF the key set would broadcast fine;
    the operator earns its keep when the key side is itself a 100M-row
    pipeline product whose SET can't broadcast but whose 128 KiB-per-
    2^20-bits BITMAP can — the fact scan then sheds non-members
    before any shuffle, which is exactly what Spark's runtime bloom
    filter does for plans it recognizes (this form works in the plans
    it doesn't).
    """
    orders = load(spark, sf_dir, "orders")
    keys = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    hits = bloom_semi_join(
        orders.withColumnRenamed("o_custkey", "c_custkey"),
        keys,
        "c_custkey",
    )
    return hits.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("sum_price"),
    )


#: HLL++ default relative standard deviation and the audit's pass
#: band: 3 sigma. HLL merge is register-wise max — associative,
#: commutative, partition-order-free — so the flag is deterministic.
HLL_RSD = 0.05
HLL_BOUND = 3 * HLL_RSD


@query(
    "q_hll_audit",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact,
           {HLL_BOUND} AS rel_bound,
           TRUE AS within_bound
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_hll_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct estimator audit: per priority, the EXACT
    distinct-customer count next to a flag asserting the HLL++
    estimate (rsd=0.05) landed within 3 sigma of it — both computed
    in one aggregate pass. The oracle pins the flag TRUE: a drifting
    estimator fails the driver row, not just a dashboard. The
    estimate itself stays out of the hashed columns by design — the
    audit contracts the GUARANTEE (|est-exact|/exact <= 0.15), not
    the estimator's last ulp.
    """
    orders = load(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_exact"),
        F.approx_count_distinct("o_custkey", rsd=HLL_RSD).alias("__est"),
    )
    return agg.select(
        "o_orderpriority",
        "n_exact",
        F.lit(HLL_BOUND).alias("rel_bound"),
        (
            F.abs(F.col("__est") - F.col("n_exact"))
            / F.col("n_exact")
            <= HLL_BOUND
        ).alias("within_bound"),
    )


#: percentile_approx accuracy: GK guarantees the returned element's
#: rank is within N/accuracy of the target rank.
GK_ACCURACY = 1000
QUANTILES = [0.25, 0.5, 0.75]


@query(
    "q_quantile_audit",
    oracle=f"""
    WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM orders)
    SELECT q, n_rows, TRUE AS within_bound
    FROM (SELECT unnest([{", ".join(f"CAST({q} AS DOUBLE)" for q in QUANTILES)}]) AS q), n
    ORDER BY q
    """,
)
def q_quantile_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx estimator audit over o_totalprice: for each
    target quantile, assert the value GK returned has a rank within
    N/accuracy (+1 slack) of q*N. Rank is measured exactly as the
    [count(< v)+1, count(<= v)] interval so ties can't fake a miss,
    and the returned VALUE stays out of the hashed output — GK
    compaction is merge-order-sensitive, so only its guarantee is
    contract, exactly like the HLL audit. One pass computes the
    sketch + N, a second conditional-aggregation pass measures the
    three ranks; nothing collects, nothing sorts globally.
    """
    orders = load(spark, sf_dir, "orders")
    sk = orders.agg(
        F.percentile_approx(
            "o_totalprice", QUANTILES, GK_ACCURACY
        ).alias("__vs"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    j = orders.select("o_totalprice").crossJoin(F.broadcast(sk))
    ranks = j.agg(
        F.first("n_rows").alias("n_rows"),
        *[
            F.sum(
                F.when(F.col("o_totalprice") < F.col("__vs")[i], 1).otherwise(0)
            ).alias(f"__lt{i}")
            for i in range(len(QUANTILES))
        ],
        *[
            F.sum(
                F.when(F.col("o_totalprice") <= F.col("__vs")[i], 1).otherwise(0)
            ).alias(f"__le{i}")
            for i in range(len(QUANTILES))
        ],
    )
    per_q = ranks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("q"),
                        F.col("n_rows"),
                        (F.col(f"__lt{i}") + 1).alias("__rank_lo"),
                        F.col(f"__le{i}").alias("__rank_hi"),
                    )
                    for i, q in enumerate(QUANTILES)
                ]
            )
        ).alias("s")
    ).select("s.*")
    tol = F.col("n_rows") / GK_ACCURACY + 1
    target = F.col("q") * F.col("n_rows")
    return per_q.select(
        "q",
        "n_rows",
        (
            (F.col("__rank_lo") <= target + tol)
            & (F.col("__rank_hi") >= target - tol)
        ).alias("within_bound"),
    ).orderBy("q")
