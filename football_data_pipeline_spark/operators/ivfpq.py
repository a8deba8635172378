"""IVF-PQ composed query path — the production ANN pipeline
assembled from the engine's measured building blocks, with its
end-to-end recall pinned by the driver oracle.

The pieces exist and are individually audited: IVF routing
(embedsearch.q_knn_ivf restricts candidates to the query's coarse
cell; its routing loss is measured by q_knn_recall at 0.87-0.97),
PQ encoding (semdedup.pq_encode, 4-bit codes via packed-BIGINT
argmin) and ADC scoring (q_pq_recall's fixed-point lookup-table
distance, exact integer arithmetic). This module composes them the
way a real index answers a query:

    route:  candidates = vectors in the query's coarse cell
    score:  ADC — per-query LUT of subvector->codeword distances,
            summed over each candidate's M codes (table lookups,
            never the full vectors)
    rank:   top-k per query, fixed-point ints, id tie-break

and reports recall@k against the exact full-corpus L2 top-k — the
number an index owner actually tunes (routing loss x quantization
loss together). Expected values are LOW with the deterministic
training-free codebook (see q_pq_recall's docstring: 16 arbitrary
codewords coarsely quantize random subvectors) — honestly measured,
and the reason the query exists: swap in k-means centroids
(q_ivf_centroids) and nprobe>1 routing and THIS number tells you
what it bought.

Scale shape: the only full-width vector work is the per-query LUT
(queries x M x K rows — PQ's whole point) and the one-off encode;
ADC touches only (cell-candidate, code) id-sized rows in one hash
aggregate; the exact-L2 side is the audit baseline, not the serving
path. Reference tie-in: the reference has no vector search; this is
the engine's extension family (SURVEY §2 scale extensions), sized
for an embedding column at 100 TB where candidates-per-cell, M and
K are the only knobs that matter.

10x probe (sf0.1 embeddings replicated 10x, labels re-spread so the
cell count grows with the corpus and expected cell size stays
constant; medians of 3): 0.86 -> 2.34 s. The growth is the audit's
exact-L2 baseline (brute force is 10x more work by construction, as
q_semantic_decontam's probe note documents); the serving path
(route+ADC) is linear in cell size and sub-linear here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.stable import rnd
from ..registry import query
from .embedsearch import N_QUERIES, TOP_K
from .semdedup import PQ_K, PQ_M, PQ_PACK_SCALE, PQ_SUB, pq_encode


def _subvectors() -> Column:
    """Mirrors pq_encode's canonical subvector slicing
    (semdedup.py pq_encode) — needed here only for the per-QUERY
    lookup table; the candidate codes come from pq_encode itself."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(PQ_M - 1)),
        lambda m: F.slice(F.col("embedding"), m * PQ_SUB + 1, PQ_SUB),
    )


def _d2(a: Column | str, b: Column | str) -> Column:
    """Squared-L2 fold, the same expression pq_encode packs — kept
    textually identical so the LUT distances and the encoder's
    argmin distances share one definition of 'distance'."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _ivfpq_oracle() -> str:
    sub_slice = "list_slice({v}, m * {s} + 1, m * {s} + {s})"
    d2 = (
        f"list_sum(list_transform(range(1, {PQ_SUB} + 1), "
        "i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
        " * (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))))"
    )
    full_d2 = (
        f"list_sum(list_transform(range(1, {PQ_SUB * PQ_M} + 1), "
        "i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
        " * (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))))"
    )
    return f"""
    WITH ms AS (SELECT unnest(range(0, {PQ_M})) AS m),
    sub AS (
      SELECT vec_id, label, m,
             {sub_slice.format(v='embedding', s=PQ_SUB)} AS vs
      FROM embeddings CROSS JOIN ms
    ),
    cb AS (
      SELECT vec_id AS code, m,
             {sub_slice.format(v='embedding', s=PQ_SUB)} AS cs
      FROM embeddings CROSS JOIN ms WHERE vec_id < {PQ_K}
    ),
    codes AS (
      SELECT s.vec_id, any_value(s.label) AS label, s.m,
             CAST(min(CAST(floor({d2.format(a='s.vs', b='c.cs')}
                   * {PQ_PACK_SCALE} + 0.5) AS BIGINT) * {PQ_K} + c.code)
                  % {PQ_K} AS BIGINT) AS code
      FROM sub s JOIN cb c ON c.m = s.m
      GROUP BY s.vec_id, s.m
    ),
    q AS (
      SELECT vec_id AS q_id, label AS q_label, m, vs AS qs
      FROM sub WHERE vec_id < {N_QUERIES}
    ),
    lut AS (
      SELECT q.q_id, q.q_label, c.m, c.code,
             CAST(floor({d2.format(a='q.qs', b='c.cs')}
                  * {PQ_PACK_SCALE} + 0.5) AS BIGINT) AS d2_fp
      FROM q JOIN cb c ON c.m = q.m
    ),
    adc AS (
      SELECT l.q_id, k.vec_id,
             CAST(sum(l.d2_fp) AS BIGINT) AS dist_fp
      FROM codes k
      JOIN lut l ON l.m = k.m AND l.code = k.code
                AND l.q_label = k.label
      WHERE k.vec_id <> l.q_id
      GROUP BY l.q_id, k.vec_id
    ),
    adc_top AS (
      SELECT q_id, vec_id,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY dist_fp ASC, vec_id ASC) AS rn
      FROM adc
    ),
    exact AS (
      SELECT a.vec_id AS q_id, b.vec_id,
             row_number() OVER (PARTITION BY a.vec_id
               ORDER BY {full_d2.format(a='a.embedding', b='b.embedding')} ASC,
                        b.vec_id ASC) AS rn
      FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
      WHERE a.vec_id < {N_QUERIES}
    )
    SELECT e.q_id AS query_id,
           CAST(count(a.vec_id) AS BIGINT) AS n_overlap,
           floor((count(a.vec_id) * 1.0 / {TOP_K}) * 10000 + 0.5) / 10000
             AS recall_at_k
    FROM (SELECT * FROM exact WHERE rn <= {TOP_K}) e
    LEFT JOIN (SELECT * FROM adc_top WHERE rn <= {TOP_K}) a
      ON a.q_id = e.q_id AND a.vec_id = e.vec_id
    GROUP BY e.q_id
    """


@query("q_knn_ivfpq", oracle=_ivfpq_oracle())
def q_knn_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end IVF-PQ recall@k per query: route to the query's
    coarse cell, score candidates by fixed-point ADC over their PQ
    codes, rank top-k, compare against exact full-corpus L2 — the
    composed serving path's quality number (routing loss and
    quantization loss together). See the module docstring for the
    composition and scale argument.
    """
    emb = load(spark, sf_dir, "embeddings")
    # candidate codes come from THE encoder (semdedup.pq_encode), not
    # a re-implementation, so this audit always measures the encoder
    # q_pq_encode ships; the coarse-cell label rides back in on a
    # vec_id equi-join (co-keyed with the encode output's own grain)
    codes = (
        pq_encode(emb)
        .select("vec_id", F.col("sub_idx").alias("m"), "code")
        .join(emb.select("vec_id", "label"), "vec_id")
    )
    cb = (
        emb.filter(F.col("vec_id") < PQ_K)
        .select(F.col("vec_id").alias("code"), F.posexplode(_subvectors()).alias("m", "cs"))
    )
    fp = lambda c: F.floor(c * PQ_PACK_SCALE + F.lit(0.5)).cast("long")  # noqa: E731
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.posexplode(_subvectors()).alias("m", "qs"),
    )
    lut = q.join(F.broadcast(cb), "m").select(
        "q_id",
        "q_label",
        "m",
        "code",
        fp(_d2(F.col("qs"), F.col("cs"))).alias("d2_fp"),
    )
    adc = (
        codes.join(
            F.broadcast(lut),
            (codes.m == lut.m)
            & (codes.code == lut.code)
            & (codes.label == lut.q_label),
        )
        .filter(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", "vec_id")
        .agg(F.sum("d2_fp").cast("long").alias("dist_fp"))
    )
    w_adc = Window.partitionBy("q_id").orderBy(F.asc("dist_fp"), F.asc("vec_id"))
    adc_top = (
        adc.withColumn("rn", F.row_number().over(w_adc))
        .filter(F.col("rn") <= TOP_K)
        .select("q_id", "vec_id", F.lit(1).alias("__hit"))
    )
    qfull = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    w_ex = Window.partitionBy("q_id").orderBy(F.asc("__d2"), F.asc("vec_id"))
    exact_top = (
        emb.join(F.broadcast(qfull), F.col("vec_id") != F.col("q_id"))
        .withColumn("__d2", _d2(F.col("q_emb"), F.col("embedding")))
        .withColumn("rn", F.row_number().over(w_ex))
        .filter(F.col("rn") <= TOP_K)
        .select("q_id", "vec_id")
    )
    return (
        exact_top.join(adc_top, ["q_id", "vec_id"], "left")
        .groupBy(F.col("q_id").alias("query_id"))
        .agg(
            F.count("__hit").cast("long").alias("n_overlap"),
            rnd(F.count("__hit") * 1.0 / TOP_K, 4).alias("recall_at_k"),
        )
    )
