"""Hybrid retrieval — reciprocal-rank fusion (RRF) of the engine's
sparse (BM25, operators/retrieval.py) and dense (cosine ANN,
operators/embedsearch.py / ivfpq.py) top-k lists: the operator a
RAG serving stack runs on every query (VERDICT r10 "What's missing"
item 2). Reference parity: none — the reference's search surface is
a LIKE lookup (discord_integration.py:147-151, covered by
q_team_search); this is the LLM-data-pipeline extension.

RRF (Cormack, Clarke & Buettcher, SIGIR 2009):

    rrf(d) = Σ_lists 1 / (C + rank_list(d)),   C = 60

— rank-only fusion, so the two lists' incomparable score scales
(BM25 sums vs cosine) never need calibration. A doc absent from a
list contributes 0 for that list.

Scale shape: each input list is already top-k (k-bounded by its own
retrieval pass — BM25's TakeOrdered cut, ANN's per-query window),
so the fusion is a FULL OUTER join of two ≤k-row frames + one rank
over ≤2k rows — metadata-sized per query, independent of corpus
size. For a multi-query batch, ``rrf_fuse(by=["query_id"])`` keys
the join and the rank window on the query — per-query work, linear
in query count, never corpus-sized.

Float discipline: 1/(C+rank) is one IEEE double division on either
engine; the two terms add in a FIXED textual order (sparse + dense,
coalesce-0 for absences) and the sum stable-rounds to 6 dp — no
data-dependent summation order anywhere.

10x probe (documents+embeddings replicated 10x; medians of 3):
q_hybrid_topk 1.75 -> 3.33 s — the cost is the two underlying
retrieval passes (both sub-linear); the fusion itself is k-bounded
constant work at any corpus size. r12, same probe: q_hybrid_batch
2.95 -> 3.96 s — the batch BM25 pass and the IVF cell probes both
grow sub-linearly (replicated labels make each coarse cell 10x
heavier, the honest degradation axis) and the keyed fusion stays
rank-list-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..functions.stable import oracle_rnd, rnd
from ..registry import query
from .embedsearch import _oracle_dot, _oracle_norm, dot, norm
from .retrieval import (
    BATCH_QUERIES,
    QUERY_TERMS,
    bm25_batch_ctes,
    bm25_scored_ctes,
    bm25_topk,
    bm25_topk_batch,
)

#: RRF smoothing constant (the SIGIR'09 paper's value; large enough
#: that rank-1-vs-2 doesn't dominate, small enough that tail ranks
#: still separate)
RRF_C = 60
#: depth of each input list and of the fused output
K_EACH = 20
TOP_K = 15
#: the driver query's dense half: the corpus embedding standing in
#: for the encoded query text (vec_id/doc_id share one id space)
QUERY_VEC_ID = 0


def rrf_fuse(
    sparse: DataFrame,
    dense: DataFrame,
    id_col: str = "doc_id",
    k: int = TOP_K,
    c: int = RRF_C,
    by: list[str] | None = None,
) -> DataFrame:
    """Fuse two ranked lists — frames carrying (``id_col``,
    ``rank``) [+ the ``by`` keys for a multi-query batch] — into the
    RRF top-``k``: (rank, id, sparse_rank, dense_rank, rrf_score),
    ties on (score desc, id asc). Inputs are each ≤k' rows per
    query by construction; the join is full-outer so a doc surfaced
    by only one retriever still fuses."""
    by = list(by or [])
    keys = by + [id_col]
    s = sparse.select(*keys, F.col("rank").alias("sparse_rank"))
    d = dense.select(*keys, F.col("rank").alias("dense_rank"))
    fused = s.join(d, keys, "full_outer").withColumn(
        "rrf_score",
        rnd(
            F.coalesce(F.lit(1.0) / (F.lit(c) + F.col("sparse_rank")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(c) + F.col("dense_rank")), F.lit(0.0)),
            6,
        ),
    )
    order = [F.desc("rrf_score"), F.asc(id_col)]
    if by:
        w = Window.partitionBy(*by).orderBy(*order)
        return (
            fused.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select(*by, "rank", id_col, "sparse_rank", "dense_rank", "rrf_score")
        )
    # single query: cut with orderBy+limit FIRST (TakeOrdered — the
    # retrieval.py/profiling.py discipline), then rank the ≤k
    # survivors; the window never sees more than k rows
    topk = fused.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return topk.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", id_col, "sparse_rank", "dense_rank", "rrf_score"
    )


def dense_topk(
    emb: DataFrame, query_vec_id: int, k: int = K_EACH
) -> DataFrame:
    """Exact cosine top-k for one query embedding drawn from the
    corpus (excluded from its own result): (rank, doc_id, sim).
    Brute-force is the oracle-checkable baseline; swap in
    ivfpq.knn_ivfpq for the NPROBE-bounded scale path — rrf_fuse
    only reads (doc_id, rank)."""
    e = emb.select(
        F.col("vec_id"), F.col("embedding"), norm(F.col("embedding")).alias("nrm")
    )
    q = e.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_emb"), F.col("nrm").alias("q_nrm")
    )
    scored = (
        e.filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            (dot(F.col("q_emb"), F.col("embedding")) / (F.col("q_nrm") * F.col("nrm"))).alias(
                "sim"
            ),
        )
    )
    topk = scored.orderBy(F.desc("sim"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("sim"), F.asc("doc_id"))
    return topk.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "doc_id", rnd(F.col("sim"), 6).alias("sim")
    )


def _oracle() -> str:
    rrf = oracle_rnd(
        f"coalesce(1.0 / ({RRF_C} + s.rnk), 0.0) + "
        f"coalesce(1.0 / ({RRF_C} + d.rnk), 0.0)",
        6,
    )
    return f"""
    WITH {bm25_scored_ctes()},
    sparse AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC)
               AS BIGINT) AS rnk
      FROM scored
      ORDER BY rnk LIMIT {K_EACH}
    ),
    e AS (
      SELECT vec_id, embedding, {_oracle_norm('embedding')} AS nrm
      FROM embeddings
    ),
    qv AS (SELECT embedding, nrm FROM e WHERE vec_id = {QUERY_VEC_ID}),
    dscored AS (
      SELECT c.vec_id AS doc_id,
             {_oracle_dot('qv.embedding', 'c.embedding')} / (qv.nrm * c.nrm)
               AS sim
      FROM e c CROSS JOIN qv
      WHERE c.vec_id <> {QUERY_VEC_ID}
    ),
    dense AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY sim DESC, doc_id ASC)
               AS BIGINT) AS rnk
      FROM dscored
      ORDER BY rnk LIMIT {K_EACH}
    ),
    fused AS (
      SELECT coalesce(s.doc_id, d.doc_id) AS doc_id,
             s.rnk AS sparse_rank,
             d.rnk AS dense_rank,
             {rrf} AS rrf_score
      FROM sparse s FULL OUTER JOIN dense d ON s.doc_id = d.doc_id
    )
    SELECT CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id ASC)
             AS BIGINT) AS rank,
           doc_id, sparse_rank, dense_rank, rrf_score
    FROM fused
    ORDER BY rank
    LIMIT {TOP_K}
    """


def _batch_hybrid_oracle() -> str:
    from .embedsearch import TOP_K as EMB_TOP_K
    from .embedsearch import _knn_ivf_oracle

    rrf = oracle_rnd(
        f"coalesce(1.0 / ({RRF_C} + s.rnk), 0.0) + "
        f"coalesce(1.0 / ({RRF_C} + d.rnk), 0.0)",
        6,
    )
    return f"""
    WITH {bm25_scored_ctes()},
    {bm25_batch_ctes()},
    sranked AS (
      SELECT query_id, doc_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id ASC) AS rn
      FROM qscored
    ),
    sparse AS (
      SELECT query_id, doc_id, CAST(rn AS BIGINT) AS rnk
      FROM sranked WHERE rn <= {K_EACH}
    ),
    dense AS (
      -- the REAL IVF routing, recomputed: q_knn_ivf's oracle body
      -- (cluster-pruned candidates, per-query rank, cut {EMB_TOP_K})
      -- restricted to the batch's query ids
      SELECT CAST(query_id AS BIGINT) AS query_id,
             neighbor_id AS doc_id,
             CAST(rank AS BIGINT) AS rnk
      FROM ({_knn_ivf_oracle()})
      WHERE query_id < {len(BATCH_QUERIES)}
    ),
    fused AS (
      SELECT coalesce(s.query_id, d.query_id) AS query_id,
             coalesce(s.doc_id, d.doc_id) AS doc_id,
             s.rnk AS sparse_rank,
             d.rnk AS dense_rank,
             {rrf} AS rrf_score
      FROM sparse s FULL OUTER JOIN dense d
        ON s.query_id = d.query_id AND s.doc_id = d.doc_id
    ),
    franked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY rrf_score DESC, doc_id ASC) AS rn
      FROM fused
    )
    SELECT query_id, CAST(rn AS BIGINT) AS rank, doc_id,
           sparse_rank, dense_rank, rrf_score
    FROM franked WHERE rn <= {TOP_K}
    """


@query("q_hybrid_batch", oracle=_batch_hybrid_oracle())
def q_hybrid_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SERVING-PATH hybrid a RAG service actually runs (VERDICT
    r11 item 6): multi-query batch BM25 (one shared corpus pass, cut
    {K_EACH} per query) fused per-query with the IVF cluster-pruned
    ANN lists (embedsearch.q_knn_ivf's pass — vec 0/1/2 stand in for
    the three batch queries' encodings) via
    ``rrf_fuse(by=["query_id"])``. The oracle recomputes BOTH sides
    — the shared BM25 batch CTE chain AND the IVF routing — plus the
    keyed fusion arithmetic. List depths differ (sparse {K_EACH},
    dense = the IVF serve cut) exactly as they would in production;
    rrf_fuse only reads (id, rank), so depth asymmetry is the normal
    case, not a special one."""
    from .embedsearch import q_knn_ivf

    docs = load(spark, sf_dir, "documents")
    emb_queries = spark.createDataFrame(
        [(qid, list(terms)) for qid, terms in BATCH_QUERIES],
        "query_id long, terms array<string>",
    )
    sparse = bm25_topk_batch(docs, emb_queries, K_EACH).select(
        "query_id", "doc_id", "rank"
    )
    dense = (
        q_knn_ivf(spark, sf_dir)
        .filter(F.col("query_id") < len(BATCH_QUERIES))
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("neighbor_id").alias("doc_id"),
            F.col("rank").cast("long").alias("rank"),
        )
    )
    return rrf_fuse(sparse, dense, "doc_id", TOP_K, RRF_C, by=["query_id"])


@query("q_hybrid_topk", oracle=_oracle())
def q_hybrid_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RRF hybrid top-{k}: BM25 over documents (the fixed four-term
    driver query) fused with exact cosine top-k over embeddings
    (query = vec 0, the corpus stand-in for the encoded query),
    C=60, both lists cut at {K_EACH}. The oracle recomputes BOTH
    rankings (shared BM25 CTE chain, the embedsearch fold-ordered
    dot product) and the fusion arithmetic term-for-term."""
    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    sparse = bm25_topk(docs, list(QUERY_TERMS), K_EACH)
    dense = dense_topk(emb, QUERY_VEC_ID, K_EACH)
    return rrf_fuse(sparse, dense, "doc_id", TOP_K, RRF_C)
