"""RRF hybrid retrieval: hand-computed fusion arithmetic, rank
sensitivity (moving a doc up one list moves it up the fusion),
dual-presence dominance, the multi-query keyed path, and the
k-bounded plan shape. The full pipeline is oracle-checked as
q_hybrid_topk."""

from __future__ import annotations

from pyspark.sql import functions as F

from football_data_pipeline_spark.operators.hybrid import (
    RRF_C,
    rrf_fuse,
)


def _lists(spark, sparse_pairs, dense_pairs):
    s = spark.createDataFrame(sparse_pairs, "doc_id long, rank long")
    d = spark.createDataFrame(dense_pairs, "doc_id long, rank long")
    return s, d


def _fused(spark, sparse_pairs, dense_pairs, k=10):
    s, d = _lists(spark, sparse_pairs, dense_pairs)
    return {
        r.doc_id: (r.rank, r.sparse_rank, r.dense_rank, r.rrf_score)
        for r in rrf_fuse(s, d, "doc_id", k).collect()
    }


def test_hand_computed_rrf_scores(spark):
    got = _fused(spark, [(1, 1), (2, 2)], [(2, 1), (3, 2)])
    # doc 2: 1/62 + 1/61; doc 1: 1/61; doc 3: 1/62
    assert got[2][0] == 1
    assert abs(got[2][3] - (1 / 62 + 1 / 61)) < 1e-6
    assert got[1][0] == 2 and got[1][2] is None
    assert abs(got[1][3] - 1 / 61) < 1e-6
    assert got[3][0] == 3 and got[3][1] is None
    assert abs(got[3][3] - 1 / 62) < 1e-6


def test_dual_presence_beats_single_list_top(spark):
    """A doc ranked moderately in BOTH lists outranks the doc each
    list puts first (the whole point of fusion)."""
    got = _fused(
        spark,
        [(10, 1), (99, 2), (11, 3)],
        [(20, 1), (99, 2), (21, 3)],
    )
    assert got[99][0] == 1  # 2/(C+2) > 1/(C+1)


def test_rank_sensitivity(spark):
    """Swapping two docs' ranks within ONE list must swap their
    fused order when the other list is indifferent to both."""
    base = _fused(spark, [(1, 1), (2, 2)], [(3, 1)])
    swapped = _fused(spark, [(1, 2), (2, 1)], [(3, 1)])
    assert base[1][0] < base[2][0]
    assert swapped[2][0] < swapped[1][0]


def test_tie_breaks_on_doc_id(spark):
    got = _fused(spark, [(7, 1), (5, 2)], [(5, 1), (7, 2)])
    # both docs score 1/(C+1)+1/(C+2): tie → doc_id asc
    assert got[5][0] == 1 and got[7][0] == 2


def test_multi_query_keyed_fusion(spark):
    s = spark.createDataFrame(
        [("a", 1, 1), ("a", 2, 2), ("b", 3, 1)],
        "query_id string, doc_id long, rank long",
    )
    d = spark.createDataFrame(
        [("a", 2, 1), ("b", 4, 1)],
        "query_id string, doc_id long, rank long",
    )
    rows = rrf_fuse(s, d, "doc_id", 10, by=["query_id"]).collect()
    got = {(r.query_id, r.doc_id): r.rank for r in rows}
    # per-query ranks restart at 1; queries never cross-pollinate
    assert got[("a", 2)] == 1 and got[("a", 1)] == 2
    assert got[("b", 3)] == 1 and got[("b", 4)] == 2
    assert ("b", 2) not in got


def test_single_query_plan_is_take_ordered(spark):
    s, d = _lists(spark, [(1, 1)], [(2, 1)])
    plan = rrf_fuse(s, d, "doc_id", 5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # k-bounded cut before the rank window


def test_c_constant_is_the_published_default(spark):
    assert RRF_C == 60


def test_fuses_real_ivf_dense_lists_per_query(spark):
    """The scale path end-to-end: the IVF cluster-pruned ANN top-k
    (q_knn_ivf's pass) as the dense side of a keyed multi-query
    fusion — rrf_fuse only reads (id, rank), so ANY ANN variant
    (brute, IVF, IVF-PQ) slots in."""
    from football_data_pipeline_spark.operators.embedsearch import (
        N_QUERIES,
        q_knn_ivf,
    )

    dense = q_knn_ivf(spark, "/root/testdata/sf0.001").select(
        "query_id", F.col("neighbor_id").alias("doc_id"), F.col("rank").cast("long").alias("rank")
    )
    # a sparse list sharing SOME docs with each query's dense list
    # (the dense rank-1 doc) plus one doc of its own
    top1 = dense.filter(F.col("rank") == 1).select(
        "query_id", "doc_id", F.lit(2).cast("long").alias("rank")
    )
    own = top1.select(
        "query_id", (F.col("doc_id") + 100000).alias("doc_id"),
        F.lit(1).cast("long").alias("rank"),
    )
    sparse = top1.unionByName(own)
    fused = rrf_fuse(sparse, dense, "doc_id", 5, by=["query_id"]).collect()
    by_q = {}
    for r in fused:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(range(N_QUERIES))
    for qid, rows in by_q.items():
        ranks = sorted(r.rank for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        # the dual-presence doc (dense #1 + sparse #2) wins the fusion
        winner = min(rows, key=lambda r: r.rank)
        assert winner.sparse_rank == 2 and winner.dense_rank == 1
