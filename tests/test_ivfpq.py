"""Trained IVF-PQ + refine path invariants.

Since round 6 the cells are TRAINED (full-width k-means), not the
external label column — so an exact copy of a query is always
routed to the query's own cell (identical vectors share a trained
cell by construction) and, being at distance 0, must survive the
ADC shortlist and exact re-rank at rank 1. The label column is
deliberately set to DISAGREE between copies here: finding the copy
anyway is precisely the round-6 improvement (label-cell routing
missed 84-92% of true neighbors on the driver's own data — module
docstring).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from football_data_pipeline_spark.operators.embedsearch import DIMS, N_QUERIES
from football_data_pipeline_spark.operators.ivfpq import (
    COARSE_K,
    NPROBE,
    _assign,
    q_knn_ivfpq,
    train_codebook,
)
from football_data_pipeline_spark.operators.semdedup import PQ_K


def _vec(seed: float):
    # COARSE_K seed rows (vec_id < COARSE_K) must exist; keep vectors
    # spread so codes differ
    return [float((seed * (i + 3)) % 7) for i in range(DIMS)]


@pytest.fixture(scope="module")
def crafted_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivfpq") / "sf")
    rows = []
    # codebook/cell seed donors + queries: ids 0..max(PQ_K, COARSE_K)-1
    for i in range(max(PQ_K, COARSE_K)):
        rows.append((i, _vec(i + 1), 0))
    # exact copies of every query under a DIFFERENT label — trained
    # cells must route to them anyway
    for i in range(N_QUERIES):
        rows.append((200 + i, _vec(i + 1), 1))
    # filler in both labels
    for i in range(40):
        rows.append((300 + i, _vec(100 + 13 * i), i % 2))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.write.mode("overwrite").parquet(f"{path}/embeddings.parquet")
    return path


def test_exact_copies_found_despite_label_disagreement(spark, crafted_dir):
    out = {r.query_id: r for r in q_knn_ivfpq(spark, crafted_dir).collect()}
    assert set(out) == set(range(N_QUERIES))
    # every query has an exact copy at distance 0 in the OTHER label;
    # trained cells + refine must find it (label-routing could not)
    assert all(r.n_overlap >= 1 for r in out.values())
    assert all(0.0 <= r.recall_at_k <= 1.0 for r in out.values())


def test_trained_cells_put_identical_vectors_together(spark, crafted_dir):
    emb = spark.read.parquet(f"{crafted_dir}/embeddings.parquet")
    fullv = emb.select(
        "vec_id", F.lit(0).alias("m"), F.col("embedding").alias("vs")
    )
    cb = train_codebook(fullv, COARSE_K)
    # codebook stays bounded: at most COARSE_K codewords for m=0
    assert cb.count() <= COARSE_K
    cells = _assign(fullv, cb, COARSE_K).select(
        "vec_id", F.col("code").alias("cell")
    )
    got = {r.vec_id: r.cell for r in cells.collect()}
    # identical vectors -> identical trained cell, labels be damned
    for i in range(N_QUERIES):
        assert got[i] == got[200 + i]
    # every vector got exactly one cell in [0, COARSE_K)
    assert all(0 <= c < COARSE_K for c in got.values())
    assert len(got) == emb.count()


def test_assign_is_deterministic_across_runs(spark, crafted_dir):
    emb = spark.read.parquet(f"{crafted_dir}/embeddings.parquet")
    fullv = emb.select(
        "vec_id", F.lit(0).alias("m"), F.col("embedding").alias("vs")
    ).repartition(7)
    a = sorted(
        (r.vec_id, r.code)
        for r in _assign(fullv, train_codebook(fullv, COARSE_K), COARSE_K).collect()
    )
    b = sorted(
        (r.vec_id, r.code)
        for r in _assign(
            fullv.repartition(3), train_codebook(fullv.repartition(3), COARSE_K), COARSE_K
        ).collect()
    )
    assert a == b


def test_probe_count_is_nprobe():
    assert 1 <= NPROBE <= COARSE_K


def test_sample_limit_bounds_training_and_validates(spark, crafted_dir):
    """VERDICT r6 item 4: sample_limit must make training see ONLY
    the vec_id prefix (codebook identical to pre-filtered input),
    and reject bounds smaller than k."""
    emb = spark.read.parquet(f"{crafted_dir}/embeddings.parquet")
    fullv = emb.select(
        "vec_id", F.lit(0).alias("m"), F.col("embedding").alias("vs")
    )
    bounded = train_codebook(fullv, COARSE_K, sample_limit=250)
    prefiltered = train_codebook(
        fullv.filter(F.col("vec_id") < 250), COARSE_K
    )
    key = lambda r: (r.m, r.code, tuple(r.cs))  # noqa: E731
    assert sorted(map(key, bounded.collect())) == sorted(
        map(key, prefiltered.collect())
    )
    # the bound is real: an extreme outlier PAST the bound must not
    # move any codeword, while including it must
    outlier = spark.createDataFrame(
        [(400, 0, [1e3] * DIMS)], "vec_id long, m int, vs array<double>"
    )
    with_outlier = fullv.select(
        "vec_id", "m", F.col("vs").cast("array<double>").alias("vs")
    ).unionByName(outlier)
    still_bounded = train_codebook(with_outlier, COARSE_K, sample_limit=250)
    assert sorted(map(key, still_bounded.collect())) == sorted(
        map(key, bounded.collect())
    )
    poisoned = train_codebook(with_outlier, COARSE_K)
    assert sorted(map(key, poisoned.collect())) != sorted(
        map(key, bounded.collect())
    )
    with pytest.raises(ValueError, match="sample_limit"):
        train_codebook(fullv, COARSE_K, sample_limit=COARSE_K - 1)


def test_ivfpq_serving_plan_shape(spark):
    """Plan-shape lock (VERDICT r6 item 7): the ivfpq pipeline must
    never plan a CartesianProduct (its only cross joins broadcast
    the tiny codebook/query sides) and every window must be
    partitioned (per-q_id rankings), never global."""
    import re

    import football_data_pipeline_spark.all_queries  # noqa: F401
    from football_data_pipeline_spark.registry import QUERIES

    from .conftest import SF_DIR

    plan = (
        QUERIES["q_knn_ivfpq"]
        .fn(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    # global window detection (tools/gen_plans_md.py rule): one
    # `], [` separator with an ASC/DESC ordering in the final group
    global_windows = [
        l
        for l in plan.split("\n")
        if "Window [" in l
        and l.rstrip().endswith("]")
        and l.count("], [") == 1
        and re.search(r"(ASC|DESC)[^\[]*\]$", l.rstrip())
    ]
    assert not global_windows, global_windows


def test_sampled_training_recall_holds_at_driver_scale(spark):
    """VERDICT r6 item 4 'recall holds': the TRAIN_SAMPLE-bounded
    query keeps mean recall@5 >= 0.8 at the driver's exact scale
    (sf0.01; full-corpus training measured 0.86, the bound costs
    0.04 — constant sweep in the module docstring)."""
    out = q_knn_ivfpq(spark, "/root/testdata/sf0.01").collect()
    assert len(out) == N_QUERIES
    mean_recall = sum(r.recall_at_k for r in out) / len(out)
    assert mean_recall >= 0.8, mean_recall
