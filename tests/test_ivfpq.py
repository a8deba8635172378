"""Composed IVF-PQ path: routing must actually restrict candidates
to the query's coarse cell (a cross-cell exact neighbor is MISSED —
that's routing loss, the thing the recall number measures), and a
same-cell identical vector must be found at rank 1."""

from __future__ import annotations

import pytest

from football_data_pipeline_spark.operators.embedsearch import DIMS, N_QUERIES
from football_data_pipeline_spark.operators.ivfpq import q_knn_ivfpq
from football_data_pipeline_spark.operators.semdedup import PQ_K


def _vec(seed: float):
    # PQ_K codebook rows (vec_id < PQ_K) must exist; keep vectors
    # spread so codes differ
    return [float((seed * (i + 3)) % 7) for i in range(DIMS)]


@pytest.fixture(scope="module")
def crafted_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivfpq") / "sf")
    rows = []
    # codebook donors + queries: ids 0..15 in cell 0 (N_QUERIES=10 of
    # them are queries)
    for i in range(PQ_K):
        rows.append((i, _vec(i + 1), 0))
    # same-cell EXACT COPY of query 3 -> must be its rank-1 ADC hit
    rows.append((100, _vec(4), 0))
    # cross-cell exact copies of every query -> exact top-k includes
    # them, routing must miss them
    for i in range(N_QUERIES):
        rows.append((200 + i, _vec(i + 1), 1))
    # filler in both cells
    for i in range(40):
        rows.append((300 + i, _vec(100 + 13 * i), i % 2))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.write.mode("overwrite").parquet(f"{path}/embeddings.parquet")
    return path


def test_routing_misses_cross_cell_and_hits_same_cell(spark, crafted_dir):
    out = {r.query_id: r for r in q_knn_ivfpq(spark, crafted_dir).collect()}
    assert set(out) == set(range(N_QUERIES))
    # query 3's exact duplicate lives in BOTH cells (id 100 same
    # cell, id 203 cross cell); the same-cell one is reachable so
    # query 3 must overlap at least once
    assert out[3].n_overlap >= 1
    # recall can never be perfect here: each query's cross-cell
    # exact copy is unreachable by construction
    assert all(r.recall_at_k < 1.0 for r in out.values())
    # and the composed path still returns a full report row per query
    assert all(0.0 <= r.recall_at_k <= 1.0 for r in out.values())
