"""Training-data mining operators (r7): hard-negative mining,
learnability/context-gain curriculum, diversity quota sampling.
Oracle parity for all three rides the all-queries gate
(test_queries_oracle.py); these tests pin the SEMANTICS on crafted
data where the right answer is known by construction.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from football_data_pipeline_spark.operators.embedsearch import DIMS, N_QUERIES
from football_data_pipeline_spark.operators.ivfpq import COARSE_K
from football_data_pipeline_spark.operators.mining import (
    DIVERSE_PER_CELL,
    HARD_NEG_K,
    q_diverse_sample,
    q_hard_negatives,
    q_learnability,
)


def _unit(axis: int, scale: float = 1.0) -> list[float]:
    v = [0.0] * DIMS
    v[axis] = scale
    return v


def _blend(a: int, b: int, wa: float, wb: float) -> list[float]:
    v = [0.0] * DIMS
    v[a], v[b] = wa, wb
    return v


@pytest.fixture(scope="module")
def mining_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mining") / "sf")
    rows = []
    # anchors: axis-aligned, one per axis, label 0 (ids 0..N_QUERIES-1)
    for i in range(N_QUERIES):
        rows.append((i, _unit(i), 0))
    # for anchor 0: a same-label near-copy (must NOT be a negative)
    # and two wrong-label vectors at known cosines 0.8 > 0.6
    rows.append((100, _blend(0, 30, 0.99, 0.14), 0))
    rows.append((101, _blend(0, 31, 0.8, 0.6), 1))  # cos 0.8 to anchor 0
    rows.append((102, _blend(0, 32, 0.6, 0.8), 1))  # cos 0.6 to anchor 0
    # wrong-label filler, far from every anchor
    for j in range(40):
        rows.append((200 + j, _unit(40 + j % 20, 1.0 + j), 2))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.write.mode("overwrite").parquet(f"{path}/embeddings.parquet")
    return path


def test_hard_negatives_semantics(spark, mining_dir):
    out = q_hard_negatives(spark, mining_dir).collect()
    by_anchor = {}
    for r in out:
        by_anchor.setdefault(r.anchor_id, []).append(r)
    assert set(by_anchor) == set(range(N_QUERIES))
    for rows in by_anchor.values():
        assert len(rows) == HARD_NEG_K
        assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == list(
            range(1, HARD_NEG_K + 1)
        )
        # negatives never share the anchor's label
        assert all(r.negative_label != r.anchor_label for r in rows)
        # ranked by similarity, descending
        srt = sorted(rows, key=lambda r: r.rank)
        assert all(
            srt[i].cosine_sim >= srt[i + 1].cosine_sim for i in range(len(srt) - 1)
        )
    # anchor 0: the same-label near-copy (id 100, cos .99) is EXCLUDED;
    # the known wrong-label vectors rank by their cosines 0.8 > 0.6
    a0 = sorted(by_anchor[0], key=lambda r: r.rank)
    assert [r.negative_id for r in a0[:2]] == [101, 102]
    assert 100 not in {r.negative_id for r in a0}
    assert a0[0].cosine_sim == pytest.approx(0.8, abs=1e-6)
    assert a0[1].cosine_sim == pytest.approx(0.6, abs=1e-6)


def test_learnability_orders_structure_above_noise(spark, tmp_path):
    """A document made of one repeated bigram chain has maximal
    context gain (every transition is near-deterministic given w1);
    a document using the SAME tokens as an unordered soup where each
    w1 precedes many different w2s gains far less. The unigram side
    is identical for both (same token multiset), so the gap isolates
    the bigram signal."""
    path = str(tmp_path / "sf")
    words = [f"w{i}" for i in range(8)]
    structured = " ".join(words * 6)  # w0 w1 .. w7 w0 w1 ... fixed chain
    # soup: every token followed by a DIFFERENT successor each time
    soup_tokens = []
    for k in range(6):
        soup_tokens += [words[(i * (k + 2) + k) % 8] for i in range(8)]
    soup = " ".join(soup_tokens)
    spark.createDataFrame(
        [(1, structured), (2, soup)], "doc_id long, text string"
    ).write.mode("overwrite").parquet(f"{path}/documents.parquet")
    out = {r.doc_id: r for r in q_learnability(spark, path).collect()}
    assert set(out) == {1, 2}
    assert out[1].context_gain > out[2].context_gain
    assert out[1].n_bigrams == 47 and out[2].n_bigrams == 47
    # gain = bi - uni by definition (stable-rounded)
    for r in out.values():
        assert r.context_gain == pytest.approx(
            round(r.bi_logp - r.uni_logp, 4), abs=1e-9
        )


def test_diverse_sample_covers_every_cell(spark, mining_dir):
    out = q_diverse_sample(spark, mining_dir).collect()
    emb_n = spark.read.parquet(f"{mining_dir}/embeddings.parquet").count()
    cells = {}
    for r in out:
        cells.setdefault(r.cell, []).append(r)
    # population accounting closes over the whole corpus
    assert sum(rows[0].n_members for rows in cells.values()) == emb_n
    for cell, rows in cells.items():
        assert 0 <= cell < COARSE_K
        assert len(rows) == min(rows[0].n_members, DIVERSE_PER_CELL)
        srt = sorted(rows, key=lambda r: r.rank)
        assert [r.rank for r in srt] == list(range(1, len(rows) + 1))
        # rank 1 is the most central member reported
        assert all(
            srt[i].center_d2 <= srt[i + 1].center_d2 for i in range(len(srt) - 1)
        )
    # the quota bounds the output: at most DIVERSE_PER_CELL per cell
    assert all(len(rows) <= DIVERSE_PER_CELL for rows in cells.values())
