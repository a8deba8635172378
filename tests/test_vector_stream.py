"""Streaming embedding ingest: cross-batch and within-batch vector
near-dup screening, surviving-only signature indexing, crash-replay
idempotence, and the rejected-row audit."""

from __future__ import annotations

from football_data_pipeline_spark.streaming.vectors import (
    VECTOR_DUP_TAU,
    vector_ingest_batch_writer,
)

SCHEMA = "vec_id long, embedding array<float>"
DIMS = 64


def _block(start: int, scale: float = 1.0) -> list[float]:
    """Unit block vector: `scale` in dims [start, start+8), zero
    elsewhere — mutually orthogonal across distinct blocks (cosine
    0), exactly cosine 1.0 across scalings of one block (every
    hyperplane sign bit identical, so LSH banding is deterministic
    in the test, no jiggle-flips-a-bit flakiness)."""
    v = [0.0] * DIMS
    for i in range(start, start + 8):
        v[i] = scale
    return v


def _accepted(spark, root, batch_id):
    return {
        r.vec_id
        for r in spark.read.parquet(
            f"{root}/accepted/batch_id={batch_id}"
        ).collect()
    }


def _rejected(spark, root, batch_id):
    return {
        r.vec_id: r
        for r in spark.read.parquet(
            f"{root}/rejected/batch_id={batch_id}"
        ).collect()
    }


def test_cross_batch_and_within_batch_screening(spark, tmp_path):
    root = str(tmp_path / "vecs")
    write = vector_ingest_batch_writer(root)

    b0 = spark.createDataFrame(
        [(1, _block(0)), (2, _block(8))], SCHEMA
    )
    write(b0, 0)
    assert _accepted(spark, root, 0) == {1, 2}
    assert _rejected(spark, root, 0) == {}

    # batch 1: id 3 is an exact scaling of accepted id 1 (cosine
    # 1.0 -> history reject); id 4 is a fresh orthogonal block
    b1 = spark.createDataFrame(
        [(3, _block(0, 2.0)), (4, _block(16))], SCHEMA
    )
    write(b1, 1)
    assert _accepted(spark, root, 1) == {4}
    rej = _rejected(spark, root, 1)
    assert set(rej) == {3}
    assert rej[3].dup_of == 1 and rej[3].scope == "history"
    assert rej[3].cosine_sim >= VECTOR_DUP_TAU

    # batch 2: two copies of one new block — smaller id owns
    b2 = spark.createDataFrame(
        [(5, _block(24)), (6, _block(24, 0.5))], SCHEMA
    )
    write(b2, 2)
    assert _accepted(spark, root, 2) == {5}
    rej2 = _rejected(spark, root, 2)
    assert set(rej2) == {6}
    assert rej2[6].dup_of == 5 and rej2[6].scope == "batch"


def test_rejected_vectors_never_index(spark, tmp_path):
    """A rejected near-copy must not evict future arrivals: the
    owner recorded for a later copy is the ACCEPTED original, and a
    vector whose only match was itself rejected is judged against
    the accepted corpus only."""
    root = str(tmp_path / "vecs")
    write = vector_ingest_batch_writer(root)
    write(spark.createDataFrame([(1, _block(0))], SCHEMA), 0)
    write(spark.createDataFrame([(3, _block(0, 2.0))], SCHEMA), 1)
    write(spark.createDataFrame([(7, _block(0, 3.0))], SCHEMA), 2)
    rej = _rejected(spark, root, 2)
    assert set(rej) == {7}
    # owner is the accepted vec 1 — vec 3 was rejected, never indexed
    assert rej[7].dup_of == 1 and rej[7].scope == "history"


def test_replay_idempotent_and_duplicate_ids_collapse(spark, tmp_path):
    root = str(tmp_path / "vecs")
    write = vector_ingest_batch_writer(root)
    write(spark.createDataFrame([(1, _block(0))], SCHEMA), 0)
    b1 = spark.createDataFrame(
        [(2, _block(8)), (2, _block(8)), (3, _block(0, 0.5))], SCHEMA
    )
    write(b1, 1)
    first_acc = _accepted(spark, root, 1)
    first_rej = {k: (v.dup_of, v.scope) for k, v in _rejected(spark, root, 1).items()}
    assert first_acc == {2}  # duplicate id collapsed, one row
    assert (
        len(spark.read.parquet(f"{root}/accepted/batch_id=1").collect()) == 1
    )
    assert first_rej == {3: (1, "history")}
    write(b1, 1)  # crash-replay of the same batch
    assert _accepted(spark, root, 1) == first_acc
    assert {
        k: (v.dup_of, v.scope) for k, v in _rejected(spark, root, 1).items()
    } == first_rej
