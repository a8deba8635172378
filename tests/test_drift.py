"""PSI drift monitor: identical feeds score zero, planted shifts
match a hand-computed index, one-sided buckets stay finite, and the
streaming writer is replay-idempotent with a working alert."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from football_data_pipeline_spark.operators.drift import (
    PSI_ALERT,
    drift_batch_writer,
    length_profile,
    psi_report,
    psi_total,
)


def _rnd(x: float, k: int) -> float:
    return math.floor(x * 10**k + 0.5) / 10**k


def _expected_psi(ref: dict[int, int], cur: dict[int, int]) -> float:
    buckets = sorted(set(ref) | set(cur))
    nb = len(buckets)
    rt, ct = sum(ref.values()), sum(cur.values())
    total = 0.0
    for b in buckets:
        rp = (ref.get(b, 0) + 1.0) / (rt + nb)
        cp = (cur.get(b, 0) + 1.0) / (ct + nb)
        t = _rnd(math.log(cp / rp), 4)
        total += _rnd((cp - rp) * t, 6)
    return total


def _profile(spark, counts: dict[int, int]):
    rows = [(b, n) for b, n in counts.items()]
    return spark.createDataFrame(rows, "bucket long, n_docs long")


def test_identical_profiles_score_zero(spark):
    p = _profile(spark, {1: 50, 3: 25, 5: 25})
    rows = psi_report(p, p).collect()
    assert all(r.psi_term == 0.0 for r in rows)
    tot = psi_total(psi_report(p, p)).collect()[0]
    assert tot.psi == 0.0 and tot.alert is False


def test_planted_shift_matches_hand_computation(spark):
    ref = {1: 90, 2: 10}
    cur = {1: 10, 2: 90}
    got = psi_total(
        psi_report(_profile(spark, cur), _profile(spark, ref))
    ).collect()[0]
    want = _expected_psi(ref, cur)
    assert abs(got.psi - want) < 1e-9
    assert got.psi > PSI_ALERT and got.alert is True


def test_one_sided_bucket_finite_and_directional(spark):
    ref = {1: 100}
    cur = {1: 50, 7: 50}  # brand-new bucket in the feed
    rows = {r.bucket: r for r in psi_report(
        _profile(spark, cur), _profile(spark, ref)
    ).collect()}
    assert rows[7].ref_n == 0
    assert math.isfinite(rows[7].psi_term) and rows[7].psi_term > 0
    assert abs(
        sum(r.psi_term for r in rows.values())
        - _expected_psi(ref, cur)
    ) < 1e-9


def test_length_profile_buckets_and_empty_docs(spark):
    docs = spark.createDataFrame(
        [(1, "w"), (2, "a b c d"), (3, ""), (4, "x y")],
        "doc_id long, text string",
    )
    got = {r.bucket: r.n_docs for r in length_profile(docs).collect()}
    # 1 token → bucket 0; 4 → bucket 2; 2 → bucket 1; empty → −1
    assert got == {-1: 1, 0: 1, 1: 1, 2: 1}


def _docs(spark, n_short: int, n_long: int):
    rows = [(i, "w " * 4) for i in range(n_short)] + [
        (1000 + i, "w " * 64) for i in range(n_long)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_drift_writer_alert_and_replay(spark, tmp_path):
    root = str(tmp_path / "drift")
    ref = length_profile(_docs(spark, 90, 10))
    write = drift_batch_writer(root, ref)

    write(_docs(spark, 90, 10), 0)  # same mix → stable
    s0 = spark.read.parquet(f"{root}/drift_summary/batch_id=0").collect()[0]
    assert s0.alert is False and s0.n_docs == 100

    write(_docs(spark, 10, 90), 1)  # inverted mix → act
    s1 = spark.read.parquet(f"{root}/drift_summary/batch_id=1").collect()[0]
    assert s1.alert is True and s1.psi > PSI_ALERT

    before = sorted(
        map(tuple, spark.read.parquet(f"{root}/drift/batch_id=1").collect())
    )
    write(_docs(spark, 10, 90), 1)  # crash-replay of batch 1
    after = sorted(
        map(tuple, spark.read.parquet(f"{root}/drift/batch_id=1").collect())
    )
    assert before == after


def test_drift_writer_rejects_empty_reference(spark):
    import pytest

    empty = length_profile(
        spark.createDataFrame([], "doc_id long, text string")
    )
    with pytest.raises(ValueError):
        drift_batch_writer("/tmp/x", empty)
