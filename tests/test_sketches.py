"""Sketch-backed operators: the pruned/sketched plans must be
row-identical to their naive forms (heavy hitters == GROUP BY HAVING,
bloom semi-join == plain semi-join — even when the bloom geometry is
deliberately starved to force false positives), and the estimator
audits must flag honestly."""

from __future__ import annotations

from pyspark.sql import functions as F

from football_data_pipeline_spark.operators.sketches import (
    bloom_bitmap,
    bloom_semi_join,
    heavy_hitters,
)


def _facts(spark, spec):
    """spec: {key: n_rows} -> (key long, payload long) frame."""
    rows = [
        (k, k * 1000 + i) for k, n in spec.items() for i in range(n)
    ]
    return spark.createDataFrame(rows, "key long, payload long")


def test_heavy_hitters_matches_group_by_having(spark):
    spec = {1: 50, 2: 20, 3: 19, 4: 21, 5: 3, 6: 1, 7: 20}
    df = _facts(spark, spec)
    out = {
        r.key_value: r.n_rows
        for r in heavy_hitters(df, "key", threshold=20, width=64).collect()
    }
    assert out == {k: n for k, n in spec.items() if n >= 20}


def test_heavy_hitters_boundary_and_partition_independent(spark):
    # exactly-at-threshold keys must be INCLUDED (HAVING >=), on any
    # partitioning, including width=1 (every row in one bucket: the
    # prune degrades to a no-op but the answer must not change)
    spec = {10: 7, 11: 6, 12: 8}
    for width in (1, 8, 1 << 17):
        for df in (
            _facts(spark, spec),
            _facts(spark, spec).repartition(13),
        ):
            out = {
                r.key_value: r.n_rows
                for r in heavy_hitters(df, "key", 7, width).collect()
            }
            assert out == {10: 7, 12: 8}, (width,)


def test_heavy_hitters_excludes_null_keys(spark):
    df = spark.createDataFrame(
        [(None, i) for i in range(30)] + [(1, i) for i in range(30)],
        "key long, payload long",
    )
    out = heavy_hitters(df, "key", 10, width=64).collect()
    assert [(r.key_value, r.n_rows) for r in out] == [(1, 30)]


def test_bloom_semi_join_matches_plain_semi_join(spark):
    facts = _facts(spark, {k: 5 for k in range(1, 40)})
    keys = spark.createDataFrame(
        [(k,) for k in range(1, 80, 3)], "key long"
    )
    plain = facts.join(keys, "key", "left_semi")
    pruned = bloom_semi_join(facts, keys, "key")
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_bloom_semi_join_exact_under_forced_false_positives(spark):
    # 64-bit filter, 100 keys: the bitmap saturates, every probe is a
    # false positive candidate — the verify join must still produce
    # the exact semi-join
    facts = _facts(spark, {k: 2 for k in range(200)})
    keys = spark.createDataFrame([(k,) for k in range(0, 200, 2)], "key long")
    plain = facts.join(keys, "key", "left_semi")
    pruned = bloom_semi_join(facts, keys, "key", num_bits=64, k=3)
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_bloom_semi_join_empty_and_duplicate_keys(spark):
    facts = _facts(spark, {1: 3, 2: 3})
    empty = spark.createDataFrame([], "key long")
    assert bloom_semi_join(facts, empty, "key").count() == 0
    # duplicate + NULL key rows must not duplicate facts or match NULLs
    dup = spark.createDataFrame(
        [(1,), (1,), (1,), (None,)], "key long"
    )
    out = bloom_semi_join(facts, dup, "key").collect()
    assert sorted(r.key for r in out) == [1, 1, 1]


def test_bloom_bitmap_materializes_only_nonzero_words(spark):
    keys = spark.createDataFrame([(7,)], "key long")
    bmap = bloom_bitmap(keys, "key", num_bits=1 << 13, k=5).collect()[0].bmap
    # 5 probes of one key touch at most 5 of the 128 words
    assert 1 <= len(bmap) <= 5
    assert all(bits != 0 for bits in bmap.values())


def test_round5_sketch_plan_shapes(spark):
    """Plan-shape regression locks for the scale properties the
    operators exist for. q_bloom_semi: the bloom predicate must sit
    BELOW the verify semi-join (in the fact scan's Filter), not above
    it — Catalyst once hoisted the semi-join under the bloom
    cross-join, running the prune as dead code (the literal-bitmap
    form pins the order via plain predicate pushdown).
    q_heavy_hitters: the candidate-bucket set reaches the fact side
    by BROADCAST, never a shuffle join."""
    import football_data_pipeline_spark.all_queries  # noqa: F401
    from football_data_pipeline_spark.registry import QUERIES

    from .conftest import SF_DIR

    plan = (
        QUERIES["q_bloom_semi"]
        .fn(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    semi_at = plan.index("LeftSemi")
    # the bloom probe (element_at over the literal word array) must
    # appear below (after, in tree print order) the semi join, on the
    # fact branch
    assert "element_at" in plan[semi_at:], "bloom prune hoisted above semi-join"

    plan2 = (
        QUERIES["q_heavy_hitters"]
        .fn(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan2 and "LeftSemi" in plan2
    assert "SortMergeJoin" not in plan2


def test_bloom_semi_join_non_multiple_of_64_bits(spark):
    """num_bits that is not a multiple of 64 must still address the
    top partial word (regression: floor-sized dense array truncated
    it, crashing on build or silently filtering everything)."""
    facts = _facts(spark, {k: 2 for k in range(30)})
    keys = spark.createDataFrame([(k,) for k in range(0, 30, 2)], "key long")
    plain = sorted(map(tuple, facts.join(keys, "key", "left_semi").collect()))
    for bits in (100, 32, 65):
        out = sorted(
            map(tuple, bloom_semi_join(facts, keys, "key", num_bits=bits, k=3).collect())
        )
        assert out == plain, bits


def test_heavy_hitters_broadcast_cap(spark):
    """ADVICE r5: past HH_BROADCAST_WIDTH_CAP the broadcast hint
    comes off (no BroadcastHashJoin on the bucket semi-join) and the
    result is unchanged."""
    from football_data_pipeline_spark.operators.sketches import (
        HH_BROADCAST_WIDTH_CAP,
    )

    spec = {1: 30, 2: 5, 3: 30}
    df = _facts(spark, spec)
    wide = heavy_hitters(df, "key", threshold=20, width=HH_BROADCAST_WIDTH_CAP * 2)
    assert {r.key_value: r.n_rows for r in wide.collect()} == {1: 30, 3: 30}
    # past the cap the FORCED hint is gone from the logical plan —
    # AQE may still choose broadcast at runtime from the ACTUAL size
    # (that is the point: estimate-blind forcing is what's unsafe)
    logical = wide._jdf.queryExecution().optimizedPlan().toString()
    assert "strategy=broadcast" not in logical
    # explicit override forces the hint back on
    forced = heavy_hitters(df, "key", 20, HH_BROADCAST_WIDTH_CAP * 2, broadcast_buckets=True)
    assert {r.key_value: r.n_rows for r in forced.collect()} == {1: 30, 3: 30}
    assert "strategy=broadcast" in forced._jdf.queryExecution().optimizedPlan().toString()


def test_bloom_semi_join_literal_ceiling(spark):
    """ADVICE r5: the literal-bitmap form refuses geometries whose
    plan literal would choke serialization."""
    import pytest as _pytest

    from football_data_pipeline_spark.operators.sketches import (
        BLOOM_LITERAL_BITS_CAP,
    )

    facts = spark.createDataFrame([(1, 1)], "key long, payload long")
    keys = spark.createDataFrame([(1,)], "key long")
    with _pytest.raises(ValueError, match="literal-bitmap ceiling"):
        bloom_semi_join(facts, keys, "key", num_bits=BLOOM_LITERAL_BITS_CAP * 2)
