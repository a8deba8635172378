"""PageRank over the trade graph: hand-graph semantics (mass
conservation, in-degree ordering, dangling redistribution),
partition independence, and the plan shape. Oracle parity rides the
all-queries gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from football_data_pipeline_spark.operators.graphrank import (
    DAMPING,
    pagerank,
)


def _run(spark, node_ids, edge_pairs, parts=1):
    nodes = spark.createDataFrame([(n,) for n in node_ids], "node long")
    edges = spark.createDataFrame(edge_pairs, "src long, dst long")
    if parts > 1:
        nodes, edges = nodes.repartition(parts), edges.repartition(parts)
    return {r.node: r.pr for r in pagerank(nodes, edges).collect()}


def test_mass_conservation_and_indegree_ordering(spark):
    """Total PR mass stays ~1 (teleport + dangling redistribution
    leak nothing), and a node every other node points at outranks
    one with a single in-edge."""
    # star: 1..4 all point at 0; 0 points at 1 (so 0 is not dangling)
    pr = _run(spark, range(5), [(i, 0) for i in range(1, 5)] + [(0, 1)])
    assert sum(pr.values()) == pytest.approx(1.0, abs=1e-6)
    assert pr[0] > pr[1] > pr[2]  # hub > its target > plain spokes
    assert pr[2] == pr[3] == pr[4]  # symmetric spokes tie exactly


def test_dangling_mass_redistributes_uniformly(spark):
    """A dangling node's mass must spread to EVERYONE (not vanish):
    with 0 -> 1 and 1 dangling, node 2 (isolated) still gains above
    the bare teleport floor, and total mass holds."""
    pr = _run(spark, range(3), [(0, 1)])
    assert sum(pr.values()) == pytest.approx(1.0, abs=1e-6)
    teleport_floor = (1.0 - DAMPING) / 3
    assert pr[2] > teleport_floor  # dangling share reached it
    assert pr[1] > pr[0] == pr[2]  # 0 and 2 both have no in-edges


def test_partition_independence(spark):
    a = _run(spark, range(8), [(i, (i * 3 + 1) % 8) for i in range(8)], parts=1)
    b = _run(spark, range(8), [(i, (i * 3 + 1) % 8) for i in range(8)], parts=7)
    assert a == b  # bit-equal, not approx — the decimal-grid claim


def test_plan_shape_no_cartesian_no_global_window(spark):
    import re

    import football_data_pipeline_spark.all_queries  # noqa: F401
    from football_data_pipeline_spark.registry import QUERIES

    from .conftest import SF_DIR

    plan = (
        QUERIES["q_pagerank"]
        .fn(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "Window" not in plan  # pure join+aggregate iterations


def test_checkpointed_matches_unrolled(spark):
    """The production-round-count path (checkpoint_every=k) must be
    BIT-identical to the unrolled form at the same iteration count:
    every round's vector is grid-rounded before publication, so a
    localCheckpoint materializes exactly those doubles."""
    nodes = spark.createDataFrame([(n,) for n in range(8)], "node long")
    pairs = [(i, (i * 3 + 1) % 7) for i in range(7)] + [(0, 5), (3, 6)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    plain = {r.node: r.pr for r in pagerank(nodes, edges, iterations=3).collect()}
    ckpt = {
        r.node: r.pr
        for r in pagerank(
            nodes, edges, iterations=3, checkpoint_every=1
        ).collect()
    }
    assert plain == ckpt  # float == on purpose: bit-exact contract

    with pytest.raises(ValueError, match="checkpoint_every"):
        pagerank(nodes, edges, checkpoint_every=0)


def test_checkpointed_plan_stays_flat_per_round(spark):
    """20 production rounds must not grow the plan: with
    checkpoint_every=1 the final-round plan reads a checkpointed leaf,
    so its size is independent of how many rounds ran before it
    (the unrolled form grows with every round — that contrast is the
    point of the knob)."""
    nodes = spark.createDataFrame([(n,) for n in range(6)], "node long")
    edges = spark.createDataFrame(
        [(i, (i + 1) % 6) for i in range(6)], "src long, dst long"
    )

    def plan_len(iters):
        df = pagerank(nodes, edges, iterations=iters, checkpoint_every=1)
        return len(df._jdf.queryExecution().executedPlan().toString())

    p5, p20 = plan_len(5), plan_len(20)
    assert p20 == p5, f"plan grew across rounds: {p5} -> {p20}"
    # and the 20-round run converges to a live distribution
    pr = {
        r.node: r.pr
        for r in pagerank(
            nodes, edges, iterations=20, checkpoint_every=4
        ).collect()
    }
    assert sum(pr.values()) == pytest.approx(1.0, abs=1e-6)
