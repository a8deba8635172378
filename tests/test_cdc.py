"""CDC apply: every semantic branch pinned on a hand-built log —
update, insert-of-new-key, delete, delete-of-absent, U-after-D
resurrection, D-after-U removal, equal-seq tie resolution, and
partition independence."""

from __future__ import annotations

from football_data_pipeline_spark.operators.cdc import apply_changes

BASE_SCHEMA = "k long, v string, n long"
CHG_SCHEMA = "k long, seq long, op string, v string, n long"


def _apply(spark, base_rows, change_rows):
    base = spark.createDataFrame(base_rows, BASE_SCHEMA)
    chg = spark.createDataFrame(change_rows, CHG_SCHEMA)
    out = apply_changes(base, chg, "k", "seq", "op", ["v", "n"]).collect()
    return {r.k: (r.v, r.n) for r in out}


def test_all_semantic_branches(spark):
    base = [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)]
    changes = [
        (2, 1, "U", "b2", 21),          # plain update
        (3, 1, "D", None, None),        # delete existing
        (5, 1, "U", "e", 50),           # insert new key
        (6, 1, "D", None, None),        # delete of absent key -> no row
        (4, 1, "D", None, None),        # U-after-D: resurrection wins
        (4, 2, "U", "d2", 42),
        (1, 1, "U", "a2", 11),          # D-after-U: delete wins
        (1, 2, "D", None, None),
    ]
    out = _apply(spark, base, changes)
    assert out == {2: ("b2", 21), 4: ("d2", 42), 5: ("e", 50)}


def test_untouched_base_rows_survive_verbatim(spark):
    out = _apply(spark, [(7, "x", 1)], [(8, 1, "U", "y", 2)])
    assert out == {7: ("x", 1), 8: ("y", 2)}


def test_equal_seq_tie_prefers_upsert_deterministically(spark):
    # same seq, D and U: struct ordering compares op after seq and
    # 'U' > 'D', so the upsert wins — on every partitioning
    base = [(1, "a", 10)]
    changes = [(1, 5, "D", None, None), (1, 5, "U", "z", 99)]
    for parts in (1, 7):
        base_df = spark.createDataFrame(base, BASE_SCHEMA).repartition(parts)
        chg_df = spark.createDataFrame(changes, CHG_SCHEMA).repartition(parts)
        out = apply_changes(
            base_df, chg_df, "k", "seq", "op", ["v", "n"]
        ).collect()
        assert [(r.k, r.v, r.n) for r in out] == [(1, "z", 99)]


def test_empty_change_log_is_identity(spark):
    base = [(1, "a", 10), (2, "b", 20)]
    out = _apply(spark, base, [])
    assert out == {1: ("a", 10), 2: ("b", 20)}


def test_cdc_apply_plan_shape(spark):
    """Plan-shape lock (VERDICT r6 item 7): collapse_log must stay
    ONE map-side-combinable aggregate (a partial/final pair around a
    single key exchange — max(struct) plans as SortAggregate since
    structs aren't hash-aggregable — never a window or a join), and
    q_cdc_apply's full plan must carry no window/cartesian at all:
    the whole apply is collapse + one full-outer join + the report
    aggregate."""
    import re
    from football_data_pipeline_spark.operators.cdc import collapse_log

    chg = spark.createDataFrame(
        [(1, 1, "U", "a")], "k long, seq long, op string, v string"
    )
    plan = (
        collapse_log(chg, "k", "seq", "op", ["v"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    aggs = re.findall(r"(?:Sort|Hash|ObjectHash)Aggregate", plan)
    assert len(aggs) == 2, aggs  # partial + final, one aggregate
    assert "partial_max" in plan  # map-side combine is real
    assert plan.count("Exchange") == 1  # one shuffle, keyed on k
    assert "Window" not in plan and "Join" not in plan

    import football_data_pipeline_spark.all_queries  # noqa: F401
    from football_data_pipeline_spark.registry import QUERIES

    from .conftest import SF_DIR

    qplan = (
        QUERIES["q_cdc_apply"]
        .fn(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in qplan and "Window" not in qplan
    assert "FullOuter" in qplan  # the single base-vs-winners join
