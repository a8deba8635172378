"""Shared fixtures: one SparkSession per test session, a DuckDB
connection with the testdata views pre-registered (mirroring the
driver), and the oracle compare helper.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from football_data_pipeline_spark.catalog import TABLES
from football_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark(app_name="fdps-tests")
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    """Order-insensitive canonical form: columns sorted by name, values
    normalized to strings (floats via repr of rounded value, timestamps
    via isoformat), rows sorted."""
    out = {}
    for col in sorted(df.columns):
        s = df[col]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.dt.tz_localize(None) if getattr(s.dt, "tz", None) is not None else s
            out[col] = s.map(lambda x: "NULL" if pd.isna(x) else x.isoformat())
        elif pd.api.types.is_float_dtype(s):
            out[col] = s.map(
                lambda x: "NULL" if x is None or (isinstance(x, float) and math.isnan(x))
                else repr(round(float(x), 6))
            )
        else:
            out[col] = s.map(lambda x: "NULL" if x is None or (isinstance(x, float) and math.isnan(x)) else str(x))
    c = pd.DataFrame(out)
    return c.sort_values(by=list(c.columns), kind="mergesort").reset_index(drop=True)


def assert_matches_oracle(
    spark_df, duck_con, oracle_sql: str, name: str = "", expect_nonempty: bool = False
) -> None:
    actual = canonicalize(spark_df.toPandas())
    expected = canonicalize(duck_con.sql(oracle_sql).df())
    assert list(actual.columns) == list(expected.columns), (
        f"{name}: column mismatch\n spark={list(actual.columns)}\n duck={list(expected.columns)}"
    )
    assert len(actual) == len(expected), (
        f"{name}: row count mismatch spark={len(actual)} duck={len(expected)}"
    )
    if len(actual) == 0:
        # columns + count already matched; DataFrame.equals on empty
        # frames compares construction dtypes, which differ between
        # an empty Spark collect and an empty DuckDB fetch (the
        # driver's value-hash treats empty == empty). But empty==empty
        # is trivial parity — a query that regresses to empty on BOTH
        # engines (the r6 q_odds_trends 1998-pin case) would read green
        # — so the main gate opts into expect_nonempty (ADVICE r6).
        if expect_nonempty:
            raise AssertionError(
                f"{name}: both engines returned 0 rows — trivially-empty "
                "parity; either the query regressed to empty on both "
                "sides or it belongs in EXPECTED_EMPTY_OK"
            )
        import warnings

        warnings.warn(
            f"{name}: oracle parity was trivially-empty (0 rows both sides)",
            stacklevel=2,
        )
        return
    if not actual.equals(expected):
        diff_mask = (actual != expected).any(axis=1)
        raise AssertionError(
            f"{name}: value mismatch on {int(diff_mask.sum())}/{len(actual)} rows\n"
            f"spark:\n{actual[diff_mask].head(10)}\nduck:\n{expected[diff_mask].head(10)}"
        )
