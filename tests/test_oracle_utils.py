"""The local comparator must be at least as strict as the driver's hash.

Round 4's only wrong answer (`returnflag_priority_counts`) had values
verified equal on both engines — the driver failed on representation:
Spark bigint vs DuckDB HUGEINT surfaced as float64. The old comparator
coerced both sides to float and passed; these tests pin the stricter
behavior.
"""

from __future__ import annotations

import pandas as pd
import pytest

from tests.oracle_utils import compare


def test_int_spark_vs_float_oracle_fails(spark):
    df = spark.createDataFrame([(1,), (2,)], "v: bigint")
    exp = pd.DataFrame({"v": [1.0, 2.0]})
    with pytest.raises(AssertionError, match="dtype-kind mismatch"):
        compare(df, exp)


def test_float_spark_vs_int_oracle_fails(spark):
    df = spark.createDataFrame([(1.0,), (2.0,)], "v: double")
    exp = pd.DataFrame({"v": pd.Series([1, 2], dtype="int64")})
    with pytest.raises(AssertionError, match="dtype-kind mismatch"):
        compare(df, exp)


def test_matching_int_kinds_pass(spark):
    df = spark.createDataFrame([(1,), (2,)], "v: bigint")
    exp = pd.DataFrame({"v": pd.Series([2, 1], dtype="int32")})
    compare(df, exp)  # int32 vs int64 is fine — same kind, equal values


def test_matching_float_kinds_pass(spark):
    df = spark.createDataFrame([(1.5,), (2.5,)], "v: double")
    exp = pd.DataFrame({"v": [2.5, 1.5]})
    compare(df, exp)
