"""Differential test: every registered query with an oracle must match DuckDB
exactly at sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from flock_spark.oracle import compare
from flock_spark.registry import REGISTRY, get_queries

get_queries()  # populate registry

WITH_ORACLE = sorted(name for name, spec in REGISTRY.items() if spec.oracle)
ROWS_ONLY = sorted(name for name, spec in REGISTRY.items() if not spec.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, sf_dir, name):
    spec = REGISTRY[name]
    compare(spark, spec.fn, spec.oracle, sf_dir)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
