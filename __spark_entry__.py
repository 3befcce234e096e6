"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      — flagship query (TPC-H q1 pricing summary) on sf0.001.
queries()         — every implemented operator from SURVEY.md §2 + the
                    LLM-pipeline extensions, one callable per name.
oracle_sql()      — DuckDB-equivalent SQL per query (omitted only for
                    genuinely non-SQL-expressible ops, which get the
                    driver's weaker rows-only check).

All real logic lives in the flock_spark package (see flock_spark/__init__.py
for the architecture map); this module is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flock_spark.registry import REGISTRY, get_oracles, get_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    get_queries()
    return REGISTRY["tpch_q1"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return get_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per queries() key (ANSI, runs on the same views)."""
    return get_oracles()
