"""Query registry: every implemented operator registers a named entry with a
Spark callable and (when SQL-expressible) a DuckDB oracle SQL string.

This is the package's parity ledger against SURVEY.md §2 — the driver compares
each callable's result with its oracle on identical parquet inputs
(row count + schema + order-insensitive value hash).

Conventions that keep the hash comparison stable across engines:
- every computed column is aliased identically in Spark and oracle SQL;
- order-dependent float aggregates (SUM/AVG over doubles) are rounded on both
  sides (per-row arithmetic like ``value * 0.908`` is IEEE-deterministic and
  left unrounded);
- string→int64 hashing uses md5 prefixes, which both engines compute
  identically (see operators/hashing.py).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = (), doc: str = ""):
    """Decorator: register a query callable under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def _load_all() -> None:
    """Import all query/operator modules so their @register calls run."""
    import flock_spark.queries  # noqa: F401
    import flock_spark.operators  # noqa: F401
    import flock_spark.sources.nexmark_gen  # noqa: F401
    import flock_spark.sources.side_input  # noqa: F401
    import flock_spark.streaming  # noqa: F401


def get_queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def get_oracles() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
