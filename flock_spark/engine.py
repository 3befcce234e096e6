"""Declarative query-registration API mirroring the reference's surface.

Reference model (flock/src/query.rs:82-103): a Query = SQL string + Tables +
DataSource + DataSink + QueryType (OLAP vs Streaming) + window spec; planning
= register schema-only tables → logical plan → optimize → physical plan
(query.rs:171-186); LocalLauncher executes via DataFusion collect
(launcher/local.rs:52-57); window type per query chosen by the benchmark
driver (benchmarks/src/nexmark/main.rs:116-123).

Spark mapping: the Query compiles to a DataFrame pipeline — `spark.sql` over
registered sources for OLAP, the same SQL over streaming sources (window
clauses injected from the WindowSpec) for streaming. The entire Lambda
orchestration layer (stage DAGs, payload wire format, arenas, consistent
hashing) has no counterpart — Catalyst + shuffle + state store own it.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flock_spark.catalog import SCHEMAS, tbl
from flock_spark.sinks import write_batch


class QueryType(Enum):
    """reference: flock/src/query.rs:67-78 (OLAP vs Streaming)."""

    OLAP = "olap"
    STREAMING = "streaming"


@dataclass(frozen=True)
class WindowSpec:
    """reference: flock/src/stream/window.rs:32-113 — tumbling/hopping/
    session/global/element-wise, sizes in seconds."""

    kind: str = "elementwise"  # elementwise | tumbling | hopping | session | global
    size_sec: int = 0
    hop_sec: int = 0

    def column(self, ts_col: str):
        """The window/group expression this spec contributes."""
        if self.kind == "tumbling":
            return F.window(ts_col, f"{self.size_sec} seconds")
        if self.kind == "hopping":
            return F.window(ts_col, f"{self.size_sec} seconds", f"{self.hop_sec} seconds")
        if self.kind == "session":
            return F.session_window(ts_col, f"{self.size_sec} seconds")
        if self.kind == "global":
            # processing-time tumbling: inject p_time = now() like
            # flock-function/src/aws/window/global.rs:226-232
            return F.window(F.current_timestamp(), f"{self.size_sec} seconds")
        raise ValueError(f"window kind {self.kind!r} contributes no group column")


@dataclass(frozen=True)
class Table:
    """reference: flock/src/query.rs:30-44 — named logical view + schema."""

    name: str
    source_table: str | None = None  # catalog table backing this view


@dataclass
class Query:
    """Declarative query registration (reference query.rs:82-103)."""

    sql: str
    tables: list[Table]
    query_type: QueryType = QueryType.OLAP
    window: WindowSpec = field(default_factory=WindowSpec)
    sink_format: str | None = None  # None = return DataFrame (Blackhole ≈ "noop")
    sink_path: str | None = None
    output_mode: str = "complete"  # streaming drain mode (append for no-agg)

    def plan(self, spark: SparkSession, sf_dir: str) -> DataFrame:
        """Register tables and produce the (lazy) DataFrame plan — the
        analog of query.rs:171-186 (register → logical → optimized →
        physical), all delegated to Catalyst. Under QueryType.STREAMING the
        same SQL binds to streaming sources instead of batch scans — the
        reference's OLAP/Streaming duality (query.rs:67-78) with zero
        query-text changes."""
        streaming = self.query_type is QueryType.STREAMING
        if streaming:
            from flock_spark.streaming.source import bounded_stream
        for t in self.tables:
            backing = t.source_table or t.name
            if backing not in SCHEMAS:
                raise KeyError(f"unknown catalog table: {backing}")
            src = (
                bounded_stream(spark, sf_dir, backing)
                if streaming
                else tbl(spark, sf_dir, backing)
            )
            src.createOrReplaceTempView(t.name)
        return spark.sql(self.sql)


class LocalLauncher:
    """reference: flock/src/launcher/local.rs — plan + execute in-process.

    OLAP queries return their (lazy) DataFrame; STREAMING queries run as a
    real Structured Streaming job over bounded streams and return the
    drained result — the local analog of the reference's per-epoch replay
    loops (q5.rs:76-130)."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir

    def execute(self, query: Query) -> DataFrame:
        df = query.plan(self.spark, self.sf_dir)
        if query.query_type is QueryType.STREAMING:
            from flock_spark.streaming.runner import run_to_memory

            df = run_to_memory(df, output_mode=query.output_mode)
        if query.sink_format and query.sink_format != "noop":
            if not query.sink_path:
                raise ValueError("sink_path required for a materializing sink")
            write_batch(df, query.sink_format, query.sink_path)
        return df
