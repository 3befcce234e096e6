"""Table catalog: declared schemas + loaders for the driver's synthetic tables.

The reference declares every source schema statically and plans queries against
empty schema-only MemTables (flock/src/query.rs:171-186,
flock/src/datasource/tpch/mod.rs:29-120). Spark binds plans to sources
natively, so here the declared schemas serve (a) validation, (b) streaming
sources (readStream requires an explicit schema), and (c) documentation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Per-process memo of resolved table DataFrames keyed by (application id,
# sf_dir, name). DataFrames are immutable logical plans, so sharing one across
# queries is safe and skips repeated parquet footer reads + schema inference —
# the driver's correctness sweep runs ~140 queries against the same
# session/dir, and rebuilding the scan per query dominated round-1 sweep cost.
# The Spark application id is unique per context, so a restarted SparkSession
# never reuses stale plans (unlike id(spark), which CPython may recycle).
_TBL_MEMO: dict[tuple[str, str, str], DataFrame] = {}
_VIEWS_MEMO: set[tuple[str, str, str]] = set()


def local_df(spark: SparkSession, rows, ddl: str) -> DataFrame:
    """Small driver-built DataFrame as a LocalRelation.

    ``spark.createDataFrame(list_of_tuples, ddl)`` plans as a Python RDD
    scan, and every downstream use — in particular every
    BroadcastExchange over it — runs a separate Python evaluation job
    (measured: 4 broadcasts of a 4k-row LUT cost 2.3 s of an entry's
    2.8 s steady state). Routing the same rows through a pandas frame
    with an explicit schema yields an Arrow-backed LocalRelation that
    broadcasts straight from driver memory, with identical contents."""
    import pandas as pd

    if not rows:
        return spark.createDataFrame([], ddl)
    pdf = pd.DataFrame(list(rows))
    return spark.createDataFrame(pdf, schema=ddl)


def session_key(spark: SparkSession) -> str:
    """Stable identity of the live SparkContext for memoization keys."""
    return spark.sparkContext.applicationId


def evict_stale(memo: dict, spark: SparkSession) -> None:
    """Drop memo entries belonging to a SparkContext other than the live one.

    One process holds at most one live SparkContext; after a stop/restart the
    old context's cached DataFrames (and any localCheckpoint RDD blocks they
    pin) are unusable and would otherwise stay referenced forever. Call on
    insert — keys are (session_key, ...) tuples or plain session_key strings.
    """
    live = session_key(spark)
    for k in [k for k in memo if (k[0] if isinstance(k, tuple) else k) != live]:
        del memo[k]


def tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table. Parquet scan → columnar, predicate pushdown + column
    pruning apply automatically; at cluster scale the same call reads a
    partitioned directory with partition pruning.

    events.ts is written as timestamp[ns], which Spark 4 rejects by default
    (PARQUET_TYPE_ILLEGAL). We read nanos as long and truncate to microsecond
    timestamps — the same ns→µs truncation DuckDB applies on read, keeping
    oracle comparisons exact.
    """
    key = (session_key(spark), sf_dir, name)
    cached = _TBL_MEMO.get(key)
    if cached is not None:
        return cached
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    declared = SCHEMAS.get(name)
    if declared is not None:
        for field in declared.fields:
            if isinstance(field.dataType, T.TimestampType) and isinstance(
                df.schema[field.name].dataType, T.LongType
            ):
                df = df.withColumn(
                    field.name,
                    F.timestamp_micros(F.expr(f"{field.name} div 1000")),
                )
    evict_stale(_TBL_MEMO, spark)
    _TBL_MEMO[key] = df
    return df


def events_until(spark: SparkSession, sf_dir: str, cutoff_utc: str) -> DataFrame:
    """events with ts <= cutoff, with the predicate applied to the SCAN's own
    ts column so it pushes into the parquet reader.

    For time-travel queries the cutoff is the main pruning lever (row-group
    min/max statistics skip every later file), so the filter must land on
    the stored column, not a derived one. The driver's parquet stores ts as
    either TIMESTAMP(MICROS) (filter with a timestamp literal directly) or
    int64 nanoseconds (readable via nanosAsLong; filter on the raw long,
    then convert). Both paths show LessThanOrEqual(ts, …) in PushedFilters.
    """
    from datetime import datetime, timezone

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    if isinstance(raw.schema["ts"].dataType, T.LongType):
        cutoff_ns = int(
            datetime.strptime(cutoff_utc, "%Y-%m-%d %H:%M:%S")
            .replace(tzinfo=timezone.utc)
            .timestamp()
            * 1_000_000
        ) * 1_000
        raw = raw.filter(F.col("ts") <= F.lit(cutoff_ns))
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.filter(F.col("ts") <= F.to_timestamp(F.lit(cutoff_utc)))


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to full parallelism iff the plan would
    otherwise run on fewer partitions than cores.

    The test-scale tables are single-row-group parquet files, so scans are
    one partition no matter what split configs say — any heavy per-row
    expression rooted directly on the scan (md5 shingle folds, sketch
    signatures, array dot products) runs single-threaded without this. On a
    real deployment the scan already has ≥ cores splits and this returns the
    input unchanged (no shuffle).
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register temp views so queries can be phrased in pure SQL (memoized
    like tbl(), but keyed per SESSION object as well: temp views live in the
    session, not the shared SparkContext, so a sibling spark.newSession()
    must not hit a memo populated by another session)."""
    for name in names or TABLE_NAMES:
        key = (f"{session_key(spark)}/{id(spark)}", sf_dir, name)
        if key in _VIEWS_MEMO:
            continue
        tbl(spark, sf_dir, name).createOrReplaceTempView(name)
        _VIEWS_MEMO.add(key)
