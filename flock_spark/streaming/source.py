"""Streaming sources.

- bounded_stream: file-based readStream over the driver's parquet tables —
  the test/verification path (a bounded stream drained with
  processAllAvailable gives batch-equivalent results).
- rate_events: deterministic synthetic event stream derived from Spark's
  rate source — the analog of the reference's seeded NEXMark generator
  (flock/src/datasource/nexmark/nexmark.rs:285-398): every field is a pure
  function of the monotone `value` counter, so a run is reproducible the way
  Flock's per-id seeded events are (event.rs:89).

In production the same queries attach to kafka/kinesis readStream sources —
only this module changes, mirroring the reference's DataSource enum
(flock/src/datasource/mod.rs:62-110).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flock_spark.catalog import SCHEMAS

EVENT_TYPES = ["click", "signup", "error", "view", "purchase"]


def _events_ts_stored_as_long(sf_dir: str) -> bool:
    """True iff events.ts is physically int64 nanoseconds (readable only via
    nanosAsLong); False for TIMESTAMP(MICROS), which streams natively. The
    driver has shipped both layouts across rounds, so detect per-directory."""
    import pyarrow.parquet as pq

    t = pq.read_schema(f"{sf_dir.rstrip('/')}/events.parquet").field("ts").type
    return str(t) in ("int64", "timestamp[ns]")


def bounded_stream(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """readStream over one parquet table (explicit schema, required for
    streaming). events.ts matches the batch catalog path: int64-nanos files
    are read as long and truncated to µs; TIMESTAMP(MICROS) files are read
    as TIMESTAMP_NTZ directly (what batch schema inference yields)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = SCHEMAS[name]
    ts_is_long = name == "events" and _events_ts_stored_as_long(sf_dir)
    read_fields = [
        T.StructField(
            f.name,
            T.LongType()
            if ts_is_long and f.name == "ts"
            # watermarks require TIMESTAMP (LTZ); under the UTC session tz the
            # stored NTZ micros read as the same wall-clock instants
            else (T.TimestampType() if name == "events" and f.name == "ts" else f.dataType),
        )
        for f in schema.fields
    ]
    df = (
        spark.readStream.schema(T.StructType(read_fields))
        .option("maxFilesPerTrigger", 1)
        # file streams need a directory; glob-select the one table file
        .option("pathGlobFilter", f"{name}.parquet")
        .parquet(sf_dir.rstrip("/"))
    )
    if ts_is_long:
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def rate_events(spark: SparkSession, rows_per_second: int = 1000) -> DataFrame:
    """Deterministic event stream from the rate source (NEXMark-generator
    analog): fields derive from the counter via the portable hash family, so
    any two runs produce identical events for the same counter range."""
    rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    return rate.select(
        F.col("value").alias("event_id"),
        F.col("timestamp").alias("ts"),
        (F.col("value") % 150).alias("user_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in EVENT_TYPES]), (F.col("value") % 5 + 1).cast("int")
        ).alias("event_type"),
        (F.round((F.col("value") * 7919 % 49001) / 100.0, 2)).alias("value"),
        F.to_json(F.struct((F.col("value") % 100).alias("k"))).alias("props"),
    )
