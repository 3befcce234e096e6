"""Side-input (bounded enrichment) source — reference q13's CSV-on-S3 table.

The reference loads a small key/value CSV inside each worker and joins it to
the bid stream (flock-function/src/aws/actor.rs:575-629, schema via base64
metadata; query benchmarks/src/nexmark/query/q13.sql). Spark mapping: read
the CSV with an explicit schema and broadcast-join it — the dim ships to
executors once, the fact side never shuffles.

The CSV content is deterministic (key in 0..24, value = key * 10), written
idempotently to a temp path by the query itself, so the DuckDB oracle can
regenerate the identical dimension from range(25) without reading any file —
the Spark side still exercises the real CSV reader path (schema'd read,
header, pruned columns).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flock_spark.catalog import tbl
from flock_spark.registry import register

N_KEYS = 25


def _side_input_csv() -> str:
    path = os.path.join(tempfile.gettempdir(), "flock_spark_side_input.csv")
    if not os.path.exists(path):
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write("key,value\n")
            for k in range(N_KEYS):
                f.write(f"{k},{k * 10}\n")
        os.replace(tmp, path)
    return path


def side_input(spark: SparkSession) -> DataFrame:
    """The enrichment table, read from CSV with a declared schema (no
    inference pass — one read, pruned columns)."""
    schema = T.StructType(
        [
            T.StructField("key", T.LongType()),
            T.StructField("value", T.LongType()),
        ]
    )
    return spark.read.schema(schema).option("header", "true").csv(_side_input_csv())


@register(
    "side_input_csv_join",
    oracle=f"""
    SELECT side_value, count(*) AS cnt
    FROM events
    JOIN (SELECT id AS key, id * 10 AS side_value FROM range({N_KEYS}) t(id)) s
      ON events.user_id % {N_KEYS} = s.key
    GROUP BY side_value
    """,
    tags=("source", "join", "nexmark"),
    doc="NEXMark q13 shape: stream enriched by a small CSV side input via "
    "broadcast join (actor.rs:575-629) — the dimension ships to executors "
    "once; the fact table's scan-side partitioning is untouched (no "
    "shuffle). The oracle regenerates the deterministic CSV content from "
    "range().",
)
def side_input_csv_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events")
    s = side_input(spark).select("key", F.col("value").alias("side_value"))
    return (
        e.join(F.broadcast(s), e.user_id % N_KEYS == s.key)
        .groupBy("side_value")
        .agg(F.count("*").alias("cnt"))
    )
