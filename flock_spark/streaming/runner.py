"""Streaming query runners.

run_to_memory     — drain a (bounded) stream into an in-memory sink and
                    return the result table; complete/update modes replace
                    the reference's per-window result shipping.
run_foreach_batch — the reference's execution model verbatim: re-run a full
                    SQL query per micro-batch/window (Flock re-executes the
                    whole plan per window — e.g. hopping replay
                    flock/src/datasource/nexmark/queries/q5.rs:76-130).
                    foreachBatch is the Spark-sanctioned escape hatch for
                    exactly this (aggregated-stream joins, ranking — the
                    shapes Spark can't run as single incremental queries).
"""

from __future__ import annotations

import tempfile
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def run_to_memory(
    stream_df: DataFrame,
    output_mode: str = "complete",
    query_name: str | None = None,
    timeout_sec: int = 300,
    run_for_sec: float | None = None,
) -> DataFrame:
    """Start stream → memory sink, drain, stop, return the result DataFrame.

    Bounded sources (files) drain with Trigger.AvailableNow; unbounded ones
    (rate) pass run_for_sec to run wall-clock-bounded micro-batches instead.
    """
    spark = stream_df.sparkSession
    name = query_name or f"mem_{uuid.uuid4().hex[:8]}"
    writer = stream_df.writeStream.outputMode(output_mode).format("memory").queryName(name)
    if run_for_sec is None:
        q = writer.trigger(availableNow=True).start()
        try:
            q.awaitTermination(timeout_sec)
        finally:
            if q.isActive:
                q.stop()
    else:
        q = writer.start()
        try:
            q.awaitTermination(run_for_sec)
        finally:
            q.stop()
    return spark.table(name)


def run_foreach_batch(
    stream_df: DataFrame,
    batch_fn: Callable[[DataFrame, int], None],
    timeout_sec: int = 300,
) -> None:
    """Drain a bounded stream through foreachBatch(batch_fn)."""
    checkpoint = tempfile.mkdtemp(prefix="flock_spark_ckpt_")
    q = (
        stream_df.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout_sec)
    finally:
        if q.isActive:
            q.stop()


def accumulate_batches(spark: SparkSession, stream_df: DataFrame, timeout_sec: int = 300) -> DataFrame:
    """Collect every micro-batch of a bounded stream into one DataFrame
    (driver-side union of Arrow batches; test-scale helper)."""
    batches: list = []

    def collect_batch(df: DataFrame, _epoch: int) -> None:
        batches.append(df.toPandas())

    run_foreach_batch(stream_df, collect_batch, timeout_sec)
    import pandas as pd

    if not batches:
        return spark.createDataFrame([], stream_df.schema)
    return spark.createDataFrame(pd.concat(batches, ignore_index=True), schema=stream_df.schema)
