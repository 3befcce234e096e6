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

import os
import tempfile
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flock_spark.session import clamped_shuffle_partitions

# State-store instance count per streaming query = shuffle partitions at
# query start. A verification sweep inherits whatever the surrounding
# session sets (a plain driver session defaults to 200), and 200 state
# stores per one-shot bounded drain doubles wall cost at test scale
# (measured: 14.8 s vs 7.4 s for the stateful entry). Drain state at test
# scale is a handful of group keys, so 8 instances saturate it; 32 paid
# measurable extra per-trigger state-store setup (kafka wire drain:
# 3.5-4.4 s at 32 -> 3.2-3.4 s at 8, two triggers). Streaming plans get
# no AQE coalescing, so this clamp is the only partition sizing bounded
# drains have. Production streams size this deliberately per state
# volume; the env override keeps the knob external.
DRAIN_PARTITION_CAP = int(os.environ.get("FLOCK_SPARK_DRAIN_PARTITIONS", "8"))


def _drain_parallelism(spark: SparkSession, cap: int = DRAIN_PARTITION_CAP):
    """Clamp shuffle partitions for the duration of a bounded drain
    (micro-batches plan while the drain runs). The partition count is fixed
    per streaming query at start, so this never leaks into queries planned
    after the drain."""
    return clamped_shuffle_partitions(spark, cap)


def run_to_memory(
    stream_df: DataFrame,
    output_mode: str = "complete",
    query_name: str | None = None,
    timeout_sec: int = 300,
    run_for_sec: float | None = None,
    cap: int = DRAIN_PARTITION_CAP,
) -> DataFrame:
    """Start stream → memory sink, drain, stop, return the result DataFrame.

    Bounded sources (files) drain with Trigger.AvailableNow; unbounded ones
    (rate) pass run_for_sec to run wall-clock-bounded micro-batches instead.

    A bounded drain that exceeds timeout_sec raises TimeoutError — returning
    the partially-filled memory table would read as a value mismatch (or a
    silent pass on a subset) instead of the real failure.
    """
    spark = stream_df.sparkSession
    name = query_name or f"mem_{uuid.uuid4().hex[:8]}"
    writer = stream_df.writeStream.outputMode(output_mode).format("memory").queryName(name)
    with _drain_parallelism(spark, cap):
        if run_for_sec is None:
            q = writer.trigger(availableNow=True).start()
            try:
                finished = q.awaitTermination(timeout_sec)
                if not finished:
                    raise TimeoutError(
                        f"bounded stream '{name}' did not drain within {timeout_sec}s"
                    )
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
    """Drain a bounded stream through foreachBatch(batch_fn); raises
    TimeoutError on an incomplete drain (see run_to_memory)."""
    import shutil

    checkpoint = tempfile.mkdtemp(prefix="flock_spark_ckpt_")
    with _drain_parallelism(stream_df.sparkSession):
        q = (
            stream_df.writeStream.foreachBatch(batch_fn)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        try:
            finished = q.awaitTermination(timeout_sec)
            if not finished:
                raise TimeoutError(
                    f"bounded foreachBatch stream did not drain within {timeout_sec}s"
                )
        finally:
            if q.isActive:
                q.stop()
            # one-shot drain: the checkpoint has no replay value, don't leak /tmp
            shutil.rmtree(checkpoint, ignore_errors=True)


def stage_batches(stream_df: DataFrame, timeout_sec: int = 300) -> DataFrame:
    """Drain a bounded stream by staging every micro-batch to parquet and
    return a DataFrame over the staged table.

    This is the scale-safe foreachBatch accumulator: each batch is written
    executor-side (`df.write` inside the handler — no toPandas/collect, no
    driver residency), so accumulated size is bounded by storage, not driver
    memory. Writing each epoch to its own `epoch=N` directory with overwrite
    makes redelivery after a failure idempotent — the Spark-sanctioned
    exactly-once pattern for file targets. The returned DataFrame is a plain
    parquet scan of everything staged (partition-discovered `epoch` column
    dropped), so downstream aggregation runs fully distributed.
    """
    from flock_spark.staging import ephemeral_dir

    spark = stream_df.sparkSession
    # ephemeral: the returned DataFrame reads these files for the rest of
    # the run; removed at process exit instead of leaking across sweeps
    stage_dir = ephemeral_dir("flock_spark_stage_")
    cols = stream_df.columns

    def absorb(df: DataFrame, epoch: int) -> None:
        df.write.mode("overwrite").parquet(os.path.join(stage_dir, f"epoch={epoch}"))

    run_foreach_batch(stream_df, absorb, timeout_sec)
    staged = [d for d in os.listdir(stage_dir) if d.startswith("epoch=")]
    if not staged:
        return spark.createDataFrame([], stream_df.schema)
    return spark.read.option("basePath", stage_dir).parquet(stage_dir).select(*cols)
