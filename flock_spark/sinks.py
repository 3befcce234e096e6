"""Data sinks (reference: flock/src/datasink/mod.rs).

Reference sink types (datasink/mod.rs:67-103): Blackhole / S3 / DynamoDB /
SQS / EFS, with formats CSV / JSON / Parquet / SerdeBinary (mod.rs:47-63).
Spark mapping: Blackhole → "noop", object-store sinks → parquet/csv/json
writers (path-addressed; S3 vs local is just the URI scheme), KV/queue sinks
→ foreachBatch writers. SerdeBinary (Arrow Flight payload bytes) has no
user-facing counterpart — Spark's shuffle/file formats own the wire format.

Scale: writers partition output by the DataFrame's partitioning; callers
repartition by a key before writing when downstream reads prune on it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

BATCH_FORMATS = {"parquet", "csv", "json", "orc"}


def write_batch(
    df: DataFrame,
    fmt: str,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Materialize a batch result (reference datasink write dispatch,
    mod.rs:137-160). ``partition_by`` writes hive-style key=value
    directories so downstream scans prune whole partitions (the q10
    dt/hm layout — at 100 TB readers of one day touch one directory)."""
    if fmt == "noop":
        df.write.format("noop").mode(mode).save()
        return
    if fmt not in BATCH_FORMATS:
        raise ValueError(f"unsupported sink format: {fmt}")
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer = writer.option("header", "true")
    getattr(writer, fmt)(path)


def write_stream(
    df: DataFrame,
    fmt: str,
    path: str | None,
    checkpoint: str,
    output_mode: str = "append",
    partition_by: list[str] | None = None,
):
    """Start a streaming sink; returns the StreamingQuery handle."""
    writer = (
        df.writeStream.outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "noop":
        return writer.format("noop").start()
    if fmt not in BATCH_FORMATS:
        raise ValueError(f"unsupported stream sink format: {fmt}")
    return writer.format(fmt).start(path)


def foreach_batch_sink(
    df: DataFrame,
    handler: Callable[[DataFrame, int], None],
    checkpoint: str,
    available_now: bool = False,
):
    """KV/queue-style sink (reference DynamoDB/SQS sinks) via foreachBatch —
    the idempotent-write escape hatch. foreachBatch is at-least-once: the
    handler MUST key its writes on (epoch, record key) so a redelivered
    batch overwrites rather than duplicates. available_now=True drains a
    bounded source and terminates (verification mode)."""
    writer = (
        df.writeStream.foreachBatch(handler)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
