"""Streaming-specific tests beyond the oracle-parity sweep: the rate-source
generator's determinism and the runner plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from flock_spark.streaming.runner import run_to_memory
from flock_spark.streaming.source import bounded_stream, rate_events


def test_rate_events_deterministic_fields(spark):
    """Two drains of the rate generator agree on every derived field for the
    shared counter range (mirrors the reference's seeded NEXMark generator —
    event.rs:89 seeds per id)."""
    s1 = rate_events(spark, rows_per_second=500)
    out1 = run_to_memory(
        s1.select("event_id", "user_id", "event_type", "value"), output_mode="append",
        run_for_sec=5,
    ).filter(F.col("event_id") < 100)
    rows1 = {r["event_id"]: (r["user_id"], r["event_type"], r["value"]) for r in out1.collect()}
    s2 = rate_events(spark, rows_per_second=500)
    out2 = run_to_memory(
        s2.select("event_id", "user_id", "event_type", "value"), output_mode="append",
        run_for_sec=5,
    ).filter(F.col("event_id") < 100)
    rows2 = {r["event_id"]: (r["user_id"], r["event_type"], r["value"]) for r in out2.collect()}
    common = set(rows1) & set(rows2)
    assert common, "rate source produced no overlapping ids"
    for k in common:
        assert rows1[k] == rows2[k]


def test_bounded_stream_matches_batch_count(spark, sf_dir):
    s = bounded_stream(spark, sf_dir, "events")
    drained = run_to_memory(s.select("event_id"), output_mode="append")
    batch_cnt = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert drained.count() == batch_cnt


def test_streaming_watermark_drops_nothing_when_drained(spark, sf_dir):
    """Bounded drain with watermark: complete mode keeps all windows."""
    s = bounded_stream(spark, sf_dir, "events")
    agg = (
        s.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day"))
        .agg(F.count("*").alias("cnt"))
    )
    out = run_to_memory(agg, output_mode="complete")
    total = out.agg(F.sum("cnt")).collect()[0][0]
    assert total == spark.read.parquet(f"{sf_dir}/events.parquet").count()
