"""Incremental-maintenance semantics (operators/incremental.py).

The registry oracles already prove each operator equals a raw-table DuckDB
query; these tests pin the *incremental* properties the oracles can't see:
that the daily rollup really is a merge of the hourly partial (not a
rescan), and that compaction is idempotent (re-compacting a snapshot is a
no-op — the CDC guarantee that makes at-least-once replays safe).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flock_spark.catalog import tbl
from flock_spark.operators.incremental import (
    _hourly_partial,
    cdc_upsert_latest,
    rollup_reuse_daily,
)


def test_daily_rollup_equals_direct_recompute(spark, sf_dir):
    # partial-merge (hourly → daily) must be bit-identical to aggregating
    # the raw table in one pass: integer micro-unit partials are associative
    direct = (
        tbl(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            (
                F.sum(F.expr("CAST(round(value * 1000000) AS BIGINT)")).cast("double")
                / 1000000.0
            ).alias("total_value"),
        )
    )
    derived = rollup_reuse_daily(spark, sf_dir)
    assert derived.exceptAll(direct).count() == 0
    assert direct.exceptAll(derived).count() == 0


def test_daily_rollup_reads_partial_not_raw(spark, sf_dir):
    # the daily input is the hourly partial, whose size is bounded by the
    # time span (31 days × 24 h) × |event types| — a constant in the data's
    # clock, not in its row count. Raw events grow with SF; the partial
    # doesn't (868 rows at sf0.001, ~3.4k at sf0.01, ~3.6k forever after).
    n_raw = tbl(spark, sf_dir, "events").count()
    n_partial = _hourly_partial(spark, sf_dir).count()
    n_types = 5
    assert n_partial <= 31 * 24 * n_types
    assert n_partial < n_raw


def test_compaction_is_idempotent(spark, sf_dir):
    # re-compacting the snapshot (as a new change log with one version per
    # key) returns the same snapshot — at-least-once replays are safe
    snap = cdc_upsert_latest(spark, sf_dir)
    replay = (
        snap.select(
            F.monotonically_increasing_id().alias("event_id"),
            F.col("last_ts").alias("ts"),
            "user_id",
            "event_type",
            F.col("last_value").alias("value"),
            F.lit("{}").alias("props"),
        )
    )
    replay.createOrReplaceTempView("replay_events")
    recompacted = (
        replay.withColumn(
            "rn",
            F.expr(
                "row_number() OVER (PARTITION BY user_id, event_type"
                " ORDER BY ts DESC, event_id DESC)"
            ),
        )
        .filter("rn = 1")
        .select("user_id", "event_type", "ts", "value")
    )
    original = snap.select(
        "user_id", "event_type", F.col("last_ts").alias("ts"),
        F.col("last_value").alias("value"),
    )
    assert recompacted.exceptAll(original).count() == 0
    assert original.exceptAll(recompacted).count() == 0


def test_compaction_keys_are_unique(spark, sf_dir):
    snap = cdc_upsert_latest(spark, sf_dir)
    assert (
        snap.groupBy("user_id", "event_type").count().filter("count > 1").count() == 0
    )
