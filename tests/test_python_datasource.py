"""Spark 4 Python DataSource API source (sources/python_datasource.py).

Semantics pinned here (beyond the oracle-parity sweep, which certifies the
aggregate values cross-engine):
- the batch reader really parallelizes: scan partition count == `parts`;
- the row universe is exactly [0, n) with no dup/drop across partitions;
- the streaming reader really runs MULTIPLE micro-batches with advancing
  offsets (not one availableNow gulp) and converges to the batch answer —
  batching-independence of the final aggregate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import flock_spark.sources.python_datasource as P


def _src(spark, n, parts):
    P._ensure_registered(spark)
    return (
        spark.read.format("flock_pyds")
        .option("n", n)
        .option("parts", parts)
        .load()
    )


def test_pyds_batch_partitions_and_universe(spark):
    df = _src(spark, 5_000, 4)
    assert df.rdd.getNumPartitions() == 4
    stats = df.agg(
        F.count("*").alias("n"),
        F.countDistinct("id").alias("nd"),
        F.min("id").alias("lo"),
        F.max("id").alias("hi"),
    ).first()
    assert (stats.n, stats.nd, stats.lo, stats.hi) == (5_000, 5_000, 0, 4_999)


def test_pyds_batch_generation_matches_jvm_md5(spark):
    """The Python-worker hashlib derivation equals Spark's own md5() — the
    portability contract the oracle relies on, checked inside one engine."""
    df = _src(spark, 1_000, 2)
    jvm_h = F.conv(F.substring(F.md5(F.concat(F.lit("pd"), F.col("id").cast("string"))), 1, 15), 16, 10).cast("long")
    mismatches = df.where(
        (F.concat(F.lit("c"), (jvm_h % P.N_CATEGORIES).cast("string")) != F.col("category"))
        | ((jvm_h % P.AMOUNT_MOD) != F.col("amount"))
    ).count()
    assert mismatches == 0


def test_pyds_stream_runs_multiple_microbatches(spark):
    """Drain the streaming source and assert the offset log shows >= 3
    micro-batches of STREAM_STEP rows each, and the final complete-mode
    aggregate equals the batch twin exactly."""
    P._ensure_registered(spark)
    stream = (
        spark.readStream.format("flock_pyds")
        .option("n", P.N_ROWS)
        .option("step", P.STREAM_STEP)
        .load()
    )
    agg = stream.groupBy("category").agg(F.count("*").alias("cnt"))
    q = (
        agg.writeStream.format("memory")
        .queryName("pyds_mb_test")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    finally:
        q.stop()
        q.awaitTermination(60)
    assert n_batches >= 3, f"expected multi-micro-batch drain, got {n_batches}"
    got = {r.category: r.cnt for r in spark.table("pyds_mb_test").collect()}
    want = {
        r.category: r.cnt
        for r in _src(spark, P.N_ROWS, P.N_PARTS)
        .groupBy("category")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert got == want
