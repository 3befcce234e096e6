"""As-of (temporal) join: each event matched to the most recent prior order
of the same customer.

Spark has no native AS OF join (SURVEY §2.3 'NOT implemented' in the
reference either), so both recommended fallbacks are provided — and both are
held to the *same* DuckDB oracle:

- asof_join_window   — composition of built-in ops: union orders (state
                       rows) with events (probe rows), sort within key, and
                       carry the latest order forward with last(ignoreNulls)
                       over an unbounded-preceding frame. One shuffle, one
                       sort, linear in |events| + |orders| — never the
                       event × prior-order product a naive join+ROW_NUMBER
                       formulation would materialize.
- asof_join_pandas   — applyInPandas + pandas.merge_asof per key cogroup:
                       same sort-merge idea executed in Arrow batches; the
                       variant to reach for when extra per-match Python
                       logic is needed.

Tie policy (pinned): latest o_orderdate wins; equal dates break to the
highest o_orderkey — pandas merge_asof picks the last row in sort order, so
the sort is (o_orderdate, o_orderkey) and the window orders DESC on both.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from flock_spark.catalog import tbl
from flock_spark.registry import register

_ASOF_ORACLE = """
SELECT event_id, user_id, ts, o_orderkey, o_orderdate
FROM (
  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e JOIN orders o
    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts) t
WHERE rn = 1
"""


@register(
    "asof_join_window",
    oracle=_ASOF_ORACLE,
    tags=("asof", "join"),
    doc="As-of join via union + carry-forward: order rows and event rows "
    "interleave in (key, time) order and last(o_orderkey, ignoreNulls) over "
    "an unbounded-preceding frame attaches the latest prior order to each "
    "event. Linear in |events|+|orders| with a single hash shuffle on the "
    "key — the plan survives dense keys where a join+rank formulation "
    "explodes into the event × prior-order product.",
)
def asof_join_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = tbl(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    # tag=0 sorts order rows before event rows at equal timestamps, making
    # the match inclusive (o_orderdate <= ts); ascending o_orderkey makes
    # "last" resolve equal-date ties to the highest orderkey.
    orders_t = o.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("tag"),
        "o_orderkey",
        "o_orderdate",
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
    events_t = e.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("tag"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("timestamp").alias("o_orderdate"),
        "event_id",
        "ts",
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("t", "tag", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    u = orders_t.unionByName(events_t)
    return (
        u.withColumn("m_orderkey", F.last("o_orderkey", ignorenulls=True).over(w))
        .withColumn("m_orderdate", F.last("o_orderdate", ignorenulls=True).over(w))
        .filter((F.col("tag") == 1) & F.col("m_orderkey").isNotNull())
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("m_orderkey").alias("o_orderkey"),
            F.col("m_orderdate").alias("o_orderdate"),
        )
    )


@register(
    "asof_join_pandas",
    oracle=_ASOF_ORACLE,
    tags=("asof", "join", "pandas"),
    doc="As-of join via applyInPandas + pd.merge_asof per user cogroup — "
    "Arrow-batched, linear per group; the scale path for dense keys.",
)
def asof_join_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = tbl(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    # semi-join the build side down to keys that actually have events —
    # cogroup invokes the UDF once per key in EITHER side, so unmatched
    # order keys would each pay a Python call for an empty result
    keys = e.select(F.col("user_id").alias("o_custkey")).distinct()
    o = o.join(F.broadcast(keys), "o_custkey", "left_semi")

    def merge(events_pdf: pd.DataFrame, orders_pdf: pd.DataFrame) -> pd.DataFrame:
        events_pdf = events_pdf.sort_values(["ts", "event_id"])
        # sort so merge_asof's "last match wins" implements the orderkey tie-break
        orders_pdf = orders_pdf.sort_values(["o_orderdate", "o_orderkey"])
        out = pd.merge_asof(
            events_pdf,
            orders_pdf,
            left_on="ts",
            right_on="o_orderdate",
            direction="backward",
            allow_exact_matches=True,
        )
        out = out.dropna(subset=["o_orderkey"])
        out["o_orderkey"] = out["o_orderkey"].astype("int64")
        return out[["event_id", "user_id", "ts", "o_orderkey", "o_orderdate"]]

    return (
        e.groupBy("user_id")
        .cogroup(o.groupBy("o_custkey"))
        .applyInPandas(
            merge,
            schema="event_id long, user_id long, ts timestamp, o_orderkey long, o_orderdate timestamp",
        )
    )


_ASOF_NEAREST_ORACLE = """
SELECT event_id, user_id, ts, o_orderkey, o_orderdate, matched_side
FROM (
  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
         CASE WHEN o.o_orderdate <= e.ts THEN 'backward' ELSE 'forward' END
           AS matched_side,
         row_number() OVER (
           PARTITION BY e.event_id
           ORDER BY abs(epoch_us(e.ts) - epoch_us(o.o_orderdate)),
                    CASE WHEN o.o_orderdate <= e.ts THEN 0 ELSE 1 END,
                    CASE WHEN o.o_orderdate <= e.ts THEN -o.o_orderkey
                         ELSE o.o_orderkey END) AS rn
  FROM events e JOIN orders o ON e.user_id = o.o_custkey) t
WHERE rn = 1
"""


@register(
    "asof_join_nearest",
    oracle=_ASOF_NEAREST_ORACLE,
    tags=("asof", "join"),
    doc="NEAREST-match as-of join (pandas merge_asof direction='nearest' "
    "semantics): each event takes the order of the same customer closest "
    "in time on EITHER side, exact-microsecond distance, ties resolved "
    "backward-first then (backward: highest / forward: lowest) orderkey "
    "— a pinned total order, so the match is deterministic. Lowered to "
    "the SAME single union + carry pass as asof_join_window, just with "
    "BOTH directional carries in one window sort (last ignoreNulls over "
    "preceding = latest prior; first ignoreNulls over following = "
    "earliest later) and a constant-time distance compare per event — "
    "still linear in |events|+|orders| with ONE keyed shuffle, where "
    "the oracle's join+rank formulation builds the event × order "
    "product per customer. Distances compare as integer unix "
    "MICROSECONDS on both engines (the events_pattern_3step precision "
    "discipline — interval or second-floored arithmetic would diverge).",
)
def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = tbl(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    orders_t = o.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("tag"),
        "o_orderkey",
        "o_orderdate",
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
    events_t = e.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("tag"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("timestamp").alias("o_orderdate"),
        "event_id",
        "ts",
    )
    base = W.partitionBy("user_id").orderBy("t", "tag", "o_orderkey")
    wb = base.rowsBetween(W.unboundedPreceding, W.currentRow)
    wf = base.rowsBetween(1, W.unboundedFollowing)
    u = orders_t.unionByName(events_t)
    c = (
        u.withColumn("bk", F.last("o_orderkey", ignorenulls=True).over(wb))
        .withColumn("bd", F.last("o_orderdate", ignorenulls=True).over(wb))
        .withColumn("fk", F.first("o_orderkey", ignorenulls=True).over(wf))
        .withColumn("fd", F.first("o_orderdate", ignorenulls=True).over(wf))
        .filter(F.col("tag") == 1)
    )
    d_back = F.abs(F.unix_micros("ts") - F.unix_micros("bd"))
    d_fwd = F.abs(F.unix_micros("fd") - F.unix_micros("ts"))
    take_back = F.col("bd").isNotNull() & (F.col("fd").isNull() | (d_back <= d_fwd))
    return (
        c.filter(F.col("bd").isNotNull() | F.col("fd").isNotNull())
        .select(
            "event_id",
            "user_id",
            "ts",
            F.when(take_back, F.col("bk")).otherwise(F.col("fk")).alias("o_orderkey"),
            F.when(take_back, F.col("bd")).otherwise(F.col("fd")).alias("o_orderdate"),
            F.when(take_back, F.lit("backward"))
            .otherwise(F.lit("forward"))
            .alias("matched_side"),
        )
    )


ASOF_TOLERANCE_DAYS = 30


@register(
    "asof_join_tolerance",
    oracle=f"""
    SELECT e.event_id, e.user_id, e.ts, m.o_orderkey, m.o_orderdate
    FROM events e LEFT JOIN (
      SELECT event_id, o_orderkey, o_orderdate
      FROM (
        SELECT e.event_id, o.o_orderkey, o.o_orderdate,
               row_number() OVER (PARTITION BY e.event_id
                                  ORDER BY o.o_orderdate DESC,
                                           o.o_orderkey DESC) AS rn
        FROM events e JOIN orders o
          ON e.user_id = o.o_custkey
         AND o.o_orderdate <= e.ts
         AND e.ts <= o.o_orderdate + INTERVAL {ASOF_TOLERANCE_DAYS} DAY) t
      WHERE rn = 1) m ON e.event_id = m.event_id
    """,
    tags=("asof", "join"),
    doc=f"As-of join with a STALENESS TOLERANCE (pandas merge_asof's "
    f"tolerance parameter): the latest prior order matches only if it is "
    f"at most {ASOF_TOLERANCE_DAYS} days old at event time; staler state "
    "yields NULL (left-join semantics keep every probe row) — the form "
    "enrichment joins actually ship, because unbounded lookback silently "
    "attaches years-stale dimension state (the bug asof_join_window's "
    "unbounded carry would hide). Same single union + carry-forward "
    "window pass — the tolerance is a post-carry filter, NOT a join "
    "predicate, so the plan stays linear with one keyed shuffle; the "
    "oracle's join+rank formulation carries the tolerance in the "
    "quadratic join to prove both forms agree. Full-precision INTERVAL "
    "comparison on both engines.",
)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = tbl(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    orders_t = o.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("tag"),
        "o_orderkey",
        "o_orderdate",
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
    events_t = e.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("tag"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("timestamp").alias("o_orderdate"),
        "event_id",
        "ts",
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("t", "tag", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    u = orders_t.unionByName(events_t)
    carried = (
        u.withColumn("m_orderkey", F.last("o_orderkey", ignorenulls=True).over(w))
        .withColumn("m_orderdate", F.last("o_orderdate", ignorenulls=True).over(w))
        .filter(F.col("tag") == 1)
    )
    fresh = F.col("ts") <= F.col("m_orderdate") + F.expr(
        f"INTERVAL {ASOF_TOLERANCE_DAYS} DAY"
    )
    return carried.select(
        "event_id",
        "user_id",
        "ts",
        F.when(fresh, F.col("m_orderkey")).alias("o_orderkey"),
        F.when(fresh, F.col("m_orderdate")).alias("o_orderdate"),
    )
