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
