"""As-of (temporal) join: each event matched to the most recent prior order
of the same customer.

Spark has no native AS OF join (SURVEY §2.3 'NOT implemented' in the
reference either), so both recommended fallbacks are provided — and both are
held to the *same* DuckDB oracle:

- asof_join_window   — composition of built-in ops: equi-join on the key,
                       filter to prior orders, ROW_NUMBER pick of the latest.
                       Best when per-key match lists are short.
- asof_join_pandas   — applyInPandas + pandas.merge_asof per key group:
                       sort-merge semantics, linear in group size. The scale
                       path when each key has many events AND many orders
                       (the window variant would materialize the full
                       event × prior-order product before ranking).

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
    doc="As-of join via equi-join + ROW_NUMBER (composition of built-ins; "
    "single shuffle on the key).",
)
def asof_join_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events")
    o = tbl(spark, sf_dir, "orders")
    j = e.join(o, (e.user_id == o.o_custkey) & (o.o_orderdate <= e.ts))
    w = W.partitionBy("event_id").orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "ts", "o_orderkey", "o_orderdate")
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
