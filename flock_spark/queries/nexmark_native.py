"""NEXMark q3/q4/q6/q7/q8/q9 over the NATIVE generated person/auction/bid
tables (reference SQL: /root/reference/benchmarks/src/nexmark/query/{q3,q4,
q6,q7,q8,q9}.sql, driven through flock/src/datasource/nexmark/queries/).

The sibling module queries/nexmark.py runs the same *shapes* over the
orders/lineitem analogs; these entries run the reference's actual semantics
over the actual generated schemas — in particular the q4/q6/q9 validity
window `b_date_time BETWEEN a_date_time AND expires` uses the generated
`expires` column, not a fixed offset.

Determinism note: the reference SQL ranks by raw (price) / (b_date_time)
alone; both have heavy ties in any NEXMark stream (1-second epochs, bounded
price space), so ROW_NUMBER there is engine-nondeterministic. Every window
here appends tie-breakers covering all emitted columns, so Spark and DuckDB
produce identical row values — the reference's results under a stable sort,
made reproducible.

Scale posture: bid⋈auction is the only large join (both sides shuffle on the
auction id — at 100 TB AQE handles the hot-auction skew these streams are
designed with, or pre-salt the build side); everything above it aggregates
or windows on keys that came out of that shuffle, and the scalar-max joins
broadcast single-row relations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from flock_spark.registry import register
from flock_spark.sources.nexmark_gen import _duck_nexmark, nexmark_table


def _valid_bids(spark: SparkSession) -> DataFrame:
    """bid ⋈ auction restricted to the auction's validity window
    (b_date_time BETWEEN a_date_time AND expires — q4.sql:8-9)."""
    b = nexmark_table(spark, "bid")
    a = nexmark_table(spark, "auction")
    return b.join(a, b.auction == a.a_id).filter(
        F.col("b_date_time").between(F.col("a_date_time"), F.col("expires"))
    )


_DUCK_VALID = f"""
      SELECT a.a_id, a.seller, a.category, b.price, b.bidder, b.b_date_time
      FROM ({_duck_nexmark("bid")}) b
      JOIN ({_duck_nexmark("auction")}) a ON b.auction = a.a_id
      WHERE b.b_date_time BETWEEN a.a_date_time AND a.expires"""


@register(
    "nexmark_native_q3",
    oracle=f"""
    SELECT p.name, p.city, p.state, a.a_id
    FROM ({_duck_nexmark("auction")}) a
    JOIN ({_duck_nexmark("person")}) p ON a.seller = p.p_id
    WHERE a.category = 10
      AND (p.state = 'or' OR p.state = 'id' OR p.state = 'ca')
    """,
    tags=("nexmark", "native", "join", "filter"),
    doc="NEXMark q3 (q3.sql): local-item auctions — category-10 auctions "
    "joined to sellers in OR/ID/CA. The person side is small (1/50 of "
    "events) and broadcast; both filters push below the join.",
)
def nexmark_native_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = nexmark_table(spark, "auction").filter(F.col("category") == 10)
    p = nexmark_table(spark, "person").filter(F.col("state").isin("or", "id", "ca"))
    return a.join(F.broadcast(p), a.seller == p.p_id).select(
        "name", "city", "state", "a_id"
    )


@register(
    "nexmark_native_q4",
    oracle=f"""
    SELECT category,
           CAST(sum(final) AS DOUBLE) / count(*) AS avg_final
    FROM (SELECT a_id, category, max(price) AS final
          FROM ({_DUCK_VALID}) v
          GROUP BY a_id, category) q
    GROUP BY category
    """,
    tags=("nexmark", "native", "join", "aggregate"),
    doc="NEXMark q4 (q4.sql): average winning-bid price per category, "
    "winning = max price within [a_date_time, expires]. Two-level agg: "
    "per-auction max (map-side partial), then per-category average. The "
    "integer sum/count division is spelled identically on both engines so "
    "the double is bit-equal.",
)
def nexmark_native_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_auction = (
        _valid_bids(spark)
        .groupBy("a_id", "category")
        .agg(F.max("price").alias("final"))
    )
    return per_auction.groupBy("category").agg(
        (F.sum("final").cast("double") / F.count("*")).alias("avg_final")
    )


@register(
    "nexmark_native_q6",
    oracle=f"""
    WITH winning AS (
      SELECT seller, a_id, price, b_date_time FROM (
        SELECT seller, a_id, price, b_date_time,
               row_number() OVER (PARTITION BY a_id
                                  ORDER BY price DESC, bidder, b_date_time) AS price_rank
        FROM ({_DUCK_VALID}) v) t
      WHERE price_rank = 1),
    ranked AS (
      SELECT seller, price,
             row_number() OVER (PARTITION BY seller
                                ORDER BY b_date_time DESC, price DESC, a_id) AS time_rank
      FROM winning)
    SELECT seller, CAST(sum(price) AS DOUBLE) / count(*) AS avg_price
    FROM ranked
    WHERE time_rank <= 10
    GROUP BY seller
    """,
    tags=("nexmark", "native", "window", "aggregate"),
    doc="NEXMark q6 (q6.sql): average selling price of each seller's last 10 "
    "closed auctions — double ROW_NUMBER (winning bid per auction within the "
    "validity window, then 10 most recent wins per seller) + per-seller "
    "average. Both windows partition on keys already co-located by the "
    "bid⋈auction shuffle.",
)
def nexmark_native_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    price_rank = F.row_number().over(
        W.partitionBy("a_id").orderBy(F.col("price").desc(), "bidder", "b_date_time")
    )
    winning = (
        _valid_bids(spark)
        .select("seller", "a_id", "price", "bidder", "b_date_time")
        .withColumn("price_rank", price_rank)
        .filter(F.col("price_rank") == 1)
    )
    time_rank = F.row_number().over(
        W.partitionBy("seller").orderBy(
            F.col("b_date_time").desc(), F.col("price").desc(), "a_id"
        )
    )
    return (
        winning.withColumn("time_rank", time_rank)
        .filter(F.col("time_rank") <= 10)
        .groupBy("seller")
        .agg((F.sum("price").cast("double") / F.count("*")).alias("avg_price"))
    )


@register(
    "nexmark_native_q7",
    oracle=f"""
    SELECT auction, price, bidder, b_date_time
    FROM ({_duck_nexmark("bid")}) b
    JOIN (SELECT max(price) AS maxprice FROM ({_duck_nexmark("bid")}) b2) m
      ON price = maxprice
    """,
    tags=("nexmark", "native", "join", "aggregate"),
    doc="NEXMark q7 (q7.sql): highest bid — bids joined against the global "
    "scalar max. The single-row aggregate broadcasts; the bid stream never "
    "shuffles.",
)
def nexmark_native_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = nexmark_table(spark, "bid")
    m = b.agg(F.max("price").alias("maxprice"))
    return b.join(F.broadcast(m), b.price == m.maxprice).select(
        "auction", "price", "bidder", "b_date_time"
    )


@register(
    "nexmark_native_q8",
    oracle=f"""
    SELECT p.p_id, p.name
    FROM (SELECT p_id, name FROM ({_duck_nexmark("person")}) p0 GROUP BY p_id, name) p
    JOIN (SELECT seller FROM ({_duck_nexmark("auction")}) a0 GROUP BY seller) a
      ON p.p_id = a.seller
    """,
    tags=("nexmark", "native", "join", "distinct"),
    doc="NEXMark q8 (q8.sql): monitor-new-users — persons who opened "
    "auctions, via distinct-person ⋈ distinct-seller. Both distincts are "
    "map-side partial; the join runs on the deduplicated (small) relations.",
)
def nexmark_native_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = nexmark_table(spark, "person").select("p_id", "name").distinct()
    a = nexmark_table(spark, "auction").select("seller").distinct()
    return p.join(a, p.p_id == a.seller).select("p_id", "name")


@register(
    "nexmark_native_q9",
    oracle=f"""
    SELECT auction, bidder, price, b_date_time
    FROM ({_duck_nexmark("bid")}) b
    JOIN (SELECT a_id AS id, max(price) AS final
          FROM ({_DUCK_VALID}) v
          GROUP BY a_id) q
      ON b.auction = q.id AND b.price = q.final
    """,
    tags=("nexmark", "native", "join", "aggregate"),
    doc="NEXMark q9 (q9.sql): winning bid per auction — bids joined back to "
    "the per-auction max over the validity window. Emits every bid tied at "
    "the winning price (the reference's own semantics: join, not rank).",
)
def nexmark_native_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = nexmark_table(spark, "bid")
    finals = (
        _valid_bids(spark)
        .groupBy(F.col("a_id").alias("id"))
        .agg(F.max("price").alias("final"))
    )
    return b.join(
        finals, (b.auction == finals.id) & (b.price == finals.final)
    ).select("auction", "bidder", "price", "b_date_time")
