"""Core relational operator coverage (SURVEY.md §2.2–§2.8).

Each entry maps a reference operator family to its Spark-first expression:
projections/filters (ProjectionExec/FilterExec — reference
flock/src/distributed_plan/planner.rs:90,122-124), hash aggregation
(HashAggregateExec partial/final — stage.rs:277-306), hash joins
(planner.rs:169,239), analytic window functions (nexmark q6 —
benchmarks/src/nexmark/query/q6.sql), sorts/limits (stage.rs:630-656), plus
the set ops / grouping sets / pivot surface Spark adds for free.

Cross-engine exactness conventions (see registry.py): money aggregates go
through DECIMAL(38,4) so sums are exact and order-insensitive on both engines;
per-row double arithmetic is IEEE-deterministic and left raw; order-dependent
double window aggregates are rounded to 4 decimals on both sides.

Scale posture: every query is a declarative plan — Catalyst pushes filters
into the parquet scan, prunes columns, does partial aggregation map-side, and
AQE picks broadcast vs shuffled joins at runtime. Nothing here collects to the
driver or loops over rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from flock_spark.catalog import tbl
from flock_spark.registry import REGISTRY, register


def dsum(expr: str) -> str:
    """Exact (engine-portable) sum of a money/metric expression.

    Doubles are quantized to DECIMAL(38,6) before summing, making the sum an
    exact integer computation with identical results on Spark and DuckDB
    regardless of addition order. Valid in both SQL dialects verbatim.

    Scale 6 matters: source money columns have ≤2 decimals, so products of up
    to three of them have ≤6 true decimals — every value lands exactly on a
    representable decimal and the double→decimal cast never hits a rounding
    tie (where Spark's HALF_UP and DuckDB could disagree).
    """
    return f"sum(CAST(({expr}) AS DECIMAL(38,6)))"


def dsumd(expr: str) -> str:
    """Exact decimal accumulation with a DOUBLE output boundary.

    DECIMAL stays internal: the sum is computed exactly (order-insensitive,
    petascale-safe 38-digit accumulation) and the single final value is cast
    to DOUBLE, which both engines serialize identically. No query may emit a
    DECIMAL-typed output column — engines disagree on decimal wire
    representation even when values match (round-1 driver hash-fails)."""
    return f"CAST({dsum(expr)} AS DOUBLE)"


def davg(expr: str) -> str:
    """Exact-sum-based average: deterministic double on both engines."""
    return f"(CAST({dsum(expr)} AS DOUBLE) / count({expr}))"


def fsum(expr: str) -> str:
    """Fixed-point exact sum: quantize to integer micro-units, sum as BIGINT
    (whole-stage-codegen long arithmetic — ~3× faster than the DECIMAL(38,6)
    path), then rescale to DOUBLE. The BIGINT sum is identical on both
    engines, so the final double is bit-identical too.

    Overflow bound: |sum(x)| * 1e6 < 2^63 → valid while the group's absolute
    sum stays under ~9.2e12. Headline TPC-H aggregates at any driver SF are
    orders of magnitude below it; for petascale global sums use dsum (decimal
    accumulates to 38 digits).
    """
    return f"(CAST(sum(CAST(round(({expr}) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0)"


def favg(expr: str) -> str:
    """Fixed-point exact average (see fsum); deterministic double."""
    return f"({fsum(expr)} / count({expr}))"


# ---------------------------------------------------------------------------
# Projections / filters / scalar expressions
# ---------------------------------------------------------------------------


@register(
    "proj_arith",
    oracle="""
    SELECT event_id, user_id, value * 0.908 AS price, ts
    FROM events
    """,
    tags=("projection",),
    doc="Scalar projection with arithmetic (ProjectionExec; nexmark q1 shape).",
)
def proj_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tbl(spark, sf_dir, "events").select(
        "event_id", "user_id", (F.col("value") * 0.908).alias("price"), "ts"
    )


@register(
    "filter_mod",
    oracle="""
    SELECT event_id, user_id, value
    FROM events
    WHERE event_id % 123 = 0
    """,
    tags=("filter",),
    doc="Modulo predicate filter (FilterExec; nexmark q2 shape).",
)
def filter_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        tbl(spark, sf_dir, "events")
        .filter(F.col("event_id") % 123 == 0)
        .select("event_id", "user_id", "value")
    )


@register(
    "filter_complex",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_totalprice BETWEEN 50000 AND 200000
      AND (o_orderstatus = 'O' OR o_orderpriority LIKE '1%')
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    """,
    tags=("filter",),
    doc="Compound predicate: BETWEEN + OR + LIKE + timestamp bound, all pushed to the scan.",
)
def filter_complex(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_totalprice").between(50000, 200000)
        & ((F.col("o_orderstatus") == "O") | F.col("o_orderpriority").like("1%"))
        & (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_totalprice", "o_orderpriority")


@register(
    "string_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_mktsegment)                       AS seg_upper,
           substring(c_name, 10, 9)                  AS name_digits,
           length(c_name)                            AS name_len,
           concat(c_mktsegment, '#', c_name)         AS tagged,
           replace(c_name, 'Customer', 'C')          AS short_name,
           trim('  pad  ')                           AS trimmed
    FROM customer
    """,
    tags=("scalar",),
    doc="String scalar surface: upper/substring/length/concat/replace/trim.",
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tbl(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_upper"),
        F.substring("c_name", 10, 9).alias("name_digits"),
        F.length("c_name").cast("long").alias("name_len"),
        F.concat(F.col("c_mktsegment"), F.lit("#"), F.col("c_name")).alias("tagged"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("C")).alias("short_name"),
        F.trim(F.lit("  pad  ")).alias("trimmed"),
    )


@register(
    "date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT)               AS o_year,
           CAST(month(o_orderdate) AS BIGINT)              AS o_month,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT) AS days_since,
           o_orderdate + INTERVAL 30 DAY                   AS due_date
    FROM orders
    """,
    tags=("scalar", "datetime"),
    doc="Datetime scalar surface: extract/trunc/diff/interval arithmetic "
    "(reference TPC-H SQL uses EXTRACT and date arithmetic — flock/src/datasource/tpch/queries).",
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("o_year"),
        F.month("o_orderdate").cast("long").alias("o_month"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).cast("long").alias("days_since"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
    )


@register(
    "math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           sqrt(l_extendedprice)            AS price_sqrt,
           abs(l_extendedprice - 50000.0)   AS price_dev,
           ceil(l_discount * 100)           AS disc_pct_ceil,
           floor(l_extendedprice / 1000)    AS price_k,
           l_extendedprice * l_discount     AS disc_amount,
           l_quantity * l_quantity          AS qty_sq
    FROM lineitem
    """,
    tags=("scalar", "math"),
    doc="Math scalar surface (IEEE-exact ops only: sqrt/abs/ceil/floor/round).",
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = tbl(spark, sf_dir, "lineitem")  # noqa: E741
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.abs(F.col("l_extendedprice") - 50000.0).alias("price_dev"),
        F.ceil(F.col("l_discount") * 100).cast("double").alias("disc_pct_ceil"),
        F.floor(F.col("l_extendedprice") / 1000).cast("double").alias("price_k"),
        (F.col("l_extendedprice") * F.col("l_discount")).alias("disc_amount"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
    )


@register(
    "case_when",
    oracle="""
    SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
                WHEN o_totalprice < 300000 THEN 'medium'
                ELSE 'large' END AS bucket,
           count(*) AS cnt
    FROM orders
    GROUP BY 1
    """,
    tags=("scalar", "aggregate"),
    doc="CASE WHEN bucketing + count.",
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 100000, "small")
        .when(F.col("o_totalprice") < 300000, "medium")
        .otherwise("large")
        .alias("bucket")
    )
    return o.groupBy(bucket).agg(F.count("*").alias("cnt"))


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.4)
# ---------------------------------------------------------------------------


@register(
    "agg_basic",
    oracle=f"""
    SELECT event_type,
           count(*)                       AS cnt,
           {dsumd('value')}               AS sum_value,
           {davg('value')}                AS avg_value,
           min(ts)                        AS first_ts,
           max(ts)                        AS last_ts
    FROM events
    GROUP BY event_type
    """,
    tags=("aggregate",),
    doc="Grouped aggregate: count/sum/avg/min/max (nexmark q11 shape; "
    "two-phase partial→final agg is automatic in Spark — reference splits "
    "stages at HashAggregateExec Final, stage.rs:277-306).",
)
def agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.expr(dsumd("value")).alias("sum_value"),
        F.expr(davg("value")).alias("avg_value"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


@register(
    "agg_count_distinct",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS uniq_users,
           count(*)                AS cnt
    FROM events
    GROUP BY event_type
    """,
    tags=("aggregate",),
    doc="COUNT(DISTINCT) per group (reference rewrites to two-level agg — "
    "stage.rs:528-543; Catalyst's Expand rewrite is equivalent).",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("uniq_users"),
        F.count("*").alias("cnt"),
    )


@register(
    "agg_having",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 12
    """,
    tags=("aggregate",),
    doc="GROUP BY + HAVING (post-aggregation filter).",
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(F.count("*").alias("n_orders")).filter(F.col("n_orders") >= 12)


@register(
    "distinct_select",
    oracle="""
    SELECT DISTINCT event_type, user_id % 10 AS user_bucket
    FROM events
    """,
    tags=("aggregate", "distinct"),
    doc="SELECT DISTINCT over computed columns.",
)
def distinct_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events")
    return e.select("event_type", (F.col("user_id") % 10).alias("user_bucket")).distinct()


@register(
    "rollup_agg",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
           {dsumd('l_quantity')} AS sum_qty,
           count(*) AS cnt
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("aggregate", "rollup"),
    doc="ROLLUP grouping sets with GROUPING() indicators (not in the reference "
    "surface — SURVEY §2.4 notes cube/rollup as Spark-native extensions).",
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = tbl(spark, sf_dir, "lineitem")  # noqa: E741
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        F.expr(dsumd("l_quantity")).alias("sum_qty"),
        F.count("*").alias("cnt"),
    )


@register(
    "cube_agg",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           {dsumd('o_totalprice')} AS sum_price,
           count(*) AS cnt
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("aggregate", "cube"),
    doc="CUBE grouping sets.",
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.expr(dsumd("o_totalprice")).alias("sum_price"),
        F.count("*").alias("cnt"),
    )


@register(
    "pivot_agg",
    oracle=f"""
    SELECT l_returnflag,
           {dsumd("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_open,
           {dsumd("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_filled
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("aggregate", "pivot"),
    doc="Pivot (wide aggregation); oracle phrased as CASE-WHEN sums.",
)
def pivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = tbl(spark, sf_dir, "lineitem")  # noqa: E741
    out = (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.expr(dsum("l_quantity")))
    )
    return out.select(
        "l_returnflag",
        F.col("O").cast("double").alias("qty_open"),
        F.col("F").cast("double").alias("qty_filled"),
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.3)
# ---------------------------------------------------------------------------


@register(
    "join_inner",
    oracle="""
    SELECT o_orderkey, c_custkey, c_mktsegment, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderstatus = 'O'
    """,
    tags=("join",),
    doc="Partitioned inner equi-join (HashJoinExec — planner.rs:169); Catalyst/AQE "
    "picks broadcast vs sort-merge by size.",
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    c = tbl(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "c_custkey", "c_mktsegment", "o_totalprice"
    )


@register(
    "join_broadcast_dim",
    oracle="""
    SELECT n_name, count(*) AS cnt
    FROM events JOIN nation ON user_id % 25 = n_nationkey
    GROUP BY n_name
    """,
    tags=("join", "broadcast"),
    doc="Broadcast join against a small dimension (side-input join, nexmark q13 "
    "shape — reference loads side input per-function, actor.rs:575-629; Spark "
    "broadcasts the dim to every executor instead).",
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events")
    n = tbl(spark, sf_dir, "nation")
    return (
        e.join(F.broadcast(n), e.user_id % 25 == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "join_left_outer",
    oracle=f"""
    SELECT c_custkey,
           count(o_orderkey)                              AS n_orders,
           coalesce({dsumd('o_totalprice')}, 0.0)         AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
    tags=("join", "outer"),
    doc="Left outer join + null-aware aggregation (not in reference surface — "
    "SURVEY §2.3 'NOT implemented'; Spark-native).",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    joined = c.join(o, c.c_custkey == o.o_custkey, "left")
    return joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("n_orders"),
        F.coalesce(F.expr(dsumd("o_totalprice")), F.lit(0.0)).alias("total_spend"),
    )


@register(
    "join_full_outer",
    oracle="""
    SELECT coalesce(cn.nk, sn.nk) AS nationkey,
           coalesce(cn.n_cust, 0) AS n_cust,
           coalesce(sn.n_supp, 0) AS n_supp
    FROM (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1) cn
    FULL OUTER JOIN (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1) sn
      ON cn.nk = sn.nk
    """,
    tags=("join", "outer"),
    doc="Full outer join of two aggregates with coalesce.",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cn = (
        tbl(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_cust"))
    )
    sn = (
        tbl(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_supp"))
    )
    j = cn.join(sn, "nk", "full_outer")
    return j.select(
        F.col("nk").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
    tags=("join", "semi"),
    doc="Left-semi join (EXISTS).",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_mktsegment")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
    """,
    tags=("join", "anti"),
    doc="Left-anti join (NOT EXISTS) — customers with no high-value order. "
    "The unfiltered variant was provably vacuous on this corpus (every "
    "custkey appears among ~10x as many orders), so its green row verified "
    "an empty set; the join-side filter (mirroring join_semi's) makes the "
    "anti set real (~13% of customers).",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_range_theta",
    oracle="""
    SELECT o_orderstatus, count(*) AS cnt
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate BETWEEN o_orderdate AND o_orderdate + INTERVAL 60 DAY
    GROUP BY o_orderstatus
    """,
    tags=("join", "range"),
    doc="Equi-join + range (BETWEEN) residual predicate — the reference plans "
    "this as FilterExec above HashJoinExec (planner.rs:236-239, nexmark q4/q6/q9); "
    "Spark produces the same shape (join condition + post-filter).",
)
def join_range_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = tbl(spark, sf_dir, "lineitem")  # noqa: E741
    o = tbl(spark, sf_dir, "orders")
    j = l.join(o, l.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate").between(F.col("o_orderdate"), F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    )
    return j.groupBy("o_orderstatus").agg(F.count("*").alias("cnt"))


# 7 days in seconds: the bin width for the point-in-interval join below.
_RANGE_BIN_S = 7 * 86400


@register(
    "join_range_binned",
    oracle="""
    WITH iv AS (SELECT o_orderkey, o_orderdate AS start_ts,
                       o_orderdate + INTERVAL 7 DAY AS end_ts
                FROM orders
                ORDER BY o_totalprice DESC, o_orderkey LIMIT 100)
    SELECT iv.o_orderkey,
           count(*) AS n_pts,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM iv JOIN lineitem ON l_shipdate BETWEEN start_ts AND end_ts
    GROUP BY iv.o_orderkey
    """,
    tags=("join", "range", "scale-pattern"),
    doc="Pure interval join (NO equi key) lowered to an equi-join on time "
    "bins: intervals explode to every 7-day bin they overlap, points map to "
    "exactly one bin, the join runs on bin_id with the BETWEEN residual "
    "applied after. Because each point has a unique bin and every interval "
    "covers that bin at most once, no pair can match twice — no dedup pass. "
    "This is the range-join optimization DBR applies automatically and the "
    "reference's theta-join path lacks (planner.rs:236-239 only handles "
    "equi+residual): a naive point-in-interval join is a broadcast "
    "nested-loop at best, O(|points|·|intervals|); the binned lowering is a "
    "shuffle hash join on bin_id — linear, partitionable, and skew-handled "
    "by AQE at 100 TB. Oracle is the naive inequality join (DuckDB IEJoin).",
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders")
    # interval build: top-100 high-value orders define 7-day promo windows
    iv = (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
        .select(
            "o_orderkey",
            F.col("o_orderdate").alias("start_ts"),
            (F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")).alias("end_ts"),
        )
    )
    # explode each interval onto the 7-day bins it overlaps (≤2 here; an
    # interval spanning k bins emits k rows — growth is len/bin_width, O(1))
    iv_binned = iv.select(
        "o_orderkey",
        "start_ts",
        "end_ts",
        F.explode(
            F.sequence(
                (F.unix_timestamp("start_ts") / _RANGE_BIN_S).cast("bigint"),
                (F.unix_timestamp("end_ts") / _RANGE_BIN_S).cast("bigint"),
            )
        ).alias("bin_id"),
    )
    pts = tbl(spark, sf_dir, "lineitem").select(
        "l_shipdate",
        "l_extendedprice",
        (F.unix_timestamp("l_shipdate") / _RANGE_BIN_S).cast("bigint").alias("bin_id"),
    )
    j = pts.join(iv_binned, "bin_id").filter(
        F.col("l_shipdate").between(F.col("start_ts"), F.col("end_ts"))
    )
    return j.groupBy("o_orderkey").agg(
        F.count("*").alias("n_pts"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias("revenue_cents"),
    )


@register(
    "join_self_agg_max",
    oracle="""
    SELECT user_id, num
    FROM (SELECT user_id, count(*) AS num FROM events GROUP BY user_id) ub
    JOIN (SELECT max(num) AS maxn
          FROM (SELECT user_id, count(*) AS num FROM events GROUP BY user_id) x) mx
      ON num = maxn
    """,
    tags=("join", "aggregate"),
    doc="Self-join of aggregates against global max (nexmark q5 'hot items' — "
    "benchmarks/src/nexmark/query/q5.sql).",
)
def join_self_agg_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events")
    counts = e.groupBy("user_id").agg(F.count("*").alias("num"))
    mx = counts.agg(F.max("num").alias("maxn"))
    return counts.join(F.broadcast(mx), counts.num == mx.maxn).select("user_id", "num")


@register(
    "join_global_max",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    JOIN (SELECT max(l_extendedprice) AS maxprice FROM lineitem) m
      ON l_extendedprice = maxprice
    """,
    tags=("join", "aggregate"),
    doc="Join against a global scalar aggregate (nexmark q7 'highest bid' — "
    "benchmarks/src/nexmark/query/q7.sql). Scalar side is broadcast.",
)
def join_global_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = tbl(spark, sf_dir, "lineitem")  # noqa: E741
    m = l.agg(F.max("l_extendedprice").alias("maxprice"))
    return l.join(F.broadcast(m), l.l_extendedprice == m.maxprice).select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )


@register(
    "join_cross",
    oracle="""
    SELECT a.r_name AS from_region, b.r_name AS to_region
    FROM region a CROSS JOIN region b
    WHERE a.r_regionkey <> b.r_regionkey
    """,
    tags=("join", "cross"),
    doc="Cross join (small×small) with inequality filter.",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = tbl(spark, sf_dir, "region")
    a = r.select(F.col("r_regionkey").alias("ak"), F.col("r_name").alias("from_region"))
    b = r.select(F.col("r_regionkey").alias("bk"), F.col("r_name").alias("to_region"))
    return a.crossJoin(b).filter(F.col("ak") != F.col("bk")).select("from_region", "to_region")


@register(
    "join_shuffle_hash_hint",
    oracle=f"""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_items,
           {fsum('l_extendedprice')} AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    """,
    tags=("join", "scale-pattern"),
    doc="Large-large equi-join forced to SHUFFLED HASH via the "
    "SHUFFLE_HASH hint (plan-pinned in tests/test_plans.py). Spark "
    "defaults large-large joins to sort-merge; when the build side's "
    "per-partition share fits executor memory, shuffled-hash skips BOTH "
    "sorts — O(n) probe instead of O(n log n) per partition — and at "
    "100 TB that is the cheaper plan whenever the smaller side is still "
    "too big to broadcast but partitions evenly (orders vs lineitem is "
    "exactly that shape: ~1:4, uniform orderkey). AQE only converts "
    "SMJ→SHJ under narrow conditions, so the hint is how a user pins it. "
    "Values identical to the unhinted join — the oracle is hint-free, so "
    "the green row certifies the strategy swap changes nothing.",
)
def join_shuffle_hash_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = tbl(spark, sf_dir, "lineitem")  # noqa: E741
    o = tbl(spark, sf_dir, "orders")
    j = l.join(o.hint("SHUFFLE_HASH"), l.l_orderkey == o.o_orderkey)
    return j.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_items"),
        F.expr(fsum("l_extendedprice")).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Analytic window functions (SURVEY §2.5)
# ---------------------------------------------------------------------------


@register(
    "window_rownum_topk",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice, rn
    FROM (SELECT p_brand, p_partkey, p_retailprice,
                 CAST(row_number() OVER (PARTITION BY p_brand
                                         ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS rn
          FROM part) t
    WHERE rn <= 3
    """,
    tags=("window",),
    doc="Top-k per group via ROW_NUMBER (nexmark q6 shape — q6.sql:6-16).",
)
def window_rownum_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = tbl(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    return (
        p.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rn")
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT event_id, user_id,
           CAST(sum(CAST(value AS DECIMAL(38,6))) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                                        ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
    FROM events
    """,
    tags=("window",),
    doc="Running sum over an ordered row frame (exact decimal accumulation — "
    "sliding-window double sums differ across engines' frame algorithms).",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    return e.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(38,6)")).over(w).cast("double").alias("running_value"),
    )


@register(
    "window_range_frame_sum",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                               RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS n_within_1k,
           CAST(sum(CAST(o_totalprice AS DECIMAL(38,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                      RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS sum_within_1k
    FROM orders
    """,
    tags=("window", "frame"),
    doc="RANGE window frame (value-based bounds, not row counts): per "
    "customer, the count and exact-decimal sum of orders priced within "
    "1000 below the current order — peers with equal order-key values "
    "share a frame, which ROWS frames cannot express. Completes the frame "
    "surface next to the ROWS entries (window_running_sum, "
    "window_frame_moving_avg).",
)
def window_range_frame_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the DataFrame API's rangeBetween takes integer offsets only; the
    # fractional value bound needs the SQL frame syntax (shared verbatim
    # with the oracle — RANGE frames are ANSI)
    tbl(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(REGISTRY["window_range_frame_sum"].oracle)


@register(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           lag(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value,
           CAST(datediff('second', ts,
                lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS BIGINT) AS gap_sec
    FROM events
    """,
    tags=("window",),
    doc="LAG/LEAD navigation + inter-event gap.",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.unix_timestamp(F.lead("ts").over(w)) - F.unix_timestamp("ts")).alias("gap_sec"),
    )


@register(
    "window_rank_dense",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(rank()       OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC) AS BIGINT) AS qty_rank,
           CAST(dense_rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity DESC) AS BIGINT) AS qty_dense
    FROM lineitem
    WHERE l_orderkey % 97 = 0
    """,
    tags=("window",),
    doc="RANK / DENSE_RANK with ties.",
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = tbl(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 97 == 0)  # noqa: E741
    w = W.partitionBy("l_returnflag").orderBy(F.col("l_quantity").desc())
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.rank().over(w).cast("long").alias("qty_rank"),
        F.dense_rank().over(w).cast("long").alias("qty_dense"),
    )


@register(
    "window_frame_moving_avg",
    oracle="""
    SELECT event_id, user_id,
           (CAST(sum(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE)
            / count(*) OVER w) AS mavg_10
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
    """,
    tags=("window",),
    doc="Moving average over a bounded row frame (ROWS BETWEEN 10 PRECEDING — "
    "reference q6 Flink variant, flock/src/datasource/nexmark/queries/q6.sql:12-13). "
    "Exact decimal numerator; double division is deterministic.",
)
def window_frame_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-9, W.currentRow)
    mavg = F.sum(F.col("value").cast("decimal(38,6)")).over(w).cast("double") / F.count(F.lit(1)).over(w)
    return e.select("event_id", "user_id", mavg.alias("mavg_10"))


@register(
    "window_percentiles",
    oracle="""
    SELECT c_custkey,
           CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS BIGINT) AS bal_quartile,
           percent_rank() OVER (ORDER BY c_acctbal, c_custkey) AS bal_pct
    FROM customer
    """,
    tags=("window",),
    doc="NTILE + PERCENT_RANK (global ordering). Scale posture: a "
    "semantically global ranking needs a global order, and this direct "
    "form runs it as one unpartitioned window — the ONLY registry entry "
    "that windows an unpartitioned full base table. At 100 TB use "
    "window_percentiles_twopass (same output, driver-verified equal via "
    "the shared oracle): bin-partitioned rank + broadcast bin offsets, "
    "no single-partition pass over the data.",
)
def window_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tbl(spark, sf_dir, "customer")
    w = W.orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        F.ntile(4).over(w).cast("long").alias("bal_quartile"),
        F.percent_rank().over(w).alias("bal_pct"),
    )


@register(
    "window_percentiles_twopass",
    oracle="""
    SELECT c_custkey,
           CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS BIGINT) AS bal_quartile,
           percent_rank() OVER (ORDER BY c_acctbal, c_custkey) AS bal_pct
    FROM customer
    """,
    tags=("window", "scale-pattern"),
    doc="Scale-safe twin of window_percentiles: identical output (global "
    "NTILE(4) + PERCENT_RANK over customer) with NO unpartitioned "
    "full-table window. Two-pass distributed rank: (1) bin rows by "
    "floor(c_acctbal/100) and count per bin — the cumulative-offset window "
    "runs over the ~bin-count-sized aggregate only; (2) rank within each "
    "bin (window PARTITIONED by bin — parallel, spill-free) and add the "
    "broadcast bin offset for the exact global rank. NTILE/PERCENT_RANK "
    "are then closed-form in the rank: ntile's unequal-bucket rule "
    "(first n%4 tiles get one extra row) is reproduced exactly, and the "
    "(c_acctbal, c_custkey) order is unique so percent_rank = "
    "(r-1)/(n-1). This is the production shape for global ranking at "
    "100 TB — the base table never passes through a single partition. "
    "Oracle is the same global-window SQL as window_percentiles, so the "
    "driver-green row doubles as an equivalence proof of the two forms.",
)
def window_percentiles_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tbl(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    binned = c.withColumn("bin", F.floor(F.col("c_acctbal") / 100).cast("long"))

    # pass 1: per-bin counts; the running-offset window is over ~|bins| rows
    bin_counts = binned.groupBy("bin").agg(F.count("*").alias("bin_n"))
    w_bins = W.orderBy("bin").rowsBetween(W.unboundedPreceding, -1)
    offsets = bin_counts.select(
        "bin",
        F.coalesce(F.sum("bin_n").over(w_bins), F.lit(0)).alias("bin_off"),
    )
    n_total = binned.groupBy().agg(F.count("*").alias("n_total"))

    # pass 2: rank within bin (partitioned window), global rank by offset
    w_in_bin = W.partitionBy("bin").orderBy("c_acctbal", "c_custkey")
    ranked = (
        binned.join(F.broadcast(offsets), "bin")
        .crossJoin(F.broadcast(n_total))
        .withColumn("r", F.row_number().over(w_in_bin) + F.col("bin_off"))
    )
    # ntile(4) exact rule: k = n div 4 rows per tile, the first n mod 4
    # tiles take k+1; unique sort key makes rank == row_number
    tile = F.expr(
        """CASE WHEN (r - 1) < ((n_total DIV 4) + 1) * (n_total % 4)
                THEN (r - 1) DIV ((n_total DIV 4) + 1) + 1
                ELSE (n_total % 4)
                     + ((r - 1) - ((n_total DIV 4) + 1) * (n_total % 4))
                       DIV (n_total DIV 4) + 1
           END"""
    )
    return ranked.select(
        "c_custkey",
        tile.cast("long").alias("bal_quartile"),
        (
            (F.col("r") - 1).cast("double")
            / (F.col("n_total") - 1).cast("double")
        ).alias("bal_pct"),
    )


@register(
    "window_first_last",
    oracle="""
    SELECT DISTINCT user_id,
           first_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_type,
           last_value(event_type)  OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type
    FROM events
    """,
    tags=("window",),
    doc="FIRST_VALUE / LAST_VALUE over full-partition frames.",
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return e.select(
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
    ).distinct()


# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.7 — Spark-native, absent in reference surface)
# ---------------------------------------------------------------------------


@register(
    "set_union_all",
    oracle="""
    SELECT user_id, count(*) AS cnt FROM (
      SELECT user_id FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT user_id FROM events WHERE event_type = 'view'
    ) u GROUP BY user_id
    """,
    tags=("setop",),
    doc="UNION ALL + aggregate.",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("user_id")
    views = e.filter(F.col("event_type") == "view").select("user_id")
    return clicks.unionAll(views).groupBy("user_id").agg(F.count("*").alias("cnt"))


@register(
    "set_intersect",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    tags=("setop",),
    doc="INTERSECT (distinct semantics).",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events")
    a = e.filter(F.col("event_type") == "click").select("user_id")
    b = e.filter(F.col("event_type") == "purchase").select("user_id")
    return a.intersect(b)


@register(
    "set_except",
    oracle="""
    SELECT user_id FROM events
    WHERE event_type = 'signup' AND ts < TIMESTAMP '2024-01-01 06:00:00'
    EXCEPT
    SELECT user_id FROM events
    WHERE event_type = 'error' AND ts < TIMESTAMP '2024-01-01 06:00:00'
    """,
    tags=("setop",),
    doc="EXCEPT (distinct semantics): users who signed up in the first six "
    "hours and hit no error in that window. Unwindowed, every user has "
    "every event type on this corpus and the difference was provably empty "
    "— the time bound makes the EXCEPT verify a real distinct-row set.",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-01 06:00:00").cast("timestamp")
    a = e.filter((F.col("event_type") == "signup") & (F.col("ts") < cutoff)).select("user_id")
    b = e.filter((F.col("event_type") == "error") & (F.col("ts") < cutoff)).select("user_id")
    return a.subtract(b)


# ---------------------------------------------------------------------------
# Sorts / limits (SURVEY §2.6)
# ---------------------------------------------------------------------------


@register(
    "sort_limit_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    tags=("sort", "limit"),
    doc="Global top-k (SortExec + GlobalLimitExec — stage.rs:630-656; Spark "
    "plans TakeOrderedAndProject: per-partition top-k then merge, no full sort).",
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


@register(
    "sort_global_range",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer
    """,
    tags=("sort",),
    doc="Unlimited global ORDER BY: plans as a range-partitioned sort "
    "(sampled bounds, parallel per-partition sorts, ordered partitions) — "
    "the distributed total order behind sorted writes and merge phases. "
    "Complements sort_limit_topk/sort_multi_col, whose LIMIT turns them "
    "into TakeOrderedAndProject; without a limit the range exchange IS the "
    "scalable plan (pinned in test_plans).",
)
def sort_global_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tbl(spark, sf_dir, "customer")
    return c.select("c_custkey", "c_acctbal").orderBy(
        F.desc("c_acctbal"), "c_custkey"
    )


@register(
    "sort_multi_col",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_orderstatus, o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
    tags=("sort", "limit"),
    doc="Multi-column mixed-direction sort + limit.",
)
def sort_multi_col(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders")
    return (
        o.orderBy("o_orderstatus", F.col("o_totalprice").desc(), "o_orderkey")
        .select("o_orderstatus", "o_orderpriority", "o_orderkey", "o_totalprice")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Subqueries
# ---------------------------------------------------------------------------


@register(
    "subquery_scalar",
    oracle="""
    SELECT l_returnflag, count(*) AS cnt
    FROM lineitem
    WHERE l_extendedprice > (SELECT avg(l_extendedprice) * 1.5 FROM lineitem)
    GROUP BY l_returnflag
    """,
    tags=("subquery",),
    doc="Scalar subquery in a predicate (avg used as filter bound; boundary "
    "coincidence on doubles is measure-zero, so raw avg is safe here).",
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = tbl(spark, sf_dir, "lineitem")  # noqa: E741
    threshold = l.agg((F.avg("l_extendedprice") * 1.5).alias("t"))
    return (
        l.join(F.broadcast(threshold))
        .filter(F.col("l_extendedprice") > F.col("t"))
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "subquery_in",
    oracle="""
    SELECT o_orderpriority, count(*) AS cnt
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    GROUP BY o_orderpriority
    """,
    tags=("subquery", "semi"),
    doc="IN-subquery → left-semi join.",
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders")
    rich = tbl(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return (
        o.join(rich, o.o_custkey == rich.c_custkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "correlated_exists",
    oracle="""
    SELECT c_mktsegment, count(*) AS cnt
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_mktsegment
    """,
    tags=("subquery", "semi"),
    doc="Correlated EXISTS with an extra predicate (decorrelated to a semi-join).",
)
def correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("cnt"))
    )


# 14 days in seconds: bin width for the interval-overlap join below.
_OVERLAP_BIN_S = 14 * 86400


@register(
    "join_interval_overlap",
    oracle="""
    WITH a AS (SELECT o_orderkey AS a_id, o_orderdate AS a_start,
                      o_orderdate + INTERVAL 14 DAY AS a_end
               FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 200),
    b AS (SELECT o_orderkey AS b_id, o_orderdate AS b_start,
                 o_orderdate + INTERVAL 14 DAY AS b_end
          FROM orders WHERE o_orderpriority = '1-URGENT'
          ORDER BY o_totalprice, o_orderkey LIMIT 200)
    SELECT DISTINCT a_id, b_id,
           CAST(date_diff('day', greatest(a_start, b_start),
                          least(a_end, b_end)) AS BIGINT) AS overlap_days
    FROM a JOIN b ON a_start <= b_end AND b_start <= a_end
    """,
    tags=("join", "range", "scale-pattern"),
    doc="Interval-OVERLAP join (two interval sets, the genomics/temporal "
    "shape) via the same bin lowering as join_range_binned — but where a "
    "point has exactly one bin, two overlapping INTERVALS can co-occur in "
    "several bins, so the binned equi-join needs a DISTINCT after the "
    "overlap residual (a_start <= b_end AND b_start <= a_end). That dedup "
    "is the price of turning the keyless quadratic overlap join into a "
    "linear keyed shuffle, and it runs on the matched pairs only — tiny "
    "next to the avoided cross product. Bin width trades duplication "
    "(len/width bins per interval) against selectivity; ~median interval "
    "length is the standard pick. Oracle: the naive inequality join "
    "(DuckDB IEJoin).",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders")
    a = (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(200)
        .select(
            F.col("o_orderkey").alias("a_id"),
            F.col("o_orderdate").alias("a_start"),
            (F.col("o_orderdate") + F.expr("INTERVAL 14 DAYS")).alias("a_end"),
        )
    )
    b = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .orderBy("o_totalprice", "o_orderkey")
        .limit(200)
        .select(
            F.col("o_orderkey").alias("b_id"),
            F.col("o_orderdate").alias("b_start"),
            (F.col("o_orderdate") + F.expr("INTERVAL 14 DAYS")).alias("b_end"),
        )
    )

    def binned(df: DataFrame, start: str, end: str) -> DataFrame:
        return df.select(
            "*",
            F.explode(
                F.sequence(
                    (F.unix_timestamp(start) / _OVERLAP_BIN_S).cast("bigint"),
                    (F.unix_timestamp(end) / _OVERLAP_BIN_S).cast("bigint"),
                )
            ).alias("bin_id"),
        )

    j = binned(a, "a_start", "a_end").join(binned(b, "b_start", "b_end"), "bin_id")
    overlap = j.filter(
        (F.col("a_start") <= F.col("b_end")) & (F.col("b_start") <= F.col("a_end"))
    )
    return overlap.select(
        "a_id",
        "b_id",
        F.datediff(
            F.least("a_end", "b_end"), F.greatest("a_start", "b_start")
        ).cast("bigint").alias("overlap_days"),
    ).distinct()


@register(
    "window_nth_cume",
    oracle="""
    SELECT c_custkey,
           nth_value(c_name, 3) OVER (PARTITION BY c_nationkey
                                      ORDER BY c_acctbal DESC, c_custkey
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND UNBOUNDED FOLLOWING) AS third_richest,
           CAST(round(cume_dist() OVER (PARTITION BY c_nationkey
                                        ORDER BY c_acctbal, c_custkey)
                      * count(*) OVER (PARTITION BY c_nationkey))
                AS BIGINT) AS bal_cume_rank
    FROM customer
    """,
    tags=("window",),
    doc="NTH_VALUE over a full-partition frame + CUME_DIST — the last two "
    "analytic functions of the ANSI window surface not already pinned "
    "(rank/dense/percent_rank/ntile/lag/lead/first/last are certified "
    "elsewhere). Deterministic: both orderings carry the c_custkey "
    "tie-break, and cume_dist is certified as the exact INTEGER peer "
    "count it encodes — cume_dist * partition-count rounds to the "
    "number of order-peers at-or-below the row (within 1e-9 of an "
    "integer, so the round is boundary-free). Emitting round(ratio, 6) "
    "instead was a latent cross-engine hazard: Spark rounds via the "
    "double's decimal expansion (BigDecimal HALF_UP), DuckDB via "
    "std::round(x*1e6), and at sf0.1 one row's ratio straddled a "
    "6th-decimal boundary and hashed differently (caught by the "
    "round-6 full-registry sf0.1 audit, never driver-exposed). One "
    "keyed window pass, nation-partitioned.",
)
def window_nth_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = tbl(spark, sf_dir, "customer")
    wn = (
        W.partitionBy("c_nationkey")
        .orderBy(F.desc("c_acctbal"), "c_custkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    wc = W.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    wp = W.partitionBy("c_nationkey")
    return c.select(
        "c_custkey",
        F.nth_value("c_name", 3).over(wn).alias("third_richest"),
        F.round(F.cume_dist().over(wc) * F.count("*").over(wp))
        .cast("long")
        .alias("bal_cume_rank"),
    )


@register(
    "agg_mode_deterministic",
    oracle="""
    SELECT event_type, bucket AS modal_bucket, cnt AS modal_cnt
    FROM (
      SELECT event_type, bucket, cnt,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY cnt DESC, bucket) AS rn
      FROM (SELECT event_type, user_id % 25 AS bucket, count(*) AS cnt
            FROM events GROUP BY event_type, user_id % 25) c) r
    WHERE rn = 1
    """,
    tags=("aggregate", "window", "stats"),
    doc="Exact MODE with a pinned tie-break — deliberately NOT the engines' "
    "native mode(), which both Spark and DuckDB define as tie-ARBITRARY "
    "(a hash gate across engines, or even across partitionings, would "
    "flake): lowered to count-per-value + row_number ordered (cnt DESC, "
    "value ASC), the only portable exact-mode formulation. Two-phase "
    "shape at 100 TB: the value-count aggregate map-side-combines so the "
    "shuffle carries |group × distinct-value| partials, and the window "
    "runs over that aggregate, never the rows. The same lowering "
    "generalizes to top-k modes (rn <= k).",
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events")
    c = e.groupBy("event_type", (F.col("user_id") % 25).alias("bucket")).agg(
        F.count("*").alias("cnt")
    )
    w = W.partitionBy("event_type").orderBy(F.desc("cnt"), "bucket")
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_type", F.col("bucket").alias("modal_bucket"), F.col("cnt").alias("modal_cnt"))
    )


_RECURSIVE_CTE_SQL = """
    WITH RECURSIVE anc(user_id, anc_id, depth) AS (
      SELECT user_id, user_id, CAST(0 AS BIGINT)
      FROM (SELECT DISTINCT user_id FROM events) u
      UNION ALL
      SELECT a.user_id, CAST(floor(a.anc_id / 2.0) AS BIGINT),
             a.depth + CAST(1 AS BIGINT)
      FROM anc a WHERE a.anc_id >= 1
    )
    SELECT user_id,
           CAST(max(depth) AS BIGINT) AS chain_depth,
           CAST(count(*) AS BIGINT) AS n_ancestors,
           CAST(sum(anc_id) AS BIGINT) AS anc_id_sum
    FROM anc
    GROUP BY user_id
    """


@register(
    "recursive_cte_hierarchy",
    oracle=_RECURSIVE_CTE_SQL,
    tags=("scalar", "iterative", "sql-surface"),
    doc="WITH RECURSIVE transitive closure — Spark 4.0 added ANSI recursive "
    "CTEs (SPARK-24497), so the reference's iterative gap (its engine "
    "has no recursion at all) is now closed by a NATIVE SQL feature "
    "rather than only by this repo's driver-controlled fixpoint loops "
    "(dedup components, k-core, PageRank): each user walks a synthetic "
    "binary hierarchy (parent = floor(id/2), halving guarantees "
    "termination in O(log id) rounds) and emits chain depth, ancestor "
    "count, and an order-insensitive checksum. IDENTICAL SQL text runs "
    "on both engines — the division is floor(x/2.0), not engine-"
    "specific integer division. At scale each recursion round is one "
    "self-join shuffle keyed on the frontier, exactly the plan the "
    "hand-rolled label-propagation loop produces — which is why the "
    "hand-rolled form remains the choice when rounds need "
    "per-iteration checkpointing.",
)
def recursive_cte_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_RECURSIVE_CTE_SQL)


_PIPE_SQL = """
    FROM events
    |> WHERE event_type IN ('click', 'purchase')
    |> EXTEND CAST(round(value * 100) AS BIGINT) AS cents
    |> AGGREGATE CAST(count(*) AS BIGINT) AS cnt,
                 CAST(sum(cents) AS BIGINT) AS cents_sum
       GROUP BY event_type, user_id % 10 AS user_bucket
    |> WHERE cnt > 5
    |> ORDER BY event_type, user_bucket
    |> LIMIT 40
    """


@register(
    "pipe_syntax_funnel",
    oracle="""
    SELECT event_type, user_id % 10 AS user_bucket,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents_sum
    FROM events
    WHERE event_type IN ('click', 'purchase')
    GROUP BY event_type, user_id % 10
    HAVING count(*) > 5
    ORDER BY event_type, user_bucket
    LIMIT 40
    """,
    tags=("scalar", "sql-surface", "aggregate"),
    doc="SQL pipe syntax (Spark 4's |> operators, SPARK-49555 — the "
    "GoogleSQL pipe-query surface): the same filter→extend→aggregate→"
    "having→order→limit funnel expressed as a linear pipeline, certified "
    "against its classic-SQL equivalent on DuckDB. Pipe syntax is pure "
    "SUGAR over the same logical plan — Catalyst strips the pipe "
    "operators during analysis, so pushdown/partial-agg/TopK planning "
    "are identical to the classic form (the plan pin asserts it) and "
    "there is zero runtime cost to the ergonomic form at any scale.",
)
def pipe_syntax_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_PIPE_SQL)
