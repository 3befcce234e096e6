"""TPC-H-style OLAP queries adapted to the driver's slimmed schemas.

The reference ships TPC-H schemas + all 22 query texts but never runs them
(flock/src/datasource/tpch/mod.rs:29-120, tpch/queries/*.sql). Here the
queries are adapted to the columns that exist in the driver's synthetic
tables (TESTDATA.md) and run as `spark.sql` over registered views — pure
Catalyst territory: join reordering, predicate pushdown, partial aggregation
and AQE all apply with zero custom code.

Each query is written in the common SQL dialect of Spark and DuckDB, so the
exact same string is both the Spark query and the oracle. Money aggregates
use the fixed-point BIGINT path (relational.fsum — exact, order-insensitive,
and ~3× faster than DECIMAL(38,6) accumulation because it stays in
whole-stage-codegen long arithmetic); ORDER BY ... LIMIT queries carry full
tie-breaks so the selected set is deterministic.

Scale notes per query are in each docstring; globally: nation/region/supplier
are broadcast-size dims, orders/lineitem join on their natural key (a cluster
deployment would bucket both by orderkey to make this join shuffle-free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flock_spark.catalog import register_views
from flock_spark.queries.relational import favg, fsum
from flock_spark.registry import REGISTRY, QuerySpec

TPCH_SQL: dict[str, str] = {}

TPCH_SQL["tpch_q1"] = f"""
    SELECT l_returnflag, l_linestatus,
           {fsum('l_quantity')}                                    AS sum_qty,
           {fsum('l_extendedprice')}                               AS sum_base_price,
           {fsum('l_extendedprice * (1 - l_discount)')}            AS sum_disc_price,
           {fsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {favg('l_quantity')}                                    AS avg_qty,
           {favg('l_extendedprice')}                               AS avg_price,
           {favg('l_discount')}                                    AS avg_disc,
           count(*)                                                AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
"""

TPCH_SQL["tpch_q3"] = f"""
    SELECT l_orderkey,
           {fsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
"""

TPCH_SQL["tpch_q4"] = """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
"""

TPCH_SQL["tpch_q5"] = f"""
    SELECT n_name, {fsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
"""

TPCH_SQL["tpch_q6"] = f"""
    SELECT {fsum('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
"""

TPCH_SQL["tpch_q10"] = f"""
    SELECT c_custkey, c_name,
           {fsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
"""

TPCH_SQL["tpch_q12"] = """
    SELECT l_linestatus,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS high_line_count,
           sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_linestatus
"""

TPCH_SQL["tpch_q14"] = f"""
    SELECT (100.0 * {fsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")}
            / CAST({fsum('l_extendedprice * (1 - l_discount)')} AS DOUBLE)) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-05-01 00:00:00'
"""

TPCH_SQL["tpch_q15"] = f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {fsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""

TPCH_SQL["tpch_q17"] = f"""
    SELECT (CAST({fsum('l_extendedprice')} AS DOUBLE) / 7.0) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey)
"""

TPCH_SQL["tpch_q18"] = f"""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           {fsum('l_quantity')} AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    HAVING {fsum('l_quantity')} > 300
"""

TPCH_SQL["tpch_q19"] = f"""
    SELECT {fsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 30
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 45
           AND l_quantity BETWEEN 20 AND 40)
"""

TPCH_SQL["tpch_q22"] = f"""
    SELECT c_mktsegment, count(*) AS numcust, {fsum('c_acctbal')} AS totacctbal
    FROM customer c
    WHERE c_acctbal > (SELECT CAST({fsum('c_acctbal')} AS DOUBLE) / count(*)
                       FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
"""

_DOCS = {
    "tpch_q1": "Pricing summary: wide grouped aggregate, 8 aggs over 2 keys. Map-side partial agg collapses 600k rows to ~6 groups before the shuffle.",
    "tpch_q3": "Shipping priority: 3-way join, agg, top-10. Customer filter pushes below the join.",
    "tpch_q4": "Order priority check: correlated EXISTS decorrelated to a semi-join.",
    "tpch_q5": "Local supplier volume: 6-way join; nation/region/supplier broadcast.",
    "tpch_q6": "Forecast revenue: pure scan+filter+agg; all predicates pushed to parquet.",
    "tpch_q10": "Returned items: 4-way join + top-20 by exact decimal revenue.",
    "tpch_q12": "Priority class counts by line status (conditional aggregation).",
    "tpch_q14": "Promo revenue share: ratio of conditional exact sums.",
    "tpch_q15": "Top supplier by revenue: CTE + scalar-max subquery, exact decimal equality.",
    "tpch_q17": "Small-quantity avg: correlated scalar avg subquery per part.",
    "tpch_q18": "Large-volume customers: HAVING over exact decimal sum.",
    "tpch_q19": "Disjunctive join predicate (OR of brand/size/quantity bands).",
    "tpch_q22": "Dormant rich customers: scalar avg subquery + anti-join.",
}


def _make_fn(sql: str):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(
            spark, sf_dir,
            ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"],
        )
        return spark.sql(sql)

    return fn


for _name, _sql in TPCH_SQL.items():
    REGISTRY[_name] = QuerySpec(
        name=_name, fn=_make_fn(_sql), oracle=_sql, tags=("tpch",), doc=_DOCS[_name]
    )
