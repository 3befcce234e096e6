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

# The driver's tables have no partsupp; where TPC-H needs one (q2/q11/q16/q20)
# a `supply` relation is derived from lineitem: one row per (partkey, suppkey)
# with unit cost = min observed l_extendedprice/l_quantity. Same join pattern,
# same correlated-subquery shape, schema-adapted.
_SUPPLY = """
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           round(min(l_extendedprice / l_quantity), 6) AS ps_supplycost,
           CAST(sum(l_quantity) AS BIGINT) AS ps_availqty
    FROM lineitem
    GROUP BY l_partkey, l_suppkey
"""

# q2's textbook form is a correlated min-cost scalar subquery; de-correlated
# here to a per-part window min over the already-joined EU supply rows. The
# correlated form made Spark derive `supply` (a full lineitem scan + groupBy)
# TWICE — once for the outer join, once inside the subquery rewrite (~6 s at
# sf0.01 vs DuckDB's 0.6 s with CTE reuse). The window form scans lineitem
# once, and the min-per-part is computed only over rows that survive the
# part/region filters — legal because the join drops no EU-supplier row of a
# surviving part, so the per-part min is unchanged. Same result set, same
# column names, deterministic under the full tie-break.
TPCH_SQL["tpch_q2"] = f"""
    WITH supply AS ({_SUPPLY})
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
    FROM (
        SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, ps_supplycost,
               min(ps_supplycost) OVER (PARTITION BY p_partkey) AS min_cost
        FROM part
        JOIN supply   ON p_partkey = ps_partkey
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE p_size = 15 AND p_type = 'LARGE' AND r_name = 'EUROPE'
    ) costed
    WHERE ps_supplycost = min_cost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
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

TPCH_SQL["tpch_q7"] = f"""
    SELECT supp_nation, cust_nation, l_year, {fsum('volume')} AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 EXTRACT(YEAR FROM l_shipdate) AS l_year,
                 l_extendedprice * (1 - l_discount) AS volume
          FROM supplier
          JOIN lineitem ON s_suppkey = l_suppkey
          JOIN orders   ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
              OR (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7'))
            AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00') shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
"""

TPCH_SQL["tpch_q8"] = f"""
    SELECT o_year,
           round({fsum("CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END")}
                 / {fsum('volume')}, 6) AS mkt_share
    FROM (SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
                 l_extendedprice * (1 - l_discount) AS volume,
                 n2.n_name AS supp_nation
          FROM part
          JOIN lineitem ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region   ON n1.n_regionkey = r_regionkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
            AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00') all_nations
    GROUP BY o_year
    ORDER BY o_year
"""

TPCH_SQL["tpch_q9"] = f"""
    SELECT nation, o_year, {fsum('amount')} AS sum_profit
    FROM (SELECT n_name AS nation,
                 EXTRACT(YEAR FROM o_orderdate) AS o_year,
                 l_extendedprice * (1 - l_discount)
                   - p_retailprice * 0.1 * l_quantity AS amount
          FROM part
          JOIN lineitem ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders   ON o_orderkey = l_orderkey
          JOIN nation   ON s_nationkey = n_nationkey
          WHERE p_name LIKE '%red%') profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
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
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_linestatus
"""

TPCH_SQL["tpch_q11"] = f"""
    WITH supply AS ({_SUPPLY})
    SELECT ps_partkey, {fsum('ps_supplycost * ps_availqty')} AS part_value
    FROM supply
    JOIN supplier ON ps_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_2'
    GROUP BY ps_partkey
    HAVING {fsum('ps_supplycost * ps_availqty')} >
           (SELECT {fsum('s2.ps_supplycost * s2.ps_availqty')} * 0.001
            FROM supply s2
            JOIN supplier sup2 ON s2.ps_suppkey = sup2.s_suppkey
            JOIN nation n2 ON sup2.s_nationkey = n2.n_nationkey
            WHERE n2.n_name = 'NATION_2')
    ORDER BY part_value DESC, ps_partkey
"""

TPCH_SQL["tpch_q13"] = """
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
               ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
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

TPCH_SQL["tpch_q16"] = """
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'SMALL'
      AND p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
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

TPCH_SQL["tpch_q20"] = """
    WITH yearly AS (
      SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_suppkey, l_partkey)
    SELECT s_name, s_suppkey
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_4'
      AND s_suppkey IN (SELECT y.l_suppkey
                        FROM yearly y
                        JOIN part ON y.l_partkey = p_partkey
                        WHERE p_name LIKE 'red%'
                          AND y.qty > (SELECT 0.5 * avg(y2.qty) FROM yearly y2))
    ORDER BY s_name
"""

TPCH_SQL["tpch_q21"] = """
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders    ON o_orderkey = l1.l_orderkey
    JOIN nation    ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
      AND n_name = 'NATION_9'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
"""

TPCH_SQL["tpch_q22"] = f"""
    SELECT c_mktsegment, count(*) AS numcust, {fsum('c_acctbal')} AS totacctbal
    FROM customer c
    WHERE c_acctbal > (SELECT CAST({fsum('c_acctbal')} AS DOUBLE) / count(*)
                       FROM customer WHERE c_acctbal > 0.0)
      -- spec q22's dormancy window ("no orders in 7 years"): this corpus has
      -- ~10 orders per customer across 1995-2001, so NOT EXISTS over ALL
      -- orders is structurally empty (P ~ e^-10 per customer) — the recent-
      -- order cutoff restores both the spec's semantics and a non-vacuous
      -- result set
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= DATE '2000-01-01')
    GROUP BY c_mktsegment
"""

_DOCS = {
    "tpch_q1": "Pricing summary: wide grouped aggregate, 8 aggs over 2 keys. Map-side partial agg collapses 600k rows to ~6 groups before the shuffle.",
    "tpch_q2": "Min-cost supplier per part in region: correlated min subquery over the lineitem-derived supply relation (no partsupp in driver schema).",
    "tpch_q7": "Volume shipping between two nations: double nation join with OR'd direction pairs; nations broadcast.",
    "tpch_q8": "National market share: conditional-sum ratio per order year over a 7-way join; dims broadcast.",
    "tpch_q9": "Product-type profit by nation and year; supply cost adapted to 10% of retail price (no partsupp).",
    "tpch_q11": "Important stock: grouped value with HAVING against a scalar-subquery fraction of the total (supply derived from lineitem).",
    "tpch_q13": "Customer order-count distribution: outer join with join-side filter, then two-level aggregation.",
    "tpch_q16": "Supplier count by part attributes with NOT IN (negative-balance suppliers) anti-join.",
    "tpch_q20": "Promotion-candidate suppliers: nested IN subquery over a yearly-quantity CTE with scalar avg threshold.",
    "tpch_q21": "Waiting suppliers: EXISTS + NOT EXISTS correlated self-joins on lineitem (returnflag stands in for the missing receipt/commit dates).",
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
