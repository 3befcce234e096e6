"""Spark 4 SQL-surface entries: SQL UDFs, SQL scripting, session variables,
parameterized queries, and melt/unpivot.

The reference exposes its query surface as SQL text compiled to a physical
plan (flock/src/distributed_plan/planner.rs); everything here exercises the
*newest* parts of Spark's equivalent SQL surface — the features with the most
engine-version risk, certified against classic relational oracles so a Spark
upgrade that changes their semantics fails loudly:

- SQL scalar UDFs (SPARK-46057, `CREATE FUNCTION ... RETURNS ... RETURN`):
  declarative functions Catalyst INLINES into the plan — unlike Python UDFs
  they cost nothing at 100 TB (no serialization boundary, full codegen).
- SQL scripting (SPARK-48338, `BEGIN ... END` with local variables): the
  reference's multi-statement orchestration lives in its CLI/driver
  (flock-cli/src/main.rs); Spark 4 runs it engine-side.
- Session variables (SPARK-42849, `DECLARE/SET VARIABLE`): the runtime
  parameterization the reference passes through Lambda payload context.
- Named-parameter SQL (SPARK-41271, `:param` markers): injection-safe
  client-side parameterization.
- melt/unpivot: the wide→long reshape (inverse of pivot_agg, §2.4).

All five lower to ordinary relational plans — the point of certifying them is
that the SURFACE is new, not the execution. Each oracle is the classic
formulation (literal inlined, expression substituted, UNION ALL unpivot), so
green rows prove the new surface computes exactly its classic twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flock_spark.catalog import tbl
from flock_spark.registry import register


@register(
    "sql_udf_scalar",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))), 2)::DOUBLE
             AS sum_disc_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("functions", "sql_surface", "spark4"),
    doc="SQL scalar UDF (Spark 4, SPARK-46057): CREATE TEMPORARY FUNCTION "
    "disc_price(...) RETURNS ... RETURN <expr>, used inside a grouped "
    "aggregate. Unlike the Python UDF surface (§2.11), a SQL UDF is inlined "
    "by Catalyst at analysis time — the physical plan is identical to "
    "writing the expression inline (whole-stage codegen, no Python "
    "boundary), which is why this is the right way to package reusable "
    "business expressions at 100 TB. The oracle inlines the same "
    "expression; exactness via the repo's DECIMAL(38,6) quantized-sum "
    "convention.",
)
def sql_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION flock_disc_price("
        "ep DOUBLE, d DOUBLE) RETURNS DECIMAL(38,6) "
        "RETURN CAST(ep * (1 - d) AS DECIMAL(38,6))"
    )
    tbl(spark, sf_dir, "lineitem").createOrReplaceTempView("sqludf_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n_items,
               CAST(round(sum(flock_disc_price(l_extendedprice, l_discount)), 2)
                    AS DOUBLE) AS sum_disc_price
        FROM sqludf_lineitem
        GROUP BY l_returnflag
        """
    )


@register(
    "sql_script_batch",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_big_orders
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
    GROUP BY o_orderpriority
    """,
    tags=("functions", "sql_surface", "spark4"),
    doc="SQL scripting (Spark 4, SPARK-48338): a BEGIN...END batch DECLAREs "
    "a local variable, SETs it from a scalar aggregate, then uses it in a "
    "second statement's WHERE — the two-statement compute-threshold-then-"
    "filter orchestration the reference performs driver-side in its CLI "
    "(flock-cli/src/main.rs dispatch loop), moved into the engine. The "
    "script's result is the last statement's DataFrame. The oracle is the "
    "classic single-statement decorrelation (scalar subquery). Each "
    "statement is an ordinary Catalyst plan: the variable read is a "
    "literal at plan time, so the main scan still gets its filter "
    "pushdown.",
)
def sql_script_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "orders").createOrReplaceTempView("script_orders")
    return spark.sql(
        """
        BEGIN
          DECLARE big_threshold DOUBLE DEFAULT 0.0;
          SET big_threshold = (SELECT avg(o_totalprice) * 1.5 FROM script_orders);
          SELECT o_orderpriority,
                 CAST(count(*) AS BIGINT) AS n_big_orders
          FROM script_orders
          WHERE o_totalprice > big_threshold
          GROUP BY o_orderpriority;
        END
        """
    )


@register(
    "session_variable_param",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_long_docs,
           CAST(sum(n_chars) AS BIGINT) AS chars_total
    FROM documents
    WHERE n_chars >= (SELECT CAST(avg(n_chars) AS BIGINT) FROM documents)
    GROUP BY lang
    """,
    tags=("functions", "sql_surface", "spark4"),
    doc="Session variables (Spark 4, SPARK-42849): DECLARE VARIABLE at the "
    "session scope, SET VARIABLE from a scalar query, then reference it "
    "from a later, separately-issued statement — cross-statement state the "
    "reference threads through its Lambda invocation payload context "
    "(flock/src/runtime/context.rs). Unlike a temp view, the variable is a "
    "plan-time literal in the consuming statement, so predicate pushdown "
    "sees a constant (pinned in tests/test_plans.py). Oracle: the classic "
    "scalar-subquery form.",
)
def session_variable_param(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "documents").createOrReplaceTempView("var_documents")
    spark.sql(
        "DECLARE OR REPLACE VARIABLE flock_min_chars BIGINT DEFAULT 0"
    )
    spark.sql(
        "SET VARIABLE flock_min_chars ="
        " (SELECT CAST(avg(n_chars) AS BIGINT) FROM var_documents)"
    )
    return spark.sql(
        """
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_long_docs,
               CAST(sum(n_chars) AS BIGINT) AS chars_total
        FROM var_documents
        WHERE n_chars >= flock_min_chars
        GROUP BY lang
        """
    )


@register(
    "parameterized_sql_query",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS cnt,
           round(sum(CAST(value AS DECIMAL(38,6))), 2)::DOUBLE AS value_sum
    FROM events
    WHERE event_type IN ('click', 'purchase') AND value >= 50.0
    GROUP BY event_type
    """,
    tags=("functions", "sql_surface", "spark4"),
    doc="Named-parameter SQL (SPARK-41271): spark.sql(text, args={...}) with "
    ":param markers — the injection-safe equivalent of the string-formatted "
    "SQL the reference's CLI builds (flock-cli templates its query text). "
    "Parameters bind as literals before analysis, so the filter is pushed "
    "to the scan exactly as if written inline. Oracle inlines the same "
    "literals.",
)
def parameterized_sql_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "events").createOrReplaceTempView("param_events")
    return spark.sql(
        """
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS cnt,
               CAST(round(sum(CAST(value AS DECIMAL(38,6))), 2) AS DOUBLE)
                 AS value_sum
        FROM param_events
        WHERE event_type IN (:t1, :t2) AND value >= :min_value
        GROUP BY event_type
        """,
        args={"t1": "click", "t2": "purchase", "min_value": 50.0},
    )


@register(
    "unpivot_melt_wide",
    oracle="""
    WITH wide AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS chars_total,
             CAST(count(DISTINCT source) AS BIGINT) AS n_sources
      FROM documents GROUP BY lang)
    SELECT lang, 'n_docs' AS metric, n_docs AS metric_value FROM wide
    UNION ALL
    SELECT lang, 'chars_total' AS metric, chars_total FROM wide
    UNION ALL
    SELECT lang, 'n_sources' AS metric, n_sources FROM wide
    """,
    tags=("agg", "sql_surface"),
    doc="melt/unpivot — the wide→long reshape (inverse of pivot_agg §2.4): "
    "a per-lang 3-metric wide aggregate melted to (lang, metric, value) "
    "rows via DataFrame.melt. Spark lowers melt to an Expand node (each "
    "input row emitted once per value column) — the same operator behind "
    "COUNT(DISTINCT) rewrites — so the reshape is a zero-shuffle "
    "projection over the aggregated (tiny) relation; the oracle is the "
    "classic UNION ALL formulation. At 100 TB melt the aggregate, never "
    "the raw table: Expand multiplies row count by the number of value "
    "columns.",
)
def unpivot_melt_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    wide = d.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("chars_total"),
        F.countDistinct("source").cast("long").alias("n_sources"),
    )
    return wide.melt(
        ids=["lang"],
        values=["n_docs", "chars_total", "n_sources"],
        variableColumnName="metric",
        valueColumnName="metric_value",
    )


@register(
    "sql_group_by_all",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    """,
    tags=("agg", "sql_surface", "spark4"),
    doc="GROUP BY ALL resolution (SPARK-44186): the grouping keys are "
    "inferred as every non-aggregate select item. The oracle spells the "
    "EXPLICIT grouping list, so the hash certifies Spark resolved ALL to "
    "exactly those keys — an independent formulation, not a syntax echo. "
    "Plans identically to the explicit form (same two-phase hash "
    "aggregate), so the surface costs nothing.",
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
               sum(o_orderkey) AS key_sum
        FROM orders
        GROUP BY ALL
        """
    )


_CI_MIXED = (
    "(CASE (CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 15), 16, 10)"
    " AS BIGINT) % 3)"
    " WHEN 0 THEN upper(event_type)"
    " WHEN 1 THEN initcap(event_type)"
    " ELSE event_type END)"
)
_CI_MIXED_DUCK = (
    "(CASE ((('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT)"
    " % 3)"
    " WHEN 0 THEN upper(event_type)"
    " WHEN 1 THEN "
    "   (upper(substring(event_type, 1, 1)) || substring(event_type, 2))"
    " ELSE event_type END)"
)


@register(
    "sql_collation_ci_agg",
    oracle=f"""
    WITH mixed AS (
      SELECT {_CI_MIXED_DUCK} AS etype_mixed,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events)
    SELECT lower(etype_mixed) AS etype,
           count(*) AS cnt,
           count(DISTINCT etype_mixed) AS n_case_variants,
           CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM mixed
    GROUP BY lower(etype_mixed)
    """,
    tags=("functions", "sql_surface", "spark4"),
    doc="Collation-aware aggregation (SPARK-46830, Spark 4's collation "
    "engine): event types are deterministically case-mangled into three "
    "variants per type, then grouped under COLLATE UNICODE_CI — the "
    "collation, not any explicit lower(), must merge the variants. The "
    "emitted key is normalized (lower of the group's arbitrary "
    "representative) so the output is deterministic, and "
    "n_case_variants = 3 per group proves the input really carried "
    "mixed case (non-vacuity: an accidental pre-normalization would "
    "show 1). The oracle is the independent formulation — explicit "
    "lower() grouping — so the hash certifies the collation's "
    "equivalence classes. Collation comparisons run JVM-side in "
    "hash aggregates exactly like binary strings: same two-phase plan.",
)
def sql_collation_ci_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        f"""
        WITH mixed AS (
          SELECT {_CI_MIXED} AS etype_mixed,
                 CAST(round(value * 100) AS BIGINT) AS cents
          FROM events)
        SELECT lower(min(etype_mixed COLLATE UNICODE_CI)) AS etype,
               count(*) AS cnt,
               count(DISTINCT etype_mixed COLLATE UTF8_BINARY)
                 AS n_case_variants,
               CAST(sum(cents) AS BIGINT) AS sum_cents
        FROM mixed
        GROUP BY etype_mixed COLLATE UNICODE_CI
        """
    )


def _luhn_sql(h_expr: str, concat_digits: str) -> str:
    """Shared Luhn construction: 9 payload digits from a 60-bit hash, a
    check digit computed by Luhn arithmetic, then deliberately corrupted
    on odd hashes. `concat_digits` is the engine's 10-digit string concat."""
    ds = [f"(CAST(floor(h / {10 ** i}) AS BIGINT) % 10)" for i in range(9)]
    # Luhn from the right, check digit at position 1: payload digits at
    # even positions (2,4,...) double with the >=5 fold
    doubled = [ds[0], ds[2], ds[4], ds[6], ds[8]]
    plain = [ds[1], ds[3], ds[5], ds[7]]
    fold = " + ".join(
        f"(2 * {d} - CASE WHEN {d} >= 5 THEN 9 ELSE 0 END)" for d in doubled
    )
    s = f"(({fold}) + ({' + '.join(plain)}))"
    return f"""
    WITH base AS (
      SELECT {h_expr} AS h FROM events),
    digits AS (
      SELECT h,
             {s} AS luhn_sum,
             ((10 - ({s} % 10)) % 10) AS check_ok,
             (h % 2 = 0) AS expected_valid
      FROM base),
    numbered AS (
      SELECT expected_valid,
             {concat_digits} AS card
      FROM digits)
    """


@register(
    "sql_luhn_check_audit",
    oracle="""
    SELECT (h % 2 = 0) AS expected_valid,
           (h % 2 = 0) AS luhn_says,
           count(*) AS n
    FROM (SELECT (('0x' || substring(md5('luhn' || CAST(event_id AS VARCHAR)),
                   1, 15))::BIGINT) AS h
          FROM events) t
    GROUP BY (h % 2 = 0)
    """,
    tags=("functions", "sql_surface", "spark4", "quality"),
    doc="Native luhn_check (SPARK-42191) certified against INDEPENDENT "
    "integer arithmetic: 10-digit numbers are constructed with a Luhn "
    "check digit computed from first principles (double-every-second "
    "with the >=5 fold), then deliberately corrupted (+1 mod 10) on odd "
    "hashes — so luhn_check must return TRUE exactly on even hashes. "
    "The oracle never runs Luhn at all: it asserts the diagonal "
    "(luhn_says == expected_valid) from the parity alone, which only "
    "hashes equal if the native function agrees with the arithmetic on "
    "every row. The validation itself is a pure projection (the shape "
    "of a 100 TB PII/format-check pass); the audit aggregate is "
    "two-phase.",
)
def sql_luhn_check_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "events").createOrReplaceTempView("events")
    h_expr = (
        "CAST(conv(substring(md5(concat('luhn', CAST(event_id AS STRING))),"
        " 1, 15), 16, 10) AS BIGINT)"
    )
    ds = [f"CAST(CAST(floor(h / {10 ** i}) AS BIGINT) % 10 AS STRING)" for i in range(9)]
    # card string: payload digits d8..d0 left-to-right, check digit last;
    # odd hashes corrupt the check digit by +1 mod 10
    check = "CAST((check_ok + CASE WHEN h % 2 = 0 THEN 0 ELSE 1 END) % 10 AS STRING)"
    concat_digits = "concat(" + ", ".join(reversed(ds)) + f", {check})"
    body = _luhn_sql(h_expr, concat_digits)
    return spark.sql(
        body
        + """
        SELECT expected_valid,
               luhn_check(card) AS luhn_says,
               count(*) AS n
        FROM numbered
        GROUP BY expected_valid, luhn_check(card)
        """
    )


@register(
    "sql_listagg_within_group",
    oracle="""
    SELECT event_type,
           string_agg(CAST(b AS VARCHAR), ',' ORDER BY b) AS buckets_csv,
           count(*) AS n_buckets
    FROM (SELECT DISTINCT event_type, user_id % 16 AS b FROM events) t
    GROUP BY event_type
    """,
    tags=("agg", "sql_surface", "spark4"),
    doc="ANSI LISTAGG ... WITHIN GROUP (ORDER BY ...) (SPARK-42746, new "
    "in Spark 4): ordered string aggregation with a deterministic order "
    "key over a bounded distinct domain (16 buckets per group — ordered "
    "collect over unbounded groups is the anti-pattern; production "
    "callers bound or top-k first, as agg_collect_sorted documents). "
    "The oracle is DuckDB's string_agg with ORDER BY — same ANSI "
    "semantics, independently implemented. Plans as a sort-based "
    "aggregate over the deduped relation, never the raw events.",
)
def sql_listagg_within_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        SELECT event_type,
               listagg(CAST(b AS STRING), ',')
                 WITHIN GROUP (ORDER BY b) AS buckets_csv,
               count(*) AS n_buckets
        FROM (SELECT DISTINCT event_type, user_id % 16 AS b FROM events) t
        GROUP BY event_type
        """
    )


@register(
    "sql_utf8_validation_audit",
    oracle="""
    SELECT ((h % 256) < 128) AS expected_valid,
           ((h % 256) < 128) AS utf8_says,
           count(*) AS n,
           CAST(min(h % 256) AS BIGINT) AS min_byte,
           CAST(max(h % 256) AS BIGINT) AS max_byte
    FROM (SELECT (('0x' || substring(md5('u8' || CAST(event_id AS VARCHAR)),
                   1, 15))::BIGINT) AS h
          FROM events) t
    GROUP BY ((h % 256) < 128)
    """,
    tags=("functions", "sql_surface", "spark4", "quality"),
    doc="Native UTF-8 validation (try_validate_utf8, SPARK-48162) "
    "certified against first-principles byte arithmetic: a single byte "
    "is valid UTF-8 iff it is < 0x80, so for md5-derived bytes the "
    "function's verdict must equal the integer comparison on every row "
    "— the oracle asserts the diagonal from arithmetic alone, never "
    "running any UTF-8 logic. This is the ingest-sanitization primitive "
    "(malformed byte streams quarantined before parsing — the byte-level "
    "companion of csv_corrupt_tolerant_read); validation is a pure "
    "projection at any scale.",
)
def sql_utf8_validation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        """
        WITH b AS (
          SELECT CAST(conv(substring(md5(concat('u8', CAST(event_id AS STRING))),
                           1, 15), 16, 10) AS BIGINT) AS h
          FROM events)
        SELECT ((h % 256) < 128) AS expected_valid,
               (try_validate_utf8(unhex(lpad(hex(h % 256), 2, '0')))
                  IS NOT NULL) AS utf8_says,
               count(*) AS n,
               CAST(min(h % 256) AS BIGINT) AS min_byte,
               CAST(max(h % 256) AS BIGINT) AS max_byte
        FROM b
        GROUP BY ((h % 256) < 128),
                 (try_validate_utf8(unhex(lpad(hex(h % 256), 2, '0')))
                    IS NOT NULL)
        """
    )


_FILTER_AGG_SQL = """
SELECT o_orderpriority,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
         AS n_finished,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT)
         AS n_open,
       CAST(count(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT)
         AS n_big,
       (CAST(sum(CAST(round(o_totalprice * 1000000) AS BIGINT))
             FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) / 1000000.0)
         AS finished_revenue
FROM orders
GROUP BY o_orderpriority
"""


@register(
    "agg_filter_clause",
    oracle=_FILTER_AGG_SQL,
    tags=("aggregate", "sql_surface"),
    doc="ANSI FILTER clause on aggregates (SQL:2003 <filter clause>; Spark "
    "3.0+, identical text in DuckDB): several differently-filtered "
    "aggregates computed in ONE grouped pass over the table — the "
    "declarative replacement for N self-joins or N sum(CASE WHEN) "
    "rewrites. Catalyst plans it as a single two-phase hash aggregate, so "
    "at 100 TB the table is read and shuffled exactly once regardless of "
    "how many filtered metrics ride along. Revenue goes through the "
    "micro-unit BIGINT fixed-point sum (exact, order-insensitive; "
    "fsum convention) with the FILTER attached to the inner sum so both "
    "engines skip identical rows.",
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_FILTER_AGG_SQL)


@register(
    "sql_lateral_topk_per_group",
    oracle="""
    SELECT seg, c_custkey, c_acctbal
    FROM (SELECT c_mktsegment AS seg, c_custkey, c_acctbal,
                 row_number() OVER (PARTITION BY c_mktsegment
                                    ORDER BY c_acctbal DESC, c_custkey) AS rn
          FROM customer) t
    WHERE rn <= 3
    """,
    tags=("sql_surface", "join", "spark4"),
    doc="Correlated LATERAL subquery with ORDER BY ... LIMIT — the 'top 3 "
    "per segment' idiom written the way application SQL writes it. The "
    "point is what Catalyst does with it: the lateral is decorrelated "
    "into WindowGroupLimit with a PARTIAL stage (plan-pinned in "
    "tests/test_plans.py), i.e. each map task prunes to its local top-3 "
    "per group BEFORE the shuffle — per-group state on the map side is "
    "k rows, and the exchange carries ~partitions x groups x k rows "
    "instead of the table. The oracle is the classic row_number "
    "formulation, proving the new surface computes exactly its window "
    "twin.",
)
def sql_lateral_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT s.seg, t.c_custkey, t.c_acctbal
        FROM (SELECT DISTINCT c_mktsegment AS seg FROM customer) s,
        LATERAL (SELECT c_custkey, c_acctbal FROM customer c
                 WHERE c.c_mktsegment = s.seg
                 ORDER BY c_acctbal DESC, c_custkey LIMIT 3) t
        """
    )


@register(
    "sql_xml_shred",
    oracle="""
    SELECT o_orderkey AS o_key,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
           o_orderstatus AS status
    FROM orders
    """,
    tags=("functions", "sql_surface", "spark4"),
    doc="XML shredding via Spark 4's built-in from_xml — the XML twin of "
    "variant_json_shred, certifying the three parse paths a feed decoder "
    "uses: an ATTRIBUTE (id, surfaced under the default '_' prefix), a "
    "numeric ELEMENT (integer cents so no float-to-string formatting "
    "crosses the roundtrip), and a string element. Each row is serialized "
    "to XML from the source columns and parsed back engine-side; the "
    "oracle computes the same values directly from the columns, so a "
    "parser that misread attributes vs elements, dropped the type "
    "coercion, or mangled the text path would hash-mismatch. Scale: pure "
    "projection, no shuffle — from_xml runs inside codegen like from_json "
    "(DuckDB has no XML parser, which is why the oracle is the classic "
    "direct formulation).",
)
def sql_xml_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = tbl(spark, sf_dir, "orders")
    xml = F.concat(
        F.lit('<o id="'),
        F.col("o_orderkey"),
        F.lit('"><cents>'),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)"),
        F.lit("</cents><status>"),
        F.col("o_orderstatus"),
        F.lit("</status></o>"),
    )
    parsed = o.select(
        F.from_xml(xml, "struct<_id: bigint, cents: bigint, status: string>").alias("p")
    )
    return parsed.select(
        F.col("p._id").alias("o_key"),
        F.col("p.cents").alias("cents"),
        F.col("p.status").alias("status"),
    )


@register(
    "sql_try_arithmetic_audit",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN event_id % 5 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_div_null,
           CAST(sum(CASE WHEN event_id % 5 <> 0
                         THEN CAST(floor(CAST(round(value * 1000000) AS BIGINT)
                                         / (event_id % 5)) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS div_floor_sum,
           CAST(sum(CASE WHEN event_id % 7 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_add_null
    FROM events GROUP BY event_type
    """,
    tags=("functions", "sql_surface", "spark4", "quality"),
    doc="ANSI-mode safety surface: try_divide must return NULL exactly on "
    "the zero-divisor rows (event_id % 5 = 0) and try_add must return "
    "NULL exactly when 9223372036854775807 + 1 overflows int64 (every "
    "row with event_id % 7 <> 0) — certified by COUNTING the nulls per "
    "group and checksumming the surviving integer-floored quotients "
    "against the classic CASE-guarded formulation. This is the surface a "
    "pipeline flips on instead of letting one bad row kill a 100 TB job; "
    "the green row proves try_* nulls land on precisely the rows the "
    "guard clause names, no more and no fewer. Pure projection + one "
    "two-phase aggregate. (floor of the double quotient is cross-engine "
    "safe here: divisors are 1-4 and quotients are ~1e8 scale, so the "
    "fractional part is always >= 0.25 minus sub-ulp error.)",
)
def sql_try_arithmetic_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.expr("CAST(round(value * 1000000) AS BIGINT)").alias("micros"),
    )
    probed = e.select(
        "event_type",
        F.expr("try_divide(micros, event_id % 5)").alias("q"),
        F.expr(
            "try_add(9223372036854775807L,"
            " CASE WHEN event_id % 7 = 0 THEN 0L ELSE 1L END)"
        ).alias("a"),
    )
    return probed.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.when(F.col("q").isNull(), 1).otherwise(0)).cast("long").alias("n_div_null"),
        F.sum(
            F.when(F.col("q").isNotNull(), F.floor("q").cast("long")).otherwise(0)
        ).cast("long").alias("div_floor_sum"),
        F.sum(F.when(F.col("a").isNull(), 1).otherwise(0)).cast("long").alias("n_add_null"),
    )
