"""Property-based differential testing: random filter/aggregate queries run
on both engines must agree. The reference has no randomized testing
(SURVEY §5 'Not present'); this layer catches dialect and semantics drift
that fixed golden queries can't.

Queries are drawn from a grammar whose SQL is valid verbatim in both Spark
and DuckDB: conjunctions/disjunctions of numeric comparisons over lineitem,
aggregated with count(*) and an exact fixed-point sum per group. Counts and
integer sums are exact on both engines, so any mismatch is a real bug, not
float noise.
"""

from __future__ import annotations

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flock_spark.catalog import register_views

SF_DIR = "/root/testdata/sf0.001"

_NUM_COLS = {
    "l_quantity": (1, 50),
    "l_extendedprice": (900, 105000),
    "l_discount": (0, 1),
    "l_partkey": (1, 2001),
    "l_suppkey": (1, 101),
    "l_linenumber": (1, 7),
}
_OPS = ["<", "<=", ">", ">=", "=", "<>"]


@st.composite
def predicate(draw):
    col = draw(st.sampled_from(sorted(_NUM_COLS)))
    lo, hi = _NUM_COLS[col]
    op = draw(st.sampled_from(_OPS))
    if col == "l_discount":
        val = round(draw(st.floats(min_value=0.0, max_value=0.1)), 2)
    else:
        val = draw(st.integers(min_value=lo, max_value=hi))
    return f"{col} {op} {val}"


@st.composite
def where_clause(draw):
    preds = draw(st.lists(predicate(), min_size=1, max_size=3))
    joiner = draw(st.sampled_from([" AND ", " OR "]))
    return joiner.join(preds)


def _sql(where: str) -> str:
    return f"""
    SELECT l_returnflag, count(*) AS cnt,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sum_cents
    FROM lineitem
    WHERE {where}
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(where=where_clause())
def test_random_filter_agg_matches_duckdb(spark, where):
    sql = _sql(where)
    register_views(spark, SF_DIR, ["lineitem"])
    got = [tuple(r) for r in spark.sql(sql).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF_DIR}/lineitem.parquet')"
    )
    want = [tuple(r) for r in con.execute(sql).fetchall()]
    con.close()
    assert got == want, f"engines disagree for WHERE {where}"


def _join_sql(where: str) -> str:
    return f"""
    SELECT o_orderpriority, count(*) AS cnt,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sum_cents
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE {where}
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(where=where_clause())
def test_random_join_agg_matches_duckdb(spark, where):
    sql = _join_sql(where)
    register_views(spark, SF_DIR, ["orders", "lineitem"])
    got = [tuple(r) for r in spark.sql(sql).collect()]
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    want = [tuple(r) for r in con.execute(sql).fetchall()]
    con.close()
    assert got == want, f"engines disagree for join WHERE {where}"


def _window_sql(where: str) -> str:
    # fully deterministic ORDER BY (unique (orderkey, linenumber) tiebreak)
    return f"""
    SELECT l_suppkey, l_orderkey, l_linenumber, rn
    FROM (SELECT l_suppkey, l_orderkey, l_linenumber,
                 row_number() OVER (PARTITION BY l_suppkey
                                    ORDER BY l_extendedprice DESC,
                                             l_orderkey, l_linenumber) AS rn
          FROM lineitem
          WHERE {where}) t
    WHERE rn <= 3
    ORDER BY l_suppkey, rn
    """


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(where=where_clause())
def test_random_window_topk_matches_duckdb(spark, where):
    sql = _window_sql(where)
    register_views(spark, SF_DIR, ["lineitem"])
    got = [tuple(r) for r in spark.sql(sql).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF_DIR}/lineitem.parquet')"
    )
    want = [tuple(r) for r in con.execute(sql).fetchall()]
    con.close()
    assert got == want, f"engines disagree for window WHERE {where}"


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(gap_sec=st.integers(min_value=60, max_value=86400))
def test_random_session_gap_matches_duckdb(spark, gap_sec):
    """session_window merges events exactly `gap` apart (strict > breaks) —
    pinned across random gaps, since the off-by-one only shows at particular
    gap/data alignments (round-1 lesson)."""
    from pyspark.sql import functions as F

    from flock_spark.catalog import tbl

    e = tbl(spark, SF_DIR, "events")
    got = sorted(
        tuple(r)
        for r in (
            e.groupBy(F.session_window("ts", f"{gap_sec} seconds").alias("w"), "user_id")
            .agg(F.count("*").alias("cnt"))
            .select("user_id", F.col("w.start").alias("session_start"), "cnt")
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"""
            WITH gaps AS (
              SELECT user_id, ts,
                     CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                               > INTERVAL '{gap_sec} seconds'
                          THEN 1 ELSE 0 END AS brk
              FROM events),
            sessions AS (
              SELECT user_id, ts,
                     sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sess_id
              FROM gaps)
            SELECT user_id, min(ts) AS session_start, count(*) AS cnt
            FROM sessions GROUP BY user_id, sess_id
            """
        ).fetchall()
    )
    con.close()
    assert got == want, f"session mismatch at gap={gap_sec}s"


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(width_sec=st.integers(min_value=1, max_value=604800))
def test_random_tumbling_width_matches_duckdb(spark, width_sec):
    """window(ts, N seconds) buckets are epoch-aligned: start = floor(epoch/N)*N.
    Pinned across random widths against the arithmetic oracle."""
    from pyspark.sql import functions as F

    from flock_spark.catalog import tbl

    e = tbl(spark, SF_DIR, "events")
    got = sorted(
        tuple(r)
        for r in (
            e.groupBy(F.window("ts", f"{width_sec} seconds").alias("w"))
            .agg(F.count("*").alias("cnt"))
            .select(F.col("w.start").alias("wstart"), "cnt")
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"""
            SELECT to_timestamp(CAST(floor(epoch(ts) / {width_sec}) AS BIGINT)
                                * {width_sec})::TIMESTAMP AS wstart,
                   count(*) AS cnt
            FROM events GROUP BY 1
            """
        ).fetchall()
    )
    con.close()
    assert got == want, f"tumble mismatch at width={width_sec}s"


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    minlen=st.integers(min_value=2, max_value=8),
    topn=st.integers(min_value=1, max_value=5),
)
def test_random_hof_pipeline_matches_duckdb(spark, minlen, topn):
    # randomized lambda pipelines (filter → sort → slice → join) — the HOF
    # surface is dialect-divergent (Spark filter/slice vs DuckDB
    # list_filter/[a:b]), so the two dialect strings are built from the same
    # parameters and must agree exactly on every (threshold, k). First run
    # of this test caught a real divergence: DuckDB array_to_string over an
    # empty list is NULL where Spark array_join is '' — hence the COALESCE
    # (mirrored into array_hof_funcs' oracle).
    spark_sql = f"""
    SELECT doc_id,
           CAST(size(filter(split(trim(text), ' '), x -> length(x) > {minlen})) AS BIGINT) AS n,
           array_join(slice(array_sort(filter(split(trim(text), ' '),
                                              x -> length(x) > {minlen})), 1, {topn}),
                      '|') AS top
    FROM documents ORDER BY doc_id
    """
    duck_sql = f"""
    SELECT doc_id,
           CAST(len(list_filter(string_split(trim(text), ' '), x -> length(x) > {minlen})) AS BIGINT) AS n,
           COALESCE(array_to_string(list_sort(list_filter(string_split(trim(text), ' '),
                                                          x -> length(x) > {minlen}))[1:{topn}],
                                    '|'), '') AS top
    FROM documents ORDER BY doc_id
    """
    register_views(spark, SF_DIR, ["documents"])
    got = [tuple(r) for r in spark.sql(spark_sql).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    want = [tuple(r) for r in con.execute(duck_sql).fetchall()]
    con.close()
    assert got == want, f"engines disagree for minlen={minlen} topn={topn}"


@st.composite
def date_predicate(draw):
    # timestamp comparisons + date_trunc/year extraction — valid verbatim
    # in both dialects (lineitem.l_shipdate spans 1995-01..2001-11)
    form = draw(st.sampled_from(["cmp", "year", "trunc"]))
    if form == "cmp":
        y = draw(st.integers(min_value=1995, max_value=2001))
        m = draw(st.integers(min_value=1, max_value=12))
        op = draw(st.sampled_from(["<", ">=", ">"]))
        return f"l_shipdate {op} TIMESTAMP '{y}-{m:02d}-01 00:00:00'"
    if form == "year":
        y = draw(st.integers(min_value=1995, max_value=2001))
        op = draw(st.sampled_from(["=", "<>", "<="]))
        return f"year(l_shipdate) {op} {y}"
    y = draw(st.integers(min_value=1995, max_value=2001))
    return f"date_trunc('year', l_shipdate) = TIMESTAMP '{y}-01-01 00:00:00'"


@st.composite
def date_where(draw):
    preds = draw(st.lists(date_predicate(), min_size=1, max_size=2))
    joiner = draw(st.sampled_from([" AND ", " OR "]))
    return joiner.join(preds)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(where=date_where())
def test_random_date_predicates_match_duckdb(spark, where):
    # temporal predicate semantics (timestamp literals, year extraction,
    # date_trunc equality) are a classic cross-engine divergence surface —
    # time zones, date vs timestamp coercion, trunc boundary handling
    sql = f"""
    SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS m,
           count(*) AS cnt,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cents
    FROM lineitem
    WHERE {where}
    GROUP BY 1 ORDER BY 1
    """
    register_views(spark, SF_DIR, ["lineitem"])
    got = [tuple(r) for r in spark.sql(sql).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF_DIR}/lineitem.parquet')"
    )
    want = [tuple(r) for r in con.execute(sql).fetchall()]
    con.close()
    assert got == want, f"engines disagree for date WHERE {where}"


# ---------------------------------------------------------------------------
# Randomized string predicates (LIKE / substring / upper-lower)
# ---------------------------------------------------------------------------

_LIKE_PATTERNS = [
    "1%", "2%", "%URGENT%", "%HIGH", "_-%", "%-%", "%E%", "5%W%",
    "%LOW", "3-%", "%MEDIUM%", "4%",
]
_STR_FUNCS = [
    "o_orderpriority LIKE '{p}'",
    "o_orderpriority NOT LIKE '{p}'",
    "upper(o_orderstatus) = substring(upper(o_orderpriority), 1, 1)",
    "substring(o_orderpriority, 1, 1) >= '{d}'",
    "length(o_orderpriority) - length(replace(o_orderpriority, 'E', '')) >= {n}",
]


@st.composite
def string_predicate(draw):
    tmpl = draw(st.sampled_from(_STR_FUNCS))
    return tmpl.format(
        p=draw(st.sampled_from(_LIKE_PATTERNS)),
        d=draw(st.sampled_from("12345")),
        n=draw(st.integers(min_value=0, max_value=3)),
    )


@st.composite
def string_where(draw):
    preds = draw(st.lists(string_predicate(), min_size=1, max_size=3))
    joiner = draw(st.sampled_from([" AND ", " OR "]))
    return joiner.join(preds)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(where=string_where())
def test_random_string_predicates_match_duckdb(spark, where):
    """LIKE wildcards, substring bounds, case folding, and the
    replace-length occurrence-count idiom must agree verbatim across
    engines — the string-dialect surface the numeric/date grammars don't
    touch. Counts and fixed-point cents sums are exact, so any mismatch
    is a real semantics drift, not float noise."""
    sql = f"""
    SELECT o_orderstatus, count(*) AS cnt,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM orders
    WHERE {where}
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """
    register_views(spark, SF_DIR, ["orders"])
    got = [tuple(r) for r in spark.sql(sql).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF_DIR}/orders.parquet')"
    )
    want = [tuple(r) for r in con.execute(sql).fetchall()]
    con.close()
    assert got == want, f"engines disagree for WHERE {where}"


# ---------------------------------------------------------------------------
# Randomized window frames
# ---------------------------------------------------------------------------


@st.composite
def frame_spec(draw):
    a = draw(st.integers(min_value=0, max_value=5))
    b = draw(st.integers(min_value=0, max_value=5))
    fn = draw(st.sampled_from(["sum", "min", "max", "count"]))
    return fn, a, b


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=frame_spec())
def test_random_window_frames_match_duckdb(spark, spec):
    """ROWS-frame window aggregates with random bounds must agree verbatim:
    frame-boundary semantics (empty frames, head/tail truncation) are a
    classic dialect-drift area the fixed window entries only sample. The
    (ts, event_id) ORDER BY makes frames deterministic; fixed-point cents
    keep sums exact."""
    fn, a, b = spec
    sql = f"""
    SELECT user_id, event_id,
           CAST({fn}(CAST(round(value * 100) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN {a} PRECEDING AND {b} FOLLOWING) AS BIGINT) AS agg
    FROM events
    WHERE user_id < 10
    ORDER BY user_id, event_id
    """
    register_views(spark, SF_DIR, ["events"])
    got = [tuple(r) for r in spark.sql(sql).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    want = [tuple(r) for r in con.execute(sql).fetchall()]
    con.close()
    assert got == want, f"engines disagree for frame {spec}"


# ---------------------------------------------------------------------------
# Randomized as-of join vs DuckDB's NATIVE ASOF JOIN operator
# ---------------------------------------------------------------------------


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    umax=st.integers(min_value=5, max_value=149),
    day=st.integers(min_value=0, max_value=29),
)
def test_random_asof_matches_native_duckdb_asof(spark, umax, day):
    """The union+carry-forward as-of lowering vs DuckDB's native ASOF JOIN —
    a third formulation fully independent of both the Spark lowering and
    the registered join+row_number oracle. Compared on the matched DATE
    (unique per event whatever the tie policy, so native ASOF's undefined
    tie choice among equal-date orders can't flake the test), over a
    randomized probe subset (user cut + time cutoff: filtering the probe
    side commutes with the keyed as-of match)."""
    from flock_spark.registry import REGISTRY, get_queries

    get_queries()
    fn = REGISTRY["asof_join_window"].fn
    out = fn(spark, SF_DIR).filter(
        f"user_id < {umax} AND ts <= timestamp'2025-01-01' + INTERVAL {day} DAYS"
    )
    got = sorted(
        (r["event_id"], r["user_id"], r["ts"], r["o_orderdate"])
        for r in out.collect()
    )
    con = duckdb.connect()
    for t in ("events", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"""
        SELECT e.event_id, e.user_id, e.ts, o.o_orderdate
        FROM events e ASOF JOIN orders o
          ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        WHERE e.user_id < {umax}
          AND e.ts <= TIMESTAMP '2025-01-01' + INTERVAL {day} DAY
        """
        ).fetchall()
    )
    con.close()
    assert got == want, f"as-of lowering disagrees with native ASOF (umax={umax}, day={day})"


# ---------------------------------------------------------------------------
# Randomized set operations
# ---------------------------------------------------------------------------


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    op=st.sampled_from(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"]),
    mod_a=st.integers(min_value=2, max_value=9),
    mod_b=st.integers(min_value=2, max_value=9),
)
def test_random_set_operations_match_duckdb(spark, op, mod_a, mod_b):
    """Set-operation semantics are a known dialect trap (EXCEPT/INTERSECT
    imply DISTINCT; UNION vs UNION ALL dedup behavior): two random
    mod-filtered projections of events are combined with a random set op
    and aggregated, verbatim on both engines."""
    sql = f"""
    SELECT user_id % 25 AS bucket, count(*) AS cnt
    FROM (
      SELECT user_id FROM events WHERE event_id % {mod_a} = 0
      {op}
      SELECT user_id FROM events WHERE event_id % {mod_b} = 1
    ) t
    GROUP BY bucket
    ORDER BY bucket
    """
    register_views(spark, SF_DIR, ["events"])
    got = [tuple(r) for r in spark.sql(sql).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    want = [tuple(r) for r in con.execute(sql).fetchall()]
    con.close()
    assert got == want, f"engines disagree for {op} (mods {mod_a},{mod_b})"


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    size_s=st.sampled_from([60, 300, 900, 3600, 7200]),
    off_salt=st.integers(min_value=0, max_value=9),
)
def test_random_stagger_grid_matches_duckdb(spark, size_s, off_salt):
    """Randomized stagger grids: per-key offset tumbling must bucket
    identically on both engines across window sizes and offset families.
    This is the grammar for the epoch-bucketing arithmetic class: the
    round-5 stagger bug (bare `/` is FLOAT division on both engines, so
    ((e-off)/size)*size+off collapses to e, vacuously 'matching') is
    exactly what this test exists to catch — with integer division the
    group sizes below must exceed 1 for coarse windows, which the float
    collapse can never produce."""
    from flock_spark.catalog import tbl
    from flock_spark.operators.hashing import duck_md5_long, spark_md5_long

    def body(md5l, str_t, floor_epoch):
        key_expr = f"CAST(user_id + {off_salt} AS {str_t})"
        off = f"(({md5l(key_expr)}) % {size_s})"
        idiv = "div" if str_t == "STRING" else "//"
        ws = f"((({floor_epoch} - {off}) {idiv} {size_s}) * {size_s} + {off})"
        return f"""
        SELECT user_id, CAST({ws} AS BIGINT) AS w_start_s, count(*) AS cnt
        FROM events WHERE user_id < 20
        GROUP BY 1, 2
        """

    tbl(spark, SF_DIR, "events").createOrReplaceTempView("events")
    got = sorted(
        tuple(r)
        for r in spark.sql(body(spark_md5_long, "STRING", "unix_timestamp(ts)")).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            body(duck_md5_long, "VARCHAR", "CAST(floor(epoch(ts)) AS BIGINT)")
        ).fetchall()
    )
    con.close()
    assert got == want, f"stagger grid mismatch at size={size_s}s salt={off_salt}"
    if size_s >= 3600:
        assert max(c for _, _, c in got) > 1, "grid degenerated to per-event groups"


# ---------------------------------------------------------------------------
# Randomized CDC-parameter differential: the chunker must stay oracle-exact
# for ANY (gram, mod) setting, not just the registered constants
# ---------------------------------------------------------------------------


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    gram=st.integers(min_value=2, max_value=6),
    mod=st.sampled_from([4, 6, 8, 12, 16]),
)
def test_cdc_chunker_matches_oracle_for_any_params(spark, gram, mod):
    from flock_spark.oracle import compare
    from flock_spark.operators.chunking import _cdc_chunks, _cdc_duck_sql
    from pyspark.sql import functions as F

    def fn(s, sf):
        return (
            _cdc_chunks(s, sf, gram=gram, mod=mod)
            .groupBy("doc_id")
            .agg(
                F.count("*").alias("n_chunks"),
                F.sum("chunk_tokens").cast("long").alias("total_tokens"),
                F.countDistinct("chunk_hash").cast("long").alias("distinct_chunks"),
            )
        )

    oracle = f"""
    WITH {_cdc_duck_sql(gram=gram, mod=mod)}
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(chunk_tokens) AS BIGINT) AS total_tokens,
           CAST(count(DISTINCT chunk_hash) AS BIGINT) AS distinct_chunks
    FROM chunks GROUP BY doc_id
    """
    compare(spark, fn, oracle, SF_DIR)
