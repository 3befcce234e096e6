"""Analytics operators: skyline/pareto frontier, marketing attribution,
weighted sampling.

Beyond the reference's surface (SURVEY §2 lists none of these) but standard
asks of a warehouse engine. Each is expressed so the heavy relation crosses
the wire once:

- the pareto frontier is computed TWO-PHASE (local frontier per hash bucket,
  then global frontier over the survivors) — dominance is transitive, so a
  locally-dominated point is globally dominated and can be dropped before
  the global step ever sees it; the global window runs over a relation
  bounded by (buckets x local frontier size), not the table;
- attribution folds the entire multi-touch path into ONE user-keyed window
  pass by packing (touch-time, channel) into a single BIGINT whose running
  max IS last-touch attribution (and running min of the mirrored packing is
  first-touch) — no event-log self-join, no join-back to resolve the
  winning touch;
- weighted sampling is the integer bottom-k sketch: replicate each doc
  `weight` times with salted md5 keys and keep the k smallest keys
  globally — inclusion probability rises with weight, every comparison is
  exact int64, and the global bottom-k plans as TakeOrderedAndProject
  (partial per-partition top-k, never a full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flock_spark.catalog import tbl
from flock_spark.operators.hashing import duck_md5_long, spark_md5_long
from flock_spark.registry import register

PARETO_BUCKETS = 32

# last-touch packing: epoch_us * 8 + channel_idx. epoch_us ~ 1.7e15 for the
# 2024 corpus, so packed < 1.4e16 << 2^63; channel_idx < N_CHANNELS <= 8.
N_CHANNELS = 5
ATTR_WINDOW_US = 7 * 86_400 * 1_000_000  # 7-day attribution window

WRS_K = 32  # weighted-sample size
WRS_MAX_W = 4


def _local_then_global_frontier(pts: DataFrame) -> DataFrame:
    """Skyline of distinct (price, size) points: minimize price, maximize
    size. Phase 1 prunes per bucket; phase 2 finalizes over survivors."""

    def frontier(df: DataFrame, part_cols: list[str]) -> DataFrame:
        w = (
            Window.partitionBy(*part_cols)
            .orderBy(F.col("price").asc(), F.col("size").desc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return (
            df.withColumn("m", F.max("size").over(w))
            .where(F.col("m").isNull() | (F.col("m") < F.col("size")))
            .drop("m")
        )

    local = frontier(
        pts.withColumn("b", F.pmod(F.hash("price", "size"), F.lit(PARETO_BUCKETS))),
        ["b"],
    ).drop("b")
    return frontier(local.withColumn("g", F.lit(0)), ["g"]).drop("g")


@register(
    "analytics_pareto_frontier",
    oracle="""
    WITH pts AS (
      SELECT DISTINCT p_retailprice AS price, p_size AS size FROM part),
    ranked AS (
      SELECT price, size,
             max(size) OVER (ORDER BY price ASC, size DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS m
      FROM pts),
    sky AS (SELECT price, size FROM ranked WHERE m IS NULL OR m < size)
    SELECT sky.price, sky.size, count(*) AS n_parts
    FROM sky JOIN part p ON p.p_retailprice = sky.price AND p.p_size = sky.size
    GROUP BY sky.price, sky.size
    """,
    tags=("analytics", "skyline", "window"),
    doc="Pareto frontier (skyline) of parts: points where no other part is "
    "both cheaper-or-equal and larger-or-equal with one strict. After "
    "dedup to distinct points, the 2-D skyline is a single sorted pass "
    "(keep a point iff it beats the running max size among all "
    "cheaper-or-equal points) — never the quadratic dominance join. "
    "Spark runs it two-phase: a bucket-local frontier prunes dominated "
    "points map-side (dominance is transitive, so local losers are global "
    "losers), then the global window sorts only the survivors — at 100 TB "
    "the global step sees ~buckets x frontier-size rows, not the table. "
    "The oracle is the single-pass global form; equality of the two-phase "
    "and direct-quadratic forms is additionally pinned by a NOT EXISTS "
    "differential test.",
)
def analytics_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = tbl(spark, sf_dir, "part")
    pts = p.select(
        F.col("p_retailprice").alias("price"), F.col("p_size").alias("size")
    ).distinct()
    sky = _local_then_global_frontier(pts)
    return (
        p.join(
            F.broadcast(sky),
            (p.p_retailprice == sky.price) & (p.p_size == sky.size),
        )
        .groupBy("price", "size")
        .agg(F.count("*").alias("n_parts"))
    )


_CH_SPARK = f"({spark_md5_long('CAST(event_id AS STRING)')} % {N_CHANNELS})"
_CH_DUCK = f"({duck_md5_long('CAST(event_id AS VARCHAR)')} % {N_CHANNELS})"


@register(
    "events_attribution_touch_matrix",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
             CAST(round(value * 100) AS BIGINT) AS cents,
             CASE WHEN event_type IN ('click', 'view')
                  THEN {_CH_DUCK} END AS ch
      FROM events),
    packed AS (
      SELECT user_id, event_type, us, cents,
             max(CASE WHEN ch IS NOT NULL THEN us * 8 + ch END)
               OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_packed,
             min(CASE WHEN ch IS NOT NULL THEN us * 8 + (7 - ch) END)
               OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS first_packed
      FROM ev)
    SELECT CAST(first_packed % 8 AS BIGINT)         AS first_ch_raw,
           CAST(last_packed % 8 AS BIGINT)          AS last_ch,
           count(*)                                 AS n_conversions,
           CAST(sum(cents) AS BIGINT)               AS attributed_cents
    FROM packed
    WHERE event_type = 'purchase'
      AND last_packed IS NOT NULL
      AND us - CAST(floor(last_packed / 8) AS BIGINT) <= {ATTR_WINDOW_US}
    GROUP BY first_ch_raw, last_ch
    """,
    tags=("events", "attribution", "window"),
    doc="Multi-touch attribution matrix: each purchase credited to the LAST "
    "preceding click/view of the same user within 7 days (and cross-tabbed "
    "against the FIRST touch on its path). The whole path resolution is "
    "one user-keyed window pass: (touch epoch-us, channel) packs into a "
    "single BIGINT us*8+ch whose running MAX is exactly last-touch (time "
    "dominates; channel breaks same-microsecond ties deterministically), "
    "and the mirrored packing us*8+(7-ch) under running MIN is first-touch "
    "— no self-join, no join-back, one exchange on user_id at any scale. "
    "Revenue is integer cents so the matrix sums exactly. first_ch_raw is "
    "left mirror-encoded ((7-ch)): decoding costs a projection; the hash "
    "certifies it either way.",
)
def events_attribution_touch_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events")
    ev = e.select(
        "user_id",
        "event_id",
        "event_type",
        # parquet stores ts as TIMESTAMP_NTZ; session TZ is UTC, so the cast
        # reads it as UTC instants == DuckDB's epoch_us over naive timestamps
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.when(
            F.col("event_type").isin("click", "view"),
            F.expr(_CH_SPARK),
        ).alias("ch"),
    )
    # ROWS frames need a total order: (us, event_id) is unique per user, so
    # the "preceding" set is identical cross-engine even at equal timestamps.
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = ev.select(
        "user_id",
        "event_type",
        "us",
        "cents",
        F.max(
            F.when(F.col("ch").isNotNull(), F.col("us") * 8 + F.col("ch"))
        ).over(w).alias("last_packed"),
        F.min(
            F.when(F.col("ch").isNotNull(), F.col("us") * 8 + (7 - F.col("ch")))
        ).over(w).alias("first_packed"),
    )
    conv = packed.where(
        (F.col("event_type") == "purchase")
        & F.col("last_packed").isNotNull()
        & (
            F.col("us") - F.floor(F.col("last_packed") / 8).cast("long")
            <= ATTR_WINDOW_US
        )
    )
    return conv.groupBy(
        (F.col("first_packed") % 8).cast("long").alias("first_ch_raw"),
        (F.col("last_packed") % 8).cast("long").alias("last_ch"),
    ).agg(
        F.count("*").alias("n_conversions"),
        F.sum("cents").cast("long").alias("attributed_cents"),
    )


_WKEY_SPARK = spark_md5_long(
    "concat('wrs', CAST(doc_id AS STRING), '_', CAST(i AS STRING))"
)
_WKEY_DUCK = duck_md5_long(
    "('wrs' || CAST(doc_id AS VARCHAR) || '_' || CAST(i AS VARCHAR))"
)


@register(
    "corpus_weighted_bottomk_sample",
    oracle=f"""
    WITH weighted AS (
      SELECT doc_id, 1 + (n_chars % {WRS_MAX_W}) AS w FROM documents),
    reps AS (
      SELECT doc_id, w, {_WKEY_DUCK} AS key
      FROM weighted JOIN range(1, {WRS_MAX_W + 1}) r(i) ON r.i <= w),
    best AS (
      SELECT doc_id, w, min(key) AS doc_key FROM reps GROUP BY doc_id, w)
    SELECT doc_id, CAST(w AS BIGINT) AS w, doc_key,
           CAST(row_number() OVER (ORDER BY doc_key) AS BIGINT) AS rk
    FROM best
    ORDER BY doc_key LIMIT {WRS_K}
    """,
    tags=("corpus", "sampling", "sketch"),
    doc="Weighted bottom-k sample of the corpus: each document enters "
    "weight = 1 + n_chars%4 salted md5 keys and the k=32 globally smallest "
    "keys pick the sample — inclusion probability grows with weight, all "
    "comparisons are exact int64 (no float pow/log whose libm rounding "
    "differs across engines), and the per-doc min + global bottom-k both "
    "plan as partial aggregates / TakeOrderedAndProject, so no full sort "
    "and no shuffle of the replicated rows at 100 TB. The bottom-k key set "
    "is also a mergeable distinct-count sketch (KMV) for free.",
)
def corpus_weighted_bottomk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    weighted = d.select(
        "doc_id", (1 + F.col("n_chars") % WRS_MAX_W).alias("w")
    )
    reps = (
        weighted.join(
            F.broadcast(
                spark.range(1, WRS_MAX_W + 1).select(F.col("id").alias("i"))
            ),
            F.col("i") <= F.col("w"),
        )
        .select("doc_id", "w", F.expr(_WKEY_SPARK).alias("key"))
    )
    best = reps.groupBy("doc_id", "w").agg(F.min("key").alias("doc_key"))
    topk = best.orderBy("doc_key").limit(WRS_K)
    return topk.select(
        "doc_id",
        F.col("w").cast("long").alias("w"),
        "doc_key",
        F.row_number()
        .over(Window.orderBy("doc_key"))
        .cast("long")
        .alias("rk"),
    )


# OLS trend: epoch base for the integer minute axis (2024-01-01 UTC).
_OLS_BASE_US = 1_704_067_200_000_000


@register(
    "analytics_ols_trend",
    oracle=f"""
    WITH e AS (
      SELECT event_type,
             CAST(floor((epoch_us(ts) - {_OLS_BASE_US}) / 60000000) AS BIGINT) AS x,
             CAST(round(value * 100) AS BIGINT) AS y
      FROM events),
    s AS (
      SELECT event_type,
             count(*)                       AS n,
             CAST(sum(x) AS BIGINT)         AS sx,
             CAST(sum(y) AS BIGINT)         AS sy,
             CAST(sum(x * x) AS BIGINT)     AS sxx,
             CAST(sum(x * y) AS BIGINT)     AS sxy,
             CAST(sum(y * y) AS BIGINT)     AS syy
      FROM e GROUP BY event_type)
    SELECT event_type, n, sx, sy, sxx, sxy,
           CAST(round(1000000.0 * (n * sxy - sx * sy)
                      / (n * sxx - sx * sx)) AS BIGINT)
             AS slope_micro,
           CAST(round(1000000.0
                      * ((n * sxy - sx * sy) * 1.0 * (n * sxy - sx * sy))
                      / ((n * sxx - sx * sx) * 1.0 * (n * syy - sy * sy)))
                AS BIGINT)
             AS r2_micro
    FROM s
    """,
    tags=("analytics", "stats", "regression"),
    doc="Per-group OLS trend (linear regression of purchase cents on "
    "time-in-minutes) from EXACT integer moment sums: one partial-"
    "aggregable scan computes (n, Σx, Σy, Σx², Σxy, Σy²) in int64 — the "
    "classic distributed-regression shape, map-side combinable like any "
    "sum, no second pass, no float accumulation-order dependence — then "
    "slope = (nΣxy-ΣxΣy)/(nΣxx-Σx²) and r² derive in a final projection. "
    "The moment sums are emitted alongside (hash-exact by construction); "
    "slope/r² round to 1e-6. The minute-scaled x axis keeps every product "
    "below 2^63 through sf0.1 with ~50x headroom (documented bound: "
    "n·Σx² < 2^63 requires n < ~2.4e5 at this 30-day corpus; larger "
    "corpora re-center x per shard and merge, same as the sketches).",
)
def analytics_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events")
    base = e.select(
        "event_type",
        F.floor(
            (F.unix_micros(F.col("ts").cast("timestamp")) - _OLS_BASE_US)
            / 60_000_000
        )
        .cast("long")
        .alias("x"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
    )
    s = base.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return s.select(
        "event_type",
        "n",
        "sx",
        "sy",
        "sxx",
        "sxy",
        F.round(F.lit(1_000_000.0) * num / den).cast("long").alias("slope_micro"),
        F.round(
            F.lit(1_000_000.0) * (num * F.lit(1.0) * num) / (den * F.lit(1.0) * deny)
        )
        .cast("long")
        .alias("r2_micro"),
    )


def _skew_audit_sql(pct: str) -> str:
    """Shared skew-audit text; `pct` is the engine's interpolated-percentile
    function name (Spark `percentile`, DuckDB `quantile_cont`)."""
    return f"""
    WITH counts AS (
      SELECT user_id, count(*) AS c FROM events GROUP BY user_id),
    ranked AS (
      SELECT c, row_number() OVER (ORDER BY c, user_id) AS i FROM counts),
    tot AS (
      SELECT count(*)                   AS n_keys,
             CAST(sum(c) AS BIGINT)     AS total,
             CAST(max(c) AS BIGINT)     AS max_cnt,
             CAST(min(c) AS BIGINT)     AS min_cnt,
             round({pct}(c, 0.50), 6)   AS p50,
             round({pct}(c, 0.90), 6)   AS p90,
             round({pct}(c, 0.99), 6)   AS p99
      FROM counts),
    lorenz AS (
      SELECT CAST(sum(i * c) AS BIGINT) AS sic FROM ranked)
    SELECT n_keys, total, max_cnt, min_cnt, p50, p90, p99,
           CAST(round(1000000.0 * max_cnt / total) AS BIGINT)
             AS top1_share_micro,
           CAST(round(1000000.0 *
                 (2.0 * sic / (1.0 * n_keys * total)
                  - (n_keys + 1.0) / n_keys)) AS BIGINT)
             AS gini_micro
    FROM tot, lorenz
    """


@register(
    "table_skew_audit",
    oracle=_skew_audit_sql("quantile_cont"),
    tags=("analytics", "profiling", "skew"),
    doc="Key-distribution skew audit of the event log's join/agg key "
    "(user_id): per-key counts reduced to the numbers a 100 TB join plan "
    "is sized from — key cardinality, exact count percentiles, the top-1 "
    "key's traffic share, and the Gini coefficient from the exact integer "
    "Lorenz sum (rank x count over a deterministic (count, key) order; "
    "one double division at the end). The per-key count aggregate is the "
    "only full-data exchange; everything after folds a keys-sized "
    "relation. This is the measurement that decides between plain, "
    "broadcast, and salted joins (join_salted / agg_salted_two_stage are "
    "the mitigations it selects).",
)
def table_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_skew_audit_sql("percentile"))


def _equidepth_sql(pct: str) -> str:
    """Shared equi-depth histogram text; `pct` is the interpolated-percentile
    function. Integer cents values guarantee boundary comparisons are exact
    (a tie with an interpolated boundary requires the boundary to BE an
    integer, which both engines then represent identically in double)."""
    return f"""
    WITH v AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents FROM events),
    b AS (
      SELECT {pct}(cents, 0.25) AS q1,
             {pct}(cents, 0.50) AS q2,
             {pct}(cents, 0.75) AS q3
      FROM v)
    SELECT CASE WHEN cents < q1 THEN 0
                WHEN cents < q2 THEN 1
                WHEN cents < q3 THEN 2
                ELSE 3 END                    AS bucket,
           count(*)                           AS cnt,
           CAST(min(cents) AS BIGINT)         AS lo_cents,
           CAST(max(cents) AS BIGINT)         AS hi_cents,
           CAST(sum(cents) AS BIGINT)         AS sum_cents
    FROM v CROSS JOIN b
    GROUP BY bucket
    """


@register(
    "events_equidepth_histogram",
    oracle=_equidepth_sql("quantile_cont"),
    tags=("analytics", "histogram", "scale-pattern"),
    doc="Equi-depth (quantile-bucketed) histogram of event value cents — "
    "the companion to events_value_histogram's equi-WIDTH bins. The scale "
    "shape is two passes with NO global sort: pass 1 reduces the column "
    "to 3 quartile boundaries (a partial-aggregable percentile), pass 2 "
    "assigns buckets via a broadcast 1-row boundary join and aggregates — "
    "the plan a 100 TB histogram must use (a global NTILE would sort the "
    "table). At cluster scale pass 1 swaps to approx_percentile "
    "(mergeable sketch, bound-audited by agg_approx_percentile_audit); "
    "the bucketing pass is unchanged. Integer cents make every boundary "
    "comparison deterministic cross-engine.",
)
def events_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_equidepth_sql("percentile"))


_RI_EDGES_SQL = """
    WITH snap AS (SELECT p_partkey FROM part WHERE p_size > 25),
    e1 AS (
      SELECT 'orders.o_custkey->customer' AS edge,
             count(*) AS n_child,
             count(CASE WHEN c.c_custkey IS NULL THEN 1 END) AS n_orphan_rows,
             count(DISTINCT CASE WHEN c.c_custkey IS NULL
                                 THEN o.o_custkey END) AS n_missing_keys
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey),
    e2 AS (
      SELECT 'lineitem.l_orderkey->orders' AS edge,
             count(*) AS n_child,
             count(CASE WHEN o.o_orderkey IS NULL THEN 1 END) AS n_orphan_rows,
             count(DISTINCT CASE WHEN o.o_orderkey IS NULL
                                 THEN l.l_orderkey END) AS n_missing_keys
      FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey),
    e3 AS (
      SELECT 'lineitem.l_suppkey->supplier' AS edge,
             count(*) AS n_child,
             count(CASE WHEN s.s_suppkey IS NULL THEN 1 END) AS n_orphan_rows,
             count(DISTINCT CASE WHEN s.s_suppkey IS NULL
                                 THEN l.l_suppkey END) AS n_missing_keys
      FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey),
    e4 AS (
      SELECT 'lineitem.l_partkey->part_snapshot' AS edge,
             count(*) AS n_child,
             count(CASE WHEN p.p_partkey IS NULL THEN 1 END) AS n_orphan_rows,
             count(DISTINCT CASE WHEN p.p_partkey IS NULL
                                 THEN l.l_partkey END) AS n_missing_keys
      FROM lineitem l LEFT JOIN snap p ON l.l_partkey = p.p_partkey)
    SELECT * FROM e1 UNION ALL SELECT * FROM e2
    UNION ALL SELECT * FROM e3 UNION ALL SELECT * FROM e4
"""


@register(
    "table_referential_integrity_audit",
    oracle=_RI_EDGES_SQL,
    tags=("analytics", "profiling", "quality"),
    doc="Referential-integrity audit across four FK edges in one pass each: "
    "child rows, orphan rows, and distinct missing keys per edge. Three "
    "edges are the clean TPC-H constraints (zeros certified by value); "
    "the fourth references a FILTERED part snapshot (p_size > 25) — the "
    "late-arriving-dimension scenario — so the detector provably fires "
    "with real orphan counts instead of a vacuous all-zero pass. Each "
    "edge is a single left join + conditional count (the orphan check "
    "never materializes matches beyond the join itself); at 100 TB the "
    "dimension side broadcasts and the fact table is read once per edge "
    "(or once total with a multi-way conditional aggregate).",
)
def table_referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("orders", "customer", "lineitem", "supplier", "part"):
        tbl(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_RI_EDGES_SQL)


_CDF_SQL = """
    WITH snap_a AS (
      SELECT p_partkey AS k, CAST(round(p_retailprice * 100) AS BIGINT) AS v
      FROM part WHERE p_size > 25),
    snap_b AS (
      SELECT p_partkey AS k,
             CAST(round(p_retailprice
                        * (CASE WHEN p_brand = 'Brand#13' THEN 1.1 ELSE 1.0 END)
                        * 100) AS BIGINT) AS v
      FROM part WHERE p_size > 20 AND p_size <= 45),
    diff AS (
      SELECT CASE WHEN a.k IS NULL THEN 'insert'
                  WHEN b.k IS NULL THEN 'delete'
                  WHEN a.v <> b.v THEN 'update'
                  ELSE 'unchanged' END AS op,
             coalesce(a.v, 0) AS old_v,
             coalesce(b.v, 0) AS new_v
      FROM snap_a a FULL OUTER JOIN snap_b b ON a.k = b.k)
    SELECT op,
           count(*) AS n_keys,
           CAST(sum(old_v) AS BIGINT) AS sum_old_cents,
           CAST(sum(new_v) AS BIGINT) AS sum_new_cents
    FROM diff
    GROUP BY op
"""


@register(
    "table_snapshot_diff_cdf",
    oracle=_CDF_SQL,
    tags=("analytics", "cdc", "incremental"),
    doc="Change-data-feed DERIVATION between two table snapshots that have "
    "no change log: one full outer join on the key classifies every row "
    "as insert / delete / update / unchanged with old+new value sums per "
    "class — the inverse of cdc_upsert_latest (which applies a feed, "
    "this one recovers it). The synthetic snapshots guarantee all four "
    "classes are non-vacuous (a size-band entry cohort inserts, a purge "
    "band deletes, a brand repricing updates), so the classifier is "
    "certified on every branch. At 100 TB both snapshots shuffle once on "
    "the key (or zero times if stored bucketed by key — the layout the "
    "repo's bucketed_colocated_join certifies) and the feed streams out "
    "without materializing matches; this is the nightly snapshot-diff "
    "job every warehouse without CDC runs. Integer cents throughout.",
)
def table_snapshot_diff_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(_CDF_SQL)


_BOUNCE_SQL = """
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS brk
      FROM events),
    s AS (
      SELECT user_id, ts,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM g),
    sess AS (
      SELECT user_id, sid,
             CAST(date_trunc('day', min(ts)) AS DATE) AS day,
             count(*) AS n_events
      FROM s GROUP BY user_id, sid)
    SELECT day,
           count(*) AS n_sessions,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces,
           CAST((1000000 * sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END))
                // count(*) AS BIGINT) AS bounce_ppm,
           CAST(max(n_events) AS BIGINT) AS max_session_events
    FROM sess
    GROUP BY day
"""


@register(
    "events_sessionized_bounce_rate",
    oracle=_BOUNCE_SQL,
    tags=("events", "session", "analytics"),
    doc="Daily bounce rate over sessionized events (30-minute gap): the "
    "product-analytics composition of gaps-and-islands sessionization "
    "with a calendar rollup — sessions with exactly one event over all "
    "sessions, attributed to the day the session STARTED (not the day "
    "of each event — the subtle correctness point a per-event GROUP BY "
    "day gets wrong at midnight boundaries). One user-keyed window pass "
    "builds sessions, the rollup folds a sessions-sized relation; "
    "bounce rate is exact integer ppm via engine-matched integer "
    "division. Identical SQL text on both engines.",
)
def events_sessionized_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "events").createOrReplaceTempView("events")
    # Spark spells integer division `div`; the oracle text uses DuckDB `//`
    return spark.sql(_BOUNCE_SQL.replace("//", "div"))


_P80_SQL = """
    WITH per_user AS (
      SELECT user_id,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id),
    ranked AS (
      SELECT cents,
             row_number() OVER (ORDER BY cents DESC, user_id) AS rk,
             sum(cents) OVER (ORDER BY cents DESC, user_id
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM per_user),
    tot AS (SELECT CAST(sum(cents) AS BIGINT) AS total,
                   count(*) AS n_users
            FROM per_user)
    SELECT t.n_users,
           t.total AS total_cents,
           CAST(min(r.rk) AS BIGINT) AS n_users_for_80pct,
           CAST((1000000 * min(r.rk)) // t.n_users AS BIGINT)
             AS user_share_ppm
    FROM ranked r CROSS JOIN tot t
    WHERE 5 * r.cum >= 4 * t.total
    GROUP BY t.n_users, t.total
"""


@register(
    "events_revenue_pareto80",
    oracle=_P80_SQL,
    tags=("events", "analytics", "stats"),
    doc="Revenue concentration (the 80/20 question): the smallest number "
    "of users covering 80 percent of purchase revenue, found WITHOUT any "
    "float threshold — the 80-percent test is the integer "
    "cross-multiplication 5*cumulative >= 4*total, so there is no "
    "ratio to round and no boundary to diverge on (the discipline the "
    "snapshot-drift TVD flag established). One user aggregate, one "
    "running-sum window over the USERS-sized relation (never the event "
    "log), one 1-row broadcast of the total. Companion to "
    "table_skew_audit's Gini: same Lorenz machinery, business framing.",
)
def events_revenue_pareto80(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_P80_SQL.replace("//", "div"))


_VELOCITY_SQL = """
    WITH e AS (
      SELECT user_id,
             CAST(floor(epoch_us(ts) / 1000000) AS BIGINT) AS sec
      FROM events),
    v AS (
      SELECT user_id,
             count(*) OVER (PARTITION BY user_id ORDER BY sec
                            RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
               AS n_10min
      FROM e)
    SELECT user_id,
           CAST(max(n_10min) AS BIGINT) AS max_velocity,
           CAST(sum(CASE WHEN n_10min >= 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flagged,
           count(*) AS n_events
    FROM v
    GROUP BY user_id
"""


@register(
    "events_velocity_range_frame",
    oracle=_VELOCITY_SQL,
    tags=("events", "window", "analytics"),
    doc="Velocity rule over a TIME-VALUED RANGE frame (the fraud/abuse "
    "primitive: how many events did this user produce in the trailing "
    "10 minutes, evaluated AT every event): RANGE BETWEEN 600 PRECEDING "
    "on integer epoch-seconds, so same-second bursts land in one peer "
    "group and the frame is value-bounded, not row-bounded — the "
    "distinction ROWS frames get wrong under bursts. Per-user flag "
    "counts and the max trailing velocity fold the window output back "
    "to a users-sized relation; one keyed exchange total. Identical "
    "SQL text on both engines (Spark parses epoch_us via the registered "
    "view's column — see the per-engine projection swap in the entry).",
)
def events_velocity_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "events").createOrReplaceTempView("events")
    spark_sql = _VELOCITY_SQL.replace(
        "CAST(floor(epoch_us(ts) / 1000000) AS BIGINT)",
        "CAST(floor(unix_micros(CAST(ts AS TIMESTAMP)) / 1000000) AS BIGINT)",
    )
    return spark.sql(spark_sql)


_LOG2_MICRO = (
    "(length(bin(greatest(CAST(round(value * 1000000) AS BIGINT), 0) + 1)) - 1)"
)


@register(
    "events_log2_value_histogram",
    oracle=f"""
    SELECT CAST({_LOG2_MICRO} AS BIGINT) AS log2_bin,
           count(*) AS cnt,
           CAST(min(value) AS DOUBLE) AS min_v,
           CAST(max(value) AS DOUBLE) AS max_v
    FROM events
    GROUP BY 1
    """,
    tags=("aggregate", "profiling", "histogram"),
    doc="Log2-binned (exponential) histogram over event values: the "
    "heavy-tail profile equi-width bins can't show (one bucket per "
    "power-of-two of the micro-unit value). The bin is computed WITHOUT "
    "libm — floor(log2(x)) == bit_length(x) - 1, via length(bin(x)) on "
    "both engines — so the binning is exact integer arithmetic with no "
    "cross-engine float-boundary risk (the repo's no-libm-in-certified-"
    "values rule). One two-phase aggregate, ~64 output rows max at any "
    "scale.",
)
def events_log2_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events")
    return e.groupBy(F.expr(_LOG2_MICRO).cast("long").alias("log2_bin")).agg(
        F.count("*").alias("cnt"),
        F.min("value").cast("double").alias("min_v"),
        F.max("value").cast("double").alias("max_v"),
    )


_GAP_SQL = """
WITH gaps AS (
  SELECT user_id,
         ({ts_us}) - lag({ts_us}) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS gap_us
  FROM events
)
SELECT CAST(length(bin(gap_us + 1)) - 1 AS BIGINT) AS log2_gap_us,
       count(*) AS cnt,
       CAST(min(gap_us) AS BIGINT) AS min_gap_us,
       CAST(max(gap_us) AS BIGINT) AS max_gap_us
FROM gaps
WHERE gap_us IS NOT NULL
GROUP BY 1
"""


@register(
    "events_gap_log2_histogram",
    oracle=_GAP_SQL.format(ts_us="epoch_us(ts)"),
    tags=("events", "window", "profiling", "histogram"),
    doc="Inter-arrival-time profile: per-user event gaps (one user-keyed "
    "LAG window — partitioned, parallel, never a self-join) bucketed into "
    "power-of-two microsecond bins via the exact bit-length log2 (see "
    "events_log2_value_histogram; no libm). This is the burst/bot-detection "
    "and session-gap-calibration primitive: the histogram tells you where "
    "to put a sessionization gap threshold BEFORE running sessionization. "
    "Shuffles once on user_id; output is ~64 rows at any corpus size.",
)
def events_gap_log2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        _GAP_SQL.format(ts_us="unix_micros(CAST(ts AS TIMESTAMP))")
    )


RES_K = 8  # reservoir capacity per key

_RESERVOIR_SQL = """
    WITH seq AS (
      SELECT user_id, event_id,
             row_number() OVER (
               PARTITION BY user_id ORDER BY {ts_us}, event_id) AS i
      FROM events),
    writes AS (
      SELECT user_id, event_id, i,
             CASE WHEN i <= {k} THEN i - 1
                  WHEN h % i < {k} THEN h % i
                  ELSE NULL END AS slot
      FROM (SELECT user_id, event_id, i, {h} AS h FROM seq) q),
    ranked AS (
      SELECT user_id, slot, event_id, i,
             row_number() OVER (
               PARTITION BY user_id, slot ORDER BY i DESC) AS rn,
             count(*) OVER (PARTITION BY user_id, slot) AS n_writes
      FROM writes WHERE slot IS NOT NULL)
    SELECT user_id, CAST(slot AS BIGINT) AS slot,
           event_id AS sampled_event,
           CAST(n_writes AS BIGINT) AS n_writes
    FROM ranked WHERE rn = 1
"""


def _reservoir_sql(ts_us: str, md5l) -> str:
    """Both engines' SQL comes from this one template: `md5l` is the
    engine's 60-bit hash-expression builder (spark_md5_long /
    duck_md5_long); the concat + CAST(... AS STRING) spelling parses
    identically on Spark and DuckDB, like every sibling oracle."""
    h = md5l("concat('res:', CAST(user_id AS STRING), ':', CAST(i AS STRING))")
    return _RESERVOIR_SQL.format(ts_us=ts_us, k=RES_K, h=h)


@register(
    "events_reservoir_per_key",
    oracle=_reservoir_sql("epoch_us(ts)", duck_md5_long),
    tags=("corpus", "sampling", "window", "events"),
    doc=f"Per-key reservoir sample, Vitter's algorithm R with a seeded "
    f"hash as the randomness source: each user's event stream (ordered by "
    f"ts, event_id) seeds slots 0..{RES_K - 1} with its first {RES_K} "
    f"events, then event i replaces slot h_i mod i when that lands below "
    f"{RES_K} — the exact R acceptance rule, giving every prefix a "
    "uniform-over-prefix sample under a uniform hash. The sequential "
    "algorithm's FINAL state is replayed relationally: slot s holds the "
    "highest-index event that wrote s (seed writes i-1, replacement "
    "writes h_i mod i), so one row_number + one argmax-per-slot computes "
    "the reservoir without any sequential pass, and the oracle replays "
    "the identical closed form. n_writes exposes the replacement "
    "dynamics (slots with n_writes > 1 prove eviction happened). Scale: "
    "two keyed window passes, state per key is {RES_K} rows regardless "
    "of stream length — the per-entity sampling shape for 100 TB event "
    "stores where df.sample() cannot give per-key guarantees, and the "
    "closed form is embarrassingly shuffle-friendly (PARTITION BY key).",
)
def events_reservoir_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        _reservoir_sql("unix_micros(CAST(ts AS TIMESTAMP))", spark_md5_long)
    )


KS_A, KS_B = "purchase", "view"  # the two compared event populations


def _ks_sql(idiv: str) -> str:
    """Exact two-sample Kolmogorov-Smirnov distance between the value
    distributions of two event types, in pure integer arithmetic: the sup
    of |F_a - F_b| over the pooled support equals max |c_a*n_b - c_b*n_a|
    / (n_a*n_b), and numerator/denominator stay exact BIGINTs (counts
    ~1e4, products ~1e8 << 2^63). `idiv` is the engine's integer division
    (Spark ``div``, DuckDB ``//``)."""
    return f"""
    WITH s AS (
      SELECT CAST(floor(value * 100) AS BIGINT) AS cents,
             CASE WHEN event_type = '{KS_A}' THEN 1 ELSE 0 END AS is_a
      FROM events
      WHERE event_type IN ('{KS_A}', '{KS_B}') AND value IS NOT NULL),
    n AS (SELECT sum(is_a) AS na, sum(1 - is_a) AS nb FROM s),
    pts AS (
      SELECT cents, sum(is_a) AS a_here, sum(1 - is_a) AS b_here
      FROM s GROUP BY cents),
    cum AS (
      SELECT cents,
             sum(a_here) OVER (ORDER BY cents) AS ca,
             sum(b_here) OVER (ORDER BY cents) AS cb
      FROM pts),
    d AS (
      SELECT c.cents, abs(c.ca * n.nb - c.cb * n.na) AS diff
      FROM cum c, n),
    mx AS (SELECT max(diff) AS m FROM d)
    SELECT CAST(n.na AS BIGINT) AS n_a,
           CAST(n.nb AS BIGINT) AS n_b,
           CAST(mx.m AS BIGINT) AS ks_num,
           CAST((mx.m * 10000) {idiv} (n.na * n.nb) AS BIGINT) AS ks_bp,
           CAST(min(d.cents) AS BIGINT) AS ks_at_cents
    FROM d, mx, n
    WHERE d.diff = mx.m
    GROUP BY n.na, n.nb, mx.m
    """


@register(
    "analytics_ks_two_sample",
    oracle=_ks_sql("//"),
    tags=("analytics", "stats", "audit", "window"),
    doc=f"Exact two-sample Kolmogorov-Smirnov distance between the "
    f"'{KS_A}' and '{KS_B}' value distributions — the continuous-drift "
    "companion to corpus_source_drift_chi2 (categorical): one grouped "
    "count per distinct value, one ordered cumulative window over the "
    "pooled support, and the sup statistic as max |c_a*n_b - c_b*n_a| "
    "over exact BIGINTs, reported in basis points with the argmin "
    "threshold where the sup is attained (deterministic tiebreak: "
    "smallest value). No sampling, no approximation, no floats beyond "
    "the initial cents quantization both engines compute identically. "
    "Scale: the pooled-support relation is |distinct values|, not "
    "|events|; the window is one range-partitionable ordered pass — at "
    "100 TB this is the exact same plan Spark uses for any ordered "
    "cumulative aggregate, and the statistic drives drift-gated "
    "retraining (alert when ks_bp exceeds the D_crit for the sample "
    "sizes).",
)
def analytics_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_ks_sql("div"))


def _mwu_sql(idiv: str) -> str:
    """Exact Mann-Whitney U (rank-sum) between the same two event
    populations as the KS audit, tie-corrected, in pure integers: with
    per-distinct-value tie groups, doubled average ranks are
    2*c_before + cnt + 1 (always integer), so 2*R_a and the doubled U
    statistics are exact BIGINTs, and the AUC effect size
    P(A>B) + P(A=B)/2 comes out in basis points by integer division.
    Column convention matches SciPy/Wikipedia: u2_a = 2*U_A =
    2*R_A - n_a*(n_a+1) (sample A's rank-sum minus its minimum),
    u2_b = 2*U_B, u2_a + u2_b == 2*n_a*n_b."""
    return f"""
    WITH s AS (
      SELECT CAST(floor(value * 100) AS BIGINT) AS cents,
             CASE WHEN event_type = '{KS_A}' THEN 1 ELSE 0 END AS is_a
      FROM events
      WHERE event_type IN ('{KS_A}', '{KS_B}') AND value IS NOT NULL),
    n AS (SELECT sum(is_a) AS na, sum(1 - is_a) AS nb FROM s),
    pts AS (
      SELECT cents, sum(is_a) AS a_here, count(*) AS cnt
      FROM s GROUP BY cents),
    cum AS (
      SELECT cents, a_here, cnt,
             sum(cnt) OVER (ORDER BY cents) - cnt AS c_before
      FROM pts),
    r AS (  -- doubled tie-averaged rank sum of sample A
      SELECT sum(a_here * (2 * c_before + cnt + 1)) AS r2a FROM cum)
    SELECT CAST(n.na AS BIGINT) AS n_a,
           CAST(n.nb AS BIGINT) AS n_b,
           CAST(r.r2a - n.na * (n.na + 1) AS BIGINT) AS u2_a,
           CAST(2 * n.na * n.nb + n.na * (n.na + 1) - r.r2a AS BIGINT)
             AS u2_b,
           CAST(((r.r2a - n.na * (n.na + 1)) * 10000)
                {idiv} (2 * n.na * n.nb) AS BIGINT) AS auc_bp
    FROM n, r
    """


@register(
    "analytics_mann_whitney_u",
    oracle=_mwu_sql("//"),
    tags=("analytics", "stats", "audit", "window"),
    doc=f"Exact tie-corrected Mann-Whitney U between the '{KS_A}' and "
    f"'{KS_B}' value populations — the rank-sum companion to the KS sup "
    "statistic and the workhorse of A/B evaluation: each doubled U stays "
    "an exact BIGINT because doubled tie-averaged ranks are 2*c_before + "
    "cnt + 1 (u2_a = 2*U_A = 2*R_A - n_a*(n_a+1), the SciPy/Wikipedia "
    "convention), and the reported AUC (P(a>b) + P(a=b)/2, in basis points) "
    "is the effect size evaluators actually read (5000 bp = "
    "indistinguishable). u2_a + u2_b == 2*n_a*n_b by construction — "
    "pinned by test, a broken rank pass cannot satisfy it while "
    "matching the direct recomputation. Scale: one grouped count per "
    "distinct value + one ordered cumulative window over the pooled "
    "support (|distinct values|, not |events|) — same plan family as "
    "every ordered cumulative aggregate; no per-pair comparison ever "
    "materializes, which is what makes rank tests feasible where the "
    "naive P(A>B) double loop is |a|x|b|.",
)
def analytics_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_mwu_sql("div"))


def _wilcoxon_sql(idiv: str) -> str:
    """Exact tie-corrected Wilcoxon signed-rank over per-user paired sums:
    each user contributes one signed difference d = cents(purchase) -
    cents(view); nonzero |d| values are ranked with tie-averaged DOUBLED
    ranks (2*c_before + cnt + 1, always integer), giving exact BIGINT
    doubled rank sums W2+ / W2- with the partition identity
    W2+ + W2- = n(n+1). The reported share (W2+ over the total, basis
    points) is the matched-pairs rank-biserial effect size mapped to
    [0, 10000] — kept non-negative on purpose: Spark's `div` truncates
    toward zero while DuckDB's `//` floors, so certified integer
    divisions must never see a negative numerator."""
    return f"""
    WITH s AS (
      SELECT user_id,
             sum(CASE WHEN event_type = '{KS_A}'
                      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END)
               AS a,
             sum(CASE WHEN event_type = '{KS_B}'
                      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END)
               AS b
      FROM events
      WHERE event_type IN ('{KS_A}', '{KS_B}') AND value IS NOT NULL
      GROUP BY user_id),
    d AS (SELECT user_id, a - b AS d FROM s),
    nz AS (
      SELECT abs(d) AS ad, CASE WHEN d > 0 THEN 1 ELSE 0 END AS pos
      FROM d WHERE d <> 0),
    pts AS (SELECT ad, sum(pos) AS pos_here, count(*) AS cnt
            FROM nz GROUP BY ad),
    cum AS (
      SELECT ad, pos_here, cnt,
             sum(cnt) OVER (ORDER BY ad) - cnt AS c_before
      FROM pts),
    agg AS (
      SELECT sum(pos_here * (2 * c_before + cnt + 1)) AS w2_pos,
             sum((cnt - pos_here) * (2 * c_before + cnt + 1)) AS w2_neg,
             sum(cnt) AS n_nz
      FROM cum),
    zc AS (SELECT count(*) AS n_zero FROM d WHERE d = 0)
    SELECT CAST(agg.n_nz AS BIGINT) AS n_nonzero,
           CAST(zc.n_zero AS BIGINT) AS n_zero,
           CAST(agg.w2_pos AS BIGINT) AS w2_pos,
           CAST(agg.w2_neg AS BIGINT) AS w2_neg,
           CAST((agg.w2_pos * 10000)
                {idiv} (agg.n_nz * (agg.n_nz + 1)) AS BIGINT)
             AS w_pos_share_bp
    FROM agg, zc
    """


@register(
    "analytics_wilcoxon_signed_rank",
    oracle=_wilcoxon_sql("//"),
    tags=("analytics", "stats", "audit", "window"),
    doc=f"Exact tie-corrected Wilcoxon signed-rank test over per-user "
    f"paired differences (cents('{KS_A}') - cents('{KS_B}') per user) — "
    "the PAIRED companion to the Mann-Whitney U audit and the standard "
    "nonparametric before/after test: doubled tie-averaged ranks keep "
    "every statistic an exact BIGINT, W2+ + W2- == n(n+1) is the "
    "partition identity a broken rank pass cannot satisfy (test-pinned), "
    "and the reported W2+ share in basis points is the matched-pairs "
    "rank-biserial effect size on [0, 10000] (5000 = symmetric). Scale: "
    "one per-user aggregate (shuffles user keys once), then a grouped "
    "count + one ordered cumulative window over |distinct |d|| values — "
    "the pooled-support plan family shared with the KS and MWU audits; "
    "nothing is ever per-pair.",
)
def analytics_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_wilcoxon_sql("div"))


FRIEDMAN_K = 5  # the five event types form the related samples


def _friedman_sql(idiv: str) -> str:
    """Exact tie-corrected Friedman test across the five event types as
    k related samples blocked by user: within each user the per-type cents
    totals are ranked with tie-averaged DOUBLED ranks (2*(rank-1) +
    |ties| + 1, always integer), per-type doubled rank sums are exact
    BIGINTs with the identity sum_t R2_t == n*k*(k+1), and the Friedman
    statistic is emitted in exact milli-units from the doubled-rank form
    Q = (3*sum R2_t^2 - 3*n^2*k*(k+1)^2) / (n*k*(k+1)) — the numerator is
    non-negative by Cauchy-Schwarz, so Spark `div` and DuckDB `//` agree."""
    k = FRIEDMAN_K
    return f"""
    WITH s AS (
      SELECT user_id, event_type,
             sum(CAST(floor(value * 100) AS BIGINT)) AS cents
      FROM events
      WHERE value IS NOT NULL
      GROUP BY user_id, event_type),
    elig AS (SELECT user_id FROM s GROUP BY user_id HAVING count(*) = {k}),
    r AS (
      SELECT s.user_id, s.event_type,
             2 * (rank() OVER (PARTITION BY s.user_id ORDER BY s.cents) - 1)
               + count(*) OVER (PARTITION BY s.user_id, s.cents) + 1 AS r2
      FROM s JOIN elig ON s.user_id = elig.user_id),
    t AS (SELECT event_type, sum(r2) AS r2_sum FROM r GROUP BY event_type),
    agg AS (
      SELECT sum(r2_sum) AS tot, sum(r2_sum * r2_sum) AS sq FROM t),
    pv AS (
      SELECT
        max(CASE WHEN event_type = 'click' THEN r2_sum END) AS r2_click,
        max(CASE WHEN event_type = 'error' THEN r2_sum END) AS r2_error,
        max(CASE WHEN event_type = 'purchase' THEN r2_sum END) AS r2_purchase,
        max(CASE WHEN event_type = 'signup' THEN r2_sum END) AS r2_signup,
        max(CASE WHEN event_type = 'view' THEN r2_sum END) AS r2_view
      FROM t),
    n AS (SELECT count(*) AS nu FROM elig)
    SELECT CAST(n.nu AS BIGINT) AS n_users,
           CAST({k} AS BIGINT) AS k_types,
           CAST(agg.tot AS BIGINT) AS r2_total,
           CAST(pv.r2_click AS BIGINT) AS r2_click,
           CAST(pv.r2_error AS BIGINT) AS r2_error,
           CAST(pv.r2_purchase AS BIGINT) AS r2_purchase,
           CAST(pv.r2_signup AS BIGINT) AS r2_signup,
           CAST(pv.r2_view AS BIGINT) AS r2_view,
           CAST((3 * agg.sq - 3 * n.nu * n.nu * {k} * {(k + 1) ** 2}) * 1000
                {idiv} (n.nu * {k} * {k + 1}) AS BIGINT) AS q_milli
    FROM n, agg, pv
    """


@register(
    "analytics_friedman_test",
    oracle=_friedman_sql("//"),
    tags=("analytics", "stats", "audit", "window"),
    doc="Exact tie-corrected Friedman test — the k-related-samples member "
    "completing the nonparametric family (KS and Mann-Whitney for two "
    "independent samples, Wilcoxon for two paired): each user is a block, "
    "the five event types' cents totals are ranked WITHIN the block with "
    "tie-averaged doubled ranks, and the statistic comes out in exact "
    "milli-units from pure BIGINT arithmetic (numerator non-negative by "
    "Cauchy-Schwarz, keeping Spark div and DuckDB // in agreement). "
    "sum_t R2_t == n*k*(k+1) is the partition identity a broken "
    "within-block rank pass cannot satisfy (test-pinned, alongside a "
    "sequential scipy-style replay). This is the 'does ANY variant "
    "differ' gate run before pairwise rank tests in k-arm experiments. "
    "Scale: one (user,type)-keyed aggregate, one k-row-per-user window "
    "pass, then a k-row reduction — ranks never leave the user's "
    "partition, nothing is pairwise.",
)
def analytics_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_friedman_sql("div"))
