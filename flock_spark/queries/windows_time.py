"""Time-window aggregations (SURVEY §2.9 — the reference's streaming windows).

The reference drives tumbling/hopping/session/global windows with bespoke
Lambda window drivers (flock-function/src/aws/window/{tumbling,hopping,
session,global}.rs). In Spark these are *expressions*: `window()` /
`session_window()` group keys work identically over batch DataFrames and
Structured Streaming micro-batches, so the same query text serves both; the
streaming runners live in flock_spark.streaming.

Window semantics pinned here (and verified against the DuckDB oracles):
- tumbling/hopping starts are epoch-aligned (Spark's default origin matches
  DuckDB's `time_bucket`);
- an event at time t belongs to hopping windows with start in (t - size, t]
  aligned to the slide — exactly size/slide windows;
- session windows close when the gap to the next event is >= the timeout
  (Spark's window is [ts, ts+gap), end-exclusive), mirroring the reference's
  gap logic in session.rs:64-186.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from flock_spark.catalog import tbl
from flock_spark.operators.sketches import DUCK_D, SPARK_D
from flock_spark.queries.relational import fsum
from flock_spark.registry import register


@register(
    "tumbling_window_agg",
    oracle=f"""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS w_start,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) + INTERVAL 1 HOUR AS w_end,
           event_type,
           count(*) AS cnt,
           {fsum('value')} AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    tags=("window_time", "streaming"),
    doc="Tumbling window aggregate (reference: tumbling.rs:31-188 buffers "
    "window_size epochs per worker; Spark expresses it as a window() group key "
    "— one shuffle, partial agg map-side).",
)
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"), F.expr(fsum("value")).alias("sum_value"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


@register(
    "hopping_window_agg",
    oracle=f"""
    SELECT w_start, w_start + INTERVAL 1 HOUR AS w_end, event_type,
           count(*) AS cnt, {fsum('value')} AS sum_value
    FROM (
      SELECT time_bucket(INTERVAL '30 minutes', ts) - (k.k * INTERVAL '30 minutes') AS w_start,
             event_type, value
      FROM events, (VALUES (0), (1)) k(k)
    ) expanded
    GROUP BY w_start, event_type
    """,
    tags=("window_time", "streaming"),
    doc="Hopping (sliding) window: size 1 h, hop 30 min — every event lands in "
    "exactly 2 windows (reference: hopping.rs:31-124 drains hop epochs and "
    "keeps the overlap; Spark's window() replicates rows per window).",
)
def hopping_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"), F.expr(fsum("value")).alias("sum_value"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


@register(
    "session_window_agg",
    oracle="""
    WITH gaps AS (
      SELECT ts, value,
             CASE WHEN ts - lag(ts) OVER (ORDER BY ts) > INTERVAL '10 minutes'
                  THEN 1 ELSE 0 END AS brk
      FROM events
    ), sessions AS (
      SELECT ts, value,
             sum(brk) OVER (ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM gaps
    )
    SELECT min(ts) AS session_start,
           max(ts) + INTERVAL '10 minutes' AS session_end,
           count(*) AS cnt
    FROM sessions
    GROUP BY sess_id
    """,
    tags=("window_time", "streaming", "session"),
    doc="Global sessionization with a 10-minute gap (reference: session window "
    "driver session.rs:187-321; gap semantics session.rs:64-186). Spark "
    "session_window end = last event + gap, end-exclusive; oracle reproduces "
    "it with the lag/cumsum island technique.",
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "10 minutes").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "cnt",
        )
    )


@register(
    "session_window_by_key",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL '6 hours'
                  THEN 1 ELSE 0 END AS brk
      FROM events
    ), sessions AS (
      SELECT user_id, ts, value,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM gaps
    )
    SELECT user_id,
           min(ts) AS session_start,
           count(*) AS cnt
    FROM sessions
    GROUP BY user_id, sess_id
    """,
    tags=("window_time", "streaming", "session"),
    doc="Per-key sessionization (6 h gap). The reference partitions one Lambda "
    "per distinct key via the fork's HashDiff partitioning (session.rs:25,"
    "255-261); Spark's session_window + groupBy(user_id) shuffles by key — "
    "same co-location, no custom partitioner.",
)
def session_window_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "6 hours").alias("w"), "user_id")
        .agg(F.count("*").alias("cnt"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "cnt",
        )
    )


@register(
    "tumbling_daily_distinct",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS w_start,
           count(DISTINCT user_id) AS uniq_users,
           count(*) AS cnt
    FROM events
    GROUP BY 1
    """,
    tags=("window_time", "aggregate"),
    doc="Daily tumbling window + COUNT(DISTINCT) (windowed distinct — the "
    "shape behind reference q11-style per-window counts).",
)
def tumbling_daily_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.countDistinct("user_id").alias("uniq_users"), F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("w_start"), "uniq_users", "cnt")
    )


@register(
    "window_ntile_pct",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cdist
    FROM lineitem
    WHERE l_orderkey <= 200
    WINDOW w AS (PARTITION BY l_orderkey
                 ORDER BY l_extendedprice, l_linenumber)
    """,
    tags=("window_fn",),
    doc="Remaining rank-family analytics: ntile / percent_rank / cume_dist "
    "over a per-key frame (completes SURVEY §2.5's WindowAggExec surface).",
)
def window_ntile_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = tbl(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)  # noqa: E741
    w = W.partitionBy("l_orderkey").orderBy("l_extendedprice", "l_linenumber")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@register(
    "session_custom_gap_pandas",
    oracle="""
    WITH o AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 1 HOUR * (1 + user_id % 3)
                  THEN 1 ELSE 0 END AS brk
      FROM events),
    s AS (SELECT user_id, ts,
                 sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
          FROM o)
    SELECT user_id, CAST(sid AS BIGINT) AS session_id,
           min(ts) AS session_start, count(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
    tags=("window_time", "session", "pandas_udf"),
    doc="Per-key DYNAMIC session gap (gap = (1 + user_id % 3) hours) via "
    "grouped-map applyInPandas — the custom sessionization the built-in "
    "session_window (fixed gap) can't express; the reference's session "
    "driver keeps exactly this per-key gap state (session.rs:64-186). "
    "Oracle: classic gaps-and-islands (lag + running sum of breaks). One "
    "shuffle on the key; each group sessionizes linearly in Arrow batches.",
)
def session_custom_gap_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    e = tbl(spark, sf_dir, "events").select("user_id", "ts")

    def sessionize(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts")
        gap_sec = 3600 * (1 + int(pdf["user_id"].iloc[0]) % 3)
        brk = (pdf["ts"].diff().dt.total_seconds() > gap_sec).astype("int64")
        sid = brk.cumsum()
        out = (
            pdf.assign(session_id=sid)
            .groupby("session_id", as_index=False)
            .agg(user_id=("user_id", "first"), session_start=("ts", "min"),
                 n_events=("ts", "count"))
        )
        return out[["user_id", "session_id", "session_start", "n_events"]]

    return e.groupBy("user_id").applyInPandas(
        sessionize,
        schema="user_id long, session_id long, session_start timestamp, n_events long",
    )


@register(
    "timeseries_gapfill_locf",
    oracle="""
    WITH daily AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events WHERE user_id < 25 GROUP BY 1, 2),
    spine AS (
        SELECT user_id,
               unnest(generate_series(min(day), max(day), INTERVAL 1 DAY)) AS day
        FROM daily GROUP BY user_id),
    filled AS (
        SELECT s.user_id, s.day, d.cents
        FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day)
    SELECT user_id, day,
           last_value(cents IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_cents,
           cents IS NULL AS is_gap
    FROM filled
    """,
    tags=("window_time", "timeseries", "scale-pattern"),
    doc="Time-series regularization: per-key daily grid (sequence + explode "
    "between each key's min and max day) left-joined to the observed daily "
    "aggregate, missing days filled by last-observation-carried-forward "
    "(last(ignorenulls) over an unbounded-preceding frame). The spine "
    "explode grows O(span/step) per key and the fill is one window over the "
    "(key, day) shuffle — no driver-side calendar, no cross join with a "
    "global date dimension, so the plan is linear in output rows at any "
    "corpus size. Daily sums are fixed-point cents (BIGINT) so the carried "
    "value is bit-identical cross-engine.",
)
def timeseries_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events").filter(F.col("user_id") < 25)
    daily = e.groupBy(
        "user_id", F.date_trunc("DAY", "ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"))
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(
                F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
            ).alias("day"),
        )
    )
    filled = spine.join(daily, ["user_id", "day"], "left")
    w = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return filled.select(
        "user_id",
        "day",
        F.last("cents", ignorenulls=True).over(w).alias("filled_cents"),
        F.col("cents").isNull().alias("is_gap"),
    )


@register(
    "timeseries_ohlc_daily",
    oracle="""
    WITH ordered AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(round(value * 100) AS BIGINT) AS cents,
             row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events WHERE user_id < 25)
    SELECT user_id, day,
           CAST(max(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS open_cents,
           max(cents) AS high_cents,
           min(cents) AS low_cents,
           CAST(max(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT) AS close_cents,
           count(*) AS n_ticks
    FROM ordered
    GROUP BY user_id, day
    """,
    tags=("window_time", "timeseries"),
    doc="OHLC bar resampling: per (key, day) open/high/low/close from the "
    "tick stream — the financial/metrics downsampling primitive (the "
    "continuous-aggregate shape TimescaleDB calls a candlestick rollup). "
    "Open/close are first/last by the deterministic (ts, event_id) order, "
    "lowered to two row_number windows + conditional max so the whole bar "
    "builds in ONE (key, day) shuffle — no self-join back for the "
    "endpoints, no min_by/max_by dialect drift (their tie-breaking "
    "differs across engines; row_number's explicit tie-break is pinned). "
    "Values are fixed-point cents, bit-identical cross-engine. At 100 TB "
    "bars land partitioned by day and serve coarser windows by rollup "
    "reuse (rollup_reuse_daily) instead of rescanning ticks.",
)
def timeseries_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = tbl(spark, sf_dir, "events").filter(F.col("user_id") < 25)
    day = F.date_trunc("day", F.col("ts")).alias("day")
    cents = F.round(F.col("value") * 100).cast("long")
    base = e.select("user_id", day, cents.alias("cents"), "ts", "event_id")
    wa = W.partitionBy("user_id", "day").orderBy("ts", "event_id")
    wd = W.partitionBy("user_id", "day").orderBy(F.desc("ts"), F.desc("event_id"))
    ordered = base.select(
        "user_id",
        "day",
        "cents",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return ordered.groupBy("user_id", "day").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("cents"))).cast("long").alias("open_cents"),
        F.max("cents").alias("high_cents"),
        F.min("cents").alias("low_cents"),
        F.max(F.when(F.col("rn_d") == 1, F.col("cents"))).cast("long").alias("close_cents"),
        F.count("*").alias("n_ticks"),
    )


EWMA_TAPS = 8  # alpha = 1/2, truncated to 8 taps (tail weight 2^-9 < 0.2%)


def _ewma_tap_sum(d) -> str:
    """Dialect-routed SQL: truncated alpha=1/2 EWMA as a lag pipeline.

    ewma_t = sum_{k=0..7} x_{t-k} / 2^(k+1) — computed on fixed-point
    cents with integer right shifts, so the smoothed series is
    bit-identical across engines and partitionings where a recursive
    float EWMA depends on accumulation history. COALESCE pins the
    series head (missing lags contribute 0, matching an all-zero
    pre-history). Shifts go through the sketches._Dialect shr helper
    (Spark shiftright / DuckDB >>) like every other shift in the repo —
    raw `>>` is Spark>=4-only syntax."""
    taps = " + ".join(
        d.shr(f"COALESCE(lag(cents, {k}) OVER w, 0)", k + 1)
        for k in range(EWMA_TAPS)
    )
    return f"({taps})"


@register(
    "timeseries_ewma_shifts",
    oracle=f"""
    WITH daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events WHERE user_id < 25 GROUP BY 1, 2)
    SELECT user_id, day, cents,
           CAST({_ewma_tap_sum(DUCK_D)} AS BIGINT) AS ewma_cents
    FROM daily
    WINDOW w AS (PARTITION BY user_id ORDER BY day)
    """,
    tags=("window_time", "timeseries"),
    doc=f"Exponentially weighted moving average (alpha=1/2) over the daily "
    f"per-key series, truncated to {EWMA_TAPS} taps and lowered to a lag "
    "pipeline with integer right shifts on fixed-point cents — the "
    "smoothing/trend primitive of monitoring dashboards, made "
    "bit-deterministic where the textbook recursive float EWMA depends "
    "on accumulation history (and can't parallelize: each value needs "
    "its predecessor's result, while the truncated-tap form is one "
    "window over the (key, day) shuffle, each row independent). The "
    f"dropped tail carries < 2^-{EWMA_TAPS + 1} of the weight — "
    "quantified, not hand-waved.",
)
def timeseries_ewma_shifts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "events").filter(F.col("user_id") < 25)
    daily = (
        e.groupBy(
            "user_id", F.date_trunc("day", F.col("ts")).alias("day")
        )
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("cents"))
    )
    daily.createOrReplaceTempView("ewma_daily_tmp")
    return daily.sparkSession.sql(
        f"""
        SELECT user_id, day, cents,
               CAST({_ewma_tap_sum(SPARK_D)} AS BIGINT) AS ewma_cents
        FROM ewma_daily_tmp
        WINDOW w AS (PARTITION BY user_id ORDER BY day)
        """
    )


# ---------------------------------------------------------------------------
# Stagger window (declared in the reference, never implemented there)
# ---------------------------------------------------------------------------

STAGGER_SIZE_S = 3600  # window width; per-key offset in [0, STAGGER_SIZE_S)


def _stagger_body(d, floor_epoch: str) -> str:
    """Dialect-routed SQL body: per-key staggered tumbling windows.

    Each key's tumbling grid is shifted by a deterministic offset =
    md5(key) % size, so window boundaries — and therefore emission/flush
    load — spread uniformly over the hour instead of every key firing at
    :00 (the thundering-herd problem stagger windows exist to solve).
    Integer epoch arithmetic on identically-floored seconds; offset
    subtraction stays non-negative because epochs >> size. The bucketing
    division MUST be the dialect's integer division (Spark `div`, DuckDB
    `//`) — both engines' bare `/` is float division, under which
    ((e - off)/size)*size + off collapses back to e and the "window"
    degenerates to per-second groups on BOTH engines (parity would hold
    while the semantics are vacuous; caught by the max-group-size pin in
    tests/test_sketch_semantics.py)."""
    off = f"({d.md5l(f'CAST(user_id AS {d.str_t})')} % {STAGGER_SIZE_S})"
    ws = (
        f"({d.idiv(f'({floor_epoch} - {off})', str(STAGGER_SIZE_S))}"
        f" * {STAGGER_SIZE_S} + {off})"
    )
    return f"""
    WITH base AS (
      SELECT user_id, {off} AS off_s,
             CAST({ws} AS BIGINT) AS w_start_s,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE user_id < 25)
    SELECT user_id, off_s, w_start_s,
           count(*) AS cnt,
           CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM base
    GROUP BY user_id, off_s, w_start_s
    """


@register(
    "stagger_window_agg",
    oracle=_stagger_body(DUCK_D, "CAST(floor(epoch(ts)) AS BIGINT)"),
    tags=("window_time", "streaming-twin"),
    doc="Stagger window: per-key tumbling windows whose grid is shifted by "
    "a deterministic hash offset in [0, size) — every key still gets "
    "exact, gap-free hourly windows, but boundaries are uniformly spread "
    "over the hour so window flush/emission load never synchronizes "
    "(the thundering-herd the reference's window.rs:104-110 declares a "
    "Stagger variant for but leaves unimplemented — this completes the "
    "declared surface). Lowering: the window start is a pure projection "
    "(integer epoch arithmetic on identically-floored seconds + the "
    "portable md5 offset), then ONE grouped aggregate — same single "
    "shuffle as a plain tumbling window; in streaming the same column "
    "works as a group key with a watermark because it is monotone in ts "
    "per key. Offsets are emitted so the grid shift is auditable.",
)
def stagger_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_stagger_body(SPARK_D, "unix_timestamp(ts)"))


# ---------------------------------------------------------------------------
# Watermark lateness audit (how late does data actually arrive?)
# ---------------------------------------------------------------------------

LATE_PARTS = 8  # stand-in for source partitions (kafka/kinesis shards)


def _lateness_body(d, floor_epoch: str) -> str:
    """Per-source-partition lateness histogram: an event's lateness is the
    high-watermark of its own partition's arrival stream (running max of
    event time in arrival order) minus its event time. Arrival order only
    exists per partition at scale, so the running max is ONE keyed window —
    never a global sort. The synthetic corpus is generated in event-time
    order (lateness would be identically zero — a vacuous audit), so
    arrival order is simulated by a deterministic md5 permutation within
    each partition; a real deployment orders by the log offset instead and
    nothing else changes. Integer seconds from identically-floored epochs;
    log2 lateness buckets (length(bin(x)) — the HDR-histogram trick, shared
    SQL on both engines) keep the audit a handful of rows whatever the
    lateness spread, exactly the resolution watermark tuning needs."""
    bucket = "(CASE WHEN mx = es THEN 0 ELSE length(bin(mx - es)) END)"
    arrival = d.md5l(f"CAST(event_id AS {d.str_t})")
    return f"""
    WITH o AS (
      SELECT event_id % {LATE_PARTS} AS part, event_id,
             {arrival} AS arrival_key,
             {floor_epoch} AS es
      FROM events
    ), r AS (
      SELECT part, es,
             max(es) OVER (PARTITION BY part ORDER BY arrival_key, event_id
                           ROWS UNBOUNDED PRECEDING) AS mx
      FROM o
    )
    SELECT CAST({bucket} AS BIGINT) AS late_bucket,
           count(*) AS n_events,
           CAST(min(mx - es) AS BIGINT) AS min_late_s,
           CAST(max(mx - es) AS BIGINT) AS max_late_s
    FROM r
    GROUP BY 1
    """


@register(
    "events_watermark_lateness_audit",
    oracle=_lateness_body(DUCK_D, "CAST(floor(epoch(ts)) AS BIGINT)"),
    tags=("window_time", "streaming-twin", "audit"),
    doc=f"Watermark lateness audit: per source partition (event_id % "
    f"{LATE_PARTS} stands in for the shard id), each event's lateness is "
    "the partition's running event-time high-watermark minus its own "
    "event time, histogrammed in log2-seconds buckets (the HDR trick — "
    "a handful of rows at any lateness spread) — THE table consulted to "
    "choose a withWatermark delay: the bucket where the tail mass ends "
    "is the delay that bounds state without dropping data, and "
    "re-running the audit per partition exposes a single skewed shard. "
    "The reference has no late-data policy at all (SURVEY §2.9); this "
    "repo adds watermarks everywhere, and this audit is how the delay "
    "value is chosen rather than guessed. Arrival order is simulated by "
    "a deterministic md5 permutation (the generator emits in event-time "
    "order, which would make every lateness zero — vacuous); real "
    "deployments order by log offset. Plan: one keyed window (arrival "
    "order is only meaningful per partition at scale, so there is no "
    "global sort to want) + one tiny histogram aggregate.",
)
def events_watermark_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_lateness_body(SPARK_D, "unix_timestamp(ts)"))


GAP_SWEEP_MIN = (30, 120, 360)  # candidate session gaps, minutes


@register(
    "events_session_gap_sweep",
    oracle=f"""
    WITH d AS (
      SELECT user_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       IS NULL THEN NULL
                  ELSE ts - lag(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) END AS delta
      FROM events),
    a AS (
      SELECT CAST(count(*) AS BIGINT) AS n_events,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
             {", ".join(
               f"CAST(sum(CASE WHEN delta > INTERVAL '{g} minutes' THEN 1 ELSE 0 END) AS BIGINT) AS brk{g}"
               for g in GAP_SWEEP_MIN)}
      FROM d)
    {" UNION ALL ".join(
      f'''SELECT CAST({g} AS BIGINT) AS gap_minutes, n_users, n_events,
                 n_users + brk{g} AS n_sessions,
                 CAST(floor(n_events * 1000000.0 / (n_users + brk{g}) + 0.5)
                      AS BIGINT) AS events_per_session_micro
          FROM a''' for g in GAP_SWEEP_MIN)}
    """,
    tags=("window_time", "session", "audit"),
    doc=f"Session-gap parameter sweep: for gap in {GAP_SWEEP_MIN} minutes, "
    "the session count and mean session size the corpus would produce — "
    "the tuning table read before fixing a sessionizer's gap (too small "
    "fragments journeys, too large merges visits). ONE window pass "
    "computes each event's per-user predecessor delta; every gap then "
    "costs only a conditional sum in the same aggregate (n_sessions = "
    "n_users + breaks), and the 3-row output is unpivoted from a single "
    "1-row aggregate — the event log is scanned once and shuffled once "
    "(by user_id), not once per candidate gap. Mean sizes are exact "
    "micro-unit integers.",
)
def events_session_gap_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    e = tbl(spark, sf_dir, "events").select("user_id", "event_id", F.col("ts").cast("timestamp").alias("ts"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    d = e.withColumn(
        "delta_us",
        F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w)),
    )
    agg = d.agg(
        F.count("*").cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        *[
            F.sum(F.when(F.col("delta_us") > g * 60_000_000, 1).otherwise(0))
            .cast("long")
            .alias(f"brk{g}")
            for g in GAP_SWEEP_MIN
        ],
    )
    # Unpivot via explode-of-structs, NOT a 3-way union of selects over
    # agg: Spark inlines the deterministic agg subtree once per union
    # branch, so the union form scanned and windowed the event log three
    # times (plan: 3 identical scan→window→agg subtrees). Exploding a
    # 3-element struct array over the single 1-row aggregate keeps the
    # one-scan/one-shuffle shape the entry's doc promises.
    rows = F.array(
        *[
            F.struct(
                F.lit(g).cast("long").alias("gap_minutes"),
                F.col("n_users").alias("n_users"),
                F.col("n_events").alias("n_events"),
                (F.col("n_users") + F.col(f"brk{g}")).alias("n_sessions"),
                F.expr(
                    f"CAST(floor(n_events * 1000000.0 / (n_users + brk{g}) + 0.5) AS BIGINT)"
                ).alias("events_per_session_micro"),
            )
            for g in GAP_SWEEP_MIN
        ]
    )
    return agg.select(F.explode(rows).alias("r")).select("r.*")
