"""Semantic pins for sketch operators that the oracle hash gate cannot see.

The sliding-HLL parity check shares one SQL text across engines, so a
semantic bug (e.g. a ROWS frame over only the days PRESENT in the data)
passes the hash gate on any corpus without calendar gaps. This test feeds a
corpus WITH a gap and pins the documented trailing-calendar-day behavior —
the round-4 ADVICE finding.
"""

from __future__ import annotations

import datetime

from flock_spark.operators.sketches import HLL_WINDOW_DAYS, SPARK_D, _hll_sliding_sql


def test_sliding_hll_gap_days_do_not_widen_window(spark):
    # user 10 active on day 1 only; user 20 on day 5 only; days 2-4 empty.
    # Trailing-3-calendar-day window at day 5 covers days 3..5 => only user
    # 20. The pre-fix ROWS-over-present-days frame saw {day1, day5} and
    # leaked user 10 into day 5's sketch.
    assert HLL_WINDOW_DAYS == 3
    day = lambda d: datetime.datetime(2024, 1, d)  # noqa: E731
    rows = [(10, day(1)), (20, day(5))]
    spark.createDataFrame(rows, "user_id INT, ts TIMESTAMP").createOrReplaceTempView(
        "events"
    )
    out = {
        r["day"].day: r["v_empty"]
        for r in spark.sql(_hll_sliding_sql(SPARK_D)).collect()
    }
    # densified calendar spine: every day 1..5 emits a row
    assert sorted(out) == [1, 2, 3, 4, 5]
    assert out[1] == 63  # user 10 alone
    assert out[2] == 63  # trailing window {1,2} still sees user 10
    assert out[3] == 63  # {1..3} still sees user 10
    assert out[4] == 64  # {2..4}: user 10 aged out, empty sketch
    assert out[5] == 63  # {3..5}: only user 20 — day-1 user must NOT leak
    spark.catalog.dropTempView("events")


def test_stagger_window_actually_buckets(spark, sf_dir):
    # regression for the float-division collapse: with bare `/`, BOTH
    # engines computed w_start_s == the raw epoch second, so every "window"
    # held one event and the oracle still matched. Pin real bucketing:
    # groups must aggregate multiple events, window starts must align to
    # each key's offset grid, and offsets must differ across keys.
    from flock_spark.registry import REGISTRY, get_queries

    get_queries()
    rows = REGISTRY["stagger_window_agg"].fn(spark, sf_dir).collect()
    assert rows
    assert max(r["cnt"] for r in rows) > 1, "windows degenerate to single events"
    for r in rows:
        assert r["w_start_s"] % 3600 == r["off_s"]
    assert len({r["off_s"] for r in rows}) > 1, "offsets do not vary by key"
