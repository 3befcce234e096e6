"""Bucketed co-located join: the 100 TB strategy for the orders ⋈ lineitem
fact-fact join (tpch docstrings: 'a cluster deployment would bucket both by
orderkey to make this join shuffle-free'). This test proves the claim on
real tables: both sides bucketed by the join key into the same bucket count
join with NO Exchange in the physical plan — the shuffle happens once at
write time and is amortized over every subsequent join/aggregation on that
key.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    # external tables (explicit path) — no warehouse-dir dependency
    wh = str(tmp_path_factory.mktemp("bucketed_wh"))
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", wh + "/b_orders")
        .saveAsTable("b_orders")
    )
    (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", wh + "/b_lineitem")
        .saveAsTable("b_lineitem")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed):
    # force the shuffle-join path: at test scale AQE would broadcast the
    # small side, hiding exactly the shuffle that bucketing eliminates
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table("b_orders")
            .join(spark.table("b_lineitem"), F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("cnt"))
        )
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        # join reads co-located buckets: no shuffle below the join; the only
        # Exchange left is the groupBy's (different key)
        assert final.count("Exchange hashpartitioning") == 1, final
        assert "SortMergeJoin" in final, final
        assert "Bucketed: true" in final, final
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # correctness unchanged vs the plain (shuffling) join
    plain = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .join(
            spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("cnt"))
    )
    assert sorted(map(tuple, j.collect())) == sorted(map(tuple, plain.collect()))


def test_zorder_layout_skips_both_dimensions(spark, sf_dir):
    """The Z-ordered events layout gives every file a tight min/max box in
    BOTH (user_id, hour): the 2-D probe box the registered query uses must
    be skippable for most files on parquet statistics alone. A single-column
    sort can never do this for the second dimension (its hour ranges span
    the full day in every file)."""
    import glob
    import os

    import pyarrow.parquet as pq

    from flock_spark.queries.layouts import Z_FILES, _zorder_events_path
    from flock_spark.registry import REGISTRY

    # materialize layout + sanity-run the registered query
    REGISTRY["zorder_layout_scan"].fn(spark, sf_dir).collect()
    path = _zorder_events_path(spark, sf_dir)
    files = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    assert len(files) == Z_FILES

    def box(f, col):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        stats = [md.row_group(i).column(idx).statistics for i in range(md.num_row_groups)]
        return min(s.min for s in stats), max(s.max for s in stats)

    overlapping = 0
    for f in files:
        umin, umax = box(f, "user_id")
        hmin, hmax = box(f, "hour")
        if not (umax < 40 or umin > 47 or hmax < 8 or hmin > 11):
            overlapping += 1
    # the probe box (8 of 150 users x 4 of 24 hours ~ 0.9% of the space)
    # must prune the large majority of files
    assert overlapping <= Z_FILES // 3, f"{overlapping}/{Z_FILES} files overlap"
