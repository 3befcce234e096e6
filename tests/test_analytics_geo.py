"""Semantic + plan pins for queries/analytics.py and operators/geo.py.

The oracle-parity sweep certifies values; these tests pin the claims the
oracles can't see:
- the two-phase (bucket-local -> global) pareto frontier equals the direct
  quadratic NOT-EXISTS dominance definition (independent formulation);
- the attribution matrix is non-vacuous (multiple channels, real revenue)
  and never credits a touch outside the 7-day window;
- the radius join plans as a hash equi-join on the cell key (no cartesian /
  nested-loop path anywhere) while the ORACLE is the quadratic form;
- the weighted sample emits a dense rank 1..k and in-range weights.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flock_spark.registry import REGISTRY, get_queries
from tests.test_plans import plan_of

get_queries()


def test_pareto_two_phase_equals_quadratic_dominance(spark, sf_dir):
    from flock_spark.catalog import tbl

    got = {
        (r.price, r.size, r.n_parts)
        for r in REGISTRY["analytics_pareto_frontier"].fn(spark, sf_dir).collect()
    }
    p = tbl(spark, sf_dir, "part")
    p.select(
        F.col("p_retailprice").alias("price"), F.col("p_size").alias("size")
    ).distinct().createOrReplaceTempView("pts_quad")
    p.createOrReplaceTempView("part_quad")
    want = {
        (r.price, r.size, r.n_parts)
        for r in spark.sql(
            """
            WITH sky AS (
              SELECT price, size FROM pts_quad a
              WHERE NOT EXISTS (
                SELECT 1 FROM pts_quad b
                WHERE b.price <= a.price AND b.size >= a.size
                  AND (b.price < a.price OR b.size > a.size)))
            SELECT sky.price, sky.size, count(*) AS n_parts
            FROM sky JOIN part_quad p
              ON p.p_retailprice = sky.price AND p.p_size = sky.size
            GROUP BY sky.price, sky.size
            """
        ).collect()
    }
    assert got == want and len(got) > 1


def test_attribution_matrix_nonvacuous_and_windowed(spark, sf_dir):
    rows = REGISTRY["events_attribution_touch_matrix"].fn(spark, sf_dir).collect()
    assert sum(r.n_conversions for r in rows) > 10
    # multiple distinct last-touch channels credited
    assert len({r.last_ch for r in rows}) >= 2
    assert all(0 <= r.last_ch < 5 for r in rows)
    # first-touch is mirror-encoded: raw in [3,7] for ch in [0,4]
    assert all(3 <= r.first_ch_raw <= 7 for r in rows)
    assert all(r.attributed_cents > 0 for r in rows)


def test_geo_radius_join_is_cell_equi_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "geo_radius_cell_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    rows = REGISTRY["geo_radius_cell_join"].fn(spark, sf_dir).collect()
    assert sum(r.n_within for r in rows) > 0
    assert all(r.min_d2 <= 150 * 150 for r in rows)


def test_weighted_sample_dense_rank_and_weights(spark, sf_dir):
    rows = REGISTRY["corpus_weighted_bottomk_sample"].fn(spark, sf_dir).collect()
    assert sorted(r.rk for r in rows) == list(range(1, len(rows) + 1))
    assert 0 < len(rows) <= 32
    assert all(1 <= r.w <= 4 for r in rows)
    # keys arrive sorted ascending with rank
    by_rk = sorted(rows, key=lambda r: r.rk)
    keys = [r.doc_key for r in by_rk]
    assert keys == sorted(keys)


def test_equidepth_histogram_no_global_sort(spark, sf_dir):
    """The equi-depth histogram must bucket via a broadcast 1-row boundary
    join, never a global NTILE sort: no Sort node above the events scan,
    and the only nested-loop is the bounded 1-row boundary broadcast."""
    plan = plan_of(spark, sf_dir, "events_equidepth_histogram")
    assert "CartesianProduct" not in plan
    # percentile agg + hash agg only — a global sort would appear as Sort
    assert "Sort [cents" not in plan and "Sort [bucket" not in plan
    rows = REGISTRY["events_equidepth_histogram"].fn(spark, sf_dir).collect()
    assert len(rows) == 4
    total = sum(r.cnt for r in rows)
    # equi-depth: every bucket within 2x of the ideal quarter (ties skew)
    assert all(total / 8 <= r.cnt <= total / 2 for r in rows)


def test_parquet_zstd_actually_compresses(spark, sf_dir, tmp_path):
    """parquet_zstd_roundtrip's codec claim: the zstd files must be
    materially smaller than an uncompressed write of the identical rows."""
    import os

    from flock_spark.catalog import tbl

    o = tbl(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )

    def size_of(path):
        return sum(
            os.path.getsize(os.path.join(path, f))
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )

    zdir, udir = str(tmp_path / "z"), str(tmp_path / "u")
    o.coalesce(1).write.option("compression", "zstd").parquet(zdir)
    o.coalesce(1).write.option("compression", "uncompressed").parquet(udir)
    assert size_of(zdir) < 0.8 * size_of(udir)
