"""Geospatial radius join via grid-cell bucketing.

The reference has no spatial operators; a complete analytics engine needs at
least the radius/near join, and its scalable shape is the same
band-to-equi-join lowering this repo uses for LSH and range joins: never the
all-pairs distance filter.

Points get integer coordinates on a GRID x GRID plane (derived here from the
portable md5 rule so the oracle regenerates them; in production they'd be a
scaled-fixed-point projection of lon/lat). With cell size == radius R, any
pair within R lies in the same or an adjacent cell, so:

  1. index each point by its cell (x div R, y div R) — a projection;
  2. explode ONE side to its 3x3 neighbor cells (constant 9x blowup of the
     smaller side only);
  3. hash equi-join on the cell key — shuffle or broadcast, never a
     cartesian;
  4. exact integer distance filter on the survivors.

Candidate count is bounded by points-per-cell density, not n^2 — the same
guarantee as LSH banding. All arithmetic is int64 (coordinates < 2^14, so
squared distances < 2^29): bit-identical cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flock_spark.catalog import tbl
from flock_spark.operators.hashing import duck_md5_long, spark_md5_long
from flock_spark.registry import register

GRID = 10_000  # coordinate universe per axis
RADIUS = 150  # join radius == cell size
R2 = RADIUS * RADIUS


def _spark_coords(key: str) -> tuple[str, str]:
    hx = spark_md5_long(f"concat('gx', CAST({key} AS STRING))")
    hy = spark_md5_long(f"concat('gy', CAST({key} AS STRING))")
    return f"({hx} % {GRID})", f"({hy} % {GRID})"


def _duck_coords(key: str) -> tuple[str, str]:
    hx = duck_md5_long(f"('gx' || CAST({key} AS VARCHAR))")
    hy = duck_md5_long(f"('gy' || CAST({key} AS VARCHAR))")
    return f"({hx} % {GRID})", f"({hy} % {GRID})"


_SX, _SY = _spark_coords("s_suppkey")
_SCX, _SCY = _spark_coords("c_custkey")
_DX, _DY = _duck_coords("s_suppkey")
_DCX, _DCY = _duck_coords("c_custkey")


@register(
    "geo_radius_cell_join",
    oracle=f"""
    WITH sp AS (SELECT s_suppkey, {_DX} AS x, {_DY} AS y FROM supplier),
    cp AS (SELECT c_custkey, {_DCX} AS x, {_DCY} AS y FROM customer)
    SELECT sp.s_suppkey,
           count(*) AS n_within,
           CAST(min((sp.x - cp.x) * (sp.x - cp.x)
                  + (sp.y - cp.y) * (sp.y - cp.y)) AS BIGINT) AS min_d2
    FROM sp JOIN cp
      ON (sp.x - cp.x) * (sp.x - cp.x)
       + (sp.y - cp.y) * (sp.y - cp.y) <= {R2}
    GROUP BY sp.s_suppkey
    """,
    tags=("geo", "join", "scale-pattern"),
    doc="Radius join suppliers x customers on an integer grid: count the "
    "customers within R of each supplier. Spark lowers it to the grid-cell "
    "equi-join (supplier side exploded to its 3x3 neighbor cells, hash "
    "join on the cell key, exact integer distance filter after) — "
    "candidates are bounded by cell density, never |S| x |C|; the plan is "
    "pinned to contain no cartesian/nested-loop join. The DuckDB oracle "
    "is the INDEPENDENT quadratic formulation (plain distance-theta "
    "join), so a green hash proves the cell lowering loses no pair — the "
    "cell-completeness guarantee (cell size == R covers the disk) checked "
    "by value.",
)
def geo_radius_cell_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = tbl(spark, sf_dir, "supplier").selectExpr(
        "s_suppkey", f"{_SX} AS x", f"{_SY} AS y"
    )
    cust = tbl(spark, sf_dir, "customer").selectExpr(
        "c_custkey", f"{_SCX} AS x", f"{_SCY} AS y"
    )
    # cell index at cell size == RADIUS
    cust_c = cust.select(
        F.col("c_custkey"),
        F.col("x").alias("cx"),
        F.col("y").alias("cy"),
        (F.col("x") / RADIUS).cast("long").alias("cell_x"),
        (F.col("y") / RADIUS).cast("long").alias("cell_y"),
    )
    # supplier side (the smaller one) explodes to its 3x3 neighborhood
    off = F.explode(
        F.array(*[F.lit(i) for i in (-1, 0, 1)])
    )
    sup_c = (
        sup.select(
            "s_suppkey",
            F.col("x").alias("sx"),
            F.col("y").alias("sy"),
            (F.col("x") / RADIUS).cast("long").alias("base_x"),
            (F.col("y") / RADIUS).cast("long").alias("base_y"),
        )
        .withColumn("dx", off)
        .withColumn("dy", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
        .select(
            "s_suppkey",
            "sx",
            "sy",
            (F.col("base_x") + F.col("dx")).alias("cell_x"),
            (F.col("base_y") + F.col("dy")).alias("cell_y"),
        )
    )
    pairs = sup_c.join(cust_c, ["cell_x", "cell_y"]).where(
        (F.col("sx") - F.col("cx")) * (F.col("sx") - F.col("cx"))
        + (F.col("sy") - F.col("cy")) * (F.col("sy") - F.col("cy"))
        <= R2
    )
    return pairs.groupBy("s_suppkey").agg(
        F.count("*").alias("n_within"),
        F.min(
            (F.col("sx") - F.col("cx")) * (F.col("sx") - F.col("cx"))
            + (F.col("sy") - F.col("cy")) * (F.col("sy") - F.col("cy"))
        )
        .cast("long")
        .alias("min_d2"),
    )


CELL = 500  # heatmap cell size: a 20x20 grid over the coordinate plane


def _heatmap_sql(cx: str, cy: str) -> str:
    """Shared heatmap text over engine-templated customer coordinates."""
    return f"""
    WITH pts AS (
      SELECT CAST(floor({cx} / {CELL}) AS BIGINT) AS cell_x,
             CAST(floor({cy} / {CELL}) AS BIGINT) AS cell_y
      FROM customer),
    counts AS (
      SELECT cell_x, cell_y, count(*) AS own FROM pts
      GROUP BY cell_x, cell_y),
    offsets AS (
      SELECT dx, dy
      FROM (SELECT -1 AS dx UNION ALL SELECT 0 UNION ALL SELECT 1) a
      CROSS JOIN (SELECT -1 AS dy UNION ALL SELECT 0 UNION ALL SELECT 1) b),
    spread AS (
      SELECT cell_x + dx AS cell_x, cell_y + dy AS cell_y, own
      FROM counts CROSS JOIN offsets),
    smoothed AS (
      SELECT cell_x, cell_y, CAST(sum(own) AS BIGINT) AS neighborhood
      FROM spread GROUP BY cell_x, cell_y)
    SELECT s.cell_x, s.cell_y, s.neighborhood,
           CAST(coalesce(c.own, 0) AS BIGINT) AS own
    FROM smoothed s LEFT JOIN counts c
      ON s.cell_x = c.cell_x AND s.cell_y = c.cell_y
    WHERE s.cell_x >= 0 AND s.cell_x < {GRID // CELL}
      AND s.cell_y >= 0 AND s.cell_y < {GRID // CELL}
    """


@register(
    "geo_grid_density_heatmap",
    oracle=_heatmap_sql(_DCX, _DCY),
    tags=("geo", "aggregate"),
    doc="Spatial density heatmap with 3x3 neighborhood smoothing: points "
    "reduce to per-cell counts FIRST (the only full-data aggregate), then "
    "the 400-cell count relation explodes by the 9 offsets and re-sums — "
    "convolution as a constant-factor blowup of the AGGREGATE, never of "
    "the points (at 100 TB the smoothing pass touches cells-many rows "
    "regardless of point count; the 9-way CROSS JOIN is against a 9-row "
    "literal). Off-plane edge cells are clipped; integer coordinates make "
    "every count exact cross-engine.",
)
def geo_grid_density_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_heatmap_sql(_SCX, _SCY))
