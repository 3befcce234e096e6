"""Recommendation-prep operators: co-occurrence similarity over baskets.

Beyond the reference's surface (SURVEY §2 extensions): the
item-item similarity precompute that powers "frequently bought together"
— the same bounded-pair-explosion discipline the dedup candidate
generators use, applied to market baskets instead of shingle buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flock_spark.catalog import tbl
from flock_spark.registry import register

COOC_MIN_CO = 2  # keep item pairs co-ordered at least twice
COOC_TOP = 200  # certified sample: top pairs by (co, jaccard key)


@register(
    "items_cooccurrence_jaccard",
    oracle=f"""
    WITH basket AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS item FROM lineitem),
    df AS (
      SELECT item, CAST(count(*) AS BIGINT) AS df FROM basket GROUP BY item),
    pairs AS (
      SELECT a.item AS item_a, b.item AS item_b,
             CAST(count(*) AS BIGINT) AS co
      FROM basket a JOIN basket b
        ON a.ok = b.ok AND a.item < b.item
      GROUP BY a.item, b.item
      HAVING count(*) >= {COOC_MIN_CO})
    SELECT p.item_a, p.item_b, p.co,
           da.df AS df_a, db.df AS df_b,
           (p.co * 10000) // (da.df + db.df - p.co) AS jaccard_bp
    FROM pairs p
    JOIN df da ON da.item = p.item_a
    JOIN df db ON db.item = p.item_b
    ORDER BY p.co DESC, jaccard_bp DESC, p.item_a, p.item_b
    LIMIT {COOC_TOP}
    """,
    tags=("join", "similarity", "recsys", "scale-pattern"),
    doc="Market-basket item-item co-occurrence with Jaccard scoring — the "
    "collaborative-filtering precompute: pairs form INSIDE baskets via a "
    "self-equi-join on the basket key, so the pair count is Σ|basket|², "
    "bounded by the (small, physical) basket size — never |items|² and "
    "never |rows|². Jaccard = co/(df_a+df_b−co) carried as integer basis "
    "points with floor division; df lookups are two joins against the "
    "|items|-sized frequency relation. At 100 TB the discipline that "
    "keeps this alive is the same stop-key cap as dedup_chunk_shared: "
    "a mega-basket (bot order, crawler session) must be clamped or the "
    "hot basket alone contributes |basket|² pairs — production drops "
    "baskets over a size cap before the self-join (documented, not "
    f"needed at this corpus' ≤13-item baskets). Top-{COOC_TOP} ordered "
    "output plans as TakeOrderedAndProject.",
)
def items_cooccurrence_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = tbl(spark, sf_dir, "lineitem")
    # Baskets materialize ONCE as sorted distinct item arrays (collect_set
    # dedups = the DISTINCT; sort_array makes pair order deterministic).
    # The previous self-equi-join form scanned lineitem twice, paid a
    # (ok, item) distinct exchange AND an ok-keyed join exchange, and its
    # per-basket pair explosion crossed the join; here pairs expand
    # map-side from each basket array — same Σ|basket|² pair count, same
    # hot-basket cap discipline at scale, one scan and one ok-keyed
    # exchange (with map-side partial collect_set) to build every basket.
    baskets = li.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.sort_array(F.collect_set("l_partkey")).alias("items")
    )
    # materialize the basket relation once: collect_set is flagged
    # non-deterministic, so the three consumers below (pair explode + the
    # two df lookups) would otherwise each replan the scan + collect_set
    # exchange — measured 3 full basket builds, zero ReusedExchange. The
    # checkpoint is basket-sized (one array row per order), far smaller
    # than the lineitem input it summarizes.
    baskets = baskets.localCheckpoint(eager=True)
    df = (
        baskets.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count("*").cast("long").alias("df"))
    )
    # all (item_a < item_b) pairs inside one basket, expanded by two
    # Generate nodes over the sorted array (posexplode anchors item_a at
    # position i, slice() yields the strictly-later items). Round-13: this
    # replaced a nested transform/struct/flatten expansion — higher-order
    # lambdas evaluate interpreted per element, while slice() is a plain
    # codegen'd function, measured ~2x on the pair stage (0.72-1.3 s ->
    # 0.46-0.60 s warm at sf0.1) with identical pairs. Still no join
    # operator and the same Σ|basket|² pair count.
    pa = baskets.select(F.posexplode("items").alias("i", "item_a"), "items")
    pairs = (
        pa.select(
            "item_a",
            F.explode(
                F.expr("slice(items, i + 2, size(items) - i - 1)")
            ).alias("item_b"),
        )
        .groupBy("item_a", "item_b")
        .agg(F.count("*").cast("long").alias("co"))
        .filter(F.col("co") >= COOC_MIN_CO)
    )
    # df is |items|-sized (vocabulary-bounded): broadcast both lookups so
    # the pair relation never re-shuffles on item_a/item_b
    scored = (
        pairs.join(
            F.broadcast(
                df.withColumnRenamed("item", "item_a").withColumnRenamed("df", "df_a")
            ),
            "item_a",
        )
        .join(
            F.broadcast(
                df.withColumnRenamed("item", "item_b").withColumnRenamed("df", "df_b")
            ),
            "item_b",
        )
        .select(
            "item_a",
            "item_b",
            "co",
            "df_a",
            "df_b",
            F.expr("(co * 10000L) div (df_a + df_b - co)").alias("jaccard_bp"),
        )
    )
    return scored.orderBy(
        F.desc("co"), F.desc("jaccard_bp"), "item_a", "item_b"
    ).limit(COOC_TOP)
