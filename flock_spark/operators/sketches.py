"""Distributed sketches built from first principles on the portable hash
family — HyperLogLog (distinct cardinality), Bloom filter (membership), and
Count-Min (frequency). Reference context: Flock keeps no sketch machinery
(its aggregates are exact per-window, flock/src/stream/window.rs); a 100 TB
training-data pipeline needs sub-linear summaries — cardinality per shard,
membership probes that avoid shuffling the corpus, heavy-hitter screens —
so these are first-class operators here.

Every sketch is engine-neutral and carries an EXACT DuckDB oracle: all
randomness comes from the md5-based hash family (operators/hashing.py), all
sketch state is integer (bucket maxima, bit words, cell counts), and any
final float is produced by a single deterministic division — so the same
SQL math yields bit-identical results on both engines, and the driver's
value-hash gate applies to the sketches themselves, not just their inputs.

Scale posture: sketch state is tiny and mergeable by construction — HLL
bucket maxima merge with max, Bloom words with bit_or, CMS cells with sum —
which is exactly what Spark's partial aggregation does map-side. The events
table never moves: each sketch is one scan plus a shuffle of O(sketch size)
partial rows per partition.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from flock_spark.catalog import spread, tbl
from flock_spark.operators.hashing import (
    duck_md5_long,
    spark_md5_long,
    universal_hash,
)
from flock_spark.registry import register

HLL_ALPHA_NUM = repr(0.709 * 4096 * 36028797018963968.0)  # alpha_64 * m^2 * 2^55

BLOOM_BITS = 1024  # 32 words x 32 bits
BLOOM_K = 4  # hash functions (family members 0..3)
CMS_WIDTH = 256
CMS_DEPTH = 4  # family members 4..7
N_PROBES = 200  # membership/point-query probe ids 0..199 (user_id spans 0..149)


@dataclass(frozen=True)
class _Dialect:
    md5l: object  # str expr -> 60-bit BIGINT hash SQL
    str_t: str  # cast-to-string type name
    range_src: str  # table source yielding column `id` in [0, N_PROBES)

    def shl(self, amount_expr: str) -> str:
        raise NotImplementedError

    def shr(self, expr: str, bits: int) -> str:
        raise NotImplementedError


class _SparkD(_Dialect):
    def shl(self, amount_expr: str) -> str:
        return f"shiftleft(CAST(1 AS BIGINT), CAST({amount_expr} AS INT))"

    def shr(self, expr: str, bits: int) -> str:
        return f"shiftright({expr}, {bits})"

    def shrv(self, expr: str, amount_expr: str) -> str:
        return f"shiftright({expr}, CAST({amount_expr} AS INT))"

    def idiv(self, a: str, b: str) -> str:
        return f"(({a}) div ({b}))"

    def add_days(self, ts_expr: str, n_expr: str) -> str:
        return f"timestampadd(DAY, CAST({n_expr} AS INT), {ts_expr})"


class _DuckD(_Dialect):
    def shl(self, amount_expr: str) -> str:
        return f"(CAST(1 AS BIGINT) << ({amount_expr}))"

    def shr(self, expr: str, bits: int) -> str:
        return f"(({expr}) >> {bits})"

    def shrv(self, expr: str, amount_expr: str) -> str:
        return f"(({expr}) >> ({amount_expr}))"

    def idiv(self, a: str, b: str) -> str:
        return f"(({a}) // ({b}))"

    def add_days(self, ts_expr: str, n_expr: str) -> str:
        return f"(({ts_expr}) + to_days(CAST({n_expr} AS INT)))"


SPARK_D = _SparkD(md5l=spark_md5_long, str_t="STRING", range_src="range(200)")
DUCK_D = _DuckD(md5l=duck_md5_long, str_t="VARCHAR", range_src="range(200) t(id)")


def _hashed(d: _Dialect) -> str:
    return f"SELECT {d.md5l(f'CAST(user_id AS {d.str_t})')} AS h FROM events"


# ---------------------------------------------------------------- HLL ------


def _hll_linear_case() -> str:
    """Small-range (linear counting) table: m*ln(m/V) for V=1..63 as literal
    doubles. ln() is not correctly-rounded-guaranteed across libm
    implementations, so the canonical formula is precomputed here and both
    dialects embed the SAME decimal literals — each engine parses the literal
    to the identical double, keeping the estimate bit-deterministic."""
    import math

    whens = " ".join(
        f"WHEN {v} THEN {math.log(64.0 / v) * 64.0!r}" for v in range(1, 64)
    )
    return f"CASE CAST(64 - n_hot AS BIGINT) {whens} END"


def _hll_sql(d: _Dialect) -> str:
    """m=64-bucket HLL per event_type; see hll_sketch_portable docstring."""
    h = d.md5l(f"CAST(user_id AS {d.str_t})")
    w = d.shr("h", 6)
    return f"""
    WITH hashed AS (
      SELECT event_type, {h} AS h FROM events
    ), rho AS (
      SELECT event_type, (h % 64) AS bucket,
             CASE WHEN {w} = 0 THEN 55
                  ELSE 55 - length(bin({w})) END AS r
      FROM hashed
    ), buckets AS (
      SELECT event_type, bucket, max(r) AS m_j
      FROM rho GROUP BY event_type, bucket
    ), sketch AS (
      SELECT event_type,
             count(*) AS n_hot,
             sum({d.shl('55 - m_j')}) AS hot_sum
      FROM buckets GROUP BY event_type
    ), raw AS (
      SELECT event_type, n_hot,
             CAST(64 - n_hot AS BIGINT) AS v_empty,
             CAST(hot_sum + (64 - n_hot) * 36028797018963968 AS BIGINT)
               AS harmonic_sum_scaled,
             ({HLL_ALPHA_NUM}
               / CAST(hot_sum + (64 - n_hot) * 36028797018963968 AS DOUBLE))
               AS raw_estimate
      FROM sketch
    )
    SELECT event_type, v_empty, harmonic_sum_scaled, raw_estimate,
           CASE WHEN raw_estimate <= 160.0 AND v_empty > 0
                THEN {_hll_linear_case()}
                ELSE raw_estimate END AS hll_estimate
    FROM raw
    """


@register(
    "hll_sketch_portable",
    oracle=_hll_sql(DUCK_D),
    tags=("aggregate", "approx", "sketch"),
    doc="HyperLogLog built from first principles on the portable md5 hash "
    "family — unlike approx_count_distinct_hll (Spark's builtin sketch, "
    "rows-only check), this sketch is engine-neutral and carries an EXACT "
    "oracle: bucket maxima shuffle as <=64 small ints per group (mergeable "
    "partial state — the property that lets HLL distribute), the leading-1 "
    "rank uses length(bin(w)) (integer-exact, no float log2), and the "
    "harmonic sum is an exact scaled BIGINT so the raw estimate is one "
    "bit-deterministic division. Includes the canonical small-range "
    "correction: when raw E <= 2.5m and empty buckets remain, linear "
    "counting m*ln(m/V) applies — via a compile-time literal table shared "
    "by both engines (libm ln() is not cross-engine bit-stable). At 150 "
    "true distinct with m=64 the estimate sits squarely in that regime; "
    "accuracy is the standard ~1.04/sqrt(m) (~13%) beyond it.",
)
def hll_sketch_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_hll_sql(SPARK_D))


# -------------------------------------------------------------- Bloom ------


def _bloom_words_sql(d: _Dialect) -> str:
    """Global Bloom filter over distinct user_id: 1024 bits as 32x32-bit
    words (bit values stay < 2^32, far from BIGINT sign trouble on either
    engine). K=4 positions per key via the universal hash family.

    The Spark dialect computes all K positions in ONE pass — explode of a
    K-element array, then a global DISTINCT — where the oracle keeps the
    K-branch UNION: the UNION form planned K separate scans of events, each
    re-computing the md5 base hash (K single-split scan pipelines at test
    scale, K full passes at any scale). Same dedup semantics: UNION across
    branches == DISTINCT over the exploded positions."""
    pos_exprs = ", ".join(
        f"({universal_hash('h', i)} % {BLOOM_BITS})" for i in range(BLOOM_K)
    )
    pos_union = "\n      UNION\n".join(
        f"      SELECT ({universal_hash('h', i)} % {BLOOM_BITS}) AS p FROM hashed"
        for i in range(BLOOM_K)
    )
    pos = (
        f"      SELECT DISTINCT explode(array({pos_exprs})) AS p FROM hashed"
        if isinstance(d, _SparkD)
        else pos_union
    )
    return f"""
    WITH hashed AS (
      {_hashed(d)}
    ), pos AS (
{pos}
    )
    SELECT CAST({d.shr('p', 5)} AS BIGINT) AS word_idx,
           bit_or({d.shl('p % 32')}) AS bits,
           CAST(count(*) AS BIGINT) AS bits_set
    FROM pos
    GROUP BY 1
    """


@register(
    "bloom_filter_portable",
    oracle=_bloom_words_sql(DUCK_D),
    tags=("approx", "sketch", "membership"),
    doc=f"Portable Bloom filter build: {BLOOM_BITS} bits over distinct "
    "user_id, emitted as 32-bit words (word_idx, bits, bits_set). All "
    f"{BLOOM_K} probe positions come from the md5 universal-hash family, so "
    "the filter is identical on both engines — the sketch itself is "
    "hash-verified, not just sampled. Mergeable by bit_or, which is what "
    "partial aggregation already does map-side: at 100 TB each executor "
    "ORs its local words and the exchange carries 32 rows per partition. "
    "Production use: broadcast these words to probe membership without "
    "shuffling the corpus (see bloom_membership_probe).",
)
def bloom_filter_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_bloom_words_sql(SPARK_D))


def _bloom_probe_sql(d: _Dialect) -> str:
    ppos_union = "\n      UNION ALL\n".join(
        f"      SELECT probe_id, ({universal_hash('h', i)} % {BLOOM_BITS}) AS p"
        " FROM probes"
        for i in range(BLOOM_K)
    )
    bit_test = d.shrv("b.bits", "p % 32")
    return f"""
    WITH bloom AS (
      {_bloom_words_sql(d)}
    ), probes AS (
      SELECT id AS probe_id, {d.md5l(f'CAST(id AS {d.str_t})')} AS h
      FROM {d.range_src}
    ), ppos AS (
{ppos_union}
    ), checks AS (
      SELECT probe_id,
             CASE WHEN b.bits IS NULL THEN 0
                  WHEN ({bit_test}) % 2 = 1 THEN 1 ELSE 0 END AS hit
      FROM ppos LEFT JOIN bloom b ON CAST({d.shr('p', 5)} AS BIGINT) = b.word_idx
    ), verdicts AS (
      SELECT probe_id, CAST(min(hit) AS BIGINT) AS bloom_member
      FROM checks GROUP BY probe_id
    )
    SELECT v.probe_id, v.bloom_member,
           CASE WHEN e.user_id IS NULL THEN CAST(0 AS BIGINT)
                ELSE CAST(1 AS BIGINT) END AS true_member
    FROM verdicts v
    LEFT JOIN (SELECT DISTINCT user_id FROM events) e
      ON v.probe_id = e.user_id
    """


@register(
    "bloom_membership_probe",
    oracle=_bloom_probe_sql(DUCK_D),
    tags=("approx", "sketch", "membership", "join"),
    doc=f"Bloom membership probe: {N_PROBES} candidate ids tested against "
    "the built filter, emitting (bloom_member, true_member) per probe — "
    "no false negatives by construction, false positives bounded by the "
    "sketch size. This is the scale pattern for decontamination/among-set "
    "checks: the filter words broadcast (KBs), the corpus streams past "
    "them, and only bloom-positive rows pay the exact verification join. "
    "The oracle replays the identical sketch, so even the false-positive "
    "set matches exactly.",
)
def bloom_membership_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_bloom_probe_sql(SPARK_D))


# ---------------------------------------------------------- Count-Min ------


def _cms_cells_sql(d: _Dialect) -> str:
    # Spark dialect: one pass — explode (depth, col) structs and aggregate
    # once; the oracle keeps the per-depth UNION ALL of grouped branches,
    # which planned CMS_DEPTH separate scans of events (same cells either
    # way: the branches partition the exploded rows by depth).
    branches = "\n      UNION ALL\n".join(
        f"      SELECT {i} AS depth,"
        f" ({universal_hash('h', CMS_DEPTH + i)} % {CMS_WIDTH}) AS col,"
        " count(*) AS cnt FROM hashed GROUP BY 1, 2"
        for i in range(CMS_DEPTH)
    )
    if isinstance(d, _SparkD):
        structs = ", ".join(
            f"named_struct('depth', {i}, 'col',"
            f" ({universal_hash('h', CMS_DEPTH + i)} % {CMS_WIDTH}))"
            for i in range(CMS_DEPTH)
        )
        branches = (
            "      SELECT s.depth AS depth, s.col AS col, count(*) AS cnt\n"
            f"      FROM (SELECT explode(array({structs})) AS s FROM hashed)\n"
            "      GROUP BY 1, 2"
        )
    return f"""
    WITH hashed AS (
      {_hashed(d)}
    ), cells AS (
{branches}
    )
    SELECT CAST(depth AS BIGINT) AS depth, CAST(col AS BIGINT) AS col, cnt
    FROM cells
    """


@register(
    "countmin_sketch_portable",
    oracle=_cms_cells_sql(DUCK_D),
    tags=("approx", "sketch", "frequency"),
    doc=f"Count-Min sketch build: {CMS_DEPTH}x{CMS_WIDTH} cells of exact "
    "counts over user_id occurrences, one row per non-empty cell. Counts "
    "are plain sums, so the sketch merges by + exactly as partial "
    "aggregation merges map-side partials — the exchange carries at most "
    f"{CMS_DEPTH * CMS_WIDTH} rows per partition regardless of corpus "
    "size. The hash family makes the cell layout engine-neutral; the "
    "oracle verifies every cell value.",
)
def countmin_sketch_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_cms_cells_sql(SPARK_D))


def _cms_point_sql(d: _Dialect) -> str:
    ppos_union = "\n      UNION ALL\n".join(
        f"      SELECT probe_id, {i} AS depth,"
        f" ({universal_hash('h', CMS_DEPTH + i)} % {CMS_WIDTH}) AS col FROM probes"
        for i in range(CMS_DEPTH)
    )
    return f"""
    WITH cells AS (
      {_cms_cells_sql(d)}
    ), probes AS (
      SELECT id AS probe_id, {d.md5l(f'CAST(id AS {d.str_t})')} AS h
      FROM {d.range_src}
    ), ppos AS (
{ppos_union}
    ), est AS (
      SELECT probe_id,
             min(CASE WHEN c.cnt IS NULL THEN CAST(0 AS BIGINT) ELSE c.cnt END)
               AS est_cnt
      FROM ppos
      LEFT JOIN cells c ON ppos.depth = c.depth AND ppos.col = c.col
      GROUP BY probe_id
    )
    SELECT e.probe_id, e.est_cnt,
           CASE WHEN x.c IS NULL THEN CAST(0 AS BIGINT) ELSE x.c END AS exact_cnt
    FROM est e
    LEFT JOIN (SELECT user_id, count(*) AS c FROM events GROUP BY user_id) x
      ON e.probe_id = x.user_id
    """


@register(
    "cms_point_query",
    oracle=_cms_point_sql(DUCK_D),
    tags=("approx", "sketch", "frequency", "join"),
    doc=f"Count-Min point queries: {N_PROBES} probe ids read "
    "min-over-depths from the sketch cells next to their exact counts "
    "(est_cnt >= exact_cnt always; equality when no cell collision). The "
    "heavy-hitter screen at 100 TB: the sketch broadcasts, candidate keys "
    "are filtered by estimate, and only survivors pay the exact count. "
    "Probes absent from the data demonstrate the overestimate honestly "
    "(exact 0, est = collision mass).",
)
def cms_point_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_cms_point_sql(SPARK_D))


# -------------------------------------------- Bloom semi-join reduction ----

BSJ_BITS = 4096  # 128 x 32-bit words
BSJ_WORDS = BSJ_BITS // 32
BSJ_K = 4
BSJ_PRICE = 490000.0  # dim-side selectivity ~2% (~300 keys -> ~30% bits set)


def _bsj_words_sql(d: _Dialect) -> str:
    """Bloom words over the filtered dim keys (high-value orderkeys)."""
    pos_union = "\n      UNION\n".join(
        f"      SELECT ({universal_hash('h', i)} % {BSJ_BITS}) AS p FROM hashed"
        for i in range(BSJ_K)
    )
    return f"""
    WITH dimk AS (
      SELECT DISTINCT o_orderkey AS k FROM orders WHERE o_totalprice > {BSJ_PRICE}
    ), hashed AS (
      SELECT {d.md5l(f'CAST(k AS {d.str_t})')} AS h FROM dimk
    ), pos AS (
{pos_union}
    )
    SELECT CAST({d.shr('p', 5)} AS BIGINT) AS word_idx,
           bit_or({d.shl('p % 32')}) AS bits
    FROM pos
    GROUP BY 1
    """


@register(
    "bloom_semijoin_reduction",
    oracle=f"""
    SELECT o.o_orderstatus,
           count(*) AS n_lines,
           round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(38,6)))
                 AS DOUBLE), 4) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_totalprice > {BSJ_PRICE}
    GROUP BY o.o_orderstatus
    """,
    tags=("approx", "sketch", "join", "membership"),
    doc=f"Semi-join reduction via a broadcast Bloom filter: build "
    f"{BSJ_BITS}-bit words over the filtered dim's join keys (one tiny "
    f"aggregate, O({BSJ_WORDS})-row collect regardless of corpus size), "
    "inline them as an array literal, and pre-filter the FACT side with "
    "four JVM-side bit tests before the shuffle join. False positives are "
    "removed by the real join, so the result provably equals the plain "
    "join (the oracle) — no-false-negatives is the property under test; "
    "tests/test_plans.py pins that the bloom actually prunes the scan. "
    "This is THE 100 TB fact-dim pattern when the dim is too big to "
    "broadcast whole but its key filter fits in KBs: shuffle volume drops "
    "to matched+FP rows. (Spark's runtime bloom-join does this implicitly; "
    "the explicit portable build keeps it engine-checkable.)",
)
def bloom_semijoin_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    tbl(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return _bsj_reduced_join(spark)


def _bsj_pruned_fact(spark: SparkSession) -> DataFrame:
    """The bloom pre-filtered fact side, shared by the operator and the
    pruning plan test so the test can never drift from what the operator
    actually applies: build the words (<=BSJ_WORDS-row collect, O(1)),
    inline them as an array literal, and keep fact rows passing all BSJ_K
    bit tests."""
    from pyspark.sql import functions as F

    words = [0] * BSJ_WORDS
    for r in spark.sql(_bsj_words_sql(SPARK_D)).collect():  # <=128 rows, O(1)
        words[int(r["word_idx"])] = int(r["bits"])
    arr = "array(" + ",".join(f"CAST({w} AS BIGINT)" for w in words) + ")"
    h = spark_md5_long("CAST(l_orderkey AS STRING)")
    fact = spark.table("lineitem").withColumn("_h", F.expr(h))
    cond = None
    for i in range(BSJ_K):
        p = f"({universal_hash('_h', i)} % {BSJ_BITS})"
        test = F.expr(
            f"(shiftright(element_at({arr}, CAST(shiftright({p}, 5) AS INT) + 1),"
            f" CAST({p} % 32 AS INT)) % 2) = 1"
        )
        cond = test if cond is None else (cond & test)
    return fact.filter(cond).drop("_h")


def _bsj_reduced_join(spark: SparkSession) -> DataFrame:
    from pyspark.sql import functions as F

    pruned = _bsj_pruned_fact(spark)
    dim = spark.table("orders").filter(F.col("o_totalprice") > BSJ_PRICE)
    j = pruned.join(dim, pruned.l_orderkey == dim.o_orderkey)
    return j.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_lines"),
        F.round(
            F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).cast("double"), 4
        ).alias("revenue"),
    )


# ---------------------------------------------- HDR quantile histogram -----

HDR_QS = (50, 90, 99)  # percentiles to report


def _hdr_sql(d: _Dialect) -> str:
    """HDR-style log2 histogram quantiles over o_totalprice; see
    hdr_quantile_sketch docstring. All integer arithmetic: exponent via
    length(bin(v)) (exact integer log2), 4-bit mantissa sub-buckets via
    shifts — no libm, bit-identical across engines."""
    qs_union = "\n      UNION ALL\n".join(f"      SELECT {q} AS qv" for q in HDR_QS)
    return f"""
    WITH t AS (
      SELECT CAST(floor(o_totalprice) AS BIGINT) AS v FROM orders
    ), eb AS (
      SELECT v, greatest(length(bin(v)) - 4, 0) AS sh FROM t
    ), bk AS (
      SELECT {d.shrv('v', 'sh')} AS top, sh FROM eb
    ), hist AS (
      SELECT (sh * 16 + top) AS bucket,
             top * {d.shl('sh')} AS lo,
             (top + 1) * {d.shl('sh')} AS hi,
             count(*) AS cnt
      FROM bk GROUP BY 1, 2, 3
    ), ranks AS (
      SELECT bucket, lo, hi, cnt,
             sum(cnt) OVER (ORDER BY bucket
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM hist
    ), tot AS (
      SELECT count(*) AS n FROM t
    ), qs AS (
{qs_union}
    ), sel AS (
      SELECT qs.qv, min(r.bucket) AS bucket
      FROM qs CROSS JOIN tot JOIN ranks r
        ON r.cum >= {d.idiv('qs.qv * tot.n + 99', '100')}
      GROUP BY qs.qv
    )
    SELECT s.qv AS q,
           CAST(r.lo AS BIGINT) AS bucket_lo,
           CAST(r.hi AS BIGINT) AS bucket_hi,
           CAST({d.idiv('r.lo + r.hi', '2')} AS BIGINT) AS est_mid,
           CAST(r.cum AS BIGINT) AS n_le,
           CAST(t.n AS BIGINT) AS n_total
    FROM sel s JOIN ranks r ON s.bucket = r.bucket CROSS JOIN tot t
    """


@register(
    "hdr_quantile_sketch",
    oracle=_hdr_sql(DUCK_D),
    tags=("approx", "sketch", "aggregate", "stats"),
    doc="Distributed quantile estimation via an HDR-style histogram: "
    "integer log2 exponent (length(bin(v)) — no float log) with 4-bit "
    "mantissa sub-buckets gives <=6.7% relative bucket width; counts are "
    "plain integer sums (mergeable map-side like every sketch here), the "
    "percentile picks the first bucket whose running count crosses "
    "ceil(q*n/100), and the estimate is the bucket midpoint — all integer "
    "math, hash-exact on both engines. This is the scale path where exact "
    "percentiles (agg_percentiles) would need a full sort: the histogram "
    "is O(buckets) state per partition, one small shuffle. t-digest/KLL "
    "sketches trade determinism for tighter error — their compactions are "
    "merge-order-dependent, so this deterministic form is the "
    "oracle-verifiable one.",
)
def hdr_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_hdr_sql(SPARK_D))


# ---------------------------------------------------- HLL shard merge ------

HLL_SHARDS = 8


def _hll_merge_sql(d: _Dialect) -> str:
    """Per-shard HLL bucket maxima merged with max == direct global maxima;
    both harmonic sums emitted so mergeability is value-proven."""
    h = d.md5l(f"CAST(user_id AS {d.str_t})")
    w = d.shr("h", 6)
    return f"""
    WITH hashed AS (
      SELECT event_type, {h} AS h FROM events
    ), rho AS (
      SELECT event_type,
             ({d.shr('h', 20)} % {HLL_SHARDS}) AS shard,
             (h % 64) AS bucket,
             CASE WHEN {w} = 0 THEN 55
                  ELSE 55 - length(bin({w})) END AS r
      FROM hashed
    ), shard_buckets AS (
      SELECT event_type, shard, bucket, max(r) AS m
      FROM rho GROUP BY event_type, shard, bucket
    ), merged AS (
      SELECT event_type, bucket, max(m) AS m
      FROM shard_buckets GROUP BY event_type, bucket
    ), direct AS (
      SELECT event_type, bucket, max(r) AS m
      FROM rho GROUP BY event_type, bucket
    ), msum AS (
      SELECT event_type,
             count(*) AS n_hot,
             sum({d.shl('55 - m')}) AS hot
      FROM merged GROUP BY event_type
    ), dsum AS (
      SELECT event_type,
             count(*) AS n_hot,
             sum({d.shl('55 - m')}) AS hot
      FROM direct GROUP BY event_type
    )
    SELECT m.event_type,
           CAST({HLL_SHARDS} AS BIGINT) AS n_shards,
           CAST(m.hot + (64 - m.n_hot) * 36028797018963968 AS BIGINT)
             AS merged_harmonic,
           CAST(x.hot + (64 - x.n_hot) * 36028797018963968 AS BIGINT)
             AS direct_harmonic
    FROM msum m JOIN dsum x ON m.event_type = x.event_type
    """


@register(
    "hll_merge_shards",
    oracle=_hll_merge_sql(DUCK_D),
    tags=("approx", "sketch", "aggregate"),
    doc=f"HLL mergeability proven by value: the events split into "
    f"{HLL_SHARDS} hash shards (a stand-in for {HLL_SHARDS} executors/"
    "partitions), each shard builds its own bucket maxima, the shards "
    "merge with max — and the merged harmonic sum is emitted NEXT TO the "
    "direct single-pass sum, so the driver's hash gate verifies "
    "merged == direct exactly. This is the property that makes HLL "
    "distribute: partial states combine losslessly in any grouping/order, "
    "which is precisely what Spark's map-side partial aggregation exploits "
    "at 100 TB (the exchange carries <=64 small ints per shard, never "
    "rows).",
)
def hll_merge_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_hll_merge_sql(SPARK_D))


# ------------------------------------------------ sliding-window HLL ------

HLL_WINDOW_DAYS = 3  # trailing window width (current day + 2 preceding)


def _hll_sliding_sql(d: _Dialect) -> str:
    """Trailing-N-day distinct-user estimate per day: per-day HLL bucket
    maxima merged across the window with a plain max() window function —
    the mergeability property again, this time across TIME instead of
    shards. The spine densifies (calendar day × 64 buckets) over the FULL
    min→max day range — generated days, not just days present in the
    data — so a missing calendar day contributes an empty sketch instead
    of silently widening the ROWS frame beyond the documented trailing
    {HLL_WINDOW_DAYS} days; absent buckets are NULL ⇒ empty. The 200-id
    range source bounds the spine at 200 calendar days (asserted ample
    for the corpus; a production span parameterizes the generator)."""
    h = d.md5l(f"CAST(user_id AS {d.str_t})")
    w = d.shr("h", 6)
    return f"""
    WITH hashed AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, {h} AS h
      FROM events
    ), rho AS (
      SELECT day, (h % 64) AS bucket,
             CASE WHEN {w} = 0 THEN 55
                  ELSE 55 - length(bin({w})) END AS r
      FROM hashed
    ), day_buckets AS (
      SELECT day, bucket, max(r) AS m
      FROM rho GROUP BY day, bucket
    ), bounds AS (
      SELECT min(day) AS d0, max(day) AS d1 FROM rho
    ), days AS (
      SELECT {d.add_days('b.d0', 'r.id')} AS day
      FROM bounds b CROSS JOIN (SELECT id FROM {d.range_src}) r
      WHERE {d.add_days('b.d0', 'r.id')} <= b.d1
    ), spine AS (
      SELECT dd.day, b.id AS bucket
      FROM days dd
      CROSS JOIN (SELECT id FROM {d.range_src} WHERE id < 64) b
    ), dense AS (
      SELECT s.day, s.bucket, db.m
      FROM spine s LEFT JOIN day_buckets db
        ON s.day = db.day AND s.bucket = db.bucket
    ), win AS (
      SELECT day, bucket,
             max(m) OVER (PARTITION BY bucket ORDER BY day
                          ROWS BETWEEN {HLL_WINDOW_DAYS - 1} PRECEDING
                          AND CURRENT ROW) AS m
      FROM dense
    ), sketch AS (
      SELECT day,
             count(m) AS n_hot,
             CAST(sum(CASE WHEN m IS NULL THEN 0
                           ELSE {d.shl('55 - m')} END) AS BIGINT) AS hot_sum
      FROM win GROUP BY day
    ), raw AS (
      SELECT day, n_hot,
             CAST(64 - n_hot AS BIGINT) AS v_empty,
             CAST(hot_sum + (64 - n_hot) * 36028797018963968 AS BIGINT)
               AS harmonic_sum_scaled,
             ({HLL_ALPHA_NUM}
               / CAST(hot_sum + (64 - n_hot) * 36028797018963968 AS DOUBLE))
               AS raw_estimate
      FROM sketch
    )
    SELECT day, v_empty, harmonic_sum_scaled, raw_estimate,
           CASE WHEN raw_estimate <= 160.0 AND v_empty > 0
                THEN {_hll_linear_case()}
                ELSE raw_estimate END AS hll_estimate
    FROM raw
    """


@register(
    "hll_sliding_window_distinct",
    oracle=_hll_sliding_sql(DUCK_D),
    tags=("approx", "sketch", "window_time", "scale-pattern"),
    doc=f"Trailing-{HLL_WINDOW_DAYS}-day distinct users per day from "
    "per-day HLL states merged with a max() window over the bucket time "
    "series — HLL mergeability across TIME: a sliding COUNT(DISTINCT) "
    "window is not incrementally computable (distinct state per frame), "
    "but per-day sketch states are days×64 small ints and the window max "
    "re-derives every trailing estimate without ever re-touching rows. "
    "This is the dashboard pattern (rolling 7/30-day uniques) at 100 TB: "
    "the corpus is scanned once into daily states; every window width is "
    "then a states-sized computation. Same portable md5 hash family, "
    "integer harmonic sums, and literal-table linear counting as "
    "hll_sketch_portable — bit-deterministic cross-engine.",
)
def hll_sliding_window_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_hll_sliding_sql(SPARK_D))


# ------------------------------------------ sketch mergeability proofs ----

MERGE_SHARDS = 8


def _hdr_merge_sql(d: _Dialect) -> str:
    """Per-shard HDR histograms merged by summing bucket counts == the
    direct single-pass histogram — emitted side by side per bucket."""
    return f"""
    WITH t AS (
      SELECT CAST(floor(o_totalprice) AS BIGINT) AS v,
             (o_orderkey % {MERGE_SHARDS}) AS shard
      FROM orders
    ), eb AS (
      SELECT v, shard, greatest(length(bin(v)) - 4, 0) AS sh FROM t
    ), bk AS (
      SELECT shard, (sh * 16 + {d.shrv('v', 'sh')}) AS bucket FROM eb
    ), shard_hist AS (
      SELECT shard, bucket, count(*) AS cnt FROM bk GROUP BY shard, bucket
    ), merged AS (
      SELECT bucket, CAST(sum(cnt) AS BIGINT) AS merged_cnt
      FROM shard_hist GROUP BY bucket
    ), direct AS (
      SELECT bucket, count(*) AS direct_cnt FROM bk GROUP BY bucket
    )
    SELECT m.bucket, m.merged_cnt, CAST(x.direct_cnt AS BIGINT) AS direct_cnt,
           CAST({MERGE_SHARDS} AS BIGINT) AS n_shards
    FROM merged m JOIN direct x ON m.bucket = x.bucket
    """


@register(
    "hdr_quantile_merge_shards",
    oracle=_hdr_merge_sql(DUCK_D),
    tags=("approx", "sketch", "aggregate"),
    doc=f"HDR-histogram mergeability proven by value (the hll_merge_shards "
    f"discipline applied to the quantile sketch): orders split into "
    f"{MERGE_SHARDS} hash shards, each builds its own log2-bucket "
    "histogram, shards merge by summing counts — and the merged counts "
    "are emitted NEXT TO the direct single-pass histogram so the hash "
    "gate verifies merged == direct per bucket. Lossless merge under any "
    "sharding/order is exactly why the histogram distributes at 100 TB "
    "where t-digest/KLL compactions are merge-order-dependent: Spark's "
    "map-side partial aggregation IS this merge.",
)
def hdr_quantile_merge_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_hdr_merge_sql(SPARK_D))


def _cms_merge_sql(d: _Dialect) -> str:
    """Per-shard Count-Min cells merged by summing == direct cells."""
    h = d.md5l(f"CAST(user_id AS {d.str_t})")
    branches = "\n      UNION ALL\n".join(
        f"      SELECT shard, {i} AS depth,"
        f" ({universal_hash('h', CMS_DEPTH + i)} % {CMS_WIDTH}) AS col,"
        " count(*) AS cnt FROM hashed GROUP BY 1, 2, 3"
        for i in range(CMS_DEPTH)
    )
    return f"""
    WITH hashed AS (
      SELECT ({d.shr('h0', 16)} % {MERGE_SHARDS}) AS shard, h0 AS h
      FROM (SELECT {h} AS h0 FROM events) t
    ), shard_cells AS (
{branches}
    ), merged AS (
      SELECT depth, col, CAST(sum(cnt) AS BIGINT) AS merged_cnt
      FROM shard_cells GROUP BY depth, col
    ), direct AS (
      SELECT depth, col, cnt FROM (
        {_cms_cells_sql(d)}
      ) dc
    )
    SELECT CAST(m.depth AS BIGINT) AS depth, CAST(m.col AS BIGINT) AS col,
           m.merged_cnt, CAST(x.cnt AS BIGINT) AS direct_cnt
    FROM merged m JOIN direct x ON m.depth = x.depth AND m.col = x.col
    """


@register(
    "cms_merge_shards",
    oracle=_cms_merge_sql(DUCK_D),
    tags=("approx", "sketch", "aggregate"),
    doc=f"Count-Min mergeability proven by value: {MERGE_SHARDS} hash "
    "shards each build their own cell counts, shards merge by summing, "
    "and the merged cells are emitted NEXT TO the direct single-pass "
    "cells so merged == direct is hash-verified per cell — closing the "
    "by-value merge-proof set across every sketch family in the repo "
    "(HLL max-merge, HDR count-sum, CMS count-sum; Bloom's bit_or merge "
    "is implied by bloom_filter_portable's word construction). Lossless "
    "merge under any sharding IS map-side partial aggregation at 100 TB.",
)
def cms_merge_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_cms_merge_sql(SPARK_D))


# ------------------------------------------------- HLL set algebra ---------


def _hll_intersect_sql(d: _Dialect) -> str:
    """Two HLL sketches (view-users, purchase-users), union by bucket-max,
    intersection by inclusion–exclusion; exact counts ride alongside."""
    h = d.md5l(f"CAST(user_id AS {d.str_t})")
    w = d.shr("h", 6)
    est = (
        f"CASE WHEN raw_estimate <= 160.0 AND v_empty > 0 "
        f"THEN {_hll_linear_case()} ELSE raw_estimate END"
    )
    return f"""
    WITH labeled AS (
      SELECT CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS grp, user_id
      FROM events WHERE event_type IN ('view', 'purchase')
    ), hashed AS (
      SELECT grp, {h} AS h FROM labeled
    ), rho AS (
      SELECT grp, (h % 64) AS bucket,
             CASE WHEN {w} = 0 THEN 55
                  ELSE 55 - length(bin({w})) END AS r
      FROM hashed
    ), bmax AS (
      SELECT grp, bucket, max(r) AS m FROM rho GROUP BY grp, bucket
    ), all_sets AS (
      SELECT grp, bucket, m FROM bmax
      UNION ALL
      SELECT 2 AS grp, bucket, max(m) AS m FROM bmax GROUP BY bucket
    ), sketch AS (
      SELECT grp, count(*) AS n_hot, sum({d.shl('55 - m')}) AS hot_sum
      FROM all_sets GROUP BY grp
    ), raw AS (
      SELECT grp, n_hot,
             CAST(64 - n_hot AS BIGINT) AS v_empty,
             ({HLL_ALPHA_NUM}
               / CAST(hot_sum + (64 - n_hot) * 36028797018963968 AS DOUBLE))
               AS raw_estimate
      FROM sketch
    ), est AS (
      SELECT grp, {est} AS e FROM raw
    ), pivoted AS (
      SELECT max(CASE WHEN grp = 0 THEN e END) AS est_view,
             max(CASE WHEN grp = 1 THEN e END) AS est_purchase,
             max(CASE WHEN grp = 2 THEN e END) AS est_union
      FROM est
    ), membership AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS in_a,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS in_b
      FROM events WHERE event_type IN ('view', 'purchase')
      GROUP BY user_id
    ), exact AS (
      SELECT CAST(sum(in_a) AS BIGINT) AS exact_view,
             CAST(sum(in_b) AS BIGINT) AS exact_purchase,
             CAST(sum(in_a * in_b) AS BIGINT) AS exact_intersect
      FROM membership
    )
    SELECT exact_view, exact_purchase, exact_intersect,
           est_view, est_purchase, est_union,
           est_view + est_purchase - est_union AS est_intersect
    FROM exact CROSS JOIN pivoted
    """


@register(
    "hll_intersect_estimate",
    oracle=_hll_intersect_sql(DUCK_D),
    tags=("approx", "sketch", "aggregate"),
    doc="HLL set algebra: sketches of the view-user and purchase-user sets "
    "union by BUCKET-MAX (the only lossless HLL combinator) and the "
    "intersection comes out by inclusion–exclusion |A∩B| ≈ E(A)+E(B)−E(A∪B) "
    "— the standard audience-overlap estimator (theta sketches exist "
    "precisely because this error compounds for small overlaps; emitting "
    "the exact membership counts alongside makes that error measurable "
    "here, and the oracle hash-verifies sketch AND exact columns since "
    "the whole construction is the deterministic portable md5 hash "
    "family). At 100 TB both sketches and their union are 64 small ints: "
    "audience overlap across any pair of segments costs two map-side "
    "sketch builds and ZERO joins of row data — the exact path "
    "(membership bitmap per user) shuffles every distinct user once, "
    "which is the audit, not the product.",
)
def hll_intersect_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_hll_intersect_sql(SPARK_D))


# --------------------------------------------- CMS heavy-hitter screen -----

HH_K = 128  # heavy = frequency >= N/K


def _cms_hh_sql(d: _Dialect) -> str:
    return f"""
    WITH point AS (
      {_cms_point_sql(d)}
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n FROM events
    )
    SELECT p.probe_id, p.est_cnt, p.exact_cnt,
           (p.est_cnt * {HH_K} >= t.n) AS is_candidate,
           (p.exact_cnt * {HH_K} >= t.n) AS is_heavy,
           (p.exact_cnt * {HH_K} < t.n OR p.est_cnt * {HH_K} >= t.n)
             AS no_false_negative
    FROM point p CROSS JOIN tot t
    WHERE p.est_cnt * {HH_K} >= t.n
    """


@register(
    "cms_heavy_hitters_screen",
    oracle=_cms_hh_sql(DUCK_D),
    tags=("approx", "sketch", "frequency", "scale-pattern"),
    doc=f"Heavy-hitter detection through the Count-Min screen — the "
    f"canonical CMS deployment: candidates are keys whose SKETCH estimate "
    f"clears N/{HH_K} (integer cross-multiplied), then only candidates "
    "pay an exact count for the verify column. The output carries the "
    "no-false-negative proof BY VALUE: est ≥ exact always (min over "
    "depth-wise overestimates), so every true heavy hitter is "
    "necessarily a candidate — the WHERE keeps exactly the candidate "
    "set and the no_false_negative column is provably TRUE on every "
    "row, while is_heavy exposes the false positives the exact pass "
    "exists to reject. At 100 TB this is the two-tier design: the "
    "KiB-size sketch builds map-side and broadcasts; the expensive "
    "exact aggregation runs over the candidate keys only — frequency "
    "screening without ever shuffling the full key universe.",
)
def cms_heavy_hitters_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_cms_hh_sql(SPARK_D))


# ------------------------------------------------ KMV (bottom-k) sketch ---

KMV_K = 256
KMV_SHARDS = 4
_KMV_M = 1_152_921_504_606_846_976  # 2^60: the hash universe size
# 3/sqrt(K-2) relative-error bound for the (K-1)/kth KMV estimator,
# precomputed as a literal so neither engine calls sqrt at query time.
_KMV_3SD = repr(3.0 / (254.0 ** 0.5))


def _kmv_sql(d: _Dialect) -> str:
    """Bottom-k mergeability by value (the hll_merge_shards pattern for the
    OTHER classical distinct sketch): per-shard bottom-k sets merged via a
    second bottom-k == the direct global bottom-k, proven as an exact set
    equality (symmetric difference cardinality emitted), plus the
    (K-1)·M/kth estimate bound-checked against the exact distinct count."""
    h = d.md5l(f"('kmv' || CAST(event_id AS {d.str_t}))")
    est = f"round(({KMV_K} - 1) * ({_KMV_M}.0 / stats.kth))"
    return f"""
    WITH hashed AS (SELECT DISTINCT {h} AS h FROM events),
    shards AS (SELECT h, (h % {KMV_SHARDS}) AS shard FROM hashed),
    shard_topk AS (
      SELECT h FROM (
        SELECT h, row_number() OVER (PARTITION BY shard ORDER BY h) AS rn
        FROM shards) t
      WHERE rn <= {KMV_K}),
    merged AS (
      SELECT h FROM (
        SELECT h, row_number() OVER (ORDER BY h) AS rn FROM shard_topk) t
      WHERE rn <= {KMV_K}),
    direct AS (
      SELECT h FROM (
        SELECT h, row_number() OVER (ORDER BY h) AS rn FROM hashed) t
      WHERE rn <= {KMV_K}),
    sym AS (
      SELECT count(*) AS c FROM (
        (SELECT h FROM merged EXCEPT SELECT h FROM direct)
        UNION ALL
        (SELECT h FROM direct EXCEPT SELECT h FROM merged)) u),
    stats AS (SELECT max(h) AS kth, count(*) AS kk FROM merged),
    exact AS (SELECT count(*) AS nd FROM hashed)
    SELECT CAST({KMV_K} AS BIGINT)               AS k,
           exact.nd                              AS exact_distinct,
           stats.kth                             AS kth_min_hash,
           (sym.c = 0 AND stats.kk = {KMV_K})    AS merged_equals_direct,
           CAST({est} AS BIGINT)                 AS est_distinct,
           (abs({est} - exact.nd) <= {_KMV_3SD} * exact.nd)
                                                 AS est_within_3sd
    FROM stats, exact, sym
    """


@register(
    "kmv_bottomk_distinct_merge",
    oracle=_kmv_sql(DUCK_D),
    tags=("approx", "sketch", "aggregate"),
    doc=f"KMV (bottom-k) distinct sketch, mergeability proven by value: "
    f"{KMV_SHARDS} hash shards each keep their {KMV_K} smallest 60-bit "
    "md5 hashes; merging = bottom-k of the union, and the merged set is "
    "certified EXACTLY equal to the direct single-pass bottom-k "
    "(symmetric-difference cardinality 0, emitted through the hash gate) "
    "— the property that lets each executor ship a k-row partial state "
    "instead of its rows. The (K-1)·M/kth estimate is bound-checked "
    "within 3/sqrt(K-2) of the exact distinct count (precomputed "
    "literal bound — no runtime sqrt/libm). Everything before the final "
    "estimate division is exact int64; per-shard bottom-k plans as a "
    "rank-filtered window, never a global sort of the corpus.",
)
def kmv_bottomk_distinct_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_kmv_sql(SPARK_D))


# --------------------------------------- CMS join-cardinality estimate ----

CMS_JOIN_KEYS = 1024  # key universe (4x the CMS width -> real collisions)


def _cms_join_card_sql(d: _Dialect) -> str:
    """CMS inner-product join-size estimate vs the exact key-count join."""

    def cells(src: str) -> str:
        return "\n      UNION ALL\n".join(
            f"      SELECT {i} AS depth,"
            f" ({universal_hash('h', CMS_DEPTH + i)} % {CMS_WIDTH}) AS col,"
            f" count(*) AS cnt FROM {src} GROUP BY 1, 2"
            for i in range(CMS_DEPTH)
        )

    key = f"(CAST(round(value * 100) AS BIGINT) % {CMS_JOIN_KEYS})"
    h = d.md5l(f"CAST({key} AS {d.str_t})")
    return f"""
    WITH ka AS (SELECT {h} AS h, {key} AS k FROM events
                WHERE event_type = 'click'),
    kb AS (SELECT {h} AS h, {key} AS k FROM events
           WHERE event_type = 'purchase'),
    ca AS (
{cells('ka')}
    ), cb AS (
{cells('kb')}
    ), prod AS (
      SELECT ca.depth, CAST(sum(ca.cnt * cb.cnt) AS BIGINT) AS est
      FROM ca JOIN cb ON ca.depth = cb.depth AND ca.col = cb.col
      GROUP BY ca.depth
    ), est AS (SELECT min(est) AS est_min FROM prod),
    exact AS (
      SELECT CAST(sum(a.c * b.c) AS BIGINT) AS exact_join
      FROM (SELECT k, count(*) AS c FROM ka GROUP BY k) a
      JOIN (SELECT k, count(*) AS c FROM kb GROUP BY k) b ON a.k = b.k)
    SELECT exact.exact_join,
           est.est_min,
           (est.est_min >= exact.exact_join) AS est_is_upper_bound,
           CAST(round(1000000.0 * (est.est_min - exact.exact_join)
                      / exact.exact_join) AS BIGINT) AS rel_err_micro
    FROM est, exact
    """


@register(
    "cms_join_cardinality_estimate",
    oracle=_cms_join_card_sql(DUCK_D),
    tags=("approx", "sketch", "join", "planning"),
    doc="Join-cardinality estimation from Count-Min inner products — the "
    "planning primitive that sizes a join BEFORE running it: |A JOIN B| "
    "estimated as min over depth rows of sum_col cmsA[col]*cmsB[col]. "
    "Each side compresses to depth x width integers (a broadcastable "
    "sketch built by one partial-aggregable scan per side), the estimate "
    "is a tiny sketch-sketch join, and the CMS guarantee — collisions "
    "only ADD counts, so every depth row upper-bounds the true size — is "
    "verified by value: the exact join size (computed from per-key "
    "counts, never a materialized join) is emitted next to the estimate "
    "with the est >= exact verdict the oracle asserts. The 1024-key "
    "universe against width 256 forces real collisions, so the entry "
    "certifies a genuine overestimate, not a degenerate exact pass.",
)
def cms_join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_cms_join_card_sql(SPARK_D))


# ---------------------------------------------------------------------------
# Native sketch surface (Spark 4: Datasketches HLL/Theta, bitmaps, top-k)
# ---------------------------------------------------------------------------
#
# The portable integer sketches above are the CROSS-ENGINE constructions;
# these entries certify Spark's NATIVE sketch functions against exact twins
# computed in the same query — the approx_count_distinct_hll pattern: the
# engine-specific sketch state never leaves the query, only exact values and
# boolean verdicts the oracle asserts TRUE.

THETA_REL_BOUND = 0.05  # |est - exact| <= 5% at lgK=12 over ~1e4 distinct


@register(
    "bitmap_exact_distinct_native",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS exact_distinct,
           count(DISTINCT user_id) AS bitmap_distinct,
           count(DISTINCT user_id) AS merged_distinct
    FROM events
    GROUP BY event_type
    """,
    tags=("approx", "sketch", "spark4", "aggregate"),
    doc="Native bitmap distinct counting (bitmap_construct_agg / "
    "bitmap_or_agg / bitmap_count, SPARK-44156): EXACT distinct counts "
    "from mergeable fixed-width bitmaps — the structure that replaces "
    "count(DISTINCT) rewrites when the key domain is dense integers. "
    "Emitted next to the exact count twice over: once built directly, "
    "once built as four md5-shard bitmaps OR-merged (mergeability by "
    "value, the hll_merge_shards discipline). The oracle emits the "
    "exact count for all three columns, so the hash proves bitmap == "
    "merged == exact. Bucketing by bitmap_bucket_number keeps the "
    "construction correct beyond the 32768-bit bucket width; at 100 TB "
    "each exchange row is one bucket bitmap per group, not user ids.",
)
def bitmap_exact_distinct_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "events").createOrReplaceTempView("events")
    shard = "(" + SPARK_D.md5l("CAST(event_id AS STRING)") + " % 4)"
    return spark.sql(
        f"""
        WITH direct AS (
          SELECT event_type,
                 CAST(sum(cnt) AS BIGINT) AS bitmap_distinct
          FROM (
            SELECT event_type, bitmap_bucket_number(user_id) AS bkt,
                   bitmap_count(bitmap_construct_agg(
                     bitmap_bit_position(user_id))) AS cnt
            FROM events GROUP BY event_type, bitmap_bucket_number(user_id)
          ) b GROUP BY event_type),
        sharded AS (
          SELECT event_type, bkt,
                 bitmap_construct_agg(bitmap_bit_position(user_id)) AS bm
          FROM (SELECT event_type, user_id,
                       bitmap_bucket_number(user_id) AS bkt,
                       {shard} AS shard
                FROM events) s
          GROUP BY event_type, bkt, shard),
        merged AS (
          SELECT event_type,
                 CAST(sum(bitmap_count(bm_or)) AS BIGINT) AS merged_distinct
          FROM (SELECT event_type, bkt, bitmap_or_agg(bm) AS bm_or
                FROM sharded GROUP BY event_type, bkt) m
          GROUP BY event_type),
        exact AS (
          SELECT event_type, count(DISTINCT user_id) AS exact_distinct
          FROM events GROUP BY event_type)
        SELECT e.event_type, e.exact_distinct,
               d.bitmap_distinct, m.merged_distinct
        FROM exact e
        JOIN direct d ON e.event_type = d.event_type
        JOIN merged m ON e.event_type = m.event_type
        """
    )


@register(
    "theta_sketch_native_audit",
    oracle="""
    SELECT count(DISTINCT user_id)  AS users_exact,
           TRUE                     AS theta_users_exact_match,
           count(DISTINCT event_id) AS events_exact,
           TRUE                     AS theta_events_within_bound
    FROM events
    """,
    tags=("approx", "sketch", "spark4", "aggregate"),
    doc="Native Datasketches Theta sketch (theta_sketch_agg/_estimate, "
    "SPARK-48521): below the sketch's retention threshold (lgK=12) Theta "
    "is EXACT — certified by equality on the user domain — and above it "
    "the estimate must land within 5% of the exact distinct count "
    "(event domain, ~10k at sf0.01), certified as a boolean the oracle "
    "asserts TRUE. Retained-minimum-hash state is order- and "
    "partitioning-independent, so the verdicts are deterministic; the "
    "raw estimate never leaves the query (engine-specific). Theta's "
    "practical edge over HLL is set algebra (union/intersection/"
    "difference on sketches) at bounded error — the 100 TB overlap-"
    "audit primitive.",
)
def theta_sketch_native_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        f"""
        SELECT count(DISTINCT user_id) AS users_exact,
               (theta_sketch_estimate(theta_sketch_agg(user_id))
                  = count(DISTINCT user_id)) AS theta_users_exact_match,
               count(DISTINCT event_id) AS events_exact,
               (abs(theta_sketch_estimate(theta_sketch_agg(event_id))
                    - count(DISTINCT event_id))
                  <= {THETA_REL_BOUND} * count(DISTINCT event_id))
                 AS theta_events_within_bound
        FROM events
        """
    )


APPROX_TOPK_K = 10


@register(
    "approx_top_k_native_audit",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id, count(*) AS c FROM events GROUP BY user_id),
    topk AS (
      SELECT c FROM per_user ORDER BY c DESC, user_id LIMIT {APPROX_TOPK_K})
    SELECT CAST({APPROX_TOPK_K} AS BIGINT) AS k,
           CAST(sum(c) AS BIGINT) AS topk_count_sum,
           CAST(max(c) AS BIGINT) AS top1_count,
           TRUE AS counts_match_exact,
           TRUE AS items_counted_exactly
    FROM topk
    """,
    tags=("approx", "sketch", "spark4", "aggregate"),
    doc="Native approx_top_k (SPARK-48506) audited against the exact "
    "top-k: with maxItemsTracked >= the distinct-key count the sketch's "
    "counts are exact, so (1) the MULTISET of its top-k counts must "
    "equal the exact window top-k counts (multisets, not items — count "
    "ties at the k-boundary make item selection legitimately arbitrary, "
    "and a hash over items would flake on a correct engine), and (2) "
    "every returned item's count must equal that item's exact count. "
    "Both certified as booleans the oracle asserts TRUE, beside the "
    "exact top-k count-sum and max. The two-level agg shape (per-key "
    "counts -> sketch) is what replaces ORDER BY count LIMIT k when the "
    "key domain is too large to rank exactly.",
)
def approx_top_k_native_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        f"""
        WITH per_user AS (
          SELECT user_id, count(*) AS c FROM events GROUP BY user_id),
        exact_topk AS (
          SELECT c FROM per_user ORDER BY c DESC, user_id LIMIT {APPROX_TOPK_K}),
        approx AS (
          SELECT explode(approx_top_k(user_id, {APPROX_TOPK_K}, 100000)) AS r
          FROM events),
        approx_rows AS (SELECT r.item AS user_id, r.count AS ac FROM approx),
        exact_counts AS (
          SELECT sort_array(collect_list(c), false) AS cs FROM exact_topk),
        approx_counts AS (
          SELECT sort_array(collect_list(ac), false) AS cs FROM approx_rows),
        item_check AS (
          SELECT count(*) AS n_bad
          FROM approx_rows a JOIN per_user p ON a.user_id = p.user_id
          WHERE a.ac <> p.c)
        SELECT CAST({APPROX_TOPK_K} AS BIGINT) AS k,
               (SELECT CAST(sum(c) AS BIGINT) FROM exact_topk)
                 AS topk_count_sum,
               (SELECT CAST(max(c) AS BIGINT) FROM exact_topk) AS top1_count,
               ((SELECT cs FROM exact_counts) = (SELECT cs FROM approx_counts))
                 AS counts_match_exact,
               ((SELECT n_bad FROM item_check) = 0) AS items_counted_exactly
        """
    )


@register(
    "datasketches_union_merge_audit",
    oracle="""
    SELECT count(DISTINCT user_id) AS users_exact,
           TRUE AS hll_union_equals_exact,
           TRUE AS theta_union_equals_exact,
           count(DISTINCT event_id) AS events_exact,
           TRUE AS hll_union_events_within_bound
    FROM events
    """,
    tags=("approx", "sketch", "spark4", "aggregate"),
    doc="Native Datasketches UNION mergeability — the native-function "
    "counterpart of hll_merge_shards. On sub-threshold domains the "
    "unions are EXACT: a 128-value domain for HLL (inside the sparse "
    "coupon regime at every SF — the raw user domain left it at sf0.1, "
    "measured) and the user domain for Theta (1500 < k=4096): four "
    "hash-shard sketches merged with hll_union_agg / theta_union_agg "
    "must equal the exact distinct count. On the "
    "estimation-mode event domain the HLL union is NOT state-identical "
    "to the direct sketch (mode-transition history differs between "
    "shard-then-union and direct builds — measured, and the reason "
    "this entry does NOT claim union==direct there, unlike the repo's "
    "integer HLL whose bucket-max merge is lossless by construction); "
    "the certified property is the accuracy contract instead: the "
    "merged estimate lands within 5% of the exact count. All booleans "
    "asserted TRUE by the oracle; sketch states and estimates never "
    "leave the query.",
)
def datasketches_union_merge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "events").createOrReplaceTempView("events")
    shard = "(" + SPARK_D.md5l("CAST(event_id AS STRING)") + " % 4)"
    return spark.sql(
        f"""
        WITH shards AS (
          SELECT hll_sketch_agg(user_id % 128) AS hs_u,
                 theta_sketch_agg(user_id) AS ts_u,
                 hll_sketch_agg(event_id) AS hs_e
          FROM (SELECT event_id, user_id, {shard} AS sh FROM events) t
          GROUP BY sh),
        merged AS (
          SELECT hll_sketch_estimate(hll_union_agg(hs_u)) AS hll_small,
                 theta_sketch_estimate(theta_union_agg(ts_u)) AS theta_users,
                 hll_sketch_estimate(hll_union_agg(hs_e)) AS hll_events
          FROM shards),
        direct AS (
          SELECT count(DISTINCT user_id % 128) AS small_exact,
                 count(DISTINCT user_id) AS users_exact,
                 count(DISTINCT event_id) AS events_exact
          FROM events)
        SELECT d.users_exact,
               (m.hll_small = d.small_exact) AS hll_union_equals_exact,
               (m.theta_users = d.users_exact) AS theta_union_equals_exact,
               d.events_exact,
               (abs(m.hll_events - d.events_exact)
                  <= {THETA_REL_BOUND} * d.events_exact)
                 AS hll_union_events_within_bound
        FROM merged m CROSS JOIN direct d
        """
    )


# ------------------------------------------------- HyperBall 2-hop reach ---

REACH_SAMPLE = 32  # audited source nodes (deterministic bounded sample)


def _reach2_sql(d: _Dialect, edges_from: str | None = None) -> str:
    """HyperBall step (Boldi & Vigna 2013, arXiv:1308.2144): per-node
    neighborhood-function estimation by merging neighbor HLL sketches —
    B(u,2) = B(u,1) ∪ ⋃_{v∈N(u)} B(v,1), where each B(·,1) is a 64-bucket
    tall-form sketch and merge = max per bucket. The exact 2-hop reach is
    computed alongside for the bounded sample so the estimate is audited.

    edges_from overrides the edges CTE body: the relation feeds SEVEN
    consumers (nodes, two rho1 branches, rho2, three reach wedge refs) and
    Spark inlines deterministic CTEs per consumer — without the override
    the orders ⋈ lineitem pairs join is re-derived each time (plan: ~30
    scans). The unused pairs CTE is pruned when the override is set."""
    h_node = d.md5l(f"CAST(u AS {d.str_t})")
    w = d.shr("h", 6)
    edges_body = (
        edges_from
        or "SELECT u, v FROM pairs UNION ALL SELECT v AS u, u AS v FROM pairs"
    )
    return f"""
    WITH pairs AS (
      SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS u,
                      CAST(l_suppkey * 2 + 1 AS BIGINT) AS v
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    edges AS ({edges_body}),
    nodes AS (SELECT DISTINCT u FROM edges),
    hh AS (SELECT u, {h_node} AS h FROM nodes),
    hb AS (SELECT u, (h % 64) AS bucket,
                  CASE WHEN {w} = 0 THEN 55
                       ELSE 55 - length(bin({w})) END AS r
           FROM hh),
    rho1 AS (
      SELECT xu AS u, bucket, max(r) AS m_j FROM (
        SELECT u AS xu, bucket, r FROM hb
        UNION ALL
        SELECT e.u AS xu, hb.bucket, hb.r FROM edges e JOIN hb ON hb.u = e.v
      ) x GROUP BY xu, bucket),
    smp AS (SELECT u FROM nodes WHERE u % 2 = 0 ORDER BY u LIMIT {REACH_SAMPLE}),
    rho2 AS (
      SELECT su AS u, bucket, max(m_j) AS m_j FROM (
        SELECT s.u AS su, r1.bucket, r1.m_j
        FROM smp s JOIN rho1 r1 ON r1.u = s.u
        UNION ALL
        SELECT e.u AS su, r1.bucket, r1.m_j
        FROM smp s JOIN edges e ON e.u = s.u JOIN rho1 r1 ON r1.u = e.v
      ) x GROUP BY su, bucket),
    sketch AS (
      SELECT u, count(*) AS n_hot, sum({d.shl('55 - m_j')}) AS hot_sum
      FROM rho2 GROUP BY u),
    est AS (
      SELECT u,
             CAST(64 - n_hot AS BIGINT) AS v_empty,
             CAST(hot_sum + (64 - n_hot) * 36028797018963968 AS BIGINT)
               AS harmonic_sum_scaled,
             ({HLL_ALPHA_NUM}
               / CAST(hot_sum + (64 - n_hot) * 36028797018963968 AS DOUBLE))
               AS raw_estimate,
             n_hot
      FROM sketch),
    reach AS (
      SELECT su AS u, count(DISTINCT w) AS exact_2hop FROM (
        SELECT s.u AS su, s.u AS w FROM smp s
        UNION ALL
        SELECT s.u AS su, e.v AS w FROM smp s JOIN edges e ON e.u = s.u
        UNION ALL
        SELECT s.u AS su, e2.v AS w
        FROM smp s JOIN edges e ON e.u = s.u JOIN edges e2 ON e2.u = e.v
      ) x GROUP BY su)
    SELECT e.u, e.v_empty, e.harmonic_sum_scaled,
           CAST(r.exact_2hop AS BIGINT) AS exact_2hop,
           CASE WHEN e.raw_estimate <= 160.0 AND e.v_empty > 0
                THEN {_hll_linear_case().replace('n_hot', 'e.n_hot')}
                ELSE e.raw_estimate END AS hll_estimate
    FROM est e JOIN reach r ON e.u = r.u
    """


@register(
    "graph_2hop_reach_hll_audit",
    oracle=_reach2_sql(DUCK_D),
    tags=("graph", "sketch", "approx", "audit"),
    doc=f"HyperBall neighborhood function (arXiv:1308.2144) as a Spark "
    "relational plan: each node's 2-hop reach |B(u,2)| is estimated by "
    "MERGING neighbor HLL sketches (tall 64-bucket form, merge = keyed "
    "max per bucket) — one edges⋈sketch join + one grouped max per "
    "radius, cost O(64·|E|) per iteration and never a wedge "
    "materialization. The exact 2-hop distinct count runs alongside for "
    f"a deterministic {REACH_SAMPLE}-node sample (the wedge join is "
    "bounded by the sample, exactly like the ANN recall audits), so the "
    "sketch's error is measured, not assumed. At 100 TB graph scale "
    "(centrality, anti-abuse blast-radius scoring) HyperBall is the only "
    "feasible shape: the exact wedge join grows with Σdeg², the sketch "
    "path stays linear in edges. Registers and harmonic sums are exact "
    "integers; the estimate embeds precomputed log literals (no libm), "
    "so every output column hashes identically cross-engine.",
)
def graph_2hop_reach_hll_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("orders", "lineitem"):
        tbl(spark, sf_dir, t).createOrReplaceTempView(t)
    # Pin the bounded edge relation once (distinct bipartite pairs, both
    # directions — edge-sized, never corpus-sized): seven CTE consumers
    # otherwise re-derive the orders ⋈ lineitem pairs join each. The SQL
    # is the shared module-level literal so it can never diverge from the
    # oracle-mirrored pairs text (r12 ADVICE).
    from flock_spark.operators.graph import PINNED_EDGES_SQL

    edges = spark.sql(PINNED_EDGES_SQL).localCheckpoint(eager=True)
    edges.createOrReplaceTempView("reach2_edges_pinned")
    return spark.sql(
        _reach2_sql(SPARK_D, edges_from="SELECT u, v FROM reach2_edges_pinned")
    )


# ---------------------------------------------------------------------------
# Order-dependent streaming sketches: space-saving heavy hitters and t-digest
# quantiles. Unlike the hash-based sketches above, their per-partition state
# depends on stream order, so the oracle cannot replay them in SQL. Instead
# each ships as a GUARANTEE AUDIT: the oracle computes the exact answer and
# the theorem-implied invariants (space-saving: every item with true count
# > N/k present in the union-merged summary, lower/upper bounds bracketing
# the truth; t-digest: rank error within the scale-function bound, centroid
# count within the compression budget), and the Spark side runs the REAL
# sketch and checks itself against them — an implementation bug that breaks
# any guarantee hash-mismatches. This mirrors the Bloom entries' "no false
# negatives" discipline for the order-dependent family.
# ---------------------------------------------------------------------------

SS_K = 128  # space-saving counters per stream segment
SS_SEGMENTS = 8  # stream segments (distributed sketch instances)
SS_AUDIT_TOP = 20  # exact top items audited against the merged summary
SS_LIGHT_W = 50000  # light-tail item universe width


def space_saving_summary(items, k: int) -> dict[str, list[int]]:
    """Space-saving (Metwally et al.) over one stream: at most k counters of
    [est, err]; a new item over capacity adopts the min counter's estimate as
    its error (est=min+1, err=min). Invariants the audit relies on: est >=
    true count >= est - err for every tracked item, and any item with true
    count > N/k is tracked at stream end."""
    counters: dict[str, list[int]] = {}
    for item in items:
        if item in counters:
            counters[item][0] += 1
        elif len(counters) < k:
            counters[item] = [1, 0]
        else:  # evict the min counter (deterministic tie-break), carry err
            evict = min(counters, key=lambda it: (counters[it][0], it))
            m = counters.pop(evict)[0]
            counters[item] = [m + 1, m]
    return counters


def space_saving_summary_grouped(pairs, k: int) -> dict[str, list[int]]:
    """Space-saving over a stream in which each item's occurrences arrive
    CONSECUTIVELY, fed as (item, total_count) pairs: c consecutive
    occurrences collapse into one increment-by-c (an over-capacity insert
    becomes [min+c, min] — exactly one insert at min+1 followed by c-1
    increments). A grouped stream is a legal arrival order of the same
    multiset, so every Metwally guarantee the audit relies on (est >=
    true >= est-err; any item with true count > N/k tracked at stream
    end; untracked items bounded by the min counter) holds identically —
    while the Python loop runs once per DISTINCT item instead of once per
    occurrence. Eviction picks min (est, item) like the element-wise
    form, via a lazy heap (est only grows, so stale heap entries sort
    first and are discarded) instead of an O(k) scan per eviction."""
    import heapq

    counters: dict[str, list[int]] = {}
    heap: list[tuple[int, str]] = []
    push = heapq.heappush
    pop = heapq.heappop
    for item, c in pairs:
        cur = counters.get(item)
        if cur is not None:
            cur[0] += c
            push(heap, (cur[0], item))
        elif len(counters) < k:
            counters[item] = [c, 0]
            push(heap, (c, item))
        else:
            while True:
                est, it = heap[0]
                v = counters.get(it)
                if v is not None and v[0] == est:
                    break
                pop(heap)
            pop(heap)
            m = counters.pop(it)[0]
            counters[item] = [m + c, m]
            push(heap, (m + c, item))
    return counters


def _ss_stream_sql(d: _Dialect, str_cat: str, seg: bool) -> str:
    """Engine-neutral derivation of the audited stream: one item per token
    occurrence, two-level hash mixture — 1/16 of occurrences land on 4 heavy
    items ('H0'..'H3', each ~N/64 > N/SS_K, theorem-guaranteed present), the
    rest spread over 50k light items (forces constant eviction: distinct
    items >> SS_SEGMENTS*SS_K). Integer-only, so both engines agree exactly."""
    h = d.md5l(f"{str_cat}")
    seg_col = f", doc_id % {SS_SEGMENTS} AS seg" if seg else ""
    return f"""
      SELECT CASE WHEN h % 16 = 0
                  THEN 'H' || CAST((h_div) % 4 AS {d.str_t})
                  ELSE 'L' || CAST((h_div) % {SS_LIGHT_W} AS {d.str_t})
             END AS item{seg_col}
      FROM (SELECT {h} AS h, {d.idiv(h, '16')} AS h_div, doc_id
            FROM __tokpos__) q
    """


@register(
    "sketch_space_saving_topk",
    oracle=f"""
    WITH doc AS (
      SELECT doc_id, len(string_split(trim(text), ' ')) AS nt FROM documents),
    __tokpos__ AS (
      SELECT doc_id, unnest(generate_series(0, nt - 1)) AS pos FROM doc),
    items AS ({_ss_stream_sql(DUCK_D, "'ss:' || CAST(doc_id AS VARCHAR) || ':' || CAST(pos AS VARCHAR)", seg=False)}),
    cnt AS (SELECT item, count(*) AS c FROM items GROUP BY item),
    n AS (SELECT count(*) AS n FROM items),
    top AS (SELECT item, c FROM cnt ORDER BY c DESC, item LIMIT {SS_AUDIT_TOP})
    SELECT item,
           CAST(c AS BIGINT) AS true_cnt,
           CAST(CASE WHEN c * {SS_K} > n.n THEN 1 ELSE 0 END AS BIGINT)
             AS guaranteed,
           CAST(1 AS BIGINT) AS present_ok,
           CAST(1 AS BIGINT) AS ub_ok,
           CAST(1 AS BIGINT) AS lb_ok
    FROM top, n
    """,
    tags=("approx", "sketch", "frequency", "audit", "pandas_udf"),
    doc=f"Space-saving streaming top-k (Metwally et al., the SpaceSaving "
    f"summary) with distributed merge: {SS_SEGMENTS} stream segments each "
    f"run a capacity-{SS_K} counter summary over their token-occurrence "
    "stream in pandas (count-increment / min-eviction with error carry), "
    "then the segment summaries union-merge — per audited item the upper "
    "bound sums est (or the segment's min counter when absent) and the "
    "lower bound sums est-err. The oracle computes the exact counts and "
    "emits the THEOREMS as columns: any item with true count > N/k is "
    "present in the merged summary (pigeonhole across segments: its count "
    "must exceed N_p/k somewhere), lb <= true <= ub always. The stream "
    "mixes 4 hash-derived heavy items (~N/64 each) over a 50k-item light "
    "tail, so eviction pressure is real (distinct >> segments*k) while the "
    "guarantee bites on genuinely heavy keys. Scale: this is THE bounded-"
    "memory heavy-hitter shape for unshuffled 100 TB streams — per-segment "
    "state is k counters regardless of input size, merge is k*segments "
    "rows, and no (item)-keyed shuffle of the raw stream ever happens "
    "(contrast corpus_vocab_topk, which shuffles the distinct-token "
    "universe).",
)
def sketch_space_saving_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql import functions as F

    # spread before the explode: the test-scale scan is one partition
    # (single row group), so without it the token explode + per-token md5
    # mixture ran single-threaded
    d = spread(tbl(spark, sf_dir, "documents"))
    tokpos = d.select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), " ")).alias("pos", "tok"),
    ).select("doc_id", "pos")
    tokpos.createOrReplaceTempView("__tokpos__")
    stream = spark.sql(
        _ss_stream_sql(
            SPARK_D,
            "CONCAT('ss:', CAST(doc_id AS STRING), ':', CAST(pos AS STRING))",
            seg=True,
        )
    )

    # Collapse the occurrence stream to grouped (seg, item, c) rows in the
    # JVM before anything else: map-side partial aggregation means the one
    # (seg, item) exchange carries at most segments x |item universe|
    # partial rows instead of every token occurrence, and the Python
    # boundary now ships the grouped pairs rather than the raw stream
    # (the previous groupBy(seg).applyInPandas shipped every occurrence
    # to Python and Counter-ed it there; the summary/exact/N consumers
    # each re-derived the whole explode+md5 stream — 3 scans).
    # space_saving_summary_grouped makes grouped arrival legal, and every
    # audited output column is an arrival-order-invariant theorem (exact
    # counts, est>=true>=est-err, pigeonhole presence), so results are
    # identical for ANY pair order. The pinned relation is bounded by the
    # item universe (SS_LIGHT_W + 4 per segment), never corpus-sized; the
    # pin is per-invocation (no session-lifetime cache leak — a leaked
    # stream cache here once slowed unrelated queries 3-4x).
    # THIS is the relation to pin: it feeds the per-segment summary AND
    # the exact counts, so pinning it guarantees the explode+md5 stream
    # derivation runs exactly once per invocation, structurally. (The
    # earlier pin sat one level up, on the summary — but the eager
    # summary-checkpoint job re-derived the whole stream and the main
    # job derived it AGAIN for the exact counts: two full stream passes
    # per run, measured ~0.6 s slower at sf0.1. The summary itself stays
    # lazy; its two consumers re-run the pandas apply over the 200k
    # checkpointed grouped rows, which is far cheaper than a stream pass.)
    seg_cnt = stream.groupBy("seg", "item").agg(
        F.count("*").alias("c")
    ).localCheckpoint(eager=True)

    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        counters = space_saving_summary_grouped(
            zip(pdf["item"], (int(c) for c in pdf["c"])), SS_K
        )
        min_est = min(v[0] for v in counters.values())
        return pd.DataFrame(
            {
                "seg": pd.Series(
                    [int(pdf["seg"].iloc[0])] * len(counters), dtype="int64"
                ),
                "item": list(counters.keys()),
                "est": pd.Series([v[0] for v in counters.values()], dtype="int64"),
                "err": pd.Series([v[1] for v in counters.values()], dtype="int64"),
                "min_est": pd.Series([min_est] * len(counters), dtype="int64"),
            }
        )

    summary = seg_cnt.groupBy("seg").applyInPandas(
        summarize, schema="seg long, item string, est long, err long, min_est long"
    )

    cnt = seg_cnt.groupBy("item").agg(F.sum("c").alias("true_cnt"))
    # stream size N joins in as a broadcast 1-row relation instead of a
    # driver collect: the collect ran a separate job that re-evaluated the
    # whole stream -> cnt subtree per query run (and a .collect() in the
    # query path is exactly what the driver-discipline rules forbid at
    # scale)
    n_df = cnt.agg(F.sum("true_cnt").alias("n_stream"))
    top = (
        cnt.orderBy(F.col("true_cnt").desc(), "item")
        .limit(SS_AUDIT_TOP)
        .crossJoin(F.broadcast(n_df))
    )
    seg_mins = summary.groupBy("seg").agg(F.min("min_est").alias("seg_min"))

    merged = (
        top.crossJoin(F.broadcast(seg_mins))
        .join(summary, ["item", "seg"], "left")
        .groupBy("item", "true_cnt", "n_stream")
        .agg(
            F.sum(F.coalesce(F.col("est"), F.col("seg_min"))).alias("ub"),
            F.sum(
                F.when(F.col("est").isNotNull(), F.col("est") - F.col("err"))
                .otherwise(F.lit(0))
            ).alias("lb"),
            F.max(
                F.when(F.col("est").isNotNull(), F.lit(1)).otherwise(F.lit(0))
            ).alias("present"),
        )
    )
    out = merged.select(
        "item",
        "true_cnt",
        F.when(F.col("true_cnt") * SS_K > F.col("n_stream"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("guaranteed"),
        F.greatest(
            F.col("present").cast("long"),
            F.when(F.col("true_cnt") * SS_K > F.col("n_stream"), F.lit(0))
            .otherwise(F.lit(1))
            .cast("long"),
        ).alias("present_ok"),
        (F.col("ub") >= F.col("true_cnt")).cast("long").alias("ub_ok"),
        (F.col("lb") <= F.col("true_cnt")).cast("long").alias("lb_ok"),
    )
    return out


TD_DELTA = 100  # t-digest compression parameter
TD_SHARDS = 8  # independent shard digests, merged once
TD_QS_BP = (100, 1000, 5000, 9000, 9900)  # audited quantiles, basis points


def _td_cluster(means: list[float], weights: list[int], cap: int):
    """Size-capped (k0-scale) t-digest clustering over value-sorted input:
    accumulate running (sum, weight) clusters, closing a cluster when adding
    the next point/cluster would exceed the weight cap. Returns (means,
    weights) of the compacted digest; never splits an input cluster."""
    out_m: list[float] = []
    out_w: list[int] = []
    cur_s = 0.0
    cur_w = 0
    for m, w in zip(means, weights):
        if cur_w and cur_w + w > cap:
            out_m.append(cur_s / cur_w)
            out_w.append(cur_w)
            cur_s, cur_w = 0.0, 0
        cur_s += m * w
        cur_w += w
    if cur_w:
        out_m.append(cur_s / cur_w)
        out_w.append(cur_w)
    return out_m, out_w


@register(
    "sketch_tdigest_quantile_audit",
    oracle=f"""
    WITH n AS (SELECT count(*) AS n FROM events WHERE value IS NOT NULL)
    SELECT CAST(q.q_bp AS BIGINT) AS q_bp,
           CAST(n.n AS BIGINT) AS n,
           CAST(2 * (n.n // {TD_DELTA // 2}) + 2 AS BIGINT) AS rank_bound,
           CAST(1 AS BIGINT) AS rank_ok,
           CAST(1 AS BIGINT) AS compact_ok
    FROM (VALUES {", ".join(f"({q})" for q in TD_QS_BP)}) q(q_bp), n
    """,
    tags=("approx", "sketch", "aggregate", "stats", "audit", "pandas_udf"),
    doc=f"t-digest quantile sketch (Dunning & Ertl, arXiv:1902.04023) with "
    f"shard merge, k0/size-capped variant: {TD_SHARDS} shards each build a "
    f"digest over their sorted values (cluster weight cap 2·n_shard/δ, "
    f"δ={TD_DELTA}), the shard digests merge into one (re-cluster by mean "
    "with cap 2·n/δ — never splitting an input cluster, so the cap "
    "invariant survives the merge), and quantile estimates interpolate "
    "between adjacent centroid means. The oracle emits the theorem: the "
    "estimate's true rank (counted against the raw data with a broadcast "
    "join) lies within 2·(2n/δ)+2 of q·n — adjacent-cluster weights bound "
    "the interpolation error — and the merged digest stays within the "
    f"δ-centroid compression budget. Digest state is ~δ centroids "
    "regardless of input size; this is the mergeable-quantile shape for "
    "100 TB percentile dashboards (HDR sketches above trade to fixed bins; "
    "t-digest keeps relative accuracy at the tails with float centroids).",
)
def sketch_tdigest_quantile_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql import functions as F

    ev = (
        tbl(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_id", "value")
    )
    ev = ev.withColumn("shard", F.pmod(F.col("event_id"), F.lit(TD_SHARDS)))

    def build_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = sorted(float(v) for v in pdf["value"])
        cap = max(1, (2 * len(vals)) // TD_DELTA)
        means, weights = _td_cluster(vals, [1] * len(vals), cap)
        return pd.DataFrame(
            {
                "mean": pd.Series(means, dtype="float64"),
                "weight": pd.Series(weights, dtype="int64"),
            }
        )

    shard_digests = ev.groupBy("shard").applyInPandas(
        build_shard, schema="mean double, weight long"
    )

    def merge_and_query(pdf: pd.DataFrame) -> pd.DataFrame:
        order = pdf.sort_values(["mean", "weight"])
        n = int(order["weight"].sum())
        cap = max(1, (2 * n) // TD_DELTA)
        means, weights = _td_cluster(
            [float(m) for m in order["mean"]],
            [int(w) for w in order["weight"]],
            cap,
        )
        n_centroids = len(means)
        cum = []
        acc = 0
        for w in weights:  # centroid midpoint ranks, the standard t-digest walk
            cum.append(acc + w / 2.0)
            acc += w
        ests = []
        for q_bp in TD_QS_BP:
            target = q_bp * n / 10000.0
            if target <= cum[0]:
                est = means[0]
            elif target >= cum[-1]:
                est = means[-1]
            else:
                j = max(i for i in range(len(cum)) if cum[i] <= target)
                frac = (target - cum[j]) / (cum[j + 1] - cum[j])
                est = means[j] + frac * (means[j + 1] - means[j])
            ests.append(est)
        return pd.DataFrame(
            {
                "q_bp": pd.Series(list(TD_QS_BP), dtype="int64"),
                "est": pd.Series(ests, dtype="float64"),
                "n_centroids": pd.Series([n_centroids] * len(ests), dtype="int64"),
            }
        )

    digest = (
        shard_digests.withColumn("one", F.lit(1))
        .groupBy("one")
        .applyInPandas(merge_and_query, schema="q_bp long, est double, n_centroids long")
    )

    # rank-check the estimates against the raw data: 5-row broadcast side
    checked = (
        ev.crossJoin(F.broadcast(digest))
        .groupBy("q_bp", "n_centroids")
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("value") < F.col("est")).cast("long")).alias("cnt_lt"),
            F.sum((F.col("value") <= F.col("est")).cast("long")).alias("cnt_le"),
        )
    )
    bound = 2 * F.expr(f"n div {TD_DELTA // 2}") + 2  # integer div, like the oracle's //
    target = (F.col("q_bp") * F.col("n") / 10000.0)
    return checked.select(
        "q_bp",
        F.col("n").cast("long").alias("n"),
        bound.alias("rank_bound"),
        (
            (F.col("cnt_lt") <= target + bound)
            & (F.col("cnt_le") >= target - bound)
        ).cast("long").alias("rank_ok"),
        (F.col("n_centroids") <= F.lit(TD_DELTA)).cast("long").alias("compact_ok"),
    )


# ---------------------------------------------------------------------------
# Roaring bitmaps (RoaringFormatSpec): the compressed-bitmap format under
# every production bitmap index. Containers are per-16-bit-bucket and pick
# their representation by the spec's size rule; set algebra is container-
# typed (array merge, bitmap word ops, run interval ops).
# ---------------------------------------------------------------------------

ROARING_ARRAY_MAX = 4096
ROARING_BITMAP_BYTES = 8192  # 65536 bits


def roaring_container_type(card: int, n_runs: int) -> tuple[str, int]:
    """The spec's runOptimize decision: a run container costs 2 + 4*n_runs
    bytes and wins when cheaper than both the array (2*card) and the
    bitmap (8192); otherwise array up to 4096 values, else bitmap.
    Returns (type, serialized_container_bytes)."""
    run_bytes = 2 + 4 * n_runs
    other = min(ROARING_BITMAP_BYTES, 2 * card)
    if run_bytes < other:
        return "run", run_bytes
    if card <= ROARING_ARRAY_MAX:
        return "array", 2 * card
    return "bitmap", ROARING_BITMAP_BYTES


def _runs_of(sorted_lows: list[int]) -> list[tuple[int, int]]:
    """Maximal runs as (start, length) over a sorted distinct list."""
    runs: list[tuple[int, int]] = []
    for v in sorted_lows:
        if runs and runs[-1][0] + runs[-1][1] == v:
            runs[-1] = (runs[-1][0], runs[-1][1] + 1)
        else:
            runs.append((v, 1))
    return runs


class RoaringContainer:
    """One container in its NATIVE representation: 'array' keeps the
    sorted value list, 'bitmap' 1024 64-bit words, 'run' (start, length)
    intervals. Set algebra dispatches on the type pair."""

    def __init__(self, sorted_lows: list[int]) -> None:
        runs = _runs_of(sorted_lows)
        self.card = len(sorted_lows)
        self.n_runs = len(runs)
        self.ctype, self.cbytes = roaring_container_type(
            self.card, self.n_runs
        )
        if self.ctype == "array":
            self.values = sorted_lows
        elif self.ctype == "run":
            self.runs = runs
        else:
            words = [0] * 1024
            for v in sorted_lows:
                words[v >> 6] |= 1 << (v & 63)
            self.words = words

    def to_sorted(self) -> list[int]:
        if self.ctype == "array":
            return list(self.values)
        if self.ctype == "run":
            out: list[int] = []
            for s, ln in self.runs:
                out.extend(range(s, s + ln))
            return out
        out = []
        for wi, w in enumerate(self.words):
            while w:
                b = w & -w
                out.append((wi << 6) | b.bit_length() - 1)
                w ^= b
        return out

    def _word(self, i: int) -> int:
        """The i-th 64-bit word of this container's bitset view."""
        if self.ctype == "bitmap":
            return self.words[i]
        w = 0
        lo, hi = i << 6, (i << 6) + 64
        if self.ctype == "array":
            import bisect

            for v in self.values[
                bisect.bisect_left(self.values, lo):
                bisect.bisect_left(self.values, hi)
            ]:
                w |= 1 << (v & 63)
            return w
        for s, ln in self.runs:
            a, b = max(s, lo), min(s + ln, hi)
            for v in range(a, b):
                w |= 1 << (v & 63)
        return w

    def op(self, other: "RoaringContainer", union: bool) -> list[int]:
        """Typed container algebra -> sorted result values. array×array
        runs a two-pointer merge; run×run intersects/merges intervals;
        anything involving a bitmap goes word-wise."""
        a, b = self, other
        if a.ctype == "array" and b.ctype == "array":
            if union:
                return sorted(set(a.values) | set(b.values))
            i = j = 0
            out = []
            while i < len(a.values) and j < len(b.values):
                x, y = a.values[i], b.values[j]
                if x == y:
                    out.append(x)
                    i += 1
                    j += 1
                elif x < y:
                    i += 1
                else:
                    j += 1
            return out
        if a.ctype == "run" and b.ctype == "run":
            out = []
            if union:
                ivals = sorted(a.runs + b.runs)
                merged: list[tuple[int, int]] = []
                for s, ln in ivals:
                    if merged and s <= merged[-1][0] + merged[-1][1]:
                        ps, pl = merged[-1]
                        merged[-1] = (ps, max(pl, s + ln - ps))
                    else:
                        merged.append((s, ln))
                for s, ln in merged:
                    out.extend(range(s, s + ln))
                return out
            for s1, l1 in a.runs:
                for s2, l2 in b.runs:
                    lo, hi = max(s1, s2), min(s1 + l1, s2 + l2)
                    out.extend(range(lo, hi))
            return sorted(out)
        # word-wise path for every pair involving a bitmap (and the mixed
        # array/run pairs — correct for all types, optimal for bitmaps)
        out = []
        for i in range(1024):
            w = (a._word(i) | b._word(i)) if union else (a._word(i) & b._word(i))
            base = i << 6
            while w:
                bit = w & -w
                out.append(base | bit.bit_length() - 1)
                w ^= bit
        return out


ROARING_PRED_A = "doc_id % 3 = 0 OR doc_id BETWEEN 100 AND 1999"
ROARING_PRED_B = "doc_id % 2 = 0 OR doc_id BETWEEN 70000 AND 70500"


def _roaring_set_sql(name: str, pred: str) -> str:
    """Per-set oracle block: bucket split, run counting via LAG, the
    spec's container-type decision, and the set-level rollup."""
    return f"""
    SELECT '{name}' AS set_name,
           CAST(sum(card) AS BIGINT) AS cardinality,
           CAST(sum(CASE WHEN ctype = 'array' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_array,
           CAST(sum(CASE WHEN ctype = 'bitmap' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bitmap,
           CAST(sum(CASE WHEN ctype = 'run' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_run,
           CAST(sum(cbytes) AS BIGINT) AS container_bytes
    FROM (
      SELECT bucket, card, n_runs,
             CASE WHEN 2 + 4 * n_runs < least(8192, 2 * card) THEN 'run'
                  WHEN card <= 4096 THEN 'array' ELSE 'bitmap' END AS ctype,
             CASE WHEN 2 + 4 * n_runs < least(8192, 2 * card)
                    THEN 2 + 4 * n_runs
                  WHEN card <= 4096 THEN 2 * card ELSE 8192 END AS cbytes
      FROM (
        SELECT bucket, count(*) AS card, sum(run_start) AS n_runs
        FROM (
          SELECT bucket, low,
                 CASE WHEN lag(low) OVER (PARTITION BY bucket ORDER BY low)
                        = low - 1 THEN 0 ELSE 1 END AS run_start
          FROM (
            SELECT CAST(floor(doc_id / 65536) AS BIGINT) AS bucket,
                   doc_id % 65536 AS low
            FROM documents WHERE {pred}) lows) rs
        GROUP BY bucket) pb) typed
    """


_ROARING_ORACLE = "\n    UNION ALL".join(
    _roaring_set_sql(n, p)
    for n, p in (
        ("a", ROARING_PRED_A),
        ("b", ROARING_PRED_B),
        ("a_and_b", f"({ROARING_PRED_A}) AND ({ROARING_PRED_B})"),
        ("a_or_b", f"({ROARING_PRED_A}) OR ({ROARING_PRED_B})"),
    )
)


@register(
    "sketch_roaring_bitmap_ops",
    oracle=_ROARING_ORACLE,
    tags=("sketches", "pandas_udf", "codec"),
    doc="Roaring bitmaps from the public RoaringFormatSpec — the "
    "compressed-bitmap format under every production bitmap index "
    "(Lucene, Druid, ClickHouse): two doc_id sets (a modular set union "
    "a contiguous range — mixing run-friendly and run-hostile shapes) "
    "split into per-16-bit-bucket containers that pick their NATIVE "
    "representation by the spec's size rule (run: 2+4*n_runs bytes when "
    "cheaper than both; array to 4096 values; bitmap 8192 bytes), then "
    "AND/OR run through TYPED container algebra — two-pointer array "
    "merge, interval intersection/merging for run pairs, word-wise ops "
    "when a bitmap is involved — with the result re-typed by the same "
    "rule. The oracle re-derives cardinality, the per-type container "
    "census and the serialized byte mass for all four sets from pure "
    "SQL (bucket split + LAG run counting + the spec decision), so a "
    "wrong merge, a wrong type decision, or a wrong size formula all "
    "mismatch; the UDF additionally cross-checks every result against "
    "Python set algebra. Scale: buckets are roaring's unit of "
    "independence — applyInPandas partitions BY BUCKET, so a 2^32 "
    "universe is 65536 independent tasks and the set algebra never "
    "moves more than one bucket's 8 KB per side.",
)
def sketch_roaring_bitmap_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql import functions as F

    d = tbl(spark, sf_dir, "documents").select("doc_id")
    marked = d.select(
        F.floor(F.col("doc_id") / 65536).cast("long").alias("bucket"),
        (F.col("doc_id") % 65536).alias("low"),
        F.expr(f"CASE WHEN {ROARING_PRED_A} THEN 1 ELSE 0 END").alias("in_a"),
        F.expr(f"CASE WHEN {ROARING_PRED_B} THEN 1 ELSE 0 END").alias("in_b"),
    ).filter("in_a = 1 OR in_b = 1")

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        bucket = int(pdf["bucket"].iloc[0])
        a_lows = sorted(int(v) for v in pdf.loc[pdf["in_a"] == 1, "low"])
        b_lows = sorted(int(v) for v in pdf.loc[pdf["in_b"] == 1, "low"])
        out = []
        conts: dict[str, list[int]] = {}
        for name, lows in (("a", a_lows), ("b", b_lows)):
            conts[name] = lows
        ca = RoaringContainer(a_lows) if a_lows else None
        cb = RoaringContainer(b_lows) if b_lows else None
        if ca and cb:
            conts["a_and_b"] = ca.op(cb, union=False)
            conts["a_or_b"] = ca.op(cb, union=True)
            # cross-check the typed algebra against plain set algebra
            if set(conts["a_and_b"]) != set(a_lows) & set(b_lows):
                raise ValueError(f"AND algebra broken in bucket {bucket}")
            if set(conts["a_or_b"]) != set(a_lows) | set(b_lows):
                raise ValueError(f"OR algebra broken in bucket {bucket}")
            # and the native round-trip
            if ca.to_sorted() != a_lows or cb.to_sorted() != b_lows:
                raise ValueError(f"container roundtrip broken in {bucket}")
        else:
            conts["a_and_b"] = []
            conts["a_or_b"] = a_lows or b_lows
        for name, lows in conts.items():
            if not lows:
                continue
            c = RoaringContainer(lows)
            out.append((name, bucket, c.card, c.ctype, c.cbytes))
        return pd.DataFrame(
            out, columns=["set_name", "bucket", "card", "ctype", "cbytes"]
        )

    stats = marked.groupBy("bucket").applyInPandas(
        per_bucket,
        schema="set_name string, bucket long, card long, ctype string, "
        "cbytes long",
    )
    return stats.groupBy("set_name").agg(
        F.sum("card").cast("long").alias("cardinality"),
        F.sum((F.col("ctype") == "array").cast("long")).alias("n_array"),
        F.sum((F.col("ctype") == "bitmap").cast("long")).alias("n_bitmap"),
        F.sum((F.col("ctype") == "run").cast("long")).alias("n_run"),
        F.sum("cbytes").cast("long").alias("container_bytes"),
    )
