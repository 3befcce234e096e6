"""Corpus-preparation operators over ``documents`` — the dataset-curation
steps that sit around dedup in a training-data pipeline: deterministic
splits, benchmark decontamination, vocabulary statistics, and repetition
scoring (Gopher-style filters).

The reference has no such surface (it is a streaming SQL engine); these are
the LLM-pipeline extensions from the BASELINE.json north star, designed
Spark-first:

- split: pure per-row hash projection, no shuffle, reproducible on any
  cluster layout (never ``rand()`` — re-running must give the same split).
- decontamination: word-shingle semi-join against the eval set; the eval
  side is tiny and broadcast, so the corpus never shuffles.
- vocabulary: explode + count with map-side partial aggregation, top-k via
  TakeOrderedAndProject (no full sort at any scale).
- repetition: per-row higher-order functions over the token array — zero
  shuffle, linear scan per document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flock_spark.catalog import spread, tbl
from flock_spark.operators.hashing import duck_md5_long, spark_md5_long
from flock_spark.registry import register

TEST_PCT = 10  # hash-split: lowest 10% of the key space becomes eval
# Word-shingle width for decontamination. Real pipelines use 8-13-gram
# overlap on natural text; the synthetic corpus draws from a ~30-word
# vocabulary, where 5-grams (30^5 space vs ~50-word docs) never collide and
# the entry's result was provably empty — vacuous as driver evidence. 3-grams
# are the proportionally-equivalent width for this vocabulary: ~30% of train
# docs genuinely share an eval shingle, so the hash gate checks real overlap
# counts, not an empty set.
CONTAM_K = 3
VOCAB_TOP = 100


@register(
    "corpus_split_stratified",
    oracle=f"""
    SELECT lang,
           CASE WHEN {duck_md5_long("'split' || CAST(doc_id AS STRING)")} % 100
                     < {TEST_PCT}
                THEN 'test' ELSE 'train' END AS split,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_chars
    FROM documents
    GROUP BY 1, 2
    """,
    tags=("corpus", "pipeline"),
    doc=f"Deterministic stratified train/test split: md5(doc_id) mod 100 < "
    f"{TEST_PCT} → test, independently within every lang stratum. A pure "
    "projection — the assignment is a function of the row alone, so it is "
    "identical on 1 or 1000 executors and on re-runs (rand() would not be); "
    "reported here as per-stratum counts so the balance is auditable.",
)
def corpus_split_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    key = spark_md5_long("'split' || CAST(doc_id AS STRING)")
    split = F.expr(
        f"CASE WHEN {key} % 100 < {TEST_PCT} THEN 'test' ELSE 'train' END"
    )
    return (
        d.groupBy("lang", split.alias("split"))
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("n_chars"))
    )


def _word_shingles_spark(tk: str = "tk") -> str:
    """Spark SQL: distinct word-CONTAM_K-gram array over a materialized
    token-array column. Callers project split(trim(text)) once per row as
    ``tk`` first — slicing an inline split inside the lambda re-evaluates
    the split for every element (O(tokens²·len) interpreted work per doc,
    the same class as the bigram fix in _bigram_rows)."""
    return (
        f"array_distinct(transform("
        f" sequence(1, greatest(size({tk}) - {CONTAM_K - 1}, 1)),"
        f" i -> array_join(slice({tk}, i, {CONTAM_K}), ' ')))"
    )


_TK = "split(trim(text), ' ')"


def _word_shingles_duck() -> str:
    toks = "string_split(trim(text), ' ')"
    return (
        f"list_distinct([array_to_string({toks}[i:i+{CONTAM_K - 1}], ' ')"
        f" for i in generate_series(1, greatest(len({toks}) - {CONTAM_K - 1}, 1))])"
    )


@register(
    "corpus_decontaminate",
    oracle=f"""
    WITH sh AS (SELECT doc_id, unnest({_word_shingles_duck()}) AS shingle
                FROM documents),
    eval_sh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 100 = 0),
    hits AS (
      SELECT s.doc_id, count(*) AS n_contaminated
      FROM sh s JOIN eval_sh e ON s.shingle = e.shingle
      WHERE s.doc_id % 100 <> 0
      GROUP BY s.doc_id)
    SELECT doc_id, n_contaminated FROM hits
    """,
    tags=("corpus", "pipeline", "join"),
    doc=f"Benchmark decontamination: training docs sharing any distinct "
    f"word-{CONTAM_K}-gram with the eval set (doc_id % 100 = 0 stands in for "
    "a benchmark corpus), with the overlap count per doc. The eval shingle "
    "set is small by construction, so it broadcasts and the corpus-side "
    "scan never shuffles — at 100 TB this is one pass over the training "
    "split. Dropping the flagged docs is the anti-join of this result.",
)
def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    # No pin and no cache: the doc_id % 100 filter pushes through the
    # explode, so the eval side expands shingles for 1% of the corpus and
    # the train side streams the full explode exactly once — "sharing" the
    # exploded relation (the old .cache()) actually pessimized this by
    # materializing the full shingle stream AND blocking the pushdown
    # (and a cached plan leaks into later runs — cross-run caching).
    sh = d.select("doc_id", F.expr(_TK).alias("tk")).select(
        "doc_id", F.explode(F.expr(_word_shingles_spark())).alias("shingle")
    )
    eval_sh = sh.filter(F.col("doc_id") % 100 == 0).select("shingle").distinct()
    # spread the TRAIN side only: the full-corpus shingle explode is rooted
    # on a single-split scan at test scale and ran single-threaded; the
    # doc_id filter sits below the repartition, so the eval side's 1%
    # pushdown is untouched. No-op once real scans have >= cores splits.
    from flock_spark.catalog import spread

    train = (
        spread(d.filter(F.col("doc_id") % 100 != 0).select("doc_id", "text"))
        .select("doc_id", F.expr(_TK).alias("tk"))
        .select("doc_id", F.explode(F.expr(_word_shingles_spark())).alias("shingle"))
    )
    return (
        train.join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated"))
    )


@register(
    "corpus_vocab_topk",
    oracle=f"""
    SELECT token, count(*) AS cnt
    FROM (SELECT unnest(string_split(trim(text), ' ')) AS token
          FROM documents) t
    GROUP BY token
    ORDER BY cnt DESC, token
    LIMIT {VOCAB_TOP}
    """,
    tags=("corpus", "aggregate", "sort"),
    doc=f"Corpus vocabulary: top-{VOCAB_TOP} tokens by frequency. Explode + "
    "count benefits from map-side partial aggregation (the distinct-token "
    "universe, not the corpus, crosses the shuffle); the ordered limit "
    "plans as TakeOrderedAndProject — per-partition heaps, no global sort.",
)
def corpus_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.trim("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "token")
        .limit(VOCAB_TOP)
    )


@register(
    "corpus_repetition_stats",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token
      FROM documents),
    per_tok AS (
      SELECT doc_id, token, count(*) AS c FROM tok GROUP BY doc_id, token)
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           count(*) AS n_distinct,
           round(CAST(count(*) AS DOUBLE) / sum(c), 6) AS distinct_ratio,
           round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top_token_share
    FROM per_tok
    GROUP BY doc_id
    """,
    tags=("corpus", "pipeline"),
    doc="Repetition scoring (Gopher-style quality filter): per-doc distinct-"
    "token ratio and the share of the single most frequent token. Computed "
    "per-row with higher-order functions — sort the token array once, then "
    "one fold counts the longest equal-run — so the whole operator is a "
    "narrow projection with no shuffle (the oracle uses the classic "
    "two-level group-by instead; identical results).",
)
def corpus_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    toks = "array_sort(split(trim(text), ' '))"
    # fold over the sorted tokens: (prev token, current run, max run)
    max_run = (
        f"aggregate({toks},"
        f" named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'mx', 0L),"
        f" (acc, t) -> named_struct("
        f"   'prev', t,"
        f"   'run', IF(acc.prev IS NOT NULL AND t = acc.prev, acc.run + 1, 1L),"
        f"   'mx', greatest(acc.mx,"
        f"         IF(acc.prev IS NOT NULL AND t = acc.prev, acc.run + 1, 1L))),"
        f" acc -> acc.mx)"
    )
    return d.select(
        "doc_id",
        F.expr(f"CAST(size({toks}) AS BIGINT)").alias("n_tokens"),
        F.expr(f"CAST(size(array_distinct({toks})) AS BIGINT)").alias("n_distinct"),
        F.expr(
            f"round(CAST(size(array_distinct({toks})) AS DOUBLE) / size({toks}), 6)"
        ).alias("distinct_ratio"),
        F.expr(f"round(CAST({max_run} AS DOUBLE) / size({toks}), 6)").alias(
            "top_token_share"
        ),
    )


SAMPLE_PCT = 7


@register(
    "corpus_sample_deterministic",
    oracle=f"""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE {duck_md5_long("'sample' || CAST(doc_id AS STRING)")} % 100 < {SAMPLE_PCT}
    """,
    tags=("corpus", "pipeline", "filter"),
    doc=f"Deterministic {SAMPLE_PCT}% Bernoulli sample by hashed key — the "
    "reproducible alternative to df.sample(): membership is a pure function "
    "of doc_id, so the sample is stable across reruns, cluster layouts, and "
    "engines (df.sample's RNG is partition-dependent and would not "
    "oracle-match). The predicate is a plain filter, evaluated scan-side.",
)
def corpus_sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    key = spark_md5_long("'sample' || CAST(doc_id AS STRING)")
    return d.filter(F.expr(f"{key} % 100 < {SAMPLE_PCT}")).select(
        "doc_id", "lang", "n_chars"
    )


GROUP_SAMPLE_K = 20  # docs kept per language stratum


@register(
    "corpus_sample_per_group",
    oracle=f"""
    SELECT doc_id, lang, rn
    FROM (SELECT doc_id, lang,
                 row_number() OVER (
                   PARTITION BY lang
                   ORDER BY {duck_md5_long("'gsamp' || CAST(doc_id AS VARCHAR)")},
                            doc_id) AS rn
          FROM documents) t
    WHERE rn <= {GROUP_SAMPLE_K}
    """,
    tags=("corpus", "pipeline", "window"),
    doc=f"Fixed-size per-group sample: exactly {GROUP_SAMPLE_K} docs per "
    "language, chosen by row_number over the portable hash of doc_id (plus "
    "doc_id tiebreak) — the balanced-subsampling op a training mix needs "
    "when sources are skewed, reproducible across reruns/layouts/engines "
    "where a per-group reservoir with rand() is not. One window shuffle "
    "keyed by the stratum; at 100 TB with heavy strata this becomes "
    "per-partition top-k then a k*strata-row final merge (the "
    "TakeOrderedAndProject shape per group), never a full sort.",
)
def corpus_sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = tbl(spark, sf_dir, "documents")
    key = spark_md5_long("'gsamp' || CAST(doc_id AS STRING)")
    w = Window.partitionBy("lang").orderBy(F.expr(key), F.col("doc_id"))
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= GROUP_SAMPLE_K)
    )


MIX_DENOM = 1_000_000  # hash-fraction resolution for keep decisions


@register(
    "corpus_temperature_mix",
    oracle=f"""
    WITH counts AS (
      SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
    probs AS (
      SELECT source, n_docs,
             CAST(round(sqrt(CAST((SELECT min(n_docs) FROM counts) AS DOUBLE)
                             / n_docs) * {MIX_DENOM}) AS BIGINT) AS keep_ppm
      FROM counts),
    kept AS (
      SELECT d.source, p.n_docs, p.keep_ppm
      FROM documents d JOIN probs p ON d.source = p.source
      WHERE ({duck_md5_long("'mix' || CAST(doc_id AS VARCHAR)")}) % {MIX_DENOM} < p.keep_ppm)
    SELECT source, n_docs AS n_orig, keep_ppm, count(*) AS n_kept
    FROM kept GROUP BY source, n_docs, keep_ppm
    """,
    tags=("corpus", "sampling", "pipeline"),
    doc="Temperature-style source rebalancing (the multilingual-mixture "
    "resampling step): per-source keep probability sqrt(n_min/n_s) "
    "downsamples dominant sources toward the rarest. sqrt is IEEE "
    "correctly-rounded — bit-identical cross-engine, unlike pow — and the "
    "keep decision is an exact integer comparison of a seeded md5 fraction "
    "against the ppm-quantized probability (no float boundary, no rand()). "
    "The per-source probability table is tiny and broadcasts; the corpus "
    "scan keeps its partitioning — one pass at any scale.",
)
def corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    n_min = counts.agg(F.min("n_docs").alias("n_min"))
    probs = counts.crossJoin(F.broadcast(n_min)).select(
        "source",
        "n_docs",
        F.expr(
            f"CAST(round(sqrt(CAST(n_min AS DOUBLE) / n_docs) * {MIX_DENOM}) AS BIGINT)"
        ).alias("keep_ppm"),
    )
    h = spark_md5_long("'mix' || CAST(doc_id AS STRING)")
    kept = (
        d.join(F.broadcast(probs), "source")
        .filter(F.expr(f"({h}) % {MIX_DENOM}") < F.col("keep_ppm"))
    )
    return kept.groupBy("source", F.col("n_docs").alias("n_orig"), "keep_ppm").agg(
        F.count("*").alias("n_kept")
    )


N_SHARDS = 8


@register(
    "corpus_shuffle_shards",
    oracle=f"""
    WITH sharded AS (
      SELECT doc_id, n_chars,
             {duck_md5_long("'shuf' || CAST(doc_id AS STRING)")} AS hkey,
             {duck_md5_long("'shuf' || CAST(doc_id AS STRING)")} % {N_SHARDS} AS shard
      FROM documents),
    positioned AS (
      SELECT shard, n_chars,
             row_number() OVER (PARTITION BY shard ORDER BY hkey, doc_id) AS pos
      FROM sharded)
    SELECT shard, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars,
           max(pos) AS shard_len
    FROM positioned
    GROUP BY shard
    """,
    tags=("corpus", "pipeline", "sort"),
    doc=f"Deterministic global training shuffle + shard assignment: shard = "
    f"seeded md5(doc_id) % {N_SHARDS} is a pure projection (no global "
    "sort), and each shard orders its rows by the same hash — together one "
    "reproducible permutation of the corpus, identical on any cluster "
    "layout and any rerun (df.orderBy(rand()) is neither). The only wide "
    "op is the per-shard window, which parallelizes across shards; in "
    "production N_SHARDS tracks the reader fleet (thousands), so no task "
    "sees more than one shard's rows. Per-shard sizes reported so balance "
    "is auditable (hash striping is binomial-tight at scale).",
)
def corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = tbl(spark, sf_dir, "documents")
    hkey = F.expr(spark_md5_long("'shuf' || CAST(doc_id AS STRING)"))
    sharded = d.select(
        "doc_id", "n_chars", hkey.alias("hkey"), (hkey % N_SHARDS).alias("shard")
    )
    positioned = sharded.withColumn(
        "pos",
        F.row_number().over(W.partitionBy("shard").orderBy("hkey", "doc_id")),
    )
    return positioned.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("n_chars"),
        F.max("pos").alias("shard_len"),
    )


MIN_BIGRAM_CNT = 3


def _bigram_rows(d: DataFrame) -> DataFrame:
    """(doc_id, bigram) occurrence rows, shared by the four bigram entries.

    The token array is materialized ONCE per row in its own projection
    (CollapseProject keeps it: three references to a non-cheap split), and
    adjacent pairs come from zip_with over two slices — a single linear
    pass. The previous indexed-transform form re-evaluated
    split(trim(text)) inside the lambda for EVERY element (element_at over
    a fresh split ⇒ O(tokens²·len) interpreted work per document plus an
    allocation storm): measured at a 10x corpus probe the bare explode went
    1.9-74 s (GC-pressure-sensitive) vs a steady 0.7 s for this form; at
    sf0.1 it is ~2x (0.4-0.6 → 0.25 s). Pair multiset proven identical.
    """
    base = d.select("doc_id", F.expr("split(trim(text), ' ')").alias("tk"))
    zw = (
        "zip_with(slice(tk, 1, size(tk) - 1), slice(tk, 2, size(tk) - 1),"
        " (x, y) -> concat(x, ' ', y))"
    )
    return base.select("doc_id", F.explode(F.expr(zw)).alias("bigram"))


@register(
    "corpus_bigram_counts",
    oracle=f"""
    WITH big AS (
      SELECT doc_id,
             unnest(list_transform(l[1:len(l)-1], (x, i) -> x || ' ' || l[i+1]))
               AS bigram
      FROM (SELECT doc_id, string_split(trim(text), ' ') AS l FROM documents) t
    )
    SELECT bigram, count(*) AS cnt,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM big
    GROUP BY bigram
    HAVING count(*) >= {MIN_BIGRAM_CNT}
    """,
    tags=("corpus", "ngram", "aggregate"),
    doc="Bigram language-model counts: adjacent-token pairs built per-row "
    "with an indexed array transform (no self-join of the token stream — "
    "the positional-join formulation shuffles the exploded corpus TWICE "
    "and dies at scale), then one count aggregate keyed by bigram with "
    "map-side partials. The n-gram count table is the backbone of "
    "KenLM-style LM filtering and of contamination n-gram checks; "
    f"output bounded to bigrams with count >= {MIN_BIGRAM_CNT}.",
)
def corpus_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(tbl(spark, sf_dir, "documents"))
    # two-level aggregate instead of count(DISTINCT doc_id): the distinct
    # rewrite Expands the exploded stream 2x before the shuffle, while the
    # (bigram, doc_id) pre-aggregation shuffles only distinct pairs (with
    # map-side partials) and the second exchange carries one row per bigram
    return (
        _bigram_rows(d)
        .groupBy("bigram", "doc_id")
        .agg(F.count("*").alias("c"))
        .groupBy("bigram")
        .agg(
            F.sum("c").alias("cnt"),
            F.count("*").alias("n_docs"),
        )
        .filter(F.col("cnt") >= MIN_BIGRAM_CNT)
    )


# text_oov_rate's vocabulary is deliberately SMALLER than the corpus's
# distinct-token universe (31 tokens in the synthetic corpus): a vocab that
# swallows every token makes every OOV count zero and the entry would verify
# nothing. 16 keeps roughly half the universe out-of-vocabulary.
OOV_VOCAB_TOP = 16


@register(
    "text_oov_rate",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token
                 FROM documents),
    vocab AS (SELECT token FROM (
        SELECT token, count(*) AS cnt FROM tok
        GROUP BY token ORDER BY cnt DESC, token LIMIT {OOV_VOCAB_TOP}) t)
    SELECT tok.doc_id,
           count(*) AS n_tokens,
           CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           round(CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS oov_rate
    FROM tok LEFT JOIN vocab v ON tok.token = v.token
    GROUP BY tok.doc_id
    """,
    tags=("corpus", "text", "pipeline"),
    doc=f"Out-of-vocabulary rate per document against the corpus's own "
    f"top-{OOV_VOCAB_TOP} vocabulary (deterministic tie-break cnt DESC, "
    "token ASC — same construction as corpus_vocab_topk). The vocab "
    "relation is a fixed row count at any corpus size, so membership is a BROADCAST "
    "left join against the exploded tokens and the per-doc roll-up is one "
    "doc-keyed aggregate; tokenizer-coverage auditing (how much of each "
    "document a fixed vocab explains) is a standard gate before committing "
    "to a tokenizer at scale.",
)
def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split(F.trim("text"), " ")).alias("token"))
    vocab = (
        tok.groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "token")
        .limit(OOV_VOCAB_TOP)
        .select("token", F.lit(1).alias("in_vocab"))
    )
    j = tok.join(F.broadcast(vocab), "token", "left")
    return j.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias("n_oov"),
        F.round(
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).cast("double")
            / F.count("*"),
            6,
        ).alias("oov_rate"),
    )


# ---------------------------------------------------------------------------
# Quality-weighted resampling
# ---------------------------------------------------------------------------

# keep probability (ppm) per quality tier: longer documents are kept at full
# rate, short fragments are aggressively downsampled — the doc-level analog
# of corpus_temperature_mix's source-level rebalancing
QRES_TIERS_SQL = (
    "CASE WHEN n_chars >= 400 THEN 'high' "
    "WHEN n_chars >= 150 THEN 'mid' ELSE 'low' END"
)
QRES_PPM_SQL = (
    "CASE WHEN n_chars >= 400 THEN 1000000 "
    "WHEN n_chars >= 150 THEN 600000 ELSE 200000 END"
)


@register(
    "corpus_quality_resample",
    oracle=f"""
    WITH tiered AS (
      SELECT source, doc_id,
             {QRES_TIERS_SQL} AS tier,
             {QRES_PPM_SQL} AS keep_ppm
      FROM documents)
    SELECT source, tier,
           count(*) AS n_orig,
           CAST(sum(CASE WHEN ({duck_md5_long("'qres' || CAST(doc_id AS VARCHAR)")})
                              % {MIX_DENOM} < keep_ppm
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM tiered
    GROUP BY source, tier
    """,
    tags=("corpus", "sampling", "pipeline"),
    doc="Per-document quality-weighted resampling: each doc's keep "
    "probability is a function of its own quality tier (here a length "
    "proxy; production swaps in a classifier score column), decided by "
    "comparing a seeded md5 fraction of doc_id against the ppm-quantized "
    "tier probability — deterministic, reproducible across engines and "
    "reruns, no rand(). This is the importance-sampling step of a "
    "training mix (upweight high-quality, thin out boilerplate). The "
    "whole decision is a pure per-row projection — zero shuffle before "
    "the small (source × tier) audit aggregate; at 100 TB the kept "
    "subset streams straight into the next stage with its scan "
    "partitioning intact.",
)
def corpus_quality_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    h = spark_md5_long("'qres' || CAST(doc_id AS STRING)")
    tiered = d.select(
        "source",
        "doc_id",
        F.expr(QRES_TIERS_SQL).alias("tier"),
        F.expr(QRES_PPM_SQL).alias("keep_ppm"),
    )
    return tiered.groupBy("source", "tier").agg(
        F.count("*").alias("n_orig"),
        F.sum(
            F.when(F.expr(f"({h}) % {MIX_DENOM}") < F.col("keep_ppm"), 1).otherwise(0)
        ).cast("long").alias("n_kept"),
    )


# ---------------------------------------------------------------------------
# Bigram-LM fluency scoring (deterministic log2-proxy)
# ---------------------------------------------------------------------------


@register(
    "corpus_lm_score_proxy",
    oracle="""
    WITH big AS (
      SELECT doc_id,
             unnest(list_transform(
               toks[1:len(toks) - 1],
               (x, i) -> x || ' ' || toks[i + 1])) AS bigram
      FROM (SELECT doc_id, string_split(trim(text), ' ') AS toks
            FROM documents) t),
    counts AS (SELECT bigram, count(*) AS cnt FROM big GROUP BY bigram)
    SELECT b.doc_id,
           count(*) AS n_bigrams,
           CAST(sum(length(bin(c.cnt))) AS BIGINT) AS fluency_bits,
           round(CAST(sum(length(bin(c.cnt))) AS DOUBLE) / count(*), 6)
             AS avg_bits
    FROM big b JOIN counts c ON b.bigram = c.bigram
    GROUP BY b.doc_id
    """,
    tags=("corpus", "ngram", "pipeline", "scale-pattern"),
    doc="Bigram-LM fluency scoring with a fully deterministic log "
    "stand-in: each document is scored by the corpus-level frequency of "
    "its own bigrams, summing floor(log2(count))+1 per occurrence via "
    "length(bin(count)) — an integer both engines compute bit-identically "
    "where a real log-likelihood would hang on libm ulp agreement. High "
    "avg_bits = built from common word transitions (fluent-looking); low "
    "= rare transitions (gibberish, OCR noise, wrong-language) — the "
    "KenLM-style perplexity filter of a curation pipeline, reduced to its "
    "deterministic skeleton. Plan: one bigram explode (indexed array "
    "transform, no token-stream self-join — see corpus_bigram_counts), "
    "one count aggregate keyed by bigram, one join back on bigram (at "
    "100 TB the count table is vocabulary-bounded and heavy-hitter "
    "bigrams can broadcast), one doc-keyed roll-up.",
)
def corpus_lm_score_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flock_spark.catalog import spread

    # spread: the test-scale corpus is a single-row-group file, so the
    # bigram explode would otherwise run on one core (no-op on a real
    # deployment where the scan already has >= cores splits)
    d = spread(tbl(spark, sf_dir, "documents"))
    big = _bigram_rows(d)
    # pre-aggregate per-doc term frequencies FIRST: raw occurrence rows
    # never shuffle — only distinct (doc, bigram) pairs do (map-side
    # partials), the corpus count table derives from tf with one more tiny
    # exchange, and the join back weights each pair by its in-doc count
    # (sum(c * bits) == summing bits per occurrence, exactly)
    tf = big.groupBy("doc_id", "bigram").agg(F.count("*").alias("c"))
    counts = tf.groupBy("bigram").agg(F.sum("c").alias("cnt"))
    bits = F.length(F.bin(F.col("cnt")))
    return (
        tf.join(counts, "bigram")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            F.sum(F.col("c") * bits).cast("long").alias("fluency_bits"),
            F.round(
                F.sum(F.col("c") * bits).cast("double") / F.sum("c"), 6
            ).alias("avg_bits"),
        )
    )


# ---------------------------------------------------------------------------
# CCNet-style language × fluency-tercile bucketing
# ---------------------------------------------------------------------------


@register(
    "corpus_lang_quality_buckets",
    oracle="""
    WITH big AS (
      SELECT doc_id,
             unnest(list_transform(
               toks[1:len(toks) - 1],
               (x, i) -> x || ' ' || toks[i + 1])) AS bigram
      FROM (SELECT doc_id, string_split(trim(text), ' ') AS toks
            FROM documents) t),
    tf AS (SELECT doc_id, bigram, count(*) AS c FROM big GROUP BY doc_id, bigram),
    counts AS (SELECT bigram, CAST(sum(c) AS BIGINT) AS cnt FROM tf GROUP BY bigram),
    scored AS (
      SELECT tf.doc_id,
             CAST(sum(tf.c * length(bin(counts.cnt))) AS BIGINT) AS fluency_bits,
             CAST(sum(tf.c) AS BIGINT) AS n_bigrams
      FROM tf JOIN counts ON tf.bigram = counts.bigram
      GROUP BY tf.doc_id),
    bucketed AS (
      SELECT d.lang, d.n_chars,
             ntile(3) OVER (PARTITION BY d.lang
                            ORDER BY (s.fluency_bits * 1000000) // s.n_bigrams DESC,
                                     d.doc_id) AS tercile
      FROM documents d JOIN scored s ON d.doc_id = s.doc_id)
    SELECT lang,
           CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                        ELSE 'tail' END AS bucket,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_chars
    FROM bucketed
    GROUP BY lang, bucket
    """,
    tags=("corpus", "pipeline", "window", "scale-pattern"),
    doc="CCNet-style corpus bucketing: within each language, documents "
    "split into head/middle/tail terciles of LM fluency (the "
    "corpus_lm_score_proxy score — integer micro-bits per bigram, so the "
    "ordering is exact; doc_id tiebreak makes ntile deterministic), "
    "reported as per-(lang, bucket) doc and char counts — the standard "
    "shape for choosing which quality slice of each language enters the "
    "training mix. Plan: the fluency scorer's tf-first pipeline (raw "
    "occurrences never shuffle), one lang-keyed ntile window (per-lang "
    "sort; at 100 TB swap ntile for the two-pass percentile-threshold "
    "join — compute per-lang tercile cut points first, then a broadcast "
    "threshold filter — which this operator's audit aggregate makes "
    "directly comparable), and a |langs×3| roll-up.",
)
def corpus_lang_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from flock_spark.catalog import spread

    d = tbl(spark, sf_dir, "documents")
    ds = spread(d)
    big = _bigram_rows(ds)
    tf = big.groupBy("doc_id", "bigram").agg(F.count("*").alias("c"))
    counts = tf.groupBy("bigram").agg(F.sum("c").cast("long").alias("cnt"))
    bits = F.length(F.bin(F.col("cnt")))
    scored = (
        tf.join(counts, "bigram")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("c") * bits).cast("long").alias("fluency_bits"),
            F.sum("c").cast("long").alias("n_bigrams"),
        )
    )
    # integer micro-bits-per-bigram ordering key: true integer division
    # (Spark `div` / DuckDB `//`), never float `/` — IEEE double division
    # happens to round identical int64 inputs identically, but the key
    # should not depend on that, and int64 scaling is overflow-checked:
    # fluency_bits < 9.2e12 holds by construction (sum of c*bits over one
    # doc; corpus docs are << 1e11 weighted bits), so *1e6 stays in int64
    # on both engines (DuckDB would raise, Spark would wrap — neither is
    # reachable).
    key = F.expr("fluency_bits * 1000000L div n_bigrams")
    w = W.partitionBy("lang").orderBy(F.desc(key), "doc_id")
    bucketed = (
        d.select("doc_id", "lang", "n_chars")
        .join(scored, "doc_id")
        .withColumn("tercile", F.ntile(3).over(w))
    )
    bucket = (
        F.when(F.col("tercile") == 1, "head")
        .when(F.col("tercile") == 2, "middle")
        .otherwise("tail")
    )
    return bucketed.groupBy("lang", bucket.alias("bucket")).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_chars"),
    )


# ---------------------------------------------------------------------------
# k-anonymity audit over quasi-identifiers
# ---------------------------------------------------------------------------

KANON_K = 5


@register(
    "privacy_k_anonymity",
    oracle=f"""
    WITH cells AS (
      SELECT lang, source,
             CAST(floor(n_chars / 100) AS BIGINT) AS len_bucket,
             count(*) AS n_docs
      FROM documents
      GROUP BY lang, source, 3)
    SELECT lang, source, len_bucket, n_docs,
           n_docs < {KANON_K} AS at_risk
    FROM cells
    WHERE n_docs < {KANON_K * 4}
    """,
    tags=("corpus", "privacy", "audit", "pipeline"),
    doc=f"k-anonymity audit (k={KANON_K}): documents grouped by their "
    "quasi-identifier cell (lang × source × coarse length bucket); cells "
    "with fewer than k members make their rows re-identifiable by "
    "combining the quasi-identifiers — the privacy check run beside PII "
    "redaction (text_pii_redact) before releasing a corpus, and the "
    "input to suppression/generalization (merge or drop risky cells). "
    "One grouped count with map-side partials; the report is bounded to "
    f"small cells (< {KANON_K * 4} members) so the output stays "
    "audit-sized while the full cell histogram never leaves executors. "
    "At 100 TB the same aggregate is the first step of "
    "generalization-lattice search, which just re-runs it per candidate "
    "bucketing.",
)
def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    cells = d.groupBy(
        "lang",
        "source",
        F.floor(F.col("n_chars") / 100).cast("long").alias("len_bucket"),
    ).agg(F.count("*").alias("n_docs"))
    return cells.filter(F.col("n_docs") < KANON_K * 4).select(
        "lang",
        "source",
        "len_bucket",
        "n_docs",
        (F.col("n_docs") < KANON_K).alias("at_risk"),
    )


# ---------------------------------------------------------------------------
# Filter attrition funnel (Gopher/C4-style rule battery, reported as a funnel)
# ---------------------------------------------------------------------------

# rule order matters: the funnel reports CUMULATIVE survivors, the way a
# production filtering pipeline applies rules
FUNNEL_MIN_TOK, FUNNEL_MAX_TOK = 10, 1000  # rule 1: token-count band
FUNNEL_MIN_WLEN, FUNNEL_MAX_WLEN = 2, 12  # rule 2: mean word length band
FUNNEL_TOPSHARE_PCT = 30  # rule 3: top token <= 30% of tokens
FUNNEL_DISTINCT_PCT = 20  # rule 4: >= 20% distinct tokens


def _funnel_oracle() -> str:
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token
      FROM documents),
    per_tok AS (
      SELECT doc_id, token, count(*) AS c FROM tok GROUP BY doc_id, token),
    stats AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
             CAST(count(*) AS BIGINT) AS n_distinct,
             CAST(max(c) AS BIGINT) AS max_c
      FROM per_tok GROUP BY doc_id),
    flags AS (
      SELECT d.lang, d.n_chars,
             (s.n_tok BETWEEN {FUNNEL_MIN_TOK} AND {FUNNEL_MAX_TOK}) AS p1,
             (CAST(length(replace(trim(d.text), ' ', '')) AS BIGINT)
                BETWEEN {FUNNEL_MIN_WLEN} * s.n_tok
                    AND {FUNNEL_MAX_WLEN} * s.n_tok) AS p2,
             (s.max_c * 100 <= s.n_tok * {FUNNEL_TOPSHARE_PCT}) AS p3,
             (s.n_distinct * 100 >= s.n_tok * {FUNNEL_DISTINCT_PCT}) AS p4
      FROM documents d JOIN stats s ON d.doc_id = s.doc_id)
    SELECT lang,
           count(*) AS n_input,
           CAST(sum(CASE WHEN p1 THEN 1 ELSE 0 END) AS BIGINT) AS after_tokband,
           CAST(sum(CASE WHEN p1 AND p2 THEN 1 ELSE 0 END) AS BIGINT) AS after_wordlen,
           CAST(sum(CASE WHEN p1 AND p2 AND p3 THEN 1 ELSE 0 END) AS BIGINT) AS after_topshare,
           CAST(sum(CASE WHEN p1 AND p2 AND p3 AND p4 THEN 1 ELSE 0 END) AS BIGINT) AS after_distinct,
           CAST(sum(CASE WHEN p1 AND p2 AND p3 AND p4 THEN n_chars ELSE 0 END) AS BIGINT) AS chars_kept
    FROM flags
    GROUP BY lang
    """


@register(
    "corpus_filter_funnel",
    oracle=_funnel_oracle(),
    tags=("corpus", "pipeline", "audit"),
    doc="Filter attrition funnel: the Gopher/C4-style hard-rule battery "
    "(token-count band, mean-word-length band, top-token dominance, "
    "distinct-token floor) applied in pipeline order, reported as "
    "CUMULATIVE survivors per language plus surviving chars — the table "
    "consulted before a 100 TB filtering run to see how much data each "
    "rule removes and whether a rule is mis-calibrated for a language "
    "(complements text_quality_score's per-doc soft score and "
    "corpus_repetition_stats' per-doc ratios). All rule tests are "
    "integer cross-multiplications, never ratio division. Spark plan: "
    "per-doc stats come from higher-order functions over the split "
    "token array (size / array_distinct / one sorted-run fold for the "
    "max count) — a narrow no-shuffle projection — then ONE |langs|-row "
    "aggregate; the oracle replays it with the classic two-level "
    "group-by. At scale the funnel is a free side-output of the actual "
    "filter pass.",
)
def corpus_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    toks = "split(trim(text), ' ')"
    sorted_toks = f"array_sort({toks})"
    max_run = (
        f"aggregate({sorted_toks},"
        f" named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'mx', 0L),"
        f" (acc, t) -> named_struct("
        f"   'prev', t,"
        f"   'run', IF(acc.prev IS NOT NULL AND t = acc.prev, acc.run + 1, 1L),"
        f"   'mx', greatest(acc.mx,"
        f"         IF(acc.prev IS NOT NULL AND t = acc.prev, acc.run + 1, 1L))),"
        f" acc -> acc.mx)"
    )
    base = d.select(
        "lang",
        "n_chars",
        F.expr(f"CAST(size({toks}) AS BIGINT)").alias("n_tok"),
        F.expr(f"CAST(size(array_distinct({toks})) AS BIGINT)").alias("n_distinct"),
        F.expr(max_run).alias("max_c"),
        F.expr("CAST(length(replace(trim(text), ' ', '')) AS BIGINT)").alias(
            "len_nospace"
        ),
    )
    p1 = F.col("n_tok").between(FUNNEL_MIN_TOK, FUNNEL_MAX_TOK)
    p2 = (F.col("len_nospace") >= FUNNEL_MIN_WLEN * F.col("n_tok")) & (
        F.col("len_nospace") <= FUNNEL_MAX_WLEN * F.col("n_tok")
    )
    p3 = F.col("max_c") * 100 <= F.col("n_tok") * FUNNEL_TOPSHARE_PCT
    p4 = F.col("n_distinct") * 100 >= F.col("n_tok") * FUNNEL_DISTINCT_PCT
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    return base.groupBy("lang").agg(
        F.count("*").alias("n_input"),
        cnt(p1).alias("after_tokband"),
        cnt(p1 & p2).alias("after_wordlen"),
        cnt(p1 & p2 & p3).alias("after_topshare"),
        cnt(p1 & p2 & p3 & p4).alias("after_distinct"),
        F.sum(F.when(p1 & p2 & p3 & p4, F.col("n_chars")).otherwise(0))
        .cast("long")
        .alias("chars_kept"),
    )


# ---------------------------------------------------------------------------
# l-diversity audit (companion to k-anonymity)
# ---------------------------------------------------------------------------

LDIV_L = 3  # minimum distinct sensitive values per quasi-identifier cell


@register(
    "privacy_l_diversity",
    oracle=f"""
    WITH cells AS (
      SELECT source,
             CAST(floor(n_chars / 100) AS BIGINT) AS len_bucket,
             count(*) AS n_docs,
             count(DISTINCT lang) AS n_sensitive
      FROM documents
      GROUP BY source, 2)
    SELECT source, len_bucket, n_docs, n_sensitive,
           n_sensitive < {LDIV_L} AS at_risk
    FROM cells
    WHERE n_sensitive < {LDIV_L * 2}
    """,
    tags=("corpus", "privacy", "audit", "pipeline"),
    doc=f"l-diversity audit (l={LDIV_L}): k-anonymity's blind spot is a "
    "cell whose members all share one sensitive value — group size alone "
    "doesn't stop attribute disclosure. Cells are the (source × length "
    "bucket) quasi-identifiers with lang as the sensitive attribute; a "
    f"cell with fewer than {LDIV_L} distinct sensitive values is at "
    "risk even if it passes privacy_k_anonymity's size check. One "
    "grouped count-distinct (the Expand rewrite, map-side partials), "
    f"report bounded to cells below {LDIV_L * 2} distinct values so the "
    "output stays audit-sized. Together the two entries form the "
    "standard release checklist pair.",
)
def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    cells = d.groupBy(
        "source", F.floor(F.col("n_chars") / 100).cast("long").alias("len_bucket")
    ).agg(
        F.count("*").alias("n_docs"),
        F.count_distinct("lang").alias("n_sensitive"),
    )
    return cells.filter(F.col("n_sensitive") < LDIV_L * 2).select(
        "source",
        "len_bucket",
        "n_docs",
        "n_sensitive",
        (F.col("n_sensitive") < LDIV_L).alias("at_risk"),
    )


# ---------------------------------------------------------------------------
# t-closeness audit (completes the k-anonymity / l-diversity / t-closeness
# release-checklist triad)
# ---------------------------------------------------------------------------

TCLOSE_T_PCT = 25  # flag cells whose sensitive-value distribution is more
# than 0.25 total-variation distance away from the global distribution

# Both engines share the literal SQL below: only floor/count/sum/abs/coalesce,
# which are dialect-identical. Integer discipline: the TVD comparison is the
# cross-multiplied form tvd_num * 100 > T * 2 * n_cell * N (never a ratio),
# and the reported tvd double is one exactly-rounded IEEE division of
# identical int64 operands (< 2^53 up to ~3e9 documents — the documented
# precondition; beyond that, pre-divide counts by a common scale).
_TCLOSE_SQL = f"""
    WITH cell_lang AS (
      SELECT source, CAST(floor(n_chars / 100) AS BIGINT) AS len_bucket,
             lang, count(*) AS c
      FROM documents GROUP BY source, 2, lang),
    cells AS (
      SELECT source, len_bucket, CAST(sum(c) AS BIGINT) AS n_docs
      FROM cell_lang GROUP BY source, len_bucket),
    gdist AS (SELECT lang, count(*) AS g FROM documents GROUP BY lang),
    tot AS (SELECT count(*) AS n FROM documents),
    spine AS (
      SELECT ce.source, ce.len_bucket, ce.n_docs, gl.lang, gl.g, t.n
      FROM cells ce CROSS JOIN gdist gl CROSS JOIN tot t),
    diffs AS (
      SELECT s.source, s.len_bucket, s.n_docs, s.n,
             abs(COALESCE(cl.c, 0) * s.n - s.g * s.n_docs) AS d
      FROM spine s LEFT JOIN cell_lang cl
        ON s.source = cl.source AND s.len_bucket = cl.len_bucket
       AND s.lang = cl.lang)
    SELECT source, len_bucket, n_docs,
           CAST(sum(d) AS BIGINT) AS tvd_num,
           round(CAST(sum(d) AS DOUBLE) / (2.0 * n_docs * n), 6) AS tvd,
           CAST(sum(d) AS BIGINT) * 100 > {TCLOSE_T_PCT} * 2 * n_docs * n
             AS at_risk
    FROM diffs
    GROUP BY source, len_bucket, n_docs, n
"""


@register(
    "privacy_t_closeness",
    oracle=_TCLOSE_SQL,
    tags=("corpus", "privacy", "audit", "pipeline"),
    doc=f"t-closeness audit (t={TCLOSE_T_PCT / 100}): the gap k-anonymity "
    "and l-diversity both miss — a cell can be large AND diverse yet still "
    "leak because its sensitive-value DISTRIBUTION is skewed far from the "
    "corpus baseline (e.g. 90% one lang where the corpus is uniform). Per "
    "quasi-identifier cell (source × length bucket), the total-variation "
    "distance between the cell's lang distribution and the global one: "
    "TVD = ½ Σ|p_cell − p_global|, computed as the integer numerator "
    "Σ|c_cell·N − c_global·n_cell| with a cross-multiplied threshold test "
    "— no ratio arithmetic anywhere in the decision. Absent langs matter "
    "(they contribute their full global mass), so the cell×lang spine is "
    "densified by a cross join of AUDIT-SIZED aggregates — never of rows. "
    "The corpus is scanned exactly ONCE: the finest-grain (cell × lang) "
    "histogram is cached, and the cell totals, global lang histogram, and "
    "grand total are all rollups of it (integer partial sums merge "
    "losslessly) — the plan pin asserts the single scan. Every join "
    "operand is KiB-scale at any corpus size. Completes the privacy "
    "release-checklist triad with privacy_k_anonymity and "
    "privacy_l_diversity.",
)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    # finest grain once; every coarser histogram is a rollup of this
    cl = (
        d.groupBy(
            "source",
            F.floor(F.col("n_chars") / 100).cast("long").alias("len_bucket"),
            "lang",
        )
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)  # per-invocation pin, no cross-run cache
    )
    cells = cl.groupBy("source", "len_bucket").agg(
        F.sum("c").cast("long").alias("n_docs")
    )
    gdist = cl.groupBy("lang").agg(F.sum("c").cast("long").alias("g"))
    tot = cl.agg(F.sum("c").cast("long").alias("n"))
    spine = cells.crossJoin(F.broadcast(gdist)).crossJoin(F.broadcast(tot))
    diffs = spine.join(cl, ["source", "len_bucket", "lang"], "left").select(
        "source",
        "len_bucket",
        "n_docs",
        "n",
        F.abs(
            F.coalesce("c", F.lit(0)) * F.col("n") - F.col("g") * F.col("n_docs")
        ).alias("d"),
    )
    return diffs.groupBy("source", "len_bucket", "n_docs", "n").agg(
        F.sum("d").cast("long").alias("tvd_num"),
        F.round(
            F.sum("d").cast("double") / (2.0 * F.col("n_docs") * F.col("n")), 6
        ).alias("tvd"),
        (F.sum("d").cast("long") * 100 > TCLOSE_T_PCT * 2 * F.col("n_docs") * F.col("n")).alias(
            "at_risk"
        ),
    ).drop("n")


# ---------------------------------------------------------------------------
# Cross-document n-gram diversity (corpus-level memorization/diversity audit)
# ---------------------------------------------------------------------------

DIVERSITY_K = 5  # word-gram width; wider than dedup's candidate shingles so
# the metric reads as "how much long phrasing is shared across documents"


@register(
    "corpus_ngram_diversity",
    oracle=f"""
    WITH toks AS (
      SELECT d.doc_id, d.lang, string_split(trim(d.text), ' ') AS t
      FROM documents d),
    grams AS (
      SELECT doc_id, lang,
             unnest([array_to_string(t[i:i+{DIVERSITY_K - 1}], ' ')
                     for i in generate_series(1, len(t) - {DIVERSITY_K - 1})])
               AS gram
      FROM toks WHERE len(t) >= {DIVERSITY_K}),
    per_gram AS (
      SELECT lang, gram,
             CAST(count(*) AS BIGINT) AS occ,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      FROM grams GROUP BY lang, gram)
    SELECT lang,
           CAST(sum(occ) AS BIGINT) AS n_occurrences,
           count(*) AS n_distinct_grams,
           CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared_grams,
           CAST(sum(CASE WHEN df >= 2 THEN occ ELSE 0 END) AS BIGINT)
             AS shared_occurrences
    FROM per_gram
    GROUP BY lang
    """,
    tags=("corpus", "pipeline", "audit", "dedup"),
    doc=f"Cross-document n-gram diversity: per language, how many distinct "
    f"word-{DIVERSITY_K}-grams the corpus contains and what fraction of "
    "them (and of their occurrences) appear in MORE than one document — "
    "the corpus-level diversity/memorization dial that sits between "
    "corpus_repetition_stats (intra-doc repetition) and "
    "dedup_substring_spans (which REMOVES cross-doc spans): a rising "
    "shared-gram share is the early signal that a crawl is re-ingesting "
    "boilerplate and the model will memorize it. Plan: one explode over "
    "indexed array slices (no token-stream self-join), then two grouped "
    "aggregates — (lang, gram) with map-side partials, then the "
    "|langs|-row rollup; the gram relation crosses the shuffle once, as "
    "32-byte-ish strings, and nothing pair-quadratic exists anywhere. At "
    "100 TB the same two-level shape holds; production would additionally "
    "hash grams to int64 (operators/hashing.py) to shrink the exchange, "
    "kept as raw strings here so the oracle reads naturally.",
)
def corpus_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(tbl(spark, sf_dir, "documents"))
    # tk materialized once per row (see _word_shingles_spark note); the
    # size filter moves explicitly below the explode — the same place the
    # optimizer pushed it before, now without re-evaluating the split.
    grams = (
        d.select("doc_id", "lang", F.expr(_TK).alias("tk"))
        .where(F.expr(f"size(tk) >= {DIVERSITY_K}"))
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(tk) - {DIVERSITY_K - 1}),"
                    f" i -> array_join(slice(tk, i, {DIVERSITY_K}), ' '))"
                )
            ).alias("gram"),
        )
    )
    # One keyed repartition up front: the COUNT(DISTINCT doc_id) rewrite
    # otherwise plans TWO full-width exchanges of the gram strings —
    # hash(lang, gram, doc_id) for the distinct level, then hash(lang,
    # gram) for the merge, and with mostly-unique grams the second
    # exchange is as large as the first. hashpartitioning(lang, gram)
    # satisfies the clustered distribution of BOTH aggregation levels, so
    # the gram relation crosses the wire exactly once (plan: 3 Exchange
    # -> 2, only the |langs|-row rollup shuffles after this).
    per_gram = (
        grams.repartition("lang", "gram")
        .groupBy("lang", "gram")
        .agg(
            F.count("*").alias("occ"),
            F.countDistinct("doc_id").cast("long").alias("df"),
        )
    )
    return per_gram.groupBy("lang").agg(
        F.sum("occ").cast("long").alias("n_occurrences"),
        F.count("*").alias("n_distinct_grams"),
        F.sum(F.when(F.col("df") >= 2, 1).otherwise(0))
        .cast("long")
        .alias("n_shared_grams"),
        F.sum(F.when(F.col("df") >= 2, F.col("occ")).otherwise(0))
        .cast("long")
        .alias("shared_occurrences"),
    )


CONTAM_FLAG_BP = 500  # flag docs with >= 5% of their distinct grams in eval


@register(
    "corpus_contamination_overlap",
    oracle=f"""
    WITH sh AS (SELECT doc_id, unnest({_word_shingles_duck()}) AS shingle
                FROM documents),
    eval_sh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 100 = 0),
    train AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 100 <> 0),
    scored AS (
      SELECT t.doc_id,
             CAST(count(*) AS BIGINT) AS n_grams,
             CAST(count(e.shingle) AS BIGINT) AS n_hit
      FROM train t LEFT JOIN eval_sh e ON t.shingle = e.shingle
      GROUP BY t.doc_id)
    SELECT doc_id, n_grams, n_hit,
           (n_hit * 10000) // n_grams AS overlap_bp,
           (n_hit * 10000) >= {CONTAM_FLAG_BP} * n_grams AS flagged
    FROM scored
    """,
    tags=("corpus", "pipeline", "join"),
    doc="GRADED benchmark contamination (vs corpus_decontaminate's binary "
    "any-hit test): per training doc, the fraction of its DISTINCT word-"
    f"{CONTAM_K}-grams that appear in the eval set, in integer basis "
    f"points, flagged at ≥ {CONTAM_FLAG_BP} bp. The graded score is what "
    "real pipelines threshold on (single-shingle hits are mostly common "
    "phrases; wholesale inclusion shows up as a high overlap fraction), "
    "and the LEFT join keeps zero-overlap docs in the output so the "
    "score distribution itself is certified, not just the hits. Same "
    "scale shape as decontaminate: the eval shingle set broadcasts, the "
    "training corpus streams through once, the flag test is integer "
    "cross-multiplication. At 100 TB: one pass, zero corpus shuffles "
    "beyond the per-doc aggregate.",
)
def corpus_contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    # deliberately not cached: the shingle explode is a cheap parallel JVM
    # pass, and a cache registered here outlives the query (bench sessions
    # run every entry 3x — leaked token streams caused 3-4x slowdowns of
    # unrelated queries via eviction churn)
    sh = (
        spread(d)
        .select("doc_id", F.expr(_TK).alias("tk"))
        .select("doc_id", F.explode(F.expr(_word_shingles_spark())).alias("shingle"))
    )
    eval_sh = sh.filter(F.col("doc_id") % 100 == 0).select("shingle").distinct()
    scored = (
        sh.filter(F.col("doc_id") % 100 != 0)
        .join(F.broadcast(eval_sh.withColumn("hit", F.lit(1))), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.count("hit").cast("long").alias("n_hit"),
        )
    )
    out = scored.select(
        "doc_id",
        "n_grams",
        "n_hit",
        F.expr("(n_hit * 10000L) div n_grams").alias("overlap_bp"),
        (F.col("n_hit") * 10000 >= F.lit(CONTAM_FLAG_BP) * F.col("n_grams")).alias(
            "flagged"
        ),
    )
    return out


@register(
    "privacy_dp_histogram",
    oracle=f"""
    WITH cell AS (
      SELECT lang, source, CAST(count(*) AS BIGINT) AS cnt
      FROM documents GROUP BY lang, source)
    SELECT lang, source,
           CAST(greatest(0, cnt +
                {duck_md5_long("concat('dp|', lang, '|', source)")} % 7 - 3)
             AS BIGINT) AS noisy_count
    FROM cell
    """,
    tags=("privacy", "aggregate"),
    doc="Differentially-private-shaped histogram release: per-(lang, source) "
    "counts plus bounded integer noise, clamped at zero — the "
    "sensitivity-1 count + additive noise + post-processing clamp "
    "mechanism, with the noise draw made DETERMINISTIC (seeded md5 per "
    "cell, uniform on [-3, 3]) so the release is reproducible and "
    "cross-engine certifiable. This is explicitly the mechanism's "
    "distributed-execution skeleton, not a privacy guarantee: a real "
    "epsilon-DP release replaces the md5 draw with calibrated Laplace "
    "noise from a secure RNG — a per-cell scalar substitution on the "
    "already-aggregated (tiny) relation, costing nothing at 100 TB. "
    "Pairs with privacy_k_anonymity / l_diversity / t_closeness: those "
    "audit the raw table, this one releases it.",
)
def privacy_dp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    cell = d.groupBy("lang", "source").agg(F.count("*").cast("long").alias("cnt"))
    noise = (
        F.expr(spark_md5_long("concat('dp|', lang, '|', source)")) % 7 - 3
    )
    return cell.select(
        "lang",
        "source",
        F.greatest(F.lit(0).cast("long"), F.col("cnt") + noise)
        .cast("long")
        .alias("noisy_count"),
    )


# ---------------------------------------------------------------------------
# Cross-document n-gram novelty
# ---------------------------------------------------------------------------


@register(
    "corpus_ngram_novelty",
    oracle="""
    WITH big AS (
      SELECT doc_id,
             unnest(list_transform(
               toks[1:len(toks) - 1],
               (x, i) -> x || ' ' || toks[i + 1])) AS bigram
      FROM (SELECT doc_id, string_split(trim(text), ' ') AS toks
            FROM documents) t),
    tf AS (SELECT doc_id, bigram, count(*) AS c FROM big
           GROUP BY doc_id, bigram),
    first_seen AS (
      SELECT bigram, min(doc_id) AS first_doc FROM tf GROUP BY bigram)
    SELECT tf.doc_id,
           CAST(count(*) AS BIGINT) AS n_distinct_bigrams,
           CAST(sum(CASE WHEN f.first_doc = tf.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST((1000000 * sum(CASE WHEN f.first_doc = tf.doc_id
                                    THEN 1 ELSE 0 END)) // count(*)
                AS BIGINT) AS novelty_ppm
    FROM tf JOIN first_seen f ON tf.bigram = f.bigram
    GROUP BY tf.doc_id
    """,
    tags=("corpus", "ngram", "pipeline"),
    doc="Cross-document n-gram novelty: per document, the fraction of its "
    "distinct bigrams whose FIRST corpus occurrence (min doc_id — in "
    "production, min ingest timestamp) is this document — the redundancy "
    "signal a curriculum or incremental-crawl scheduler ranks by "
    "(novelty collapses as a crawl saturates a domain; documents with "
    "novelty ~0 are reformulations of already-held content even when no "
    "dedup rule fires). Same scale shape as the fluency scorer: per-doc "
    "tf pre-aggregation so raw occurrences never shuffle, a "
    "vocabulary-sized min aggregate, one join back on the gram. Exact "
    "integer ppm.",
)
def corpus_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flock_spark.catalog import spread

    d = spread(tbl(spark, sf_dir, "documents"))
    big = _bigram_rows(d)
    tf = big.groupBy("doc_id", "bigram").agg(F.count("*").alias("c"))
    first_seen = tf.groupBy("bigram").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    )
    return (
        tf.join(first_seen, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_distinct_bigrams"),
            novel.cast("long").alias("n_novel"),
            F.expr(
                "(1000000 * sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END))"
                " div count(*)"
            ).alias("novelty_ppm"),
        )
    )


_LENGTH_BAND_SQL = """
WITH cuts AS (
  SELECT lang,
         round({pctile}(n_chars, 0.10), 6) AS p10,
         round({pctile}(n_chars, 0.90), 6) AS p90
  FROM documents GROUP BY lang
)
SELECT d.lang,
       CASE WHEN d.n_chars < c.p10 THEN 'short'
            WHEN d.n_chars > c.p90 THEN 'long'
            ELSE 'mid' END AS band,
       count(*) AS n_docs,
       CAST(sum(d.n_chars) AS BIGINT) AS total_chars
FROM documents d JOIN cuts c ON d.lang = c.lang
GROUP BY 1, 2
"""


@register(
    "corpus_length_band_twopass",
    oracle=_LENGTH_BAND_SQL.format(pctile="quantile_cont"),
    tags=("corpus", "scale-pattern", "aggregate"),
    doc="The two-pass percentile-cut + broadcast-threshold-join pattern as "
    "a first-class certified entry (the 100 TB replacement for global/"
    "per-group NTILE windows — see window_percentiles_twopass and the "
    "corpus_lang_quality_buckets docstring): pass 1 computes per-language "
    "p10/p90 document-length cut points (a |langs|-row aggregate), pass 2 "
    "broadcast-joins the tiny cut table back and classifies every "
    "document with a pure projection — the corpus itself never sorts and "
    "never passes through a single partition. Cut points rounded to 6 on "
    "both engines before the comparison (interpolated-percentile ulp "
    "discipline, as in agg_percentiles).",
)
def corpus_length_band_twopass(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    df = spark.sql(_LENGTH_BAND_SQL.format(pctile="percentile"))
    return df


# ---------------------------------------------------------------------------
# Domain-mixture scheduling: the step between "corpus is clean" and "train on
# it" — decide how much of each source actually enters the token budget.
# ---------------------------------------------------------------------------

_TOKC = "(CAST(length(trim(text)) - length(replace(trim(text), ' ', '')) + 1 AS BIGINT))"

_MIX_SQL = f"""
    WITH src AS (
      SELECT source, CAST(sum({_TOKC}) AS BIGINT) AS src_tokens,
             CAST(count(*) AS BIGINT) AS src_docs
      FROM documents GROUP BY source),
    tot AS (SELECT CAST(sum(src_tokens) AS BIGINT) AS total_tokens,
                   CAST(count(*) AS BIGINT) AS n_sources
            FROM src)
    SELECT s.source, s.src_docs, s.src_tokens, t.total_tokens,
           CAST(least(1000000, floor(t.total_tokens * 1000000.0
                                     / (t.n_sources * s.src_tokens) + 0.5))
                AS BIGINT) AS rate_micro,
           CAST(floor(s.src_tokens
                      * least(1000000, floor(t.total_tokens * 1000000.0
                                             / (t.n_sources * s.src_tokens) + 0.5))
                      / 1000000.0) AS BIGINT) AS effective_tokens
    FROM src s CROSS JOIN tot t
"""


@register(
    "corpus_domain_mix_rates",
    oracle=_MIX_SQL,
    tags=("corpus", "aggregate"),
    doc="Domain-mixture sampling rates: per-source token mass -> the "
    "down-sampling rate that moves the corpus toward a uniform target mix "
    "(rate = target_share * total / source_tokens, capped at 1; the "
    "DoReMi/Pile-style static reweight, arXiv:2305.10429 without the "
    "learned proxy). Rates are exact micro-unit integers (half-away-from-"
    "zero) so the schedule is reproducible across engines and runs. Scale: "
    "one two-phase hash aggregate over the corpus produces a sources-sized "
    "table; the cross join is against a 1-row total. Exactness bound: "
    "total_tokens * 1e6 must stay under 2^53 (~9e15 tokens) — beyond that, "
    "compute rates per shard and merge, same as the OLS re-centering note.",
)
def corpus_domain_mix_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_MIX_SQL)


TOKEN_BUDGET_X = 3  # train-budget multiple of the corpus' total token mass
MAX_EPOCHS = 4  # per-source repeat cap (data-constrained scaling practice)

def _epoch_sql(idiv: str) -> str:
    """Epoch-repeat schedule SQL, parameterized on the engine's INTEGER
    division operator (Spark ``div``, DuckDB ``//``) so the arithmetic is
    genuinely integer end to end — ``floor(a / b)`` would route through
    double division and silently lose exactness past 2^53. All operands are
    nonnegative token counts, so the two engines' integer-division semantics
    (truncate-toward-zero vs floor) coincide."""
    tdiv = f"((t.total_tokens * {TOKEN_BUDGET_X}) {idiv} t.n_sources)"
    ediv = f"(target_tokens {idiv} src_tokens)"
    return f"""
    WITH src AS (
      SELECT source, CAST(sum({_TOKC}) AS BIGINT) AS src_tokens
      FROM documents GROUP BY source),
    tot AS (SELECT CAST(sum(src_tokens) AS BIGINT) AS total_tokens,
                   CAST(count(*) AS BIGINT) AS n_sources
            FROM src),
    alloc AS (
      SELECT s.source, s.src_tokens,
             CAST({tdiv} AS BIGINT) AS target_tokens
      FROM src s CROSS JOIN tot t)
    SELECT source, src_tokens, target_tokens,
           CAST(least({MAX_EPOCHS}, {ediv}) AS BIGINT) AS full_epochs,
           CAST(CASE WHEN {ediv} >= {MAX_EPOCHS}
                     THEN 0
                     ELSE target_tokens % src_tokens END
                AS BIGINT) AS partial_epoch_tokens,
           CAST(least({MAX_EPOCHS}, {ediv}) * src_tokens
                + CASE WHEN {ediv} >= {MAX_EPOCHS}
                       THEN 0
                       ELSE target_tokens % src_tokens END
                AS BIGINT) AS scheduled_tokens
    FROM alloc
"""


@register(
    "corpus_epoch_repeat_schedule",
    oracle=_epoch_sql("//"),
    tags=("corpus", "aggregate"),
    doc=f"Epoch-repeat schedule for a data-constrained budget (Muennighoff "
    f"et al. 2023, arXiv:2305.16264: repeating up to ~4 epochs is near-free): "
    f"each source gets an equal share of a {TOKEN_BUDGET_X}x-corpus token "
    f"budget, served as full epochs capped at {MAX_EPOCHS} plus a partial "
    "epoch remainder — pure integer arithmetic end to end (each engine's "
    "native integer division: Spark `div`, DuckDB `//`, plus modulus; no "
    "floats anywhere), so the schedule is bit-reproducible at any token "
    "mass an int64 holds. Scale: same sources-sized aggregate shape as "
    "corpus_domain_mix_rates; the schedule table drives downstream "
    "per-epoch unions, it never materializes repeated data itself.",
)
def corpus_epoch_repeat_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_epoch_sql("div"))


_CHI2_SQL = """
    WITH b AS (
      SELECT source,
             least(4, CAST(floor(n_chars / 150.0) AS BIGINT)) AS len_bin
      FROM documents),
    o AS (SELECT source, len_bin, CAST(count(*) AS BIGINT) AS observed
          FROM b GROUP BY source, len_bin),
    rt AS (SELECT source, CAST(count(*) AS BIGINT) AS rtot FROM b GROUP BY source),
    ct AS (SELECT len_bin, CAST(count(*) AS BIGINT) AS ctot FROM b GROUP BY len_bin),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b)
    SELECT o.source, o.len_bin, o.observed,
           CAST(floor(rt.rtot * ct.ctot * 1000000.0 / tot.n + 0.5) AS BIGINT)
             AS expected_micro,
           CAST(floor(
                 (CAST(o.observed * tot.n - rt.rtot * ct.ctot AS DOUBLE)
                  * (o.observed * tot.n - rt.rtot * ct.ctot))
                 / (CAST(rt.rtot AS DOUBLE) * ct.ctot * tot.n)
                 * 1000000.0 + 0.5) AS BIGINT)
             AS chi2_contrib_micro
    FROM o JOIN rt USING (source) JOIN ct USING (len_bin) CROSS JOIN tot
"""


@register(
    "corpus_source_drift_chi2",
    oracle=_CHI2_SQL,
    tags=("corpus", "audit", "aggregate"),
    doc="Chi-square homogeneity audit across sources: document-length "
    "distributions binned into 5 fixed bands, each (source, bin) cell's "
    "observed count vs the marginal-product expectation, and the cell's "
    "chi-square contribution in micro-units — the drift test run when a "
    "new crawl snapshot lands (a source whose length profile shifts "
    "inflates its cells' contributions; the per-cell view says WHERE). "
    "Per-cell integer output deliberately avoids any cross-row double "
    "sum, so no accumulation-order hazard exists; the single division "
    "happens in one canonical order on both engines. Scale: one grouped "
    "count over the corpus, then joins among sources x bins sized "
    "aggregates. Exactness bound: observed * total < 2^53 (~9e15), same "
    "family as corpus_domain_mix_rates.",
)
def corpus_source_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_CHI2_SQL)


QUOTA_K = 1000  # total sample slots to apportion across sources


def _quota_sql(idiv: str) -> str:
    """Hamilton / largest-remainder apportionment of QUOTA_K sample slots
    across sources, proportional to document counts. `idiv` is the engine's
    integer-division operator (Spark ``div``, DuckDB ``//``); all operands
    are nonnegative counts, so both engines' semantics coincide and the
    allocation is exact integer arithmetic end to end."""
    return f"""
    WITH cnt AS (
      SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
    tot AS (SELECT sum(n_docs) AS total FROM cnt),
    base AS (
      SELECT c.source, c.n_docs,
             ({QUOTA_K} * c.n_docs) {idiv} t.total AS base_q,
             ({QUOTA_K} * c.n_docs) % t.total AS rem
      FROM cnt c, tot t),
    ranked AS (
      SELECT source, n_docs, base_q, rem,
             row_number() OVER (ORDER BY rem DESC, source) AS rk,
             sum(base_q) OVER () AS sum_base
      FROM base)
    SELECT source,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(base_q + CASE WHEN rk <= {QUOTA_K} - sum_base
                              THEN 1 ELSE 0 END AS BIGINT) AS quota
    FROM ranked
    """


@register(
    "corpus_quota_largest_remainder",
    oracle=_quota_sql("//"),
    tags=("corpus", "sampling", "aggregate"),
    doc=f"Largest-remainder (Hamilton) apportionment: exactly {QUOTA_K} "
    "sample slots split across sources proportional to their document "
    "counts — floor quotas first, then the leftover slots go to the "
    "largest fractional remainders (ties by source name). This is the "
    "exact-quota companion to the probabilistic samplers above: when a "
    "training mix contract says 'exactly K documents, source shares as "
    "close to proportional as integers allow', Bernoulli sampling can't "
    "deliver it and naive rounding mis-totals. Sum of quotas == K by "
    "construction, each quota within 1 of the real-valued share "
    "(Hamilton's defining property). One count aggregate + one "
    "sources-sized window — at 100 TB the windows run over a table the "
    "size of the source list, never the corpus.",
)
def corpus_quota_largest_remainder(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_quota_sql("div"))


# ---------------------------------------------------------------------------
# Deterministic epoch shuffling: the training-loader order audit
# ---------------------------------------------------------------------------

EPOCH_SHUFFLE_SHARDS = 8


def _epoch_shuffle_sql(str_type: str, order_digest: str) -> str:
    """Engine-shared audit of hash-keyed epoch shuffling: for three epochs
    the shuffle key is md5('epoch<e>:' || doc_id); positions come from one
    rank over (key, doc_id); shards are round-robin over positions.
    Emits per epoch the permutation validity, the round-robin shard
    imbalance (must be <= 1 by construction), the total displacement
    versus epoch 0 (0 for epoch 0 itself; large when epochs decorrelate)
    and the md5 of the exact shuffled order."""
    return f"""
    WITH epochs AS (
      SELECT 0 AS epoch UNION ALL SELECT 1 UNION ALL SELECT 2),
    keyed AS (
      SELECT e.epoch, d.doc_id,
             md5(concat('epoch', CAST(e.epoch AS {str_type}), ':',
                        CAST(d.doc_id AS {str_type}))) AS k
      FROM documents d CROSS JOIN epochs e),
    ranked AS (
      SELECT epoch, doc_id,
             row_number() OVER (PARTITION BY epoch ORDER BY k, doc_id)
               AS pos
      FROM keyed),
    sharded AS (
      SELECT epoch, doc_id, pos,
             (pos - 1) % {EPOCH_SHUFFLE_SHARDS} AS shard
      FROM ranked),
    shard_sizes AS (
      SELECT epoch, shard, CAST(count(*) AS BIGINT) AS sz
      FROM sharded GROUP BY epoch, shard),
    balance AS (
      SELECT epoch, CAST(max(sz) - min(sz) AS BIGINT) AS shard_imbalance
      FROM shard_sizes GROUP BY epoch),
    displacement AS (
      SELECT a.epoch,
             CAST(sum(abs(a.pos - b.pos)) AS BIGINT) AS displacement_vs_e0
      FROM sharded a
      JOIN (SELECT doc_id, pos FROM sharded WHERE epoch = 0) b
        ON b.doc_id = a.doc_id
      GROUP BY a.epoch),
    perm AS (
      SELECT epoch,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(CASE WHEN count(DISTINCT pos) = count(*)
                        AND min(pos) = 1 AND max(pos) = count(*)
                       THEN 1 ELSE 0 END AS BIGINT) AS is_permutation,
             md5({order_digest}) AS order_md5
      FROM sharded GROUP BY epoch)
    SELECT p.epoch, p.n_docs, p.is_permutation,
           b.shard_imbalance, d.displacement_vs_e0, p.order_md5
    FROM perm p
    JOIN balance b ON b.epoch = p.epoch
    JOIN displacement d ON d.epoch = p.epoch
    """


_EPOCH_SHUFFLE_SPARK = _epoch_shuffle_sql(
    "STRING",
    "concat_ws('|', array_sort(collect_list(concat("
    "lpad(CAST(pos AS STRING), 9, '0'), ':', CAST(doc_id AS STRING)))))",
)

_EPOCH_SHUFFLE_DUCK = _epoch_shuffle_sql(
    "VARCHAR",
    "string_agg(concat(lpad(CAST(pos AS VARCHAR), 9, '0'), ':', "
    "CAST(doc_id AS VARCHAR)), '|' ORDER BY pos)",
)


@register(
    "corpus_epoch_shuffle_audit",
    oracle=_EPOCH_SHUFFLE_DUCK,
    tags=("corpus", "scale-pattern", "audit", "sql"),
    doc="Deterministic epoch shuffling — the order a training data loader "
    "must reproduce on any cluster layout: each epoch's permutation is "
    "keyed by md5('epoch<e>:' || doc_id) (pure projection, identical on "
    "any partitioning — rand() would not be), positions come from one "
    "rank per epoch, and shards are round-robin over positions so "
    "loader workers stay balanced BY CONSTRUCTION. The audit certifies, "
    "per epoch: the mapping is a true permutation (distinct positions, "
    "min 1, max n), shard imbalance (pinned <= 1), total displacement "
    "versus epoch 0 (0 for epoch 0; ~n^2/3 when epochs genuinely "
    "decorrelate — the test pins > n), and the md5 of the exact "
    "shuffled order. Scale: one hash projection + one keyed rank per "
    "epoch (range-partition the rank at 100 TB), one self-join on "
    "doc_id for displacement — no global collect, no rand(), fully "
    "reproducible across reruns and cluster shapes.",
)
def corpus_epoch_shuffle_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    tbl(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_EPOCH_SHUFFLE_SPARK)
