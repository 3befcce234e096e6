"""Training-data sequence operators: chunking, packing, PII redaction.

Beyond the reference's surface (SURVEY §2 extensions): the operators a
training-data pipeline runs between curation and tokenization —

- doc_chunk_fixed_tokens: split each document into fixed-size token windows
  with overlap (the long-document → context-window preprocessing step);
- corpus_pack_sequences: concatenate documents shard-by-shard and split at
  context-length boundaries (GPT-style document packing), emitting each
  doc's (bin, offset) placement;
- text_pii_redact: regex scrub of emails/phone numbers with a redaction
  count per doc (the corpus has no natural PII, so deterministic PII is
  injected first — the scrub path is exercised for real and the counts are
  verifiable).

All three are pure JVM expression pipelines (higher-order functions +
regexp), no Python, no shuffle except packing's per-shard window. Chunking
explodes at most ceil(n_tokens/step) rows per doc — output size tracks
corpus token count, the same as the downstream tokenizer's input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from flock_spark.catalog import spread, tbl
from flock_spark.registry import register

CHUNK_TOKENS = 32
CHUNK_OVERLAP = 8
CHUNK_STEP = CHUNK_TOKENS - CHUNK_OVERLAP

CTX_LEN = 256  # packing context length (tokens)

_TOKS_SPARK = "filter(split(text, ' '), t -> t <> '')"
_TOKS_DUCK = "list_filter(string_split(text, ' '), t -> t <> '')"

# windows = ceil(max(n - overlap, 1) / step): covers every token, last
# window ragged; a doc shorter than one window still yields one chunk
_NCHUNKS = (
    f"greatest(CAST(1 AS BIGINT), CAST(ceil((size - {CHUNK_OVERLAP}) / {CHUNK_STEP}.0) AS BIGINT))"
)


@register(
    "doc_chunk_fixed_tokens",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_DUCK} AS t, len({_TOKS_DUCK}) AS size
      FROM documents),
    idx AS (
      SELECT doc_id, t, size,
             unnest(generate_series(0, {_NCHUNKS} - 1)) AS chunk_idx
      FROM toks)
    SELECT doc_id, chunk_idx,
           CAST(len(list_slice(t, chunk_idx * {CHUNK_STEP} + 1,
                               chunk_idx * {CHUNK_STEP} + {CHUNK_TOKENS})) AS BIGINT) AS chunk_tokens,
           array_to_string(list_slice(t, chunk_idx * {CHUNK_STEP} + 1,
                                      chunk_idx * {CHUNK_STEP} + {CHUNK_TOKENS}), ' ') AS chunk_text
    FROM idx
    """,
    tags=("corpus", "chunking"),
    doc=f"Fixed-token-window chunking: {CHUNK_TOKENS}-token chunks, "
    f"{CHUNK_OVERLAP}-token overlap (stride {CHUNK_STEP}). Token array built "
    "once per row (HOF, no UDF), then one explode over the window indices — "
    "output rows ≈ corpus_tokens/stride, the tokenizer's input size. "
    "Narrow pipeline: no shuffle at any corpus size.",
)
def doc_chunk_fixed_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.expr(_TOKS_SPARK).alias("t"),
        F.expr(f"size({_TOKS_SPARK})").alias("size"),
    )
    idx = toks.select(
        "doc_id",
        "t",
        F.explode(F.expr(f"sequence(CAST(0 AS BIGINT), {_NCHUNKS} - 1)")).alias("chunk_idx"),
    )
    sl = f"slice(t, CAST(chunk_idx * {CHUNK_STEP} + 1 AS INT), {CHUNK_TOKENS})"
    return idx.select(
        "doc_id",
        "chunk_idx",
        F.expr(f"CAST(size({sl}) AS BIGINT)").alias("chunk_tokens"),
        F.expr(f"array_join({sl}, ' ')").alias("chunk_text"),
    )


@register(
    "corpus_pack_sequences",
    oracle=f"""
    WITH counted AS (
      SELECT source, doc_id,
             CAST(len({_TOKS_DUCK}) AS BIGINT) AS n_tokens
      FROM documents),
    cum AS (
      SELECT source, doc_id, n_tokens,
             coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS cum_before
      FROM counted)
    SELECT source, doc_id, n_tokens,
           CAST(floor(cum_before / {CTX_LEN}) AS BIGINT) AS bin_id,
           CAST(cum_before % {CTX_LEN} AS BIGINT) AS bin_offset
    FROM cum
    """,
    tags=("corpus", "packing", "window"),
    doc=f"Sequence packing to a {CTX_LEN}-token context: documents "
    "concatenate in doc_id order within each source shard and split at "
    "context boundaries (GPT-style packing); each doc's placement is "
    "(bin_id, bin_offset) from a per-shard running token count. The window "
    "partitions by source — shards pack in parallel, no global ordering; at "
    "100 TB the shard key is the file/partition id and the same plan holds.",
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = tbl(spark, sf_dir, "documents")
    counted = d.select(
        "source",
        "doc_id",
        F.expr(f"CAST(size({_TOKS_SPARK}) AS BIGINT)").alias("n_tokens"),
    )
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cum = counted.withColumn(
        "cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    return cum.select(
        "source",
        "doc_id",
        "n_tokens",
        F.expr(f"CAST(floor(cum_before / {CTX_LEN}) AS BIGINT)").alias("bin_id"),
        (F.col("cum_before") % CTX_LEN).alias("bin_offset"),
    )


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\b555-[0-9]{4}\b"
# Spark SQL string literals consume backslash escapes ('\b' → backspace);
# DuckDB's don't — double them for the Spark-side SQL only.
_EMAIL_RE_S = _EMAIL_RE.replace("\\", "\\\\")
_PHONE_RE_S = _PHONE_RE.replace("\\", "\\\\")


@register(
    "text_pii_redact",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail-'
                  || source || '.example ph 555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS augmented
      FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(augmented, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(augmented, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
           md5(regexp_replace(regexp_replace(augmented, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_fp
    FROM aug
    """,
    tags=("text", "pii"),
    doc="PII redaction: email + phone regex scrub with per-doc match counts "
    "and a fingerprint of the redacted text (both engines agree on the "
    "Java-regex/RE2-compatible pattern subset used). Deterministic PII is "
    "injected per doc first, so the scrub is exercised on every row. Pure "
    "JVM regexp pipeline — one narrow pass at any corpus size.",
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = tbl(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.expr(
            "text || ' contact user' || CAST(doc_id AS STRING) || '@mail-'"
            " || source || '.example ph 555-'"
            " || lpad(CAST(doc_id % 10000 AS STRING), 4, '0')"
        ).alias("augmented"),
    )
    return aug.select(
        "doc_id",
        F.expr(f"CAST(size(regexp_extract_all(augmented, '{_EMAIL_RE_S}', 0)) AS BIGINT)").alias(
            "n_emails"
        ),
        F.expr(f"CAST(size(regexp_extract_all(augmented, '{_PHONE_RE_S}', 0)) AS BIGINT)").alias(
            "n_phones"
        ),
        F.md5(
            F.expr(
                f"CAST(regexp_replace(regexp_replace(augmented, '{_EMAIL_RE_S}', '<EMAIL>'),"
                f" '{_PHONE_RE_S}', '<PHONE>') AS BINARY)"
            )
        ).alias("redacted_fp"),
    )


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC) + chunk-level shared-content candidates
# ---------------------------------------------------------------------------

CDC_GRAM = 4  # rolling-window width (tokens) the boundary test hashes
CDC_MOD = 8  # boundary when gram_hash % CDC_MOD == 0 → E[chunk] ≈ 8 tokens
CDC_MIN_SHARED_TOKENS = 6  # chunks shorter than this don't vote for pairs
CDC_DF_CAP = 25  # stop-chunk removal: drop chunks appearing in > cap docs

# Both engines hash the SAME gram text (md5-based 60-bit int, see
# operators/hashing.py), so boundaries land on identical token positions.
# Parameterized builders: the registered entries use (CDC_GRAM, CDC_MOD);
# the randomized differential in tests/test_differential.py sweeps others.


def _cdc_duck_sql(gram: int = CDC_GRAM, mod: int = CDC_MOD) -> str:
    return f"""
    toks AS (
      SELECT doc_id, {_TOKS_DUCK} AS t, len({_TOKS_DUCK}) AS n
      FROM documents WHERE text IS NOT NULL),
    pos AS (
      SELECT doc_id, t, n, unnest(generate_series(1, n)) AS p
      FROM toks WHERE n > 0),
    ends AS (
      SELECT doc_id, t, n, p
      FROM pos
      WHERE p = n
         OR (p >= {gram}
             AND (('0x' || substring(md5(array_to_string(
                    list_slice(t, p - {gram} + 1, p), ' ')), 1, 15))::BIGINT)
                 % {mod} = 0)),
    spans AS (
      SELECT doc_id, n, p AS chunk_end,
             COALESCE(lag(p) OVER (PARTITION BY doc_id ORDER BY p), 0) + 1
               AS chunk_start,
             CAST(row_number() OVER (PARTITION BY doc_id ORDER BY p) - 1
               AS BIGINT) AS chunk_id,
             t
      FROM ends),
    chunks AS (
      SELECT doc_id, chunk_id,
             CAST(chunk_end - chunk_start + 1 AS BIGINT) AS chunk_tokens,
             (('0x' || substring(md5(array_to_string(
                list_slice(t, chunk_start, chunk_end), ' ')), 1, 15))::BIGINT)
               AS chunk_hash
      FROM spans)
"""


_CDC_DUCK = _cdc_duck_sql()


def _cdc_chunks(
    spark: SparkSession, sf_dir: str, gram: int = CDC_GRAM, mod: int = CDC_MOD
) -> DataFrame:
    """Chunk relation (doc_id, chunk_id, chunk_tokens, chunk_hash) shared by
    the CDC entries. One scan → explode positions → per-doc window for span
    starts → join the token arrays back on doc_id for the chunk hash.

    Only SKINNY (doc_id, p) rows cross the window's exchange: the previous
    form carried the full token array through the shuffle once per boundary
    — n/8 copies of an n-token array, i.e. O(n²/8) shuffle bytes per doc,
    quadratic in document length. Re-attaching t with a doc_id equi-join
    moves each array exactly once, and both md5 passes (gram boundary test,
    chunk hash) stay whole-stage-codegen expressions — a pure-HOF form with
    md5 inside filter()/transform() lambdas measured ~2.2x slower because
    lambda bodies are interpreted per element. spread() parallelizes the
    boundary-hash pass at test scale (single-row-group input); it no-ops on
    real multi-split scans."""
    d = tbl(spark, sf_dir, "documents")
    toks = d.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.expr(_TOKS_SPARK).alias("t"),
        F.expr(f"size({_TOKS_SPARK})").alias("n"),
    )
    pos = spread(toks.filter(F.col("n") > 0)).select(
        "doc_id", "t", "n", F.explode(F.expr("sequence(1, n)")).alias("p")
    )
    gram_hash = F.expr(
        "CAST(conv(substring(md5(array_join("
        f"slice(t, p - {gram} + 1, {gram}), ' ')), 1, 15), 16, 10) AS BIGINT)"
    )
    ends = pos.filter(
        (F.col("p") == F.col("n"))
        | ((F.col("p") >= gram) & (gram_hash % mod == 0))
    ).select("doc_id", "p")
    w = W.partitionBy("doc_id").orderBy("p")
    spans = ends.select(
        "doc_id",
        F.col("p").alias("chunk_end"),
        (F.coalesce(F.lag("p").over(w), F.lit(0)) + 1).alias("chunk_start"),
        (F.row_number().over(w) - 1).cast("long").alias("chunk_id"),
    )
    return spans.join(toks.select("doc_id", "t"), "doc_id").select(
        "doc_id",
        "chunk_id",
        (F.col("chunk_end") - F.col("chunk_start") + 1).cast("long").alias("chunk_tokens"),
        F.expr(
            "CAST(conv(substring(md5(array_join("
            "slice(t, chunk_start, chunk_end - chunk_start + 1), ' ')), 1, 15), 16, 10) AS BIGINT)"
        ).alias("chunk_hash"),
    )


@register(
    "doc_chunk_content_defined",
    oracle=f"""
    WITH {_CDC_DUCK}
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(min(chunk_tokens) AS BIGINT) AS min_tokens,
           CAST(max(chunk_tokens) AS BIGINT) AS max_tokens,
           CAST(sum(chunk_tokens) AS BIGINT) AS total_tokens,
           CAST(count(DISTINCT chunk_hash) AS BIGINT) AS distinct_chunks
    FROM chunks
    GROUP BY doc_id
    """,
    tags=("corpus", "chunking", "dedup", "scale-pattern"),
    doc="Content-defined chunking (rolling-hash boundaries, the "
    f"rsync/LBFS/FastCDC family): a boundary closes a chunk wherever the "
    f"hash of the trailing {CDC_GRAM}-token gram ≡ 0 (mod {CDC_MOD}), so "
    "chunk edges depend on CONTENT, not offsets — insert a sentence and "
    "only the chunks touching the edit change, where fixed-window "
    "chunking (doc_chunk_fixed_tokens) shifts every downstream chunk. "
    "That shift-resistance is why dedup at 100 TB chunk-level runs on CDC "
    "chunks. One corpus scan → per-position explode (output ≈ token "
    "count) → one doc_id-keyed window; the boundary hash is the engine-"
    "portable md5 primitive, so both engines cut identical chunks. "
    "Production note: FastCDC adds min/max chunk clamps and a gear table; "
    "the clamps change WHICH boundaries are kept, not the plan shape.",
)
def doc_chunk_content_defined(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _cdc_chunks(spark, sf_dir)
    return c.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.min("chunk_tokens").alias("min_tokens"),
        F.max("chunk_tokens").alias("max_tokens"),
        F.sum("chunk_tokens").cast("long").alias("total_tokens"),
        F.countDistinct("chunk_hash").cast("long").alias("distinct_chunks"),
    )


@register(
    "dedup_chunk_shared",
    oracle=f"""
    WITH {_CDC_DUCK},
    eligible AS (
      SELECT DISTINCT doc_id, chunk_hash, chunk_tokens
      FROM chunks WHERE chunk_tokens >= {CDC_MIN_SHARED_TOKENS}),
    df AS (
      SELECT chunk_hash FROM eligible
      GROUP BY chunk_hash
      HAVING count(*) BETWEEN 2 AND {CDC_DF_CAP})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(count(*) AS BIGINT) AS shared_chunks,
           CAST(sum(a.chunk_tokens) AS BIGINT) AS shared_tokens
    FROM eligible a
    JOIN df USING (chunk_hash)
    JOIN eligible b ON a.chunk_hash = b.chunk_hash AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    """,
    tags=("dedup", "chunking", "join", "scale-pattern"),
    doc="Chunk-level shared-content candidates: two docs are containment/"
    "near-dup candidates when they share ≥1 identical CDC chunk — an "
    "EQUI-self-join on chunk_hash, never a pairwise document comparison "
    "(this is the scalable candidate generator whose exact quadratic "
    f"audit is dedup_containment_pairs). Chunks shorter than "
    f"{CDC_MIN_SHARED_TOKENS} tokens don't vote (too easy to collide by "
    f"chance) and chunks appearing in > {CDC_DF_CAP} docs are dropped "
    "before the join (stop-chunk removal — boilerplate headers would "
    "otherwise create a hot key whose candidate set is quadratic in its "
    "document frequency; the df filter bounds every hash's fan-out at "
    "cap², the same discipline as LSH band-bucket caps). At 100 TB the "
    "shuffle carries (doc_id, 8-byte chunk_hash) pairs — a fraction of "
    "corpus bytes — and skew is pre-capped by construction.",
)
def dedup_chunk_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _cdc_chunks(spark, sf_dir)
    # eligible feeds THREE consumers (the df table and both self-join
    # sides); without a pin each consumer re-derives the whole chunk
    # relation (3 corpus scans, 3 md5 passes over every gram). One
    # distributed materialization of the bounded (doc_id, chunk_hash,
    # chunk_tokens) relation — ≈ corpus_tokens/8 rows of three fixed-width
    # columns, never collected to the driver.
    eligible = (
        c.filter(F.col("chunk_tokens") >= CDC_MIN_SHARED_TOKENS)
        .select("doc_id", "chunk_hash", "chunk_tokens")
        .distinct()
        .localCheckpoint(eager=True)
    )
    df_ok = (
        eligible.groupBy("chunk_hash")
        .agg(F.count("*").alias("df"))
        .filter((F.col("df") >= 2) & (F.col("df") <= CDC_DF_CAP))
        .select("chunk_hash")
    )
    a = eligible.join(df_ok, "chunk_hash").alias("a")
    b = eligible.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk_hash") == F.col("b.chunk_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(
            F.count("*").alias("shared_chunks"),
            F.sum(F.col("a.chunk_tokens")).cast("long").alias("shared_tokens"),
        )
    )
