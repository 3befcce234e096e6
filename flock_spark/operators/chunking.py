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
from pyspark.sql import functions as F

from flock_spark.catalog import tbl
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
