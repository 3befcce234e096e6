"""LLM-data-pipeline operators: dedup, similarity search, text analysis,
as-of joins, multimodal column plumbing. Importing registers their queries."""

import flock_spark.operators.dedup  # noqa: F401
import flock_spark.operators.similarity  # noqa: F401
import flock_spark.operators.text  # noqa: F401
import flock_spark.operators.asof  # noqa: F401
import flock_spark.operators.multimodal  # noqa: F401
import flock_spark.operators.corpus  # noqa: F401
import flock_spark.operators.chunking  # noqa: F401
import flock_spark.operators.recsys  # noqa: F401
import flock_spark.operators.incremental  # noqa: F401
import flock_spark.operators.sketches  # noqa: F401
import flock_spark.operators.graph  # noqa: F401
import flock_spark.operators.geo  # noqa: F401
import flock_spark.operators.formats  # noqa: F401
import flock_spark.operators.zstd_codec  # noqa: F401
import flock_spark.operators.arrow_ipc  # noqa: F401
import flock_spark.operators.orc_format  # noqa: F401
import flock_spark.operators.avro_format  # noqa: F401
import flock_spark.operators.lzma_codec  # noqa: F401
import flock_spark.operators.parquet_writer  # noqa: F401
import flock_spark.operators.orc_writer  # noqa: F401
import flock_spark.operators.charset  # noqa: F401
