"""Structured Streaming layer.

Replaces the reference's entire Lambda streaming runtime — window drivers
(flock-function/src/aws/window/), payload shipping (runtime/payload.rs),
window-reassembly arena (runtime/arena/mod.rs) and consistent-hash routing
(cloud_context.rs:117-167) — with Spark Structured Streaming: micro-batches
≈ Flock epochs, shuffle ≈ payload fan-out, state store ≈ arena, watermarks
added on top (the reference has none — SURVEY §2.9).
"""

import flock_spark.streaming.queries  # noqa: F401  (registers streaming queries)
from flock_spark.streaming.runner import run_to_memory, run_foreach_batch  # noqa: F401
from flock_spark.streaming.source import bounded_stream, rate_events  # noqa: F401
