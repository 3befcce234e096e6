"""Staged-fixture management for queries that materialize data once.

Two kinds of staged data exist in the package:

- **Durable fixtures** (`stage_once`): wire-format files, format round
  trips, partitioned layouts, the streamed bid table — written once per
  (name, version) and reused across runs. The version string participates
  in the path, so changing how the content is derived (bump the version, or
  hash the derivation SQL into it) can never silently reuse stale data
  from an older code version while the oracle regenerates fresh.
- **Ephemeral drains** (`ephemeral_dir`): per-run foreachBatch staging
  (runner.stage_batches, the queue sink). The returned DataFrame keeps
  reading the files for the rest of the run, so they cannot be deleted
  inline; they are removed at interpreter exit instead of accumulating
  across sweeps.
"""

from __future__ import annotations

import atexit
import hashlib
import os
import shutil
import tempfile
from collections.abc import Callable

_EPHEMERAL: list[str] = []


def _cleanup_ephemeral() -> None:
    for d in _EPHEMERAL:
        shutil.rmtree(d, ignore_errors=True)


def ephemeral_dir(prefix: str) -> str:
    """mkdtemp whose contents live until process exit, then are removed."""
    d = tempfile.mkdtemp(prefix=prefix)
    if not _EPHEMERAL:
        atexit.register(_cleanup_ephemeral)
    _EPHEMERAL.append(d)
    return d


def stage_once(name: str, version: str, write_fn: Callable[[str], None]) -> str:
    """Materialize a fixture once per (name, version) and return its path.

    ``write_fn(tmp_dir)`` writes the content into a private temp directory,
    which is atomically renamed into place. Concurrent processes may both
    build; the rename loser discards its copy and uses the winner's
    (contents are deterministic by construction). ``version`` MUST change
    whenever the derivation changes — hash the derivation SQL/schema into
    it where possible.
    """
    tag = hashlib.md5(f"{name}:{version}".encode()).hexdigest()[:10]
    safe = name[:40].replace("/", "_").replace(":", "_")
    path = os.path.join(tempfile.gettempdir(), f"flock_spark_fix_{safe}_{tag}")
    if os.path.exists(path):
        return path
    tmp = tempfile.mkdtemp(prefix=f"{path}.build_")
    try:
        write_fn(tmp)
        try:
            os.replace(tmp, path)
        except OSError:
            # lost the build race — the winner's copy is equivalent
            shutil.rmtree(tmp, ignore_errors=True)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return path
