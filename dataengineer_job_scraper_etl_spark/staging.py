"""Shared fixture-staging protocol for catalog entries that need a
materialized side input (stream queues, sink round-trip outputs).

One implementation of the rules every stager must follow (previously
five near-copies across queries/sinks.py and
queries/streaming_queries.py — a drift hazard flagged in review):

- **Staged once per fixture fingerprint**: keyed by the SOURCE file's
  path, size, and mtime_ns (nanoseconds — second-truncated mtimes
  could silently reuse a stale stage for a same-size fixture
  regenerated within one second), so repeated driver runs reuse and
  regenerated fixtures re-stage.
- **Crash- and race-safe publish**: the build writes into a private
  temp dir, then a single os.rename publishes the complete tree; the
  existence of the final root IS the staged marker, a losing racer's
  rename fails against the winner's complete dir, and the temp copy
  is always removed (also when the build itself raises).
- **Deterministic queue order** (write_ordered_batches): Spark's
  FileStreamSource orders files by MODIFICATION TIME with random
  tie-break — two quick appends can land in one mtime tick and be
  replayed out of order, silently inverting any first-delivery-wins
  contract. Batches are therefore stamped with strictly increasing
  mtimes after each write.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import time
from collections.abc import Callable, Iterable


def stage_once(
    src_path: str, tag: str, build_fn: Callable[[str], None]
) -> str:
    """Build (once) and return a staged directory derived from
    ``src_path``; ``build_fn(staged_dir)`` produces the content."""
    st = os.stat(src_path)
    fp = hashlib.md5(
        f"{tag}:{src_path}:{st.st_size}:{st.st_mtime_ns}".encode()
    ).hexdigest()[:12]
    key = (
        os.path.dirname(src_path).strip("/").replace("/", "_")
    )
    root = os.path.join(
        tempfile.gettempdir(), f"spark_graft_{tag}_{key}_{fp}"
    )
    if os.path.exists(root):
        return root
    tmp = tempfile.mkdtemp(prefix=f"spark_graft_{tag}_stage_")
    staged = os.path.join(tmp, "data")
    try:
        build_fn(staged)
        try:
            os.rename(staged, root)
        except OSError:
            # A concurrent stager winning the race is fine (its dir is
            # complete); any other failure (permissions, cross-device
            # tmp) must surface here, not as an opaque read error later.
            if not os.path.exists(root):
                raise
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return root


def write_ordered_batches(staged: str, frames: Iterable) -> None:
    """Append each frame as one micro-batch file and stamp strictly
    increasing mtimes so FileStreamSource replays them in WRITE order
    regardless of filesystem timestamp granularity."""
    base = time.time() - 3600
    seen: set[str] = set()
    for i, df in enumerate(frames):
        df.coalesce(1).write.mode("append").parquet(staged)
        t = base + i * 10
        for name in os.listdir(staged):
            p = os.path.join(staged, name)
            if p not in seen:
                os.utime(p, (t, t))
                seen.add(p)
