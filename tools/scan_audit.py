"""Catalog-wide duplicate-scan audit — the recompute-fanout detector
(round-13 session 2; PLANS.md has the findings that motivated it).

A DataFrame that feeds N consumers without materialization re-runs
its whole upstream chain once per consumer. At fixture scale this is
invisible in wall time; at 100 TB each re-run is a full corpus pass.
The cheap mechanical witness is the visible physical plan's parquet
scan count: `docs_incremental_ingest` carried THIRTY-SEVEN documents
scans (28 corpus-side) before its posting/kept checkpoints.

For every non-streaming catalog entry this prints the per-table
`Scan parquet` counts of the executed plan at the given sf_dir,
sorted by the worst single-table count, and flags entries at or
above --flag (default 5). High counts are a SIGNAL, not a verdict:
re-scanning a column-pruned, filter-pushed slice is often cheaper
than materializing (docs_erasure_propagation's 11 pruned passes are
by design); checkpointed entries under-report (their internal scans
hide behind the materialization). Adjudicate by reading the entry —
tests/test_scale_plans.py::test_shared_frames_are_materialized_not_
recomputed pins the fixed entries' post-fix maxima.

Noise note: stderr may carry "ERROR DAGScheduler: ... non-existent
accumulator" stacks — a local-mode metrics-reporting race (a lazy
localCheckpoint job finishing after its originating query's SQL
metric accumulators were unregistered; the diagnostic loop plans
hundreds of entries back to back, which makes the window easy to
hit). Task results are unaffected — do not chase it as a failure.

Usage: python tools/scan_audit.py [sf_dir] [--flag N]
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    flag = 5
    for a in sys.argv[1:]:
        if a.startswith("--flag"):
            flag = int(a.split("=", 1)[1] if "=" in a else sys.argv[
                sys.argv.index(a) + 1
            ])

    from pyspark.sql import SparkSession

    from dataengineer_job_scraper_etl_spark.catalog import all_queries

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    rows = []
    for name, q in sorted(all_queries().items()):
        if name.startswith("streaming_"):
            continue  # building these executes a stream
        try:
            plan = (
                q.spark_fn(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as exc:  # noqa: BLE001 — diagnostic tool
            rows.append((10**9, name, f"PLAN ERROR {type(exc).__name__}"))
            continue
        scans = Counter(
            re.findall(r"Scan parquet[^\n]*?(\w+)\.parquet", plan)
        )
        mx = max(scans.values()) if scans else 0
        rows.append((mx, name, dict(scans)))
    rows.sort(key=lambda r: (-r[0], r[1]))
    n_flagged = 0
    for mx, name, scans in rows:
        if mx >= flag or mx == 10**9:
            n_flagged += 1
            print(f"FLAG {mx if mx < 10**9 else '!':>4}  {name:45s} {scans}")
    for mx, name, scans in rows[:10]:
        if mx < flag:
            print(f"     {mx:>4}  {name:45s} {scans}")
    print(f"{n_flagged} flagged at >= {flag} (of {len(rows)} planned)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
