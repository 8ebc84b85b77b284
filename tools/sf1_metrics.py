"""sf1 evidence runner WITH resource metrics (VERDICT r8 asks #4+#7).

Same oracle-differential check as tools/check.py, but per entry it
also captures, from the Spark UI REST API (local[32] single-JVM — the
"executor" is the driver process, which is exactly the single-node
envelope BASELINE.md bounds):

- shuffle_write_bytes / shuffle_read_bytes, memory/disk spill, summed
  over the stages THIS entry ran (stage-id watermark delta),
- JVM heap evidence (ADVICE r9 #3 — the metric is an APP-LIFETIME
  high-water mark, so a single per-entry reading inherits whatever the
  hungriest earlier entry peaked at): ``app_peak_jvm_heap_bytes`` is
  honestly labeled as the cumulative app peak AT THE TIME this entry
  finished, and ``peak_heap_raised_bytes`` is how much THIS entry
  raised that high-water mark (0 = it ran under an earlier entry's
  peak — an upper-bound witness, not this entry's own footprint),
- for streaming entries, the drained query's stateOperators rows/
  memory (streaming.jobs.LAST_PROGRESS).

Green entries are recorded into SF1_EVIDENCE.json as extended rows:
{"round": N, "sec": wall, "shuffle_write_bytes": ..., ...} — the
numbers the 100 TB extrapolation needs next to the plan shapes.

Usage:
  python tools/sf1_metrics.py <round> <sf_dir> <entry> [entry ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from check import TABLES, frame_fingerprint  # noqa: E402

LEDGER = os.path.join(REPO, "SF1_EVIDENCE.json")


def _stages(spark) -> list[dict]:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages") as r:
        return json.load(r)


def _peak_heap(spark) -> int:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/executors"
    ) as r:
        execs = json.load(r)
    return max(
        (e.get("peakMemoryMetrics", {}).get("JVMHeapMemory", 0) for e in execs),
        default=0,
    )


def main() -> int:
    rnd = int(sys.argv[1])
    sf_dir = sys.argv[2]
    entries = sys.argv[3:]

    import duckdb

    import __spark_entry__ as ent
    from dataengineer_job_scraper_etl_spark.session import get_spark
    from dataengineer_job_scraper_etl_spark.streaming import jobs as sjobs

    spark = get_spark("sf1-metrics")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = ent.queries()
    oracles = ent.oracle_sql()

    with open(LEDGER, encoding="utf-8") as f:
        ledger = {
            k: (v if isinstance(v, dict) else {"round": v})
            for k, v in json.load(f).items()
        }

    failures = []
    for name in entries:
        fn = qs[name]
        seen = {s["stageId"] for s in _stages(spark)}
        heap_before = _peak_heap(spark)
        sjobs.LAST_PROGRESS = None
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: SPARK ERROR {type(e).__name__}: {e}")
            continue
        sec = round(time.time() - t0, 1)
        new = [s for s in _stages(spark) if s["stageId"] not in seen]
        metrics = {
            "sec": sec,
            "shuffle_write_bytes": sum(
                s.get("shuffleWriteBytes", 0) for s in new
            ),
            "shuffle_read_bytes": sum(
                s.get("shuffleReadBytes", 0) for s in new
            ),
            "memory_bytes_spilled": sum(
                s.get("memoryBytesSpilled", 0) for s in new
            ),
            "disk_bytes_spilled": sum(
                s.get("diskBytesSpilled", 0) for s in new
            ),
            "app_peak_jvm_heap_bytes": _peak_heap(spark),
            "n_stages": len(new),
        }
        metrics["peak_heap_raised_bytes"] = max(
            0, metrics["app_peak_jvm_heap_bytes"] - heap_before
        )
        lp = sjobs.LAST_PROGRESS
        if lp and lp.get("stateOperators"):
            metrics["state_operators"] = [
                {
                    "numRowsTotal": so.get("numRowsTotal"),
                    "memoryUsedBytes": so.get("memoryUsedBytes"),
                }
                for so in lp["stateOperators"]
            ]
        spark_fp = frame_fingerprint(scols, srows)
        t1 = time.time()
        cur = con.execute(oracles[name])
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
        oracle_fp = frame_fingerprint(ocols, orows)
        osec = round(time.time() - t1, 1)
        if spark_fp != oracle_fp:
            failures.append(name)
            print(
                f"FAIL  {name}: spark={spark_fp} oracle={oracle_fp} "
                f"[{sec}s / oracle {osec}s]"
            )
            continue
        row = ledger.get(name, {})
        row.pop("peak_jvm_heap_bytes", None)  # superseded, mislabeled
        row.update({"round": max(rnd, row.get("round", 0)), **metrics})
        ledger[name] = row
        print(
            f"ok    {name}: {spark_fp[0]} rows [{sec}s / oracle {osec}s] "
            f"shW={metrics['shuffle_write_bytes']:,} "
            f"shR={metrics['shuffle_read_bytes']:,} "
            f"spill={metrics['memory_bytes_spilled']:,}/"
            f"{metrics['disk_bytes_spilled']:,} "
            f"appPeakHeap={metrics['app_peak_jvm_heap_bytes']:,} "
            f"(+{metrics['peak_heap_raised_bytes']:,})"
            + (
                f" state={metrics['state_operators']}"
                if "state_operators" in metrics
                else ""
            )
        )
        with open(LEDGER, "w", encoding="utf-8") as f:
            json.dump(dict(sorted(ledger.items())), f, indent=1)
            f.write("\n")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
