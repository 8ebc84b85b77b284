"""Per-entry phase profiler (optimization rounds, guide §1).

Runs named catalog entries with the noop sink (bench methodology,
minus warmup variance: rep1 is reported separately as the cold rep)
and then attributes wall time to Spark JOBS via the live UI's REST API
(http://localhost:4040/api/v1) — job duration, description, stage
count — so an entry's cost can be split into its sequential actions
(checkpoint materializations, collects, micro-batches, the final noop
force) without guessing.

Usage: python tools/profile_entry.py <entry> [entry ...] [--reps N]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _api(path: str):
    url = f"http://localhost:4040/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from dataengineer_job_scraper_etl_spark.catalog import all_queries
    from dataengineer_job_scraper_etl_spark.session import get_spark

    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    app_id = spark.sparkContext.applicationId

    # minimal warmup: tables + python workers + streaming engine
    from dataengineer_job_scraper_etl_spark.io import TABLE_NAMES

    for t in TABLE_NAMES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").write.format(
            "noop"
        ).mode("overwrite").save()
    warm = spark.range(64).repartition(32)
    warm.mapInPandas(lambda it: it, "id long").count()

    for name in args:
        fn = qs[name].spark_fn
        times = []
        for rep in range(reps):
            jobs_before = {j["jobId"] for j in _api(f"applications/{app_id}/jobs")}
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            t_build = time.time() - t0
            df.write.format("noop").mode("overwrite").save()
            t_total = time.time() - t0
            spark.sparkContext.setJobDescription(None)
            times.append(t_total)
            jobs = [
                j
                for j in _api(f"applications/{app_id}/jobs")
                if j["jobId"] not in jobs_before
            ]
            jobs.sort(key=lambda j: j["jobId"])
            if rep == reps - 1:  # print job breakdown for the warm rep
                print(f"\n== {name}: rep{rep} build={t_build:.2f}s "
                      f"total={t_total:.2f}s ({len(jobs)} jobs)")
                for j in jobs:
                    def _ts(s):
                        base = time.mktime(time.strptime(
                            s[:19], "%Y-%m-%dT%H:%M:%S"))
                        frac = s[19:23]
                        if frac.startswith("."):
                            base += float("0" + frac)
                        return base

                    try:
                        ms = _ts(j["completionTime"]) - _ts(j["submissionTime"])
                    except Exception:
                        ms = None
                    dur = f"{ms:.2f}s" if ms is not None else "?"
                    desc = (j.get("description") or j.get("name", ""))[:90]
                    print(f"  job {j['jobId']:>4} {dur:>5} "
                          f"stages={len(j.get('stageIds', []))} {desc}")
        med = sorted(times)[len(times) // 2]
        print(f"{name}: reps={[round(t, 2) for t in times]} median={med:.2f}")


if __name__ == "__main__":
    main()
