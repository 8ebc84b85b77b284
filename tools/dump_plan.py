"""Dump .explain('formatted') for named entries to plans/r14/.

Usage: python tools/dump_plan.py <suffix> <entry> [entry ...]
Writes plans/r14/<entry>_<suffix>.txt (suffix: before|after).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from dataengineer_job_scraper_etl_spark.catalog import all_queries
    from dataengineer_job_scraper_etl_spark.session import get_spark

    spark = get_spark("plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    os.makedirs(os.path.join(REPO, "plans", "r14"), exist_ok=True)
    import contextlib
    import io

    for name in names:
        df = qs[name].spark_fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        out = os.path.join(REPO, "plans", "r14", f"{name}_{suffix}.txt")
        with open(out, "w", encoding="utf-8") as f:
            f.write(buf.getvalue())
        print("wrote", out, len(buf.getvalue()), "chars")


if __name__ == "__main__":
    main()
