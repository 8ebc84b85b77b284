"""CLI: run catalog queries / the reference pipeline locally.

  python -m dataengineer_job_scraper_etl_spark list
  python -m dataengineer_job_scraper_etl_spark run <query> [--sf-dir D] [--limit N]
  python -m dataengineer_job_scraper_etl_spark bench
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="dataengineer_job_scraper_etl_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registered queries")
    runp = sub.add_parser("run", help="run one query and print rows")
    runp.add_argument("query")
    runp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    runp.add_argument("--limit", type=int, default=20)
    runp.add_argument("--explain", action="store_true")
    sub.add_parser("bench", help="run the headline benchmark")
    args = p.parse_args(argv)

    from dataengineer_job_scraper_etl_spark.catalog import all_queries

    if args.cmd == "list":
        for name, q in sorted(all_queries().items()):
            kind = "oracle" if q.oracle else "rows-only"
            print(f"{name:45s} [{kind}] {q.doc.splitlines()[0] if q.doc else ''}")
        return 0

    if args.cmd == "bench":
        import bench

        bench.main()
        return 0

    from dataengineer_job_scraper_etl_spark.session import get_spark

    q = all_queries().get(args.query)
    if q is None:
        print(f"unknown query: {args.query}", file=sys.stderr)
        return 2
    spark = get_spark("cli")
    spark.sparkContext.setLogLevel("ERROR")
    df = q.spark_fn(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    df.show(args.limit, truncate=40)
    return 0


if __name__ == "__main__":
    sys.exit(main())
