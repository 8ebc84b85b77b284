"""Query catalog: every implemented operator exposed as a named
(spark_fn, oracle_sql) pair for the driver's correctness harness
(__spark_entry__.py contract).

Conventions:
- spark_fn(spark, sf_dir) -> DataFrame, lazy until the driver acts.
- oracle is ANSI-ish SQL DuckDB 1.0 runs over the same parquet tables
  (pre-registered views: region nation customer supplier part orders
  lineitem events documents embeddings).
- every computed column is aliased IDENTICALLY on both sides (the
  driver sorts columns by name before hashing).
- double-typed aggregates are rounded in-query on BOTH sides so
  summation-order differences between engines can't flip the hash.
- queries with no SQL-expressible semantics (streaming state, LSH with
  engine-specific hashing) register oracle=None -> rows-only check.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATTERNS_PATH = os.path.join(_REPO_ROOT, "assets", "skill_patterns.jsonl")


@dataclass
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None -> rows-only check
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = Query(name, fn, oracle, doc)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    # Import side-effect modules that register queries.
    from dataengineer_job_scraper_etl_spark import queries as _q  # noqa: F401

    return dict(_REGISTRY)
