"""Scalar column functions — all native ``pyspark.sql.functions``
expression chains (whole-stage-codegen'd, Catalyst-visible), no Python
UDFs. SURVEY.md §2.7/§2.8: the single biggest idiomatic-Spark win over
the reference is moving pay (C1), seniority (C3) and jobid (C4) out of
``map_elements`` Python into native expressions.
"""

from dataengineer_job_scraper_etl_spark.functions.pay import extract_pay
from dataengineer_job_scraper_etl_spark.functions.seniority import classify_seniority
from dataengineer_job_scraper_etl_spark.functions.strings import (
    jobid_from_urn,
    not_containing,
)

__all__ = [
    "extract_pay",
    "classify_seniority",
    "jobid_from_urn",
    "not_containing",
]
