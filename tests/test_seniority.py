"""C3 golden tests — seniority when-chain branch order
(reference main.py:164-171). First-match-wins order is load-bearing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.functions.seniority import classify_seniority

GOLDEN = [
    ("Senior Data Engineer", "Senior"),
    ("senior analyst", "Senior"),  # case-insensitive
    ("Senior Engineering Manager", "Senior"),  # senior beats manager
    ("Junior Developer", "Junior"),
    ("Graduate Data Analyst", "Junior"),  # graduate -> Junior
    ("Engineering Manager", "Manager"),
    ("Head of Data", "Manager"),  # head -> Manager
    ("Junior Engineering Manager", "Junior"),  # junior beats manager
    ("Principal Engineer", "Lead"),  # principal -> Lead
    ("Tech Lead", "Lead"),
    ("Manager of Tech Leads", "Manager"),  # manager beats lead
    ("Data Engineer", None),  # no branch matches
    ("", None),
    (None, None),  # null title -> null (3VL)
]


@pytest.mark.parametrize("title,expected", GOLDEN)
def test_seniority_golden(spark, title, expected):
    df = spark.createDataFrame([(title,)], "title string")
    got = df.select(classify_seniority(F.col("title")).alias("s")).first()["s"]
    assert got == expected
