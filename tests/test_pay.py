"""C1 golden tests — pay extraction quirks, derived straight from the
reference's extract_numbers (main.py:142-149): last-match-wins, K->000
as a *string* substitution, strip of £/GBP/,/space, null on no match.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.functions.pay import extract_pay

GOLDEN = [
    ("salary £45,000 per year", 45000.0),
    ("comp £80K plus bonus", 80000.0),  # K -> '000' string append
    ("pays 55000 GBP", 55000.0),  # space before GBP allowed
    ("pay 60,000GBP", 60000.0),  # no space before GBP
    ("range £40,000 to £50,000", 50000.0),  # LAST match wins
    ("£1,5K", 15000.0),  # degenerate: '1,5K' -> '15000' (quirk kept)
    ("£90K or 100000 GBP", 100000.0),  # last across both alternates
    ("no numbers here", None),
    ("only 1234 pounds", None),  # 'pounds' is not GBP
    ("", None),
    (None, None),
]


@pytest.mark.parametrize("text,expected", GOLDEN)
def test_pay_golden(spark, text, expected):
    df = spark.createDataFrame([(text,)], "description string")
    got = df.select(extract_pay(F.col("description")).alias("pay")).first()["pay"]
    assert got == expected
