"""Hypothesis differential tests for the scalar semantics (C1/C3):
the JVM expression chains must agree with a pure-Python rendering of
the reference's EXACT rules (main.py:142-149 extract_numbers,
main.py:164-171 seniority when-chain) on arbitrary generated text —
the goldens pin known quirks, these sweep the space between them.

Examples are generated as BATCHES (one Spark job per hypothesis
example, ~50 strings each) so the property runs in seconds, not a
collect per string.
"""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

from dataengineer_job_scraper_etl_spark.functions.pay import extract_pay
from dataengineer_job_scraper_etl_spark.functions.seniority import (
    classify_seniority,
)

# --- pure-Python reference renderings (straight from main.py) --------


def _ref_pay(text: str | None) -> float | None:
    if text is None:
        return None
    nums = re.findall(r"£[\d,]+K?|[\d,]+ ?GBP", text)
    if not nums:
        return None
    s = nums[-1]  # last match wins (main.py:144)
    s = re.sub(r"£|GBP|,| ", "", s)
    s = s.replace("K", "000")  # string substitution, not arithmetic
    try:
        return float(s)
    except ValueError:
        return None


_SENIORITY = (
    (re.compile(r"senior", re.I), "Senior"),
    (re.compile(r"junior|graduate", re.I), "Junior"),
    (re.compile(r"manager|head", re.I), "Manager"),
    (re.compile(r"principal|lead", re.I), "Lead"),
)


def _ref_seniority(title: str | None) -> str | None:
    if title is None:
        return None
    for rx, label in _SENIORITY:
        if rx.search(title):
            return label
    return None


# --- strategies: dense in the interesting fragments ------------------

_pay_fragment = st.one_of(
    st.just("£"),
    st.just("GBP"),
    st.just("K"),
    st.just(","),
    st.just(" "),
    st.text(alphabet="0123456789", min_size=1, max_size=6),
    st.sampled_from(["salary", "per year", "to", "up to", "bonus", "-"]),
)
_pay_text = st.lists(_pay_fragment, min_size=0, max_size=12).map(" ".join)

_title_fragment = st.sampled_from(
    [
        "Senior", "senior", "SENIOR", "Junior", "graduate", "Manager",
        "Head", "head of", "Principal", "Lead", "lead", "Engineer",
        "Data", "Scientist", "Software", "Mislead",  # contains 'lead'
        "Seniority",  # contains 'senior'
        "", " ",
    ]
)
_title_text = st.lists(_title_fragment, min_size=0, max_size=6).map(" ".join)


@settings(max_examples=12, deadline=None)
@given(st.lists(_pay_text, min_size=1, max_size=50))
def test_pay_extraction_matches_reference_python(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "description string")
    got = [
        r["pay"]
        for r in df.select(extract_pay("description").alias("pay")).collect()
    ]
    expected = [_ref_pay(t) for t in texts]
    assert got == expected, list(zip(texts, got, expected))


@settings(max_examples=12, deadline=None)
@given(st.lists(_title_text, min_size=1, max_size=50))
def test_seniority_matches_reference_python(spark, titles):
    df = spark.createDataFrame([(t,) for t in titles], "title string")
    got = [
        r["s"]
        for r in df.select(classify_seniority(df["title"]).alias("s")).collect()
    ]
    expected = [_ref_seniority(t) for t in titles]
    assert got == expected, list(zip(titles, got, expected))
