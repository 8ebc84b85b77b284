"""Text cleaning (functions/textclean.py): differential against a
pure-Python rendering of the same rules, plus the composition order
property (boilerplate is dropped line-wise BEFORE collapse destroys
line structure)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.functions.textclean import (
    clean_text,
    drop_boilerplate_lines,
    normalize_ws,
    strip_markup,
)

DOCS = [
    "<html><script>var x = '<b>'</script><p>Hello &amp; welcome</p></html>",
    "line one\n© 2024 SomeCorp\nline two\nAll Rights Reserved blah\nend",
    "We use cookies to improve your experience\nreal content here",
    "plain   text\twith\x00control\x1fchars &lt;tag&gt; &#39;q&#39;",
    "<style type='text/css'>p { color: red }</style>visible",
    "",
]


def _py_clean(text: str) -> str:
    t = re.sub(r"(?is)<(script|style)\b[^>]*>.*?</\1>", " ", text)
    t = re.sub(r"(?s)<[^>]+>", " ", t)
    for ent, rep in (
        ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&"),
    ):
        t = t.replace(ent, rep)
    boiler = re.compile(
        r"(?i)^\s*(©|\(c\)\s|copyright\b|all rights reserved"
        r"|accept (all )?cookies|we use cookies|cookie (policy|settings)"
        r"|subscribe to our newsletter|sign in to continue"
        r"|terms (of (use|service))?\s*\|\s*privacy).*$"
    )
    t = "\n".join(l for l in t.split("\n") if not boiler.match(l))
    t = re.sub(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", " ", t)
    return re.sub(r"\s+", " ", t).strip()


def test_clean_text_matches_python_reference(spark):
    df = spark.createDataFrame([(t,) for t in DOCS], "text string")
    got = [
        r["c"] for r in df.select(clean_text(F.col("text")).alias("c")).collect()
    ]
    expected = [_py_clean(t) for t in DOCS]
    assert got == expected, list(zip(DOCS, got, expected))


def test_clean_text_semantic_spot_checks(spark):
    df = spark.createDataFrame([(t,) for t in DOCS], "text string")
    got = [
        r["c"] for r in df.select(clean_text(F.col("text")).alias("c")).collect()
    ]
    assert got[0] == "Hello & welcome"          # script dropped, entity
    assert got[1] == "line one line two end"    # two boilerplate lines out
    assert got[2] == "real content here"        # cookie banner out
    assert got[3] == "plain text with control chars <tag> 'q'"
    assert got[4] == "visible"                  # style block dropped
    assert got[5] == ""


def test_stage_functions_compose_in_documented_order(spark):
    # boilerplate matching needs line structure: running normalize_ws
    # FIRST would glue lines together and the banner would survive.
    text = "We use cookies here\nkeep me"
    df = spark.createDataFrame([(text,)], "text string")
    wrong_order = normalize_ws(F.col("text"))
    right = normalize_ws(
        drop_boilerplate_lines(strip_markup(F.col("text")))
    )
    row = df.select(
        F.length(wrong_order).alias("w"), right.alias("r")
    ).first()
    assert row["r"] == "keep me"
    assert row["w"] > len("keep me")  # collapse alone keeps the banner
