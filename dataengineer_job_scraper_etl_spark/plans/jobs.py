"""Job-postings pipeline (the reference's EP1 transform, main.py:129-175)
on Spark, plus the deterministic postings fixture derived from the
``documents`` testdata table.

The fixture derivation is a *contract*: ``derive_postings`` (Spark) and
``POSTINGS_SQL`` (DuckDB) must produce byte-identical tables — every
correctness query over postings builds on both. It deliberately covers
every branch of the reference semantics: all seniority branches + the
'Software' filter token + null titles (FIXTURES.md), the whole
pay-regex golden corpus + null descriptions, and 3 job types.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from dataengineer_job_scraper_etl_spark.functions.pay import extract_pay
from dataengineer_job_scraper_etl_spark.functions.seniority import classify_seniority
from dataengineer_job_scraper_etl_spark.operators.skills import (
    extract_skills_ngram_join,
    skills_oracle_sql,
)

# doc_id % 8 -> title (covers every seniority branch of main.py:164-171,
# the 'Software' filter of etl/job_scrape.py:63, and null titles).
TITLES = (
    "Senior Engineering Manager",
    "Graduate Data Analyst",
    "Head of Data",
    "Principal Engineer",
    "Tech Lead",
    "Data Engineer",
    "Software Engineer",
    None,
)

# doc_id % 6 -> pay fragment appended to the text (the pay-regex golden
# corpus from main.py:142-149; None makes the whole description null via
# concat null-propagation, exercising drop_nulls at main.py:152).
PAY_FRAGMENTS = (
    " salary £45,000 per year",
    " comp £80K plus bonus",
    " pays 55000 GBP",
    " pay 60,000GBP",
    " range £40,000 to £50,000",
    None,
)

# doc_id % 3 -> job_type (the reference scrapes 3 titles nightly,
# README.md:3-6).
JOB_TYPES = ("Data Engineer", "Data Scientist", "Data Analyst")


def _pick(col: Column, options: tuple, modulo: int) -> Column:
    expr = None
    for i, val in enumerate(options):
        cond = (col % modulo) == i
        lit = F.lit(val) if val is not None else F.lit(None).cast("string")
        expr = F.when(cond, lit) if expr is None else expr.when(cond, lit)
    return expr


def derive_postings(documents: DataFrame) -> DataFrame:
    """documents -> job postings in the reference's raw schema
    (jobid, title, description, job_type — main.py:78).

    The source is fanned out to all cores first: the downstream
    pipeline (pay regex, tokenize, n-gram explode, broadcast phrase
    join) contains NO shuffle until the match dedup, so whatever
    partition count the scan produces is the parallelism of the whole
    matcher — and a one-row-group fixture scans as 1-2 partitions.
    No-op at scale (never repartitions down)."""
    from dataengineer_job_scraper_etl_spark.session import ensure_min_parallelism

    documents = ensure_min_parallelism(documents)
    did = F.col("doc_id")
    return documents.select(
        did.cast("string").alias("jobid"),
        _pick(did, TITLES, 8).alias("title"),
        # concat propagates null: fragment None -> description null.
        F.concat(F.col("text"), _pick(did, PAY_FRAGMENTS, 6)).alias("description"),
        _pick(did, JOB_TYPES, 3).alias("job_type"),
    )


def _sql_pick(expr: str, options: tuple, modulo: int) -> str:
    branches = " ".join(
        f"WHEN {expr} % {modulo} = {i} THEN "
        + ("NULL" if val is None else "'" + val.replace("'", "''") + "'")
        for i, val in enumerate(options)
    )
    return f"CASE {branches} END"


# DuckDB view matching derive_postings exactly ('||' propagates null).
POSTINGS_SQL = f"""
SELECT
  CAST(doc_id AS VARCHAR)              AS jobid,
  {_sql_pick('doc_id', TITLES, 8)}     AS title,
  text || {_sql_pick('doc_id', PAY_FRAGMENTS, 6)} AS description,
  {_sql_pick('doc_id', JOB_TYPES, 3)}  AS job_type
FROM documents
"""


def transform_postings(
    postings: DataFrame, phrases: list[str], text_phrases: list[str] = ()
) -> DataFrame:
    """The reference's transform stage (main.py:129-175), Spark-first:

    1. drop null descriptions FIRST (main.py:152) — the reference's own
       Spark variant runs dropna AFTER the NLP UDF (etl/transform.py:
       64-66), wasting NLP on doomed rows; Catalyst cannot reorder a
       filter across a Python UDF, so the engine standardizes
       filter-first (SURVEY §4.1).
    2. pay: native regex chain (was a Python map_elements, main.py:155).
    3. skills: n-gram broadcast-join matcher (main.py:159) — the
       dictionary-size-independent formulation; see the variant
       benchmark in operators/skills.py.
    4. seniority: when-chain (main.py:164-171).
    5. date stamp + drop wide text cols before the sink (main.py:173-175)
       — manual column pruning kept as a logical-design choice."""
    spark = postings.sparkSession
    enriched = (
        postings.na.drop(subset=["description"])
        .withColumn("pay", extract_pay(F.col("description")))
        .withColumn("seniority", classify_seniority(F.col("title")))
    )
    with_skills = extract_skills_ngram_join(
        spark, enriched, "description", "jobid", phrases,
        text_phrases=text_phrases,
    )
    return (
        with_skills.withColumn("date", F.current_timestamp())
        .drop("title", "description")
        .select("jobid", "job_type", "pay", "skills", "seniority", "date")
    )


def transform_postings_oracle_sql(phrases: list[str], pay_sql: str,
                                  seniority_sql: str,
                                  text_phrases: list[str] = ()) -> str:
    """DuckDB equivalent of transform_postings minus the ``date`` stamp
    (current_timestamp is nondeterministic across engines; the harness
    compares the deterministic columns). The padded skills haystack is
    materialized once per row (skills_oracle_padded_sql docstring)."""
    from dataengineer_job_scraper_etl_spark.operators.skills import (
        skills_oracle_padded_sql,
    )

    skills_sql = skills_oracle_sql(
        "description", phrases, text_phrases, padded_expr="__padded"
    )
    return f"""
WITH postings AS ({POSTINGS_SQL}),
prep AS (
  SELECT *, {skills_oracle_padded_sql('description')} AS __padded
  FROM postings WHERE description IS NOT NULL
)
SELECT jobid, job_type,
       {pay_sql} AS pay,
       coalesce(array_to_string({skills_sql}, '|'), '') AS skills,
       {seniority_sql} AS seniority
FROM prep
"""
