"""PySpark-native analytics engine with the query & data-processing
capabilities of ``lalelisealstad/dataengineer-job-scraper-etl``.

The reference (read-only at /root/reference) is a LinkedIn job-posting
ETL (Extract -> Transform -> Load) built on eager Polars/pandas with one
PySpark variant (reference etl/transform.py). This package re-expresses
every capability Spark-first:

- declarative DataFrame plans (Catalyst does pushdown/pruning/reordering)
- native column expressions for all scalar semantics (pay regex,
  seniority when-chain, jobid split) so whole-stage codegen covers them
- Arrow-batched pandas UDFs only where built-ins genuinely cannot
  express the semantics (NLP-ish skill extraction, HTML parsing)
- partitioned parquet sinks instead of filename-encoded partitioning
- north-star LLM-pipeline operators (dedup, similarity search,
  multimodal columns, text analysis) designed for 100 TB scale:
  no collect() in operator paths, broadcast for small sides,
  LSH instead of cross joins.

Layout:
    session.py    SparkSession factory (Arrow, AQE, UTC)
    io.py         sources/sinks (parquet, csv, jsonl; partitioned writes)
    schemas.py    canonical typed schemas
    functions/    scalar semantics: pay, seniority, strings, text, vectors
    operators/    relational & north-star ops: dedup, similarity, skills
    sources/      scrape source (mapInPandas over HTML fixtures)
    plans/        assembled pipelines (the reference's EP1/EP2/EP3 shapes)
    streaming/    Structured Streaming jobs (micro-batch semantics)
"""

__version__ = "0.1.0"
