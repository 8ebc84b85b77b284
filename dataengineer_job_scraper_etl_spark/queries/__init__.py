"""Registered correctness queries, grouped by domain.

Importing this package populates the catalog registry (see
catalog.all_queries). Each module covers one slice of SURVEY §2's
inventory; module docstrings map queries to operator IDs.
"""

from dataengineer_job_scraper_etl_spark.queries import (  # noqa: F401
    annladder,
    attribution,
    basket,
    clustering,
    containment,
    corpus_ppl,
    corpusq,
    dq,
    events,
    gopher,
    graphrank,
    intervaljoin,
    joinopt,
    jobs,
    layout,
    lm,
    markov,
    multimodal,
    neardup,
    pca,
    pipeline_ops,
    prf,
    quality_model,
    retrieval,
    rfm,
    seasonality,
    sampling,
    sinks,
    sketches,
    skewq,
    spans,
    streaming_lm,
    streaming_queries,
    text,
    tokenizer,
    topics,
    topicsample,
    tpch,
    tpch_full,
    vectors,
)
