"""BM25 text ranking — the retrieval scorer a training-data pipeline
uses for query-based corpus selection (and the classic counterpart of
the TF-IDF battery in queries/text.py).

Okapi BM25 with the Robertson-Sparck-Jones idf:

    idf(t)  = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
    s(d, q) = sum_t idf(t) * tf_td * (k1 + 1)
                     / (tf_td + k1 * (1 - b + b * dl_d / avgdl))

Spark-first shape, built around the observation that query terms are a
BOUNDED literal list (a search query, not a vocabulary): ONE projection
tokenizes each document exactly once and emits the compact per-doc
index row (dl, tf per query term) — tf counted array-side with
size(filter(tokens)), no explode, no shuffle. That narrow index
(|q|+2 integers per doc, no text) is materialized via localCheckpoint
— the build/serve split every BM25 engine makes by persisting its
index — so the corpus-stats aggregate and the scoring projection both
read materialized rows and the text column is scanned and tokenized
ONCE per run (round 4 tokenized it twice: the lazy ``lengths`` and
``tf`` branches each re-ran the regexp+split over the full corpus,
and the stats agg a third partial pass — the dominant cost at 100 TB).
Everything is built-in expressions — no Python in the plan.

Width note: per-row tf columns scale with |query_terms|; for a
bounded search query (a handful to a few dozen terms) this beats the
explode by a full corpus-tokenize scan. A vocabulary-sized term set
(thousands) belongs in the TF-IDF explode formulation instead
(queries/text.py::text_tfidf_top_terms).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


from dataengineer_job_scraper_etl_spark.functions.strings import (
    ws_tokens as _ws_tokens,
)


def _count_term(toks: Column, term: str) -> Column:
    # occurrences of `term` in the token array, counted array-side.
    # NB: factory function, NOT a loop-local two-arg lambda — PySpark
    # reads a second lambda parameter (even a defaulted one) as the
    # (element, index) form and binds the INDEX to it.
    return F.size(F.filter(toks, lambda x: x == F.lit(term)))


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(id, bm25) for every document matching at least one query term,
    descending score. ``query_terms`` is a bounded query-side list
    (lowercased and deduped here); per-term stats live as columns of a
    1-row broadcast frame — the corpus never joins anything
    corpus-sized, and its text is tokenized exactly once."""
    terms = sorted({t.lower() for t in query_terms if t})
    if not terms:
        raise ValueError("bm25_scores needs at least one query term")

    toks = _ws_tokens(F.col(text_col))
    per_doc = docs.select(
        F.col(id_col).alias("__id"),
        F.size(toks).alias("dl"),
        *[_count_term(toks, t).alias(f"__tf{i}") for i, t in enumerate(terms)],
    )
    # Index materialization: the text scan + tokenize runs once (the
    # broadcast-stats job computes and persists these narrow rows; the
    # scoring scan reads them back), never once per consumer branch.
    per_doc = per_doc.localCheckpoint(eager=False)

    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"__tf{i}") > 0).cast("long")).alias(f"__df{i}")
            for i in range(len(terms))
        ],
    )

    def term_score(i: int) -> Column:
        tf = F.col(f"__tf{i}")
        df_t = F.col(f"__df{i}")
        idf = F.log(
            F.lit(1.0) + (F.col("n_docs") - df_t + 0.5) / (df_t + 0.5)
        )
        saturated = (tf * (k1 + 1)) / (
            tf + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
        )
        # unmatched terms contribute 0 (idf of df=0 is NOT free: the
        # when-guard keeps them out entirely, like the explode filter did)
        return F.when(tf > 0, idf * saturated).otherwise(F.lit(0.0))

    matched = reduce(
        lambda a, c: a | c,
        [F.col(f"__tf{i}") > 0 for i in range(len(terms))],
    )
    return (
        per_doc.filter(matched)
        .crossJoin(F.broadcast(stats))
        .select(
            F.col("__id").alias(id_col),
            reduce(
                lambda a, c: a + c,
                [term_score(i) for i in range(len(terms))],
            ).alias("bm25"),
        )
        .orderBy(F.desc("bm25"), F.asc(id_col))
    )
