"""BM25 text ranking — the retrieval scorer a training-data pipeline
uses for query-based corpus selection (and the classic counterpart of
the TF-IDF battery in queries/text.py).

Okapi BM25 with the Robertson-Sparck-Jones idf:

    idf(t)  = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
    s(d, q) = sum_t idf(t) * tf_td * (k1 + 1)
                     / (tf_td + k1 * (1 - b + b * dl_d / avgdl))

Spark-first shape: one explode of the corpus into (doc, term) counts,
corpus stats (N, avgdl) ride as a broadcast 1-row frame, per-term df
as a broadcast term-stats frame, and the query terms prune the explode
output BEFORE any join (only matching terms survive the filter, so the
scored relation is |q| x matching-docs, never corpus x vocabulary).
Everything is built-in expressions — no Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ws_tokens(col: Column) -> Column:
    # same whitespace tokenization contract as queries/text.py
    return F.split(F.trim(F.regexp_replace(F.lower(col), r"\s+", " ")), " ")


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
    (lowercased here), carried as a literal filter + broadcast idf
    table — the corpus never joins anything corpus-sized."""
    terms = sorted({t.lower() for t in query_terms if t})
    if not terms:
        raise ValueError("bm25_scores needs at least one query term")

    toks = docs.select(
        F.col(id_col).alias("__id"), _ws_tokens(F.col(text_col)).alias("__t")
    )
    lengths = toks.select("__id", F.size("__t").alias("dl"))
    stats = lengths.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )

    tf = (
        toks.select("__id", F.explode("__t").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("__id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("term").agg(
        F.countDistinct("__id").alias("df")
    )

    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    # df_t and stats are query-bounded -> broadcast; lengths is
    # corpus-sized -> keyed join on the doc id (AQE may still broadcast
    # it when the matched set is small, but never by our hint).
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .join(lengths, "__id")
        .crossJoin(F.broadcast(stats))
        .select(
            "__id",
            (
                idf
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("term_score"),
        )
    )
    return (
        scored.groupBy(F.col("__id").alias(id_col))
        .agg(F.sum("term_score").alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc(id_col))
    )
