"""CCNet-style language-model perplexity filtering over ``documents``
(LLM-curation extension, SURVEY §2.10/§2.19).

CCNet (Wenzek et al. 2020) and its descendants (LLaMA, RedPajama,
FineWeb) bucket web documents into head/middle/tail by the perplexity
of a small n-gram LM and keep the fluent head. The engine's rendering
trains the LM ON THE CORPUS ITSELF, fully distributed, and scores
every document with it — the KenLM-analog re-expressed as DataFrame
aggregates (reference parity note: the reference repo,
lalelisealstad/dataengineer-job-scraper-etl, has no LM stage; this
extends its transform battery toward the training-data brief, like
the quality classifier in queries/quality_model.py).

Model: interpolated bigram LM,

    p(cur | prev) = 0.7 * c(prev,cur)/c(prev,*) + 0.3 * c(cur)/N

with MLE counts from the whitespace-token contract
(functions/strings.ws_tokens — the catalog-wide tokenizer). The
context denominator c(prev,*) is the TRANSITION count (sum of bigram
counts sharing the prefix), not the raw unigram count, so rows sum to
exactly 1 over the observed vocabulary; the 0.3 unigram back-off
keeps every observed transition strictly positive without a
vocabulary-size smoothing constant both engines would have to agree
on. Doc score = mean negative log-probability over its transitions
(docs with fewer than 2 tokens have no transitions and drop out of
the scored set on BOTH engines — inner-join semantics).

Scale shape (the 100 TB story): the trained model is the distinct-
bigram table — Zipf-bounded, orders of magnitude smaller than the
token stream — built by ONE groupBy over the transition stream, with
the context totals a second vocab-scale groupBy OVER THE MODEL, never
over the corpus. Scoring is one token-scale shuffle join (transitions
against the model on the (prev, cur) key — the unavoidable join, and
it is hash-partitioned, AQE-broadcastable when the model is small).
The tokenize scan runs once (localCheckpoint shared by the unigram
and transition branches, the operators/ranking.py device). The final
head/middle/tail split is an ntile over DOC-scale rows — at real
scale the cutoffs come from approx_percentile instead of a global
sort; the oracle-checked tercile is the exact twin, same device as
docs_quality_terciles. The bucket window is PER SOURCE — the CCNet
unit (perplexity buckets are computed per language/snapshot, Wenzek
et al. §4.3), and per-source windows parallelize across sources.

Float parity: counts are integer-exact on both engines and cast to
double before ONE division each; the interpolation weights are the
exact literals 0.7 / 0.3 in both texts; ln parity is proven by the
PSI entries; the order-sensitive avg is absorbed by the 1e-6 rounding
(the text_unigram_logprob precedent, green since r4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.catalog import register
from dataengineer_job_scraper_etl_spark.functions.strings import ws_tokens

# Interpolation weights — rendered as EXACT decimal literals in both
# engine texts (never computed as 1 - lam, which would print
# 0.30000000000000004 into the SQL).
_LAM_BIGRAM = "0.7"
_LAM_UNIGRAM = "0.3"
_N_BUCKETS = 3

_BIGRAM_PPL_ORACLE = f"""
WITH tok AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS t
  FROM documents),
flat_tok AS (SELECT doc_id, unnest(t) AS tok FROM tok),
uni AS (SELECT tok, CAST(count(*) AS DOUBLE) AS c_uni FROM flat_tok GROUP BY tok),
total AS (SELECT CAST(sum(c_uni) AS DOUBLE) AS n FROM uni),
tr AS (
  SELECT doc_id, pc.prev AS prev, pc.cur AS cur
  FROM (SELECT doc_id,
               unnest(list_transform(range(2, len(t) + 1),
                      i -> struct_pack(prev := t[i - 1], cur := t[i]))) AS pc
        FROM tok WHERE len(t) >= 2)),
big AS (SELECT prev, cur, CAST(count(*) AS DOUBLE) AS c_big
        FROM tr GROUP BY prev, cur),
ctx AS (SELECT prev, CAST(sum(c_big) AS DOUBLE) AS c_ctx
        FROM big GROUP BY prev),
probs AS (
  SELECT b.prev, b.cur,
         {_LAM_BIGRAM} * (b.c_big / x.c_ctx)
           + {_LAM_UNIGRAM} * (u.c_uni / total.n) AS p
  FROM big b
  JOIN ctx x ON x.prev = b.prev
  JOIN uni u ON u.tok = b.cur
  CROSS JOIN total),
scored AS (
  SELECT tr.doc_id,
         CAST(count(*) AS BIGINT) AS n_transitions,
         round(avg(-ln(p.p)), 6) AS avg_neg_logprob
  FROM tr JOIN probs p ON p.prev = tr.prev AND p.cur = tr.cur
  GROUP BY tr.doc_id)
SELECT s.doc_id, d.source, s.n_transitions, s.avg_neg_logprob,
       CAST(ntile({_N_BUCKETS}) OVER (PARTITION BY d.source
                 ORDER BY s.avg_neg_logprob, s.doc_id) AS INT)
         AS ppl_bucket
FROM scored s JOIN documents d ON d.doc_id = s.doc_id
"""


@register(
    "docs_bigram_perplexity",
    _BIGRAM_PPL_ORACLE,
    doc="CCNet-style perplexity filter: train an interpolated bigram "
    "LM on the corpus (one groupBy over the transition stream — the "
    "model is the Zipf-bounded distinct-bigram table, never "
    "corpus-sized), score each doc as mean negative log-probability "
    "of its transitions (one token-scale hash join against the "
    "model), bucket head/middle/tail by exact PER-SOURCE terciles "
    "(the CCNet unit). The hashed contract covers the LM arithmetic, "
    "the scoring join, and the bucket assignment.",
)
def docs_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # One tokenize scan shared by the unigram and transition branches
    # (the operators/ranking.py localCheckpoint device).
    tokd = d.select(
        "doc_id", ws_tokens(F.col("text")).alias("t")
    ).localCheckpoint(eager=False)

    uni = (
        tokd.select(F.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("double").alias("c_uni"))
    )
    total = uni.agg(F.sum("c_uni").alias("n"))

    # Transition stream. The struct array is built in its OWN select
    # and exploded in the next one — a non-generator expression in the
    # same select as a generator re-evaluates per generated row (the
    # text.py dup-bigram lesson).
    tcol = F.col("t")
    pairs = F.when(
        F.size(tcol) >= 2,
        F.transform(
            F.sequence(F.lit(2), F.size(tcol)),
            lambda i: F.struct(
                F.element_at(tcol, i - 1).alias("prev"),
                F.element_at(tcol, i).alias("cur"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))
    tr = (
        tokd.select("doc_id", pairs.alias("pcs"))
        .select("doc_id", F.explode("pcs").alias("pc"))
        .select("doc_id", F.col("pc.prev").alias("prev"), F.col("pc.cur").alias("cur"))
    )

    # The trained model: distinct-bigram scale, built once; context
    # totals aggregate the MODEL (vocab-scale), not the corpus.
    big = tr.groupBy("prev", "cur").agg(
        F.count(F.lit(1)).cast("double").alias("c_big")
    )
    ctx = big.groupBy("prev").agg(F.sum("c_big").alias("c_ctx"))
    lam_b = F.lit(float(_LAM_BIGRAM))
    lam_u = F.lit(float(_LAM_UNIGRAM))
    probs = (
        big.join(ctx, "prev")
        .join(uni.withColumnRenamed("tok", "cur"), "cur")
        .crossJoin(F.broadcast(total))
        .select(
            "prev",
            "cur",
            (
                lam_b * (F.col("c_big") / F.col("c_ctx"))
                + lam_u * (F.col("c_uni") / F.col("n"))
            ).alias("p"),
        )
    )

    # Scoring: THE token-scale shuffle join (transitions x model on
    # the bigram key), then a doc-keyed aggregate.
    scored = (
        tr.join(probs, ["prev", "cur"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_transitions"),
            F.round(F.avg(-F.log(F.col("p"))), 6).alias("avg_neg_logprob"),
        )
    )
    # Exact PER-SOURCE terciles (the CCNet per-language unit; windows
    # parallelize across sources — at extreme per-source scale the
    # window swaps for approx_percentile cutoffs, the
    # docs_quality_terciles escape hatch).
    scored = scored.join(d.select("doc_id", "source"), "doc_id")
    w = Window.partitionBy("source").orderBy("avg_neg_logprob", "doc_id")
    return scored.select(
        "doc_id",
        "source",
        "n_transitions",
        "avg_neg_logprob",
        F.ntile(_N_BUCKETS).over(w).cast("int").alias("ppl_bucket"),
    )
