"""Mergeable-sketch aggregates (Apache DataSketches via Spark SQL) —
the 100 TB cardinality toolkit (north-star §2.10 'approx distinct',
extended to MERGE and SET-OP form; the reference's eager engine has no
analogue):

- HLL: per-group sketches merged with hll_union_agg. Mergeability is
  the scale property — partial sketches combine map-side and across
  jobs/days, so 'distinct users per partition, rolled up globally'
  never re-scans history.
- Theta: supports what HLL cannot — set ALGEBRA over sketches (union /
  intersection / a-not-b), answering 'users who did BOTH' from two
  KB-sized summaries instead of a corpus self-join.
- CountMin: point-frequency estimates with a one-sided error bound
  (est >= truth, est <= truth + eps*N w.p. >= confidence) from a
  fixed-size table.

Correctness form: tolerance CONTRACTS, like agg_approx_distinct_tol —
the sketch estimate is engine-specific, so each entry emits the EXACT
Spark-side answer (hash-pinned against DuckDB) plus booleans asserting
the sketch landed within its documented error envelope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.catalog import register
from dataengineer_job_scraper_etl_spark.queries.events import _events


@register(
    "agg_hll_union_tol",
    """
SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact,
       TRUE AS union_within_tol
FROM events
""",
    doc="HLL sketch MERGE: per-event_type hll_sketch_agg(user_id) "
    "sketches (lgConfigK=12), rolled up with hll_union_agg, estimated "
    "with hll_sketch_estimate — the partial-sketch-then-merge shape "
    "that makes distinct counts incremental at 100 TB (per-partition/"
    "per-day sketches union in KB, no re-scan). Contract: the merged "
    "estimate is within ±5% of the exact corpus-wide distinct (emitted "
    "exactly and hash-pinned).",
)
def agg_hll_union_tol(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    per_group = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = per_group.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = e.agg(F.countDistinct("user_id").cast("long").alias("n_exact"))
    return merged.crossJoin(exact).select(
        "n_exact",
        (
            F.abs(F.col("est") - F.col("n_exact"))
            <= 0.05 * F.col("n_exact")
        ).alias("union_within_tol"),
    )


@register(
    "agg_theta_set_ops_tol",
    """
WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
x AS (
  SELECT CAST((SELECT count(*) FROM c) AS BIGINT) AS n_click,
         CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchase,
         CAST((SELECT count(DISTINCT user_id) FROM events
               WHERE event_type IN ('click', 'purchase')) AS BIGINT) AS n_union)
SELECT n_click, n_purchase, n_union,
       n_click + n_purchase - n_union AS n_intersect,
       TRUE AS union_ok, TRUE AS intersect_ok, TRUE AS diff_ok
FROM x
""",
    doc="Theta-sketch set ALGEBRA: one single-pass aggregate builds a "
    "click-users sketch and a purchase-users sketch (conditional "
    "theta_sketch_agg — partials merge associatively across "
    "partitions), then theta_union / theta_intersection / "
    "theta_difference estimate |C∪P|, |C∩P| (users who did BOTH — "
    "inexpressible with HLL), and |C\\\\P|, all from KB summaries with "
    "no corpus self-join. Exact counts (inclusion-exclusion over three "
    "countDistincts) are hash-pinned; contract booleans assert each "
    "estimate within ±5% (±1 absolute for small sets).",
)
def agg_theta_set_ops_tol(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    is_c = F.col("event_type") == "click"
    is_p = F.col("event_type") == "purchase"
    sk = e.agg(
        F.theta_sketch_agg(F.when(is_c, F.col("user_id"))).alias("c"),
        F.theta_sketch_agg(F.when(is_p, F.col("user_id"))).alias("p"),
    )
    est = sk.select(
        F.theta_sketch_estimate(
            F.theta_union(F.col("c"), F.col("p"))
        ).alias("e_union"),
        F.theta_sketch_estimate(
            F.theta_intersection(F.col("c"), F.col("p"))
        ).alias("e_int"),
        F.theta_sketch_estimate(
            F.theta_difference(F.col("c"), F.col("p"))
        ).alias("e_diff"),
    )
    exact = e.agg(
        F.countDistinct(F.when(is_c, F.col("user_id")))
        .cast("long")
        .alias("n_click"),
        F.countDistinct(F.when(is_p, F.col("user_id")))
        .cast("long")
        .alias("n_purchase"),
        F.countDistinct(F.when(is_c | is_p, F.col("user_id")))
        .cast("long")
        .alias("n_union"),
    )

    def ok(est_col: str, truth):
        return (
            F.abs(F.col(est_col) - truth)
            <= F.greatest(0.05 * truth, F.lit(1.0))
        )

    n_int = F.col("n_click") + F.col("n_purchase") - F.col("n_union")
    return est.crossJoin(exact).select(
        "n_click",
        "n_purchase",
        "n_union",
        n_int.cast("long").alias("n_intersect"),
        ok("e_union", F.col("n_union")).alias("union_ok"),
        ok("e_int", n_int).alias("intersect_ok"),
        ok("e_diff", F.col("n_click") - n_int).alias("diff_ok"),
    )


# CountMin parameters: eps bounds the overestimate (est <= truth +
# eps * N with prob >= confidence); seed fixed for determinism. Part
# of the entry's contract.
_CMS_EPS, _CMS_CONF, _CMS_SEED = 0.001, 0.99, 42


@register(
    "agg_countmin_type_freq",
    """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_exact, TRUE AS cms_ok
FROM events GROUP BY event_type
""",
    doc="CountMin point-frequency contract: a count-min sketch over "
    "event_type (eps=0.001, confidence=0.99, fixed seed) probed for "
    "every type; cms_ok asserts the one-sided bound est >= exact AND "
    "est <= exact + eps*N. The sketch is the entry's ONE bounded "
    "eager step — a KB-sized summary table (depth x width counters), "
    "built distributed and merged on the driver, the same "
    "sketch-sized collect budget as IVF centroids. Exact per-type "
    "counts are hash-pinned.",
)
def agg_countmin_type_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    # PySpark 4 no longer surfaces DataFrameStatFunctions.countMinSketch;
    # the JVM implementation (org.apache.spark.util.sketch.CountMinSketch,
    # distributed treeAggregate of per-partition sketches) is reached
    # through the py4j bridge. The returned object is the KB-sized merged
    # sketch; estimateCount probes it driver-side.
    cms = (
        e.select("event_type")
        ._jdf.stat()
        .countMinSketch("event_type", _CMS_EPS, _CMS_CONF, _CMS_SEED)
    )
    n_total = cms.totalCount()
    types = ["click", "view", "purchase", "signup", "error"]
    est = spark.createDataFrame(
        [(t, cms.estimateCount(t)) for t in types],
        "event_type string, est long",
    )
    exact = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact")
    )
    bound = F.col("n_exact") + F.lit(_CMS_EPS * n_total)
    return exact.join(F.broadcast(est), "event_type").select(
        "event_type",
        "n_exact",
        (
            (F.col("est") >= F.col("n_exact")) & (F.col("est") <= bound)
        ).alias("cms_ok"),
    )
