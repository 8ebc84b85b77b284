"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "headline_total", "value": <sum sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query is forced end-to-end with the noop sink (full computation,
no result serialization / driver collect in the timing), after one
small warmup to exclude JVM/codegen cold start from per-query numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_region_revenue",
    "window_top3_orders_per_customer",
    "cube_lineitem_flags",
    "jobs_transform_full",
    "jobs_flagship_skill_demand",
]
# Added as they land in the catalog; missing names are skipped so bench
# never breaks mid-build.
HEADLINE += [
    "events_sessionization",
    "docs_near_dup_jaccard",
    "vec_cosine_topk",
]
HEADLINE += [
    "tpch_q13_customer_order_distribution",
    "events_asof_purchase_view",
    "neardup_minhash_lsh",
    "multimodal_features",
    "streaming_tumbling_hourly",
]
HEADLINE += [
    "docs_dedup_clusters",
    "text_tfidf_top_terms",
    "ann_ivf_topk",
]
HEADLINE += [
    "tpch_q9_product_profit",
    "tpch_q21_waiting_suppliers",
    "docs_contamination_ngram",
    "text_unigram_logprob",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from dataengineer_job_scraper_etl_spark.catalog import all_queries
    from dataengineer_job_scraper_etl_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    # Warmup: touch the fact table once (JVM + parquet footer caches).
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = qs.get(name)
        if q is None:
            continue
        t0 = time.time()
        _force(q.spark_fn(spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
