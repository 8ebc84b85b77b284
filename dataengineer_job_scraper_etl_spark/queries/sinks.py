"""Sink-path entries: put the driver's hash signal on the WRITE side.

The sinks themselves (io.py: partitioned parquet + dynamic overwrite,
CSV, ORC, JSON, compaction) are pytest-covered; this entry closes the
loop through the driver gate by writing the events table through the
REAL partitioned sink, reading it back, and hash-comparing an
aggregate of the round-tripped data against the oracle's view of the
ORIGINAL — any loss in the write path (partition-column encoding/
inference, value fidelity, dropped rows) flips the hash.

The write is staged once per fixture fingerprint into the temp root
(same crash-safe rename-publish protocol as the streaming queue
stage), so repeated driver runs don't rewrite.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineer_job_scraper_etl_spark.catalog import register
from dataengineer_job_scraper_etl_spark.io import write_parquet_partitioned
from dataengineer_job_scraper_etl_spark.queries.events import _events


def _staged_sink_dir(spark: SparkSession, sf_dir: str) -> str:
    import hashlib
    import shutil

    src = os.path.join(sf_dir, "events.parquet")
    st = os.stat(src)
    fp = hashlib.md5(
        f"sinkrt:{src}:{st.st_size}:{int(st.st_mtime)}".encode()
    ).hexdigest()[:12]
    key = sf_dir.strip("/").replace("/", "_")
    root = os.path.join(
        tempfile.gettempdir(), f"spark_graft_sinkrt_{key}_{fp}"
    )
    if os.path.exists(root):
        return root
    tmp = tempfile.mkdtemp(prefix="spark_graft_sinkstage_")
    staged = os.path.join(tmp, "data")
    write_parquet_partitioned(
        _events(spark, sf_dir), staged, partition_cols=("event_type",)
    )
    try:
        os.rename(staged, root)
    except OSError:
        pass  # concurrent stager won; its dir is complete
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return root


@register(
    "io_partitioned_sink_roundtrip",
    """
WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
                   event_type, value FROM events)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(event_id) AS BIGINT) AS id_checksum,
       CAST(sum(user_id) AS BIGINT) AS user_checksum,
       round(sum(value), 2) AS value_sum,
       min(ts) AS ts_min, max(ts) AS ts_max
FROM ev GROUP BY event_type
""",
    doc="Partitioned parquet sink round-trip, hash-checked: events "
    "written through io.write_parquet_partitioned (real partition "
    "columns, the layout that gives downstream readers partition "
    "pruning), read back, and aggregated per event_type — checksums "
    "over ids/users/values/timestamp range pin that the write path "
    "loses nothing and the partition column survives directory "
    "encoding + read-back inference. The oracle aggregates the "
    "ORIGINAL table, so equality spans the whole write->read loop.",
)
def io_partitioned_sink_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    root = _staged_sink_dir(spark, sf_dir)
    back = spark.read.parquet(root)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("event_id").cast("long").alias("id_checksum"),
        F.sum("user_id").cast("long").alias("user_checksum"),
        F.round(F.sum("value"), 2).alias("value_sum"),
        F.min("ts").alias("ts_min"),
        F.max("ts").alias("ts_max"),
    )
