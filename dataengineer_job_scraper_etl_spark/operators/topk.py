"""Skew-free grouped top-k.

A single ``row_number() OVER (PARTITION BY group)`` filter is correct
but funnels the ENTIRE input through one task per group — with a
handful of groups (e.g. 5 query ids ranking a whole corpus) that is a
single-task sort of everything at scale.

``grouped_topk`` runs the classic two-stage refinement instead:

1. stage 1 ranks within (group, spark_partition_id()) — parallelism is
   the full partition count, and any member of the global top-k is by
   definition in the top-k of whatever partition it lands in, so the
   pruning loses nothing;
2. stage 2 ranks the survivors (<= input_partitions x k rows per
   group, instead of the whole corpus) to produce the exact global
   rank with a deterministic tiebreak.

Output is identical to the single-window formulation for any dataset
(same rows, same ranks), so oracle hash checks are unaffected.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    """Exact top-k rows per group with rank column attached.

    ``order_cols`` must define a TOTAL order per group (include a
    tiebreak) — otherwise ranks are nondeterministic in any top-k
    formulation, not just this one."""
    staged = df.withColumn("__pid", F.spark_partition_id())
    w1 = Window.partitionBy(*group_cols, "__pid").orderBy(*order_cols)
    survivors = (
        staged.withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= k)
        .drop("__r1", "__pid")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return survivors.withColumn(rank_col, F.row_number().over(w2)).filter(
        F.col(rank_col) <= k
    )
