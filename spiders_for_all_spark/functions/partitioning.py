"""Width guard for compute-heavy per-row stages.

A catalog-scale documents/embeddings table is one small parquet file, so
its scan plans as ONE task — and every interpreted HOF / regex / hash in
the projection above it runs serially no matter how many cores the
session has.  ``ensure_width`` hash-repartitions such an input up to the
session's default parallelism, and is a NO-OP whenever the source is
already at least that wide (the real-cluster case: a 100 TB table scans
as thousands of splits, where an extra shuffle of the corpus would be
pure waste).  Scale-adaptive by construction: the target derives from
the session, never a constant (guide §2).

Only apply it where per-row work dominates and the downstream
aggregation is partitioning-safe (integer counts, min/max/struct
keepers, per-row maps, or per-key windows) — hash partitioning by the
row key keeps each key's rows in one task, in one deterministic map
order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ensure_width(df: DataFrame, key: str | Column) -> DataFrame:
    """Hash-repartition ``df`` by ``key`` to the session default
    parallelism iff the current plan has fewer partitions than that.

    The width probe runs with AQE disabled: under AQE, ``df.rdd`` on a
    plan that contains an exchange EXECUTES the upstream query stages
    eagerly (AdaptiveSparkPlanExec finalizes on RDD conversion) — a
    whole wasted job per probe.  Non-adaptive RDD conversion is pure
    planning (zero jobs), and its static partition count makes the right
    call either way: a plan with an exchange below reports the session
    shuffle partitioning (already wide -> no-op), a bare scan reports
    its file splits.
    """
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        n = df.rdd.getNumPartitions()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    if n >= par:
        return df
    k = F.col(key) if isinstance(key, str) else key
    return df.repartition(par, k)
