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
    parallelism iff the current plan has fewer partitions than that."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= par:
        return df
    k = F.col(key) if isinstance(key, str) else key
    return df.repartition(par, k)
