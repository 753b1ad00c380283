"""A1 — crawl metrics over the fetch_log lineage table.

The reference tallies ``success_count``/``failed_count`` in memory
(reference: core/downloader.py:501-502,592-609); here metrics are plain
aggregations over the committed ``fetch_log`` snapshots, so they are
queryable per round, per partition, and after a resume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def round_metrics(fetch_log: DataFrame) -> DataFrame:
    ok = F.col("error").isNull()
    return fetch_log.groupBy("round").agg(
        F.count("*").alias("fetched"),
        F.sum(ok.cast("int")).alias("ok"),
        F.sum((~ok).cast("int")).alias("failed"),
        F.sum(F.col("dead_letter").cast("int")).alias("dead_lettered"),
        F.round(F.avg("latency_ms"), 3).alias("avg_latency_ms"),
        F.countDistinct("partition_id").alias("n_partitions"),
    )


def partition_metrics(fetch_log: DataFrame) -> DataFrame:
    """Per-(round, partition) lineage — the north_rule's per-partition
    fetch/parse metrics."""
    return fetch_log.groupBy("round", "partition_id").agg(
        F.count("*").alias("fetched"),
        F.sum(F.col("error").isNull().cast("int")).alias("ok"),
        F.round(F.avg("latency_ms"), 3).alias("avg_latency_ms"),
    )


def error_breakdown(fetch_log: DataFrame) -> DataFrame:
    return (
        fetch_log.filter(F.col("error").isNotNull())
        .groupBy("error")
        .agg(F.count("*").alias("n"), F.max("round").alias("last_round"))
    )
