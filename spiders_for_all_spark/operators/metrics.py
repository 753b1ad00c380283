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
        # Pure integer micro-units end-to-end: even round(avg(...)) touches a
        # float whose half-way behavior is engine/version-sensitive
        # (CORRECTNESS_r04: hash_match=false only in the driver env).  All
        # latencies are non-negative, so truncating `div` == floor == DuckDB
        # `//` — no float ever touches the column.
        F.expr("(sum(latency_ms) * 1000L) div count(*)")
        .cast("bigint")
        .alias("avg_latency_us"),
        F.countDistinct("partition_id").alias("n_partitions"),
    )


def partition_metrics(fetch_log: DataFrame) -> DataFrame:
    """Per-(round, partition) lineage — the north_rule's per-partition
    fetch/parse metrics."""
    return fetch_log.groupBy("round", "partition_id").agg(
        F.count("*").alias("fetched"),
        F.sum(F.col("error").isNull().cast("int")).alias("ok"),
        # Integer division, same rationale as round_metrics.
        F.expr("(sum(latency_ms) * 1000L) div count(*)")
        .cast("bigint")
        .alias("avg_latency_us"),
    )


def politeness_pacing(
    fetch_log: DataFrame, round_seconds: float
) -> DataFrame:
    """Per-(round, host) achieved fetch rate at a given round cadence.

    The politeness *budget* (top-k per host per round) only bounds a host's
    request RATE when divided by the round wall-clock: at ``round_seconds``
    per round, a budget of B means <= B/round_seconds URLs/host/sec.  This
    metric computes the achieved urls_per_host_sec so a budget can be
    checked against a target rate (the reference's 3-11 s inter-request
    sleeps correspond to ~0.09-0.33 URLs/host/sec — BASELINE.md row 3).
    """
    from spiders_for_all_spark.functions.urls import url_host

    per_host = fetch_log.groupBy(
        "round", url_host(F.col("url")).alias("host")
    ).agg(F.count("*").alias("fetched"))
    return per_host.select(
        "round",
        "host",
        "fetched",
        F.round(F.col("fetched") / F.lit(float(round_seconds)), 6).alias(
            "urls_per_host_sec"
        ),
    )


def error_breakdown(fetch_log: DataFrame) -> DataFrame:
    return (
        fetch_log.filter(F.col("error").isNotNull())
        .groupBy("error")
        .agg(F.count("*").alias("n"), F.max("round").alias("last_round"))
    )
