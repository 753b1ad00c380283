"""Adaptive recrawl scheduling: freshness-driven next-fetch times.

A production crawler does not fetch every known URL every round — it
estimates each URL's change rate from its fetch history and schedules the
next fetch with exponential backoff while the content is stable, snapping
back to the base interval the moment it changes (the classic
freshness-crawling policy from Cho & Garcia-Molina, "Synchronizing a
database to improve freshness", SIGMOD 2000 — public algorithm; the
reference has no recrawl support at all: its spiders re-fetch everything
on every run, core/spider.py:196-236).

Executable spec (deterministic, integer-space so any engine reproduces it
bit-for-bit):

* order each URL's fetches by (ts, fetch_id);
* a fetch is a CHANGE when its content fingerprint differs from the
  previous fetch's (the first fetch counts as a change);
* ``unchanged_streak`` = number of fetches after the most recent change;
* ``interval_s = base_s << min(streak, max_doublings)`` — integer shift,
  never float pow;
* ``next_fetch_us = last_fetch_us + interval_s * 1_000_000``.

Scale shape: ONE shuffle on the URL key for the ordering window; the
per-URL aggregate that follows reuses the same hash partitioning, so
Catalyst inserts no second exchange.  Everything is whole-stage-codegen
expressions — no Python, no explode, no join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def recrawl_schedule(
    fetches: DataFrame,
    url_col: str = "url_id",
    ts_col: str = "ts",
    fp_col: str = "fingerprint",
    id_col: str = "fetch_id",
    base_s: int = 3600,
    max_doublings: int = 6,
) -> DataFrame:
    """Per-URL recrawl schedule from a fetch-history table.

    Returns (url, n_fetches, n_changes, unchanged_streak, interval_s,
    next_fetch_us) — one row per URL, integer columns throughout.
    """
    w = Window.partitionBy(url_col).orderBy(ts_col, id_col)
    prev_fp = F.lag(fp_col).over(w)
    changed = F.when(
        prev_fp.isNull() | (F.col(fp_col) != prev_fp), 1
    ).otherwise(0)
    rows = fetches.select(
        url_col,
        F.col(ts_col).cast("timestamp").alias("_ts"),
        changed.alias("_chg"),
        F.row_number().over(w).alias("_rn"),
    )
    streak = (
        F.count("*") - F.max(F.when(F.col("_chg") == 1, F.col("_rn")))
    ).cast("bigint")
    interval_s = F.expr(
        f"CAST(shiftleft(CAST({base_s} AS BIGINT), "
        f"CAST(least(_streak, {max_doublings}) AS INT)) AS BIGINT)"
    )
    agg = rows.groupBy(url_col).agg(
        F.count("*").alias("n_fetches"),
        F.sum("_chg").cast("bigint").alias("n_changes"),
        streak.alias("_streak"),
        F.unix_micros(F.max("_ts")).alias("_last_us"),
    )
    return agg.select(
        url_col,
        "n_fetches",
        "n_changes",
        F.col("_streak").alias("unchanged_streak"),
        interval_s.alias("interval_s"),
        (F.col("_last_us") + interval_s * F.lit(1_000_000)).alias(
            "next_fetch_us"
        ),
    )
