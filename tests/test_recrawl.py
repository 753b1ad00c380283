from __future__ import annotations

from datetime import datetime

from spiders_for_all_spark.operators.recrawl import recrawl_schedule


def _hist(spark, rows):
    return spark.createDataFrame(
        [(u, datetime(2024, 1, 1, 0, 0, s), i, fp) for (u, s, i, fp) in rows],
        "url_id bigint, ts timestamp, fetch_id bigint, fingerprint string",
    )


def test_recrawl_backoff_doubles_while_unchanged(spark):
    # url 1: change, then 3 stable fetches -> streak 3, interval 3600<<3
    # url 2: changes every fetch -> streak 0, interval 3600
    h = _hist(
        spark,
        [
            (1, 0, 0, "a"),
            (1, 10, 1, "a"),
            (1, 20, 2, "a"),
            (1, 30, 3, "a"),
            (2, 0, 4, "x"),
            (2, 10, 5, "y"),
            (2, 20, 6, "z"),
        ],
    )
    out = {
        r["url_id"]: r.asDict() for r in recrawl_schedule(h, base_s=3600).collect()
    }
    assert out[1]["n_fetches"] == 4
    assert out[1]["n_changes"] == 1
    assert out[1]["unchanged_streak"] == 3
    assert out[1]["interval_s"] == 3600 * 8
    assert out[2]["n_changes"] == 3
    assert out[2]["unchanged_streak"] == 0
    assert out[2]["interval_s"] == 3600


def test_recrawl_change_resets_streak(spark):
    # stable, stable, CHANGE, stable -> streak counts from the change: 1
    h = _hist(
        spark,
        [(5, 0, 0, "a"), (5, 10, 1, "a"), (5, 20, 2, "b"), (5, 30, 3, "b")],
    )
    row = recrawl_schedule(h, base_s=100).collect()[0]
    assert row["n_changes"] == 2
    assert row["unchanged_streak"] == 1
    assert row["interval_s"] == 200


def test_recrawl_backoff_is_capped(spark):
    rows = [(9, 0, 0, "a")] + [(9, 4 * i, i, "a") for i in range(1, 12)]
    row = recrawl_schedule(_hist(spark, rows), base_s=60, max_doublings=6).collect()[0]
    assert row["unchanged_streak"] == 11
    assert row["interval_s"] == 60 << 6  # capped, not 60 << 11


def test_recrawl_next_fetch_is_last_ts_plus_interval(spark):
    h = _hist(spark, [(3, 0, 0, "a"), (3, 30, 1, "a")])
    row = recrawl_schedule(h, base_s=10).collect()[0]
    last_us = int(datetime(2024, 1, 1, 0, 0, 30).timestamp() * 1_000_000)
    assert row["next_fetch_us"] == last_us + 20 * 1_000_000


def test_recrawl_single_exchange(spark):
    # the ordering window and the per-url aggregate share hash(url_id):
    # exactly ONE shuffle in the whole plan
    h = _hist(spark, [(1, 0, 0, "a"), (1, 10, 1, "b"), (2, 0, 2, "x")])
    plan = recrawl_schedule(h)._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan
