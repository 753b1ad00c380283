"""Largest-remainder crawl-budget apportionment (politeness.py
apportion_budget): integer-exact, sum-preserving, quota-respecting."""

from __future__ import annotations

from pyspark.sql import functions as F

from spiders_for_all_spark.operators.politeness import apportion_budget


def _frontier(spark, counts: dict[str, int]):
    rows = [(h, f"https://{h}/p{i}") for h, n in counts.items() for i in range(n)]
    return spark.createDataFrame(rows, "host string, url string")


def test_apportion_ties_break_by_key(spark):
    out = {r["host"]: r["budget"] for r in apportion_budget(
        _frontier(spark, {"a": 1, "b": 1, "c": 1}), 10
    ).collect()}
    # base 3 each, one leftover slot -> lowest key wins the tie
    assert out == {"a": 4, "b": 3, "c": 3}


def test_apportion_sum_exact_and_quota_rule(spark):
    counts = {f"h{i:02d}": (i * 37) % 11 + 1 for i in range(17)}
    total = 1000
    rows = apportion_budget(_frontier(spark, counts), total).collect()
    assert sum(r["budget"] for r in rows) == total
    w_sum = sum(counts.values())
    for r in rows:
        exact = counts[r["host"]] * total / w_sum
        # largest-remainder satisfies the quota rule: floor <= b <= ceil
        assert int(exact) <= r["budget"] <= int(exact) + 1
        assert r["n_pending"] == counts[r["host"]]


def test_apportion_weight_col(spark):
    df = spark.createDataFrame(
        [("a", 30), ("b", 60), ("c", 10)], "host string, rank_ppm int"
    )
    out = {r["host"]: r["budget"] for r in apportion_budget(
        df, 100, weight_col="rank_ppm"
    ).collect()}
    assert out == {"a": 30, "b": 60, "c": 10}


def test_apportion_budget_smaller_than_hosts(spark):
    """total < #hosts: only the largest-remainder hosts get a slot."""
    out = {r["host"]: r["budget"] for r in apportion_budget(
        _frontier(spark, {"a": 5, "b": 5, "c": 1}), 2
    ).collect()}
    assert sum(out.values()) == 2
    assert out["a"] == 1 and out["b"] == 1 and out["c"] == 0
