from __future__ import annotations

from spiders_for_all_spark.operators.linkrank import (
    TELEPORT_PPM,
    pagerank,
    rank_frontier,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_pagerank_hand_computed_two_iterations(spark):
    # a -> b, a -> c, b -> a; c dangling (contributes nothing).
    # r0 = 1_000_000 each.
    # r1(a) = 150k + (1e6*850k)//(1e6*1)        = 1_000_000   (from b)
    # r1(b) = 150k + (1e6*850k)//(1e6*2)        =   575_000   (from a)
    # r1(c) = 575_000
    # r2(a) = 150k + (575_000*850_000)//1_000_000 = 638_750
    # r2(b) = 150k + (1_000_000*850_000)//2_000_000 = 575_000
    e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "a")])
    r1 = {r["node"]: r["rank_ppm"] for r in pagerank(e, n_iter=1).collect()}
    assert r1 == {"a": 1_000_000, "b": 575_000, "c": 575_000}
    r2 = {r["node"]: r["rank_ppm"] for r in pagerank(e, n_iter=2).collect()}
    assert r2 == {"a": 638_750, "b": 575_000, "c": 575_000}


def test_pagerank_hub_outranks_leaves(spark):
    # star pointing at h: every leaf links to h, h links back to l0 only
    e = _edges(
        spark,
        [(f"l{i}", "h") for i in range(5)] + [("h", "l0")],
    )
    r = {x["node"]: x["rank_ppm"] for x in pagerank(e, n_iter=3).collect()}
    assert r["h"] > r["l0"] > r["l1"]
    assert r["l1"] == r["l4"]  # symmetric leaves tie exactly (integer space)


def test_pagerank_deterministic_across_partitionings(spark):
    # integer floors before sums -> identical ranks under any layout
    pairs = [(f"n{i}", f"n{(i * 3 + 1) % 40}") for i in range(40)]
    a = pagerank(_edges(spark, pairs).repartition(1), n_iter=4).collect()
    b = pagerank(_edges(spark, pairs).repartition(16), n_iter=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_rank_frontier_unlinked_gets_teleport_floor(spark):
    e = _edges(spark, [("u1", "u2")])
    ranks = pagerank(e, n_iter=1)
    frontier = spark.createDataFrame(
        [("u1",), ("u2",), ("u_new",)], "url string"
    )
    out = {r["url"]: r["rank_ppm"] for r in rank_frontier(frontier, ranks).collect()}
    assert out["u_new"] == TELEPORT_PPM
    assert out["u2"] > out["u_new"]
