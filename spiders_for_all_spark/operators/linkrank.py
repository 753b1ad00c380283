"""Link-based frontier prioritization: deterministic integer PageRank.

A breadth-first frontier fetches in discovery order; a production crawler
orders it by link importance so high-value pages are fetched first
(PageRank — Page et al. 1999; OPIC — Abiteboul et al., WWW 2003 — both
public algorithms).  The reference has no link analysis at all: its
spiders walk fixed API pagination (core/spider.py:196-236).

Integer-space discipline: ranks are parts-per-million integers and every
update is integer multiply/divide —

    r_0(v)     = 1_000_000
    r_{t+1}(v) = 150_000 + sum over in-edges (u, v) of
                     (r_t(u) * 850_000) div (1_000_000 * outdeg(u))

(damping 0.85 expressed as 850_000/1_000_000).  Because the per-edge
contribution is floored BEFORE the sum and integer addition is
associative-commutative, any engine — any partitioning, any summation
order — produces bit-identical ranks, which is what lets an iterative
graph algorithm sit behind a DuckDB oracle at all (float PageRank sums
differ in the last ulp per partitioning).

Scale shape per iteration: one equi-join of the rank table to the edge
list on the source key + one partial-aggregatable sum keyed by
destination + one left join back to the node set (nodes with no in-links
keep the teleport floor).  No driver-side graph state; lineage is
truncated every ``checkpoint_every`` iterations exactly like
textdedup.connected_components (reliable ``checkpoint()`` when a
checkpoint dir is configured, ``localCheckpoint`` otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000
TELEPORT_PPM = 150_000
DAMPING_PPM = 850_000


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 3,
    checkpoint_every: int = 5,
) -> DataFrame:
    """(node, rank_ppm) after ``n_iter`` integer PageRank rounds over the
    directed edge list.  Nodes = every endpoint of the edge list."""
    sc = edges.sparkSession.sparkContext
    reliable = sc.getCheckpointDir() is not None

    def _truncate(df: DataFrame) -> DataFrame:
        return df.checkpoint(eager=True) if reliable else df.localCheckpoint(
            eager=True
        )

    e = edges.select(
        F.col(src_col).cast("string").alias("src"),
        F.col(dst_col).cast("string").alias("dst"),
    )
    if n_iter > 1:
        # r06: e / deg / nodes are loop INVARIANTS, but each iteration's
        # plan re-expanded (and re-computed) their subtrees.  Materialize
        # them once, hash-partitioned on their join keys: deg derives
        # from the src-partitioned e without another exchange, and the
        # per-iteration joins against e (src) and nodes (node) then
        # reuse the materialized partitioning — each iteration pays only
        # its two inherent exchanges (ranks→src, contribution agg→node).
        # localCheckpoint also truncates the growing lineage (same role
        # as the existing checkpoint_every, now from iteration 0).
        par = edges.sparkSession.sparkContext.defaultParallelism
        e = _truncate(e.repartition(par, F.col("src")))
    deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if n_iter > 1:
        deg = _truncate(deg)
        nodes = _truncate(nodes)
    ranks = nodes.withColumn("rank_ppm", F.lit(PPM).cast("bigint"))
    for i in range(n_iter):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"(rank_ppm * CAST({DAMPING_PPM} AS BIGINT))"
                    f" div (CAST({PPM} AS BIGINT) * outdeg)"
                ).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_ppm"))
        )
        ranks = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(TELEPORT_PPM).cast("bigint")
                + F.coalesce(F.col("in_ppm"), F.lit(0))
            ).alias("rank_ppm"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < n_iter:
            ranks = _truncate(ranks)
    return ranks


def rank_frontier(
    frontier: DataFrame,
    ranks: DataFrame,
    url_col: str = "url",
    node_col: str = "node",
) -> DataFrame:
    """Attach link-rank priority to a frontier: unmatched URLs get the
    teleport floor (a never-linked page is still worth fetching, last)."""
    return frontier.join(
        ranks.withColumnRenamed(node_col, url_col), url_col, "left"
    ).withColumn(
        "rank_ppm",
        F.coalesce(F.col("rank_ppm"), F.lit(TELEPORT_PPM).cast("bigint")),
    )
