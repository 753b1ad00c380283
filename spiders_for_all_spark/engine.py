"""The crawl engine: one Catalyst-planned job per round, state in snapshots.

Replaces the reference's ``run() = before(); save_items(get_items()); after``
driver (reference: core/spider.py:245-248,295-327) with the round loop of
SURVEY §3.1:

    frontier -> anti-join seen (exact, or bloom+exact-confirm)
             -> robots gate (broadcast join)
             -> politeness window top-k per host (salted when skewed)
             -> fetch  (mapInPandas, partitioned by host)
             -> parse  (mapInPandas, Arrow-batched)
             -> documents MERGE (upsert by doc_id)
             -> successors/retries -> next frontier
             -> seen += fetched; fetch_log += lineage
             -> snapshot commit (resumable checkpoint, north_rule)

All loop state (page/cursor positions the reference keeps on spider objects)
lives in frontier columns; a killed run resumes from the last committed
snapshot with zero loss (§3.4).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spiders_for_all_spark.operators import dedup as D
from spiders_for_all_spark.operators import documents as DOCS
from spiders_for_all_spark.operators import frontier as FR
from spiders_for_all_spark.operators import parse as P
from spiders_for_all_spark.operators import politeness as POL
from spiders_for_all_spark.storage import SnapshotStorage


@dataclass
class CrawlConfig:
    max_rounds: int = 50
    default_budget: int = 2
    max_attempts: int = 3  # attempts per URL before dead-letter
    max_depth: int = 3
    total_doc_cap: int | None = None  # A2: global stop condition
    salt_n: int = 1  # >1 enables two-phase salted scheduling
    use_bloom: bool = False
    partition_seen_by_bucket: bool = False  # bucket-partitioned snapshots (PLANS.md)
    n_buckets: int = D.DEFAULT_BUCKETS
    bloom_expected_per_bucket: int = 10_000


@dataclass
class RoundStats:
    round_no: int
    scheduled: int
    ok: int
    failed: int
    dead_lettered: int
    new_docs_total: int
    frontier_size: int


@dataclass
class CrawlStats:
    rounds: list[RoundStats] = field(default_factory=list)

    @property
    def total_fetched(self) -> int:
        return sum(r.scheduled for r in self.rounds)


def ok_cond():
    return (
        (F.col("status") == 200)
        & (F.col("code") == 0)
        & F.col("success")
        & F.col("parse_error").isNull()
    )


class Crawler:
    def __init__(
        self,
        spark: SparkSession,
        storage: SnapshotStorage,
        fetcher,
        config: CrawlConfig | None = None,
        robots: DataFrame | None = None,
        host_budget: DataFrame | None = None,
    ):
        self.spark = spark
        self.storage = storage
        self.fetcher = fetcher
        self.config = config or CrawlConfig()
        self.robots = robots
        self.host_budget = host_budget

    # ------------------------------------------------------------------
    def bootstrap(self, seeds: list[dict]) -> None:
        frontier = FR.dedup_frontier(FR.seeds_to_frontier(self.spark, seeds))
        self.storage.commit("frontier", frontier)
        if self.storage.latest_snapshot("seen") is None:
            self.storage.commit("seen", self.storage.empty("seen"))
        if self.storage.latest_snapshot("fetch_log") is None:
            self.storage.commit("fetch_log", self.storage.empty("fetch_log"))
        if self.storage.latest_snapshot("documents") is None:
            self.storage.commit("documents", self.storage.empty("documents"))

    def next_round_no(self) -> int:
        log = self.storage.read("fetch_log")
        row = log.agg(F.max("round").alias("m")).collect()[0]
        return 0 if row["m"] is None else int(row["m"]) + 1

    # ------------------------------------------------------------------
    def run(self, seeds: list[dict] | None = None, max_rounds: int | None = None) -> CrawlStats:
        if seeds is not None:
            self.bootstrap(seeds)
        stats = CrawlStats()
        limit = max_rounds if max_rounds is not None else self.config.max_rounds
        round_no = self.next_round_no()
        for _ in range(limit):
            rs = self.run_round(round_no)
            stats.rounds.append(rs)
            if rs.scheduled == 0:
                break
            cap = self.config.total_doc_cap
            if cap is not None and rs.new_docs_total >= cap:
                break
            round_no += 1
        return stats

    # ------------------------------------------------------------------
    def run_round(self, round_no: int) -> RoundStats:
        cfg = self.config
        storage = self.storage
        frontier = storage.read("frontier")
        seen = storage.read("seen")

        # 1. J1 — seen anti-join (bloom prefilter + exact confirm at scale)
        if cfg.use_bloom:
            bloom = D.build_bloom(
                seen, cfg.n_buckets, cfg.bloom_expected_per_bucket
            )
            candidates = D.seen_anti_join_bloom(frontier, seen, bloom, cfg.n_buckets)
        else:
            candidates = D.seen_anti_join(frontier, seen)

        # 2. robots gate (broadcast) + 3. politeness priority queue
        candidates = POL.robots_gate(candidates, self.robots)
        scheduled = POL.schedule_round(
            candidates, self.host_budget, cfg.default_budget, cfg.salt_n
        ).drop("sched_rank")

        # 4-5. fetch + parse (two Arrow-batched python stages, one task chain)
        parsed = P.parse_stage(self.fetcher.fetch(scheduled))
        parsed = parsed.localCheckpoint(eager=True)  # fetch exactly once

        ok = parsed.filter(ok_cond())
        failed = parsed.filter(~ok_cond())

        # 6. documents MERGE (K2 upsert semantics)
        docs = DOCS.docs_from_parsed(ok)
        storage.merge_upsert("documents", docs, key="doc_id")

        # 7. successors + retries -> next frontier
        succ = FR.successors(ok, round_no + 1, cfg.max_depth)
        retries = FR.normalize_frontier(
            failed.filter(F.col("attempt") + 1 < cfg.max_attempts).withColumn(
                "attempt", F.col("attempt") + 1
            )
        )
        dead = failed.filter(F.col("attempt") + 1 >= cfg.max_attempts)

        # 8. seen += successfully fetched + dead-lettered (retries stay unseen)
        fetched_done = ok.select("url_hash").unionByName(dead.select("url_hash"))
        new_seen = D.with_bucket(
            seen.select("url_hash").unionByName(fetched_done).distinct(),
            cfg.n_buckets,
        )

        # 9. fetch_log lineage (A1 success/failure metrics, per partition)
        log_rows = parsed.select(
            "url",
            "url_hash",
            F.lit(round_no).alias("round"),
            "status",
            "code",
            F.coalesce(
                F.col("error"),
                F.col("parse_error"),
                F.when(F.col("code") != 0, F.concat(F.lit("business_code_"), F.col("code"))),
            ).alias("error"),
            "attempt",
            "latency_ms",
            "partition_id",
            (~ok_cond() & (F.col("attempt") + 1 >= cfg.max_attempts)).alias("dead_letter"),
        )
        full_log = storage.read("fetch_log").unionByName(log_rows)

        # 10. next frontier: unscheduled remainder ∪ successors ∪ retries,
        # minus anything now seen, one row per url_hash
        remainder = frontier.join(
            scheduled.select("url_hash"), on="url_hash", how="left_anti"
        )
        next_frontier = FR.dedup_frontier(
            remainder.unionByName(succ).unionByName(retries)
        ).join(new_seen.select("url_hash"), on="url_hash", how="left_anti")

        # 11. snapshot commits = the resumable checkpoint for this round
        counts = parsed.agg(
            F.count("*").alias("sched"),
            F.sum(ok_cond().cast("int")).alias("ok"),
            F.sum((~ok_cond()).cast("int")).alias("failed"),
            F.sum(
                (~ok_cond() & (F.col("attempt") + 1 >= cfg.max_attempts)).cast("int")
            ).alias("dead"),
        ).collect()[0]
        storage.commit(
            "seen",
            new_seen,
            partition_by=["bucket"] if cfg.partition_seen_by_bucket else None,
        )
        storage.commit("fetch_log", full_log)
        storage.commit("frontier", next_frontier)
        # docs total only matters for the A2 cap check — avoid the extra job
        # otherwise (each driver-side action is a full Spark job per round)
        n_docs = (
            storage.read("documents").count()
            if cfg.total_doc_cap is not None
            else -1
        )
        return RoundStats(
            round_no=round_no,
            scheduled=int(counts["sched"]),
            ok=int(counts["ok"] or 0),
            failed=int(counts["failed"] or 0),
            dead_lettered=int(counts["dead"] or 0),
            new_docs_total=n_docs,
            frontier_size=-1,
        )
