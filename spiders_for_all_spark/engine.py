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
    # True routes the bloom probe through the cogrouped partition-wise path
    # (dedup.seen_anti_join_bloom_partitioned): no driver collect/broadcast of
    # the bitmap table — required once the bitmaps outgrow driver memory
    # (~GBs at 10^10 keys); the broadcast path is faster while they fit.
    bloom_partitioned: bool = False
    n_buckets: int = D.DEFAULT_BUCKETS
    bloom_expected_per_bucket: int = 10_000
    # fold append-only seen/fetch_log deltas back into one dir every N rounds
    # (Iceberg rewrite_data_files): keeps file counts bounded on long crawls
    compact_every: int = 64
    # pinned ISO timestamp for create_at/update_at (deterministic tests);
    # None = wall clock (F.current_timestamp()), the production default
    pinned_now: str | None = None


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
            if cfg.bloom_partitioned:
                candidates = D.seen_anti_join_bloom_partitioned(
                    frontier, seen, bloom, cfg.n_buckets
                )
            else:
                candidates = D.seen_anti_join_bloom(
                    frontier, seen, bloom, cfg.n_buckets
                )
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

        # 6. documents MERGE (K2 upsert semantics): bucketed copy-on-write —
        # only the doc_id buckets this round touches are rewritten.
        # create_at survives updates, update_at is refreshed (F7 lineage).
        now = (
            F.lit(cfg.pinned_now).cast("timestamp")
            if cfg.pinned_now
            else F.current_timestamp()
        )
        docs = DOCS.docs_from_parsed(ok).withColumns(
            {"create_at": now, "update_at": now}
        )
        staged_docs = storage.stage_merge(
            "documents", docs, key="doc_id", keep_on_match=["create_at"]
        )

        # 7. successors + retries -> next frontier
        succ = FR.successors(ok, round_no + 1, cfg.max_depth)
        retries = FR.normalize_frontier(
            failed.filter(F.col("attempt") + 1 < cfg.max_attempts).withColumn(
                "attempt", F.col("attempt") + 1
            )
        )
        dead = failed.filter(F.col("attempt") + 1 >= cfg.max_attempts)

        # 8. seen += successfully fetched + dead-lettered (retries stay
        # unseen).  These rows survived the anti-join, so they are disjoint
        # from `seen` and unique (frontier is url_hash-unique): the commit is
        # a pure APPEND of O(fetched-this-round) rows — never a rewrite of
        # the full seen set (VERDICT r01 item 3).
        seen_delta = D.with_bucket(
            ok.select("url_hash").unionByName(dead.select("url_hash")),
            cfg.n_buckets,
        )
        staged_seen = storage.stage_append("seen", seen_delta)

        # 9. fetch_log lineage (A1 metrics, per partition) — append-only:
        # a crawl of R rounds writes O(rows-per-round), not O(R^2)
        # (VERDICT r01 item 2).
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
            "media_ref",
            "n_chunks",
            F.length("media_bytes").cast("long").alias("bytes_fetched"),
        )
        staged_log = storage.stage_append("fetch_log", log_rows)

        # 10. next frontier: unscheduled remainder ∪ successors ∪ retries,
        # minus anything now seen (old seen ∪ this round's delta), one row
        # per url_hash
        remainder = frontier.join(
            scheduled.select("url_hash"), on="url_hash", how="left_anti"
        )
        next_frontier = (
            FR.dedup_frontier(remainder.unionByName(succ).unionByName(retries))
            .join(seen_delta.select("url_hash"), on="url_hash", how="left_anti")
            .join(seen.select("url_hash"), on="url_hash", how="left_anti")
        )
        staged_frontier = storage.stage_overwrite("frontier", next_frontier)

        # 11. ONE atomic catalog flip commits the whole round: a crash
        # anywhere above leaves every table at round N-1 — no partial round
        # is ever visible, so resume never loses successors or retry state.
        counts = parsed.agg(
            F.count("*").alias("sched"),
            F.sum(ok_cond().cast("int")).alias("ok"),
            F.sum((~ok_cond()).cast("int")).alias("failed"),
            F.sum(
                (~ok_cond() & (F.col("attempt") + 1 >= cfg.max_attempts)).cast("int")
            ).alias("dead"),
        ).collect()[0]
        storage.commit_multi([staged_docs, staged_seen, staged_log, staged_frontier])

        # maintenance: fold append deltas back into one dir periodically
        if cfg.compact_every and (round_no + 1) % cfg.compact_every == 0:
            storage.compact("seen")
            storage.compact("fetch_log")

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
