"""The crawl engine: one Catalyst-planned job per round, state in snapshots.

Replaces the reference's ``run() = before(); save_items(get_items()); after``
driver (reference: core/spider.py:245-248,295-327) with the round loop of
SURVEY §3.1:

    frontier -> anti-join seen (exact | incremental bloom | deletable
                cuckoo, each + exact-confirm; eviction tombstones subtracted)
             -> robots gate (broadcast join)
             -> politeness window top-k per host (per-host salting for
                hot hosts only)
             -> fetch  (mapInPandas, partitioned by host; media streams to
                the warehouse file sink, never into a column)
             -> parse  (pure Catalyst)
             -> columnar scratch spill (each downstream job prunes columns)
             -> documents MERGE (merge-on-read delta, upsert by doc_id)
             -> media_meta (payloads sniffed from sink files)
             -> successors/retries -> next frontier
             -> seen += fetched; fetch_log += lineage; bloom |= delta
             -> ONE atomic multi-table snapshot commit (resumable
                checkpoint, north_rule); periodic compaction + expiry

All loop state (page/cursor positions the reference keeps on spider objects)
lives in frontier columns; a killed run resumes from the last committed
snapshot with zero loss (§3.4).
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spiders_for_all_spark.operators import dedup as D
from spiders_for_all_spark.operators import documents as DOCS
from spiders_for_all_spark.operators import frontier as FR
from spiders_for_all_spark.operators import multimodal as MM
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
    # maintain the bloom as a committed table, OR-merging each round's
    # seen-delta bloom (O(delta)/round) instead of re-scanning the full
    # seen set per round; full rebuild + resize happens at compaction
    bloom_incremental: bool = True
    # cuckoo-filter seen prefilter instead of bloom: supports DELETIONS, so
    # re-crawl eviction (evict()) removes hashes from the probe filter
    # itself rather than relying on the exact-confirm alone (north_star:
    # "cuckoo-filter fallback for deletions")
    use_cuckoo: bool = False
    # maintain the cuckoo filter as a committed table (mirror of
    # bloom_incremental): each round bulk-inserts just the seen DELTA
    # cogrouped (O(delta)/round) instead of rebuilding the filter from the
    # full seen set — the last O(|seen|)-per-round job in the engine
    # (VERDICT r03 item 2); evict() deletes fingerprints in the same
    # atomic flip as its tombstones; full rebuild+resize at compaction
    cuckoo_incremental: bool = True
    n_buckets: int = D.DEFAULT_BUCKETS
    bloom_expected_per_bucket: int = 10_000
    cuckoo_capacity_per_bucket: int = 10_000
    # fold append-only seen/fetch_log deltas back into one dir every N rounds
    # (Iceberg rewrite_data_files): keeps file counts bounded on long crawls
    compact_every: int = 64
    # snapshots kept per table at each maintenance pass (time-travel window);
    # 0 disables expiry and keeps all history
    expire_keep_last: int = 8
    # pinned ISO timestamp for create_at/update_at (deterministic tests);
    # None = wall clock (F.current_timestamp()), the production default
    pinned_now: str | None = None
    # disable AQE for the duration of each round (set + restored around
    # run_round): every partitioning in a round is explicit (politeness
    # window hash(host), bucketed merges, balanced fetch), so AQE's
    # per-stage materialize->re-optimize barriers buy nothing and cost
    # width-independent driver time — measured 12-18% on the
    # commit-inclusive round and ~0.6 s/round on the pipeline (PLANS.md
    # "Fixed per-round cost").  None = leave the session setting alone.
    round_aqe: bool | None = False


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
        # default media to the warehouse file sink: bytes stream to files
        # INSIDE the fetch worker and never materialize in a plan column
        # (SURVEY §2 S6; VERDICT r02 wrong-item 3).  Only fetchers that
        # expose the knob and have it unset are defaulted — passing an
        # explicit sink (or a fetcher without one) is respected.
        if getattr(fetcher, "media_sink_dir", "absent") is None:
            fetcher.media_sink_dir = os.path.join(storage.warehouse, "_media")

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
        if self.storage.latest_snapshot("media_meta") is None:
            self.storage.commit("media_meta", self.storage.empty("media_meta"))

    # ------------------------------------------------------------------
    def evict(self, urls: list[str]) -> None:
        """Re-crawl eviction: logically delete ``urls`` from the seen set and
        re-enqueue them for fetching (north_star: cuckoo deletions).

        Seen stays append-only — eviction writes TOMBSTONES to the tiny
        ``evicted`` table instead of rewriting the 10^10-row seen set; the
        round loop subtracts them from the effective seen set, deletes them
        from the cuckoo probe filter (``use_cuckoo``), and clears each
        tombstone the moment its URL is re-fetched (its hash re-enters
        seen), so the table stays O(pending evictions).  The frontier
        re-enqueue and the tombstone append flip in ONE atomic commit.
        """
        rows = FR.seeds_to_frontier(self.spark, [{"url": u} for u in urls])
        staged_evicted = self.storage.stage_append(
            "evicted", rows.select("url_hash")
        )
        frontier = self.storage.read("frontier")
        staged_frontier = self.storage.stage_overwrite(
            "frontier", FR.dedup_frontier(frontier.unionByName(rows))
        )
        staged = [staged_evicted, staged_frontier]
        if self.storage.latest_snapshot("cuckoo") is not None:
            # the persisted probe filter drops the fingerprints in the
            # SAME flip as the tombstones — filter and tombstone view of
            # the live seen set can never diverge across a crash
            staged.append(
                self.storage.stage_overwrite(
                    "cuckoo",
                    D.cuckoo_delete(
                        self.storage.read("cuckoo"),
                        rows.select("url_hash"),
                        self.config.n_buckets,
                    ),
                )
            )
        self.storage.commit_multi(staged)

    def next_round_no(self) -> int:
        log = self.storage.read("fetch_log")
        row = log.agg(F.max("round").alias("m")).collect()[0]
        return 0 if row["m"] is None else int(row["m"]) + 1

    # ------------------------------------------------------------------
    def run(self, seeds: list[dict] | None = None, max_rounds: int | None = None) -> CrawlStats:
        if seeds is not None:
            self.bootstrap(seeds)
        # a crash mid-round can orphan a scratch spill dir; committed rounds
        # always delete theirs, so anything here is dead weight
        shutil.rmtree(
            os.path.join(self.storage.warehouse, "_scratch"), ignore_errors=True
        )
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
        if cfg.round_aqe is None:
            return self._run_round(round_no)
        prev = self.spark.conf.get("spark.sql.adaptive.enabled")
        self.spark.conf.set("spark.sql.adaptive.enabled", str(cfg.round_aqe).lower())
        try:
            return self._run_round(round_no)
        finally:
            self.spark.conf.set("spark.sql.adaptive.enabled", prev)

    def _run_round(self, round_no: int) -> RoundStats:
        cfg = self.config
        storage = self.storage
        frontier = storage.read("frontier")
        seen_all = storage.read("seen")
        evicted = (
            storage.read("evicted")
            if storage.latest_snapshot("evicted") is not None
            else None
        )
        # effective seen = appended history minus eviction tombstones; the
        # subtraction joins a 10^10-row table against an O(pending
        # evictions) one — broadcast-cheap, and skipped entirely until the
        # first evict() call
        seen = (
            seen_all.join(F.broadcast(evicted), on="url_hash", how="left_anti")
            if evicted is not None
            else seen_all
        )

        # 1. J1 — seen anti-join (bloom/cuckoo prefilter + exact confirm at
        # scale; the cuckoo path applies eviction DELETIONS to the filter)
        if cfg.use_cuckoo:
            if (
                cfg.cuckoo_incremental
                and storage.latest_snapshot("cuckoo") is not None
            ):
                # the filter was committed with last round's seen delta
                # (and evict() already removed tombstoned fingerprints) —
                # no O(|seen|) rebuild on the hot path
                cuckoo = storage.read("cuckoo")
            else:
                cuckoo = D.build_cuckoo(
                    seen_all, cfg.n_buckets, cfg.cuckoo_capacity_per_bucket
                )
                if evicted is not None:
                    cuckoo = D.cuckoo_delete(cuckoo, evicted, cfg.n_buckets)
            candidates = D.seen_anti_join_cuckoo(
                frontier, seen, cuckoo, cfg.n_buckets
            )
        elif cfg.use_bloom:
            if cfg.bloom_incremental and storage.latest_snapshot("bloom") is not None:
                # the filter was committed with last round's seen delta —
                # no O(|seen|) rebuild on the hot path
                bloom = storage.read("bloom")
                prow = bloom.select("n_bits", "n_hashes").first()
                bloom_sizing = (
                    (int(prow["n_bits"]), int(prow["n_hashes"])) if prow else None
                )
            else:
                bloom = D.build_bloom(
                    seen, cfg.n_buckets, cfg.bloom_expected_per_bucket
                )
                bloom_sizing = None
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

        # 2. robots gate (broadcast) + 3. politeness priority queue.
        # `candidates` (pre-gate) is reused below as the frontier remainder
        # base: it is the frontier MINUS the effective seen set, with
        # robots-blocked rows still present (they stay queued — robots can
        # change between rounds).
        gated = POL.robots_gate(candidates, self.robots)
        scheduled = POL.schedule_round(
            gated, self.host_budget, cfg.default_budget, cfg.salt_n
        ).drop("sched_rank")

        # 4-5. fetch + parse (two Arrow-batched python stages, one task
        # chain), spilled ONCE to a columnar scratch snapshot: fetch runs
        # exactly once, and every downstream job (docs, seen delta, log,
        # frontier) re-reads only the columns it needs instead of
        # re-scanning wide in-memory rows (localCheckpoint of the full-width
        # frame measured 6.1 s vs ~2 s for the parquet spill at 250k rows —
        # and media_bytes/body never enter the scratch at all).  The round's
        # counters ride the spill job as observe() metrics — no separate
        # counts job per round (VERDICT r03 item 4).
        from pyspark.sql import Observation

        parsed = P.parse_stage(self.fetcher.fetch(scheduled))
        scratch = os.path.join(
            storage.warehouse, "_scratch", f"round-{round_no:06d}"
        )
        obs = Observation()
        parsed.drop("media_bytes").observe(
            obs,
            F.count(F.lit(1)).alias("sched"),
            F.sum(ok_cond().cast("int")).alias("ok"),
            F.sum((~ok_cond()).cast("int")).alias("failed"),
            F.sum(
                (~ok_cond() & (F.col("attempt") + 1 >= cfg.max_attempts)).cast("int")
            ).alias("dead"),
            F.sum(
                (ok_cond() & F.col("media_ref").isNotNull()).cast("int")
            ).alias("media"),
        ).write.mode("overwrite").parquet(scratch)
        counts = obs.get
        parsed = self.spark.read.parquet(scratch)

        ok = parsed.filter(ok_cond())
        failed = parsed.filter(~ok_cond())

        # 6. documents MERGE (K2 upsert semantics): merge-on-read — the
        # round appends ONE keyed delta dir (O(docs-this-round) I/O, zero
        # reads); readers resolve last-writer-wins and the periodic
        # compaction folds deltas into the bucketed base, touching only
        # the buckets the deltas hit.  (Copy-on-write per round measured
        # 17.5x slower once uniformly-hashed doc_ids touch all buckets —
        # VERDICT r02 item 1.)  create_at survives updates, update_at is
        # refreshed (F7 lineage).
        now = (
            F.lit(cfg.pinned_now).cast("timestamp")
            if cfg.pinned_now
            else F.current_timestamp()
        )
        docs = DOCS.docs_from_parsed(ok).withColumns(
            {"create_at": now, "update_at": now}
        )
        # staging jobs are all independent reads of the scratch snapshot —
        # they are SUBMITTED CONCURRENTLY below (one driver thread each, the
        # standard multi-job pattern a cluster scheduler interleaves), which
        # turns the old serial stage-after-stage walk into one overlapped
        # window (measured ~9.6 s serial -> ~4 s at 250k rows)
        stage_jobs: list = [
            lambda: storage.stage_merge(
                "documents", docs, key="doc_id", keep_on_match=["create_at"],
                strategy="mor",
            )
        ]

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
        stage_jobs.append(lambda: storage.stage_append("seen", seen_delta))

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
            "bytes_fetched",
            "media_path",
        )
        stage_jobs.append(lambda: storage.stage_append("fetch_log", log_rows))

        # 10. next frontier: unscheduled candidate remainder ∪ retries ∪
        # genuinely-new successors, one row per url_hash.  Only the
        # SUCCESSORS leg can contain already-seen hashes — the committed
        # frontier is disjoint from the effective seen set by invariant
        # (it is written from this very expression, whose every leg is
        # seen-filtered; evict() only re-enqueues tombstoned hashes), and a
        # retry hash never entered seen (only ok/dead do).  So the seen
        # anti-join family runs over O(successors) rows instead of the full
        # frontier union, and the old whole-union ∖ seen_delta shuffle is
        # gone (the r03 plan paid 4 sequential full-frontier shuffles here;
        # this one pays 1 plus two branch-local ones).  The scheduled set
        # is read back from the scratch snapshot (fetch is 1:1, so parsed
        # carries exactly the scheduled url_hashes) — re-deriving it from
        # `scheduled` would re-run the whole politeness shuffle chain a
        # second time (measured 5.5 s of the 16 s round at 250k rows).
        # Remainder base is the RAW frontier snapshot, not `candidates`:
        # reusing the candidates plan re-executes the seen anti-join chain a
        # second time inside the frontier staging job.  The committed
        # invariant (frontier ∩ effective seen = ∅ — every next_frontier leg
        # below is seen-filtered) makes candidates == frontier row-for-row
        # for committed rounds, and the reference-semantics simulator
        # (simulator.py:186) ALREADY specifies the remainder as frontier ∖
        # scheduled, so this is the spec-exact form.  Cost: with the exact
        # anti-join config the dropped leg is a broadcast join (measured
        # equal within noise at 250k rows); with bloom/cuckoo it re-ran the
        # full-frontier cogrouped probe (shuffle + Arrow + Python) per round
        # — measured ~9% off the cuckoo commit round, and the probe chain
        # grows with |seen| at 10^10 scale.  A hand-injected frontier row
        # that is already seen stays queued (never scheduled — scheduling
        # still anti-joins) instead of being silently dropped, matching the
        # simulator.
        remainder = frontier.join(
            parsed.select("url_hash"), on="url_hash", how="left_anti"
        )
        succ_new = succ.join(
            seen_delta.select("url_hash"), on="url_hash", how="left_anti"
        )
        # the "minus old seen" leg goes through the SAME prefilter family as
        # the candidates anti-join: without it, this one join would still
        # shuffle the full 10^10-row seen set every round even with the
        # bloom/cuckoo paths on (the filters are row-identical to the exact
        # join, so the frontier is unchanged — golden-tested)
        if cfg.use_cuckoo:
            succ_new = D.seen_anti_join_cuckoo(succ_new, seen, cuckoo, cfg.n_buckets)
        elif cfg.use_bloom:
            if cfg.bloom_partitioned:
                succ_new = D.seen_anti_join_bloom_partitioned(
                    succ_new, seen, bloom, cfg.n_buckets
                )
            else:
                succ_new = D.seen_anti_join_bloom(succ_new, seen, bloom, cfg.n_buckets)
        else:
            succ_new = succ_new.join(
                seen.select("url_hash"), on="url_hash", how="left_anti"
            )
        next_frontier = FR.dedup_frontier(
            remainder.unionByName(retries).unionByName(succ_new)
        )
        stage_jobs.append(
            lambda: storage.stage_overwrite("frontier", next_frontier)
        )

        # 6b. media metadata: sniff every fetched media payload (from the
        # sink file, or inline bytes when no sink) into the typed media_meta
        # table — same atomic flip as the rest of the round.  Staged only
        # when the round actually fetched media (the count rode the spill
        # job's observe metrics): media-free rounds skip the whole job
        # instead of writing an empty delta dir every round.
        if int(counts["media"] or 0) > 0:
            media_rows = ok.filter(F.col("media_ref").isNotNull()).select(
                "url_hash", "media_ref", "media_path"
            )
            media_meta = MM.sniff_media_meta(media_rows, path_col="media_path").select(
                "url_hash",
                "media_ref",
                "media_path",
                F.lit(round_no).alias("round"),
                "n_bytes",
                "format",
                "media_kind",
            )
            stage_jobs.append(
                lambda: storage.stage_append("media_meta", media_meta)
            )
        if cfg.use_bloom and not cfg.use_cuckoo and cfg.bloom_incremental:
            # OR the round's delta into the persisted filter — O(delta)
            # work, committed in the same flip as the seen delta itself so
            # the filter and the set can never diverge across a crash
            delta_bloom = D.build_bloom(
                seen_delta, cfg.n_buckets, cfg.bloom_expected_per_bucket,
                params=bloom_sizing,
            )
            stage_jobs.append(
                lambda: storage.stage_overwrite(
                    "bloom", D.merge_blooms(bloom, delta_bloom)
                )
            )
        if cfg.use_cuckoo and cfg.cuckoo_incremental:
            # bulk-insert the round's delta into the persisted filter —
            # same O(delta) discipline and same atomic flip as the bloom
            stage_jobs.append(
                lambda: storage.stage_overwrite(
                    "cuckoo",
                    D.cuckoo_insert(
                        cuckoo, seen_delta, cfg.n_buckets,
                        cfg.cuckoo_capacity_per_bucket,
                    ),
                )
            )
        if evicted is not None:
            # clear tombstones whose URL was re-fetched this round (its hash
            # re-entered seen); the evicted table stays O(pending evictions)
            stage_jobs.append(
                lambda: storage.stage_overwrite(
                    "evicted",
                    evicted.join(
                        seen_delta.select("url_hash"), on="url_hash", how="left_anti"
                    ),
                )
            )

        # 11. run every staging job concurrently (each is an independent
        # Spark job over the scratch snapshot — the driver submits them from
        # worker threads and the scheduler interleaves their tasks), then
        # ONE atomic catalog flip commits the whole round: a crash anywhere
        # above leaves every table at round N-1 — no partial round is ever
        # visible, so resume never loses successors or retry state.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=len(stage_jobs)) as ex:
            staged = list(ex.map(lambda job: job(), stage_jobs))
        storage.commit_multi(staged)
        shutil.rmtree(scratch, ignore_errors=True)
        # frontier is overwritten every round — expire superseded snapshots
        # now (pure os-level dir removal) instead of letting up to
        # compact_every full frontier copies pile up between maintenance
        # passes; other tables expire in the maintenance block below
        if cfg.expire_keep_last:
            storage.expire_snapshots("frontier", keep_last=cfg.expire_keep_last)
            if storage.latest_snapshot("bloom") is not None:
                # like frontier, the bloom table is overwritten per round
                storage.expire_snapshots("bloom", keep_last=cfg.expire_keep_last)
            if storage.latest_snapshot("cuckoo") is not None:
                storage.expire_snapshots("cuckoo", keep_last=cfg.expire_keep_last)

        # maintenance: fold append/MoR deltas periodically (size-tiered for
        # the append tables, touched-buckets-only for documents) and expire
        # superseded snapshots so warehouse bytes stay O(live data)
        if cfg.compact_every and (round_no + 1) % cfg.compact_every == 0:
            storage.compact("seen")
            storage.compact("fetch_log")
            storage.compact("documents")
            storage.compact("media_meta")
            if cfg.use_bloom and not cfg.use_cuckoo and cfg.bloom_incremental:
                # full rebuild RESIZES the filter to the grown seen set so
                # fpp stays bounded over a long crawl (the incremental ORs
                # keep the size fixed between rebuilds)
                seen_now = storage.read("seen")
                per_bucket = max(
                    cfg.bloom_expected_per_bucket,
                    int(seen_now.count() * 1.25) // max(cfg.n_buckets, 1) + 1,
                )
                storage.commit(
                    "bloom",
                    D.build_bloom(seen_now, cfg.n_buckets, per_bucket),
                )
            if cfg.use_cuckoo and cfg.cuckoo_incremental:
                # rebuild from the LIVE seen set (minus pending eviction
                # tombstones), resized so overflowed buckets recover and
                # load factor stays at design level over a long crawl
                seen_now = storage.read("seen")
                if storage.latest_snapshot("evicted") is not None:
                    seen_now = seen_now.join(
                        F.broadcast(storage.read("evicted")),
                        on="url_hash", how="left_anti",
                    )
                per_bucket = max(
                    cfg.cuckoo_capacity_per_bucket,
                    int(seen_now.count() * 1.25) // max(cfg.n_buckets, 1) + 1,
                )
                storage.commit(
                    "cuckoo",
                    D.build_cuckoo(seen_now, cfg.n_buckets, per_bucket),
                )
            if cfg.expire_keep_last:
                for t in ("seen", "fetch_log", "documents", "media_meta", "evicted"):
                    if storage.latest_snapshot(t) is not None:
                        storage.expire_snapshots(t, keep_last=cfg.expire_keep_last)

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
