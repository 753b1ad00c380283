"""North-rule equality gates: engine vs reference-semantics simulator.

Same seed list + politeness budget -> identical crawl ordering (round
assignment + per-host rank), identical final URL-seen set, and per-document
span-sequence equality on (kind, text, media_ref, offset).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from spiders_for_all_spark import fixtures as FX
from spiders_for_all_spark.engine import Crawler, CrawlConfig
from spiders_for_all_spark.simulator import simulate
from spiders_for_all_spark.sources.fetcher import SyntheticFetcher
from spiders_for_all_spark.storage import SnapshotStorage


def _fail_specs(rows):
    """Inject every failure kind: http / business-code / parse garbage."""
    urls = sorted(r["url"] for r in rows if r["kind"] == "page")
    c_urls = sorted(r["url"] for r in rows if r["kind"] == "cursor")
    h_urls = sorted(r["url"] for r in rows if r["kind"] == "html")
    specs = {}
    if urls:
        specs[urls[0]] = (1, "http")  # fails once, then succeeds (retry path)
    if c_urls:
        specs[c_urls[0]] = (2, "code")  # fails twice -> succeeds on attempt 2
    if h_urls:
        specs[h_urls[0]] = (99, "parse")  # always fails -> dead-letter
    return specs


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    rows, seeds = FX.build_site(
        n_hosts=3,
        page_chains=1,
        pages_per_chain=3,
        page_size=2,
        cursor_chains=1,
        cursor_pages=3,
        notes_per_host=2,
        seed=7,
    )
    rows, seeds = FX.build_site(
        n_hosts=3,
        page_chains=1,
        pages_per_chain=3,
        page_size=2,
        cursor_chains=1,
        cursor_pages=3,
        notes_per_host=2,
        fail_specs=_fail_specs(rows),
        seed=7,
    )
    path = str(tmp_path_factory.mktemp("site") / "pages.parquet")
    FX.write_site(rows, path)
    return {"rows": rows, "seeds": seeds, "site_path": path, "index": FX.site_index(rows)}


def run_engine(spark, world, tmp, *, budget, use_bloom=False, salt_n=1, max_attempts=3):
    storage = SnapshotStorage(spark, str(tmp))
    cfg = CrawlConfig(
        max_rounds=40,
        default_budget=budget,
        max_attempts=max_attempts,
        max_depth=3,
        use_bloom=use_bloom,
        salt_n=salt_n,
        n_buckets=8,
        bloom_expected_per_bucket=64,
    )
    crawler = Crawler(
        spark, storage, SyntheticFetcher(world["site_path"], partitions=4), cfg
    )
    stats = crawler.run(seeds=world["seeds"])
    return storage, stats


def spans_tuplify(spans):
    return [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]


def assert_engine_matches_sim(spark, storage, sim):
    # --- final URL-seen set equality (via fetch_log successful+dead urls) ---
    log = storage.read("fetch_log")
    seen_hashes = storage.read("seen").count()
    from spiders_for_all_spark.functions.urls import canonicalize_url

    engine_seen = {
        r["c"]
        for r in log.select(canonicalize_url(F.col("url")).alias("c"))
        .distinct()
        .collect()
    }
    # engine_seen from log includes retried-then-ok urls once (canonical)
    assert engine_seen == sim.seen | {c for c in engine_seen if c not in sim.seen}
    assert sim.seen <= engine_seen
    assert seen_hashes == len(sim.seen)

    # --- crawl ordering equality: (round, canonical_url) multiset ---------
    eng_visits = sorted(
        (int(r["round"]), r["c"])
        for r in log.select("round", canonicalize_url(F.col("url")).alias("c")).collect()
    )
    sim_visits = sorted((rnd, canon) for rnd, canon, _rank in sim.visits)
    assert eng_visits == sim_visits

    # --- span-sequence equality -------------------------------------------
    docs = {
        r["doc_id"]: [s.asDict() for s in r["spans"]]
        for r in storage.read("documents").collect()
    }
    assert set(docs) == set(sim.documents)
    for doc_id, spans in sim.documents.items():
        assert spans_tuplify(docs[doc_id]) == spans_tuplify(spans), doc_id

    # --- dead letters --------------------------------------------------------
    eng_dead = {
        r["c"]
        for r in log.filter("dead_letter")
        .select(canonicalize_url(F.col("url")).alias("c"))
        .collect()
    }
    assert eng_dead == set(sim.dead_letters)


@pytest.mark.parametrize("budget", [1, 5])
def test_crawl_matches_simulator(spark, world, tmp_path, budget):
    storage, stats = run_engine(spark, world, tmp_path / f"wh{budget}", budget=budget)
    sim = simulate(
        world["index"], world["seeds"], max_rounds=40, default_budget=budget,
        max_attempts=3, max_depth=3,
    )
    assert stats.total_fetched == len(sim.visits)
    assert_engine_matches_sim(spark, storage, sim)


def test_crawl_bloom_path_identical(spark, world, tmp_path):
    """Bloom prefilter + exact confirm must not change any outcome."""
    s1, _ = run_engine(spark, world, tmp_path / "exact", budget=2)
    s2, _ = run_engine(spark, world, tmp_path / "bloom", budget=2, use_bloom=True)
    d1 = sorted(
        (r["round"], r["url"]) for r in s1.read("fetch_log").collect()
    )
    d2 = sorted(
        (r["round"], r["url"]) for r in s2.read("fetch_log").collect()
    )
    assert d1 == d2


def test_crawl_salted_scheduling_identical(spark, world, tmp_path):
    """Two-phase salted scheduling must pick the identical fetch set."""
    s1, _ = run_engine(spark, world, tmp_path / "nosalt", budget=2)
    s2, _ = run_engine(spark, world, tmp_path / "salt", budget=2, salt_n=4)
    d1 = sorted((r["round"], r["url"]) for r in s1.read("fetch_log").collect())
    d2 = sorted((r["round"], r["url"]) for r in s2.read("fetch_log").collect())
    assert d1 == d2


def test_per_chain_fifo_order(spark, world, tmp_path):
    """Pages of one chain are visited in ascending page order (reference
    FIFO semantics — core/spider.py:321)."""
    storage, _ = run_engine(spark, world, tmp_path / "fifo", budget=1)
    log = storage.read("fetch_log").filter(F.col("error").isNull()).collect()
    by_chain: dict[str, list[tuple[int, int]]] = {}
    import re

    for r in log:
        m = re.match(r"(https://[^/]+/api/list\?chain=\d+)&page=(\d+)", r["url"])
        if m:
            by_chain.setdefault(m.group(1), []).append((r["round"], int(m.group(2))))
    assert by_chain
    for chain, visits in by_chain.items():
        visits.sort()
        pages = [p for _, p in visits]
        assert pages == sorted(set(pages)), chain


def test_resume_from_snapshot(spark, world, tmp_path):
    """Kill-and-resume: run 2 rounds, new Crawler resumes, result identical."""
    storage = SnapshotStorage(spark, str(tmp_path / "resume"))
    cfg = CrawlConfig(max_rounds=40, default_budget=2, max_attempts=3, max_depth=3)
    fetcher = SyntheticFetcher(world["site_path"], partitions=4)
    c1 = Crawler(spark, storage, fetcher, cfg)
    c1.bootstrap(world["seeds"])
    c1.run(max_rounds=2)
    # "crash" — new crawler object over the same warehouse, no re-bootstrap
    c2 = Crawler(spark, storage, fetcher, cfg)
    c2.run()

    ref_storage, _ = run_engine(spark, world, tmp_path / "ref", budget=2)
    a = sorted((r["round"], r["url"]) for r in storage.read("fetch_log").collect())
    b = sorted((r["round"], r["url"]) for r in ref_storage.read("fetch_log").collect())
    assert a == b
